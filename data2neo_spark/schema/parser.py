"""Conversion-schema DSL parser.

Accepts the exact grammar of the reference DSL
(/root/reference/data2neo/core/schema_compiler.py:31-319) — ENTITY / NODE /
RELATIONSHIP / MATCH, attribute lines ``± key = argument``, nested wrappers,
static str/int/float/bool values — and produces the same instruction-tree IR
(nested ``[module_name, [args...]]`` lists; ground truth:
/root/reference/tests/unit/core/test_schema_compiler.py:80,95,106) so the
reference's golden parser tests transfer verbatim.

Implementation is a hand-rolled tokenizer + recursive-descent parser (the
reference uses ply lex/yacc); this runs driver-side only, on schema text that
is a few KB — parse cost is irrelevant, clarity wins.
"""

from __future__ import annotations

import re
from collections import Counter
from typing import Any, List, Optional, Tuple


class SchemaConfigException(ValueError):
    """Syntax/semantic error in the schema config (reference schema_compiler.py:26-28)."""


KEYWORDS = {"ENTITY", "NODE", "RELATIONSHIP", "MATCH"}

_TOKEN_SPEC = [
    ("NEWLINE", r"\n+"),
    ("WS", r"[ \t]+"),
    ("STRING", r'"(?:(?!"|\\).|\\.)*"|\'(?:(?!\'|\\).|\\.)*\''),
    ("FLOAT", r"\b(?<!\.)\d+\.\d+\b"),
    ("INT", r"\b(?<!\.)\d+(?!\.\d)\b"),
    ("NAME", r"\b[a-zA-Z_]\w*\b"),
    ("DOT", r"\.(?!\d+\b)"),
    ("COMMA", r","),
    ("EQUAL", r"="),
    ("COLON", r":"),
    ("LPAR", r"\("),
    ("RPAR", r"\)"),
    ("SEP", r"[+-]"),
]
_MASTER_RE = re.compile("|".join(f"(?P<{n}>{p})" for n, p in _TOKEN_SPEC))


class Token:
    __slots__ = ("kind", "value", "pos", "line")

    def __init__(self, kind: str, value: Any, pos: int, line: int) -> None:
        self.kind = kind
        self.value = value
        self.pos = pos
        self.line = line

    def __repr__(self) -> str:  # pragma: no cover
        return f"Token({self.kind}, {self.value!r})"


def _strip_quotes(raw: str) -> str:
    # Reference keeps the raw inner text (no unescaping), only strips the
    # surrounding quotes (schema_compiler.py:311-319 _cleanup_string).
    return raw[1:-1]


def tokenize(data: str) -> List[Token]:
    tokens: List[Token] = []
    pos = 0
    line = 1
    n = len(data)
    while pos < n:
        m = _MASTER_RE.match(data, pos)
        if m is None:
            ch = data[pos]
            context = data[max(0, pos - 20):pos]
            rest = data[pos + 1:pos + 51]
            raise SchemaConfigException(
                f"Illegal character '{ch}' on line {line}\nCONTEXT: \n..."
                f"{context}{ch}̲{rest}\n..."
            )
        kind = m.lastgroup
        text = m.group()
        if kind == "NEWLINE":
            line += text.count("\n")
        elif kind == "WS":
            pass
        elif kind == "STRING":
            tokens.append(Token("STRING", _strip_quotes(text), pos, line))
        elif kind == "FLOAT":
            tokens.append(Token("FLOAT", float(text), pos, line))
        elif kind == "INT":
            tokens.append(Token("INT", int(text), pos, line))
        elif kind == "NAME":
            if text == "True" or text == "False":
                tokens.append(Token("BOOL", text == "True", pos, line))
            elif text in KEYWORDS:
                tokens.append(Token(text, text, pos, line))
            else:
                tokens.append(Token("NAME", text, pos, line))
        else:
            tokens.append(Token(kind, text, pos, line))
        pos = m.end()
    return tokens


def precompile(input_string: str) -> str:
    """Strip ``#...`` comments (reference schema_compiler.py:322-329)."""
    match = re.search("#.*", input_string)
    while match is not None:
        input_string = input_string[:match.start()] + input_string[match.end():]
        match = re.search("#.*", input_string)
    return input_string


class SchemaConfigParser:
    """Recursive-descent parser for the schema DSL.

    ``parse(text)`` returns the instruction tree:
    ``[[entity_type, [node_instructions, rel_instructions]], ...]`` where each
    instruction is a nested ``[module_name, [args...]]`` list. NodeFactory
    args: ``[attributes, labels, primary_key, identifier]``;
    RelationshipFactory args: ``[attributes, type_arg, from_matcher,
    to_matcher, primary_key, identifier]``; Matcher args: ``[node_id]`` or
    ``[None, *label_or_condition_args]``; AttributeFactory args:
    ``[key, entity_attribute, static_value]``.
    """

    def __init__(self) -> None:
        self._tokens: List[Token] = []
        self._i = 0
        self._data = ""
        self._identifiers: List[str] = []

    # --- token helpers ---------------------------------------------------

    def _peek(self, offset: int = 0) -> Optional[Token]:
        i = self._i + offset
        return self._tokens[i] if i < len(self._tokens) else None

    def _next(self) -> Token:
        tok = self._peek()
        if tok is None:
            raise SchemaConfigException(
                "Couldn't resolve token '<EOF>' at position "
                f"{len(self._data)}\nCONTEXT: \n...{self._data[-20:]}\n..."
            )
        self._i += 1
        return tok

    def _error(self, tok: Optional[Token]) -> "SchemaConfigException":
        if tok is None:
            return SchemaConfigException(
                "Couldn't resolve token '<EOF>' at position "
                f"{len(self._data)}\nCONTEXT: \n...{self._data[-20:]}\n..."
            )
        value = str(tok.value)
        token_underlined = "̲".join(value)
        context = self._data[max(0, tok.pos - 20):tok.pos]
        return SchemaConfigException(
            f"Couldn't resolve token '{value}' at position {tok.pos}"
            f"\nCONTEXT: \n...{context}{token_underlined}\n..."
        )

    def _expect(self, kind: str) -> Token:
        tok = self._peek()
        if tok is None or tok.kind != kind:
            raise self._error(tok)
        return self._next()

    # --- grammar ---------------------------------------------------------

    def parse(self, data: str) -> List[Any]:
        self._data = data
        self._tokens = tokenize(data)
        self._i = 0
        entities: List[Any] = []
        while self._peek() is not None:
            entities.append(self._parse_entity())
        return entities

    def _parse_entity(self) -> List[Any]:
        tok = self._peek()
        if tok is None or tok.kind != "ENTITY":
            raise self._error(tok)
        self._next()
        self._expect("LPAR")
        type_tok = self._expect("STRING")
        self._expect("RPAR")
        self._expect("COLON")
        self._identifiers = []
        graphelements = self._parse_graphelements()
        # identifier uniqueness per entity (reference schema_compiler.py:132-138)
        counts = Counter(self._identifiers)
        duplicated = [k for k in counts if counts[k] > 1]
        if duplicated:
            raise SchemaConfigException(
                f"Found conflicting definitions of identifiers {duplicated} in "
                f"entity '{type_tok.value}'. An identifier must be unique."
            )
        return [type_tok.value, graphelements]

    def _parse_graphelements(self) -> List[Any]:
        nodes: List[Any] = []
        rels: List[Any] = []
        while True:
            tok = self._peek()
            if tok is None or tok.kind == "ENTITY":
                break
            if tok.kind not in ("NODE", "RELATIONSHIP", "NAME"):
                raise self._error(tok)
            element = self._parse_graphelement()
            identifier = None
            tok = self._peek()
            if tok is not None and tok.kind == "NAME":
                identifier = self._next().value
                self._identifiers.append(identifier)
            self._expect("COLON")
            attributes = self._parse_attributes()
            element, is_node = self._inject_graphelement_args(
                element, attributes, identifier
            )
            (nodes if is_node else rels).append(element)
        return [nodes, rels]

    def _parse_graphelement(self) -> List[Any]:
        tok = self._peek()
        if tok is None:
            raise self._error(tok)
        if tok.kind == "NODE":
            self._next()
            self._expect("LPAR")
            args = self._parse_arguments()
            self._expect("RPAR")
            return ["NodeFactory", [args]]
        if tok.kind == "RELATIONSHIP":
            self._next()
            self._expect("LPAR")
            from_dest = self._parse_destination()
            self._expect("COMMA")
            type_arg = self._parse_argument()
            self._expect("COMMA")
            to_dest = self._parse_destination()
            self._expect("RPAR")
            return ["RelationshipFactory", [type_arg, from_dest, to_dest]]
        if tok.kind == "NAME":
            name = self._next().value
            self._expect("LPAR")
            inner = self._parse_graphelement()
            staticargs = self._parse_staticarguments()
            self._expect("RPAR")
            return [name, [inner, *staticargs]]
        raise self._error(tok)

    def _parse_destination(self) -> List[Any]:
        tok = self._peek()
        if tok is not None and tok.kind == "NAME":
            return ["Matcher", [self._next().value]]
        if tok is not None and tok.kind == "MATCH":
            self._next()
            self._expect("LPAR")
            mixed = self._parse_mixedarguments()
            self._expect("RPAR")
            return ["Matcher", [None, *mixed]]
        raise self._error(tok)

    def _parse_attributes(self) -> List[Tuple[bool, List[Any]]]:
        attrs: List[Tuple[bool, List[Any]]] = []
        while True:
            tok = self._peek()
            if tok is None or tok.kind != "SEP":
                break
            primary = self._next().value == "+"
            attrs.append((primary, self._parse_attribute()))
        return attrs

    def _parse_attribute(self) -> List[Any]:
        key = self._expect("NAME").value
        self._expect("EQUAL")
        arg = self._parse_argument()
        self._inject_attribute_key(arg, key)
        return arg

    def _parse_arguments(self) -> List[Any]:
        args = [self._parse_argument()]
        while self._peek() is not None and self._peek().kind == "COMMA":
            self._next()
            args.append(self._parse_argument())
        return args

    def _parse_argument(self) -> List[Any]:
        tok = self._peek()
        if tok is None:
            raise self._error(tok)
        if tok.kind in ("STRING", "BOOL", "INT", "FLOAT"):
            return ["AttributeFactory", [None, None, self._next().value]]
        if tok.kind == "NAME":
            nxt = self._peek(1)
            if nxt is not None and nxt.kind == "DOT":
                self._next()
                self._next()
                column = self._expect("NAME").value
                # the "Entity." prefix is dropped — only the column name is
                # kept (reference schema_compiler.py:287-290)
                return ["AttributeFactory", [None, column, None]]
            if nxt is not None and nxt.kind == "LPAR":
                name = self._next().value
                self._next()
                inner = self._parse_argument()
                staticargs = self._parse_staticarguments()
                self._expect("RPAR")
                return [name, [inner, *staticargs]]
        raise self._error(tok)

    def _parse_staticarguments(self) -> List[Any]:
        out: List[Any] = []
        while self._peek() is not None and self._peek().kind == "COMMA":
            self._next()
            tok = self._peek()
            if tok is None or tok.kind not in ("STRING", "BOOL", "INT", "FLOAT"):
                raise self._error(tok)
            out.append(["AttributeFactory", [None, None, self._next().value]])
        return out

    def _parse_mixedarguments(self) -> List[Any]:
        out: List[Any] = []
        while True:
            tok = self._peek()
            nxt = self._peek(1)
            if tok is not None and tok.kind == "NAME" and nxt is not None and nxt.kind == "EQUAL":
                out.append(self._parse_attribute())
            else:
                out.append(self._parse_argument())
            if self._peek() is not None and self._peek().kind == "COMMA":
                self._next()
            else:
                break
        return out

    # --- injection helpers (mirror reference semantics) -------------------

    @staticmethod
    def _extract_key_from_attribute(attribute: List[Any]) -> str:
        if attribute[0] == "AttributeFactory":
            return attribute[1][0]
        return SchemaConfigParser._extract_key_from_attribute(attribute[1][0])

    @staticmethod
    def _inject_attribute_key(instructions: List[Any], key: str) -> List[Any]:
        if instructions[0] == "AttributeFactory":
            instructions[1][0] = key
        else:
            SchemaConfigParser._inject_attribute_key(instructions[1][0], key)
        return instructions

    @staticmethod
    def _inject_graphelement_args(
        instructions: List[Any],
        attributes: List[Tuple[bool, List[Any]]],
        identifier: Optional[str],
    ) -> Tuple[List[Any], bool]:
        if instructions[0] in ("NodeFactory", "RelationshipFactory"):
            is_node = instructions[0] == "NodeFactory"
            raw_attributes = []
            primary_key = None
            for primary, attribute in attributes:
                raw_attributes.append(attribute)
                if primary:
                    if primary_key is not None:
                        raise SchemaConfigException(
                            "Setting two or more primary keys for one "
                            f"graphelement is not allowed. Conflict: "
                            f"'{primary_key}' <-> '{attribute[1][0]}'"
                        )
                    primary_key = SchemaConfigParser._extract_key_from_attribute(attribute)
            instructions[1].insert(0, raw_attributes)
            instructions[1].extend([primary_key, identifier])
            return instructions, is_node
        inner, is_node = SchemaConfigParser._inject_graphelement_args(
            instructions[1][0], attributes, identifier
        )
        instructions[1][0] = inner
        return instructions, is_node


def parse_schema(schema: str) -> List[Any]:
    """Precompile (strip comments) + parse a schema string into the IR."""
    return SchemaConfigParser().parse(precompile(schema))
