"""Property-based parser/compiler tests (hypothesis) — the reference has no
randomized testing (SURVEY.md §5); we fuzz the grammar surface:

* any generated well-formed schema parses and compiles without crashing,
* static literal values round-trip with exact types,
* every parse is deterministic (same text → same tree).

No Spark needed — driver-side only.
"""

import string

from hypothesis import given, settings, strategies as st

from data2neo_spark.schema.parser import parse_schema
from data2neo_spark.schema.compiler import compile_schema

KEYWORDS = {"ENTITY", "NODE", "RELATIONSHIP", "MATCH", "True", "False"}

name = st.from_regex(r"[a-zA-Z_][a-zA-Z0-9_]{0,10}", fullmatch=True).filter(
    lambda s: s not in KEYWORDS
)
safe_string = st.text(
    alphabet=string.ascii_letters + string.digits + " _-.",
    min_size=0, max_size=12,
)
static_value = st.one_of(
    safe_string.map(lambda s: f'"{s}"'),
    st.integers(min_value=0, max_value=10**9).map(str),
    st.floats(min_value=0.001, max_value=1e6, allow_nan=False).map(
        lambda f: f"{f:.3f}"
    ),
    st.booleans().map(str),
)
argument = st.one_of(
    static_value,
    st.tuples(name, name).map(lambda t: f"{t[0]}.{t[1]}"),
    st.tuples(name, name).map(lambda t: f"INT({t[0]}.{t[1]})"),
)


@st.composite
def node_block(draw):
    labels = draw(st.lists(safe_string.map(lambda s: f'"{s or "L"}"'),
                           min_size=1, max_size=3))
    ident = draw(st.one_of(st.none(), name))
    attrs = draw(st.lists(st.tuples(name, argument), min_size=0, max_size=4,
                          unique_by=lambda t: t[0]))
    lines = [f"    NODE({', '.join(labels)}){' ' + ident if ident else ''}:"]
    for i, (key, arg) in enumerate(attrs):
        sep = "+" if i == 0 and draw(st.booleans()) else "-"
        lines.append(f"        {sep} {key} = {arg}")
    return "\n".join(lines)


@st.composite
def schema_text(draw):
    n_entities = draw(st.integers(min_value=1, max_value=3))
    parts = []
    for i in range(n_entities):
        etype = f"ent{i}"
        blocks = draw(st.lists(node_block(), min_size=0, max_size=3))
        parts.append(f'ENTITY("{etype}"):')
        parts.extend(blocks)
    return "\n".join(parts)


@given(schema_text())
@settings(max_examples=150, deadline=None)
def test_generated_schema_parses_and_compiles(text):
    try:
        compiled = compile_schema(text)
    except Exception as exc:
        # the only acceptable failures are the grammar's own validations
        from data2neo_spark.schema.parser import SchemaConfigException
        assert isinstance(exc, SchemaConfigException), (text, exc)
        return
    assert len(compiled.entities) >= 1


@given(schema_text())
@settings(max_examples=50, deadline=None)
def test_parse_deterministic(text):
    try:
        a = parse_schema(text)
        b = parse_schema(text)
    except Exception:
        return
    assert a == b


@given(st.integers(min_value=0, max_value=10**12))
@settings(max_examples=50, deadline=None)
def test_int_literal_roundtrip(v):
    tree = parse_schema(f'ENTITY("t"):\n NODE("L") n:\n  - x = {v}\n')
    got = tree[0][1][0][0][1][0][0][1][2]
    assert got == v and type(got) is int


@given(st.text(alphabet=string.ascii_letters + string.digits + " _-,.:;!?",
               min_size=0, max_size=30))
@settings(max_examples=100, deadline=None)
def test_string_literal_roundtrip(s):
    tree = parse_schema(f'ENTITY("t"):\n NODE("L") n:\n  - x = "{s}"\n')
    got = tree[0][1][0][0][1][0][0][1][2]
    assert got == s
