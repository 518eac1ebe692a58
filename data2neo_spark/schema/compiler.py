"""Instruction tree → rule descriptors (CompiledSchema).

Counterpart of the reference's ``compile_schema``
(/root/reference/data2neo/core/schema_compiler.py:377-409), but the output is
declarative rule descriptors (plans/rules.py) instead of factory objects.
Wrapper names are validated against the registry at compile time; built-in
subgraph postprocessors that merely flip merge flags (MERGE_RELATIONSHIPS)
are folded into the rule instead of becoming runtime stages.
"""

from __future__ import annotations

from typing import Any, List, Optional, Tuple

from ..core import registrar
from ..plans.rules import (
    AttrSpec,
    CompiledSchema,
    EntityRules,
    MatchSpec,
    NodeRule,
    RelRule,
    WrapperApplication,
)
from .parser import SchemaConfigException, parse_schema


def _compile_attr(instr: List[Any]) -> AttrSpec:
    """['AttributeFactory', [key, column, static]] or wrapper nesting
    ['NAME', [inner, *static_arg_factories]] → AttrSpec."""
    wrappers: List[WrapperApplication] = []
    node = instr
    while node[0] != "AttributeFactory":
        name = node[0]
        args = node[1]
        static_args = [a[1][2] for a in args[1:]]  # AttributeFactory statics
        registrar.get_wrapper(name)  # raises KeyError if unregistered
        wrappers.append(WrapperApplication(name, static_args))
        node = args[0]
    key, column, static = node[1]
    return AttrSpec(key=key, column=column, static=static, wrappers=wrappers)


def _compile_matcher(instr: List[Any]) -> MatchSpec:
    """['Matcher', [node_id]] or ['Matcher', [None, *mixedargs]]."""
    args = instr[1]
    if args[0] is not None:
        return MatchSpec(node_id=args[0])
    labels: List[AttrSpec] = []
    conditions: List[AttrSpec] = []
    for arg in args[1:]:
        spec = _compile_attr(arg)
        # key set ⇒ property equality condition; key None ⇒ label
        # (reference matcher.py:41-52)
        (conditions if spec.key is not None else labels).append(spec)
    if not labels and not conditions:
        raise SchemaConfigException("MATCH requires at least one label or condition")
    if not labels:
        # reference matcher.py:52: conditions alone are not a valid MATCH —
        # at least one label (static or dynamic) is required
        raise ValueError("At least one label must be provided")
    return MatchSpec(labels=labels, conditions=conditions)


def _unwrap_graphelement(
    instr: List[Any],
) -> Tuple[List[Any], List[WrapperApplication]]:
    """Peel wrapper layers off a graph element instruction; returns the inner
    NodeFactory/RelationshipFactory instruction + wrappers outermost-first."""
    wrappers: List[WrapperApplication] = []
    node = instr
    while node[0] not in ("NodeFactory", "RelationshipFactory"):
        name = node[0]
        args = node[1]
        static_args = [a[1][2] for a in args[1:]]
        registrar.get_wrapper(name)
        wrappers.append(WrapperApplication(name, static_args))
        node = args[0]
    return node, wrappers


def _compile_node(
    entity_type: str, instr: List[Any], rule_id: str
) -> NodeRule:
    inner, wrappers = _unwrap_graphelement(instr)
    attributes_i, labels_i, primary_key, identifier = inner[1]
    return NodeRule(
        entity_type=entity_type,
        labels=[_compile_attr(a) for a in labels_i],
        attributes=[_compile_attr(a) for a in attributes_i],
        primary_key=primary_key,
        identifier=identifier,
        wrappers=wrappers,
        rule_id=rule_id,
    )


def _compile_rel(entity_type: str, instr: List[Any], rule_id: str) -> RelRule:
    inner, wrappers = _unwrap_graphelement(instr)
    attributes_i, type_arg, from_m, to_m, primary_key, identifier = inner[1]
    rule = RelRule(
        entity_type=entity_type,
        type_attr=_compile_attr(type_arg),
        from_match=_compile_matcher(from_m),
        to_match=_compile_matcher(to_m),
        attributes=[_compile_attr(a) for a in attributes_i],
        primary_key=primary_key,
        identifier=identifier,
        wrappers=[],
        rule_id=rule_id,
    )
    # Fold flag-only subgraph postprocessors (MERGE_RELATIONSHIPS) into the
    # rule: reference applies them per row (common_modules/__init__.py:17-26);
    # for us it's a compile-time dedup-mode switch.
    for w in wrappers:
        wdef = registrar.get_wrapper(w.name)
        if wdef.sets_ghost_primary_key:
            rule.ghost_primary_key = True
        elif wdef.kind == registrar.FULL_WRAPPER:
            # the dynamic interpreter path exists for NODE rules only —
            # fail loudly at compile time instead of silently dropping the
            # wrapper or crashing inside an executor UDF
            raise SchemaConfigException(
                f"Full wrapper classes around RELATIONSHIP rules are not "
                f"supported ('{w.name}' in entity '{entity_type}'); use "
                f"subgraph pre/postprocessors instead"
            )
        else:
            rule.wrappers.append(w)
    for spec in [rule.type_attr, *rule.attributes] + rule.from_match.conditions \
            + rule.from_match.labels + rule.to_match.conditions + rule.to_match.labels:
        for w in spec.wrappers:
            if registrar.get_wrapper(w.name).kind == registrar.FULL_WRAPPER:
                raise SchemaConfigException(
                    f"Full wrapper classes on RELATIONSHIP attributes are not "
                    f"supported ('{w.name}' in entity '{entity_type}'); "
                    f"register an attribute pre/postprocessor instead"
                )
    return rule


def compile_schema(schema: str) -> CompiledSchema:
    """Parse + compile a schema string into a CompiledSchema."""
    if "RELATION(" in schema:
        raise DeprecationWarning(
            "The RELATION keyword is deprecated. Please use RELATIONSHIP instead."
        )
    instructions = parse_schema(schema)
    compiled = CompiledSchema()
    for entity_type, (node_instrs, rel_instrs) in instructions:
        if entity_type in compiled.entities:
            raise SchemaConfigException(
                f"Found two conflicting definitions of entity '{entity_type}'. "
                "Please only specify each entity once."
            )
        rules = EntityRules(entity_type=entity_type)
        for i, ni in enumerate(node_instrs):
            rules.node_rules.append(
                _compile_node(entity_type, ni, f"{entity_type}/n{i}")
            )
        for i, ri in enumerate(rel_instrs):
            rules.rel_rules.append(
                _compile_rel(entity_type, ri, f"{entity_type}/r{i}")
            )
        compiled.entities[entity_type] = rules
        if rules.node_rules:
            compiled.node_mask.add(entity_type)
        if rules.rel_rules:
            compiled.relationship_mask.add(entity_type)
    return compiled
