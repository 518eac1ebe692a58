"""Wrapper/UDF-surface tests, re-targeted from the reference
(/root/reference/tests/integration/test_wrappers.py +
resources/schema_wrappers.yaml): all five registration kinds, chaining,
parametrized static args, full wrapper classes, subgraph postprocessors that
add nodes+edges."""

import pandas as pd
import pytest

from data2neo_spark import (
    Attribute,
    AttributeFactoryWrapper,
    Converter,
    Node,
    Relationship,
    Subgraph,
    SubgraphFactoryWrapper,
    register_attribute_postprocessor,
    register_attribute_preprocessor,
    register_subgraph_postprocessor,
    register_subgraph_preprocessor,
    register_wrapper,
)

from conftest import node_set


# ---- registrations (mirror reference test_wrappers.py:35-115) --------------

@register_attribute_preprocessor
def attr_pre_change(resource):
    resource["First"] = "Changed"
    return resource


@register_attribute_preprocessor
def attr_pre_condition(resource):
    return None


@register_attribute_preprocessor
def attr_pre_new(resource):
    resource["Forth"] = "F"
    return resource


@register_attribute_postprocessor
def attr_post_append(attribute):
    return Attribute(attribute.key, attribute.value + " appendix")


@register_attribute_postprocessor
def attr_post_append_parametrized(attribute, new_value):
    return Attribute(attribute.key, attribute.value + new_value)


@register_wrapper
class AttrWrapper(AttributeFactoryWrapper):
    def __init__(self, factory, attribute, another_attribute):
        super().__init__(factory)
        self._attribute = attribute
        self._another_attribute = another_attribute

    def construct(self, resource):
        resource["First"] = self._attribute
        attribute = super().construct(resource)
        return Attribute(self._another_attribute, attribute.key + ":" + attribute.value)


@register_subgraph_preprocessor
def sg_pre_change(resource):
    resource["First"] = "Changed"
    return resource


@register_subgraph_preprocessor
def sg_pre_change_parametrized(resource, key, new_value):
    resource[key] = new_value
    return resource


@register_subgraph_preprocessor
def sg_pre_condition(resource):
    return None


@register_subgraph_postprocessor
def sg_post_add(subgraph):
    first_node = subgraph.nodes[0]
    new_node = Node("From Copy", First=first_node["First"])
    new_rel = Relationship(first_node, "is copied by", new_node)
    return subgraph | new_node | new_rel


@register_subgraph_postprocessor
def sg_post_condition(subgraph):
    return Subgraph()


@register_wrapper
class SGWrapper(SubgraphFactoryWrapper):
    def __init__(self, factory, attribute, another_attribute):
        super().__init__(factory)
        self._attribute = attribute
        self._another_attribute = another_attribute

    def construct(self, resource):
        resource["Fifth"] = self._attribute
        subgraph = super().construct(resource)
        subgraph.nodes[0]["Sixth"] = self._another_attribute
        return subgraph


# ---- fixtures ---------------------------------------------------------------

INPUT = pd.DataFrame({"First": ["F"], "Second": ["S"], "Third": ["T"]})


def convert(spark, schema, etype):
    return Converter(schema, [(etype, spark.createDataFrame(INPUT))])(spark)


def props(row):
    meta = {"_uid", "_labels", "_primary_label", "_pk_prop", "_pk_val",
            "_seq_src", "_seq_row"}
    return {k: v for k, v in row.asDict().items() if k not in meta and v is not None}


def test_attr_pre(spark):
    schema = """
ENTITY("ATTRPRE"):
  NODE("MyType") node:
    - First = attr_pre_change(ATTRPRE.First)
    - Second = attr_pre_condition(ATTRPRE.Second)
    - Third = attr_pre_new(ATTRPRE.Forth)
"""
    store = convert(spark, schema, "ATTRPRE")
    rows = store.nodes.collect()
    assert len(rows) == 1
    p = props(rows[0])
    assert p == {"First": "Changed", "Third": "F"}


def test_attr_post(spark):
    schema = """
ENTITY("ATTRPOST"):
  NODE(attr_post_append("MyType")):
    - First = attr_post_append(ATTRPOST.First)
    - Second = attr_post_append(attr_post_append(ATTRPOST.Second))
    - Third = attr_post_append(attr_pre_change(ATTRPOST.First))
    - Forth = attr_post_append_parametrized(ATTRPOST.Third, "-value")
"""
    store = convert(spark, schema, "ATTRPOST")
    rows = store.nodes.collect()
    assert len(rows) == 1
    row = rows[0]
    assert "MyType appendix" in row["_labels"]
    p = props(row)
    assert p["First"] == "F appendix"
    assert p["Second"] == "S appendix appendix"   # chaining
    assert p["Third"] == "Changed appendix"        # pre + post
    assert p["Forth"] == "T-value"                 # parametrized


def test_attr_wrapper(spark):
    schema = """
ENTITY("ATTRWRAPPER"):
  NODE("MyType"):
    - First = AttrWrapper(ATTRWRAPPER.First, "Test1", "Test2")
"""
    store = convert(spark, schema, "ATTRWRAPPER")
    rows = store.nodes.collect()
    assert len(rows) == 1
    p = props(rows[0])
    assert p == {"Test2": "First:Test1"}


def test_subgraph_pre(spark):
    schema = """
ENTITY("SGPRE"):
  sg_pre_change(NODE("From")) from:
    - First = SGPRE.First
  sg_pre_change(NODE("To")) to:
  sg_pre_condition(NODE("WillNotBeCreated")):
  sg_pre_change_parametrized(RELATIONSHIP(from, "relates to", to), "Second", "CHANGED"):
    - Second = SGPRE.Second
    - First = SGPRE.First
  sg_pre_condition(RELATIONSHIP(from, "notexisting", to)):
"""
    store = convert(spark, schema, "SGPRE")
    assert store.nodes.count() == 2
    node_from = store.match_nodes("From").collect()[0]
    assert node_from["First"] == "Changed"
    edges = store.edges.collect()
    assert len(edges) == 1
    rel = edges[0]
    assert rel["_rel_type"] == "relates to"
    assert rel["First"] == "Changed"    # node-pass mutation persisted
    assert rel["Second"] == "CHANGED"   # own parametrized pre


def test_subgraph_post(spark):
    schema = """
ENTITY("SGPOST"):
  sg_post_add(NODE("From")) from:
    - First = SGPOST.First
  sg_post_condition(NODE("NotExisting")):
"""
    store = convert(spark, schema, "SGPOST")
    assert store.nodes.count() == 2
    node_from = store.match_nodes("From").collect()[0]
    node_copy = store.match_nodes("From Copy").collect()[0]
    assert node_from["First"] == "F"
    assert node_copy["First"] == "F"
    edges = store.edges.collect()
    assert len(edges) == 1
    assert edges[0]["_rel_type"] == "is copied by"
    assert edges[0]["_src_label"] == "From"
    assert edges[0]["_dst_label"] == "From Copy"


def test_subgraph_wrapper(spark):
    schema = """
ENTITY("SGWRAPPER"):
  SGWrapper(NODE("From"), "Test1", "Test2"):
    - First = SGWRAPPER.First
    - Fifth = SGWRAPPER.Fifth
"""
    store = convert(spark, schema, "SGWRAPPER")
    rows = store.nodes.collect()
    assert len(rows) == 1
    p = props(rows[0])
    assert p == {"First": "F", "Fifth": "Test1", "Sixth": "Test2"}


def test_exception_enrichment(spark):
    """O8: a wrapper that raises aborts the run with resource context
    (reference test_end_to_end.py:115-137 exception propagation)."""
    from data2neo_spark import register_subgraph_postprocessor

    @register_subgraph_postprocessor
    def RAISE_ERROR(subgraph):
        raise ValueError("boom")

    schema = """
ENTITY("E"):
  RAISE_ERROR(NODE("X")) x:
    + id = INT(E.id)
"""
    with pytest.raises(Exception) as excinfo:
        Converter(
            schema, [("E", spark.createDataFrame(pd.DataFrame({"id": [7]})))]
        )(spark)
    msg = str(excinfo.value)
    assert "entity 'E'" in msg and "boom" in msg and "'id': 7" in msg


def test_dynamic_schema_sees_late_first_occurrence_keys(spark):
    """The dynamic-path property schema is inferred distributively: a
    property key whose FIRST occurrence is in the very last row of a
    wide frame still gets its typed column (the old bounded driver-side
    sample silently dropped keys beyond row 1000)."""
    from data2neo_spark import register_subgraph_postprocessor

    @register_subgraph_postprocessor
    def sg_post_late_key_r4(subgraph):
        n = subgraph.nodes[0]
        if n["id"] == 2999:               # far beyond any sample bound
            n["rare_prop"] = 42
        return subgraph

    schema = """
ENTITY("E"):
  sg_post_late_key_r4(NODE("X")) x:
    + id = INT(E.id)
"""
    store = Converter(
        schema,
        [("E", spark.createDataFrame(pd.DataFrame({"id": range(3000)})))],
    )(spark)
    row = [r for r in store.nodes.collect() if r["id"] == 2999][0]
    assert row["rare_prop"] == 42
    others = [r["rare_prop"] for r in store.nodes.collect() if r["id"] != 2999]
    assert all(v is None for v in others)
