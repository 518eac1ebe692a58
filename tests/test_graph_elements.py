"""Graph-element unit tests, re-targeted from the reference
(/root/reference/tests/unit/neo4j/test_graph_elements.py): label/property
semantics, pk validation, subgraph algebra, value coercion."""

import datetime

import pytest

from data2neo_spark import Attribute, Node, Relationship, Subgraph
from data2neo_spark.core.graph_elements import coerce_value


def test_attribute_immutable_pair():
    a = Attribute("k", 5)
    assert a.key == "k" and a.value == 5
    assert Attribute("k", 5) == Attribute("k", 5)
    assert Attribute("k", 5) != Attribute("k", 6)


def test_coercion_exotic_to_str():
    class Weird:
        def __str__(self):
            return "weird!"

    assert coerce_value(Weird()) == "weird!"
    assert coerce_value([1, 2]) == "[1, 2]"
    assert coerce_value(5) == 5
    assert coerce_value("x") == "x"
    dt = datetime.datetime(2020, 1, 1, tzinfo=datetime.timezone.utc)
    assert coerce_value(dt).tzinfo is None


def test_node_labels_and_primary():
    n = Node("A", "B", "A", x=1)
    assert n.labels == ["A", "B"]
    assert n.__primarylabel__ == "A"
    n.add_label("C")
    assert n.labels == ["A", "B", "C"]


def test_node_from_attributes_pk_validation():
    labels = [Attribute(None, "L")]
    attrs = [Attribute("x", 1)]
    n = Node.from_attributes(labels, attrs, primary_key="x")
    assert n.__primarykey__ == "x"
    with pytest.raises(ValueError):
        Node.from_attributes(labels, attrs, primary_key="missing")


def test_relationship():
    a, b = Node("A", id=1), Node("B", id=2)
    r = Relationship(a, "REL", b, w=0.5)
    assert r.type == "REL" and r["w"] == 0.5
    assert r.start_node is a and r.end_node is b


def test_subgraph_algebra():
    a, b, c = Node("A", id=1), Node("B", id=2), Node("C", id=3)
    r = Relationship(a, "R", b)
    sg1 = Subgraph([a, b], [r])
    sg2 = Subgraph([b, c])
    union = sg1 | sg2
    assert set(union.nodes) == {a, b, c} and set(union.relationships) == {r}
    inter = sg1 & sg2
    assert set(inter.nodes) == {b} and not inter.relationships
    # endpoints of surviving relationships are auto-retained
    diff = sg1 - sg2
    assert set(diff.nodes) == {a, b} and set(diff.relationships) == {r}
    sym = sg1 ^ sg2
    assert set(sym.nodes) == {a, b, c}  # b retained as endpoint of surviving r


def test_subgraph_auto_includes_endpoints():
    a, b = Node("A"), Node("B")
    sg = Subgraph([], [Relationship(a, "R", b)])
    assert set(sg.nodes) == {a, b}


def test_subgraph_or_with_elements():
    a, b = Node("A"), Node("B")
    sg = Subgraph() | a | Relationship(a, "R", b)
    assert len(sg.nodes) == 2 and len(sg.relationships) == 1
