"""Standalone create/merge/match API tests, re-targeted from the reference
(tests/unit/neo4j/test_match.py and test_basic_ops.py): hand-built Subgraphs
written into the store without a Converter."""

import pytest

from data2neo_spark import GraphStore, Node, Relationship


@pytest.fixture()
def store(spark):
    """Reference fixture (test_match.py:28-40): three nodes, two rels."""
    n1 = Node("test", "second", id=1, name="test1", anotherattr="test")
    n2 = Node("test", id=2, name="test2", anotherattr="test")
    n3 = Node("anotherlabel", id=3, name="test3")
    r1 = Relationship(n1, "to", n2, id=1)
    r2 = Relationship(n1, "to", n3, id=2, anotherattr="test")
    graph = n1 | n2 | n3 | r1 | r2
    s = GraphStore(spark)
    s.create(graph)
    return s


def ids(df):
    return sorted(r["id"] for r in df.collect())


def test_match_nodes_by_label(store):
    assert ids(store.match_nodes("test")) == [1, 2]
    assert ids(store.match_nodes("test", "second")) == [1]
    assert ids(store.match_nodes("anotherlabel")) == [3]
    assert ids(store.match_nodes()) == [1, 2, 3]


def test_match_nodes_by_property(store):
    assert ids(store.match_nodes("test", name="test2")) == [2]
    assert ids(store.match_nodes(anotherattr="test")) == [1, 2]
    assert store.match_nodes("test", name="nope").count() == 0


def test_match_relationships(store):
    assert store.match_relationships("to").count() == 2
    rels = store.match_relationships("to", to_node_labels=["anotherlabel"])
    assert sorted(r["id"] for r in rels.collect()) == [2]


def test_create_allows_duplicates(spark):
    s = GraphStore(spark)
    n = Node("L", id=1)
    s.create(n | Node("L", id=1))
    s.create(Node("L", id=1) | Node("L", id=1))
    assert s.match_nodes("L").count() == 4  # create never merges


def test_merge_upserts(spark):
    s = GraphStore(spark)
    a = Node("P", id=1, name="v1")
    a.set_primary_key("id")
    s.merge(a | a)
    assert s.match_nodes("P").count() == 1
    b = Node("P", id=1, name="v2", extra="x")
    b.set_primary_key("id")
    s.merge(b | b)
    rows = s.match_nodes("P").collect()
    assert len(rows) == 1
    assert rows[0]["name"] == "v2" and rows[0]["extra"] == "x"


def test_merge_requires_pk(spark):
    s = GraphStore(spark)
    with pytest.raises(ValueError):
        s.merge(Node("P", id=1) | Node("P", id=2))


def test_merge_relationships_on_endpoints(spark):
    """merge(): rel without pk merges on (src, type, dst)."""
    s = GraphStore(spark)
    a = Node("P", id=1); a.set_primary_key("id")
    b = Node("P", id=2); b.set_primary_key("id")
    g1 = a | b | Relationship(a, "to", b) | Relationship(a, "to", b)
    s.merge(g1)
    assert s.match_relationships("to").count() == 1
    # merging again with the same endpoints stays 1
    s.merge(a | b | Relationship(a, "to", b))
    assert s.match_relationships("to").count() == 1
