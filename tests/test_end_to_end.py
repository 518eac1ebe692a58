"""End-to-end golden-graph tests, re-targeted from the reference integration
suite (/root/reference/tests/integration/test_end_to_end.py +
resources/schema_end_to_end.yaml + data_end_to_end.py). The Neo4j session is
replaced by our GraphStore; expected node/relationship sets are the
reference's hand-written goldens."""

import pandas as pd
import pytest

from data2neo_spark import Converter, GraphStore, PandasDataFrameIterator, IteratorIterator

from conftest import node_set, edge_set


SCHEMA = """
ENTITY("Flower"):
    NODE("Flower") flower:
        - sepal_length = FLOAT(Flower.sepal_length)
        - sepal_width = FLOAT(Flower.sepal_width)
        - petal_length = FLOAT(Flower.petal_length)
        - petal_width = FLOAT(Flower.petal_width)

    NODE("Species", "BioEntity", Flower.species) species:
        + Name = Flower.species

    RELATIONSHIP(flower, "is", species):

ENTITY("Person"):
    NODE("Person") person:
        + ID = INT(Person.ID)
        - FirstName = Person.FirstName
        - Renamed = Person.LastName
        - Static = "staticstring"
    MERGE_RELATIONSHIPS(RELATIONSHIP(person, "likes", MATCH("Species", Name=Person.FavoriteFlower))):
        - Since = "4ever"
        - EntityAttribute = INT(Person.ID)
"""


def people_df(ids, first, last, flower):
    return pd.DataFrame(
        {"ID": ids, "FirstName": first, "LastName": last, "FavoriteFlower": flower}
    )


NO_DUPLICATES = people_df(
    [1, 2, 3, 4],
    ["Julian", "Fritz", "Hans", "Rudolfo"],
    ["Minder", "SomeGuy", "Müller", "Muster"],
    ["virginica", "setosa", "versicolor", "setosa"],
)

DUPLICATES = people_df(
    [1, 2, 2, 3, 4, 4, 4, 4],
    ["Julian", "Fritz", "Fritz", "Hans", "Rudolfo", "Rudolfo", "Rudolfo", "Rudolfo"],
    ["Minder", "SomeGuy", "SomeGuy", "Müller", "Muster", "Muster", "Muster", "Muster"],
    ["virginica", "setosa", "setosa", "versicolor", "setosa", "setosa", "setosa", "setosa"],
)

BEFORE_UPDATE = people_df(
    [1, 2, 3, 4],
    ["Julian", "Fritz", "Hans", "Rudolfo"],
    ["AnotherName", "Generic", "Müller", "MusterMann"],
    ["no favorite", "setosa", "versicolor", "setosa"],
)

IRIS = pd.DataFrame(
    {
        "sepal_length": [0.1, 0.2, 0.3, 0.4, 0.5],
        "sepal_width": [1.1, 1.2, 1.3, 1.4, 1.5],
        "petal_length": [2.1, 2.2, 2.3, 2.4, 2.5],
        "petal_width": [3.1, 3.2, 3.3, 3.4, 3.5],
        "random_property": [1, 2, 3, 4, 5],
        "species": ["setosa", "setosa", "versicolor", "virginica", "roseabluma"],
    }
)

# ---- expected goldens (reference data_end_to_end.py:37-89) -----------------

PERSON_NODES = {
    (frozenset(["Person"]),
     frozenset({("ID", i), ("FirstName", fn), ("Renamed", ln),
                ("Static", "staticstring")}))
    for i, fn, ln in [
        (1, "Julian", "Minder"), (2, "Fritz", "SomeGuy"),
        (3, "Hans", "Müller"), (4, "Rudolfo", "Muster"),
    ]
}

SPECIES_NODES = {
    (frozenset(["Species", "BioEntity", s]), frozenset({("Name", s)}))
    for s in ["setosa", "versicolor", "virginica", "roseabluma"]
}

FLOWER_NODES = {
    (frozenset(["Flower"]),
     frozenset({("sepal_length", r.sepal_length), ("sepal_width", r.sepal_width),
                ("petal_length", r.petal_length), ("petal_width", r.petal_width)}))
    for r in IRIS.itertuples()
}


def species_node(name):
    return (frozenset(["Species", "BioEntity", name]), frozenset({("Name", name)}))


def flower_node(r):
    return (frozenset(["Flower"]),
            frozenset({("sepal_length", r.sepal_length), ("sepal_width", r.sepal_width),
                       ("petal_length", r.petal_length), ("petal_width", r.petal_width)}))


def person_node(i, fn, ln):
    return (frozenset(["Person"]),
            frozenset({("ID", i), ("FirstName", fn), ("Renamed", ln),
                       ("Static", "staticstring")}))


IS_RELS = [
    (flower_node(r), "is", frozenset(), species_node(r.species))
    for r in IRIS.itertuples()
]

LIKES_RELS = [
    (person_node(i, fn, ln), "likes",
     frozenset({("Since", "4ever"), ("EntityAttribute", i)}),
     species_node(fav))
    for i, fn, ln, fav in [
        (1, "Julian", "Minder", "virginica"),
        (2, "Fritz", "SomeGuy", "setosa"),
        (3, "Hans", "Müller", "versicolor"),
        (4, "Rudolfo", "Muster", "setosa"),
    ]
]


def convert(spark, person_df=None, with_iris=True, store=None):
    iters = []
    if with_iris:
        iters.append(PandasDataFrameIterator(IRIS, "Flower"))
    if person_df is not None:
        iters.append(PandasDataFrameIterator(person_df, "Person"))
    conv = Converter(SCHEMA, IteratorIterator(iters), store=store)
    return conv(spark)


def test_full_conversion(spark):
    """Golden full_result: all nodes + is + likes relationships."""
    store = convert(spark, NO_DUPLICATES)
    assert node_set(store.nodes) == PERSON_NODES | SPECIES_NODES | FLOWER_NODES
    got_edges = edge_set(store)
    assert sorted(got_edges, key=repr) == sorted(IS_RELS + LIKES_RELS, key=repr)


def test_node_merge_duplicates(spark):
    """Duplicated person rows merge into 4 nodes (reference test_merge)."""
    store = convert(spark, DUPLICATES)
    assert node_set(store.nodes) == PERSON_NODES | SPECIES_NODES | FLOWER_NODES
    likes = store.match_relationships("likes")
    # MERGE_RELATIONSHIPS: at most one likes edge per (person, species)
    assert likes.count() == 4


def test_node_update(spark):
    """Run before_update then the real data into the same store — properties
    must be overwritten by the second run (reference test_end_to_end.py:55-68)."""
    store = convert(spark, BEFORE_UPDATE)
    store = convert(spark, NO_DUPLICATES, with_iris=True, store=store)
    persons = {n for n in node_set(store.nodes) if frozenset(["Person"]) == n[0]}
    assert persons == PERSON_NODES


def test_flower_only(spark):
    store = convert(spark, person_df=None)
    assert node_set(store.nodes) == SPECIES_NODES | FLOWER_NODES
    assert [e[1] for e in edge_set(store)] == ["is"] * 5


def test_person_only_nodes_only(spark):
    """Person data without Flower data: likes MATCH finds no Species nodes →
    relationships for missing targets are skipped (inner join semantics)."""
    store = convert(spark, NO_DUPLICATES, with_iris=False)
    assert node_set(store.nodes) == PERSON_NODES
    assert store.edges is None or store.edges.count() == 0


def test_serialize_mode_conflict():
    with pytest.raises(ValueError):
        Converter(SCHEMA, {}, serialize=True, num_workers=5)


def test_triples(spark):
    store = convert(spark, NO_DUPLICATES)
    triples = {tuple(r) for r in store.triples().collect()}
    assert ("Person:1", "likes", "Species:virginica") in triples
    assert any(t[1] == "is" and t[2] == "Species:setosa" for t in triples)


def test_partitioning_invariance(spark):
    """Reference parametrizes workers∈{1,5}×batch∈{1,100} and requires
    identical graphs (test_end_to_end.py:32-34); our equivalent: results are
    invariant to input partitioning."""
    base = convert(spark, NO_DUPLICATES)
    expected_nodes = node_set(base.nodes)
    expected_edges = sorted(edge_set(base), key=repr)
    for parts in (1, 12):
        iters = [
            PandasDataFrameIterator(IRIS, "Flower"),
            PandasDataFrameIterator(NO_DUPLICATES, "Person"),
        ]
        pairs = []
        for it in iters:
            (etype, df), = it.resolve(spark)
            pairs.append((etype, df.repartition(parts)))
        store = Converter(SCHEMA, pairs)(spark)
        assert node_set(store.nodes) == expected_nodes
        assert sorted(edge_set(store), key=repr) == expected_edges


def test_skip_phases(spark):
    """Reference converter(skip_nodes=..., skip_relationships=...)
    (converter.py:349-355)."""
    store = GraphStore(spark)
    conv = Converter(SCHEMA, [
        ("Flower", spark.createDataFrame(IRIS)),
        ("Person", spark.createDataFrame(NO_DUPLICATES)),
    ], store=store)
    conv(spark, skip_relationships=True)
    assert store.nodes.count() > 0
    assert store.edges is None
    # second pass: relationships only, against the existing node table
    conv2 = Converter(SCHEMA, [
        ("Flower", spark.createDataFrame(IRIS)),
        ("Person", spark.createDataFrame(NO_DUPLICATES)),
    ], store=store)
    conv2(spark, skip_nodes=True)
    assert store.match_relationships("likes").count() == 4
