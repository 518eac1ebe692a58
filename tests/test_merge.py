"""Merge-semantics tests, re-targeted from the reference
(/root/reference/tests/integration/test_merge.py and test_concurrency.py).
Parallelism-invariance is exercised by repartitioning inputs."""

import pandas as pd

from data2neo_spark import Converter, IteratorIterator, PandasDataFrameIterator


ENTITY_SCHEMA = """
ENTITY("Entity"):
    NODE("Entity") node:
        + id = INT(Entity.id)
"""


def run(spark, schema, frames, repartition=None):
    pairs = []
    for etype, pdf in frames:
        df = spark.createDataFrame(pdf)
        if repartition:
            df = df.repartition(repartition)
        pairs.append((etype, df))
    return Converter(schema, pairs)(spark)


def test_standard_parallel_rels(spark):
    """Two identical rows ⇒ two parallel relationships (A5)."""
    schema = ENTITY_SCHEMA + """
ENTITY("Relationship"):
    RELATIONSHIP(MATCH("Entity", id = INT(Relation.source_id)), "RELATED_TO", MATCH("Entity", id = INT(Relation.target_id))):
"""
    store = run(spark, schema, [
        ("Entity", pd.DataFrame({"id": [1, 2]})),
        ("Relationship", pd.DataFrame({"source_id": [1, 1], "target_id": [2, 2]})),
    ])
    assert store.edges.count() == 2


def test_standard_same_resource(spark):
    """Two identical RELATIONSHIP rules in one entity ⇒ 2 edges."""
    schema = ENTITY_SCHEMA + """
ENTITY("Relationship"):
    RELATIONSHIP(MATCH("Entity", id = INT(Relation.source_id)), "RELATED_TO", MATCH("Entity", id = INT(Relation.target_id))):
    RELATIONSHIP(MATCH("Entity", id = INT(Relation.source_id)), "RELATED_TO", MATCH("Entity", id = INT(Relation.target_id))):
"""
    store = run(spark, schema, [
        ("Entity", pd.DataFrame({"id": [1, 2]})),
        ("Relationship", pd.DataFrame({"source_id": [1], "target_id": [2]})),
    ])
    assert store.edges.count() == 2


def test_merge_nodes(spark):
    store = run(spark, ENTITY_SCHEMA, [
        ("Entity", pd.DataFrame({"id": [1, 2, 1, 2]})),
    ])
    assert store.nodes.count() == 2


def test_merge_relationships(spark):
    schema = ENTITY_SCHEMA + """
ENTITY("Relation"):
    MERGE_RELATIONSHIPS(RELATIONSHIP(MATCH("Entity", id = INT(Relation.source_id)), "RELATED_TO", MATCH("Entity", id = INT(Relation.target_id)))):
"""
    store = run(spark, schema, [
        ("Entity", pd.DataFrame({"id": [1, 2]})),
        ("Relation", pd.DataFrame({"source_id": [1, 1], "target_id": [2, 2]})),
    ])
    assert store.edges.count() == 1


def test_merge_relationships_same_resource(spark):
    """Two MERGE_RELATIONSHIPS rules producing the same (src,type,dst) ⇒ 1."""
    schema = ENTITY_SCHEMA + """
ENTITY("Relation"):
    MERGE_RELATIONSHIPS(RELATIONSHIP(MATCH("Entity", id = INT(Relation.source_id)), "RELATED_TO", MATCH("Entity", id = INT(Relation.target_id)))):
    MERGE_RELATIONSHIPS(RELATIONSHIP(MATCH("Entity", id = INT(Relation.source_id)), "RELATED_TO", MATCH("Entity", id = INT(Relation.target_id)))):
"""
    store = run(spark, schema, [
        ("Entity", pd.DataFrame({"id": [1, 2]})),
        ("Relation", pd.DataFrame({"source_id": [1], "target_id": [2]})),
    ])
    assert store.edges.count() == 1


def test_concurrency_exact_counts(spark):
    """Reference test_concurrency.py:26-44: 120 parallel FROM edges + one
    merged TO edge per unique pair, invariant to partitioning (stand-in for
    12-worker runs)."""
    schema = """
ENTITY("Entity"):
  NODE("Test"):
    + uid = Entity.uid

ENTITY("Relationship"):
  RELATIONSHIP(MATCH("Test", uid=Relationship.to), "FROM", MATCH("Test", uid=Relationship.from)):
  MERGE_RELATIONSHIPS(RELATIONSHIP(MATCH("Test", uid=Relationship.from), "TO", MATCH("Test", uid=Relationship.to))):
"""
    entities = pd.DataFrame({"uid": range(40)})
    relations = pd.DataFrame(
        {"from": list(range(20)) * 6, "to": [i + 20 for i in range(20) for _ in range(6)]}
    )
    unique_pairs = len(relations.drop_duplicates())
    for repartition in (1, 12):
        store = run(
            spark, schema,
            [("Entity", entities), ("Relationship", relations)],
            repartition=repartition,
        )
        assert store.nodes.count() == 40
        assert store.edges.count() == 120 + unique_pairs
        assert store.match_relationships("FROM").count() == 120
        assert store.match_relationships("TO").count() == unique_pairs


def test_parallel_and_merged_rels_with_pk(spark):
    """Reference schema_end_to_end PersonParallel: '- pk' ⇒ parallel edges,
    '+ pk' ⇒ merged edge (test_end_to_end result_parallel golden)."""
    schema = """
ENTITY("Species"):
    NODE("Species") s:
        + Name = Species.name

ENTITY("PersonParallel"):
    NODE("Person") person:
        + ID = INT(PersonParallel.ID)
    RELATIONSHIP(MATCH("Person", ID = 1), "likes_parallel", MATCH("Species", Name="virginica")):
        - pk = INT(PersonParallel.ID)
    RELATIONSHIP(MATCH("Person", ID = 1), "likes_merged", MATCH("Species", Name="virginica")):
        + pk = 1
"""
    store = run(spark, schema, [
        ("Species", pd.DataFrame({"name": ["virginica", "setosa"]})),
        ("PersonParallel", pd.DataFrame({"ID": [1, 2, 3, 4]})),
    ])
    assert store.match_relationships("likes_parallel").count() == 4
    assert store.match_relationships("likes_merged").count() == 1
    merged = store.match_relationships("likes_merged").collect()[0]
    assert merged["pk"] == 1
