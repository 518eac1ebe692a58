"""Supplies (identifier) integrity regressions.

The reference keys supplies per-row at node-construction time
(/root/reference/data2neo/core/resource.py:23-27, factory.py:292-294): a row
whose NODE rule was dropped by a subgraph preprocessor registers NO supply,
and a later rule mutating the row does not retroactively change an earlier
supply. The columnar engine must match: supplies are derived from the same
row state the node rule saw, and dropped rows carry a NULL supply uid (so
pass 2 emits no edge, where the reference raises KeyError per row).
"""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from data2neo_spark import Converter, register_subgraph_preprocessor


@register_subgraph_preprocessor
def sup_drop_odd(resource):
    if resource["id"] % 2 == 1:
        return None
    return resource


@register_subgraph_preprocessor
def sup_mutate_id(resource):
    resource["id"] = resource["id"] + 1000
    return resource


def _ids_df(spark, ids):
    return spark.createDataFrame(pd.DataFrame({"id": ids}))


def test_sg_pre_drop_produces_no_dangling_edges(spark):
    """A row dropped by a NODE rule's preprocessor must not produce edges
    referencing the never-created node (reference: KeyError on missing
    supply)."""
    schema = """
ENTITY("t"):
  sup_drop_odd(NODE("K")) k:
    + id = INT(t.id)
  NODE("ALL") a:
    + aid = INT(t.id)
  RELATIONSHIP(a, "SAW", k):
"""
    store = Converter(schema, [("t", _ids_df(spark, [1, 2, 3, 4]))])(spark)
    k_uids = {
        r["_uid"] for r in store.match_nodes("K").select("_uid").collect()
    }
    assert len(k_uids) == 2  # ids 2 and 4
    edges = store.edges.collect()
    # only the two surviving K rows have edges, none dangling
    assert len(edges) == 2
    assert all(e["_dst_uid"] in k_uids for e in edges)


def test_self_edges_after_drop(spark):
    """RELATIONSHIP(k, ..., k) over a dropping rule: dropped rows emit no
    edge at either endpoint."""
    schema = """
ENTITY("t"):
  sup_drop_odd(NODE("K")) k:
    + id = INT(t.id)
  RELATIONSHIP(k, "SELF", k):
"""
    store = Converter(schema, [("t", _ids_df(spark, [1, 2, 3, 4]))])(spark)
    node_uids = {r["_uid"] for r in store.nodes.select("_uid").collect()}
    assert store.nodes.count() == 2
    edges = store.edges.collect()
    assert len(edges) == 2
    for e in edges:
        assert e["_src_uid"] in node_uids and e["_dst_uid"] in node_uids


def test_later_rule_mutation_does_not_skew_supply(spark):
    """A later rule's preprocessor mutating an earlier rule's pk input must
    not change the earlier supply's uid (reference: supplies registered at
    construction time, before later factories run)."""
    schema = """
ENTITY("t"):
  NODE("Orig") o:
    + id = INT(t.id)
  sup_mutate_id(NODE("Shifted")) s:
    + sid = INT(t.id)
  RELATIONSHIP(o, "PAIRS", s):
"""
    store = Converter(schema, [("t", _ids_df(spark, [1, 2]))])(spark)
    orig_uids = {r["_uid"] for r in store.match_nodes("Orig").collect()}
    shifted = {r["sid"] for r in store.match_nodes("Shifted").collect()}
    assert shifted == {1001, 1002}
    edges = store.edges.collect()
    assert len(edges) == 2
    # src side must reference the ORIGINAL node uids (id=1,2), not a uid
    # recomputed from the mutated row (id=1001,1002)
    assert {e["_src_uid"] for e in edges} == orig_uids
    assert {e["_src_key"] for e in edges} == {"1", "2"}


def test_null_pk_rows_are_dropped_and_logged(spark, tmp_path):
    """Merge-mode rows with a NULL pk are dropped from the node table AND
    surfaced in the lineage counters (reference raises per row,
    graph_elements.py:251-252)."""
    from data2neo_spark import GraphStore

    df = spark.createDataFrame(
        pd.DataFrame({"id": [1.0, None, 3.0, None]})
    )
    schema = """
ENTITY("t"):
  NODE("N") n:
    + id = INT(t.id)
  RELATIONSHIP(MATCH("N", id = INT(t.id)), "LOOP", n):
"""
    store = GraphStore(spark, path=str(tmp_path / "store"))
    Converter(schema, [("t", df)], store=store)(spark)
    assert store.nodes.count() == 2
    stages = [s for s in store.counters["stages"] if s["stage"] == "null_pk_dropped"]
    assert stages and stages[0]["n_rows"] == 2
    # null-supply rows emit no edges either
    assert store.edges.count() == 2


def test_forced_shuffle_match_equals_broadcast(spark):
    """A7: forcing the shuffle+salt MATCH path yields the exact same edge
    set as the broadcast path."""
    df = spark.createDataFrame(
        pd.DataFrame({"src": [1, 1, 2, 2, 2, 3], "dst": [10, 11, 10, 12, 13, 10]})
    )
    nodes_schema = """
ENTITY("t"):
  NODE("S") s:
    + id = INT(t.src)
  NODE("D") d:
    + id = INT(t.dst)
  RELATIONSHIP(MATCH("S", id = INT(t.src)), "HIT", MATCH("D", id = INT(t.dst))):
"""
    def run(**kw):
        store = Converter(nodes_schema, [("t", df)], **kw)(spark)
        return {
            (r["_src_key"], r["_dst_key"]) for r in store.edges.collect()
        }

    broadcast = run(broadcast_nodes=True)
    shuffled = run(broadcast_nodes=False, match_salt_buckets=4)
    auto_salt = run(broadcast_nodes=False)  # salt defaults on for shuffle
    assert broadcast == shuffled == auto_salt
    assert len(broadcast) == 6


def test_byte_based_broadcast_decision(spark):
    """The MATCH join strategy is decided by estimated node-table BYTES:
    a tiny byte cap forces the shuffle+salt path even though the row count
    is small (the old row-count heuristic would have broadcast a wide
    table into the driver)."""
    df = spark.createDataFrame(
        pd.DataFrame({
            "src": [1, 2, 3],
            "dst": [10, 11, 12],
            "payload": ["x" * 2000] * 3,   # wide property
        })
    )
    schema = """
ENTITY("t"):
  NODE("S") s:
    + id = INT(t.src)
    - payload = t.payload
  NODE("D") d:
    + id = INT(t.dst)
  RELATIONSHIP(MATCH("S", id = INT(t.src)), "HIT", MATCH("D", id = INT(t.dst))):
"""
    def plan_of(store):
        return store.edges._sc._jvm.PythonSQLUtils.explainString(
            store.edges._jdf.queryExecution(), "formatted"
        )

    # default byte budget: broadcast
    s1 = Converter(schema, [("t", df)])(spark)
    assert "BroadcastHashJoin" in plan_of(s1)
    # 1-byte budget: auto-falls back to the salted shuffle join
    s2 = Converter(schema, [("t", df)], broadcast_bytes_limit=1)(spark)
    # same answers either way
    r1 = {(r["_src_key"], r["_dst_key"]) for r in s1.edges.collect()}
    r2 = {(r["_src_key"], r["_dst_key"]) for r in s2.edges.collect()}
    assert r1 == r2 and len(r1) == 3
    # the salt column machinery ran: the logical plan mentions the salt
    assert "_salt" in s2.edges._jdf.queryExecution().logical().toString()
