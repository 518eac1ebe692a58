"""IDRegistry (north-star resource-ID registry): monotonic, dense, stable
surrogate ids across batches; sorted vs partitioned assignment; crash-safe
persistence."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from data2neo_spark import IDRegistry


def _df(spark, keys):
    return spark.createDataFrame(pd.DataFrame({"k": keys}))


def test_sorted_assignment_dense_and_stable(spark):
    reg = IDRegistry(spark)
    reg.register(_df(spark, ["b", "a", "c", "a", None]), "k")
    m1 = {r["key"]: r["sid"] for r in reg.table.collect()}
    assert m1 == {"a": 1, "b": 2, "c": 3}          # dense, key-ordered
    # second batch: existing keys keep ids, new keys extend monotonically
    reg.register(_df(spark, ["c", "d", "b", "e"]), "k")
    m2 = {r["key"]: r["sid"] for r in reg.table.collect()}
    assert m2 == {"a": 1, "b": 2, "c": 3, "d": 4, "e": 5}
    # idempotent re-register
    reg.register(_df(spark, ["d", "e"]), "k")
    assert {r["key"]: r["sid"] for r in reg.table.collect()} == m2


def test_partitioned_assignment_dense_monotonic_deterministic(spark):
    keys = [f"key{i:04d}" for i in range(500)]
    reg = IDRegistry(spark)
    reg.register(_df(spark, keys), "k", assign="partitioned", num_partitions=8)
    m1 = {r["key"]: r["sid"] for r in reg.table.collect()}
    assert sorted(m1.values()) == list(range(1, 501))   # dense, no gaps
    # deterministic: a fresh registry assigns identical ids
    reg2 = IDRegistry(spark)
    reg2.register(_df(spark, list(reversed(keys))), "k",
                  assign="partitioned", num_partitions=8)
    assert {r["key"]: r["sid"] for r in reg2.table.collect()} == m1
    # new batch ids sit strictly above all prior ids
    reg.register(_df(spark, ["zz1", "zz2"]), "k",
                 assign="partitioned", num_partitions=8)
    m2 = {r["key"]: r["sid"] for r in reg.table.collect()}
    assert set(m2.items()) >= set(m1.items())
    assert {m2["zz1"], m2["zz2"]} == {501, 502}


def test_registry_persistence_and_lookup(spark, tmp_path):
    d = str(tmp_path / "reg")
    reg = IDRegistry(spark, path=d)
    reg.register(_df(spark, ["x", "y"]), "k")
    # reload from disk: max_id and mapping survive
    reg2 = IDRegistry(spark, path=d)
    assert reg2.max_id == 2
    reg2.register(_df(spark, ["y", "z"]), "k")
    m = {r["key"]: r["sid"] for r in reg2.table.collect()}
    assert m == {"x": 1, "y": 2, "z": 3}
    out = reg2.lookup(_df(spark, ["z", "nope"]), "k").collect()
    got = {r["k"]: r["sid"] for r in out}
    assert got == {"z": 3, "nope": None}


def test_register_batch_single_materialize(spark):
    reg = IDRegistry(spark)
    reg.register_batch([
        (_df(spark, ["b", "a"]), "k"),
        (_df(spark, ["c", "a", None]), "k"),
    ])
    got = {r["key"]: r["sid"] for r in reg.table.collect()}
    assert got == {"a": 1, "b": 2, "c": 3}
    # batch after batch stays dense + monotone
    reg.register_batch([(_df(spark, ["d", "b"]), "k")])
    got = {r["key"]: r["sid"] for r in reg.table.collect()}
    assert got["d"] == 4 and got["b"] == 2


def test_stale_tmp_dirs_swept_on_init(spark, tmp_path):
    p = str(tmp_path / "reg")
    reg = IDRegistry(spark, path=p)
    reg.register(_df(spark, ["x"]), "k")
    # simulate a crashed write: stranded staging dir
    import os
    os.makedirs(os.path.join(p, "_tmp_registry_123"), exist_ok=True)
    reg2 = IDRegistry(spark, path=p)
    assert not os.path.exists(os.path.join(p, "_tmp_registry_123"))
    assert {r["key"] for r in reg2.table.collect()} == {"x"}


def test_pack_sequences_by_key(spark, tmp_path):
    """String-keyed packing composes registry + pack in one call, keys
    come back attached, and a path-backed registry keeps ids stable
    across batches (existing docs' packing inputs unchanged)."""
    import pandas as pd
    from pyspark.sql import functions as F

    from data2neo_spark import IDRegistry
    from data2neo_spark.operators.text import pack_sequences_by_key

    docs = spark.createDataFrame(pd.DataFrame({
        "url": [f"https://ex.com/{c}" for c in "dacb"],
        "text": ["one two", "three", "four five six", "seven"],
    }))
    out, reg = pack_sequences_by_key(docs, "url", budget=4)
    rows = {r["url"]: r for r in out.collect()}
    assert len(rows) == 4
    # sorted key assignment → packing order is key order: a, b, c, d
    order = sorted(rows, key=lambda u: rows[u]["sid"])
    assert order == sorted(rows)
    cum = 0
    for u in order:
        assert rows[u]["cum_before"] == cum
        cum += rows[u]["n_tokens"]
    # path-backed: second batch extends ids, first batch's sids stable
    reg2 = IDRegistry(spark, path=str(tmp_path / "reg"))
    out1, _ = pack_sequences_by_key(docs, "url", 4, registry=reg2)
    sids1 = {r["url"]: r["sid"] for r in out1.collect()}
    more = spark.createDataFrame(pd.DataFrame({
        "url": ["https://ex.com/zz"], "text": ["eight nine"]}))
    reg3 = IDRegistry(spark, path=str(tmp_path / "reg"))
    out2, _ = pack_sequences_by_key(docs.unionByName(more), "url", 4,
                                    registry=reg3)
    sids2 = {r["url"]: r["sid"] for r in out2.collect()}
    assert all(sids2[u] == s for u, s in sids1.items())
    assert sids2["https://ex.com/zz"] > max(sids1.values())
