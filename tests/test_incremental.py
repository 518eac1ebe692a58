"""Incremental (partition-pruned) upsert for bucketed disk stores —
SURVEY §2.6 M5: an increment must cost O(|batch| + touched buckets), not a
full-store rewrite. Verified by comparing the parquet bucket directories'
file sets across runs: untouched buckets keep their exact files."""

import os

import pandas as pd
import pytest

from pyspark.sql import functions as F

from data2neo_spark import Converter, GraphStore

SCHEMA = """
ENTITY("t"):
  NODE("Item") i:
    + id = INT(t.id)
    - name = t.name
  NODE("Cat") c:
    + cat = t.cat
  RELATIONSHIP(i, "IN_CAT", c):
"""


def _df(spark, ids, tag):
    return spark.createDataFrame(pd.DataFrame({
        "id": ids,
        "name": [f"{tag}-{i}" for i in ids],
        "cat": [f"c{i % 3}" for i in ids],
    }))


def _bucket_files(path, table):
    out = {}
    base = os.path.join(path, table)
    for d in os.listdir(base):
        if d.startswith("_nbucket="):
            out[d] = sorted(os.listdir(os.path.join(base, d)))
    return out


def test_incremental_touches_only_batch_buckets(spark, tmp_path):
    path = str(tmp_path / "store")
    store = GraphStore(spark, path=path, buckets=16)
    Converter(SCHEMA, [("t", _df(spark, list(range(64)), "v1"))], store=store)(spark)
    nodes_before = _bucket_files(path, "nodes")
    edges_before = _bucket_files(path, "edges")
    assert len(nodes_before) > 4  # bucketed layout on disk

    # small increment: 3 updated rows
    Converter(SCHEMA, [("t", _df(spark, [5, 6, 7], "v2"))], store=store,
              run_id=1)(spark)
    nodes_after = _bucket_files(path, "nodes")

    changed = [b for b in nodes_before if nodes_after.get(b) != nodes_before[b]]
    unchanged = [b for b in nodes_before if nodes_after.get(b) == nodes_before[b]]
    # the 3+2 touched element buckets changed; the rest kept their exact files
    assert changed and len(changed) <= 6
    assert len(unchanged) >= len(nodes_before) - 6

    # values: updated rows overwritten, untouched rows intact, counts stable
    names = {r["id"]: r["name"] for r in store.match_nodes("Item").collect()}
    assert names[5] == "v2-5" and names[6] == "v2-6" and names[7] == "v2-7"
    assert names[4] == "v1-4" and len(names) == 64
    assert store.match_nodes("Cat").count() == 3

    edges_after = _bucket_files(path, "edges")
    e_changed = [b for b in edges_before if edges_after.get(b) != edges_before[b]]
    assert e_changed and len(e_changed) <= 3  # ghostless create eids: 3 rows
    assert store.edges.count() == 64 + 3  # create-mode edges append


def test_incremental_idempotent_rerun(spark, tmp_path):
    """Re-running the SAME batch (same run_id) leaves counts unchanged —
    the checkpoint/resume contract on the incremental path."""
    path = str(tmp_path / "store")
    store = GraphStore(spark, path=path, buckets=8)
    Converter(SCHEMA, [("t", _df(spark, list(range(20)), "v1"))], store=store)(spark)
    n0, e0 = store.nodes.count(), store.edges.count()
    Converter(SCHEMA, [("t", _df(spark, list(range(20)), "v1"))], store=store)(spark)
    assert store.nodes.count() == n0
    assert store.edges.count() == e0


def test_incremental_store_reload(spark, tmp_path):
    """A reopened bucketed store exposes BUCKET-free tables and keeps
    accepting increments."""
    path = str(tmp_path / "store")
    store = GraphStore(spark, path=path, buckets=8)
    Converter(SCHEMA, [("t", _df(spark, list(range(10)), "v1"))], store=store)(spark)

    reopened = GraphStore(spark, path=path, buckets=8)
    assert "_nbucket" not in reopened.nodes.columns
    assert reopened.nodes.count() == 10 + 3
    Converter(SCHEMA, [("t", _df(spark, [3], "v3"))], store=reopened, run_id=2)(spark)
    names = {r["id"]: r["name"] for r in reopened.match_nodes("Item").collect()}
    assert names[3] == "v3-3" and names[2] == "v1-2"


def test_signature_store_matches_inline_banding(spark, tmp_path):
    """incremental dedup via a persisted band_signatures frame returns
    exactly the pairs inline corpus banding returns — the store is a pure
    cache, not an approximation."""
    from data2neo_spark.operators.dedup import (
        band_signatures, incremental_near_duplicates,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    new = docs.where(F.col("doc_id") % 2 == 1)
    corpus = docs.where(F.col("doc_id") % 2 == 0)
    inline = {(r["id_a"], r["id_b"], r["jaccard"]) for r in
              incremental_near_duplicates(
                  new, corpus, "doc_id", threshold=0.2,
                  num_hashes=32, bands=8).collect()}
    path = str(tmp_path / "bands")
    band_signatures(corpus, "doc_id", num_hashes=32, bands=8) \
        .write.parquet(path)
    stored = spark.read.parquet(path)
    via_store = {(r["id_a"], r["id_b"], r["jaccard"]) for r in
                 incremental_near_duplicates(
                     new, corpus, "doc_id", threshold=0.2,
                     num_hashes=32, bands=8, corpus_bands=stored).collect()}
    assert via_store == inline and inline


def test_signature_store_append_flow(spark, tmp_path):
    """The daily flow: band the new batch alone, check it against the
    store, then append its bands — next day's store covers both."""
    from data2neo_spark.operators.dedup import (
        band_signatures, minhash_lsh_candidates_between,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    day0 = docs.where(F.col("doc_id") % 3 == 0)
    day1 = docs.where(F.col("doc_id") % 3 == 1)
    day2 = docs.where(F.col("doc_id") % 3 == 2)
    path = str(tmp_path / "bands")
    band_signatures(day0, "doc_id", num_hashes=32, bands=8) \
        .write.parquet(path)
    # day1 vs store(day0), then append day1
    c1 = minhash_lsh_candidates_between(
        day1, day0, "doc_id", num_hashes=32, bands=8,
        corpus_bands=spark.read.parquet(path)).collect()
    band_signatures(day1, "doc_id", num_hashes=32, bands=8) \
        .write.mode("append").parquet(path)
    # day2 vs store(day0+day1) equals inline banding of the union
    got = {(r["new_id"], r["corpus_id"]) for r in
           minhash_lsh_candidates_between(
               day2, day0.unionByName(day1), "doc_id", num_hashes=32,
               bands=8, corpus_bands=spark.read.parquet(path)).collect()}
    want = {(r["new_id"], r["corpus_id"]) for r in
            minhash_lsh_candidates_between(
                day2, day0.unionByName(day1), "doc_id", num_hashes=32,
                bands=8).collect()}
    assert got == want
