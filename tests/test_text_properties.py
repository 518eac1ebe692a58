"""Property-based tests for the text operators (hypothesis): invariants
that hold for ANY input, not just the crafted fixtures —

* chunk_documents covers every token and reconstructs the document exactly
  when de-overlapped;
* dedupe_lines is idempotent and never produces a duplicate line;
* remove_shared_ngrams with a single document removes nothing (no window
  can be shared across >= 2 docs);
* redact_pii leaves PII-free text byte-identical and is idempotent on its
  own output (redaction tokens contain no match material).

One Spark action per example → capped example counts.
"""

import string

import pandas as pd
from hypothesis import HealthCheck, given, settings, strategies as st

word = st.text(alphabet=string.ascii_lowercase, min_size=1, max_size=6)
doc = st.lists(word, min_size=1, max_size=40).map(" ".join)
lines_doc = st.lists(
    st.lists(word, min_size=1, max_size=4).map(" ".join),
    min_size=1, max_size=8,
).map("\n".join)

_SETTINGS = dict(
    max_examples=12, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@given(text=doc, max_tokens=st.integers(8, 20), overlap=st.integers(0, 7))
@settings(**_SETTINGS)
def test_chunks_reconstruct(spark, text, max_tokens, overlap):
    from data2neo_spark.operators.text import chunk_documents

    df = spark.createDataFrame(pd.DataFrame({"doc_id": [0], "text": [text]}))
    chunks = sorted(
        (r["chunk_id"], r["chunk_text"], r["n_tokens"])
        for r in chunk_documents(
            df, "doc_id", max_tokens=max_tokens, overlap=overlap
        ).collect()
    )
    stride = max_tokens - overlap
    words = text.split(" ")
    rebuilt = []
    for cid, ctext, ntok in chunks:
        cwords = ctext.split(" ")
        assert len(cwords) == ntok
        assert cwords == words[cid * stride: cid * stride + max_tokens]
        rebuilt.extend(cwords if cid == 0 else cwords[overlap:])
    assert rebuilt == words


@given(text=lines_doc)
@settings(**_SETTINGS)
def test_dedupe_lines_idempotent(spark, text):
    from data2neo_spark.operators.text import dedupe_lines

    df = spark.createDataFrame(pd.DataFrame({"doc_id": [0], "text": [text]}))
    once = dedupe_lines(df).collect()[0]["text_deduped"]
    kept = once.split("\n")
    assert len(kept) == len(set(kept))          # no duplicates survive
    assert [l for l in text.split("\n") if True].index(kept[0]) == 0 if kept else True
    df2 = spark.createDataFrame(pd.DataFrame({"doc_id": [0], "text": [once]}))
    assert dedupe_lines(df2).collect()[0]["text_deduped"] == once


@given(text=doc)
@settings(**_SETTINGS)
def test_remove_shared_single_doc_noop(spark, text):
    from data2neo_spark.operators.text import remove_shared_ngrams

    df = spark.createDataFrame(pd.DataFrame({"doc_id": [0], "text": [text]}))
    row = remove_shared_ngrams(df, "doc_id", n=3).collect()[0]
    assert row["text_cleaned"] == text
    assert row["n_tokens_removed"] == 0


@given(text=doc)
@settings(**_SETTINGS)
def test_redact_pii_clean_text_unchanged_and_idempotent(spark, text):
    from data2neo_spark.operators.text import redact_pii

    df = spark.createDataFrame(pd.DataFrame({"doc_id": [0], "text": [text]}))
    row = redact_pii(df).collect()[0]
    assert row["redacted"] == text              # lowercase words: no PII
    withpii = text + " x@y.io 10.0.0.1 +12345678"
    df2 = spark.createDataFrame(
        pd.DataFrame({"doc_id": [0], "text": [withpii]})
    )
    red = redact_pii(df2).collect()[0]["redacted"]
    assert red == text + " <EMAIL> <IPV4> <PHONE>"
    df3 = spark.createDataFrame(pd.DataFrame({"doc_id": [0], "text": [red]}))
    assert redact_pii(df3).collect()[0]["redacted"] == red


@given(w=st.text(alphabet=string.ascii_lowercase + "0123456789#", max_size=30))
@settings(max_examples=200, deadline=None)
def test_bpe_leftmost_single_merge_equals_merge_all_property(w):
    """The SQL-replayable one-merge-per-step encoder equals the public
    merge-all-per-iteration algorithm on ARBITRARY strings (the module
    docstring's rank argument, property-tested)."""
    from data2neo_spark.operators import bpe
    from tests.test_bpe import _encode_merge_all

    merges = bpe.default_merges()
    ranks = {p: i for i, p in enumerate(merges)}
    ours = bpe.encode_word(w, ranks)
    ref = _encode_merge_all(w, merges)
    assert ours == ref
    assert "".join(ours) == w            # lossless


@given(toks=st.lists(st.integers(min_value=0, max_value=50),
                     min_size=1, max_size=30),
       budget=st.integers(min_value=1, max_value=40),
       k=st.integers(min_value=1, max_value=5))
@settings(**_SETTINGS)
def test_pack_sequences_matches_python_cumsum(spark, toks, budget, k):
    """Packing equals the sequential python cumsum for any token counts,
    any budget, and ANY logical bucket count."""
    from data2neo_spark.operators.text import pack_sequences

    docs = spark.createDataFrame(pd.DataFrame({
        "doc_id": range(len(toks)),
        "text": [" ".join(["w"] * max(n, 1)) for n in toks],
    }))
    rows = {r["doc_id"]: r
            for r in pack_sequences(docs, "doc_id", budget, n_buckets=k).collect()}
    cum = 0
    for i, n in enumerate(toks):
        n = max(n, 1)                    # '' still splits to one token
        assert rows[i]["cum_before"] == cum
        assert rows[i]["seq_id"] == cum // budget
        assert rows[i]["offset_in_seq"] == cum % budget
        cum += n


@settings(**_SETTINGS)
@given(st.lists(st.tuples(
    st.sampled_from(["http", "https", "HTTP", "HTTPS"]),
    st.text(alphabet=string.ascii_letters + "0123456789", min_size=1, max_size=8),
    st.lists(st.text(alphabet=string.ascii_lowercase + "0123456789",
                     min_size=1, max_size=5), min_size=0, max_size=3),
    st.lists(st.tuples(
        st.sampled_from(["a", "b", "utm_source", "fbclid", "z9"]),
        st.text(alphabet=string.ascii_lowercase, min_size=0, max_size=4),
    ), min_size=0, max_size=4),
), min_size=1, max_size=6))
def test_canonical_url_idempotent(spark, parts):
    """canonical_url is a projection: applying it to its own output is a
    no-op (idempotence), for arbitrary scheme case, paths, and
    tracking/real parameter mixes."""
    from pyspark.sql import functions as F
    from data2neo_spark.operators.web import canonical_url

    urls = []
    for scheme, host, path, params in parts:
        u = f"{scheme}://{host}.example/" + "/".join(path)
        if params:
            u += "?" + "&".join(f"{k}={v}" for k, v in params)
        urls.append(u)
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    once = df.select(canonical_url(F.col("url")).alias("url"))
    twice = once.select(canonical_url(F.col("url")).alias("url"))
    assert [r.url for r in once.collect()] == [r.url for r in twice.collect()]


@settings(**_SETTINGS)
@given(st.lists(st.tuples(st.integers(0, 3), st.integers(0, 10_000)),
                min_size=1, max_size=30))
def test_sessionize_partition_invariance(spark, events):
    """Session assignment is a pure function of (key, ts) — identical
    under any physical partitioning and input order."""
    import datetime as dt
    from data2neo_spark.operators.temporal import sessionize

    t0 = dt.datetime(2024, 1, 1)
    rows = [(k, t0 + dt.timedelta(seconds=s), i)
            for i, (k, s) in enumerate(events)]
    df = spark.createDataFrame(rows, "k long, ts timestamp, eid long")
    a = {r.eid: r.session_seq
         for r in sessionize(df, ["k"], "ts", 300, order_cols=["eid"]).collect()}
    b = {r.eid: r.session_seq
         for r in sessionize(df.repartition(7), ["k"], "ts", 300,
                             order_cols=["eid"]).collect()}
    assert a == b


@settings(**_SETTINGS)
@given(st.lists(st.integers(0, 50), min_size=1, max_size=40),
       st.integers(2, 16))
def test_hll_merge_law(spark, values, p_half):
    """HLL registers of a union == max-merge of the parts' registers —
    for arbitrary multisets and any split point."""
    from pyspark.sql import functions as F
    from data2neo_spark.operators.sketch import hll_registers

    df = spark.createDataFrame([(str(v),) for v in values], "v string")
    half = len(values) // 2
    a = spark.createDataFrame([(str(v),) for v in values[:half]] or [("_",)],
                              "v string")
    b = spark.createDataFrame([(str(v),) for v in values[half:]] or [("_",)],
                              "v string")
    whole = {(r.register, r.rho)
             for r in hll_registers(df.unionAll(
                 spark.createDataFrame([("_",)], "v string")), "v", p=6).collect()}
    merged = (
        hll_registers(a, "v", p=6)
        .unionAll(hll_registers(b, "v", p=6))
        .unionAll(hll_registers(
            spark.createDataFrame([("_",)], "v string"), "v", p=6))
        .groupBy("register").agg(F.max("rho").alias("rho"))
    )
    assert {(r.register, r.rho) for r in merged.collect()} == whole
