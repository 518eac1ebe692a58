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
