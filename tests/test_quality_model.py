"""Linear quality-classifier head: deterministic training, exact integer
scoring parity (python vs Spark), sensible generalization."""

import pandas as pd
from pyspark.sql import functions as F

from data2neo_spark.operators import quality_model as Q


def test_training_deterministic_and_separates_fixture():
    w1 = Q.trained_weights()
    Q.trained_weights.cache_clear()
    w2 = Q.trained_weights()
    assert w1 == w2
    for lbl, t in Q.TRAIN_FIXTURE:
        assert (Q.score_py(t) > 0) == bool(lbl), t


def test_spark_scores_match_python_exactly(spark):
    texts = [t for _l, t in Q.TRAIN_FIXTURE] + [
        "the quick brown fox jumps over the lazy dog in the garden",
        "zz zz zz zz 99 99 99 99 buy buy buy",
        "",
    ]
    df = spark.createDataFrame(
        pd.DataFrame({"i": range(len(texts)), "text": texts})
    )
    got = {r["i"]: (r["quality_logit_micro"], r["quality_keep"])
           for r in Q.with_quality_score(df).collect()}
    for i, t in enumerate(texts):
        s = Q.score_py(t)
        assert got[i] == (s, s > 0), (i, t)


def test_generalizes_beyond_fixture(spark):
    rows = [
        (0, 1, "in the evening the engineers review the plan and discuss the results of the test run"),
        (1, 0, "win win win free free free 777 777 777 click click click now now now"),
    ]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["i", "want", "text"]))
    got = {r["i"]: r["quality_keep"] for r in Q.with_quality_score(df).collect()}
    assert got == {0: True, 1: False}


def test_scoring_plan_is_zero_shuffle(spark):
    df = spark.range(5).selectExpr("cast(id as string) text")
    plan = Q.with_quality_score(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "Python" not in plan


def test_clean_corpus_quality_model_gate(spark):
    from data2neo_spark.operators.corpus import clean_corpus

    rows = [
        (0, "in the evening the engineers review the plan and discuss the results of the test run"),
        (1, "win win win free free free 777 click click click now now now yes yes"),
    ]
    docs = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))
    kept, report = clean_corpus(docs, min_words=5, min_quality_logit=0)
    assert {r["doc_id"] for r in kept.collect()} == {0}
    rep = {r["stage"]: (r["rows_in"], r["rows_out"]) for r in report.collect()}
    assert rep["quality"] == (2, 1)
