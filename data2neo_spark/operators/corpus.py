"""Corpus cleaning — the canonical training-data preparation pipeline.

Composes the text-analysis and dedup operators into the standard CC-style
filter chain: quality gate → language gate → exact dedup → (optional)
near-dup removal. Every stage is a DataFrame transform; the output is the
kept corpus plus a per-stage attrition report.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import exact_duplicates, minhash_lsh_duplicates
from .text import with_langid, with_quality_features


def clean_corpus(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_words: int = 10,
    max_words: int = 100_000,
    max_digit_ratio: float = 0.3,
    keep_langs: Optional[List[str]] = None,
    near_dedup: bool = False,
    near_threshold: float = 0.8,
) -> Tuple[DataFrame, DataFrame]:
    """Returns (kept_docs, report).

    kept_docs: the surviving rows of ``docs`` (original columns).
    report: one row per stage — (stage, rows_in, rows_out).

    Exact dedup keeps the smallest id per identical text (deterministic).
    Near-dedup (MinHash+LSH, verified Jaccard) drops the larger id of each
    near-dup pair — transitively safe because pairs are recomputed against
    the exact-deduped set.
    """
    report_rows = []
    n0 = docs.count()

    q = with_quality_features(docs, text_col)
    q = q.where(
        (F.col("n_words") >= min_words)
        & (F.col("n_words") <= max_words)
        & (F.col("digit_ratio") <= max_digit_ratio)
    )
    n1 = q.count()
    report_rows.append(("quality", n0, n1))

    if keep_langs is not None:
        q = with_langid(q, text_col).where(F.col("lang_pred").isin(keep_langs))
        n2 = q.count()
    else:
        n2 = n1
    report_rows.append(("langid", n1, n2))

    keepers = exact_duplicates(q, id_col, text_col).select(
        F.col("keeper_id").alias(id_col)
    )
    q = q.join(keepers, id_col, "left_semi")
    n3 = q.count()
    report_rows.append(("exact_dedup", n2, n3))

    if near_dedup:
        pairs = minhash_lsh_duplicates(q, id_col, text_col, threshold=near_threshold)
        drop = pairs.select(F.col("id_b").alias(id_col)).distinct()
        q = q.join(drop, id_col, "left_anti")
        n4 = q.count()
    else:
        n4 = n3
    report_rows.append(("near_dedup", n3, n4))

    kept = q.select(*[c for c in docs.columns])
    spark = docs.sparkSession
    report = spark.createDataFrame(
        report_rows, "stage string, rows_in long, rows_out long"
    )
    return kept, report
