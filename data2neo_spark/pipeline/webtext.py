"""Web-text KG-construction pipeline (the BASELINE.json north rule).

Stages (all DataFrame-native):
  pages (url, warc_ts, html, text, lang)
    → extract     html → text (deterministic, byte-identical per url)
    → mention     tokenize + dictionary join (broadcast entity_dict;
                  salting knob for hub surfaces)
    → link        score + canonicalize mentions to entity ids
    → materialize nodes / edges / (subj, pred, obj) triples via the same
                  merge machinery as the schema engine

The small ``mention_triples`` slice runs the same shape over the driver's
``documents`` table with a static term dictionary so the DuckDB oracle can
verify it value-for-value.
"""

from __future__ import annotations

from typing import List, Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# static term dictionary for the oracle-checked slice (kept in sync with
# __spark_entry__.oracle_sql's kg_webtext_mentions)
TERM_DICT: List[str] = [
    "spark", "join", "window", "batch", "stream", "table", "query", "shuffle",
]


def mention_triples(documents: DataFrame, terms: Optional[List[str]] = None) -> DataFrame:
    """Dictionary-based mention detection + linking over a text corpus.

    (Doc:<id>, MENTIONS, Term:<word>) triples, distinct per (doc, term).
    The word explode happens AFTER an `exists` prefilter on the tokenized
    array, so documents with no dictionary hits never reach the shuffle.
    """
    terms = terms if terms is not None else TERM_DICT
    words = F.split(F.col("text"), " ")
    term_arr = F.array(*[F.lit(t) for t in terms])
    hits = documents.select(
        F.col("doc_id"),
        F.array_distinct(
            F.filter(words, lambda w: F.array_contains(term_arr, w))
        ).alias("mentions"),
    ).where(F.size("mentions") > 0)
    return hits.select(
        F.concat(F.lit("Doc:"), F.col("doc_id").cast("string")).alias("subj"),
        F.lit("MENTIONS").alias("pred"),
        F.explode("mentions").alias("term"),
    ).select(
        "subj", "pred", F.concat(F.lit("Term:"), F.col("term")).alias("obj")
    )
