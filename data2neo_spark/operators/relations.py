"""Pattern-based (subj, pred, obj) relation extraction from text.

The north-rule pipeline needs triples FROM the page text, not only from
relational rows: this is the lexico-syntactic pattern stage (the Hearst-
pattern family — public knowledge from the open-IE literature), matching
a small curated set of surface patterns per predicate and emitting one
triple per match. It feeds the same ENTITY/RELATIONSHIP machinery as the
reference's row-born triples (`data2neo/core/factories/factory.py:190-242`)
— extraction is simply another triple source.

Execution shape: one corpus scan per pattern (the pattern set is small
and curated by design — single digits), each a native
``regexp_extract_all`` whose match array feeds EXACTLY ONE ``explode``
(the WSCG no-CSE contract); capture groups are then re-extracted from
the SHORT match strings, never from the full document. Zero shuffles
until the final distinct. No Python in the loop — Java regex end-to-end,
patterns restricted to the Java∩RE2-safe subset (same rule as the PII
regexes in operators/text.py) so a SQL oracle replays matches exactly.
"""

from __future__ import annotations

from functools import reduce
from typing import List, Optional, Tuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["DEFAULT_PATTERNS", "extract_svo"]

# (predicate, regex with exactly two capture groups: subj, obj).
# Java∩RE2-safe: char classes, \w, non-capturing groups only.
DEFAULT_PATTERNS: List[Tuple[str, str]] = [
    ("ACQUIRED", r"(\w+) acquired (\w+)"),
    ("BASED_IN", r"(\w+) is based in (\w+)"),
    ("CEO_OF", r"(\w+), chief executive of (\w+)"),
    ("FOUNDED", r"(\w+) founded (\w+)"),
]


def extract_svo(
    docs: DataFrame,
    doc_col: str = "doc_id",
    text_col: str = "text",
    patterns: Optional[List[Tuple[str, str]]] = None,
) -> DataFrame:
    """(doc_id, subj, pred, obj) — one distinct triple per document per
    pattern match. Overlapping matches follow Java's leftmost-first
    scan, which the RE2-safe pattern subset keeps identical to the SQL
    engines' semantics."""
    pats = patterns or DEFAULT_PATTERNS
    branches = []
    for pred, pat in pats:
        b = docs.select(
            F.col(doc_col).alias("doc_id"),
            # full-text regex runs once; explode is its only consumer
            F.explode(
                F.regexp_extract_all(F.col(text_col), F.lit(pat), F.lit(0))
            ).alias("m"),
        ).select(
            "doc_id",
            F.regexp_extract("m", pat, 1).alias("subj"),
            F.lit(pred).alias("pred"),
            F.regexp_extract("m", pat, 2).alias("obj"),
        )
        branches.append(b)
    return reduce(lambda x, y: x.unionByName(y), branches).distinct()
