"""Shape validation over the materialized KG (SHACL-lite).

The reference trusts its schema compiler to only produce valid graphs;
at crawl scale the graph ALSO ingests merged/ghost nodes and
dynamically-typed edges (plans/lowering.py P3/K4), so a
post-construction validation pass is the KG twin of corpus quality
gates. Three constraint kinds over the converter's edge frame
(core/store.py edge meta columns):

* ``endpoint_type`` — a predicate must connect the declared primary
  labels (edge rows whose src/dst label differ from the rule violate);
* ``unknown_predicate`` — edges whose type no rule declares;
* ``max_out_degree`` — per-source fan-out cap for a predicate (hub
  blow-ups: a Customer with 10^6 PLACED edges is a crawl artifact).

Shapes are a tiny driver-side rule list, broadcast to one join over the
edge frame — the edge frame is read once, never shuffled for the label
rules; the cardinality rule adds ONE (pred, src) groupBy with map-side
partials. Row-level violations are available for debugging;
``shape_violation_summary`` aggregates to (kind, pred,
n_violations) so the report stays driver-sized at any corpus scale.
"""

from __future__ import annotations

from typing import Dict, List

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..plans import lowering as L


def _rules_frame(spark, rules: List[Dict]) -> DataFrame:
    rows = [
        (
            r["pred"],
            r.get("src_label"),
            r.get("dst_label"),
            int(r["max_out"]) if r.get("max_out") is not None else None,
        )
        for r in rules
    ]
    return spark.createDataFrame(
        rows, "pred string, src_label string, dst_label string, max_out long"
    )


def _ident(label_col: str, key_col: str, uid_col: str):
    return F.concat_ws(
        ":",
        F.col(label_col),
        F.coalesce(F.col(key_col), F.concat(F.lit("#"), F.col(uid_col).cast("string"))),
    )


def validate_edges(store, rules: List[Dict]) -> DataFrame:
    """Row-level violations ``(kind, pred, entity, detail)``.

    ``rules``: dicts with ``pred``, optional ``src_label`` /
    ``dst_label`` (None = unconstrained) and optional ``max_out``.
    """
    spark = store.edges.sparkSession
    rf = F.broadcast(_rules_frame(spark, rules))
    e = store.edges.select(
        F.col(L.RELTYPE).alias("pred"),
        F.col(L.SRC_LABEL).alias("sl"),
        F.col(L.DST_LABEL).alias("dl"),
        _ident(L.SRC_LABEL, L.SRC_KEY, L.SRC_UID).alias("subj"),
        _ident(L.DST_LABEL, L.DST_KEY, L.DST_UID).alias("obj"),
    )
    with_rule = e.join(rf, "pred", "left")

    unknown = with_rule.where(
        F.col("src_label").isNull()
        & F.col("dst_label").isNull()
        & F.col("max_out").isNull()
    ).select(
        F.lit("unknown_predicate").alias("kind"),
        "pred",
        F.col("subj").alias("entity"),
        F.concat(F.lit("-> "), F.col("obj")).alias("detail"),
    )

    bad_type = with_rule.where(
        (F.col("src_label").isNotNull() & (F.col("sl") != F.col("src_label")))
        | (F.col("dst_label").isNotNull() & (F.col("dl") != F.col("dst_label")))
    ).select(
        F.lit("endpoint_type").alias("kind"),
        "pred",
        F.col("subj").alias("entity"),
        F.concat(
            F.col("sl"), F.lit(" -> "), F.col("dl"),
            F.lit(" (expected "),
            F.coalesce(F.col("src_label"), F.lit("*")),
            F.lit(" -> "),
            F.coalesce(F.col("dst_label"), F.lit("*")),
            F.lit(")"),
        ).alias("detail"),
    )

    card = (
        e.groupBy("pred", "subj")
        .agg(F.count(F.lit(1)).alias("n_out"))
        .join(rf.where(F.col("max_out").isNotNull()), "pred")
        .where(F.col("n_out") > F.col("max_out"))
        .select(
            F.lit("max_out_degree").alias("kind"),
            "pred",
            F.col("subj").alias("entity"),
            F.concat(
                F.col("n_out").cast("string"),
                F.lit(" > "),
                F.col("max_out").cast("string"),
            ).alias("detail"),
        )
    )
    return unknown.unionByName(bad_type).unionByName(card)


def shape_violation_summary(store, rules: List[Dict]) -> DataFrame:
    """Aggregated report ``(kind, pred, n_violations)`` — the
    driver-sized view (one extra groupBy over the row-level frame)."""
    return (
        validate_edges(store, rules)
        .groupBy("kind", "pred")
        .agg(F.count(F.lit(1)).alias("n_violations"))
    )
