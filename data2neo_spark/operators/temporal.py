"""Temporal joins Spark lacks natively: as-of join and range join.

Both are compositions of built-in operators (SURVEY.md custom-operator rule:
composition first, pandas UDF only if semantics demand it):

* as-of join — union both sides, ONE shuffle+sort per key, then
  ``last(..., ignorenulls)`` over an ordered window carries the most recent
  right-side row forward onto each left row. No per-key loops, no
  merge_asof UDF; scales as a single window over (key, time).
* range join — bucketize the range key: each right interval explodes into
  the fixed-width buckets it overlaps, the left side joins on its single
  bucket, then the exact predicate filters. Turns an inequality join into
  an equi join + local filter.
"""

from __future__ import annotations

from typing import List, Optional

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    ts_col: str,
    by: List[str],
    value_cols: Optional[List[str]] = None,
    direction: str = "backward",
    suffix: str = "_right",
    tolerance=None,
) -> DataFrame:
    """For every left row, attach the nearest right row within the same
    `by` key:

    * ``backward`` — latest right row with right.ts <= left.ts;
    * ``forward`` — earliest right row with right.ts >= left.ts;
    * ``nearest`` — whichever of the two is closer in time (exact ties
      prefer the backward candidate).

    ``tolerance`` (pandas merge_asof parity): a maximum admissible |left.ts
    − right.ts| — a Column expression (e.g. ``F.expr("INTERVAL 5
    MINUTES")``) for timestamp keys or a number for numeric keys. The
    matched row is discarded (NULLed) when it lies beyond the tolerance;
    like pandas, no further-away row is considered instead (the as-of
    candidate is by definition the closest eligible one). Applied as a
    zero-cost post-filter on the carried columns.

    A right row at exactly left.ts is visible in every direction. Returns
    left columns + value_cols renamed with `suffix` + ``ts<suffix>``;
    unmatched left rows keep NULLs (left-join semantics).

    Scale note: one shuffle on `by`; backward/forward sort each partition
    once, nearest sorts twice (asc + desc window over the same exchange —
    Spark reuses the partitioning, only the in-partition sort repeats).
    A single hot `by` key serializes into one partition's sort — inherent
    to windowed as-of; if one key dominates, pre-split it by a coarse time
    range (e.g. day) and as-of join per range with a boundary overlap.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise NotImplementedError(
            "direction must be 'backward', 'forward' or 'nearest'"
        )
    value_cols = value_cols if value_cols is not None else [
        c for c in right.columns if c not in by and c != ts_col
    ]

    l_tagged = left.select(
        *[F.col(c) for c in left.columns],
        F.lit(1).alias("_is_left"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"{c}{suffix}")
          for c in value_cols],
        F.lit(None).cast(right.schema[ts_col].dataType).alias(f"{ts_col}{suffix}"),
    )
    r_tagged = right.select(
        *[F.col(c) for c in by],
        F.col(ts_col),
        F.lit(0).alias("_is_left"),
        *[F.col(c).alias(f"{c}{suffix}") for c in value_cols],
        F.col(ts_col).alias(f"{ts_col}{suffix}"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in left.columns if c not in by and c != ts_col],
    )
    unioned = l_tagged.unionByName(r_tagged)
    # right rows sort before left rows at the same timestamp (_is_left asc)
    # in BOTH traversal directions, so an exactly-equal right row is visible
    w_back = (
        Window.partitionBy(*by)
        .orderBy(F.col(ts_col).asc(), F.col("_is_left").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_fwd = (
        Window.partitionBy(*by)
        .orderBy(F.col(ts_col).desc(), F.col("_is_left").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    names = [f"{c}{suffix}" for c in value_cols] + [f"{ts_col}{suffix}"]

    def _carry(w, nm):
        return F.last(F.col(nm), ignorenulls=True).over(w)

    if direction == "backward":
        sel = [_carry(w_back, nm).alias(nm) for nm in names]
    elif direction == "forward":
        sel = [_carry(w_fwd, nm).alias(nm) for nm in names]
    else:  # nearest: pick the closer candidate per row, ties → backward
        back_ts = _carry(w_back, f"{ts_col}{suffix}")
        fwd_ts = _carry(w_fwd, f"{ts_col}{suffix}")
        use_back = (
            F.when(back_ts.isNull(), F.lit(False))
            .when(fwd_ts.isNull(), F.lit(True))
            .otherwise(
                (F.col(ts_col) - back_ts) <= (fwd_ts - F.col(ts_col))
            )
        )
        sel = [
            F.when(use_back, _carry(w_back, nm))
            .otherwise(_carry(w_fwd, nm))
            .alias(nm)
            for nm in names
        ]
    carried = unioned.select(
        *[F.col(c) for c in left.columns],
        F.col("_is_left"),
        *sel,
    )
    out = carried.where(F.col("_is_left") == 1).drop("_is_left")
    if tolerance is not None:
        tol = tolerance if isinstance(tolerance, Column) else F.lit(tolerance)
        rts = F.col(f"{ts_col}{suffix}")
        diff = F.when(rts <= F.col(ts_col), F.col(ts_col) - rts).otherwise(
            rts - F.col(ts_col)
        )
        ok = rts.isNotNull() & (diff <= tol)
        for nm in names:
            out = out.withColumn(nm, F.when(ok, F.col(nm)))
    return out


def range_join(
    left: DataFrame,
    right: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    bucket_seconds: int = 3600,
) -> DataFrame:
    """left.point ∈ [right.start, right.end] via bucketized equi join.

    Each right interval replicates into ceil(len/bucket)+1 buckets; left rows
    hash to one bucket — the shuffle is an equi join on (bucket), then the
    exact inequality filters locally. Interval length should be O(bucket) for
    bounded replication.
    """
    b = F.lit(bucket_seconds)
    l_bucket = (F.unix_timestamp(F.col(point_col)) / b).cast("long")
    r_start_b = (F.unix_timestamp(F.col(start_col)) / b).cast("long")
    r_end_b = (F.unix_timestamp(F.col(end_col)) / b).cast("long")

    r_exploded = right.withColumn(
        "_bucket", F.explode(F.sequence(r_start_b, r_end_b))
    )
    l_b = left.withColumn("_bucket", l_bucket)
    return (
        l_b.join(r_exploded, "_bucket")
        .where(
            (F.col(point_col) >= F.col(start_col))
            & (F.col(point_col) <= F.col(end_col))
        )
        .drop("_bucket")
    )
