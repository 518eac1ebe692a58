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


def scd2_intervals(
    df: DataFrame,
    key_cols: List[str],
    value_cols: List[str],
    ts_col: str,
    n_obs_col: str = "n_obs",
) -> DataFrame:
    """Collapse timestamped per-key observations into SCD2 validity
    intervals — the temporal-KG counterpart of the reference's
    last-writer-wins node MERGE (data2neo/neo4j/graph_elements.py:206-264
    keeps only the final property value; a web-crawl corpus carries
    `warc_ts`, so the history IS recoverable).

    For each key, observations ordered by (ts, values) are split whenever
    the value tuple changes (null-safe struct compare; the first
    observation always opens an interval), consecutive identical
    observations collapse, and each interval reports
    ``(keys…, values…, valid_from, valid_to, n_obs)`` with ``valid_to``
    NULL for the currently-valid version. Ties at the same timestamp with
    different values are ordered by the value tuple — deterministic and
    SQL-replayable.

    Scale shape: ONE exchange on the key columns; the change-flag window,
    cumulative version sum, per-version aggregate, and the valid_to lead
    all reuse that partitioning (grouping/partition keys are supersets of
    the exchange keys), so Spark inserts sorts but no further shuffles.
    A single hot key serializes into one partition's sort — inherent to
    per-key ordering; pre-split by coarse time range if one entity
    dominates (same contract as asof_join).
    """
    cur = F.struct(*[F.col(v) for v in value_cols])
    w = Window.partitionBy(*key_cols).orderBy(ts_col, *value_cols)
    flagged = df.select(
        *key_cols, ts_col, *value_cols,
        F.when(F.row_number().over(w) == 1, F.lit(1))
        .otherwise((~cur.eqNullSafe(F.lag(cur).over(w))).cast("int"))
        .alias("_chg"),
    )
    versioned = flagged.select(
        *key_cols, ts_col, *value_cols,
        F.sum("_chg")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("_version"),
    )
    grouped = versioned.groupBy(*key_cols, "_version", *value_cols).agg(
        F.min(ts_col).alias("valid_from"),
        F.count(F.lit(1)).alias(n_obs_col),
    )
    w2 = Window.partitionBy(*key_cols).orderBy("_version")
    return grouped.select(
        *key_cols, *value_cols, "valid_from",
        F.lead("valid_from").over(w2).alias("valid_to"),
        n_obs_col,
    )


def sessionize(
    df: DataFrame,
    key_cols: List[str],
    ts_col: str,
    gap_seconds: int,
    order_cols: Optional[List[str]] = None,
    session_col: str = "session_seq",
) -> DataFrame:
    """Gap-based batch sessionization: number each key's events into
    sessions, opening a new session whenever the gap to the previous
    event exceeds ``gap_seconds``. The batch counterpart of the
    streaming sessionization in ``streaming/ingest.py`` — same session
    boundaries, replayable as plain SQL (lag + cumulative sum).

    ``order_cols`` breaks timestamp ties deterministically (default: the
    remaining columns are NOT used; pass e.g. ``["event_id"]``).

    Adds ``session_col`` (1-based per key) to every input row.

    Scale shape: ONE exchange on ``key_cols``; the gap flag (lag) and the
    session number (running sum) share that partitioning, so Spark plans
    a single shuffle plus an in-partition sort. Purely timestamp
    arithmetic — no epoch floats, so the boundary test is exact and
    engine-portable.
    """
    tiebreak = order_cols or []
    w = Window.partitionBy(*key_cols).orderBy(ts_col, *tiebreak)
    new_flag = (
        F.when(F.lag(ts_col).over(w).isNull(), F.lit(1))
        .otherwise(
            (
                F.col(ts_col)
                > F.lag(ts_col).over(w) + F.expr(f"INTERVAL {int(gap_seconds)} SECONDS")
            ).cast("int")
        )
    )
    return df.withColumn(
        session_col,
        F.sum(new_flag).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    )


def session_stats(
    df: DataFrame,
    key_cols: List[str],
    ts_col: str,
    gap_seconds: int,
    order_cols: Optional[List[str]] = None,
) -> DataFrame:
    """Per-session summary over :func:`sessionize`:
    ``(keys…, session_seq, session_start, session_end, n_events)``.
    The groupBy keys are a superset of the sessionize exchange keys, so
    the aggregate reuses the same single shuffle (partial aggregation
    map-side)."""
    s = sessionize(df, key_cols, ts_col, gap_seconds, order_cols=order_cols)
    return s.groupBy(*key_cols, "session_seq").agg(
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
    )


def snapshot_asof(
    intervals: DataFrame,
    ts,
    from_col: str = "valid_from",
    to_col: str = "valid_to",
) -> DataFrame:
    """Point-in-time state from SCD2 validity intervals
    (:func:`scd2_intervals` output): the rows valid AT ``ts`` —
    ``valid_from <= ts`` and (``valid_to`` is open or ``> ts``). The
    temporal-KG read path: 'what did the graph say on date D'.

    Zero-shuffle (a filter over the interval frame, pushed into its
    scan when the intervals are persisted as a table — partition the
    stored intervals by coarse valid_from range so old history prunes).
    """
    t = F.lit(ts).cast("timestamp")
    return intervals.where(
        (F.col(from_col) <= t)
        & (F.col(to_col).isNull() | (F.col(to_col) > t))
    ).drop(to_col)


def funnel(
    df: DataFrame,
    key_cols: List[str],
    ts_col: str,
    step_col: str,
    steps: List[str],
) -> DataFrame:
    """Ordered funnel analysis: for each key, how far through the
    ``steps`` sequence it progressed, requiring each step to occur
    STRICTLY AFTER the previous one (first-touch semantics: the
    earliest qualifying timestamp per step is the anchor — the standard
    product-analytics funnel). Returns
    ``(keys…, steps_completed, completed_at)`` with ``completed_at``
    the timestamp of the deepest completed step; keys that never
    perform ``steps[0]`` are absent.

    Scale shape: one filtered min-aggregate per step, every one keyed
    on ``key_cols`` — the per-step joins and groupBys all reuse the
    same hash partitioning (no extra exchanges beyond the first per
    branch), and each intermediate frame is one row per surviving key,
    monotonically shrinking. len(steps) is small by definition; the
    event frame is scanned once per step with the step filter pushed
    into the scan.
    """
    if not steps:
        raise ValueError("steps must be non-empty")
    ev = df.select(*key_cols, F.col(ts_col).alias("_ts"), F.col(step_col).alias("_st"))
    prog = (
        ev.where(F.col("_st") == steps[0])
        .groupBy(*key_cols)
        .agg(F.min("_ts").alias("_t1"))
    )
    t_cols = ["_t1"]
    for i, step in enumerate(steps[1:], start=2):
        prev_t = t_cols[-1]
        nxt = (
            ev.where(F.col("_st") == step)
            .join(prog.select(*key_cols, prev_t), key_cols)
            .where(F.col("_ts") > F.col(prev_t))
            .groupBy(*key_cols)
            .agg(F.min("_ts").alias(f"_t{i}"))
        )
        prog = prog.join(nxt, key_cols, "left")
        t_cols.append(f"_t{i}")
    completed = sum(
        (F.col(t).isNotNull().cast("int") for t in t_cols), F.lit(0)
    )
    deepest = F.coalesce(*[F.col(t) for t in reversed(t_cols)])
    return prog.select(
        *key_cols,
        completed.alias("steps_completed"),
        deepest.alias("completed_at"),
    )


def retention(
    df: DataFrame,
    key_cols: List[str],
    ts_col: str,
    period_days: int = 7,
) -> DataFrame:
    """Cohort retention: users grouped by the period of their FIRST
    event (cohort), counted in every later period they were active —
    ``(cohort_start, period_offset, n_active)`` with offset 0 the
    cohort period itself (so offset-0 count = cohort size). Periods are
    fixed ``period_days`` windows anchored at each user's first-ever
    event date truncated to day — calendar-drift-free and
    engine-portable (integer day arithmetic, no week-of-year
    semantics).

    Scale shape: first-event aggregate (one keyed shuffle with map-side
    min), joined back broadcast-or-keyed by Spark's own sizing, then a
    distinct on (key, offset) and the final (cohort, offset) count —
    every shuffle is on user or cohort keys with partial aggregation;
    the (cohort, offset) result is period²-bounded, driver-sized.
    """
    ev = df.select(*key_cols, F.to_date(F.col(ts_col)).alias("_d"))
    first = ev.groupBy(*key_cols).agg(F.min("_d").alias("_first"))
    joined = ev.join(first, key_cols)
    active = joined.select(
        *key_cols,
        F.col("_first").alias("cohort_start"),
        F.expr(f"datediff(_d, _first) div {int(period_days)}")
        .cast("long")
        .alias("period_offset"),
    ).distinct()
    return active.groupBy("cohort_start", "period_offset").agg(
        F.count(F.lit(1)).alias("n_active")
    )
