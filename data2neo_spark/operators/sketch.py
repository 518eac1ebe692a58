"""Mergeable sketches for corpus profiling at 100 TB: HyperLogLog
distinct counting and count-min frequency estimation.

Both are built on the repo's deterministic md5-derived hash
(``dedup.md5_hash60`` — replayable in any SQL engine as
``CAST(concat('0x', substr(md5(x),1,15)) AS BIGINT)``), NOT on Spark's
``approx_count_distinct``/HLL++ internals, for two reasons:

* **cluster-size invariance** — the sketch contents are a pure function
  of the value set, independent of partitioning, executor count, or
  visit order (register max and bucket sum are commutative monoids), so
  a run at N and 4N executors produces byte-identical sketches; and
* **oracle replayability** — the whole pipeline is integer/string
  arithmetic a SQL engine replays exactly, so estimates are
  value-hash-verifiable, unlike engine-internal sketches whose hash
  seeds differ.

Why sketches at all: an exact ``groupBy(value).count`` over 10^12 rows
shuffles the full value set; an HLL register table is a CONSTANT
``m = 2^p`` rows per group (map-side max-combine, tiny shuffle), and a
count-min table is ``depth × width`` counters regardless of corpus size.
Both union across days/batches by re-aggregating (max / sum) — the
incremental-profile path for a daily crawl.

HLL math (Flajolet et al. 2007, public): value → 60-bit hash; register
index = top ``p`` bits; rho = leading-zero count of the remaining
``60-p`` bits + 1 (computed exactly via ``length(bin(tail))`` — no
float log); estimate = alpha_m·m²/Σ 2^(-M_j) with the standard
linear-counting small-range correction (V = empty registers > 0 and
E ≤ 2.5m → m·ln(m/V)).
"""

from __future__ import annotations

from math import log
from typing import List, Optional

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import md5_hash60

_HASH_BITS = 60


def _alpha(m: int) -> float:
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1.0 + 1.079 / m)


def hll_registers(
    df: DataFrame,
    value_col: str,
    group_cols: Optional[List[str]] = None,
    p: int = 8,
) -> DataFrame:
    """Per-group HLL register table: ``(groups…, register, rho)`` with
    ``rho`` the max over the group's values. At most ``2^p`` rows per
    group whatever the input size; one groupBy with map-side partial
    max. Null values are ignored (SQL COUNT DISTINCT semantics).

    Registers from different frames/batches merge by unioning the
    tables and re-taking ``max(rho)`` — the incremental path.
    """
    if not 4 <= p <= 14:
        raise ValueError("p must be in [4, 14]")
    groups = group_cols or []
    tail_bits = _HASH_BITS - p
    h = md5_hash60(F.col(value_col))
    register = F.shiftright(h, tail_bits)  # integer, not float division:
    # h has up to 60 significant bits and a double would round them
    tail = h % F.lit(2**tail_bits)
    # exact leading-zero count: bin(tail) has floor(log2)+1 chars
    rho = F.when(tail == 0, F.lit(tail_bits + 1)).otherwise(
        F.lit(tail_bits + 1) - F.length(F.bin(tail))
    )
    return (
        df.where(F.col(value_col).isNotNull())
        .select(*groups, register.alias("register"), rho.alias("rho"))
        .groupBy(*groups, "register")
        .agg(F.max("rho").alias("rho"))
    )


def hll_estimate_from_registers(
    regs: DataFrame,
    group_cols: Optional[List[str]] = None,
    p: int = 8,
) -> DataFrame:
    """Estimate phase over an existing ``(groups…, register, rho)``
    table (from :func:`hll_registers`, a merged union of them, or a
    streaming sink of the stateful register aggregation) — the shared
    second half of :func:`hll_distinct`."""
    groups = group_cols or []
    m = 2**p
    agg = regs.groupBy(*groups).agg(
        F.count(F.lit(1)).alias("n_registers"),
        F.sum(F.pow(F.lit(2.0), -F.col("rho"))).alias("_s_hit"),
    )
    # empty registers contribute 2^0 = 1 each to the harmonic sum
    s = F.col("_s_hit") + (F.lit(m) - F.col("n_registers")).cast("double")
    raw = F.lit(_alpha(m) * m * m) / s
    v = F.lit(m) - F.col("n_registers")  # zero-valued registers
    small = F.lit(float(m)) * F.log(F.lit(m).cast("double") / v.cast("double"))
    est = F.when((raw <= F.lit(2.5 * m)) & (v > 0), small).otherwise(raw)
    return agg.select(
        *groups,
        "n_registers",
        F.round(est, 2).alias("est_distinct"),
    )


def hll_distinct(
    df: DataFrame,
    value_col: str,
    group_cols: Optional[List[str]] = None,
    p: int = 8,
) -> DataFrame:
    """Per-group approximate distinct count from the register table:
    ``(groups…, n_registers, est_distinct)`` (est rounded to 2 dp;
    typical error ~1.04/sqrt(2^p) ≈ 6.5% at p=8). Two shuffles total:
    the register groupBy and the per-group register rollup — both
    constant-size after the first."""
    return hll_estimate_from_registers(
        hll_registers(df, value_col, group_cols, p), group_cols, p
    )


def countmin_table(
    df: DataFrame,
    value_col: str,
    depth: int = 4,
    width: int = 1024,
    weight_col: Optional[str] = None,
) -> DataFrame:
    """Count-min sketch table ``(row, bucket, cnt)``: ``depth``
    independent hash rows (hash input salted with the row index) over
    ``width`` buckets. Fixed ``depth × width`` counters whatever the
    corpus size; one explode (×depth) + one groupBy with map-side
    partial sums. Tables from different batches merge by summing
    ``cnt`` — counters are linear.
    """
    if depth < 1 or width < 2:
        raise ValueError("depth >= 1 and width >= 2 required")
    w = F.col(weight_col) if weight_col else F.lit(1)
    rows = F.explode(
        F.array(*[F.lit(d) for d in range(depth)])
    ).alias("row")
    bucket = (
        md5_hash60(
            F.concat(F.col("row").cast("string"), F.lit("|"), F.col(value_col))
        )
        % F.lit(width)
    )
    return (
        df.where(F.col(value_col).isNotNull())
        .select(F.col(value_col), w.alias("_w"), rows)
        .select("row", bucket.alias("bucket"), F.col("_w"))
        .groupBy("row", "bucket")
        .agg(F.sum("_w").alias("cnt"))
    )


def countmin_estimate(
    table: DataFrame,
    queries: DataFrame,
    value_col: str,
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """Point-frequency estimates for the values in ``queries``:
    ``(value, est_count)`` with ``est_count = min`` over the sketch's
    depth rows (classic count-min upper bound: est ≥ true, inflated
    only by collisions ≈ N/width per row). The sketch table is tiny
    (depth × width) and broadcasts; the query side never shuffles."""
    q = queries.select(F.col(value_col).alias("value")).where(
        F.col("value").isNotNull()
    )
    rows = F.explode(F.array(*[F.lit(d) for d in range(depth)])).alias("row")
    probes = q.select("value", rows).select(
        "value",
        "row",
        (
            md5_hash60(
                F.concat(F.col("row").cast("string"), F.lit("|"), F.col("value"))
            )
            % F.lit(width)
        ).alias("bucket"),
    )
    joined = probes.join(F.broadcast(table), ["row", "bucket"], "left").select(
        "value", F.coalesce(F.col("cnt"), F.lit(0)).alias("cnt")
    )
    return joined.groupBy("value").agg(F.min("cnt").alias("est_count"))


def profile_table(
    df: DataFrame,
    columns: Optional[List[str]] = None,
    hll_p: int = 12,
) -> DataFrame:
    """One-pass column profiler: ``(column, n_nulls, min_value,
    max_value, n_registers, est_distinct)`` — the data-quality
    reconnaissance step before wiring a table into a conversion schema
    (which columns are keys, which are categorical, where the nulls
    are). min/max compute in the column's native type and cast to
    string AFTER (numeric min, not lexicographic).

    Scale shape: null/min/max stats are ONE whole-table aggregate (no
    shuffle beyond the final partial-agg gather); distinct counts use
    the HLL sketch grouped by column name — the melt explodes ×n_cols
    but collapses to ≤ 2^p rows per column at the first map-side
    combine. Exact per-column distinct over 10^12 rows would be
    n_cols full-width shuffles; this is none.
    """
    cols = columns or df.columns
    pairs = F.array(
        *[
            F.struct(
                F.lit(c).alias("column"), F.col(c).cast("string").alias("value")
            )
            for c in cols
        ]
    )
    melted = df.select(F.explode(pairs).alias("_p")).select(
        "_p.column", "_p.value"
    )
    est = hll_distinct(melted, "value", ["column"], p=hll_p)

    aggs = []
    for c in cols:
        aggs += [
            F.count(F.when(F.col(c).isNull(), F.lit(1))).alias(f"_n_{c}"),
            F.min(F.col(c)).cast("string").alias(f"_mn_{c}"),
            F.max(F.col(c)).cast("string").alias(f"_mx_{c}"),
        ]
    one = df.agg(*aggs)
    stacked = one.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("column"),
                        F.col(f"_n_{c}").alias("n_nulls"),
                        F.col(f"_mn_{c}").alias("min_value"),
                        F.col(f"_mx_{c}").alias("max_value"),
                    )
                    for c in cols
                ]
            )
        ).alias("_s")
    ).select("_s.column", "_s.n_nulls", "_s.min_value", "_s.max_value")
    return stacked.join(est, "column", "left")
