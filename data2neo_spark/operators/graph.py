"""Graph analytics over the materialized KG (edge-table algorithms).

The converter's output is a plain edge DataFrame — entity-importance
signals (which entities dominate the corpus graph) are a standard
post-construction step for KG pipelines. Everything here is expressed as
joins + aggregations over the edge list; iterative algorithms persist per
round and cut lineage, like operators/dedup.duplicate_clusters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iters: int = 5,
    scale: int = 10**12,
    damping_num: int = 85,
    damping_den: int = 100,
    broadcast_nodes_max: int = 5_000_000,
    checkpoint_dir: str = None,
) -> DataFrame:
    """Fixed-iteration PageRank in INTEGER arithmetic: ranks are longs
    scaled by ``scale``; every operation is integer +, ×, floor-division
    on positives — bit-identical across engines, so the DuckDB oracle
    replays all ``iters`` iterations exactly (unrolled CTEs) and the
    result is value-hash verifiable, unlike float PageRank whose
    summation order perturbs the last ulp.

    Simplifications (documented, replayed identically by the oracle):
    dangling-node mass is dropped, not redistributed; truncation from
    floor division is not re-normalized. Both vanish at ranking
    granularity and keep the arithmetic exactly reproducible.

    Shape per iteration: one join of the (src, dst, deg) edge frame with
    the rank frame + one groupBy(dst) with map-side partial sums, then a
    UNION with the static no-incoming-edge node set — a node with no
    in-edges has the CONSTANT rank ``base`` every round, so that set is
    computed once before the loop and unioned in, instead of a per-round
    left join back to all nodes (r4: saves one broadcast build + one
    join per round). When the node count is at most
    ``broadcast_nodes_max`` the rank frame (16 bytes/node) is BROADCAST,
    so the big edge frame is never shuffled — the only exchange per
    round is the partial-agg groupBy(dst). Beyond that the join shuffles
    on its key; hub skew behaves like any hot-key aggregation (AQE
    skew-join or salting applies). Ranks persist per round; previous
    rounds unpersist.

    ``checkpoint_dir`` makes a long run resumable (north-rule contract):
    each round's rank table is written to ``<dir>/pr_round_<i>`` and a
    killed job restarts from the highest complete round — the recurrence
    is a pure function of the previous round, so resumption is exact.
    Disk writes replace the in-memory persist per round.
    """
    import os as _os

    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    nodes = (
        e.select(F.col("src").alias("v"))
        .unionByName(e.select(F.col("dst").alias("v")))
        .distinct()
        .persist()
    )
    n = nodes.count()
    if n == 0:
        nodes.unpersist()
        return nodes.withColumn("pr", F.lit(0).cast("long"))
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    ed = e.join(deg, "src").persist()
    base = (scale * (damping_den - damping_num)) // (damping_den * n)
    # each round materializes (persist + count) before the next round's
    # broadcast build references it — a fully-lazy recurrence would
    # re-execute every prior round inside each broadcast build (measured
    # 36 s vs 14 s on the bench graph): broadcast builds don't share work
    # with the probe side, so the barrier per round is load-bearing
    pr = nodes.withColumn("pr", F.lit(scale // n).cast("long")).persist()
    start_round = 0
    if checkpoint_dir is not None:
        done = sorted(
            int(d.rsplit("_", 1)[1])
            for d in (_os.listdir(checkpoint_dir)
                      if _os.path.isdir(checkpoint_dir) else [])
            if d.startswith("pr_round_")
            and _os.path.exists(_os.path.join(checkpoint_dir, d, "_SUCCESS"))
        )
        # only completed rounds BELOW the requested count resume; a prior
        # run with more iterations does not short-circuit this one
        done = [r for r in done if r < iters]
        if done:
            start_round = done[-1] + 1
            pr.unpersist()
            pr = edges.sparkSession.read.parquet(
                _os.path.join(checkpoint_dir, f"pr_round_{done[-1]}")
            )
    bcast = (lambda d: F.broadcast(d)) if n <= broadcast_nodes_max else (lambda d: d)
    # nodes with no incoming edge keep the constant rank `base` in every
    # round — materialize that set ONCE and union it per round instead of
    # left-joining contributions back to the full node set
    no_in = (
        nodes.join(e.select(F.col("dst").alias("v")).distinct(), "v", "left_anti")
        .select("v", F.lit(base).cast("long").alias("pr"))
        .persist()
    )
    for i in range(start_round, iters):
        contrib = (
            ed.join(bcast(pr.withColumnRenamed("v", "src")), "src")
            .withColumn("c", F.expr("pr div deg"))
            .groupBy("dst")
            .agg(F.sum("c").alias("inc"))
        )
        new_pr = (
            contrib.select(
                F.col("dst").alias("v"),
                (
                    F.lit(base)
                    + F.expr(f"(inc * {damping_num}) div {damping_den}")
                ).cast("long").alias("pr"),
            )
            .unionByName(no_in)
        )
        if checkpoint_dir is not None:
            rdir = _os.path.join(checkpoint_dir, f"pr_round_{i}")
            new_pr.write.mode("overwrite").parquet(rdir)
            new_pr = edges.sparkSession.read.parquet(rdir)
        else:
            new_pr = new_pr.persist()
            new_pr.count()
        pr.unpersist()
        pr = new_pr
    ed.unpersist()
    no_in.unpersist()
    nodes.unpersist()
    return pr


def degree_stats(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    top_k: int = 10,
) -> DataFrame:
    """Hub diagnostic over the KG edge list: the ``top_k`` highest-degree
    nodes per direction — (direction, node, degree, rank). This is the
    pre-flight measurement that decides whether a MATCH join needs
    salting (A7) before running at scale, the graph-side twin of
    corpus.key_skew_report. Two groupBy shuffles (one per direction) over
    map-side partials; ties rank by node id ascending."""
    from pyspark.sql import Window

    def side(col: str, name: str) -> DataFrame:
        counts = edges.groupBy(F.col(col).alias("node")).agg(
            F.count(F.lit(1)).alias("degree")
        )
        w = Window.orderBy(F.col("degree").desc(), F.col("node").asc())
        return (
            counts.withColumn("rank", F.row_number().over(w).cast("long"))
            .where(F.col("rank") <= top_k)
            .select(F.lit(name).alias("direction"), "node", "degree", "rank")
        )

    return side(src, "out").unionByName(side(dst, "in"))
