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

    from .text import spread_partitions

    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    # ONE aggregation derives the node set, per-src out-degrees AND the
    # no-incoming-edge set (r6): the old shape paid three passes over the
    # edge frame (union-distinct for nodes, groupBy(src) for degrees, an
    # anti join for no_in) — outdeg = count of src-tagged rows per node,
    # and a node never tagged as dst (min tag = 1) has no in-edges
    stats = (
        e.select(
            F.explode(
                F.array(
                    F.struct(F.col("src").alias("v"), F.lit(1).alias("s")),
                    F.struct(F.col("dst").alias("v"), F.lit(0).alias("s")),
                )
            ).alias("_x")
        )
        .select("_x.v", "_x.s")
        .groupBy("v")
        .agg(F.sum("s").alias("_outdeg"), F.min("s").alias("_min_s"))
        .persist()
    )
    n = stats.count()
    nodes = stats.select("v")
    if n == 0:
        stats.unpersist()
        return nodes.withColumn("pr", F.lit(0).cast("long"))
    deg = stats.where(F.col("_outdeg") > 0).select(
        F.col("v").alias("src"), F.col("_outdeg").alias("deg")
    )
    if n <= broadcast_nodes_max:
        # same gate as the per-round rank broadcast (deg is strictly
        # smaller than the rank frame): avoids a sort-merge join just to
        # attach degrees to the edge frame
        deg = F.broadcast(deg)
    # spread before persisting: the cached probe side of every round's
    # broadcast join would otherwise inherit the scan's (or AQE's
    # size-coalesced) few partitions and run each round on a fraction of
    # the cores; no-op when the frame already has enough partitions
    ed = spread_partitions(e.join(deg, "src"), "src").persist()
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
    # round — that set falls out of the shared stats aggregate (a node
    # never tagged as dst), no extra anti join
    no_in = (
        stats.where(F.col("_min_s") == 1)
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
    stats.unpersist()
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


def cooccurrence_edges(
    df: DataFrame,
    group_col: str,
    item_col: str,
    max_group_size: int = None,
) -> DataFrame:
    """Entity co-occurrence graph: an undirected weighted edge (a, b,
    weight) for every pair of distinct items appearing in the same group
    (entities on the same page, parts in the same order), with weight =
    number of shared groups. The canonical mention-graph builder for a
    KG pipeline — downstream of the converter, upstream of
    triangle/community analytics.

    Pair emission is quadratic in group size by definition, so
    ``max_group_size`` caps each group to its ``max_group_size`` LOWEST
    items (sorted prefix, same contract as the incremental-dedup corpus
    cap in operators/dedup.py) — deterministic and SQL-replayable, and
    it bounds the blowup of degenerate hub groups (a page mentioning
    thousands of entities).

    Shape (r6): ONE groupBy(g) builds each group's distinct sorted
    (capped) item array — ``collect_set`` is the within-group distinct,
    so the old standalone ``.distinct()`` exchange and the row_number
    window (plus its self-join) collapse into the same aggregation —
    then pairs emit array-side (bounded by the cap, ≤ k²/2 structs per
    group row) into the final (a, b) weight groupBy with map-side
    partials. Two exchanges total instead of three plus a join.
    """
    from .dedup import _pairs_expr

    items = F.array_sort(F.collect_set(F.col(item_col)))
    if max_group_size is not None:
        items = F.slice(items, 1, int(max_group_size))
    grp = (
        df.select(F.col(group_col).alias("g"), F.col(item_col).alias(item_col))
        .groupBy("g")
        .agg(items.alias("_items"))
        .where(F.size("_items") >= 2)
    )
    return (
        grp.select(F.explode(_pairs_expr("_items")).alias("_p"))
        .select(F.col("_p.id_a").alias("a"), F.col("_p.id_b").alias("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("weight"))
    )


def triangle_counts(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Per-node triangle count over an undirected graph — (node, degree,
    triangles), the local clustering structure of the KG (triangles/
    (degree·(degree−1)/2) is the clustering coefficient; kept as exact
    integers so the result is value-hash verifiable).

    Degree-ordered wedge algorithm (the compact-forward scheme, public
    knowledge from the triangle-listing literature): canonicalize to
    a < b undirected edges, then orient every edge from its lower-
    (degree, id) endpoint to the higher one. Each node's oriented
    out-degree is O(√E), so the wedge self-join emits O(E^1.5) rows
    worst-case instead of Σ deg² — hub nodes get wedges formed at their
    LOW-degree neighbors, which is the entire skew story: a 10⁷-degree
    hub contributes no pivot wedges at all. Joins: one self-join on the
    pivot, one closing-edge equi join, one 3-way explode + groupBy for
    per-node counts.
    """
    e = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
    )
    deg = (
        e.select(F.col("a").alias("v"))
        .unionByName(e.select(F.col("b").alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("degree"))
    )
    # orient by (degree, id): lower endpoint -> higher endpoint
    da = deg.select(F.col("v").alias("a"), F.col("degree").alias("dega"))
    db = deg.select(F.col("v").alias("b"), F.col("degree").alias("degb"))
    ranked = e.join(da, "a").join(db, "b")
    lower_first = (F.col("dega") < F.col("degb")) | (
        (F.col("dega") == F.col("degb")) & (F.col("a") < F.col("b"))
    )
    oriented = ranked.select(
        F.when(lower_first, F.col("a")).otherwise(F.col("b")).alias("lo"),
        F.when(lower_first, F.col("b")).otherwise(F.col("a")).alias("hi"),
        F.when(lower_first, F.col("dega")).otherwise(F.col("degb")).alias("dlo"),
        F.when(lower_first, F.col("degb")).otherwise(F.col("dega")).alias("dhi"),
    )
    # wedges at the pivot: two out-edges (pivot->v, pivot->w) with v
    # before w in the (deg, id) order; the closing edge, if present, is
    # oriented v->w by construction
    x = oriented.select(
        F.col("lo").alias("pivot"), F.col("hi").alias("v"),
        F.col("dhi").alias("dv"),
    )
    y = oriented.select(
        F.col("lo").alias("pivot"), F.col("hi").alias("w"),
        F.col("dhi").alias("dw"),
    )
    wedges = x.join(y, "pivot").where(
        (F.col("dv") < F.col("dw"))
        | ((F.col("dv") == F.col("dw")) & (F.col("v") < F.col("w")))
    )
    closing = oriented.select(
        F.col("lo").alias("v"), F.col("hi").alias("w")
    )
    tri = wedges.join(closing, ["v", "w"]).select("pivot", "v", "w")
    per_node = (
        tri.select(
            F.explode(F.array(F.col("pivot"), F.col("v"), F.col("w"))).alias("node")
        )
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("triangles"))
    )
    out = deg.select(F.col("v").alias("node"), "degree").join(
        per_node, "node", "left"
    ).select(
        "node", "degree",
        F.coalesce(F.col("triangles"), F.lit(0)).alias("triangles"),
    )
    return out


def khop_reachability(
    edges: DataFrame,
    seeds: DataFrame,
    k: int,
    src: str = "src",
    dst: str = "dst",
    undirected: bool = False,
    broadcast_frontier_max: int = 5_000_000,
    checkpoint_dir: str = None,
) -> DataFrame:
    """Bounded k-hop BFS from a seed set: ``(seed, node, min_hops)`` for
    every node reachable from each seed within ``k`` hops (the seed
    itself at hop 0). The neighborhood-expansion primitive of a KG —
    entity context windows, blast-radius queries, subgraph sampling for
    GNN training all reduce to it.

    Layered frontier expansion: hop ``i``'s frontier joins the edge
    frame once, new ``(seed, node)`` pairs are removed with a LEFT ANTI
    join against everything already reached (so ``min_hops`` is exact by
    construction — a node is recorded the first layer it appears), and
    the loop is k joins total, NOT k self-joins of a growing path table:
    no path enumeration, state is O(reached nodes) not O(paths).

    Scale shape: the edge frame is the big side and is never moved when
    the frontier fits the broadcast gate (``broadcast_frontier_max``
    rows, checked per layer with a cheap count that doubles as the
    convergence test — an empty frontier short-circuits the remaining
    hops). Past the gate the layer join degrades to one hash exchange
    per side, keyed on the node id — hub fan-out behaves like any hot
    key (AQE skew split applies). ``undirected=True`` unions the
    reversed edge frame lazily (no materialization).

    Engine-portable: integer hop arithmetic and set semantics only, so a
    SQL oracle replays it with a recursive CTE (UNION-dedup on
    (seed, node, hops), then min(hops)).

    ``checkpoint_dir`` makes a long BFS resumable (north-rule
    contract, same layout as pagerank): each layer's reached table
    writes to ``<dir>/khop_hop_<i>`` and a killed job restarts from the
    highest complete layer — the layer recurrence is a pure function of
    the previous layer, so resumption is exact.
    """
    if k < 0:
        raise ValueError("k must be >= 0")
    e = edges.select(F.col(src).alias("_s"), F.col(dst).alias("_d"))
    if undirected:
        e = e.unionAll(
            edges.select(F.col(dst).alias("_s"), F.col(src).alias("_d"))
        )
    # the edge frame is probed once per layer — persist it so k layers
    # cost one source scan, not k (pagerank's `ed` contract); spread so
    # the per-layer probe runs on all cores (no-op at real scale)
    from .text import spread_partitions

    e = spread_partitions(e, "_s").persist()
    seed_nodes = seeds.select(F.col(seeds.columns[0]).alias("seed")).distinct()

    from pyspark.sql import Observation

    reached = seed_nodes.select(
        "seed", F.col("seed").alias("node"), F.lit(0).cast("int").alias("min_hops")
    ).persist()
    start_hop = 1
    if checkpoint_dir is not None:
        # resume from the highest COMPLETE layer below k (pagerank's
        # checkpoint contract, graph.py:82): the reached table after hop
        # j is a pure function of the input, so resumption is exact
        import os as _os

        done = sorted(
            int(d.rsplit("_", 1)[1])
            for d in (_os.listdir(checkpoint_dir)
                      if _os.path.isdir(checkpoint_dir) else [])
            if d.startswith("khop_hop_")
            and _os.path.exists(_os.path.join(checkpoint_dir, d, "_SUCCESS"))
        )
        done = [h for h in done if h <= k]
        if done:
            start_hop = done[-1] + 1
            reached.unpersist()
            reached = edges.sparkSession.read.parquet(
                _os.path.join(checkpoint_dir, f"khop_hop_{done[-1]}")
            ).persist()
    frontier = reached.where(F.col("min_hops") == start_hop - 1).select(
        "seed", "node"
    )
    n = frontier.count()  # only the resume layer pays a standalone count;
    reached_n = reached.count() if start_hop > 1 else n
    for hop in range(start_hop, k + 1):
        if n == 0:
            break
        f = F.broadcast(frontier) if n <= broadcast_frontier_max else frontier
        # the dedup-vs-reached anti-join broadcasts its right side while
        # the reached set is small (it is bounded by seeds × visited
        # nodes — tiny relative to the edge frame), saving the exchange
        # on the candidate stream every layer
        anti = (
            F.broadcast(reached)
            if reached_n <= broadcast_frontier_max
            else reached
        )
        nxt = (
            f.join(e, f["node"] == e["_s"])
            .select("seed", F.col("_d").alias("node"))
            .distinct()
            .join(anti, ["seed", "node"], "left_anti")
            .withColumn("min_hops", F.lit(hop).cast("int"))
        )
        obs = Observation()
        nxt = nxt.observe(obs, F.count(F.lit(1)).alias("n")).persist()
        prev = reached
        reached = reached.unionAll(nxt).persist()
        reached.count()  # materialize before unpersisting parents
        if checkpoint_dir is not None:
            import os as _os

            reached.write.mode("overwrite").parquet(
                _os.path.join(checkpoint_dir, f"khop_hop_{hop}")
            )
        try:
            n = obs.get["n"]  # frontier size observed for free on that job
        except Exception:
            # AQE empty-relation propagation can prune the CollectMetrics
            # node (no metrics row); nxt is persisted, count is cheap
            n = nxt.count()
        reached_n += n
        prev.unpersist()
        frontier = nxt.select("seed", "node")
    e.unpersist()
    return reached


def label_propagation(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iters: int = 3,
    broadcast_nodes_max: int = 5_000_000,
    checkpoint_dir: str = None,
) -> DataFrame:
    """Community detection by synchronous label propagation
    (Raghavan et al. 2007), made DETERMINISTIC: labels initialize to the
    node id, and each round every node adopts the most frequent label
    among its neighbors with ties broken by smallest label (classic LPA
    breaks ties randomly; the deterministic tiebreak makes the result a
    pure function of the graph, replayable as unrolled SQL rounds).
    Isolated-in-round nodes keep their label. Returns ``(node, label)``
    after ``iters`` rounds — unlike connected components (hash-to-min,
    dedup.duplicate_clusters), LPA splits dense regions of one component
    into separate communities.

    Shape per round: one join of the (node, nbr) adjacency with the
    label frame — label frame broadcasts up to ``broadcast_nodes_max``
    rows so the adjacency never shuffles — then a (node, label) vote
    groupBy and a per-node top-1 window, both partial-agg friendly.
    Labels persist per round, previous rounds unpersist (pagerank's
    memory contract). ``checkpoint_dir`` writes each round's label table
    to ``<dir>/lpa_round_<i>`` and resumes from the highest complete
    round (pagerank's checkpoint contract)."""
    from .text import spread_partitions

    nb = edges.select(F.col(src).alias("node"), F.col(dst).alias("nbr")).unionAll(
        edges.select(F.col(dst).alias("node"), F.col(src).alias("nbr"))
    )
    # probed every round — persist so rounds don't re-derive the
    # adjacency from the source plan (khop/pagerank edge contract);
    # spread first so the cached probe side of each round's broadcast
    # join runs on all cores, not the upstream plan's few AQE-coalesced
    # partitions (no-op at real scale)
    nb = spread_partitions(nb, "node").persist()
    nodes = nb.select("node").distinct()
    labels = nodes.select("node", F.col("node").alias("label")).persist()
    n_nodes = labels.count()
    start_round = 0
    if checkpoint_dir is not None:
        import os as _os

        done = sorted(
            int(d.rsplit("_", 1)[1])
            for d in (_os.listdir(checkpoint_dir)
                      if _os.path.isdir(checkpoint_dir) else [])
            if d.startswith("lpa_round_")
            and _os.path.exists(_os.path.join(checkpoint_dir, d, "_SUCCESS"))
        )
        done = [r for r in done if r < iters]
        if done:
            start_round = done[-1] + 1
            labels.unpersist()
            labels = edges.sparkSession.read.parquet(
                _os.path.join(checkpoint_dir, f"lpa_round_{done[-1]}")
            ).persist()
    for _round in range(start_round, iters):
        lbl = labels.select(F.col("node").alias("nbr"), F.col("label"))
        if n_nodes <= broadcast_nodes_max:
            lbl = F.broadcast(lbl)
        votes = (
            nb.join(lbl, "nbr")
            .groupBy("node", "label")
            .agg(F.count(F.lit(1)).alias("c"))
        )
        # top-1 per node as a HASH aggregate, not a sort window: winner
        # maximizes (count, -label) — max count, min label on ties —
        # identical to row_number() over (ORDER BY c DESC, label) but
        # partial-agg combinable and with no per-round sort
        top = votes.groupBy("node").agg(
            F.max_by(
                F.col("label"), F.struct(F.col("c"), (-F.col("label")).alias("nl"))
            ).alias("_new")
        )
        prev = labels
        labels = (
            prev.join(top, "node", "left")
            .select("node", F.coalesce("_new", "label").alias("label"))
            .persist()
        )
        labels.count()
        if checkpoint_dir is not None:
            import os as _os

            labels.write.mode("overwrite").parquet(
                _os.path.join(checkpoint_dir, f"lpa_round_{_round}")
            )
        prev.unpersist()
    nb.unpersist()
    return labels


def harmonic_centrality(
    edges: DataFrame,
    seeds: DataFrame,
    k: int,
    src: str = "src",
    dst: str = "dst",
    undirected: bool = False,
    scale: int = 60,
) -> DataFrame:
    """k-bounded harmonic centrality per seed:
    ``C(s) = Σ_{v reached, v≠s} 1/min_hops(s,v)`` — the standard
    big-graph centrality (closeness breaks on disconnected graphs;
    harmonic doesn't), truncated at ``k`` hops as at web scale
    (full-BFS centrality over 10^12 nodes is not a thing; k-bounded is
    the published practice for crawl graphs).

    Integer-exact: contributions are ``scale // hops`` with the default
    ``scale=60`` divisible by every hop count ≤ 6, so results are
    engine-portable longs (``harmonic_x{scale}``), not floats. One
    groupBy over :func:`khop_reachability`'s output — all scale
    characteristics inherited from the BFS."""
    reached = khop_reachability(
        edges, seeds, k, src=src, dst=dst, undirected=undirected
    )
    return (
        reached.where(F.col("min_hops") > 0)
        .groupBy("seed")
        .agg(
            F.count(F.lit(1)).alias("n_reached"),
            F.sum(F.expr(f"{int(scale)}L div min_hops")).alias(
                f"harmonic_x{int(scale)}"
            ),
        )
    )


def negative_samples(
    triples: DataFrame,
    n_entities: int,
    k: int = 1,
    subj: str = "subj",
    pred: str = "pred",
    obj: str = "obj",
    seed: int = 0,
    entity_base: int = 0,
    filter_true: bool = True,
) -> DataFrame:
    """Deterministic tail-corruption negative sampling for KG-embedding
    training (TransE-family): each positive ``(s, p, o)`` yields ``k``
    corrupted ``(s, p, o')`` with ``o' = entity_base + md5(seed‖s‖p‖o‖i)
    mod n_entities`` — JOIN-FREE corruption under the dense-id contract
    (entity ids occupy ``[entity_base, entity_base + n_entities)``; use
    core/registry.IDRegistry to densify arbitrary key spaces first, the
    same integer-id contract as text.pack_sequences).

    ``filter_true`` drops accidental positives (a corrupted tail that
    reproduces a true triple) with one LEFT ANTI join against the
    positive set — the standard filtered-negative protocol. Output:
    ``(subj, pred, obj_neg, neg_idx)``.

    Scale shape: corruption is a zero-shuffle ×k explode projection
    (hash arithmetic, order-free — identical samples at any cluster
    size); the optional anti-join is the only exchange, keyed on the
    triple. md5-derived, so a SQL oracle replays every sample.
    """
    from .dedup import md5_hash60

    if k < 1 or n_entities < 2:
        raise ValueError("k >= 1 and n_entities >= 2 required")
    idx = F.explode(F.array(*[F.lit(i) for i in range(k)])).alias("neg_idx")
    h = md5_hash60(
        F.concat_ws(
            "|",
            F.lit(str(seed)),
            F.col(subj).cast("string"),
            F.col(pred).cast("string"),
            F.col(obj).cast("string"),
            F.col("neg_idx").cast("string"),
        )
    )
    neg = (
        triples.select(subj, pred, obj, idx)
        .withColumn("obj_neg", F.lit(entity_base) + (h % F.lit(n_entities)))
        .select(subj, pred, F.col("obj_neg"), "neg_idx")
    )
    if filter_true:
        pos = triples.select(
            F.col(subj).alias(subj),
            F.col(pred).alias(pred),
            F.col(obj).alias("obj_neg"),
        ).distinct()
        neg = neg.join(pos, [subj, pred, "obj_neg"], "left_anti")
    return neg


def sample_neighbors(
    edges: DataFrame,
    seeds: DataFrame,
    fanouts,
    src: str = "src",
    dst: str = "dst",
    undirected: bool = False,
    seed: int = 0,
    broadcast_frontier_max: int = 5_000_000,
) -> DataFrame:
    """GraphSAGE-style layered neighbor sampling for GNN minibatches:
    layer ``i`` keeps at most ``fanouts[i]`` neighbors PER (seed,
    frontier-node), chosen by md5-hash rank — deterministic at any
    cluster size (no per-partition rand()), revisits allowed (standard
    GNN sampling semantics; use :func:`khop_reachability` when you need
    min-hop sets). Returns the sampled edge list
    ``(seed, layer, node, nbr)``.

    Scale shape per layer: frontier joins the persisted edge frame
    (frontier broadcasts under the gate, so the edge frame never
    moves), then ONE (seed, node)-keyed top-k window over candidate
    rows already bounded by frontier×degree. The output is
    Σ_i Π_{j≤i} fanout_j rows per seed — minibatch-sized by
    construction, independent of graph size.
    """
    from .dedup import md5_hash60
    from pyspark.sql import Window

    if not fanouts:
        raise ValueError("fanouts must be non-empty")
    e = edges.select(F.col(src).alias("_s"), F.col(dst).alias("_d"))
    if undirected:
        e = e.unionAll(
            edges.select(F.col(dst).alias("_s"), F.col(src).alias("_d"))
        )
    e = e.persist()
    frontier = (
        seeds.select(F.col(seeds.columns[0]).alias("seed"))
        .distinct()
        .select("seed", F.col("seed").alias("node"))
    )
    n = frontier.count()
    layers = []
    for layer, fanout in enumerate(fanouts, start=1):
        if n == 0:
            break
        f = F.broadcast(frontier) if n <= broadcast_frontier_max else frontier
        cand = f.join(e, f["node"] == e["_s"]).select(
            "seed", "node", F.col("_d").alias("nbr")
        ).distinct()
        rank_key = md5_hash60(
            F.concat_ws(
                "|",
                F.lit(str(seed)),
                F.col("seed").cast("string"),
                F.col("node").cast("string"),
                F.col("nbr").cast("string"),
            )
        )
        w = Window.partitionBy("seed", "node").orderBy(rank_key, F.col("nbr"))
        sampled = (
            cand.withColumn("_rk", F.row_number().over(w))
            .where(F.col("_rk") <= int(fanout))
            .select(
                "seed",
                F.lit(layer).cast("int").alias("layer"),
                "node",
                "nbr",
            )
            .persist()
        )
        layers.append(sampled)
        frontier = sampled.select("seed", F.col("nbr").alias("node")).distinct()
        n = frontier.count()
    e.unpersist()
    if not layers:
        return frontier.sparkSession.createDataFrame(
            [], "seed long, layer int, node long, nbr long"
        )
    out = layers[0]
    for l in layers[1:]:
        out = out.unionAll(l)
    return out


def link_prediction_jaccard(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_pivot_degree: int = 64,
    top_k: int = 50,
    scale: int = 1_000_000,
    edges_distinct: bool = False,
) -> DataFrame:
    """Neighbor-Jaccard link prediction over the undirected graph:
    for node pairs sharing at least one neighbor and NOT already
    adjacent, ``jaccard_x{scale} = (c·scale) div (d_a + d_b − c)`` with
    ``c`` the common-neighbor count — the classic structural
    link-prediction baseline (Liben-Nowell & Kleinberg 2003), integer-
    quantized for cross-engine hashing. Returns the global ``top_k``
    pairs ``(a, b, common, deg_a, deg_b, jaccard_x…)`` ordered by
    (jaccard desc, a, b).

    Scale shape: candidate pairs form at their SHARED neighbor (one
    self-join of the adjacency keyed on the pivot node) — never
    all-pairs; hub pivots are capped to their ``max_pivot_degree``
    LOWEST neighbors (sorted-prefix contract shared with
    cooccurrence_edges — documented recall loss on super-hubs, which
    at crawl scale are exactly the uninformative pivots: a neighbor
    shared by 10^6 nodes carries no signal). Then one (a,b) count
    groupBy with map-side partials, two broadcast-friendly degree
    joins, one LEFT ANTI against the existing edge set, and a global
    top-k (TakeOrderedAndProject, no full sort).

    ``edges_distinct=True`` is the caller's promise that ``edges`` holds
    each undirected edge exactly once in one canonical direction (e.g.
    :func:`cooccurrence_edges` output) — the adjacency and existing-edge
    dedups are then provably no-ops and their exchanges are skipped
    (identical results, one fewer shuffle each).
    """
    from pyspark.sql import Window

    nb = (
        edges.select(F.col(src).alias("v"), F.col(dst).alias("u"))
        .unionAll(edges.select(F.col(dst).alias("v"), F.col(src).alias("u")))
    )
    if not edges_distinct:
        nb = nb.distinct()
    deg = nb.groupBy("u").agg(F.count(F.lit(1)).alias("deg"))
    w = Window.partitionBy("v").orderBy("u")
    capped = (
        nb.withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") <= max_pivot_degree)
        .drop("_rk")
    )
    a = capped.select("v", F.col("u").alias("a"))
    b = capped.select("v", F.col("u").alias("b"))
    common = (
        a.join(b, "v")
        .where(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("common"))
    )
    existing = nb.select(
        F.least("v", "u").alias("a"), F.greatest("v", "u").alias("b")
    )
    if not edges_distinct:
        existing = existing.distinct()
    cand = common.join(existing, ["a", "b"], "left_anti")
    out = (
        cand.join(deg.select(F.col("u").alias("a"), F.col("deg").alias("deg_a")), "a")
        .join(deg.select(F.col("u").alias("b"), F.col("deg").alias("deg_b")), "b")
        .withColumn(
            f"jaccard_x{int(scale)}",
            F.expr(f"(common * {int(scale)}L) div (deg_a + deg_b - common)"),
        )
    )
    return out.orderBy(
        F.desc(f"jaccard_x{int(scale)}"), "a", "b"
    ).limit(top_k).select(
        "a", "b", "common", "deg_a", "deg_b", f"jaccard_x{int(scale)}"
    )


def link_prediction_adamic_adar(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_pivot_degree: int = 64,
    top_k: int = 50,
    scale: int = 1_000_000,
    edges_distinct: bool = False,
) -> DataFrame:
    """Adamic–Adar link prediction, integer-quantized: each shared
    pivot ``v`` contributes ``scale div ilog2(deg_v)`` (ilog2 exact via
    ``length(bin(x)) − 1`` — the engine's float-free log idiom, see
    train_bigram_lm) with degree-1 pivots clamped to ilog2 = 1, so the
    score stays an engine-portable long. Rarer shared neighbors weigh
    more than in plain common-neighbor counting — the standard
    refinement over Jaccard for hub-heavy graphs. Same candidate
    machinery and caps as :func:`link_prediction_jaccard`; returns the
    top_k non-adjacent pairs ``(a, b, common, aa_x{scale})`` ordered by
    (score desc, a, b). ``edges_distinct`` as in
    :func:`link_prediction_jaccard`.
    """
    from pyspark.sql import Window

    nb = (
        edges.select(F.col(src).alias("v"), F.col(dst).alias("u"))
        .unionAll(edges.select(F.col(dst).alias("v"), F.col(src).alias("u")))
    )
    if not edges_distinct:
        nb = nb.distinct()
    deg = nb.groupBy("v").agg(F.count(F.lit(1)).alias("deg"))
    # pivot weight: scale div max(1, ilog2(deg)) — exact integer
    pw = deg.select(
        "v",
        F.expr(
            f"{int(scale)}L div greatest(1L, length(bin(deg)) - 1)"
        ).alias("w"),
    )
    wnd = Window.partitionBy("v").orderBy("u")
    capped = (
        nb.withColumn("_rk", F.row_number().over(wnd))
        .where(F.col("_rk") <= max_pivot_degree)
        .drop("_rk")
        .join(pw, "v")
    )
    a = capped.select("v", "w", F.col("u").alias("a"))
    b = capped.select("v", F.col("u").alias("b"))
    scored = (
        a.join(b, "v")
        .where(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(
            F.count(F.lit(1)).alias("common"),
            F.sum("w").alias(f"aa_x{int(scale)}"),
        )
    )
    existing = nb.select(
        F.least("v", "u").alias("a"), F.greatest("v", "u").alias("b")
    )
    if not edges_distinct:
        existing = existing.distinct()
    return (
        scored.join(existing, ["a", "b"], "left_anti")
        .orderBy(F.desc(f"aa_x{int(scale)}"), "a", "b")
        .limit(top_k)
    )
