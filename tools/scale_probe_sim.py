"""10× scale-behavior probe for the similarity/ANN operators (BENCH.md).

Replicates sf0.1's 2,000 embeddings 10× with per-replica random SIGN FLIPS:
a diagonal ±1 matrix is an isometry, so every within-replica cosine (and
therefore each replica's near-dup structure) is EXACTLY preserved, while
cross-replica cosines are decorrelated — outputs scale ~linearly and any
super-linear wall growth is the operator's own plan, not the data.

Run isolated (a concurrent Spark job skews the ratios).
"""

from __future__ import annotations

import json
import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
REPS = 10


def replicate(emb, reps: int):
    dim = 64
    parts = []
    for rep in range(reps):
        if rep == 0:
            signs = [1.0] * dim
        else:
            rnd = random.Random(rep)
            signs = [1.0 if rnd.random() < 0.5 else -1.0 for _ in range(dim)]
        sign_arr = F.array(*[F.lit(s) for s in signs])
        parts.append(
            emb.select(
                (F.col("vec_id") + rep * 10_000_000).alias("vec_id"),
                F.zip_with(
                    F.col("embedding").cast("array<double>"), sign_arr,
                    lambda a, b: (a * b).cast("float"),
                ).cast("array<float>").alias("embedding"),
                F.col("label"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def bench(fn, n=2):
    best = None
    for _ in range(n):
        t0 = time.time()
        rows = fn().count()
        w = time.time() - t0
        best = (w, rows) if best is None or w < best[0] else best
    return best


def main():
    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("sim-scale-probe")
        .config("spark.sql.shuffle.partitions", str(max(CPUS * 2, 64)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from data2neo_spark.operators.dedup import embedding_near_duplicates_lsh
    from data2neo_spark.operators.similarity import (
        cosine_topk,
        ivf_ann_topk,
        lsh_ann_topk,
    )

    emb1 = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet")).persist()
    emb10 = replicate(emb1, REPS).persist()
    n1, n10 = emb1.count(), emb10.count()

    ops = {
        "emb_near_dup_lsh": lambda df: embedding_near_duplicates_lsh(
            df, "vec_id", dim=64, threshold=0.7, n_planes=6
        ),
        "lsh_ann_topk": lambda df: lsh_ann_topk(
            df, "vec_id", "embedding", dim=64, query_max_id=5, k=10, n_planes=8
        ),
        "ivf_ann_topk": lambda df: ivf_ann_topk(
            df, "vec_id", "embedding", dim=64, query_max_id=5, k=10,
            n_cells=8, n_probe=3, centroid_strategy="rows",
        ),
        "cosine_topk_bruteforce": lambda df: cosine_topk(
            df, "vec_id", "embedding", query_max_id=5, k=10
        ),
    }
    # warmup (JIT/codegen)
    ops["cosine_topk_bruteforce"](emb1).count()

    out = {"n_vectors": {"x1": n1, "x10": n10}, "cpus": CPUS, "results": {}}
    for name, op in ops.items():
        w1, r1 = bench(lambda: op(emb1))
        w10, r10 = bench(lambda: op(emb10))
        out["results"][name] = {
            "x1_sec": round(w1, 2), "x10_sec": round(w10, 2),
            "ratio": round(w10 / w1, 2), "x1_rows": r1, "x10_rows": r10,
        }
        print(name, out["results"][name], flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
