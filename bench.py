"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] (default 32) and
prints ONE JSON line:

    {"metric": ..., "value": <total sec>, "unit": "sec",
     "queries": {name: sec, ...}, "sf": ...}

Extra keys: per-workload throughput (docs/sec over the documents table for
text/dedup ops, triples/sec for KG materializations) — the BASELINE.json
north-rule metrics.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import SparkSession

import __spark_entry__ as entrymod


def build_spark(cpus: int) -> SparkSession:
    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("data2neo_spark-bench")
        .config("spark.sql.shuffle.partitions", str(max(cpus * 4, 64)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16m")
        .config("spark.sql.files.maxPartitionBytes", "32m")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    spark = build_spark(cpus)
    spark.sparkContext.setLogLevel("ERROR")

    queries = entrymod.queries()
    # untimed warmup: pay JVM JIT/codegen once, not inside the first query
    try:
        entrymod.entry(spark).count()
    except Exception:
        pass

    timings = {}
    counts = {}
    t_total0 = time.time()
    for name, fn in queries.items():
        t0 = time.time()
        try:
            counts[name] = fn(spark, sf_dir).count()
            timings[name] = round(time.time() - t0, 3)
        except Exception as e:  # never break the bench line
            timings[name] = -1.0
            counts[name] = -1
            print(f"# bench error in {name}: {e}", file=sys.stderr)
        # each KG query persists its own GraphStore; drop it so caches
        # don't accumulate across 20+ queries (GC pressure measurably
        # slows later queries)
        spark.catalog.clearCache()
    total = round(time.time() - t_total0, 3)

    # north-rule throughputs — numerator-matched denominators: each rate
    # divides rows produced by the wall time of EXACTLY the queries that
    # produced them, so adding unrelated queries can't dilute the metric
    # (the r1→r2 triples_per_sec "drop" was that artifact)
    n_docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).count()
    triple_q = [k for k in timings if k.startswith("kg_triples") and timings[k] > 0]
    kg_secs = sum(timings[k] for k in triple_q)
    kg_triples = sum(counts[k] for k in triple_q)
    text_q = [k for k in timings
              if k.startswith(("text_", "dedup_")) and timings[k] > 0]
    text_secs = sum(timings[k] for k in text_q)
    out = {
        "metric": (
            f"total wall time, {len(queries)} headline queries "
            "(KG construct + dedup + similarity + text + multimodal)"
        ),
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "cpus": cpus,
        "rows": counts,
        "triples_per_sec": round(kg_triples / kg_secs, 1) if kg_secs else None,
        "docs_per_sec_textops": (
            round(n_docs * len(text_q) / text_secs, 1) if text_secs else None
        ),
    }
    line = json.dumps(out)
    print(line)
    # stdout of a long bench run can get truncated by the caller
    # (BENCH_r02.json lost its header that way); the file is authoritative
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "BENCH_LAST.json"), "w") as fh:
        fh.write(line + "\n")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
