"""Isolated per-query measurement harness (guide §1.4): times individual
declared queries with the noop sink so the computation is measured, not the
sink, and optionally dumps .explain("formatted") per query.

This file is SEPARATE from the frozen bench.py on purpose — bench.py is the
driver's measurement contract; this is the engineering loop.

Usage:
    python tools/bench_extra.py q1 q2 ...            # time with count()
    python tools/bench_extra.py --noop q1 q2 ...     # time with noop sink
    python tools/bench_extra.py --reps 3 q1 ...      # repeat, report each
    python tools/bench_extra.py --explain plans/r06 --suffix before q1 ...
    python tools/bench_extra.py --all                # every declared query
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession

import __spark_entry__ as entrymod


def build_spark(cpus: int) -> SparkSession:
    # identical conf to the frozen bench.py so numbers are comparable
    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("data2neo_spark-bench-extra")
        .config("spark.sql.shuffle.partitions", str(max(cpus * 4, 64)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16m")
        .config("spark.sql.files.maxPartitionBytes", "32m")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", os.environ.get("SPARK_GRAFT_UI", "false"))
        .getOrCreate()
    )


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*")
    ap.add_argument("--all", action="store_true")
    ap.add_argument("--reps", type=int, default=1)
    ap.add_argument("--noop", action="store_true")
    ap.add_argument("--explain", default=None, help="dir for plan dumps")
    ap.add_argument("--suffix", default="before", help="plan file suffix")
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = build_spark(cpus)
    spark.sparkContext.setLogLevel("ERROR")

    queries = entrymod.queries()
    names = list(queries) if args.all else args.names
    unknown = [n for n in names if n not in queries]
    if unknown:
        print(f"unknown queries: {unknown}", file=sys.stderr)
        return 2

    # warmup like bench.py: pay JIT/codegen once
    try:
        entrymod.entry(spark).count()
    except Exception:
        pass

    results = {}
    for name in names:
        samples = []
        rows = None
        for rep in range(args.reps):
            spark.sparkContext.setJobDescription(f"{name} rep{rep}")
            t0 = time.time()
            df = queries[name](spark, sf_dir)
            if args.noop:
                df.write.format("noop").mode("overwrite").save()
            else:
                rows = df.count()
            samples.append(round(time.time() - t0, 3))
            spark.catalog.clearCache()
        spark.sparkContext.setJobDescription(None)
        if args.explain:
            os.makedirs(args.explain, exist_ok=True)
            df = queries[name](spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            with open(os.path.join(args.explain,
                                   f"{name}_{args.suffix}.txt"), "w") as fh:
                fh.write(plan)
            spark.catalog.clearCache()
        results[name] = {"samples": samples,
                         "min": min(samples) if samples else None,
                         "rows": rows}
        print(json.dumps({name: results[name]}), flush=True)

    print(json.dumps({"sf_dir": sf_dir, "cpus": cpus, "results": results}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
