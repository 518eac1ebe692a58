"""spark-submit entry point for the webtext KG pipeline.

Cluster launch (the north-rule deployment shape):

    python -m zipfile -c /tmp/data2neo_spark.zip data2neo_spark
    spark-submit --py-files /tmp/data2neo_spark.zip \
        tools/submit_pipeline.py <n_pages> <out_dir>

Runs corpus → extract → mention-detect → link → graph materialization into a
persistent GraphStore, prints a one-line JSON summary. Works identically on
local[*] and a multi-executor cluster (nothing here is driver-local except
the schema compile).
"""

from __future__ import annotations

import json
import sys
import time

from pyspark.sql import SparkSession


def main() -> int:
    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/webtext_graph_store"

    spark = (
        SparkSession.builder.appName("data2neo-spark-webtext")
        .config("spark.sql.adaptive.enabled", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    # imports AFTER session creation: on a cluster the package arrives via
    # --py-files and must resolve on executors too
    from data2neo_spark import GraphStore
    from data2neo_spark.pipeline.webtext import pages_to_graph
    from data2neo_spark.sources.pages import synth_pages, entity_dictionary

    pages = synth_pages(spark, n_pages, n_entities=1000, seed=42)
    edict = entity_dictionary(spark, 1000, seed=42)
    store = GraphStore(spark, path=out_dir)

    t0 = time.time()
    pages_to_graph(pages, edict, store)
    wall = time.time() - t0
    n_nodes = store.nodes.count()
    n_edges = store.edges.count()
    print(json.dumps({
        "n_pages": n_pages,
        "n_nodes": n_nodes,
        "n_edges": n_edges,
        "wall_s": round(wall, 2),
        "docs_per_sec": round(n_pages / wall, 1),
        "store": out_dir,
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
