#!/usr/bin/env python
"""Connected-components micro-benchmark at moderate edge scale.

Synthesizes a dedup-shaped edge distribution — many small clusters plus
a few large ones and long chains (the worst case for propagation
algorithms) — and measures wall time and alternation count for
ccspark.graph.connected_components at local[N].

Usage: python BENCH/cc_scale_bench.py [n_edges] [cpus]
Prints one JSON line.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from ccspark.graph import connected_components  # noqa: E402
from ccspark.session import build_session  # noqa: E402


def main() -> int:
    n_edges = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    spark = build_session("cc-bench", master=f"local[{cpus}]", shuffle_partitions=cpus * 2)
    spark.sparkContext.setLogLevel("ERROR")

    # dedup-shaped graph over node ids hashed into [0, 4*n_edges):
    #  * 80% of edges pair nodes inside small random clusters (id // 8)
    #  * 15% long-range random edges (merge clusters into big components)
    #  * 5% chain edges i -> i+1 (diameter stress)
    e = (
        spark.range(n_edges)
        .select(
            F.col("id"),
            (F.pmod(F.xxhash64("id"), F.lit(4 * n_edges))).alias("r1"),
            (F.pmod(F.xxhash64("id", F.lit(1)), F.lit(4 * n_edges))).alias("r2"),
            (F.pmod(F.xxhash64("id", F.lit(2)), F.lit(100))).alias("kind"),
        )
        .select(
            F.when(F.col("kind") < 80, (F.col("r1") / 8).cast("long") * 8)
            .when(F.col("kind") < 95, F.col("r1"))
            .otherwise(F.col("id"))
            .alias("src"),
            F.when(F.col("kind") < 80, F.col("r1"))
            .when(F.col("kind") < 95, F.col("r2"))
            .otherwise(F.col("id") + 1)
            .alias("dst"),
        )
    )
    e = e.localCheckpoint(eager=True)  # exclude synthesis from the timing
    n_in = e.count()

    stats: dict = {}
    t0 = time.time()
    comp = connected_components(e, "src", "dst", stats=stats)
    agg = comp.agg(
        F.count(F.lit(1)).alias("nodes"),
        F.count_distinct("component").alias("components"),
    ).collect()[0]
    wall = time.time() - t0

    print(
        json.dumps(
            {
                "metric": "connected_components wall (dedup-shaped graph)",
                "n_edges": n_in,
                "nodes": agg["nodes"],
                "components": agg["components"],
                "iterations": stats.get("iterations"),
                "wall_s": round(wall, 2),
                "edges_per_sec": round(n_in / wall, 1),
                "cpus": cpus,
            }
        )
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
