#!/usr/bin/env python
"""Round-6 optimization harness (guide §1): per-query isolation with
repeat trials + plan capture.  Does NOT replace bench.py (frozen for
measurement); numbers here are cited in OPTIMIZATION_r06.md.

Usage:
  python bench_extra.py [--sf DIR] [--trials N] [--queries a,b,c]
        [--plans OUTDIR] [--noop]

Timing methodology matches bench.py (df.count() after a warm-up) by
default; --noop instead times a noop-sink write (computes every column,
guide §1.4) for isolation work.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

HEADLINE = [
    "q_scan_filter",
    "q_agg_pricing",
    "q_join_agg",
    "q_topk",
    "q_politeness_rank",
    "q_moving_avg",
    "q_histogram",
    "q_distinct",
    "q_dedup_exact",
    "q_token_count",
    "q_urlfp_dedup",
    "q_ann_cosine_topk",
]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=SF_DIR)
    ap.add_argument("--trials", type=int, default=3)
    ap.add_argument("--queries", default=None, help="comma list; default headline set")
    ap.add_argument("--plans", default=None, help="write explain('formatted') per query to DIR/<q>.txt")
    ap.add_argument("--noop", action="store_true", help="time noop-sink write instead of count()")
    args = ap.parse_args()

    from ccspark.session import build_session
    import __spark_entry__ as entry_mod

    spark = build_session("ccspark-bench-extra", master=f"local[{CPUS}]", shuffle_partitions=CPUS)
    qs = entry_mod.queries()
    names = args.queries.split(",") if args.queries else HEADLINE

    # same warmup as bench.py
    qs["q_histogram"](spark, args.sf).count()
    qs["q_urlfp_dedup"](spark, args.sf).count()

    if args.plans:
        os.makedirs(args.plans, exist_ok=True)
        for name in names:
            df = qs[name](spark, args.sf)
            with open(os.path.join(args.plans, f"{name}.txt"), "w") as f:
                f.write(df._jdf.queryExecution().explainString(
                    spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
                ))

    results: dict[str, dict] = {}
    for name in names:
        samples = []
        for _ in range(args.trials):
            spark.sparkContext.setJobDescription(f"bench_extra:{name}")
            t0 = time.time()
            df = qs[name](spark, args.sf)
            if args.noop:
                df.write.format("noop").mode("overwrite").save()
            else:
                df.count()
            samples.append(round(time.time() - t0, 3))
        spark.sparkContext.setJobDescription(None)
        xs = sorted(samples)
        results[name] = {"min": xs[0], "med": xs[len(xs) // 2], "samples": samples}

    total_med = round(sum(r["med"] for r in results.values()), 3)
    total_min = round(sum(r["min"] for r in results.values()), 3)
    print(json.dumps({"sf": args.sf, "cpus": CPUS, "noop": args.noop,
                      "total_med": total_med, "total_min": total_min,
                      "queries": results}))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
