#!/usr/bin/env python
"""ccspark benchmark harness.

Default mode (driver contract): runs the headline queries at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line::

    {"metric": "...", "value": <total_sec>, "unit": "sec",
     "queries": {...}, "sf": ..., "frontier_urls_per_sec": ...}

``--scaling`` mode: runs the identical frontier job at two
parallelism levels (CCSPARK_SCALE_PAIR, default local[4] vs local[16];
fresh subprocess each, same input) and reports throughput at both plus
paired efficiency — the BASELINE.json two-cluster-size criterion
evidenced in-sandbox.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
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

# 4M-URL universe (r1/r2 used 2M): the frontier's per-round fixed cost
# (action scheduling, python-worker spin-up, committer) is flat in
# universe size, so a larger universe measures the per-URL rate a real
# cluster round would see — the 10^10 north-star direction.  A 2M run
# is still recorded under "frontier_prev_basis" for r1/r2 comparability.
FRONTIER_UNIVERSE = int(os.environ.get("CCSPARK_BENCH_UNIVERSE", "4000000"))
FRONTIER_PREV_BASIS_UNIVERSE = 2_000_000
FRONTIER_ROUNDS = int(os.environ.get("CCSPARK_BENCH_ROUNDS", "3"))
FRONTIER_BUDGET = 50
# dataset partitioning is a property of the data layout, NOT the cluster
# size: hold it constant across parallelism levels so local[8] vs
# local[32] measures compute scaling, not partitioning changes
FRONTIER_PARTITIONS = 32


def _sf_of(path: str) -> float:
    base = os.path.basename(path.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return -1.0


def run_queries() -> dict:
    from ccspark.session import build_session
    import __spark_entry__ as entry_mod

    spark = build_session("ccspark-bench", master=f"local[{CPUS}]", shuffle_partitions=CPUS)
    qs = entry_mod.queries()
    timings: dict[str, float] = {}
    # warm the JVM + the Arrow python workers once (not timed) — steady
    # state is what the throughput claim is about; cold spin-up of 32
    # python workers (~2s) is a one-off per executor, not per query
    qs["q_histogram"](spark, SF_DIR).count()
    qs["q_urlfp_dedup"](spark, SF_DIR).count()
    for name in HEADLINE:
        t0 = time.time()
        df = qs[name](spark, SF_DIR)
        n = df.count()
        timings[name] = round(time.time() - t0, 3)
        assert n >= 0

    # frontier throughput at current parallelism (headline basis),
    # plus the r1/r2 2M-universe basis for round-over-round comparability
    frontier_stats = run_frontier_inproc(spark)
    frontier_prev = run_frontier_inproc(spark, universe=FRONTIER_PREV_BASIS_UNIVERSE)
    spark.stop()
    return {
        "timings": timings,
        "frontier": frontier_stats,
        "frontier_prev_basis": frontier_prev,
    }


def run_frontier_inproc(spark, ckpt_dir: str | None = None, universe: int | None = None) -> dict:
    from ccspark.frontier import CrawlFrontier, FrontierConfig
    from ccspark import synth

    universe = universe or FRONTIER_UNIVERSE
    ckpt = ckpt_dir or f"/tmp/ccspark_bench_ckpt_{os.getpid()}_{universe}"
    shutil.rmtree(ckpt, ignore_errors=True)
    cfg = FrontierConfig(
        num_partitions=FRONTIER_PARTITIONS,
        universe_n=universe,
        seed=42,
        default_budget=FRONTIER_BUDGET,
        n_salts=8,
    )
    fr = CrawlFrontier(spark, ckpt, cfg)
    seeds = synth.gen_seeds(spark, universe, cfg.n_hosts, 42)
    t0 = time.time()
    fr.bootstrap(seeds)
    t_boot = time.time() - t0
    t1 = time.time()
    metrics = [fr.run_round(r) for r in range(1, FRONTIER_ROUNDS + 1)]
    rounds_wall = time.time() - t1
    wall = time.time() - t0
    scheduled = sum(m["scheduled"] for m in metrics)
    processed = sum(m["candidates"] for m in metrics)
    shutil.rmtree(ckpt, ignore_errors=True)
    return {
        "universe": universe,
        "wall_s": round(wall, 2),
        "bootstrap_s": round(t_boot, 2),
        "rounds_wall_s": round(rounds_wall, 2),
        "scheduled": scheduled,
        "candidates_processed": processed,
        # urls_per_sec keeps the round-1 basis (bootstrap included) for
        # BENCH_r{N} comparability; the rounds-only rate reflects
        # steady-state cost (bootstrap is a one-time seed identification)
        "urls_per_sec": round(processed / wall, 1) if wall > 0 else None,
        "urls_per_sec_rounds": round(processed / rounds_wall, 1) if rounds_wall > 0 else None,
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scaling", action="store_true", help="run frontier at two parallelism levels (CCSPARK_SCALE_PAIR, default 4,16)")
    ap.add_argument("--cpus", type=int, default=None, help="(internal) run frontier once at this parallelism")
    args = ap.parse_args()

    if args.cpus is not None:
        # subprocess worker for --scaling: single-action schedule pipeline
        # over a large synthetic frontier (see ccspark.pipeline docstring —
        # compute-dominated, fixed dataset partitioning)
        os.environ["SPARK_GRAFT_CPUS"] = str(args.cpus)
        global CPUS
        CPUS = args.cpus
        from ccspark.session import build_session
        from ccspark.pipeline import run_schedule_bench

        universe = int(os.environ.get("CCSPARK_SCALE_UNIVERSE", "8000000"))
        # shuffle to tmpfs: a single shared spinning /tmp is a local-mode
        # artifact — on a real cluster every executor shuffles to its own
        # local NVMe, so memory-backed shuffle is the cluster-faithful setup
        local_dir = "/dev/shm/ccspark-shuffle"
        os.makedirs(local_dir, exist_ok=True)
        spark = build_session(
            "ccspark-scale",
            master=f"local[{args.cpus}]",
            shuffle_partitions=FRONTIER_PARTITIONS,
            extra_conf={"spark.local.dir": local_dir},
        )
        out = f"/dev/shm/ccspark-scale-out_{os.getpid()}"
        stats = run_schedule_bench(spark, universe, out, num_partitions=FRONTIER_PARTITIONS)
        shutil.rmtree(out, ignore_errors=True)
        spark.stop()
        print(json.dumps(stats))
        return 0

    if args.scaling:
        # median of 3 trials per level, alternating levels so slow drift
        # in the shared sandbox affects both sides equally
        lo, hi = (int(x) for x in os.environ.get("CCSPARK_SCALE_PAIR", "4,16").split(","))
        trials: dict[int, list] = {lo: [], hi: []}
        for _ in range(int(os.environ.get("CCSPARK_SCALE_TRIALS", "3"))):
            for n in (lo, hi):
                out = subprocess.run(
                    [sys.executable, os.path.abspath(__file__), "--cpus", str(n)],
                    capture_output=True,
                    text=True,
                    env={**os.environ, "SPARK_GRAFT_CPUS": str(n)},
                )
                last = out.stdout.strip().splitlines()[-1]
                trials[n].append(json.loads(last))
        def med(n):
            xs = sorted(t["urls_per_sec"] for t in trials[n])
            return xs[len(xs) // 2]
        eff = round((med(hi) / med(lo)) / (hi / lo), 3)
        # per-trial pairing (lo/hi run back to back) cancels the shared
        # sandbox's load drift, which exceeds the level effect itself
        paired = [
            round((h["urls_per_sec"] / l["urls_per_sec"]) / (hi / lo), 3)
            for l, h in zip(trials[lo], trials[hi])
        ]
        print(json.dumps({
            "pair": [lo, hi],
            "median_urls_per_sec": {f"local[{lo}]": med(lo), f"local[{hi}]": med(hi)},
            "trials": {str(k): [t["urls_per_sec"] for t in v] for k, v in trials.items()},
            "efficiency_of_medians": eff,
            "paired_efficiencies": paired,
            "median_paired_efficiency": sorted(paired)[len(paired) // 2],
        }))
        return 0

    res = run_queries()
    total = round(sum(res["timings"].values()), 3)
    out = {
        "metric": "headline query wall time (sum) + frontier round throughput",
        "value": total,
        "unit": "sec",
        "queries": res["timings"],
        "sf": _sf_of(SF_DIR),
        "frontier": res["frontier"],
        "frontier_prev_basis": res["frontier_prev_basis"],
        "cpus": CPUS,
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
