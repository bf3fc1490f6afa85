#!/usr/bin/env python
"""Pure-kernel scaling microbench: canonicalize+fingerprint throughput
at K parallel worker processes (no Spark, no shuffle) — isolates the
Python kernel's multicore efficiency from Spark scheduling noise.

    python BENCH/kernel_scaling.py [lo] [hi] [rows_per_proc] [trials]

Each worker canonicalizes + fingerprints its own private batch of messy
URLs (the bench workload shape), so the only shared resource is the
memory bus — the quantity the ≥0.8 N→4N criterion stresses.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


_BARRIER = None


def _init(barrier):
    global _BARRIER
    _BARRIER = barrier


def _worker(args):
    """Generate privately, warm once, BARRIER, then time the kernel only
    — spawn/import/generation never pollute the measured window, and the
    barrier guarantees all K workers hammer the memory bus together."""
    seed, n, reps = args
    import numpy as np
    import pandas as pd

    from ccspark import urls as U

    ids = np.arange(seed * n, (seed + 1) * n)
    src = np.char.add("src", (ids % 20).astype(str))
    url = np.where(ids % 3 == 0, "http://www.", "http://")
    url = np.char.add(url, src)
    url = np.char.add(url, ".example.com")
    url = np.char.add(url, np.where(ids % 5 == 0, ":80", ""))
    url = np.char.add(url, "/docs/")
    url = np.char.add(url, ids.astype(str))
    url = np.char.add(
        url, np.where(ids % 7 == 0, ";jsessionid=abcdef0123456789abcdef0123456789", "")
    )
    s = pd.Series(url.astype(object))
    canon, hosts = U.canonicalize_batch_with_host(s)  # warm pages + code
    _BARRIER.wait()
    t0 = time.time()
    for _ in range(reps):
        canon, hosts = U.canonicalize_batch_with_host(s)
        U.urlfp_batch(canon, hosts=hosts)
    wall = time.time() - t0
    return n * reps, wall


def run_level(k: int, rows: int, reps: int = 2) -> float:
    ctx = mp.get_context("spawn")
    barrier = ctx.Barrier(k)
    with ctx.Pool(k, initializer=_init, initargs=(barrier,)) as pool:
        results = pool.map(_worker, [(i, rows, reps) for i in range(k)])
    total = sum(r[0] for r in results)
    return total / max(r[1] for r in results)


def main():
    lo = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    hi = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    rows = int(sys.argv[3]) if len(sys.argv) > 3 else 400_000
    trials = int(sys.argv[4]) if len(sys.argv) > 4 else 3
    out = {lo: [], hi: []}
    for _ in range(trials):
        for k in (lo, hi):
            out[k].append(round(run_level(k, rows), 1))
    med = {k: sorted(v)[len(v) // 2] for k, v in out.items()}
    eff = round((med[hi] / med[lo]) / (hi / lo), 3)
    # paired per-trial efficiency: each trial runs lo then hi back to
    # back, so the pair sees the same box conditions — pairing cancels
    # the sandbox's slow load drift that independent medians cannot
    paired = [
        round((h / l) / (hi / lo), 3) for l, h in zip(out[lo], out[hi])
    ]
    print(
        json.dumps(
            {
                "pair": [lo, hi],
                "rows_per_proc": rows,
                "median_urls_per_sec": med,
                "trials": {str(k): v for k, v in out.items()},
                "efficiency_of_medians": eff,
                "paired_efficiencies": paired,
                "median_paired_efficiency": sorted(paired)[len(paired) // 2],
            }
        )
    )


if __name__ == "__main__":
    main()
