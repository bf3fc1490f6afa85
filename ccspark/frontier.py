"""The crawl frontier loop: iterative batch rounds over checkpointed
tables with per-partition lineage and deterministic resume.

Round shape (north_rule; SURVEY.md §7 step 7):

    frontier ──filter_new (bloom/cuckoo + exact confirm)──▶ novel
    novel ──robots + crawl-delay budget + salted rank──▶ scheduled
    scheduled ──deterministic fetch simulation──▶ discovered links
    seen    += scheduled identities           (append delta)
    frontier' = (novel − scheduled) ∪ (links − seen), max-priority merge
    lineage  += per-partition row (emitted / deduped / budget)
    checkpoint all tables, commit manifest atomically

Determinism: every ordering is total — (priority DESC, domain_hash,
url_hash) — so the scheduled trace is invariant to partition count and
executor count; re-running any round reproduces identical bytes.  That
is what makes kill-and-resume exact (tests/test_frontier.py) and the
reference-oracle replay comparable (same seeds + budgets → same trace,
BASELINE.json north_star).

Scale notes: per-host ranks come from the two-stage salted window
(politeness.rank_per_host) — no global window; the seen-set pre-filter
is partition-local (seenset.probe_filters cogroup) — no broadcast of
filter state; link expansion is a mapInPandas over scheduled rows — no
driver participation.  Priorities decay per hop (0.8) so the frontier
drains.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import politeness, seenset, synth
from . import functions as CF
from .checkpoint import Checkpoint

FRONTIER_COLS = [
    "url",
    "canonical_url",
    "domain_hash",
    "url_hash",
    "root_domain_hash",
    "priority",
    "discovered_round",
]

LINK_DECAY = 0.8


class FrontierConfig:
    def __init__(
        self,
        num_partitions: int = 32,
        universe_n: int = 100_000,
        n_hosts: int | None = None,
        seed: int = 42,
        links_per_fetch: int = 3,
        default_budget: int = politeness.DEFAULT_BUDGET,
        round_duration_ms: int = politeness.DEFAULT_ROUND_MS,
        n_salts: int = 16,
        filter_kind: str = "bloom",
        buckets_per_element: int = 10,
        capacity_per_partition: int | None = None,
    ):
        self.num_partitions = num_partitions
        self.universe_n = universe_n
        self.n_hosts = n_hosts or synth.default_n_hosts(universe_n)
        self.seed = seed
        self.links_per_fetch = links_per_fetch
        self.default_budget = default_budget
        self.round_duration_ms = round_duration_ms
        self.n_salts = n_salts
        self.filter_kind = filter_kind
        self.buckets_per_element = buckets_per_element
        # fixed bloom capacity → per-round delta build + bitwise-OR merge
        self.capacity_per_partition = capacity_per_partition or max(
            4 * universe_n // num_partitions, 1024
        )


def expand_links_pdf(url_hashes: np.ndarray, cfg: FrontierConfig) -> pd.DataFrame:
    """Deterministic out-links of fetched pages: splitmix64(url_hash, j)
    mod universe → synthetic raw URL.  Stand-in for parsing anchors out
    of fetched HTML (protocol.jr anchorTags) — same distribution shape,
    fully replayable."""
    n = len(url_hashes)
    if n == 0:
        return pd.DataFrame({"parent_url_hash": pd.Series(dtype=np.int64), "url": pd.Series(dtype=object)})
    parents = np.repeat(np.asarray(url_hashes, dtype=np.int64), cfg.links_per_fetch)
    j = np.tile(np.arange(cfg.links_per_fetch, dtype=np.int64), n)
    with np.errstate(over="ignore"):
        link_ids = synth._rand(parents + j * 1_000_003, 20, cfg.seed) % np.uint64(cfg.universe_n)
    urls, _ = synth.gen_urls_pdf(link_ids.astype(np.int64), cfg.n_hosts, cfg.seed)
    return pd.DataFrame({"parent_url_hash": parents, "url": urls.to_numpy()})


class CrawlFrontier:
    """Checkpointed crawl-frontier driver."""

    def __init__(self, spark: SparkSession, ckpt_dir: str, cfg: FrontierConfig | None = None):
        self.spark = spark
        self.cfg = cfg or FrontierConfig()
        self.ckpt = Checkpoint(ckpt_dir)

    # -- plumbing ---------------------------------------------------------

    def _identify(self, raw: DataFrame, round_no: int) -> DataFrame:
        """raw(url, priority) → frontier rows (canonical identity, valid
        only, max-priority dedup)."""
        df = CF.with_canonical_urlfp(raw).filter("url_valid")
        return (
            df.groupBy("domain_hash", "url_hash")
            .agg(
                F.min("url").alias("url"),
                F.min("canonical_url").alias("canonical_url"),
                F.min("root_domain_hash").alias("root_domain_hash"),
                F.max("priority").alias("priority"),
                F.lit(round_no).alias("discovered_round"),
            )
            .select(*FRONTIER_COLS)
        )

    def _robots(self) -> DataFrame:
        return synth.gen_robots(self.spark, self.cfg.n_hosts, self.cfg.seed)

    # -- lifecycle --------------------------------------------------------

    def bootstrap(self, seeds: DataFrame) -> None:
        """Round 0: establish the frontier from the seed list."""
        frontier = self._identify(seeds, 0)
        self.ckpt.write(frontier, "frontier", 0)
        empty_seen = self.spark.createDataFrame([], "domain_hash long, url_hash long")
        self.ckpt.write(empty_seen, "seen", 0)
        # empty filter table constructed driver-side (deterministic; no
        # zero-row build job)
        filters = self.spark.createDataFrame(
            seenset.empty_filters_pdf(
                self.cfg.num_partitions,
                self.cfg.filter_kind,
                self.cfg.buckets_per_element,
                capacity=self.cfg.capacity_per_partition
                if self.cfg.filter_kind == "bloom"
                else None,
            ),
            schema=seenset.FILTER_SCHEMA,
        )
        self.ckpt.write(filters, "filters", 0)
        n0 = frontier.count()
        self.ckpt.commit_round(
            0,
            {"frontier": "round=0", "seen": "round=0", "filters": "round=0"},
            extra={"frontier_size": n0},
        )

    def run_round(self, round_no: int) -> dict:
        """Execute one crawl round (round_no >= 1); returns metrics.

        Action budget (the per-round fixed cost at production scale):
        exactly four write jobs — scheduled, frontier, filters, lineage
        (+ the tiny seen-delta write folded into the scheduled job's
        cached inputs).  All row counts come from Observations attached
        to those same writes; no separate .count()/.toPandas() jobs and
        no post-write re-reads."""
        import os
        import time as _time

        from pyspark.sql import Observation

        _prof = os.environ.get("CCSPARK_PROFILE") == "1"
        _t0 = _time.time()

        def _mark(label):
            nonlocal _t0
            if _prof:
                now = _time.time()
                print(f"[frontier r{round_no}] {label}: {now - _t0:.2f}s", flush=True)
                _t0 = now

        spark, cfg, ckpt = self.spark, self.cfg, self.ckpt
        prev = round_no - 1

        frontier = ckpt.read(spark, "frontier", prev)
        seen = ckpt.read_all_rounds(spark, "seen", prev)
        filters = ckpt.read(spark, "filters", prev)

        prev_manifest = ckpt.read_manifest() or {}
        n_candidates = (
            int(prev_manifest["frontier_size"])
            if prev_manifest.get("round") == prev and "frontier_size" in prev_manifest
            else frontier.count()
        )
        if n_candidates == 0:
            ckpt.write(frontier, "frontier", round_no)
            ckpt.write(spark.createDataFrame([], "domain_hash long, url_hash long"), "seen", round_no)
            ckpt.write(filters, "filters", round_no)
            ckpt.commit_round(round_no, {"empty": "true"})
            return {"round": round_no, "candidates": 0, "scheduled": 0, "new_links": 0}

        # novelty gate: bloom/cuckoo pre-screen + exact confirm.  With a
        # fixed-capacity bloom the total filter state size is known
        # up-front, so small/mid crawls take the shuffle-free broadcast
        # probe and only 10^10-scale state cogroups.
        bloom_bytes = (
            cfg.num_partitions
            * seenset.bitset_size(cfg.capacity_per_partition, cfg.buckets_per_element)
            // 8
            if cfg.filter_kind == "bloom"
            else None
        )
        obs_novel = Observation(f"novel_{round_no}")
        novel = (
            seenset.filter_new(
                frontier, seen, filters, cfg.num_partitions, broadcast_bytes=bloom_bytes
            )
            .observe(obs_novel, F.count(F.lit(1)).alias("n"))
            .cache()
        )

        # politeness: robots + budgets + salted per-host rank; disallowed
        # rows are retired into the seen set so the frontier drains of
        # them instead of re-probing every round
        sched_df, disallowed = politeness.schedule_round(
            novel,
            self._robots(),
            cfg.default_budget,
            cfg.round_duration_ms,
            cfg.n_salts,
            return_disallowed=True,
        )
        sched_cols = [
            "round",
            "host",
            "host_rank",
            "url",
            "canonical_url",
            "domain_hash",
            "url_hash",
            "priority",
        ]
        obs_sched = Observation(f"sched_{round_no}")
        scheduled = (
            sched_df.withColumn("round", F.lit(round_no))
            .select(*sched_cols)
            .observe(obs_sched, F.count(F.lit(1)).alias("n"))
            .cache()
        )
        ckpt.write(scheduled, "scheduled", round_no)  # action 1 (fills caches)
        _mark("sched_write")

        # seen delta = scheduled ∪ robots-excluded identities
        seen_delta = (
            scheduled.select("domain_hash", "url_hash")
            .unionByName(disallowed.select("domain_hash", "url_hash"))
            .cache()
        )
        ckpt.write(seen_delta, "seen", round_no)  # action 2 (small)
        _mark("seen_write")
        seen_new = (
            seen.unionByName(seen_delta) if seen is not None else seen_delta
        )

        # fetch simulation → discovered links
        def _expand(batches):
            for pdf in batches:
                links = expand_links_pdf(pdf["url_hash"].to_numpy(), cfg)
                links["priority"] = np.repeat(
                    pdf["priority"].to_numpy() * LINK_DECAY, cfg.links_per_fetch
                )
                yield links[["url", "priority"]]

        links_raw = scheduled.select("url_hash", "priority").mapInPandas(
            _expand, schema="url string, priority double"
        )
        # identity columns WITHOUT the per-links groupBy — the
        # next-frontier aggregation below dedups (min url / max priority)
        # over leftover ∪ links in ONE shuffle instead of two
        links = (
            CF.with_canonical_urlfp(links_raw)
            .filter("url_valid")
            .withColumn("discovered_round", F.lit(round_no))
            .select(*FRONTIER_COLS)
        )

        # next frontier: unscheduled novel + unseen links, max-priority merge
        leftover = novel.join(seen_delta, ["domain_hash", "url_hash"], "left_anti").select(*FRONTIER_COLS)
        links_unseen = links.join(seen_new, ["domain_hash", "url_hash"], "left_anti")
        obs_frontier = Observation(f"frontier_{round_no}")
        next_frontier = (
            leftover.unionByName(links_unseen)
            .groupBy("domain_hash", "url_hash")
            .agg(
                F.min("url").alias("url"),
                F.min("canonical_url").alias("canonical_url"),
                F.min("root_domain_hash").alias("root_domain_hash"),
                F.max("priority").alias("priority"),
                F.min("discovered_round").alias("discovered_round"),
            )
            .select(*FRONTIER_COLS)
            .observe(obs_frontier, F.count(F.lit(1)).alias("n"))
        )
        # NOTE: no repartition after the groupBy — the agg already
        # distributed rows by (domain_hash, url_hash) and every consumer
        # (probe, exact confirm, lineage) re-keys itself; a second full
        # shuffle bought nothing.
        ckpt.write(next_frontier, "frontier", round_no)  # action 3
        _mark("frontier_write")

        # filters: bloom → incremental (delta build over this round's new
        # identities, then bitwise-OR with the previous filter — never a
        # full-seen rescan); cuckoo → rebuild (no cheap union).
        if cfg.filter_kind == "bloom":
            # fused delta-build + OR-merge: one cogrouped pass instead of
            # build_filters + merge_filters (two shuffles)
            filters_new = seenset.augment_filters(
                filters,
                seen_delta,
                cfg.num_partitions,
                cfg.buckets_per_element,
                capacity=cfg.capacity_per_partition,
            )
        else:
            filters_new = seenset.build_filters(
                seen_new, cfg.num_partitions, "cuckoo", cfg.buckets_per_element
            )
        ckpt.write(filters_new, "filters", round_no)  # action 4
        _mark("filters_write")

        # lineage: per-partition commit record — ONE tagged-union job over
        # the cached frames instead of three groupBys + joins
        pid = F.pmod(F.col("domain_hash"), F.lit(cfg.num_partitions)).cast("int")
        tagged = (
            frontier.select(pid.alias("partition_id"), F.lit("cand").alias("t"), "domain_hash")
            .unionByName(novel.select(pid.alias("partition_id"), F.lit("novel").alias("t"), "domain_hash"))
            .unionByName(scheduled.select(pid.alias("partition_id"), F.lit("sched").alias("t"), "domain_hash"))
        )
        lineage = (
            tagged.groupBy("partition_id")
            .agg(
                F.count(F.when(F.col("t") == "cand", 1)).alias("n_candidates"),
                F.count(F.when(F.col("t") == "novel", 1)).alias("n_novel"),
                F.count(F.when(F.col("t") == "sched", 1)).alias("urls_emitted"),
                F.min(F.when(F.col("t") == "sched", F.col("domain_hash"))).alias("hash_range_start"),
                F.max(F.when(F.col("t") == "sched", F.col("domain_hash"))).alias("hash_range_end"),
            )
            .withColumn("round", F.lit(round_no))
            .select(
                "round",
                "partition_id",
                "hash_range_start",
                "hash_range_end",
                "urls_emitted",
                (F.col("n_candidates") - F.col("n_novel")).alias("urls_deduped"),
                F.col("urls_emitted").alias("fetch_budget_consumed"),
            )
        )
        ckpt.write(lineage, "lineage", round_no)  # action 5 (tiny)
        _mark("lineage_write")

        # counts come from the Observations filled by the write actions —
        # no extra jobs
        n_novel = int(obs_novel.get["n"])
        n_scheduled = int(obs_sched.get["n"])
        n_frontier = int(obs_frontier.get["n"])
        novel.unpersist()
        scheduled.unpersist()
        seen_delta.unpersist()

        ckpt.commit_round(
            round_no,
            {t: f"round={round_no}" for t in ("frontier", "seen", "filters", "scheduled", "lineage")},
            extra={"scheduled": n_scheduled, "frontier_size": n_frontier},
        )
        return {
            "round": round_no,
            "candidates": n_candidates,
            "novel": n_novel,
            "scheduled": n_scheduled,
            "frontier_size": n_frontier,
        }

    def run(self, seeds: DataFrame | None, num_rounds: int) -> list[dict]:
        """Run/resume the crawl.  If a committed manifest exists, resume
        after its round (idempotent; a killed job re-runs only the
        uncommitted round)."""
        last = self.ckpt.last_committed_round()
        if last is None:
            assert seeds is not None, "first run needs a seed list"
            self.bootstrap(seeds)
            last = 0
        else:
            self.ckpt.drop_rounds_after(last)
        metrics = []
        for r in range(last + 1, last + 1 + num_rounds):
            m = self.run_round(r)
            metrics.append(m)
            if m["scheduled"] == 0 and m.get("frontier_size", 0) == 0:
                break
        return metrics
