"""The crawl frontier loop: iterative batch rounds over checkpointed
tables with per-partition lineage and deterministic resume.

Round shape (north_rule; SURVEY.md §7 step 7):

    frontier ──filter_new (bloom/cuckoo + exact confirm)──▶ novel
    novel ──robots + crawl-delay budget + salted rank──▶ processed
              (= scheduled rows ∪ robots-retired rows; host_rank NULL
               marks retirement — ONE table, so the seen delta is just
               its identity columns and needs no write of its own)
    scheduled ──deterministic fetch simulation──▶ discovered links
    seen     = processed identities across rounds (derived, not stored)
    frontier' = (novel − processed) ∪ (links − seen), max-priority merge
    lineage  += per-partition row (emitted / deduped / budget),
               collected to the driver and written with pyarrow
    checkpoint all tables, commit manifest atomically

Determinism: every ordering is total — (priority DESC, domain_hash,
url_hash) — so the scheduled trace is invariant to partition count and
executor count; re-running any round reproduces identical bytes.  That
is what makes kill-and-resume exact (tests/test_frontier.py) and the
reference-oracle replay comparable (same seeds + budgets → same trace,
BASELINE.json north_star).

Scale notes: per-host ranks come from the two-stage salted window
(politeness.rank_per_host) — no global window; link expansion is a
mapInPandas over scheduled rows — no driver participation.  Priorities
decay per hop (0.8) so the frontier drains.

STORAGE-PARTITIONED STATE (the 100×-scale design): every state table
(frontier, processed, filters) is written Hive-partitioned by
``partition_id = pmod(domain_hash, P)`` — one file per partition per
round — and the novelty gate, the links gate, and the per-round filter
update all read their state WORKER-SIDE with partition pruning
(seenstore.py).  The crawl history and the filter blobs therefore
never enter a Spark Exchange: per round the only shuffles are
delta-sized (politeness windows, the leftover anti-join, the
next-frontier identity dedup, one repartition that keeps the
one-file-per-partition layout).  The r3 design re-shuffled the full
seen set into the gate every round (cogroup state side + the links
anti-join) — at 10^10 URLs that one history-sized shuffle per round
dominates everything; here it is gone, and the per-round seen-set I/O
is O(delta) thanks to seenstore's incremental per-worker cache.
Reference analog: shard-stable part files keyed by shard id
(Query.java:1080-1082).
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

FRONTIER_COLS_PID = FRONTIER_COLS + ["partition_id"]


def _pid_col(num_partitions: int):
    return F.pmod(F.col("domain_hash"), F.lit(num_partitions)).cast("int")


def dedup_by_identity(df: DataFrame, num_partitions: int) -> DataFrame:
    """Max-priority identity dedup that LANDS partition-clustered, fully
    JVM-side, with exactly ONE Exchange: repartition by partition_id
    (instead of by (domain_hash, url_hash)), then groupBy
    (partition_id, domain_hash, url_hash) — HashPartitioning on
    partition_id is a subset of the group keys, so Catalyst's
    ClusteredDistribution is already satisfied and the aggregate adds NO
    second Exchange (partition_id = pmod(domain_hash, P) is functionally
    dependent on domain_hash, so the extra key never changes groups).
    The output feeds a partitionBy("partition_id") write directly: one
    file per partition per round, which is what makes the worker-side
    storage gate (seenstore) partition-prunable."""
    return (
        df.select(*FRONTIER_COLS)
        .withColumn("partition_id", _pid_col(num_partitions))
        .repartition(num_partitions, "partition_id")
        .groupBy("partition_id", "domain_hash", "url_hash")
        .agg(
            F.min("url").alias("url"),
            F.min("canonical_url").alias("canonical_url"),
            F.min("root_domain_hash").alias("root_domain_hash"),
            F.max("priority").alias("priority"),
            F.min("discovered_round").alias("discovered_round"),
        )
        .select(*FRONTIER_COLS_PID)
    )


def _lineage_arrow_schema():
    import pyarrow as pa

    return pa.schema(
        [
            ("round", pa.int32()),
            ("partition_id", pa.int32()),
            ("hash_range_start", pa.int64()),
            ("hash_range_end", pa.int64()),
            ("urls_emitted", pa.int64()),
            ("urls_deduped", pa.int64()),
            ("fetch_budget_consumed", pa.int64()),
        ]
    )


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
        max_frontier_per_host: int | None = None,
        cluster_link_gate: bool | None = None,
        broadcast_robots: bool | None = None,
        revisit_after: int | None = None,
        revisit_decay: float = 0.5,
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
        # per-host frontier cap: a hot host's queue is priority-evicted
        # down to this size each round (None = unbounded); evicted URLs
        # stay rediscoverable through future links
        self.max_frontier_per_host = max_frontier_per_host
        # discovered links arrive unclustered; at huge filter state each
        # gate task should touch ~1 partition's state, so cluster them
        # (one delta-sized Exchange) first.  None = auto: cluster when
        # the filter state is past broadcast size (a big crawl).
        self.cluster_link_gate = cluster_link_gate
        # robots rules ride a broadcast join while the table is small;
        # at web scale (10^8+ hosts) the rules won't fit an executor —
        # auto-switch to the shuffle join (the gate keys on host, so the
        # politeness windows reuse the same clustering)
        self.broadcast_robots = (
            broadcast_robots if broadcast_robots is not None else self.n_hosts <= 2_000_000
        )
        # revisit scheduling (recrawl): URLs scheduled in round r re-enter
        # the candidate stream at round r + revisit_after with decayed
        # priority, INJECTED AFTER the novelty gate (they are in the seen
        # set by design — the gate's semantics stay exact for discovery).
        # Revisits compete under the same robots/budget politeness; a
        # revisit squeezed out by budget skips that cycle (each processed
        # round is re-offered exactly once).  None = no recrawl.
        self.revisit_after = revisit_after
        self.revisit_decay = revisit_decay
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

    def __init__(
        self,
        spark: SparkSession,
        ckpt_dir: str,
        cfg: FrontierConfig | None = None,
        checkpoint=None,
        expand_fn=None,
        robots_df=None,
    ):
        """``ckpt_dir`` may be a filesystem path (parquet-emulation
        backend) or ``iceberg:<catalog>.<namespace>`` (real Iceberg
        catalog backend, see ccspark.catalog); ``checkpoint`` overrides
        with an explicit backend instance.

        ``expand_fn(scheduled_df) -> DataFrame(url, priority)`` plugs a
        REAL fetch + link-extraction pipeline (e.g. fetch html, then
        ccspark.links.page_links) in place of the deterministic
        simulation; its output goes through the same fused
        canonicalize+fingerprint identity as every other URL.  The
        default simulation is what keeps the pure-Python replay oracle
        exact.

        ``robots_df`` overrides the synthetic robots table with real
        rules (e.g. fetch.fetch_robots over the seed hosts) — same
        (host, disallow_prefixes, crawl_delay_ms, max_fetches_per_round)
        schema."""
        from .catalog import make_checkpoint

        self.spark = spark
        self.cfg = cfg or FrontierConfig()
        self.ckpt = checkpoint or make_checkpoint(spark, ckpt_dir)
        self.expand_fn = expand_fn
        self._robots_df = robots_df

    # -- plumbing ---------------------------------------------------------

    def _identify(self, raw: DataFrame, round_no: int) -> DataFrame:
        """raw(url, priority) → frontier rows (canonical identity, valid
        only, max-priority dedup), partition-clustered for the
        one-file-per-partition checkpoint layout."""
        df = (
            CF.with_canonical_urlfp(raw)
            .filter("url_valid")
            .withColumn("discovered_round", F.lit(round_no))
        )
        return dedup_by_identity(df, self.cfg.num_partitions)

    def _robots(self) -> DataFrame:
        # memoized: the rules table is immutable across rounds — rebuilding
        # the local relation every round re-ships n_hosts rows to the JVM
        if getattr(self, "_robots_df", None) is None:
            self._robots_df = synth.gen_robots(self.spark, self.cfg.n_hosts, self.cfg.seed)
        return self._robots_df

    # -- read surfaces ------------------------------------------------------

    def read_trace(self, upto_round: int) -> DataFrame:
        """Scheduled trace rows across rounds 1..upto (the crawl
        ordering): the scheduled half of the per-round processed table."""
        return (
            self.ckpt.read_all_rounds(self.spark, "processed", upto_round)
            .filter(F.col("host_rank").isNotNull())
        )

    def read_seen(self, upto_round: int) -> DataFrame | None:
        """Seen-set membership = every identity the crawl has disposed of
        (scheduled or robots-retired) across rounds 1..upto."""
        proc = self.ckpt.read_all_rounds(self.spark, "processed", upto_round)
        return None if proc is None else proc.select("domain_hash", "url_hash")

    # -- lifecycle --------------------------------------------------------

    def bootstrap(self, seeds: DataFrame) -> None:
        """Round 0: establish the frontier from the seed list.

        ONE Spark action: the identified-seeds write, with the row count
        read off an Observation instead of a second (full-recompute)
        count job.  The empty filter table is deterministic driver-side
        data — written with pyarrow directly, no job; the seen set
        starts absent (read_all_rounds returns None for round 0)."""
        from pyspark.sql import Observation

        obs = Observation("bootstrap_n")
        frontier = self._identify(seeds, 0).observe(obs, F.count(F.lit(1)).alias("n"))
        self.ckpt.write(frontier, "frontier", 0, partition_by=["partition_id"])
        self.ckpt.write_pdf(
            seenset.empty_filters_pdf(
                self.cfg.num_partitions,
                self.cfg.filter_kind,
                self.cfg.buckets_per_element,
                capacity=self.cfg.capacity_per_partition
                if self.cfg.filter_kind == "bloom"
                else None,
            ),
            "filters",
            0,
            arrow_schema=seenset.filter_arrow_schema(),
            partition_col="partition_id",
        )
        self.ckpt.commit_round(
            0,
            {"frontier": "round=0", "filters": "round=0"},
            extra={"frontier_size": int(obs.get["n"])},
        )

    def run_round(self, round_no: int) -> dict:
        """Execute one crawl round (round_no >= 1); returns metrics.

        Action budget (the per-round fixed cost at production scale):
        exactly THREE write jobs — processed (scheduled ∪ robots-retired,
        one table so the seen delta needs no write of its own), frontier,
        filters — plus one tiny collect for the per-partition lineage
        rows, which land via a driver-side pyarrow write.  All row
        counts come from Observations attached to those same actions; no
        separate .count()/.toPandas() jobs and no post-write re-reads."""
        import os
        import time as _time

        from pyspark.sql import Observation

        _prof = os.environ.get("CCSPARK_PROFILE") == "1"
        _expl = os.environ.get("CCSPARK_EXPLAIN") == "1"
        _t0 = _time.time()

        def _mark(label):
            nonlocal _t0
            if _prof:
                now = _time.time()
                print(f"[frontier r{round_no}] {label}: {now - _t0:.2f}s", flush=True)
                _t0 = now

        def _explain(df, label):
            # plan-audit hook: `CCSPARK_EXPLAIN=1` prints each write
            # frame's physical plan (the BENCH Exchange audits)
            if _expl:
                print(f"==== r{round_no} {label} ====", flush=True)
                df.explain("formatted")

        spark, cfg, ckpt = self.spark, self.cfg, self.ckpt
        prev = round_no - 1
        # state location for the storage-partitioned gates (zero
        # Exchange on any state table).  Filesystem backends expose a
        # root path; catalog backends (Iceberg) expose state_location()
        # — a file manifest enumerated from catalog metadata, refreshed
        # after each state write so later gates see the new files.
        # Backends with neither fall back to the Spark-side gates.
        root = getattr(ckpt, "root", None)

        def _loc():
            if root is not None:
                return root
            fn = getattr(ckpt, "state_location", None)
            return fn() if fn is not None else None

        loc = _loc()

        # empty-frontier check BEFORE the read: a drained frontier's
        # partitioned write has no data files, so the scan can't infer a
        # schema — and the manifest already carries the count anyway
        prev_manifest = ckpt.read_manifest() or {}
        if prev_manifest.get("round") == prev and "frontier_size" in prev_manifest:
            n_candidates = int(prev_manifest["frontier_size"])
        else:
            n_candidates = ckpt.read(spark, "frontier", prev).count()
        # a drained frontier still runs the round when a recrawl cycle is
        # due AND its source round actually has scheduled rows — an
        # all-empty round must take the copy-forward path (an empty
        # LocalRelation collapses the plan and prunes the CollectMetrics
        # nodes the Observations hang off), and the source may be absent
        # entirely (empty rounds write no processed table)
        revisit_due = bool(cfg.revisit_after) and round_no - cfg.revisit_after >= 1
        revisit_src = None
        if revisit_due:
            src_round = round_no - cfg.revisit_after
            readable = True
            if root is not None:  # cheap files-first probe, no JVM exception noise
                src_dir = ckpt.table_dir("processed", src_round)
                readable = os.path.isdir(src_dir) and Checkpoint._has_parquet(src_dir)
            if readable:
                try:
                    df_src = ckpt.read(spark, "processed", src_round)
                    if "root_domain_hash" in df_src.columns:
                        revisit_src = df_src.filter(F.col("host_rank").isNotNull())
                except Exception:  # noqa: BLE001 — missing/file-less round
                    revisit_src = None
        if n_candidates == 0 and revisit_src is not None:
            # cheap probe (tiny job, only on drained rounds): a source
            # with zero scheduled rows means nothing to revisit either
            if revisit_src.limit(1).count() == 0:
                revisit_src = None
        if n_candidates == 0 and revisit_src is None:
            # nothing to do: carry frontier+filters forward driver-side
            # (byte-identical copies — no Spark jobs at all)
            ckpt.copy_round("frontier", prev, round_no)
            ckpt.copy_round("filters", prev, round_no)
            ckpt.commit_round(round_no, {"empty": "true"}, extra={"frontier_size": 0})
            return {
                "round": round_no,
                "candidates": 0,
                "novel": 0,
                "scheduled": 0,
                "frontier_size": 0,
            }
        if n_candidates == 0:
            # recrawl-only round: an empty partitioned write has no data
            # files to infer a schema from — build the empty frame directly
            frontier = spark.createDataFrame(
                [],
                "url string, canonical_url string, domain_hash long, url_hash long, "
                "root_domain_hash long, priority double, discovered_round int",
            )
        else:
            # cached: the candidate table feeds both the novelty gate and
            # the lineage tagged-union — without the cache the lineage job
            # re-scans the parquet (one extra full read per round)
            frontier = ckpt.read(spark, "frontier", prev).cache()

        # novelty gate: bloom/cuckoo pre-screen + exact confirm.  The
        # frontier table is stored partition-clustered, so the storage
        # gate's tasks each touch ~1 partition's filter blob and (for
        # bloom false positives only) that partition's seen arrays —
        # no Exchange anywhere.  Fixed-capacity bloom state size is
        # known up-front for the fallback's broadcast-vs-cogroup choice.
        bloom_bytes = (
            cfg.num_partitions
            * seenset.bitset_size(cfg.capacity_per_partition, cfg.buckets_per_element)
            // 8
            if cfg.filter_kind == "bloom"
            else None
        )
        obs_novel = None
        if n_candidates == 0:
            # recrawl-only round: no gate and NO Observation — Catalyst
            # collapses a pure-Catalyst gate over an empty LocalRelation
            # and prunes the CollectMetrics node, which would leave
            # Observation.get blocked forever (the fallback/broadcast
            # path has no Exchange to stop empty-relation propagation)
            novel = frontier.cache()
            if loc is None:  # the fallback filters update needs these
                seen = self.read_seen(prev)
                filters = ckpt.read(spark, "filters", prev)
        else:
            obs_novel = Observation(f"novel_{round_no}")
            if loc is not None:
                gated = seenset.gate_new_storage(
                    frontier.select(*FRONTIER_COLS), loc, prev, prev, cfg.num_partitions
                )
            else:
                seen = self.read_seen(prev)  # None before the first completed round
                filters = ckpt.read(spark, "filters", prev)
                gated = seenset.filter_new(
                    frontier, seen, filters, cfg.num_partitions, broadcast_bytes=bloom_bytes
                ).select(*FRONTIER_COLS)
            novel = gated.observe(obs_novel, F.count(F.lit(1)).alias("n")).cache()

        # revisit injection (recrawl): the round processed revisit_after
        # rounds ago re-enters the candidate stream AFTER the gate (those
        # identities are seen — bypassing the gate is the point), with
        # decayed priority, under the same politeness as everything else.
        candidates_in = novel
        if revisit_src is not None:
            revisit = revisit_src.select(
                "url",
                "canonical_url",
                "domain_hash",
                "url_hash",
                "root_domain_hash",
                (F.col("priority") * cfg.revisit_decay).alias("priority"),
                F.lit(round_no).alias("discovered_round"),
            )
            candidates_in = novel.unionByName(revisit.select(*FRONTIER_COLS))

        # politeness: robots + budgets + salted per-host rank, ONE linear
        # plan producing the round's processed table = scheduled rows
        # (host_rank 1..budget) ∪ robots-retired rows (host_rank NULL,
        # so the frontier drains of them instead of re-probing every
        # round).  The seen delta is exactly this table's identity
        # columns, so it needs no write of its own.
        proc_df = politeness.process_round(
            candidates_in,
            self._robots(),
            cfg.default_budget,
            cfg.round_duration_ms,
            cfg.n_salts,
            broadcast_robots=cfg.broadcast_robots,
            layout_partitions=cfg.num_partitions,
        )
        sched_cols = [
            "round",
            "host",
            "host_rank",
            "url",
            "canonical_url",
            "domain_hash",
            "url_hash",
            "root_domain_hash",  # keeps processed rows frontier-shaped (revisit source)
            "priority",
        ]
        obs_proc = Observation(f"proc_{round_no}")
        processed = (
            proc_df.withColumn("round", F.lit(round_no))
            .withColumn("partition_id", _pid_col(cfg.num_partitions))
            .select(*sched_cols, "partition_id")
            .observe(
                obs_proc,
                F.count(F.lit(1)).alias("n"),
                F.count(F.when(F.col("host_rank").isNotNull(), F.lit(1))).alias("n_sched"),
            )
            .cache()
        )
        # no layout Exchange here: process_round's final rank already
        # hash-partitioned by pmod(domain_hash, P) (layout_partitions),
        # so the window output lands pre-clustered and the Hive-
        # partitioned write still produces one file per partition per
        # round — the layout every storage-gate read prunes on
        _explain(processed, "processed")
        ckpt.write(
            processed,
            "processed",
            round_no,
            partition_by=["partition_id"],
        )  # action 1 (fills caches)
        _mark("processed_write")

        scheduled = processed.filter(F.col("host_rank").isNotNull())
        seen_delta = processed.select("domain_hash", "url_hash")

        # lineage aggregate launched NOW on a driver thread (guide §2.6 —
        # overlap independent jobs): it reads only the caches action 1
        # just filled (frontier, novel, processed), so it can run
        # concurrently with the filters and frontier writes below and its
        # tasks back-fill their stage tails; the result is joined before
        # the commit.  Content is unchanged — only the schedule moved.
        from concurrent.futures import ThreadPoolExecutor

        pid = F.pmod(F.col("domain_hash"), F.lit(cfg.num_partitions)).cast("int")
        tagged = (
            frontier.select(pid.alias("partition_id"), F.lit("cand").alias("t"), "domain_hash")
            .unionByName(novel.select(pid.alias("partition_id"), F.lit("novel").alias("t"), "domain_hash"))
            .unionByName(scheduled.select(pid.alias("partition_id"), F.lit("sched").alias("t"), "domain_hash"))
        )
        lineage_agg = tagged.groupBy("partition_id").agg(
            F.count(F.when(F.col("t") == "cand", 1)).alias("n_candidates"),
            F.count(F.when(F.col("t") == "novel", 1)).alias("n_novel"),
            F.count(F.when(F.col("t") == "sched", 1)).alias("urls_emitted"),
            F.min(F.when(F.col("t") == "sched", F.col("domain_hash"))).alias("hash_range_start"),
            F.max(F.when(F.col("t") == "sched", F.col("domain_hash"))).alias("hash_range_end"),
        )
        _pool = ThreadPoolExecutor(max_workers=2)
        lineage_fut = _pool.submit(lineage_agg.collect)  # action 4 (overlapped)

        # filters next (before the frontier write), so the links gate can
        # probe the JUST-AUGMENTED blobs: one seen-scan per round total.
        # Storage path: the driving frame is range(P) partition ids; each
        # task reads its own previous blob + this round's just-written
        # seen delta file straight from their partition directories and
        # ORs (bloom) / rebuilds (cuckoo) — the filter state and the
        # crawl history never enter an Exchange.
        if loc is not None:
            filters_new = seenset.update_filters_storage(
                spark,
                _loc(),  # refreshed: covers the just-written processed delta
                round_no,
                cfg.num_partitions,
                kind=cfg.filter_kind,
                buckets_per_element=cfg.buckets_per_element,
                capacity=cfg.capacity_per_partition if cfg.filter_kind == "bloom" else None,
            )
        elif cfg.filter_kind == "bloom":
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
            seen_new = seen.unionByName(seen_delta) if seen is not None else seen_delta
            filters_new = seenset.build_filters(
                seen_new, cfg.num_partitions, "cuckoo", cfg.buckets_per_element
            )
        _explain(filters_new, "filters")
        if loc is not None:
            # the filters write only gates the FINAL frontier gate, not
            # the links expansion / identity dedup — run it on a driver
            # thread (guide §2.6) so its tasks overlap the dedup
            # materialization below; joined before the gated write.
            filters_fut = _pool.submit(
                ckpt.write, filters_new, "filters", round_no, ["partition_id"]
            )
        else:
            ckpt.write(
                filters_new, "filters", round_no, partition_by=["partition_id"]
            )  # action 2
            _mark("filters_write")

        # link discovery: either the pluggable real pipeline (expand_fn →
        # raw urls → the fused identity kernel) or the deterministic
        # fetch simulation with expansion + canonicalize + fingerprint
        # FUSED into one python pass (one Arrow hop; link strings cross
        # the boundary once).  Identity columns WITHOUT the per-links
        # groupBy — the next-frontier aggregation below dedups (min url /
        # max priority) over leftover ∪ links in ONE shuffle instead of
        # two.
        def _expand_ident(batches):
            from . import urls as urls_mod

            for pdf in batches:
                raw = expand_links_pdf(pdf["url_hash"].to_numpy(), cfg)
                pri = np.repeat(
                    pdf["priority"].to_numpy() * LINK_DECAY, cfg.links_per_fetch
                )
                u = raw["url"]
                canon, hosts = urls_mod.canonicalize_batch_with_host(u)
                fp = urls_mod.urlfp_batch(canon, hosts=hosts)
                yield pd.DataFrame(
                    {
                        "url": u.to_numpy(),
                        "canonical_url": canon.to_numpy(),
                        "domain_hash": fp["domain_hash"],
                        "url_hash": fp["url_hash"],
                        "root_domain_hash": fp["root_domain_hash"],
                        "priority": pri,
                        "url_valid": fp["valid"],
                    }
                )

        if self.expand_fn is not None:
            # real pipeline: expand_fn yields raw (url, priority); the
            # fused kernel assigns the same canonical identity as
            # everything else in the engine
            links_raw = CF.with_canonical_urlfp(self.expand_fn(scheduled))
        else:
            links_raw = scheduled.select("url_hash", "priority").mapInPandas(
                _expand_ident,
                schema=(
                    "url string, canonical_url string, domain_hash long, "
                    "url_hash long, root_domain_hash long, priority double, "
                    "url_valid boolean"
                ),
            )
        links = (
            links_raw.filter("url_valid")
            .withColumn("discovered_round", F.lit(round_no))
            .select(*FRONTIER_COLS)
        )

        # links gate + next frontier, storage path: dedup FIRST, gate
        # AFTER.  The identity dedup's one Exchange (by partition_id)
        # already lands rows clustered exactly the way the storage gate
        # wants them, so gating the DEDUPED union (novel ∪ links) against
        # the just-augmented round-k filters replaces three operators of
        # the old shape with zero extra shuffles: the links-clustering
        # Exchange (the gate now inherits the dedup's clustering), the
        # leftover anti-join against seen_delta (round-k filters contain
        # the delta, so the gate itself retires just-processed novel
        # rows), and the gate runs over post-dedup rows (fewer).
        # Equivalence: for any identity, either it is seen through round
        # k (every one of its rows was dropped before — by the anti-join
        # or the old links gate — and is dropped now by the gate), or it
        # is unseen (all rows kept in both shapes), so the per-identity
        # row multiset feeding the max-priority merge is unchanged.
        obs_frontier = Observation(f"frontier_{round_no}")
        if loc is not None:
            # materialize the expansion+dedup NOW (eager localCheckpoint)
            # — it does not depend on the filters state, so its job runs
            # CONCURRENTLY with the threaded filters write above; only
            # the gate must wait for the round-k blobs.
            merged = dedup_by_identity(
                novel.select(*FRONTIER_COLS).unionByName(links.select(*FRONTIER_COLS)),
                cfg.num_partitions,
            ).localCheckpoint()
            filters_fut.result()  # round-k blobs are on disk past this point
            _mark("filters_write+dedup_overlap")
            next_frontier = seenset.gate_new_storage(
                merged, _loc(), round_no, round_no, cfg.num_partitions
            )  # refreshed location: probes the just-written round-k blobs
        else:
            seen_new = seen.unionByName(seen_delta) if seen is not None else seen_delta
            links_new = links.join(seen_new, ["domain_hash", "url_hash"], "left_anti")
            leftover = novel.join(seen_delta, ["domain_hash", "url_hash"], "left_anti").select(*FRONTIER_COLS)
            next_frontier = dedup_by_identity(
                leftover.unionByName(links_new.select(*FRONTIER_COLS)), cfg.num_partitions
            )
        if cfg.max_frontier_per_host is not None:
            # priority-evict hot hosts' queues (domain_hash is the host
            # fingerprint — no string work); deterministic total order,
            # so the cap is partition-count invariant like everything else
            next_frontier = politeness.topk_per_key(
                next_frontier, "domain_hash", cfg.max_frontier_per_host, cfg.n_salts
            ).select(*FRONTIER_COLS_PID).repartition(cfg.num_partitions, "partition_id")
        next_frontier = next_frontier.observe(
            obs_frontier, F.count(F.lit(1)).alias("n")
        )
        _explain(next_frontier, "frontier")
        ckpt.write(
            next_frontier, "frontier", round_no, partition_by=["partition_id"]
        )  # action 3
        _mark("frontier_write")

        # lineage: per-partition commit record — the tagged-union job was
        # launched right after action 1 (see above) and has been running
        # under the filters/frontier writes; join it and write the
        # ~num_partitions rows driver-side with pyarrow (no committer job)
        try:
            lineage_rows = lineage_fut.result()
        finally:
            _pool.shutdown(wait=False)
        lineage_pdf = pd.DataFrame(
            [
                {
                    "round": round_no,
                    "partition_id": r["partition_id"],
                    "hash_range_start": r["hash_range_start"],
                    "hash_range_end": r["hash_range_end"],
                    "urls_emitted": r["urls_emitted"],
                    "urls_deduped": r["n_candidates"] - r["n_novel"],
                    "fetch_budget_consumed": r["urls_emitted"],
                }
                for r in sorted(lineage_rows, key=lambda r: r["partition_id"])
            ],
            columns=[
                "round",
                "partition_id",
                "hash_range_start",
                "hash_range_end",
                "urls_emitted",
                "urls_deduped",
                "fetch_budget_consumed",
            ],
        )
        ckpt.write_pdf(lineage_pdf, "lineage", round_no, arrow_schema=_lineage_arrow_schema())
        _mark("lineage_write")

        # counts come from the Observations filled by the write actions —
        # no extra jobs
        n_novel = int(obs_novel.get["n"]) if obs_novel is not None else 0
        n_scheduled = int(obs_proc.get["n_sched"])
        n_frontier = int(obs_frontier.get["n"])
        novel.unpersist()
        if n_candidates > 0:
            frontier.unpersist()
        processed.unpersist()

        ckpt.commit_round(
            round_no,
            {t: f"round={round_no}" for t in ("frontier", "filters", "processed", "lineage")},
            extra={"scheduled": n_scheduled, "frontier_size": n_frontier},
        )
        return {
            "round": round_no,
            "candidates": n_candidates,
            "novel": n_novel,
            "scheduled": n_scheduled,
            "frontier_size": n_frontier,
        }

    def run(self, seeds: DataFrame | None, num_rounds: int, on_round=None) -> list[dict]:
        """Run/resume the crawl.  If a committed manifest exists, resume
        after its round (idempotent; a killed job re-runs only the
        uncommitted round).  Each metrics dict carries the round's wall
        time; ``on_round(m)`` fires after every round (live progress for
        job drivers — keeps the loop/termination logic in ONE place).

        Termination: an idle round (nothing scheduled, empty frontier)
        ends the crawl UNLESS a future revisit cycle can still produce
        work — with revisit_after=k the loop idles forward until k
        rounds past the last round that scheduled anything."""
        import time as _time

        last = self.ckpt.last_committed_round()
        if last is None:
            assert seeds is not None, "first run needs a seed list"
            self.bootstrap(seeds)
            last = 0
        else:
            self.ckpt.drop_rounds_after(last)
        metrics = []
        # conservative resume assumption: the resume round may have
        # scheduled work, so revisit idling extends k rounds past it
        last_sched = last
        for r in range(last + 1, last + 1 + num_rounds):
            t0 = _time.time()
            m = self.run_round(r)
            m["wall_s"] = round(_time.time() - t0, 2)
            metrics.append(m)
            if on_round is not None:
                on_round(m)
            if m["scheduled"] > 0:
                last_sched = r
            idle = m["scheduled"] == 0 and m.get("frontier_size", 0) == 0
            revisit_pending = (
                self.cfg.revisit_after is not None
                and r < last_sched + self.cfg.revisit_after
            )
            if idle and not revisit_pending:
                break
        return metrics
