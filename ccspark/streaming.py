"""Structured Streaming surface: streaming page ingest, watermarked
de-duplication, windowed per-host counts, and a custom stateful
per-host budget operator.

The reference is batch-only over immutable archives (SURVEY.md §2.7);
the crawl loop becomes micro-batches here.  Late/re-discovered URLs are
made idempotent exactly like the batch seen-set: ``dropDuplicates`` on
the URLFPV2 composite key under a watermark, mirroring H4/H5.
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from . import functions as CF

PAGES_SCHEMA = "url string, warc_ts timestamp, html binary, text string, lang string"


def stream_pages(spark: SparkSession, path: str, max_files_per_trigger: int = 8) -> DataFrame:
    """File-source stream of pages-shaped parquet drops."""
    return (
        spark.readStream.schema(PAGES_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )


def dedup_urls_stream(pages: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    """Canonical-identity streaming dedup: watermark on warc_ts, drop
    duplicates on (domain_hash, url_hash) — late re-discoveries of the
    same URL are suppressed within the watermark horizon."""
    df = CF.with_urlfp(CF.with_canonical(pages))
    return (
        df.filter("url_valid")
        .withWatermark("warc_ts", watermark)
        .dropDuplicates(["domain_hash", "url_hash"])
    )


def urls_per_host_windowed(
    deduped: DataFrame, window: str = "1 minute", slide: str | None = None
) -> DataFrame:
    """Windowed per-host URL counts (fetch-rate accounting)."""
    host = CF.url_host(F.col("canonical_url")).alias("host")
    w = F.window("warc_ts", window, slide) if slide else F.window("warc_ts", window)
    return deduped.select(host, "warc_ts").groupBy(w.alias("win"), "host").agg(
        F.count("*").alias("n_urls")
    )


_BUDGET_STATE_SCHEMA = "used long"
_BUDGET_OUT_SCHEMA = "host string, batch_urls long, used_total long, over_budget boolean"


def host_budget_stateful(
    deduped: DataFrame, budget_per_host: int = 100
) -> DataFrame:
    """Custom stateful operator: cumulative per-host fetch counter across
    micro-batches (applyInPandasWithState), flagging hosts that exceed
    their crawl budget — the streaming analogue of the politeness gate."""

    def update(
        key: Tuple[str], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        n = 0
        for pdf in pdfs:
            n += len(pdf)
        (used,) = state.get if state.exists else (0,)
        used += n
        state.update((used,))
        yield pd.DataFrame(
            {
                "host": [key[0]],
                "batch_urls": [n],
                "used_total": [used],
                "over_budget": [used > budget_per_host],
            }
        )

    host = CF.url_host(F.col("canonical_url")).alias("host")
    return (
        deduped.select(host)
        .groupBy("host")
        .applyInPandasWithState(
            update,
            outputStructType=_BUDGET_OUT_SCHEMA,
            stateStructType=_BUDGET_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def run_to_memory(stream_df: DataFrame, name: str, output_mode: str = "append"):
    """Start a memory-sink query (tests/demos); caller stops it."""
    return (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .start()
    )


CANDIDATES_SCHEMA = "url string, priority double, ts timestamp"


def stream_candidates(spark: SparkSession, path: str, max_files_per_trigger: int = 8) -> DataFrame:
    """File-source stream of discovered candidate URLs."""
    return (
        spark.readStream.schema(CANDIDATES_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )


def streaming_frontier(
    candidates: DataFrame,
    robots: DataFrame,
    out_dir: str,
    default_budget: int = 10,
    n_salts: int = 8,
    checkpoint_dir: str | None = None,
):
    """Micro-batch crawl scheduler: the batch politeness pipeline run per
    trigger with a PERSISTENT seen set, via foreachBatch.

    Each micro-batch: canonicalize+fingerprint → identity dedup →
    anti-join the accumulated seen table → robots + budget + salted
    rank → append scheduled (tagged with batch_id) → append the batch's
    scheduled ∪ disallowed identities to seen.  Re-discovered URLs in
    later triggers are suppressed by the seen table, so the stream's
    output equals the batch frontier loop's over the same drops.

    Delivery note: appends inside foreachBatch are at-least-once on
    micro-batch retry; readers dedup on (batch_id, domain_hash,
    url_hash) for exactly-once consumption — the same idempotence rule
    as the batch checkpoint's overwrite-by-round."""
    import os

    from . import politeness

    seen_dir = os.path.join(out_dir, "seen")
    sched_dir = os.path.join(out_dir, "scheduled")

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        spark_l = batch_df.sparkSession
        ident = (
            CF.with_canonical_urlfp(batch_df)
            .filter("url_valid")
            .groupBy("domain_hash", "url_hash")
            .agg(
                F.min("url").alias("url"),
                F.min("canonical_url").alias("canonical_url"),
                F.max("priority").alias("priority"),
            )
        )
        if os.path.exists(seen_dir):
            seen = spark_l.read.parquet(seen_dir)
            novel = ident.join(seen, ["domain_hash", "url_hash"], "left_anti")
        else:
            novel = ident
        sched, disallowed = politeness.schedule_round(
            novel,
            robots,
            default_budget=default_budget,
            n_salts=n_salts,
            return_disallowed=True,
        )
        sched = sched.withColumn("batch_id", F.lit(batch_id)).cache()
        sched.write.mode("append").parquet(sched_dir)
        sched.select("domain_hash", "url_hash").unionByName(
            disallowed.select("domain_hash", "url_hash")
        ).write.mode("append").parquet(seen_dir)
        sched.unpersist()

    writer = candidates.writeStream.foreachBatch(_process).outputMode("update")
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.start()
