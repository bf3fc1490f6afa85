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

    Each micro-batch: canonicalize+fingerprint → union the carry-over
    backlog from the previous batch → identity dedup → anti-join the
    accumulated seen table → robots + budget + salted rank →
    scheduled + seen delta + new backlog, each written to a
    per-batch_id partition directory.  Allowed-but-over-budget novel
    rows (host_rank > budget) are NOT lost: they land in the carry-over
    backlog and re-enter the next trigger, matching the batch frontier
    loop's leftover-returns-to-frontier semantics, so the stream's
    output equals the batch loop's over the same drops even when
    budgets bind.

    Delivery is exactly-once: every write targets
    ``<table>/batch_id=<id>`` with mode=overwrite (deterministic plan →
    byte-identical on re-run) and a ``_batch_markers/batch-<id>``
    commit marker lands only after all three writes; a retried batch
    whose marker exists is skipped entirely, and a retry of a
    half-written batch overwrites its own partial output."""
    def _process(batch_df: DataFrame, batch_id: int) -> None:
        frontier_process_batch(
            batch_df, batch_id, robots, out_dir, default_budget, n_salts
        )

    writer = candidates.writeStream.foreachBatch(_process).outputMode("update")
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.start()


_IDENT_COLS = ["url", "canonical_url", "priority", "domain_hash", "url_hash"]


def _latest_carry(spark_l: SparkSession, carry_dir: str, batch_id: int) -> DataFrame | None:
    """Backlog written by the most recent batch BEFORE this one
    (strictly less: a retried batch must not read its own output)."""
    import os
    import re as _re

    if not os.path.isdir(carry_dir):
        return None
    prev = [
        int(m.group(1))
        for d in os.listdir(carry_dir)
        if (m := _re.fullmatch(r"after_batch=(\d+)", d)) and int(m.group(1)) < batch_id
    ]
    if not prev:
        return None
    return spark_l.read.parquet(os.path.join(carry_dir, f"after_batch={max(prev)}"))


def frontier_process_batch(
    batch_df: DataFrame,
    batch_id: int,
    robots: DataFrame,
    out_dir: str,
    default_budget: int = 10,
    n_salts: int = 8,
    _die_before_marker: bool = False,
) -> None:
    """One micro-batch of the streaming frontier (module-level so tests
    can simulate retries and mid-batch kills directly).
    ``_die_before_marker`` is a test hook: crash after the data writes
    but before the commit marker, as a killed executor would."""
    import os
    import re as _re

    from . import politeness

    seen_dir = os.path.join(out_dir, "seen")
    sched_dir = os.path.join(out_dir, "scheduled")
    carry_dir = os.path.join(out_dir, "carryover")
    marker_dir = os.path.join(out_dir, "_batch_markers")
    marker = os.path.join(marker_dir, f"batch-{batch_id}")
    if os.path.exists(marker):
        return  # retried but fully committed batch → exactly-once skip

    spark_l = batch_df.sparkSession
    ident = CF.with_canonical_urlfp(batch_df).filter("url_valid").select(*_IDENT_COLS)
    carry = _latest_carry(spark_l, carry_dir, batch_id)
    if carry is not None:
        ident = ident.unionByName(carry.select(*_IDENT_COLS))
    ident = ident.groupBy("domain_hash", "url_hash").agg(
        F.min("url").alias("url"),
        F.min("canonical_url").alias("canonical_url"),
        F.max("priority").alias("priority"),
    )
    # seen = committed batches STRICTLY BEFORE this one — a retried batch
    # must not anti-join against its own partial output from the failed
    # attempt (that would make every row look already-seen)
    seen_parts = (
        [
            os.path.join(seen_dir, d)
            for d in os.listdir(seen_dir)
            if (m := _re.fullmatch(r"batch_id=(\d+)", d)) and int(m.group(1)) < batch_id
        ]
        if os.path.isdir(seen_dir)
        else []
    )
    if seen_parts:
        seen = spark_l.read.parquet(*sorted(seen_parts)).select(
            "domain_hash", "url_hash"
        )
        novel = ident.join(seen, ["domain_hash", "url_hash"], "left_anti")
    else:
        novel = ident
    novel = novel.cache()
    sched, disallowed = politeness.schedule_round(
        novel,
        robots,
        default_budget=default_budget,
        n_salts=n_salts,
        return_disallowed=True,
    )
    sched = sched.cache()
    sched.write.mode("overwrite").parquet(
        os.path.join(sched_dir, f"batch_id={batch_id}")
    )
    handled = (
        sched.select("domain_hash", "url_hash")
        .unionByName(disallowed.select("domain_hash", "url_hash"))
        .cache()
    )
    handled.write.mode("overwrite").parquet(
        os.path.join(seen_dir, f"batch_id={batch_id}")
    )
    # allowed-but-over-budget novel rows → next trigger's backlog
    leftover = novel.join(handled, ["domain_hash", "url_hash"], "left_anti").select(
        *_IDENT_COLS
    )
    leftover.write.mode("overwrite").parquet(
        os.path.join(carry_dir, f"after_batch={batch_id}")
    )
    handled.unpersist()
    sched.unpersist()
    novel.unpersist()
    if _die_before_marker:
        raise RuntimeError("simulated kill before commit marker")
    os.makedirs(marker_dir, exist_ok=True)
    with open(marker, "w", encoding="utf-8") as fh:
        fh.write(str(batch_id))
