"""Structured Streaming tests: streaming dedup idempotence, windowed
counts, stateful budget operator across micro-batches."""

import numpy as np
import pytest

from ccspark import streaming, synth


@pytest.fixture(scope="module")
def staged_pages(spark, tmp_path_factory):
    """Two parquet drops with overlapping ids (batch 2 re-discovers
    half of batch 1) — late/duplicate arrivals."""
    d = tmp_path_factory.mktemp("stream_in")
    p1 = synth.gen_pages_pdf(np.arange(0, 200), n_hosts=30, seed=42)
    p2 = synth.gen_pages_pdf(np.arange(100, 300), n_hosts=30, seed=42)
    spark.createDataFrame(p1).coalesce(1).write.parquet(str(d / "b1"))
    spark.createDataFrame(p2).coalesce(1).write.parquet(str(d / "b2"))
    return str(d / "*")


def _drain(q):
    q.processAllAvailable()
    q.stop()


def test_streaming_dedup(spark, staged_pages):
    pages = streaming.stream_pages(spark, staged_pages)
    assert pages.isStreaming
    deduped = streaming.dedup_urls_stream(pages)
    q = streaming.run_to_memory(deduped, "dedup_t")
    _drain(q)
    out = spark.sql("SELECT domain_hash, url_hash FROM dedup_t").toPandas()
    assert len(out) == len(out.drop_duplicates())  # no dup identities emitted
    # batch semantics agree: same distinct identity count as batch path
    import ccspark.functions as CF
    from pyspark.sql import functions as F

    batch = spark.read.parquet(staged_pages)
    bd = (
        CF.with_urlfp(CF.with_canonical(batch))
        .filter("url_valid")
        .select("domain_hash", "url_hash")
        .distinct()
        .count()
    )
    assert len(out) == bd


def test_windowed_counts(spark, staged_pages):
    pages = streaming.stream_pages(spark, staged_pages)
    agg = streaming.urls_per_host_windowed(streaming.dedup_urls_stream(pages), window="5 minutes")
    q = streaming.run_to_memory(agg, "win_t", output_mode="append")
    _drain(q)
    out = spark.sql("SELECT * FROM win_t").toPandas()
    # watermark append-mode may withhold the final open window; rows that
    # did emit must be positive counts with window structs
    assert (out["n_urls"] > 0).all() if len(out) else True


def test_stateful_budget(spark, staged_pages):
    pages = streaming.stream_pages(spark, staged_pages, max_files_per_trigger=1)
    ded = streaming.dedup_urls_stream(pages)
    flagged = streaming.host_budget_stateful(ded, budget_per_host=10)
    q = streaming.run_to_memory(flagged, "budget_t", output_mode="update")
    _drain(q)
    out = spark.sql("SELECT * FROM budget_t").toPandas()
    assert len(out) > 0
    # cumulative counter never decreases per host
    for host, grp in out.groupby("host"):
        used = grp["used_total"].tolist()
        assert used == sorted(used)
    # hot hosts exceed the tiny budget
    assert out["over_budget"].any()
