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


def test_streaming_frontier_end_to_end(spark, tmp_path):
    """Micro-batch scheduler: cross-batch dedup via the persistent seen
    set, robots gating, per-host budget — equals the batch semantics."""
    import time

    import pandas as pd

    from ccspark import streaming as ST

    src = tmp_path / "drops"
    out = tmp_path / "out"
    ckpt = tmp_path / "ckpt"
    src.mkdir()

    robots = spark.createDataFrame(
        [("a.com", ["/private"], None, None), ("b.com", [], None, None)],
        "host string, disallow_prefixes array<string>, crawl_delay_ms long, max_fetches_per_round int",
    )

    def drop(name, rows):
        # write via Spark (Spark-compatible timestamps), then move the
        # single part file into the flat stream-source directory
        import glob as _glob
        import shutil as _sh

        stage = tmp_path / ("stage_" + name)
        spark.createDataFrame(rows, "url string, priority double, ts timestamp") \
            .coalesce(1).write.mode("overwrite").parquet(str(stage))
        part = _glob.glob(str(stage / "part-*.parquet"))[0]
        _sh.copy(part, src / (name + ".parquet"))

    ts = pd.Timestamp("2024-01-01").to_pydatetime()
    drop("d1", [
        ("http://a.com/x", 0.9, ts),
        ("http://a.com/private/no", 0.8, ts),
        ("http://b.com/y", 0.7, ts),
    ])

    cands = ST.stream_candidates(spark, str(src), max_files_per_trigger=1)
    q = ST.streaming_frontier(
        cands, robots, str(out), default_budget=5, n_salts=2, checkpoint_dir=str(ckpt)
    )
    try:
        q.processAllAvailable()
        # second drop: one repeat (must be suppressed), one new
        drop("d2", [
            ("http://a.com/x", 0.95, ts),       # already seen
            ("http://a.com/private/no", 0.9, ts),  # already retired
            ("http://b.com/z", 0.6, ts),
        ])
        q.processAllAvailable()
    finally:
        q.stop()

    sched = spark.read.parquet(str(out / "scheduled"))
    got = {(r["canonical_url"], r["round"]) for r in sched.collect()}
    urls = {u for u, _ in got}
    assert urls == {"http://a.com/x", "http://b.com/y", "http://b.com/z"}
    # the repeat was NOT rescheduled in the second batch
    assert ("http://a.com/x", 1) not in got
    seen = spark.read.parquet(str(out / "seen"))
    # scheduled (3) + robots-retired (1)
    assert seen.distinct().count() == 4
    # the stream commits through the same manifest protocol as the batch loop
    from ccspark.checkpoint import Checkpoint

    m = Checkpoint(str(out)).read_manifest()
    assert m["round"] == 1 and "scheduled" in m["tables"]


def _mk_batch(spark, rows):
    return spark.createDataFrame(rows, "url string, priority double, ts timestamp")


def test_streaming_frontier_overbudget_carryover(spark, tmp_path):
    """Allowed-but-over-budget novel rows re-enter the next trigger
    instead of being silently dropped (budget binds on host a.com)."""
    import pandas as pd

    from ccspark import streaming as ST

    out = tmp_path / "out"
    robots = spark.createDataFrame(
        [("a.com", [], None, None)],
        "host string, disallow_prefixes array<string>, crawl_delay_ms long, max_fetches_per_round int",
    )
    ts = pd.Timestamp("2024-01-01").to_pydatetime()
    # 5 URLs on one host, budget 2 → 2 scheduled, 3 carried over
    b0 = _mk_batch(spark, [(f"http://a.com/p{i}", 0.9 - i * 0.1, ts) for i in range(5)])
    ST.frontier_process_batch(b0, 0, robots, str(out), default_budget=2, n_salts=2)
    sched0 = spark.read.parquet(str(out / "scheduled" / "round=0"))
    assert sched0.count() == 2
    carry0 = spark.read.parquet(str(out / "carryover" / "round=0"))
    assert carry0.count() == 3
    # next trigger brings ONE new URL; the 3 carried rows re-enter and
    # compete: 2 scheduled again (highest priority of the 4)
    b1 = _mk_batch(spark, [("http://a.com/new", 0.95, ts)])
    ST.frontier_process_batch(b1, 1, robots, str(out), default_budget=2, n_salts=2)
    sched1 = spark.read.parquet(str(out / "scheduled" / "round=1"))
    got1 = {r["canonical_url"] for r in sched1.collect()}
    # priorities: new=0.95, p2=0.7, p3=0.6, p4=0.5 → top-2
    assert got1 == {"http://a.com/new", "http://a.com/p2"}
    carry1 = spark.read.parquet(str(out / "carryover" / "round=1"))
    assert {r["canonical_url"] for r in carry1.collect()} == {
        "http://a.com/p3",
        "http://a.com/p4",
    }
    # nothing was ever lost: scheduled ∪ backlog covers every input URL
    all_sched = spark.read.parquet(str(out / "scheduled"))
    assert all_sched.count() + carry1.count() == 6


def test_streaming_frontier_exactly_once(spark, tmp_path):
    """Kill mid-batch (before the commit marker), re-run → scheduled
    output byte-identical; re-run of a COMMITTED batch is a no-op."""
    import pandas as pd
    import pytest as _pytest

    from ccspark import streaming as ST

    out = tmp_path / "out"
    robots = spark.createDataFrame(
        [("a.com", [], None, None)],
        "host string, disallow_prefixes array<string>, crawl_delay_ms long, max_fetches_per_round int",
    )
    ts = pd.Timestamp("2024-01-01").to_pydatetime()
    from ccspark.checkpoint import Checkpoint

    b0 = _mk_batch(spark, [(f"http://a.com/p{i}", 0.5, ts) for i in range(4)])
    # first attempt dies after the data writes but before the commit
    with _pytest.raises(RuntimeError):
        ST.frontier_process_batch(
            b0, 0, robots, str(out), default_budget=10, _die_before_marker=True
        )
    assert Checkpoint(str(out)).last_committed_round() is None

    def read_bytes(p):
        import glob

        return b"".join(
            open(f, "rb").read() for f in sorted(glob.glob(str(p / "part-*.parquet")))
        )

    partial = read_bytes(out / "scheduled" / "round=0")
    # retry overwrites its own partial output deterministically
    ST.frontier_process_batch(b0, 0, robots, str(out), default_budget=10)
    assert Checkpoint(str(out)).last_committed_round() == 0
    committed = read_bytes(out / "scheduled" / "round=0")
    assert committed == partial  # byte-identical re-run
    sched = spark.read.parquet(str(out / "scheduled"))
    assert sched.count() == 4
    # spurious redelivery of the committed batch: skipped entirely
    before = read_bytes(out / "scheduled" / "round=0")
    ST.frontier_process_batch(b0, 0, robots, str(out), default_budget=10)
    assert read_bytes(out / "scheduled" / "round=0") == before
    assert spark.read.parquet(str(out / "scheduled")).count() == 4


def test_streaming_frontier_compaction_bounds_state(spark, tmp_path):
    """With compact_every=2, seen deltas fold into one round and older
    rounds + stale carryover dirs are pruned — dedup still exact."""
    import os

    import pandas as pd

    from ccspark import streaming as ST

    out = tmp_path / "out"
    robots = spark.createDataFrame(
        [("a.com", [], None, None)],
        "host string, disallow_prefixes array<string>, crawl_delay_ms long, max_fetches_per_round int",
    )
    ts = pd.Timestamp("2024-01-01").to_pydatetime()
    for b in range(5):
        rows = [(f"http://a.com/b{b}p{i}", 0.5, ts) for i in range(3)]
        if b > 0:  # one repeat from the previous batch, must stay deduped
            rows.append((f"http://a.com/b{b-1}p0", 0.9, ts))
        ST.frontier_process_batch(
            _mk_batch(spark, rows), b, robots, str(out), default_budget=10,
            n_salts=2, compact_every=2,
        )
    sched = spark.read.parquet(str(out / "scheduled"))
    # 15 unique URLs scheduled exactly once each (repeats suppressed)
    assert sched.count() == 15
    assert sched.select("domain_hash", "url_hash").distinct().count() == 15
    # last compaction at batch 4: seen rounds < 4 pruned
    seen_rounds = sorted(os.listdir(out / "seen"))
    assert [d for d in seen_rounds if d.startswith("round=")] == ["round=4"]
    carry_rounds = [d for d in os.listdir(out / "carryover") if d.startswith("round=")]
    assert carry_rounds == ["round=4"]
    # compacted seen holds the full history
    assert spark.read.parquet(str(out / "seen")).distinct().count() == 15


def test_streaming_frontier_over_iceberg_stub(spark, tmp_path, monkeypatch):
    """The streaming path rides the same backend factory as the batch
    loop: micro-batches over an Iceberg catalog (stubbed) schedule the
    same URLs as the parquet emulation."""
    import pandas as pd

    from ccspark import streaming as ST
    from iceberg_stub import install

    install(monkeypatch, spark, "stubcat")
    robots = spark.createDataFrame(
        [("a.com", [], None, None)],
        "host string, disallow_prefixes array<string>, crawl_delay_ms long, max_fetches_per_round int",
    )
    ts = pd.Timestamp("2024-01-01").to_pydatetime()
    batches = [
        [("http://a.com/x", 0.9, ts), ("http://a.com/y", 0.8, ts)],
        [("http://a.com/x", 0.95, ts), ("http://a.com/z", 0.7, ts)],  # x repeats
    ]
    for loc in ("iceberg:stubcat.stream", str(tmp_path / "pq")):
        for b, rows in enumerate(batches):
            ST.frontier_process_batch(
                _mk_batch(spark, rows), b, robots, loc, default_budget=10, n_salts=2
            )
    from ccspark.catalog import make_checkpoint

    ice = make_checkpoint(spark, "iceberg:stubcat.stream")
    pq = make_checkpoint(spark, str(tmp_path / "pq"))
    for b in range(2):
        gi = {r["canonical_url"] for r in ice.read(spark, "scheduled", b).collect()}
        gp = {r["canonical_url"] for r in pq.read(spark, "scheduled", b).collect()}
        assert gi == gp
    assert ice.last_committed_round() == 1
