"""Single-action schedule pipeline tests: phase-variant equivalence,
budget conformance, determinism."""

import shutil

import pandas as pd
import pytest

from ccspark import pipeline, synth


@pytest.fixture(scope="module")
def outputs(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("pipe")
    a = pipeline.run_schedule_bench(spark, 100_000, str(d / "a"), num_partitions=16, two_phase=True)
    b = pipeline.run_schedule_bench(spark, 100_000, str(d / "b"), num_partitions=16, two_phase=False)
    pa = spark.read.parquet(str(d / "a")).toPandas().sort_values(["host", "host_rank"]).reset_index(drop=True)
    pb = spark.read.parquet(str(d / "b")).toPandas().sort_values(["host", "host_rank"]).reset_index(drop=True)
    return a, b, pa, pb


def test_two_phase_equals_single_phase(outputs):
    a, b, pa, pb = outputs
    assert a["scheduled"] == b["scheduled"]
    assert pa.equals(pb)


def test_budget_and_ranks(outputs):
    _, _, pa, _ = outputs
    robots = synth.gen_robots_pdf(synth.default_n_hosts(100_000), 42).set_index("host")
    for host, grp in pa.groupby("host"):
        assert sorted(grp["host_rank"]) == list(range(1, len(grp) + 1))
        if host in robots.index:
            b = int(robots.loc[host, "max_fetches_per_round"])
            d = robots.loc[host, "crawl_delay_ms"]
            if pd.notna(d) and d > 0:
                b = min(b, max(1, int(60_000 / d)))
        else:
            b = 50
        assert len(grp) <= b


def test_seen_filter_excludes(spark, tmp_path):
    stats_with = pipeline.run_schedule_bench(
        spark, 50_000, str(tmp_path / "w"), num_partitions=8, with_seen_filter=True
    )
    stats_without = pipeline.run_schedule_bench(
        spark, 50_000, str(tmp_path / "wo"), num_partitions=8, with_seen_filter=False
    )
    # the pre-seeded filter removes some candidates (or at worst none)
    assert stats_with["scheduled"] <= stats_without["scheduled"]
