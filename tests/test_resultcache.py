"""Result cache (stage, params_hash) — Query.java:795-824 analog."""

from pyspark.sql import functions as F

from ccspark.resultcache import ResultCache, params_hash


def test_params_hash_canonical():
    assert params_hash({"a": 1, "b": 2}) == params_hash({"b": 2, "a": 1})
    assert params_hash({"a": 1}) != params_hash({"a": 2})


def test_get_or_compute_caches(spark, tmp_path):
    rc = ResultCache(spark, str(tmp_path / "rc"))
    calls = []

    def compute():
        calls.append(1)
        return spark.range(100).select(F.col("id"), (F.col("id") * 2).alias("x"))

    df1 = rc.get_or_compute("agg", {"sf": 0.01, "q": "demo"}, compute)
    assert df1.count() == 100
    assert len(calls) == 1
    # identical params: served from parquet, no recompute
    df2 = rc.get_or_compute("agg", {"q": "demo", "sf": 0.01}, compute)
    assert len(calls) == 1
    assert df2.count() == 100
    assert sorted(df2.columns) == ["id", "x"]
    # cached plan must be a file scan, not the original computation
    assert "range" not in df2._jdf.queryExecution().executedPlan().toString().lower()
    # different params recompute
    rc.get_or_compute("agg", {"q": "demo", "sf": 0.1}, compute)
    assert len(calls) == 2


def test_invalidate(spark, tmp_path):
    rc = ResultCache(spark, str(tmp_path / "rc2"))
    calls = []

    def compute():
        calls.append(1)
        return spark.range(5)

    rc.get_or_compute("s", {"k": 1}, compute)
    rc.invalidate("s", {"k": 1})
    rc.get_or_compute("s", {"k": 1}, compute)
    assert len(calls) == 2


def test_resume_across_sessions_shape(spark, tmp_path):
    # a fresh ResultCache instance over the same root sees the commit
    root = str(tmp_path / "rc3")
    rc1 = ResultCache(spark, root)
    rc1.get_or_compute("s", {"k": 1}, lambda: spark.range(7))
    rc2 = ResultCache(spark, root)
    hit = rc2.lookup("s", {"k": 1})
    assert hit is not None and hit.count() == 7
