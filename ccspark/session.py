"""SparkSession construction with scale-appropriate defaults.

Single place where engine-level knobs live so tests, bench and jobs run
with identical semantics.  Mirrors the role of the reference's JobBuilder
(util/shared/JobBuilder.java) — assemble the execution config once.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def build_session(
    app_name: str = "ccspark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build a SparkSession with AQE, Arrow, and sane shuffle sizing.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (env) or
    ``local[*]``.  On a real cluster, pass ``master=None`` and let
    spark-submit decide; every config here is also valid under YARN/K8s.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS")
    if master is None:
        master = f"local[{cpus}]" if cpus else "local[*]"
    if shuffle_partitions is None:
        shuffle_partitions = int(cpus) if cpus else 32

    b = (
        SparkSession.builder.appName(app_name)
        .master(master)
        # AQE: runtime coalescing, skew-join splitting — core of the skew story
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # Arrow is the contract for every ccspark UDF
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "100000")
        # keep scans sized for executor memory at large SF
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        # floor on scan parallelism (guide §6): with few/monolithic input
        # files the default split size (= maxPartitionBytes) leaves most
        # cores idle during scans; minPartitionNum shrinks the advisory
        # split to totalBytes/N so scans fan out.  Scale-adaptive by
        # construction: once totalBytes/N exceeds maxPartitionBytes (any
        # real-cluster input), maxPartitionBytes governs and this floor
        # has zero effect.  N = cores/4 measured best locally: row groups
        # cap the useful splits anyway, and every surplus split is an
        # empty task whose launch+footer-read tax small scans (~3 ms
        # each; interleaved A/B over the headline scans: N=8 beat N=32
        # and N=1 on a 32-core local run).
        .config(
            "spark.sql.files.minPartitionNum",
            os.environ.get(
                "CCSPARK_MIN_PARTITION_NUM", str(max(2, shuffle_partitions // 4))
            ),
        )
        .config("spark.sql.parquet.compression.codec", "zstd")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    return spark
