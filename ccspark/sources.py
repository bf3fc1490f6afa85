"""Parallel ranged-download source (S9).

Re-expresses the reference's S3 downloader —
util/shared/S3Downloader.java:56-658 (async multi-stream fetch,
``setMaxParallelStreams``, ``fetchPartialItem(key, rangeStart, bytes)``,
retry-on-failure) and S3InputStream.java's 1 MB buffered ranged reads —
as Spark-native pieces:

* ``s3a_conf(max_parallel_streams)`` — the Hadoop-FS knobs that give the
  same behavior on a cluster: per-bucket connection pool
  (= parallel streams), random-access fadvise (= ranged GETs instead of
  full-object streams), 1 MB readahead (= the S3InputStream buffer) and
  built-in retries.  Executor-side concurrency itself is Spark task
  parallelism — the role of the reference's thread pool.
* ``fetch_ranges(df)`` — a distributed ``fetchPartialItem``: rows of
  (path, offset, length) fetched in parallel by mapInPandas tasks with
  bounded per-attempt retry.  Local/POSIX paths are read directly
  (seek+read); on a cluster the same operator runs against any
  FUSE/NFS-mounted store, and s3a:// object gets are served by the
  Hadoop connector configured via ``s3a_conf`` through Spark's normal
  readers.  This is the split-fetch primitive the ARC reader uses when
  record offsets are known (positional index, SURVEY §2.1 S12).
"""

from __future__ import annotations

import time

import pandas as pd
from pyspark.sql import DataFrame

# S3Downloader.setMaxParallelStreams default and S3InputStream's buffer
DEFAULT_STREAMS = 10
BUFFER_BYTES = 1 << 20


def s3a_conf(max_parallel_streams: int = DEFAULT_STREAMS) -> dict[str, str]:
    """Hadoop s3a settings mirroring the reference downloader's knobs."""
    return {
        # parallel streams → connection pool + transfer threads
        "spark.hadoop.fs.s3a.connection.maximum": str(max_parallel_streams * 2),
        "spark.hadoop.fs.s3a.threads.max": str(max_parallel_streams),
        # ranged GETs (fetchPartialItem) instead of whole-object streams
        "spark.hadoop.fs.s3a.experimental.input.fadvise": "random",
        # S3InputStream's 1MB buffer
        "spark.hadoop.fs.s3a.readahead.range": str(BUFFER_BYTES),
        # retry-on-failure (S3Downloader re-queues failed items)
        "spark.hadoop.fs.s3a.retry.limit": "7",
        "spark.hadoop.fs.s3a.attempts.maximum": "10",
    }


def open_stream(path: str):
    """Worker-side sequential read stream for a Spark-listed path:
    ``file:`` URIs and plain paths open locally; any other scheme
    (s3://, hdfs://, ...) resolves through ``pyarrow.fs`` — the
    streamed archive scans (arc.scan_arc_stream / warc.scan_warc_stream)
    read through this, so oversized archives never materialize as one
    buffer on any storage backend."""
    p = str(path)
    if p.startswith("file:"):
        return open(p[len("file:"):], "rb")
    if "://" in p:
        import pyarrow.fs as pafs

        fs, rel = pafs.FileSystem.from_uri(p)
        return fs.open_input_stream(rel)
    return open(p, "rb")


def scan_archive_stream(
    spark,
    path_glob: str,
    glob_filter: str,
    read_stream,
    path_kw: str,
    cols: list[str],
    schema: str,
    chunk_bytes: int = 1 << 20,
    max_batch_rows: int = 1000,
) -> DataFrame:
    """Shared distributed streamed-archive scan: a paths-only binaryFile
    listing (content column pruned) fans out one file per task; each
    task walks its archive incrementally via ``read_stream(fh,
    <path_kw>=path, chunk_bytes=...)`` — bounded chunk reads, record
    rows emitted in ≤``max_batch_rows`` pandas batches.  The ARC and
    WARC scans delegate here with their reader + schema."""
    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob_filter)
        .load(path_glob)
        .select("path")
        .repartition("path")  # one file per task, like the 1-file InputFormat
    )

    def _decode(batches):
        for pdf in batches:
            for path in pdf["path"]:
                rows = []
                with open_stream(path) as fh:
                    for rec in read_stream(fh, **{path_kw: path}, chunk_bytes=chunk_bytes):
                        rows.append(rec)
                        if len(rows) >= max_batch_rows:
                            yield pd.DataFrame(rows, columns=cols)
                            rows = []
                if rows:
                    yield pd.DataFrame(rows, columns=cols)

    return files.mapInPandas(_decode, schema=schema)


RANGE_SCHEMA = "path string, offset long, length long, data binary, error string"


def fetch_ranges(ranges: DataFrame, max_retries: int = 3, retry_sleep_s: float = 0.05) -> DataFrame:
    """(path, offset, length) rows → + (data, error) fetched in parallel.

    Each Spark task is one download stream; total concurrency = task
    slots (the reference's maxParallelStreams).  Transient read errors
    retry ``max_retries`` times, then surface in ``error`` with data
    null — the caller decides to re-queue, mirroring
    S3Downloader.failedItem handling."""

    def _fetch(batches):
        for pdf in batches:
            datas: list[bytes | None] = []
            errors: list[str | None] = []
            for path, off, length in zip(pdf["path"], pdf["offset"], pdf["length"]):
                err = None
                blob = None
                local = str(path)
                if local.startswith("file:"):
                    local = local[len("file:"):]
                for attempt in range(max_retries + 1):
                    try:
                        with open(local, "rb") as fh:
                            fh.seek(int(off))
                            blob = fh.read(int(length))
                        err = None
                        break
                    except OSError as e:  # transient FS errors retry
                        err = f"{type(e).__name__}: {e}"
                        blob = None
                        if attempt < max_retries:
                            time.sleep(retry_sleep_s * (attempt + 1))
                datas.append(blob)
                errors.append(err)
            out = pdf[["path", "offset", "length"]].copy()
            out["data"] = datas
            out["error"] = errors
            yield out

    return ranges.select("path", "offset", "length").mapInPandas(_fetch, schema=RANGE_SCHEMA)
