"""Parallel ranged fetch (S9 — S3Downloader.fetchPartialItem analog)."""

from pyspark.sql import functions as F

from ccspark import sources


def test_s3a_conf_shape():
    conf = sources.s3a_conf(8)
    assert conf["spark.hadoop.fs.s3a.threads.max"] == "8"
    assert conf["spark.hadoop.fs.s3a.experimental.input.fadvise"] == "random"
    assert int(conf["spark.hadoop.fs.s3a.readahead.range"]) == 1 << 20


def test_fetch_ranges_parallel(spark, tmp_path):
    # two files, interleaved ranges — the ARC positional-fetch shape
    a = tmp_path / "a.bin"
    b = tmp_path / "b.bin"
    a.write_bytes(bytes(range(256)) * 4)
    b.write_bytes(b"xyz" * 100)
    rows = [
        (str(a), 0, 4),
        (str(a), 250, 10),
        (str(b), 3, 3),
        (str(a), 1020, 100),   # short read at EOF: returns what exists
        (str(tmp_path / "missing.bin"), 0, 5),  # error surfaces, data null
    ]
    df = spark.createDataFrame(rows, "path string, offset long, length long")
    out = {(r["path"], r["offset"]): r for r in sources.fetch_ranges(df).collect()}
    assert bytes(out[(str(a), 0)]["data"]) == bytes([0, 1, 2, 3])
    assert bytes(out[(str(a), 250)]["data"]) == bytes([250, 251, 252, 253, 254, 255, 0, 1, 2, 3])
    assert bytes(out[(str(b), 3)]["data"]) == b"xyz"
    assert bytes(out[(str(a), 1020)]["data"]) == bytes([252, 253, 254, 255])
    missing = out[(str(tmp_path / "missing.bin"), 0)]
    assert missing["data"] is None and "Error" in missing["error"]


def test_fetch_ranges_feeds_arc_records(spark, tmp_path):
    """Ranged fetch of a whole ARC member + parse — the positional-index
    read path (S12 + S9 together)."""
    from ccspark import arc

    data = arc.write_arc_bytes(
        [dict(url="http://r.example.com/x", payload=b"<html>range</html>",
              headers=[("Content-Type", "text/html")])],
        "r.arc.gz",
    )
    p = tmp_path / "r.arc.gz"
    p.write_bytes(data)
    df = spark.createDataFrame([(str(p), 0, len(data))], "path string, offset long, length long")
    fetched = sources.fetch_ranges(df).collect()[0]
    recs = list(arc.read_arc_bytes(bytes(fetched["data"]), arc_file="r.arc.gz"))
    assert len(recs) == 1
    assert recs[0]["url"] == "http://r.example.com/x"


def test_warc_scan_spark(spark, tmp_path):
    """WARC source end to end: write .warc.gz files, scan_warc them
    distributed, verify record fields + payload bytes."""
    from ccspark import warc

    for fi in range(2):
        recs = [
            dict(
                warc_type="response",
                url=f"http://f{fi}h{i}.com/p/{i}",
                payload=warc.build_http_response(
                    f"<html>file{fi} doc{i}</html>".encode(),
                    headers=[("Content-Type", "text/html"), ("X-N", str(i))],
                ),
            )
            for i in range(5)
        ]
        (tmp_path / f"part{fi}.warc.gz").write_bytes(warc.write_warc_bytes(recs))
    df = warc.scan_warc(spark, str(tmp_path))
    rows = df.collect()
    resp = [r for r in rows if r["warc_type"] == "response"]
    assert len(resp) == 10
    assert len([r for r in rows if r["warc_type"] == "warcinfo"]) == 2
    by_url = {r["url"]: r for r in resp}
    assert bytes(by_url["http://f1h3.com/p/3"]["payload"]) == b"<html>file1 doc3</html>"
    assert by_url["http://f0h0.com/p/0"]["http_status"] == 200
    hdrs = {h["name"]: h["value"] for h in by_url["http://f0h2.com/p/2"]["http_headers"]}
    assert hdrs["X-N"] == "2"
    # offsets are monotone within a file (the member framing works)
    offs = sorted(r["warc_offset"] for r in rows if r["warc_file"].endswith("part0.warc.gz"))
    assert offs == sorted(set(offs)) and offs[0] == 0
