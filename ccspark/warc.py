"""WARC/1.0 (ISO 28500) source + fixture writer.

The reference predates WARC (its stack is ARC, SURVEY.md §2 S1-S6);
modern Common Crawl ships WARC, so a drop-in user needs this source
format too.  Same Spark shape as ccspark.arc: one ``binaryFile`` row
per ``.warc.gz`` file (gzip member per record — the standard
CC layout), decoded to record rows in a batch Arrow UDF.

Semantics implemented:

* gzip-member framing (each record its own member, like ARC);
* WARC header block (``WARC/1.0`` version line, ``Name: value``
  headers, blank-line terminator, payload of ``Content-Length`` bytes,
  two trailing CRLFs);
* ``response`` records carry an HTTP message as payload — the HTTP
  status line + headers are split off exactly like the ARC path (S4
  order/duplicate-preserving header parse) and the body is exposed as
  ``payload``;
* other record types (warcinfo, request, metadata) pass through with
  the raw payload.

``write_warc_bytes`` builds deterministic fixtures so the round trip
is oracle-checkable (q_warc_roundtrip) without any external corpus.
"""

from __future__ import annotations

import gzip
import io
from datetime import datetime, timezone

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

_CRLF = b"\r\n"

RECORD_SCHEMA = (
    "url string, warc_file string, warc_offset long, warc_type string, "
    "warc_ts timestamp, record_id string, content_type string, "
    "http_status int, http_headers array<struct<name:string,value:string>>, "
    "payload binary"
)


def _gzip_member(data: bytes) -> bytes:
    buf = io.BytesIO()
    with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as gz:
        gz.write(data)
    return buf.getvalue()


def _iso8601(ts: datetime) -> str:
    return ts.astimezone(timezone.utc).strftime("%Y-%m-%dT%H:%M:%SZ")


def build_warc_record(
    warc_type: str,
    payload: bytes,
    url: str | None = None,
    ts: datetime | None = None,
    record_id: str = "<urn:uuid:00000000-0000-0000-0000-000000000000>",
    content_type: str = "application/http; msgtype=response",
    extra_headers: list[tuple[str, str]] | None = None,
) -> bytes:
    ts = ts or datetime(2024, 1, 1, tzinfo=timezone.utc)
    head = [b"WARC/1.0"]
    head.append(b"WARC-Type: " + warc_type.encode())
    if url is not None:
        head.append(b"WARC-Target-URI: " + url.encode())
    head.append(b"WARC-Date: " + _iso8601(ts).encode())
    head.append(b"WARC-Record-ID: " + record_id.encode())
    head.append(b"Content-Type: " + content_type.encode())
    for k, v in extra_headers or []:
        head.append(f"{k}: {v}".encode())
    head.append(b"Content-Length: " + str(len(payload)).encode())
    return _CRLF.join(head) + _CRLF + _CRLF + payload + _CRLF + _CRLF


def build_http_response(
    body: bytes,
    status: int = 200,
    headers: list[tuple[str, str]] | None = None,
) -> bytes:
    lines = [f"HTTP/1.1 {status} OK".encode()]
    for k, v in headers or [("Content-Type", "text/html")]:
        lines.append(f"{k}: {v}".encode())
    lines.append(b"Content-Length: " + str(len(body)).encode())
    return _CRLF.join(lines) + _CRLF + _CRLF + body


def write_warc_bytes(records) -> bytes:
    """records: iterable of dicts for build_warc_record → .warc.gz bytes
    (one gzip member per record, warcinfo lead member)."""
    out = io.BytesIO()
    info = build_warc_record(
        "warcinfo",
        b"software: ccspark\r\n",
        content_type="application/warc-fields",
    )
    out.write(_gzip_member(info))
    for rec in records:
        out.write(_gzip_member(build_warc_record(**rec)))
    return out.getvalue()


def _split_members(data: bytes):
    """Yield (offset, member bytes) per gzip member (WARC gzip layout).
    Best-effort: a corrupt member ends the scan with what decoded so
    far (crawl-grade tolerance, like GZIPUtils.unzipBestEffort)."""
    import zlib

    pos = 0
    n = len(data)
    while pos < n:
        d = zlib.decompressobj(16 + zlib.MAX_WBITS)
        try:
            out = d.decompress(data[pos:])
        except zlib.error:
            return
        rest = d.unused_data
        consumed = n - pos - len(rest)
        if consumed <= 0:
            break
        yield pos, out
        pos += consumed


def parse_warc_record(member: bytes):
    """One decompressed WARC record → dict (see RECORD_SCHEMA)."""
    sep = member.find(_CRLF + _CRLF)
    if sep == -1 or not member.startswith(b"WARC/"):
        return None
    head = member[:sep].decode("utf-8", "replace").split("\r\n")
    fields: dict[str, str] = {}
    for line in head[1:]:
        colon = line.find(":")
        if colon > 0:
            fields[line[:colon].strip().lower()] = line[colon + 1 :].strip()
    try:
        length = int(fields.get("content-length", "0"))
    except ValueError:
        length = 0
    payload = member[sep + 4 : sep + 4 + length]
    warc_type = fields.get("warc-type", "")
    ts = None
    raw_ts = fields.get("warc-date")
    if raw_ts:
        try:
            ts = datetime.strptime(raw_ts, "%Y-%m-%dT%H:%M:%SZ").replace(
                tzinfo=timezone.utc
            )
        except ValueError:
            ts = None
    status = None
    http_headers: list[tuple[str, str]] = []
    body = payload
    if warc_type == "response" and payload.startswith(b"HTTP/"):
        hsep = payload.find(_CRLF + _CRLF)
        if hsep != -1:
            hlines = payload[:hsep].decode("utf-8", "replace").split("\r\n")
            parts = hlines[0].split(" ")
            if len(parts) >= 2 and parts[1].isdigit():
                status = int(parts[1])
            for line in hlines[1:]:
                colon = line.find(":")
                if colon > 0:
                    http_headers.append(
                        (line[:colon], line[colon + 1 :].lstrip(" "))
                    )
            body = payload[hsep + 4 :]
    return {
        "url": fields.get("warc-target-uri"),
        "warc_type": warc_type,
        "warc_ts": ts.replace(tzinfo=None) if ts else None,
        "record_id": fields.get("warc-record-id", ""),
        "content_type": fields.get("content-type", ""),
        "http_status": status,
        "http_headers": http_headers,
        "payload": body,
    }


def read_warc_bytes(data: bytes, warc_file: str = ""):
    """Iterate record dicts from in-memory .warc.gz bytes."""
    yield from _records_from_members(_split_members(data), warc_file)


def _records_from_members(members, warc_file: str):
    for offset, member in members:
        rec = parse_warc_record(member)
        if rec is None:
            continue
        rec["warc_file"] = warc_file
        rec["warc_offset"] = offset
        yield rec


def read_warc_stream(fh, warc_file: str = "", chunk_bytes: int = 1 << 20):
    """Iterate record dicts from a FILE-LIKE .warc.gz stream without
    materializing the file (per-member memory; ccspark.arc's
    incremental gzip-member walk)."""
    from .arc import _iter_gzip_members_stream

    yield from _records_from_members(
        _iter_gzip_members_stream(fh, chunk_bytes), warc_file
    )


def scan_warc(spark: SparkSession, path_glob: str) -> DataFrame:
    """Distributed WARC scan: one input row per ``.warc.gz`` file
    (binaryFile source, unsplittable like the ARC InputFormat), decoded
    to record rows with a batch Arrow UDF."""
    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.warc.gz")
        .load(path_glob)
        .select("path", "content")
    )

    cols = [
        "url",
        "warc_file",
        "warc_offset",
        "warc_type",
        "warc_ts",
        "record_id",
        "content_type",
        "http_status",
        "http_headers",
        "payload",
    ]

    def _decode(batches):
        for pdf in batches:
            rows = []
            for path, content in zip(pdf["path"], pdf["content"]):
                for rec in read_warc_bytes(bytes(content), warc_file=path):
                    rows.append(rec)
            yield pd.DataFrame(rows, columns=cols)

    return files.mapInPandas(_decode, schema=RECORD_SCHEMA)


def scan_warc_stream(
    spark: SparkSession,
    path_glob: str,
    chunk_bytes: int = 1 << 20,
    max_batch_rows: int = 1000,
) -> DataFrame:
    """Distributed STREAMED WARC scan: paths-only listing, one file per
    task, incremental gzip-member walk (read_warc_stream) — byte-
    identical rows to ``scan_warc`` without the whole-file binary cell
    (>2 GB archives stream in bounded chunks; real CC WARCs target
    ~1 GB but nothing enforces it)."""
    from . import sources

    return sources.scan_archive_stream(
        spark,
        path_glob,
        "*.warc.gz",
        read_warc_stream,
        "warc_file",
        [
            "url",
            "warc_file",
            "warc_offset",
            "warc_type",
            "warc_ts",
            "record_id",
            "content_type",
            "http_status",
            "http_headers",
            "payload",
        ],
        RECORD_SCHEMA,
        chunk_bytes=chunk_bytes,
        max_batch_rows=max_batch_rows,
    )
