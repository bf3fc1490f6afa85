"""ARC archive container support: writer, streaming reader, Spark scan.

Re-expresses the reference's ARC file semantics in Python:

* container = one gzip member per record; first member is a
  ``filedesc://`` metadata record carrying the IA gzip extra field
  ``{8,0,'L','X',4,0,0,0,0,0}`` spliced after the 10-byte gzip header
  with FLG=4 and OS=3 (ArcFileReaderTests.generateARCFileMetaData,
  reference src/test/.../ArcFileReaderTests.java:127-184).
* record member layout (ArcFileReaderTests.write:218-322):
  ``url ip ts14 mime len\\n`` metadata line (len = header bytes +
  payload bytes), header block ``key:value\\r\\n``* + ``\\r\\n``
  (NIOHttpHeaders.toString, io/shared/NIOHttpHeaders.java:485-497),
  payload bytes, trailing ``\\n``.
* reader = per-member inflate + the ArcFileBuilder state machine
  (ARCFileReader.java:364-783): metadata line to first LF (regex
  ``^(.*)\\s([0-9.]+)\\s([0-9]+)\\s([^\\s]+)\\s([0-9]+)$`` with the
  malformed-line rsplit fallback for URLs containing spaces,
  :556-616), headers to the tolerant CRLF-CRLF terminator
  (``\\n\\n`` / ``\\r\\n\\r\\n`` / ``\\n\\r\\n`` all accepted,
  :424-460), payload = record_len − header bytes.
* Spark scan: ``binaryFile`` source (one row per ``.arc.gz``,
  unsplittable like ARCFileInputFormat.isSplitable=false) →
  ``mapInPandas`` batch decode → record rows.
"""

from __future__ import annotations

import gzip
import io
import re
import struct
import zlib
from datetime import datetime, timezone

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

ARC_GZIP_EXTRA_FIELD = bytes([8, 0, ord("L"), ord("X"), 4, 0, 0, 0, 0, 0])
ARC_MAGIC = "filedesc://"
_TS14 = "%Y%m%d%H%M%S"

RECORD_SCHEMA = (
    "url string, arc_file string, arc_offset long, host_ip string, "
    "warc_ts timestamp, mime string, record_len long, "
    "headers array<struct<key:string,value:string>>, payload binary"
)


def _ts14(dt: datetime) -> str:
    return dt.strftime(_TS14)


def _gzip_member(data: bytes, with_extra: bool = False) -> bytes:
    buf = io.BytesIO()
    with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as gz:
        gz.write(data)
    raw = buf.getvalue()
    if not with_extra:
        return raw
    if raw[3] != 0:
        raise ValueError("unexpected gzip FLG")
    raw = bytearray(raw)
    raw[3] = 4  # FEXTRA
    raw[9] = 3  # OS = Unix
    return bytes(raw[:10]) + ARC_GZIP_EXTRA_FIELD + bytes(raw[10:])


class ArcWriter:
    """Streaming ARC writer (file-like sink)."""

    def __init__(self, sink, arc_file_name: str, ts: datetime | None = None):
        self.sink = sink
        ts = ts or datetime(2024, 1, 1, tzinfo=timezone.utc)
        tail = "\n1 0 CommonCrawl\nURL IP-address Archive-date Content-type Archive-length\n"
        header = f"{ARC_MAGIC}{arc_file_name} 0.0.0.0 {_ts14(ts)} text/plain {len(tail.encode('latin-1'))}{tail}\n"
        self.sink.write(_gzip_member(header.encode("latin-1"), with_extra=True))

    def write_record(
        self,
        url: str,
        payload: bytes,
        headers: list[tuple[str, str]] | None = None,
        host_ip: str = "0.0.0.0",
        ts: datetime | None = None,
        mime: str = "text/html",
    ) -> None:
        ts = ts or datetime(2024, 1, 1, tzinfo=timezone.utc)
        header_block = "".join(
            (f"{k}:{v}" if k else str(v)) + "\r\n" for k, v in (headers or [])
        ) + "\r\n"
        header_bytes = header_block.encode("utf-8")
        record_len = len(header_bytes) + len(payload)
        meta = f"{url} {host_ip} {_ts14(ts)} {mime} {record_len}\n".encode("utf-8")
        self.sink.write(_gzip_member(meta + header_bytes + payload + b"\n"))


def write_arc_bytes(records, arc_file_name: str = "test.arc.gz") -> bytes:
    buf = io.BytesIO()
    w = ArcWriter(buf, arc_file_name)
    for rec in records:
        w.write_record(**rec)
    return buf.getvalue()


_META_RE = re.compile(r"^(.*)\s([0-9.]+)\s([0-9]+)\s([^\s]+)\s([0-9]+)$", re.DOTALL)


def _parse_meta_line(line: str):
    m = _META_RE.match(line)
    if m:
        return list(m.groups())
    # malformed fallback: rsplit by space ×4 (URLs containing spaces,
    # ARCFileReader.parseMalformedMetadataLine:578-601)
    parts = line.rsplit(" ", 4)
    if len(parts) == 5:
        return parts
    return None


_TERM_RE = re.compile(rb"\r?\n\r?\n")


def _iter_gzip_members(data: bytes):
    """Yield (offset, inflated_bytes) per gzip member."""
    pos = 0
    n = len(data)
    while pos < n:
        d = zlib.decompressobj(wbits=16 + zlib.MAX_WBITS)
        try:
            out = d.decompress(data[pos:])
        except zlib.error:
            return
        yield pos, out
        consumed = len(data) - pos - len(d.unused_data)
        if consumed <= 0:
            return
        pos += consumed


def _iter_gzip_members_stream(fh, chunk_bytes: int = 1 << 20):
    """Yield (offset, inflated_bytes) per gzip member from a FILE-LIKE
    object, reading the compressed stream in bounded chunks — the
    streamed counterpart of ``_iter_gzip_members``: an arbitrarily
    large archive never materializes as one buffer (the reference
    streams 32 KB blocks, ARCFileReader.java:86-106; Spark caps a
    binary cell at 2 GB).  Per-member memory only; a truncated final
    member yields what inflated (best-effort, same as the in-memory
    walk); a corrupt member ends the scan."""
    buf = b""  # unconsumed compressed bytes; `base` = file offset of buf[0]
    base = 0
    while True:
        if not buf:
            buf = fh.read(chunk_bytes)
            if not buf:
                return
        d = zlib.decompressobj(wbits=16 + zlib.MAX_WBITS)
        member_off = base
        out = []
        while not d.eof:
            if not buf:
                buf = fh.read(chunk_bytes)
                if not buf:
                    break
            try:
                out.append(d.decompress(buf))
            except zlib.error:
                return
            if not d.eof:
                base += len(buf)
                buf = b""
        if d.eof:
            consumed = len(buf) - len(d.unused_data)
            base += consumed
            buf = d.unused_data
            yield member_off, b"".join(out)
        else:  # EOF mid-member: truncated tail, best-effort
            data = b"".join(out)
            if data:
                yield member_off, data
            return


def _records_from_members(members, arc_file: str = ""):
    """Member iterator → decoded ARC record dicts (shared by the
    in-memory and streamed walks)."""
    first = True
    for offset, member in members:
        if first:
            first = False
            if member.decode("latin-1", "replace").startswith(ARC_MAGIC):
                continue  # filedesc header member
        nl = member.find(b"\n")
        if nl == -1:
            continue
        meta = _parse_meta_line(member[:nl].decode("utf-8", "replace"))
        if meta is None:
            raise ValueError(f"invalid ARC metadata line at offset {offset}")
        url, ip, ts14, mime, record_len = meta
        record_len = int(record_len)
        rest = member[nl + 1 :]
        tm = _TERM_RE.search(rest)
        if tm is None:
            header_bytes, body_start = b"", 0
        else:
            header_bytes, body_start = rest[: tm.end()], tm.end()
        headers = []
        for line in header_bytes.decode("utf-8", "replace").split("\r\n"):
            if not line:
                continue
            colon = line.find(":")
            if colon not in (-1, len(line) - 1):
                headers.append((line[:colon], line[colon + 1 :]))
            else:
                headers.append(("", line))
        payload_len = max(0, record_len - len(header_bytes))
        payload = rest[body_start : body_start + payload_len]
        ts = datetime.strptime(ts14, _TS14)
        yield {
            "url": url,
            "arc_file": arc_file,
            "arc_offset": offset,
            "host_ip": ip,
            "warc_ts": ts,
            "mime": mime,
            "record_len": record_len,
            "headers": headers,
            "payload": payload,
        }


def read_arc_bytes(data: bytes, arc_file: str = ""):
    """Iterate decoded records from an in-memory ARC file."""
    yield from _records_from_members(_iter_gzip_members(data), arc_file)


def read_arc_stream(fh, arc_file: str = "", chunk_bytes: int = 1 << 20):
    """Iterate decoded records from a FILE-LIKE .arc.gz stream without
    materializing the file (per-member memory)."""
    yield from _records_from_members(_iter_gzip_members_stream(fh, chunk_bytes), arc_file)


def scan_arc(spark: SparkSession, path_glob: str) -> DataFrame:
    """Distributed ARC scan: one input row per ``.arc.gz`` file
    (binaryFile source — unsplittable, like the reference InputFormat),
    decoded to record rows with a batch Arrow UDF."""
    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.arc.gz")
        .load(path_glob)
        .select("path", "content")
    )

    def _decode(batches):
        for pdf in batches:
            rows = []
            for path, content in zip(pdf["path"], pdf["content"]):
                for rec in read_arc_bytes(bytes(content), arc_file=path):
                    rows.append(rec)
            yield pd.DataFrame(
                rows,
                columns=[
                    "url",
                    "arc_file",
                    "arc_offset",
                    "host_ip",
                    "warc_ts",
                    "mime",
                    "record_len",
                    "headers",
                    "payload",
                ],
            )

    return files.mapInPandas(_decode, schema=RECORD_SCHEMA)


def scan_arc_stream(
    spark: SparkSession,
    path_glob: str,
    chunk_bytes: int = 1 << 20,
    max_batch_rows: int = 1000,
) -> DataFrame:
    """Distributed STREAMED ARC scan: the file listing (paths only — the
    binaryFile source prunes the content column) fans out one file per
    task, and each task walks its archive incrementally
    (read_arc_stream): bounded chunk reads, per-member memory, record
    rows emitted in ≤``max_batch_rows`` batches.  Byte-identical rows
    to ``scan_arc``, but a >2 GB ``.arc.gz`` neither hits Spark's
    binary-cell cap nor spikes task memory (reference streams 32 KB
    blocks, ARCFileReader.java:86-106)."""
    from . import sources

    return sources.scan_archive_stream(
        spark,
        path_glob,
        "*.arc.gz",
        read_arc_stream,
        "arc_file",
        [
            "url",
            "arc_file",
            "arc_offset",
            "host_ip",
            "warc_ts",
            "mime",
            "record_len",
            "headers",
            "payload",
        ],
        RECORD_SCHEMA,
        chunk_bytes=chunk_bytes,
        max_batch_rows=max_batch_rows,
    )


def with_decoded_text(df: DataFrame) -> DataFrame:
    """ARC records → + ``text`` column via the header-driven decode path
    (CharsetUtils.bestEffortDecodeBytes semantics — header charset,
    text/html meta-sniff override, jchardet detector fallback, full
    aliasTable, U+FFFD-replacement decode; see ccspark.httpheaders).
    Arrow-batched; per-record work is codec-level C calls."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    from . import httpheaders as HH

    def _decode_fn(headers, payload):
        out = []
        for h, p in zip(headers, payload):
            out.append(HH.best_effort_decode_bytes(h, p))
        return pd.Series(out, dtype=object)

    _decode_text = pandas_udf(_decode_fn, "string")
    return df.withColumn("text", _decode_text(F.col("headers"), F.col("payload")))
