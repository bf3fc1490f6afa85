"""CDX index generation: SURT keys + space-delimited CDX lines.

The other Common Crawl artifact besides the archives themselves — a
sort-friendly per-capture index.  Pure Catalyst:

* ``surt_key``: Sort-friendly URI Reordering Transform subset —
  lowercase, scheme and leading ``www.`` dropped, host labels reversed
  and comma-joined, ``)`` before the path
  (``https://www.Sub.Example.com/A/b?q=1`` →
  ``com,example,sub)/a/b?q=1``);
* ``cdx_lines``: capture rows → the classic 9-field CDX(-ish) line
  ``surt ts14 url mime status digest length offset filename`` —
  lexicographically sortable by (surt, ts), which is the whole point:
  a global ``ORDER BY cdx`` is one Spark range-partitioned sort.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def surt_key(url: Column) -> Column:
    """SURT subset (lowercase, no scheme, no leading www., reversed
    comma-joined host labels, ')' + path-with-query)."""
    u = F.lower(url)
    host = F.regexp_extract(u, r"^[a-z][a-z0-9+.-]*://(?:[^/@]*@)?([^/:?#]+)", 1)
    host = F.regexp_replace(host, r"^www\.", "")
    rest = F.regexp_extract(u, r"^[a-z][a-z0-9+.-]*://(?:[^/@]*@)?[^/?#]*([/?#].*)?$", 1)
    rest = F.when(rest == "", F.lit("/")).otherwise(rest)
    rev_host = F.array_join(F.reverse(F.split(host, r"\.")), ",")
    return F.concat(rev_host, F.lit(")"), rest)


def cdx_lines(
    df: DataFrame,
    url_col: str = "url",
    ts_col: str = "warc_ts",
    mime_col: str = "mime",
    status_col: str | None = None,
    digest_col: str = "digest",
    length_col: str = "record_len",
    offset_col: str = "arc_offset",
    file_col: str = "arc_file",
) -> DataFrame:
    """Capture rows → (surt, ts14, cdx line)."""
    ts14 = F.date_format(F.col(ts_col), "yyyyMMddHHmmss")
    status = F.col(status_col).cast("string") if status_col else F.lit("200")
    line = F.concat_ws(
        " ",
        surt_key(F.col(url_col)),
        ts14,
        F.col(url_col),
        F.col(mime_col),
        status,
        F.col(digest_col),
        F.col(length_col).cast("string"),
        F.col(offset_col).cast("string"),
        F.col(file_col),
    )
    return df.select(
        surt_key(F.col(url_col)).alias("surt"),
        ts14.alias("ts14"),
        line.alias("cdx"),
    )
