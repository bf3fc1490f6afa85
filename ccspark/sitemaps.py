"""Sitemap ingestion: XML sitemaps / sitemap indexes → crawl candidates.

A production frontier's second candidate source besides out-links
(robots.txt ``Sitemap:`` lines point at these).  Pure Catalyst — the
<url> blocks are split with regexp_extract_all and each field comes
from a regexp over its own block, so the extraction scales like any
string column (no Python, no XML parser in the hot path; sitemaps are
machine-generated, block-regular XML by spec).

* ``extract_sitemap_entries``: (id, xml) → exploded rows
  (loc, lastmod, changefreq, priority), absent fields NULL;
* ``extract_sitemap_index``: nested <sitemap><loc> pointers;
* ``sitemap_candidates``: entries → frontier-shaped candidates
  (url, priority double defaulting 0.5 per the sitemap spec).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_URL_BLOCK = r"(?s)<url>(.*?)</url>"
_SM_BLOCK = r"(?s)<sitemap>(.*?)</sitemap>"


def _field(block, tag: str):
    return F.nullif(
        F.regexp_extract(block, rf"(?s)<{tag}>\s*(.*?)\s*</{tag}>", 1), F.lit("")
    )


def extract_sitemap_entries(
    df: DataFrame, id_col: str, xml_col: str
) -> DataFrame:
    """(id, sitemap xml) → one row per <url> entry."""
    blocks = F.regexp_extract_all(F.col(xml_col), F.lit(_URL_BLOCK), F.lit(1))
    exploded = df.select(F.col(id_col), F.explode(blocks).alias("_b"))
    b = F.col("_b")
    return exploded.select(
        id_col,
        _field(b, "loc").alias("loc"),
        _field(b, "lastmod").alias("lastmod"),
        _field(b, "changefreq").alias("changefreq"),
        _field(b, "priority").cast("double").alias("priority"),
    ).filter(F.col("loc").isNotNull())


def extract_sitemap_index(df: DataFrame, id_col: str, xml_col: str) -> DataFrame:
    """(id, sitemapindex xml) → one row per child sitemap pointer."""
    blocks = F.regexp_extract_all(F.col(xml_col), F.lit(_SM_BLOCK), F.lit(1))
    exploded = df.select(F.col(id_col), F.explode(blocks).alias("_b"))
    b = F.col("_b")
    return exploded.select(
        id_col,
        _field(b, "loc").alias("sitemap_loc"),
        _field(b, "lastmod").alias("lastmod"),
    ).filter(F.col("sitemap_loc").isNotNull())


def sitemap_candidates(entries: DataFrame) -> DataFrame:
    """Sitemap entries → frontier candidate shape (url, priority);
    missing priority defaults to 0.5 (sitemaps.org spec default)."""
    return entries.select(
        F.col("loc").alias("url"),
        F.coalesce(F.col("priority"), F.lit(0.5)).alias("priority"),
    )
