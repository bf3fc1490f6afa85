"""HTML out-link extraction + resolution: the real version of the
frontier's link-discovery stage.

The reference models page out-links as ArcFileItem/ParseOutput link
collections (protocol/shared/protocol.jr link & anchor records); the
extraction itself lives in its (out-of-tree) parser.  Here:

* ``extract_hrefs`` — pure Catalyst: ``regexp_extract_all`` over
  ``<a ... href=...>`` (single/double/unquoted forms), entity-unescape
  of the four URL-relevant entities, exploded one row per link;
* ``resolve_links`` — Arrow-vectorized RFC 3986 resolution of relative
  references against the page URL (stdlib ``urljoin``: merge paths,
  remove dot segments), followed by the SAME canonicalize+fingerprint
  kernel every other URL in the engine goes through, so discovered
  links land in frontier identity space directly;
* ``page_links`` — the two stages composed: (page url, html) →
  (url, link, canonical_url, domain_hash, url_hash, url_valid).

Scale shape: extraction is one JVM regexp pass over the html column;
resolution + identity is one Arrow hop (the strings cross the boundary
once), identical to the frontier's fused link path.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_HREF_RE = (
    r"(?is)<a\s[^>]*?href\s*=\s*"
    r"(?:\"([^\"]*)\"|'([^']*)'|([^\s>\"']+))"
)


def extract_hrefs(df: DataFrame, url_col: str, html_col: str) -> DataFrame:
    """(page url, html) → one row per raw href (pure Catalyst)."""
    h = F.col(html_col)
    # the three alternation groups are mutually exclusive; regexp_extract_all
    # only takes one group index, so run the three quote forms separately
    # and concat — still a single projection over the scan
    links = F.concat(
        F.regexp_extract_all(h, F.lit(_HREF_RE), F.lit(1)),
        F.regexp_extract_all(h, F.lit(_HREF_RE), F.lit(2)),
        F.regexp_extract_all(h, F.lit(_HREF_RE), F.lit(3)),
    )
    out = df.select(F.col(url_col).alias("url"), F.explode(links).alias("href"))
    out = out.filter(F.col("href") != "")
    # entity-unescape the URL-relevant entities (JVM-side)
    href = F.col("href")
    for ent, rep in (("&amp;", "&"), ("&#38;", "&"), ("&quot;", '"'), ("&#39;", "'")):
        href = F.replace(href, F.lit(ent), F.lit(rep))
    return out.select("url", href.alias("href"))


def resolve_links(df: DataFrame, url_col: str = "url", href_col: str = "href") -> DataFrame:
    """RFC 3986 resolution + the engine's canonical identity, one Arrow
    hop.  Skips fragment-only, javascript:, mailto:, data: links."""
    from pyspark.sql.functions import pandas_udf

    from . import urls as U

    def _resolve_fn(base, href):
        from urllib.parse import urljoin

        out = []
        for b, h in zip(base, href):
            h = (h or "").strip()
            low = h.lower()
            if (
                not h
                or h.startswith("#")
                or low.startswith(("javascript:", "mailto:", "data:", "tel:"))
            ):
                out.append(None)
                continue
            try:
                out.append(urljoin(b, h))
            except ValueError:
                out.append(None)
        return pd.Series(out, index=base.index)

    _resolve = pandas_udf(_resolve_fn, "string")
    resolved = df.withColumn("link", _resolve(F.col(url_col), F.col(href_col)))
    resolved = resolved.filter(F.col("link").isNotNull())
    from . import functions as CF

    return CF.with_canonical_urlfp(resolved, url_col="link")


def page_links(df: DataFrame, url_col: str, html_col: str) -> DataFrame:
    """(page url, html) → resolved canonical out-links with identities."""
    return resolve_links(extract_hrefs(df, url_col, html_col))
