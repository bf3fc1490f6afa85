"""Real HTTP fetch stage: the production counterpart of the frontier's
deterministic fetch simulation.

``CrawlFrontier(expand_fn=fetch.make_expand_fn(...))`` turns the crawl
loop into a live crawler: scheduled URLs are fetched over HTTP
(stdlib urllib — no third-party deps), out-links extracted with the
Catalyst href regexp and resolved through the byte-matrix RFC 3986
resolver, and the discovered raw (url, priority) rows flow back into
the frontier's canonical identity kernel like every other URL.

Scale/politeness shape:
* fetching is network-bound per-row work inside ``mapInPandas`` — the
  executor parallelism IS the connection parallelism; clustering the
  input by ``domain_hash`` (``partition_by_host``) serializes any one
  host's requests within one task, and fetch_batch enforces the
  inter-request spacing per host: ``max(delay_ms, crawl_delay_ms)``
  milliseconds between two requests to the same host (crawl_delay_ms
  rides in per-row when the input carries it — e.g. joined on during
  politeness).  The frontier's politeness gate has already enforced
  robots + per-round budgets BEFORE rows reach the fetcher.
* responses are size-capped (``max_bytes``) and status/type/error are
  carried as columns — hostile servers can't balloon executor memory,
  and fetch failures land as data, not exceptions.
* urllib follows redirects; the LANDED URL is recorded as
  ``final_url`` so relative links on redirected pages resolve against
  the page that actually served them, not the scheduled URL
  (make_expand_fn resolves against final_url).
* HTML is interpreted as UTF-8 (lossy) for link extraction; the full
  charset-detection decode path (ccspark.text) is for content
  processing, where bytes are preserved.

The reference's fetcher lives out-of-tree (its crawler service); this
module stands in the same spot its ArcFileItem producers did —
SURVEY.md's justified-external fetch stage made pluggable and local.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FETCH_COLS = "status int, content_type string, html binary, final_url string, fetch_err string"


def fetch_batch(
    urls,
    timeout: float = 10.0,
    max_bytes: int = 1 << 20,
    user_agent: str = "ccspark-crawler/0.1",
    delay_ms: int = 0,
    hosts=None,
    delays_ms=None,
    last_at: dict | None = None,
) -> pd.DataFrame:
    """Fetch each URL; returns (status, content_type, html, final_url,
    fetch_err) aligned with the input.  HTTP errors are DATA (status +
    empty body); transport errors land in fetch_err; bodies are
    truncated at ``max_bytes`` (recorded in fetch_err as 'truncated');
    ``final_url`` is the post-redirect landed URL.

    Politeness spacing: with ``hosts`` (aligned host keys) each host's
    requests are spaced ``max(delay_ms, delays_ms[i])`` milliseconds
    apart (``delays_ms`` = per-row crawl delay, e.g. robots
    Crawl-delay); without ``hosts``, ``delay_ms`` spaces consecutive
    requests of the batch.  ``last_at`` (host → monotonic time of its
    last request) lets a caller carry the spacing state ACROSS batches
    — fetch_pages passes one dict per task so a host split over
    several Arrow batches still gets its delay at the seam."""
    import time
    import urllib.error
    import urllib.request

    host_list = list(hosts) if hosts is not None else None
    delay_list = list(delays_ms) if delays_ms is not None else None
    if last_at is None:
        last_at = {}
    status, ctype, body_col, final, err = [], [], [], [], []
    for i, u in enumerate(urls):
        row_delay = delay_ms
        if delay_list is not None and delay_list[i] is not None and not pd.isna(delay_list[i]):
            row_delay = max(row_delay, int(delay_list[i]))
        if host_list is not None:
            h = host_list[i]
            prev = last_at.get(h)
            if prev is not None and row_delay:
                wait = prev + row_delay / 1000.0 - time.monotonic()
                if wait > 0:
                    time.sleep(wait)
            last_at[h] = time.monotonic()
        elif row_delay and i:
            time.sleep(row_delay / 1000.0)
        try:
            req = urllib.request.Request(str(u), headers={"User-Agent": user_agent})
            with urllib.request.urlopen(req, timeout=timeout) as r:
                body = r.read(max_bytes + 1)
                trunc = len(body) > max_bytes
                status.append(int(getattr(r, "status", 200)))
                ctype.append(r.headers.get("Content-Type"))
                body_col.append(bytes(body[:max_bytes]))
                final.append(r.geturl())
                err.append("truncated" if trunc else None)
        except urllib.error.HTTPError as ex:
            status.append(int(ex.code))
            ctype.append(ex.headers.get("Content-Type") if ex.headers else None)
            body_col.append(b"")
            final.append(getattr(ex, "url", None) or str(u))
            err.append(None)
        except Exception as ex:  # noqa: BLE001 — fetch failures are data
            status.append(None)
            ctype.append(None)
            body_col.append(None)
            final.append(None)
            err.append(f"{type(ex).__name__}: {ex}")
    return pd.DataFrame(
        {"status": pd.array(status, dtype="Int32"), "content_type": ctype,
         "html": body_col, "final_url": final, "fetch_err": err}
    )


def fetch_pages(
    df: DataFrame,
    url_col: str = "url",
    partition_by_host: bool = True,
    host_col: str = "host",
    delay_col: str = "crawl_delay_ms",
    **fetch_kw,
) -> DataFrame:
    """Fetch every row's URL, appending the FETCH_COLS columns.  With
    ``partition_by_host`` (and a ``domain_hash`` column present) rows
    are clustered so one task owns each host — per-host request
    serialization regardless of cluster size.  When the input carries
    ``host``/``crawl_delay_ms`` columns, same-host requests are spaced
    ``max(delay_ms, crawl_delay_ms)`` apart (fetch_batch)."""
    if partition_by_host and "domain_hash" in df.columns:
        df = df.repartition("domain_hash")
    in_schema = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in df.schema)
    has_host = host_col in df.columns
    has_delay = delay_col in df.columns

    def _fetch(batches):
        last_at: dict = {}  # task-scoped: spacing survives Arrow batch seams
        for pdf in batches:
            fetched = fetch_batch(
                pdf[url_col],
                hosts=pdf[host_col] if has_host else None,
                delays_ms=pdf[delay_col] if has_delay else None,
                last_at=last_at,
                **fetch_kw,
            )
            yield pd.concat(
                [pdf.reset_index(drop=True), fetched.reset_index(drop=True)], axis=1
            )

    return df.mapInPandas(_fetch, schema=f"{in_schema}, {FETCH_COLS}")


def fetch_robots(
    spark,
    urls,
    agent: str = "*",
    timeout: float = 10.0,
    default_budget: int | None = None,
) -> DataFrame:
    """Fetch and parse each host's live robots.txt → the politeness
    rules table (host, disallow_prefixes, crawl_delay_ms,
    max_fetches_per_round), directly pluggable into
    ``CrawlFrontier(robots_df=...)``.  ``urls`` is any iterable of
    URLs or hosts; one request per unique host, driver-side (a seed
    list's host set is small; per-round discovered-host refresh can
    re-call this and union).

    RFC 9309 availability semantics:
    * 2xx → parse the rules;
    * 4xx ("unavailable", §2.3.1.3) → default-allow (no row);
    * 5xx or transport failure ("unreachable", §2.3.1.4) → COMPLETE
      DISALLOW — a ``disallow_prefixes=['/']`` row, so the crawler
      must not assume access it could not verify.
    Scheme: hosts given with an explicit ``http://`` URL are fetched
    over http; bare hosts and https URLs try ``https`` first and fall
    back to http only on transport failure — an https-only host's
    rules are not silently missed."""
    from urllib.parse import urlsplit

    from . import politeness

    # politeness keys on the PORTLESS host (with_host_and_path), and the
    # rules table carries a hard one-row-per-host invariant (a duplicate
    # host row fans out the schedule join) — so dedupe on the portless
    # host here; the first netloc seen wins the robots fetch
    hosts = []
    seen = set()
    for u in urls:
        u = str(u)
        has_scheme = "://" in u
        parts = urlsplit(u if has_scheme else f"https://{u}")
        # hostname strips userinfo AND port (netloc.split(':') would key
        # 'u:pw@a.com' on the username); rebuild the request netloc from
        # hostname+port only — urllib rejects userinfo in the URL
        key = parts.hostname
        if key and key not in seen:
            seen.add(key)
            try:
                netloc = key + (f":{parts.port}" if parts.port else "")
            except ValueError:  # non-numeric port
                netloc = key
            scheme = parts.scheme if has_scheme else "https"
            hosts.append((key, netloc, scheme))
    fetched = fetch_batch(
        pd.Series([f"{scheme}://{netloc}/robots.txt" for _h, netloc, scheme in hosts]),
        timeout=timeout,
    )
    # https transport failures retry over http (https-first for bare /
    # https inputs; explicit-http inputs never tried https)
    retry_idx = [
        i
        for i, (_h, _n, scheme) in enumerate(hosts)
        if scheme != "http"
        and pd.isna(fetched["status"].iloc[i])
        and fetched["fetch_err"].iloc[i] is not None
    ]
    if retry_idx:
        refetched = fetch_batch(
            pd.Series([f"http://{hosts[i][1]}/robots.txt" for i in retry_idx]),
            timeout=timeout,
        )
        for j, i in enumerate(retry_idx):
            fetched.iloc[i] = refetched.iloc[j]
    rows = []
    for (host, _netloc, _scheme), (_, r) in zip(hosts, fetched.iterrows()):
        st = None if pd.isna(r["status"]) else int(r["status"])
        if st is not None and 200 <= st < 300 and r["html"] is not None:
            try:
                text = bytes(r["html"]).decode("utf-8", "replace")
            except Exception:  # noqa: BLE001 — undecodable robots = unreachable
                rows.append((host, ["/"], None, default_budget))
                continue
            prefixes, delay_ms = politeness.parse_robots_txt(text, agent)
            rows.append((host, prefixes, delay_ms, default_budget))
        elif st is not None and 400 <= st < 500:
            continue  # unavailable robots → default-allow (no row)
        elif st is not None and 300 <= st < 400:
            # urllib auto-follows redirects; a surviving 3xx means the
            # redirect limit was exceeded (loop) — RFC 9309 §2.3.1.2
            # says MAY assume unavailable after ≥5 hops, and §2.3.1.3
            # unavailable → allow (no row), NOT unreachable-disallow
            continue
        else:
            # unreachable (5xx / transport / non-HTTP status): complete
            # disallow — every path starts with "/", so one prefix rules
            # the host out until robots becomes fetchable
            rows.append((host, ["/"], None, default_budget))
    return spark.createDataFrame(
        rows or [],
        "host string, disallow_prefixes array<string>, crawl_delay_ms long, "
        "max_fetches_per_round int",
    )


def make_expand_fn(
    priority_decay: float = 0.8,
    partition_by_host: bool = True,
    **fetch_kw,
):
    """Build a CrawlFrontier ``expand_fn``: scheduled rows → live fetch
    → href extraction (Catalyst regexp) → RFC 3986 resolution
    (byte-matrix kernel) → raw (url, priority) discoveries.

    Link bases use the fetch's ``final_url`` (urllib follows
    redirects): relative hrefs on a redirected page resolve against
    the URL that actually served the page.  The discovered URLs then
    re-enter the frontier, where the NEXT round's robots/politeness
    gate re-authorizes them — a cross-host redirect's outlinks are
    gated like any other discovery."""

    def expand(scheduled: DataFrame) -> DataFrame:
        from pyspark.sql.functions import pandas_udf

        from . import links

        pages = fetch_pages(
            scheduled, partition_by_host=partition_by_host, **fetch_kw
        ).filter("status = 200 AND html IS NOT NULL")
        pages = pages.select(
            F.coalesce(F.col("final_url"), F.col("url")).alias("page_url"),
            (F.col("priority") * priority_decay).alias("priority"),
            F.col("html").cast("string").alias("html_str"),
        )
        # ONE linear plan: priority rides through the href explode
        # (carry=) — a self-join back to `pages` would recompute the
        # fetch subtree per branch and issue every HTTP request twice
        hrefs = links.extract_hrefs(pages, "page_url", "html_str", carry=["priority"])

        def _resolve_fn(base, href):
            return links.resolve_batch(base, href)

        resolve = pandas_udf(_resolve_fn, "string")
        return (
            hrefs.select(
                resolve(F.col("url"), F.col("href")).alias("url"), "priority"
            )
            .filter(F.col("url").isNotNull())
        )

    return expand
