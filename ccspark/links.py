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

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_HREF_RE = (
    r"(?is)<a\s[^>]*?href\s*=\s*"
    r"(?:\"([^\"]*)\"|'([^']*)'|([^\s>\"']+))"
)


def extract_hrefs(
    df: DataFrame, url_col: str, html_col: str, carry: list[str] | None = None
) -> DataFrame:
    """(page url, html) → one row per raw href (pure Catalyst).
    ``carry`` columns ride along unchanged — callers that need page
    attributes per href (e.g. priority) avoid a self-join against the
    page source, which matters when that source is expensive to
    recompute (a live fetch)."""
    h = F.col(html_col)
    # the three alternation groups are mutually exclusive; regexp_extract_all
    # only takes one group index, so run the three quote forms separately
    # and concat — still a single projection over the scan
    links = F.concat(
        F.regexp_extract_all(h, F.lit(_HREF_RE), F.lit(1)),
        F.regexp_extract_all(h, F.lit(_HREF_RE), F.lit(2)),
        F.regexp_extract_all(h, F.lit(_HREF_RE), F.lit(3)),
    )
    carry = carry or []
    out = df.select(
        F.col(url_col).alias("url"), *carry, F.explode(links).alias("href")
    )
    out = out.filter(F.col("href") != "")
    # entity-unescape the URL-relevant entities (JVM-side)
    href = F.col("href")
    for ent, rep in (("&amp;", "&"), ("&#38;", "&"), ("&quot;", '"'), ("&#39;", "'")):
        href = F.replace(href, F.lit(ent), F.lit(rep))
    return out.select("url", *carry, href.alias("href"))


_SKIP_PREFIXES = ("javascript:", "mailto:", "data:", "tel:")

# dot segment ('.' or '..' as a whole path segment) anywhere in a path
_DOTSEG_RE = r"(?:^|/)\.\.?(?:/|$)"

# RFC 3986 scheme charset for the byte kernel
_SCHEME_OK = np.zeros(256, dtype=bool)
for _c in b"abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789+.-":
    _SCHEME_OK[_c] = True
_ALPHA = np.zeros(256, dtype=bool)
for _c in b"abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ":
    _ALPHA[_c] = True
# segment terminators for the dot-segment scan ('\0' = padding/EOS)
_SEG_END = np.zeros(256, dtype=bool)
for _c in b"/?#":
    _SEG_END[_c] = True
_SEG_END[0] = True

_BASE_RE = None  # compiled lazily (re import kept out of the hot loop)


def _prefix_eq(m: np.ndarray, lens: np.ndarray, pat: bytes) -> np.ndarray:
    k = len(pat)
    if m.shape[1] < k:
        return np.zeros(m.shape[0], dtype=bool)
    return (lens >= k) & (m[:, :k] == np.frombuffer(pat, dtype=np.uint8)).all(axis=1)


def _classify_hrefs(vals: np.ndarray) -> tuple[np.ndarray, dict]:
    """One prep pass (strip + utf-8 byte length), then byte-matrix
    classification of the hrefs into the resolution classes (same masks
    the pandas formulation used, ~20× cheaper: one fixed-width uint8
    matrix, columnar compares only — the same idiom as
    urlkernel.canonicalize_matrix).  The matrix is built by scattering
    one joined buffer (latin-1 round-trips arbitrary bytes through the
    str join), which beats np.array(dtype='S') ~3×.  Returns
    (stripped hrefs, masks); non-UTF-8-encodable rows are forced into
    the residue class."""
    n = len(vals)
    hs = np.empty(n, dtype=object)
    enc_fail = np.zeros(n, dtype=bool)
    lens = np.empty(n, dtype=np.int32)
    parts = []
    for i, v in enumerate(vals):
        s = v.strip() if isinstance(v, str) else ""
        hs[i] = s
        if s.isascii():
            parts.append(s)
            lens[i] = len(s)
        else:
            try:
                b = s.encode("utf-8")
            except UnicodeEncodeError:
                enc_fail[i] = True
                b = b"\x00"
            parts.append(b.decode("latin-1"))
            lens[i] = len(b)
    flat = np.frombuffer("".join(parts).encode("latin-1"), dtype=np.uint8)
    # +3 pad keeps j+2 lookups in-bounds; floor 8 keeps the fixed-width
    # scheme slices (M[:, :5]) valid even for all-tiny inputs
    L = max(int(lens.max(initial=1)) + 3, 8)
    M = np.zeros((n, L), dtype=np.uint8)
    col = np.arange(L, dtype=np.int32)
    in_str = col[None, :] < lens[:, None]
    M[in_str] = flat

    c0 = M[:, 0]
    c1 = M[:, 1]
    slash, q, hashb, colonb, dotb = (ord(x) for x in "/?#:.")

    # skip policy: '#'-first or a case-insensitive skip-prefix.  Byte-
    # lowering only folds A-Z, which matches str.lower() here: no
    # non-ASCII codepoint lowercases into ASCII j/m/d/t, so prefix hits
    # are ASCII-only anyway.
    k = min(11, L)
    head = M[:, :k]
    head_low = np.where((head >= 65) & (head <= 90), head | 0x20, head)
    skip = c0 == hashb
    for p in (b"javascript:", b"mailto:", b"data:", b"tel:"):
        skip |= _prefix_eq(head_low, lens, p)
    skip |= lens == 0

    ctl = ((M <= 0x20) & in_str).any(axis=1)
    last = np.take_along_axis(M, np.maximum(lens - 1, 0)[:, None].astype(np.int64), axis=1)[:, 0]
    endbad = (last == q) | (last == hashb)
    # padding bytes are 0, never '?'/'#'/'/'/':'/'.', so the pattern
    # searches below need no in-string mask
    qf = ((M[:, :-1] == q) & (M[:, 1:] == hashb)).any(axis=1)

    # scheme detection (first ':' with a valid scheme before it, '//'
    # after).  ':' and padding 0 are both outside the scheme charset, so
    # "first invalid byte == first colon" ⇔ everything before ':' valid.
    cm = M == colonb
    has_colon = cm.any(axis=1)
    cpos = cm.argmax(axis=1).astype(np.int64)
    first_invalid = (~_SCHEME_OK[M]).argmax(axis=1)
    valid_scheme = has_colon & (cpos >= 1) & _ALPHA[c0] & (first_invalid == cpos)
    after1 = np.take_along_axis(M, (cpos + 1)[:, None], axis=1)[:, 0]
    after2 = np.take_along_axis(M, (cpos + 2)[:, None], axis=1)[:, 0]
    after3 = np.take_along_axis(M, (cpos + 3)[:, None], axis=1)[:, 0]
    absm = valid_scheme & (after1 == slash) & (after2 == slash) & (lens > cpos + 2)
    netloc_ok = (
        absm
        & (lens > cpos + 3)
        & (after3 != slash)
        & (after3 != q)
        & (after3 != hashb)
    )
    low4 = np.where((M[:, :4] >= 65) & (M[:, :4] <= 90), M[:, :4] | 0x20, M[:, :4])
    low5 = np.where((M[:, :5] >= 65) & (M[:, :5] <= 90), M[:, :5] | 0x20, M[:, :5])
    sch_http = (cpos == 4) & (low4 == np.frombuffer(b"http", np.uint8)).all(axis=1)
    sch_https = (cpos == 5) & (low5 == np.frombuffer(b"https", np.uint8)).all(axis=1)
    # exact-lowercase scheme (required for the verbatim same-scheme class)
    sch_http_lc = sch_http & (M[:, :4] == np.frombuffer(b"http", np.uint8)).all(axis=1)
    sch_https_lc = sch_https & (M[:, :5] == np.frombuffer(b"https", np.uint8)).all(axis=1)

    c2 = M[:, 2]
    is_b = (c0 == slash) & (c1 == slash) & (lens >= 3) & (c2 != slash) & (c2 != q) & (c2 != hashb)
    is_a = (c0 == slash) & (c1 != slash)
    is_c_pre = ~has_colon & (c0 != slash) & (c0 != q) & (c0 != hashb) & (lens > 0)

    # dot segments / '//' — computed only over the rows whose classes
    # consult them (root-relative + path-relative; the other classes keep
    # dot segments verbatim), and conservatively over the WHOLE string (a
    # hit inside the query part only costs a needless residue fallback,
    # never a wrong vector result).  Segment end = '/', '?', '#' or
    # end-of-string (padding 0).
    dots = np.zeros(n, dtype=bool)
    dslash = np.zeros(n, dtype=bool)
    lasthit = np.full(n, -1, dtype=np.int64)
    need = is_a | is_c_pre
    idx_need = np.flatnonzero(need)
    if len(idx_need):
        Ms = np.ascontiguousarray(M[idx_need]) if len(idx_need) < n else M
        dot = Ms == dotb
        prev_slash = np.ones(Ms.shape, dtype=bool)
        prev_slash[:, 1:] = Ms[:, :-1] == slash
        n1 = _SEG_END[Ms[:, 1:]]
        n1dot = Ms[:, 1:] == dotb
        n2 = _SEG_END[Ms[:, 2:]]
        hit = dot[:, :-2] & prev_slash[:, :-2] & (n1[:, :-1] | (n1dot[:, :-1] & n2))
        dots_s = hit.any(axis=1)
        dots[idx_need] = dots_s
        dslash[idx_need] = ((Ms[:, :-1] == slash) & (Ms[:, 1:] == slash)).any(axis=1)
        # last dot-seg hit, needed only for the (rare) "../" rows
        uprows = np.flatnonzero(dots_s)
        if len(uprows):
            lasthit[idx_need[uprows]] = (
                hit.shape[1] - 1 - np.argmax(hit[uprows][:, ::-1], axis=1)
            )
    # leading "../" runs: vectorizable as a clamped parent-dir walk.
    # upk = number of leading "../"; up_ok additionally demands every
    # dot-segment hit lies inside that prefix (so the remainder is clean)
    upk = np.zeros(n, dtype=np.int32)
    pat = b""
    for _ in range(4):
        pat += b"../"
        upk += _prefix_eq(M, lens, pat)
    up_ok = (upk >= 1) & (lasthit <= 3 * (upk.astype(np.int64) - 1))
    is_q = (c0 == q) & (lens >= 2) & (c1 != hashb)
    is_c = is_c_pre

    # NB: ctl only disqualifies the classes that round-trip through
    # urlsplit; the different-scheme class returns the href verbatim, and
    # a control char in the scheme region already fails valid_scheme —
    # so absm tolerates ctl elsewhere (exactly like urljoin)
    residue_force = enc_fail | ctl
    return hs, {
        "skip": skip,
        "clean": ~endbad & ~qf & ~residue_force,
        "dots": dots,
        "dslash": dslash,
        "absm": absm & ~enc_fail,
        "netloc_ok": netloc_ok,
        "sch_http": sch_http,
        "sch_https": sch_https,
        "sch_http_lc": sch_http_lc,
        "sch_https_lc": sch_https_lc,
        "is_b": is_b,
        "is_a": is_a,
        "is_q": is_q,
        "is_c": is_c,
        "upk": upk,
        "up_ok": up_ok,
    }


def resolve_batch(base: pd.Series, href: pd.Series) -> pd.Series:
    """Vectorized RFC 3986 reference resolution, parity-exact with the
    stdlib ``urljoin`` policy loop (tests/test_links.py fuzzes the full
    hostile-href grid): the five dominant reference classes — absolute,
    scheme-relative, root-relative, query-only, path-relative — are
    classified with one byte-matrix pass (_classify_hrefs) and resolved
    by string assembly; only the residue (dot segments,
    '//' collapse in merged paths, empty trailing query/fragment whose
    round-trip drops the delimiter, exotic schemes/bases) falls back to
    per-row ``urljoin``.  Real crawl hrefs are overwhelmingly in the
    vector classes, so the per-row path runs on ~% of rows, not all of
    them (the input_hint's "no per-row Python" on the hot path).

    Skips (→ None) empty, fragment-only, and javascript:/mailto:/data:/
    tel: hrefs — discovery policy, same as the reference's anchor
    filtering."""
    import re

    global _BASE_RE
    if _BASE_RE is None:
        _BASE_RE = re.compile(r"(https?)://([^/?#]*)([^?#]*)")

    n = len(href)
    out = np.full(n, None, dtype=object)

    hs, f = _classify_hrefs(href.to_numpy(dtype=object))
    live = ~f["skip"]
    if not live.any():
        return pd.Series(out, index=href.index)

    # base decomposition ONCE PER UNIQUE base (hrefs arrive grouped by
    # page, so uniques ≪ rows); only clean lowercase http(s) bases
    # vectorize — weird/control-char bases → residue
    codes, uniq = pd.factorize(base.fillna(""), use_na_sentinel=False)
    nu = len(uniq)
    u_ok = np.zeros(nu, dtype=bool)
    u_scheme = np.empty(nu, dtype=object)
    u_origin = np.empty(nu, dtype=object)
    u_bpath = np.empty(nu, dtype=object)
    u_dir = np.empty(nu, dtype=object)       # merge dir for the C class
    u_dir_ok = np.zeros(nu, dtype=bool)
    u_chain = np.empty(nu, dtype=object)     # parent dirs for the ../ class
    dotseg = re.compile(_DOTSEG_RE)
    for j, b in enumerate(uniq):
        mm = _BASE_RE.match(b)
        if mm is None or any(c <= "\x20" for c in b):
            continue
        u_ok[j] = True
        sch, netloc, bpath = mm.group(1), mm.group(2), mm.group(3)
        u_scheme[j] = sch
        u_origin[j] = sch + "://" + netloc
        u_bpath[j] = bpath
        bdir = bpath[: bpath.rfind("/") + 1]
        u_dir[j] = bdir if bpath else "/"
        u_dir_ok[j] = "//" not in bdir and not dotseg.search(bdir)
        if u_dir_ok[j]:
            chain = [u_dir[j]]  # parent-dir walk for the "../" class
            d = u_dir[j]
            while d != "/" and d:
                d = d[: d[:-1].rfind("/") + 1]
                chain.append(d or "/")
            u_chain[j] = chain
    base_ok = u_ok[codes] & live
    b_http = (u_scheme[codes] == "http").astype(bool)
    sch_same = np.where(b_http, f["sch_http"], f["sch_https"])
    sch_same_lc = np.where(b_http, f["sch_http_lc"], f["sch_https_lc"])

    clean = f["clean"] & live

    # assembly is elementwise object-array adds (numpy runs __add__ in a
    # C loop — no Python-level iteration on the hot classes)
    # 1) absolute, different scheme → verbatim (no parsing round-trip)
    m = f["absm"] & base_ok & ~sch_same & live
    # 2) absolute, same scheme (already-lowercase) → verbatim
    m |= f["absm"] & f["netloc_ok"] & base_ok & sch_same & sch_same_lc & clean
    idx = np.flatnonzero(m)
    out[idx] = hs[idx]
    # 3) scheme-relative → base scheme + ':' + href (netloc branch keeps
    #    dot segments and '//' verbatim)
    idx = np.flatnonzero(f["is_b"] & base_ok & clean)
    if len(idx):
        out[idx] = u_scheme[codes[idx]] + ":" + hs[idx]
    # 4) root-relative (no dot segments; '//' survives in this branch)
    idx = np.flatnonzero(f["is_a"] & base_ok & clean & ~f["dots"])
    if len(idx):
        out[idx] = u_origin[codes[idx]] + hs[idx]
    # 5) query-only → origin + base path (unprocessed) + href
    idx = np.flatnonzero(f["is_q"] & base_ok & clean)
    if len(idx):
        out[idx] = u_origin[codes[idx]] + u_bpath[codes[idx]] + hs[idx]
    # 6) path-relative merge (clean dirs only; '//' in either side or any
    #    dot segment → residue, the merged-segment filter would collapse)
    idx = np.flatnonzero(
        f["is_c"] & base_ok & u_dir_ok[codes] & clean & ~f["dots"] & ~f["dslash"]
    )
    if len(idx):
        out[idx] = u_origin[codes[idx]] + u_dir[codes[idx]] + hs[idx]
    # 7) leading-"../" relative: clamped parent-dir walk ('..' past the
    #    root is a no-op pop, exactly urljoin's IndexError-pass)
    upk = f["upk"]
    m = f["is_c"] & f["up_ok"] & base_ok & u_dir_ok[codes] & clean & ~f["dslash"]
    for i in np.flatnonzero(m):
        c = codes[i]
        chain = u_chain[c]
        k = int(upk[i])
        out[i] = u_origin[c] + chain[min(k, len(chain) - 1)] + hs[i][3 * k :]

    residue = live & pd.isna(out)
    if residue.any():
        from urllib.parse import urljoin

        bvals = base.to_numpy(dtype=object)
        for i in np.flatnonzero(residue):
            b = bvals[i]
            try:
                out[i] = urljoin(b if isinstance(b, str) else "", hs[i])
            except ValueError:
                out[i] = None
    return pd.Series(out, index=href.index)


def resolve_links(df: DataFrame, url_col: str = "url", href_col: str = "href") -> DataFrame:
    """RFC 3986 resolution + the engine's canonical identity, one Arrow
    hop.  Skips fragment-only, javascript:, mailto:, data: links."""
    from pyspark.sql.functions import pandas_udf

    def _resolve_fn(base, href):
        return resolve_batch(base, href)

    _resolve = pandas_udf(_resolve_fn, "string")
    resolved = df.withColumn("link", _resolve(F.col(url_col), F.col(href_col)))
    resolved = resolved.filter(F.col("link").isNotNull())
    from . import functions as CF

    return CF.with_canonical_urlfp(resolved, url_col="link")


def page_links(df: DataFrame, url_col: str, html_col: str) -> DataFrame:
    """(page url, html) → resolved canonical out-links with identities."""
    return resolve_links(extract_hrefs(df, url_col, html_col))
