"""resolve_batch parity fuzz: the vectorized RFC 3986 resolver must be
indistinguishable from the per-row urljoin policy loop on a hostile
href grid (dot segments, '//' collapse, empty query/fragment edges,
control characters, exotic schemes, weird bases)."""

import random

import numpy as np
import pandas as pd
import pytest

from ccspark.links import _SKIP_PREFIXES, resolve_batch

BASES = [
    "http://example.com/a/b/c.html",
    "https://example.com/a/b/",
    "http://example.com",
    "http://example.com/",
    "http://example.com/a//b/c",
    "http://example.com/a/./b/x",
    "http://example.com/a/../b",
    "http://example.com/a/b?q=1#frag",
    "http://user:pw@example.com:8080/a/b",
    "HTTP://EXAMPLE.COM/a/b",  # non-lowercase base scheme → residue
    "ftp://example.com/a/b",
    "//example.com/a",
    "example.com/a",
    "http://example.com/\ta/b",  # control char in base
    "",
]

HREFS = [
    # skips
    "", "   ", "#", "#frag", "javascript:void(0)", "MAILTO:x@y", "data:text/plain,x",
    "tel:+1-555", "JavaScript:alert(1)",
    # absolute, same scheme
    "http://other.com/x", "http://other.com/x?q=2#f", "http://other.com",
    "http://other.com/x/../y", "http://other.com//x", "http://other.com/x?",
    "http://other.com/x#", "http://other.com/x?#f", "Http://other.com/x",
    "http://", "http://?q", "http:///x",
    # absolute, different scheme
    "https://other.com/x", "ftp://other.com/x", "FTP://other.com/x",
    "gopher://x/y", "wss://x/y?a#b",
    # scheme-relative
    "//cdn.com/x.js", "//cdn.com", "//cdn.com/x/../y", "//cdn.com//x",
    "//", "///x", "//?q", "//cdn.com/x?", "//cdn.com/x#",
    # root-relative
    "/x/y", "/x/y?q=1#f", "/", "/x/../y", "/./x", "/..", "/x//y", "/x/y?",
    "/x/y#", "/x?#f",
    # query-only
    "?q=1", "?q=1#f", "?", "?#f", "??a",
    # path-relative
    "x", "x/y", "x/y/", "./x", "../x", "x/../y", "x//y", "x/y?q#f", "x?",
    "x#", "x?#f", "x;params", "a:b", "a/b:c", "x%20y", "x y",
    # control characters / whitespace
    "\tx", "x\ty", "x\ny", "\x01/x", "/x\r", " /x ", "http://o.com/\tx",
    # unicode
    "/é", "café/中文", "http://other.com/é",
]


def _reference(base, href):
    """The original per-row policy loop (pre-vectorization semantics)."""
    from urllib.parse import urljoin

    h = (href or "").strip()
    low = h.lower()
    if not h or h.startswith("#") or low.startswith(_SKIP_PREFIXES):
        return None
    try:
        return urljoin(base or "", h)
    except ValueError:
        return None


def test_resolve_batch_parity_grid():
    rows = [(b, h) for b in BASES for h in HREFS]
    base = pd.Series([r[0] for r in rows])
    href = pd.Series([r[1] for r in rows])
    got = resolve_batch(base, href)
    for i, (b, h) in enumerate(rows):
        exp = _reference(b, h)
        assert got[i] == exp or (got[i] is None and exp is None), (
            f"base={b!r} href={h!r}: got {got[i]!r}, want {exp!r}"
        )


def test_resolve_batch_parity_random_compositions():
    """Random compositions of hostile path fragments: catches mask
    interactions the grid misses."""
    rng = random.Random(1234)
    frags = ["a", "b.c", "..", ".", "", "x y", "%7e", "é", "a:b"]
    pre = ["", "/", "//", "./", "../", "http://h.com/", "https://h.com/", "?", "#", "//h.com/"]
    suf = ["", "?q=1", "#f", "?", "#", "?#f", "/"]
    rows = []
    for _ in range(3000):
        b = rng.choice(BASES)
        h = (
            rng.choice(pre)
            + "/".join(rng.choice(frags) for _ in range(rng.randint(0, 4)))
            + rng.choice(suf)
        )
        rows.append((b, h))
    base = pd.Series([r[0] for r in rows])
    href = pd.Series([r[1] for r in rows])
    got = resolve_batch(base, href)
    for i, (b, h) in enumerate(rows):
        exp = _reference(b, h)
        assert got[i] == exp or (got[i] is None and exp is None), (
            f"base={b!r} href={h!r}: got {got[i]!r}, want {exp!r}"
        )


def test_resolve_batch_vector_coverage():
    """On a realistic crawl href mix the residue loop must be a sliver —
    that is the performance contract of the vectorization."""
    rng = random.Random(7)
    hrefs = []
    for _ in range(5000):
        r = rng.random()
        if r < 0.35:
            hrefs.append(f"/section{rng.randint(0, 99)}/page{rng.randint(0, 999)}.html")
        elif r < 0.65:
            hrefs.append(f"http://site{rng.randint(0, 99)}.com/p/{rng.randint(0, 999)}")
        elif r < 0.80:
            hrefs.append(f"article{rng.randint(0, 999)}.html?ref=home")
        elif r < 0.90:
            hrefs.append(f"//cdn{rng.randint(0, 9)}.com/asset/{rng.randint(0, 99)}.js")
        elif r < 0.97:
            hrefs.append(f"?page={rng.randint(0, 99)}")
        else:
            hrefs.append(f"../up/{rng.randint(0, 99)}")  # residue class
    base = pd.Series(["http://example.com/a/b/c.html"] * len(hrefs))
    href = pd.Series(hrefs)

    # count residue rows by instrumenting the reference fallback
    import ccspark.links as L

    calls = {"n": 0}
    import urllib.parse as up

    orig = up.urljoin

    def counting(b, h):
        calls["n"] += 1
        return orig(b, h)

    up.urljoin = counting
    try:
        got = resolve_batch(base, href)
    finally:
        up.urljoin = orig
    # parity still holds on the mix
    for i in range(len(hrefs)):
        assert got[i] == _reference(base[i], href[i])
    assert calls["n"] <= 0.05 * len(hrefs), f"residue too large: {calls['n']}/{len(hrefs)}"
