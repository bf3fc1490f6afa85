"""Charset detection, HTML decoding and text extraction.

Re-expresses the reference's charset pipeline
(util/shared/CharsetUtils.java:38-114) for the ``pages`` input shape
(url, warc_ts, html:binary, text, lang) where no HTTP headers exist:

1. gzip best-effort inflate when the payload starts with the gzip magic
   (GZIPUtils.unzipBestEffort semantics, util/shared/GZIPUtils.java:56-114:
   decode as much as possible, flag truncation, never throw).
2. ``<meta http-equiv="content-type" ... charset=...>`` sniff over the
   first 2000 bytes, matched against an ASCII-padded view
   (CharsetUtils.sniffCharacterEncoding:142-172, CHUNK_SIZE=2000).
3. deterministic detector stand-in for jchardet
   (CharsetUtils.detectCharacterEncoding:190-226): pure-ASCII → ASCII;
   valid UTF-8 → UTF-8; else windows-1252.  (The Mozilla chardet stack
   is replaced by this total order so results are reproducible.)
4. charset alias normalization (CharsetUtils.aliasTable subset) and
   decode with U+FFFD replacement (Java Charset.decode default).

``extract_text`` additionally strips markup deterministically (tags
removed, entity-free synthetic corpus) so the generator's text column
round-trips byte-identically — the BASELINE input_hint invariant.

All entry points are batch (pandas in / pandas out) for mapInPandas use.
"""

from __future__ import annotations

import re
import zlib

import numpy as np
import pandas as pd

_GZIP_MAGIC = b"\x1f\x8b"
_CHUNK_SIZE = 2000
_MAX_UNZIP = 2 << 20  # GZIPUtils call site in the ARC writer uses 2MB

_META_RE = re.compile(rb"<meta\s+([^>]*http-equiv=\"?content-type\"?[^>]*)>", re.IGNORECASE)
_CHARSET_RE = re.compile(rb"charset=\s*([a-z][_\-0-9a-z]*)", re.IGNORECASE)

# subset of CharsetUtils.aliasTable covering charsets a crawl actually sees,
# mapped to Python codec names
_ALIASES = {
    "ascii": "ascii",
    "us-ascii": "ascii",
    "ansi_x3.4-1968": "ascii",
    "iso646-us": "ascii",
    "utf-8": "utf-8",
    "utf8": "utf-8",
    "cp1208": "utf-8",
    "windows-65001": "utf-8",
    "iso-8859-1": "latin-1",
    "latin1": "latin-1",
    "8859_1": "latin-1",
    "l1": "latin-1",
    "cp819": "latin-1",
    "iso-8859-2": "iso8859-2",
    "latin2": "iso8859-2",
    "iso-8859-15": "iso8859-15",
    "latin-9": "iso8859-15",
    "windows-1250": "cp1250",
    "cp1250": "cp1250",
    "windows-1251": "cp1251",
    "cp1251": "cp1251",
    "windows-1252": "cp1252",
    "cp1252": "cp1252",
    "shift_jis": "shift_jis",
    "sjis": "shift_jis",
    "x-sjis": "shift_jis",
    "euc-jp": "euc_jp",
    "euc-kr": "euc_kr",
    "ks_c_5601-1987": "euc_kr",
    "gb2312": "gb2312",
    "gbk": "gbk",
    "big5": "big5",
    "koi8-r": "koi8_r",
    "utf-16": "utf-16",
    "unicode": "utf-16",
    "utf-16be": "utf-16-be",
    "utf-16le": "utf-16-le",
}


def alias_charset(name: str) -> str:
    """Normalize a sniffed/declared charset name to a Python codec."""
    key = name.strip().lower()
    return _ALIASES.get(key, key)


def unzip_best_effort(data: bytes, size_limit: int = _MAX_UNZIP) -> tuple[bytes, bool]:
    """GZIPUtils.unzipBestEffort: inflate as much as possible.

    Returns (data, was_truncated).  Corrupt/short streams yield the bytes
    recovered before the error; output is capped at ``size_limit`` with
    the truncated flag set."""
    d = zlib.decompressobj(wbits=16 + zlib.MAX_WBITS)
    try:
        out = d.decompress(data, size_limit)
        truncated = bool(d.unconsumed_tail)
        if not truncated and not d.eof:
            # stream ended early — keep what we decoded, flag it
            truncated = True
        return out, truncated
    except zlib.error:
        return b"", True


def sniff_charset(content: bytes) -> str | None:
    """Meta-tag charset sniff over the first 2000 bytes (ASCII-padded)."""
    chunk = content[:_CHUNK_SIZE]
    m = _META_RE.search(chunk)
    if m:
        cm = _CHARSET_RE.search(m.group(1))
        if cm:
            return cm.group(1).decode("ascii", "replace")
    return None


def detect_charset(content: bytes) -> str:
    """Deterministic detector stand-in (see module docstring)."""
    probe = content[:16000]
    try:
        probe.decode("ascii")
        return "ascii"
    except UnicodeDecodeError:
        pass
    try:
        probe.decode("utf-8")
        return "utf-8"
    except UnicodeDecodeError:
        return "windows-1252"


def decode_html(raw: bytes | None) -> tuple[str | None, bool]:
    """Full decode pipeline → (unicode_html, was_truncated)."""
    if raw is None:
        return None, False
    truncated = False
    data = bytes(raw)
    if data[:2] == _GZIP_MAGIC:
        data, truncated = unzip_best_effort(data)
    charset = sniff_charset(data)
    codec = alias_charset(charset) if charset else detect_charset(data)
    try:
        return data.decode(codec, errors="replace"), truncated
    except LookupError:
        return data.decode(detect_charset(data), errors="replace"), truncated


_TAG_RE = re.compile(r"<[^>]*>|<[^>]*$")
_WS_RE = re.compile(r"\s+")


def strip_markup(html: str) -> str:
    """Deterministic markup strip: drop tags (incl. a trailing unclosed
    tag from truncated payloads), collapse whitespace runs, trim."""
    return _WS_RE.sub(" ", _TAG_RE.sub(" ", html)).strip()


def extract_text(raw: bytes | None) -> str | None:
    html, _ = decode_html(raw)
    if html is None:
        return None
    return strip_markup(html)


def extract_text_batch(html: pd.Series) -> pd.Series:
    """Vectorized-batch text extraction (decode loop is per-document by
    nature — codec calls are C-level; no Python inner loops)."""
    return html.map(extract_text)


def decode_batch(html: pd.Series) -> pd.DataFrame:
    out = [decode_html(h) for h in html]
    return pd.DataFrame(
        {
            "html_text": [t for t, _ in out],
            "truncated": np.array([tr for _, tr in out], dtype=bool),
        },
        index=html.index,
    )
