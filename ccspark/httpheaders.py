"""HTTP header content-type parsing and the header-driven decode path.

* ``parse_content_type_value`` — exact port of
  HttpHeaderUtils.parseContentType(ContentTypeAndCharset, String)
  (reference HttpHeaderUtils.java:37-130), golden-gated against the
  compiled reference (.scratch/httph/GoldenCT.java).  Faithful quirks:
  the parse RESETS state per header value, so with multiple
  Content-Type headers the LAST value wins entirely (the
  originalContentType/charset-carryover branch is unreachable — reset
  precedes it), junk after the charset token up to the ';' survives,
  and a type without '/' (or "*/*" or empty) leaves both fields null.
* ``parse_content_type`` — the multi-value wrapper
  (HttpHeaderUtils.java:22-35): iterate values in order, last parse
  wins.
* ``best_effort_decode_bytes`` — CharsetUtils.bestEffortDecodeBytes
  (CharsetUtils.java:38-114) with real headers: header charset →
  meta-sniff override for text/html → jchardet detector with "ASCII"
  fallback for text types → full aliasTable → Charset.forName with the
  re-detect-on-failure path → decode with U+FFFD replacement; returns
  None where the Java returns null.

This is the ARC/WARC-record decode path (records carry HTTP headers);
the headerless ``pages``-shape adaptation lives in ccspark.text.
"""

from __future__ import annotations

from . import chardet, mime, text

_K_CHARSET = "charset="


def _skip_past_lws(s: str, pos: int) -> int:
    while pos < len(s) and s[pos] in " \t":
        pos += 1
    return pos


def _skip_to_lws_and_extra(s: str, pos: int) -> int:
    while pos < len(s) and s[pos] not in " \t;(":
        pos += 1
    return pos


def parse_content_type_value(content_type: str) -> tuple[str | None, str | None]:
    """One header value → (content_type, charset), both lowercased or None."""
    out_type: str | None = None
    out_charset: str | None = None
    type_val = min(_skip_past_lws(content_type, 0), len(content_type))
    type_end = _skip_to_lws_and_extra(content_type, type_val)

    charset_val = 0
    charset_end = 0
    type_has_charset = False
    param_start = content_type.find(";", type_end)
    if param_start != -1:
        cur = param_start + 1
        while True:
            cur_end = content_type.find(";", cur)
            if cur_end == -1:
                cur_end = len(content_type)
            name_start = min(_skip_past_lws(content_type, cur), cur_end)
            cs_off = min(name_start + len(_K_CHARSET), cur_end)
            if content_type[name_start:cs_off].lower() == _K_CHARSET:
                charset_val = name_start + len(_K_CHARSET)
                charset_end = cur_end
                type_has_charset = True
            cur = cur_end + 1
            if cur >= len(content_type):
                break
    if type_has_charset:
        charset_val = min(_skip_past_lws(content_type, charset_val), charset_end)
        if charset_val == len(content_type):
            type_has_charset = False
        else:
            first = content_type[charset_val]
            if first in "\"'":
                charset_val += 1
                charset_end = content_type.find(first, charset_val)
                if charset_end == -1:
                    charset_end = _skip_to_lws_and_extra(content_type, charset_val)
            else:
                charset_end = min(
                    _skip_to_lws_and_extra(content_type, charset_val), charset_end
                )
    if content_type and content_type != "*/*" and "/" in content_type:
        out_type = content_type[type_val:type_end].lower()
        if type_has_charset:
            out_charset = content_type[charset_val:charset_end].lower()
    return out_type, out_charset


def parse_content_type(values) -> tuple[str | None, str | None]:
    """Multi-value Content-Type resolution: last parse wins (each parse
    resets state, HttpHeaderUtils.java:22-35 + the reset at :41)."""
    ct, cs = None, None
    for v in values or ():
        if v is not None:
            ct, cs = parse_content_type_value(v)
    return ct, cs


def content_type_values(headers, key: str = "content-type") -> list[str]:
    """Extract multi-values for a header key (case-insensitive) from an
    ARC-record header list (sequence of (key, value) pairs or dicts)."""
    out = []
    for h in headers or ():
        k = h["key"] if isinstance(h, dict) else h[0]
        v = h["value"] if isinstance(h, dict) else h[1]
        if k is not None and k.lower() == key:
            out.append(v)
    return out


def best_effort_decode_bytes(headers, data: bytes | None) -> str | None:
    """CharsetUtils.bestEffortDecodeBytes (CharsetUtils.java:38-114)."""
    ct, cs = parse_content_type(content_type_values(headers))

    if cs is not None and data is not None:
        if ct is not None and ct.lower() == "text/html":
            alt = text.sniff_charset(bytes(data))
            if alt is not None:
                cs = alt
    if cs is None and data is not None:
        if ct is not None and mime.is_text_type_scalar(ct):
            detected = chardet.detect_character_encoding(bytes(data))
            cs = detected if detected is not None else "ASCII"
    if cs is not None:
        cs = chardet.alias_charset(cs)
    if cs is not None and data is not None:
        out = chardet.decode_as_java(bytes(data), cs)
        if out is None:
            detected = chardet.detect_character_encoding(bytes(data))
            if detected is not None:
                out = chardet.decode_as_java(bytes(data), chardet.alias_charset(detected))
        return out
    return None
