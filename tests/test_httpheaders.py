"""Content-Type parse + header-driven decode path.

Golden vectors from the compiled reference parseContentType
(.scratch/httph/GoldenCT.java, verbatim HttpHeaderUtils.java:37-130).
"""

import pytest

from ccspark import httpheaders as HH

CT_GOLDEN = [
    ("text/html", "text/html", None),
    ("text/html; charset=utf-8", "text/html", "utf-8"),
    ("  text/html ; charset=UTF-8 ", "text/html", "utf-8"),
    ("text/html;charset=iso-8859-1", "text/html", "iso-8859-1"),
    ('text/html; charset="utf-8"', "text/html", "utf-8"),
    ("text/html; charset='shift_jis'", "text/html", "shift_jis"),
    ("text/html; charset=", "text/html", None),
    ("text/html; charset= ", "text/html", None),
    ("text/html; boundary=x; charset=utf-8", "text/html", "utf-8"),
    ("text/html; charset=utf-8; boundary=x", "text/html", "utf-8"),
    ("*/*", None, None),
    ("", None, None),
    ("junk", None, None),
    ("text/html (comment); charset=x", "text/html", "x"),
    ("text/html; CHARSET=UTF-8", "text/html", "utf-8"),
    ("text/html ;\tcharset=win-1252", "text/html", "win-1252"),
    ("text/html; charset=utf-8,text/plain", "text/html", "utf-8,text/plain"),
    ("application/xhtml+xml;charset=euc-kr", "application/xhtml+xml", "euc-kr"),
    ("text/", "text/", None),
    ("/html", "/html", None),
    ("text / html", "text", None),
    ("text/html; charst=utf8", "text/html", None),
    ('text/html; charset="unclosed', "text/html", "unclosed"),
    ("text/html; charset='a'b", "text/html", "a"),
    ("video/mp4; charset=utf-8", "video/mp4", "utf-8"),
    ("text/html; charset=utf-8(x)", "text/html", "utf-8"),
    ("text/html;; charset=utf-8", "text/html", "utf-8"),
    ("text/html; ; charset=utf-8", "text/html", "utf-8"),
]


@pytest.mark.parametrize("value,want_ct,want_cs", CT_GOLDEN)
def test_parse_content_type_golden(value, want_ct, want_cs):
    assert HH.parse_content_type_value(value) == (want_ct, want_cs)


def test_multi_value_last_wins():
    # each per-value parse resets state — the reference's carryover
    # branch is unreachable, so the LAST value determines everything
    assert HH.parse_content_type(
        ["text/html; charset=utf-8", "text/plain"]
    ) == ("text/plain", None)
    assert HH.parse_content_type(["text/html; charset=utf-8", "junk"]) == (None, None)
    assert HH.parse_content_type([]) == (None, None)
    assert HH.parse_content_type(None) == (None, None)


def test_best_effort_decode_header_charset():
    headers = [("Content-Type", "text/plain; charset=shift_jis")]
    data = "テキスト".encode("shift_jis")
    # aliasTable: shift_jis -> x-IBM943 (cp932 + 5C/7E fixup)
    assert HH.best_effort_decode_bytes(headers, data) == "テキスト"


def test_best_effort_decode_meta_overrides_header_for_html():
    body = (
        '<html><head><meta http-equiv="Content-Type" '
        'content="text/html; charset=euc-kr"></head><body>한국어</body></html>'
    )
    data = body.encode("euc_kr")
    headers = [("Content-Type", "text/html; charset=iso-8859-1")]
    out = HH.best_effort_decode_bytes(headers, data)
    assert "한국어" in out
    # but a non-html type does NOT sniff: decodes with the header charset
    headers2 = [("Content-Type", "text/plain; charset=iso-8859-1")]
    out2 = HH.best_effort_decode_bytes(headers2, data)
    assert "한국어" not in out2


def test_best_effort_decode_no_charset_detector_path():
    data = b"plain ascii body " * 20
    headers = [("Content-Type", "text/plain")]
    out = HH.best_effort_decode_bytes(headers, data)
    assert out == data.decode("ascii")
    # binary type -> charset stays null -> Java returns null
    assert HH.best_effort_decode_bytes([("Content-Type", "image/png")], data) is None
    # no headers at all -> null
    assert HH.best_effort_decode_bytes([], data) is None


def test_best_effort_decode_bad_charset_redetects():
    headers = [("Content-Type", "text/plain; charset=not-a-charset")]
    data = b"ascii payload " * 10
    # forName fails -> re-detect -> ASCII -> decodes
    assert HH.best_effort_decode_bytes(headers, data) == data.decode("ascii")
