"""Golden tests for the faithful jchardet port (ccspark.chardet).

Expected values were produced by compiling the reference's own bundled
Mozilla chardet (org/mozilla/intl/chardet/*.java) plus a verbatim copy of
CharsetUtils.detectCharacterEncoding (CharsetUtils.java:190-226) in
.scratch/jchardet/GoldenCharset.java and running it over these exact
fixture bytes.  The port must match the reference bit-for-bit — including
the reference's DoIt-return-assigned-to-isAscii quirk, under which most
legacy CJK pages detect as "ASCII" and only DataEnd-stage detections
(GB18030-pair rule, sampler last chance) surface real charset names.
"""

import random

import pytest

from ccspark import chardet, text


def _fixtures() -> dict[str, bytes]:
    rnd = random.Random(42)
    fx = {}

    def page(txt, enc, bom=b""):
        body = f"<html><head><title>t</title></head><body><p>{txt}</p></body></html>"
        return bom + body.encode(enc, errors="ignore")

    jp = "私は日本語のページです。東京の天気は晴れ、桜が咲いています。" * 30
    kr = "이 문서는 한국어로 작성되었습니다. 서울의 날씨는 맑음입니다." * 30
    zh_s = "这是一个简体中文网页。北京今天天气晴朗，气温适宜。" * 30
    zh_t = "這是一個繁體中文網頁。台北今天天氣晴朗，氣溫宜人。" * 30
    ru = "Это страница на русском языке. Погода в Москве солнечная." * 30
    fr = "Cette page est en français — élégante, naïve, déjà vu. ünïcodé " * 30

    fx["sjis"] = page(jp, "shift_jis")
    fx["eucjp"] = page(jp, "euc_jp")
    fx["euckr"] = page(kr, "euc_kr")
    fx["gb2312"] = page(zh_s, "gb2312")
    fx["big5"] = page(zh_t, "big5")
    fx["cp1251"] = page(ru, "cp1251")
    fx["utf8"] = page(fr, "utf-8")
    fx["ascii"] = page("plain ascii page with nothing special at all. " * 50, "ascii")
    fx["iso2022jp"] = page("私は日本語のページです。" * 30, "iso2022_jp")
    fx["sjis_short"] = page("日本語テキスト", "shift_jis")
    fx["euckr_short"] = page("한국어", "euc_kr")
    fx["latin1_hi"] = page("café résumé naïve " * 40, "latin-1")
    fx["utf16le_bom"] = page("hello utf16 world " * 20, "utf-16-le", bom=b"\xff\xfe")

    fx["binary_rand"] = bytes(rnd.randrange(256) for _ in range(4000))
    fx["one_high_byte"] = b"mostly ascii " * 100 + b"\xe9" + b" tail ascii" * 50
    fx["utf8_bom"] = b"\xef\xbb\xbf" + ("héllo wörld " * 100).encode("utf-8")
    fx["utf16be_bom"] = b"\xfe\xff" + ("hello utf16 " * 50).encode("utf-16-be")
    fx["sjis_katakana"] = ("ﾃｽﾄﾃﾞｰﾀ ｶﾀｶﾅ " * 80).encode("shift_jis")
    fx["gb18030_4byte"] = ("𠀀𠀁 中文 " * 60).encode("gb18030")
    fx["hz_page"] = b"~{<:Ky2;S{#,NpJ)l6HK!#~}" * 40
    fx["euckr_long"] = (
        "대한민국 서울특별시 강남구 테헤란로. 한글 텍스트 문서입니다. " * 100
    ).encode("euc_kr")
    fx["gb2312_long"] = ("中华人民共和国北京市朝阳区。这是简体中文文本。" * 100).encode("gb2312")
    fx["big5_long"] = ("中華民國台北市信義區。這是繁體中文文字。" * 100).encode("big5")
    fx["truncated_utf8"] = ("完整的文本" * 50).encode("utf-8")[:-1]
    fx["cp1252_smart"] = ("smart \x93quotes\x94 and \x97dashes\x85 " * 60).encode("latin-1")
    fx["iso2022kr"] = ("한국어 텍스트 " * 40).encode("iso2022_kr")
    fx["eucjp_long"] = ("日本語の長い文書です。東京、大阪、京都。" * 120).encode("euc_jp")
    fx["mixed_ascii_sjis"] = (
        b"<html><body>" + ("日本語" * 100).encode("shift_jis") + b"</body></html>"
    )
    return fx


# (fixture -> compiled-reference detectCharacterEncoding output)
GOLDEN = {
    "sjis": "UTF-16LE",
    "eucjp": "ASCII",
    "euckr": "ASCII",
    "gb2312": "ASCII",
    "big5": "UTF-16LE",
    "cp1251": "ASCII",
    "utf8": "UTF-8",
    "ascii": "ASCII",
    "iso2022jp": "ASCII",
    "sjis_short": "UTF-16LE",
    "euckr_short": "windows-1252",
    "latin1_hi": "ASCII",
    "utf16le_bom": "ASCII",
    "binary_rand": "ASCII",
    "one_high_byte": "ASCII",
    "utf8_bom": "UTF-8",
    "utf16be_bom": "ASCII",
    "sjis_katakana": "ASCII",
    "gb18030_4byte": "ASCII",
    "hz_page": "ASCII",
    "euckr_long": "ASCII",
    "gb2312_long": "ASCII",
    "big5_long": "UTF-16LE",
    "truncated_utf8": "UTF-8",
    "cp1252_smart": "ASCII",
    "iso2022kr": "ASCII",
    "eucjp_long": "ASCII",
    "mixed_ascii_sjis": "UTF-16LE",
}

_FX = _fixtures()


@pytest.mark.parametrize("name", sorted(GOLDEN))
def test_detect_matches_compiled_reference(name):
    assert chardet.detect_character_encoding(_FX[name]) == GOLDEN[name]


def test_detect_empty_and_none():
    assert chardet.detect_character_encoding(None) is None
    assert chardet.detect_character_encoding(b"") is None


def test_alias_table_full():
    # spot checks against CharsetUtils.java aliasTable entries
    assert chardet.alias_charset("sjis") == "Shift_JIS"
    assert chardet.alias_charset("shift_jis") == "x-IBM943"
    assert chardet.alias_charset("euc-jp") == "x-JISAutoDetect"
    assert chardet.alias_charset("EUC-KR") == "EUC-KR"
    assert chardet.alias_charset("latin1") == "ISO-8859-1"
    assert chardet.alias_charset("ansi_x3.4-1968") == "US-ASCII"
    assert chardet.alias_charset("no-such-charset") == "no-such-charset"
    from ccspark.data.charset_aliases import ALIAS_TABLE

    assert len(ALIAS_TABLE) == 707


def test_decode_as_java_ibm943_fixup():
    # x-IBM943 maps 0x5C -> yen, 0x7E -> overline
    out = chardet.decode_as_java(b"a\x5cb\x7ec", "x-IBM943")
    assert out == "a¥b‾c"
    # while plain Shift_JIS keeps backslash/tilde
    out2 = chardet.decode_as_java(b"a\x5cb\x7ec", "Shift_JIS")
    assert out2 == "a\\b~c"


def test_decode_as_java_unresolvable():
    # x-euc-tw used to be a documented None divergence; it now decodes
    # through the cjkext EUC-TW port (ASCII passes through)
    assert chardet.decode_as_java(b"abc", "x-euc-tw") == "abc"
    assert chardet.decode_as_java(b"abc", "nomatch") is None
    assert chardet.decode_as_java(b"abc", "IBM-Thai") is None  # no cp838


def test_decode_html_meta_tag_wins_over_detector():
    body = "<html><head><meta http-equiv=\"Content-Type\" content=\"text/html; charset=shift_jis\"></head><body>日本語</body></html>"
    raw = body.encode("shift_jis")
    out, truncated = text.decode_html(raw)
    assert not truncated
    assert "日本語" in out


def test_decode_html_headerless_legacy_matches_reference_quirk():
    # no meta tag: detector says ASCII for EUC-KR text (reference quirk),
    # so high bytes decode to U+FFFD — byte-identical with the reference
    raw = ("한국어 텍스트 " * 40).encode("euc_kr")
    out, _ = text.decode_html(raw)
    assert "�" in out
    assert all(ord(c) < 0x80 or c == "�" for c in out)


def test_decode_html_utf8_detected():
    raw = ("unicode snowman ☃ " * 50).encode("utf-8")
    detected = chardet.detect_character_encoding(raw)
    out, _ = text.decode_html(raw)
    if detected == "UTF-8":
        assert "☃" in out


def test_batch_matches_scalar_on_goldens():
    names = sorted(GOLDEN)
    got = chardet.detect_batch([_FX[n] for n in names])
    for n, g in zip(names, got):
        assert g == GOLDEN[n], n
        assert g == chardet.detect_character_encoding(_FX[n]), n


def test_batch_matches_scalar_fuzz():
    """Random byte soups + structured legacy-encoding payloads: the
    vectorized batch detector must be bit-identical to the scalar port."""
    import random

    rnd = random.Random(99)
    cases: list[bytes | None] = [None, b"", b"plain ascii only"]
    # random soups biased toward high bytes (exercise verifier deaths,
    # ITSME, the items<=1 path, sampler violations)
    for _ in range(120):
        n = rnd.randrange(1, 400)
        cases.append(bytes(rnd.randrange(0, 256) for _ in range(n)))
    # valid legacy payloads (exercise the sampler scoring + GB18030 rule)
    texts = ["漢字テスト" * 40, "한국어 텍스트 " * 40, "中文测试内容" * 40]
    for enc in ("shift_jis", "euc_jp", "euc_kr", "gb2312", "big5", "utf-8", "utf-16-le"):
        for t in texts:
            try:
                cases.append(("<html>" + t + "</html>").encode(enc, errors="ignore"))
            except LookupError:
                pass
    # long docs crossing the 16000-byte truncation boundary
    cases.append(("x" * 15990 + "漢字だよ").encode("euc_jp"))
    cases.append(b"\xa1\xa1" * 9000)
    got = chardet.detect_batch(cases)
    for i, c in enumerate(cases):
        want = chardet.detect_character_encoding(c)
        assert got[i] == want, (i, want, got[i], (c or b"")[:40])


def test_cjkext_fuzz_goldens():
    """x-IBM964 / ISO-2022-CN decoders byte-identical to the JVM's own
    (8030 fuzz vectors incl. random soups, structured escapes,
    truncations — .scratch/cjk/FuzzCJK.java)."""
    import os

    from ccspark import cjkext

    path = os.path.join(os.path.dirname(__file__), "data", "cjk_fuzz.tsv")
    n = 0
    for line in open(path, encoding="ascii"):
        name, h, v = line.rstrip("\n").split("\t")
        data = bytes.fromhex(h)
        want = "".join(chr(int(x, 16)) for x in v.split(",")) if v else ""
        got = (
            cjkext.decode_euc_tw(data)
            if name == "964"
            else cjkext.decode_iso2022_cn(data)
        )
        assert got == want, (name, h, v)
        n += 1
    assert n == 8030


def test_decode_as_java_cjk_charsets():
    """The CharsetUtils.decode path now resolves the two formerly-None
    Java-only charsets to real text."""
    # EUC-TW: plane-1 pair A4A1 = 一 (U+4E00 in CNS 11643 plane 1? use
    # round-trip-free spot values from the extracted tables instead)
    assert chardet.decode_as_java(b"\xa1\xa1", "x-IBM964") == "　"
    assert chardet.decode_as_java(b"\xa1\xa1", "x-euc-tw") == "　"
    assert chardet.decode_as_java(b"\x8e\xa2\xa1\xa1", "x-IBM964") == "乂"
    got = chardet.decode_as_java(b"\x1b$)A\x0e\x30\x21\x0f", "ISO-2022-CN")
    assert got == "啊"  # GB2312 B0A1
    assert chardet.decode_as_java(b"\x1bN\x21\x23", "ISO-2022-CN") == "凵"
