"""Golden tests for the full MimeTypeFilter port (ccspark.mime).

Expected values were produced by compiling the reference's own
MimeTypeFilter.java + Trie/Prefix/SuffixStringMatcher and running
checkMimeTypeDisposition / isTextType / isValidHTMLType over these
inputs (.scratch/mime/GoldenMime.java)."""

import pandas as pd
import pytest

from ccspark import mime

GOLDEN = [
    (None, 'ACCEPT_OTHER', False, False),
    ('', 'ACCEPT_OTHER', False, False),
    ('text/html', 'ACCEPT_HTML', True, True),
    ('text/html; charset=utf-8', 'ACCEPT_HTML', True, True),
    ('TEXT/HTML', 'ACCEPT_HTML', True, True),
    ('application/xhtml+xml', 'ACCEPT_HTML', True, True),
    ('application/rdf+xml', 'ACCEPT_TEXT', True, False),
    ('application/rss+xml', 'ACCEPT_TEXT', True, False),
    ('application/atom+xml', 'ACCEPT_TEXT', True, False),
    ('application/json', 'ACCEPT_TEXT', True, False),
    ('application/javascript', 'ACCEPT_TEXT', True, False),
    ('application/x-javascript', 'ACCEPT_TEXT', True, False),
    ('application/pdf', 'ACCEPT_TEXT', True, False),
    ('application/octet-stream', 'REJECT', False, False),
    ('image/png', 'REJECT', False, False),
    ('image/jpeg', 'REJECT', False, False),
    ('audio/mpeg', 'REJECT', False, False),
    ('video/mp4', 'REJECT', False, False),
    ('binary/octet-stream', 'REJECT', False, False),
    ('text/vnd.wap.wml', 'ACCEPT_TEXT', True, False),
    ('text/x-c++src', 'ACCEPT_TEXT', True, False),
    ('text/csv', 'ACCEPT_TEXT', True, False),
    ('text/css', 'ACCEPT_TEXT', True, False),
    ('application/vnd.ms-excel', 'ACCEPT_OTHER', False, False),
    ('application/msword', 'ACCEPT_OTHER', False, False),
    ('application/x-tar', 'ACCEPT_OTHER', False, False),
    ('application/x-shockwave-flash', 'ACCEPT_OTHER', False, False),
    ('application/vnd.oasis.opendocument.text', 'ACCEPT_TEXT', True, False),
    ('application/vnd.google-earth.kml+xml', 'ACCEPT_TEXT', True, False),
    ('application/zip', 'REJECT', False, False),
    ('application/x-gzip', 'REJECT', False, False),
    ('application/vnd.wap.xhtml+xml', 'ACCEPT_TEXT', True, False),
    ('application/x-httpd-php', 'ACCEPT_TEXT', True, False),
    ('application/xml-dtd', 'ACCEPT_TEXT', True, False),
    ('application/x-latex', 'ACCEPT_OTHER', False, False),
    ('chemical/x-pdb', 'REJECT', False, False),
    ('plugin/whatever', 'REJECT', False, False),
    ('message/rfc822', 'ACCEPT_TEXT', True, False),
    ('multipart/form-data', 'ACCEPT_TEXT', True, False),
    ('  text/html  ', 'ACCEPT_HTML', True, True),
    ('\ttext/html', 'ACCEPT_HTML', True, True),
    ('text/html;;;', 'ACCEPT_HTML', True, True),
    ('no-type', 'REJECT', False, False),
    ('text', 'ACCEPT_TEXT', True, False),
    ('html', 'ACCEPT_HTML', True, True),
    ('application', 'REJECT', False, False),
    ('application/', 'REJECT', False, False),
    ('/html', 'ACCEPT_HTML', True, True),
    ('text/', 'ACCEPT_TEXT', True, False),
    ('foo/bar', 'REJECT', False, False),
    ('application/foo+xml', 'ACCEPT_TEXT', True, False),
    ('application/x-foo', 'REJECT', False, False),
    ('application/vnd.foo', 'REJECT', False, False),
    ('text/plain; charset=iso-8859-1', 'ACCEPT_TEXT', True, False),
    ('Text/Plain', 'ACCEPT_TEXT', True, False),
    ('x-epoc/x-sisx-app', 'REJECT', False, False),
    ('true-type/font', 'REJECT', False, False),
    ('file/unknown', 'REJECT', False, False),
    ('octet/stream', 'REJECT', False, False),
    ('plain/text', 'ACCEPT_TEXT', True, False),
    ('application/xhtml', 'ACCEPT_HTML', True, True),
    ('application/html', 'ACCEPT_HTML', True, True),
    ('application/x-msaccess', 'ACCEPT_OTHER', False, False),
    ('application/vnd.ms-powerpoint', 'ACCEPT_OTHER', False, False),
    ('application/mspowerpoint', 'ACCEPT_OTHER', False, False),
    ('application/vnd.ms-works', 'ACCEPT_TEXT', True, False),
    ('application/x-perl', 'ACCEPT_TEXT', True, False),
    ('application/x-ruby', 'ACCEPT_TEXT', True, False),
    ('application/x-python', 'REJECT', False, False),
    ('application/py', 'ACCEPT_TEXT', True, False),
    ('application/x-sh', 'REJECT', False, False),
    ('application/postscript', 'ACCEPT_TEXT', True, False),
    ('application/x-dvi', 'REJECT', False, False),
    ('application/rtf', 'ACCEPT_TEXT', True, False),
    ('application/x-rtf', 'ACCEPT_TEXT', True, False),
    ('application/vcard+json', 'ACCEPT_TEXT', True, False),
    ('application/ld+json', 'ACCEPT_TEXT', True, False),
    ('text/x-php', 'ACCEPT_TEXT', True, False),
    ('text/x-java-source', 'ACCEPT_TEXT', True, False),
    ('application/x-cc', 'ACCEPT_TEXT', True, False),
    ('application/x-h', 'ACCEPT_TEXT', True, False),
    ('application/doc', 'ACCEPT_TEXT', True, False),
    ('application/x-doc', 'ACCEPT_TEXT', True, False),
    ('application/word-doc', 'ACCEPT_TEXT', True, False),
    ('application/x-word-doc', 'ACCEPT_TEXT', True, False),
    ('application/acrobat', 'ACCEPT_TEXT', True, False),
    ('application/x-acrobat', 'ACCEPT_TEXT', True, False),
    ('text/xml+html', 'ACCEPT_HTML', True, True),
    ('text/foo+xhtml', 'ACCEPT_HTML', True, True),
    ('application/xhtml+xml; charset=UTF-8', 'ACCEPT_HTML', True, True),
    ('application/exe', 'REJECT', False, False),
    ('application/x-exe', 'REJECT', False, False),
    ('application/gif', 'REJECT', False, False),
    ('text/gif', 'ACCEPT_TEXT', True, False),
    ('image', 'REJECT', False, False),
    ('audio', 'REJECT', False, False),
    ('video', 'REJECT', False, False),
    ('text/mp3', 'ACCEPT_TEXT', True, False),
    ('application/mp3', 'REJECT', False, False),
    ('video/x-flv', 'REJECT', False, False),
    ('application/x-cab', 'REJECT', False, False),
    ('application/vnd.ms-htmlhelp', 'ACCEPT_OTHER', False, False),
    ('application/winhlp', 'ACCEPT_OTHER', False, False),
    ('application/x-lotus', 'ACCEPT_OTHER', False, False),
    ('application/xls', 'ACCEPT_OTHER', False, False),
    ('application/x-xls', 'ACCEPT_OTHER', False, False),
    ('-text/html', 'ACCEPT_HTML', True, True),
    ('..application/pdf', 'ACCEPT_TEXT', True, False),
    ('123/456', 'REJECT', False, False),
    ('text/123', 'ACCEPT_TEXT', True, False),
    ('application/vnd.openxmlformats-officedocument.wordprocessingml.document', 'REJECT', False, False),
    ('application/vnd.oasis.opendocument.spreadsheet', 'ACCEPT_OTHER', False, False),
    ('application/keyhole', 'ACCEPT_OTHER', False, False),
    ('application/x-httpd-php-source', 'ACCEPT_TEXT', True, False),
    ('application/texinfo', 'ACCEPT_TEXT', True, False),
    ('application/x-tex', 'ACCEPT_TEXT', True, False),
    ('application/dot', 'ACCEPT_TEXT', True, False),
    ('application/x-dot', 'ACCEPT_TEXT', True, False),
    ('application/mscardfile', 'ACCEPT_TEXT', True, False),
    ('application/x-server-parsed-html', 'ACCEPT_TEXT', True, False),
    ('application/tex', 'ACCEPT_TEXT', True, False),
    ('text/x-asp', 'ACCEPT_TEXT', True, False),
    ('application/php', 'ACCEPT_TEXT', True, False),
    ('text/php', 'ACCEPT_TEXT', True, False),
    ('text/x-py', 'ACCEPT_TEXT', True, False),
    ('text/x-m', 'ACCEPT_TEXT', True, False),
]


@pytest.mark.parametrize("inp,disp,is_text,is_html", GOLDEN)
def test_scalar_matches_compiled_reference(inp, disp, is_text, is_html):
    assert mime.check_mime_type_disposition(inp) == disp
    assert mime.is_text_type_scalar(inp) == is_text
    assert mime.is_html_type_scalar(inp) == is_html


def test_batch_matches_scalar():
    s = pd.Series([g[0] for g in GOLDEN], dtype=object)
    got = mime.disposition_batch(s).tolist()
    want = [g[1] for g in GOLDEN]
    assert got == want


def test_newline_input_no_type():
    # Java Pattern '.' excludes line terminators -> truncation full
    # match fails -> ACCEPT_OTHER
    assert mime.check_mime_type_disposition("text/html\nx") == mime.ACCEPT_OTHER
    assert mime.check_mime_type_disposition("text/html\rx") == mime.ACCEPT_OTHER


def test_catalyst_matches_scalar(spark):
    from pyspark.sql import functions as F

    vals = [(g[0],) for g in GOLDEN]
    df = spark.createDataFrame(vals, "mime string")
    got = df.select(
        "mime",
        mime.disposition_col(F.col("mime")).alias("d"),
        mime.is_text_type(F.col("mime")).alias("t"),
        mime.is_html_type(F.col("mime")).alias("h"),
    ).toPandas()
    want = {g[0]: (g[1], g[2], g[3]) for g in GOLDEN}
    for _, row in got.iterrows():
        key = None if pd.isna(row['mime']) else row['mime']
        w = want[key]
        assert (row['d'], row['t'], row['h']) == w, key
