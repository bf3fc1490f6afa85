"""Pure-stdlib PNG/WAV codecs (ccspark.media)."""

import struct
import zlib

import numpy as np
import pytest

from ccspark import media


def test_png_roundtrip_rgb():
    rng = np.random.RandomState(3)
    img = rng.randint(0, 256, size=(13, 7, 3), dtype=np.uint8)
    data = media.encode_png(img)
    w, h, c, out = media.decode_png(data)
    assert (w, h, c) == (7, 13, 3)
    assert np.array_equal(out, img)


def test_png_roundtrip_gray_and_rgba():
    g = np.arange(64, dtype=np.uint8).reshape(8, 8)
    w, h, c, out = media.decode_png(media.encode_png(g))
    assert (w, h, c) == (8, 8, 1)
    assert np.array_equal(out[:, :, 0], g)
    rgba = np.dstack([g, g, g, np.full((8, 8), 200, np.uint8)])
    w, h, c, out = media.decode_png(media.encode_png(rgba))
    assert c == 4 and np.array_equal(out, rgba)


def _png_with_filters(width, height, rows_and_filters, color_type=2):
    """Hand-build a PNG whose scanlines use explicit filter types."""
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    raw = b"".join(bytes([f]) + bytes(r) for f, r in rows_and_filters)
    return (
        b"\x89PNG\r\n\x1a\n"
        + media._chunk(b"IHDR", ihdr)
        + media._chunk(b"IDAT", zlib.compress(raw))
        + media._chunk(b"IEND", b"")
    )


def test_png_filters_sub_up_avg_paeth():
    # 2x2 RGB image with known pixels, encoded with each filter type
    # row0 = (10,20,30),(50,60,70) ; row1 = (15,25,35),(55,65,75)
    r0 = [10, 20, 30, 50, 60, 70]
    r1 = [15, 25, 35, 55, 65, 75]
    want = np.array([r0, r1], dtype=np.uint8).reshape(2, 2, 3)

    # Sub: byte - left(bpp)
    sub0 = r0[:3] + [(r0[i] - r0[i - 3]) & 0xFF for i in range(3, 6)]
    # Up on row1: byte - above
    up1 = [(r1[i] - r0[i]) & 0xFF for i in range(6)]
    data = _png_with_filters(2, 2, [(1, sub0), (2, up1)])
    _, _, _, out = media.decode_png(data)
    assert np.array_equal(out, want)

    # Average and Paeth
    avg0 = [
        (r0[i] - ((r0[i - 3] if i >= 3 else 0) // 2)) & 0xFF for i in range(6)
    ]
    def paeth(a, b, c):
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        return a if pa <= pb and pa <= pc else (b if pb <= pc else c)
    pae1 = [
        (r1[i] - paeth(r1[i - 3] if i >= 3 else 0, r0[i], r0[i - 3] if i >= 3 else 0)) & 0xFF
        for i in range(6)
    ]
    data = _png_with_filters(2, 2, [(3, avg0), (4, pae1)])
    _, _, _, out = media.decode_png(data)
    assert np.array_equal(out, want)


def test_png_palette():
    ihdr = struct.pack(">IIBBBBB", 2, 1, 8, 3, 0, 0, 0)
    plte = bytes([255, 0, 0, 0, 255, 0])  # palette: red, green
    raw = bytes([0, 0, 1])  # filter 0, indices [0, 1]
    data = (
        b"\x89PNG\r\n\x1a\n"
        + media._chunk(b"IHDR", ihdr)
        + media._chunk(b"PLTE", plte)
        + media._chunk(b"IDAT", zlib.compress(raw))
        + media._chunk(b"IEND", b"")
    )
    w, h, c, out = media.decode_png(data)
    assert (w, h, c) == (2, 1, 3)
    assert out[0, 0].tolist() == [255, 0, 0]
    assert out[0, 1].tolist() == [0, 255, 0]


def test_png_rejects_garbage():
    with pytest.raises(ValueError):
        media.decode_png(b"not a png at all")


def test_wav_roundtrip_and_features():
    t = np.arange(8000, dtype=np.float64)
    samples = (np.sin(2 * np.pi * 440 * t / 8000) * 10000).astype(np.int16)
    data = media.encode_wav(samples, 8000)
    rate, nch, out = media.decode_wav(data)
    assert (rate, nch) == (8000, 1)
    assert np.array_equal(out, samples)
    dur, rms, peak = media.audio_features(rate, out)
    assert dur == pytest.approx(1.0)
    assert rms == pytest.approx(10000 / np.sqrt(2), rel=0.01)
    assert peak == 10000


def test_sniff_media():
    assert media.sniff_media(media.encode_png(np.zeros((2, 2), np.uint8))) == "image/png"
    assert media.sniff_media(media.encode_wav(np.zeros(4, np.int16))) == "audio/wav"
    assert media.sniff_media(b"\xff\xd8\xff\xe0junk") == "image/jpeg"
    assert media.sniff_media(b"plain") == "application/octet-stream"


def test_multimodal_real_decode(spark):
    from pyspark.sql import functions as F

    from ccspark import multimodal

    img = np.full((4, 6, 3), 77, np.uint8)
    wav = media.encode_wav((np.ones(800) * 5000).astype(np.int16), 8000)
    rows = [(1, bytearray(media.encode_png(img))), (2, bytearray(wav))]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = {r["doc_id"]: r for r in multimodal.extract_features(df, "doc_id", "payload").collect()}
    assert out[1]["width"] == 6 and out[1]["height"] == 4
    assert out[1]["features"][0] == pytest.approx(77.0)
    assert out[2]["features"][0] == pytest.approx(0.1)  # duration 800/8000
    assert out[2]["features"][2] == pytest.approx(5000.0)


def test_png_filter_reconstruction_wavefront_parity_fuzz():
    """The vectorized reconstruction (cumsum runs + anti-diagonal
    wavefront) must be byte-identical to a straightforward per-byte
    reference implementation across random sizes/channel counts/filter
    sequences."""
    import numpy as np

    def scalar_recon(lines, ftypes, width, bpp):
        h, stride = lines.shape
        out = np.zeros((h, stride), np.uint8)
        prev = np.zeros(stride, np.int32)
        for y in range(h):
            f = int(ftypes[y])
            line = lines[y].astype(np.int32)
            cur = np.zeros(stride, np.int32)
            for x in range(stride):
                left = cur[x - bpp] if x >= bpp else 0
                up = prev[x]
                ul = prev[x - bpp] if x >= bpp else 0
                if f == 0:
                    pred = 0
                elif f == 1:
                    pred = left
                elif f == 2:
                    pred = up
                elif f == 3:
                    pred = (left + up) >> 1
                else:
                    p = left + up - ul
                    pa, pb, pc = abs(p - left), abs(p - up), abs(p - ul)
                    pred = left if (pa <= pb and pa <= pc) else (up if pb <= pc else ul)
                cur[x] = (line[x] + pred) & 0xFF
            out[y] = cur
            prev = cur
        return out

    rng = np.random.default_rng(23)
    for _ in range(10):
        w = int(rng.integers(1, 32))
        h = int(rng.integers(1, 32))
        bpp = int(rng.choice([1, 2, 3, 4]))
        lines = rng.integers(0, 256, (h, w * bpp)).astype(np.uint8)
        fts = rng.integers(0, 5, h).astype(np.int64)
        got = media._reconstruct_filters(lines, fts, w, bpp)
        want = scalar_recon(lines, fts, w, bpp)
        assert (got == want).all(), (w, h, bpp, fts.tolist())


def test_png_filter_reconstruction_1mp_speed():
    """1-MP all-Paeth image reconstructs in well under a second (the
    old per-byte Python path took tens of seconds)."""
    import time

    import numpy as np

    rng = np.random.default_rng(5)
    lines = rng.integers(0, 256, (600, 600 * 3)).astype(np.uint8)
    fts = np.full(600, 4, np.int64)
    t0 = time.time()
    media._reconstruct_filters(lines, fts, 600, 3)
    assert time.time() - t0 < 1.0


# ---------------------------------------------------------------------------
# baseline JPEG codec (ccspark.jpeg)
# ---------------------------------------------------------------------------


def test_jpeg_constant_gray_exact_roundtrip():
    """Constant-color blocks are DC-only; with q[0,0]==8 the orthonormal
    DCT/IDCT pair round-trips EXACTLY (F00 = 8*(g-128))."""
    import numpy as np

    from ccspark import jpeg

    for g in (0, 1, 17, 127, 128, 200, 255):
        img = np.full((16, 24), g, np.uint8)
        w, h, c, out = jpeg.decode_jpeg(jpeg.encode_jpeg(img))
        assert (w, h, c) == (24, 16, 1)
        assert (out[:, :, 0] == g).all(), g


def test_jpeg_random_near_lossless_q1():
    import numpy as np

    from ccspark import jpeg

    rng = np.random.default_rng(3)
    q1 = np.ones(64, np.int32)
    img = rng.integers(0, 256, (24, 40)).astype(np.uint8)
    w, h, c, out = jpeg.decode_jpeg(jpeg.encode_jpeg(img, quant=q1))
    assert (w, h, c) == (40, 24, 1)
    assert np.abs(out[:, :, 0].astype(int) - img.astype(int)).max() <= 1
    # odd dimensions exercise edge padding + crop
    img = rng.integers(0, 256, (13, 21)).astype(np.uint8)
    w, h, c, out = jpeg.decode_jpeg(jpeg.encode_jpeg(img, quant=q1))
    assert (w, h) == (21, 13)
    assert np.abs(out[:, :, 0].astype(int) - img.astype(int)).max() <= 1
    # RGB: YCbCr float transform bounds the error at +-2
    img = rng.integers(0, 256, (16, 16, 3)).astype(np.uint8)
    w, h, c, out = jpeg.decode_jpeg(jpeg.encode_jpeg(img, quant=q1))
    assert c == 3
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 2


def test_jpeg_rejects_non_baseline():
    import pytest as _pytest

    from ccspark import jpeg

    with _pytest.raises(ValueError):
        jpeg.decode_jpeg(b"not a jpeg")
    # arithmetic-coded (SOF9/0xC9) -> explicit unsupported error
    import struct

    sof9 = b"\xff\xd8" + b"\xff\xc9" + struct.pack(">H", 11) + bytes(9) + b"\xff\xd9"
    with _pytest.raises(ValueError):
        jpeg.decode_jpeg(sof9)
    # SOF2 with no scan data is truncated, not a crash
    sof2 = b"\xff\xd8" + b"\xff\xc2" + struct.pack(">H", 11) + bytes(9) + b"\xff\xd9"
    with _pytest.raises(ValueError):
        jpeg.decode_jpeg(sof2)


def _textured_rgb(n=96, seed=7):
    import numpy as np

    rng = np.random.default_rng(seed)
    x = np.linspace(0, 8 * np.pi, n)
    base = np.sin(x)[None, :] * np.cos(x)[:, None] * 100 + 128
    return np.clip(base[:, :, None] + rng.normal(0, 12, (n, n, 3)), 0, 255).astype(
        np.uint8
    )


def test_jpeg_progressive_spectral_matches_sequential():
    """Progressive (SOF2, spectral-selection scan script) decodes to the
    EXACT pixels of the sequential encoding — the coefficients are
    identical by construction, so any deviation is a scan-logic bug."""
    import numpy as np

    from ccspark import jpeg

    img = _textured_rgb()
    q = np.ones(64, dtype=np.int32) * 4
    seq = jpeg.decode_jpeg(jpeg.encode_jpeg(img, quant=q))
    prog = jpeg.decode_jpeg(jpeg.encode_jpeg_progressive(img, quant=q))
    assert np.array_equal(seq[3], prog[3])
    gray = img[:, :, 0]
    seq = jpeg.decode_jpeg(jpeg.encode_jpeg(gray, quant=q))
    prog = jpeg.decode_jpeg(jpeg.encode_jpeg_progressive(gray, quant=q))
    assert np.array_equal(seq[3], prog[3])


def test_jpeg_progressive_420_odd_size():
    """Subsampled progressive: non-interleaved AC scans walk the TRUE
    per-component block grid, not the MCU-padded one (odd image sizes
    make them differ)."""
    import numpy as np

    from ccspark import jpeg

    img = _textured_rgb()[:83, :91]
    q = np.ones(64, dtype=np.int32) * 4
    seq = jpeg.decode_jpeg(jpeg.encode_jpeg_420(img, quant=q))
    prog = jpeg.decode_jpeg(jpeg.encode_jpeg_progressive(img, quant=q, subsample_420=True))
    assert np.array_equal(seq[3], prog[3])


def test_jpeg_fill_bytes_before_markers():
    """T.81 B.1.1.2: any number of 0xFF fill bytes may precede a marker;
    the parser must skip them, not parse them as a marker + length."""
    import numpy as np

    from ccspark import jpeg

    img = np.full((16, 16), 90, np.uint8)
    enc = jpeg.encode_jpeg(img)
    base = jpeg.decode_jpeg(enc)[3]
    # inject fill bytes before the APP0 marker (right after SOI)
    assert enc[:2] == b"\xff\xd8" and enc[2] == 0xFF
    padded = enc[:2] + b"\xff\xff\xff" + enc[2:]
    got = jpeg.decode_jpeg(padded)[3]
    assert np.array_equal(got, base)


def test_jpeg_422_and_411_sampling():
    """Asymmetric chroma subsampling (4:2:2 h-only, 4:1:1) through the
    progressive encoder: constant color is DC-only → exact roundtrip,
    exercising the axis-wise upsampling and odd-size crop paths."""
    import numpy as np

    from ccspark import jpeg

    img = np.zeros((37, 53, 3), np.uint8)
    img[:, :, 0], img[:, :, 1], img[:, :, 2] = 200, 100, 50
    for samp in ((2, 1), (4, 1), (1, 2)):
        w, h, c, out = jpeg.decode_jpeg(
            jpeg.encode_jpeg_progressive(img, samp_y=samp)
        )
        assert (w, h, c) == (53, 37, 3)
        assert np.array_equal(out, img), samp


def test_jpeg_progressive_successive_approximation():
    """Handcrafted 4-scan successive-approximation stream (DC first
    Al=1, AC first Al=1, DC refine, AC refine with EOB correction
    bits) must reconstruct the exact coefficients [DC=5, zz1=3,
    zz5=-2]."""
    import struct

    import numpy as np

    from ccspark import jpeg
    from ccspark.jpeg import (
        _AC_LUM_BITS,
        _AC_LUM_VALS,
        _DC_LUM_BITS,
        _DC_LUM_VALS,
        _FLAT_Q8,
        _ZZ,
        _A,
        _BitWriter,
        _build_codes,
        _seg,
    )

    dc_codes = _build_codes(_DC_LUM_BITS, _DC_LUM_VALS)
    ac_codes = _build_codes(_AC_LUM_BITS, _AC_LUM_VALS)
    out = bytearray()
    out += b"\xff\xd8"
    out += _seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += _seg(0xDB, bytes([0]) + bytes(int(x) for x in _FLAT_Q8))
    out += _seg(0xC2, struct.pack(">BHHB", 8, 8, 8, 1) + bytes([1, 0x11, 0]))
    out += _seg(0xC4, bytes([0x00] + _DC_LUM_BITS + _DC_LUM_VALS))
    out += _seg(0xC4, bytes([0x10] + _AC_LUM_BITS + _AC_LUM_VALS))
    # scan 1: DC first, Al=1: diff = 5>>1 = 2
    out += _seg(0xDA, bytes([1, 1, 0x00, 0, 0, 0x01]))
    bw = _BitWriter()
    c, l = dc_codes[2]
    bw.write(c, l)
    bw.write(2, 2)
    bw.flush()
    out += bw.out
    # scan 2: AC first [1,63] Al=1: zz1 -> +1, three zeros, zz5 -> -1, EOB
    out += _seg(0xDA, bytes([1, 1, 0x00, 1, 63, 0x01]))
    bw = _BitWriter()
    c, l = ac_codes[0x01]
    bw.write(c, l)
    bw.write(1, 1)
    c, l = ac_codes[0x31]
    bw.write(c, l)
    bw.write(0, 1)
    c, l = ac_codes[0x00]
    bw.write(c, l)
    bw.flush()
    out += bw.out
    # scan 3: DC refine: low bit of 5
    out += _seg(0xDA, bytes([1, 1, 0x00, 0, 0, 0x10]))
    bw = _BitWriter()
    bw.write(1, 1)
    bw.flush()
    out += bw.out
    # scan 4: AC refine: EOB, then correction bits 1 (zz1: 2->3), 0 (zz5 stays -2)
    out += _seg(0xDA, bytes([1, 1, 0x00, 1, 63, 0x10]))
    bw = _BitWriter()
    c, l = ac_codes[0x00]
    bw.write(c, l)
    bw.write(1, 1)
    bw.write(0, 1)
    bw.flush()
    out += bw.out
    out += b"\xff\xd9"

    w, h, ch, pix = jpeg.decode_jpeg(bytes(out))
    coef = np.zeros(64)
    coef[0], coef[1], coef[5] = 5, 3, -2
    mat = np.zeros(64)
    mat[_ZZ] = coef * _FLAT_Q8
    exp = np.clip(np.round(_A.T @ mat.reshape(8, 8) @ _A + 128.0), 0, 255).astype(
        np.uint8
    )
    assert (w, h, ch) == (8, 8, 1)
    assert np.array_equal(pix[:, :, 0], exp)


def test_jpeg_through_multimodal_extract(spark):
    """image/jpeg payloads take the REAL decode path (no stub) through
    multimodal.extract_features."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf

    from ccspark import jpeg, multimodal

    docs = spark.range(24).select(F.col("id").alias("doc_id"))

    def _mk(doc_id):
        out = []
        for did in doc_id:
            d = int(did)
            img = np.full((8 + d % 8, 8 + (d * 3) % 8), (d * 11) % 256, np.uint8)
            out.append(jpeg.encode_jpeg(img))
        return pd.Series(out, index=doc_id.index)

    mk = pandas_udf(_mk, "binary")
    feats = multimodal.extract_features(
        docs.withColumn("payload", mk(F.col("doc_id"))), "doc_id", "payload"
    )
    rows = {r["doc_id"]: r for r in feats.collect()}
    for d in range(24):
        r = rows[d]
        assert r["width"] == 8 + (d * 3) % 8
        assert r["height"] == 8 + d % 8
        assert abs(r["features"][0] - (d * 11) % 256) < 1e-9  # exact mean


def test_jpeg_420_subsampling_roundtrip():
    """The decoder's generic sampling-factor MCU/upsampling path,
    exercised by a 4:2:0 encoder fixture: constant color is exact
    (constant chroma survives the 2:1 box downsample), smooth content
    stays within chroma-subsampling loss."""
    import numpy as np

    from ccspark import jpeg

    q1 = np.ones(64, np.int32)
    img = np.zeros((24, 40, 3), np.uint8)
    img[:] = (180, 90, 40)
    w, h, c, out = jpeg.decode_jpeg(jpeg.encode_jpeg_420(img, quant=q1))
    assert (w, h, c) == (40, 24, 3)
    assert (out == img).all()
    yy, xx = np.mgrid[0:19, 0:29]
    img = np.stack(
        [(xx * 4) % 200 + 20, (yy * 6) % 200 + 20, ((xx + yy) * 3) % 200 + 20],
        axis=2,
    ).astype(np.uint8)
    w, h, c, out = jpeg.decode_jpeg(jpeg.encode_jpeg_420(img, quant=q1))
    assert (w, h) == (29, 19)
    err = np.abs(out.astype(int) - img.astype(int))
    assert err.mean() < 3.0 and err.max() <= 16  # chroma subsample loss only


def test_png_filtered_encoding_roundtrip():
    """encode_png(row_filters=...) forward-filters scanlines; decode
    must reconstruct the original bytes for every filter mix."""
    import numpy as np

    rng = np.random.default_rng(9)
    for _ in range(8):
        h, w = int(rng.integers(1, 24)), int(rng.integers(1, 24))
        ch = int(rng.choice([1, 3, 4]))
        img = rng.integers(0, 256, (h, w) if ch == 1 else (h, w, ch)).astype(np.uint8)
        fts = rng.integers(0, 5, h)
        _, _, _, out = media.decode_png(media.encode_png(img, row_filters=fts))
        want = img[:, :, None] if ch == 1 else img
        assert (out == want).all()


def test_decoders_raise_valueerror_on_garbage():
    """Crawl inputs are hostile: every decoder must fail with ValueError
    (or decode best-effort), never library-internal exception types."""
    import random

    from ccspark import arc, jpeg, warc

    rnd = random.Random(5)
    magics = {
        "jpeg": [b"\xff\xd8\xff\xe0", b"\xff\xd8\xff\xc0\x00\x11\x08",
                 b"\xff\xd8\xff\xdb", b"\xff\xd8\xff\xda"],
        "png": [b"\x89PNG\r\n\x1a\n"],
    }
    for _ in range(150):
        junk = bytes(rnd.randrange(256) for _ in range(rnd.randrange(4, 250)))
        for m in magics["jpeg"]:
            try:
                jpeg.decode_jpeg(m + junk)
            except ValueError:
                pass
        for m in magics["png"]:
            try:
                media.decode_png(m + junk)
            except ValueError:
                pass
        # gzip-framed containers decode best-effort (no raise)
        list(warc.read_warc_bytes(b"\x1f\x8b\x08\x00" + junk))
        list(arc.read_arc_bytes(b"\x1f\x8b\x08\x00" + junk))


# -- video container metadata (MP4 boxes / WebM EBML) --------------------------


class TestVideoMeta:
    def test_mp4_roundtrip(self):
        from ccspark import video

        b = video.build_mp4(640, 360, 12345, timescale=1000)
        m = video.parse_mp4_meta(b)
        assert m == {
            "container": "mp4", "brand": "isom",
            "width": 640, "height": 360, "duration_ms": 12345.0,
        }

    def test_mp4_v1_mvhd_and_largesize(self):
        """Version-1 mvhd (64-bit duration) and a 64-bit largesize box
        header parse identically."""
        import struct

        from ccspark import video

        matrix = struct.pack(">9I", 1 << 16, 0, 0, 0, 1 << 16, 0, 0, 0, 1 << 30)
        mvhd = video._box(
            b"mvhd",
            struct.pack(">B3x", 1)
            + struct.pack(">QQIQ", 0, 0, 90000, 90000 * 7)
            + struct.pack(">IHH", 1 << 16, 0x0100, 0)
            + b"\x00" * 8 + matrix + b"\x00" * 24 + struct.pack(">I", 2),
        )
        tkhd = video._box(
            b"tkhd",
            struct.pack(">B3x", 7)
            + struct.pack(">IIII", 0, 0, 1, 0)
            + struct.pack(">I", 0)
            + b"\x00" * 8 + struct.pack(">hhhh", 0, 0, 0, 0) + matrix
            + struct.pack(">II", 1920 << 16, 1080 << 16),
        )
        moov_payload = mvhd + video._box(b"trak", tkhd)
        moov = struct.pack(">I", 1) + b"moov" + struct.pack(">Q", 16 + len(moov_payload)) + moov_payload
        ftyp = video._box(b"ftyp", b"mp42" + struct.pack(">I", 0) + b"mp42isom")
        m = video.parse_mp4_meta(ftyp + moov)
        assert (m["brand"], m["width"], m["height"]) == ("mp42", 1920, 1080)
        assert m["duration_ms"] == 7000.0

    def test_webm_roundtrip_and_defaults(self):
        from ccspark import video

        w = video.build_webm(1280, 720, 45678.0)
        m = video.parse_webm_meta(w)
        assert m == {
            "container": "webm", "brand": "webm",
            "width": 1280, "height": 720, "duration_ms": 45678.0,
        }
        # absent TimecodeScale → Matroska default 1,000,000 ns; 4-byte
        # float Duration accepted
        import struct

        info = video._el(video._ID_INFO, video._el(video._ID_DURATION, struct.pack(">f", 2000.0)))
        vid = video._el(
            video._ID_VIDEO,
            video._el(video._ID_PIXELWIDTH, b"\x10") + video._el(video._ID_PIXELHEIGHT, b"\x09"),
        )
        seg = video._el(
            video._ID_SEGMENT,
            info + video._el(video._ID_TRACKS, video._el(video._ID_TRACKENTRY, vid)),
        )
        hdr = video._el(0x1A45DFA3, video._el(video._ID_DOCTYPE, b"matroska"))
        m2 = video.parse_webm_meta(hdr + seg)
        assert m2["brand"] == "matroska"
        assert (m2["width"], m2["height"], m2["duration_ms"]) == (16, 9, 2000.0)

    def test_malformed_raises(self):
        import pytest as _pytest

        from ccspark import video

        mp4 = video.build_mp4(64, 64, 1000)
        webm = video.build_webm(64, 64, 1000.0)
        for bad in (b"", b"\x00" * 64, mp4[:20], webm[:6], mp4[:4] + b"XXXX" + mp4[8:]):
            with _pytest.raises(ValueError):
                video.parse_video_meta(bad)

    def test_sniff_and_extract_features_video(self, spark):
        from ccspark import media, multimodal, video

        mp4 = video.build_mp4(320, 240, 5000)
        webm = video.build_webm(640, 480, 2500.0)
        assert media.sniff_media(mp4) == "video/mp4"
        assert media.sniff_media(webm) == "video/webm"
        df = spark.createDataFrame(
            [(1, bytearray(mp4)), (2, bytearray(webm))], "doc_id long, payload binary"
        )
        got = {
            r["doc_id"]: r
            for r in multimodal.extract_features(df, "doc_id", "payload", media_type="video").collect()
        }
        assert (got[1]["width"], got[1]["height"], got[1]["features"][0]) == (320, 240, 5000.0)
        assert (got[2]["width"], got[2]["height"], got[2]["features"][0]) == (640, 480, 2500.0)


class TestVideoMetaHardening:
    def test_webm_unknown_size_segment(self):
        """Matroska all-ones vint = unknown size (standard in live/
        streamed muxer output): the Segment extends to EOF and must
        parse, not raise 'overruns scope'."""
        import struct

        from ccspark import video

        full = video.build_webm(320, 240, 1500.0)
        # rebuild with the Segment's size replaced by the unknown vint
        hdr = video._el(0x1A45DFA3, video._el(video._ID_DOCTYPE, b"webm"))
        info = video._el(
            video._ID_INFO, video._el(video._ID_DURATION, struct.pack(">d", 1500.0))
        )
        vid = video._el(
            video._ID_VIDEO,
            video._el(video._ID_PIXELWIDTH, b"\x01\x40")
            + video._el(video._ID_PIXELHEIGHT, b"\x00\xf0"),
        )
        seg_content = info + video._el(
            video._ID_TRACKS, video._el(video._ID_TRACKENTRY, vid)
        )
        unknown = b"\x01" + b"\xff" * 7  # VINT_DATA all ones, length 8
        data = hdr + video._ID_SEGMENT.to_bytes(4, "big") + unknown + seg_content
        m = video.parse_webm_meta(data)
        assert (m["width"], m["height"], m["duration_ms"]) == (320, 240, 1500.0)
        # the sized build still parses identically
        assert video.parse_webm_meta(full)["width"] == 320

    def test_truncated_tkhd_raises_valueerror(self):
        """A tkhd shorter than 8 bytes must raise ValueError — not read
        neighboring moov bytes as dimensions, and not escape as
        struct.error."""
        import pytest as _pytest

        from ccspark import video

        ftyp = video._box(b"ftyp", b"isom" + b"\x00\x00\x00\x00" + b"isom")
        mvhd = video._box(
            b"mvhd",
            b"\x00\x00\x00\x00"
            + b"\x00" * 8
            + (1000).to_bytes(4, "big")
            + (5000).to_bytes(4, "big"),
        )
        short_tkhd = video._box(b"tkhd", b"\x00\x00\x00")  # 3-byte payload
        moov = video._box(b"moov", mvhd + video._box(b"trak", short_tkhd))
        with _pytest.raises(ValueError):
            video.parse_mp4_meta(ftyp + moov)
        # and via the public dispatcher too
        with _pytest.raises(ValueError):
            video.parse_video_meta(ftyp + moov)

    def test_parse_video_meta_wraps_stray_errors(self):
        import pytest as _pytest

        from ccspark import video

        # ftyp-tagged but garbage after — whatever internal error occurs
        # must surface as ValueError (the documented contract)
        junk = b"\x00\x00\x00\x08ftyp" + b"\x00\x00\x00\x09moov"
        with _pytest.raises(ValueError):
            video.parse_video_meta(junk)


def test_webm_unknown_size_on_leaf_element_raises():
    """Per the EBML spec unknown size is only valid for master
    elements: a corrupt PixelWidth with size byte 0xFF must raise, not
    read the rest of the scope as one giant integer."""
    import pytest as _pytest

    from ccspark import video

    hdr = video._el(0x1A45DFA3, video._el(video._ID_DOCTYPE, b"webm"))
    bad_vid = video._el(
        video._ID_VIDEO,
        video._ID_PIXELWIDTH.to_bytes(1, "big") + b"\xff" + b"\x01\x40\x00\xf0",
    )
    seg = video._el(
        video._ID_SEGMENT,
        video._el(video._ID_TRACKS, video._el(video._ID_TRACKENTRY, bad_vid)),
    )
    with _pytest.raises(ValueError):
        video.parse_webm_meta(hdr + seg)
