"""Video container METADATA parsing: MP4 (ISO BMFF box walk) and
WebM/Matroska (EBML element walk) — dimensions, duration, container
identity — plus deterministic fixture builders so the parse is
oracle-checkable without any external media corpus.

Scope is deliberately metadata-only: frame/codec decode needs codec
libraries this environment doesn't ship, and a 100 TB curation pipeline
mostly needs exactly this surface — container sanity, dimensions,
duration — to filter/bucket video documents before any GPU decode
stage.  The bytes stay an opaque ``binary`` column (multimodal.py);
these parsers read only the header structures:

* MP4: box framing (32-bit size + fourcc, 64-bit largesize),
  ``ftyp`` major brand, ``moov/mvhd`` timescale+duration (v0 and v1),
  ``moov/trak/tkhd`` 16.16 fixed-point presentation width/height —
  the first visually-sized track wins.
* WebM: EBML vint ids/sizes, header ``DocType``,
  ``Segment/Info`` TimecodeScale (default 1,000,000 ns) + Duration
  (4- or 8-byte float, timecode-scale units),
  ``Segment/Tracks/TrackEntry/Video`` PixelWidth/PixelHeight.

Both parsers are total: malformed input raises ValueError (callers
treat it like any other undecodable payload).
"""

from __future__ import annotations

import struct

VIDEO_META_SCHEMA = (
    "container string, brand string, width int, height int, duration_ms double"
)

# -- MP4 (ISO base media file format) -----------------------------------------


def _iter_boxes(data: bytes, start: int, end: int):
    """Yield (fourcc, payload_start, payload_end) for sibling boxes."""
    pos = start
    while pos + 8 <= end:
        size = struct.unpack_from(">I", data, pos)[0]
        fourcc = data[pos + 4 : pos + 8]
        header = 8
        if size == 1:
            if pos + 16 > end:
                raise ValueError("truncated largesize box")
            size = struct.unpack_from(">Q", data, pos + 8)[0]
            header = 16
        elif size == 0:
            size = end - pos  # box extends to end of enclosing scope
        if size < header or pos + size > end:
            raise ValueError(f"bad box size {size} for {fourcc!r}")
        yield fourcc, pos + header, pos + size
        pos += size


def _parse_mvhd(data: bytes, s: int, e: int) -> tuple[int, int]:
    if e - s < 5:
        raise ValueError("truncated mvhd")
    version = data[s]
    need = (4 + 28) if version == 1 else (4 + 16)
    if e - s < need:
        raise ValueError("truncated mvhd payload")
    if version == 1:
        timescale = struct.unpack_from(">I", data, s + 4 + 16)[0]
        duration = struct.unpack_from(">Q", data, s + 4 + 20)[0]
    else:
        timescale = struct.unpack_from(">I", data, s + 4 + 8)[0]
        duration = struct.unpack_from(">I", data, s + 4 + 12)[0]
    if timescale == 0:
        raise ValueError("mvhd timescale 0")
    return timescale, duration


def _parse_tkhd(data: bytes, s: int, e: int) -> tuple[int, int]:
    if e - s < 8:
        raise ValueError("truncated tkhd")
    # width/height are the LAST 8 payload bytes (16.16 fixed) in both
    # versions — offset from the end avoids the v0/v1 field-size split
    w_fixed, h_fixed = struct.unpack_from(">II", data, e - 8)
    return w_fixed >> 16, h_fixed >> 16


def parse_mp4_meta(data: bytes) -> dict:
    """MP4 container metadata: {container, brand, width, height,
    duration_ms}.  Raises ValueError when not parseable as MP4."""
    if len(data) < 12 or data[4:8] != b"ftyp":
        raise ValueError("not an MP4 (no ftyp)")
    brand = None
    timescale = duration = None
    width = height = 0
    for fourcc, s, e in _iter_boxes(data, 0, len(data)):
        if fourcc == b"ftyp":
            brand = data[s : s + 4].decode("latin-1")
        elif fourcc == b"moov":
            for f2, s2, e2 in _iter_boxes(data, s, e):
                if f2 == b"mvhd":
                    timescale, duration = _parse_mvhd(data, s2, e2)
                elif f2 == b"trak":
                    for f3, s3, e3 in _iter_boxes(data, s2, e2):
                        if f3 == b"tkhd" and width == 0 and height == 0:
                            width, height = _parse_tkhd(data, s3, e3)
    if timescale is None:
        raise ValueError("no moov/mvhd")
    return {
        "container": "mp4",
        "brand": brand,
        "width": int(width),
        "height": int(height),
        "duration_ms": duration * 1000.0 / timescale,
    }


def _box(fourcc: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", 8 + len(payload)) + fourcc + payload


def build_mp4(
    width: int, height: int, duration_ms: int, timescale: int = 1000, brand: bytes = b"isom"
) -> bytes:
    """Deterministic minimal-but-spec-shaped MP4 fixture: ftyp +
    moov(mvhd + trak(tkhd)); no media data (metadata parse target)."""
    duration = duration_ms * timescale // 1000
    matrix = struct.pack(">9I", 0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000)
    mvhd = _box(
        b"mvhd",
        struct.pack(">I", 0)  # version 0 + flags
        + struct.pack(">IIII", 0, 0, timescale, duration)
        + struct.pack(">IHH", 0x00010000, 0x0100, 0)  # rate, volume, reserved
        + b"\x00" * 8
        + matrix
        + b"\x00" * 24
        + struct.pack(">I", 2),  # next_track_id
    )
    tkhd = _box(
        b"tkhd",
        struct.pack(">I", 7)  # version 0 + flags: enabled|in-movie|in-preview
        + struct.pack(">IIII", 0, 0, 1, 0)  # ctime, mtime, track_id, reserved
        + struct.pack(">I", duration)
        + b"\x00" * 8
        + struct.pack(">hhhh", 0, 0, 0, 0)  # layer, alternate, volume, reserved
        + matrix
        + struct.pack(">II", width << 16, height << 16),
    )
    ftyp = _box(b"ftyp", brand + struct.pack(">I", 512) + b"isomiso2mp41")
    return ftyp + _box(b"moov", mvhd + _box(b"trak", tkhd))


# -- WebM / Matroska (EBML) ----------------------------------------------------

_EBML_HEADER = b"\x1a\x45\xdf\xa3"
_ID_DOCTYPE = 0x4282
_ID_SEGMENT = 0x18538067
_ID_INFO = 0x1549A966
_ID_TIMECODESCALE = 0x2AD7B1
_ID_DURATION = 0x4489
_ID_TRACKS = 0x1654AE6B
_ID_TRACKENTRY = 0xAE
_ID_VIDEO = 0xE0
_ID_PIXELWIDTH = 0xB0
_ID_PIXELHEIGHT = 0xBA

_CONTAINERS = {_ID_SEGMENT, _ID_INFO, _ID_TRACKS, _ID_TRACKENTRY, _ID_VIDEO}


def _read_vint(data: bytes, pos: int, keep_marker: bool) -> tuple[int, int]:
    if pos >= len(data):
        raise ValueError("EBML vint past end")
    b0 = data[pos]
    length = 1
    while length <= 8 and not (b0 & (0x80 >> (length - 1))):
        length += 1
    if length > 8 or pos + length > len(data):
        raise ValueError("bad EBML vint")
    val = b0 if keep_marker else b0 & (0xFF >> length)
    for i in range(1, length):
        val = (val << 8) | data[pos + i]
    return val, pos + length


def _iter_ebml(data: bytes, start: int, end: int):
    """Yield (element_id, payload_start, payload_end) for siblings.

    An all-ones VINT_DATA is Matroska's "unknown size" (standard for
    the Segment element in live/streamed output): the element extends
    to the end of the enclosing scope and has no following siblings.
    Per the EBML spec unknown size is only valid for MASTER elements —
    on a leaf (e.g. a corrupt PixelWidth size byte 0xFF) it is
    malformed input, not license to swallow the rest of the scope as
    one giant integer."""
    pos = start
    while pos < end:
        eid, pos = _read_vint(data, pos, keep_marker=True)
        size_start = pos
        size, pos = _read_vint(data, pos, keep_marker=False)
        if size == (1 << (7 * (pos - size_start))) - 1:  # unknown size
            if eid not in _CONTAINERS:
                raise ValueError("unknown-size vint on non-master EBML element")
            yield eid, pos, end
            return
        if pos + size > end:
            raise ValueError("EBML element overruns scope")
        yield eid, pos, pos + size
        pos += size


def _ebml_uint(data: bytes, s: int, e: int) -> int:
    v = 0
    for i in range(s, e):
        v = (v << 8) | data[i]
    return v


def _ebml_float(data: bytes, s: int, e: int) -> float:
    n = e - s
    if n == 4:
        return struct.unpack_from(">f", data, s)[0]
    if n == 8:
        return struct.unpack_from(">d", data, s)[0]
    raise ValueError(f"EBML float of {n} bytes")


def parse_webm_meta(data: bytes) -> dict:
    """WebM/Matroska metadata: {container, brand (DocType), width,
    height, duration_ms}.  Raises ValueError when not EBML."""
    if not data.startswith(_EBML_HEADER):
        raise ValueError("not EBML")
    doctype = None
    timescale_ns = 1_000_000  # Matroska default TimecodeScale
    duration_ticks = None
    width = height = 0

    def walk(start: int, end: int) -> None:
        nonlocal doctype, timescale_ns, duration_ticks, width, height
        for eid, s, e in _iter_ebml(data, start, end):
            if eid == _ID_DOCTYPE:
                doctype = data[s:e].decode("latin-1").rstrip("\x00")
            elif eid == _ID_TIMECODESCALE:
                timescale_ns = _ebml_uint(data, s, e)
            elif eid == _ID_DURATION:
                duration_ticks = _ebml_float(data, s, e)
            elif eid == _ID_PIXELWIDTH:
                width = _ebml_uint(data, s, e)
            elif eid == _ID_PIXELHEIGHT:
                height = _ebml_uint(data, s, e)
            elif eid in _CONTAINERS:
                walk(s, e)

    # top level: EBML header element then Segment
    for eid, s, e in _iter_ebml(data, 0, len(data)):
        if eid == 0x1A45DFA3:
            walk(s, e)
        elif eid == _ID_SEGMENT:
            walk(s, e)
    duration_ms = (
        None
        if duration_ticks is None
        else duration_ticks * timescale_ns / 1_000_000.0
    )
    return {
        "container": "webm",
        "brand": doctype,
        "width": int(width),
        "height": int(height),
        "duration_ms": duration_ms,
    }


def _ebml_size(n: int) -> bytes:
    # minimal-length size encoding with the leading marker bit
    for length in range(1, 9):
        if n < (1 << (7 * length)) - 1:
            out = bytearray(length)
            v = n | (1 << (7 * length))
            for i in range(length - 1, -1, -1):
                out[i] = v & 0xFF
                v >>= 8
            return bytes(out)
    raise ValueError("EBML size too large")


def _el(eid: int, payload: bytes) -> bytes:
    nbytes = max(1, (eid.bit_length() + 7) // 8)
    return eid.to_bytes(nbytes, "big") + _ebml_size(len(payload)) + payload


def _uint_bytes(v: int) -> bytes:
    return v.to_bytes(max(1, (v.bit_length() + 7) // 8), "big")


def build_webm(
    width: int, height: int, duration_ms: float, timescale_ns: int = 1_000_000
) -> bytes:
    """Deterministic minimal WebM fixture: EBML header (DocType webm) +
    Segment(Info(TimecodeScale, Duration) + Tracks(TrackEntry(Video)))."""
    header = _el(
        0x1A45DFA3,
        _el(0x4286, b"\x01")  # EBMLVersion
        + _el(0x42F7, b"\x01")  # EBMLReadVersion
        + _el(_ID_DOCTYPE, b"webm")
        + _el(0x4287, b"\x02")  # DocTypeVersion
        + _el(0x4285, b"\x02"),  # DocTypeReadVersion
    )
    duration_ticks = duration_ms * 1_000_000.0 / timescale_ns
    info = _el(
        _ID_INFO,
        _el(_ID_TIMECODESCALE, _uint_bytes(timescale_ns))
        + _el(_ID_DURATION, struct.pack(">d", duration_ticks)),
    )
    video = _el(
        _ID_VIDEO,
        _el(_ID_PIXELWIDTH, _uint_bytes(width)) + _el(_ID_PIXELHEIGHT, _uint_bytes(height)),
    )
    track = _el(_ID_TRACKENTRY, _el(0xD7, b"\x01") + _el(0x83, b"\x01") + video)
    tracks = _el(_ID_TRACKS, track)
    return header + _el(_ID_SEGMENT, info + tracks)


# -- dispatch ------------------------------------------------------------------


def parse_video_meta(data: bytes) -> dict:
    """Sniff + parse either container; ValueError for anything
    unparseable (stray struct/index errors from adversarially
    truncated headers are folded into the documented contract)."""
    try:
        if len(data) >= 12 and data[4:8] == b"ftyp":
            return parse_mp4_meta(data)
        if data.startswith(_EBML_HEADER):
            return parse_webm_meta(data)
    except (struct.error, IndexError) as ex:
        raise ValueError(f"malformed video container: {ex}") from ex
    raise ValueError("not a recognized video container")
