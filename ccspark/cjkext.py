"""Decoders for the two Java-only charsets the reference's
CharsetUtils.decode can resolve but CPython lacks: x-IBM964 (EUC-TW /
CNS 11643) and ISO-2022-CN.

Mapping tables are mechanically extracted from the JVM's own decoders
(ccspark/data/cjk_tables.py, .scratch/cjk/ExtractCJK.java); the
malformed-input behavior (how many bytes one U+FFFD consumes, resync
points, shift/escape edge cases, the underflow-at-EOF rule where a
partial multi-byte unit swallows the rest of the stream as ONE
replacement) was pinned by probing the same JVM and is asserted
byte-for-byte on ~4000 fuzz goldens (tests/data/cjk_fuzz.tsv,
.scratch/cjk/FuzzCJK.java) in tests/test_chardet.py.

Discovered semantics worth naming:

* x-IBM964: SS2 (0x8E) units are 4 bytes; only planes 0xA2/0xAC/0xAD
  (CNS 2/12/13) exist — any other plane byte is a 2-byte malformed
  unit; an invalid first GR byte makes a 3-byte unit, an invalid
  second a 4-byte one.  GR pairs consume 2 bytes even when the trail
  is invalid.  Singles 0x00-0x9F are identity EXCEPT 0x8E/0x8F.
* ISO-2022-CN: G1 initially designates GB2312, G2 CNS-plane-2 and G3
  CNS-plane-3 (SS3 via ESC O works undesignated too)
  (Java starts with working defaults, so SO/SS2 decode without any
  escape!); in shifted mode bytes are consumed as blind 2-byte units
  (ESC/SI as a TRAIL byte is swallowed), while a unit-leading ESC is
  still escape-processed; shifted pair bytes are masked & 0x7F first
  (GR bytes decode like their GL twins); ESC $ A is a silent legacy
  GB designation; bad ESC $ )/* X designations consume 4 bytes and
  leave the designation unchanged, ESC $ X three, other bad escapes
  two; unshifted bytes are identity (latin-1 pass-through, including
  0x80-0xFF).

This closes the last documented decode divergence vs CharsetUtils:
previously these two names decoded to None.
"""

from __future__ import annotations

from .data.cjk_tables import (
    IBM964_P1,
    IBM964_P2,
    IBM964_P12,
    IBM964_P13,
    IBM964_SINGLES,
    ISO2022CN_CNS1,
    ISO2022CN_CNS2,
    ISO2022CN_CNS3,
    ISO2022CN_GB,
)

_R = "\ufffd"
_964_PLANES = {0xA2: IBM964_P2, 0xAC: IBM964_P12, 0xAD: IBM964_P13}


def decode_euc_tw(data: bytes) -> str:
    """x-IBM964 byte stream -> str (Java Charset.decode REPLACE policy)."""
    out: list[str] = []
    i = 0
    n = len(data)
    while i < n:
        b = data[i]
        if b == 0x8E:
            if n - i < 4:
                # decoder needs a full 4-byte SS2 unit; at end-of-input
                # the partial tail is ONE malformed unit
                out.append(_R)
                break
            p = data[i + 1]
            tbl = _964_PLANES.get(p)
            if tbl is None:
                out.append(_R)
                i += 2
                continue
            l = data[i + 2]
            if not (0xA1 <= l <= 0xFE):
                out.append(_R)
                i += 3
                continue
            t = data[i + 3]
            if 0xA1 <= t <= 0xFE:
                out.append(tbl[(l - 0xA1) * 94 + (t - 0xA1)])
            else:
                out.append(_R)
            i += 4
            continue
        if 0xA1 <= b <= 0xFE:
            if i + 1 >= n:
                out.append(_R)
                break
            t = data[i + 1]
            if 0xA1 <= t <= 0xFE:
                out.append(IBM964_P1[(b - 0xA1) * 94 + (t - 0xA1)])
            else:
                out.append(_R)
            i += 2
            continue
        out.append(IBM964_SINGLES[b])
        i += 1
    return "".join(out)


_ESC = 0x1B
_SO = 0x0E
_SI = 0x0F


def decode_iso2022_cn(data: bytes) -> str:
    """ISO-2022-CN byte stream -> str (Java Charset.decode REPLACE
    policy); see module docstring for the pinned edge semantics."""
    out: list[str] = []
    i = 0
    n = len(data)
    g1 = ISO2022CN_GB  # Java's initial G1 designation
    shifted = False
    while i < n:
        b = data[i]
        if b == _ESC:
            rem = n - i
            if rem < 2:
                out.append(_R)
                break
            b1 = data[i + 1]
            if b1 in (0x4E, 0x4F):  # SS2 / SS3: 4-byte single-shot
                # from G2 (CNS-2) / G3 (CNS-3); pair bytes masked & 0x7F
                if rem < 4:
                    out.append(_R)
                    break
                l, t = data[i + 2] & 0x7F, data[i + 3] & 0x7F
                tbl = ISO2022CN_CNS2 if b1 == 0x4E else ISO2022CN_CNS3
                if 0x21 <= l <= 0x7E and 0x21 <= t <= 0x7E:
                    out.append(tbl[(l - 0x21) * 94 + (t - 0x21)])
                else:
                    out.append(_R)
                i += 4
                continue
            if b1 == 0x24:
                if rem < 3:
                    out.append(_R)
                    break
                b2 = data[i + 2]
                if b2 == 0x41:
                    # legacy ESC $ A: silent GB2312 designation (the
                    # ISO-2022-JP-style form Java accepts)
                    g1 = ISO2022CN_GB
                    i += 3
                    continue
                if b2 in (0x29, 0x2A, 0x2B):
                    if rem < 4:
                        out.append(_R)
                        break
                    b3 = data[i + 3]
                    if b2 == 0x29 and b3 == 0x41:
                        g1 = ISO2022CN_GB
                    elif b2 == 0x29 and b3 == 0x47:
                        g1 = ISO2022CN_CNS1
                    elif b2 == 0x2A and b3 == 0x48:
                        pass  # G2 := CNS-2, already the default
                    elif b2 == 0x2B and b3 == 0x49:
                        pass  # G3 := CNS-3, already the default
                    else:
                        out.append(_R)  # bad designation: 4 bytes, state kept
                    i += 4
                    continue
                out.append(_R)
                i += 3
                continue
            out.append(_R)
            i += 2
            continue
        if b == _SO:
            shifted = True
            i += 1
            continue
        if b == _SI:
            shifted = False
            i += 1
            continue
        if not shifted:
            out.append(chr(b))  # identity pass-through incl. 0x80-0xFF
            i += 1
            continue
        # shifted: blind 2-byte units (a trailing ESC/SI is swallowed);
        # Java masks bit 7 first, so GR bytes decode like their GL twins
        if i + 1 >= n:
            out.append(_R)
            break
        lo = b & 0x7F
        t = data[i + 1] & 0x7F
        if 0x21 <= lo <= 0x7E and 0x21 <= t <= 0x7E:
            out.append(g1[(lo - 0x21) * 94 + (t - 0x21)])
        else:
            out.append(_R)
        i += 2
    return "".join(out)
