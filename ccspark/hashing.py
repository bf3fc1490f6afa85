"""Vectorized (numpy) hash primitives matching the reference crawl engine.

Reproduces, bit-for-bit, the hash functions that define crawl identity in
commoncrawl/commoncrawl (see /root/reference):

* ``fp64`` — Rabin fingerprint over GF(2^64) ("FPGenerator.std64",
  reference util/shared/FPGenerator.java:49-500).  Polynomials are
  represented with the least-significant coefficient in the most
  significant bit; for degree 64 the final ``reduce`` step is the
  identity, so the fingerprint is a per-unit fold of table lookups.
  Strings are fingerprinted per UTF-16 code unit
  (FPGenerator.fp(CharSequence), :271-278); byte arrays per byte
  (:248-253).
* ``murmur2`` — MurmurHash 2.0, 32-bit (util/shared/MurmurHash.java:66-115),
  with Java int wrap-around semantics.
* bloom double-hashing bucket scheme (util/shared/Filter.java:69-104):
  ``abs((h1 + i*h2) % m)`` with ``h1 = murmur2(key, 0)``,
  ``h2 = murmur2(key, h1)``; long keys hashed over their 8 big-endian
  bytes, string keys over Java's "UTF-16" encoding (BOM + UTF-16BE).
* ``simhash64`` — the optimized 4-char-gram simhash
  (util/shared/SimHash.java:55-106).

Everything here is batch-vectorized with numpy so it can run inside Arrow
pandas UDFs without per-row Python (BASELINE.json input_hint).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

_STD64_POLY = 0xD74307D3FD3382DB  # FPGenerator.polynomials[64][0]
_DEGREE = 64
_ONE = 0x8000000000000000
_M64 = 0xFFFFFFFFFFFFFFFF


def _build_tables(polynomial: int):
    """Port of the FPGenerator table precompute (FPGenerator.java:364-403)."""
    power = [0] * 128
    x_to_the_i = _ONE
    x_deg_minus_1 = _ONE >> (_DEGREE - 1)
    for i in range(128):
        power[i] = x_to_the_i
        overflow = (x_to_the_i & x_deg_minus_1) != 0
        x_to_the_i >>= 1
        if overflow:
            x_to_the_i ^= polynomial
    empty = power[64]
    table = np.zeros((16, 256), dtype=np.uint64)
    for i in range(16):
        for j in range(256):
            v = 0
            for k in range(8):
                if j & (1 << k):
                    v ^= power[127 - i * 8 - k]
            table[i][j] = v
    return np.uint64(empty), table


_FP_EMPTY, _FP_TABLE = _build_tables(_STD64_POLY)
_T0, _T1, _T2, _T3, _T4, _T5, _T6, _T7 = (_FP_TABLE[i] for i in range(8))
_U8 = np.uint64(8)
_U16 = np.uint64(16)
_MASK8 = np.uint64(0xFF)


def _extend_char(f: np.ndarray, v: np.ndarray) -> np.ndarray:
    """FPGenerator.extend_char for a vector of fingerprints (uint64)."""
    f = f ^ v
    return (f >> _U16) ^ _T6[(f & _MASK8).astype(np.int64)] ^ _T7[((f >> _U8) & _MASK8).astype(np.int64)]


def _extend_byte(f: np.ndarray, v: np.ndarray) -> np.ndarray:
    """FPGenerator.extend_byte for a vector of fingerprints (uint64)."""
    f = f ^ v
    return (f >> _U8) ^ _T7[(f & _MASK8).astype(np.int64)]


def _utf16_matrix(strings) -> tuple[np.ndarray, np.ndarray]:
    """Encode a sequence of python strings to a padded uint16 code-unit
    matrix plus a length vector (lengths in UTF-16 code units, matching
    Java String.charAt iteration).

    Single concatenated encode + one vectorized scatter — no per-row
    matrix fill loop."""
    n = len(strings)
    if n == 0:
        return np.zeros((0, 1), dtype=np.uint16), np.zeros(0, dtype=np.int64)
    bufs = [("" if s is None else s).encode("utf-16-be") for s in strings]
    lens = np.fromiter((len(b) >> 1 for b in bufs), dtype=np.int64, count=n)
    maxlen = int(lens.max())
    mat = np.zeros((n, max(maxlen, 1)), dtype=np.uint16)
    total = int(lens.sum())
    if total:
        flat = np.frombuffer(b"".join(bufs), dtype=">u2").astype(np.uint16)
        starts = np.zeros(n, dtype=np.int64)
        np.cumsum(lens[:-1], out=starts[1:])
        # dest index of unit k of row i = i*maxlen + (k - starts[i])
        rows_off = np.repeat(np.arange(n, dtype=np.int64) * maxlen - starts, lens)
        mat.ravel()[np.arange(total, dtype=np.int64) + rows_off] = flat
    return mat, lens


def fp64_utf16(strings) -> np.ndarray:
    """Rabin FP64 of each string (over UTF-16 code units), as int64.

    Matches FPGenerator.std64.fp(CharSequence) exactly (null → fp of "").
    Rows are processed in descending-length order so each column step
    touches only the still-active prefix (no full-width masking)."""
    mat, lens = _utf16_matrix(strings)
    n, maxlen = mat.shape
    order = np.argsort(-lens, kind="stable")
    mat = mat[order]
    sorted_lens = lens[order]
    f = np.full(n, _FP_EMPTY, dtype=np.uint64)
    # active rows at column j form a prefix of the sorted order
    for j in range(maxlen):
        k = int(np.searchsorted(-sorted_lens, -(j + 1), side="right"))
        if k == 0:
            break
        f[:k] = _extend_char(f[:k], mat[:k, j].astype(np.uint64))
    out = np.empty(n, dtype=np.uint64)
    out[order] = f
    return out.view(np.int64)


def fp64_bytes_matrix(mat: np.ndarray, lens: np.ndarray) -> np.ndarray:
    """Rabin FP64 over rows of a padded uint8 matrix with given lengths."""
    n, maxlen = mat.shape
    f = np.full(n, _FP_EMPTY, dtype=np.uint64)
    for j in range(maxlen):
        active = lens > j
        if not active.any():
            break
        col = mat[:, j].astype(np.uint64)
        nf = _extend_byte(f, col)
        f = np.where(active, nf, f)
    return f.view(np.int64)


def fp64_bytes(bufs) -> np.ndarray:
    """Rabin FP64 of each bytes object, as int64 (FPGenerator.fp(byte[]))."""
    lens = np.fromiter((len(b) for b in bufs), dtype=np.int64, count=len(bufs))
    maxlen = int(lens.max()) if len(lens) else 0
    mat = np.zeros((len(bufs), max(maxlen, 1)), dtype=np.uint8)
    for i, b in enumerate(bufs):
        if b:
            mat[i, : lens[i]] = np.frombuffer(b, dtype=np.uint8)
    return fp64_bytes_matrix(mat, lens)


def fp64_uint64s(vals: np.ndarray) -> np.ndarray:
    """Rabin FP64 of each uint64 treated as 8 big-endian bytes.

    Vectorized equivalent of FPGenerator.std64.fp(longAsBytes, 0, 8) as used
    by the optimized simhash (SimHash.java:83-92)."""
    f = np.full(len(vals), _FP_EMPTY, dtype=np.uint64)
    for shift in range(56, -1, -8):
        byte = (vals >> np.uint64(shift)) & _MASK8
        f = _extend_byte(f, byte)
    return f.view(np.int64)


# ---------------------------------------------------------------------------
# MurmurHash 2.0 (32-bit), Java int semantics
# ---------------------------------------------------------------------------

_MM_M = np.uint32(0x5BD1E995)
_MM_R = np.uint32(24)
_U32 = np.uint32


def murmur2_fixed8(keys: np.ndarray, seeds: np.ndarray) -> np.ndarray:
    """murmur2 over the 8 big-endian bytes of each int64/uint64 key.

    Matches MurmurHash.hash(byte[8], 8, seed) via Filter.getHashBuckets(long)
    (Filter.java:85-104).  ``seeds`` is int32-like; returns int32.
    """
    k64 = keys.astype(np.uint64)
    h = (seeds.astype(np.uint32) ^ np.uint32(8)).astype(np.uint32)
    # two little-endian words assembled from big-endian byte layout:
    # word0 = bytes[3..0] = low half byteswapped... byte i = key >> (56-8i)
    # k(word0) = b3 | b2<<8 | b1<<16 | b0<<24  where b0..b3 = first 4 BE bytes
    b = [( (k64 >> np.uint64(56 - 8 * i)) & np.uint64(0xFF)).astype(np.uint32) for i in range(8)]
    w0 = b[0] | (b[1] << _U32(8)) | (b[2] << _U32(16)) | (b[3] << _U32(24))
    w1 = b[4] | (b[5] << _U32(8)) | (b[6] << _U32(16)) | (b[7] << _U32(24))
    with np.errstate(over="ignore"):
        for k in (w0, w1):
            k = (k * _MM_M).astype(np.uint32)
            k = k ^ (k >> _MM_R)
            k = (k * _MM_M).astype(np.uint32)
            h = (h * _MM_M).astype(np.uint32)
            h = h ^ k
        h = h ^ (h >> _U32(13))
        h = (h * _MM_M).astype(np.uint32)
        h = h ^ (h >> _U32(15))
    return h.view(np.int32)


def murmur2_bytes(bufs, seed: int = 0) -> np.ndarray:
    """murmur2 over variable-length byte strings (vectorized, padded).

    Matches MurmurHash.hash(byte[], len, seed) (MurmurHash.java:70-115),
    including the sign-extending tail reads (``(int) data[i] << 16`` uses the
    *signed* byte value).
    """
    n = len(bufs)
    lens = np.fromiter((len(b) for b in bufs), dtype=np.int64, count=n)
    maxlen = int(lens.max()) if n else 0
    mat = np.zeros((n, max(maxlen, 4)), dtype=np.uint8)
    for i, b in enumerate(bufs):
        if b:
            mat[i, : lens[i]] = np.frombuffer(b, dtype=np.uint8)
    h = np.full(n, np.uint32(seed & 0xFFFFFFFF), dtype=np.uint32) ^ lens.astype(np.uint32)
    len4 = lens >> 2
    nwords = int(len4.max()) if n else 0
    with np.errstate(over="ignore"):
        for w in range(nwords):
            active = len4 > w
            if not active.any():
                break
            i4 = w << 2
            k = (
                mat[:, i4].astype(np.uint32)
                | (mat[:, i4 + 1].astype(np.uint32) << _U32(8))
                | (mat[:, i4 + 2].astype(np.uint32) << _U32(16))
                | (mat[:, i4 + 3].astype(np.uint32) << _U32(24))
            )
            k = (k * _MM_M).astype(np.uint32)
            k = k ^ (k >> _MM_R)
            k = (k * _MM_M).astype(np.uint32)
            nh = (h * _MM_M).astype(np.uint32) ^ k
            h = np.where(active, nh, h)
        left = lens - (len4 << 2)
        if (left > 0).any():
            # Java sign-extends bytes: (int) data[i] << 16 etc.
            idx = np.arange(n)
            signed = mat.view(np.int8)
            tail_h = h.copy()
            t3 = left >= 3
            if t3.any():
                v = signed[idx[t3], (lens[t3] - 3)].astype(np.int32).view(np.uint32) << _U32(16)
                tail_h[t3] = tail_h[t3] ^ v
            t2 = left >= 2
            if t2.any():
                v = signed[idx[t2], (lens[t2] - 2)].astype(np.int32).view(np.uint32) << _U32(8)
                tail_h[t2] = tail_h[t2] ^ v
            t1 = left >= 1
            if t1.any():
                v = signed[idx[t1], (lens[t1] - 1)].astype(np.int32).view(np.uint32)
                tail_h[t1] = tail_h[t1] ^ v
                tail_h[t1] = (tail_h[t1] * _MM_M).astype(np.uint32)
            h = np.where(left > 0, tail_h, h)
        h = h ^ (h >> _U32(13))
        h = (h * _MM_M).astype(np.uint32)
        h = h ^ (h >> _U32(15))
    return h.view(np.int32)


def murmur2_utf16_string(strings, seed: int = 0) -> np.ndarray:
    """murmur2 over Java ``s.getBytes("UTF-16")`` bytes = BOM + UTF-16BE."""
    bufs = [b"" if s is None or s == "" else b"\xfe\xff" + s.encode("utf-16-be") for s in strings]
    return murmur2_bytes(bufs, seed)


# ---------------------------------------------------------------------------
# Bloom double-hashing bucket scheme (Filter.java:69-104)
# ---------------------------------------------------------------------------


def bloom_buckets_long(keys: np.ndarray, hash_count: int, num_buckets: int) -> np.ndarray:
    """Bucket indices (n, hash_count) for int64 keys.

    ``abs((h1 + i*h2) % max)`` with Java int32 wrap-around and Java ``%``
    (sign follows dividend) then ``Math.abs``.
    """
    h1 = murmur2_fixed8(keys, np.zeros(len(keys), dtype=np.int32))
    h2 = murmur2_fixed8(keys, h1)
    i = np.arange(hash_count, dtype=np.int64)[None, :]
    mixed = (h1.astype(np.int64)[:, None] + i * h2.astype(np.int64)[:, None])
    # wrap to int32
    mixed = ((mixed + 2**31) % 2**32 - 2**31).astype(np.int64)
    rem = np.fmod(mixed, num_buckets)  # C-style remainder == Java %
    return np.abs(rem).astype(np.int64)


# ---------------------------------------------------------------------------
# SimHash (SimHash.java:55-106) — optimized 4-char-gram variant
# ---------------------------------------------------------------------------


def simhash64(text: str | None) -> int:
    """64-bit simhash of a string via unique 4-char grams, reference-exact."""
    if not text:
        return 0
    units = np.frombuffer(text.encode("utf-16-be"), dtype=">u2").astype(np.uint64)
    if len(units) < 4:
        return 0
    grams = (units[:-3] << np.uint64(48)) | (units[1:-2] << np.uint64(32)) | (units[2:-1] << np.uint64(16)) | units[3:]
    grams = np.unique(grams)
    hashes = fp64_uint64s(grams).view(np.uint64)
    bits = ((hashes[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(np.int64)
    votes = (2 * bits - 1).sum(axis=0)
    out = 0
    for b in np.nonzero(votes > 0)[0]:
        out |= 1 << int(b)
    return out - (1 << 64) if out >= (1 << 63) else out


def simhash64_batch(texts) -> np.ndarray:
    """simhash64 over a sequence of strings → int64 array."""
    return np.fromiter((simhash64(t) for t in texts), dtype=np.int64, count=len(texts))


def simhash64_bytes(data: bytes | None) -> int:
    """64-bit simhash of a byte payload via unique 8-byte-gram shingles —
    port of SimHash.computeOptimizedSimHashForBytes (SimHash.java:107-171)
    including Java's sign-extension quirk: ``shingle |= data[pos]``
    sign-extends each byte to 64 bits before OR-ing, so a negative byte
    sets every bit above it in the packed shingle."""
    if not data or len(data) < 8:
        return 0
    b = np.frombuffer(data, dtype=np.int8)
    n = len(b) - 7
    with np.errstate(over="ignore"):
        sh = b[:n].astype(np.int64)
        for j in range(1, 8):
            sh = (sh << np.int64(8)) | b[j : j + n].astype(np.int64)
    grams = np.unique(sh).view(np.uint64)
    hashes = fp64_uint64s(grams).view(np.uint64)
    bits = ((hashes[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(np.int64)
    votes = (2 * bits - 1).sum(axis=0)
    out = 0
    for bpos in np.nonzero(votes > 0)[0]:
        out |= 1 << int(bpos)
    return out - (1 << 64) if out >= (1 << 63) else out


def simhash64_bytes_batch(bufs) -> np.ndarray:
    """simhash64_bytes over a sequence of byte payloads → int64 array."""
    return np.fromiter((simhash64_bytes(x) for x in bufs), dtype=np.int64, count=len(bufs))


def hamming_distance(a: pd.Series | np.ndarray, b: pd.Series | np.ndarray) -> np.ndarray:
    """Vectorized popcount of xor (SimHash.hammingDistance) — SWAR
    bit-twiddling, no per-row Python."""
    x = (np.asarray(a, dtype=np.int64).view(np.uint64)) ^ (np.asarray(b, dtype=np.int64).view(np.uint64))
    m1 = np.uint64(0x5555555555555555)
    m2 = np.uint64(0x3333333333333333)
    m4 = np.uint64(0x0F0F0F0F0F0F0F0F)
    h01 = np.uint64(0x0101010101010101)
    x = x - ((x >> np.uint64(1)) & m1)
    x = (x & m2) + ((x >> np.uint64(2)) & m2)
    x = (x + (x >> np.uint64(4))) & m4
    with np.errstate(over="ignore"):
        return ((x * h01) >> np.uint64(56)).astype(np.int32)
