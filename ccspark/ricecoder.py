"""Rice/Golomb coding — port of the reference's RiceCoder
(util/shared/RiceCoder.java:39-209), the H8 bit-packed long-sequence
codec (posting-list-shaped data).

Bit layout per item (LSB-first bit addressing within bytes, i.e. bit n
lives at bits[n >> 3] bit (n & 7)):

    [sign bit (signed mode)] [q unary 1s] [stop 0] [m-bit remainder,
    MSB-first]

with q = (|x| >> m) and remainder = x & ((1 << m) - 1) — note the Java
remainder is taken from the PRE-negation x only for Long.MIN_VALUE
(which cannot be negated); all other negatives encode |x|.

``encode`` is fully vectorized: per-item bit lengths → cumsum start
positions → one scatter of the unary ones (repeat + ranged arange) and
one (N, m) scatter of the remainder bits → a single
``np.bitwise_or.at`` into the byte array.  ``decode`` walks items with
a precomputed next-zero index (one vectorized backward scan), so the
per-item work is O(1) + an m-bit dot product.

Golden-gated byte-for-byte against the compiled reference encoder
(.scratch/rice/GoldenRice.java → tests/data/rice_golden.tsv).
"""

from __future__ import annotations

import numpy as np


def encode(values, m: int, signed: bool = False) -> tuple[int, bytes]:
    """Rice-encode int64 values → (nbits, packed bytes)."""
    if m < 0 or m > 64:
        raise ValueError("m < 0 || m > 64")
    vals = np.asarray(values, dtype=np.int64)
    n = len(vals)
    if n == 0:
        return 0, b""
    neg = vals < 0
    # Java: x = -val except Long.MIN_VALUE stays (cannot negate)
    x = np.where(neg & (vals != np.iinfo(np.int64).min), -vals, vals)
    # q = Math.abs(x >> m): arithmetic shift then abs (the MIN_VALUE
    # residue path relies on this exact order)
    with np.errstate(over="ignore"):
        q = np.abs(x >> np.int64(m)).astype(np.int64)
    rem = (x & np.int64((1 << m) - 1)) if m > 0 else np.zeros(n, dtype=np.int64)

    s = 1 if signed else 0
    lens = s + q + 1 + m
    starts = np.zeros(n, dtype=np.int64)
    np.cumsum(lens[:-1], out=starts[1:])
    nbits = int(starts[-1] + lens[-1])

    one_positions = []
    if signed:
        one_positions.append(starts[neg])  # sign bits that are 1
    # unary runs: for item i, ones at [starts+s, starts+s+q)
    total_ones = int(q.sum())
    if total_ones:
        base = np.repeat(starts + s, q)
        offs = np.arange(total_ones, dtype=np.int64) - np.repeat(
            np.concatenate([[0], np.cumsum(q)[:-1]]), q
        )
        one_positions.append(base + offs)
    if m > 0:
        # remainder bits, MSB first: bit j (1-based from MSB) at
        # starts + s + q + 1 + (j-1)
        bitvals = (rem[:, None] >> np.arange(m - 1, -1, -1, dtype=np.int64)[None, :]) & 1
        grid = (starts + s + q + 1)[:, None] + np.arange(m, dtype=np.int64)[None, :]
        one_positions.append(grid[bitvals.astype(bool)])
    out = np.zeros((nbits + 7) // 8, dtype=np.uint8)
    if one_positions:
        pos = np.concatenate([p.ravel() for p in one_positions])
        np.bitwise_or.at(out, pos >> 3, (np.uint8(1) << (pos & 7).astype(np.uint8)))
    return nbits, out.tobytes()


def decode(nbits: int, data: bytes, size: int, m: int, signed: bool = False):
    """Decode ``size`` items (RiceCoder.getItems semantics)."""
    arr = np.frombuffer(data, dtype=np.uint8)
    bits = np.unpackbits(arr, bitorder="little")[: max(nbits, 0)]
    # next zero at or after j, one backward vectorized scan
    idx = np.arange(len(bits), dtype=np.int64)
    zero_at = np.where(bits == 0, idx, np.int64(len(bits)))
    next0 = np.minimum.accumulate(zero_at[::-1])[::-1]
    powers = (np.int64(1) << np.arange(m - 1, -1, -1, dtype=np.int64)) if m else None
    out = np.zeros(size, dtype=np.int64)
    p = 0
    for i in range(size):
        negative = False
        if signed:
            negative = bits[p] == 1
            p += 1
        z = int(next0[p]) if p < len(bits) else p
        q = z - p
        p = z + 1
        binary = int(bits[p : p + m] @ powers) if m else 0
        p += m
        v = (q << m) + binary
        out[i] = -v if negative else v
    return out


def bits_used(values, m: int, signed: bool = False) -> int:
    """Closed-form encoded size in bits (what addItem returns, summed):
    per item sign + unary + stop + m."""
    vals = np.asarray(values, dtype=np.int64)
    neg = vals < 0
    x = np.where(neg & (vals != np.iinfo(np.int64).min), -vals, vals)
    with np.errstate(over="ignore"):
        q = np.abs(x >> np.int64(m)).astype(np.int64)
    s = 1 if signed else 0
    return int((s + q + 1 + m).sum())
