"""Golden-vector tests for ccspark.hashing.

Expected values were produced by compiling and running the reference's
FPGenerator/MurmurHash (util/shared/FPGenerator.java, MurmurHash.java) and a
Java replica of SimHash.computeOptimizedSimHashForString /
Filter.getHashBuckets(long) with Java 17.
"""

import numpy as np
import pytest

from ccspark import hashing as H

FP_STR_VECTORS = [
    ("", -2935493925047926053),
    ("a", 4496813661046392933),
    ("http://example.com/", 5428837642025511573),
    ("www.example.com", -5335631283462869869),
    ("example.com", -5746976342330023037),
    ("http://cnn.com/index.html?q=1", 2974073658405192014),
    ("é中\U0001f600x", -9154843162000633464),
    ("foo.co.uk", -4508039237194417434),
    ("http://sub.domain.co.uk:8080/path?x=y", 7463084402204449620),
]

FP_BYTES_VECTORS = [
    (b"", -2935493925047926053),
    (b"\x00", 8541707973688392103),
    (bytes([1, 2, 3, 4, 5, 6, 7, 8]), -1941849407941133240),
    (bytes([255, 254, 253, 252, 251, 250, 249, 248]), -5458032733007852916),
    (b"hello world", -1964894590628140391),
]

MM_STR_VECTORS = [  # (s, h1, h2) over Java getBytes("UTF-16")
    ("", 0, 0),
    ("a", 119085945, 1329726608),
    ("http://example.com/", -95510692, 1884674532),
    ("key123", 824678186, -1747220811),
]

MM_LONG_VECTORS = [  # (key, h1, h2) over 8 big-endian bytes
    (0, -1817103684, 600446955),
    (1, 875791101, 868223832),
    (-1, 1274919728, -1937471750),
    (123456789012345, 1125281835, 2015181875),
    (-(2**63), 801122395, 188512206),
    (-987654321, 910042366, -161239618),
]

MM_BYTES_VECTORS = [  # (bytes, h(seed=0), h(seed=12345))
    (b"", 0, 1907878902),
    (b"\x00", -380735811, -1973776617),
    (bytes([1, 2, 3, 4, 5, 6, 7, 8]), 829903550, -90745815),
    (bytes([255, 254, 253, 252, 251, 250, 249, 248]), 1161357735, 1680753722),
    (b"hello world", 933869558, -1392596601),
]

SIMHASH_VECTORS = [
    ("the quick brown fox jumps over the lazy dog", 2167600701968203183),
    ("the quick brown fox jumps over the lazy cat", 2239588056110896559),
    ("hello", 513763598315047424),
    ("abc", 0),
    ("aaaaaaaaaa", -524014775814316498),
    ("Web crawling at scale requires politeness", 7571302028407484820),
]

BLOOM_BUCKET_VECTORS = [  # hash_count=7, num_buckets=10048 (BitSet(10020).size())
    (0, [3268, 4697, 6126, 7555, 1064, 9683, 8254]),
    (1, [7421, 3669, 19, 3771, 2525, 8821, 5069]),
    (-1, [9392, 6998, 6692, 9698, 3992, 7698, 8692]),
    (5428837642025511573, [4354, 1924, 1782, 4496, 9258, 7068, 6686]),
    (-5335631283462869869, [2741, 7035, 3221, 6555, 3701, 6075, 4181]),
]


def test_fp64_utf16_golden():
    strs = [s for s, _ in FP_STR_VECTORS]
    out = H.fp64_utf16(strs)
    assert out.tolist() == [v for _, v in FP_STR_VECTORS]


def test_fp64_bytes_golden():
    out = H.fp64_bytes([b for b, _ in FP_BYTES_VECTORS])
    assert out.tolist() == [v for _, v in FP_BYTES_VECTORS]


def test_fp64_uint64s_matches_bytes_path():
    vals = np.array([0x0102030405060708, 0xFFFEFDFCFBFAF9F8], dtype=np.uint64)
    out = H.fp64_uint64s(vals)
    assert out.tolist() == [-1941849407941133240, -5458032733007852916]


def test_murmur2_utf16_string_golden():
    strs = [s for s, _, _ in MM_STR_VECTORS]
    h1 = H.murmur2_utf16_string(strs, 0)
    assert h1.tolist() == [a for _, a, _ in MM_STR_VECTORS]
    h2 = np.array(
        [H.murmur2_utf16_string([s], int(h))[0] for s, h in zip(strs, h1)],
        dtype=np.int32,
    )
    assert h2.tolist() == [b for _, _, b in MM_STR_VECTORS]


def test_murmur2_fixed8_golden():
    keys = np.array([k for k, _, _ in MM_LONG_VECTORS], dtype=np.int64)
    h1 = H.murmur2_fixed8(keys, np.zeros(len(keys), dtype=np.int32))
    assert h1.tolist() == [a for _, a, _ in MM_LONG_VECTORS]
    h2 = H.murmur2_fixed8(keys, h1)
    assert h2.tolist() == [b for _, _, b in MM_LONG_VECTORS]


def test_murmur2_bytes_golden():
    bufs = [b for b, _, _ in MM_BYTES_VECTORS]
    assert H.murmur2_bytes(bufs, 0).tolist() == [a for _, a, _ in MM_BYTES_VECTORS]
    assert H.murmur2_bytes(bufs, 12345).tolist() == [b for _, _, b in MM_BYTES_VECTORS]


def test_bloom_buckets_long_golden():
    keys = np.array([k for k, _ in BLOOM_BUCKET_VECTORS], dtype=np.int64)
    out = H.bloom_buckets_long(keys, 7, 10048)
    for row, (_, expected) in zip(out, BLOOM_BUCKET_VECTORS):
        assert row.tolist() == expected


@pytest.mark.parametrize("text,expected", SIMHASH_VECTORS)
def test_simhash_golden(text, expected):
    assert H.simhash64(text) == expected


def test_simhash_batch():
    out = H.simhash64_batch([t for t, _ in SIMHASH_VECTORS])
    assert out.tolist() == [v for _, v in SIMHASH_VECTORS]


def test_hamming_distance():
    a = np.array([0, -1, 2167600701968203183], dtype=np.int64)
    b = np.array([0, 0, 2239588056110896559], dtype=np.int64)
    d = H.hamming_distance(a, b)
    assert d[0] == 0 and d[1] == 64
    assert 0 < d[2] <= 64


# ---------------------------------------------------------------------------
# SimHash byte-gram variant (SimHash.computeOptimizedSimHashForBytes)
# golden vectors from the compiled reference (.scratch/golden/GoldenSimBytes)
# ---------------------------------------------------------------------------

import random as _random

SIMBYTES_GOLDEN = [
    (0, 0),
    (3, 0),
    (8, -1957060269096707870),
    (9, 577169538013986835),
    (20, -1083687871794016415),
    (64, 2488626553362086124),
    (100, 6404424388718635568),
    (255, -3417980843398890563),
    (256, 415928487207929100),
    (1000, 8237061031129554136),
    (4096, -1926422448258440630),
    (5000, 2102127716431777682),
]


def _java_random_bytes(seed: int, sizes):
    """java.util.Random(seed).nextBytes replayed exactly."""
    class JR:
        def __init__(self, seed):
            self.s = (seed ^ 0x5DEECE66D) & ((1 << 48) - 1)

        def _next(self, bits):
            self.s = (self.s * 0x5DEECE66D + 0xB) & ((1 << 48) - 1)
            v = self.s >> (48 - bits)
            return v - (1 << bits) if v >= (1 << (bits - 1)) else v

        def next_bytes(self, n):
            out = bytearray(n)
            i = 0
            while i < n:
                rnd = self._next(32)
                for _ in range(min(4, n - i)):
                    out[i] = rnd & 0xFF
                    rnd >>= 8
                    i += 1
            return bytes(out)

    jr = JR(seed)
    return [jr.next_bytes(n) for n in sizes]


def test_simhash_bytes_golden():
    sizes = [n for n, _ in SIMBYTES_GOLDEN]
    payloads = _java_random_bytes(11, sizes)
    for (n, want), data in zip(SIMBYTES_GOLDEN, payloads):
        assert H.simhash64_bytes(data) == want, n
    txt = b"the quick brown fox jumps over the lazy dog repeatedly and often"
    assert H.simhash64_bytes(txt) == 8551673559024904379


def test_simhash_bytes_edge():
    assert H.simhash64_bytes(None) == 0
    assert H.simhash64_bytes(b"") == 0
    assert H.simhash64_bytes(b"1234567") == 0  # < 8 bytes


def test_hamming_distance_vectorized():
    import numpy as np

    a = np.array([0, -1, 0x0F0F0F0F0F0F0F0F, 123456789], dtype=np.int64)
    b = np.array([0, 0, 0, 0], dtype=np.int64)
    got = H.hamming_distance(a, b).tolist()
    want = [bin((int(x) ^ 0) & (2**64 - 1)).count("1") for x in a.view(np.uint64)]
    assert got == want


def test_rice_coder_golden_vectors():
    """ricecoder encode/decode/bits_used byte-identical to the compiled
    reference RiceCoder (tests/data/rice_golden.tsv, 23 vectors across
    m=0..33 signed+unsigned incl. randoms)."""
    import os

    from ccspark import ricecoder

    path = os.path.join(os.path.dirname(__file__), "data", "rice_golden.tsv")
    n = 0
    for line in open(path, encoding="ascii"):
        m, signed, vals, nbits, hexbits, dec = line.rstrip("\n").split("\t")
        m, signed, nbits = int(m), signed == "1", int(nbits)
        values = [int(x) for x in vals.split(",")]
        got_bits, got_bytes = ricecoder.encode(values, m, signed)
        assert got_bits == nbits
        assert got_bytes == bytes.fromhex(hexbits)
        back = ricecoder.decode(nbits, got_bytes, len(values), m, signed)
        assert list(back) == [int(x) for x in dec.split(",")]
        assert ricecoder.bits_used(values, m, signed) == nbits
        n += 1
    assert n == 23


def test_rice_coder_fuzz_roundtrip():
    import numpy as np

    from ccspark import ricecoder

    rng = np.random.default_rng(21)
    for m in (0, 1, 5, 9, 17, 30):
        for signed in (False, True):
            vals = rng.integers(
                -(1 << (m + 8)) if signed else 0, 1 << (m + 8), size=200
            ).astype(np.int64)
            nbits, data = ricecoder.encode(vals, m, signed)
            back = ricecoder.decode(nbits, data, len(vals), m, signed)
            assert (back == vals).all(), (m, signed)
