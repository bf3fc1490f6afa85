"""Property-based tests (hypothesis) for the pure kernels.

These complement the golden/fuzz gates with generative invariants:
batch/scalar parity under arbitrary text, filter no-false-negatives,
robots longest-match consistency, codec round-trips.
"""

import numpy as np
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from ccspark import hashing, media, politeness, seenset
from ccspark import urlkernel as K
from ccspark import urls as U

# keep hypothesis fast in CI: bounded examples, no deadline flakes
_FAST = settings(max_examples=150, deadline=None)


@_FAST
@given(st.lists(st.text(min_size=0, max_size=80), min_size=1, max_size=40))
def test_canonicalize_batch_always_matches_scalar(texts):
    urls_in = ["http://" + t for t in texts] + texts
    canon, _ = K.canonicalize_batch_kernel(pd.Series(urls_in, dtype=object))
    for i, u in enumerate(urls_in):
        assert canon.iloc[i] == U.canonicalize_url(u)


@_FAST
@given(st.text(min_size=0, max_size=120))
def test_canonicalize_idempotent_when_valid(s):
    c = U.canonicalize_url("http://" + s)
    if c is not None:
        again = U.canonicalize_url(c)
        # canonical output must be a fixed point (or become invalid only
        # never — a canonical URL always reparses)
        assert again == U.canonicalize_url(again)


@_FAST
@given(st.lists(st.integers(min_value=-(2**62), max_value=2**62), min_size=0, max_size=500))
def test_bloom_no_false_negatives(keys):
    arr = np.unique(np.array(keys, dtype=np.int64)) if keys else np.array([], dtype=np.int64)
    k, m, bits = seenset.bloom_build(arr)
    if len(arr):
        assert seenset.bloom_probe(arr, k, m, bits).all()


@_FAST
@given(st.lists(st.integers(min_value=-(2**62), max_value=2**62), min_size=0, max_size=500))
def test_cuckoo_no_false_negatives(keys):
    arr = np.unique(np.array(keys, dtype=np.int64)) if keys else np.array([], dtype=np.int64)
    s, nb, bits = seenset.cuckoo_build(arr)
    if len(arr):
        assert seenset.cuckoo_probe(arr, s, nb, bits).all()


@_FAST
@given(
    st.lists(
        st.tuples(
            st.text(alphabet="/ab*$.", min_size=1, max_size=12),
            st.booleans(),
        ),
        max_size=8,
    ),
    st.text(alphabet="/ab.", min_size=1, max_size=16),
)
def test_robots_decision_consistent_with_bruteforce(rules, path):
    import re

    got = politeness.robots_decision(path, rules)
    # brute-force reference: evaluate every rule, longest wins, tie→allow
    best = (-1, True)
    for pattern, allow in rules:
        if re.match(politeness._pattern_to_regex(pattern), path):
            key = (len(pattern), allow)
            if key[0] > best[0] or (key[0] == best[0] and allow and not best[1]):
                best = key
    assert got == best[1]


@_FAST
@given(
    st.integers(min_value=1, max_value=12),
    st.integers(min_value=1, max_value=12),
    st.integers(min_value=0, max_value=2),
)
def test_png_roundtrip_property(w, h, mode):
    rng = np.random.RandomState(w * 100 + h * 10 + mode)
    if mode == 0:
        img = rng.randint(0, 256, size=(h, w), dtype=np.uint8)
        _, _, c, out = media.decode_png(media.encode_png(img))
        assert np.array_equal(out[:, :, 0], img)
    else:
        ch = 3 if mode == 1 else 4
        img = rng.randint(0, 256, size=(h, w, ch), dtype=np.uint8)
        _, _, c, out = media.decode_png(media.encode_png(img))
        assert c == ch and np.array_equal(out, img)


@_FAST
@given(st.binary(min_size=0, max_size=64))
def test_simhash_bytes_deterministic_and_bounded(data):
    a = hashing.simhash64_bytes(data)
    assert a == hashing.simhash64_bytes(data)
    assert -(2**63) <= a < 2**63
    if len(data) < 8:
        assert a == 0
