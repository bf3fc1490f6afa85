"""Faithful port of the reference's charset detection stack.

Ports, exactly:

* ``nsVerifier.getNextState`` packed-nibble state machines
  (reference org/mozilla/intl/chardet/nsVerifier.java:73-88) over the
  bit-exact tables in ``ccspark.data.chardet_tables`` (mechanically
  extracted from the bundled Mozilla chardet sources).
* ``nsPSMDetector`` HandleData / Sample / DataEnd with the ALL verifier
  set (nsPSMDetector.java:205-320, 333-407) including the EUC sampler
  (nsEUCSampler.java) and the GB18030 two-survivor rule.
* ``CharsetUtils.detectCharacterEncoding`` (CharsetUtils.java:190-226)
  INCLUDING its quirk: the return value of ``detector.DoIt`` (which is
  ``mDone``) is assigned to ``isAscii``, so any detection that completes
  *during* streaming returns "ASCII"; only DataEnd-stage detections
  (GB18030-pair rule, sampler last chance) surface real charset names,
  and otherwise the first surviving verifier's name (or the literal
  string "nomatch") is returned.  Golden vectors in
  tests/test_chardet.py were produced by compiling the reference's own
  jchardet + the verbatim detectCharacterEncoding logic
  (.scratch/jchardet/GoldenCharset.java) and running it over legacy
  encoded fixture pages — the Python port must match them exactly.
* ``CharsetUtils.aliasCharset`` over the full 707-entry aliasTable
  (CharsetUtils.java:410-941, extracted to
  ``ccspark.data.charset_aliases``).

Java canonical charset names are then mapped to Python codecs for the
decode stage; the two Java-only charsets CPython lacks (x-IBM964 /
EUC-TW and ISO-2022-CN) decode through table-driven ports in
ccspark.cjkext whose tables and malformed-input semantics were
extracted from / fuzz-pinned against the JVM's own decoders.
"""

from __future__ import annotations

import numpy as np

from .data.charset_aliases import ALIAS_TABLE
from .data.chardet_tables import STATISTICS, VERIFIERS

_E_START, _E_ERROR, _E_ITSME = 0, 1, 2

# statistics slot per ALL-set verifier index (nsPSMDetector.java:225-241)
_STATS_BY_INDEX = {
    2: "EUCJPStatistics",
    4: "EUCKRStatistics",
    6: "Big5Statistics",
    7: "EUCTWStatistics",
    8: "GB2312Statistics",
}


def _unpack_nibbles(words: list[int], count: int) -> list[int]:
    """nsVerifier.getNextState nibble addressing: value i lives in
    words[i >> 3] at bit offset (i & 7) * 4."""
    return [(words[i >> 3] >> ((i & 7) << 2)) & 0xF for i in range(count)]


class _Verifier:
    __slots__ = ("charset", "is_ucs2", "byte_class", "next_state", "n_state")

    def __init__(self, spec: dict):
        self.charset = spec["charset"]
        self.is_ucs2 = spec["isUCS2"]
        self.byte_class = _unpack_nibbles(spec["cclass"], 256)
        self.next_state = _unpack_nibbles(spec["states"], len(spec["states"]) * 8)
        self.n_state = spec["stFactor"]


_ALL_VERIFIERS = [_Verifier(v) for v in VERIFIERS]


class _EUCSampler:
    """Port of nsEUCSampler.java:37-155."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.total = 0
        self.state = 0
        self.first_cnt = [0] * 94
        self.second_cnt = [0] * 94

    def enough_data(self) -> bool:
        return self.total > 200

    def get_some_data(self) -> bool:
        return self.total > 1

    def sample(self, buf: bytes | None, length: int) -> bool:
        if self.state == 1:
            return False
        state = self.state
        total = self.total
        first, second = self.first_cnt, self.second_cnt
        for i in range(length):
            b = buf[i]
            if state == 0:
                if b & 0x80:
                    if b == 0xFF or b < 0xA1:
                        state = 1
                        break
                    total += 1
                    first[b - 0xA1] += 1
                    state = 2
            elif state == 2:
                if b & 0x80:
                    if b == 0xFF or b < 0xA1:
                        state = 1
                        break
                    total += 1
                    second[b - 0xA1] += 1
                    state = 0
                else:
                    state = 1
                    break
        self.state = state
        self.total = total
        return state != 1

    def cal_freq(self):
        t = float(self.total)
        self.first_freq = [c / t for c in self.first_cnt]
        self.second_freq = [c / t for c in self.second_cnt]

    def get_score(self, stats: dict) -> float:
        return stats["mFirstByteWeight"] * self._dist(
            stats["mFirstByteFreq"], self.first_freq
        ) + stats["mSecondByteWeight"] * self._dist(
            stats["mSecondByteFreq"], self.second_freq
        )

    @staticmethod
    def _dist(a: list[float], b: list[float]) -> float:
        s = 0.0
        for x, y in zip(a, b):
            d = x - y
            s += d * d
        # Java computes in float32; math.sqrt in float64 matches to well
        # below the score-comparison granularity of the frequency tables
        return (s ** 0.5) / 94.0


class NSDetector:
    """Port of nsDetector(nsPSMDetector.ALL) + observer state."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.item_idx = list(range(len(_ALL_VERIFIERS)))
        self.state = [0] * len(_ALL_VERIFIERS)
        self.items = len(_ALL_VERIFIERS)
        self.done = False
        self.detected: str | None = None
        self.run_sampler = True
        self.sampler = _EUCSampler()

    def _report(self, charset: str):
        self.detected = charset
        self.done = True

    # nsPSMDetector.HandleData (nsPSMDetector.java:254-331)
    def handle_data(self, buf: bytes) -> bool:
        verifiers = _ALL_VERIFIERS
        item_idx = self.item_idx
        state = self.state
        items = self.items
        for b in buf:
            j = 0
            while j < items:
                v = verifiers[item_idx[j]]
                cl = v.byte_class[b]
                st = v.next_state[(state[j] * v.n_state + cl) & 0xFF]
                if st == _E_ITSME:
                    self.items = items
                    self._report(v.charset)
                    return True
                if st == _E_ERROR:
                    items -= 1
                    if j < items:
                        item_idx[j] = item_idx[items]
                        state[j] = state[items]
                else:
                    state[j] = st
                    j += 1
            if items <= 1:
                self.items = items
                if items == 1:
                    self._report(verifiers[item_idx[0]].charset)
                self.done = True
                return True
            non_ucs2 = [j for j in range(items) if not verifiers[item_idx[j]].is_ucs2]
            if len(non_ucs2) == 1:
                self.items = items
                self._report(verifiers[item_idx[non_ucs2[0]]].charset)
                return True
        self.items = items
        if self.run_sampler:
            self._sample(buf, len(buf))
        return self.done

    # nsDetector.DoIt / isAscii (nsDetector.java:58-86)
    def do_it(self, buf: bytes) -> bool:
        if not buf:
            return False
        return self.handle_data(buf)

    @staticmethod
    def is_ascii(buf: bytes) -> bool:
        if not buf:
            return True
        arr = np.frombuffer(buf, dtype=np.uint8)
        return not bool((arr & 0x80).any())

    # nsPSMDetector.DataEnd (nsPSMDetector.java:333-350)
    def data_end(self):
        if self.done:
            return
        if self.items == 2:
            c0 = _ALL_VERIFIERS[self.item_idx[0]].charset
            c1 = _ALL_VERIFIERS[self.item_idx[1]].charset
            if c0 == "GB18030":
                self._report(c1)
            elif c1 == "GB18030":
                self._report(c0)
        if self.run_sampler:
            self._sample(None, 0, last_chance=True)

    # nsPSMDetector.Sample (nsPSMDetector.java:352-407)
    def _sample(self, buf: bytes | None, length: int, last_chance: bool = False):
        euc_num = 0
        possible = 0
        for j in range(self.items):
            idx = self.item_idx[j]
            if idx in _STATS_BY_INDEX:
                euc_num += 1
            v = _ALL_VERIFIERS[idx]
            if not v.is_ucs2 and v.charset != "GB18030":
                possible += 1
        self.run_sampler = euc_num > 1
        if not self.run_sampler:
            return
        self.run_sampler = self.sampler.sample(buf, length)
        if (
            (last_chance and self.sampler.get_some_data())
            or self.sampler.enough_data()
        ) and euc_num == possible:
            self.sampler.cal_freq()
            best_idx = -1
            euc_cnt = 0
            best_score = 0.0
            for j in range(self.items):
                idx = self.item_idx[j]
                stats_key = _STATS_BY_INDEX.get(idx)
                if stats_key is not None and _ALL_VERIFIERS[idx].charset != "Big5":
                    score = self.sampler.get_score(STATISTICS[stats_key])
                    if euc_cnt == 0 or best_score > score:
                        best_score = score
                        best_idx = j
                    euc_cnt += 1
            if best_idx >= 0:
                self._report(_ALL_VERIFIERS[self.item_idx[best_idx]].charset)

    # nsPSMDetector.getProbableCharsets (nsPSMDetector.java:409-421)
    def get_probable_charsets(self) -> list[str]:
        if self.items <= 0:
            return ["nomatch"]
        return [_ALL_VERIFIERS[self.item_idx[i]].charset for i in range(self.items)]


_MAX_CHARS_TO_DETECT = 16000

# ---------------------------------------------------------------------------
# Vectorized batch detector
# ---------------------------------------------------------------------------
#
# The per-verifier state trajectory over a byte stream is INDEPENDENT of
# the other verifiers — nsPSMDetector's item_idx bookkeeping only affects
# reporting order, never state evolution.  So the batch detector runs in
# two phases:
#
#   A. a numpy gather loop over byte positions computes, for every
#      (document, verifier) pair at once, the byte index at which the
#      verifier dies (ERROR) or fires (ITSME) — the only O(bytes) work;
#   B. a tiny per-document replay (O(V²) worst case, V=#verifiers)
#      consumes those event times and reproduces the EXACT Java
#      bookkeeping: the swap-with-last removal order (which determines
#      both ITSME tie-breaks and getProbableCharsets()[0]), the
#      items<=1 / single-non-UCS2 early exits, the EUC sampler gates,
#      and the DataEnd GB18030 + last-chance-sampler rules.
#
# The EUC sampler's byte scan is also closed-form in numpy: its two-state
# alternation means a low byte is a violation iff an odd number of high
# bytes precede it, so counts reduce to cumsum/bincount over the prefix
# before the first violation.
#
# Parity with the scalar port (and therefore with the compiled reference
# goldens) is gated by tests/test_chardet.py::test_batch_matches_scalar.

_V = len(_ALL_VERIFIERS)
_CCLASS_ARR = np.array([v.byte_class for v in _ALL_VERIFIERS], dtype=np.uint8)  # (V,256)
_STF_ARR = np.array([v.n_state for v in _ALL_VERIFIERS], dtype=np.int32)  # (V,)
_NEXT_ARR = np.full((_V, 256), _E_ERROR, dtype=np.uint8)
for _i, _v in enumerate(_ALL_VERIFIERS):
    _NEXT_ARR[_i, : len(_v.next_state)] = _v.next_state
_NEXT_FLAT = _NEXT_ARR.reshape(-1)
_VOFF = (np.arange(_V, dtype=np.int32) * 256)[None, :]
_IS_UCS2_ARR = [v.is_ucs2 for v in _ALL_VERIFIERS]
_CHARSETS = [v.charset for v in _ALL_VERIFIERS]
_FAR = 1 << 30


# fused absorbing transition table: _T_FULL[v, s, b] = next state of
# verifier v in state s on byte b, with ERROR (1) and ITSME (2) absorbing
# — one gather per byte instead of cclass-gather + index-arith + mask.
_T_FULL = np.empty((_V, 16, 256), dtype=np.int32)
for _vi, _vv in enumerate(_ALL_VERIFIERS):
    _cc = np.array(_vv.byte_class, dtype=np.int32)
    _nx = np.full(256, _E_ERROR, dtype=np.int32)
    _nx[: len(_vv.next_state)] = _vv.next_state
    for _s in range(16):
        if _s in (_E_ERROR, _E_ITSME):
            _T_FULL[_vi, _s, :] = _s
        else:
            _T_FULL[_vi, _s, :] = _nx[(_s * _vv.n_state + _cc) & 0xFF]
_T_FLAT = _T_FULL.reshape(-1)
_TBASE = (np.arange(_V, dtype=np.int32) * 4096)[None, :]
_TRAJ_CHUNK = 256

# absolute pre-shifted transition table: row id = (v*16 + s) * 256, so the
# phase-A loop body is exactly `state = _T_ABS[state + byte]` — one add and
# one gather per byte position over the whole (doc, verifier) matrix.
_T_ABS = np.empty(_V * 16 * 256, dtype=np.int32)
for _vi in range(_V):
    for _s in range(16):
        _T_ABS[(_vi * 16 + _s) * 256 : (_vi * 16 + _s + 1) * 256] = (
            (_vi * 16 + _T_FULL[_vi, _s]) * 256
        )
_TABS_INIT = (np.arange(_V, dtype=np.int32) * 16 * 256)[None, :]  # state 0 per verifier

# byte-PAIR composition of _T_ABS: one add + one gather advances two byte
# positions at once.  64 MB, built lazily on first batch detection (the
# table is pure function composition, so bit-identity is preserved);
# entries are premultiplied by 65536 for the same flat-index trick.
_T_PAIR: np.ndarray | None = None
_TPAIR_INIT = (np.arange(_V, dtype=np.int32) * 16 * 65536)[None, :]


def _pair_table() -> np.ndarray:
    global _T_PAIR
    if _T_PAIR is None:
        nxt = (_T_ABS >> 8).astype(np.int32).reshape(_V * 16, 256)  # (a,b)->next_a
        pair = nxt.reshape(-1)[(nxt[:, :, None] << 8) + np.arange(256, dtype=np.int32)]
        pair <<= 16  # premultiply next_a by 65536
        _T_PAIR = pair.reshape(-1)
    return _T_PAIR




def _sampler_counts(data: bytes) -> tuple[bool, int, np.ndarray, np.ndarray]:
    """Closed-form nsEUCSampler scan → (valid, total, first_cnt, second_cnt)
    — counts cover the prefix strictly before the first violation."""
    arr = np.frombuffer(data, dtype=np.uint8)
    high = arr >= 0x80
    bad_high = high & ((arr == 0xFF) | (arr < 0xA1))
    cum = np.cumsum(high)  # highs up to and including position i
    bad_low = (~high) & ((cum & 1) == 1)  # low byte while expecting 2nd byte
    viol = np.flatnonzero(bad_high | bad_low)
    cut = int(viol[0]) if len(viol) else len(arr)
    vals = arr[: cut][high[: cut]].astype(np.int64) - 0xA1
    first = np.bincount(vals[0::2], minlength=94)
    second = np.bincount(vals[1::2], minlength=94)
    return len(viol) == 0, int(len(vals)), first, second


def _sampler_counts_batch(mati: np.ndarray, lengths: np.ndarray):
    """_sampler_counts for EVERY doc of the batch matrix in ~15 matrix
    ops: (valid (D,), total (D,), first (D,94), second (D,94)).
    Parity with the scalar version is covered by the batch-vs-scalar
    detector fuzz (the sampler feeds the detection verdicts)."""
    D, L = mati.shape
    pos = np.arange(L, dtype=np.int32)[None, :]
    inlen = pos < lengths[:, None]
    high = (mati >= 0x80) & inlen
    bad_high = high & ((mati == 0xFF) | (mati < 0xA1))
    cum = np.cumsum(high, axis=1)
    bad_low = (~high) & inlen & ((cum & 1) == 1)
    viol = bad_high | bad_low
    has_viol = viol.any(axis=1)
    cut = np.where(has_viol, viol.argmax(axis=1), lengths.astype(np.int64))
    valid_cells = high & (pos < cut[:, None])
    rows, cols = np.nonzero(valid_cells)
    vals = mati[rows, cols] - 0xA1
    rank = cum[rows, cols] - 1  # 0-based rank of the high byte in its doc
    first = np.zeros((D, 94), dtype=np.int64)
    second = np.zeros((D, 94), dtype=np.int64)
    even = (rank & 1) == 0
    np.add.at(first, (rows[even], vals[even]), 1)
    np.add.at(second, (rows[~even], vals[~even]), 1)
    total = np.bincount(rows, minlength=D)
    return ~has_viol, total, first, second


def _sampler_score(stats: dict, first_freq: np.ndarray, second_freq: np.ndarray) -> float:
    a = np.asarray(stats["mFirstByteFreq"]) - first_freq
    b = np.asarray(stats["mSecondByteFreq"]) - second_freq
    return stats["mFirstByteWeight"] * (float(a @ a) ** 0.5 / 94.0) + stats[
        "mSecondByteWeight"
    ] * (float(b @ b) ** 0.5 / 94.0)


def _scan_events(
    death: np.ndarray,
    itsme: np.ndarray,
    upto: int,
    state: tuple | None = None,
):
    """Exact nsPSMDetector byte-loop bookkeeping from event times < upto:
    returns (item_idx, items, done, scanned_upto).  done=True means DoIt
    completed mid-stream → the caller returns "ASCII" (the isAscii
    quirk).  Pass the previous return as ``state`` to scan INCREMENTALLY
    — only events in [scanned_upto, upto) are replayed, so per-chunk
    re-finalization costs O(new events · V) instead of re-walking the
    full history every chunk."""
    if state is None:
        item_idx = list(range(_V))
        items = _V
        lo = 0
    else:
        item_idx, items, _, lo = state
    events = sorted(
        {int(x) for x in death.tolist() + itsme.tolist() if lo <= x < upto}
    )
    for t in events:
        j = 0
        while j < items:
            v = item_idx[j]
            if itsme[v] == t:
                return item_idx, items, True, upto  # ITSME mid-stream
            if death[v] == t:
                items -= 1
                item_idx[j] = item_idx[items]
            else:
                j += 1
        if items <= 1:
            return item_idx, items, True, upto  # done (report or items==0)
        non_ucs2 = sum(1 for k in range(items) if not _IS_UCS2_ARR[item_idx[k]])
        if non_ucs2 == 1:
            return item_idx, items, True, upto
    return item_idx, items, False, upto


def _finish(samp, item_idx: list, items: int) -> str:
    """End-of-buffer Sample() + DataEnd for a doc that survived the byte
    scan: the sampler gates, GB18030 two-survivor rule, last-chance
    scoring, then probable[0] / nomatch.  ``samp`` is the precomputed
    (valid, total, first_cnt, second_cnt) sampler tuple."""
    samp_valid, samp_total, first_cnt, second_cnt = samp

    def euc_possible():
        e = sum(1 for k in range(items) if item_idx[k] in _STATS_BY_INDEX)
        p = sum(
            1
            for k in range(items)
            if not _IS_UCS2_ARR[item_idx[k]]
            and _CHARSETS[item_idx[k]] != "GB18030"
        )
        return e, p

    def sample_score(last_chance: bool):
        if not ((last_chance and samp_total > 1) or samp_total > 200):
            return None
        t = float(samp_total)
        ff = first_cnt / t
        sf = second_cnt / t
        best_idx, best_score, euc_cnt = -1, 0.0, 0
        for j in range(items):
            v = item_idx[j]
            key = _STATS_BY_INDEX.get(v)
            if key is not None and _CHARSETS[v] != "Big5":
                score = _sampler_score(STATISTICS[key], ff, sf)
                if euc_cnt == 0 or best_score > score:
                    best_score, best_idx = score, j
                euc_cnt += 1
        return _CHARSETS[item_idx[best_idx]] if best_idx >= 0 else None

    detected: str | None = None
    # ---- end-of-buffer Sample() inside handle_data ----
    euc_num, possible = euc_possible()
    run_sampler = euc_num > 1
    if run_sampler:
        run_sampler = samp_valid
        if samp_valid and samp_total > 200 and euc_num == possible:
            if sample_score(last_chance=False) is not None:
                return "ASCII"  # reported during DoIt → isAscii quirk
    # ---- DataEnd ----
    if items == 2:
        c0, c1 = _CHARSETS[item_idx[0]], _CHARSETS[item_idx[1]]
        if c0 == "GB18030":
            detected = c1
        elif c1 == "GB18030":
            detected = c0
    if run_sampler:
        euc_num, possible = euc_possible()
        if euc_num > 1 and samp_valid and euc_num == possible:
            got = sample_score(last_chance=True)
            if got is not None:
                detected = got
    if detected is not None:
        return detected
    if items <= 0:
        return "nomatch"
    return _CHARSETS[item_idx[0]]


def _detect_nonascii_batch(datas: list) -> list:
    """Chunked phase-A gather with per-chunk finalization: docs whose
    detection completes (or whose stream is exhausted, or whose verifier
    set is fully absorbed — no further events possible) leave the matrix,
    so the gather work tracks the scalar port's early exits."""
    D = len(datas)
    results: list = [None] * D
    lengths = np.array([len(d) for d in datas], dtype=np.int32)
    L = int(lengths.max())
    L += L & 1  # even for byte-pair stepping; zero padding is event-inert
    mati = np.zeros((D, L), dtype=np.int32)
    for k, d in enumerate(datas):
        mati[k, : len(d)] = np.frombuffer(d, dtype=np.uint8)
    # (L/2, D) byte-pair matrix, row-contiguous per step
    pairT = np.ascontiguousarray(((mati[:, 0::2] << 8) | mati[:, 1::2]).T)
    tpair = _pair_table()
    # sampler statistics for every doc, one vectorized pass (indexed by
    # ORIGINAL doc position; survives row compaction)
    s_valid, s_total, s_first, s_second = _sampler_counts_batch(mati, lengths)
    scan_states: list = [None] * D  # incremental _scan_events state per doc
    active = np.arange(D)
    # state is the PRE-SHIFTED absolute row id ((v*16 + s) * 65536): the
    # inner loop is one add + one take per TWO bytes over the whole
    # matrix, both writing into preallocated buffers
    state = np.broadcast_to(_TPAIR_INIT, (D, _V)).copy()
    buf = np.empty_like(state)
    death = np.full((D, _V), _FAR, dtype=np.int32)
    itsme = np.full((D, _V), _FAR, dtype=np.int32)
    finished = np.zeros(D, dtype=bool)
    for c0 in range(0, L, _TRAJ_CHUNK):
        if len(active) == 0:
            break
        c1 = min(c0 + _TRAJ_CHUNK, L)
        snap = state.copy()
        for tp in range(c0 >> 1, c1 >> 1):
            np.add(state, pairT[tp][:, None], out=buf)
            np.take(tpair, buf, out=state)
        local = (state >> 16) & 15
        absorbed = (local == _E_ERROR) | (local == _E_ITSME)
        snap_local = (snap >> 16) & 15
        newly = absorbed & (snap_local != _E_ERROR) & (snap_local != _E_ITSME)
        if newly.any():
            # exact absorption times: scalar walk over ≤1 chunk per cell
            # (each cell absorbs once → O(V·chunk) per doc total)
            for d, v in zip(*np.nonzero(newly)):
                s = int(snap_local[d, v])
                row = mati[d]
                tbl = _T_FULL[v]
                for t in range(c0, c1):
                    s = int(tbl[s, row[t]])
                    if s == _E_ERROR:
                        death[d, v] = t
                        break
                    if s == _E_ITSME:
                        itsme[d, v] = t
                        break
        # a row's done/finish status can only change when it gained an
        # event this chunk or its stream just ended — scan only those
        dirty = newly.any(axis=1) | (lengths <= c1) & (lengths > c0)
        if not dirty.any() and c1 < L:
            continue
        n_live = 0
        for r in range(len(active)):
            if finished[r]:
                continue
            if not dirty[r] and c1 < L and lengths[r] > c1:
                n_live += 1
                continue
            orig = int(active[r])
            n = int(lengths[r])
            st = _scan_events(
                death[r], itsme[r], min(c1, n), state=scan_states[orig]
            )
            scan_states[orig] = st
            item_idx, items, done, _ = st
            if done:
                results[orig] = "ASCII"  # DoIt returned True (quirk)
                finished[r] = True
            elif n <= c1 or absorbed[r].all():
                # stream exhausted, or no further events possible — the
                # sampler consumed the raw bytes in the batched pre-pass
                results[orig] = _finish(
                    (
                        bool(s_valid[orig]),
                        int(s_total[orig]),
                        s_first[orig],
                        s_second[orig],
                    ),
                    item_idx,
                    items,
                )
                finished[r] = True
            else:
                n_live += 1
        # compact only when it pays for the matrix copies it triggers
        # (finished rows left in place just gather into absorbed cells)
        if n_live == 0 or n_live <= 0.7 * len(active):
            sel = np.flatnonzero(~finished)
            active = active[sel]
            state = np.ascontiguousarray(state[sel])
            buf = np.empty_like(state)
            death = death[sel]
            itsme = itsme[sel]
            mati = mati[sel]
            pairT = np.ascontiguousarray(pairT[:, sel])
            lengths = lengths[sel]
            finished = np.zeros(len(active), dtype=bool)
    return results


def detect_batch(contents) -> list:
    """Vectorized CharsetUtils.detectCharacterEncoding over a batch —
    bit-identical to detect_character_encoding per document (parity
    test + the compiled-reference goldens)."""
    n = len(contents)
    results: list = [None] * n
    work_i: list[int] = []
    work_data: list[bytes] = []
    for i, c in enumerate(contents):
        if c is None or len(c) == 0:
            continue
        data = bytes(c)
        arr = np.frombuffer(data, dtype=np.uint8)
        if not (arr >= 0x80).any():
            results[i] = "ASCII"
            continue
        work_i.append(i)
        work_data.append(data[:_MAX_CHARS_TO_DETECT])
    if not work_i:
        return results
    got = _detect_nonascii_batch(work_data)
    for k, i in enumerate(work_i):
        results[i] = got[k]
    return results


def detect_character_encoding(content: bytes | None) -> str | None:
    """Verbatim port of CharsetUtils.detectCharacterEncoding
    (CharsetUtils.java:190-226), offset==0 path — quirks included (see
    module docstring)."""
    if content is None or len(content) == 0:
        return None
    det = NSDetector()
    is_ascii = det.is_ascii(content)
    if not is_ascii:
        is_ascii = det.do_it(content[:_MAX_CHARS_TO_DETECT])
    det.data_end()
    if is_ascii:
        return "ASCII"
    if det.detected is not None:
        return det.detected
    prob = det.get_probable_charsets()
    if prob:
        return prob[0]
    return None


def alias_charset(name: str) -> str:
    """CharsetUtils.aliasCharset (CharsetUtils.java:33-37): lowercase
    lookup in the full aliasTable, unchanged when absent."""
    alias = ALIAS_TABLE.get(name.lower())
    return alias if alias is not None else name


# Java canonical charset name -> Python codec.  Where CPython lacks the
# exact Java converter we substitute the closest codec and document the
# divergence; None means Java would also fail (or CPython cannot decode
# at all) and the caller returns None like Charset.decode throwing.
_JAVA_TO_PYTHON_CODEC: dict[str, str | None] = {
    "UTF-8": "utf-8",
    "UTF-16": "utf-16",
    "UTF-16BE": "utf-16-be",
    "UTF-16LE": "utf-16-le",
    "US-ASCII": "ascii",
    "ASCII": "ascii",
    "ISO-8859-1": "iso8859-1",
    "ISO-8859-2": "iso8859-2",
    "ISO-8859-3": "iso8859-3",
    "ISO-8859-4": "iso8859-4",
    "ISO-8859-5": "iso8859-5",
    "ISO-8859-6": "iso8859-6",
    "ISO-8859-7": "iso8859-7",
    "ISO-8859-8": "iso8859-8",
    "ISO-8859-9": "iso8859-9",
    "ISO-8859-13": "iso8859-13",
    "ISO-8859-15": "iso8859-15",
    "windows-1250": "cp1250",
    "windows-1251": "cp1251",
    "windows-1252": "cp1252",
    "windows-1253": "cp1253",
    "windows-1254": "cp1254",
    "windows-1255": "cp1255",
    "windows-1256": "cp1256",
    "windows-1257": "cp1257",
    "windows-1258": "cp1258",
    "KOI8-R": "koi8-r",
    # x-IBM943 differs from cp932 in the 0x5C/0x7E single-byte mappings
    # (handled by _IBM943_FIXUP below) and a few double-byte PUA rows
    # (documented divergence).
    "x-IBM943": "cp932",
    "Shift_JIS": "shift_jis",
    # x-JISAutoDetect autodetects SJIS/EUC-JP/ISO-2022-JP; it is only
    # reached via euc-jp-family aliases, where decoding as EUC-JP is
    # behavior-identical.
    "x-JISAutoDetect": "euc_jp",
    "EUC-JP": "euc_jp",
    "x-IBM33722": "euc_jp",
    "EUC-KR": "euc_kr",
    "x-IBM949": "cp949",
    "x-windows-949": "cp949",
    "GB2312": "gb2312",
    "GBK": "gbk",
    "GB18030": "gb18030",
    "Big5": "big5",
    "x-IBM950": "big5",
    "Big5-HKSCS": "big5hkscs",
    "x-MS950-HKSCS": "big5hkscs",
    "ISO-2022-JP": "iso2022_jp",
    "ISO-2022-KR": "iso2022_kr",
    "HZ-GB-2312": "hz",
    "x-windows-874": "cp874",
    "x-IBM874": "cp874",
    "IBM-Thai": None,  # CPython has no cp838
    "IBM437": "cp437",
    "IBM850": "cp850",
    "IBM852": "cp852",
    "IBM855": "cp855",
    "IBM857": "cp857",
    "IBM00858": "cp858",
    "IBM860": "cp860",
    "IBM861": "cp861",
    "IBM862": "cp862",
    "IBM863": "cp863",
    "IBM864": "cp864",
    "IBM865": "cp865",
    "IBM866": "cp866",
    "IBM869": "cp869",
    "IBM037": "cp037",
    "IBM273": "cp273",
    "IBM500": "cp500",
    "IBM775": "cp775",
    "IBM1026": "cp1026",
    "IBM1047": "cp1047",
    "IBM01140": "cp1140",
    "x-IBM737": "cp737",
    "x-IBM856": "cp856",
    "x-IBM1006": "cp1006",
    # Java-only converters CPython lacks: table-driven ports in
    # ccspark.cjkext (JVM-extracted tables + fuzz-pinned malformed
    # semantics) — see decode_as_java's special-case dispatch
    "x-euc-tw": None,
    "x-IBM964": None,
    "ISO-2022-CN": None,
    "ibm-916": "iso8859-8",
    "nomatch": None,
}

# x-IBM943 (ibm-943_p130-1999) maps 0x5C -> U+00A5 and 0x7E -> U+203E;
# cp932 maps them to U+005C / U+007E, and no double-byte cp932 sequence
# decodes to those two codepoints, so a post-translate is exact for the
# single-byte plane.
_IBM943_FIXUP = str.maketrans({0x5C: 0xA5, 0x7E: 0x203E})


def java_charset_to_codec(java_name: str) -> str | None:
    """Resolve a Java canonical charset name to a Python codec name, or
    None when no CPython equivalent exists."""
    codec = _JAVA_TO_PYTHON_CODEC.get(java_name)
    if codec is not None:
        return codec
    if java_name in _JAVA_TO_PYTHON_CODEC:
        return None  # known Java-only converter
    # unknown name: let Python's codec registry try (mirrors
    # Charset.forName falling through to the provider chain)
    try:
        import codecs

        codecs.lookup(java_name)
        return java_name
    except LookupError:
        return None


def decode_as_java(data: bytes, java_name: str) -> str | None:
    """Decode ``data`` the way Java's Charset.decode(charset) would
    (malformed/unmappable -> U+FFFD), or None when the charset cannot be
    resolved (Charset.forName throw path)."""
    if java_name in ("x-IBM964", "x-euc-tw"):
        from . import cjkext

        return cjkext.decode_euc_tw(data)
    if java_name == "ISO-2022-CN":
        from . import cjkext

        return cjkext.decode_iso2022_cn(data)
    codec = java_charset_to_codec(java_name)
    if codec is None:
        return None
    out = data.decode(codec, errors="replace")
    if java_name == "x-IBM943":
        out = out.translate(_IBM943_FIXUP)
    return out
