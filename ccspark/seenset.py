"""Partitioned URL-seen set: bloom filter (reference-exact buckets) and
cuckoo filter variant, built and probed with Arrow UDFs.

Design (SURVEY.md §2.3 H4/H5, §4):

* The seen-set key is URLFPV2: exact membership is the composite
  ``(domain_hash, url_hash)`` (protocol.jr:131-132 ``[key]`` fields);
  the probabilistic pre-filter hashes ``url_hash`` (the fp64 of the full
  canonical URL) as the reference's long-key bloom path
  (BloomFilter.add(long) → Filter.getHashBuckets(long),
  Filter.java:85-104).
* One filter per hash-range partition ``pmod(domain_hash, P)``.  Build =
  ``groupBy(partition_id).applyInPandas``; probe = cogrouped
  ``applyInPandas`` so filter blobs and candidates meet on the SAME
  partitioning — no broadcast of multi-GB filter state, no reshuffle of
  the build side at 10^10 scale.
* Bloom sizing matches BloomCalculations (computeBestK table :37-41,
  bitset size ``n*bucketsPerElement+20`` rounded up to a 64-bit word
  like java.util.BitSet) so false-positive *behavior* equals the
  reference for the same parameters.
* The probabilistic filter only pre-screens: candidates flagged
  ``maybe_seen`` are confirmed with an exact left-anti join against the
  seen table (H5 LongOpenHashSet → built-in dropDuplicates/anti-join).

The cuckoo variant (north_star) keeps the same table shape; 16-bit
fingerprints, 4-slot buckets, partial-key cuckoo hashing.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import hashing

# BloomCalculations.optKPerBuckets (BloomCalculations.java:37-41)
_OPT_K = [1, 1, 1, 2, 3, 3, 4, 5, 5, 6, 7, 8, 8, 8, 8, 8]

FILTER_SCHEMA = (
    "partition_id int, kind string, hash_count int, num_buckets long, "
    "n_keys long, bits binary"
)


def filter_arrow_schema():
    """pyarrow schema physically identical to FILTER_SCHEMA, so a
    driver-side pyarrow write reads back indistinguishable from a
    Spark-written filter table (cogroup keys must type-match)."""
    import pyarrow as pa

    return pa.schema(
        [
            ("partition_id", pa.int32()),
            ("kind", pa.string()),
            ("hash_count", pa.int32()),
            ("num_buckets", pa.int64()),
            ("n_keys", pa.int64()),
            ("bits", pa.binary()),
        ]
    )


def compute_best_k(buckets_per_element: int) -> int:
    if buckets_per_element >= len(_OPT_K):
        return _OPT_K[-1]
    return _OPT_K[buckets_per_element]


def bitset_size(num_elements: int, buckets_per_element: int) -> int:
    """java.util.BitSet(n*b+20).size(): round up to a 64-bit word."""
    nbits = num_elements * buckets_per_element + 20
    return ((nbits + 63) // 64) * 64


# ---------------------------------------------------------------------------
# numpy kernels
# ---------------------------------------------------------------------------


def bloom_build(keys: np.ndarray, buckets_per_element: int = 10) -> tuple[int, int, bytes]:
    """Build one bloom bitset over int64 keys → (k, m, bits)."""
    n = max(len(keys), 1)
    k = compute_best_k(buckets_per_element)
    m = bitset_size(n, buckets_per_element)
    words = np.zeros(m // 64, dtype=np.uint64)
    if len(keys):
        idx = hashing.bloom_buckets_long(np.asarray(keys, dtype=np.int64), k, m).ravel()
        np.bitwise_or.at(words, idx >> 6, np.uint64(1) << (idx & 63).astype(np.uint64))
    return k, m, words.tobytes()


def bloom_probe(keys: np.ndarray, k: int, m: int, bits: bytes) -> np.ndarray:
    """Vectorized membership probe → bool array."""
    if len(keys) == 0:
        return np.zeros(0, dtype=bool)
    words = np.frombuffer(bits, dtype=np.uint64)
    idx = hashing.bloom_buckets_long(np.asarray(keys, dtype=np.int64), k, m)
    hit = (words[idx >> 6] >> (idx & 63).astype(np.uint64)) & np.uint64(1)
    return hit.all(axis=1)


_CK_SLOTS = 4
_CK_MAX_KICKS = 500


def _ck_fingerprint(keys: np.ndarray) -> np.ndarray:
    """16-bit nonzero fingerprint from murmur2 of the key."""
    h = hashing.murmur2_fixed8(keys, np.full(len(keys), 7, dtype=np.int32)).view(np.uint32)
    f = (h & np.uint32(0xFFFF)).astype(np.uint16)
    return np.where(f == 0, np.uint16(1), f)


def _ck_index1(keys: np.ndarray, nb: int) -> np.ndarray:
    h = hashing.murmur2_fixed8(keys, np.zeros(len(keys), dtype=np.int32)).view(np.uint32)
    return (h % np.uint32(nb)).astype(np.int64)


def _ck_alt_index(i: np.ndarray, f: np.ndarray, nb: int) -> np.ndarray:
    # partial-key cuckoo: i2 = (i1 ^ hash(f)) & (nb-1); nb is a power of 2
    with np.errstate(over="ignore"):
        fh = (f.astype(np.uint32) * np.uint32(0x5BD1E995)) & np.uint32(0xFFFFFFFF)
    return (i.astype(np.uint64) ^ fh.astype(np.uint64)).astype(np.int64) & (nb - 1)


def _ck_alt_index_scalar(i: int, fp: int, nb: int) -> int:
    fh = (int(fp) * 0x5BD1E995) & 0xFFFFFFFF
    return (int(i) ^ fh) & (nb - 1)


def cuckoo_build(keys: np.ndarray, load_factor: float = 0.84) -> tuple[int, int, bytes]:
    """Build a cuckoo filter → (slots_per_bucket, num_buckets, table bytes).

    Vectorized two-pass bulk placement: every (bucket, fingerprint) pair
    is deduped, then pass 1 fills i1 buckets in bulk (grouped rank →
    slot assignment) and pass 2 does the same for i2 of the overflow;
    only the tiny residue that misses both buckets takes the per-key
    eviction loop.  Deterministic (sorted dedupe + stable ranks + seeded
    eviction), and every retained key remains probe-able at i1 or i2 —
    identical false-negative guarantees to the sequential build."""
    n = max(len(keys), 1)
    nb = 1
    while nb * _CK_SLOTS * load_factor < n:
        nb <<= 1
    # overflow (a key whose both buckets stay full after the eviction
    # budget) would be a FALSE NEGATIVE — not acceptable for a seen-set
    # pre-filter, so grow the table and rebuild instead (the standard
    # cuckoo response; pathological bucket collisions disperse at the
    # next power of two).  Hypothesis found a 5-key set whose i1 == i2
    # all landed in one 4-slot bucket at nb=2.
    for _ in range(16):
        table, ok = _cuckoo_try_build(keys, nb)
        if ok:
            break
        nb <<= 1
    else:
        # a lossy table would be a silent false negative in the seen set
        raise RuntimeError(
            f"cuckoo_build: {len(keys)} keys still overflow after 16 doublings (nb={nb})"
        )
    return _CK_SLOTS, nb, table.tobytes()


def _cuckoo_try_build(keys: np.ndarray, nb: int) -> tuple[np.ndarray, bool]:
    table = np.zeros((nb, _CK_SLOTS), dtype=np.uint16)
    dropped = False
    if len(keys):
        keys = np.asarray(keys, dtype=np.int64)
        f_all = _ck_fingerprint(keys)
        i1_all = _ck_index1(keys, nb)
        # dedupe (bucket, fp) pairs — mirrors the sequential build's
        # "fingerprint already present" short-circuit
        combo = (i1_all.astype(np.uint64) << np.uint64(16)) | f_all.astype(np.uint64)
        combo = np.unique(combo)
        i1 = (combo >> np.uint64(16)).astype(np.int64)
        f = (combo & np.uint64(0xFFFF)).astype(np.uint16)
        used = np.zeros(nb, dtype=np.int64)

        def _bulk_place(fps: np.ndarray, buckets: np.ndarray) -> np.ndarray:
            """Place what fits; returns positions (into fps) that did not."""
            order = np.argsort(buckets, kind="stable")
            b_s = buckets[order]
            f_s = fps[order]
            first = np.r_[True, b_s[1:] != b_s[:-1]] if len(b_s) else np.zeros(0, bool)
            grp_start = np.flatnonzero(first)
            grp_sizes = np.diff(np.r_[grp_start, len(b_s)])
            ranks = np.arange(len(b_s)) - np.repeat(grp_start, grp_sizes)
            slot = used[b_s] + ranks
            fit = slot < _CK_SLOTS
            table[b_s[fit], slot[fit]] = f_s[fit]
            used[:] += np.bincount(b_s[fit], minlength=nb)
            return order[~fit]

        left = _bulk_place(f, i1)
        if len(left):
            i2 = _ck_alt_index(i1[left], f[left], nb)
            left2 = _bulk_place(f[left], i2)
            # eviction residue: per-key loop over the (rare) keys whose
            # both buckets were full
            rng = np.random.RandomState(42)
            for pos in left2:
                fp = int(f[left][pos])
                cur = int(i1[left][pos])
                for _ in range(_CK_MAX_KICKS):
                    slot = rng.randint(_CK_SLOTS)
                    fp, table[cur, slot] = int(table[cur, slot]), fp
                    cur = _ck_alt_index_scalar(cur, fp, nb)
                    row = table[cur]
                    empty = np.nonzero(row == 0)[0]
                    if len(empty):
                        table[cur, empty[0]] = fp
                        fp = 0
                        break
                if fp != 0:
                    dropped = True  # caller grows the table and rebuilds
    return table, not dropped


def cuckoo_probe(keys: np.ndarray, slots: int, nb: int, bits: bytes) -> np.ndarray:
    if len(keys) == 0:
        return np.zeros(0, dtype=bool)
    table = np.frombuffer(bits, dtype=np.uint16).reshape(nb, slots)
    keys = np.asarray(keys, dtype=np.int64)
    f = _ck_fingerprint(keys)
    i1 = _ck_index1(keys, nb)
    i2 = _ck_alt_index(i1, f, nb)
    hit1 = (table[i1] == f[:, None]).any(axis=1)
    hit2 = (table[i2] == f[:, None]).any(axis=1)
    return hit1 | hit2


# ---------------------------------------------------------------------------
# Spark operators
# ---------------------------------------------------------------------------


def build_filters(
    seen: DataFrame,
    num_partitions: int,
    kind: str = "bloom",
    buckets_per_element: int = 10,
    capacity: int | None = None,
) -> DataFrame:
    """seen(domain_hash, url_hash, ...) → one filter row per partition.

    ``capacity`` (bloom only) fixes the bitset size to
    ``bitset_size(capacity, b)`` regardless of the actual key count, so
    filters built over different key sets are bitwise-OR mergeable
    (incremental per-round delta builds instead of full rebuilds)."""
    assert kind in ("bloom", "cuckoo")

    def _build(pdf: pd.DataFrame) -> pd.DataFrame:
        pid = int(pdf["partition_id"].iloc[0])
        keys = pdf["url_hash"].to_numpy(dtype=np.int64)
        keys = np.unique(keys)
        if kind == "bloom":
            if capacity is not None:
                k = compute_best_k(buckets_per_element)
                m = bitset_size(capacity, buckets_per_element)
                words = np.zeros(m // 64, dtype=np.uint64)
                if len(keys):
                    idx = hashing.bloom_buckets_long(keys, k, m).ravel()
                    np.bitwise_or.at(words, idx >> 6, np.uint64(1) << (idx & 63).astype(np.uint64))
                bits = words.tobytes()
            else:
                k, m, bits = bloom_build(keys, buckets_per_element)
        else:
            k, m, bits = cuckoo_build(keys)
        return pd.DataFrame(
            {
                "partition_id": [pid],
                "kind": [kind],
                "hash_count": [k],
                "num_buckets": [m],
                "n_keys": [len(keys)],
                "bits": [bits],
            }
        )

    with_pid = seen.withColumn(
        "partition_id", F.pmod(F.col("domain_hash"), F.lit(num_partitions)).cast("int")
    )
    return with_pid.groupBy("partition_id").applyInPandas(_build, schema=FILTER_SCHEMA)


def probe_filters(candidates: DataFrame, filters: DataFrame, num_partitions: int) -> DataFrame:
    """candidates(domain_hash, url_hash, ...) × filters → + maybe_seen.

    Cogrouped on partition_id: each task sees one partition's candidates
    and that partition's single filter blob."""
    cand = candidates.withColumn(
        "partition_id", F.pmod(F.col("domain_hash"), F.lit(num_partitions)).cast("int")
    )
    from pyspark.sql.types import BooleanType, StructField, StructType

    out_schema = StructType(list(cand.schema.fields) + [StructField("maybe_seen", BooleanType())])

    def _probe(key, cand_pdf: pd.DataFrame, filt_pdf: pd.DataFrame) -> pd.DataFrame:
        keys = cand_pdf["url_hash"].to_numpy(dtype=np.int64)
        if len(filt_pdf) == 0:
            maybe = np.zeros(len(cand_pdf), dtype=bool)
        else:
            row = filt_pdf.iloc[0]
            if row["kind"] == "bloom":
                maybe = bloom_probe(keys, int(row["hash_count"]), int(row["num_buckets"]), row["bits"])
            else:
                maybe = cuckoo_probe(keys, int(row["hash_count"]), int(row["num_buckets"]), row["bits"])
        out = cand_pdf.copy()
        out["maybe_seen"] = maybe
        return out

    return (
        cand.groupBy("partition_id")
        .cogroup(filters.groupBy("partition_id"))
        .applyInPandas(_probe, schema=out_schema)
    )


def filter_new_cogrouped(
    candidates: DataFrame,
    seen: DataFrame | None,
    filters: DataFrame,
    num_partitions: int,
) -> DataFrame:
    """Bloom/cuckoo pre-screen + exact confirm FUSED into ONE cogrouped
    pass — the 10^10-scale novelty gate.

    The two-branch formulation (fresh ∪ exact-confirmed suspects)
    references the probed subtree twice, so a single action computes
    the probe TWICE (plan-audit finding, BENCH/BASELINE.md R3.6).  Here
    the per-partition state (the filter blob + that partition's seen
    identities, tagged rows of one union frame) is cogrouped with the
    candidates once: inside the task the bloom probe runs, and only the
    maybe-seen rows are checked against the partition's exact set (a
    hash-join in pandas).  One shuffle of candidates by pmod
    (domain_hash), one of seen — strictly fewer passes than
    probe-twice + suspect SMJ anti-join (which also shuffles seen)."""
    from pyspark.sql.types import StructField, StructType

    pid = F.pmod(F.col("domain_hash"), F.lit(num_partitions)).cast("int")
    cand = candidates.withColumn("partition_id", pid)
    state = filters.select(
        "partition_id",
        "kind",
        "hash_count",
        "num_buckets",
        "bits",
        F.lit(None).cast("long").alias("s_domain_hash"),
        F.lit(None).cast("long").alias("s_url_hash"),
    )
    if seen is not None:
        state = state.unionByName(
            seen.select(
                pid.alias("partition_id"),
                F.lit(None).cast("string").alias("kind"),
                F.lit(None).cast("int").alias("hash_count"),
                F.lit(None).cast("long").alias("num_buckets"),
                F.lit(None).cast("binary").alias("bits"),
                F.col("domain_hash").alias("s_domain_hash"),
                F.col("url_hash").alias("s_url_hash"),
            )
        )
    out_schema = StructType([f for f in cand.schema.fields if f.name != "partition_id"])

    def _gate(key, cand_pdf: pd.DataFrame, state_pdf: pd.DataFrame) -> pd.DataFrame:
        out = cand_pdf.drop(columns=["partition_id"])
        if len(out) == 0:
            return out
        keys = cand_pdf["url_hash"].to_numpy(dtype=np.int64)
        blob = state_pdf[state_pdf["kind"].notna()]
        if len(blob) == 0:
            return out  # no filter state: everything is new
        row = blob.iloc[0]
        if row["kind"] == "bloom":
            maybe = bloom_probe(keys, int(row["hash_count"]), int(row["num_buckets"]), row["bits"])
        else:
            maybe = cuckoo_probe(keys, int(row["hash_count"]), int(row["num_buckets"]), row["bits"])
        if not maybe.any():
            return out
        seen_rows = state_pdf[state_pdf["kind"].isna()]
        if len(seen_rows) == 0:
            return out  # filter false positives only
        # exact confirm for the (few) maybe-seen rows: vectorized
        # composite-key membership against this partition's seen set
        sus_pos = np.flatnonzero(maybe)
        sus_idx = pd.MultiIndex.from_arrays(
            [
                cand_pdf["domain_hash"].to_numpy(np.int64)[sus_pos],
                keys[sus_pos],
            ]
        )
        seen_idx = pd.MultiIndex.from_arrays(
            [
                seen_rows["s_domain_hash"].to_numpy(np.int64),
                seen_rows["s_url_hash"].to_numpy(np.int64),
            ]
        )
        dup = sus_idx.isin(seen_idx)
        keep = np.ones(len(cand_pdf), dtype=bool)
        keep[sus_pos[dup]] = False
        return out[keep]

    return (
        cand.groupBy("partition_id")
        .cogroup(state.groupBy("partition_id"))
        .applyInPandas(_gate, schema=out_schema)
    )


def augment_filters(
    old: DataFrame,
    delta_keys: DataFrame,
    num_partitions: int,
    buckets_per_element: int = 10,
    capacity: int | None = None,
) -> DataFrame:
    """Fused bloom delta-build + OR-merge in ONE cogrouped pass: the new
    keys' buckets are OR-ed straight into the previous filter blob per
    partition — replaces build_filters(delta)+merge_filters(old, delta)
    (two shuffles + an extra python stage) with a single cogroup."""
    keyed = delta_keys.withColumn(
        "partition_id", F.pmod(F.col("domain_hash"), F.lit(num_partitions)).cast("int")
    ).select("partition_id", "url_hash")

    k_default = compute_best_k(buckets_per_element)
    m_default = bitset_size(capacity, buckets_per_element) if capacity else None

    def _augment(key, keys_pdf: pd.DataFrame, filt_pdf: pd.DataFrame) -> pd.DataFrame:
        pid = int(key[0])
        keys = np.unique(keys_pdf["url_hash"].to_numpy(dtype=np.int64)) if len(keys_pdf) else np.array([], dtype=np.int64)
        if len(filt_pdf):
            row = filt_pdf.iloc[0]
            k = int(row["hash_count"])
            m = int(row["num_buckets"])
            words = np.frombuffer(row["bits"], dtype=np.uint64).copy()
            n_prev = int(row["n_keys"])
        else:
            assert m_default is not None, "augment_filters without prior filter needs capacity"
            k, m = k_default, m_default
            words = np.zeros(m // 64, dtype=np.uint64)
            n_prev = 0
        if len(keys):
            idx = hashing.bloom_buckets_long(keys, k, m).ravel()
            np.bitwise_or.at(words, idx >> 6, np.uint64(1) << (idx & 63).astype(np.uint64))
        return pd.DataFrame(
            {
                "partition_id": [pid],
                "kind": ["bloom"],
                "hash_count": [k],
                "num_buckets": [m],
                "n_keys": [n_prev + len(keys)],  # upper bound (dups unknown)
                "bits": [words.tobytes()],
            }
        )

    return (
        keyed.groupBy("partition_id")
        .cogroup(old.groupBy("partition_id"))
        .applyInPandas(_augment, schema=FILTER_SCHEMA)
    )


def empty_filters_pdf(
    num_partitions: int, kind: str = "bloom", buckets_per_element: int = 10, capacity: int | None = None
) -> pd.DataFrame:
    """Deterministic empty filter table built driver-side (no Spark job)
    — bootstrap uses this instead of running a build over zero rows."""
    rows = []
    for pid in range(num_partitions):
        if kind == "bloom":
            if capacity is not None:
                k = compute_best_k(buckets_per_element)
                m = bitset_size(capacity, buckets_per_element)
                bits = bytes(m // 8)
            else:
                k, m, bits = bloom_build(np.array([], dtype=np.int64), buckets_per_element)
        else:
            k, m, bits = cuckoo_build(np.array([], dtype=np.int64))
        rows.append((pid, kind, k, m, 0, bits))
    return pd.DataFrame(
        rows, columns=["partition_id", "kind", "hash_count", "num_buckets", "n_keys", "bits"]
    )


def merge_filters(old: DataFrame, delta: DataFrame) -> DataFrame:
    """Bitwise-OR union of equally-sized bloom filters per partition.

    Valid only for bloom filters built with the same fixed ``capacity``
    (same num_buckets / hash_count).  A missing side passes through."""

    def _merge(pdf: pd.DataFrame) -> pd.DataFrame:
        if len(pdf) == 1:
            return pdf
        m = int(pdf["num_buckets"].iloc[0])
        assert (pdf["num_buckets"] == m).all(), "merge_filters: mismatched filter sizes"
        acc = np.zeros(m // 64, dtype=np.uint64)
        for b in pdf["bits"]:
            acc |= np.frombuffer(b, dtype=np.uint64)
        out = pdf.iloc[[0]].copy()
        out["bits"] = [acc.tobytes()]
        out["n_keys"] = [int(pdf["n_keys"].sum())]  # upper bound (dups unknown)
        return out

    return (
        old.unionByName(delta)
        .groupBy("partition_id")
        .applyInPandas(lambda pdf: _merge(pdf), schema=FILTER_SCHEMA)
    )


def gate_new_storage(
    candidates: DataFrame,
    root,
    filters_round: int,
    seen_upto: int,
    num_partitions: int,
) -> DataFrame:
    """Shuffle-free novelty gate over STORAGE-partitioned state: probe +
    exact confirm in one map stage, with zero Exchange anywhere — not
    on the candidates, not on the filters, not on the seen history.

    Both state tables are written Hive-partitioned by
    ``pmod(domain_hash, P)`` (frontier.py), so for each batch the
    worker loads exactly the touched partitions' filter blob
    (seenstore.filter_blob) and — only when the bloom flags suspects —
    that partition's seen identities (seenstore.seen_arrays, an
    incremental per-worker cache that reads one delta file per round).
    This replaces the r3 cogroup gate, whose state side re-shuffled the
    FULL crawl history every round (the one remaining 100×-scale
    shuffle).  Semantics are exactly ``candidates ∖ seen``: the
    probabilistic filter only routes around the exact confirm, and
    bloom/cuckoo filters here have no false negatives.

    Efficiency wants candidates physically clustered by partition_id
    (the frontier table is written that way → a scan task touches ~1
    partition); correctness holds for any distribution.  For an
    UNclustered input at huge state (discovered links at 10^10),
    repartition by pmod(domain_hash, P) first — one delta-sized
    Exchange — so each task still touches ~1 partition
    (frontier.py cluster_link_gate).

    ``root`` is any seenstore state location: a filesystem path, an
    FSLocation (object store), or a ManifestLocation (catalog-metadata
    file lists — the Iceberg backend); the gate itself is
    location-agnostic.

    The decision is expressed as a BOOLEAN Arrow UDF over just
    (domain_hash, url_hash) rather than a mapInPandas over whole rows:
    only 16 bytes/row cross the JVM↔Python boundary each way instead of
    the full frontier row (url + canonical_url strings dominated the
    gate stage's Arrow traffic — guide §4.1 "pass only the columns the
    function needs").  Marked non-deterministic so the optimizer cannot
    push the filter below the identity dedup's aggregate (re-gating
    pre-dedup, pre-clustering rows) or duplicate it."""
    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("boolean")
    def _is_new(dom_s: pd.Series, url_s: pd.Series) -> pd.Series:
        from . import seenstore

        n = len(dom_s)
        if n == 0:
            return pd.Series([], dtype=bool)
        dom = dom_s.to_numpy(dtype=np.int64)
        keys = url_s.to_numpy(dtype=np.int64)
        pids = np.mod(dom, num_partitions)
        keep = np.ones(n, dtype=bool)
        for pid in np.unique(pids):
            sel = np.flatnonzero(pids == pid)
            blob = seenstore.filter_blob(root, int(pid), filters_round)
            if blob is None:
                continue  # no filter state for this partition: all new
            kind, k, m, _nk, bits = blob
            if kind == "bloom":
                maybe = bloom_probe(keys[sel], k, m, bits)
            else:
                maybe = cuckoo_probe(keys[sel], k, m, bits)
            if not maybe.any():
                continue
            sus = sel[maybe]
            u_s, d_s = seenstore.seen_arrays(root, int(pid), seen_upto)
            if len(u_s) == 0:
                continue  # filter false positives only (round 1)
            dup = seenstore.contains(u_s, d_s, keys[sus], dom[sus])
            keep[sus[dup]] = False
        return pd.Series(keep, index=dom_s.index)

    gate = _is_new.asNondeterministic()
    return candidates.filter(gate(F.col("domain_hash"), F.col("url_hash")))


def update_filters_storage(
    spark,
    root,
    round_no: int,
    num_partitions: int,
    kind: str = "bloom",
    buckets_per_element: int = 10,
    capacity: int | None = None,
) -> DataFrame:
    """Per-round filter update with the state kept OUT of the shuffle:
    the driving frame is just ``range(P)`` partition ids; each task
    loads its previous blob and this round's seen delta straight from
    their partition directories (seenstore) and emits the new blob.

    bloom → incremental OR of the delta keys into the previous bitset;
    cuckoo → rebuild over the partition's full seen set (cuckoo tables
    are not OR-mergeable), still without any Exchange — the history is
    read from the same per-worker incremental cache the gate uses.

    The skeleton is a range with EXPLICIT partitioning (one id per task,
    mapInPandas) rather than a groupBy: a 32-row shuffle looks tiny to
    AQE, which would coalesce it to ONE post-shuffle partition and run
    every blob update serially (observed 11 s → 47 s per round on the
    10^8 endurance run before this fix)."""
    assert kind in ("bloom", "cuckoo")
    skeleton = spark.range(0, num_partitions, 1, num_partitions).select(
        F.col("id").cast("int").alias("partition_id")
    )
    k_default = compute_best_k(buckets_per_element)
    m_default = bitset_size(capacity, buckets_per_element) if capacity else None

    def _update(pid: int) -> pd.DataFrame:
        from . import seenstore

        if kind == "bloom":
            prev = seenstore.filter_blob(root, pid, round_no - 1)
            if prev is not None:
                _kind, k, m, n_prev, bits = prev
                words = np.frombuffer(bits, dtype=np.uint64).copy()
            else:
                assert m_default is not None, "first bloom update needs capacity"
                k, m, n_prev = k_default, m_default, 0
                words = np.zeros(m // 64, dtype=np.uint64)
            delta_u, _ = seenstore.round_pairs(root, pid, round_no)
            keys = np.unique(delta_u)
            if len(keys):
                idx = hashing.bloom_buckets_long(keys, k, m).ravel()
                np.bitwise_or.at(words, idx >> 6, np.uint64(1) << (idx & 63).astype(np.uint64))
            row = (pid, "bloom", k, m, n_prev + len(keys), words.tobytes())
        else:
            u_s, _ = seenstore.seen_arrays(root, pid, round_no)
            k, m, bits = cuckoo_build(np.unique(u_s))
            row = (pid, "cuckoo", k, m, len(u_s), bits)
        return pd.DataFrame(
            [row],
            columns=["partition_id", "kind", "hash_count", "num_buckets", "n_keys", "bits"],
        )

    def _update_iter(batches):
        for pdf in batches:
            for pid in pdf["partition_id"]:
                yield _update(int(pid))

    return skeleton.mapInPandas(_update_iter, schema=FILTER_SCHEMA)


def exact_new_urls(candidates: DataFrame, seen: DataFrame) -> DataFrame:
    """Exact anti-join on the composite URLFPV2 key (H5 semantics)."""
    return candidates.join(
        seen.select("domain_hash", "url_hash"), ["domain_hash", "url_hash"], "left_anti"
    )


def probe_filters_broadcast(candidates: DataFrame, filters: DataFrame) -> DataFrame:
    """Shuffle-free probe: ship the filter blobs to every task and add
    ``maybe_seen`` in a pure map stage.

    Correct only while the TOTAL filter state fits comfortably in
    executor memory — the frontier picks this path when
    P × bitset_bytes is under its broadcast threshold (small/mid crawls,
    local bench); at 10^10-key scale the state is tens of GB and the
    cogrouped ``probe_filters`` is the only sane plan."""
    from pyspark.sql.types import BooleanType, StructField, StructType

    rows = filters.collect()
    blobs = {
        int(r["partition_id"]): (r["kind"], int(r["hash_count"]), int(r["num_buckets"]), r["bits"])
        for r in rows
    }
    num_partitions = max(blobs) + 1 if blobs else 1
    sc = candidates.sparkSession.sparkContext
    b = sc.broadcast(blobs)

    out_schema = StructType(list(candidates.schema.fields) + [StructField("maybe_seen", BooleanType())])

    def _probe(batches):
        table = b.value
        for pdf in batches:
            keys = pdf["url_hash"].to_numpy(dtype=np.int64)
            pids = np.mod(pdf["domain_hash"].to_numpy(dtype=np.int64), num_partitions)
            maybe = np.zeros(len(pdf), dtype=bool)
            for pid in np.unique(pids):
                blob = table.get(int(pid))
                if blob is None:
                    continue
                kind, k, m, bits = blob
                sel = pids == pid
                if kind == "bloom":
                    maybe[sel] = bloom_probe(keys[sel], k, m, bits)
                else:
                    maybe[sel] = cuckoo_probe(keys[sel], k, m, bits)
            out = pdf.copy()
            out["maybe_seen"] = maybe
            yield out

    return candidates.mapInPandas(_probe, schema=out_schema)


def filter_new(
    candidates: DataFrame,
    seen: DataFrame,
    filters: DataFrame,
    num_partitions: int,
    broadcast_bytes: int | None = None,
    broadcast_threshold: int = 128 << 20,
) -> DataFrame:
    """Scalable two-stage novelty filter: bloom/cuckoo pre-screen, exact
    confirm only for the (few) maybe-seen candidates.

    definitely-new (≈90%+ of a growing crawl) skips the join entirely —
    that is the point of the pre-filter at 10^10 keys.  When the caller
    knows the total filter state is small (``broadcast_bytes`` under the
    threshold) the probe runs as a broadcast map stage instead of the
    cogroup — zero shuffles on the candidate side.  At cogroup scale the
    probe and exact confirm are FUSED into one pass
    (filter_new_cogrouped): the union-of-branches formulation would
    compute the probe twice per action (plan-audit finding)."""
    if broadcast_bytes is not None and broadcast_bytes <= broadcast_threshold:
        probed = probe_filters_broadcast(candidates, filters)
        fresh = probed.filter(~F.col("maybe_seen")).drop("maybe_seen")
        suspect = probed.filter(F.col("maybe_seen")).drop("maybe_seen")
        if seen is None:
            # nothing crawled yet (round 1): an empty filter can still
            # flag maybe_seen=false for everything, so suspect is empty —
            # but keep the plan shape identical for determinism
            confirmed_new = suspect
        else:
            confirmed_new = exact_new_urls(suspect, seen)
        # NOTE the two branches re-run the probe within one action; the
        # broadcast probe is a cheap map stage so this is the faster
        # shape at small/mid state (no candidate shuffle at all)
        return fresh.unionByName(confirmed_new)
    return filter_new_cogrouped(candidates, seen, filters, num_partitions)
