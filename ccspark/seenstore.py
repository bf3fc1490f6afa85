"""Worker-side, partition-pruned reads of checkpointed crawl state —
the storage half of the shuffle-free novelty gate.

The frontier writes its state tables Hive-partitioned by
``partition_id = pmod(domain_hash, P)`` (one file per partition per
round, see frontier.py), so the Python worker handling partition ``p``
reads exactly ``<table>/round=<k>/partition_id=<p>/*.parquet`` — a
manual storage-partitioned join: the seen-set and the filter blobs are
NEVER carried through a Spark Exchange.  An incremental per-worker
cache turns the per-round read volume from O(history) to O(delta):
each round appends one file per partition, and only that file is read
and merged into the cached sorted key arrays.

Reference analog: shard-stable ``part-NNNNN`` result files keyed by
shard id (Query.java:1080-1082) — the reference never re-shuffles
crawl history between rounds either; each shard's worker owns its
hash-range files.

Deployment constraints:
* paths must be worker-readable shared storage (local disk in tests,
  NFS/Lustre/EFS on a cluster — the same constraint checkpoint.py
  documents; for S3/HDFS swap the ``os``/``pyarrow`` calls for the
  corresponding filesystem client, the protocol is identical);
* cache entries are validated against a file signature
  (name, size, mtime_ns) on every access, so an overwritten round
  (kill → deterministic re-run) or dropped crash debris invalidates
  cleanly even with warm, reused Python workers;
* cache memory is bounded (CCSPARK_SEEN_CACHE_BYTES, default 1 GiB
  per worker) with LRU eviction — at 10^10 keys and P partitions a
  worker serving its share of partitions holds
  ``16 bytes × keys/P × partitions/worker``.
"""

from __future__ import annotations

import os
from collections import OrderedDict

import numpy as np

_PAIR_BYTES = 16  # int64 url_hash + int64 domain_hash per cached key


def _cache_budget() -> int:
    return int(os.environ.get("CCSPARK_SEEN_CACHE_BYTES", 1 << 30))


def _pid_dir(root: str, table: str, round_no: int, pid: int) -> str:
    return os.path.join(root, table, f"round={round_no}", f"partition_id={pid}")


def _files_sig(d: str) -> tuple:
    """(name, size, mtime_ns) per parquet file — the cache-invalidation
    fingerprint.  A re-written round changes mtimes; a dropped round
    disappears; both force a clean reload."""
    try:
        names = sorted(os.listdir(d))
    except (FileNotFoundError, NotADirectoryError):
        return ()
    out = []
    for n in names:
        if n.endswith(".parquet"):
            st = os.stat(os.path.join(d, n))
            out.append((n, st.st_size, st.st_mtime_ns))
    return tuple(out)


def _read_pairs(d: str, sig: tuple) -> tuple[np.ndarray, np.ndarray]:
    """Read (url_hash, domain_hash) columns of one partition directory."""
    import pyarrow.parquet as pq

    urls, doms = [], []
    for name, _, _ in sig:
        t = pq.read_table(os.path.join(d, name), columns=["url_hash", "domain_hash"])
        urls.append(t.column("url_hash").to_numpy(zero_copy_only=False))
        doms.append(t.column("domain_hash").to_numpy(zero_copy_only=False))
    if not urls:
        e = np.array([], dtype=np.int64)
        return e, e
    return (
        np.concatenate(urls).astype(np.int64, copy=False),
        np.concatenate(doms).astype(np.int64, copy=False),
    )


def _present_rounds(root: str, table: str, upto_round: int) -> list[int]:
    tdir = os.path.join(root, table)
    try:
        subs = os.listdir(tdir)
    except FileNotFoundError:
        return []
    out = []
    for s in subs:
        if s.startswith("round="):
            try:
                r = int(s.split("=", 1)[1])
            except ValueError:
                continue
            if r <= upto_round:
                out.append(r)
    return sorted(out)


def round_pairs(root: str, pid: int, round_no: int, table: str = "processed") -> tuple[np.ndarray, np.ndarray]:
    """One round's (url_hash, domain_hash) delta for one partition —
    uncached single-directory read (the filter-update job's delta)."""
    d = _pid_dir(root, table, round_no, pid)
    return _read_pairs(d, _files_sig(d))


# -- incremental seen-set cache ------------------------------------------------

# (root, table, pid) -> {"sigs": {round: sig}, "upto": int,
#                        "url": sorted int64[], "dom": aligned int64[]}
_SEEN_CACHE: OrderedDict = OrderedDict()


def _cache_size_bytes() -> int:
    return sum(len(e["url"]) * _PAIR_BYTES for e in _SEEN_CACHE.values())


def _evict_to_budget() -> None:
    budget = _cache_budget()
    while len(_SEEN_CACHE) > 1 and _cache_size_bytes() > budget:
        _SEEN_CACHE.popitem(last=False)  # LRU


def seen_arrays(root: str, pid: int, upto_round: int, table: str = "processed") -> tuple[np.ndarray, np.ndarray]:
    """Sorted (url_hash, aligned domain_hash) of every identity this
    partition has disposed of in rounds 1..upto_round.

    Incremental: cached rounds are signature-validated (cheap stats),
    then only rounds not yet loaded are read and merged — per crawl
    round each partition reads exactly its one new delta file."""
    key = (root, table, pid)
    rounds = _present_rounds(root, table, upto_round)
    entry = _SEEN_CACHE.get(key)
    if entry is not None:
        _SEEN_CACHE.move_to_end(key)
        stale = set(entry["sigs"]) - set(rounds)  # dropped/over-horizon rounds
        if not stale:
            for r, sig in entry["sigs"].items():
                if _files_sig(_pid_dir(root, table, r, pid)) != sig:
                    stale = {r}
                    break
        if stale:
            del _SEEN_CACHE[key]
            entry = None
    if entry is None:
        entry = {"sigs": {}, "url": np.array([], dtype=np.int64), "dom": np.array([], dtype=np.int64)}
        _SEEN_CACHE[key] = entry
    new_rounds = [r for r in rounds if r not in entry["sigs"]]
    if new_rounds:
        urls, doms = [entry["url"]], [entry["dom"]]
        for r in new_rounds:
            d = _pid_dir(root, table, r, pid)
            sig = _files_sig(d)
            u, dm = _read_pairs(d, sig)
            entry["sigs"][r] = sig
            urls.append(u)
            doms.append(dm)
        url = np.concatenate(urls)
        dom = np.concatenate(doms)
        order = np.argsort(url, kind="stable")
        url = url[order]
        dom = dom[order]
        # dedupe identity pairs: revisit cycles legitimately re-append
        # scheduled identities to the processed log (it IS the fetch
        # trace), but the in-memory membership set must stay bounded by
        # the number of UNIQUE identities, not the number of fetches
        if len(url) > 1:
            keep = np.ones(len(url), dtype=bool)
            keep[1:] = (url[1:] != url[:-1]) | (dom[1:] != dom[:-1])
            if not keep.all():
                url = url[keep]
                dom = dom[keep]
        entry["url"] = url
        entry["dom"] = dom
        _evict_to_budget()
    return entry["url"], entry["dom"]


def contains(url_sorted: np.ndarray, dom_aligned: np.ndarray, q_url: np.ndarray, q_dom: np.ndarray) -> np.ndarray:
    """Exact composite-key membership of query pairs against the sorted
    seen arrays: binary search on url_hash, then domain_hash check over
    the (almost always length-1) equal-url run."""
    if len(url_sorted) == 0 or len(q_url) == 0:
        return np.zeros(len(q_url), dtype=bool)
    lo = np.searchsorted(url_sorted, q_url, side="left")
    hi = np.searchsorted(url_sorted, q_url, side="right")
    hit = np.zeros(len(q_url), dtype=bool)
    single = hi - lo == 1
    if single.any():
        hit[single] = dom_aligned[lo[single]] == q_dom[single]
    multi = np.flatnonzero(hi - lo > 1)
    for i in multi:  # url_hash collisions across domains: ~never
        hit[i] = bool((dom_aligned[lo[i] : hi[i]] == q_dom[i]).any())
    return hit


# -- filter-blob cache ---------------------------------------------------------

# (root, table, pid, round) -> (sig, (kind, hash_count, num_buckets, n_keys, bits))
_BLOB_CACHE: OrderedDict = OrderedDict()
_BLOB_CACHE_MAX = 256


def filter_blob(root: str, pid: int, round_no: int, table: str = "filters"):
    """One partition's filter row at one round, read straight from its
    partition directory (partition-pruned; no Spark scan).  Returns
    (kind, hash_count, num_buckets, n_keys, bits) or None when the
    partition directory does not exist."""
    import pyarrow.parquet as pq

    d = _pid_dir(root, table, round_no, pid)
    sig = _files_sig(d)
    if not sig:
        return None
    key = (root, table, pid, round_no)
    cached = _BLOB_CACHE.get(key)
    if cached is not None and cached[0] == sig:
        _BLOB_CACHE.move_to_end(key)
        return cached[1]
    t = pq.read_table(
        os.path.join(d, sig[0][0]),
        columns=["kind", "hash_count", "num_buckets", "n_keys", "bits"],
    )
    row = (
        t.column("kind")[0].as_py(),
        int(t.column("hash_count")[0].as_py()),
        int(t.column("num_buckets")[0].as_py()),
        int(t.column("n_keys")[0].as_py()),
        t.column("bits")[0].as_py(),
    )
    _BLOB_CACHE[key] = (sig, row)
    while len(_BLOB_CACHE) > _BLOB_CACHE_MAX:
        _BLOB_CACHE.popitem(last=False)
    return row


def clear_caches() -> None:
    """Test hook: forget all worker-side state."""
    _SEEN_CACHE.clear()
    _BLOB_CACHE.clear()
