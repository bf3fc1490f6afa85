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

STATE LOCATIONS — every public function takes a ``loc`` that is one of

* a plain ``str`` path: POSIX shared-FS root (local disk in tests,
  NFS/Lustre/EFS on a cluster) listed with ``os`` calls — the fast
  path for the parquet-emulation backend;
* :class:`FSLocation`: the same ``<table>/round=k/partition_id=p``
  layout behind a ``pyarrow.fs.FileSystem`` (S3/HDFS/GCS or any
  custom filesystem) — object-store deployments;
* :class:`ManifestLocation`: an explicit file manifest (path, size)
  per (table, round, partition) produced from CATALOG metadata — the
  Iceberg backend enumerates each round's data files from the table's
  ``.files`` metadata (driver-side, O(delta) rows) and ships the
  listing into the gate closures, so workers partition-prune without
  any directory-layout assumption (ccspark.catalog.state_location).

Cache-correctness invariants (hold for all three):
* cache entries are validated against a file signature
  (name, size, mtime_ns) on every access, so an overwritten round
  (kill → deterministic re-run) or dropped crash debris invalidates
  cleanly even with warm, reused Python workers; Iceberg data files
  are immutable-by-name, so (path, size) alone is a sound signature
  there (mtime recorded as 0);
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


# -- filesystem resolution (object-store paths) --------------------------------

_FS_CACHE: dict = {}  # per-process: (scheme, authority) -> (FileSystem, keeps_authority)


def _from_uri(path: str):
    """pyarrow FileSystem.from_uri behind a module-level indirection
    (the pyarrow class is an immutable extension type, unpatchable in
    tests)."""
    import pyarrow.fs as pafs

    return pafs.FileSystem.from_uri(path)


def _fs_for_uri(path: str):
    """(FileSystem, fs-relative path) for a ``scheme://`` URI, cached per
    scheme+authority so S3/HDFS clients are built once per worker.

    Path-mapping caveat: ``FileSystem.from_uri`` KEEPS part of the
    authority in the returned path for bucket-addressed stores
    (s3://bucket/k → 'bucket/k'; credentialed s3://u:p@bucket/k also
    → 'bucket/k') but FOLDS it into the client for host-addressed
    ones (hdfs://nn:8020/state → '/state').  The first resolution for
    a (scheme, authority) records the PREFIX from_uri puts before the
    URI's path part; later paths under the same authority get the
    same prefix — a naive keep/strip-the-authority rule mis-addresses
    one of the conventions and the gate would silently list a
    nonexistent path (treating the whole crawl history as unseen)."""
    scheme, _, rest = path.partition("://")
    authority = rest.split("/", 1)[0]
    key = (scheme, authority)
    hit = _FS_CACHE.get(key)
    if hit is None:
        fs, fs_path = _from_uri(path)
        path_part = rest[len(authority):]  # "/a/b" or ""
        if path_part and fs_path.endswith(path_part):
            prefix = fs_path[: -len(path_part)]
        elif path_part and fs_path.endswith(path_part.lstrip("/")):
            stripped = path_part.lstrip("/")
            prefix = fs_path[: -len(stripped)].rstrip("/")
        elif not path_part:  # root URI (no path part): fs_path IS the prefix
            prefix = fs_path
        else:
            # from_uri normalized the path (percent-escapes, duplicate
            # or trailing slashes, '.' segments) so no prefix is
            # provable — do NOT cache a guess (a wrong prefix would
            # silently mis-address every later path under this
            # authority, listing nonexistent state = full recrawl).
            # Mark the authority unmappable: reuse the cached client but
            # resolve every path through from_uri.
            _FS_CACHE[key] = (fs, None)
            return fs, fs_path
        _FS_CACHE[key] = (fs, prefix)
        return fs, fs_path
    fs, prefix = hit
    if prefix is None:  # unmappable authority: per-path resolution
        _, fs_path = _from_uri(path)
        return fs, fs_path
    tail = rest[len(authority):]
    if not tail:
        return fs, prefix or "/"
    base = prefix.rstrip("/")
    return fs, base + (tail if tail.startswith("/") else "/" + tail)


def _read_parquet(path: str, columns, fs=None):
    import pyarrow.parquet as pq

    if fs is not None:
        return pq.read_table(path, columns=columns, filesystem=fs)
    if "://" in path:
        fs2, rel = _fs_for_uri(path)
        return pq.read_table(rel, columns=columns, filesystem=fs2)
    return pq.read_table(path, columns=columns)


class FSLocation:
    """State root behind a ``pyarrow.fs.FileSystem`` — same Hive layout
    as a plain path root, listed/stat'd/read through pyarrow so the
    state can live on S3/HDFS/GCS.  ``fs_factory`` is a picklable
    zero-arg callable returning the FileSystem (module-level function
    or functools.partial — it is pickled into gate closures; the built
    filesystem itself is cached per worker process and never pickled).
    Without a factory the filesystem is resolved from the root: a
    ``scheme://`` URI via ``FileSystem.from_uri``, otherwise the local
    filesystem."""

    def __init__(self, root: str, fs_factory=None, key: str | None = None):
        self.root = root.rstrip("/")
        self.fs_factory = fs_factory
        self.key = key if key is not None else "fs:" + self.root

    def __getstate__(self):
        d = self.__dict__.copy()
        d.pop("_fs", None)
        d.pop("_root_path", None)
        return d

    def _resolved(self):
        if "_fs" not in self.__dict__:
            import pyarrow.fs as pafs

            if self.fs_factory is not None:
                self._fs, self._root_path = self.fs_factory(), self.root
            elif "://" in self.root:
                self._fs, self._root_path = _fs_for_uri(self.root)
            else:
                self._fs, self._root_path = pafs.LocalFileSystem(), self.root
        return self._fs, self._root_path

    @staticmethod
    def _join(*parts: str) -> str:
        # fs-relative join tolerant of "" / "." roots (SubTree-style
        # filesystems address paths relative to their base)
        return "/".join(p for p in parts if p not in ("", "."))

    def sig(self, table: str, round_no: int, pid: int) -> tuple:
        import pyarrow.fs as pafs

        fs, rp = self._resolved()
        d = self._join(rp, table, f"round={round_no}", f"partition_id={pid}")
        infos = fs.get_file_info(pafs.FileSelector(d, allow_not_found=True))
        out = [
            (i.path, i.size, i.mtime_ns or 0)
            for i in infos
            if i.type == pafs.FileType.File and i.path.endswith(".parquet")
        ]
        return tuple(sorted(out))

    def present_rounds(self, table: str, upto_round: int) -> list[int]:
        import pyarrow.fs as pafs

        fs, rp = self._resolved()
        infos = fs.get_file_info(pafs.FileSelector(self._join(rp, table), allow_not_found=True))
        out = []
        for i in infos:
            base = i.base_name
            if base.startswith("round="):
                try:
                    r = int(base.split("=", 1)[1])
                except ValueError:
                    continue
                if r <= upto_round:
                    out.append(r)
        return sorted(out)

    def read_table(self, path: str, columns):
        fs, _ = self._resolved()
        return _read_parquet(path, columns, fs=fs)


def make_subtree_fs(base: str):
    """Picklable fs-factory building block: a SubTreeFileSystem rooted
    at ``base`` over the local filesystem.  Use
    ``functools.partial(make_subtree_fs, base)`` as FSLocation's
    fs_factory — partials of this module-level function pickle into
    gate closures cleanly (worker processes import ccspark, not the
    caller's module)."""
    import pyarrow.fs as pafs

    return pafs.SubTreeFileSystem(base, pafs.LocalFileSystem())


class ManifestLocation:
    """Explicit file manifest: ``files[(table, round, pid)] = ((path,
    size, mtime_ns), ...)`` — produced driver-side from catalog
    metadata (Iceberg ``.files``), shipped into gate closures.  File
    paths are absolute (URIs allowed); each is read through the
    filesystem its scheme resolves to (or ``fs_factory`` when given).
    ``key`` must be STABLE across rounds (e.g. ``iceberg:cat.ns``) so
    the per-worker incremental seen cache keeps accumulating — catalog
    data files are immutable-by-name, so a refreshed manifest carries
    identical signatures for unchanged rounds and the validation
    passes without re-reads."""

    def __init__(self, key: str, files: dict, rounds: dict, fs_factory=None):
        self.key = key
        self.files = files
        self.rounds = {t: tuple(sorted(rs)) for t, rs in rounds.items()}
        self.fs_factory = fs_factory

    def __getstate__(self):
        d = self.__dict__.copy()
        d.pop("_fs", None)
        return d

    def sig(self, table: str, round_no: int, pid: int) -> tuple:
        return self.files.get((table, int(round_no), int(pid)), ())

    def present_rounds(self, table: str, upto_round: int) -> list[int]:
        return [r for r in self.rounds.get(table, ()) if r <= upto_round]

    def read_table(self, path: str, columns):
        if self.fs_factory is not None:
            if "_fs" not in self.__dict__:
                self._fs = self.fs_factory()
            return _read_parquet(path, columns, fs=self._fs)
        return _read_parquet(path, columns)


# -- location dispatch ---------------------------------------------------------


def _loc_key(loc):
    return loc if isinstance(loc, str) else loc.key


def _pid_dir(root: str, table: str, round_no: int, pid: int) -> str:
    return os.path.join(root, table, f"round={round_no}", f"partition_id={pid}")


def _files_sig(d: str) -> tuple:
    """(path, size, mtime_ns) per parquet file — the cache-invalidation
    fingerprint.  A re-written round changes mtimes; a dropped round
    disappears; both force a clean reload."""
    try:
        names = sorted(os.listdir(d))
    except (FileNotFoundError, NotADirectoryError):
        return ()
    out = []
    for n in names:
        if n.endswith(".parquet"):
            p = os.path.join(d, n)
            st = os.stat(p)
            out.append((p, st.st_size, st.st_mtime_ns))
    return tuple(out)


def _sig_of(loc, table: str, round_no: int, pid: int) -> tuple:
    if isinstance(loc, str):
        return _files_sig(_pid_dir(loc, table, round_no, pid))
    return loc.sig(table, round_no, pid)


def _read_one(loc, path: str, columns):
    if isinstance(loc, str):
        return _read_parquet(path, columns)
    return loc.read_table(path, columns)


def _read_pairs(loc, sig: tuple) -> tuple[np.ndarray, np.ndarray]:
    """Read (url_hash, domain_hash) columns of one partition's files."""
    urls, doms = [], []
    for path, _, _ in sig:
        t = _read_one(loc, path, ["url_hash", "domain_hash"])
        urls.append(t.column("url_hash").to_numpy(zero_copy_only=False))
        doms.append(t.column("domain_hash").to_numpy(zero_copy_only=False))
    if not urls:
        e = np.array([], dtype=np.int64)
        return e, e
    return (
        np.concatenate(urls).astype(np.int64, copy=False),
        np.concatenate(doms).astype(np.int64, copy=False),
    )


def _present_rounds(loc, table: str, upto_round: int) -> list[int]:
    if not isinstance(loc, str):
        return loc.present_rounds(table, upto_round)
    tdir = os.path.join(loc, table)
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


def round_pairs(loc, pid: int, round_no: int, table: str = "processed") -> tuple[np.ndarray, np.ndarray]:
    """One round's (url_hash, domain_hash) delta for one partition —
    uncached single-directory read (the filter-update job's delta)."""
    return _read_pairs(loc, _sig_of(loc, table, round_no, pid))


# -- incremental seen-set cache ------------------------------------------------

# (loc_key, table, pid) -> {"sigs": {round: sig}, "upto": int,
#                           "url": sorted int64[], "dom": aligned int64[]}
_SEEN_CACHE: OrderedDict = OrderedDict()


def _cache_size_bytes() -> int:
    return sum(len(e["url"]) * _PAIR_BYTES for e in _SEEN_CACHE.values())


def _evict_to_budget() -> None:
    budget = _cache_budget()
    while len(_SEEN_CACHE) > 1 and _cache_size_bytes() > budget:
        _SEEN_CACHE.popitem(last=False)  # LRU


def seen_arrays(loc, pid: int, upto_round: int, table: str = "processed") -> tuple[np.ndarray, np.ndarray]:
    """Sorted (url_hash, aligned domain_hash) of every identity this
    partition has disposed of in rounds 1..upto_round.

    Incremental: cached rounds are signature-validated (cheap stats),
    then only rounds not yet loaded are read and merged — per crawl
    round each partition reads exactly its one new delta file."""
    key = (_loc_key(loc), table, pid)
    rounds = _present_rounds(loc, table, upto_round)
    entry = _SEEN_CACHE.get(key)
    if entry is not None:
        _SEEN_CACHE.move_to_end(key)
        stale = set(entry["sigs"]) - set(rounds)  # dropped/over-horizon rounds
        if not stale:
            for r, sig in entry["sigs"].items():
                if _sig_of(loc, table, r, pid) != sig:
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
            sig = _sig_of(loc, table, r, pid)
            u, dm = _read_pairs(loc, sig)
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

# (loc_key, table, pid, round) -> (sig, (kind, hash_count, num_buckets, n_keys, bits))
_BLOB_CACHE: OrderedDict = OrderedDict()
_BLOB_CACHE_MAX = 256

_FILTER_COLS = ["kind", "hash_count", "num_buckets", "n_keys", "bits"]


def filter_blob(loc, pid: int, round_no: int, table: str = "filters"):
    """One partition's filter row at one round, read straight from its
    partition files (partition-pruned; no Spark scan).  Returns
    (kind, hash_count, num_buckets, n_keys, bits) or None when the
    partition has no files.

    EVERY listed file is read: a writer that splits a partition across
    files (possible on a real catalog backend) must not silently drop
    part of the filter — a bloom filter missing bits would produce
    false negatives, breaking the gate's exactness.  Multiple bloom
    rows of identical geometry are OR-merged (the no-false-negative-
    safe union); anything else is a layout violation and raises."""
    sig = _sig_of(loc, table, round_no, pid)
    if not sig:
        return None
    key = (_loc_key(loc), table, pid, round_no)
    cached = _BLOB_CACHE.get(key)
    if cached is not None and cached[0] == sig:
        _BLOB_CACHE.move_to_end(key)
        return cached[1]
    rows = []
    for path, _, _ in sig:
        t = _read_one(loc, path, _FILTER_COLS)
        for i in range(t.num_rows):
            rows.append(
                (
                    t.column("kind")[i].as_py(),
                    int(t.column("hash_count")[i].as_py()),
                    int(t.column("num_buckets")[i].as_py()),
                    int(t.column("n_keys")[i].as_py()),
                    t.column("bits")[i].as_py(),
                )
            )
    if not rows:
        return None
    if len(rows) == 1:
        row = rows[0]
    else:
        kinds = {r[0] for r in rows}
        geoms = {(r[1], r[2]) for r in rows}
        if kinds != {"bloom"} or len(geoms) != 1:
            raise AssertionError(
                f"filter partition {pid} round {round_no}: {len(rows)} rows "
                f"(kinds={kinds}, geometries={geoms}) — unmergeable filter layout"
            )
        acc = np.zeros(rows[0][2] // 64, dtype=np.uint64)
        for r in rows:
            acc |= np.frombuffer(r[4], dtype=np.uint64)
        row = ("bloom", rows[0][1], rows[0][2], sum(r[3] for r in rows), acc.tobytes())
    _BLOB_CACHE[key] = (sig, row)
    while len(_BLOB_CACHE) > _BLOB_CACHE_MAX:
        _BLOB_CACHE.popitem(last=False)
    return row


def clear_caches() -> None:
    """Test hook: forget all worker-side state."""
    _SEEN_CACHE.clear()
    _BLOB_CACHE.clear()
    _FS_CACHE.clear()
