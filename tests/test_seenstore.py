"""Storage-partitioned seen-set machinery: gate_new_storage /
update_filters_storage semantics over Hive-partitioned state dirs, and
seenstore's incremental cache (signature invalidation on overwrite)."""

import os

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from ccspark import seenset, seenstore
from ccspark.checkpoint import Checkpoint

P = 4
CAP = 256


def _identity_pdf(ids):
    """Deterministic (url, identity) rows; ids drive both hashes."""
    ids = np.asarray(ids, dtype=np.int64)
    return pd.DataFrame(
        {
            "url": [f"http://h{i % 7}.com/p{i}" for i in ids],
            "domain_hash": (ids * 1_000_003 + 17),
            "url_hash": (ids * 2_654_435_761 + 3),
        }
    )


def _write_round(spark, ckpt, pdf, round_no):
    df = spark.createDataFrame(pdf).withColumn(
        "partition_id", F.pmod(F.col("domain_hash"), F.lit(P)).cast("int")
    )
    ckpt.write(
        df.repartition(P, "partition_id"), "processed", round_no, partition_by=["partition_id"]
    )


@pytest.fixture()
def state(spark, tmp_path):
    """3 rounds of processed identities + bloom filters updated per round."""
    seenstore.clear_caches()
    ckpt = Checkpoint(str(tmp_path))
    ckpt.write_pdf(
        seenset.empty_filters_pdf(P, "bloom", 10, capacity=CAP),
        "filters",
        0,
        arrow_schema=seenset.filter_arrow_schema(),
        partition_col="partition_id",
    )
    rounds = {1: range(0, 50), 2: range(50, 90), 3: range(90, 120)}
    for r, ids in rounds.items():
        _write_round(spark, ckpt, _identity_pdf(ids), r)
        filt = seenset.update_filters_storage(
            spark, str(tmp_path), r, P, kind="bloom", buckets_per_element=10, capacity=CAP
        )
        ckpt.write(filt, "filters", r, partition_by=["partition_id"])
    return str(tmp_path)


def test_gate_matches_exact_set_difference(spark, state):
    seen = _identity_pdf(range(0, 120))
    cand = _identity_pdf(range(100, 160))  # 20 seen, 40 new
    cdf = spark.createDataFrame(cand)
    got = seenset.gate_new_storage(cdf, state, 3, 3, P).toPandas()
    seen_keys = set(zip(seen["domain_hash"], seen["url_hash"]))
    exp = {
        (d, u) for d, u in zip(cand["domain_hash"], cand["url_hash"])
    } - seen_keys
    assert set(zip(got["domain_hash"], got["url_hash"])) == exp
    assert len(got) == 40


def test_gate_at_earlier_round_sees_less_history(spark, state):
    cand = _identity_pdf(range(60, 100))  # rounds 2/3 territory
    cdf = spark.createDataFrame(cand)
    # at round horizon 1, only ids 0..49 are seen → everything here is new
    got1 = seenset.gate_new_storage(cdf, state, 1, 1, P).toPandas()
    assert len(got1) == 40
    # at horizon 2, ids 60..89 are seen
    got2 = seenset.gate_new_storage(cdf, state, 2, 2, P).toPandas()
    assert len(got2) == 10


def test_update_filters_storage_equals_full_rebuild(spark, state):
    """OR of per-round delta blooms == one bloom built over the union
    (bit-identical, fixed capacity)."""
    incremental = {
        r["partition_id"]: r["bits"]
        for r in Checkpoint(state).read(spark, "filters", 3).collect()
    }
    full = seenset.build_filters(
        spark.createDataFrame(_identity_pdf(range(0, 120))).withColumn(
            "partition_id", F.pmod(F.col("domain_hash"), F.lit(P)).cast("int")
        ),
        P,
        "bloom",
        10,
        capacity=CAP,
    ).collect()
    assert len(full) == len(incremental)
    for row in full:
        assert bytes(row["bits"]) == bytes(incremental[row["partition_id"]])


def test_cache_invalidation_on_round_overwrite(spark, state):
    cand = _identity_pdf(range(90, 130))
    cdf = spark.createDataFrame(cand)
    before = seenset.gate_new_storage(cdf, state, 3, 3, P).toPandas()
    assert len(before) == 10  # 90..119 seen
    # deterministic re-run rewrote round 3 with a DIFFERENT id set
    ckpt = Checkpoint(state)
    _write_round(spark, ckpt, _identity_pdf(range(200, 230)), 3)
    filt = seenset.update_filters_storage(
        spark, state, 3, P, kind="bloom", buckets_per_element=10, capacity=CAP
    )
    ckpt.write(filt, "filters", 3, partition_by=["partition_id"])
    after = seenset.gate_new_storage(cdf, state, 3, 3, P).toPandas()
    assert len(after) == 40  # 90..119 no longer in history


def test_cuckoo_storage_update_and_gate(spark, tmp_path):
    seenstore.clear_caches()
    ckpt = Checkpoint(str(tmp_path))
    ckpt.write_pdf(
        seenset.empty_filters_pdf(P, "cuckoo", 10),
        "filters",
        0,
        arrow_schema=seenset.filter_arrow_schema(),
        partition_col="partition_id",
    )
    _write_round(spark, ckpt, _identity_pdf(range(0, 64)), 1)
    filt = seenset.update_filters_storage(spark, str(tmp_path), 1, P, kind="cuckoo")
    ckpt.write(filt, "filters", 1, partition_by=["partition_id"])
    cand = _identity_pdf(range(32, 96))
    got = seenset.gate_new_storage(
        spark.createDataFrame(cand), str(tmp_path), 1, 1, P
    ).toPandas()
    assert len(got) == 32
    assert set(got["url_hash"]) == set(_identity_pdf(range(64, 96))["url_hash"])


def test_contains_handles_url_hash_collisions():
    url = np.array([5, 5, 9], dtype=np.int64)
    dom = np.array([1, 2, 3], dtype=np.int64)
    order = np.argsort(url, kind="stable")
    q_url = np.array([5, 5, 9, 9, 7], dtype=np.int64)
    q_dom = np.array([2, 4, 3, 1, 1], dtype=np.int64)
    got = seenstore.contains(url[order], dom[order], q_url, q_dom)
    assert got.tolist() == [True, False, True, False, False]


def test_round_pairs_and_missing_partition(tmp_path):
    seenstore.clear_caches()
    assert seenstore.filter_blob(str(tmp_path), 0, 0) is None
    u, d = seenstore.round_pairs(str(tmp_path), 0, 1)
    assert len(u) == 0 and len(d) == 0


# -- state locations: pyarrow.fs + explicit manifests --------------------------


def test_fslocation_local_matches_str_root(spark, state):
    """The same gate through a pyarrow LocalFileSystem location must
    produce the identical novel set (the signature protocol and layout
    are location-invariant)."""
    cand = _identity_pdf(range(100, 160))
    cdf = spark.createDataFrame(cand)
    want = seenset.gate_new_storage(cdf, state, 3, 3, P).toPandas()
    loc = seenstore.FSLocation(state)
    got = seenset.gate_new_storage(cdf, loc, 3, 3, P).toPandas()
    assert set(zip(got["domain_hash"], got["url_hash"])) == set(
        zip(want["domain_hash"], want["url_hash"])
    )
    assert len(got) == 40


def test_fslocation_custom_filesystem_gate_and_filters(spark, state, tmp_path):
    """Full storage path (gate + filter update) through a custom
    pyarrow FileSystem (SubTreeFileSystem = mock object store with
    fs-relative paths)."""
    import functools

    loc = seenstore.FSLocation(
        ".",
        fs_factory=functools.partial(seenstore.make_subtree_fs, state),
        key="mockfs:" + state,
    )
    cand = _identity_pdf(range(100, 160))
    cdf = spark.createDataFrame(cand)
    got = seenset.gate_new_storage(cdf, loc, 3, 3, P).toPandas()
    assert len(got) == 40
    # filter update driven through the custom fs: delta blobs must be
    # bit-identical to the str-root update already in `state`
    filt = seenset.update_filters_storage(
        spark, loc, 3, P, kind="bloom", buckets_per_element=10, capacity=CAP
    ).collect()
    want = {
        r["partition_id"]: bytes(r["bits"])
        for r in Checkpoint(state).read(spark, "filters", 3).collect()
    }
    assert {r["partition_id"]: bytes(r["bits"]) for r in filt} == want


def test_manifest_location_matches_str_root(spark, state):
    """An explicit file manifest (the catalog-metadata path) over the
    same files gates identically."""
    files, rounds = {}, {}
    for table in ("processed", "filters"):
        for r in seenstore._present_rounds(state, table, 3):
            rounds.setdefault(table, set()).add(r)
            for pid in range(P):
                sig = seenstore._sig_of(state, table, r, pid)
                if sig:
                    files[(table, r, pid)] = sig
    loc = seenstore.ManifestLocation("manifest:" + state, files, rounds)
    cand = _identity_pdf(range(100, 160))
    cdf = spark.createDataFrame(cand)
    got = seenset.gate_new_storage(cdf, loc, 3, 3, P).toPandas()
    assert len(got) == 40
    want = seenset.gate_new_storage(cdf, state, 3, 3, P).toPandas()
    assert set(zip(got["domain_hash"], got["url_hash"])) == set(
        zip(want["domain_hash"], want["url_hash"])
    )


def test_filter_blob_merges_multi_file_partitions(tmp_path):
    """A partition split across multiple data files (legal on a catalog
    backend) must be read COMPLETELY — bloom rows of one geometry are
    OR-merged; silently reading one file would break the
    no-false-negative invariant (ADVICE r4)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ccspark import hashing

    seenstore.clear_caches()
    d = tmp_path / "filters" / "round=1" / "partition_id=0"
    d.mkdir(parents=True)
    k, m = 7, 1024
    keys_a = np.arange(0, 50, dtype=np.int64)
    keys_b = np.arange(50, 100, dtype=np.int64)
    for name, keys in (("a.parquet", keys_a), ("b.parquet", keys_b)):
        words = np.zeros(m // 64, dtype=np.uint64)
        idx = hashing.bloom_buckets_long(keys, k, m).ravel()
        np.bitwise_or.at(words, idx >> 6, np.uint64(1) << (idx & 63).astype(np.uint64))
        t = pa.table(
            {
                "kind": ["bloom"],
                "hash_count": pa.array([k], type=pa.int32()),
                "num_buckets": [m],
                "n_keys": [len(keys)],
                "bits": [words.tobytes()],
            }
        )
        pq.write_table(t, str(d / name))
    blob = seenstore.filter_blob(str(tmp_path), 0, 1)
    kind, kk, mm, nk, bits = blob
    assert (kind, kk, mm, nk) == ("bloom", k, m, 100)
    # the merged filter must contain BOTH files' keys (no false negatives)
    probe = seenset.bloom_probe(np.arange(0, 100, dtype=np.int64), kk, mm, bits)
    assert probe.all()
    # mismatched geometry is a layout violation, not silently merged
    words = np.zeros(2048 // 64, dtype=np.uint64)
    t = pa.table(
        {
            "kind": ["bloom"],
            "hash_count": pa.array([k], type=pa.int32()),
            "num_buckets": [2048],
            "n_keys": [1],
            "bits": [words.tobytes()],
        }
    )
    pq.write_table(t, str(d / "c.parquet"))
    with pytest.raises(AssertionError, match="unmergeable"):
        seenstore.filter_blob(str(tmp_path), 0, 1)


def test_fs_for_uri_host_addressed_authority_folding(monkeypatch):
    """HDFS-style filesystems fold the authority into the client
    (from_uri('hdfs://nn:8020/state') → path '/state'); the resolver
    must strip the authority from subsequent paths too — returning the
    raw 'nn:8020/state' would silently list a nonexistent path and the
    novelty gate would treat the whole crawl history as unseen."""
    import pyarrow.fs as pafs

    from ccspark import seenstore

    calls = []

    def fake_from_uri(path):
        calls.append(path)
        # emulate HadoopFileSystem: authority folded into the client,
        # returned path is authority-less
        rest = path.split("://", 1)[1]
        return pafs.LocalFileSystem(), rest[len("nn:8020"):] or "/"

    monkeypatch.setattr(seenstore, "_from_uri", fake_from_uri)
    seenstore._FS_CACHE.clear()
    fs, p1 = seenstore._fs_for_uri("fakehdfs://nn:8020/state/frontier")
    assert p1 == "/state/frontier"
    # cached client: a DIFFERENT path under the same authority must be
    # authority-stripped the same way (the bug returned 'nn:8020/...')
    fs2, p2 = seenstore._fs_for_uri("fakehdfs://nn:8020/state/filters/f.parquet")
    assert fs2 is fs
    assert p2 == "/state/filters/f.parquet"
    assert len(calls) == 1  # client built once per (scheme, authority)
    seenstore._FS_CACHE.clear()


def test_fs_for_uri_bucket_addressed_keeps_authority(monkeypatch):
    """S3-style filesystems keep the bucket in the path
    (from_uri('s3://bucket/k') → path 'bucket/k'); later paths must NOT
    be stripped."""
    import pyarrow.fs as pafs

    from ccspark import seenstore

    def fake_from_uri(path):
        rest = path.split("://", 1)[1]
        return pafs.LocalFileSystem(), rest  # bucket kept in path

    monkeypatch.setattr(seenstore, "_from_uri", fake_from_uri)
    seenstore._FS_CACHE.clear()
    _fs, p1 = seenstore._fs_for_uri("fakes3://bucket/state/frontier")
    assert p1 == "bucket/state/frontier"
    _fs2, p2 = seenstore._fs_for_uri("fakes3://bucket/state/filters/f.parquet")
    assert p2 == "bucket/state/filters/f.parquet"
    seenstore._FS_CACHE.clear()


def test_fs_for_uri_credentialed_bucket_prefix(monkeypatch):
    """Credentialed bucket URIs (s3://user:pass@bucket/k): from_uri
    drops the userinfo but KEEPS the bucket in the path.  The recorded
    prefix must be 'bucket', not a boolean keep/strip of the whole
    authority (which would strip the bucket from later paths)."""
    import pyarrow.fs as pafs

    from ccspark import seenstore

    def fake_from_uri(path):
        rest = path.split("://", 1)[1]
        authority = rest.split("/", 1)[0]
        bucket = authority.rsplit("@", 1)[-1]
        return pafs.LocalFileSystem(), bucket + rest[len(authority):]

    monkeypatch.setattr(seenstore, "_from_uri", fake_from_uri)
    seenstore._FS_CACHE.clear()
    _fs, p1 = seenstore._fs_for_uri("fakes3c://u:p@bucket/state/frontier")
    assert p1 == "bucket/state/frontier"
    _fs2, p2 = seenstore._fs_for_uri("fakes3c://u:p@bucket/state/filters/f.parquet")
    assert p2 == "bucket/state/filters/f.parquet"
    seenstore._FS_CACHE.clear()


def test_fs_for_uri_normalized_path_does_not_poison_cache(monkeypatch):
    """ADVICE r5: when from_uri NORMALIZES the first-resolved path
    (here: collapsing duplicate slashes) neither prefix rule can prove
    an authority prefix — the resolver must fall back to per-path
    from_uri resolution instead of caching a guessed prefix that would
    silently mis-address every later path under the authority."""
    from ccspark import seenstore

    class FakeFS:
        pass

    fs = FakeFS()

    def fake_from_uri(path):
        rest = path.partition("://")[2]
        p = "/" + rest.split("/", 1)[1]
        while "//" in p:
            p = p.replace("//", "/")  # normalizing store
        return fs, p

    monkeypatch.setattr(seenstore, "_from_uri", fake_from_uri)
    seenstore._FS_CACHE.clear()
    # first path contains a duplicate slash -> normalized -> unmappable
    fs1, p1 = seenstore._fs_for_uri("fakefs://auth/state//frontier")
    assert p1 == "/state/frontier"
    # later paths must still resolve correctly (per-path from_uri),
    # not under a guessed prefix
    fs2, p2 = seenstore._fs_for_uri("fakefs://auth/state/filters/f.parquet")
    assert fs2 is fs
    assert p2 == "/state/filters/f.parquet"
    seenstore._FS_CACHE.clear()
