"""Spark column-level functions: the engine's scalar-function surface.

Everything is a vectorized Arrow pandas UDF over the numpy kernels in
``ccspark.hashing`` / ``ccspark.urls`` (no per-row Python in the hot
path), or a composition of built-in ``pyspark.sql.functions``.

Maps the reference's scalar operator surface (SURVEY.md §2.2/§2.3):
canonicalize (URLUtils.java:355-434), URLFPV2 (URLUtils.java:308-336),
fp64 (FPGenerator.java), simhash (SimHash.java:55-106), hamming join
predicate (SimHash.hammingDistance → built-in bit ops).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import (
    BooleanType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from .. import hashing, urls

# ---------------------------------------------------------------------------
# pandas UDFs
# ---------------------------------------------------------------------------


@pandas_udf(StringType())
def canonicalize_url(s: pd.Series) -> pd.Series:
    """Canonical URL (reference URLUtils.canonicalizeURL semantics);
    null for invalid URLs."""
    return urls.canonicalize_batch(s)


# The canonicalization kernels are pure functions, but they are marked
# non-deterministic so Catalyst cannot push a filter on their output
# below the projection and DUPLICATE the evaluation (two ArrowEvalPython
# nodes for one UDF call — the round-6 q_urlfp_dedup/_identify plans
# paid the kernel twice per row; spark_optimization_guide §4.4).
canonicalize_url = canonicalize_url.asNondeterministic()


_URLFP_SCHEMA = StructType(
    [
        StructField("domain_hash", LongType()),
        StructField("url_hash", LongType()),
        StructField("root_domain_hash", LongType()),
        StructField("valid", BooleanType()),
    ]
)


@pandas_udf(_URLFP_SCHEMA)
def urlfp(canonical: pd.Series) -> pd.DataFrame:
    """URLFPV2 struct from a canonical URL (URLUtils.getURLFPV2FromCanonicalURL)."""
    return urls.urlfp_batch(canonical)


urlfp = urlfp.asNondeterministic()  # see canonicalize_url note


_CANON_FP_SCHEMA = StructType(
    [
        StructField("canonical_url", StringType()),
        StructField("domain_hash", LongType()),
        StructField("url_hash", LongType()),
        StructField("root_domain_hash", LongType()),
        StructField("valid", BooleanType()),
        StructField("host", StringType()),
    ]
)


@pandas_udf(_CANON_FP_SCHEMA)
def canonical_urlfp(raw: pd.Series) -> pd.DataFrame:
    """Fused canonicalize + URLFPV2 in ONE Arrow pass — half the
    JVM↔Python traffic of chaining the two UDFs; use this in hot paths.
    The byte-matrix kernel's host byproduct (== fastGetHostFromURL of
    the canonical URL) also rides along, so callers that need the host
    skip the url_host re-extraction hop entirely."""
    canon, hosts = urls.canonicalize_batch_with_host(raw)
    fp = urls.urlfp_batch(canon, hosts=hosts)
    fp.insert(0, "canonical_url", canon)
    fp["host"] = hosts
    return fp


canonical_urlfp = canonical_urlfp.asNondeterministic()  # see canonicalize_url note


@pandas_udf(StringType())
def url_host(canonical: pd.Series) -> pd.Series:
    """Host component of a canonical URL (URLUtils.fastGetHostFromURL)."""
    return canonical.str.extract(urls._FAST_HOST_RE, expand=False)


@pandas_udf(StringType())
def root_domain(host: pd.Series) -> pd.Series:
    """Registrable root domain per the public-suffix list."""
    return host.map(lambda h: urls.extract_root_domain_name(h) if isinstance(h, str) else None)


@pandas_udf(LongType())
def fp64(s: pd.Series) -> pd.Series:
    """Rabin FP64 of a string column (FPGenerator.std64.fp)."""
    return pd.Series(hashing.fp64_utf16(s.tolist()), index=s.index)


@pandas_udf(LongType())
def simhash64(s: pd.Series) -> pd.Series:
    """64-bit simhash of a text column (SimHash.computeOptimizedSimHashForString)."""
    return pd.Series(hashing.simhash64_batch(s.tolist()), index=s.index)


@pandas_udf(LongType())
def simhash64_bytes(s: pd.Series) -> pd.Series:
    """64-bit simhash of a binary column via 8-byte-gram shingles
    (SimHash.computeOptimizedSimHashForBytes, golden-gated against the
    compiled reference incl. its sign-extension quirk)."""
    return pd.Series(hashing.simhash64_bytes_batch(s.tolist()), index=s.index)


# ---------------------------------------------------------------------------
# Column expressions (pure Catalyst — no Python)
# ---------------------------------------------------------------------------


def hamming_distance(a: Column, b: Column) -> Column:
    """popcount(a XOR b) via built-in bit ops — stays in codegen."""
    return F.bit_count(a.bitwiseXOR(b))


def partition_id_for(col: Column, num_partitions: int) -> Column:
    """Stable hash-range partition id: pmod(hash, P) on an int64 column.

    This is the engine's explicit partitioning key (SURVEY.md §4): the
    seen-set, frontier and lineage tables all share it so probe/build
    never reshuffle."""
    return F.pmod(col, F.lit(num_partitions)).cast("int")


# ---------------------------------------------------------------------------
# DataFrame transformers
# ---------------------------------------------------------------------------


def with_canonical(df: DataFrame, url_col: str = "url", out_col: str = "canonical_url") -> DataFrame:
    return df.withColumn(out_col, canonicalize_url(F.col(url_col)))


def with_canonical_urlfp(df: DataFrame, url_col: str = "url", with_host: bool = False) -> DataFrame:
    """Fused identity columns from a raw url column (single Arrow hop).

    ``with_host`` additionally exposes the kernel's canonical-host
    byproduct as ``host`` — identical to ``url_host(canonical_url)``
    but without a second JVM↔Python hop."""
    df = df.withColumn("_cfp", canonical_urlfp(F.col(url_col)))
    df = (
        df.withColumn("canonical_url", F.col("_cfp.canonical_url"))
        .withColumn("domain_hash", F.col("_cfp.domain_hash"))
        .withColumn("url_hash", F.col("_cfp.url_hash"))
        .withColumn("root_domain_hash", F.col("_cfp.root_domain_hash"))
        .withColumn("url_valid", F.col("_cfp.valid"))
    )
    if with_host:
        df = df.withColumn("host", F.col("_cfp.host"))
    return df.drop("_cfp")


def with_urlfp(
    df: DataFrame,
    canonical_col: str = "canonical_url",
    num_partitions: int | None = None,
) -> DataFrame:
    """Attach URLFPV2 columns (domain_hash, url_hash, root_domain_hash,
    url_valid) and optionally the explicit partition id."""
    df = df.withColumn("_fp", urlfp(F.col(canonical_col)))
    df = (
        df.withColumn("domain_hash", F.col("_fp.domain_hash"))
        .withColumn("url_hash", F.col("_fp.url_hash"))
        .withColumn("root_domain_hash", F.col("_fp.root_domain_hash"))
        .withColumn("url_valid", F.col("_fp.valid"))
        .drop("_fp")
    )
    if num_partitions is not None:
        df = df.withColumn("partition_id", partition_id_for(F.col("domain_hash"), num_partitions))
    return df
