"""Multimodal column handling: opaque binary payloads + typed metadata.

Images/audio/video ride through the engine as ``binary`` columns with a
metadata struct; the Spark-side plumbing (schema, partition sizing,
Arrow batch shape, mapInPandas signatures) is real and tested, while the
codec-dependent decode step is stubbed: this container ships no
image/audio libraries, so ``decode_image``/``decode_audio`` raise
``NotImplementedError`` unless ``deterministic_fake=True``, which
substitutes a seeded, fully deterministic byte-statistics "decode" with
the same output schema — letting the downstream pipeline (resize /
feature-extract / frame-sample shapes) run end-to-end.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_META_SCHEMA = "media_type string, n_bytes long, digest string"
FEATURE_SCHEMA = (
    "doc_id long, media_type string, n_bytes long, digest string, "
    "width int, height int, features array<double>"
)


def with_media_meta(df: DataFrame, binary_col: str, media_type: str = "image") -> DataFrame:
    """Typed metadata for an opaque binary column — pure Catalyst."""
    return (
        df.withColumn("media_type", F.lit(media_type))
        .withColumn("n_bytes", F.octet_length(F.col(binary_col)).cast("long"))
        .withColumn("digest", F.sha2(F.col(binary_col), 256))
    )


def _fake_decode(payload: bytes) -> tuple[int, int, np.ndarray]:
    """Deterministic stand-in for a real image decode: dimensions from a
    digest, 'pixels' from byte statistics.  Replace with PIL/np decode
    in a codec-equipped deployment."""
    h = hashlib.sha256(payload).digest()
    width = 16 + h[0] % 64
    height = 16 + h[1] % 64
    arr = np.frombuffer(payload, dtype=np.uint8)
    hist = np.bincount(arr % 16, minlength=16).astype(np.float64)
    hist /= max(hist.sum(), 1.0)
    return width, height, hist


def extract_features(
    df: DataFrame,
    id_col: str,
    binary_col: str,
    media_type: str = "image",
    deterministic_fake: bool = False,
):
    """mapInPandas feature extraction over binary payloads.

    Real deployments plug a codec into ``_decode``; here the decode is
    stubbed (see module docstring)."""

    def _decode(payload: bytes):
        if not deterministic_fake:
            raise NotImplementedError(
                "media decode requires an image/audio codec library; "
                "run with deterministic_fake=True for the plumbing path"
            )
        return _fake_decode(payload)

    def _extract(batches):
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf[id_col], pdf[binary_col]):
                payload = bytes(payload)
                width, height, feats = _decode(payload)
                rows.append(
                    {
                        "doc_id": int(doc_id),
                        "media_type": media_type,
                        "n_bytes": len(payload),
                        "digest": hashlib.sha256(payload).hexdigest(),
                        "width": int(width),
                        "height": int(height),
                        "features": feats.tolist(),
                    }
                )
            yield pd.DataFrame(rows)

    return df.select(id_col, binary_col).mapInPandas(_extract, schema=FEATURE_SCHEMA)
