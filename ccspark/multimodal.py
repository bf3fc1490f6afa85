"""Multimodal column handling: opaque binary payloads + typed metadata.

Images/audio/video ride through the engine as ``binary`` columns with a
metadata struct.  The decode stage is REAL for PNG, 16-bit-PCM WAV and
JPEG (baseline AND progressive) — pure numpy/stdlib codecs in
ccspark.media / ccspark.jpeg (zlib + filter reconstruction / RIFF /
LUT huffman + DCT), no external image libraries needed.  Video
(MP4/WebM) parses REAL container metadata — dimensions + duration from
the box/EBML structures (ccspark.video) — while frame/codec decode
stays honestly out of scope (needs codec libraries this environment
doesn't ship; a real pipeline's GPU decode stage plugs into _decode).
Unrecognized formats raise unless ``deterministic_fake`` substitutes a
seeded byte-statistics "decode" with the same output schema, so the
downstream plumbing (schema, partition sizing, Arrow batch shape)
still runs end-to-end for every format.
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
    carry: tuple = (),
):
    """mapInPandas feature extraction over binary payloads.

    ``carry`` columns ride through to the output unchanged (same
    linear-plan trick as links.extract_hrefs: joining the features back
    to the input would recompute the payload subtree per branch).

    Real deployments plug a codec into ``_decode``; here PNG/WAV/JPEG
    decode and MP4/WebM metadata are real (see module docstring)."""

    def _decode(payload: bytes):
        from . import media

        kind = media.sniff_media(payload)
        if kind == "image/png":
            w, h, _c, img = media.decode_png(payload)
            return w, h, np.asarray(media.image_features(img))
        if kind == "audio/wav":
            rate, _nch, samples = media.decode_wav(payload)
            return 0, 0, np.asarray(media.audio_features(rate, samples))
        if kind == "image/jpeg":
            from . import jpeg

            w, h, _c, img = jpeg.decode_jpeg(payload)
            return w, h, np.asarray(media.image_features(img))
        if kind in ("video/mp4", "video/webm"):
            from . import video

            meta = video.parse_video_meta(payload)
            # features: [duration_ms] — the container-metadata surface;
            # frame decode needs codec libs this environment lacks (the
            # GPU/codec stage of a real pipeline plugs in here)
            dur = meta["duration_ms"]
            return (
                meta["width"],
                meta["height"],
                np.asarray([float(dur) if dur is not None else -1.0]),
            )
        if not deterministic_fake:
            raise NotImplementedError(
                f"no decoder for {kind}; PNG/WAV/JPEG decode and MP4/WebM "
                "metadata are real, run with deterministic_fake=True for "
                "other formats"
            )
        return _fake_decode(payload)

    carry = list(carry)

    def _extract(batches):
        for pdf in batches:
            rows = []
            for j, (doc_id, payload) in enumerate(zip(pdf[id_col], pdf[binary_col])):
                payload = bytes(payload)
                width, height, feats = _decode(payload)
                row = {
                    "doc_id": int(doc_id),
                    "media_type": media_type,
                    "n_bytes": len(payload),
                    "digest": hashlib.sha256(payload).hexdigest(),
                    "width": int(width),
                    "height": int(height),
                    "features": feats.tolist(),
                }
                for c in carry:
                    row[c] = pdf[c].iloc[j]
                rows.append(row)
            yield pd.DataFrame(rows, columns=["doc_id", "media_type", "n_bytes", "digest", "width", "height", "features", *carry])

    carry_ddl = "".join(
        f", {f.name} {f.dataType.simpleString()}" for f in df.schema if f.name in carry
    )
    return df.select(id_col, binary_col, *carry).mapInPandas(
        _extract, schema=FEATURE_SCHEMA + carry_ddl
    )
