"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata.

The Spark-side plumbing (schema, partition sizing, Arrow batch shape,
UDF signatures) is real and tested. Since round 4 the decode itself
is REAL for PNG and WAV (datapipe/media.py — stdlib-only readers for
the public formats, with encoder twins for fixtures); video and other
mimes remain stubbed behind the deterministic fake (no codec library
exists in-sandbox), and `decoder_available(mime)` reports per-mime.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, mime string, width int, height int, "
    "duration_ms int, payload binary"
)

FEATURE_SCHEMA = "media_id long, kind string, feature array<float>, n_bytes int"


REAL_DECODE_MIMES = frozenset({"image/png", "audio/wav", "audio/x-wav"})


def decoder_available(mime: str | None = None) -> bool:
    """Per-mime: PNG/WAV decode is stdlib-real (datapipe/media.py);
    other mimes need PIL/av, absent here. mime=None keeps the old
    any-external-lib answer for the video/stub paths."""
    if mime in REAL_DECODE_MIMES:
        return True
    try:
        import PIL  # noqa: F401

        return True
    except ImportError:
        return False


def _fake_feature(payload: np.ndarray, dim: int = 16) -> np.ndarray:
    """Deterministic stand-in for decode+embed: byte-histogram moments.
    Replace with a real decoder when decoder_available()."""
    if len(payload) == 0:
        return np.zeros(dim, dtype=np.float32)
    b = np.frombuffer(payload, dtype=np.uint8)
    hist = np.bincount(b % dim, minlength=dim).astype(np.float32)
    return hist / max(len(b), 1)


def extract_features(df: DataFrame, dim: int = 16) -> DataFrame:
    """mapInPandas feature extraction over binary payloads. Arrow
    moves the bytes in columnar batches; PNG/WAV payloads decode for
    REAL (datapipe/media.py), other mimes take the deterministic fake
    (video: no codec in-sandbox). Malformed payloads fall back to the
    fake rather than failing the batch (DLQ-style tolerance). Needs a
    `mime` column when real decode should fire; without one every row
    takes the fake path (the pre-round-4 behavior)."""

    def fn(it):
        from .media import audio_features, image_features

        for pdf in it:
            mimes = (
                pdf["mime"] if "mime" in pdf.columns
                else [None] * len(pdf)
            )
            feats = []
            for p, mime in zip(pdf["payload"], mimes):
                if p is None:
                    feats.append([0.0] * dim)
                    continue
                try:
                    if mime == "image/png":
                        feats.append(image_features(bytes(p), dim))
                        continue
                    if mime in ("audio/wav", "audio/x-wav"):
                        feats.append(audio_features(bytes(p), dim))
                        continue
                except Exception:
                    pass  # malformed media -> deterministic fake
                feats.append(
                    _fake_feature(
                        np.frombuffer(p, dtype=np.uint8), dim
                    ).tolist()
                )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "feature": feats,
                    "n_bytes": [len(p) if p is not None else 0 for p in pdf["payload"]],
                }
            )

    keep = [c for c in ("media_id", "kind", "mime", "payload") if c in df.columns]
    return df.select(*keep).mapInPandas(fn, schema=FEATURE_SCHEMA)


def synthesize_media(spark, n: int = 64) -> DataFrame:
    """Deterministic fake media table (for tests/bench): payload bytes
    derived from the row id."""
    df = spark.range(n).select(
        F.col("id").alias("media_id"),
        F.when(F.col("id") % 3 == 0, "image")
        .when(F.col("id") % 3 == 1, "audio")
        .otherwise("video")
        .alias("kind"),
        F.when(F.col("id") % 3 == 0, "image/png")
        .when(F.col("id") % 3 == 1, "audio/wav")
        .otherwise("video/mp4")
        .alias("mime"),
        (F.col("id") % 64 + 1).cast("int").alias("width"),
        (F.col("id") % 48 + 1).cast("int").alias("height"),
        (F.col("id") * 100 % 10_000).cast("int").alias("duration_ms"),
        F.sha2(F.col("id").cast("string"), 256).cast("binary").alias("payload"),
    )
    return df


def frame_sample(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plumbing: 1->N rows, one per sampled frame
    timestamp (decode stubbed; the explode shape is what matters)."""
    return df.filter(F.col("kind") == "video").select(
        "media_id",
        F.explode(
            F.sequence(
                F.lit(0), F.greatest(F.col("duration_ms") - 1, F.lit(0)), F.lit(every_ms)
            )
        ).alias("frame_ts_ms"),
        "payload",
    )
