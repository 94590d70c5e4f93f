"""Multimodal column plumbing: binary media columns + typed metadata.

Media (image/audio/video) ride as opaque ``binary`` columns with a typed
metadata struct; decode / feature-extraction / resize / frame-sample are
Arrow-batched ``mapInPandas`` kernels. The decode step itself is STUBBED
(image/audio libraries are not in this container): ``decode_image_stub``
raises ``NotImplementedError`` unless ``fake=True``, in which case a
deterministic fake decoder (bytes -> stable pseudo-pixels) exercises the
full Spark plumbing — schema, partitioning, UDF signature, Arrow batch
shape — which IS real and tested.

Schema convention:
  media(doc_id long, kind string, data binary,
        meta struct<width int, height int, sample_rate int, n_frames int>)
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "doc_id long, kind string, data binary, "
    "meta struct<width:int, height:int, sample_rate:int, n_frames:int>"
)


def synth_media(spark: SparkSession, n: int) -> DataFrame:
    """Deterministic fake media table (binary payload = hash-expanded bytes)."""
    df = spark.range(n)
    payload = F.encode(
        F.concat(F.lit("media-payload-"), F.md5(F.col("id").cast("string"))), "UTF-8"
    )
    kind = F.when(F.col("id") % 3 == 0, "image").when(F.col("id") % 3 == 1, "audio").otherwise("video")
    meta = F.struct(
        (16 + F.col("id") % 16).cast("int").alias("width"),
        (16 + F.col("id") % 8).cast("int").alias("height"),
        F.lit(16000).cast("int").alias("sample_rate"),
        (1 + F.col("id") % 10).cast("int").alias("n_frames"),
    )
    return df.select(
        F.col("id").alias("doc_id"), kind.alias("kind"), payload.alias("data"), meta.alias("meta")
    )


def decode_image_stub(data: bytes, width: int, height: int, fake: bool = False) -> np.ndarray:
    """STUB: real impl would be PIL/cv2 decode. ``fake=True`` -> deterministic
    pseudo-pixels derived from the payload hash (uint8 HxWx3)."""
    if not fake:
        raise NotImplementedError(
            "image decode requires PIL/cv2 (not in this container); "
            "pass fake=True for the deterministic test decoder"
        )
    seed = hashlib.md5(data).digest()
    rng = np.frombuffer(
        hashlib.sha256(seed).digest() * ((width * height * 3) // 32 + 1), dtype=np.uint8
    )
    return rng[: width * height * 3].reshape(height, width, 3).copy()


def image_features(media: DataFrame, fake_decode: bool = True) -> DataFrame:
    """(doc_id, mean_r, mean_g, mean_b, n_pixels) via mapInPandas.

    The Spark-side plumbing (Arrow batches of binary + struct metadata in,
    typed feature rows out) is the real deliverable; the decoder is the stub.
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                img = decode_image_stub(
                    bytes(r["data"]), int(r["meta"]["width"]), int(r["meta"]["height"]),
                    fake=fake_decode,
                )
                means = img.reshape(-1, 3).mean(axis=0)
                rows.append(
                    (int(r["doc_id"]), float(means[0]), float(means[1]),
                     float(means[2]), int(img.shape[0] * img.shape[1]))
                )
            yield pd.DataFrame(
                rows, columns=["doc_id", "mean_r", "mean_g", "mean_b", "n_pixels"]
            )

    return (
        media.filter(F.col("kind") == "image")
        .mapInPandas(
            kernel,
            schema="doc_id long, mean_r double, mean_g double, mean_b double, n_pixels long",
        )
    )


def frame_sample(media: DataFrame, every_n: int = 2) -> DataFrame:
    """(doc_id, frame_idx) sampled frame indices from video metadata — pure
    column exprs (sequence + explode); the decode of each frame would slot
    into ``image_features``' kernel."""
    return (
        media.filter(F.col("kind") == "video")
        .select(
            "doc_id",
            F.explode(
                F.sequence(F.lit(0), F.col("meta.n_frames") - 1, F.lit(every_n))
            ).alias("frame_idx"),
        )
    )


def audio_window_plan(media: DataFrame, window_ms: int = 25, hop_ms: int = 10) -> DataFrame:
    """(doc_id, win_start_ms) feature-window plan from sample_rate metadata —
    the partitioning/shape layer under any real audio featurizer."""
    dur_ms = (F.length("data") * 1000 / F.col("meta.sample_rate")).cast("long")
    return (
        media.filter(F.col("kind") == "audio")
        .select(
            "doc_id",
            F.explode(
                F.sequence(F.lit(0), F.greatest(dur_ms - window_ms, F.lit(0)), F.lit(hop_ms))
            ).alias("win_start_ms"),
        )
    )
