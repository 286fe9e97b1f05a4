"""Multimodal columns: opaque binary payloads with typed metadata.

Images/audio/video are carried as BinaryType columns + a metadata
struct; decode / feature-extraction / resize / frame-sampling run as
Arrow-batched kernels over ``mapInPandas``. The image/audio codec
libraries are NOT in this container, so the decode step is STUBBED:
``decode_features`` raises NotImplementedError unless
``deterministic_fake=True``, which substitutes a hash-derived feature
vector with the same schema/batching — the Spark-side plumbing (schema,
partitioning, UDF signature, Arrow batch shape) is real and tested.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

from dashing_spark.operators.ship import ensure_shipped

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), False),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType(), True),
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.IntegerType(), True),
                ]
            ),
            True,
        ),
    ]
)


def media_from_documents(docs: DataFrame, kind: str = "image") -> DataFrame:
    """Build a media table from the documents fixture: payload = UTF-8
    bytes of text (a deterministic opaque blob), meta derived from it.
    Stands in for a real (url, image_bytes) crawl table."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit(kind).alias("kind"),
        F.encode("text", "UTF-8").alias("payload"),
        F.struct(
            F.lit("application/octet-stream").alias("mime"),
            (F.pmod(F.xxhash64("text"), F.lit(1920)) + 1).cast("int").alias("width"),
            (F.pmod(F.xxhash64("text", F.lit(1)), F.lit(1080)) + 1).cast("int").alias("height"),
            F.octet_length(F.encode("text", "UTF-8")).cast("int").alias("duration_ms"),
        ).alias("meta"),
    )


def payload_stats(media: DataFrame) -> DataFrame:
    """Pure-JVM metadata pass: payload sizes per kind (no decode)."""
    return media.groupBy("kind").agg(
        F.count("*").alias("n_items"),
        F.sum(F.octet_length("payload")).alias("total_bytes"),
        F.max(F.octet_length("payload")).alias("max_bytes"),
    )


def decode_features(
    media: DataFrame,
    dim: int = 16,
    deterministic_fake: bool = False,
) -> DataFrame:
    """Decode payload -> feature vector (array<float>, length `dim`).

    STUB: real decoding needs PIL/ffmpeg (absent here). With
    ``deterministic_fake=True`` features are derived from a hash of the
    payload bytes — deterministic, schema-correct, exercising the full
    Arrow round-trip. Without it, raises NotImplementedError (marked)."""
    ensure_shipped(media.sparkSession)
    try:  # pragma: no cover - decode libs absent in this image
        import PIL  # noqa: F401

        have_decoder = True
    except ImportError:
        have_decoder = False
    if not deterministic_fake and not have_decoder:
        raise NotImplementedError(
            "media decode requires PIL/ffmpeg (not in this image); "
            "pass deterministic_fake=True for the plumbing path"
        )
    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("features", T.ArrayType(T.FloatType()), False),
        ]
    )

    def fn(batches):
        for pdf in batches:
            n = len(pdf)
            feats = np.empty((n, dim), dtype=np.float32)
            for i, payload in enumerate(pdf["payload"]):
                b = np.frombuffer(bytes(payload), dtype=np.uint8)
                # hash-derived fake features: per-dim strided sums
                pad = (-len(b)) % dim
                if pad:
                    b = np.concatenate([b, np.zeros(pad, dtype=np.uint8)])
                feats[i] = b.reshape(-1, dim).sum(axis=0).astype(np.float32)
            norms = np.linalg.norm(feats, axis=1, keepdims=True)
            norms[norms == 0] = 1.0
            feats = feats / norms
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].to_numpy(np.int64),
                    "features": list(feats),
                }
            )

    return media.select("media_id", "payload").mapInPandas(fn, schema=schema)


def frame_sample(media: DataFrame, n_frames: int = 4, frame_bytes: int = 32) -> DataFrame:
    """Deterministic frame sampling stub: slice the payload into
    n_frames evenly-spaced byte windows (the batching/explode shape a
    real video frame sampler has). Output one row per (media_id, frame)."""
    ensure_shipped(media.sparkSession)
    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("frame_idx", T.IntegerType(), False),
            T.StructField("frame", T.BinaryType(), False),
        ]
    )

    def fn(batches):
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                raw = bytes(payload)
                if not raw:
                    continue
                step = max(1, (len(raw) - frame_bytes) // max(1, n_frames - 1))
                for j in range(n_frames):
                    off = min(j * step, max(0, len(raw) - frame_bytes))
                    ids.append(mid)
                    idxs.append(j)
                    frames.append(raw[off : off + frame_bytes])
            yield pd.DataFrame(
                {
                    "media_id": pd.array(ids, dtype="int64"),
                    "frame_idx": pd.array(idxs, dtype="int32"),
                    "frame": frames,
                }
            )

    return media.select("media_id", "payload").mapInPandas(fn, schema=schema)
