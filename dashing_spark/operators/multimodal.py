"""Multimodal columns: opaque binary payloads with typed metadata.

Images/audio/video are carried as BinaryType columns + a metadata
struct; decode / feature-extraction / resize / frame-sampling run as
Arrow-batched kernels over ``mapInPandas``.

Decoding is PLUGGABLE, keyed by ``meta.mime``: register a codec with
``register_decoder(mime, bytes -> np.ndarray)``. Two real codecs ship
in-container (stdlib, no native deps): ``application/zlib``
(DEFLATE-compressed byte payloads) and ``audio/wav`` (RIFF/WAVE PCM via
the `wave` module), plus the identity codec for raw octet streams.
Codecs that need PIL/ffmpeg (jpeg/mp4) are absent from this image;
for those mimes ``decode_features`` still raises NotImplementedError
unless ``deterministic_fake=True`` substitutes hash-derived features
with the same schema/batching.
"""

from __future__ import annotations

import io
import wave
import zlib
from typing import Callable

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

from dashing_spark.operators.ship import ensure_shipped


def _decode_wav(b: bytes) -> np.ndarray:
    with wave.open(io.BytesIO(b)) as w:
        data = w.readframes(w.getnframes())
    return np.frombuffer(data, dtype=np.int16)


#: mime -> (payload bytes -> 1-D numeric array of decoded units)
DECODERS: dict[str, Callable[[bytes], np.ndarray]] = {
    "application/zlib": lambda b: np.frombuffer(zlib.decompress(b), dtype=np.uint8),
    "audio/wav": _decode_wav,
    "application/octet-stream": lambda b: np.frombuffer(b, dtype=np.uint8),
}


def register_decoder(mime: str, fn: Callable[[bytes], np.ndarray]) -> None:
    """Plug in a codec (e.g. a PIL-based jpeg decoder where available)."""
    DECODERS[mime] = fn

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
        # NULL text -> empty payload (payload is declared non-null)
        F.encode(F.coalesce(F.col("text"), F.lit("")), "UTF-8").alias("payload"),
        F.struct(
            F.lit("application/octet-stream").alias("mime"),
            (F.pmod(F.xxhash64("text"), F.lit(1920)) + 1).cast("int").alias("width"),
            (F.pmod(F.xxhash64("text", F.lit(1)), F.lit(1080)) + 1).cast("int").alias("height"),
            F.octet_length(F.encode("text", "UTF-8")).cast("int").alias("duration_ms"),
        ).alias("meta"),
    )


def media_with_codecs(docs: DataFrame) -> DataFrame:
    """documents -> media table with REAL encoded payloads: per doc one
    zlib-compressed text blob (kind 'text') and one RIFF/WAVE PCM clip
    (kind 'audio', n_chars int16 samples derived deterministically from
    doc_id) — so the decode tier exercises genuine codecs end-to-end."""
    ensure_shipped(docs.sparkSession)

    def fn(batches):
        for pdf in batches:
            out = {k: [] for k in ("media_id", "kind", "payload", "meta")}
            for doc_id, text, n_chars in zip(
                pdf["doc_id"], pdf["text"], pdf["n_chars"]
            ):
                # NULL text must not become the literal bytes b'None'
                # (and NULL n_chars must not crash int(nan)) — a NULL
                # doc is an empty payload, mirrored by the coalesce in
                # the oracle twins
                if text is None or (isinstance(text, float) and pd.isna(text)):
                    text = ""
                if n_chars is None or (
                    isinstance(n_chars, float) and pd.isna(n_chars)
                ):
                    n_chars = 0
                raw = str(text).encode("utf-8")
                out["media_id"].append(int(doc_id))
                out["kind"].append("text")
                out["payload"].append(zlib.compress(raw, level=6))
                out["meta"].append(
                    {"mime": "application/zlib", "width": None, "height": None,
                     "duration_ms": len(raw)}
                )
                n = int(n_chars)
                i = np.arange(n, dtype=np.int64)
                pcm = (((int(doc_id) * 31 + i * 7) % 256 - 128) * 64).astype("<i2")
                buf = io.BytesIO()
                with wave.open(buf, "wb") as w:
                    w.setnchannels(1)
                    w.setsampwidth(2)
                    w.setframerate(16000)
                    w.writeframes(pcm.tobytes())
                out["media_id"].append(int(doc_id))
                out["kind"].append("audio")
                out["payload"].append(buf.getvalue())
                out["meta"].append(
                    {"mime": "audio/wav", "width": None, "height": None,
                     "duration_ms": n * 1000 // 16000}
                )
            yield pd.DataFrame(out)

    return docs.select("doc_id", "text", "n_chars").mapInPandas(
        fn, schema=MEDIA_SCHEMA
    )


def payload_stats(media: DataFrame) -> DataFrame:
    """Pure-JVM metadata pass: payload sizes per kind (no decode)."""
    return media.groupBy("kind").agg(
        F.count("*").alias("n_items"),
        F.sum(F.octet_length("payload")).alias("total_bytes"),
        F.max(F.octet_length("payload")).alias("max_bytes"),
    )


def _feature_kernel(decoded: np.ndarray, dim: int) -> np.ndarray:
    """Deterministic features from a decoded 1-D numeric array:
    normalized per-dim strided sums (the shape a real embedding has)."""
    b = np.asarray(decoded, dtype=np.float64)
    pad = (-len(b)) % dim
    if pad:
        b = np.concatenate([b, np.zeros(pad)])
    f = b.reshape(-1, dim).sum(axis=0)
    n = np.linalg.norm(f)
    return (f / n if n > 0 else f).astype(np.float32)


def _decode_payload(
    decoders: dict, mime: str, raw: bytes, deterministic_fake: bool
) -> np.ndarray:
    """The codec-resolution contract, in ONE place: registered codec ->
    decode; else deterministic byte-view fake when opted in (same
    schema/batching as a real codec); else raise. Every decode tier
    (decode_payloads / decode_features / resize_decoded) goes through
    here so the contract cannot drift between them."""
    dec = decoders.get(mime)
    if dec is not None:
        return dec(raw)
    if deterministic_fake:
        return np.frombuffer(raw, dtype=np.uint8)
    raise NotImplementedError(
        f"no registered decoder for {mime}; register one or pass "
        "deterministic_fake=True for the plumbing path"
    )


def decode_payloads(
    media: DataFrame, deterministic_fake: bool = False
) -> DataFrame:
    """Decode each payload through its mime's registered codec, emitting
    (media_id, kind, n_units, unit_sum): the decoded length (bytes /
    PCM samples) and the sum of decoded values — decode-proof stats an
    oracle can recompute from the source data. Unknown mimes raise."""
    ensure_shipped(media.sparkSession)
    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("kind", T.StringType(), False),
            T.StructField("n_units", T.LongType(), False),
            T.StructField("unit_sum", T.LongType(), False),
        ]
    )

    decoders = dict(DECODERS)  # snapshot: ships in the closure to executors

    def fn(batches):
        for pdf in batches:
            n_units, unit_sum = [], []
            for mime, payload in zip(pdf["mime"], pdf["payload"]):
                vals = _decode_payload(
                    decoders, mime, bytes(payload), deterministic_fake
                )
                n_units.append(len(vals))
                unit_sum.append(int(vals.astype(np.int64).sum()))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].to_numpy(np.int64),
                    "kind": pdf["kind"],
                    "n_units": pd.array(n_units, dtype="int64"),
                    "unit_sum": pd.array(unit_sum, dtype="int64"),
                }
            )

    return media.select(
        "media_id", "kind", F.col("meta.mime").alias("mime"), "payload"
    ).mapInPandas(fn, schema=schema)


def decode_features(
    media: DataFrame,
    dim: int = 16,
    deterministic_fake: bool = False,
) -> DataFrame:
    """Decode payload -> feature vector (array<float>, length `dim`)
    through the mime-keyed codec registry (zlib / wav / raw are real,
    in-container codecs). For mimes with no registered codec,
    ``deterministic_fake=True`` substitutes hash-derived features with
    the same schema/batching; otherwise NotImplementedError."""
    ensure_shipped(media.sparkSession)
    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("features", T.ArrayType(T.FloatType()), False),
        ]
    )

    decoders = dict(DECODERS)  # snapshot: ships in the closure to executors

    def fn(batches):
        for pdf in batches:
            n = len(pdf)
            feats = np.empty((n, dim), dtype=np.float32)
            for i, (mime, payload) in enumerate(zip(pdf["mime"], pdf["payload"])):
                vals = _decode_payload(
                    decoders, mime, bytes(payload), deterministic_fake
                )
                feats[i] = _feature_kernel(vals, dim)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].to_numpy(np.int64),
                    "features": list(feats),
                }
            )

    return media.select(
        "media_id", F.col("meta.mime").alias("mime"), "payload"
    ).mapInPandas(fn, schema=schema)


def resize_decoded(
    media: DataFrame,
    target_len: int = 64,
    deterministic_fake: bool = False,
) -> DataFrame:
    """Decode payload -> fixed-length resample (array<float>, length
    ``target_len``) — the resize step of a media pipeline. Mean-pool
    over equal strides of the decoded sample array: for PCM audio this
    IS a (box-filter) resample; for images it is the honest 1-D
    stand-in until a real pixel codec is registered (PIL is not in this
    container). Same registry/fake/raise contract as decode_features."""
    ensure_shipped(media.sparkSession)
    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("resized", T.ArrayType(T.FloatType()), False),
        ]
    )
    decoders = dict(DECODERS)  # snapshot: ships in the closure to executors

    def _pool(vals: np.ndarray) -> np.ndarray:
        v = np.asarray(vals, dtype=np.float64)
        if len(v) == 0:
            return np.zeros(target_len, dtype=np.float32)
        # mean over target_len equal strides (boundaries by rounding)
        bounds = np.linspace(0, len(v), target_len + 1).round().astype(np.int64)
        sums = np.add.reduceat(v, np.minimum(bounds[:-1], len(v) - 1))
        widths = np.maximum(np.diff(bounds), 1)
        return (sums[:target_len] / widths).astype(np.float32)

    def fn(batches):
        for pdf in batches:
            out = []
            for mime, payload in zip(pdf["mime"], pdf["payload"]):
                vals = _decode_payload(
                    decoders, mime, bytes(payload), deterministic_fake
                )
                out.append(_pool(vals))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].to_numpy(np.int64),
                    "resized": out,
                }
            )

    return media.select(
        "media_id", F.col("meta.mime").alias("mime"), "payload"
    ).mapInPandas(fn, schema=schema)


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
