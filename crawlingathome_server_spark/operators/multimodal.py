"""Multimodal columns: image/audio/video as opaque ``binary`` + typed
metadata (training-data ops).

The Spark-side plumbing is real and tested — schema, partition-friendly
``mapInPandas`` iteration, Arrow batch shapes, bounded batch sizes. The
codec step itself is stubbed: the sandbox ships no image/audio libraries,
so ``decode_image``/``extract_audio_features`` either raise
``NotImplementedError`` (real-codec mode) or produce a deterministic fake
derived from the bytes (``fake=True``, used by tests). Swapping in a real
decoder is a one-function change; the distributed shape stays identical.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("url", T.StringType(), True),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
    ]
)

IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("feat_dim", T.IntegerType(), False),
        T.StructField("features", T.ArrayType(T.FloatType()), False),
        T.StructField("decode_ok", T.BooleanType(), False),
    ]
)

FRAME_SAMPLE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("frame_hash", T.StringType(), False),
    ]
)


def _fake_features(payload: bytes, dim: int) -> np.ndarray:
    """Deterministic stand-in for a real decoder: seed a PRNG from the
    payload digest. Pure function of the bytes — testable, stable."""
    digest = hashlib.sha256(payload).digest()
    seed = int.from_bytes(digest[:4], "big")
    return np.random.RandomState(seed).standard_normal(dim).astype(np.float32)


def decode_image_features(
    media: DataFrame, *, dim: int = 32, fake: bool = False, batch_size: int = 256
) -> DataFrame:
    """image binary → feature vector via ``mapInPandas``.

    Partition-parallel, Arrow-batched; memory bounded by
    ``spark.sql.execution.arrow.maxRecordsPerBatch`` (set in session.py)
    so a partition of large blobs never materializes at once.
    """

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, ok = [], []
            for payload in pdf["payload"]:
                if payload is None:
                    feats.append([0.0] * dim)
                    ok.append(False)
                    continue
                if not fake:
                    raise NotImplementedError(
                        "real image decoding needs an image codec library "
                        "(not in this sandbox); run with fake=True"
                    )
                feats.append(_fake_features(bytes(payload), dim).tolist())
                ok.append(True)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "feat_dim": dim,
                    "features": feats,
                    "decode_ok": ok,
                }
            )

    return media.filter(F.col("kind") == "image").mapInPandas(
        _decode, IMAGE_FEATURES_SCHEMA
    )


RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("out_width", T.IntegerType(), False),
        T.StructField("out_height", T.IntegerType(), False),
        T.StructField("resized", T.BinaryType(), False),
        T.StructField("scale", T.DoubleType(), False),
    ]
)


def resize_images(
    media: DataFrame, *, max_side: int = 224, fake: bool = False
) -> DataFrame:
    """image binary → resized binary + output dims via ``mapInPandas``.

    Aspect-preserving target dims are computed from the metadata columns
    (real math); the pixel resample itself is the stubbed codec step
    (fake mode emits a deterministic digest-derived payload)."""

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, ws, hs, blobs, scales = [], [], [], [], []
            for media_id, payload, w, h in zip(
                pdf["media_id"], pdf["payload"], pdf["width"], pdf["height"]
            ):
                if payload is None or w is None or h is None:
                    continue
                if not fake:
                    raise NotImplementedError(
                        "real image resampling needs an image codec library; fake=True"
                    )
                scale = min(1.0, max_side / max(int(w), int(h)))
                ow, oh = max(1, round(int(w) * scale)), max(1, round(int(h) * scale))
                digest = hashlib.sha256(bytes(payload) + f"{ow}x{oh}".encode()).digest()
                ids.append(media_id)
                ws.append(ow)
                hs.append(oh)
                blobs.append(digest)
                scales.append(scale)
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "out_width": pd.array(ws, dtype="int32"),
                    "out_height": pd.array(hs, dtype="int32"),
                    "resized": blobs,
                    "scale": scales,
                }
            )

    return media.filter(F.col("kind") == "image").mapInPandas(_resize, RESIZE_SCHEMA)


def sample_video_frames(
    media: DataFrame, *, every_ms: int = 1000, fake: bool = False
) -> DataFrame:
    """video binary → sampled frame rows (one output row per frame).

    The fan-out (1 blob → N frames) happens inside ``mapInPandas``, so
    the blob bytes are read once per partition pass; output is narrow
    (id, idx, hash)."""

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, hashes = [], [], []
            for media_id, payload, duration in zip(
                pdf["media_id"], pdf["payload"], pdf["duration_ms"]
            ):
                if payload is None or duration is None:
                    continue
                if not fake:
                    raise NotImplementedError(
                        "real video decoding needs a codec library; fake=True"
                    )
                n_frames = max(1, int(duration) // every_ms)
                base = hashlib.sha256(bytes(payload)).hexdigest()
                for i in range(n_frames):
                    ids.append(media_id)
                    idxs.append(i)
                    hashes.append(hashlib.sha256(f"{base}:{i}".encode()).hexdigest()[:16])
            yield pd.DataFrame({"media_id": ids, "frame_idx": idxs, "frame_hash": hashes})

    return media.filter(F.col("kind") == "video").mapInPandas(_sample, FRAME_SAMPLE_SCHEMA)


def gen_media(spark, seed: int = 3, n: int = 100) -> DataFrame:
    """Deterministic synthetic media table for tests."""
    rng = np.random.RandomState(seed)
    kinds = rng.choice(["image", "audio", "video"], size=n, p=[0.6, 0.2, 0.2])
    rows = pd.DataFrame(
        {
            "media_id": np.arange(n, dtype="int64"),
            "url": [f"http://media.example.com/{i}" for i in range(n)],
            "kind": kinds,
            "payload": [rng.bytes(64 + int(i) % 128) for i in range(n)],
            "mime": [
                {"image": "image/jpeg", "audio": "audio/wav", "video": "video/mp4"}[k]
                for k in kinds
            ],
            "width": pd.array(
                [int(64 + i % 512) if k == "image" else None for i, k in enumerate(kinds)],
                dtype="Int32",
            ),
            "height": pd.array(
                [int(64 + (i * 3) % 512) if k == "image" else None for i, k in enumerate(kinds)],
                dtype="Int32",
            ),
            "duration_ms": pd.array(
                [int(1000 + (i * 997) % 9000) if k in ("audio", "video") else None
                 for i, k in enumerate(kinds)],
                dtype="Int64",
            ),
        }
    )
    rows["width"] = rows["width"].astype(object).where(rows["width"].notna(), None)
    rows["height"] = rows["height"].astype(object).where(rows["height"].notna(), None)
    rows["duration_ms"] = rows["duration_ms"].astype(object).where(
        rows["duration_ms"].notna(), None
    )
    return spark.createDataFrame(rows, schema=MEDIA_SCHEMA)
