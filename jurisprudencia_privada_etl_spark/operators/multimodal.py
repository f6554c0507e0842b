"""Multimodal column plumbing: image/audio/video as opaque binary + metadata.

The reference carries binary payloads as ``ContentType = {data: Buffer,
extension: string}`` (sharepoint.ts:658-675, 266-283).  Here a multimodal
asset is a row ``(asset_id, media_type, data: binary, meta: struct)`` and all
per-asset compute is ``mapInPandas`` over Arrow batches.

The actual codecs (PIL/ffmpeg/librosa) are NOT in this container, so the
decode kernels are stubbed: ``decode_stub_mode='fake'`` produces
deterministic features derived from the bytes (testable plumbing),
``'strict'`` raises NotImplementedError where the real library call belongs.
The Spark-side contract — schemas, batch iteration, partitioning — is real
and tested; swapping in a real decoder touches only the marked kernels.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

ASSET_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), False),  # image|audio|video
        T.StructField("data", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.IntegerType(), True),
                    T.StructField("codec", T.StringType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_DIM = 16

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), False),
        T.StructField("n_bytes", T.IntegerType(), True),
        T.StructField("content_sha", T.StringType(), True),
        T.StructField("features", T.ArrayType(T.FloatType()), True),
    ]
)


def synthetic_assets(spark, n: int, seed: int = 42) -> DataFrame:
    """Deterministic fake binary assets for testing the plumbing."""
    media = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.pmod(F.xxhash64("id", F.lit(seed)), F.lit(3)) + 1).cast("int"),
    )
    payload = F.encode(
        F.concat(F.lit("BLOB:"), F.sha2(F.concat(F.lit(seed), F.col("id")), 256)), "utf-8"
    )
    return spark.range(n).select(
        F.col("id").alias("asset_id"),
        media.alias("media_type"),
        payload.alias("data"),
        F.struct(
            F.lit(64).alias("width"),
            F.lit(64).alias("height"),
            (F.pmod(F.xxhash64("id"), F.lit(10000))).cast("int").alias("duration_ms"),
            F.lit("fake").alias("codec"),
        ).alias("meta"),
    )


def _decode_kernel(data: bytes, media_type: str, mode: str) -> np.ndarray:
    """STUB — replace with PIL.Image.open / librosa.load / ffmpeg frame
    sampling in a container that has the codec libraries."""
    if mode == "strict":
        raise NotImplementedError(
            f"real {media_type} decode requires codec libraries not present "
            "in this container; run with decode_stub_mode='fake'"
        )
    # deterministic fake features: bytes → sha256 → 16 floats in [0,1)
    h = hashlib.sha256(data or b"").digest()
    return np.frombuffer(h[: FEATURE_DIM * 2], dtype=np.uint16).astype(np.float32) / 65535.0


def extract_features(df: DataFrame, decode_stub_mode: str = "fake") -> DataFrame:
    """Decode + featurize each asset — one Arrow batch at a time.

    Partitioning note: assets are large blobs; upstream should
    ``repartition`` by asset_id so batches hold a bounded byte volume
    (maxRecordsPerBatch also caps Arrow batch size).
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            feats = [
                _decode_kernel(d, m, decode_stub_mode)
                for d, m in zip(pdf["data"], pdf["media_type"])
            ]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": pdf["data"].map(lambda b: len(b) if b is not None else 0).astype("int32"),
                    "content_sha": pdf["data"].map(
                        lambda b: hashlib.sha256(b or b"").hexdigest()
                    ),
                    "features": feats,
                }
            )

    return df.mapInPandas(run, schema=FEATURES_SCHEMA)


def resize_images(df: DataFrame, width: int, height: int, decode_stub_mode: str = "fake") -> DataFrame:
    """Resize stub: real implementation decodes, resizes, re-encodes.  The
    fake mode passes bytes through and rewrites meta dims — enough to test
    schema and batching."""
    out_schema = ASSET_SCHEMA

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            if decode_stub_mode == "strict":
                raise NotImplementedError("image resize requires PIL; not in container")
            meta = pd.DataFrame(list(pdf["meta"]))
            meta["width"] = width
            meta["height"] = height
            pdf = pdf.assign(meta=meta.to_dict("records"))
            yield pdf

    return df.where(F.col("media_type") == "image").mapInPandas(run, schema=out_schema)


def sample_frames(df: DataFrame, every_ms: int = 1000, decode_stub_mode: str = "fake") -> DataFrame:
    """Frame-sampling stub for video: real impl emits one row per sampled
    frame.  Fake mode emits deterministic frame stamps from meta.duration_ms
    — exercises the one-to-many mapInPandas shape."""
    out_schema = T.StructType(
        [
            T.StructField("asset_id", T.LongType(), False),
            T.StructField("frame_ms", T.IntegerType(), False),
            T.StructField("frame_sha", T.StringType(), True),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            if decode_stub_mode == "strict":
                raise NotImplementedError("video decode requires ffmpeg; not in container")
            rows = []
            for _, r in pdf.iterrows():
                dur = (r["meta"]["duration_ms"] or 0) if r["meta"] is not None else 0
                for ms in range(0, int(dur), every_ms):
                    rows.append(
                        {
                            "asset_id": r["asset_id"],
                            "frame_ms": ms,
                            "frame_sha": hashlib.sha256(
                                (r["data"] or b"") + ms.to_bytes(4, "big")
                            ).hexdigest(),
                        }
                    )
            yield pd.DataFrame(rows, columns=["asset_id", "frame_ms", "frame_sha"]).astype(
                {"asset_id": "int64", "frame_ms": "int32"}
            )

    return df.where(F.col("media_type") == "video").mapInPandas(run, schema=out_schema)
