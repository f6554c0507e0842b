"""Multimodal column plumbing: image/audio/video as opaque binary + metadata.

The reference carries binary payloads as ``ContentType = {data: Buffer,
extension: string}`` (sharepoint.ts:658-675, 266-283).  Here a multimodal
asset is a row ``(asset_id, media_type, data: binary, meta: struct)`` and all
per-asset compute is ``mapInPandas`` over Arrow batches.

Two modalities are REAL decoders (no external codec needed — see
functions/codecs.py): WAV/PCM16 audio via the stdlib ``wave`` module and
24-bit BMP images via a direct header parse; features come from the decoded
samples/pixels.  Video has no stdlib codec, so its kernel stays a stub.
Modes: ``'auto'`` (default) — real decode when the payload is WAV/BMP,
deterministic fake features otherwise; ``'strict'`` — real decode or
NotImplementedError (no silent fakes); ``'fake'`` — always fake (plumbing
tests).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from jurisprudencia_privada_etl_spark.functions import codecs

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


# synthetic asset geometry: fixed so the container headers are constants the
# DuckDB oracle can embed as hex literals (see queries._multimodal_oracle_sql)
AUDIO_DATA_BYTES = 800  # 400 PCM16 samples @ 8 kHz = 0.05 s
IMG_W, IMG_H = 8, 8  # 24-bit rows of 24 bytes → no padding → 192 pixel bytes
IMG_DATA_BYTES = IMG_W * IMG_H * 3
VIDEO_DATA_BYTES = 32


def sha_chain(key: str, n_bytes: int) -> bytes:
    """Deterministic byte stream: concat of sha256(f"{key}:{j}") digests,
    truncated.  Engine-independent by construction — DuckDB reproduces it as
    string concatenation of sha256 hex digests (hex-of-concat == concat-of-
    hex), which is what makes the multimodal payloads oracle-checkable."""
    n_blocks = (n_bytes + 31) // 32
    return b"".join(
        hashlib.sha256(f"{key}:{j}".encode()).digest() for j in range(n_blocks)
    )[:n_bytes]


def wav_header(data_bytes: int = AUDIO_DATA_BYTES) -> bytes:
    """The 44-byte canonical RIFF/WAVE PCM16 header for a payload of
    ``data_bytes`` (1 channel, 8 kHz) — sliced off a real stdlib encode so
    it can never drift from what decode_wav accepts."""
    full = codecs.encode_wav(np.zeros(data_bytes // 2, dtype="<i2"))
    return full[: len(full) - data_bytes]


def bmp_header() -> bytes:
    """The 54-byte BMP file+info header for an IMG_W×IMG_H 24-bit image."""
    full = codecs.encode_bmp(np.zeros((IMG_H, IMG_W, 3), dtype=np.uint8))
    return full[: len(full) - IMG_DATA_BYTES]


def synthetic_assets(spark, n: int, seed: int = 42) -> DataFrame:
    """Deterministic binary assets: REAL WAV bytes for audio rows, REAL BMP
    bytes for image rows (decodable by the real kernels), an opaque blob for
    video rows (whose kernel is a stub).  Generated inside Arrow batches —
    never on the driver.

    Payloads are ``<canonical container header> + sha_chain(seed:i, size)``:
    fully decodable (the chain bytes are the PCM samples / BGR pixels) AND
    byte-reconstructible by the DuckDB oracle from hex literals + sha256
    string concatenation, so the driver can verify the multimodal pipeline's
    n_bytes/payload-digest end-to-end."""
    wav_hdr, bmp_hdr = wav_header(), bmp_header()

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                i = int(i)
                kind = ("image", "audio", "video")[(i + seed) % 3]
                key = f"{seed}:{i}"
                if kind == "audio":
                    wav = wav_hdr + sha_chain(key, AUDIO_DATA_BYTES)
                    rows.append((i, kind, wav, None, None, 50, "pcm16"))
                elif kind == "image":
                    bmp = bmp_hdr + sha_chain(key, IMG_DATA_BYTES)
                    rows.append((i, kind, bmp, IMG_W, IMG_H, None, "bmp24"))
                else:
                    blob = b"BLOB:" + sha_chain(key, VIDEO_DATA_BYTES)
                    rows.append((i, kind, blob, 64, 64, (i * 97) % 10000, "fake"))
            yield pd.DataFrame(
                {
                    "asset_id": [r[0] for r in rows],
                    "media_type": [r[1] for r in rows],
                    "data": [r[2] for r in rows],
                    "meta": [
                        {"width": r[3], "height": r[4], "duration_ms": r[5], "codec": r[6]}
                        for r in rows
                    ],
                }
            )

    return spark.range(n).mapInPandas(gen, schema=ASSET_SCHEMA)


def _decode_kernel(data: bytes, media_type: str, mode: str) -> np.ndarray:
    """Real decode for WAV (stdlib wave), 24-bit BMP, and uncompressed-DIB
    AVI (codecs.py); compressed video and unknown payloads fall back per
    mode ('auto' → deterministic fake, 'strict' → NotImplementedError, the
    slot where ffmpeg/PIL would go)."""
    data = data or b""
    if mode != "fake":
        # magic-sniffed real decode; a spoofed/corrupt payload (anything can
        # start with 'BM'/'RIFF') must NOT kill the job in 'auto' — it falls
        # through to deterministic fake features; 'strict' propagates.
        try:
            if codecs.is_wav(data):
                return codecs.wav_features(data, FEATURE_DIM)
            if codecs.is_bmp(data):
                return codecs.bmp_features(data, FEATURE_DIM)
            if codecs.is_avi(data):
                return codecs.avi_features(data, FEATURE_DIM)
        except Exception:
            if mode == "strict":
                raise
        else:
            if mode == "strict":
                raise NotImplementedError(
                    f"real {media_type} decode for this payload requires codec "
                    "libraries not present in this container (only WAV/BMP/"
                    "uncompressed-AVI have stdlib decoders); run with "
                    "decode_stub_mode='auto' or 'fake'"
                )
    # deterministic fake features: bytes → sha256 → 16 floats in [0,1)
    h = hashlib.sha256(data).digest()
    return np.frombuffer(h[: FEATURE_DIM * 2], dtype=np.uint16).astype(np.float32) / 65535.0


def extract_features(
    df: DataFrame, decode_stub_mode: str = "auto", passthrough: list[str] | None = None
) -> DataFrame:
    """Decode + featurize each asset — one Arrow batch at a time.

    Partitioning note: assets are large blobs; upstream should
    ``repartition`` by asset_id so batches hold a bounded byte volume
    (maxRecordsPerBatch also caps Arrow batch size).

    ``passthrough`` names extra input columns copied verbatim onto the
    output rows.  A caller that needs both features AND another
    data-derived column used to self-join two branches of the asset
    subtree — re-decoding (or re-generating) every payload and shuffling
    on the join key; carrying the column through the same Arrow batch
    reads the bytes exactly once and removes the join (guide §8: decide
    with one pass over the heavy rows).
    """
    extra = list(passthrough or [])
    out_schema = T.StructType(
        list(FEATURES_SCHEMA.fields)
        + [df.schema[c] for c in extra]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            feats = [
                _decode_kernel(d, m, decode_stub_mode)
                for d, m in zip(pdf["data"], pdf["media_type"])
            ]
            out = {
                "asset_id": pdf["asset_id"],
                "media_type": pdf["media_type"],
                "n_bytes": pdf["data"].map(lambda b: len(b) if b is not None else 0).astype("int32"),
                "content_sha": pdf["data"].map(
                    lambda b: hashlib.sha256(b or b"").hexdigest()
                ),
                "features": feats,
            }
            for c in extra:
                out[c] = pdf[c]
            yield pd.DataFrame(out)

    return df.mapInPandas(run, schema=out_schema)


def resize_images(df: DataFrame, width: int, height: int, decode_stub_mode: str = "auto") -> DataFrame:
    """Image resize.  REAL for BMP payloads: decode → nearest-neighbor
    resize (numpy indexing) → re-encode (codecs.py).  Non-BMP payloads:
    'auto' passes bytes through with meta rewritten (the old stub), 'strict'
    raises where the PIL call would go, 'fake' never decodes."""
    out_schema = ASSET_SCHEMA

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            data_out, resized = [], []
            for d in pdf["data"]:
                d = d or b""
                try:
                    if decode_stub_mode != "fake" and codecs.is_bmp(d):
                        px = codecs.decode_bmp(d)
                        data_out.append(
                            codecs.encode_bmp(codecs.resize_nearest(px, width, height))
                        )
                        resized.append(True)
                        continue
                except Exception:
                    if decode_stub_mode == "strict":
                        raise
                    data_out.append(d)  # auto: corrupt payload passes through
                    resized.append(False)
                    continue
                if decode_stub_mode == "strict":
                    raise NotImplementedError(
                        "non-BMP image resize requires PIL; not in container"
                    )
                data_out.append(d)
                resized.append(False)
            # meta.width/height are rewritten ONLY for rows whose bytes were
            # actually decoded and re-encoded; a pass-through payload keeps
            # its original meta — otherwise meta would claim dimensions the
            # bytes don't have.
            meta_out = [
                ({**(m or {}), "width": width, "height": height} if r else m)
                for m, r in zip(pdf["meta"], resized)
            ]
            yield pdf.assign(data=data_out, meta=meta_out)

    return df.where(F.col("media_type") == "image").mapInPandas(run, schema=out_schema)


def sample_frames(df: DataFrame, every_ms: int = 1000, decode_stub_mode: str = "fake") -> DataFrame:
    """Frame sampling for video — one output row per sampled frame.

    REAL for uncompressed-DIB AVI payloads (codecs.decode_avi): the frame
    at each ``every_ms`` timestamp is picked by index (``ms*fps/1000``) and
    ``frame_sha`` is the sha256 of that frame's decoded RGB pixels — the
    exact shape an ffmpeg-backed implementation would produce.  Non-AVI
    payloads: 'fake'/'auto' emit deterministic frame stamps from
    meta.duration_ms (exercising the one-to-many mapInPandas shape);
    'strict' raises — compressed video needs ffmpeg, honestly out of
    scope for a stdlib codec."""
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
            # REAL path first: decode AVI rows, sample frames by timestamp.
            # The RIFF sniff (and the per-row lambda computing it) only runs
            # outside 'fake' mode — the default benched path stays vectorized.
            real_rows = []
            if decode_stub_mode != "fake":
                avi_mask = pdf["data"].map(
                    lambda b: b is not None and codecs.is_avi(bytes(b))
                )
                for ridx in pdf.index[avi_mask]:
                    aid = pdf.at[ridx, "asset_id"]
                    blob = pdf.at[ridx, "data"]
                    try:
                        frames, fps = codecs.decode_avi(bytes(blob))
                    except Exception:
                        # sniffed RIFF/AVI but truncated/compressed body: in
                        # 'auto' fall through to the fake stamps (same
                        # contract as _decode_kernel); 'strict' propagates
                        if decode_stub_mode == "strict":
                            raise
                        avi_mask.at[ridx] = False
                        continue
                    if not len(frames) or fps <= 0:
                        continue
                    dur_ms = int(len(frames) / fps * 1000)
                    for ms in range(0, max(dur_ms, 1), every_ms):
                        idx = min(int(ms * fps / 1000), len(frames) - 1)
                        real_rows.append(
                            (
                                int(aid),
                                ms,
                                hashlib.sha256(frames[idx].tobytes()).hexdigest(),
                            )
                        )
                if avi_mask.any():
                    pdf = pdf[~avi_mask]
            if decode_stub_mode == "strict":
                if len(pdf):
                    raise NotImplementedError(
                        "compressed video decode requires ffmpeg; only "
                        "uncompressed-DIB AVI has a stdlib decoder"
                    )
                yield pd.DataFrame(
                    real_rows, columns=["asset_id", "frame_ms", "frame_sha"]
                ).astype({"asset_id": "int64", "frame_ms": "int32"})
                continue
            # one-to-many expansion as a numpy repeat: n_frames per row from
            # meta.duration_ms, then a flat frame-stamp grid — no iterrows.
            durs = np.array(
                [int((m or {}).get("duration_ms") or 0) for m in pdf["meta"]], dtype=np.int64
            )
            n_frames = np.maximum((durs + every_ms - 1) // every_ms, 0)
            idx = np.repeat(np.arange(len(pdf)), n_frames)
            starts = np.repeat(np.cumsum(n_frames) - n_frames, n_frames)
            frame_ms = (np.arange(len(idx)) - starts) * every_ms
            data = pdf["data"].to_numpy()
            fake = pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"].to_numpy()[idx],
                    "frame_ms": frame_ms.astype("int32"),
                    # frame_sha stays per-frame (the real decoder slot); the
                    # digest loop is over SAMPLED frames only, not all rows
                    "frame_sha": [
                        hashlib.sha256((data[i] or b"") + int(ms).to_bytes(4, "big")).hexdigest()
                        for i, ms in zip(idx, frame_ms)
                    ],
                }
            )
            if real_rows:  # 'auto': decoded AVI frames ride out with the rest
                fake = pd.concat(
                    [
                        pd.DataFrame(
                            real_rows, columns=["asset_id", "frame_ms", "frame_sha"]
                        ),
                        fake,
                    ],
                    ignore_index=True,
                )
            yield fake.astype({"asset_id": "int64", "frame_ms": "int32"})

    return df.where(F.col("media_type") == "video").mapInPandas(run, schema=out_schema)
