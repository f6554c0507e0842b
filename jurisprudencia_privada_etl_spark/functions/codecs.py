"""Real, dependency-free codecs for the multimodal kernels.

The container has no PIL/ffmpeg/librosa, but two formats are fully
decodable with the stdlib + numpy:

* WAV (PCM16) via the stdlib ``wave`` module — real audio decode,
* BMP (24-bit uncompressed, the classic BITMAPINFOHEADER layout) via a
  ~40-line header parse — real image decode.

These upgrade the multimodal stubs (operators/multimodal.py) to genuine
decode → feature-extract for the audio and image modalities; video remains
a stub (no stdlib video codec exists).  Encoders are included so tests can
generate assets and assert byte-exact round trips.

Everything here is per-asset Python executed INSIDE Arrow batches
(mapInPandas) — never row-at-a-time UDFs over the wire.
"""

from __future__ import annotations

import io
import struct
import wave

import numpy as np

# ---------------------------------------------------------------------------
# WAV (PCM16)
# ---------------------------------------------------------------------------


def encode_wav(samples: np.ndarray, sample_rate: int = 8000, n_channels: int = 1) -> bytes:
    """int16 samples → RIFF/WAVE bytes (PCM16)."""
    samples = np.asarray(samples, dtype="<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(n_channels)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(samples.tobytes())
    return buf.getvalue()


def decode_wav(data: bytes) -> tuple[np.ndarray, int, int]:
    """WAV bytes → (int16 samples [n_frames, n_channels], rate, channels)."""
    with wave.open(io.BytesIO(data), "rb") as w:
        if w.getsampwidth() != 2:
            raise ValueError(f"only PCM16 supported, got sampwidth={w.getsampwidth()}")
        n_channels = w.getnchannels()
        rate = w.getframerate()
        raw = w.readframes(w.getnframes())
    samples = np.frombuffer(raw, dtype="<i2").reshape(-1, n_channels)
    return samples, rate, n_channels


def is_wav(data: bytes) -> bool:
    return len(data) >= 12 and data[:4] == b"RIFF" and data[8:12] == b"WAVE"


# ---------------------------------------------------------------------------
# BMP (24-bit uncompressed, BITMAPINFOHEADER, bottom-up)
# ---------------------------------------------------------------------------

_BMP_FILE_HEADER = "<2sIHHI"  # magic, file size, res1, res2, pixel offset
_BMP_INFO_HEADER = "<IiiHHIIiiII"  # size, w, h, planes, bpp, comp, imgsize, xppm, yppm, colors, important


def encode_bmp(pixels: np.ndarray) -> bytes:
    """uint8 array [h, w, 3] (RGB) → 24-bit BMP bytes."""
    px = np.asarray(pixels, dtype=np.uint8)
    h, w, _ = px.shape
    row_size = (w * 3 + 3) & ~3  # rows padded to 4 bytes
    img_size = row_size * h
    pixel_offset = 14 + 40
    out = bytearray()
    out += struct.pack(_BMP_FILE_HEADER, b"BM", pixel_offset + img_size, 0, 0, pixel_offset)
    out += struct.pack(_BMP_INFO_HEADER, 40, w, h, 1, 24, 0, img_size, 2835, 2835, 0, 0)
    pad = b"\x00" * (row_size - w * 3)
    for y in range(h - 1, -1, -1):  # bottom-up
        row = px[y, :, ::-1]  # RGB → BGR
        out += row.tobytes() + pad
    return bytes(out)


def decode_bmp(data: bytes) -> np.ndarray:
    """24-bit uncompressed BMP bytes → uint8 array [h, w, 3] (RGB)."""
    magic, _, _, _, pixel_offset = struct.unpack_from(_BMP_FILE_HEADER, data, 0)
    if magic != b"BM":
        raise ValueError("not a BMP")
    hdr_size, w, h, _, bpp, comp = struct.unpack_from("<IiiHHI", data, 14)
    if bpp != 24 or comp != 0:
        raise ValueError(f"only 24-bit uncompressed BMP supported (bpp={bpp}, comp={comp})")
    bottom_up = h > 0
    h = abs(h)
    row_size = (w * 3 + 3) & ~3
    px = np.zeros((h, w, 3), dtype=np.uint8)
    for i in range(h):
        off = pixel_offset + i * row_size
        row = np.frombuffer(data, dtype=np.uint8, count=w * 3, offset=off).reshape(w, 3)
        y = (h - 1 - i) if bottom_up else i
        px[y] = row[:, ::-1]  # BGR → RGB
    return px


def is_bmp(data: bytes) -> bool:
    return len(data) >= 2 and data[:2] == b"BM"


# ---------------------------------------------------------------------------
# feature kernels (deterministic, FEATURE_DIM floats)
# ---------------------------------------------------------------------------


def wav_features(data: bytes, dim: int) -> np.ndarray:
    """Real audio features: duration, rms, zero-crossing rate, peak, mean,
    std + an 8-bin coarse envelope — all from the decoded samples."""
    samples, rate, n_channels = decode_wav(data)
    x = samples.astype(np.float64).mean(axis=1) / 32768.0  # mono fold
    n = len(x)
    if n == 0:
        return np.zeros(dim, dtype=np.float32)
    rms = float(np.sqrt(np.mean(x**2)))
    zcr = float(np.mean(np.signbit(x[1:]) != np.signbit(x[:-1]))) if n > 1 else 0.0
    env = np.abs(x[: n - n % 8].reshape(8, -1)).mean(axis=1) if n >= 8 else np.zeros(8)
    feats = np.concatenate(
        [
            [n / rate, rms, zcr, float(np.max(np.abs(x))), float(np.mean(x)), float(np.std(x)),
             float(n_channels), float(rate) / 48000.0],
            env,
        ]
    )
    return np.resize(feats, dim).astype(np.float32)


def bmp_features(data: bytes, dim: int) -> np.ndarray:
    """Real image features: dims, per-channel mean/std, luma histogram."""
    px = decode_bmp(data).astype(np.float64) / 255.0
    h, w, _ = px.shape
    luma = px @ np.array([0.299, 0.587, 0.114])
    hist, _ = np.histogram(luma, bins=6, range=(0.0, 1.0))
    feats = np.concatenate(
        [
            [w / 1024.0, h / 1024.0, w / max(h, 1)],
            px.mean(axis=(0, 1)),
            px.std(axis=(0, 1)),
            hist / max(luma.size, 1),
            [float(luma.mean())],
        ]
    )
    return np.resize(feats, dim).astype(np.float32)


def resize_nearest(px: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor resize — numpy fancy indexing, no loops."""
    h, w, _ = px.shape
    ys = (np.arange(height) * h // height).clip(0, h - 1)
    xs = (np.arange(width) * w // width).clip(0, w - 1)
    return px[ys][:, xs]
