"""Multimodal audio / video columns: decode, feature-extract, resize,
frame-sample.

Like images (operators/images.py), audio and video travel as opaque
``binary`` columns with typed metadata per the BASELINE.json input_hint
pattern. The container has no media libraries (SURVEY.md §7.0), so the
wire formats are our own deterministic, dependency-free layouts — the
Spark-side plumbing (schemas, Arrow batch shape, vectorized kernels
inside ``mapInPandas``) is the part that matters at 100 TB and is fully
real:

- audio ``pcm16``: raw little-endian int16 mono samples. Real-world
  codecs (mp3/opus/flac) slot in behind the same ``decode_audio``
  signature; attempting an unknown format raises ``NotImplementedError``
  exactly where a library-backed decoder would plug in.
- video ``rawv``: concatenated raw RGB uint8 frames (n_frames * h * w *
  3 bytes); metadata columns carry (w, h, n_frames, fps). Same
  plug-point rule for real containers (mp4/webm).

Feature extraction is designed to be *integer-exact* so the driver's
cross-engine value-hash comparison cannot be perturbed by float
summation order: energy is the exact int64 sum of squared samples,
zero-crossings an exact count, video features exact per-frame hashes.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from cov_tiles_spark.operators.images import phash64

AUDIO_FORMATS = ("pcm16",)
VIDEO_FORMATS = ("rawv",)


# ---------------------------------------------------------------- audio

def decode_audio(data: bytes, fmt: str) -> np.ndarray:
    """Decode audio bytes to an int16 sample array."""
    if fmt == "pcm16":
        return np.frombuffer(data, dtype="<i2")
    raise NotImplementedError(
        f"audio format {fmt!r}: plug a library-backed decoder in here"
    )


def encode_audio(samples: np.ndarray, fmt: str) -> bytes:
    if fmt == "pcm16":
        return np.asarray(samples, dtype="<i2").tobytes()
    raise NotImplementedError(
        f"audio format {fmt!r}: plug a library-backed encoder in here"
    )


def synth_audio(asset_id: int, n_samples: int, sr: int = 16_000) -> np.ndarray:
    """Deterministic int16 test signal: two sines + seeded noise, with a
    silent lead-in so zero-crossing counts exercise the `== 0` edge."""
    rng = np.random.default_rng(1000 + asset_id)
    t = np.arange(n_samples, dtype=np.float64) / sr
    f1 = 110.0 * (1 + (asset_id % 7))
    f2 = 523.25
    sig = 0.55 * np.sin(2 * np.pi * f1 * t) + 0.25 * np.sin(2 * np.pi * f2 * t)
    sig += rng.normal(0, 0.02, n_samples)
    lead = min(n_samples, sr // 100)
    sig[:lead] = 0.0
    return np.clip(np.round(sig * 20000.0), -32768, 32767).astype(np.int16)


def audio_features(df: DataFrame, bytes_col: str = "bytes", fmt_col: str = "fmt") -> DataFrame:
    """Per-asset integer-exact features: sample count, peak magnitude,
    energy (sum of squared samples), zero-crossing count.

    One vectorized ``mapInPandas`` pass; each payload is decoded once.
    """
    keep = [c for c in df.columns if c not in (bytes_col,)]

    def _feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = len(pdf)
            ns = np.empty(n, dtype=np.int64)
            peak = np.empty(n, dtype=np.int64)
            energy = np.empty(n, dtype=np.int64)
            zcr = np.empty(n, dtype=np.int64)
            for j in range(n):
                s = decode_audio(bytes(pdf.iloc[j][bytes_col]), pdf.iloc[j][fmt_col])
                x = s.astype(np.int64)
                ns[j] = len(x)
                peak[j] = np.abs(x).max() if len(x) else 0
                energy[j] = (x * x).sum()
                # sign changes between consecutive nonzero samples
                nz = x[x != 0]
                zcr[j] = int((np.signbit(nz[1:]) != np.signbit(nz[:-1])).sum()) if len(nz) > 1 else 0
            out = pdf[keep].copy()
            out["n_samples"] = ns
            out["peak"] = peak
            out["energy"] = energy
            out["zero_crossings"] = zcr
            yield out

    schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema if f.name != bytes_col
    ) + ", n_samples long, peak long, energy long, zero_crossings long"
    return df.mapInPandas(_feats, schema=schema)


# ---------------------------------------------------------------- video

def decode_video(data: bytes, w: int, h: int, n_frames: int, fmt: str) -> np.ndarray:
    """Decode video bytes to an (n_frames, h, w, 3) uint8 array."""
    if fmt == "rawv":
        return np.frombuffer(data, dtype=np.uint8).reshape(n_frames, h, w, 3).copy()
    raise NotImplementedError(
        f"video format {fmt!r}: plug a library-backed decoder in here"
    )


def encode_video(frames: np.ndarray, fmt: str) -> bytes:
    if fmt == "rawv":
        return np.asarray(frames, dtype=np.uint8).tobytes()
    raise NotImplementedError(
        f"video format {fmt!r}: plug a library-backed encoder in here"
    )


def synth_video(asset_id: int, w: int, h: int, n_frames: int) -> np.ndarray:
    """Deterministic moving-gradient frames (pure function of the id)."""
    yy, xx = np.mgrid[0:h, 0:w]
    frames = np.empty((n_frames, h, w, 3), dtype=np.uint8)
    for f in range(n_frames):
        shift = (asset_id * 3 + f * 5) % 256
        r = (xx * 255 // max(w - 1, 1) + shift) % 256
        g = (yy * 255 // max(h - 1, 1) + 2 * shift) % 256
        b = ((xx + yy) * 255 // max(w + h - 2, 1) + 3 * shift) % 256
        frames[f] = np.stack([r, g, b], axis=-1).astype(np.uint8)
    return frames


def sample_frame_indices(n_frames: int, k: int) -> list[int]:
    """Uniform k-frame sampling rule: index_j = (j * n_frames) // k."""
    k = min(k, n_frames)
    return [(j * n_frames) // k for j in range(k)]


def frame_sample_features(
    df: DataFrame,
    k: int,
    bytes_col: str = "bytes",
) -> DataFrame:
    """Frame-sample each video and fingerprint the sampled frames.

    Emits ``frames_sampled`` and ``frame_phash_xor`` (xor of the sampled
    frames' 64-bit perceptual hashes — an exact order-independent video
    fingerprint). Decode + sampling happen once per payload inside one
    ``mapInPandas`` pass, before any shuffle.
    """
    keep = [c for c in df.columns if c != bytes_col]

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = len(pdf)
            cnt = np.empty(n, dtype=np.int32)
            xor = np.empty(n, dtype=np.int64)
            for j in range(n):
                row = pdf.iloc[j]
                frames = decode_video(
                    bytes(row[bytes_col]), int(row["w"]), int(row["h"]),
                    int(row["n_frames"]), row["fmt"],
                )
                idx = sample_frame_indices(int(row["n_frames"]), k)
                acc = np.uint64(0)
                for i in idx:
                    acc ^= np.uint64(np.int64(phash64(frames[i])).view(np.uint64))
                cnt[j] = len(idx)
                xor[j] = int(acc.view(np.int64))
            out = pdf[keep].copy()
            out["frames_sampled"] = cnt
            out["frame_phash_xor"] = xor
            yield out

    schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema if f.name != bytes_col
    ) + ", frames_sampled int, frame_phash_xor long"
    return df.mapInPandas(_sample, schema=schema)


# ---------------------------------------------------------------- resize

def resize_image(px: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Deterministic area-mean resize (integer box average over the
    source cells covered by each output pixel; exact integer arithmetic
    via cumulative sums, so both engines agree bit-for-bit)."""
    h, w, _ = px.shape
    ys = (np.arange(out_h + 1) * h) // out_h
    xs = (np.arange(out_w + 1) * w) // out_w
    # 2-D prefix sums per channel (int64 exact)
    cs = np.zeros((h + 1, w + 1, 3), dtype=np.int64)
    cs[1:, 1:] = px.astype(np.int64).cumsum(axis=0).cumsum(axis=1)
    y0, y1 = ys[:-1], ys[1:]
    x0, x1 = xs[:-1], xs[1:]
    area = (y1 - y0)[:, None] * (x1 - x0)[None, :]
    total = (
        cs[y1][:, x1] - cs[y0][:, x1] - cs[y1][:, x0] + cs[y0][:, x0]
    )
    return (total // area[..., None]).astype(np.uint8)


def resize_images(
    df: DataFrame, out_w: int, out_h: int,
    bytes_col: str = "bytes",
) -> DataFrame:
    """Resize every image to (out_w, out_h), re-encoding in its own
    format — one vectorized ``mapInPandas`` pass (decode -> area-mean
    resize -> encode, each payload touched once)."""
    from cov_tiles_spark.operators.images import decode_image, encode_image

    keep = [c for c in df.columns if c not in (bytes_col, "w", "h")]

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_bytes = []
            for j in range(len(pdf)):
                row = pdf.iloc[j]
                px = decode_image(
                    bytes(row[bytes_col]), int(row["w"]), int(row["h"]), row["fmt"]
                )
                out_bytes.append(encode_image(resize_image(px, out_w, out_h), row["fmt"]))
            out = pdf[keep].copy()
            out["w"] = np.int32(out_w)
            out["h"] = np.int32(out_h)
            out[bytes_col] = out_bytes
            yield out

    schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in df.schema if f.name not in (bytes_col, "w", "h")
    ) + f", w int, h int, {bytes_col} binary"
    return df.mapInPandas(_resize, schema=schema)
