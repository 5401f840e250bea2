"""Multimodal column stages (graft addition): image/audio/video as opaque
``binary`` columns with typed metadata.

The decode kernels themselves are STUBS (no image/audio libraries in this
environment): ``decoder="fake"`` (default) derives deterministic features from
the bytes so the Ray-side plumbing — schema contract, batch sizing, actor-pool
signature, output layout — is real and tested; ``decoder="real"`` raises
NotImplementedError with the library it would use.

Schema contract for a media column ``m``:
  m:           binary          (opaque payload)
  m_mime:      string          (e.g. "image/jpeg")
  m_meta:      struct/json str (width/height/duration as available)
Stages keep batches SMALL (media rows are wide): pass batch_size explicitly.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from rayssj.checkpoint import stable_hash64


def _require_real_decoder(kind: str):
    raise NotImplementedError(
        f"real {kind} decoding needs an external library (Pillow/ffmpeg/"
        "torchaudio) that is not available in this environment; use "
        "decoder='fake' for deterministic plumbing tests")


class ImageFeatureExtractor:
    """Actor-pool stage: binary image column → fixed-dim feature vector +
    (width, height) metadata.

    fake decoder: features = seeded hash-derived floats; dims from byte length.
    Usage: ds.map_batches(ImageFeatureExtractor, batch_size=64,
                          concurrency=N, num_cpus=1,
                          fn_constructor_kwargs=dict(col="image"))
    """

    def __init__(self, col: str = "image", dim: int = 64, decoder: str = "fake"):
        if decoder not in ("fake", "real"):
            raise AssertionError("decoder must be 'fake' or 'real'")
        if decoder == "real":
            _require_real_decoder("image")
        self.col = col
        self.dim = dim

    def __call__(self, batch: pa.Table) -> pa.Table:
        data = batch[self.col]
        data = data.combine_chunks() if isinstance(data, pa.ChunkedArray) else data
        h = stable_hash64(data.cast(pa.large_binary())).to_numpy(zero_copy_only=False)
        n = len(h)
        rng_seed = h.view(np.uint64)
        # deterministic per-row feature vector from the content hash
        feats = np.empty((n, self.dim), dtype=np.float32)
        for i in range(n):
            g = np.random.default_rng(rng_seed[i])
            feats[i] = g.standard_normal(self.dim, dtype=np.float32)
        lens = np.array([len(v) if v is not None else 0
                         for v in data.to_pylist()], dtype=np.int64)
        width = (lens % 1000 + 1).astype(np.int32)
        height = (lens % 700 + 1).astype(np.int32)
        offs = np.arange(0, (n + 1) * self.dim, self.dim, dtype=np.int64)
        lst = pa.LargeListArray.from_arrays(
            pa.array(offs), pa.array(feats.reshape(-1).astype(np.float64)))
        return (batch.append_column(f"{self.col}_feat", lst)
                     .append_column(f"{self.col}_width", pa.array(width))
                     .append_column(f"{self.col}_height", pa.array(height)))


class ImageResizer:
    """Actor-pool stage: binary image → binary "resized" image (fake: the
    payload is truncated/padded deterministically to simulate a bounded-size
    output; real path would decode, resize, re-encode)."""

    def __init__(self, col: str = "image", out_col: str = "image_small",
                 target_bytes: int = 1024, decoder: str = "fake"):
        if decoder == "real":
            _require_real_decoder("image")
        self.col = col
        self.out_col = out_col
        self.target = target_bytes

    def __call__(self, batch: pa.Table) -> pa.Table:
        data = batch[self.col].to_pylist()
        out = [None if v is None else
               (v[:self.target] if len(v) >= self.target
                else v + b"\x00" * (self.target - len(v)))
               for v in data]
        return batch.append_column(self.out_col, pa.array(out, type=pa.binary()))


class FrameSampler:
    """Actor-pool stage: binary video column → list<binary> of K "frames"
    (fake: K deterministic byte slices; real path would use ffmpeg)."""

    def __init__(self, col: str = "video", k: int = 4, frame_bytes: int = 256,
                 decoder: str = "fake"):
        if decoder == "real":
            _require_real_decoder("video")
        self.col = col
        self.k = k
        self.frame_bytes = frame_bytes

    def __call__(self, batch: pa.Table) -> pa.Table:
        data = batch[self.col].to_pylist()
        frames = []
        for v in data:
            if v is None or len(v) == 0:
                frames.append([])
                continue
            stride = max(len(v) // self.k, 1)
            frames.append([v[i * stride:i * stride + self.frame_bytes]
                           for i in range(min(self.k, (len(v) + stride - 1) // stride))])
        return batch.append_column(
            f"{self.col}_frames", pa.array(frames, type=pa.list_(pa.binary())))


class AudioFeatureExtractor:
    """Actor-pool stage: binary audio column → fixed-dim feature vector +
    (sample_rate, duration_s) metadata (fake: hash-derived features, duration
    from byte length at the nominal rate; real path would use
    torchaudio/librosa)."""

    def __init__(self, col: str = "audio", dim: int = 32,
                 sample_rate: int = 16_000, decoder: str = "fake"):
        if decoder not in ("fake", "real"):
            raise AssertionError("decoder must be 'fake' or 'real'")
        if decoder == "real":
            _require_real_decoder("audio")
        self.col = col
        self.dim = dim
        self.sample_rate = sample_rate

    def __call__(self, batch: pa.Table) -> pa.Table:
        data = batch[self.col]
        data = data.combine_chunks() if isinstance(data, pa.ChunkedArray) else data
        h = stable_hash64(data.cast(pa.large_binary())).to_numpy(zero_copy_only=False)
        n = len(h)
        feats = np.empty((n, self.dim), dtype=np.float32)
        for i, seed in enumerate(h.view(np.uint64)):
            feats[i] = np.random.default_rng(seed).standard_normal(
                self.dim, dtype=np.float32)
        lens = np.array([len(v) if v is not None else 0
                         for v in data.to_pylist()], dtype=np.int64)
        # fake 16-bit mono PCM: 2 bytes per sample at the nominal rate
        duration = lens / (2.0 * self.sample_rate)
        offs = np.arange(0, (n + 1) * self.dim, self.dim, dtype=np.int64)
        lst = pa.LargeListArray.from_arrays(
            pa.array(offs), pa.array(feats.reshape(-1).astype(np.float64)))
        return (batch.append_column(f"{self.col}_feat", lst)
                     .append_column(f"{self.col}_sample_rate",
                                    pa.array(np.full(n, self.sample_rate,
                                                     dtype=np.int32)))
                     .append_column(f"{self.col}_duration_s",
                                    pa.array(duration)))


def media_pipeline(ds, image_col: str = "image", batch_size: int = 64,
                   concurrency=2, dim: int = 64):
    """Reference composition: feature-extract then resize, actor pools with
    small batches (wide binary rows — SURVEY.md memory-aware rule)."""
    out = ds.map_batches(ImageFeatureExtractor, batch_format="pyarrow",
                         batch_size=batch_size, concurrency=concurrency,
                         fn_constructor_kwargs=dict(col=image_col, dim=dim))
    out = out.map_batches(ImageResizer, batch_format="pyarrow",
                          batch_size=batch_size, concurrency=concurrency,
                          fn_constructor_kwargs=dict(col=image_col))
    return out
