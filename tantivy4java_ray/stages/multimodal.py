"""Multimodal column stages: image/audio/video as opaque ``binary`` columns
with typed metadata.

The decode kernels themselves are STUBBED (no image/audio libraries in this
environment): each stage raises ``NotImplementedError`` unless constructed
with ``fake=True``, which substitutes a deterministic hash-derived decode so
the Ray-side plumbing — schema, actor signature, batch sizing, output
layout — is real and tested. Swap ``_decode_*_real`` for PIL/ffmpeg/soundfile
on a cluster that has them.

Batch-size guidance (SCALE.md): binary payloads dominate memory; size
``batch_size`` so ``batch_size x concurrency x payload`` fits the worker
heap (e.g. 32 rows for ~4 MB images at 8 actors/32 GB).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _fake_pixels(payload: bytes, h: int, w: int) -> np.ndarray:
    """Deterministic stand-in decode: seed from payload bytes."""
    seed = int.from_bytes(payload[:8].ljust(8, b"\0"), "little")
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, (h, w, 3), dtype=np.uint8)


class ImageDecodeResize:
    """binary 'image' -> fixed-size uint8 RGB tensor + basic metadata.

    Actor-pool stage: decoder state (target size, library handles) is set
    up once per actor in ``__init__``; use
    ``map_batches(ImageDecodeResize, fn_constructor_kwargs=...,
    batch_size=32, concurrency=(1, N))``.
    """

    def __init__(self, col: str = "image", id_col: str = "doc_id",
                 size: tuple[int, int] = (224, 224), fake: bool = False):
        self.col, self.id_col = col, id_col
        self.h, self.w = size
        self.fake = fake

    def _decode_real(self, payload: bytes) -> np.ndarray:
        raise NotImplementedError(
            "image decode requires PIL/opencv (not in this container); "
            "construct with fake=True for the deterministic stand-in")

    def __call__(self, t: pa.Table) -> pa.Table:
        payloads = t.column(self.col).to_pylist()
        out = np.empty((len(payloads), self.h, self.w, 3), np.uint8)
        n_bytes = np.zeros(len(payloads), np.int64)
        for i, p in enumerate(payloads):
            p = p or b""
            n_bytes[i] = len(p)
            out[i] = (_fake_pixels(p, self.h, self.w) if self.fake
                      else self._decode_real(p))
        return pa.table({
            self.id_col: t.column(self.id_col),
            "pixels": pa.FixedSizeListArray.from_arrays(
                pa.array(out.reshape(len(payloads), -1).ravel(),
                         pa.uint8()), self.h * self.w * 3),
            "height": pa.array(np.full(len(payloads), self.h, np.int32)),
            "width": pa.array(np.full(len(payloads), self.w, np.int32)),
            "orig_bytes": pa.array(n_bytes)})


class AudioFrameSample:
    """binary 'audio' -> sampled frame energies (float32 list) + metadata."""

    def __init__(self, col: str = "audio", id_col: str = "doc_id",
                 n_frames: int = 16, fake: bool = False):
        self.col, self.id_col = col, id_col
        self.n_frames = n_frames
        self.fake = fake

    def _decode_real(self, payload: bytes) -> np.ndarray:
        raise NotImplementedError(
            "audio decode requires soundfile/ffmpeg (not in this container); "
            "construct with fake=True for the deterministic stand-in")

    def __call__(self, t: pa.Table) -> pa.Table:
        payloads = t.column(self.col).to_pylist()
        frames = np.empty((len(payloads), self.n_frames), np.float32)
        for i, p in enumerate(payloads):
            p = p or b""
            if self.fake:
                seed = int.from_bytes(p[:8].ljust(8, b"\0"), "little")
                frames[i] = np.random.default_rng(seed).random(
                    self.n_frames, np.float32)
            else:
                frames[i] = self._decode_real(p)
        return pa.table({
            self.id_col: t.column(self.id_col),
            "frame_energy": pa.FixedSizeListArray.from_arrays(
                pa.array(frames.ravel(), pa.float32()), self.n_frames),
            "orig_bytes": pa.array(
                np.array([len(p or b"") for p in payloads], np.int64))})


def decode_images(ds, *, col: str = "image", id_col: str = "doc_id",
                  size=(224, 224), fake: bool = False, batch_size: int = 32,
                  concurrency: int = 4):
    return ds.map_batches(
        ImageDecodeResize,
        fn_constructor_kwargs=dict(col=col, id_col=id_col, size=size,
                                   fake=fake),
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=(1, concurrency), num_cpus=1)


def sample_audio_frames(ds, *, col: str = "audio", id_col: str = "doc_id",
                        n_frames: int = 16, fake: bool = False,
                        batch_size: int = 64, concurrency: int = 4):
    return ds.map_batches(
        AudioFrameSample,
        fn_constructor_kwargs=dict(col=col, id_col=id_col,
                                   n_frames=n_frames, fake=fake),
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=(1, concurrency), num_cpus=1)
