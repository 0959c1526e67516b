"""Multimodal (image/audio/video) column operators — Ray-side plumbing.

Media ride as opaque ``binary`` columns with typed metadata columns
alongside (media_type, width/height/duration hints). The decode /
resize / frame-sample kernels that need codec libraries are STUBBED
(this container ships no PIL/ffmpeg): each stage raises
NotImplementedError unless ``deterministic_fake=True``, in which case a
seeded, content-derived fake output with the REAL schema, batch sizing
and actor signature is produced — so the distributed plumbing (schema,
batch size for large binary payloads, actor pools, output layout) is
fully built and tested, and swapping in a real codec is a one-function
change.

Batch-size note: binary payloads are large; callers should pass small
``batch_size`` (e.g. 64) so batch x concurrency fits worker heaps
(see map_batches calls in pipelines/queries.py and tests).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from metacache_mpi_ray.functions.hashing import U64, splitmix64


def synth_media_table(n: int, seed: int = 7) -> pa.Table:
    """Deterministic synthetic media table: (media_id, media_type,
    payload:binary, n_bytes). Payload bytes are seeded pseudo-random —
    stand-ins for encoded images/audio."""
    rng = np.random.default_rng(seed)
    types = rng.choice(["image", "audio", "video"], size=n).tolist()
    sizes = rng.integers(256, 4096, size=n)
    payloads = [rng.integers(0, 256, size=s, dtype=np.uint8).tobytes() for s in sizes]
    return pa.table(
        {
            "media_id": pa.array(range(n), type=pa.int64()),
            "media_type": pa.array(types, type=pa.string()),
            "payload": pa.array(payloads, type=pa.binary()),
            "n_bytes": pa.array(sizes, type=pa.int64()),
        }
    )


class ImageDecoder:
    """Actor-pool stage: payload -> decoded dims + pixel feature vector.

    Real codec absent: with deterministic_fake=True emits a
    content-derived fake (stable across runs/workers); otherwise raises
    NotImplementedError to mark the integration point."""

    def __init__(self, deterministic_fake: bool = False):
        self.fake = deterministic_fake

    def __call__(self, batch: pa.Table) -> pa.Table:
        if not self.fake:
            raise NotImplementedError(
                "image decode requires a codec library (PIL/opencv) not present "
                "in this environment; pass deterministic_fake=True for plumbing"
            )
        payloads = batch["payload"]
        if isinstance(payloads, pa.ChunkedArray):
            payloads = payloads.combine_chunks()
        n = len(payloads)
        # content-derived fake dims + 8-dim feature (byte histogram moments)
        feats = np.zeros((n, 8), dtype=np.float32)
        widths = np.zeros(n, dtype=np.int64)
        heights = np.zeros(n, dtype=np.int64)
        for i in range(n):
            b = np.frombuffer(payloads[i].as_py(), dtype=np.uint8)
            h = int(splitmix64(U64(len(b))))
            widths[i] = 16 + (h & 0xFF)
            heights[i] = 16 + ((h >> 8) & 0xFF)
            hist = np.bincount(b >> 5, minlength=8).astype(np.float32)
            feats[i] = hist / max(1, len(b))
        return pa.table(
            {
                "media_id": batch["media_id"],
                "width": pa.array(widths),
                "height": pa.array(heights),
                "feature": pa.FixedSizeListArray.from_arrays(
                    pa.array(feats.reshape(-1)), 8
                ),
            }
        )


class ImageResizer:
    """Actor-pool stage: payload -> resized payload (stub: deterministic
    truncation/duplication of bytes keeps sizes + schema realistic)."""

    def __init__(self, target_bytes: int = 1024, deterministic_fake: bool = False):
        self.target = target_bytes
        self.fake = deterministic_fake

    def __call__(self, batch: pa.Table) -> pa.Table:
        if not self.fake:
            raise NotImplementedError("resize requires a codec library")
        payloads = batch["payload"]
        if isinstance(payloads, pa.ChunkedArray):
            payloads = payloads.combine_chunks()
        out = []
        for i in range(len(payloads)):
            b = payloads[i].as_py()
            rep = (self.target + len(b) - 1) // max(1, len(b))
            out.append((b * rep)[: self.target])
        return pa.table(
            {
                "media_id": batch["media_id"],
                "payload": pa.array(out, type=pa.binary()),
                "n_bytes": pa.array([len(x) for x in out], type=pa.int64()),
            }
        )


class FrameSampler:
    """Actor-pool stage: video payload -> k evenly spaced 'frames'
    (1 row -> k rows; stub slices the byte stream deterministically)."""

    def __init__(self, n_frames: int = 4, deterministic_fake: bool = False):
        self.k = n_frames
        self.fake = deterministic_fake

    def __call__(self, batch: pa.Table) -> pa.Table:
        if not self.fake:
            raise NotImplementedError("frame extraction requires ffmpeg")
        payloads = batch["payload"]
        if isinstance(payloads, pa.ChunkedArray):
            payloads = payloads.combine_chunks()
        ids = batch["media_id"].to_numpy(zero_copy_only=False)
        out_id, out_f, out_b = [], [], []
        for i in range(len(payloads)):
            b = payloads[i].as_py()
            step = max(1, len(b) // self.k)
            for f in range(self.k):
                out_id.append(int(ids[i]))
                out_f.append(f)
                out_b.append(b[f * step : f * step + step])
        return pa.table(
            {
                "media_id": pa.array(out_id, type=pa.int64()),
                "frame_id": pa.array(out_f, type=pa.int64()),
                "frame": pa.array(out_b, type=pa.binary()),
            }
        )


def media_feature_pipeline(media_ds, *, concurrency: int = 2, batch_size: int = 64):
    """The full multimodal plumbing: decode (actor pool, small batches
    for large binary rows) -> features; demonstrates per-stage
    batch-size control for binary payloads."""
    return media_ds.map_batches(
        ImageDecoder,
        fn_constructor_kwargs={"deterministic_fake": True},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )
