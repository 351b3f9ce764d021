"""Multimodal columns: opaque binary payloads + typed metadata.

Images/audio/video travel as ``binary`` columns; decode / feature-extract /
resize / frame-sample are actor-pool map_batches stages.  The actual codec
libraries are NOT in this container, so the decode kernel is pluggable:

- ``codec='stub'`` raises NotImplementedError (the production marker);
- ``codec='fake'`` is a deterministic parser of our synthetic payload
  header (magic 'FAKEIMG1' + width/height/channels little-endian u32) used
  to make the Ray-side plumbing — schema, batch sizing, actor signature,
  output layout — real and tested.

Scale notes: binary payloads are large, so these stages must run with small
``batch_size`` (64-256 rows) and drop the payload column as soon as the
derived features exist (same rule as html in the parse stages,
SURVEY.md §7.5#5).
"""

from __future__ import annotations

import struct
from typing import Tuple

import numpy as np
import pyarrow as pa

FAKE_MAGIC = b"FAKEIMG1"


def make_fake_image(width: int, height: int, channels: int = 3, seed: int = 0) -> bytes:
    """Deterministic synthetic payload for tests/fixtures."""
    rng = np.random.default_rng(seed)
    pixels = rng.integers(0, 256, size=width * height * channels, dtype=np.uint8)
    return FAKE_MAGIC + struct.pack("<III", width, height, channels) + pixels.tobytes()


def _parse_fake(payload: bytes) -> Tuple[int, int, int, np.ndarray]:
    assert payload[:8] == FAKE_MAGIC, "not a fake image payload"
    w, h, c = struct.unpack("<III", payload[8:20])
    px = np.frombuffer(payload[20 : 20 + w * h * c], dtype=np.uint8)
    return w, h, c, px


class DecodeImageStage:
    """binary image -> (width, height, channels, mean_luma). Actor-pool
    stage: pass the CLASS to map_batches(concurrency=N, batch_size<=256)."""

    def __init__(self, codec: str = "stub"):
        self.codec = codec  # heavyweight codec init would live here

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.codec == "stub":
            raise NotImplementedError(
                "image codecs are not available in this environment; "
                "use codec='fake' for the deterministic test payload"
            )
        ws, hs, cs, lumas = [], [], [], []
        for payload in batch.column("image").to_pylist():
            w, h, c, px = _parse_fake(bytes(payload))
            ws.append(w)
            hs.append(h)
            cs.append(c)
            lumas.append(float(px.mean()) if px.size else 0.0)
        out = batch.drop_columns(["image"])  # payload never travels further
        return (
            out.append_column("width", pa.array(ws, pa.int32()))
            .append_column("height", pa.array(hs, pa.int32()))
            .append_column("channels", pa.array(cs, pa.int32()))
            .append_column("mean_luma", pa.array(lumas, pa.float64()))
        )


class ImageFeatureStage:
    """binary image -> fixed-size histogram feature vector (16 bins).

    Stands in for model inference: one vectorized kernel per batch, model
    load (here: nothing) in __init__."""

    def __init__(self, codec: str = "stub", bins: int = 16):
        self.codec = codec
        self.bins = bins

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.codec == "stub":
            raise NotImplementedError("no codec; use codec='fake'")
        feats = []
        for payload in batch.column("image").to_pylist():
            _, _, _, px = _parse_fake(bytes(payload))
            hist, _ = np.histogram(px, bins=self.bins, range=(0, 256))
            total = hist.sum()
            feats.append((hist / total if total else hist).astype(np.float32).tolist())
        out = batch.drop_columns(["image"])
        return out.append_column("feature", pa.array(feats, pa.list_(pa.float32())))


class FrameSampleStage:
    """binary 'video' (concatenated fake frames) -> one row per sampled
    frame index; demonstrates the 1->N batch explosion layout."""

    def __init__(self, codec: str = "stub", every: int = 2):
        self.codec = codec
        self.every = every

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.codec == "stub":
            raise NotImplementedError("no codec; use codec='fake'")
        ids, frames, lumas = [], [], []
        for vid, payload in zip(
            batch.column("video_id").to_pylist(), batch.column("video").to_pylist()
        ):
            payload = bytes(payload)
            off, idx = 0, 0
            while off < len(payload):
                w, h, c = struct.unpack("<III", payload[off + 8 : off + 20])
                sz = 20 + w * h * c
                if idx % self.every == 0:
                    _, _, _, px = _parse_fake(payload[off : off + sz])
                    ids.append(vid)
                    frames.append(idx)
                    lumas.append(float(px.mean()))
                off += sz
                idx += 1
        return pa.table(
            {
                "video_id": pa.array(ids, pa.int64()),
                "frame_index": pa.array(frames, pa.int32()),
                "mean_luma": pa.array(lumas, pa.float64()),
            }
        )
