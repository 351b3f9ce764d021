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


FAKE_AUDIO_MAGIC = b"FAKEAUD1"


def make_fake_audio(sample_rate: int, n_samples: int, seed: int = 0) -> bytes:
    """Deterministic synthetic PCM payload: magic + rate/count header +
    int16 little-endian samples."""
    rng = np.random.default_rng(seed)
    pcm = rng.integers(-32768, 32768, size=n_samples, dtype=np.int16)
    return (
        FAKE_AUDIO_MAGIC
        + struct.pack("<II", sample_rate, n_samples)
        + pcm.astype("<i2").tobytes()
    )


def _parse_fake_audio(payload: bytes) -> Tuple[int, int, np.ndarray]:
    assert payload[:8] == FAKE_AUDIO_MAGIC, "not a fake audio payload"
    rate, n = struct.unpack("<II", payload[8:16])
    pcm = np.frombuffer(payload[16 : 16 + 2 * n], dtype="<i2")
    return rate, n, pcm


class DecodeAudioStage:
    """binary audio -> (sample_rate, n_samples, duration_s, rms).  Same
    actor-pool contract as DecodeImageStage: codec='stub' is the honest
    production marker, 'fake' parses the synthetic PCM payload; payload
    column dropped as soon as the derived features exist."""

    def __init__(self, codec: str = "stub"):
        self.codec = codec

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.codec == "stub":
            raise NotImplementedError(
                "audio codecs are not available in this environment; "
                "use codec='fake' for the deterministic test payload"
            )
        rates, counts, durs, rmss = [], [], [], []
        for payload in batch.column("audio").to_pylist():
            rate, n, pcm = _parse_fake_audio(bytes(payload))
            rates.append(rate)
            counts.append(n)
            durs.append(n / rate if rate else 0.0)
            rmss.append(
                float(np.sqrt(np.mean(pcm.astype(np.float64) ** 2))) if n else 0.0
            )
        out = batch.drop_columns(["audio"])
        return (
            out.append_column("sample_rate", pa.array(rates, pa.int32()))
            .append_column("n_samples", pa.array(counts, pa.int64()))
            .append_column("duration_s", pa.array(durs, pa.float64()))
            .append_column("rms", pa.array(rmss, pa.float64()))
        )


class AudioWindowStage:
    """binary audio -> one row per fixed-size window with per-window RMS:
    the 1->N explosion layout for audio (framing / VAD / feature-window
    pipelines), mirroring FrameSampleStage for video."""

    def __init__(self, codec: str = "stub", window: int = 256):
        self.codec = codec
        self.window = window

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.codec == "stub":
            raise NotImplementedError("no codec; use codec='fake'")
        ids, idxs, rmss = [], [], []
        for aid, payload in zip(
            batch.column("audio_id").to_pylist(), batch.column("audio").to_pylist()
        ):
            _, n, pcm = _parse_fake_audio(bytes(payload))
            full = (n // self.window) * self.window
            if full:
                w = pcm[:full].astype(np.float64).reshape(-1, self.window)
                r = np.sqrt((w * w).mean(axis=1))
                ids.extend([aid] * len(r))
                idxs.extend(range(len(r)))
                rmss.extend(float(x) for x in r)
        return pa.table(
            {
                "audio_id": pa.array(ids, pa.int64()),
                "window_index": pa.array(idxs, pa.int32()),
                "rms": pa.array(rmss, pa.float64()),
            }
        )


class ResizeImageStage:
    """binary image -> binary image at (out_w, out_h): nearest-neighbor
    under the fake codec, producing a re-encoded FAKEIMG payload — the
    resize step of an image-training-data pipeline with the real-codec
    swap point marked.  Unlike the decode stages the payload column is
    REPLACED, not dropped (resize feeds a downstream consumer)."""

    def __init__(self, codec: str = "stub", out_w: int = 4, out_h: int = 4):
        self.codec = codec
        self.out_w = out_w
        self.out_h = out_h

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.codec == "stub":
            raise NotImplementedError("no codec; use codec='fake'")
        outs = []
        for payload in batch.column("image").to_pylist():
            w, h, c, px = _parse_fake(bytes(payload))
            img = px.reshape(h, w, c)
            ys = (np.arange(self.out_h) * h) // self.out_h
            xs = (np.arange(self.out_w) * w) // self.out_w
            small = img[ys][:, xs].astype(np.uint8)
            outs.append(
                FAKE_MAGIC
                + struct.pack("<III", self.out_w, self.out_h, c)
                + small.tobytes()
            )
        i = batch.column_names.index("image")
        return batch.set_column(i, "image", pa.array(outs, pa.binary()))
