"""Multimodal column plumbing: decode / feature-extract stages for opaque
``binary`` payload columns (image/audio/video) with typed metadata.

The actual codec libraries (PIL/ffmpeg/etc.) are NOT available in this
environment, so the decoders are pluggable: ``FakeDecoder`` produces a
deterministic pseudo-decode from the payload bytes (so the Ray-side
plumbing — schema, actor-pool signature, batch sizing, output layout —
is fully real and tested), while ``ImageDecoder``/``AudioDecoder`` raise
NotImplementedError until the libs exist.  Large payloads => small
batch_size (the caller sizes batch × concurrency to worker heap).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema([
    ("media_id", pa.int64()),
    ("kind", pa.string()),          # image | audio | video
    ("payload", pa.large_binary()),  # opaque encoded bytes
    ("mime", pa.string()),
])

FEATURE_DIM = 16


class FakeDecoder:
    """Deterministic stand-in decode: sha256(payload) -> pseudo
    (width, height, n_frames) + a FEATURE_DIM float feature vector."""

    def decode(self, payload: bytes, kind: str):
        digest = hashlib.sha256(payload).digest()
        width = 16 + digest[0]
        height = 16 + digest[1]
        n_frames = 1 if kind == "image" else 1 + digest[2]
        feats = (np.frombuffer(digest[:FEATURE_DIM], dtype=np.uint8)
                 .astype(np.float32) / 255.0)
        return width, height, n_frames, feats


class BmpDecoder:
    """REAL image decode for uncompressed BMP (pure stdlib: the format
    is a fixed header + pixel array, no codec library needed).
    Features = 16-bin normalized byte-value histogram of the pixel
    array.  Compressed formats (JPEG/PNG) still need ImageDecoder."""

    def decode(self, payload: bytes, kind: str):
        import struct
        if len(payload) < 54 or payload[:2] != b"BM":
            raise ValueError("not a BMP payload")
        data_off, = struct.unpack_from("<I", payload, 10)
        width, height = struct.unpack_from("<ii", payload, 18)
        height = abs(height)                 # negative = top-down rows
        px = np.frombuffer(payload, dtype=np.uint8, offset=data_off)
        hist = np.bincount(px >> 4, minlength=FEATURE_DIM) if len(px) \
            else np.zeros(FEATURE_DIM, dtype=np.int64)
        feats = (hist / max(1, len(px))).astype(np.float32)
        return int(width), int(height), 1, feats


class WavDecoder:
    """REAL audio decode for PCM WAV (pure stdlib RIFF chunk walk).
    Returns (n_channels, bits_per_sample, n_sample_frames, features);
    features = 16-bin normalized byte histogram of the data chunk.
    Compressed audio (mp3/ogg) still needs AudioDecoder."""

    def decode(self, payload: bytes, kind: str):
        import struct
        if len(payload) < 12 or payload[:4] != b"RIFF" \
                or payload[8:12] != b"WAVE":
            raise ValueError("not a RIFF/WAVE payload")
        pos = 12
        channels = bits = block_align = 0
        data = b""
        while pos + 8 <= len(payload):
            cid, size = payload[pos:pos + 4], \
                struct.unpack_from("<I", payload, pos + 4)[0]
            body = payload[pos + 8:pos + 8 + size]
            if cid == b"fmt ":
                channels, = struct.unpack_from("<H", body, 2)
                block_align, = struct.unpack_from("<H", body, 12)
                bits, = struct.unpack_from("<H", body, 14)
            elif cid == b"data":
                data = body
            pos += 8 + size + (size & 1)     # chunks are word-aligned
        if not channels or not block_align:
            raise ValueError("WAV without fmt chunk")
        n_frames = len(data) // block_align
        px = np.frombuffer(data, dtype=np.uint8)
        hist = np.bincount(px >> 4, minlength=FEATURE_DIM) if len(px) \
            else np.zeros(FEATURE_DIM, dtype=np.int64)
        feats = (hist / max(1, len(px))).astype(np.float32)
        return int(channels), int(bits), int(n_frames), feats


class ImageDecoder:
    def decode(self, payload: bytes, kind: str):
        raise NotImplementedError(
            "compressed-image codecs (JPEG/PNG) are not available in "
            "this environment; plug a PIL/opencv decoder here "
            "(uncompressed BMP decodes for real via BmpDecoder)")


class AudioDecoder:
    def decode(self, payload: bytes, kind: str):
        raise NotImplementedError(
            "compressed-audio codecs are not available in this "
            "environment; plug an ffmpeg/librosa decoder here "
            "(PCM WAV decodes for real via WavDecoder)")


class MediaFeatureStage:
    """Actor-pool stage: decode payload -> metadata + feature vector.

    Usage::

        ds.map_batches(MediaFeatureStage, fn_constructor_args=(FakeDecoder(),),
                       batch_format="pyarrow", batch_size=64,
                       concurrency=(2, 8), num_cpus=1)

    batch_size is deliberately small: payloads are large binaries, and a
    batch × actor must fit in the worker heap; the object store spills
    the rest (SURVEY.md-class memory-aware sizing).
    """

    def __init__(self, decoder=None):
        self.decoder = decoder or FakeDecoder()

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("media_id").to_pylist()
        kinds = batch.column("kind").to_pylist()
        payloads = batch.column("payload").to_pylist()
        widths, heights, frames, feats = [], [], [], []
        for payload, kind in zip(payloads, kinds):
            w, h, nf, fv = self.decoder.decode(payload, kind)
            widths.append(w)
            heights.append(h)
            frames.append(nf)
            feats.append(fv)
        return pa.table({
            "media_id": pa.array(ids, pa.int64()),
            "kind": pa.array(kinds, pa.string()),
            "width": pa.array(widths, pa.int32()),
            "height": pa.array(heights, pa.int32()),
            "n_frames": pa.array(frames, pa.int32()),
            "features": pa.array([f.tolist() for f in feats],
                                 pa.list_(pa.float32())),
        })


def frame_sample_plan(n_frames: int, every: int = 10) -> list[int]:
    """Deterministic frame-sampling indices for video payloads."""
    return list(range(0, n_frames, every))
