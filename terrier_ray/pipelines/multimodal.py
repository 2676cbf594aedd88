"""Multimodal column plumbing: opaque binary media + typed metadata.

The container has no image/audio codecs, so the DECODE step is stubbed
(NotImplementedError for real formats; a deterministic fake decoder for the
synthetic media this module generates).  Everything Ray-side is real and
tested: schema, batched binary payloads, actor-pool stage signature, output
layout, byte-capped batch sizing.

Synthetic media blob format (deterministic, seed-fixed):
``b"TRMM" | kind:uint8 | width:uint16 | height:uint16 | payload bytes``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("kind", pa.string()),  # image | audio | video
        ("blob", pa.binary()),
        ("meta_width", pa.int32()),
        ("meta_height", pa.int32()),
    ]
)

_MAGIC = b"TRMM"
_KINDS = ["image", "audio", "video"]


def generate_media_table(num_rows: int = 200, seed: int = 42) -> pa.Table:
    rng = np.random.default_rng(seed)
    ids = np.arange(num_rows, dtype=np.int64)
    kinds = [_KINDS[int(k)] for k in rng.integers(0, 3, num_rows)]
    widths = rng.integers(16, 512, num_rows).astype(np.int32)
    heights = rng.integers(16, 512, num_rows).astype(np.int32)
    blobs = []
    for i in range(num_rows):
        payload = rng.integers(0, 256, int(widths[i]) * 4, dtype=np.uint8).tobytes()
        header = (
            _MAGIC
            + bytes([_KINDS.index(kinds[i])])
            + int(widths[i]).to_bytes(2, "little")
            + int(heights[i]).to_bytes(2, "little")
        )
        blobs.append(header + payload)
    return pa.table(
        {
            "media_id": pa.array(ids),
            "kind": pa.array(kinds, type=pa.string()),
            "blob": pa.array(blobs, type=pa.binary()),
            "meta_width": pa.array(widths),
            "meta_height": pa.array(heights),
        }
    )


class MediaDecoder:
    """Actor-pool decode/feature stage for binary media columns.

    Real formats (JPEG/PNG/WAV/MP4) require codec libraries absent from this
    environment → NotImplementedError, clearly marked.  The synthetic TRMM
    format decodes deterministically, exercising the full Ray plumbing.

    Use small ``batch_size`` (payloads are large): size batches by BYTES.
    """

    def __init__(self, feature_dim: int = 8):
        self.feature_dim = feature_dim

    def _decode(self, blob: bytes) -> np.ndarray:
        if blob[:4] != _MAGIC:
            raise NotImplementedError(
                "real media codecs (JPEG/PNG/WAV/...) are not available in "
                "this environment; only the synthetic TRMM format decodes"
            )
        payload = np.frombuffer(blob, dtype=np.uint8, offset=9).astype(np.float64)
        # deterministic 'feature extraction': moments over payload chunks
        chunks = np.array_split(payload, self.feature_dim)
        return np.array([c.mean() if len(c) else 0.0 for c in chunks])

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = np.vstack(
            [np.round(self._decode(b), 4) for b in batch.column("blob").to_pylist()]
        ) if batch.num_rows else np.empty((0, self.feature_dim))
        cols = {
            "media_id": batch.column("media_id"),
            "kind": batch.column("kind"),
        }
        for j in range(self.feature_dim):
            cols[f"f{j}"] = pa.array(feats[:, j])
        return pa.table(cols)


def media_features(num_rows: int = 200):
    """read (synth) media → actor-pool decode → features table."""
    import ray.data as rd

    tab = generate_media_table(num_rows)
    ds = rd.from_arrow(tab).repartition(4)
    return ds.map_batches(
        MediaDecoder,
        batch_format="pyarrow",
        batch_size=32,  # byte-capped: blobs are wide
        concurrency=2,
    )


class MediaResizer:
    """Actor-pool resize stage: nearest-neighbor resampling of the synthetic
    raster to a fixed output length (the gather/index math is the real part;
    a real JPEG/PNG resize would swap the decode+encode around the same
    gather).  Emits a correctly-sized binary payload + updated metadata."""

    def __init__(self, out_len: int = 128):
        self.out_len = out_len

    def _resize(self, blob: bytes) -> bytes:
        if blob[:4] != _MAGIC:
            raise NotImplementedError(
                "real media codecs are unavailable here; synthetic TRMM only"
            )
        payload = np.frombuffer(blob, dtype=np.uint8, offset=9)
        if len(payload) == 0:
            return bytes(self.out_len)
        idx = np.minimum(
            (np.arange(self.out_len) * len(payload)) // self.out_len,
            len(payload) - 1,
        )
        return payload[idx].tobytes()

    def __call__(self, batch: pa.Table) -> pa.Table:
        resized = [self._resize(b) for b in batch.column("blob").to_pylist()]
        return pa.table(
            {
                "media_id": batch.column("media_id"),
                "kind": batch.column("kind"),
                "blob": pa.array(resized, type=pa.binary()),
                "out_len": pa.array(
                    np.full(batch.num_rows, self.out_len, dtype=np.int32)
                ),
            }
        )


class FrameSampler:
    """Actor-pool frame sampling for video blobs: the payload is treated as
    ``n_frames`` equal strides; every ``stride``-th frame is emitted as its
    own row (flat-map shape — one input row → several frame rows).  Non-video
    rows pass through untouched downstream stages by being dropped here."""

    def __init__(self, n_frames: int = 4, stride: int = 2):
        self.n_frames = n_frames
        self.stride = stride

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, fnos, frames = [], [], []
        for mid, kind, blob in zip(
            batch.column("media_id").to_pylist(),
            batch.column("kind").to_pylist(),
            batch.column("blob").to_pylist(),
        ):
            if kind != "video":
                continue
            if blob[:4] != _MAGIC:
                raise NotImplementedError("synthetic TRMM only")
            payload = np.frombuffer(blob, dtype=np.uint8, offset=9)
            per = max(1, len(payload) // self.n_frames)
            for f in range(0, self.n_frames, self.stride):
                ids.append(mid)
                fnos.append(f)
                frames.append(payload[f * per : (f + 1) * per].tobytes())
        return pa.table(
            {
                "media_id": pa.array(ids, type=pa.int64()),
                "frame_no": pa.array(fnos, type=pa.int32()),
                "frame": pa.array(frames, type=pa.binary()),
            }
        )


def media_resized(num_rows: int = 200, out_len: int = 128):
    """media → actor-pool nearest-neighbor resize → fixed-size payloads."""
    import ray.data as rd

    ds = rd.from_arrow(generate_media_table(num_rows)).repartition(4)
    return ds.map_batches(
        MediaResizer, batch_format="pyarrow", batch_size=32, concurrency=2,
        fn_constructor_kwargs={"out_len": out_len},
    )


def media_frames(num_rows: int = 200):
    """video rows → actor-pool frame sampling (flat-map: rows multiply)."""
    import ray.data as rd

    ds = rd.from_arrow(generate_media_table(num_rows)).repartition(4)
    return ds.map_batches(
        FrameSampler, batch_format="pyarrow", batch_size=32, concurrency=2
    )
