"""Multimodal column plumbing: decode / feature-extract over binary blobs.

Treats image/audio/video as opaque ``binary`` columns with typed metadata,
processed by actor-pool ``map_batches`` stages. The actual codec libraries
are NOT available in this environment, so the decode kernel is pluggable:
the default ``FakeDecoder`` is a deterministic stand-in (documented
STUB) while the Ray-side plumbing — schema, batch sizing for large
payloads, actor signature, output layout — is real and tested.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import ray.data

MEDIA_SCHEMA = pa.schema([
    ("media_id", pa.int64()),
    ("media_type", pa.string()),      # image|audio|video
    ("payload", pa.binary()),
    ("width", pa.int32()),
    ("height", pa.int32()),
])


class FakeDecoder:
    """Deterministic decode STUB: real image/audio decoding would live
    here (PIL / torchaudio / pyav are not installed in this container).

    Produces a stable 8-dim "feature" from the payload bytes so the
    pipeline shape (binary in → fixed-size float vector out) is real.
    """

    def decode(self, payload: bytes) -> np.ndarray:
        h = hashlib.blake2b(payload, digest_size=32).digest()
        return (np.frombuffer(h, dtype=np.uint32).astype(np.float64)
                / np.float64(2**32))

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = np.stack([self.decode(p.as_py())
                          for p in batch.column("payload")])
        return pa.table({
            "media_id": batch.column("media_id"),
            "media_type": batch.column("media_type"),
            "feature": pa.array(feats.tolist(),
                                pa.list_(pa.float64(), feats.shape[1])),
        })


class RealDecoderUnavailable:
    """Marker for the real decode path."""

    def __call__(self, batch):
        raise NotImplementedError(
            "image/audio codec libraries are not installed in this "
            "environment; plug a decoder with the FakeDecoder interface")


def extract_features(ds: ray.data.Dataset,
                     decoder_cls=FakeDecoder,
                     batch_size: int = 64,
                     concurrency=2) -> ray.data.Dataset:
    """Actor-pool feature extraction over binary media payloads.

    ``batch_size`` is deliberately small: payloads are large binaries, so
    batch × concurrency must fit worker heaps (SURVEY memory-aware note).
    """
    return ds.map_batches(decoder_cls, batch_format="pyarrow",
                          batch_size=batch_size, concurrency=concurrency)


def synth_media_table(n: int, seed: int = 9) -> pa.Table:
    """Deterministic fake media rows for tests."""
    rng = np.random.default_rng(seed)
    payloads = [rng.integers(0, 256, size=int(rng.integers(100, 4000)),
                             dtype=np.uint8).tobytes() for _ in range(n)]
    return pa.table({
        "media_id": pa.array(range(n), pa.int64()),
        "media_type": pa.array(["image" if i % 2 == 0 else "audio"
                                for i in range(n)], pa.string()),
        "payload": pa.array(payloads, pa.binary()),
        "width": pa.array([64] * n, pa.int32()),
        "height": pa.array([64] * n, pa.int32()),
    })
