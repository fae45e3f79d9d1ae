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


class Md5Decoder(FakeDecoder):
    """Deterministic decode stand-in whose output is SQL-replicable:
    feature = [md5_lower64(payload) / 2^64, md5_upper64(payload) / 2^64]
    == DuckDB ``md5_number_lower(x)::DOUBLE / 2^64`` /
    ``md5_number_upper(x)::DOUBLE / 2^64`` (uint64→double rounding then
    exact power-of-two scaling equals correctly-rounded division on
    both sides). Same interface as FakeDecoder, so it slots into
    extract_features / media_pipeline; used by the driver-oracled
    ``media_features`` entry."""

    def decode(self, payload: bytes) -> np.ndarray:
        d = hashlib.md5(payload).digest()
        return np.array(
            [int.from_bytes(d[8:16], "little") / 2.0 ** 64,
             int.from_bytes(d[0:8], "little") / 2.0 ** 64], np.float64)


def media_from_documents(ds: ray.data.Dataset) -> ray.data.Dataset:
    """Derive a MEDIA_SCHEMA-shaped table from the ``documents`` table:
    payload = UTF-8 text bytes, media_type = md5_lower64(text) % 3
    (DuckDB: ``md5_number_lower(text) % 3``). Lets the multimodal
    actor-pool plumbing run over driver-oracleable inputs — real media
    would arrive as binary Parquet columns of the same shape."""

    _TYPES = ("image", "audio", "video")

    def _mk(batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        kinds = []
        for t in texts:
            d = hashlib.md5(t.encode()).digest()
            kinds.append(_TYPES[int.from_bytes(d[8:16], "little") % 3])
        n = batch.num_rows
        return pa.table({
            "media_id": batch.column("doc_id"),
            "media_type": pa.array(kinds, pa.string()),
            "payload": pa.array([t.encode() for t in texts], pa.binary()),
            "width": pa.array([0] * n, pa.int32()),
            "height": pa.array([0] * n, pa.int32()),
        })

    return ds.map_batches(_mk, batch_format="pyarrow")


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


class FakeResizer:
    """Resize stage STUB (PIL unavailable): the Ray plumbing — binary
    in/out, metadata columns updated, actor-pool batch sizing — is
    real; the pixel work is a deterministic byte transform standing in
    for the decode→resample→encode kernel."""

    def __init__(self, width: int = 32, height: int = 32):
        self._w = width
        self._h = height

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        # deterministic stand-in: truncate/fold payload to w*h bytes
        out = []
        for p in batch.column("payload"):
            b = p.as_py()
            size = self._w * self._h
            rep = (b * ((size // max(len(b), 1)) + 1))[:size]
            out.append(rep)
        batch = batch.set_column(
            batch.schema.get_field_index("payload"), "payload",
            pa.array(out, pa.binary()))
        batch = batch.set_column(
            batch.schema.get_field_index("width"), "width",
            pa.array([self._w] * n, pa.int32()))
        return batch.set_column(
            batch.schema.get_field_index("height"), "height",
            pa.array([self._h] * n, pa.int32()))


class FrameSampler:
    """Video frame sampling STUB: one video row → ``n_frames`` frame
    rows (the fan-out shape a real pyav sampler has — output rows
    exceed input rows, so downstream batch sizing must account for the
    multiplier). Frames are deterministic payload slices standing in
    for decoded frames; non-video rows pass through with frame_idx 0."""

    def __init__(self, n_frames: int = 4):
        self._n = n_frames

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows = {"media_id": [], "media_type": [], "frame_idx": [],
                "payload": [], "width": [], "height": []}
        for i in range(batch.num_rows):
            mt = batch["media_type"][i].as_py()
            payload = batch["payload"][i].as_py()
            w = batch["width"][i].as_py()
            h = batch["height"][i].as_py()
            mid = batch["media_id"][i].as_py()
            if mt == "video":
                step = max(1, len(payload) // self._n)
                for f in range(self._n):
                    rows["media_id"].append(mid)
                    rows["media_type"].append("image")
                    rows["frame_idx"].append(f)
                    rows["payload"].append(
                        payload[f * step:(f + 1) * step] or b"\0")
                    rows["width"].append(w)
                    rows["height"].append(h)
            else:
                rows["media_id"].append(mid)
                rows["media_type"].append(mt)
                rows["frame_idx"].append(0)
                rows["payload"].append(payload)
                rows["width"].append(w)
                rows["height"].append(h)
        return pa.table({
            "media_id": pa.array(rows["media_id"], pa.int64()),
            "media_type": pa.array(rows["media_type"], pa.string()),
            "frame_idx": pa.array(rows["frame_idx"], pa.int32()),
            "payload": pa.array(rows["payload"], pa.binary()),
            "width": pa.array(rows["width"], pa.int32()),
            "height": pa.array(rows["height"], pa.int32()),
        })


def media_pipeline(ds: ray.data.Dataset, n_frames: int = 4,
                   width: int = 32, height: int = 32,
                   decoder_cls=FakeDecoder,
                   batch_size: int = 64) -> ray.data.Dataset:
    """frame-sample → resize → feature-extract, each an actor-pool
    map_batches stage with small batches (binary payloads; SURVEY
    memory-aware note). The composition is the real multimodal
    training-data shape; only the pixel kernels are stubbed."""
    out = ds.map_batches(FrameSampler(n_frames), batch_format="pyarrow",
                         batch_size=batch_size)
    out = out.map_batches(FakeResizer(width, height),
                          batch_format="pyarrow", batch_size=batch_size)
    return out.map_batches(decoder_cls, batch_format="pyarrow",
                           batch_size=batch_size, concurrency=2)


def synth_media_table(n: int, seed: int = 9) -> pa.Table:
    """Deterministic fake media rows for tests."""
    rng = np.random.default_rng(seed)
    payloads = [rng.integers(0, 256, size=int(rng.integers(100, 4000)),
                             dtype=np.uint8).tobytes() for _ in range(n)]
    return pa.table({
        "media_id": pa.array(range(n), pa.int64()),
        "media_type": pa.array(
            [("image", "audio", "video")[i % 3] for i in range(n)],
            pa.string()),
        "payload": pa.array(payloads, pa.binary()),
        "width": pa.array([64] * n, pa.int32()),
        "height": pa.array([64] * n, pa.int32()),
    })
