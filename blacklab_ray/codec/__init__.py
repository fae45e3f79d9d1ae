"""Posting/tokens codecs.

The posting-BLOCK codec is a slot (``BuildParams.codec``, recorded in
``meta.json`` and honored by reader, C kernel and compaction alike —
the analogue of the Lucene postings-format slot BlackLab's
BlackLab40PostingsWriter delegates to,
engine/src/main/java/nl/inl/blacklab/codec/BlackLab40PostingsWriter.java:146):

- ``vbyte`` (default): delta + LEB128 varints, self-delimiting —
  one-pass whole-segment decode.
- ``pfor``: NewPFD-style patched bit-packing per block — 40-60%
  smaller doc-delta/tf streams at the default 128-posting blocks,
  comparable decode speed (see codec/pfor.py).

Position blobs always use VByte (sliced per posting by tf-derived
offsets, which needs a self-delimiting stream); norms are raw bytes.
"""

from blacklab_ray.codec.vbyte import (
    vbyte_encode, vbyte_decode, delta_encode, delta_decode,
    encode_position_lists, decode_position_lists,
)
from blacklab_ray.codec.smallfloat import (
    int_to_byte4, byte4_to_int, encode_lengths, decode_norms,
)

POSTING_CODECS = ("vbyte", "pfor")
