import numpy as np
import pytest

from blacklab_ray.codec import (
    byte4_to_int, decode_norms, decode_position_lists, delta_decode,
    delta_encode, encode_lengths, encode_position_lists, int_to_byte4,
    vbyte_decode, vbyte_encode,
)
from blacklab_ray.codec.smallfloat import DECODE_TABLE


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_vbyte_roundtrip_random(seed):
    rng = np.random.default_rng(seed)
    for hi in (1, 2**7, 2**14, 2**31, 2**62):
        v = rng.integers(0, hi, size=777).astype(np.uint64)
        assert (vbyte_decode(vbyte_encode(v)) == v).all()


def test_vbyte_edges():
    assert vbyte_encode(np.array([], dtype=np.uint64)) == b""
    assert vbyte_decode(b"").size == 0
    for x in [0, 1, 127, 128, 16383, 16384, 2**62]:
        got = vbyte_decode(vbyte_encode(np.array([x], dtype=np.uint64)))
        assert got.tolist() == [x]
    # single-byte values use exactly one byte
    assert len(vbyte_encode(np.array([0, 127], dtype=np.uint64))) == 2


def test_delta_roundtrip():
    rng = np.random.default_rng(3)
    docs = np.unique(rng.integers(0, 2**55, size=1000))
    assert (delta_decode(delta_encode(docs)) == docs).all()
    with pytest.raises(ValueError):
        delta_encode(np.array([5, 3]))


def test_position_lists_roundtrip():
    rng = np.random.default_rng(4)
    counts = rng.integers(1, 9, size=200)
    pos = np.concatenate([
        np.sort(rng.choice(5000, size=c, replace=False)) for c in counts])
    blob = encode_position_lists(pos, counts)
    assert (decode_position_lists(blob, counts) == pos).all()


def test_smallfloat_monotone_and_lossy():
    assert (np.diff(DECODE_TABLE) > 0).all()
    prev = -1
    for i in [0, 1, 23, 24, 25, 100, 255, 1000, 10**6, 2**31 - 1]:
        b = int_to_byte4(i)
        assert 0 <= b <= 255
        assert b >= prev
        prev = b
        assert byte4_to_int(b) <= i
    # exact below the free-value threshold
    for i in range(24):
        assert byte4_to_int(int_to_byte4(i)) == i


def test_smallfloat_vectorized_parity():
    rng = np.random.default_rng(5)
    vals = np.concatenate([np.arange(300),
                           rng.integers(0, 2**31 - 1, size=3000)])
    enc = encode_lengths(vals)
    assert (enc == np.array([int_to_byte4(int(x)) for x in vals],
                            dtype=np.uint8)).all()
    assert (decode_norms(enc) <= vals).all()
    # idempotent on quantized values
    q = decode_norms(enc)
    assert (decode_norms(encode_lengths(q)) == q).all()


def test_encode_terms_incremental_matches_batch_encode():
    """Per-batch incremental encoding (fused bounded-buffer path) must
    produce the same first-occurrence code contract as the one-shot
    dictionary_encode over any batch split."""
    import numpy as np
    import pyarrow as pa
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from blacklab_ray.index.exchange import (_encode_terms_as_codes,
                                             _encode_terms_incremental)

    @settings(max_examples=40, deadline=None)
    @given(st.lists(st.sampled_from("abcdef"), min_size=1, max_size=60),
           st.integers(min_value=1, max_value=7))
    def check(terms, split):
        tbl = pa.table({"term": pa.array(terms, pa.string()),
                        "gkey": pa.array(range(len(terms)), pa.int64())})
        whole, vocab = _encode_terms_as_codes(tbl)
        idx, vlist = {}, []
        pieces = [tbl.slice(i, split)
                  for i in range(0, len(terms), split)]
        enc = pa.concat_tables(
            [_encode_terms_incremental(p, idx, vlist) for p in pieces])
        assert vlist == vocab["term"].to_pylist()
        np.testing.assert_array_equal(
            enc["term_code"].to_numpy(zero_copy_only=False),
            whole["term_code"].to_numpy(zero_copy_only=False))

    check()
