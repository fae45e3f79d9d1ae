"""Parity + fallback tests for the vectorized C string hashes
(util.md5_low64_batch / md5_high64be_batch / blake2b64_batch /
hash64_batch / md5_low64_keyed)."""

import hashlib

import numpy as np
import pyarrow as pa
import pytest

from blacklab_ray.util import (
    blake2b64_batch, hash64_batch, md5_high64be_batch,
    md5_low64_batch, md5_low64_keyed,
)


def _cases():
    import random
    import string
    rng = random.Random(11)
    # every md5/blake2b block boundary + unicode + empties
    fixed = ["", "a", "abc", "x" * 55, "x" * 56, "x" * 57, "x" * 63,
             "x" * 64, "x" * 65, "y" * 119, "y" * 120, "y" * 127,
             "y" * 128, "y" * 129, "z" * 1000, "ünïcødé ☃", "0:17"]
    rand = ["".join(rng.choices(string.printable,
                                k=rng.randint(0, 300)))
            for _ in range(150)]
    return fixed + rand


@pytest.mark.parametrize("use_kernel", [True, False])
def test_hash_batch_parity(use_kernel, monkeypatch):
    if not use_kernel:
        import blacklab_ray.query.ckernel as ck
        monkeypatch.setattr(ck, "_kernel", None)
    strs = _cases()
    exp_lo = np.array([int.from_bytes(
        hashlib.md5(s.encode()).digest()[8:16], "little")
        for s in strs], np.uint64)
    exp_hi = np.array([int.from_bytes(
        hashlib.md5(s.encode()).digest()[:8], "big")
        for s in strs], np.uint64)
    exp_b2 = np.array([int.from_bytes(
        hashlib.blake2b(s.encode(), digest_size=8).digest(), "big")
        for s in strs], np.uint64)
    assert (md5_low64_batch(strs) == exp_lo).all()
    assert (md5_high64be_batch(strs) == exp_hi).all()
    assert (blake2b64_batch(strs) == exp_b2).all()
    assert (hash64_batch(strs)
            == (exp_b2 & np.uint64(0x7FFFFFFFFFFFFFFF))).all()


def test_hash_batch_arrow_inputs():
    """ChunkedArray, nulls, sliced arrays all hash correctly."""
    from blacklab_ray.pipelines.hits import md5_low64
    arr = pa.chunked_array([["aa", None], ["bb", "cc"]])
    got = md5_low64_batch(arr)
    exp = np.array([md5_low64(s) for s in ["aa", "", "bb", "cc"]],
                   np.uint64)
    assert (got == exp).all()
    sl = pa.array(["p", "q", "r", "s"]).slice(1, 2)
    assert (md5_low64_batch(sl)
            == np.array([md5_low64("q"), md5_low64("r")],
                        np.uint64)).all()


def test_md5_low64_keyed_matches_format():
    from blacklab_ray.pipelines.hits import md5_low64
    ids = np.array([0, 5, -3, 2**40], np.int64)
    pos = np.array([7, 0, 12, 99], np.int64)
    got = md5_low64_keyed(ids, pos, 17)
    exp = np.array([md5_low64(f"{d}:{p}:17")
                    for d, p in zip(ids, pos)], np.uint64)
    assert (got == exp).all()
    got2 = md5_low64_keyed("ivfseed", ids)
    exp2 = np.array([md5_low64(f"ivfseed:{d}") for d in ids],
                    np.uint64)
    assert (got2 == exp2).all()
