"""Small shared runtime helpers."""

from __future__ import annotations

_arrow_pinned = False


def pin_worker_arrow_threads(n: int = 1) -> None:
    """Cap pyarrow's per-process compute pool inside worker processes.

    Every Ray worker process inherits Arrow's default pool size (= machine
    CPUs); with 32 concurrent single-CPU tasks that is 32×32 threads
    fighting over 32 cores. Called at the top of hot UDFs (idempotent,
    first call only); the driver process is left alone.
    """
    global _arrow_pinned
    if _arrow_pinned:
        return
    import pyarrow as pa
    try:
        # raise glibc's mmap threshold so numpy's large temporaries come
        # from the reusable heap instead of fresh mmap/munmap pairs —
        # with 32 concurrent workers the kernel page-fault/zone-lock
        # storm made allocating kernels (np.repeat/np.arange) 100x
        # slower than isolated (profiled on the pfor postings encode:
        # reduce p50 19.5s -> see BASELINE.md round-4 notes)
        import ctypes
        libc = ctypes.CDLL("libc.so.6", use_errno=True)
        M_MMAP_THRESHOLD = -3
        libc.mallopt(M_MMAP_THRESHOLD, 1 << 30)
    except Exception:
        pass
    try:
        pa.set_cpu_count(n)
        pa.set_io_thread_count(max(2, n))
    except Exception:
        pass
    _arrow_pinned = True


def part_of(keys, P: int):
    """Fibonacci-hash partition of int64 keys: the ONE partitioner every
    part-hash ``groupby(part).map_groups`` stage must share — two stages
    that co-partition on the same key (e.g. an LSH index build and its
    probe, or a pair shuffle meeting a signature shuffle) silently
    disagree if their hash ever diverges. Multiplication wraps mod 2^64
    (numpy int64); the 31-bit mask keeps the result non-negative."""
    import numpy as np
    keys = np.asarray(keys, dtype=np.int64)
    return ((keys * np.int64(2654435761)) & np.int64(0x7FFFFFFF)) % P


def _hash_batch_c(col, c_name: str, py_one):
    """Shared driver for the batch string hashes: zero-copy Arrow
    large_utf8 buffers into the C kernel when available, else the
    per-string hashlib fallback. Returns np.uint64 per string."""
    import ctypes

    import numpy as np
    import pyarrow as pa

    if isinstance(col, (list, tuple)):
        col = pa.array(col, pa.string())
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    if n == 0:
        return np.empty(0, np.uint64)
    if col.null_count:
        import pyarrow.compute as pc
        col = pc.fill_null(col, "")
    arr = col.cast(pa.large_utf8())
    from blacklab_ray.query.ckernel import get_kernel
    lib = get_kernel()
    if lib is not None:
        bufs = arr.buffers()
        offs = np.frombuffer(bufs[1], np.int64)[
            arr.offset: arr.offset + n + 1]
        data = (np.frombuffer(bufs[2], np.uint8)
                if bufs[2] is not None and len(bufs[2])
                else np.zeros(1, np.uint8))
        out = np.empty(n, np.uint64)
        getattr(lib, c_name)(
            data.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            offs.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            n, out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)))
        return out
    return np.fromiter((py_one(s) for s in arr.to_pylist()),
                       np.uint64, count=n)


def md5_low64_batch(col):
    """Vectorized ``md5_low64`` (low 8 md5 bytes, little-endian ==
    DuckDB ``md5_number_lower``) over a string column / list —
    np.uint64 per string. C kernel when available (one call per
    batch), hashlib loop otherwise; bit-identical either way."""
    from blacklab_ray.pipelines.hits import md5_low64
    return _hash_batch_c(col, "md5_low64_batch", md5_low64)


def md5_high64be_batch(col):
    """Vectorized high-8-md5-bytes big-endian (``digest()[:8]`` read
    big-endian — cleaning's gram-content digest) over a string
    column / list — np.uint64 per string."""
    import hashlib

    def _one(s: str) -> int:
        return int.from_bytes(hashlib.md5(s.encode()).digest()[:8],
                              "big")

    return _hash_batch_c(col, "md5_high64be_batch", _one)


def blake2b64_batch(col):
    """Vectorized raw BLAKE2b(digest_size=8) big-endian over a string
    column / list — np.uint64 per string. Callers shift/mask (hash64
    masks to 63 bits; the shingle hashes shift >>1 / >>3)."""
    import hashlib

    def _one(s: str) -> int:
        return int.from_bytes(
            hashlib.blake2b(s.encode(), digest_size=8).digest(), "big")

    return _hash_batch_c(col, "blake2b64_batch", _one)


def hash64_batch(col):
    """Vectorized ``stages.tokenize.hash64`` (BLAKE2b-8 big-endian,
    63-bit mask — the doc-id primitive) over a string column / list —
    np.uint64 per string (values fit int64)."""
    import numpy as np
    return blake2b64_batch(col) & np.uint64(0x7FFF_FFFF_FFFF_FFFF)


def md5_low64_keyed(*parts):
    """``md5_low64`` of ``":".join(parts)`` element-wise, vectorized:
    ``parts`` are equal-length columns/arrays or broadcast scalars
    (ints/strings). Replaces the ``f"{id}:{seed}"`` Python
    format-then-hash loops in seeded sampling — string assembly runs
    in Arrow, hashing in the C kernel."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    cols = []
    for p in parts:
        if isinstance(p, (str, int, np.integer)):
            cols.append(pa.scalar(str(p)))
        else:
            if isinstance(p, (np.ndarray, list, tuple)):
                p = pa.array(p)
            if isinstance(p, pa.ChunkedArray):
                p = p.combine_chunks()
            if not pa.types.is_string(p.type):
                p = p.cast(pa.string())
            cols.append(p)
    joined = pc.binary_join_element_wise(*cols, ":")
    return md5_low64_batch(joined)
