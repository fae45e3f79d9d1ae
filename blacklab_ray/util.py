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
