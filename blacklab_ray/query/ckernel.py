"""ctypes loader + wrapper for the compiled Block-Max WAND kernel.

The C source ships in blacklab_ray/native/wand_kernel.c and compiles
ON FIRST USE with ``gcc -O3 -shared -fPIC`` into a content-addressed
``/tmp/blray_wand_<md5>.so`` (so editing the .c invalidates the cache).
No gcc / failed compile / ``BLRAY_NO_CKERNEL=1`` → ``get_kernel()``
returns None and ``engine.search_wand`` keeps its pure-Python loop —
the kernel is an accelerator, never a requirement.

The wrapper passes ZERO-COPY pointers into the fetched Arrow postings
buffers (the same memoryviews/ndarrays Segment slices): per segment,
the varint doc/tf blobs + absolute block offsets, raw norm bytes,
block metadata, and the precomputed float64 block upper bounds. BM25's
quantized length norm arrives as a 256-entry ``K1*(1-b+b*dl/avgdl)``
table so the C side is a pure table lookup.
"""

from __future__ import annotations

import ctypes
import hashlib
import logging
import os
import subprocess
import threading

import numpy as np

logger = logging.getLogger("blacklab_ray.ckernel")

_SRC = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "native", "wand_kernel.c")

_lock = threading.Lock()
_kernel: "ctypes.CDLL | None | bool" = False   # False = not attempted

_PU8 = ctypes.POINTER(ctypes.c_uint8)
_PI64 = ctypes.POINTER(ctypes.c_int64)
_PF64 = ctypes.POINTER(ctypes.c_double)


def _compile() -> "ctypes.CDLL | None":
    if os.environ.get("BLRAY_NO_CKERNEL"):
        return None
    try:
        with open(_SRC, "rb") as f:
            src = f.read()
    except OSError:
        return None
    so = os.path.join("/tmp", "blray_wand_%s.so"
                      % hashlib.md5(src).hexdigest()[:16])
    if not os.path.exists(so):
        tmp = so + ".%d.tmp" % os.getpid()
        try:
            subprocess.run(
                ["gcc", "-O3", "-shared", "-fPIC", "-o", tmp, _SRC],
                check=True, capture_output=True, timeout=120)
            os.replace(tmp, so)       # atomic publish (racing workers)
        except (OSError, subprocess.SubprocessError) as e:
            logger.warning("WAND C kernel compile failed (%s); "
                           "using the Python fallback", e)
            return None
    try:
        lib = ctypes.CDLL(so)
    except OSError:
        return None
    lib.wand_topk.restype = ctypes.c_int64
    lib.wand_topk.argtypes = [
        ctypes.c_int64,
        ctypes.POINTER(_PU8), ctypes.POINTER(_PI64),   # docs
        ctypes.POINTER(_PU8), ctypes.POINTER(_PI64),   # tfs
        ctypes.POINTER(_PU8), ctypes.POINTER(_PI64),   # norms
        ctypes.POINTER(_PI64),                         # last_docs
        ctypes.POINTER(_PF64),                         # block_ubs
        ctypes.POINTER(_PI64),                         # ns
        _PI64,                                         # n_blocks
        _PF64, _PF64,                                  # idfs, max_scores
        _PF64, ctypes.c_int64,                         # ktab, codec_id
        _PI64, _PF64, ctypes.c_int64,                  # exact dl keys/kd/n
        _PI64, ctypes.c_int64,                         # tombstones
        ctypes.POINTER(_PU8), ctypes.POINTER(_PI64),   # excl docs
        ctypes.POINTER(_PI64), ctypes.POINTER(_PI64),  # excl last/ns
        _PI64, ctypes.c_int64, ctypes.c_int64,         # excl nb/n/max_n
        ctypes.c_int64, ctypes.c_int64,                # max_n, k
        _PI64, _PF64,                                  # out
    ]
    _PU64 = ctypes.POINTER(ctypes.c_uint64)
    for fn in ("md5_low64_batch", "md5_high64be_batch",
               "blake2b64_batch"):
        f = getattr(lib, fn)
        f.restype = None
        f.argtypes = [_PU8, _PI64, ctypes.c_int64, _PU64]
    return lib


def get_kernel() -> "ctypes.CDLL | None":
    global _kernel
    if _kernel is False:
        with _lock:
            if _kernel is False:
                _kernel = _compile()
    return _kernel or None


def _u8_ptr(mv: memoryview) -> _PU8:
    arr = np.frombuffer(mv, dtype=np.uint8)
    if arr.size == 0:
        return ctypes.cast(None, _PU8)
    return arr.ctypes.data_as(_PU8)


def _i64_ptr(a: np.ndarray) -> _PI64:
    if a.size == 0:
        return ctypes.cast(None, _PI64)
    return a.ctypes.data_as(_PI64)


def _f64_ptr(a: np.ndarray) -> _PF64:
    if a.size == 0:
        return ctypes.cast(None, _PF64)
    return a.ctypes.data_as(_PF64)


def wand_topk_c(reader, present: list[str], segs: dict, stats: dict,
                k: int, excl_segs: "list | None" = None,
                exact_dl: "tuple | None" = None,
                ) -> "tuple[np.ndarray, np.ndarray] | None":
    """Run the compiled kernel over the fetched segments; None → caller
    must fall back to the Python loop.

    ``excl_segs``: negative-term posting segments (AND-NOT) — probed
    forward-only at full evaluation inside the kernel, doc-id decode
    only, exactly mirroring engine._DocIter.

    ``exact_dl``: ``(sorted_doc_ids int64, kd float64)`` for
    quantize=False scoring — per-doc precomputed ``K(dl_exact)``
    replacing the 256-entry quantized table at full evaluation (block
    upper bounds stay quantized-min-norm: norms round dl down, so they
    still dominate every exact score)."""
    lib = get_kernel()
    if lib is None:
        return None
    from blacklab_ray.codec.smallfloat import DECODE_TABLE
    from blacklab_ray.query.bm25 import B, K1, block_upper_bounds, idf

    its = []        # (seg, idf) with n_blocks > 0
    for t in present:
        t_idf = float(idf(stats[t][0], reader.n_docs))
        for s in segs[t]:
            if s.n_blocks:
                its.append((s, t_idf))
    if not its:
        return np.empty(0, np.int64), np.empty(0, np.float64)
    n = len(its)
    # keep every referenced buffer alive across the call
    keep: list = []
    docs_blob = (_PU8 * n)()
    docs_offs = (_PI64 * n)()
    tfs_blob = (_PU8 * n)()
    tfs_offs = (_PI64 * n)()
    norms_blob = (_PU8 * n)()
    norms_offs = (_PI64 * n)()
    last_docs = (_PI64 * n)()
    ubs_p = (_PF64 * n)()
    ns_p = (_PI64 * n)()
    n_blocks = np.empty(n, np.int64)
    idfs = np.empty(n, np.float64)
    max_scores = np.empty(n, np.float64)
    max_n = 0
    for i, (s, t_idf) in enumerate(its):
        for field, pblob, poffs in (("docs", docs_blob, docs_offs),
                                    ("tfs", tfs_blob, tfs_offs),
                                    ("norms", norms_blob, norms_offs)):
            o, mv = s._bins[field]
            offs = np.ascontiguousarray(
                o[s._lo:s._lo + s.n_blocks + 1], dtype=np.int64)
            keep.append(offs)
            keep.append(mv)
            pblob[i] = _u8_ptr(mv)
            poffs[i] = _i64_ptr(offs)
        ld = np.ascontiguousarray(s.last_docs, dtype=np.int64)
        nsv = np.ascontiguousarray(s.ns, dtype=np.int64)
        ubs = np.ascontiguousarray(block_upper_bounds(
            s.max_tfs, s.min_norms, reader.avgdl, t_idf),
            dtype=np.float64)
        keep.extend((ld, nsv, ubs))
        last_docs[i] = _i64_ptr(ld)
        ns_p[i] = _i64_ptr(nsv)
        ubs_p[i] = _f64_ptr(ubs)
        n_blocks[i] = s.n_blocks
        idfs[i] = t_idf
        max_scores[i] = float(ubs.max())
        max_n = max(max_n, int(nsv.max()))
    # same association as bm25.length_norm_k: k1*(1-b+b*(dl/avgdl)) —
    # keeps kernel scores bit-identical to the Python path
    dl_tab = DECODE_TABLE.astype(np.float64)
    ktab = np.ascontiguousarray(
        K1 * (1.0 - B + B * (dl_tab / reader.avgdl)),
        dtype=np.float64)
    tombs = np.sort(np.fromiter(reader.tombstones, dtype=np.int64,
                                count=len(reader.tombstones)))
    ex = [s for s in (excl_segs or []) if s.n_blocks]
    n_ex = len(ex)
    ex_docs_blob = (_PU8 * max(n_ex, 1))()
    ex_docs_offs = (_PI64 * max(n_ex, 1))()
    ex_last = (_PI64 * max(n_ex, 1))()
    ex_ns = (_PI64 * max(n_ex, 1))()
    ex_nb = np.empty(max(n_ex, 1), np.int64)
    ex_max_n = 0
    for i, s in enumerate(ex):
        o, mv = s._bins["docs"]
        offs = np.ascontiguousarray(
            o[s._lo:s._lo + s.n_blocks + 1], dtype=np.int64)
        ld = np.ascontiguousarray(s.last_docs, dtype=np.int64)
        nsv = np.ascontiguousarray(s.ns, dtype=np.int64)
        keep.extend((offs, mv, ld, nsv))
        ex_docs_blob[i] = _u8_ptr(mv)
        ex_docs_offs[i] = _i64_ptr(offs)
        ex_last[i] = _i64_ptr(ld)
        ex_ns[i] = _i64_ptr(nsv)
        ex_nb[i] = s.n_blocks
        ex_max_n = max(ex_max_n, int(nsv.max()))
    out_docs = np.empty(k, np.int64)
    out_scores = np.empty(k, np.float64)
    codec_id = {"vbyte": 0, "pfor": 1}.get(
        getattr(reader, "codec", "vbyte"))
    if codec_id is None:
        return None     # unknown codec -> Python fallback
    if exact_dl is not None:
        dl_keys = np.ascontiguousarray(exact_dl[0], dtype=np.int64)
        dl_kd = np.ascontiguousarray(exact_dl[1], dtype=np.float64)
        keep.extend((dl_keys, dl_kd))
        n_dl = dl_keys.size
    else:
        dl_keys = np.empty(0, np.int64)
        dl_kd = np.empty(0, np.float64)
        n_dl = 0
    n_out = lib.wand_topk(
        n, docs_blob, docs_offs, tfs_blob, tfs_offs,
        norms_blob, norms_offs, last_docs, ubs_p, ns_p,
        _i64_ptr(n_blocks), _f64_ptr(idfs), _f64_ptr(max_scores),
        _f64_ptr(ktab), codec_id,
        _i64_ptr(dl_keys), _f64_ptr(dl_kd), n_dl,
        _i64_ptr(tombs), tombs.size,
        ex_docs_blob, ex_docs_offs, ex_last, ex_ns,
        _i64_ptr(ex_nb), n_ex, ex_max_n,
        max_n, k, _i64_ptr(out_docs), _f64_ptr(out_scores))
    del keep
    if n_out < 0:
        return None
    return out_docs[:n_out].copy(), out_scores[:n_out].copy()
