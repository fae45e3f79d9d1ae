/* Block-Max WAND top-k kernel.
 *
 * A C mirror of blacklab_ray.query.engine.search_wand's doc-at-a-time
 * loop (same pivoting, block-max refinement, advancing and tie rules —
 * results are bit-identical to the Python path, which remains the
 * fallback). The kernel owns the whole hot path the Python loop paid
 * interpreter overhead for: varint block decode, BM25 posting scores
 * via a 256-entry quantized-norm table, skip-list seeks, the sorted
 * live list and the k-sized min-heap.
 *
 * Posting layout (index/postings.py): per block, doc-id deltas and
 * tfs as LEB128 varints (low 7 bits first, high bit = continuation),
 * norms as one raw uint8 per posting; per-block metadata arrays
 * (last_doc, n) and precomputed float64 block upper bounds arrive
 * from Python as pointers into the fetched Arrow buffers — zero copy.
 *
 * Compiled on first use via gcc -O3 -shared -fPIC (query/ckernel.py);
 * absence of gcc or a compile failure silently selects the Python
 * fallback.
 */
#include <stdint.h>
#include <stdlib.h>
#include <string.h>

#define DOC_INF INT64_MAX

typedef struct {
    const uint8_t *docs_blob;
    const int64_t *docs_offs;   /* absolute, n_blocks+1 entries */
    const uint8_t *tfs_blob;
    const int64_t *tfs_offs;
    const uint8_t *norms_blob;
    const int64_t *norms_offs;
    const int64_t *last_docs;
    const double  *block_ubs;
    const int64_t *ns;
    int64_t n_blocks;
    double idf;
    double max_score;
    const double *ktab;         /* 256-entry K1*(1-B+B*dl/avgdl) */
    /* exact-length scoring (quantize=False): sorted doc ids + their
     * precomputed K(dl_exact); n_dl == 0 selects the ktab path. The
     * block upper bounds stay valid: SmallFloat norms round dl DOWN,
     * so the quantized-min-norm bound >= any exact score. */
    const int64_t *dl_keys;
    const double *dl_kd;
    int64_t n_dl;
    int *err;                   /* set on dl lookup miss -> caller -2 */
    int codec;                  /* 0 = vbyte varint, 1 = pfor */
    /* state */
    int64_t bi, pi, n, cur_doc, cur_last;
    int64_t *docs;
    double *scores;
} SegIt;

/* K(dl) for one doc by binary search over the sorted exact-dl table */
static inline double exact_kd(const SegIt *s, int64_t doc) {
    int64_t lo = 0, hi = s->n_dl;
    while (lo < hi) {
        int64_t mid = (lo + hi) >> 1;
        if (s->dl_keys[mid] < doc) lo = mid + 1; else hi = mid;
    }
    if (lo >= s->n_dl || s->dl_keys[lo] != doc) {
        *s->err = 1;            /* incomplete table: force the fallback */
        return 1.0;
    }
    return s->dl_kd[lo];
}

static inline uint64_t read_varint(const uint8_t **pp) {
    uint64_t v = 0;
    int shift = 0;
    uint8_t byte;
    do {
        byte = *(*pp)++;
        v |= ((uint64_t)(byte & 0x7F)) << shift;
        shift += 7;
    } while (byte & 0x80);
    return v;
}

/* PForDelta block decode (codec/pfor.py layout): byte0 = bit width b,
 * byte1 = n_exceptions e, ceil(n*b/8) packed low bits (little-endian
 * bit order), e uint8 exception positions, e LEB128 high parts.
 * n comes from block metadata; pfor blocks hold at most 255 values. */
static void pfor_decode(const uint8_t *p, int64_t n, int64_t *out) {
    int b = p[0], e = p[1];
    const uint8_t *pk = p + 2;
    int64_t plen = ((n * b) + 7) >> 3;
    if (b == 0) {
        for (int64_t i = 0; i < n; i++) out[i] = 0;
    } else {
        uint64_t buf = 0;
        int bits = 0;
        const uint8_t *pp = pk;
        uint64_t mask = (1ULL << b) - 1;   /* b <= 32 by construction */
        for (int64_t i = 0; i < n; i++) {
            while (bits < b) { buf |= ((uint64_t)*pp++) << bits; bits += 8; }
            out[i] = (int64_t)(buf & mask);
            buf >>= b;
            bits -= b;
        }
    }
    const uint8_t *xi = pk + plen;
    const uint8_t *xh = xi + e;
    for (int i = 0; i < e; i++) {
        uint64_t high = read_varint(&xh);
        out[xi[i]] = (int64_t)((uint64_t)out[xi[i]] | (high << b));
    }
}

static void load_block(SegIt *s, int64_t bi) {
    if (bi >= s->n_blocks) {
        s->cur_doc = DOC_INF;
        return;
    }
    s->bi = bi;
    int64_t n = s->ns[bi];
    const uint8_t *nr = s->norms_blob + s->norms_offs[bi];
    if (s->codec) {
        int64_t tfs[256];       /* pfor blocks hold <= 255 postings */
        pfor_decode(s->docs_blob + s->docs_offs[bi], n, s->docs);
        int64_t acc = 0;
        for (int64_t i = 0; i < n; i++) {
            acc += s->docs[i];
            s->docs[i] = acc;
        }
        pfor_decode(s->tfs_blob + s->tfs_offs[bi], n, tfs);
        if (s->n_dl) {
            for (int64_t i = 0; i < n; i++) {
                double tf = (double)tfs[i];
                s->scores[i] = s->idf
                    * (tf / (tf + exact_kd(s, s->docs[i])));
            }
        } else {
            for (int64_t i = 0; i < n; i++) {
                double tf = (double)tfs[i];
                s->scores[i] = s->idf * (tf / (tf + s->ktab[nr[i]]));
            }
        }
    } else {
        const uint8_t *p = s->docs_blob + s->docs_offs[bi];
        int64_t acc = 0;
        for (int64_t i = 0; i < n; i++) {
            acc += (int64_t)read_varint(&p);
            s->docs[i] = acc;
        }
        const uint8_t *q = s->tfs_blob + s->tfs_offs[bi];
        if (s->n_dl) {
            for (int64_t i = 0; i < n; i++) {
                double tf = (double)read_varint(&q);
                s->scores[i] = s->idf
                    * (tf / (tf + exact_kd(s, s->docs[i])));
            }
        } else {
            for (int64_t i = 0; i < n; i++) {
                double tf = (double)read_varint(&q);
                /* idf * (tf / (tf + K)) — same association as the Python
                   score path, so scores are BIT-identical to the
                   fallback */
                s->scores[i] = s->idf * (tf / (tf + s->ktab[nr[i]]));
            }
        }
    }
    s->n = n;
    s->cur_last = s->last_docs[bi];
    s->pi = 0;
    s->cur_doc = s->docs[0];
}

/* first block whose last_doc >= target */
static inline int64_t seek_block(const SegIt *s, int64_t target) {
    int64_t lo = 0, hi = s->n_blocks;
    while (lo < hi) {
        int64_t mid = (lo + hi) >> 1;
        if (s->last_docs[mid] < target) lo = mid + 1; else hi = mid;
    }
    return lo;
}

static void advance_to(SegIt *s, int64_t target) {
    if (s->cur_doc >= target) return;
    if (target > s->cur_last) {
        int64_t nbi = seek_block(s, target);
        if (nbi >= s->n_blocks) {
            s->cur_doc = DOC_INF;
            return;
        }
        load_block(s, nbi);
    }
    int64_t pi = s->pi, n = s->n;
    const int64_t *docs = s->docs;
    /* short linear scan, then binary */
    int lin = 0;
    while (lin < 8 && pi < n && docs[pi] < target) { pi++; lin++; }
    if (lin == 8) {
        int64_t lo = pi, hi = n;
        while (lo < hi) {
            int64_t mid = (lo + hi) >> 1;
            if (docs[mid] < target) lo = mid + 1; else hi = mid;
        }
        pi = lo;
    }
    s->pi = pi;
    s->cur_doc = docs[pi];   /* pi < n guaranteed: target <= cur_last */
}

static void it_next(SegIt *s) {
    int64_t pi = s->pi + 1;
    if (pi >= s->n) {
        load_block(s, s->bi + 1);
    } else {
        s->pi = pi;
        s->cur_doc = s->docs[pi];
    }
}

static inline double block_ub_for(const SegIt *s, int64_t doc) {
    if (doc <= s->cur_last) return s->block_ubs[s->bi];
    int64_t i = seek_block(s, doc);
    return i < s->n_blocks ? s->block_ubs[i] : 0.0;
}

static inline int64_t block_last_for(const SegIt *s, int64_t doc) {
    if (doc <= s->cur_last) return s->cur_last;
    int64_t i = seek_block(s, doc);
    return i < s->n_blocks ? s->last_docs[i] : DOC_INF;
}

/* Forward-only exclusion iterator over one negative-term segment —
 * decodes DOC IDS ONLY for blocks actually visited (skip-list seek),
 * the C mirror of engine._DocIter (AND-NOT negative-clause probes).
 * Probed at full evaluation just like the tombstone check; candidates
 * arrive ascending, so each negative list is walked at most once. */
typedef struct {
    const uint8_t *docs_blob;
    const int64_t *docs_offs;
    const int64_t *last_docs;
    const int64_t *ns;
    int64_t n_blocks;
    int codec;
    int64_t bi, pi, n, cur_doc, cur_last;
    int64_t *docs;
} ExclIt;

static void excl_load(ExclIt *s, int64_t bi) {
    s->bi = bi;
    int64_t n = s->ns[bi];
    if (s->codec) {
        pfor_decode(s->docs_blob + s->docs_offs[bi], n, s->docs);
        int64_t acc = 0;
        for (int64_t i = 0; i < n; i++) {
            acc += s->docs[i];
            s->docs[i] = acc;
        }
        goto loaded;
    }
    const uint8_t *p = s->docs_blob + s->docs_offs[bi];
    int64_t acc = 0;
    for (int64_t i = 0; i < n; i++) {
        acc += (int64_t)read_varint(&p);
        s->docs[i] = acc;
    }
loaded:;
    s->n = n;
    s->cur_last = s->last_docs[bi];
    s->pi = 0;
    s->cur_doc = s->docs[0];
}

static inline int excl_contains(ExclIt *s, int64_t target) {
    if (s->cur_doc >= target) return s->cur_doc == target;
    if (target > s->cur_last) {
        int64_t lo = 0, hi = s->n_blocks;
        while (lo < hi) {
            int64_t mid = (lo + hi) >> 1;
            if (s->last_docs[mid] < target) lo = mid + 1; else hi = mid;
        }
        if (lo >= s->n_blocks) {
            s->cur_doc = DOC_INF;
            return 0;
        }
        excl_load(s, lo);
        if (s->cur_doc >= target) return s->cur_doc == target;
    }
    int64_t lo = s->pi, hi = s->n;
    const int64_t *docs = s->docs;
    int lin = 0;
    while (lin < 8 && lo < hi && docs[lo] < target) { lo++; lin++; }
    if (lin == 8) {
        int64_t a = lo, b = hi;
        while (a < b) {
            int64_t mid = (a + b) >> 1;
            if (docs[mid] < target) a = mid + 1; else b = mid;
        }
        lo = a;
    }
    s->pi = lo;
    s->cur_doc = lo < s->n ? docs[lo] : s->cur_last;
    return s->cur_doc == target;
}

/* (score, -doc) lexicographic less-than: the Python heap entry order */
static inline int entry_lt(double sa, int64_t da, double sb, int64_t db) {
    if (sa != sb) return sa < sb;
    return -da < -db;
}

static inline int tomb_contains(const int64_t *t, int64_t n, int64_t d) {
    int64_t lo = 0, hi = n;
    while (lo < hi) {
        int64_t mid = (lo + hi) >> 1;
        if (t[mid] < d) lo = mid + 1; else hi = mid;
    }
    return lo < n && t[lo] == d;
}

int64_t wand_topk(
    int64_t n_iters,
    const uint8_t **docs_blob, const int64_t **docs_offs,
    const uint8_t **tfs_blob, const int64_t **tfs_offs,
    const uint8_t **norms_blob, const int64_t **norms_offs,
    const int64_t **last_docs, const double **block_ubs,
    const int64_t **ns, const int64_t *n_blocks,
    const double *idfs, const double *max_scores,
    const double *ktab, int64_t codec_id,
    const int64_t *dl_keys, const double *dl_kd, int64_t n_dl,
    const int64_t *tombstones, int64_t n_tombstones,
    const uint8_t **ex_docs_blob, const int64_t **ex_docs_offs,
    const int64_t **ex_last_docs, const int64_t **ex_ns,
    const int64_t *ex_n_blocks, int64_t n_excl, int64_t ex_max_n,
    int64_t max_n, int64_t k,
    int64_t *out_docs, double *out_scores)
{
    if (n_iters <= 0 || k <= 0) return 0;
    SegIt *its = calloc(n_iters, sizeof(SegIt));
    int64_t *dbuf = malloc(n_iters * max_n * sizeof(int64_t));
    double *sbuf = malloc(n_iters * max_n * sizeof(double));
    SegIt **live = malloc(n_iters * sizeof(SegIt *));
    double *hs = malloc(k * sizeof(double));
    int64_t *hd = malloc(k * sizeof(int64_t));
    ExclIt *exs = n_excl > 0 ? calloc(n_excl, sizeof(ExclIt)) : NULL;
    int64_t *exbuf = n_excl > 0
        ? malloc(n_excl * ex_max_n * sizeof(int64_t)) : NULL;
    if (!its || !dbuf || !sbuf || !live || !hs || !hd
        || (n_excl > 0 && (!exs || !exbuf))) {
        free(its); free(dbuf); free(sbuf); free(live);
        free(hs); free(hd); free(exs); free(exbuf);
        return -1;
    }
    for (int64_t i = 0; i < n_excl; i++) {
        ExclIt *e = &exs[i];
        e->docs_blob = ex_docs_blob[i];
        e->docs_offs = ex_docs_offs[i];
        e->last_docs = ex_last_docs[i];
        e->ns = ex_ns[i];
        e->n_blocks = ex_n_blocks[i];
        e->bi = -1; e->pi = 0; e->n = 0;
        e->codec = (int)codec_id;
        e->cur_last = -1;
        e->cur_doc = e->n_blocks ? -1 : DOC_INF;
        e->docs = exbuf + i * ex_max_n;
    }
    int err = 0;
    int64_t n_live = 0;
    for (int64_t i = 0; i < n_iters; i++) {
        SegIt *s = &its[i];
        s->dl_keys = dl_keys;
        s->dl_kd = dl_kd;
        s->n_dl = n_dl;
        s->err = &err;
        s->docs_blob = docs_blob[i];
        s->docs_offs = docs_offs[i];
        s->tfs_blob = tfs_blob[i];
        s->tfs_offs = tfs_offs[i];
        s->norms_blob = norms_blob[i];
        s->norms_offs = norms_offs[i];
        s->last_docs = last_docs[i];
        s->block_ubs = block_ubs[i];
        s->ns = ns[i];
        s->n_blocks = n_blocks[i];
        s->idf = idfs[i];
        s->max_score = max_scores[i];
        s->ktab = ktab;
        s->codec = (int)codec_id;
        s->docs = dbuf + i * max_n;
        s->scores = sbuf + i * max_n;
        load_block(s, 0);
        if (s->cur_doc != DOC_INF)
            live[n_live++] = s;
    }
    /* insertion sort by cur_doc (matches Python's sorted-by-_CURDOC) */
    for (int64_t i = 1; i < n_live; i++) {
        SegIt *x = live[i];
        int64_t j = i - 1;
        while (j >= 0 && live[j]->cur_doc > x->cur_doc) {
            live[j + 1] = live[j];
            j--;
        }
        live[j + 1] = x;
    }
    int64_t heap_n = 0;

    while (n_live > 0 && !err) {
        double th = heap_n == k ? hs[0] : -1.0;
        double acc = 0.0;
        int64_t pivot_idx = -1;
        for (int64_t i = 0; i < n_live; i++) {
            acc += live[i]->max_score;
            if (acc >= th) { pivot_idx = i; break; }
        }
        if (pivot_idx < 0) break;
        int64_t pivot_doc = live[pivot_idx]->cur_doc;
        while (pivot_idx + 1 < n_live
               && live[pivot_idx + 1]->cur_doc == pivot_doc)
            pivot_idx++;
        /* block-max refinement (shallow) */
        double ub = 0.0;
        for (int64_t i = 0; i <= pivot_idx; i++)
            ub += block_ub_for(live[i], pivot_doc);
        if (heap_n == k && ub < th) {
            int64_t d = DOC_INF;
            for (int64_t i = 0; i <= pivot_idx; i++) {
                int64_t bl = block_last_for(live[i], pivot_doc);
                if (bl < d) d = bl;
            }
            if (d != DOC_INF) d += 1;
            if (pivot_idx + 1 < n_live
                && live[pivot_idx + 1]->cur_doc < d)
                d = live[pivot_idx + 1]->cur_doc;
            if (live[0]->cur_doc + 1 > d)
                d = live[0]->cur_doc + 1;
            int64_t j = pivot_idx + 1;
            while (j > 0 && live[j - 1]->cur_doc >= d) j--;
            /* advance the prefix [0, j), drop dead, re-merge sorted */
            int64_t w = 0;
            SegIt **moved = live;           /* reuse prefix in place */
            for (int64_t i = 0; i < j; i++) {
                advance_to(live[i], d);
                if (live[i]->cur_doc != DOC_INF)
                    moved[w++] = live[i];
            }
            /* moved[0..w) unsorted? advance_to(d) on all: cur_doc >= d,
               may differ between iterators — sort then merge with the
               still-sorted suffix live[j..n_live) */
            for (int64_t i = 1; i < w; i++) {
                SegIt *x = moved[i];
                int64_t p = i - 1;
                while (p >= 0 && moved[p]->cur_doc > x->cur_doc) {
                    moved[p + 1] = moved[p];
                    p--;
                }
                moved[p + 1] = x;
            }
            /* merge in place into a scratch-free rotation: copy prefix
               out, then standard two-way merge */
            if (w > 0 && j < n_live) {
                SegIt **tmp = malloc(w * sizeof(SegIt *));
                if (!tmp) { free(its); free(dbuf); free(sbuf);
                            free(live); free(hs); free(hd);
                            free(exs); free(exbuf); return -1; }
                memcpy(tmp, moved, w * sizeof(SegIt *));
                int64_t a = 0, b = j, o = 0;
                while (a < w && b < n_live) {
                    if (tmp[a]->cur_doc <= live[b]->cur_doc)
                        live[o++] = tmp[a++];
                    else
                        live[o++] = live[b++];
                }
                while (a < w) live[o++] = tmp[a++];
                while (b < n_live) live[o++] = live[b++];
                n_live = o;
                free(tmp);
            } else if (j < n_live) {
                memmove(live, live + j,
                        (n_live - j) * sizeof(SegIt *));
                n_live -= j;
            } else {
                n_live = w;
            }
            continue;
        }
        if (live[0]->cur_doc == pivot_doc) {
            /* full evaluation — sum in CREATION order (its[] is
               contiguous, so pointer order == creation order), the
               same canonical float association as the Python loop */
            int skip = tomb_contains(tombstones, n_tombstones, pivot_doc);
            for (int64_t e = 0; !skip && e < n_excl; e++)
                if (excl_contains(&exs[e], pivot_doc)) skip = 1;
            if (!skip) {
                double score = 0.0;
                for (SegIt *s = its; s < its + n_iters; s++) {
                    for (int64_t i = 0; i <= pivot_idx; i++) {
                        if (live[i] == s) {
                            score += s->scores[s->pi];
                            break;
                        }
                    }
                }
                if (heap_n < k) {
                    /* sift up */
                    int64_t c = heap_n++;
                    hs[c] = score;
                    hd[c] = pivot_doc;
                    while (c > 0) {
                        int64_t par = (c - 1) >> 1;
                        if (entry_lt(hs[c], hd[c], hs[par], hd[par])) {
                            double ts = hs[c]; hs[c] = hs[par]; hs[par] = ts;
                            int64_t td = hd[c]; hd[c] = hd[par]; hd[par] = td;
                            c = par;
                        } else break;
                    }
                } else if (entry_lt(hs[0], hd[0], score, pivot_doc)) {
                    hs[0] = score;
                    hd[0] = pivot_doc;
                    int64_t c = 0;
                    for (;;) {
                        int64_t l = 2 * c + 1, r = l + 1, m = c;
                        if (l < k && entry_lt(hs[l], hd[l], hs[m], hd[m]))
                            m = l;
                        if (r < k && entry_lt(hs[r], hd[r], hs[m], hd[m]))
                            m = r;
                        if (m == c) break;
                        double ts = hs[c]; hs[c] = hs[m]; hs[m] = ts;
                        int64_t td = hd[c]; hd[c] = hd[m]; hd[m] = td;
                        c = m;
                    }
                }
            }
            int64_t j = pivot_idx + 1;
            int64_t w = 0;
            for (int64_t i = 0; i < j; i++) {
                it_next(live[i]);
                if (live[i]->cur_doc != DOC_INF)
                    live[w++] = live[i];
            }
            for (int64_t i = 1; i < w; i++) {
                SegIt *x = live[i];
                int64_t p = i - 1;
                while (p >= 0 && live[p]->cur_doc > x->cur_doc) {
                    live[p + 1] = live[p];
                    p--;
                }
                live[p + 1] = x;
            }
            if (j < n_live) {
                SegIt **tmp = malloc((w > 0 ? w : 1) * sizeof(SegIt *));
                if (!tmp) { free(its); free(dbuf); free(sbuf);
                            free(live); free(hs); free(hd);
                            free(exs); free(exbuf); return -1; }
                memcpy(tmp, live, w * sizeof(SegIt *));
                int64_t a = 0, b = j, o = 0;
                while (a < w && b < n_live) {
                    if (tmp[a]->cur_doc <= live[b]->cur_doc)
                        live[o++] = tmp[a++];
                    else
                        live[o++] = live[b++];
                }
                while (a < w) live[o++] = tmp[a++];
                while (b < n_live) live[o++] = live[b++];
                n_live = o;
                free(tmp);
            } else {
                n_live = w;
            }
        } else {
            /* advance the lagging iterator with the largest bound */
            int64_t lag_i = 0;
            for (int64_t i = 1; i <= pivot_idx; i++) {
                if (live[i]->cur_doc >= pivot_doc) break;
                if (live[i]->max_score > live[lag_i]->max_score)
                    lag_i = i;
            }
            SegIt *lag = live[lag_i];
            memmove(live + lag_i, live + lag_i + 1,
                    (n_live - lag_i - 1) * sizeof(SegIt *));
            n_live--;
            advance_to(lag, pivot_doc);
            if (lag->cur_doc != DOC_INF) {
                /* bisect insort */
                int64_t lo = 0, hi = n_live;
                while (lo < hi) {
                    int64_t mid = (lo + hi) >> 1;
                    if (live[mid]->cur_doc < lag->cur_doc)
                        lo = mid + 1;
                    else
                        hi = mid;
                }
                memmove(live + lo + 1, live + lo,
                        (n_live - lo) * sizeof(SegIt *));
                live[lo] = lag;
                n_live++;
            }
        }
    }
    if (err) {   /* exact-dl table miss: results unusable -> fallback */
        free(its); free(dbuf); free(sbuf); free(live); free(hs);
        free(hd); free(exs); free(exbuf);
        return -2;
    }
    /* drain the heap: ascending pops give (score asc, -doc asc);
       emit reversed → score desc, doc asc (the Python sort order) */
    int64_t n_out = heap_n;
    for (int64_t i = n_out - 1; i >= 0; i--) {
        out_scores[i] = hs[0];
        out_docs[i] = hd[0];
        heap_n--;
        hs[0] = hs[heap_n];
        hd[0] = hd[heap_n];
        int64_t c = 0;
        for (;;) {
            int64_t l = 2 * c + 1, r = l + 1, m = c;
            if (l < heap_n && entry_lt(hs[l], hd[l], hs[m], hd[m]))
                m = l;
            if (r < heap_n && entry_lt(hs[r], hd[r], hs[m], hd[m]))
                m = r;
            if (m == c) break;
            double ts = hs[c]; hs[c] = hs[m]; hs[m] = ts;
            int64_t td = hd[c]; hd[c] = hd[m]; hd[m] = td;
            c = m;
        }
    }
    free(its); free(dbuf); free(sbuf); free(live); free(hs); free(hd);
    free(exs); free(exbuf);
    return n_out;
}

/* ---- batch string hashing ------------------------------------------------
 *
 * Two 64-bit string hashes the Python side otherwise computes in
 * per-string hashlib loops (the hottest remaining Python loops, r4
 * VERDICT item 3):
 *
 *   md5_low64_batch:  low 8 bytes of MD5 (RFC 1321), little-endian —
 *                     EXACTLY DuckDB's md5_number_lower (the
 *                     oracle-reproducibility primitive).
 *   blake2b64_batch:  BLAKE2b with digest_size=8 (RFC 7693), read
 *                     big-endian and masked to 63 bits — EXACTLY
 *                     stages/tokenize.hash64 (the doc-id primitive).
 *
 * Input: one concatenated UTF-8 buffer + int64 offsets (a zero-copy
 * view of an Arrow large_utf8 column); output one uint64 per string.
 * Both implementations are written from the public RFC specs.
 */

/* ---- MD5 (RFC 1321) ---- */

static const uint32_t md5_k[64] = {
    0xd76aa478u, 0xe8c7b756u, 0x242070dbu, 0xc1bdceeeu,
    0xf57c0fafu, 0x4787c62au, 0xa8304613u, 0xfd469501u,
    0x698098d8u, 0x8b44f7afu, 0xffff5bb1u, 0x895cd7beu,
    0x6b901122u, 0xfd987193u, 0xa679438eu, 0x49b40821u,
    0xf61e2562u, 0xc040b340u, 0x265e5a51u, 0xe9b6c7aau,
    0xd62f105du, 0x02441453u, 0xd8a1e681u, 0xe7d3fbc8u,
    0x21e1cde6u, 0xc33707d6u, 0xf4d50d87u, 0x455a14edu,
    0xa9e3e905u, 0xfcefa3f8u, 0x676f02d9u, 0x8d2a4c8au,
    0xfffa3942u, 0x8771f681u, 0x6d9d6122u, 0xfde5380cu,
    0xa4beea44u, 0x4bdecfa9u, 0xf6bb4b60u, 0xbebfbc70u,
    0x289b7ec6u, 0xeaa127fau, 0xd4ef3085u, 0x04881d05u,
    0xd9d4d039u, 0xe6db99e5u, 0x1fa27cf8u, 0xc4ac5665u,
    0xf4292244u, 0x432aff97u, 0xab9423a7u, 0xfc93a039u,
    0x655b59c3u, 0x8f0ccc92u, 0xffeff47du, 0x85845dd1u,
    0x6fa87e4fu, 0xfe2ce6e0u, 0xa3014314u, 0x4e0811a1u,
    0xf7537e82u, 0xbd3af235u, 0x2ad7d2bbu, 0xeb86d391u };

static const uint8_t md5_r[64] = {
    7, 12, 17, 22, 7, 12, 17, 22, 7, 12, 17, 22, 7, 12, 17, 22,
    5,  9, 14, 20, 5,  9, 14, 20, 5,  9, 14, 20, 5,  9, 14, 20,
    4, 11, 16, 23, 4, 11, 16, 23, 4, 11, 16, 23, 4, 11, 16, 23,
    6, 10, 15, 21, 6, 10, 15, 21, 6, 10, 15, 21, 6, 10, 15, 21 };

static inline uint32_t md5_rotl(uint32_t x, uint8_t c) {
    return (x << c) | (x >> (32 - c));
}

static void md5_block(uint32_t h[4], const uint8_t *p) {
    uint32_t m[16];
    for (int i = 0; i < 16; i++)
        m[i] = (uint32_t)p[4 * i] | ((uint32_t)p[4 * i + 1] << 8) |
               ((uint32_t)p[4 * i + 2] << 16) |
               ((uint32_t)p[4 * i + 3] << 24);
    uint32_t a = h[0], b = h[1], c = h[2], d = h[3];
    for (int i = 0; i < 64; i++) {
        uint32_t f; int g;
        if (i < 16)      { f = (b & c) | (~b & d);  g = i; }
        else if (i < 32) { f = (d & b) | (~d & c);  g = (5 * i + 1) & 15; }
        else if (i < 48) { f = b ^ c ^ d;           g = (3 * i + 5) & 15; }
        else             { f = c ^ (b | ~d);        g = (7 * i) & 15; }
        uint32_t tmp = d;
        d = c; c = b;
        b = b + md5_rotl(a + f + md5_k[i] + m[g], md5_r[i]);
        a = tmp;
    }
    h[0] += a; h[1] += b; h[2] += c; h[3] += d;
}

static void md5_digest_state(const uint8_t *msg, int64_t len,
                             uint32_t h[4]) {
    h[0] = 0x67452301u; h[1] = 0xefcdab89u;
    h[2] = 0x98badcfeu; h[3] = 0x10325476u;
    int64_t full = len / 64;
    for (int64_t i = 0; i < full; i++) md5_block(h, msg + i * 64);
    uint8_t tail[128];
    int64_t rem = len - full * 64;
    memcpy(tail, msg + full * 64, (size_t)rem);
    tail[rem] = 0x80;
    int tlen = (rem < 56) ? 64 : 128;
    memset(tail + rem + 1, 0, (size_t)(tlen - rem - 1));
    uint64_t bits = (uint64_t)len * 8;
    for (int i = 0; i < 8; i++)
        tail[tlen - 8 + i] = (uint8_t)(bits >> (8 * i));
    md5_block(h, tail);
    if (tlen == 128) md5_block(h, tail + 64);
}

static inline uint32_t bswap32u(uint32_t x) {
    return (x >> 24) | ((x >> 8) & 0xFF00u) |
           ((x << 8) & 0xFF0000u) | (x << 24);
}

void md5_low64_batch(const uint8_t *data, const int64_t *offsets,
                     int64_t n, uint64_t *out) {
    uint32_t h[4];
    for (int64_t i = 0; i < n; i++) {
        md5_digest_state(data + offsets[i],
                         offsets[i + 1] - offsets[i], h);
        /* digest bytes 8..16 little-endian == (d << 32) | c */
        out[i] = ((uint64_t)h[3] << 32) | (uint64_t)h[2];
    }
}

void md5_high64be_batch(const uint8_t *data, const int64_t *offsets,
                        int64_t n, uint64_t *out) {
    uint32_t h[4];
    for (int64_t i = 0; i < n; i++) {
        md5_digest_state(data + offsets[i],
                         offsets[i + 1] - offsets[i], h);
        /* digest bytes 0..8 read BIG-endian */
        out[i] = ((uint64_t)bswap32u(h[0]) << 32)
                 | (uint64_t)bswap32u(h[1]);
    }
}

/* ---- BLAKE2b, digest_size = 8, no key (RFC 7693) ---- */

static const uint64_t b2b_iv[8] = {
    0x6a09e667f3bcc908ULL, 0xbb67ae8584caa73bULL,
    0x3c6ef372fe94f82bULL, 0xa54ff53a5f1d36f1ULL,
    0x510e527fade682d1ULL, 0x9b05688c2b3e6c1fULL,
    0x1f83d9abfb41bd6bULL, 0x5be0cd19137e2179ULL };

static const uint8_t b2b_sigma[12][16] = {
    { 0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15},
    {14, 10, 4, 8, 9, 15, 13, 6, 1, 12, 0, 2, 11, 7, 5, 3},
    {11, 8, 12, 0, 5, 2, 15, 13, 10, 14, 3, 6, 7, 1, 9, 4},
    { 7, 9, 3, 1, 13, 12, 11, 14, 2, 6, 5, 10, 4, 0, 15, 8},
    { 9, 0, 5, 7, 2, 4, 10, 15, 14, 1, 11, 12, 6, 8, 3, 13},
    { 2, 12, 6, 10, 0, 11, 8, 3, 4, 13, 7, 5, 15, 14, 1, 9},
    {12, 5, 1, 15, 14, 13, 4, 10, 0, 7, 6, 3, 9, 2, 8, 11},
    {13, 11, 7, 14, 12, 1, 3, 9, 5, 0, 15, 4, 8, 6, 2, 10},
    { 6, 15, 14, 9, 11, 3, 0, 8, 12, 2, 13, 7, 1, 4, 10, 5},
    {10, 2, 8, 4, 7, 6, 1, 5, 15, 11, 9, 14, 3, 12, 13, 0},
    { 0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15},
    {14, 10, 4, 8, 9, 15, 13, 6, 1, 12, 0, 2, 11, 7, 5, 3} };

static inline uint64_t b2b_rotr(uint64_t x, int c) {
    return (x >> c) | (x << (64 - c));
}

#define B2B_G(a, b, c, d, x, y)                  \
    do {                                         \
        v[a] = v[a] + v[b] + (x);                \
        v[d] = b2b_rotr(v[d] ^ v[a], 32);        \
        v[c] = v[c] + v[d];                      \
        v[b] = b2b_rotr(v[b] ^ v[c], 24);        \
        v[a] = v[a] + v[b] + (y);                \
        v[d] = b2b_rotr(v[d] ^ v[a], 16);        \
        v[c] = v[c] + v[d];                      \
        v[b] = b2b_rotr(v[b] ^ v[c], 63);        \
    } while (0)

static void b2b_compress(uint64_t h[8], const uint8_t *p,
                         uint64_t t, int last) {
    uint64_t v[16], m[16];
    for (int i = 0; i < 8; i++) { v[i] = h[i]; v[i + 8] = b2b_iv[i]; }
    v[12] ^= t;                 /* t_hi stays 0: offsets < 2^64 */
    if (last) v[14] = ~v[14];
    for (int i = 0; i < 16; i++) {
        uint64_t w = 0;
        for (int j = 7; j >= 0; j--)
            w = (w << 8) | p[8 * i + j];
        m[i] = w;
    }
    for (int r = 0; r < 12; r++) {
        const uint8_t *s = b2b_sigma[r];
        B2B_G(0, 4,  8, 12, m[s[0]],  m[s[1]]);
        B2B_G(1, 5,  9, 13, m[s[2]],  m[s[3]]);
        B2B_G(2, 6, 10, 14, m[s[4]],  m[s[5]]);
        B2B_G(3, 7, 11, 15, m[s[6]],  m[s[7]]);
        B2B_G(0, 5, 10, 15, m[s[8]],  m[s[9]]);
        B2B_G(1, 6, 11, 12, m[s[10]], m[s[11]]);
        B2B_G(2, 7,  8, 13, m[s[12]], m[s[13]]);
        B2B_G(3, 4,  9, 14, m[s[14]], m[s[15]]);
    }
    for (int i = 0; i < 8; i++) h[i] ^= v[i] ^ v[i + 8];
}

static uint64_t blake2b64_one(const uint8_t *msg, int64_t len) {
    uint64_t h[8];
    memcpy(h, b2b_iv, sizeof h);
    h[0] ^= 0x01010008ULL;      /* digest_len=8, fanout=1, depth=1 */
    uint64_t t = 0;
    while (len > 128) {
        t += 128;
        b2b_compress(h, msg, t, 0);
        msg += 128; len -= 128;
    }
    uint8_t block[128];
    memset(block, 0, sizeof block);
    memcpy(block, msg, (size_t)len);
    b2b_compress(h, block, t + (uint64_t)len, 1);
    /* digest = LE bytes of h[0], read back BIG-endian (callers mask
     * or shift: hash64 = >>0 & 2^63-1, shingle hashes = >>1 / >>3) */
    uint64_t x = h[0];
    x = ((x & 0x00000000FFFFFFFFULL) << 32) | (x >> 32);
    x = ((x & 0x0000FFFF0000FFFFULL) << 16) |
        ((x >> 16) & 0x0000FFFF0000FFFFULL);
    x = ((x & 0x00FF00FF00FF00FFULL) << 8) |
        ((x >> 8) & 0x00FF00FF00FF00FFULL);
    return x;
}

void blake2b64_batch(const uint8_t *data, const int64_t *offsets,
                     int64_t n, uint64_t *out) {
    for (int64_t i = 0; i < n; i++)
        out[i] = blake2b64_one(data + offsets[i],
                               offsets[i + 1] - offsets[i]);
}
