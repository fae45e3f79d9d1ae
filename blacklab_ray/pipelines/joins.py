"""Temporal joins: distributed as-of join and interval (range) join.

Neither exists in Ray Data's Dataset API; both are classic
stream/event-table operators (the reference's result-set layer has no
analogue — these serve the events/orders side of the corpus the same
way windows.py does). Both follow this repo's established
co-partition shape: hash both sides' keys to ``part = h(key) % P``,
``union`` the two sides under ONE schema (null-padded payloads),
``groupby("part").map_groups`` once, and do the whole partition's
work in a single vectorized numpy pass — one Python UDF call per
partition, never per key (the per-group shape dies at web-scale key
counts; see windows.sessionize and dedup.verify_jaccard_pairs).

Scale notes:
- ``asof_join`` shuffles each side exactly once on the join key; the
  per-partition merge is O((n_l + n_r) log) from one lexsort. Skewed
  keys land one partition-sized task — same exposure as any keyed
  groupby; salt upstream if one key dominates.
- ``interval_join`` replicates each interval to every time bucket it
  overlaps (``flat_map``) and each probe to its single bucket, then
  co-partitions on hash(key, bucket). A pair is emitted only in the
  probe's bucket, so output is exactly-once with no dedup pass. Long
  intervals fan out to many buckets — pick ``bucket_s`` near the
  typical interval length (the published bucketed range-join trade).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from blacklab_ray.util import part_of


def _part_of(keys: np.ndarray, num_partitions: int) -> np.ndarray:
    return part_of(keys, num_partitions)


def _arrow_schema(ds: ray.data.Dataset) -> pa.Schema:
    """Dataset schema as Arrow, whatever the block format."""
    s = ds.schema()
    base = getattr(s, "base_schema", None)
    if isinstance(base, pa.Schema):
        return base
    types = [t if isinstance(t, pa.DataType)
             else pa.from_numpy_dtype(np.dtype(t)) for t in s.types]
    return pa.schema(list(zip(s.names, types)))


def _ts_i64(col: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """Timestamp/date/int column → int64 numpy, ALWAYS in microseconds
    for temporal types — date32 casts through timestamp so a
    date-valued side lines up with a timestamp-valued side instead of
    comparing days against microseconds."""
    if pa.types.is_date(col.type):
        col = col.cast(pa.timestamp("us"))
    if pa.types.is_timestamp(col.type):
        col = col.cast(pa.timestamp("us"))
    return col.cast(pa.int64()).to_numpy(zero_copy_only=False)


def asof_join(left: ray.data.Dataset, right: ray.data.Dataset,
              left_key: str, right_key: str,
              left_ts: str, right_ts: str,
              left_cols: list[str], right_cols: list[str],
              direction: str = "backward",
              allow_exact: bool = True,
              tolerance_us: int | None = None,
              right_tie_col: str | None = None,
              how: str = "left",
              num_partitions: int = 32) -> ray.data.Dataset:
    """Distributed as-of join (pandas ``merge_asof`` semantics).

    For every left row, find THE ONE right row with the same key and
    the greatest ``right_ts`` <= ``left_ts`` (``direction="backward"``;
    ``"forward"`` mirrors to the least right_ts >= left_ts). Ties on
    (key, right_ts) break to the greatest ``right_tie_col`` value
    (deterministic — callers that can see ties MUST pass one).
    ``tolerance_us`` bounds |left_ts - right_ts|. ``how="left"`` keeps
    unmatched left rows with null right payload; ``"inner"`` drops
    them.

    Shape: one key-hash shuffle per side, then a single merged lexsort
    per partition with a vectorized forward-fill of "last right row
    seen" — no per-key loop, no per-row search. Right rows whose fill
    crosses a key boundary are invalidated by a key-equality mask, so
    the fill needs no per-key reset."""
    if direction not in ("backward", "forward"):
        raise ValueError(f"unknown direction: {direction}")
    if how not in ("left", "inner"):
        raise ValueError(f"unknown how: {how}")
    P = num_partitions
    sign = 1 if direction == "backward" else -1

    l_schema = _arrow_schema(left)
    r_schema = _arrow_schema(right)
    lpay = [(f"l_{c}", l_schema.field(c).type) for c in left_cols]
    rpay = [(f"r_{c}", r_schema.field(c).type) for c in right_cols]
    union_schema = pa.schema(
        [("part", pa.int64()), ("side", pa.int8()),
         ("k", pa.int64()), ("t", pa.int64()), ("tie", pa.int64())]
        + lpay + rpay)

    def _prep(side: int, key: str, ts: str, cols: list[str],
              prefix: str, tie: str | None):
        def _m(batch: pa.Table) -> pa.Table:
            n = batch.num_rows
            if n == 0:
                return union_schema.empty_table()
            k = batch.column(key).cast(pa.int64()).to_numpy(
                zero_copy_only=False)
            t = sign * _ts_i64(batch.column(ts))
            tiev = (batch.column(tie).cast(pa.int64())
                    if tie else pa.nulls(n, pa.int64()))
            arrays = [pa.array(_part_of(k, P), pa.int64()),
                      pa.array(np.full(n, side, np.int8)),
                      pa.array(k, pa.int64()), pa.array(t, pa.int64()),
                      tiev]
            for name, typ in lpay + rpay:
                own = name.startswith(prefix)
                arrays.append(batch.column(name[2:]).cast(typ)
                              .combine_chunks()
                              if own else pa.nulls(n, typ))
            return pa.Table.from_arrays(arrays,
                                        schema=union_schema)
        return _m

    l_tag = left.select_columns(
        sorted({left_key, left_ts, *left_cols})).map_batches(
        _prep(1, left_key, left_ts, left_cols, "l_", None),
        batch_format="pyarrow")
    r_tag = right.select_columns(
        sorted({right_key, right_ts, *right_cols}
               | ({right_tie_col} if right_tie_col else set()))
    ).map_batches(
        _prep(0, right_key, right_ts, right_cols, "r_", right_tie_col),
        batch_format="pyarrow")

    out_schema = pa.schema(lpay + rpay)
    # right sorts before left at equal ts iff exact matches count
    r_rank, l_rank = (0, 1) if allow_exact else (1, 0)

    def _merge(g: pa.Table) -> pa.Table:
        if g.num_rows == 0 or "side" not in g.column_names:
            return out_schema.empty_table()
        side = g.column("side").to_numpy(zero_copy_only=False)
        k = g.column("k").to_numpy(zero_copy_only=False)
        t = g.column("t").to_numpy(zero_copy_only=False)
        tie = g.column("tie").fill_null(0).to_numpy(
            zero_copy_only=False)
        is_r = side == 0
        rank = np.where(is_r, r_rank, l_rank)
        # at equal (k, t): rank separates the sides (right before left
        # iff allow_exact), then ties resolve LAST-wins inside the
        # right run — ascending tie, the fill keeps the max
        order = np.lexsort((tie, rank, t, k))
        ks, ts_, rs = k[order], t[order], is_r[order]
        gidx = order  # position in g
        filled = np.where(rs, np.arange(order.size), -1)
        filled = np.maximum.accumulate(filled)
        li = np.flatnonzero(~rs)           # left rows, merged order
        m = filled[li]                      # merged pos of matched right
        ok = m >= 0
        ok[ok] &= ks[m[ok]] == ks[li[ok]]
        if tolerance_us is not None:
            sel = np.flatnonzero(ok)
            far = (ts_[li[sel]] - ts_[m[sel]]) > tolerance_us
            ok[sel[far]] = False
        l_rows = gidx[li]                   # rows in g
        r_rows = np.where(ok, gidx[np.where(ok, m, 0)], -1)
        if how == "inner":
            keep = r_rows >= 0
            l_rows, r_rows = l_rows[keep], r_rows[keep]
        cols = []
        for name, _ in lpay:
            cols.append(g.column(name).take(pa.array(l_rows)))
        r_take = pa.array(np.where(r_rows >= 0, r_rows, 0),
                          pa.int64(),
                          mask=r_rows < 0)  # null index → null value
        for name, _ in rpay:
            cols.append(g.column(name).take(r_take))
        return pa.Table.from_arrays(cols, schema=out_schema)

    joined = l_tag.union(r_tag).groupby("part").map_groups(
        _merge, batch_format="pyarrow")
    rename = {f"l_{c}": c for c in left_cols}
    rename.update({f"r_{c}": (f"{c}_r" if c in left_cols else c)
                   for c in right_cols})
    return joined.map_batches(
        lambda t: t.rename_columns([rename[c] for c in t.column_names]),
        batch_format="pyarrow")


def interval_join(probe: ray.data.Dataset, intervals: ray.data.Dataset,
                  probe_key: str, interval_key: str,
                  ts_col: str, start_col: str, end_col: str,
                  probe_cols: list[str], interval_cols: list[str],
                  bucket_s: int = 86400,
                  num_partitions: int = 32) -> ray.data.Dataset:
    """Range join: all (probe, interval) pairs with equal keys and
    ``start <= ts < end`` (half-open, the windows.py convention).

    Bucketed exactly-once shape: intervals replicate to every
    ``bucket_s``-wide time bucket they overlap; probes go to their
    single bucket; co-partition on hash(key, bucket); each partition
    matches with one lexsort + grouped-searchsorted pass. A pair can
    only meet in the probe's bucket → no duplicate emission."""
    P = num_partitions
    bucket_us = int(bucket_s) * 1_000_000

    p_schema = _arrow_schema(probe)
    i_schema = _arrow_schema(intervals)
    ppay = [(f"p_{c}", p_schema.field(c).type) for c in probe_cols]
    ipay = [(f"i_{c}", i_schema.field(c).type) for c in interval_cols]
    union_schema = pa.schema(
        [("part", pa.int64()), ("side", pa.int8()),
         ("k", pa.int64()), ("b", pa.int64()),
         ("t", pa.int64()), ("e", pa.int64())] + ppay + ipay)

    def _pad(n: int, own: list, names_own: set) -> list:
        out = []
        for name, typ in ppay + ipay:
            out.append(own[name] if name in names_own
                       else pa.nulls(n, typ))
        return out

    def _probe_m(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if n == 0:
            return union_schema.empty_table()
        k = batch.column(probe_key).cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        t = _ts_i64(batch.column(ts_col))
        b = t // bucket_us
        own = {f"p_{c}": batch.column(c).combine_chunks()
               for c in probe_cols}
        arrays = [pa.array(_part_of(k * np.int64(31) + b, P)),
                  pa.array(np.zeros(n, np.int8)),
                  pa.array(k), pa.array(b), pa.array(t),
                  pa.nulls(n, pa.int64())] + _pad(n, own, set(own))
        return pa.Table.from_arrays(arrays, schema=union_schema)

    def _intv_m(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if n == 0:
            return union_schema.empty_table()
        k = batch.column(interval_key).cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        s = _ts_i64(batch.column(start_col))
        e = _ts_i64(batch.column(end_col))
        b0 = s // bucket_us
        b1 = np.maximum(b0, (e - 1) // bucket_us)  # end exclusive
        reps = (b1 - b0 + 1).astype(np.int64)
        idx = np.repeat(np.arange(n), reps)
        off = np.arange(reps.sum(), dtype=np.int64) - np.repeat(
            np.cumsum(reps) - reps, reps)
        b = b0[idx] + off
        kk = k[idx]
        m = idx.size
        take = pa.array(idx, pa.int64())
        own = {f"i_{c}": batch.column(c).take(take).combine_chunks()
               for c in interval_cols}
        arrays = [pa.array(_part_of(kk * np.int64(31) + b, P)),
                  pa.array(np.ones(m, np.int8)),
                  pa.array(kk), pa.array(b),
                  pa.array(s[idx]), pa.array(e[idx])] \
            + _pad(m, own, set(own))
        return pa.Table.from_arrays(arrays, schema=union_schema)

    p_tag = probe.select_columns(
        sorted({probe_key, ts_col, *probe_cols})).map_batches(
        _probe_m, batch_format="pyarrow")
    i_tag = intervals.select_columns(
        sorted({interval_key, start_col, end_col, *interval_cols})
    ).map_batches(_intv_m, batch_format="pyarrow")

    out_schema = pa.schema(ppay + ipay)

    def _match(g: pa.Table) -> pa.Table:
        if g.num_rows == 0 or "side" not in g.column_names:
            return out_schema.empty_table()
        side = g.column("side").to_numpy(zero_copy_only=False)
        k = g.column("k").to_numpy(zero_copy_only=False)
        b = g.column("b").to_numpy(zero_copy_only=False)
        t = g.column("t").to_numpy(zero_copy_only=False)
        e = g.column("e").fill_null(0).to_numpy(zero_copy_only=False)
        is_i = side == 1
        # dense-code the (k, b) groups present in this partition
        kb = np.stack([k, b], axis=1)
        _, codes = np.unique(kb, axis=0, return_inverse=True)
        iv = np.flatnonzero(is_i)
        pv = np.flatnonzero(~is_i)
        if iv.size == 0 or pv.size == 0:
            return out_schema.empty_table()
        # intervals sorted by (code, start); probes by (code, ts)
        io = iv[np.lexsort((t[iv], codes[iv]))]
        po = pv[np.lexsort((t[pv], codes[pv]))]
        ic, it_, ie = codes[io], t[io], e[io]
        pc_, pt = codes[po], t[po]
        # per-probe candidate range [g_lo, hi) in the sorted interval
        # array: group bounds from a searchsorted on the code, then
        # "first start > ts" from a searchsorted on a monotonic
        # composite (group run index × span + DENSE RANK of start) —
        # the vectorized grouped-binary-search trick, no per-group
        # loop. Ranks, not raw timestamps: runs × raw-us span can
        # overflow int64 on a partition with many groups and a wide
        # time range; runs × (n_intervals + 2) cannot.
        g_lo = np.searchsorted(ic, pc_, side="left")
        g_hi = np.searchsorted(ic, pc_, side="right")
        run_of_i = np.cumsum(
            np.concatenate(([0], (ic[1:] != ic[:-1]).astype(np.int64))))
        # map each probe to its group's run index via g_lo (valid only
        # when the group exists)
        exists = g_lo < g_hi
        run_of_p = np.zeros(po.size, np.int64)
        run_of_p[exists] = run_of_i[g_lo[exists]]
        # shared dense rank: r(x) = #starts <= x over ALL intervals in
        # the partition; interval rank <= probe rank  <=>  start <= ts
        sorted_starts = np.sort(it_)
        r_i = np.searchsorted(sorted_starts, it_, side="right")
        r_p = np.searchsorted(sorted_starts, pt, side="right")
        span = it_.size + 2
        comp_i_arr = run_of_i * span + r_i
        comp_p_arr = run_of_p * span + r_p
        hi = np.searchsorted(comp_i_arr, comp_p_arr, side="right")
        hi = np.where(exists, np.minimum(hi, g_hi), 0)
        lo = np.where(exists, g_lo, 0)
        cnt = hi - lo
        total = int(cnt.sum())
        if total == 0:
            return out_schema.empty_table()
        p_rep = np.repeat(np.arange(po.size), cnt)
        offs = np.arange(total, dtype=np.int64) - np.repeat(
            np.cumsum(cnt) - cnt, cnt)
        i_idx = np.repeat(lo, cnt) + offs
        # re-check BOTH bounds: end exclusive, and start <= ts (the
        # composite clamp can admit a start just past an out-of-range
        # probe ts)
        keep = (ie[i_idx] > pt[p_rep]) & (it_[i_idx] <= pt[p_rep])
        p_rows = po[p_rep[keep]]
        i_rows = io[i_idx[keep]]
        cols = []
        for name, _ in ppay:
            cols.append(g.column(name).take(pa.array(p_rows)))
        for name, _ in ipay:
            cols.append(g.column(name).take(pa.array(i_rows)))
        return pa.Table.from_arrays(cols, schema=out_schema)

    joined = p_tag.union(i_tag).groupby("part").map_groups(
        _match, batch_format="pyarrow")
    rename = {f"p_{c}": c for c in probe_cols}
    rename.update({f"i_{c}": (f"{c}_r" if c in probe_cols else c)
                   for c in interval_cols})
    return joined.map_batches(
        lambda tb: tb.rename_columns(
            [rename[c] for c in tb.column_names]),
        batch_format="pyarrow")


def semi_join_ids(ds: ray.data.Dataset, ids: ray.data.Dataset,
                  id_col: str, keep: bool = True,
                  num_partitions: int = 64) -> ray.data.Dataset:
    """Distributed semi-join (``keep=True``) or anti-join
    (``keep=False``) of ``ds`` against an ids-only dataset — the
    scale path behind every "filter the corpus to/against this id
    set" step when the id set is too large to ``ray.put`` as a
    broadcast (a keep-set at 10^12 docs is ~8 TB of int64s; no node
    holds it).

    Shape: both sides hash to ``part = part_of(id) % P``, ``union``
    under ONE null-padded schema, ``groupby(part).map_groups`` once —
    inside each partition the membership test is a single vectorized
    ``np.isin`` over the partition's rows against the partition's id
    slice. One payload shuffle of ``ds``, one 8-byte/row shuffle of
    the ids; driver memory holds nothing.

    ``num_partitions`` must scale with the corpus so one partition's
    payload fits a worker heap (bytes/P ≲ 1 GiB); the default suits
    bench scale.
    """
    import pyarrow.compute as pc

    P = int(num_partitions)
    base = _arrow_schema(ds)
    if id_col not in base.names:
        raise ValueError(f"semi_join_ids: {id_col!r} not in dataset")
    union_schema = pa.schema(
        list(zip(base.names, base.types))
        + [("__sj_part", pa.int64()), ("__sj_tag", pa.int8())])

    def _tag_rows(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return union_schema.empty_table()
        key = batch.column(id_col).cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        cols = [batch.column(n) if n in batch.column_names
                else pa.nulls(batch.num_rows, t)
                for n, t in zip(base.names, base.types)]
        cols.append(pa.array(part_of(key, P), pa.int64()))
        cols.append(pa.array(np.zeros(key.size, np.int8), pa.int8()))
        return pa.Table.from_arrays(cols, schema=union_schema)

    def _tag_ids(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or id_col not in batch.column_names:
            return union_schema.empty_table()
        key = batch.column(id_col).cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        cols = []
        for n, t in zip(base.names, base.types):
            if n == id_col:
                cols.append(pa.array(key, pa.int64()).cast(t))
            else:
                cols.append(pa.nulls(key.size, t))
        cols.append(pa.array(part_of(key, P), pa.int64()))
        cols.append(pa.array(np.ones(key.size, np.int8), pa.int8()))
        return pa.Table.from_arrays(cols, schema=union_schema)

    out_schema = base

    def _filter_part(g: pa.Table) -> pa.Table:
        # guard the schema-less empty blocks Ray 2.49 aggregates emit
        if g.num_rows == 0 or "__sj_tag" not in g.column_names:
            return out_schema.empty_table()
        tag = g.column("__sj_tag").to_numpy(zero_copy_only=False)
        ids_np = g.column(id_col).cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        member = np.unique(ids_np[tag == 1])
        rows = g.filter(pc.equal(g.column("__sj_tag"), 0)) \
            .drop_columns(["__sj_part", "__sj_tag"])
        if rows.num_rows == 0:
            return out_schema.empty_table()
        mask = np.isin(ids_np[tag == 0], member)
        if not keep:
            mask = ~mask
        return rows.filter(pa.array(mask))

    tagged = ds.map_batches(_tag_rows, batch_format="pyarrow").union(
        ids.map_batches(_tag_ids, batch_format="pyarrow"))
    return tagged.groupby("__sj_part").map_groups(
        _filter_part, batch_format="pyarrow")
