"""Windowed event aggregates (stream-shaped batch operators).

Ray Data has no event-time windowing; the reference has none either (its
model is batch, SURVEY §1.2). These implement the training-pipeline
versions over an ordered events table:

- tumbling windows: pure partial-agg + groupby (no ordering assumption —
  window id is a function of ts).
- session windows: gaps-and-islands per user inside
  ``groupby(user).map_groups`` over the ts-sorted group (ordering
  assumption: only within each group, which map_groups guarantees after
  its sort).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from blacklab_ray.util import part_of
from ray.data.aggregate import Sum


class TumblingPartial:
    """map_batches combiner: (window_start, key) partial count/sum."""

    def __init__(self, window_s: int, ts_col: str = "ts",
                 key_col: str = "event_type", value_col: str = "value"):
        self._w = window_s
        self._ts = ts_col
        self._key = key_col
        self._val = value_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ts = batch.column(self._ts).cast(pa.int64()).to_numpy(
            zero_copy_only=False)  # microseconds
        win = (ts // (self._w * 1_000_000)) * (self._w * 1_000_000)
        tbl = pa.table({
            "window_start": pa.array(win, pa.int64()),
            "key": batch.column(self._key),
            "value": batch.column(self._val),
        })
        gb = tbl.group_by(["window_start", "key"]).aggregate(
            [("value", "sum"), ([], "count_all")])
        return pa.table({
            "window_start": gb["window_start"],
            "key": gb["key"],
            "sum_p": gb["value_sum"],
            "n_p": gb["count_all"].cast(pa.int64()),
        })


def tumbling(ds: ray.data.Dataset, window_s: int, ts_col: str = "ts",
             key_col: str = "event_type",
             value_col: str = "value") -> ray.data.Dataset:
    """Tumbling-window count + sum per key; window_start in epoch µs."""
    partial = ds.map_batches(
        TumblingPartial(window_s, ts_col, key_col, value_col),
        batch_format="pyarrow")
    out = partial.groupby(["window_start", "key"]).aggregate(
        Sum("n_p", alias_name="n_events"),
        Sum("sum_p", alias_name="sum_value"))
    return out.map_batches(
        lambda t: pa.table({
            "window_start": t["window_start"].cast(pa.timestamp("us")),
            key_col: t["key"],
            "n_events": t["n_events"],
            "sum_value": t["sum_value"],
        }), batch_format="pyarrow")


class SlidingPartial:
    """map_batches combiner for SLIDING (hopping) windows: each event
    belongs to ``window/hop`` overlapping windows; the explode happens
    batch-locally and pre-aggregates before the shuffle (window count
    per event is the fan-out multiplier — shuffle rows stay
    per-(window,key) partials, not per-event copies)."""

    def __init__(self, window_s: int, hop_s: int, ts_col: str = "ts",
                 key_col: str = "event_type", value_col: str = "value"):
        if window_s % hop_s != 0:
            raise ValueError("window_s must be a multiple of hop_s")
        self._w = window_s * 1_000_000
        self._h = hop_s * 1_000_000
        self._k = window_s // hop_s
        self._ts = ts_col
        self._key = key_col
        self._val = value_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ts = batch.column(self._ts).cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        # newest window containing the event starts at hop-floor(ts);
        # the k windows start at floor - i*hop for i in 0..k-1, valid
        # while start > ts - window
        base = (ts // self._h) * self._h
        parts = []
        for i in range(self._k):
            start = base - i * self._h
            keep = start > ts - self._w
            sub = pa.table({
                "window_start": pa.array(start[keep], pa.int64()),
                "key": batch.column(self._key).filter(pa.array(keep)),
                "value": batch.column(self._val).filter(pa.array(keep)),
            })
            parts.append(sub)
        tbl = pa.concat_tables(parts)
        gb = tbl.group_by(["window_start", "key"]).aggregate(
            [("value", "sum"), ([], "count_all")])
        return pa.table({
            "window_start": gb["window_start"],
            "key": gb["key"],
            "sum_p": gb["value_sum"],
            "n_p": gb["count_all"].cast(pa.int64()),
        })


def sliding(ds: ray.data.Dataset, window_s: int, hop_s: int,
            ts_col: str = "ts", key_col: str = "event_type",
            value_col: str = "value") -> ray.data.Dataset:
    """Sliding-window count + sum per key (window length ``window_s``,
    advancing every ``hop_s``); window_start in epoch µs. Same
    partial-agg + tiny-groupby shape as tumbling."""
    partial = ds.map_batches(
        SlidingPartial(window_s, hop_s, ts_col, key_col, value_col),
        batch_format="pyarrow")
    out = partial.groupby(["window_start", "key"]).aggregate(
        Sum("n_p", alias_name="n_events"),
        Sum("sum_p", alias_name="sum_value"))
    return out.map_batches(
        lambda t: pa.table({
            "window_start": t["window_start"].cast(pa.timestamp("us")),
            key_col: t["key"],
            "n_events": t["n_events"],
            "sum_value": t["sum_value"],
        }), batch_format="pyarrow")


def sessionize(ds: ray.data.Dataset, gap_s: int, ts_col: str = "ts",
               user_col: str = "user_id",
               num_partitions: int = 32) -> ray.data.Dataset:
    """Session windows per user (new session when gap > gap_s).

    Integer user keys shuffle on ``hash(user) % num_partitions`` and
    the whole partition sessionizes in ONE vectorized pass (lexsort by
    (user, ts), boundary = user change OR gap) — one Python UDF call
    per partition instead of one per user (the per-group shape dies at
    web-scale user counts). Non-integer keys keep the per-user
    ``map_groups`` fallback (no portable vectorized hash for Arrow
    strings).

    Gaps-and-islands in pure numpy over the Arrow tables — no pandas
    conversion."""
    gap_us = gap_s * 1_000_000
    key_type = ds.schema().base_schema.field(user_col).type
    out_schema = pa.schema([
        (user_col, key_type),
        ("session_start", pa.timestamp("us")),
        ("session_end", pa.timestamp("us")),
        ("n_events", pa.int64()),
    ])

    def _sessions_sorted(user: np.ndarray, ts: np.ndarray,
                         utype) -> pa.Table:
        n = ts.size
        new = np.ones(n, dtype=bool)
        new[1:] = (user[1:] != user[:-1]) | ((ts[1:] - ts[:-1]) > gap_us)
        starts = np.flatnonzero(new)
        ends = np.append(starts[1:], n) - 1
        counts = np.diff(np.append(starts, n)).astype(np.int64)
        return pa.table({
            user_col: pa.array(user[starts]).cast(utype),
            "session_start": pa.array(ts[starts], pa.int64())
            .cast(pa.timestamp("us")),
            "session_end": pa.array(ts[ends], pa.int64())
            .cast(pa.timestamp("us")),
            "n_events": pa.array(counts, pa.int64()),
        })

    if pa.types.is_integer(key_type):
        P = num_partitions

        def _part(t: pa.Table) -> pa.Table:
            if t.num_rows == 0:
                return pa.schema(
                    [("part", pa.int64()), ("u", pa.int64()),
                     ("t", pa.int64())]).empty_table()
            u = t.column(user_col).cast(pa.int64()).to_numpy(
                zero_copy_only=False)
            ts = t.column(ts_col).cast(pa.int64()).to_numpy(
                zero_copy_only=False)
            part = part_of(u, P)
            return pa.table({"part": pa.array(part, pa.int64()),
                             "u": pa.array(u, pa.int64()),
                             "t": pa.array(ts, pa.int64())})

        def per_part(g: pa.Table) -> pa.Table:
            if g.num_rows == 0 or "u" not in g.column_names:
                return out_schema.empty_table()
            u = g.column("u").to_numpy(zero_copy_only=False)
            ts = g.column("t").to_numpy(zero_copy_only=False)
            order = np.lexsort((ts, u))
            return _sessions_sorted(u[order], ts[order], key_type)

        return ds.map_batches(_part, batch_format="pyarrow")             .groupby("part").map_groups(per_part,
                                        batch_format="pyarrow")

    def per_user(g: pa.Table) -> pa.Table:
        ts = np.sort(g.column(ts_col).cast(pa.int64()).to_numpy(
            zero_copy_only=False))
        t = _sessions_sorted(np.zeros(ts.size, np.int64), ts,
                             pa.int64())
        n_sess = t.num_rows
        return pa.table({
            user_col: g.column(user_col).take(
                pa.array(np.zeros(n_sess, np.int64))),
            "session_start": t["session_start"],
            "session_end": t["session_end"],
            "n_events": t["n_events"],
        })

    return ds.groupby(user_col).map_groups(per_user,
                                           batch_format="pyarrow")
