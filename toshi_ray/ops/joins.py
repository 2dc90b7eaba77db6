"""Join operators Ray Data lacks natively — as-of (time-series) join and
broadcast range (interval) join.

Both avoid `Dataset.join`: Ray 2.49's Acero-backed join breaks on
chained joins / empty partitions (see CLAUDE.md), and neither shape
needs a general hash join anyway. The as-of join is the union+coarse-
partition reduce-side pattern (both sides tagged, ONE groupby, a
vectorized per-partition scan); the range join broadcasts the interval
table (`ray.put` once) and binary-searches inside `map_batches` —
map-only, zero shuffle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def asof_join(
    left_ds,
    right_ds,
    *,
    key_col: str,
    ts_col: str = "ts_us",
    value_col: str = "v",
    id_col: str = "event_id",
    strict: bool = False,
    parts: int = 64,
):
    """Backward as-of join: each left row gets the LATEST right row of
    the same key with ``right.ts <= left.ts`` (``strict=True`` → ``<``).

    → (id_col, key_col, ts_us, match_ts_us, match_v) with ``-1``
    sentinels when no right row qualifies. Inputs: ``left_ds`` columns
    (id, key, ts), ``right_ds`` columns (key, ts, value); ts and value
    must be int64 (integer µs / integer-scaled values keep the DuckDB
    twin hash-exact).

    Scale shape: both sides are tagged and unioned, then ONE coarse
    hash-partition groupby on the key co-locates every (key)'s rows;
    inside a partition the match is a single sort + segment-max scan —
    `np.maximum.accumulate` over right-row positions, validated per key
    — no per-key loop, no per-row Python. The shuffle carries only the
    four integer columns, never payload rows.
    """

    def tag_left(t: pa.Table) -> pa.Table:
        k = t[key_col].cast(pa.int64())
        return pa.table(
            {
                "k": k,
                "t": t[ts_col].cast(pa.int64()),
                "rid": t[id_col].cast(pa.int64()),
                "v": pa.array(np.zeros(t.num_rows, np.int64)),
                "is_right": pa.array(np.zeros(t.num_rows, np.int64)),
                "part": pa.array(
                    (k.to_numpy(zero_copy_only=False) % parts).astype(np.int64)
                ),
            }
        )

    def tag_right(t: pa.Table) -> pa.Table:
        k = t[key_col].cast(pa.int64())
        return pa.table(
            {
                "k": k,
                "t": t[ts_col].cast(pa.int64()),
                "rid": pa.array(np.full(t.num_rows, -1, np.int64)),
                "v": t[value_col].cast(pa.int64()),
                "is_right": pa.array(np.ones(t.num_rows, np.int64)),
                "part": pa.array(
                    (k.to_numpy(zero_copy_only=False) % parts).astype(np.int64)
                ),
            }
        )

    def fold(g: pa.Table) -> pa.Table:
        k = g["k"].to_numpy(zero_copy_only=False)
        t = g["t"].to_numpy(zero_copy_only=False)
        rid = g["rid"].to_numpy(zero_copy_only=False)
        v = g["v"].to_numpy(zero_copy_only=False)
        is_r = g["is_right"].to_numpy(zero_copy_only=False).astype(bool)
        # at equal ts a right row is visible to a left row iff NOT
        # strict → rights sort first (side 0) for <=, last for <.
        # Among DUPLICATE (key, ts) right rows the largest value wins
        # (v ascending in the sort → the segment-max scan keeps the
        # last one) — the deterministic tie rule the SQL twin's
        # max(v)-at-match-ts mirrors; without it the winner would
        # depend on union/batch arrival order.
        side = np.where(is_r, 0 if not strict else 1, 1 if not strict else 0)
        order = np.lexsort((v, side, t, k))
        k, t, rid, v, is_r = k[order], t[order], rid[order], v[order], is_r[order]
        pos = np.arange(k.size, dtype=np.int64)
        last_r = np.maximum.accumulate(np.where(is_r, pos, -1))
        lefts = np.flatnonzero(~is_r)
        m = last_r[lefts]
        valid = (m >= 0) & (k[np.maximum(m, 0)] == k[lefts])
        match_ts = np.where(valid, t[np.maximum(m, 0)], -1)
        match_v = np.where(valid, v[np.maximum(m, 0)], -1)
        return pa.table(
            {
                id_col: pa.array(rid[lefts]),
                key_col: pa.array(k[lefts]),
                "ts_us": pa.array(t[lefts]),
                "match_ts_us": pa.array(match_ts),
                "match_v": pa.array(match_v),
            }
        )

    unioned = left_ds.map_batches(tag_left, batch_format="pyarrow").union(
        right_ds.map_batches(tag_right, batch_format="pyarrow")
    )
    return unioned.groupby("part").map_groups(fold, batch_format="pyarrow")


def range_join(
    ds,
    intervals: list[tuple[int, int, str]],
    *,
    value_col: str,
    id_col: str = "doc_id",
    miss_label: str = "none",
):
    """Broadcast interval join: label each row with the (single)
    half-open interval ``[lo, hi)`` containing ``value_col``.

    → (id_col, value_col, bucket). Intervals must be non-overlapping
    and sorted (validated); the table is `ray.put` ONCE and every batch
    does a `searchsorted` — a map-only broadcast join, the standard
    scale pattern for a small dimension side (never a shuffle).
    """
    import ray

    los = np.array([iv[0] for iv in intervals], np.int64)
    his = np.array([iv[1] for iv in intervals], np.int64)
    labels = np.array([iv[2] for iv in intervals], object)
    if not ((los[1:] >= his[:-1]).all() and (his > los).all()):
        raise ValueError("intervals must be sorted and non-overlapping")
    ref = ray.put((los, his, labels))

    def f(t: pa.Table) -> pa.Table:
        lo, hi, lab = ray.get(ref)
        x = t[value_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
        idx = np.searchsorted(lo, x, side="right") - 1
        ok = (idx >= 0) & (x < hi[np.maximum(idx, 0)])
        out = np.where(ok, lab[np.maximum(idx, 0)], miss_label)
        return pa.table(
            {
                id_col: t[id_col].cast(pa.int64()),
                value_col: pa.array(x),
                "bucket": pa.array(out, pa.string()),
            }
        )

    return ds.select_columns([id_col, value_col]).map_batches(
        f, batch_format="pyarrow"
    )
