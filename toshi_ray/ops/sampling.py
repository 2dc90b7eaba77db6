"""Deterministic sampling / data-mixing operators.

A 100-TB training-data pipeline rarely uses a corpus as-is: it mixes
strata (language, source/domain, quality band) at configured rates and
carves out held-out splits. Both must be DETERMINISTIC (a re-run or a
resumed shard keeps exactly the same docs — no RNG state) and
MAP-ONLY (a keep/drop decision per row, no shuffle), so the whole
operator is one `map_batches` filter that scales linearly.

The keep-rule hash is a double-round Lehmer / MINSTD generator over the
doc id, computed mod 2^31−1 with every intermediate < 2^46 — BIGINT-safe
arithmetic that the DuckDB oracle recomputes value-for-value (same
pattern as `ops.dedup._poly_hash31`). A doc's fate depends only on its
id and the configured ppm rate: batch-invariant, cluster-invariant,
restart-invariant.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_M31 = np.int64(2147483647)  # 2^31 - 1 (prime)
_A = np.int64(48271)  # MINSTD multiplier
_C = np.int64(12345)


def _lehmer2(ids: np.ndarray) -> np.ndarray:
    """Two Lehmer rounds over id mod 2^31-1 → uniform-ish in [0, M31).
    All intermediates < 2^31 * 48271 < 2^47: int64-safe, and expressible
    verbatim in SQL (no unsigned tricks, no overflow UB)."""
    x = ids.astype(np.int64) % _M31
    x = (x * _A + _C) % _M31
    x = (x * _A + _C) % _M31
    return x


def lehmer2_sql(col: str) -> str:
    """The exact SQL twin of `_lehmer2` (kept next to the kernel so the
    two can't drift)."""
    a, c, m = int(_A), int(_C), int(_M31)
    return (
        f"((((({col} % {m}) * {a} + {c}) % {m}) * {a} + {c}) % {m})"
    )


def hash_sample(ds, rate_ppm: int, *, id_col: str = "doc_id"):
    """Keep each row iff lehmer2(id) % 1_000_000 < rate_ppm — a
    deterministic uniform sample at rate_ppm parts-per-million.
    Map-only; emits the surviving rows unchanged."""

    def keep(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        m = (_lehmer2(ids) % np.int64(1_000_000)) < np.int64(rate_ppm)
        return t.filter(pa.array(m))

    return ds.map_batches(keep, batch_format="pyarrow")


def stratified_sample(
    ds,
    rates_ppm: dict[str, int],
    *,
    strata_col: str = "lang",
    default_ppm: int = 1_000_000,
    id_col: str = "doc_id",
):
    """Per-stratum deterministic sampling — the data-mixing primitive
    (e.g. keep 100% of one language, 25% of another). ``rates_ppm``
    maps stratum value → keep rate in ppm; strata not listed keep at
    ``default_ppm``. The keep decision is `lehmer2(id) % 1e6 <
    rate[stratum]`, so raising a stratum's rate strictly grows its
    sample (nested samples — the standard property for reproducible
    mixture sweeps). Map-only, no shuffle; the rate table rides into
    each task as a broadcast closure (bytes, not a join)."""
    items = sorted(rates_ppm.items())
    keys = np.array([k for k, _ in items], dtype=object)
    vals = np.array([int(v) for _, v in items], dtype=np.int64)

    def keep(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        strat = np.asarray(t[strata_col].to_numpy(zero_copy_only=False), dtype=object)
        pos = np.searchsorted(keys, strat)
        pos_c = np.clip(pos, 0, max(keys.size - 1, 0))
        hit = (keys.size > 0) & (keys[pos_c] == strat)
        rate = np.where(hit, vals[pos_c] if keys.size else 0, np.int64(default_ppm))
        m = (_lehmer2(ids) % np.int64(1_000_000)) < rate.astype(np.int64)
        return t.filter(pa.array(m))

    return ds.map_batches(keep, batch_format="pyarrow")


def assign_split(
    ds,
    *,
    eval_ppm: int = 10_000,
    id_col: str = "doc_id",
    out_col: str = "split",
):
    """Deterministic train/eval carve-out: adds ``out_col`` with
    'eval' where lehmer2(id) % 1e6 < eval_ppm else 'train'. The same
    doc lands in the same split on every run, shard, and cluster size —
    the property leakage audits depend on. Map-only."""

    def tag(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        is_eval = (_lehmer2(ids) % np.int64(1_000_000)) < np.int64(eval_ppm)
        lab = np.where(is_eval, "eval", "train")
        return t.append_column(out_col, pa.array(lab, type=pa.string()))

    return ds.map_batches(tag, batch_format="pyarrow")
