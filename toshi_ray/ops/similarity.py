"""Approximate-nearest-neighbor search over an embedding column.

Baseline: brute-force cosine top-k — the query matrix is broadcast ONCE
(`ray.put`), every batch does one numpy matmul and emits only its local
top-k rows (k × n_queries per batch, not the batch), the driver merges.
Scale path: IVF — a coarse centroid codebook (trained on a driver-side
sample, broadcast) assigns each vector to a cell; queries probe only
`nprobe` cells, so the matmul touches a fraction of the corpus.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _vec_matrix(col) -> np.ndarray:
    """Zero-copy (n, d) float64 matrix from a FixedSizeList / List
    embedding column — flatten + reshape, no per-row Python."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    if pa.types.is_fixed_size_list(col.type):
        d = col.type.list_size
        return col.flatten().to_numpy(zero_copy_only=False).reshape(n, d).astype(np.float64)
    flat = col.flatten().to_numpy(zero_copy_only=False)
    if n == 0:
        return flat.reshape(0, 0).astype(np.float64)
    offs = col.offsets.to_numpy(zero_copy_only=False)
    lens = np.diff(offs)
    if not (lens == lens[0]).all():
        raise ValueError("embedding column has ragged list lengths")
    return flat.reshape(n, int(lens[0])).astype(np.float64)


def _as_matrix(col) -> np.ndarray:
    return _vec_matrix(col)


def _normalize(v: np.ndarray) -> np.ndarray:
    return v / np.maximum(np.linalg.norm(v, axis=1, keepdims=True), 1e-12)


def brute_force_topk(
    ds,
    query_vecs: np.ndarray,
    *,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_ids: np.ndarray | None = None,
    normalized: bool = True,
):
    """→ pandas DataFrame (query_id, vec_id, score) — exact cosine top-k.

    The per-batch kernel is one matmul against the broadcast query
    matrix; only local top-k rows leave each task.
    """
    import ray

    q = np.asarray(query_vecs, dtype=np.float64)
    if normalized:
        q = _normalize(q)
    qids = np.asarray(query_ids) if query_ids is not None else np.arange(q.shape[0])
    q_ref = ray.put(q)

    def score(t: pa.Table) -> pa.Table:
        qm = ray.get(q_ref)
        v = _as_matrix(t[vec_col])
        if normalized:
            v = _normalize(v)
        sims = qm @ v.T  # (n_q, n_batch)
        ids = t[id_col].to_numpy(zero_copy_only=False)
        kk = min(k, sims.shape[1])
        # local top-k per query (argpartition then exact sort)
        part = np.argpartition(-sims, kk - 1, axis=1)[:, :kk]
        rows_q = np.repeat(np.arange(qm.shape[0]), kk)
        cand = part.reshape(-1)
        return pa.table(
            {
                "query_id": pa.array(qids[rows_q]),
                id_col: pa.array(ids[cand]),
                "score": pa.array(sims[rows_q, cand]),
            }
        )

    parts = ds.map_batches(score, batch_format="pyarrow").take_all()
    df = pd.DataFrame(parts)
    df = df.sort_values(["query_id", "score", id_col], ascending=[True, False, True])
    return df.groupby("query_id", as_index=False).head(k).reset_index(drop=True)


def train_ivf_centroids(
    ds,
    *,
    n_cells: int = 16,
    vec_col: str = "embedding",
    sample: int = 2048,
    iters: int = 10,
    seed: int = 5,
) -> np.ndarray:
    """Tiny deterministic k-means on a driver-side sample (the codebook
    is small by design — this is the one legitimately driver-side step)."""
    head = ds.limit(sample).take_all()
    v = _normalize(np.stack([r[vec_col] for r in head]).astype(np.float64))
    rng = np.random.default_rng(seed)
    cent = v[rng.choice(v.shape[0], size=min(n_cells, v.shape[0]), replace=False)]
    for _ in range(iters):
        assign = np.argmax(v @ cent.T, axis=1)
        for c in range(cent.shape[0]):
            m = assign == c
            if m.any():
                cent[c] = _normalize(v[m].mean(axis=0, keepdims=True))[0]
    return cent


def build_ivf_index(
    ds,
    centroids: np.ndarray,
    path: str,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> str:
    """Materialize an IVF index: vectors written as parquet PARTITIONED
    BY cell (hive layout), so a probe reads only its cells' files —
    the true scale path (brute_force touches every byte; this touches
    nprobe/n_cells of them)."""
    import ray

    cent_ref = ray.put(centroids)

    def assign(t: pa.Table) -> pa.Table:
        cent = ray.get(cent_ref)
        v = _normalize(_as_matrix(t[vec_col]))
        cell = np.argmax(v @ cent.T, axis=1).astype(np.int32)
        # `cell` becomes the hive partition dir; `cell_id` stays physical
        # so per-row cells survive a manually-pruned read
        t = t.append_column("cell", pa.array(cell))
        return t.append_column("cell_id", pa.array(cell))

    ds.map_batches(assign, batch_format="pyarrow").write_parquet(
        path, partition_cols=["cell"]
    )
    return path


def ivf_index_topk(
    index_path: str,
    query_vecs: np.ndarray,
    centroids: np.ndarray,
    *,
    k: int = 10,
    nprobe: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_ids: np.ndarray | None = None,
):
    """ANN over a partitioned IVF index: reads ONLY the probed cells
    (parquet partition pruning), then exact cosine within them."""
    import ray.data

    q = _normalize(np.asarray(query_vecs, dtype=np.float64))
    qids = np.asarray(query_ids) if query_ids is not None else np.arange(q.shape[0])
    probes = np.argsort(-(q @ centroids.T), axis=1)[:, :nprobe]
    cells = sorted({int(c) for row in probes for c in row})
    # manual partition pruning: only the probed cells' directories are
    # even LISTED, let alone read
    import os

    import glob

    paths = [
        f
        for c in cells
        for f in sorted(glob.glob(os.path.join(index_path, f"cell={c}", "*.parquet")))
    ]
    if not paths:
        return pd.DataFrame({"query_id": [], id_col: [], "score": []})
    ds = ray.data.read_parquet(paths)
    import ray

    ref = ray.put((q, probes))

    def score(t: pa.Table) -> pa.Table:
        qm, prob = ray.get(ref)
        v = _normalize(_as_matrix(t[vec_col]))
        ids = t[id_col].to_numpy(zero_copy_only=False)
        cell = t["cell_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        out_q, out_id, out_s = [], [], []
        for qi in range(qm.shape[0]):
            m = np.isin(cell, prob[qi])
            if not m.any():
                continue
            sims = v[m] @ qm[qi]
            kk = min(k, sims.size)
            loc = np.argpartition(-sims, kk - 1)[:kk]
            out_q.append(np.full(kk, qids[qi]))
            out_id.append(ids[m][loc])
            out_s.append(sims[loc])
        if not out_q:
            return pa.table({"query_id": pa.array([], pa.int64()),
                             id_col: pa.array([], pa.int64()),
                             "score": pa.array([], pa.float64())})
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(out_q)),
                id_col: pa.array(np.concatenate(out_id)),
                "score": pa.array(np.concatenate(out_s)),
            }
        )

    parts = ds.map_batches(score, batch_format="pyarrow").take_all()
    df = pd.DataFrame(parts)
    if df.empty:
        return pd.DataFrame({"query_id": [], id_col: [], "score": []})
    df = df.sort_values(["query_id", "score", id_col], ascending=[True, False, True])
    return df.groupby("query_id", as_index=False).head(k).reset_index(drop=True)


def ivf_topk(
    ds,
    query_vecs: np.ndarray,
    centroids: np.ndarray,
    *,
    k: int = 10,
    nprobe: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_ids: np.ndarray | None = None,
):
    """IVF-style ANN: per batch, score only vectors whose cell is probed
    by some query. Centroids + queries broadcast once."""
    import ray

    q = _normalize(np.asarray(query_vecs, dtype=np.float64))
    qids = np.asarray(query_ids) if query_ids is not None else np.arange(q.shape[0])
    probes = np.argsort(-(q @ centroids.T), axis=1)[:, :nprobe]  # (n_q, nprobe)
    ref = ray.put((q, centroids, probes))

    def score(t: pa.Table) -> pa.Table:
        qm, cent, prob = ray.get(ref)
        v = _normalize(_as_matrix(t[vec_col]))
        ids = t[id_col].to_numpy(zero_copy_only=False)
        cell = np.argmax(v @ cent.T, axis=1)
        out_q, out_id, out_s = [], [], []
        for qi in range(qm.shape[0]):
            m = np.isin(cell, prob[qi])
            if not m.any():
                continue
            sims = v[m] @ qm[qi]
            kk = min(k, sims.size)
            loc = np.argpartition(-sims, kk - 1)[:kk]
            out_q.append(np.full(kk, qids[qi]))
            out_id.append(ids[m][loc])
            out_s.append(sims[loc])
        if not out_q:
            return pa.table({"query_id": pa.array([], pa.int64()),
                             id_col: pa.array([], pa.int64()),
                             "score": pa.array([], pa.float64())})
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(out_q)),
                id_col: pa.array(np.concatenate(out_id)),
                "score": pa.array(np.concatenate(out_s)),
            }
        )

    parts = ds.map_batches(score, batch_format="pyarrow").take_all()
    df = pd.DataFrame(parts)
    if df.empty:
        return pd.DataFrame({"query_id": [], id_col: [], "score": []})
    df = df.sort_values(["query_id", "score", id_col], ascending=[True, False, True])
    return df.groupby("query_id", as_index=False).head(k).reset_index(drop=True)
