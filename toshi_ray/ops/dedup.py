"""Deduplication operators for large-scale training-data pipelines.

All operators are Ray-Data-native: vectorized `map_batches` stages for
signatures, `groupby` only over small keys (hashes / band buckets),
never over raw text. Designed so the shuffle payload is O(docs), not
O(bytes): signatures travel, documents don't.

Exact dedup  : content hash → groupby(hash) → keep min doc_id
MinHash LSH  : word shingles → minhash sigs → band buckets → candidate
               pairs → exact-Jaccard verify (the standard near-dup
               pipeline of web-scale corpora, e.g. Lee et al. 2021
               "Deduplicating Training Data Makes LMs Better")
SimHash      : 64-bit weighted fingerprint + banded near-dup candidates
N-gram Jaccard: exact pairwise verify within candidate buckets
Embedding    : cosine near-dup via sign-LSH buckets over normalized vecs
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from toshi_ray.analyzer import DefaultAnalyzer

_U = np.uint64
_MERSENNE = _U((1 << 61) - 1)


def _empty_pairs(metric: str, dtype) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "id_a": pd.Series(dtype="int64"),
            "id_b": pd.Series(dtype="int64"),
            metric: pd.Series(dtype=dtype),
        }
    )


N_PAIR_PARTS = 64  # coarse shuffle partitions for bucket-pair generation


def _pairs_by_partition(exploded, bucket_cols: list[str], pair_fn, metric: str, dtype):
    """groupby a COARSE partition of the bucket hash (64 groups, not one
    Ray group per LSH bucket — per-group Python overhead would dominate
    at millions of buckets), run the per-bucket pair generator inside
    with a vectorized pandas groupby, then dedupe pairs the same way."""

    def gen(g: pd.DataFrame) -> pd.DataFrame:
        outs = [pair_fn(sub) for _, sub in g.groupby(bucket_cols, sort=False)]
        outs = [o for o in outs if len(o)]
        return pd.concat(outs, ignore_index=True) if outs else _empty_pairs(metric, dtype)

    pairs = exploded.groupby("part").map_groups(gen, batch_format="pandas")

    def add_pair_part(t: pa.Table) -> pa.Table:
        a = t["id_a"].to_numpy(zero_copy_only=False).astype(_U)
        b = t["id_b"].to_numpy(zero_copy_only=False).astype(_U)
        return t.append_column(
            "ppart", pa.array((_mix(a * _U(31) + b) % _U(N_PAIR_PARTS)).astype(np.int64))
        )

    def dedupe(g: pd.DataFrame) -> pd.DataFrame:
        out = g.drop_duplicates(subset=["id_a", "id_b"]).drop(columns=["ppart"])
        return out if len(out) else _empty_pairs(metric, dtype)

    return (
        pairs.map_batches(add_pair_part, batch_format="pyarrow")
        .groupby("ppart")
        .map_groups(dedupe, batch_format="pandas")
    )


def _mix(x: np.ndarray) -> np.ndarray:
    z = np.asarray(x, dtype=_U) + _U(0x9E3779B97F4A7C15)
    z = (z ^ (z >> _U(30))) * _U(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> _U(27))) * _U(0x94D049BB133111EB)
    return z ^ (z >> _U(31))


def _hash_strings(col: pa.Array) -> np.ndarray:
    """Deterministic 64-bit content hash per string (vectorized FNV over
    the flat byte buffer via numpy — no Python loop over rows)."""
    col = col.cast(pa.large_binary())
    buf = np.frombuffer(col.buffers()[2], dtype=np.uint8) if col.buffers()[2] else np.empty(0, np.uint8)
    offs = np.frombuffer(col.buffers()[1], dtype=np.int64)[col.offset : col.offset + len(col) + 1]
    # polynomial hash with per-byte horner: do it blockwise via cumulative
    # products is costly; instead hash 8-byte words then mix. Pad via copy.
    out = np.zeros(len(col), dtype=_U)
    lens = np.diff(offs)
    max_len = int(lens.max()) if len(lens) else 0
    P = _U(1099511628211)
    for w in range(0, max_len, 8):
        active = lens > w  # rounds depend ONLY on the string's own length,
        # never the batch's max — equal strings hash equal at any batching
        take = np.minimum(lens[active] - w, 8)
        words = np.zeros(int(active.sum()), dtype=_U)
        starts = offs[:-1][active]
        for b in range(8):
            sel = take > b
            if not sel.any():
                break
            words[sel] |= buf[starts[sel] + w + b].astype(_U) << _U(8 * b)
        out[active] = (out[active] * P) ^ _mix(words + _U(w + 1))
    return out ^ _mix(lens.astype(_U))


def exact_dedup(ds, col: str = "text", id_col: str = "doc_id"):
    """→ Dataset of (doc_id of kept representative, n_copies).

    Hash shuffle carries only (hash, doc_id); within a hash bucket the
    representative is the minimum doc_id (ties on full text equality are
    collapsed; a 64-bit collision across distinct texts is accepted at
    these scales and would only over-merge one pair).
    """
    from ray.data.aggregate import Min, Sum

    def sig(t: pa.Table) -> pa.Table:
        """Hash + per-batch partial reduce: one (h, min_id, n) row per
        distinct hash per batch — the combiner before the shuffle."""
        h = _hash_strings(t[col].combine_chunks())
        ids = t[id_col].to_numpy(zero_copy_only=False)
        order = np.argsort(h, kind="stable")
        h, ids = h[order], ids[order]
        new = np.ones(h.size, dtype=bool)
        new[1:] = h[1:] != h[:-1]
        starts = np.nonzero(new)[0]
        min_ids = np.minimum.reduceat(ids, starts)
        counts = np.diff(np.concatenate([starts, [h.size]]))
        return pa.table(
            {
                # int64 key: Ray's aggregate planner round-trips uint64
                # group keys through a pickled extension type
                "h": pa.array((h[starts] >> _U(1)).astype(np.int64)),
                id_col: pa.array(min_ids),
                "n": pa.array(counts.astype(np.int64)),
            }
        )

    out = (
        ds.map_batches(sig, batch_format="pyarrow")
        .groupby("h")
        .aggregate(Min(on=id_col, alias_name=id_col), Sum(on="n", alias_name="n_copies"))
    )
    return out.select_columns([id_col, "n_copies"])


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

class MinHasher:
    """Stateful map_batches stage: word-shingle minhash signatures.

    num_perm permutations via (a*h+b) mod p universal hashing; one
    signature column list<uint64> per doc.
    """

    def __init__(self, col: str, id_col: str, shingle: int, num_perm: int, seed: int = 7):
        self.col, self.id_col, self.k, self.n = col, id_col, shingle, num_perm
        rng = np.random.default_rng(seed)
        self.a = rng.integers(1, (1 << 61) - 1, num_perm, dtype=np.uint64)
        self.b = rng.integers(0, (1 << 61) - 1, num_perm, dtype=np.uint64)
        self.an = DefaultAnalyzer()

    def shingle_hashes(self, t: pa.Table) -> tuple[np.ndarray, np.ndarray]:
        """flat shingle hashes + per-doc offsets"""
        tc = self.an.tokenize_column(t[self.col].combine_chunks())
        tok_hash = _hash_strings(tc.terms)
        n_docs = t.num_rows
        counts = np.bincount(tc.doc_index, minlength=n_docs)
        offs = np.zeros(n_docs + 1, np.int64)
        np.cumsum(counts, out=offs[1:])
        # rolling combine of k consecutive token hashes within each doc
        h = tok_hash.copy()
        for j in range(1, self.k):
            shifted = np.roll(tok_hash, -j)
            h = _mix(h * _U(0x100000001B3) + shifted)
        # drop the last min(k-1, count) positions of each doc — those
        # shingles would cross the doc boundary (clamped to doc start)
        keep = np.ones(h.size, dtype=bool)
        starts = offs[:-1]
        for j in range(1, self.k):
            ends = offs[1:] - j
            valid = ends >= starts
            keep[ends[valid]] = False
        new_counts = np.maximum(counts - (self.k - 1), 0)
        new_offs = np.zeros(n_docs + 1, np.int64)
        np.cumsum(new_counts, out=new_offs[1:])
        return h[keep], new_offs

    def signatures(self, t: pa.Table) -> np.ndarray:
        """(n_docs, num_perm) uint64 minhash matrix."""
        h, offs = self.shingle_hashes(t)
        n_docs = t.num_rows
        sigs = np.full((n_docs, self.n), np.iinfo(np.uint64).max, dtype=np.uint64)
        if h.size == 0:
            return sigs
        nonempty = np.diff(offs) > 0
        starts = offs[:-1][nonempty]
        for p in range(self.n):  # loop over perms, vectorized over shingles
            ph = (self.a[p] * h + self.b[p]) & _MERSENNE
            sigs[nonempty, p] = np.minimum.reduceat(ph, starts) if starts.size else []
        return sigs

    def __call__(self, t: pa.Table) -> pa.Table:
        sigs = self.signatures(t)
        return pa.table(
            {
                self.id_col: t[self.id_col],
                "sig": pa.FixedSizeListArray.from_arrays(
                    pa.array(sigs.reshape(-1)), self.n
                ),
            }
        )


def minhash_lsh_pairs(
    ds,
    col: str = "text",
    id_col: str = "doc_id",
    *,
    shingle: int = 3,
    num_perm: int = 64,
    bands: int = 16,
    threshold: float = 0.5,
):
    """→ Dataset of candidate near-dup pairs (id_a < id_b, est_jaccard).

    Pipeline: minhash sigs → explode (band, band_hash, doc_id) →
    groupby(band, band_hash) → pairs within bucket → estimate jaccard
    from signature agreement; filter by threshold. The final exact
    verify (token-shingle Jaccard) is `ngram_jaccard_verify`.
    """
    rows_per_band = num_perm // bands

    def explode(t: pa.Table) -> pa.Table:
        mh = MinHasher(col, id_col, shingle, num_perm)
        sigs = mh.signatures(t)
        n = t.num_rows
        band_view = sigs.reshape(n, bands, rows_per_band)
        bh = band_view[:, :, 0].astype(np.uint64)
        for j in range(1, rows_per_band):
            bh = _mix(bh * _U(0x100000001B3) + band_view[:, :, j])
        ids = np.repeat(t[id_col].to_numpy(zero_copy_only=False), bands)
        bh_flat = bh.reshape(-1)
        return pa.table(
            {
                "band": pa.array(np.tile(np.arange(bands, dtype=np.int32), n)),
                "bh": pa.array(bh_flat),
                "part": pa.array((bh_flat % _U(N_PAIR_PARTS)).astype(np.int64)),
                id_col: pa.array(ids),
                "sig": pa.FixedSizeListArray.from_arrays(
                    pa.array(np.repeat(sigs, bands, axis=0).reshape(-1)), num_perm
                ),
            }
        )

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:
            return _empty_pairs("est_jaccard", float)
        g = g.sort_values(id_col)
        ids = g[id_col].to_numpy()
        sigs = np.stack(g["sig"].to_numpy())
        ia, ib = np.triu_indices(len(g), k=1)
        est = (sigs[ia] == sigs[ib]).mean(axis=1)
        keep = est >= threshold
        return pd.DataFrame(
            {"id_a": ids[ia[keep]], "id_b": ids[ib[keep]], "est_jaccard": est[keep]}
        )

    exploded = ds.map_batches(explode, batch_format="pyarrow")
    return _pairs_by_partition(exploded, ["band", "bh"], bucket_pairs, "est_jaccard", float)


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def simhash_signatures(ds, col: str = "text", id_col: str = "doc_id"):
    """→ Dataset of (doc_id, simhash uint64): tf-weighted 64-bit simhash."""

    def sig(t: pa.Table) -> pa.Table:
        an = DefaultAnalyzer()
        tc = an.tokenize_column(t[col].combine_chunks())
        th = _mix(_hash_strings(tc.terms))
        n = t.num_rows
        acc = np.zeros((n, 64), dtype=np.int64)
        bits = ((th[:, None] >> np.arange(64, dtype=_U)) & _U(1)).astype(np.int64) * 2 - 1
        np.add.at(acc, tc.doc_index, bits)
        sh = (acc > 0).astype(np.uint64) @ (np.uint64(1) << np.arange(64, dtype=_U))
        return pa.table({id_col: t[id_col], "simhash": pa.array(sh)})

    return ds.map_batches(sig, batch_format="pyarrow")


def simhash_near_dup_pairs(ds, col="text", id_col="doc_id", max_hamming: int = 3):
    """Banded candidate generation over 4×16-bit chunks (any identical
    chunk ⇒ candidate when hamming ≤ 3 by pigeonhole), exact verify."""
    sigs = simhash_signatures(ds, col, id_col)

    def explode(t: pa.Table) -> pa.Table:
        sh = t["simhash"].to_numpy(zero_copy_only=False).astype(np.uint64)
        n = len(sh)
        parts = [(sh >> _U(16 * i)) & _U(0xFFFF) for i in range(4)]
        bh_flat = np.concatenate(parts)
        return pa.table(
            {
                "band": pa.array(np.repeat(np.arange(4, dtype=np.int32), n)),
                "bh": pa.array(bh_flat),
                "part": pa.array((bh_flat % _U(N_PAIR_PARTS)).astype(np.int64)),
                id_col: pa.array(np.tile(t[id_col].to_numpy(zero_copy_only=False), 4)),
                "simhash": pa.array(np.tile(sh, 4)),
            }
        )

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:
            return _empty_pairs("hamming", "int64")
        g = g.sort_values(id_col)
        ids = g[id_col].to_numpy()
        sh = g["simhash"].to_numpy().astype(np.uint64)
        ia, ib = np.triu_indices(len(g), k=1)
        x = sh[ia] ^ sh[ib]
        ham = np.zeros(x.size, dtype=np.int64)
        for i in range(64):
            ham += ((x >> _U(i)) & _U(1)).astype(np.int64)
        keep = ham <= max_hamming
        return pd.DataFrame({"id_a": ids[ia[keep]], "id_b": ids[ib[keep]], "hamming": ham[keep]})

    exploded = sigs.map_batches(explode, batch_format="pyarrow")
    return _pairs_by_partition(exploded, ["band", "bh"], bucket_pairs, "hamming", "int64")


# ---------------------------------------------------------------------------
# Exact n-gram Jaccard verify (within candidate buckets)
# ---------------------------------------------------------------------------

def ngram_jaccard_pairs(
    ds,
    bucket_col: str,
    col: str = "text",
    id_col: str = "doc_id",
    *,
    n: int = 3,
    threshold: float = 0.2,
):
    """Exact token-n-gram Jaccard for every pair within a bucket
    (e.g. bucket = source or an LSH bucket). The bucket keeps the
    quadratic pair-verify bounded; the groupby is the only shuffle."""

    def verify(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:
            return _empty_pairs("jaccard", float)
        g = g.sort_values(id_col)
        an = DefaultAnalyzer()
        shingle_sets = []
        for text in g[col]:
            toks = an.tokens(text or "")
            shingle_sets.append({tuple(toks[i : i + n]) for i in range(len(toks) - n + 1)})
        ids = g[id_col].to_numpy()
        rows = []
        for i in range(len(g)):
            for j in range(i + 1, len(g)):
                a, b = shingle_sets[i], shingle_sets[j]
                u = len(a | b)
                jac = len(a & b) / u if u else 0.0
                if jac >= threshold:
                    rows.append((ids[i], ids[j], jac))
        return pd.DataFrame(rows, columns=["id_a", "id_b", "jaccard"])

    return ds.groupby(bucket_col).map_groups(verify, batch_format="pandas")


# ---------------------------------------------------------------------------
# Embedding cosine near-dup
# ---------------------------------------------------------------------------

def embedding_near_dup_pairs(
    ds,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    *,
    threshold: float = 0.95,
    n_planes: int = 12,
    seed: int = 11,
):
    """Sign-LSH bucket (random hyperplanes over normalized vectors) →
    exact cosine verify within bucket. Vectors with cosine ≥ threshold
    almost always share the bucket at small n_planes; scale path uses
    multiple plane sets (add one column per set)."""

    def bucketize(t: pa.Table) -> pa.Table:
        v = np.stack(t[vec_col].to_pylist()).astype(np.float64)
        v /= np.maximum(np.linalg.norm(v, axis=1, keepdims=True), 1e-12)
        rng = np.random.default_rng(seed)
        planes = rng.standard_normal((v.shape[1], n_planes))
        bits = (v @ planes > 0).astype(np.uint64)
        bucket = bits @ (np.uint64(1) << np.arange(n_planes, dtype=np.uint64))
        return pa.table(
            {
                id_col: t[id_col],
                "bucket": pa.array(bucket),
                "vec": pa.FixedSizeListArray.from_arrays(
                    pa.array(v.reshape(-1)), v.shape[1]
                ),
            }
        )

    def verify(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:
            return _empty_pairs("cosine", float)
        g = g.sort_values(id_col)
        ids = g[id_col].to_numpy()
        v = np.stack(g["vec"].to_numpy())
        sim = v @ v.T
        ia, ib = np.triu_indices(len(g), k=1)
        keep = sim[ia, ib] >= threshold
        return pd.DataFrame(
            {"id_a": ids[ia[keep]], "id_b": ids[ib[keep]], "cosine": sim[ia, ib][keep]}
        )

    return (
        ds.map_batches(bucketize, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(verify, batch_format="pandas")
    )
