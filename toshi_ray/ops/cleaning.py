"""Corpus-cleaning operators — text normalization, PII redaction,
benchmark decontamination. The standard pre-training hygiene stages
(e.g. GPT-3's 13-gram test-set decontamination, Appendix C of Brown et
al. 2020), expressed as vectorized `map_batches` stages with DuckDB
oracle twins.

All three are embarrassingly parallel (no shuffle): normalization and
redaction are pure Arrow kernels; decontamination broadcasts the
reference n-gram set once via `ray.put` and does one `np.isin` per
batch — the reference set (a benchmark suite) is small by definition,
the corpus is not.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from toshi_ray.ops._gather import col_i64, gather_table

# mirrored verbatim in the SQL oracles (RE2 on both engines)
EMAIL_RE = r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}"
LONG_NUM_RE = r"[0-9]{9,}"


def normalize_text(ds, col: str = "text", id_col: str = "doc_id"):
    """→ (doc_id, text_norm, chars_before, chars_after): NFC-normalize,
    collapse whitespace runs to single spaces, trim."""
    ds = ds.select_columns([id_col, col])  # prune at the read

    def norm(t: pa.Table) -> pa.Table:
        s = pc.fill_null(t[col].combine_chunks().cast(pa.string()), "")
        before = pc.utf8_length(s)
        out = pc.utf8_normalize(s, form="NFC")
        out = pc.replace_substring_regex(out, pattern=r"\s+", replacement=" ")
        # trim plain spaces only (after the collapse, edges can only be
        # ' ') — keeps exact parity with SQL trim()
        out = pc.utf8_trim(out, characters=" ")
        return pa.table(
            {
                id_col: t[id_col],
                "text_norm": out,
                "chars_before": before.cast(pa.int64()),
                "chars_after": pc.utf8_length(out).cast(pa.int64()),
            }
        )

    return ds.map_batches(norm, batch_format="pyarrow")


def redact_pii(ds, col: str = "text", id_col: str = "doc_id"):
    """→ (doc_id, text_redacted, n_emails, n_long_numbers): replace
    email addresses and ≥9-digit runs with sentinel tokens."""
    ds = ds.select_columns([id_col, col])  # prune at the read

    def redact(t: pa.Table) -> pa.Table:
        s = pc.fill_null(t[col].combine_chunks().cast(pa.string()), "")
        n_email = pc.count_substring_regex(s, pattern=EMAIL_RE)
        out = pc.replace_substring_regex(s, pattern=EMAIL_RE, replacement="<EMAIL>")
        n_num = pc.count_substring_regex(out, pattern=LONG_NUM_RE)
        out = pc.replace_substring_regex(out, pattern=LONG_NUM_RE, replacement="<NUM>")
        return pa.table(
            {
                id_col: t[id_col],
                "text_redacted": out,
                "n_emails": n_email.cast(pa.int64()),
                "n_long_numbers": n_num.cast(pa.int64()),
            }
        )

    return ds.map_batches(redact, batch_format="pyarrow")


def decontaminate(ds, ref_texts: list[str], *, n: int = 8,
                  col: str = "text", id_col: str = "doc_id"):
    """→ (doc_id, n_hit_ngrams, contaminated): flag documents sharing
    any token n-gram with a reference (benchmark/test) text set.

    ``n_hit_ngrams`` counts the doc's DISTINCT n-grams present in the
    reference set. The reference n-gram hash set broadcasts once
    (`ray.put`); each batch is one vectorized membership test."""
    ds = ds.select_columns([id_col, col])  # prune at the read
    import ray

    from toshi_ray.ops.dedup import _unique_shingle_sets

    ref_flat, _ = _unique_shingle_sets(
        pa.array(ref_texts, type=pa.string()), n
    )
    ref_set = np.unique(ref_flat)
    ref_handle = ray.put(ref_set)

    def flag(t: pa.Table) -> pa.Table:
        ref = ray.get(ref_handle)
        flat, offs = _unique_shingle_sets(
            pc.fill_null(t[col].combine_chunks().cast(pa.string()), ""), n
        )
        hit = np.isin(flat, ref)
        sizes = np.diff(offs)
        doc_of = np.repeat(np.arange(t.num_rows, dtype=np.int64), sizes)
        per_doc = np.bincount(doc_of[hit], minlength=t.num_rows).astype(np.int64)
        return pa.table(
            {
                id_col: t[id_col],
                "n_hit_ngrams": pa.array(per_doc),
                "contaminated": pa.array(per_doc > 0),
            }
        )

    return ds.map_batches(flag, batch_format="pyarrow")


def chunk_tokens(
    ds,
    *,
    size: int = 32,
    stride: int = 24,
    col: str = "text",
    id_col: str = "doc_id",
):
    """→ (doc_id, chunk_idx, start_tok, n_tok, chunk_text): sliding
    token-window chunking — the sequence-prep stage an LLM training
    pipeline runs before packing. A chunk starts at every ``stride``
    tokens (overlap = size - stride); the last chunks shorten at the
    doc end; n_chunks = ceil(n_tok / stride); empty docs emit nothing.
    ``chunk_text`` is the space-joined ANALYZED token stream (chunks
    are over the model vocabulary, not raw bytes).

    Map-only and fully vectorized: chunk token ranges become a pyarrow
    ListArray view (gather indices built by repeat+cumsum arithmetic)
    and ONE `binary_join_element_wise`-free `pc.binary_join` call per
    batch rebuilds every chunk string — no per-chunk Python.
    """
    assert 0 < stride <= size
    from toshi_ray.ops.textstats import _tokenize

    ds = ds.select_columns([id_col, col])
    out_schema = pa.schema(
        [("doc_id", pa.int64()), ("chunk_idx", pa.int64()),
         ("start_tok", pa.int64()), ("n_tok", pa.int64()),
         ("chunk_text", pa.string())]
    )

    def f(t: pa.Table) -> pa.Table:
        tc = _tokenize(t, col)
        n_docs = t.num_rows
        n_tok = np.bincount(tc.doc_index, minlength=n_docs).astype(np.int64)
        doc_offs = np.zeros(n_docs + 1, np.int64)
        np.cumsum(n_tok, out=doc_offs[1:])
        n_chunks = (n_tok + stride - 1) // stride
        total = int(n_chunks.sum())
        if total == 0:
            return out_schema.empty_table()
        cdoc = np.repeat(np.arange(n_docs, dtype=np.int64), n_chunks)
        # chunk_idx within doc: global arange minus each doc's first slot
        first = np.zeros(n_docs + 1, np.int64)
        np.cumsum(n_chunks, out=first[1:])
        cidx = np.arange(total, dtype=np.int64) - first[:-1][cdoc]
        start = cidx * stride
        clen = np.minimum(start + size, n_tok[cdoc]) - start
        # gather indices: for chunk j, doc_offs[doc]+start .. +clen
        offs = np.zeros(total + 1, np.int64)
        np.cumsum(clen, out=offs[1:])
        gather = np.arange(offs[-1], dtype=np.int64)
        gather += np.repeat(doc_offs[:-1][cdoc] + start - offs[:-1], clen)
        vals = tc.terms.take(pa.array(gather))
        chunks = pa.ListArray.from_arrays(pa.array(offs, pa.int32()), vals)
        txt = pa.compute.binary_join(chunks, " ")
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "doc_id": pa.array(ids[cdoc]),
                "chunk_idx": pa.array(cidx),
                "start_tok": pa.array(start),
                "n_tok": pa.array(clen),
                "chunk_text": txt.cast(pa.string()),
            }
        )

    return ds.map_batches(f, batch_format="pyarrow")


def pack_sequences(
    ds,
    *,
    seq_len: int = 64,
    col: str = "text",
    id_col: str = "doc_id",
):
    """→ Dataset of (seq_idx, n_tok, first_doc, last_doc, chk): GPT-style
    sequence PACKING — every doc's analyzed token stream is concatenated
    in doc_id order and cut into fixed ``seq_len`` windows (sequences
    cross doc boundaries; the last one may be short). ``chk`` is a
    position-weighted content checksum Σ h31(tok)·(pos_in_seq+1) —
    int64-exact (< 2^43), order-sensitive within the sequence yet
    ADDITIVE across partitions, so partials combine with a plain sum.

    Scale shape: pass 1 emits ONE subtotal row per input BLOCK
    (doc-id range, token count, sortedness flag); the driver prefix-sums
    the O(blocks) subtotals and broadcasts two O(blocks) arrays — never
    anything per-doc.  Pass 2 runs block-aligned (``batch_size=None``
    over the same materialized blocks), so a batch's global token base
    comes from one searchsorted on its first doc id and in-batch
    positions are a plain arange.  When the input is NOT globally
    doc_id-sorted (block ranges overlap or a block is internally
    unsorted) the op falls back to the exact per-doc offset scheme —
    gathered as Arrow blocks via ``gather_table``, O(docs) broadcast,
    correct for arbitrary layouts but flagged for corpus scale.  Pass 2
    is map-only + ONE groupby(seq) of pre-combined partials (≤ one row
    per (batch, seq) — never per token).
    """
    import ray
    from ray.data.aggregate import Max, Min, Sum

    from toshi_ray.ops.dedup import _poly_hash31
    from toshi_ray.ops.textstats import _tokenize

    # materialize pins block boundaries so pass 1 and pass 2 see the
    # same blocks (two-pass algorithms need either a checkpoint or
    # deterministic lineage; at cluster scale the object store spills
    # the projected two columns to local disk)
    ds = ds.select_columns([id_col, col]).materialize()

    def block_counts(t: pa.Table) -> pa.Table:
        schema = pa.schema([("did_min", pa.int64()), ("did_max", pa.int64()),
                            ("n_tok", pa.int64()), ("is_sorted", pa.bool_())])
        if t.num_rows == 0:
            return schema.empty_table()
        tc = _tokenize(t, col)
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        srt = bool(np.all(ids[1:] > ids[:-1])) if ids.size > 1 else True
        return pa.table(
            {"did_min": pa.array([int(ids.min())]),
             "did_max": pa.array([int(ids.max())]),
             "n_tok": pa.array([int(tc.doc_index.size)]),
             "is_sorted": pa.array([srt])}
        )

    bt = gather_table(
        ds.map_batches(block_counts, batch_size=None, batch_format="pyarrow")
    )
    if bt is None:
        return ray.data.from_arrow(
            pa.table({"seq_idx": pa.array([], pa.int64()),
                      "n_tok": pa.array([], pa.int64()),
                      "first_doc": pa.array([], pa.int64()),
                      "last_doc": pa.array([], pa.int64()),
                      "chk": pa.array([], pa.int64())})
        )
    bmin = col_i64(bt, "did_min")
    bmax = col_i64(bt, "did_max")
    bn = col_i64(bt, "n_tok")
    order = np.argsort(bmin, kind="stable")
    bmin, bmax, bn = bmin[order], bmax[order], bn[order]
    globally_sorted = bool(
        bt["is_sorted"].to_numpy(zero_copy_only=False).all()
    ) and bool(np.all(bmax[:-1] < bmin[1:]))

    if globally_sorted:
        # O(blocks) broadcast: token start of each block
        bstart = np.zeros(bmin.size, np.int64)
        np.cumsum(bn[:-1], out=bstart[1:])
        ref = ray.put((bmin, bstart))
    else:
        # exact fallback for unsorted layouts: per-doc offsets (Arrow
        # block gather — no per-row dicts — but O(docs) broadcast)
        def counts(t: pa.Table) -> pa.Table:
            tc = _tokenize(t, col)
            n = np.bincount(tc.doc_index, minlength=t.num_rows).astype(np.int64)
            return pa.table(
                {"doc_id": t[id_col].combine_chunks().cast(pa.int64()),
                 "n": pa.array(n)}
            )

        ct = gather_table(ds.map_batches(counts, batch_format="pyarrow"))
        doc_ids = col_i64(ct, "doc_id")
        n_tok = col_i64(ct, "n")
        order = np.argsort(doc_ids, kind="stable")
        doc_ids, n_tok = doc_ids[order], n_tok[order]
        starts = np.zeros(doc_ids.size, np.int64)
        np.cumsum(n_tok[:-1], out=starts[1:])
        ref = ray.put((doc_ids, starts))

    def _seq_partial(gpos: np.ndarray, tok_doc: np.ndarray,
                     h: np.ndarray) -> pa.Table:
        seq = gpos // seq_len
        p = gpos % seq_len
        # pre-combine per (seq): one output row per seq touched by batch
        uniq, inv = np.unique(seq, return_inverse=True)
        n_part = np.bincount(inv, minlength=uniq.size).astype(np.int64)
        chk = np.zeros(uniq.size, np.int64)
        np.add.at(chk, inv, h * (p + 1))
        dmin = np.full(uniq.size, np.iinfo(np.int64).max, np.int64)
        dmax = np.full(uniq.size, np.iinfo(np.int64).min, np.int64)
        np.minimum.at(dmin, inv, tok_doc)
        np.maximum.at(dmax, inv, tok_doc)
        return pa.table(
            {
                "seq_idx": pa.array(uniq),
                "n_tok": pa.array(n_part),
                "chk": pa.array(chk),
                "first_doc": pa.array(dmin),
                "last_doc": pa.array(dmax),
            }
        )

    def partial_block(t: pa.Table) -> pa.Table:
        # batch == whole block(s): every doc's global token start is its
        # block's broadcast token base + the doc's offset within the
        # block's contiguous run inside this batch (correct even when a
        # task coalesces multiple, possibly non-adjacent, whole blocks)
        bmin_b, bstart_b = ray.get(ref)
        tc = _tokenize(t, col)
        nd = t.num_rows
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        cnt = np.bincount(tc.doc_index, minlength=nd).astype(np.int64)
        doc_off = np.zeros(nd, np.int64)
        np.cumsum(cnt[:-1], out=doc_off[1:])
        blk = np.searchsorted(bmin_b, ids, side="right") - 1
        newblk = np.r_[True, blk[1:] != blk[:-1]]
        run_id = np.cumsum(newblk) - 1
        run_first = doc_off[np.flatnonzero(newblk)][run_id]
        gstart = bstart_b[blk] + (doc_off - run_first)
        pos_in_doc = (
            np.arange(tc.doc_index.size, dtype=np.int64) - doc_off[tc.doc_index]
        )
        gpos = gstart[tc.doc_index] + pos_in_doc
        return _seq_partial(gpos, ids[tc.doc_index], _poly_hash31(tc.terms))

    def partial_doc(t: pa.Table) -> pa.Table:
        dids, dstarts = ray.get(ref)
        tc = _tokenize(t, col)
        nd = t.num_rows
        cnt = np.bincount(tc.doc_index, minlength=nd).astype(np.int64)
        offs = np.zeros(nd, np.int64)
        np.cumsum(cnt[:-1], out=offs[1:])
        pos_in_doc = np.arange(tc.doc_index.size, dtype=np.int64) - offs[tc.doc_index]
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        gstart = dstarts[np.searchsorted(dids, ids)]
        gpos = gstart[tc.doc_index] + pos_in_doc
        return _seq_partial(gpos, ids[tc.doc_index], _poly_hash31(tc.terms))

    if globally_sorted:
        parts = ds.map_batches(
            partial_block, batch_size=None, batch_format="pyarrow"
        ).materialize()
    else:
        parts = ds.map_batches(partial_doc, batch_format="pyarrow").materialize()
    from toshi_ray.ops.dedup import PAIR_DRIVER_CAP

    if parts.count() <= PAIR_DRIVER_CAP:
        # partials are output-bounded (≈ one row per (batch, seq)) — a
        # vectorized driver fold replaces the trailing all-to-all (the
        # ~1.5-3 s/groupby Ray floor); the distributed aggregate below
        # still runs above the cap
        t = gather_table(parts)  # Arrow blocks, no per-row dicts
        if t is None:
            return ray.data.from_arrow(
                pa.table({"seq_idx": pa.array([], pa.int64()),
                          "n_tok": pa.array([], pa.int64()),
                          "first_doc": pa.array([], pa.int64()),
                          "last_doc": pa.array([], pa.int64()),
                          "chk": pa.array([], pa.int64())})
            )
        sq = col_i64(t, "seq_idx")
        nt = col_i64(t, "n_tok")
        ck = col_i64(t, "chk")
        fd = col_i64(t, "first_doc")
        ld = col_i64(t, "last_doc")
        uniq, inv = np.unique(sq, return_inverse=True)
        dmin = np.full(uniq.size, np.iinfo(np.int64).max, np.int64)
        dmax = np.full(uniq.size, np.iinfo(np.int64).min, np.int64)
        np.minimum.at(dmin, inv, fd)
        np.maximum.at(dmax, inv, ld)
        # integer add.at, NOT bincount(weights=...): bincount sums in
        # float64 and chk partials approach 2^53 where doubles go inexact
        nt_out = np.zeros(uniq.size, np.int64)
        ck_out = np.zeros(uniq.size, np.int64)
        np.add.at(nt_out, inv, nt)
        np.add.at(ck_out, inv, ck)
        return ray.data.from_arrow(
            pa.table(
                {
                    "seq_idx": pa.array(uniq),
                    "n_tok": pa.array(nt_out),
                    "first_doc": pa.array(dmin),
                    "last_doc": pa.array(dmax),
                    "chk": pa.array(ck_out),
                }
            )
        )
    return parts.groupby("seq_idx").aggregate(
        Sum(on="n_tok", alias_name="n_tok"),
        Min(on="first_doc", alias_name="first_doc"),
        Max(on="last_doc", alias_name="last_doc"),
        Sum(on="chk", alias_name="chk"),
    )
