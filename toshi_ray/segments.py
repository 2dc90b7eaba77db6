"""Immutable segment format — the on-disk unit of the index.

A segment mirrors what a Tantivy segment holds (SURVEY.md §1.1
"Segment"; reference opens them via `toshi-server/src/handle.rs:221-232`)
re-expressed as Parquet so Ray Data / pyarrow can stream it:

    seg-<min_doc>-<n>/
      postings.parquet   term dictionary + compressed posting lists
                         (field, term, shard, df, doc_ids Δ+varint,
                          tfs varint, positions Δ+varint,
                          block_max_tf / block_min_norm per 128-doc block,
                          max_tf)       — sorted by (field, term, shard)
      docvalues.parquet  per-doc columnar values: doc_id, 1-byte fieldnorm
                         codes per text field, numeric fast fields,
                         facet paths  — sorted by doc_id
      store.parquet      stored fields for retrieval — sorted by doc_id
      meta.json          doc counts + exact per-field token totals
                         (global BM25 stats are summed from these)

All posting lists for one batch of documents are built in ONE
vectorized pass (dictionary-encode + lexsort + reduceat); the varint
payloads for every term are produced by a single segmented encode.

Multiple rows may exist for one (field, term): hot terms are sharded by
doc-range (`shard` column) so the merge stage can salt skewed keys and
readers just concatenate shards in order (SURVEY.md §7.3/§7.4).
"""

from __future__ import annotations

import json
import os
import uuid
from dataclasses import dataclass

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from toshi_ray import codecs
from toshi_ray.analyzer import get_analyzer
from toshi_ray.fieldnorm import fieldnorm_to_id
from toshi_ray.schema import FACET, Schema

POSTINGS_FILE = "postings.parquet"
DOCVALUES_FILE = "docvalues.parquet"
STORE_FILE = "store.parquet"
META_FILE = "meta.json"

POSTINGS_SCHEMA_FIXED = [
    ("field", pa.string()),
    ("term", pa.string()),
    ("shard", pa.int32()),
    ("df", pa.uint32()),
    ("first_doc", pa.uint64()),
    ("total_tf", pa.uint64()),
    ("max_tf", pa.uint32()),
    ("doc_ids", pa.large_binary()),
    ("tfs", pa.large_binary()),
    ("positions", pa.large_binary()),
    # WAND skip metadata, one entry per 128-doc block:
    ("block_max_tf", pa.large_binary()),      # varint max tf per block
    ("block_min_norm", pa.large_binary()),    # u8 min fieldnorm code per block
    ("block_doc_offsets", pa.large_binary()), # i32 LE byte offsets into doc_ids (n+1)
    ("block_tf_offsets", pa.large_binary()),  # i32 LE byte offsets into tfs (n+1)
    ("block_last_doc", pa.large_binary()),    # u64 LE last doc_id per block
]


def _binary_from_offsets(payload: bytes, byte_offsets: np.ndarray) -> pa.Array:
    """Wrap one contiguous payload + per-list offsets as a LargeBinaryArray
    without copying per list."""
    return pa.LargeBinaryArray.from_buffers(
        pa.large_binary(),
        len(byte_offsets) - 1,
        [None, pa.py_buffer(byte_offsets.astype(np.int64)), pa.py_buffer(payload)],
    )


def _block_starts(list_offsets: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Starts of 128-doc blocks for many concatenated lists.

    Returns (flat block start indices, per-list block counts)."""
    lens = np.diff(list_offsets)
    n_blocks = (lens + codecs.BLOCK - 1) // codecs.BLOCK
    n_blocks = np.maximum(n_blocks, 1)  # empty list still gets 1 (degenerate)
    reps = np.repeat(list_offsets[:-1], n_blocks)
    within = (np.arange(n_blocks.sum()) - np.repeat(np.cumsum(n_blocks) - n_blocks, n_blocks))
    return reps + within * codecs.BLOCK, n_blocks


@dataclass
class PostingsBatch:
    """Vectorized posting-list build result for one text field."""

    table: pa.Table  # POSTINGS_SCHEMA_FIXED rows for this field
    total_tokens: int


def build_field_postings(
    field_name: str,
    tokenizer: str,
    col: pa.Array,
    doc_ids: np.ndarray,
    record_positions: bool,
    shard: int = 0,
) -> tuple[PostingsBatch, np.ndarray]:
    """Build sorted, compressed posting lists for one field of one doc batch.

    ``doc_ids`` must be sorted ascending (caller sorts the batch).
    Returns the postings rows plus the per-doc fieldnorm token counts.
    """
    analyzer = get_analyzer(tokenizer)
    tc = analyzer.tokenize_column(col)
    term_ids, vocab = tc.term_ids()
    n_docs = len(doc_ids)

    if term_ids.size == 0:
        empty = pa.table(
            {name: pa.array([], type=t) for name, t in POSTINGS_SCHEMA_FIXED}
        )
        return PostingsBatch(table=empty, total_tokens=0), np.zeros(n_docs, np.int64)

    # vocab order from dictionary_encode is first-appearance; remap to
    # sorted (arrow C++ sort on the strings, numpy only on the indices)
    sort_vocab = pa.compute.sort_indices(vocab).to_numpy(zero_copy_only=False).astype(np.int64)
    rank = np.empty_like(sort_vocab)
    rank[sort_vocab] = np.arange(sort_vocab.size)
    term_ids = rank[term_ids]
    vocab_sorted = vocab.take(pa.array(sort_vocab))

    order = np.lexsort((tc.positions, tc.doc_index, term_ids))
    t = term_ids[order]
    d = tc.doc_index[order]
    p = tc.positions[order]

    # (term, doc) group boundaries → tf per posting, positions per posting
    new_group = np.empty(t.size, dtype=bool)
    new_group[0] = True
    np.not_equal(t[1:], t[:-1], out=new_group[1:])
    nd = d[1:] != d[:-1]
    new_group[1:] |= nd
    group_starts = np.nonzero(new_group)[0]
    group_offsets = np.concatenate([group_starts, [t.size]]).astype(np.int64)
    tfs_flat = np.diff(group_offsets).astype(np.uint64)
    g_term = t[group_starts]
    g_doc = d[group_starts]
    doc_ids_flat = doc_ids[g_doc].astype(np.uint64)

    # term group boundaries over the (term,doc) groups
    new_term = np.empty(g_term.size, dtype=bool)
    new_term[0] = True
    np.not_equal(g_term[1:], g_term[:-1], out=new_term[1:])
    term_starts = np.nonzero(new_term)[0]
    term_offsets = np.concatenate([term_starts, [g_term.size]]).astype(np.int64)
    df = np.diff(term_offsets).astype(np.uint32)
    terms_present = vocab_sorted.take(pa.array(g_term[term_starts]))

    # block boundaries in (term,doc)-group value space; the first block
    # of each term starts at the term's offset, so block bounds are a
    # superset of term bounds — ONE segmented encode covers both, and
    # every block restarts with an absolute doc id (independent decode
    # = the WAND skip unit)
    bstarts, n_blocks = _block_starts(term_offsets)
    block_bounds = np.concatenate([bstarts, [np.int64(g_term.size)]]).astype(np.int64)
    gaps = codecs.segmented_delta(doc_ids_flat, block_bounds)
    doc_payload, blk_byte_offs = codecs.segmented_varint_encode(gaps, block_bounds)
    tf_payload, tf_blk_byte_offs = codecs.segmented_varint_encode(tfs_flat, block_bounds)

    # per-term first-block indices into the flat block arrays
    blk_boffs_list = np.zeros(term_offsets.size, dtype=np.int64)
    np.cumsum(n_blocks, out=blk_boffs_list[1:])
    doc_boffs = blk_byte_offs[blk_boffs_list]  # per-term byte offsets
    tf_boffs = tf_blk_byte_offs[blk_boffs_list]

    # per-term aggregates
    total_tf = np.add.reduceat(tfs_flat, term_offsets[:-1]).astype(np.uint64)
    max_tf = np.maximum.reduceat(tfs_flat, term_offsets[:-1]).astype(np.uint32)

    # block-max metadata (128-doc blocks within each term's posting list)
    blk_max_tf = np.maximum.reduceat(tfs_flat, bstarts).astype(np.uint64)
    bm_payload, bm_boffs = codecs.segmented_varint_encode(blk_max_tf, blk_boffs_list)

    # block min fieldnorm code per block (needs norms per posting doc)
    norm_codes = fieldnorm_to_id(tc.norms)
    posting_norms = norm_codes[g_doc].astype(np.uint8)
    blk_min_norm = np.minimum.reduceat(posting_norms, bstarts).astype(np.uint8)
    bn_payload = blk_min_norm.tobytes()
    bn_boffs = blk_boffs_list  # one byte per block

    # per-term block byte-offset tables (n_blocks+1 i32 entries, relative
    # to the term's blob start) + per-block last doc id (u64)
    n_entries = n_blocks + 1
    ent_base = np.zeros(term_offsets.size, dtype=np.int64)
    np.cumsum(n_entries, out=ent_base[1:])
    gather = np.repeat(blk_boffs_list[:-1], n_entries) + (
        np.arange(int(n_entries.sum()), dtype=np.int64) - np.repeat(ent_base[:-1], n_entries)
    )
    rel_doc = blk_byte_offs[gather] - np.repeat(blk_byte_offs[blk_boffs_list[:-1]], n_entries)
    rel_tf = tf_blk_byte_offs[gather] - np.repeat(tf_blk_byte_offs[blk_boffs_list[:-1]], n_entries)
    bdo_payload = rel_doc.astype(np.int32).tobytes()
    bto_payload = rel_tf.astype(np.int32).tobytes()
    bdo_boffs = ent_base * 4
    block_ends = block_bounds[1:]
    blk_last = doc_ids_flat[np.maximum(block_ends - 1, 0)]
    bld_payload = blk_last.astype(np.uint64).tobytes()
    bld_boffs = blk_boffs_list * 8

    if record_positions:
        # positions delta-encoded within each (term,doc) group
        pos_gaps = codecs.segmented_delta(p.astype(np.uint64), group_offsets)
        # slice at TERM boundaries: byte offsets of term starts in token space
        term_token_offsets = group_offsets[:-1][term_starts]
        term_token_offsets = np.concatenate([term_token_offsets, [t.size]]).astype(np.int64)
        pos_payload, pos_boffs = codecs.segmented_varint_encode(pos_gaps, term_token_offsets)
        pos_arr = _binary_from_offsets(pos_payload, pos_boffs)
    else:
        pos_arr = pa.nulls(df.size, type=pa.large_binary())

    table = pa.table(
        {
            "field": pa.array([field_name] * df.size, type=pa.string()),
            "term": terms_present.cast(pa.string()),
            "shard": pa.array(np.full(df.size, shard, np.int32)),
            "df": pa.array(df),
            "first_doc": pa.array(doc_ids_flat[term_offsets[:-1]]),
            "total_tf": pa.array(total_tf),
            "max_tf": pa.array(max_tf),
            "doc_ids": _binary_from_offsets(doc_payload, doc_boffs),
            "tfs": _binary_from_offsets(tf_payload, tf_boffs),
            "positions": pos_arr,
            "block_max_tf": _binary_from_offsets(bm_payload, bm_boffs),
            "block_min_norm": _binary_from_offsets(bn_payload, bn_boffs),
            "block_doc_offsets": _binary_from_offsets(bdo_payload, bdo_boffs),
            "block_tf_offsets": _binary_from_offsets(bto_payload, bdo_boffs.copy()),
            "block_last_doc": _binary_from_offsets(bld_payload, bld_boffs),
        }
    )
    return PostingsBatch(table=table, total_tokens=int(tc.norms.sum())), tc.norms


def build_segment_tables(
    batch: pa.Table, schema: Schema, doc_id_col: str = "doc_id"
) -> tuple[pa.Table, pa.Table, pa.Table, dict]:
    """Turn one batch of documents into (postings, docvalues, store, meta)."""
    if doc_id_col not in batch.column_names:
        raise ValueError(f"batch must carry a '{doc_id_col}' column")
    order = pa.compute.sort_indices(batch[doc_id_col])
    batch = batch.take(order)
    doc_ids = batch[doc_id_col].to_numpy(zero_copy_only=False).astype(np.uint64)

    posting_parts: list[pa.Table] = []
    dv_cols: dict[str, pa.Array] = {doc_id_col: pa.array(doc_ids, type=pa.uint64())}
    field_stats: dict[str, dict] = {}
    # zone map: [min, max, n_valid] per integer fast field — a range /
    # numeric-term query skips the whole segment (no docvalues data
    # pages) when its bounds are disjoint with the segment's; n_valid
    # (the NON-NULL value count — docs missing the field don't carry a
    # value) lets the sort-by floor bound the k-th value soundly
    fastfield_stats: dict[str, list[int]] = (
        {doc_id_col: [int(doc_ids.min()), int(doc_ids.max()), int(len(doc_ids))]}
        if len(doc_ids)
        else {}
    )

    for f in schema.fields:
        if f.is_text and f.indexed:
            if f.name not in batch.column_names:
                continue
            pb, norms = build_field_postings(
                f.name, f.tokenizer, batch[f.name], doc_ids, f.positions
            )
            posting_parts.append(pb.table)
            dv_cols[f"norm_{f.name}"] = pa.array(fieldnorm_to_id(norms))
            field_stats[f.name] = {"total_tokens": pb.total_tokens}
        elif f.is_numeric and f.indexed and f.name in batch.column_names:
            col = batch[f.name]
            if f.type == "u64":
                dv_cols[f.name] = col.cast(pa.uint64()).combine_chunks()
            elif f.type == "date":
                dv_cols[f.name] = col.cast(pa.timestamp("us")).combine_chunks()
            else:
                dv_cols[f.name] = col.cast(pa.int64()).combine_chunks()
            if f.type != "date":
                arr = dv_cols[f.name]
                mm = pa.compute.min_max(arr)
                if mm["min"].is_valid:
                    fastfield_stats[f.name] = [
                        mm["min"].as_py(),
                        mm["max"].as_py(),
                        len(arr) - arr.null_count,
                    ]
        elif f.type == FACET and f.name in batch.column_names:
            dv_cols[f"facet_{f.name}"] = batch[f.name].cast(pa.string()).combine_chunks()

    postings = (
        pa.concat_tables(posting_parts).sort_by(
            [("field", "ascending"), ("term", "ascending"), ("shard", "ascending")]
        )
        if posting_parts
        else pa.table({name: pa.array([], type=t) for name, t in POSTINGS_SCHEMA_FIXED})
    )
    docvalues = pa.table(dv_cols)

    stored_names = [doc_id_col] + [
        f.name for f in schema.stored_fields if f.name in batch.column_names and f.name != doc_id_col
    ]
    store = batch.select(stored_names)

    meta = {
        "num_docs": len(batch),
        "min_doc_id": int(doc_ids.min()) if len(doc_ids) else 0,
        "max_doc_id": int(doc_ids.max()) if len(doc_ids) else 0,
        "field_stats": field_stats,
        "fastfield_stats": fastfield_stats,
        "num_terms": postings.num_rows,
    }
    return postings, docvalues, store, meta


def write_segment(
    segments_dir: str,
    postings: pa.Table,
    docvalues: pa.Table,
    store: pa.Table,
    meta: dict,
    name: str | None = None,
) -> dict:
    """Atomically write one segment directory; idempotent by segment name.

    Resumability: the name is deterministic from content (doc range +
    count), so a rerun of the same partition skips the write — this is
    the per-partition checkpoint unit (SURVEY.md §7.4 "Resumability").
    """
    name = name or f"seg-{meta['min_doc_id']:012d}-{meta['num_docs']}"
    meta = dict(meta, name=name)
    final = os.path.join(segments_dir, name)
    if os.path.exists(os.path.join(final, META_FILE)):
        with open(os.path.join(final, META_FILE)) as f:
            return json.load(f)
    tmp = os.path.join(segments_dir, f".tmp-{name}-{uuid.uuid4().hex[:8]}")
    os.makedirs(tmp, exist_ok=True)
    pq.write_table(postings, os.path.join(tmp, POSTINGS_FILE))
    from toshi_ray import termbloom

    bloom = termbloom.build_term_blooms(postings)
    if bloom is not None:
        payload, bmeta = bloom
        with open(os.path.join(tmp, termbloom.TERMBLOOM_FILE), "wb") as f:
            f.write(payload)
        meta["term_bloom"] = bmeta
    pq.write_table(docvalues, os.path.join(tmp, DOCVALUES_FILE))
    pq.write_table(store, os.path.join(tmp, STORE_FILE))
    with open(os.path.join(tmp, META_FILE), "w") as f:
        json.dump(meta, f)
    from toshi_ray.storage import get_storage

    # losing the publish race to an identical-content twin keeps theirs;
    # any other failure raises (see toshi_ray.storage)
    get_storage().publish_dir(tmp, final, META_FILE)
    return meta


POSTINGS_CACHE_MAX_BYTES = 256 << 20  # above this, pushdown instead of caching

# every postings column EXCEPT positions — the projection term scoring uses
POSTINGS_SANS_POSITIONS = [n for n, _ in POSTINGS_SCHEMA_FIXED if n != "positions"]


class SegmentReader:
    """Lazy reader over one segment directory.

    Postings are fetched with a parquet predicate on (field, term) so a
    query only pulls the posting rows it needs; docvalues (norms / fast
    fields) load once per reader and are held for the reader's lifetime
    (the scorer-actor state, SURVEY.md §7.2).
    """

    def __init__(
        self,
        seg_dir: str,
        cache_postings: bool | None = None,
        cache_max_bytes: int = POSTINGS_CACHE_MAX_BYTES,
    ):
        """``cache_postings`` keeps the segment's postings table + a
        sorted (field, term) index in the reader after first touch —
        the scorer-actor state (SURVEY.md §7.2). Default (None) chooses
        by on-disk postings size: segments above ``cache_max_bytes``
        fall back to parquet predicate pushdown per query so a scorer
        actor never pulls a whole over-heap segment into memory."""
        self.dir = seg_dir
        with open(os.path.join(seg_dir, META_FILE)) as f:
            self.meta = json.load(f)
        if cache_postings is None:
            cache_postings = self._postings_bytes() <= cache_max_bytes
        self.cache_postings = cache_postings
        self._docvalues: pa.Table | None = None
        self._dv_partial: pa.Table | None = None  # column-projected cache
        self._dv_names: list[str] | None = None
        self._postings_all: pa.Table | None = None
        self._term_index: dict | None = None  # field -> (sorted terms np, row idx np)
        self._df_col: np.ndarray | None = None  # set with the term index
        self._bloom_bits: np.ndarray | None = None  # lazy termbloom.bin

    def _postings_bytes(self) -> int:
        p = self._path(POSTINGS_FILE)
        if os.path.isdir(p):
            return sum(
                os.path.getsize(os.path.join(dp, f))
                for dp, _, fs in os.walk(p)
                for f in fs
            )
        return os.path.getsize(p)

    def _path(self, fname: str) -> str:
        """A segment part is a single file (fresh build) or a directory
        of parquet parts (merged segment)."""
        p = os.path.join(self.dir, fname)
        if os.path.exists(p):
            return p
        alt = os.path.join(self.dir, fname.replace(".parquet", ""))
        if os.path.isdir(alt):
            return alt
        raise FileNotFoundError(p)

    @property
    def num_docs(self) -> int:
        return self.meta["num_docs"]

    def dv_column_names(self) -> list[str]:
        """Docvalues schema from the parquet FOOTER — no data pages."""
        if self._dv_names is None:
            p = self._path(DOCVALUES_FILE)
            if os.path.isdir(p):
                p = os.path.join(
                    p, sorted(f for f in os.listdir(p) if f.endswith(".parquet"))[0]
                )
            self._dv_names = list(pq.ParquetFile(p).schema_arrow.names)
        return self._dv_names

    def docvalues(self, columns: list[str] | None = None) -> pa.Table:
        """Fast-field (docvalues) columns. ``columns`` projects the read:
        only the requested columns' data pages are fetched from storage
        (a range/sort query touches ONE fast field — at corpus scale the
        other columns are most of the file). Projected fetches accumulate
        in a partial cache; a full-table read (columns=None) supersedes
        it. Row order is deterministic across separate column fetches:
        merged side files carry order-preserving lexicographic names."""
        if columns is None:
            if self._docvalues is None:
                self._docvalues = pq.read_table(self._path(DOCVALUES_FILE))
                self._dv_partial = None
            return self._docvalues
        if self._docvalues is not None:
            return self._docvalues.select(columns)
        have = set(self._dv_partial.column_names) if self._dv_partial is not None else set()
        missing = [c for c in columns if c not in have]
        if missing:
            t = pq.read_table(self._path(DOCVALUES_FILE), columns=missing)
            if self._dv_partial is None:
                self._dv_partial = t
            else:
                for name in missing:
                    self._dv_partial = self._dv_partial.append_column(
                        t.schema.field(name), t[name]
                    )
        return self._dv_partial.select(columns)

    def doc_ids(self) -> np.ndarray:
        return self.docvalues(["doc_id"])["doc_id"].to_numpy(zero_copy_only=False)

    def _ensure_term_index(self) -> None:
        if self._term_index is not None:
            return
        t = self.all_postings()
        self._term_index = {}
        self._df_col = t["df"].to_numpy(zero_copy_only=False).astype(np.int64)
        fields = t["field"].to_numpy(zero_copy_only=False)
        terms = t["term"].to_numpy(zero_copy_only=False)
        for f in np.unique(fields):
            rows = np.nonzero(fields == f)[0]
            ft = terms[rows]
            order = np.argsort(ft, kind="stable")  # shard rows keep order (stable)
            self._term_index[f] = (ft[order], rows[order])

    def _bloom_surviving(self, field: str, terms: list[str]) -> list[str]:
        """Terms the segment MAY contain, per the term bloom filter
        (toshi_ray.termbloom). Segments without a bloom (pre-v5 or
        empty) return ``terms`` unchanged — pruning is opt-in and
        sound: a written term is always present in its bloom, and a
        field with any postings always has a bloom entry, so an empty
        survivor list proves the postings probe would find nothing."""
        bm = self.meta.get("term_bloom")
        if not bm or not terms:
            return terms
        fm = bm["fields"].get(field)
        if fm is None:
            return []  # segment holds no postings for this field at all
        from toshi_ray import termbloom

        if self._bloom_bits is None:
            self._bloom_bits = np.fromfile(
                os.path.join(self.dir, bm.get("file", termbloom.TERMBLOOM_FILE)),
                dtype=np.uint8,
            )
        mask = termbloom.may_contain(self._bloom_bits, fm, terms, bm["k"])
        return [t for t, keep in zip(terms, mask) if keep]

    def _empty_postings(self, columns: list[str] | None) -> pa.Table:
        """Zero-row postings table with the canonical schema — returned
        by bloom-pruned probes without touching the postings file."""
        t = pa.table({n: pa.array([], type=ty) for n, ty in POSTINGS_SCHEMA_FIXED})
        return t.select(columns) if columns is not None else t

    def df_for_terms(self, field: str, terms: list[str]) -> dict[str, int]:
        """{term: df summed across shard rows} WITHOUT touching the
        posting payload columns — the stats phase only needs df, and a
        hot term's payload is MBs it must not copy."""
        terms = self._bloom_surviving(field, terms)
        if not terms:
            return {}
        if self.cache_postings:
            self._ensure_term_index()
            idx = self._term_index.get(field)
            if idx is None:
                return {}
            sorted_terms, rows = idx
            want = np.asarray(sorted(terms), dtype=object)
            lo = np.searchsorted(sorted_terms, want, side="left")
            hi = np.searchsorted(sorted_terms, want, side="right")
            return {
                t: int(self._df_col[rows[a:b]].sum())
                for t, a, b in zip(want, lo, hi)
                if b > a
            }
        import pyarrow.dataset as pads

        expr = (pads.field("field") == field) & pads.field("term").isin(terms)
        t = pq.read_table(
            self._path(POSTINGS_FILE), columns=["term", "df"], filters=expr
        )
        out: dict[str, int] = {}
        for term, df in zip(t["term"].to_pylist(), t["df"].to_pylist()):
            out[term] = out.get(term, 0) + int(df)
        return out

    def postings_for_terms(
        self, field: str, terms: list[str], columns: list[str] | None = None
    ) -> pa.Table:
        """``columns`` projects the fetch — term scoring passes
        POSTINGS_SANS_POSITIONS so the positions payload (usually the
        largest column) is never copied for non-phrase queries."""
        terms = self._bloom_surviving(field, terms)
        if not terms:
            return self._empty_postings(columns)
        if self.cache_postings:
            self._ensure_term_index()
            src = self.all_postings()
            if columns is not None:
                src = src.select(columns)
            idx = self._term_index.get(field)
            if idx is None:
                return src.slice(0, 0)
            sorted_terms, rows = idx
            want = np.asarray(sorted(terms), dtype=object)
            lo = np.searchsorted(sorted_terms, want, side="left")
            hi = np.searchsorted(sorted_terms, want, side="right")
            take = np.concatenate(
                [rows[a:b] for a, b in zip(lo, hi)] or [np.empty(0, np.int64)]
            )
            return src.take(pa.array(np.sort(take)))
        import pyarrow.dataset as pads

        expr = (pads.field("field") == field) & pads.field("term").isin(terms)
        return pq.read_table(
            self._path(POSTINGS_FILE), filters=expr, columns=columns
        )

    def all_postings(self, field: str | None = None) -> pa.Table:
        if self._postings_all is None:
            self._postings_all = pq.read_table(self._path(POSTINGS_FILE)).combine_chunks()
        t = self._postings_all
        if field is not None:
            t = t.filter(pa.compute.equal(t["field"], field))
        return t

    def term_dict(self, field: str) -> pa.Table:
        """(term, df, max_tf) for automaton queries (fuzzy/regex)."""
        if self.cache_postings:
            return self.all_postings(field).select(["field", "term", "df", "max_tf"])
        t = pq.read_table(
            self._path(POSTINGS_FILE),
            columns=["field", "term", "df", "max_tf"],
        )
        return t.filter(pa.compute.equal(t["field"], field))

    def store(self, doc_ids: np.ndarray | None = None) -> pa.Table:
        if doc_ids is None:
            return pq.read_table(self._path(STORE_FILE))
        # store is sorted by doc_id → parquet row-group stats prune the
        # read down to the winners' groups (fetch-only-what-you-rank)
        import pyarrow.dataset as pads

        wanted = pa.array(np.asarray(doc_ids, dtype=np.uint64), type=pa.uint64())
        return pq.read_table(
            self._path(STORE_FILE), filters=pads.field("doc_id").isin(wanted)
        )


def decode_posting_row(row: dict) -> tuple[np.ndarray, np.ndarray]:
    """(doc_ids, tfs) from one postings row (dict of scalars)."""
    doc_ids = codecs.decode_doc_ids_blocked(row["doc_ids"], int(row["df"]))
    tfs = codecs.varint_decode(row["tfs"])
    return doc_ids, tfs


def decode_positions(row: dict, tfs: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Flat positions + per-doc offsets for one postings row."""
    gaps = codecs.varint_decode(row["positions"])
    offsets = np.zeros(tfs.size + 1, dtype=np.int64)
    np.cumsum(tfs.astype(np.int64), out=offsets[1:])
    cs = np.cumsum(gaps, dtype=np.uint64)
    starts = offsets[:-1]
    base = np.zeros_like(cs)
    valid = starts[starts < cs.size]
    lens = np.diff(offsets)
    base_per_group = cs[valid] - gaps[valid]
    positions = cs - np.repeat(base_per_group, lens[: valid.size])
    return positions, offsets
