"""Text analysis chain — Tantivy 0.19 "default" analyzer, vectorized over Arrow.

The reference selects tokenizer "default" in its schemas (reference
`schema.json:8`, `toshi-server/src/handlers/index.rs:86-87`); tantivy
0.19's default chain is:

    SimpleTokenizer   — split on non-alphanumeric (Unicode: L* | N*)
    RemoveLongFilter  — drop tokens whose UTF-8 byte length >= 40
    LowerCaser        — Unicode lowercase

This chain defines the index vocabulary, so it is implemented ONCE here
and shared by the index build, query-side analysis and every oracle.
Token *positions* are assigned before RemoveLongFilter runs (dropping a
long token leaves a position gap), matching tantivy's tokenizer/filter
split — phrase queries see those gaps.

Everything is vectorized: `pyarrow.compute` regex split + numpy offset
arithmetic; no Python loop over rows or tokens.

INTENTIONAL DIVERGENCE (documented, like the SQL-twin caveat): this
implementation lowercases BEFORE splitting, while tantivy's chain
splits first and lowercases last. The two differ only when Unicode
case-folding changes the character class or byte length of a token —
e.g. 'İ' folds to 'i' + combining U+0307, which then splits, or a
token whose lowercase form crosses the 40-byte limit. On ASCII text
(all test corpora, and the DuckDB oracle twin) the chains are
byte-identical; we keep the fold-first order because it lets the whole
batch run through two Arrow kernels with no per-token pass.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# Unicode alphanumeric run (RE2 syntax, used by the Arrow kernel).
_SPLIT_PATTERN = r"[^\p{L}\p{N}]+"
MAX_TOKEN_BYTES = 40  # RemoveLongFilter::limit(40): keep len(utf8) < 40


@dataclass
class TokenizedColumn:
    """Flat (token, doc, position) triples for one analyzed column.

    ``terms`` is a flat Arrow string array; ``doc_index[i]`` is the
    row-in-batch the i-th token came from; ``positions[i]`` its position
    in that row's token stream (with gaps where long tokens dropped);
    ``norms[d]`` the per-row kept-token count (fieldnorm input).
    """

    terms: pa.Array
    doc_index: np.ndarray
    positions: np.ndarray
    norms: np.ndarray

    def term_ids(self) -> tuple[np.ndarray, pa.Array]:
        """Dictionary-encode terms → (int32 ids, vocab string array)."""
        d = self.terms.dictionary_encode()
        return d.indices.to_numpy(zero_copy_only=False), d.dictionary


class DefaultAnalyzer:
    """Tantivy-0.19 "default" chain, batch-vectorized."""

    name = "default"

    def tokenize_column(self, col: pa.Array | pa.ChunkedArray) -> TokenizedColumn:
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        col = pc.fill_null(col, "")
        lowered = pc.utf8_lower(col)
        lists = pc.split_pattern_regex(lowered, pattern=_SPLIT_PATTERN)
        if isinstance(lists, pa.ChunkedArray):
            lists = lists.combine_chunks()
        flat = lists.flatten()
        offsets = lists.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        n_docs = len(lists)
        counts = np.diff(offsets)
        doc_index = np.repeat(np.arange(n_docs, dtype=np.int64), counts)

        byte_len = pc.binary_length(flat.cast(pa.binary())).to_numpy(zero_copy_only=False)
        nonempty = byte_len > 0
        # position = index among this doc's non-empty tokens (pre-filter)
        cum = np.cumsum(nonempty, dtype=np.int64)
        base_at_doc_start = np.zeros(n_docs, dtype=np.int64)
        has = counts > 0
        starts = offsets[:-1]
        base_at_doc_start[has] = cum[starts[has]] - nonempty[starts[has]]
        positions_all = cum - 1 - base_at_doc_start[doc_index] if len(flat) else cum

        keep = nonempty & (byte_len < MAX_TOKEN_BYTES)
        keep_idx = np.nonzero(keep)[0]
        terms = flat.take(pa.array(keep_idx))
        doc_index = doc_index[keep_idx]
        positions = positions_all[keep_idx] if len(flat) else np.empty(0, np.int64)
        norms = np.bincount(doc_index, minlength=n_docs).astype(np.int64)
        return TokenizedColumn(terms=terms, doc_index=doc_index, positions=positions, norms=norms)

    def tokens(self, text: str) -> list[str]:
        """Single-string analysis (query side) — same kernel, same semantics."""
        tc = self.tokenize_column(pa.array([text], type=pa.string()))
        return tc.terms.to_pylist()


class RawAnalyzer:
    """Tantivy "raw" tokenizer: the whole value as one token, unchanged."""

    name = "raw"

    def tokenize_column(self, col: pa.Array | pa.ChunkedArray) -> TokenizedColumn:
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        col = pc.fill_null(col, "")
        n = len(col)
        return TokenizedColumn(
            terms=col,
            doc_index=np.arange(n, dtype=np.int64),
            positions=np.zeros(n, dtype=np.int64),
            norms=np.ones(n, dtype=np.int64),
        )

    def tokens(self, text: str) -> list[str]:
        return [text]


class CjkAnalyzer:
    """CJK-friendly analyzer: each Han character becomes its own token
    (unigram segmentation, Lucene StandardAnalyzer behavior); other
    alphanumeric runs tokenize like "default".

    The reference registers a pluggable Chinese tokenizer (CangJie)
    behind a cargo feature (`toshi-server/src/lib.rs:57-72`); this
    exercises the same extension surface with a public algorithm.
    """

    name = "cjk"
    _HAN = r"[\p{Han}]"

    def tokenize_column(self, col):
        import pyarrow.compute as pc

        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        # isolate each Han char with spaces, then run the default chain
        spaced = pc.replace_substring_regex(
            pc.fill_null(col, ""), pattern=f"({self._HAN})", replacement=" \\1 "
        )
        return DefaultAnalyzer().tokenize_column(spaced)

    def tokens(self, text: str) -> list[str]:
        tc = self.tokenize_column(pa.array([text], type=pa.string()))
        return tc.terms.to_pylist()


_REGISTRY = {
    "default": DefaultAnalyzer,
    "raw": RawAnalyzer,
    "cjk": CjkAnalyzer,
}


def register_analyzer(name: str, factory) -> None:
    """User-extension point mirroring Toshi's pluggable tokenizer registry
    (reference `toshi-server/src/lib.rs:57-72`)."""
    _REGISTRY[name] = factory


def get_analyzer(name: str):
    try:
        return _REGISTRY[name]()
    except KeyError:
        raise ValueError(f"Unknown tokenizer: {name!r}") from None
