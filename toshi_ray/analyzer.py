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

Chain ORDER matches tantivy exactly: the un-lowered column is split,
the 40-byte RemoveLongFilter is applied to the ORIGINAL token bytes,
and only the surviving tokens are lowercased (LowerCaser last). This
matters on Unicode input where case folding changes character class or
byte length — a fold-first chain would lowercase 'İ' (U+0130) into a
combining-mark form and shred the token at the split step; the pinned
engine (and this chain) keeps the token whole. Still the same two
Arrow kernels, just swapped — lowercasing now touches only kept
tokens. On ASCII text the DuckDB oracle twin
(`regexp_split_to_array(lower(text), ...)`) remains byte-identical.

Lowercase semantics match Rust `char::to_lowercase` (what tantivy's
LowerCaser applies per character, deliberately WITHOUT the contextual
Final_Sigma rule): Arrow's `utf8_lower` (utf8proc simple mapping)
plus an explicit pre-expansion of U+0130 'İ' → 'i' + U+0307 — the
single character whose full Unicode lowercase is multi-char
(SpecialCasing.txt's only unconditional lowercase entry). 'ẞ'→'ß'
and Σ→σ-everywhere are already identical in both mappings. No known
engine-parity gap remains.
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
        # SimpleTokenizer first: split the UN-lowered text (LowerCaser
        # runs last in tantivy's chain — see module docstring)
        lists = pc.split_pattern_regex(col, pattern=_SPLIT_PATTERN)
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

        # RemoveLongFilter sees the ORIGINAL token bytes (pre-lowering);
        # LowerCaser is last and touches only the kept tokens
        keep = nonempty & (byte_len < MAX_TOKEN_BYTES)
        keep_idx = np.nonzero(keep)[0]
        kept = flat.take(pa.array(keep_idx))
        # Full-mapping parity with Rust char::to_lowercase (tantivy's
        # LowerCaser lowercases per char and deliberately skips the
        # contextual Final_Sigma rule): the ONLY character whose full
        # lowercase differs from the simple map utf8proc applies is
        # U+0130 'İ' → "i" + U+0307 (SpecialCasing.txt's sole
        # unconditional multi-char lowercase entry). Expand it BEFORE
        # utf8_lower — afterwards the 'İ'/'i' distinction is gone.
        # Gate the (allocation-heavy) replace behind a vectorized scan
        # for \u0130's UTF-8 lead byte 0xC4: ~0.4 ms vs ~16 ms per 4k-doc
        # batch, and ASCII corpora (the common case) never pay the
        # replace. False positives (any U+0100-U+013F char) just fall
        # through to the always-correct replace path.
        vb = kept.buffers()[2]
        if vb is not None and bool((np.frombuffer(vb, np.uint8) == 0xC4).any()):
            kept = pc.replace_substring(
                kept, pattern="\u0130", replacement="i\u0307"
            )
        terms = pc.utf8_lower(kept)
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
