"""Tokenizer goldens — FIXTURES.md §F5 (the analyzer defines the vocabulary)."""

import numpy as np
import pyarrow as pa
import pytest

from toshi_ray.analyzer import DefaultAnalyzer, RawAnalyzer, get_analyzer
from toshi_ray.fieldnorm import FIELD_NORMS_TABLE, fieldnorm_to_id, id_to_fieldnorm

an = DefaultAnalyzer()


@pytest.mark.parametrize(
    "text,tokens",
    [
        ("Test Document 1", ["test", "document", "1"]),
        (
            "Took me a while but I'm finally here",
            ["took", "me", "a", "while", "but", "i", "m", "finally", "here"],
        ),
        ("foo-bar_baz", ["foo", "bar", "baz"]),  # _ is not alphanumeric
        ("a" * 41, []),  # RemoveLongFilter drops >= 40 bytes
        ("a" * 40, []),
        ("a" * 39, ["a" * 39]),
        ("", []),
        ("  ...  ", []),
        ("HELLO, World!", ["hello", "world"]),
    ],
)
def test_default_chain_goldens(text, tokens):
    assert an.tokens(text) == tokens


def test_unicode_alphanumeric():
    # Ⅻ is Nl (letter-number) → alphanumeric in Rust char::is_alphanumeric
    assert an.tokens("Ⅻ ROMAN") == ["ⅻ", "roman"]
    assert an.tokens("Füße straße") == ["füße", "straße"]


def test_chain_order_split_then_lowercase():
    """Tantivy's chain is SimpleTokenizer → RemoveLongFilter →
    LowerCaser. A fold-FIRST chain would lowercase 'İ' (U+0130) into a
    form with a combining mark and shred the token at the split step;
    the pinned order splits the raw text, so the token stays whole."""
    # Full-mapping golden (Rust "İstanbul".to_lowercase()): 'İ' expands
    # to 'i' + U+0307 COMBINING DOT ABOVE — SpecialCasing.txt's only
    # unconditional multi-char lowercase entry
    assert an.tokens("İstanbul Meeting") == ["i̇stanbul", "meeting"]
    # ẞ (U+1E9E) → ß: a SIMPLE mapping (UnicodeData.txt), identical in
    # Rust and utf8proc; survives either order
    assert an.tokens("GROẞE") == ["große"]
    # Σ lowers to σ everywhere — tantivy's LowerCaser is per-char and
    # deliberately skips the contextual Final_Sigma rule, like utf8proc
    assert an.tokens("ΟΔΟΣ") == ["οδοσ"]
    # RemoveLongFilter sees ORIGINAL bytes: 19×'İ' is 38 raw bytes
    # (< 40) — kept; 20×'İ' (40 raw bytes) is dropped
    assert an.tokens("İ" * 19) == ["i̇" * 19]
    assert an.tokens("İ" * 20) == []


def test_positions_have_gaps_for_dropped_long_tokens():
    tc = an.tokenize_column(pa.array(["x " + "b" * 50 + " y"]))
    assert tc.terms.to_pylist() == ["x", "y"]
    assert tc.positions.tolist() == [0, 2]  # gap at position 1
    assert tc.norms.tolist() == [2]


def test_column_batch_matches_single():
    texts = ["Hello big World", "", "one-two_three", "a" * 45]
    tc = an.tokenize_column(pa.array(texts))
    per_doc = [[] for _ in texts]
    for t, d in zip(tc.terms.to_pylist(), tc.doc_index):
        per_doc[d].append(t)
    assert per_doc == [an.tokens(t) for t in texts]


def test_raw_analyzer_and_registry():
    assert RawAnalyzer().tokens("Hello World") == ["Hello World"]
    assert isinstance(get_analyzer("default"), DefaultAnalyzer)
    with pytest.raises(ValueError):
        get_analyzer("nope")


def test_fieldnorm_table_shape():
    assert FIELD_NORMS_TABLE.shape == (256,)
    # exact for 0..=40
    assert FIELD_NORMS_TABLE[:41].tolist() == list(range(41))
    # strictly increasing
    assert (np.diff(FIELD_NORMS_TABLE.astype(np.int64)) > 0).all()
    # known exponential entries (tantivy-style blocks of 8, doubling step)
    assert FIELD_NORMS_TABLE[41] == 42
    assert FIELD_NORMS_TABLE[48] == 56
    assert FIELD_NORMS_TABLE[49] == 60
    assert FIELD_NORMS_TABLE[56] == 88


def test_fieldnorm_roundtrip_monotone():
    lengths = np.array([0, 1, 40, 41, 42, 56, 57, 100, 10_000, 1_000_000])
    ids = fieldnorm_to_id(lengths)
    decoded = id_to_fieldnorm(ids)
    assert (decoded <= lengths).all()  # floor quantization
    # exact below 41
    assert (decoded[lengths <= 40] == lengths[lengths <= 40]).all()
