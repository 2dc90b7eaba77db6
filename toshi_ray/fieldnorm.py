"""Byte-quantized fieldnorms — Tantivy-0.19-style 256-bucket length codes.

Tantivy stores one byte per (doc, text field): the field's token count
quantized through a 256-entry table (tantivy 0.19 ``fieldnorm/code.rs``,
engine pinned by the reference — see SURVEY.md §2.2 T3 / §2.5). The
table is exact for lengths 0..=40, then exponential: blocks of 8 ids
whose step doubles each block (41..48 step 2 → 42..56, 49..56 step 4 →
60..88, ...). BM25's length normalization uses the *decoded* value, so
the same quantization must be applied on both index and oracle sides
for score-identical results.

Offline note: this table is reconstructed from public knowledge of
tantivy 0.19 (no network in this sandbox to diff the exact source); the
engine and every oracle in this repo share this single implementation,
so internal rank-identity holds regardless.
"""

from __future__ import annotations

import numpy as np


def _build_table() -> np.ndarray:
    vals = list(range(41))  # 0..=40 exact
    step, cur = 2, 40
    while len(vals) < 256:
        for _ in range(8):
            cur += step
            vals.append(cur)
            if len(vals) == 256:
                break
        step *= 2
    return np.asarray(vals, dtype=np.uint64)


FIELD_NORMS_TABLE: np.ndarray = _build_table()


def fieldnorm_to_id(lengths: np.ndarray) -> np.ndarray:
    """Quantize token counts to 1-byte codes (largest id with table[id] <= len)."""
    idx = np.searchsorted(FIELD_NORMS_TABLE, np.asarray(lengths, dtype=np.uint64), side="right") - 1
    return idx.astype(np.uint8)


def id_to_fieldnorm(ids: np.ndarray) -> np.ndarray:
    """Decode 1-byte codes back to (quantized) token counts."""
    return FIELD_NORMS_TABLE[np.asarray(ids, dtype=np.int64)]
