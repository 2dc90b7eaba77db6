"""Posting-list compression codecs — vectorized numpy, no Python loops over values.

Two codecs, mirroring what a Tantivy-style segment uses for postings
(reference: Toshi pins tantivy 0.19, see SURVEY.md §1.1 "Segment"):

* **delta + varint** (LEB128): doc-id gaps / term freqs / position gaps.
* **bitpacked blocks** (frame-of-reference, 128-value blocks): the
  block codec used for long posting lists; block boundaries carry the
  per-block max doc_id so readers can skip blocks (block-max metadata
  for WAND lives beside it in the segment, see segments.py).

All encoders take / return numpy arrays and stay vectorized: encode
loops are bounded by max-bytes-per-value (≤10) or bits-per-value
(≤32), never by the number of values.
"""

from __future__ import annotations

import numpy as np

_U64 = np.uint64
_SEVEN = _U64(7)
_MASK7 = _U64(0x7F)

BLOCK = 128  # values per bitpacked block (Lucene/Tantivy-style)


def varint_byte_lengths(values: np.ndarray) -> np.ndarray:
    """Number of LEB128 bytes each value needs (vectorized)."""
    v = np.asarray(values, dtype=_U64)
    n = np.ones(v.shape, dtype=np.int64)
    x = v >> _SEVEN
    while x.any():
        n += (x > 0)
        x = x >> _SEVEN
    return n


def varint_encode(values: np.ndarray) -> bytes:
    """LEB128-encode a uint array into one contiguous byte string."""
    v = np.asarray(values, dtype=_U64)
    if v.size == 0:
        return b""
    nbytes = varint_byte_lengths(v)
    starts = np.zeros(v.size, dtype=np.int64)
    np.cumsum(nbytes[:-1], out=starts[1:])
    out = np.zeros(int(starts[-1] + nbytes[-1]), dtype=np.uint8)
    for j in range(int(nbytes.max())):
        mask = nbytes > j
        byte = ((v[mask] >> _U64(7 * j)) & _MASK7).astype(np.uint8)
        cont = (nbytes[mask] - 1 > j).astype(np.uint8) << 7
        out[starts[mask] + j] = byte | cont
    return out.tobytes()


def varint_decode(buf: bytes | np.ndarray) -> np.ndarray:
    """Decode a LEB128 byte string back to uint64 values (vectorized)."""
    b = np.frombuffer(buf, dtype=np.uint8) if not isinstance(buf, np.ndarray) else buf
    if b.size == 0:
        return np.empty(0, dtype=_U64)
    is_last = (b & 0x80) == 0
    n_vals = int(is_last.sum())
    # token_id[i] = index of the value byte i belongs to
    token_id = np.zeros(b.size, dtype=np.int64)
    np.cumsum(is_last[:-1], out=token_id[1:])
    ends = np.nonzero(is_last)[0]
    starts = np.empty(n_vals, dtype=np.int64)
    starts[0] = 0
    starts[1:] = ends[:-1] + 1
    pos_in_token = np.arange(b.size, dtype=np.int64) - starts[token_id]
    vals = np.zeros(n_vals, dtype=_U64)
    payload = (b & 0x7F).astype(_U64)
    for j in range(int(pos_in_token.max()) + 1):
        sel = pos_in_token == j
        vals[token_id[sel]] |= payload[sel] << _U64(7 * j)
    return vals


def delta_encode(sorted_values: np.ndarray) -> np.ndarray:
    """Gaps of a sorted uint array; first element kept absolute."""
    v = np.asarray(sorted_values, dtype=_U64)
    if v.size == 0:
        return v
    out = np.empty_like(v)
    out[0] = v[0]
    np.subtract(v[1:], v[:-1], out=out[1:])
    return out


def delta_decode(gaps: np.ndarray) -> np.ndarray:
    g = np.asarray(gaps, dtype=_U64)
    return np.cumsum(g, dtype=_U64)


def segmented_delta_decode(gaps: np.ndarray, offsets: np.ndarray) -> np.ndarray:
    """Inverse of segmented_delta: each [offsets[i], offsets[i+1]) run
    restarts with an absolute value."""
    g = np.asarray(gaps, dtype=_U64)
    if g.size == 0:
        return g
    offs = np.asarray(offsets, dtype=np.int64)
    cs = np.cumsum(g, dtype=_U64)
    starts = offs[:-1]
    lens = np.diff(offs)
    nz = lens > 0
    base = cs[starts[nz]] - g[starts[nz]]
    return cs - np.repeat(base, lens[nz])


def block_offsets_for(count: int) -> np.ndarray:
    """Value offsets of 128-value blocks for one list of ``count`` values
    (len = n_blocks + 1)."""
    n_blocks = max(1, (count + BLOCK - 1) // BLOCK)
    offs = np.minimum(np.arange(n_blocks + 1, dtype=np.int64) * BLOCK, count)
    return offs


def encode_doc_ids_blocked(doc_ids: np.ndarray) -> tuple[bytes, np.ndarray, np.ndarray]:
    """Delta+varint with an ABSOLUTE restart at every 128-doc block so
    blocks decode independently (the WAND skip unit).

    Returns (payload, per-block byte offsets incl. end, per-block last doc)."""
    v = np.asarray(doc_ids, dtype=_U64)
    offs = block_offsets_for(v.size)
    gaps = segmented_delta(v, offs)
    payload, boffs = segmented_varint_encode(gaps, offs)
    last = v[np.maximum(offs[1:] - 1, 0)] if v.size else np.empty(0, _U64)
    return payload, boffs, last


def decode_doc_ids_blocked(buf: bytes, count: int) -> np.ndarray:
    gaps = varint_decode(buf)
    return segmented_delta_decode(gaps, block_offsets_for(count))


def encode_doc_ids(doc_ids: np.ndarray) -> bytes:
    """delta + varint for a sorted doc-id run."""
    return varint_encode(delta_encode(doc_ids))


def decode_doc_ids(buf: bytes) -> np.ndarray:
    return delta_decode(varint_decode(buf))


# ---------------------------------------------------------------------------
# Bitpacked frame-of-reference blocks (alternate codec for long runs)
# ---------------------------------------------------------------------------

def bitpack_encode(values: np.ndarray) -> bytes:
    """Pack uint32 values in 128-value frame-of-reference blocks.

    Layout per block: u8 bitwidth | u32 min | ceil(n*width/8) bytes of
    little-endian bit-packed (value - min). The final block may be short
    (its length is implied by the total count, which the caller stores).
    """
    v = np.asarray(values, dtype=np.uint64)
    chunks: list[bytes] = []
    for s in range(0, v.size, BLOCK):
        blk = v[s:s + BLOCK]
        lo = int(blk.min()) if blk.size else 0
        rel = (blk - _U64(lo)).astype(np.uint64)
        width = int(rel.max()).bit_length() if rel.size else 0
        head = bytes([width]) + int(lo).to_bytes(8, "little")
        if width == 0:
            chunks.append(head)
            continue
        # bit matrix (n, width), LSB-first, then packbits
        bits = ((rel[:, None] >> np.arange(width, dtype=np.uint64)) & _U64(1)).astype(np.uint8)
        packed = np.packbits(bits.reshape(-1), bitorder="little")
        chunks.append(head + packed.tobytes())
    return b"".join(chunks)


def bitpack_decode(buf: bytes, count: int) -> np.ndarray:
    out = np.empty(count, dtype=np.uint64)
    pos = 0
    done = 0
    mv = memoryview(buf)
    while done < count:
        n = min(BLOCK, count - done)
        width = mv[pos]
        lo = int.from_bytes(mv[pos + 1:pos + 9], "little")
        pos += 9
        if width == 0:
            out[done:done + n] = lo
            done += n
            continue
        nbytes = (n * width + 7) // 8
        bits = np.unpackbits(
            np.frombuffer(mv[pos:pos + nbytes], dtype=np.uint8), bitorder="little"
        )[: n * width].reshape(n, width).astype(np.uint64)
        vals = (bits << np.arange(width, dtype=np.uint64)).sum(axis=1)
        out[done:done + n] = vals + np.uint64(lo)
        pos += nbytes
        done += n
    return out


# ---------------------------------------------------------------------------
# Flat-array helpers for encoding MANY posting lists in one vectorized pass
# ---------------------------------------------------------------------------

def segmented_delta(values: np.ndarray, list_offsets: np.ndarray) -> np.ndarray:
    """Delta-encode many concatenated sorted lists at once.

    ``list_offsets`` is the int64 offsets array (len = n_lists + 1) into
    ``values``. Within each list the first element stays absolute.
    """
    v = np.asarray(values, dtype=_U64)
    if v.size == 0:
        return v
    out = np.empty_like(v)
    out[0] = v[0]
    np.subtract(v[1:], v[:-1], out=out[1:])
    starts = np.asarray(list_offsets[:-1], dtype=np.int64)
    starts = starts[(starts > 0) & (starts < v.size)]
    out[starts] = v[starts]  # reset at list boundaries
    head = np.asarray(list_offsets, dtype=np.int64)
    if head.size and head[0] == 0 and v.size:
        out[0] = v[0]
    return out


def segmented_varint_encode(
    values: np.ndarray, list_offsets: np.ndarray
) -> tuple[bytes, np.ndarray]:
    """Varint-encode many concatenated lists in ONE pass.

    Returns ``(payload, byte_offsets)`` where ``byte_offsets`` (int64,
    len = n_lists + 1) slices ``payload`` per list — ready to wrap in an
    Arrow BinaryArray without per-list Python work.
    """
    v = np.asarray(values, dtype=_U64)
    payload = varint_encode(v)
    nbytes = varint_byte_lengths(v) if v.size else np.empty(0, np.int64)
    cum = np.zeros(v.size + 1, dtype=np.int64)
    np.cumsum(nbytes, out=cum[1:])
    byte_offsets = cum[np.asarray(list_offsets, dtype=np.int64)]
    return payload, byte_offsets
