"""Posting codec roundtrips, incl. property tests (hypothesis)."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from toshi_ray import codecs


@given(st.lists(st.integers(min_value=0, max_value=2**63), max_size=200))
@settings(max_examples=50, deadline=None)
def test_varint_roundtrip(vals):
    a = np.asarray(vals, dtype=np.uint64)
    assert codecs.varint_decode(codecs.varint_encode(a)).tolist() == a.tolist()


@given(st.lists(st.integers(min_value=0, max_value=2**40), min_size=1, max_size=500))
@settings(max_examples=30, deadline=None)
def test_doc_id_roundtrip(vals):
    a = np.sort(np.asarray(vals, dtype=np.uint64))
    assert codecs.decode_doc_ids(codecs.encode_doc_ids(a)).tolist() == a.tolist()


@given(st.lists(st.integers(min_value=0, max_value=2**30), max_size=400))
@settings(max_examples=30, deadline=None)
def test_bitpack_roundtrip(vals):
    a = np.asarray(vals, dtype=np.uint64)
    assert codecs.bitpack_decode(codecs.bitpack_encode(a), a.size).tolist() == a.tolist()


def test_segmented_encode_matches_per_list():
    rng = np.random.default_rng(7)
    lists = [np.sort(rng.integers(0, 10**8, n).astype(np.uint64)) for n in (0, 1, 5, 300, 2)]
    flat = np.concatenate(lists)
    offsets = np.cumsum([0] + [len(x) for x in lists]).astype(np.int64)
    gaps = codecs.segmented_delta(flat, offsets)
    payload, boffs = codecs.segmented_varint_encode(gaps, offsets)
    for i, lst in enumerate(lists):
        blob = payload[boffs[i] : boffs[i + 1]]
        assert codecs.decode_doc_ids(blob).tolist() == lst.tolist()
        # per-list encode is byte-identical to the segmented pass
        assert blob == codecs.encode_doc_ids(lst)
