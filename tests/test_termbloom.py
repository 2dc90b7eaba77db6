"""Per-segment term bloom filters (toshi_ray.termbloom): segments that
provably lack every query term are skipped without opening postings —
the textual analogue of the fastfield zone maps, with the same contract
(pruning is an optimization, never a filter)."""

import tempfile

import numpy as np
import pyarrow as pa
import pytest

from toshi_ray import termbloom
from toshi_ray.pipelines.build import build_index
from toshi_ray.pipelines.merge import merge_segments
from toshi_ray.schema import FieldDef, Schema
from toshi_ray.search import Searcher


def test_termbloom_unit():
    terms = [f"term{i}" for i in range(5000)] + ["ünïcode", ""]
    tbl = pa.table({"field": ["body"] * len(terms), "term": terms})
    payload, meta = termbloom.build_term_blooms(tbl)
    bits = np.frombuffer(payload, np.uint8)
    fm = meta["fields"]["body"]
    # zero false negatives, by construction
    assert termbloom.may_contain(bits, fm, terms, meta["k"]).all()
    # false-positive rate near the design point (~0.8% at 10 bits/term)
    absent = [f"absent{i}" for i in range(5000)]
    fpr = termbloom.may_contain(bits, fm, absent, meta["k"]).mean()
    assert fpr < 0.03, fpr
    # per-field isolation: a term of field a is (almost surely) not in b
    tbl2 = pa.table({"field": ["a", "a", "b"], "term": ["xx", "yy", "zz"]})
    p2, m2 = termbloom.build_term_blooms(tbl2)
    b2 = np.frombuffer(p2, np.uint8)
    assert termbloom.may_contain(b2, m2["fields"]["a"], ["xx", "yy"], m2["k"]).all()
    assert termbloom.may_contain(b2, m2["fields"]["b"], ["zz"], m2["k"]).all()
    assert not termbloom.may_contain(b2, m2["fields"]["b"], ["xx"], m2["k"]).any()
    # empty term dict → no bloom (readers then simply don't prune)
    assert termbloom.build_term_blooms(tbl2.slice(0, 0)) is None


def _marker_index(n=300, per_seg=100):
    tbl = pa.table({
        "doc_id": pa.array(np.arange(n, dtype=np.uint64)),
        "text": pa.array(
            [f"common w{i:05d} marker{i // per_seg}" for i in range(n)]
        ),
    })
    schema = Schema.build(
        FieldDef("doc_id", "u64", fast=True),
        FieldDef("text", "text"),
    )
    import ray.data

    root = tempfile.mkdtemp(prefix="toshi_bloom_")
    build_index(ray.data.from_arrow(tbl), schema, root, docs_per_segment=per_seg)
    return root


def test_termbloom_prunes_absent_term_segments(ray_session, monkeypatch):
    import toshi_ray.segments as segments

    root = _marker_index()
    s = Searcher(root, distributed=False)
    assert len(s.segments) == 3
    for seg in s.segments:
        assert "text" in seg["term_bloom"]["fields"]

    reads: list[str] = []
    orig = segments.pq.read_table

    def spy(path, *a, **kw):
        reads.append(str(path))
        return orig(path, *a, **kw)

    monkeypatch.setattr(segments.pq, "read_table", spy)

    # marker1 lives only in docs 100-199 → segment 1: exactly ONE
    # segment's postings open (stats phase + scoring share the reader)
    r = s.search({"query": {"term": {"text": "marker1"}}, "limit": 200})
    assert sorted(d["doc"]["doc_id"] for d in r["docs"]) == list(range(100, 200))
    assert len({p for p in reads if "postings" in p}) == 1, reads

    # a term absent from the whole corpus → ZERO postings reads
    reads.clear()
    r = s.search({"query": {"term": {"text": "nosuchtoken"}}, "limit": 10})
    assert r["hits"] == 0
    assert [p for p in reads if "postings" in p] == []

    # phrase with one absent word → no postings read from bloom-pruned
    # segments (the absent word empties every segment's conjunction)
    reads.clear()
    r = s.search(
        {"query": {"phrase": {"text": {"terms": ["common", "nosuchtoken"]}}},
         "limit": 10}
    )
    assert r["hits"] == 0

    monkeypatch.setattr(segments.pq, "read_table", orig)

    # correctness guard: stripping the blooms changes nothing
    with_bloom = [
        (d["doc"]["doc_id"], d["score"])
        for d in s.search({"query": {"term": {"text": "common"}}, "limit": 50})["docs"]
    ]
    assert s._groups
    for _, scorer in s._groups:
        for rd in scorer.readers:
            rd.meta.pop("term_bloom")
    without = [
        (d["doc"]["doc_id"], d["score"])
        for d in s.search({"query": {"term": {"text": "common"}}, "limit": 50})["docs"]
    ]
    assert with_bloom == without and len(with_bloom) == 50


def test_termbloom_reflects_deletes_after_merge(ray_session, monkeypatch):
    """A term whose every doc is tombstoned vanishes from the merged
    postings (zero-survivor rows are dropped), so the rebuilt bloom
    lacks it and the post-merge query does zero postings I/O; before
    the merge the bloom correctly still contains it (tombstones never
    remove terms — the bloom is a superset of the live vocabulary)."""
    import toshi_ray.segments as segments
    from toshi_ray.pipelines.merge import delete_by_term

    root = _marker_index()
    assert delete_by_term(root, "text", "marker1") == 100
    # pre-merge: term still in the bloom → postings probed, 0 live hits
    s0 = Searcher(root, distributed=False)
    assert s0.search({"query": {"term": {"text": "marker1"}}, "limit": 5})["hits"] == 0
    merge_segments(root)

    s = Searcher(root, distributed=False)
    reads: list[str] = []
    orig = segments.pq.read_table

    def spy(path, *a, **kw):
        reads.append(str(path))
        return orig(path, *a, **kw)

    monkeypatch.setattr(segments.pq, "read_table", spy)
    r = s.search({"query": {"term": {"text": "marker1"}}, "limit": 5})
    assert r["hits"] == 0
    assert [p for p in reads if "postings" in p] == []
    monkeypatch.setattr(segments.pq, "read_table", orig)
    # surviving vocabulary unaffected
    got = sorted(
        d["doc"]["doc_id"]
        for d in s.search({"query": {"term": {"text": "marker0"}}, "limit": 200})["docs"]
    )
    assert got == list(range(0, 100))


def test_termbloom_survives_merge(ray_session):
    root = _marker_index()
    before = Searcher(root, distributed=False)
    want = sorted(
        d["doc"]["doc_id"]
        for d in before.search({"query": {"term": {"text": "marker2"}}, "limit": 200})["docs"]
    )
    merge_segments(root)
    s = Searcher(root, distributed=False)
    assert any("merged" in m["name"] for m in s.segments)
    for m in s.segments:
        assert "text" in m["term_bloom"]["fields"]
    got = sorted(
        d["doc"]["doc_id"]
        for d in s.search({"query": {"term": {"text": "marker2"}}, "limit": 200})["docs"]
    )
    assert got == want == list(range(200, 300))
    # and the miss path still returns clean empties post-merge
    assert s.search({"query": {"term": {"text": "nosuchtoken"}}, "limit": 5})["hits"] == 0
