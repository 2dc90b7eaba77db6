"""Rank-identity + pipeline tests over the synthetic web-page table (F1/F6).

The engine (any partitioning, before or after merge) must match the
brute-force NumPy oracle rank-identically with equal scores.
"""

import tempfile

import numpy as np
import pytest

from toshi_ray.functions.oracle import BruteForceIndex
from toshi_ray.pipelines.build import build_index
from toshi_ray.pipelines.merge import delete_by_term, gc_segments, merge_segments
from toshi_ray.query import AllQuery, Search
from toshi_ray.schema import FieldDef, Schema
from toshi_ray.search import Searcher
from toshi_ray.sources.webpages import extract_text, make_pages_batch, pages_dataset

N_DOCS = 1500


def page_schema() -> Schema:
    return Schema.build(
        FieldDef("doc_id", "u64", fast=True),
        FieldDef("url", "text", indexed=False),
        FieldDef("text", "text"),
        FieldDef("lang", "facet"),
    )


@pytest.fixture(scope="module")
def oracle():
    tbl = make_pages_batch(np.arange(N_DOCS))
    docs = [
        {"doc_id": i, "text": t}
        for i, t in zip(tbl["doc_id"].to_pylist(), tbl["text"].to_pylist())
    ]
    return BruteForceIndex(docs, {"text": "default"})


@pytest.fixture(scope="module", params=[1, 7])
def searcher(request, ray_session):
    """The same corpus at 1 segment and at 7 segments."""
    root = tempfile.mkdtemp(prefix=f"toshi_rank_{request.param}_")
    per_seg = -(-N_DOCS // request.param)
    build_index(pages_dataset(N_DOCS, parallelism=4), page_schema(), root,
                docs_per_segment=per_seg)
    return Searcher(root, distributed=False)


QUERY_TERMS = ["the", "www", "w00042", "w00100", "w01000", "w19999", "missingterm"]
PHRASES = [["the", "of"], ["w00042", "the"], ["page", "home"]]


def engine_topk(searcher, q, k=20):
    r = searcher.search({"query": q, "limit": k})
    return [(d["doc"]["doc_id"], d["score"]) for d in r["docs"]]


def test_term_rank_identity(searcher, oracle):
    for t in QUERY_TERMS:
        got = engine_topk(searcher, {"term": {"text": t}})
        want = oracle.topk(oracle.term_scores("text", t), 20)
        assert [g[0] for g in got] == [w[0] for w in want], t
        np.testing.assert_allclose([g[1] for g in got], [w[1] for w in want], rtol=1e-12)


def test_phrase_rank_identity(searcher, oracle):
    for terms in PHRASES:
        got = engine_topk(searcher, {"phrase": {"text": {"terms": terms}}})
        want = oracle.topk(oracle.phrase_scores("text", terms), 20)
        assert [g[0] for g in got] == [w[0] for w in want], terms
        np.testing.assert_allclose([g[1] for g in got], [w[1] for w in want], rtol=1e-12)


def test_bool_rank_identity(searcher, oracle):
    q = {
        "bool": {
            "must": [{"term": {"text": "w00042"}}],
            "should": [{"term": {"text": "the"}}],
            "must_not": [{"term": {"text": "w00100"}}],
        }
    }
    got = engine_topk(searcher, q, 30)
    m = oracle.term_scores("text", "w00042")
    s = oracle.term_scores("text", "the")
    n = oracle.term_scores("text", "w00100")
    comb = {i: sc + s.get(i, 0.0) for i, sc in m.items() if i not in n}
    want = oracle.topk(comb, 30)
    assert [g[0] for g in got] == [w[0] for w in want]
    np.testing.assert_allclose([g[1] for g in got], [w[1] for w in want], rtol=1e-12)


def test_rank_identity_survives_merge(searcher, oracle, tmp_path):
    if len(searcher.manifest["segments"]) == 1:
        pytest.skip("single segment — merge is a no-op")
    before = {t: engine_topk(searcher, {"term": {"text": t}}) for t in QUERY_TERMS}
    merge_segments(searcher.index_root, hot_df_threshold=200, shard_span=500)
    s2 = Searcher(searcher.index_root, distributed=False)
    for t in QUERY_TERMS:
        assert engine_topk(s2, {"term": {"text": t}}) == before[t], t


def test_extract_invariant_and_determinism():
    tbl = make_pages_batch(np.arange(0, 400))
    assert extract_text(tbl["html"]).to_pylist() == tbl["text"].to_pylist()
    # regeneration at a different batching is byte-identical
    part = make_pages_batch(np.arange(100, 200))
    assert tbl.slice(100, 100).equals(part)


def test_delete_by_term(ray_session):
    root = tempfile.mkdtemp(prefix="toshi_del_")
    build_index(pages_dataset(600, parallelism=2), page_schema(), root,
                docs_per_segment=200)
    s = Searcher(root, distributed=False)
    n_before = s.count({"query": {"term": {"text": "w00050"}}})
    assert n_before > 0
    n_del = delete_by_term(root, "text", "w00050")
    assert n_del == n_before
    s2 = Searcher(root, distributed=False)
    assert s2.count({"query": {"term": {"text": "w00050"}}}) == 0
    # all-docs view also excludes tombstoned docs
    assert s2.count(None) == 600 - n_del
    # merge applies physically
    merge_segments(root)
    s3 = Searcher(root, distributed=False)
    assert s3.count({"query": {"term": {"text": "w00050"}}}) == 0
    assert s3.n_docs == 600 - n_del
    gc_segments(root)


def test_size_aware_postings_cache(ray_session):
    """SegmentReader defaults to caching small segments but must serve
    IDENTICAL results through the parquet-pushdown path chosen for
    over-threshold segments (cache_max_bytes=0 forces it)."""
    from toshi_ray.pipelines.build import load_manifest
    from toshi_ray.segments import SegmentReader
    import os

    root = tempfile.mkdtemp(prefix="toshi_cache_")
    build_index(pages_dataset(400, parallelism=2), page_schema(), root,
                docs_per_segment=400)
    seg = load_manifest(root)["segments"][0]
    seg_dir = os.path.join(root, "segments", seg["name"])

    r_auto = SegmentReader(seg_dir)
    assert r_auto.cache_postings is True  # tiny segment → cached
    r_push = SegmentReader(seg_dir, cache_max_bytes=0)
    assert r_push.cache_postings is False  # over threshold → pushdown

    key = [("field", "ascending"), ("term", "ascending"),
           ("shard", "ascending"), ("first_doc", "ascending")]
    for terms in (["the"], ["the", "w00042"], ["missingterm"]):
        a = r_auto.postings_for_terms("text", terms).sort_by(key)
        b = r_push.postings_for_terms("text", terms).sort_by(key)
        assert a.equals(b), terms
    tkey = [("field", "ascending"), ("term", "ascending"), ("df", "ascending")]
    assert r_auto.term_dict("text").sort_by(tkey).equals(
        r_push.term_dict("text").sort_by(tkey)
    )


def test_fuzzy_const_scorer(ray_session, tmp_path):
    """Fuzzy is an automaton query in tantivy 0.19: AutomatonWeight unions
    matching terms into one BitSetDocSet wrapped in ConstScorer(1.0), so a
    doc containing TWO distance-1 variants still scores 1.0 (fuzzy.rs:31)."""
    import pyarrow as pa
    import ray

    schema = Schema.build(FieldDef("doc_id", "u64", fast=True), FieldDef("text", "text"))
    t = pa.table(
        {
            "doc_id": pa.array([0, 1], pa.uint64()),
            "text": ["spark spork", "spark only here"],
        }
    )
    root = str(tmp_path / "fz")
    build_index(ray.data.from_arrow(t), schema, root)
    s = Searcher(root, distributed=False)
    r = s.search(
        {"query": {"fuzzy": {"text": {"value": "spark", "distance": 1,
                                      "transposition": False}}}}
    )
    assert {d["doc"]["doc_id"]: d["score"] for d in r["docs"]} == {0: 1.0, 1: 1.0}


def test_apply_tombstones_vectorized():
    """The segmented-numpy tombstone path must drop exactly the
    tombstoned docs from every posting row, keep positions of surviving
    docs byte-exact, and recompute df/tf/block-skip metadata — including
    on a schema with mixed positions/no-positions fields."""
    import pyarrow as pa

    from toshi_ray.pipelines.merge import apply_tombstones_to_postings
    from toshi_ray.schema import FieldDef, Schema
    from toshi_ray.segments import (
        build_segment_tables,
        decode_posting_row,
        decode_positions,
    )

    rng = np.random.default_rng(3)
    n = 300
    words = [f"w{i:03d}" for i in range(40)]
    texts = [" ".join(rng.choice(words, size=rng.integers(5, 30))) for _ in range(n)]
    tags = [" ".join(rng.choice(["a", "b", "c"], size=2)) for _ in range(n)]
    schema = Schema.build(
        FieldDef("doc_id", "u64", fast=True),
        FieldDef("text", "text"),
        FieldDef("tags", "text", positions=False),
    )
    tbl = pa.table(
        {"doc_id": pa.array(np.arange(n, dtype=np.uint64)), "text": texts, "tags": tags}
    )
    postings, _, _, _ = build_segment_tables(tbl, schema)

    def decode_all(p):
        out = {}
        for r in p.to_pylist():
            ids, tfs = decode_posting_row(r)
            posmap = None
            if r["positions"] is not None:
                pos, offs = decode_positions(r, tfs)
                posmap = {
                    int(i): pos[offs[j] : offs[j + 1]].tolist()
                    for j, i in enumerate(ids)
                }
            out[(r["field"], r["term"], r["shard"])] = (ids, tfs, posmap, r)
        return out

    tombs = np.array([3, 57, 58, 123, 299], dtype=np.uint64)
    out = apply_tombstones_to_postings(postings, tombs)
    orig, new = decode_all(postings), decode_all(out)

    exp_keys = set()
    for k, (ids, tfs, posmap, _) in orig.items():
        keep = ~np.isin(ids, tombs)
        if not keep.any():
            continue
        exp_keys.add(k)
        nids, ntfs, nposmap, row = new[k]
        np.testing.assert_array_equal(nids, ids[keep])
        np.testing.assert_array_equal(ntfs, tfs[keep])
        assert row["df"] == int(keep.sum())
        assert row["first_doc"] == int(ids[keep][0])
        assert row["total_tf"] == int(tfs[keep].sum())
        assert row["max_tf"] == int(tfs[keep].max())
        lasts = np.frombuffer(row["block_last_doc"], np.uint64)
        assert lasts[-1] == ids[keep][-1]
        if posmap is not None:
            assert nposmap == {int(i): posmap[int(i)] for i in ids[keep]}
        else:
            assert nposmap is None
    assert set(new) == exp_keys

    # rows with no overlapping doc range pass through untouched
    far = np.array([10_000_000], dtype=np.uint64)
    assert apply_tombstones_to_postings(postings, far).equals(postings)


def test_build_is_resumable(ray_session):
    root = tempfile.mkdtemp(prefix="toshi_resume_")
    m1 = build_index(pages_dataset(300, parallelism=2), page_schema(), root,
                     docs_per_segment=100)
    # second call with same root: returns existing manifest, no rebuild
    m2 = build_index(pages_dataset(300, parallelism=2), page_schema(), root,
                     docs_per_segment=100)
    assert m2["version"] == m1["version"]
    assert [s["name"] for s in m2["segments"]] == [s["name"] for s in m1["segments"]]


def test_overwrite_rebuild_serves_fresh_postings(ray_session, tmp_path):
    """overwrite=True must not republish stale segments: segment names
    are keyed by (min_doc_id, num_docs) only, so a rebuild over CHANGED
    text with the same doc-id layout would otherwise serve old postings."""
    import pyarrow as pa
    import ray

    root = str(tmp_path / "ow")
    schema = Schema.build(
        FieldDef("doc_id", "u64", fast=True), FieldDef("text", "text")
    )
    t1 = pa.table({"doc_id": pa.array([0, 1], pa.uint64()),
                   "text": ["alpha beta", "alpha gamma"]})
    build_index(ray.data.from_arrow(t1), schema, root)
    assert Searcher(root, distributed=False).count(
        {"query": {"term": {"text": "alpha"}}}) == 2

    t2 = pa.table({"doc_id": pa.array([0, 1], pa.uint64()),
                   "text": ["delta beta", "delta gamma"]})  # same layout, new text
    build_index(ray.data.from_arrow(t2), schema, root, overwrite=True)
    s = Searcher(root, distributed=False)
    assert s.count({"query": {"term": {"text": "alpha"}}}) == 0
    assert s.count({"query": {"term": {"text": "delta"}}}) == 2


def test_blockmax_prunes_and_stays_exact(ray_session):
    """Skewed-tf corpus: the block-max path must skip decoding most
    blocks for a small k yet return exactly the exhaustive top-k."""
    import pyarrow as pa
    import ray

    from toshi_ray.search import SegmentGroupScorer, TermQuery

    n = 4000
    # tf of "hot" rises with doc_id but block-max varies: put high-tf docs
    # in a few blocks so most blocks have low upper bounds
    texts = []
    for i in range(n):
        tf = 40 if (i // 128) % 10 == 0 else 1
        texts.append(" ".join(["hot"] * tf + ["w%04d" % (i % 97)] * 3))
    tbl = pa.table({"doc_id": pa.array(range(n), pa.uint64()), "text": texts})
    root = tempfile.mkdtemp(prefix="toshi_bmw_")
    build_index(ray.data.from_arrow(tbl), Schema.build(
        FieldDef("doc_id", "u64", fast=True), FieldDef("text", "text")), root,
        docs_per_segment=n)

    s = Searcher(root, distributed=False)
    s._ensure_groups()
    scorer: SegmentGroupScorer = s._groups[0][1]
    plan = s._plan({"query": {"term": {"text": "hot"}}}).query
    stats = s._stats_for(plan)

    exhaustive_ids, exhaustive_scores = scorer._eval(plan, scorer.readers[0], stats)
    order = np.lexsort((exhaustive_ids, -exhaustive_scores))[:10]
    want = list(zip(exhaustive_ids[order].tolist(),
                    np.round(exhaustive_scores[order], 12).tolist()))

    ids, scores = scorer._topk_term_blockmax(plan, scorer.readers[0], stats, 10)
    got = list(zip(ids.tolist(), np.round(scores, 12).tolist()))
    assert got == want
    pc = scorer.perf_counters()
    assert pc["blocks_decoded"] < pc["blocks_total"], pc  # pruning happened
    # and the public search path returns the same
    r = s.search({"query": {"term": {"text": "hot"}}, "limit": 10})
    assert [d["doc"]["doc_id"] for d in r["docs"]] == [g[0] for g in got]


def test_union_blockmax_exact_and_prunes(ray_session):
    """Pure-disjunction (should-only) queries go through the region-
    overlay block-max WAND: identical top-k to exhaustive eval, with
    blocks skipped on a skewed corpus."""
    import pyarrow as pa
    import ray

    from toshi_ray.search import SegmentGroupScorer

    n = 4000
    texts = []
    for i in range(n):
        tf_a = 40 if (i // 128) % 10 == 0 else 1
        tf_b = 30 if (i // 128) % 7 == 3 else 1
        texts.append(" ".join(["hot"] * tf_a + ["warm"] * tf_b
                              + ["w%04d" % (i % 97)] * 2))
    tbl = pa.table({"doc_id": pa.array(range(n), pa.uint64()), "text": texts})
    root = tempfile.mkdtemp(prefix="toshi_ubmw_")
    build_index(ray.data.from_arrow(tbl), Schema.build(
        FieldDef("doc_id", "u64", fast=True), FieldDef("text", "text")), root,
        docs_per_segment=n)

    s = Searcher(root, distributed=False)
    s._ensure_groups()
    scorer: SegmentGroupScorer = s._groups[0][1]
    q = {"bool": {"should": [{"term": {"text": "hot"}},
                             {"term": {"text": "warm"}}]}}
    plan = s._plan({"query": q}).query
    stats = s._stats_for(plan)

    ex_ids, ex_scores = scorer._eval(plan, scorer.readers[0], stats)
    order = np.lexsort((ex_ids, -ex_scores))[:10]
    want = list(zip(ex_ids[order].tolist(),
                    np.round(ex_scores[order], 12).tolist()))
    ids, scores = scorer._topk_union_blockmax(plan, scorer.readers[0], stats, 10)
    got = list(zip(ids.tolist(), np.round(scores, 12).tolist()))
    assert got == want
    pc = scorer.perf_counters()
    assert pc["blocks_decoded"] < pc["blocks_total"], pc  # pruning happened
    # the public path returns the same ranking
    r = s.search({"query": q, "limit": 10})
    assert [d["doc"]["doc_id"] for d in r["docs"]] == [g[0] for g in got]
    # union path + tombstones agrees with generic eval after a delete
    delete_by_term(root, "text", "w0000")
    s2 = Searcher(root, distributed=False)
    r2 = s2.search({"query": q, "limit": 10})
    s2._ensure_groups()
    sc2: SegmentGroupScorer = s2._groups[0][1]
    st2 = s2._stats_for(s2._plan({"query": q}).query)
    e_ids, e_sc = sc2._eval(s2._plan({"query": q}).query, sc2.readers[0], st2)
    if st2.tombstones is not None:
        keep = ~np.isin(e_ids, st2.tombstones)
        e_ids, e_sc = e_ids[keep], e_sc[keep]
    o2 = np.lexsort((e_ids, -e_sc))[:10]
    assert [d["doc"]["doc_id"] for d in r2["docs"]] == e_ids[o2].tolist()


def test_conjunction_skip_exact_and_prunes(ray_session):
    """must-AND of a rare and a hot term: skip-pointer path must decode
    only the hot term's blocks that overlap the rare term's docs, and
    match the generic evaluator exactly."""
    import ray

    root = tempfile.mkdtemp(prefix="toshi_and_")
    build_index(pages_dataset(3000, parallelism=2), page_schema(), root,
                docs_per_segment=3000)
    s = Searcher(root, distributed=False)
    s._ensure_groups()
    scorer = s._groups[0][1]
    q = {"bool": {"must": [{"term": {"text": "w01000"}}, {"term": {"text": "the"}}]}}
    plan = s._plan({"query": q}).query
    stats = s._stats_for(plan)
    reader = scorer.readers[0]

    # expected result: per-term exhaustive evals intersected by hand
    a = scorer._eval(plan.must[0], reader, stats)
    b = scorer._eval(plan.must[1], reader, stats)
    common, ia, ib = np.intersect1d(a[0], b[0], assume_unique=True, return_indices=True)
    want_ids, want_scores = common, a[1][ia] + b[1][ib]

    before = scorer.perf_counters()["blocks_decoded"]
    got_ids, got_scores = scorer._eval(plan, reader, stats)
    decoded = scorer.perf_counters()["blocks_decoded"] - before
    assert got_ids.tolist() == want_ids.tolist()
    np.testing.assert_allclose(got_scores, want_scores, rtol=1e-12)
    # hot term 'the' has ~3000/128 ≈ 24 blocks; must not decode them all
    assert 0 < decoded < 24, decoded
    # and through the public search API
    r = s.search({"query": q, "limit": 5})
    order = np.lexsort((want_ids, -want_scores))[:5]
    assert [d["doc"]["doc_id"] for d in r["docs"]] == want_ids[order].tolist()


def _py_lev(a: str, b: str, transposition: bool) -> int:
    """Independent reference Levenshtein (test-local, not engine code)."""
    prev2, prev = None, list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i] + [0] * len(b)
        for j, cb in enumerate(b, 1):
            cur[j] = min(cur[j - 1] + 1, prev[j] + 1, prev[j - 1] + (ca != cb))
            if transposition and i > 1 and j > 1 and a[i - 1] == b[j - 2] and a[i - 2] == b[j - 1]:
                cur[j] = min(cur[j], prev2[j - 2] + 1)
        prev2, prev = prev, cur
    return prev[len(b)]


def test_reference_query_set_rank_identity(searcher, oracle):
    """FIXTURES.md §F6: the fixed query set in tests/queries.json,
    rank-identical (scored kinds) / set-identical (const-score kinds)."""
    import json as _json
    import os
    import re as _re

    with open(os.path.join(os.path.dirname(__file__), "queries.json")) as f:
        qs = _json.load(f)

    def ids_of(q, k=10_000):
        return sorted(int(i) for i in searcher.match_doc_ids({"query": q}))

    for q in qs["term"]:
        t = q["term"]["text"]
        got = engine_topk(searcher, q, 30)
        want = oracle.topk(oracle.term_scores("text", t), 30)
        assert got == [(d, pytest.approx(s, rel=1e-12)) for d, s in want], t

    for q in qs["phrase"]:
        terms = q["phrase"]["text"]["terms"]
        got = engine_topk(searcher, q, 30)
        want = oracle.topk(oracle.phrase_scores("text", terms), 30)
        assert [g[0] for g in got] == [w[0] for w in want], terms
        np.testing.assert_allclose([g[1] for g in got], [w[1] for w in want], rtol=1e-12)

    all_terms = set(oracle.postings["text"])

    for q in qs["fuzzy"]:
        spec = q["fuzzy"]["text"]
        matched = {t for t in all_terms
                   if _py_lev(t, spec["value"], spec["transposition"]) <= spec["distance"]}
        want = sorted({int(oracle.doc_ids[i]) for t in matched
                       for i, _, _ in oracle.postings["text"][t]})
        assert ids_of(q) == want, spec

    for q in qs["regex"]:
        pat = _re.compile(q["regex"]["text"])
        matched = {t for t in all_terms if pat.fullmatch(t)}
        want = sorted({int(oracle.doc_ids[i]) for t in matched
                       for i, _, _ in oracle.postings["text"][t]})
        assert ids_of(q) == want, q

    for q in qs["range"]:
        b = q["range"]["doc_id"]
        lo = b.get("gt", b.get("gte", -1) - 1) + 1 if ("gt" in b or "gte" in b) else 0
        hi = b.get("lt", b.get("lte", 10**18) + 1) - 1 if ("lt" in b or "lte" in b) else 10**18
        want = [d for d in range(N_DOCS) if lo <= d <= hi]
        assert ids_of(q) == want, b

    for q in qs["bool"]:
        spec = q["bool"]
        def scores_for(sub):
            return oracle.term_scores("text", sub["term"]["text"])
        musts = [scores_for(s) for s in spec.get("must", [])]
        shoulds = [scores_for(s) for s in spec.get("should", [])]
        nots = [scores_for(s) for s in spec.get("must_not", [])]
        if musts:
            docs = set(musts[0])
            for m in musts[1:]:
                docs &= set(m)
        else:
            docs = set().union(*[set(s) for s in shoulds])
        for n_ in nots:
            docs -= set(n_)
        comb = {i: sum(m.get(i, 0.0) for m in musts) + sum(s.get(i, 0.0) for s in shoulds)
                for i in docs}
        got = engine_topk(searcher, q, 30)
        want = oracle.topk(comb, 30)
        assert [g[0] for g in got] == [w[0] for w in want], spec
        np.testing.assert_allclose([g[1] for g in got], [w[1] for w in want], rtol=1e-12)


def test_partial_build_resume_reuses_segments(ray_session):
    """north_rule resumability: after losing the manifest mid-build, a
    rerun must reuse finished segment dirs (idempotent writes) and only
    republish the manifest."""
    import json
    import os

    root = tempfile.mkdtemp(prefix="toshi_partial_")
    build_index(pages_dataset(300, parallelism=3), page_schema(), root,
                docs_per_segment=100)
    seg_dir = os.path.join(root, "segments")
    segs = sorted(os.listdir(seg_dir))
    assert len(segs) == 3
    # simulate a crash before commit: manifest lost, one partition unfinished
    os.remove(os.path.join(root, "manifest.json"))
    import shutil

    shutil.rmtree(os.path.join(seg_dir, segs[1]))
    mtimes = {s: os.path.getmtime(os.path.join(seg_dir, s, "meta.json"))
              for s in (segs[0], segs[2])}

    m = build_index(pages_dataset(300, parallelism=3), page_schema(), root,
                    docs_per_segment=100)
    assert sorted(s["name"] for s in m["segments"]) == segs
    for s, old in mtimes.items():  # finished partitions were NOT rewritten
        assert os.path.getmtime(os.path.join(seg_dir, s, "meta.json")) == old
    searcher = Searcher(root, distributed=False)
    assert searcher.count(None) == 300


def test_log_merge_policy_buckets():
    """Tantivy LogMergePolicy semantics (reference config 8/10k/0.75):
    segments in the same log-size level merge once the level holds
    min_merge_size of them; everything under min_layer_size shares the
    bottom level."""
    from toshi_ray.pipelines.merge import log_merge_candidates

    small = [{"name": f"s{i}", "num_docs": 100 + i} for i in range(8)]
    assert log_merge_candidates(small) == [[s["name"] for s in small]]
    # 7 small segments: below min_merge_size → no candidates
    assert log_merge_candidates(small[:7]) == []
    # two distinct levels, each with 8 members, merge independently
    big = [{"name": f"b{i}", "num_docs": 3_000_000 + i} for i in range(8)]
    cands = log_merge_candidates(small + big)
    assert sorted(map(len, cands)) == [8, 8]
    names = {n for c in cands for n in c}
    assert names == {s["name"] for s in small + big}
    # a level with 8 small + a lone huge segment: only the small level merges
    cands = log_merge_candidates(small + big[:1])
    assert cands == [[s["name"] for s in small]]


def test_maybe_merge_applies_policy(ray_session):
    """maybe_merge consolidates every candidate bucket and publishes a
    manifest whose doc count is unchanged."""
    from toshi_ray.pipelines.build import load_manifest
    from toshi_ray.pipelines.merge import maybe_merge

    root = tempfile.mkdtemp(prefix="toshi_policy_")
    build_index(pages_dataset(900, parallelism=3), page_schema(), root,
                docs_per_segment=100)  # 9 segments, all bottom level
    before = load_manifest(root)
    assert len(before["segments"]) >= 8
    merged = maybe_merge(root)
    assert len(merged) == 1  # one bucket fired
    after = load_manifest(root)
    assert len(after["segments"]) < len(before["segments"])
    assert sum(s["num_docs"] for s in after["segments"]) == 900
    s = Searcher(root, distributed=False)
    assert s.n_docs == 900
    assert s.count({"query": {"term": {"text": "w00042"}}}) > 0


def test_log_merge_level_band_semantics():
    """Bands are anchored at each level's largest segment with width
    level_log_size in log2 space (tantivy semantics) — a fixed grid
    would split 1.1M/2.0M differently."""
    from toshi_ray.pipelines.merge import log_merge_candidates

    # 8 segments spread within one 0.75-wide band from the head → merge
    head = 2_000_000
    close = [{"name": f"c{i}", "num_docs": int(head / (1.06 ** i))} for i in range(8)]
    assert log_merge_candidates(close) == [[s["name"] for s in close]]
    # a segment more than level_log_size below the head opens a new level
    far = [{"name": "far", "num_docs": int(head / 2.0)}]  # 1.0 > 0.75 below
    cands = log_merge_candidates(close[:1] * 1 + far * 1 + close[1:])
    # 7 close + head in band one... construct explicitly: head + 7 close are
    # within 0.42 of head; far sits 1.0 below head → two levels, neither full
    assert log_merge_candidates([close[0]] + far) == []


def test_zone_map_prunes_disjoint_segments(ray_session, monkeypatch):
    """Per-segment [min, max] zone maps: a range / numeric-term query
    whose bounds are disjoint with a segment's fast-field bounds must
    skip that segment's docvalues entirely (no data-page reads)."""
    import toshi_ray.segments as segments

    root = tempfile.mkdtemp(prefix="toshi_zone_")
    build_index(pages_dataset(400, parallelism=4), page_schema(), root,
                docs_per_segment=100)
    s = Searcher(root, distributed=False)
    assert len(s.segments) == 4
    for seg in s.segments:
        z = seg["fastfield_stats"]["doc_id"]
        assert z == [seg["min_doc_id"], seg["max_doc_id"], seg["num_docs"]]

    reads: list[str] = []
    orig = segments.pq.read_table

    def spy(path, *a, **kw):
        reads.append(str(path))
        return orig(path, *a, **kw)

    monkeypatch.setattr(segments.pq, "read_table", spy)
    # range inside ONE segment's doc-id span → exactly one segment's
    # docvalues open
    ids = s.match_doc_ids({"query": {"range": {"doc_id": {"gte": 150, "lt": 180}}}})
    assert sorted(int(i) for i in ids) == list(range(150, 180))
    dv_dirs = {p for p in reads if "docvalues" in p}
    assert len(dv_dirs) == 1, dv_dirs
    # range above every segment → zero reads of any kind
    reads.clear()
    ids = s.match_doc_ids({"query": {"range": {"doc_id": {"gte": 5000}}}})
    assert ids.size == 0 and reads == []
    # numeric-term equality outside the corpus → zero reads
    ids = s.match_doc_ids({"query": {"term": {"doc_id": 5001}}})
    assert ids.size == 0 and reads == []
    # sort-by top-k: the zmax-desc visit order fills k rows from the
    # top segment, and the running-kth threshold prunes the other three
    reads.clear()
    r = s.search({"query": None, "sort_by": "doc_id", "limit": 5})
    assert [d["doc"]["doc_id"] for d in r["docs"]] == [399, 398, 397, 396, 395]
    assert len({p for p in reads if "docvalues" in p}) == 1
    monkeypatch.setattr(segments.pq, "read_table", orig)

    # correctness guard: a straddling range with stats stripped gives the
    # identical answer (pruning is an optimization, never a filter)
    body = {"query": {"range": {"doc_id": {"gte": 95, "lte": 205}}}}
    with_stats = sorted(int(i) for i in s.match_doc_ids(body))
    assert s._groups, "groups must be materialized by the queries above"
    for _, scorer in s._groups:
        for r in scorer.readers:
            r.meta.pop("fastfield_stats")
    assert sorted(int(i) for i in s.match_doc_ids(body)) == with_stats
    assert with_stats == list(range(95, 206))


def test_sort_floor_respects_tombstones(ray_session):
    """The driver-side match-all sort floor counts LIVE docs per
    segment: with 3 of the top segment's 100 docs tombstoned and
    k=100, the k-th row must come from the next segment down — an
    unadjusted floor would prune it and silently drop 3 rows."""
    root = tempfile.mkdtemp(prefix="toshi_floor_tomb_")
    build_index(pages_dataset(400, parallelism=4), page_schema(), root,
                docs_per_segment=100)
    for victim in (399, 398, 397):
        assert delete_by_term(root, "doc_id", victim) == 1
    s = Searcher(root, distributed=False)
    # the floor itself must sit at/below the 100th LIVE value (297)
    stats = s._stats_for_plans([AllQuery()])
    fl = s._sort_floor(Search(sort_by="doc_id", limit=100), stats, s.segments)
    assert fl is not None and fl <= 297
    r = s.search({"query": None, "sort_by": "doc_id", "limit": 100})
    got = [d["doc"]["doc_id"] for d in r["docs"]]
    assert got == list(range(396, 296, -1))


def test_zone_map_survives_merge(ray_session):
    """Merged segments recompute zone maps from parquet footer
    statistics; pruning + results stay exact post-merge."""
    root = tempfile.mkdtemp(prefix="toshi_zone_merge_")
    build_index(pages_dataset(400, parallelism=4), page_schema(), root,
                docs_per_segment=50)
    merge_segments(root)
    s = Searcher(root, distributed=False)
    metas = s.segments
    assert any("merged" in m["name"] for m in metas)
    for m in metas:
        z = m["fastfield_stats"]["doc_id"]
        assert z[0] == m["min_doc_id"] and z[1] == m["max_doc_id"]
        # merged segments carry the valid-count too (footer null counts)
        assert len(z) == 3 and z[2] == m["num_docs"]
    ids = s.match_doc_ids({"query": {"range": {"doc_id": {"gte": 150, "lt": 180}}}})
    assert sorted(int(i) for i in ids) == list(range(150, 180))


def test_zone_map_numeric_field(ray_session, monkeypatch):
    """Zone maps on a non-doc_id i64 fast field, correlated with the
    segment layout: disjoint segments are skipped, straddling ranges
    stay exact."""
    import pyarrow as pa
    import ray.data

    import toshi_ray.segments as segments

    n = 300
    tbl = pa.table({
        "doc_id": pa.array(np.arange(n, dtype=np.uint64)),
        "val": pa.array(np.arange(n, dtype=np.int64) * 3 - 50),
        "text": pa.array([f"doc number {i}" for i in range(n)]),
    })
    schema = Schema.build(
        FieldDef("doc_id", "u64", fast=True),
        FieldDef("val", "i64", fast=True),
        FieldDef("text", "text"),
    )
    root = tempfile.mkdtemp(prefix="toshi_zone_val_")
    build_index(ray.data.from_arrow(tbl), schema, root, docs_per_segment=100)
    s = Searcher(root, distributed=False)

    reads: list[str] = []
    orig = segments.pq.read_table

    def spy(path, *a, **kw):
        reads.append(str(path))
        return orig(path, *a, **kw)

    monkeypatch.setattr(segments.pq, "read_table", spy)
    # val in [400, 500] → docs 150..183 → only the middle segment
    ids = s.match_doc_ids({"query": {"range": {"val": {"gte": 400, "lte": 500}}}})
    expect = [i for i in range(n) if 400 <= i * 3 - 50 <= 500]
    assert sorted(int(i) for i in ids) == expect
    assert len({p for p in reads if "docvalues" in p}) == 1
    # exclusive bounds at the exact segment edge: seg0 max val = 99*3-50
    # = 247; gt=247 must exclude seg0, lte=250 keeps seg1 (min val 250)
    reads.clear()
    ids = s.match_doc_ids({"query": {"range": {"val": {"gt": 247, "lte": 250}}}})
    assert sorted(int(i) for i in ids) == [100]  # only val 250 (doc 100)
    # seg1's val column is already in the reader's partial cache from the
    # first query; seg0/seg2 are zone-pruned — so no new reads at all
    assert [p for p in reads if "docvalues" in p] == []
    # fully disjoint exclusive window between segments → all pruned
    reads.clear()
    ids = s.match_doc_ids({"query": {"range": {"val": {"gt": 247, "lt": 250}}}})
    assert ids.size == 0 and reads == []


def test_sort_floor_null_values(ray_session):
    """NULL sort values sort LAST and must not inflate the sort floor:
    a segment of 100 docs where only ONE carries the sort field has a
    tight zone map ([1000, 1000]) but just one valued doc — counting
    all 100 would set the floor at 1000 and prune the segment holding
    the real runners-up."""
    import pyarrow as pa
    import ray.data

    # segment A: docs 0..99, val null except doc 7 -> 1000
    # segment B: docs 100..199, val 500..599
    vals = [None] * 100 + list(range(500, 600))
    vals[7] = 1000
    tbl = pa.table({
        "doc_id": pa.array(np.arange(200, dtype=np.uint64)),
        "val": pa.array(vals, type=pa.int64()),
        "text": pa.array([f"doc number {i}" for i in range(200)]),
    })
    schema = Schema.build(
        FieldDef("doc_id", "u64", fast=True),
        FieldDef("val", "i64", fast=True),
        FieldDef("text", "text"),
    )
    root = tempfile.mkdtemp(prefix="toshi_null_floor_")
    build_index(ray.data.from_arrow(tbl), schema, root, docs_per_segment=100)
    s = Searcher(root, distributed=False)
    za = s.segments[0]["fastfield_stats"]["val"]
    assert za == [1000, 1000, 1]
    # k=10: floor must NOT prune segment B (A holds only 1 valued doc)
    r = s.search({"query": None, "sort_by": "val", "limit": 10})
    got = [d["doc"]["doc_id"] for d in r["docs"]]
    assert got == [7] + list(range(199, 190, -1))
    # k=1: A's single valued doc DOES prove floor 1000 -> B prunable
    st = s._stats_for_plans([AllQuery()])
    assert s._sort_floor(Search(sort_by="val", limit=1), st, s.segments) == 1000.0
    # nulls last, doc_id ascending among them; past-the-end k is exact
    r = s.search({"query": None, "sort_by": "val", "limit": 200})
    got = [d["doc"]["doc_id"] for d in r["docs"]]
    valued = [7] + list(range(199, 99, -1))
    assert got == valued + [i for i in range(100) if i != 7]
    # limit 0 returns no rows (and must not crash the prune threshold)
    r = s.search({"query": None, "sort_by": "val", "limit": 0})
    assert r["hits"] == 0 and r["docs"] == []


def test_fastfield_reads_are_column_pruned(ray_session, monkeypatch):
    """Range and sort queries must fetch ONLY the fast-field columns
    they touch from docvalues — never the whole docvalues table, and
    (for pure range/all-sort queries) no postings payloads at all."""
    import os

    import toshi_ray.segments as segments

    root = tempfile.mkdtemp(prefix="toshi_prune_")
    build_index(pages_dataset(400, parallelism=2), page_schema(), root,
                docs_per_segment=200)

    reads: list[tuple[str, tuple | None]] = []
    orig = segments.pq.read_table

    def spy(path, *a, columns=None, **kw):
        reads.append((str(path), tuple(columns) if columns is not None else None))
        if columns is not None:
            return orig(path, *a, columns=list(columns), **kw)
        return orig(path, *a, **kw)

    monkeypatch.setattr(segments.pq, "read_table", spy)
    try:
        s = Searcher(root, distributed=False)
        ids = s.match_doc_ids({"query": {"range": {"doc_id": {"gte": 5, "lt": 50}}}})
        assert len(ids) == 45
        r = s.search({"query": None, "sort_by": "doc_id", "limit": 7})
        assert [d["doc"]["doc_id"] for d in r["docs"]] == list(range(399, 392, -1))
    finally:
        monkeypatch.setattr(segments.pq, "read_table", orig)

    dv_reads = [(p, c) for p, c in reads if "docvalues" in os.path.basename(p)
                or "docvalues" in p]
    post_reads = [(p, c) for p, c in reads if "postings" in p]
    store_reads = [(p, c) for p, c in reads if "store" in p]
    assert dv_reads, "queries must have read docvalues"
    for p, c in dv_reads:
        assert c is not None, f"unprojected docvalues read: {p}"
        assert set(c) <= {"doc_id"}, f"over-wide docvalues read: {c}"
    # a pure range / match-all-sort query never opens postings payloads
    assert post_reads == [], post_reads
    # doc retrieval for the sort's top-k hits the store — that's the
    # requested payload, not waste
    assert store_reads != []


def test_copy_only_storage_backend(ray_session):
    """Build → merge → search with the object-store-shaped backend
    (no hard links, copies only — toshi_ray.storage.CopyOnlyStorage):
    results must be identical to the hard-link default. Pins the
    storage shim every publish/link site routes through."""
    import os

    from toshi_ray.storage import CopyOnlyStorage, LocalFileStorage, set_storage

    prev = set_storage(CopyOnlyStorage())
    try:
        root = tempfile.mkdtemp(prefix="toshi_copyonly_")
        build_index(pages_dataset(600, parallelism=2), page_schema(), root,
                    docs_per_segment=100)
        merge_segments(root, hot_df_threshold=300, shard_span=400)
        s = Searcher(root, distributed=False)
        res_copy = {t: engine_topk(s, {"term": {"text": t}}) for t in QUERY_TERMS}
    finally:
        set_storage(prev)

    root2 = tempfile.mkdtemp(prefix="toshi_hardlink_")
    assert isinstance(prev, LocalFileStorage)
    build_index(pages_dataset(600, parallelism=2), page_schema(), root2,
                docs_per_segment=100)
    merge_segments(root2, hot_df_threshold=300, shard_span=400)
    s2 = Searcher(root2, distributed=False)
    for t, want in res_copy.items():
        assert engine_topk(s2, {"term": {"text": t}}) == want, t
    # the copy-only run produced real (non-hard-linked) side files
    merged = [n for n in os.listdir(os.path.join(root, "segments"))
              if n.startswith("seg-merged")]
    assert merged, "merge must have published a segment"
    for dirpath, _dirs, files in os.walk(os.path.join(root, "segments", merged[0])):
        for f in files:
            assert os.stat(os.path.join(dirpath, f)).st_nlink == 1, (dirpath, f)


def test_merge_resumes_from_partition_checkpoints(ray_session):
    """A merge rerun after a simulated crash (manifest rolled back,
    final segment dir lost) must reuse every finished partition
    checkpoint and produce identical search results."""
    import json
    import os
    import shutil

    from toshi_ray.pipelines.build import load_manifest

    root = tempfile.mkdtemp(prefix="toshi_resume_merge_")
    build_index(pages_dataset(800, parallelism=2), page_schema(), root,
                docs_per_segment=100)
    mpath = os.path.join(root, "manifest.json")
    manifest_before = open(mpath).read()

    merge_segments(root, hot_df_threshold=300, shard_span=400)
    merged = [s for s in load_manifest(root)["segments"]
              if s["name"].startswith("seg-merged")][0]
    assert merged["metrics"]["parts_resumed"] == 0
    assert merged["metrics"]["parts"] > 0
    s1 = Searcher(root, distributed=False)
    res1 = {t: engine_topk(s1, {"term": {"text": t}}) for t in QUERY_TERMS}

    # simulated crash BEFORE publish: old manifest back, final dir gone,
    # checkpoints intact
    shutil.rmtree(os.path.join(root, "segments", merged["name"]))
    with open(mpath, "w") as f:
        f.write(manifest_before)

    merge_segments(root, hot_df_threshold=300, shard_span=400)
    merged2 = [s for s in load_manifest(root)["segments"]
               if s["name"].startswith("seg-merged")][0]
    assert merged2["name"] == merged["name"]  # content-keyed identity
    assert merged2["metrics"]["parts_resumed"] == merged2["metrics"]["parts"]
    s2 = Searcher(root, distributed=False)
    for t, want in res1.items():
        assert engine_topk(s2, {"term": {"text": t}}) == want, t

    # gc reclaims the checkpoints
    from toshi_ray.pipelines.merge import gc_segments

    gc_segments(root, checkpoint_grace_s=0)
    ck = os.path.join(root, ".merge-ckpt")
    assert (not os.path.isdir(ck)) or os.listdir(ck) == []
    # fresh checkpoints survive a default-grace gc (in-flight protection)


def test_gc_keeps_resumable_checkpoints(ray_session):
    """gc must NOT discard a crashed merge's checkpoints while every
    source segment is still live/unchanged — a retry (even after a
    scheduled gc with zero grace) resumes all partitions. Once the
    merge publishes and its sources leave the manifest, the same gc
    reclaims the checkpoint immediately."""
    import os
    import shutil

    from toshi_ray.pipelines.build import load_manifest
    from toshi_ray.pipelines.merge import gc_segments

    root = tempfile.mkdtemp(prefix="toshi_gc_resume_")
    build_index(pages_dataset(600, parallelism=2), page_schema(), root,
                docs_per_segment=100)
    mpath = os.path.join(root, "manifest.json")
    manifest_before = open(mpath).read()

    merge_segments(root, hot_df_threshold=300, shard_span=400)
    merged = [s for s in load_manifest(root)["segments"]
              if s["name"].startswith("seg-merged")][0]
    # crash before publish: manifest rolled back, final dir gone,
    # sources live again, checkpoints on disk
    shutil.rmtree(os.path.join(root, "segments", merged["name"]))
    with open(mpath, "w") as f:
        f.write(manifest_before)

    gc_segments(root, checkpoint_grace_s=0)  # aggressive scheduled gc
    ck = os.path.join(root, ".merge-ckpt")
    assert os.path.isdir(ck) and os.listdir(ck), "resumable ckpt was gc'ed"

    merge_segments(root, hot_df_threshold=300, shard_span=400)
    merged2 = [s for s in load_manifest(root)["segments"]
               if s["name"].startswith("seg-merged")][0]
    assert merged2["metrics"]["parts_resumed"] == merged2["metrics"]["parts"]

    # after publish the sources are dead → the same gc reclaims it
    gc_segments(root, checkpoint_grace_s=0)
    assert (not os.path.isdir(ck)) or os.listdir(ck) == []


def test_merge_checkpoints_invalidate_on_rebuild(ray_session, tmp_path):
    """A leftover merge checkpoint must NOT be resumed after an
    overwrite rebuild that reproduces the same segment names over
    different text — the content-keyed merge identity (file size +
    mtime) invalidates it."""
    import pyarrow as pa
    import ray

    from toshi_ray.pipelines.build import load_manifest

    schema = Schema.build(FieldDef("doc_id", "u64", fast=True),
                          FieldDef("text", "text"))

    def corpus(word):
        return pa.table({
            "doc_id": pa.array(np.arange(400, dtype=np.uint64)),
            "text": [f"{word} tok{i % 7} filler" for i in range(400)],
        })

    root = str(tmp_path / "ck")
    build_index(ray.data.from_arrow(corpus("alpha")).repartition(4), schema,
                root, docs_per_segment=50)
    merge_segments(root)  # completes; its checkpoint dir stays until gc

    build_index(ray.data.from_arrow(corpus("delta")).repartition(4), schema,
                root, overwrite=True, docs_per_segment=50)
    merge_segments(root)
    merged = [s for s in load_manifest(root)["segments"]
              if s["name"].startswith("seg-merged")][0]
    assert merged["metrics"]["parts_resumed"] == 0  # stale ckpt NOT reused
    s = Searcher(root, distributed=False)
    assert s.count({"query": {"term": {"text": "alpha"}}}) == 0
    assert s.count({"query": {"term": {"text": "delta"}}}) == 400


def test_numeric_term_query_with_null_docvalues(ray_session, tmp_path):
    """A doc omitting an optional numeric field stores a null — an
    equality term query must treat null as non-matching, not crash on
    an object-dtype mask."""
    import pyarrow as pa
    import ray

    schema = Schema.build(FieldDef("doc_id", "u64", fast=True),
                          FieldDef("text", "text"),
                          FieldDef("year", "i64", fast=False))
    t = pa.table({
        "doc_id": pa.array([0, 1, 2], pa.uint64()),
        "text": ["has year", "no year here", "same year"],
        "year": pa.array([2020, None, 2020], pa.int64()),
    })
    root = str(tmp_path / "nulls")
    build_index(ray.data.from_arrow(t), schema, root)
    s = Searcher(root, distributed=False)
    r = s.search({"query": {"term": {"year": "2020"}}})
    assert sorted(d["doc"]["doc_id"] for d in r["docs"]) == [0, 2]


def test_limit_zero_returns_empty(ray_session, tmp_path):
    """limit=0 returns zero docs on every execution path (block-max
    term, union, and the generic eval path) instead of a numpy
    partition error."""
    import pyarrow as pa
    import ray

    schema = Schema.build(FieldDef("doc_id", "u64", fast=True),
                          FieldDef("text", "text"))
    t = pa.table({"doc_id": pa.array(range(50), pa.uint64()),
                  "text": ["common word here"] * 50})
    root = str(tmp_path / "lim0")
    build_index(ray.data.from_arrow(t), schema, root)
    s = Searcher(root, distributed=False)
    for q in [{"term": {"text": "common"}},
              {"bool": {"should": [{"term": {"text": "common"}},
                                   {"term": {"text": "word"}}]}},
              None]:
        r = s.search({"query": q, "limit": 0})
        assert r["docs"] == [], q


def test_regex_validated_by_executing_engine(ray_session, tmp_path):
    """Regex validity is decided by the EXECUTING engine (Arrow RE2):
    Python-only syntax (lookahead) raises the golden error; RE2-only
    syntax (POSIX classes) is accepted."""
    import pyarrow as pa
    import ray

    from toshi_ray.query import QueryError

    schema = Schema.build(FieldDef("doc_id", "u64", fast=True),
                          FieldDef("text", "text"))
    t = pa.table({"doc_id": pa.array([0, 1], pa.uint64()),
                  "text": ["alpha beta", "gamma delta"]})
    root = str(tmp_path / "re2")
    build_index(ray.data.from_arrow(t), schema, root)
    s = Searcher(root, distributed=False)
    with pytest.raises(QueryError) as e:
        s.search({"query": {"regex": {"text": "foo(?=bar)"}}})
    assert str(e.value).startswith("Error in query execution: 'Invalid regex:")
    # RE2 accepts POSIX character classes Python's `re` rejects
    r = s.search({"query": {"regex": {"text": "[[:alpha:]]+"}}})
    assert r["hits"] == 2


def test_make_snippet_contract():
    """1-based first_pos, start clamp, window width, all-occurrence
    highlight, absent-term sentinel."""
    from toshi_ray.search import make_snippet

    pos, frag = make_snippet("The SPARK engine spark.", "spark")
    assert pos == 5  # 1-based, on the lowercased text
    assert frag == "the <b>spark</b> engine <b>spark</b>."
    # window clamps at text start and cuts at width
    text = "x" * 30 + " spark " + "y" * 200
    pos, frag = make_snippet(text, "spark", context=20, width=40)
    assert pos == 32
    assert frag == text.lower()[11:51].replace("spark", "<b>spark</b>")
    assert make_snippet("no match", "spark") == (0, "")


def test_suggest_prefix_topk(ray_session):
    """Index-backed prefix suggest: df-ranked completions match a
    brute-force tokenization at multiple segment counts, and (like
    Lucene) tombstoned docs still count until a merge."""
    import re
    from collections import Counter

    from toshi_ray.pipelines.merge import delete_by_term
    from toshi_ray.sources.webpages import make_pages_batch

    root = tempfile.mkdtemp(prefix="toshi_sug_")
    build_index(pages_dataset(300, parallelism=2), page_schema(), root,
                docs_per_segment=100)
    s = Searcher(root, distributed=False)

    tbl = make_pages_batch(np.arange(300))
    df = Counter()
    for txt in tbl["text"].to_pylist():
        toks = {w for w in re.split(r"[^0-9a-z]+", txt.lower())
                if w and len(w) < 40 and w.startswith("w0001")}
        df.update(toks)
    want = sorted(df.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
    assert s.suggest("text", "w0001", k=5) == want

    # tombstones do not change df until merge
    victim = want[0][0]
    delete_by_term(root, "text", victim)
    s2 = Searcher(root, distributed=False)
    assert s2.suggest("text", "w0001", k=5) == want
