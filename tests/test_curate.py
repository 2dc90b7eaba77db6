"""Curation pipeline (`toshi_ray.pipelines.curate` + job CLI `report`):
the fused quality+lang annotate must agree byte-for-byte with the
standalone textstats ops, and the end-to-end report's stage counts must
reconcile with the individual ops run separately."""

import json
import math

import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001/documents.parquet"


def test_annotate_matches_standalone_ops(ray_session):
    import ray.data

    from toshi_ray.ops.textstats import lang_id, quality_score
    from toshi_ray.pipelines.curate import annotate_quality_lang

    ds = ray.data.read_parquet(SF).select_columns(["doc_id", "text"])
    ann = {
        int(r["doc_id"]): (r["quality"], r["pred_lang"])
        for r in annotate_quality_lang(ds).take_all()
    }
    q = {int(r["doc_id"]): r["quality"]
         for r in quality_score(ray.data.read_parquet(SF)).take_all()}
    l = {int(r["doc_id"]): r["pred_lang"]
         for r in lang_id(ray.data.read_parquet(SF)).take_all()}
    assert set(ann) == set(q) == set(l)
    for d, (qv, lv) in ann.items():
        assert qv == q[d] and lv == l[d]  # identical IEEE expression


def test_annotate_min_quality_filters(ray_session):
    import ray.data

    from toshi_ray.pipelines.curate import annotate_quality_lang

    ds = ray.data.read_parquet(SF).select_columns(["doc_id", "text"])
    rows = annotate_quality_lang(ds, min_quality=0.28).take_all()
    assert rows and all(r["quality"] >= 0.28 for r in rows)
    # kept exactly the super-threshold subset of the unfiltered run
    all_rows = annotate_quality_lang(ds).take_all()
    want = {int(r["doc_id"]) for r in all_rows if r["quality"] >= 0.28}
    assert {int(r["doc_id"]) for r in rows} == want


def test_curate_report_end_to_end(ray_session, tmp_path, capsys):
    import ray.data

    from toshi_ray.ops.dedup import dup_components, minhash_lsh_pairs
    from toshi_ray.pipelines.curate import annotate_quality_lang, curate_report
    from toshi_ray.pipelines.job import main

    out = str(tmp_path / "curated")
    assert main(["report", "--input", SF, "--output", out,
                 "--min-quality", "0.25", "--seq-len", "256"]) == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])

    n_input = pq.read_metadata(SF).num_rows
    assert rep["n_input"] == n_input
    assert 0 < rep["n_after_quality"] <= n_input
    assert 0 < rep["n_after_exact_dedup"] <= rep["n_after_quality"]
    assert rep["n_corpus"] == rep["n_after_exact_dedup"] - rep["n_near_dup_removed"]

    # stage counts reconcile with the standalone ops
    ds = ray.data.read_parquet(SF).select_columns(["doc_id", "text"])
    filtered = annotate_quality_lang(ds, min_quality=0.25)
    assert filtered.count() == rep["n_after_quality"]
    pairs = minhash_lsh_pairs(filtered, "text", "doc_id", threshold=0.5)
    losers = sum(
        1 for r in dup_components(pairs).take_all()
        if int(r["doc_id"]) != int(r["component"])
    )
    assert losers == rep["n_near_dup_removed"]

    # corpus checkpoint: survivors only, annotated schema, no loser ids
    corpus = pq.read_table(rep["corpus_path"])
    assert corpus.num_rows == rep["n_corpus"]
    assert {"doc_id", "text", "quality", "pred_lang"} <= set(corpus.column_names)

    # packed sequences: full-coverage fixed windows over the corpus tokens
    packed = pq.read_table(rep["packed_path"])
    assert packed.num_rows == rep["n_sequences"]
    total_tok = sum(
        r["n_tok"] for r in packed.to_pylist()
    )
    assert rep["n_sequences"] == math.ceil(total_tok / 256)
    assert max(r["n_tok"] for r in packed.to_pylist()) <= 256


def test_curate_report_resume_skips_completed_stages(
    ray_session, tmp_path, monkeypatch
):
    """Second run over the same output dir must reuse every completed
    checkpoint: the near-dup pair generation (the expensive eager stage)
    must not even be constructed."""
    import ray.data

    import toshi_ray.ops.dedup as dedup_mod
    from toshi_ray.pipelines.curate import curate_report

    out = str(tmp_path / "resumable")
    first = curate_report(
        ray.data.read_parquet(SF), min_quality=0.25, seq_len=256, output=out
    )

    def boom(*a, **kw):  # resume must never re-enter pair generation
        raise AssertionError("minhash_lsh_pairs recomputed on resume")

    monkeypatch.setattr(dedup_mod, "minhash_lsh_pairs", boom)
    second = curate_report(
        ray.data.read_parquet(SF), min_quality=0.25, seq_len=256, output=out
    )
    # stage wall-times legitimately differ between a fresh run and a
    # checkpoint resume; every data-derived field must be identical
    second.pop("stage_secs"), first.pop("stage_secs")
    assert second == first


def test_curate_resume_rejects_changed_params(ray_session, tmp_path):
    """Checkpoints are only valid under the parameters that produced
    them — a rerun over the same output dir with different settings must
    hard-fail, never silently serve stale-parameter stages."""
    import ray.data

    from toshi_ray.pipelines.curate import curate_report

    out = str(tmp_path / "guarded")
    curate_report(ray.data.read_parquet(SF), min_quality=0.25, output=out)
    with pytest.raises(ValueError, match="different\\s+parameters"):
        curate_report(ray.data.read_parquet(SF), min_quality=0.30, output=out)
    # a DIFFERENT input corpus over the same output dir must also fail
    # (input fingerprint rides in params.json)
    with pytest.raises(ValueError, match="different\\s+parameters"):
        curate_report(ray.data.read_parquet(SF).limit(100),
                      min_quality=0.25, output=out)


def test_curate_nondefault_id_col(ray_session):
    """dup_components emits (doc_id, component) regardless of the
    caller's id_col — the loser extraction must not KeyError."""
    import pyarrow.parquet as pq

    import ray.data

    from toshi_ray.pipelines.curate import curate_report

    t0 = pq.read_table(SF)
    t = t0.rename_columns(
        ["id" if c == "doc_id" else c for c in t0.column_names]
    )
    rep = curate_report(ray.data.from_arrow(t), id_col="id",
                        min_quality=0.25, seq_len=512)
    base = curate_report(ray.data.read_parquet(SF),
                         min_quality=0.25, seq_len=512)
    assert {k: v for k, v in rep.items() if k.startswith("n_")} == \
           {k: v for k, v in base.items() if k.startswith("n_")}


def test_curate_report_empty_quality_stage(ray_session, tmp_path):
    """min_quality=1.0 drops every doc — zero-row checkpoints must not
    crash the pipeline (write_parquet writes no files for 0 rows)."""
    import ray.data

    from toshi_ray.pipelines.curate import curate_report

    rep = curate_report(
        ray.data.read_parquet(SF), min_quality=1.0,
        output=str(tmp_path / "empty"),
    )
    assert rep["n_after_quality"] == 0
    assert rep["n_corpus"] == 0 and rep["n_sequences"] == 0


def test_checkpoint_empty_dir_without_parquet(ray_session, tmp_path, monkeypatch):
    """If write_parquet pre-creates the output dir but writes no parquet
    files (a possible future Ray behavior for empty datasets), the
    checkpoint must still persist the empty-schema file and resume must
    read it back instead of crashing on a parquet-free directory."""
    import os

    import pyarrow as pa
    import ray.data

    from toshi_ray.pipelines import curate

    ds = ray.data.from_arrow(
        pa.table({"id": pa.array([], pa.int64()), "t": pa.array([], pa.string())})
    )
    orig = type(ds).write_parquet

    def fake_write(self, path, *a, **kw):
        os.makedirs(path, exist_ok=True)  # dir appears, no parquet files

    monkeypatch.setattr(type(ds), "write_parquet", fake_write)
    try:
        out = curate._checkpoint(ds, str(tmp_path), "stage_x")
    finally:
        monkeypatch.setattr(type(ds), "write_parquet", orig)
    stage = tmp_path / "stage_x"
    assert (tmp_path / "stage_x.done").exists()
    assert any(f.endswith(".parquet") for f in os.listdir(stage))
    assert out.count() == 0
    # resume path: a fresh call must read the persisted empty checkpoint
    resumed = curate._checkpoint(ds, str(tmp_path), "stage_x")
    assert resumed.count() == 0 and set(resumed.schema().names) == {"id", "t"}
