"""End-to-end training-data curation: the one-command pipeline a user
points at a raw corpus to get packed training sequences plus a stage-by-
stage attrition report.

    raw docs → quality+lang annotate (one tokenize pass)
             → quality filter
             → exact dedup (content-hash, min-id survivor)
             → near-dup drop (MinHash LSH pairs → connected components,
               keep each cluster's canonical min-id doc)
             → language mixing (deterministic per-stratum keep-hash)
             → GPT-style sequence packing

Composes the library's existing ops (`textstats`, `dedup`, `sampling`,
`cleaning`) — every stage is a Ray Data batch transform; the only
all-to-all exchanges are the two dedup shuffles. This is the pipeline
the reference's users run around the index (ingest-side corpus prep);
exposed as `python -m toshi_ray.pipelines.job report`.

Scale shape: with ``output`` set, every stage boundary is a partitioned
parquet checkpoint (resumable — a rerun of a later stage never recomputes
earlier ones; at 100 TB this is how you'd run it). Without ``output``
(tests, small corpora) stages materialize in the object store instead.
The near-dup loser set gathers to the driver — it is bounded by the
number of near-duplicate docs (≤ 2 × confirmed pairs), the same
boundedness contract as `minhash_lsh_pairs`'s candidate gather.
"""

from __future__ import annotations

import os
from typing import Any

import numpy as np
import pyarrow as pa

from toshi_ray.ops._gather import col_i64, gather_table


def annotate_quality_lang(ds, *, col: str = "text",
                          min_quality: float | None = None):
    """Attach ``quality`` + ``pred_lang`` columns to the corpus rows with
    a SINGLE tokenize pass per batch (quality_score and lang_id each
    retokenize when run separately; the curation pipeline needs both AND
    the text, so compute them together and keep every input column).
    Semantics match `textstats.quality_score` / `textstats.lang_id`
    exactly — the per-language stopword votes double as the quality
    formula's English stopword count. Optionally filters in place."""
    from toshi_ray.ops.textstats import (
        LANG_ORDER,
        STOPWORDS,
        _per_doc_count_in_set,
        _per_doc_distinct,
        _tokenize,
    )

    lang_sets = [set(STOPWORDS[lang]) for lang in LANG_ORDER]
    en_row = LANG_ORDER.index("en")

    def fn(t: pa.Table) -> pa.Table:
        n = t.num_rows
        if n == 0:
            return (
                t.append_column("quality", pa.array([], pa.float64()))
                .append_column("pred_lang", pa.array([], pa.string()))
            )
        tc = _tokenize(t, col)
        votes = np.stack([_per_doc_count_in_set(tc, n, s) for s in lang_sets])
        best = np.argmax(votes, axis=0)  # first max → LANG_ORDER tie-break
        langs = np.asarray(LANG_ORDER, dtype=object)[best]
        langs[votes.max(axis=0) == 0] = "en"
        n_tok = tc.norms.astype(np.float64)
        safe = np.maximum(n_tok, 1.0)
        quality = (
            0.4 * np.minimum(n_tok / 200.0, 1.0)
            + 0.3 * (votes[en_row].astype(np.float64) / safe)
            + 0.3 * (_per_doc_distinct(tc, n).astype(np.float64) / safe)
        )
        out = t.append_column("quality", pa.array(quality)).append_column(
            "pred_lang", pa.array(langs, type=pa.string())
        )
        if min_quality is not None:
            out = out.filter(pa.array(quality >= min_quality))
        return out

    return ds.map_batches(fn, batch_format="pyarrow")


def _resume(output: str | None, name: str):
    """→ the completed checkpoint Dataset, or None if it must be
    (re)computed. The ``<name>.done`` marker is written LAST (same
    completion-marker convention as `build_minhash_index`'s meta.json),
    so a crash mid-write is indistinguishable from never-ran."""
    import ray.data

    if output is None:
        return None
    path = os.path.join(output, name)
    if os.path.exists(path + ".done"):
        return ray.data.read_parquet(path)
    return None


def _check_params(output: str | None, params: dict[str, Any]) -> None:
    """Resume safety: a checkpoint dir is only valid for the parameter
    set it was computed under. First run records params.json; a later
    run over the same dir with different parameters hard-fails rather
    than silently serving stale-parameter checkpoints."""
    import json

    if output is None:
        return
    os.makedirs(output, exist_ok=True)
    path = os.path.join(output, "params.json")
    if os.path.exists(path):
        with open(path) as f:
            prev = json.load(f)
        if prev != params:
            raise ValueError(
                f"{output} holds checkpoints computed under different "
                f"parameters ({prev} != {params}); use a fresh output "
                "dir or rerun without --resume"
            )
        return
    with open(path, "w") as f:
        json.dump(params, f)


def _checkpoint(ds, output: str | None, name: str):
    """Stage boundary: partitioned-parquet checkpoint when an output dir
    is given (resumable — a completed stage is never recomputed),
    object-store materialize otherwise."""
    import shutil

    import ray.data

    if output is None:
        return ds.materialize()
    done = _resume(output, name)
    if done is not None:
        return done
    path = os.path.join(output, name)
    shutil.rmtree(path, ignore_errors=True)  # partial files from a crash
    ds.write_parquet(path)
    has_parquet = os.path.isdir(path) and any(
        f.endswith(".parquet") for f in os.listdir(path)
    )
    if not has_parquet:
        # A zero-row stage writes no files; persist an empty file with
        # the stage schema so resume (and downstream reads) still work.
        # The schema fetch partially re-executes the stage — acceptable
        # ONLY in this rare zero-row branch (a pre-write fetch would tax
        # every checkpointed stage, doubling the shuffle stages).
        import pyarrow.parquet as pq

        schema = ds.schema(fetch_if_missing=True)
        if schema is None:  # empty pipeline of empty blocks — no schema:
            return ds.materialize()  # nothing to persist; resume recomputes
        arrow = getattr(schema, "base_schema", None) or pa.schema(
            list(zip(schema.names, schema.types))
        )
        os.makedirs(path, exist_ok=True)
        pq.write_table(arrow.empty_table(), os.path.join(path, "empty.parquet"))
    with open(path + ".done", "w") as f:
        f.write("{}")
    return ray.data.read_parquet(path)


def curate_corpus(
    ds,
    *,
    col: str = "text",
    id_col: str = "doc_id",
    min_quality: float = 0.25,
    dedup_threshold: float = 0.5,
    rates_ppm: dict[str, int] | None = None,
    default_ppm: int = 1_000_000,
    output: str | None = None,
    perm_hash: str = "fast",
    bucket_cap: int | None = None,
    report: dict[str, Any] | None = None,
):
    """The curation chain up to (and including) language mixing; → the
    surviving-corpus Dataset (doc_id, text, quality, pred_lang).
    ``perm_hash="sql"`` + ``bucket_cap`` pass through to
    `minhash_lsh_pairs` so a DuckDB oracle can recompute the whole chain
    (see `queries.py` `curate_corpus`). Fills ``report`` if given."""
    import ray

    from toshi_ray.ops.dedup import dup_components, exact_dedup_drop, minhash_lsh_pairs
    from toshi_ray.ops.sampling import stratified_sample

    import time as _time

    report = report if report is not None else {}
    stage_secs = report.setdefault("stage_secs", {})
    report["n_input"] = ds.count()
    _t0 = _time.perf_counter()
    _check_params(output, {
        "col": col, "id_col": id_col, "min_quality": min_quality,
        "dedup_threshold": dedup_threshold, "rates_ppm": rates_ppm,
        "default_ppm": default_ppm, "perm_hash": perm_hash,
        "bucket_cap": bucket_cap,
        # input fingerprint: --resume against a DIFFERENT corpus must
        # fail rather than serve the old corpus's checkpoints
        "input_rows": report["n_input"],
    })

    ann = _checkpoint(
        annotate_quality_lang(
            ds.select_columns([id_col, col]), col=col,
            min_quality=min_quality,
        ),
        output, "stage1-quality",
    )
    report["n_after_quality"] = ann.count()
    stage_secs["quality"] = round(_time.perf_counter() - _t0, 3)
    _t0 = _time.perf_counter()

    exact = _checkpoint(exact_dedup_drop(ann, col, id_col), output, "stage2-exact")
    report["n_after_exact_dedup"] = exact.count()
    stage_secs["exact_dedup"] = round(_time.perf_counter() - _t0, 3)
    _t0 = _time.perf_counter()

    stage3 = _resume(output, "stage3-neardup")
    if stage3 is None:
        # Guarded behind the resume check: pair generation gathers the
        # (bounded) candidate set eagerly, so a resumed run must not
        # even construct it.
        mh_kw: dict[str, Any] = {"perm_hash": perm_hash}
        if bucket_cap is not None:
            mh_kw["bucket_cap"] = bucket_cap
        pairs = minhash_lsh_pairs(
            exact, col, id_col, threshold=dedup_threshold, **mh_kw
        )
        comp_t = gather_table(dup_components(pairs))
        if comp_t is None:
            losers = np.array([], dtype=np.int64)
        else:
            # dup_components always emits (doc_id, component), whatever
            # the caller's id_col is; each cluster keeps its min id
            did = col_i64(comp_t, "doc_id")
            losers = np.sort(did[did != col_i64(comp_t, "component")])
        # bounded by near-duplicate docs
        ref = ray.put(losers)

        def drop_losers(t: pa.Table) -> pa.Table:
            bad = ray.get(ref)
            if bad.size == 0:
                return t
            ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
            pos = np.searchsorted(bad, ids)
            hit = (pos < bad.size) & (bad[np.minimum(pos, max(bad.size - 1, 0))] == ids)
            return t.filter(pa.array(~hit))

        stage3 = _checkpoint(
            exact.map_batches(drop_losers, batch_format="pyarrow"),
            output, "stage3-neardup",
        )
    report["n_near_dup_removed"] = report["n_after_exact_dedup"] - stage3.count()
    stage_secs["near_dedup"] = round(_time.perf_counter() - _t0, 3)
    _t0 = _time.perf_counter()

    survivors = stage3
    if rates_ppm:
        survivors = stratified_sample(
            survivors, rates_ppm, strata_col="pred_lang",
            default_ppm=default_ppm, id_col=id_col,
        )
    corpus = _checkpoint(survivors, output, "corpus")
    report["n_corpus"] = corpus.count()
    stage_secs["mix_corpus"] = round(_time.perf_counter() - _t0, 3)
    if output:
        report["corpus_path"] = os.path.join(output, "corpus")
    return corpus


def curate_report(
    ds,
    *,
    col: str = "text",
    id_col: str = "doc_id",
    min_quality: float = 0.25,
    dedup_threshold: float = 0.5,
    rates_ppm: dict[str, int] | None = None,
    default_ppm: int = 1_000_000,
    seq_len: int = 2048,
    output: str | None = None,
) -> dict[str, Any]:
    """Run the full curation pipeline; → attrition report dict. With
    ``output``, the final corpus lands at ``output/corpus`` and the
    packed sequences at ``output/packed-<seq_len>`` (partitioned
    parquet). A rerun over the same output dir must use the same
    curation parameters (validated against ``output/params.json``)."""
    from toshi_ray.ops.cleaning import pack_sequences

    report: dict[str, Any] = {}
    corpus = curate_corpus(
        ds, col=col, id_col=id_col, min_quality=min_quality,
        dedup_threshold=dedup_threshold, rates_ppm=rates_ppm,
        default_ppm=default_ppm, output=output, report=report,
    )
    # seq_len-keyed checkpoint: one curated corpus can be re-packed at
    # several sequence lengths, each resumable independently
    import time as _time

    name = f"packed-{seq_len}"
    _t0 = _time.perf_counter()
    packed = _resume(output, name)
    if packed is None:  # pack's prefix-sum pass is eager — guard it too
        packed = _checkpoint(
            pack_sequences(corpus, seq_len=seq_len, col=col, id_col=id_col),
            output, name,
        )
    report["n_sequences"] = packed.count()
    report.setdefault("stage_secs", {})["pack"] = round(
        _time.perf_counter() - _t0, 3
    )
    report["seq_len"] = seq_len
    if output:
        report["packed_path"] = os.path.join(output, name)
    return report
