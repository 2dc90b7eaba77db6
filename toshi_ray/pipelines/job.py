"""`ray job submit` entrypoints — build / merge / search as batch jobs.

Usage (north_rule launch path; on a real cluster drop `--local`):

    ray job submit --working-dir . -- \
        python -m toshi_ray.pipelines.job build \
            --input /data/pages --index /data/index \
            --schema schema.json --docs-per-segment 50000

    python -m toshi_ray.pipelines.job merge  --index /data/index
    python -m toshi_ray.pipelines.job search --index /data/index \
            --query '{"term": {"text": "spark"}}' --limit 10

The job owns its Ray session (guarded init — inside `ray job submit`
the cluster connection already exists).
"""

from __future__ import annotations

import argparse
import json
import sys


def _ensure_ray(num_cpus: int | None) -> bool:
    """→ True iff WE initialized ray (then we own the shutdown; inside
    `ray job submit` or a test session the connection already exists
    and must be left alone)."""
    import ray

    if ray.is_initialized():
        return False
    kwargs = dict(include_dashboard=False, ignore_reinit_error=True)
    if num_cpus:
        kwargs.update(address="local", num_cpus=num_cpus)
    ray.init(**kwargs)
    return True


def cmd_build(args) -> dict:
    import ray.data

    from toshi_ray.pipelines.build import build_index
    from toshi_ray.schema import Schema

    with open(args.schema) as f:
        schema = Schema.loads(f.read())
    cols = [args.doc_id_col] + [fd.name for fd in schema.fields if fd.name != args.doc_id_col]
    ds = ray.data.read_parquet(args.input, columns=cols)
    manifest = build_index(
        ds,
        schema,
        args.index,
        doc_id_col=args.doc_id_col,
        docs_per_segment=args.docs_per_segment,
        lineage=f"job:build input={args.input}",
    )
    return {"segments": len(manifest["segments"]), "metrics": manifest["metrics"]}


def cmd_merge(args) -> dict:
    from toshi_ray.pipelines.merge import gc_segments, maybe_merge

    merged = maybe_merge(args.index)
    gc = gc_segments(args.index) if args.gc else 0
    return {"merges": len(merged), "gc_removed": gc}


def cmd_search(args) -> dict:
    from toshi_ray.search import Searcher

    s = Searcher(args.index)
    out = s.search({"query": json.loads(args.query), "limit": args.limit})
    s.close()
    return out


def cmd_ingest_ndjson(args) -> dict:
    from toshi_ray.schema import Schema
    from toshi_ray.sources.ndjson import bulk_index_ndjson

    with open(args.schema) as f:
        schema = Schema.loads(f.read())
    manifest = bulk_index_ndjson(
        args.input.split(","), schema, args.index,
        id_col=args.id_col, docs_per_segment=args.docs_per_segment,
    )
    return {"segments": len(manifest["segments"]), "metrics": manifest["metrics"]}


def cmd_dedup(args) -> dict:
    """Dedup as a batch job: exact / one-shot minhash pairs / persisted
    index build / incremental probe. Pair outputs land as partitioned
    parquet under --output (resumable, never one giant file)."""
    import glob
    import shutil

    import pyarrow.parquet as pq
    import ray.data

    ds = ray.data.read_parquet(args.input)
    if args.output:
        # a rerun must never mix with a prior run's files (the
        # build_minhash_index convention; write_parquet only appends)
        shutil.rmtree(args.output, ignore_errors=True)
    if args.method == "index-build":
        from toshi_ray.ops.dedup import build_minhash_index

        meta = build_minhash_index(ds, args.state, col=args.col,
                                   id_col=args.id_col)
        return {"index": args.state, **meta}
    if args.method == "exact":
        from toshi_ray.ops.dedup import exact_dedup

        out = exact_dedup(ds, col=args.col, id_col=args.id_col)
    elif args.method == "minhash":
        from toshi_ray.ops.dedup import minhash_lsh_pairs

        out = minhash_lsh_pairs(ds, args.col, args.id_col,
                                threshold=args.threshold)
    elif args.method == "probe":
        from toshi_ray.ops.dedup import minhash_probe

        out = minhash_probe(ds, args.state, threshold=args.threshold)
    else:  # pragma: no cover - argparse choices guard this
        raise ValueError(args.method)
    out.write_parquet(args.output)
    n = sum(pq.ParquetFile(f).metadata.num_rows
            for f in glob.glob(f"{args.output}/*.parquet"))
    return {"output": args.output, "rows": n}


def cmd_report(args) -> dict:
    """The one-command training-data story: quality filter → exact dedup
    → near-dup cluster drop → language mixing → sequence packing over a
    parquet or NDJSON corpus, with a stage-by-stage attrition report
    (see `toshi_ray.pipelines.curate`)."""
    import shutil

    import ray.data

    from toshi_ray.pipelines.curate import curate_report

    if args.input.endswith((".ndjson", ".jsonl", ".json")):
        ds = ray.data.read_json(
            args.input, file_extensions=["json", "ndjson", "jsonl"]
        )
    else:
        ds = ray.data.read_parquet(args.input)
    if args.output and not args.resume:
        shutil.rmtree(args.output, ignore_errors=True)
    rates = None
    if args.rates:
        rates = {
            k: int(v)
            for k, v in (kv.split("=", 1) for kv in args.rates.split(","))
        }
    return curate_report(
        ds,
        col=args.col,
        id_col=args.id_col,
        min_quality=args.min_quality,
        dedup_threshold=args.dedup_threshold,
        rates_ppm=rates,
        seq_len=args.seq_len,
        output=args.output,
    )


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="toshi_ray.pipelines.job")
    p.add_argument("--local-cpus", type=int, default=None,
                   help="standalone mode: ray.init(address='local', num_cpus=N)")
    sub = p.add_subparsers(dest="cmd", required=True)

    b = sub.add_parser("build")
    b.add_argument("--input", required=True)
    b.add_argument("--index", required=True)
    b.add_argument("--schema", required=True)
    b.add_argument("--doc-id-col", default="doc_id")
    b.add_argument("--docs-per-segment", type=int, default=50_000)

    m = sub.add_parser("merge")
    m.add_argument("--index", required=True)
    m.add_argument("--gc", action="store_true")

    s = sub.add_parser("search")
    s.add_argument("--index", required=True)
    s.add_argument("--query", required=True)
    s.add_argument("--limit", type=int, default=10)

    n = sub.add_parser("ingest-ndjson")
    n.add_argument("--input", required=True, help="comma-separated NDJSON paths")
    n.add_argument("--index", required=True)
    n.add_argument("--schema", required=True)
    n.add_argument("--id-col", default="doc_id")
    n.add_argument("--docs-per-segment", type=int, default=50_000)

    d = sub.add_parser("dedup")
    d.add_argument("--input", required=True)
    d.add_argument("--output", help="pair/survivor parquet dir")
    d.add_argument("--method", required=True,
                   choices=["exact", "minhash", "index-build", "probe"])
    d.add_argument("--state", help="minhash index dir (index-build/probe)")
    d.add_argument("--col", default="text")
    d.add_argument("--id-col", default="doc_id")
    d.add_argument("--threshold", type=float, default=0.5)

    r = sub.add_parser("report", help="quality→dedup→mix→pack curation "
                       "pipeline with a stage attrition report")
    r.add_argument("--input", required=True, help="parquet dir or NDJSON file")
    r.add_argument("--output", help="write corpus/ + packed/ parquet here "
                   "(stage checkpoints; resumable)")
    r.add_argument("--col", default="text")
    r.add_argument("--id-col", default="doc_id")
    r.add_argument("--min-quality", type=float, default=0.25)
    r.add_argument("--dedup-threshold", type=float, default=0.5)
    r.add_argument("--rates", help="per-language keep rates in ppm, e.g. "
                   "'en=1000000,de=250000' (unlisted languages keep all)")
    r.add_argument("--seq-len", type=int, default=2048)
    r.add_argument("--resume", action="store_true",
                   help="keep --output; completed stage checkpoints "
                   "(<stage>.done present) are not recomputed")

    args = p.parse_args(argv)
    if args.cmd == "dedup":  # fail at argparse, not deep inside the job
        if args.method in ("exact", "minhash", "probe") and not args.output:
            p.error(f"--output is required for --method {args.method}")
        if args.method in ("index-build", "probe") and not args.state:
            p.error(f"--state is required for --method {args.method}")
    owns_ray = _ensure_ray(args.local_cpus)
    out = {"build": cmd_build, "merge": cmd_merge, "search": cmd_search,
           "ingest-ndjson": cmd_ingest_ndjson, "dedup": cmd_dedup,
           "report": cmd_report}[args.cmd](args)
    print(json.dumps(out))
    if owns_ray:
        import ray

        ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
