"""`ray job submit` entrypoint round trip: build → merge → search →
ingest-ndjson through the argparse surface (in-process, shared ray
session — main() must NOT shut down a session it didn't start)."""

import json

import numpy as np
import pytest


def test_job_cli_roundtrip(ray_session, tmp_path, capsys):
    import ray

    from toshi_ray.pipelines.job import main
    from toshi_ray.schema import FieldDef, Schema
    from toshi_ray.sources.webpages import write_pages_parquet

    pages = str(tmp_path / "pages")
    write_pages_parquet(pages, 600, parallelism=2)
    schema = Schema.build(
        FieldDef("doc_id", "u64", fast=True),
        FieldDef("url", "text", indexed=False),
        FieldDef("text", "text"),
        FieldDef("lang", "facet"),
    )
    spath = str(tmp_path / "schema.json")
    with open(spath, "w") as f:
        f.write(schema.dumps())
    idx = str(tmp_path / "idx")

    assert main(["build", "--input", pages, "--index", idx,
                 "--schema", spath, "--docs-per-segment", "100"]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["metrics"]["num_docs"] == 600 and out["segments"] >= 6

    assert main(["search", "--index", idx,
                 "--query", '{"term": {"text": "w00042"}}', "--limit", "5"]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["hits"] >= 1

    assert main(["merge", "--index", idx, "--gc"]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["merges"] >= 0

    # NDJSON ingest through the CLI
    nd = tmp_path / "docs.ndjson"
    with open(nd, "w") as f:
        for i in range(10):
            f.write(json.dumps({"url": f"u{i}", "text": f"gamma doc {i}",
                                "lang": "/lang/en"}) + "\n")
    idx2 = str(tmp_path / "idx2")
    assert main(["ingest-ndjson", "--input", str(nd), "--index", idx2,
                 "--schema", spath, "--id-col", "url"]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["metrics"]["num_docs"] == 10

    # the shared session must still be alive
    assert ray.is_initialized()


def test_job_cli_dedup(ray_session, tmp_path, capsys):
    """dedup subcommand: exact stats, index-build → probe round trip,
    partitioned parquet pair output."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from toshi_ray.pipelines.job import main

    texts = ["the quick brown fox jumps over the lazy dog"] * 3 + [
        f"unique document number {i} with its own words entirely" for i in range(20)
    ]
    src = str(tmp_path / "docs.parquet")
    pq.write_table(
        pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts)}), src)

    out1 = str(tmp_path / "exact")
    assert main(["dedup", "--input", src, "--output", out1,
                 "--method", "exact"]) == 0
    r = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert r["rows"] == 21  # one row per KEEPER: 1 for the triple + 20 uniques

    state = str(tmp_path / "mhidx")
    assert main(["dedup", "--input", src, "--method", "index-build",
                 "--state", state]) == 0
    r = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert r["index"] == state and r["num_perm"] == 64

    out2 = str(tmp_path / "probe")
    assert main(["dedup", "--input", src, "--output", out2,
                 "--method", "probe", "--state", state,
                 "--threshold", "0.9"]) == 0
    r = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    # the three identical docs pair with themselves across ref/new
    assert r["rows"] >= 3
