"""Segment merge — the term-keyed shuffle with hot-term salting.

This is the consolidation analogue of tantivy's LogMergePolicy as
configured by the reference (`min_merge_size=8`, `min_layer_size=10_000`,
`level_log_size=0.75` — `toshi-server/src/settings.rs:47-49,190-201`,
SURVEY.md §2.6 A3), re-expressed as a Ray Data job:

    read_parquet([seg_i/postings])                    # one row per (term, shard)
      → map_batches(tag hot terms with doc-range salt)  # skew handling
      → groupby(field, term, shard_out)               # the all-to-all shuffle
          .map_groups(merge posting runs)             # decode+concat+re-encode
      → sort(field, term, shard) → write_parquet      # merged term dictionary

Salting (SURVEY.md §7.3/§7.4): a term whose df in ANY source segment
exceeds ``hot_df_threshold`` keeps per-doc-range shards
(``shard = first_doc // shard_span``) instead of collapsing into one
giant group — groups stay bounded, postings stay doc_id-sorted because
shards partition disjoint doc ranges, and readers already concatenate
multi-shard terms in shard order. Hot detection is a map-side filter
(no extra shuffle): at web scale the hot set is small by definition.

Doc-partitioned side files (docvalues / store) merge by plain
concatenation — doc ranges of input segments are disjoint.

Tombstones (delete-by-term, reference `handle.rs:184-210`, SURVEY.md
§2.2 T5) are applied physically here: tombstoned doc_ids drop out of
postings, docvalues and store; df/tf statistics are recomputed.
"""

from __future__ import annotations

import json
import math
import os
import shutil
import uuid

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from toshi_ray import codecs
from toshi_ray.pipelines.build import (
    MANIFEST_FILE,
    SEGMENTS_DIR,
    load_manifest,
    publish_manifest,
)
from toshi_ray.segments import DOCVALUES_FILE, META_FILE, POSTINGS_FILE, STORE_FILE

# reference defaults (config/config.toml:14-17)
MIN_MERGE_SIZE = 8
MIN_LAYER_SIZE = 10_000
LEVEL_LOG_SIZE = 0.75


def log_merge_candidates(
    segments: list[dict],
    min_merge_size: int = MIN_MERGE_SIZE,
    min_layer_size: int = MIN_LAYER_SIZE,
    level_log_size: float = LEVEL_LOG_SIZE,
) -> list[list[str]]:
    """Log-bucketed merge candidates (tantivy LogMergePolicy semantics:
    segments whose log-size falls in the same level merge once the level
    holds >= min_merge_size segments; everything under min_layer_size
    shares the bottom level)."""
    levels: dict[int, list[str]] = {}
    for s in segments:
        docs = max(1, s["num_docs"])
        lvl = 0 if docs < min_layer_size else int(math.log2(docs) * level_log_size)
        levels.setdefault(lvl, []).append(s["name"])
    return [names for names in levels.values() if len(names) >= min_merge_size]


_MERGED_SCHEMA = pa.schema(
    [
        ("field", pa.string()),
        ("term", pa.string()),
        ("shard", pa.int32()),
        ("df", pa.uint32()),
        ("first_doc", pa.uint64()),
        ("total_tf", pa.uint64()),
        ("max_tf", pa.uint32()),
        ("doc_ids", pa.large_binary()),
        ("tfs", pa.large_binary()),
        ("positions", pa.large_binary()),
        ("block_max_tf", pa.large_binary()),
        ("block_min_norm", pa.large_binary()),
        ("block_doc_offsets", pa.large_binary()),
        ("block_tf_offsets", pa.large_binary()),
        ("block_last_doc", pa.large_binary()),
    ]
)


def _block_meta(doc_ids, tfs):
    """Recompute the per-block skip columns for one merged posting run."""
    enc, boffs, last = codecs.encode_doc_ids_blocked(doc_ids)
    lens = codecs.varint_byte_lengths(tfs)
    cum = np.zeros(tfs.size + 1, dtype=np.int64)
    np.cumsum(lens, out=cum[1:])
    tf_offs = cum[codecs.block_offsets_for(doc_ids.size)]
    bstarts = codecs.block_offsets_for(doc_ids.size)[:-1]
    blk_max = (
        np.maximum.reduceat(tfs, bstarts) if doc_ids.size else np.empty(0, np.uint64)
    )
    return {
        "doc_ids": enc,
        "block_doc_offsets": boffs.astype(np.int32).tobytes(),
        "block_tf_offsets": tf_offs.astype(np.int32).tobytes(),
        "block_last_doc": last.astype(np.uint64).tobytes(),
        "block_max_tf": codecs.varint_encode(blk_max),
        "n_blocks": len(bstarts),
    }


def _merge_group(g: pa.Table) -> pa.Table:
    """Merge the posting rows of one (field, term, shard_out) group."""
    shard = int(g["shard_out"][0].as_py())
    if g.num_rows == 1:
        out = g.drop(["shard"]).rename_columns(
            [c if c != "shard_out" else "shard" for c in g.drop(["shard"]).column_names]
        )
        return out.select(_MERGED_SCHEMA.names).cast(_MERGED_SCHEMA)
    g = g.sort_by("first_doc")
    rows = g.to_pylist()
    doc_ids = np.concatenate([codecs.decode_doc_ids_blocked(r["doc_ids"], r["df"]) for r in rows])
    tf_payload = b"".join(r["tfs"] for r in rows)
    tfs = codecs.varint_decode(tf_payload)
    # positions streams restart absolutely at every doc → concat is valid
    has_pos = all(r["positions"] is not None for r in rows)
    pos_payload = b"".join(r["positions"] for r in rows) if has_pos else None

    # re-encode doc ids with block restarts; recompute all skip metadata
    bm = _block_meta(doc_ids, tfs)
    # conservative per-term min norm across sources, replicated per block
    src_min = min(min(r["block_min_norm"]) for r in rows)
    return pa.table(
        {
            "field": [rows[0]["field"]],
            "term": [rows[0]["term"]],
            "shard": [shard],
            "df": [sum(r["df"] for r in rows)],
            "first_doc": [int(doc_ids[0])],
            "total_tf": [sum(r["total_tf"] for r in rows)],
            "max_tf": [max(r["max_tf"] for r in rows)],
            "doc_ids": [bm["doc_ids"]],
            "tfs": [tf_payload],
            "positions": [pos_payload],
            "block_max_tf": [bm["block_max_tf"]],
            "block_min_norm": [bytes([src_min]) * bm["n_blocks"]],
            "block_doc_offsets": [bm["block_doc_offsets"]],
            "block_tf_offsets": [bm["block_tf_offsets"]],
            "block_last_doc": [bm["block_last_doc"]],
        },
        schema=_MERGED_SCHEMA,
    )


def apply_tombstones_to_postings(batch: pa.Table, tombs: np.ndarray) -> pa.Table:
    """Vectorized-enough tombstone application for one postings batch."""
    rows = batch.to_pylist()
    out = []
    for row in rows:
        doc_ids = codecs.decode_doc_ids_blocked(row["doc_ids"], int(row["df"]))
        tfs = codecs.varint_decode(row["tfs"])
        keep = ~np.isin(doc_ids, tombs, assume_unique=True)
        if keep.all():
            out.append(row)
            continue
        if not keep.any():
            continue
        new = dict(row)
        if row.get("positions") is not None:
            gaps = codecs.varint_decode(row["positions"])
            offs = np.zeros(tfs.size + 1, np.int64)
            np.cumsum(tfs.astype(np.int64), out=offs[1:])
            kidx = np.nonzero(keep)[0]
            from toshi_ray.search import take_ranges

            kept_gaps = take_ranges(gaps, offs[kidx], (offs[kidx + 1] - offs[kidx]))
            new["positions"] = codecs.varint_encode(kept_gaps)
        doc_ids2, tfs2 = doc_ids[keep], tfs[keep]
        bm = _block_meta(doc_ids2, tfs2)
        new["doc_ids"] = bm["doc_ids"]
        new["tfs"] = codecs.varint_encode(tfs2)
        new["df"] = int(keep.sum())
        new["first_doc"] = int(doc_ids2[0])
        new["total_tf"] = int(tfs2.sum())
        new["max_tf"] = int(tfs2.max())
        new["block_max_tf"] = bm["block_max_tf"]
        new["block_min_norm"] = bytes([min(row["block_min_norm"])]) * bm["n_blocks"]
        new["block_doc_offsets"] = bm["block_doc_offsets"]
        new["block_tf_offsets"] = bm["block_tf_offsets"]
        new["block_last_doc"] = bm["block_last_doc"]
        out.append(new)
    if not out:
        return batch.slice(0, 0)
    return pa.Table.from_pylist(out, schema=batch.schema)


def merge_segments(
    index_root: str,
    seg_names: list[str] | None = None,
    *,
    hot_df_threshold: int = 100_000,
    shard_span: int = 1_000_000,
    apply_deletes: bool = True,
) -> dict:
    """Merge the named segments (default: all) into one; publish manifest."""
    import ray.data

    manifest = load_manifest(index_root)
    assert manifest is not None, "no manifest at index root"
    segs = {s["name"]: s for s in manifest["segments"]}
    names = seg_names or list(segs)
    sources = [segs[n] for n in names]
    keep_segments = [s for s in manifest["segments"] if s["name"] not in names]

    tombs = load_tombstones(index_root) if apply_deletes else np.empty(0, np.uint64)

    seg_dir = os.path.join(index_root, SEGMENTS_DIR)
    post_paths = [_resolve(os.path.join(seg_dir, n, POSTINGS_FILE)) for n in names]
    ds = ray.data.read_parquet(post_paths)

    # ---- hot-term detection: map-side, no shuffle ----
    hot_tbl = ds.map_batches(
        lambda t: t.filter(pa.compute.greater(t["df"], hot_df_threshold)).select(
            ["field", "term"]
        ),
        batch_format="pyarrow",
    ).take_all()
    hot = {(r["field"], r["term"]) for r in hot_tbl}

    def tag(batch: pa.Table) -> pa.Table:
        if tombs.size:
            batch = apply_tombstones_to_postings(batch, tombs)
        f = batch["field"].to_pylist()
        t = batch["term"].to_pylist()
        fd = batch["first_doc"].to_numpy(zero_copy_only=False)
        shard_out = np.where(
            [(x, y) in hot for x, y in zip(f, t)],
            (fd // shard_span).astype(np.int64),
            0,
        )
        return batch.append_column("shard_out", pa.array(shard_out, type=pa.int64()))

    merged = (
        ds.map_batches(tag, batch_format="pyarrow")
        .groupby(["field", "term", "shard_out"])
        .map_groups(_merge_group, batch_format="pyarrow")
        .sort(["field", "term", "shard"])
    )

    new_name = f"seg-merged-{uuid.uuid4().hex[:12]}"
    tmp = os.path.join(seg_dir, f".tmp-{new_name}")
    os.makedirs(tmp, exist_ok=True)
    merged.write_parquet(os.path.join(tmp, "postings"))

    # ---- docvalues + store: concat of disjoint doc ranges ----
    for fname in (DOCVALUES_FILE, STORE_FILE):
        paths = [_resolve(os.path.join(seg_dir, n, fname)) for n in names]
        side = ray.data.read_parquet(paths)
        if tombs.size:
            tomb_sorted = tombs

            def drop(t: pa.Table) -> pa.Table:
                ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
                return t.filter(pa.array(~np.isin(ids, tomb_sorted)))

            side = side.map_batches(drop, batch_format="pyarrow")
        side.sort("doc_id").write_parquet(os.path.join(tmp, fname.replace(".parquet", "")))

    dv = pq.read_table(os.path.join(tmp, "docvalues"), columns=["doc_id"])
    n_docs = dv.num_rows
    ids = dv["doc_id"].to_numpy(zero_copy_only=False)
    field_stats: dict[str, dict] = {}
    for s in sources:
        for f, st in s.get("field_stats", {}).items():
            field_stats.setdefault(f, {"total_tokens": 0})
            field_stats[f]["total_tokens"] += st["total_tokens"]
    # NOTE: token totals of deleted docs stay counted until their segment
    # fully merges away — same drift tantivy accepts between merges.
    meta = {
        "name": new_name,
        "num_docs": int(n_docs),
        "min_doc_id": int(ids.min()) if n_docs else 0,
        "max_doc_id": int(ids.max()) if n_docs else 0,
        "field_stats": field_stats,
        "merged_from": names,
    }
    with open(os.path.join(tmp, META_FILE), "w") as f:
        json.dump(meta, f)
    final = os.path.join(seg_dir, new_name)
    os.rename(tmp, final)

    new_manifest = publish_manifest(
        index_root,
        keep_segments + [meta],
        extra={"garbage": manifest.get("garbage", []) + names,
               "tombstones": [] if apply_deletes else manifest.get("tombstones", [])},
    )
    return new_manifest


def maybe_merge(index_root: str, **kw) -> list[dict]:
    """Run the log policy over the manifest; merge every candidate bucket."""
    out = []
    manifest = load_manifest(index_root)
    for bucket in log_merge_candidates(manifest["segments"]):
        out.append(merge_segments(index_root, bucket, **kw))
    return out


def gc_segments(index_root: str) -> int:
    """Delete segment dirs no longer referenced by the manifest."""
    manifest = load_manifest(index_root)
    live = {s["name"] for s in manifest["segments"]}
    seg_dir = os.path.join(index_root, SEGMENTS_DIR)
    n = 0
    for name in list(os.listdir(seg_dir)):
        if name not in live and not name.startswith(".tmp"):
            shutil.rmtree(os.path.join(seg_dir, name), ignore_errors=True)
            n += 1
    manifest["garbage"] = []
    publish_manifest(index_root, manifest["segments"], extra={"garbage": []})
    return n


# ---------------------------------------------------------------------------
# Delete-by-term (reference `handle.rs:184-210`): tombstones now, physical
# removal at merge. Readers subtract tombstones at query time.
# ---------------------------------------------------------------------------

TOMBSTONES_DIR = "tombstones"


def load_tombstones(index_root: str) -> np.ndarray:
    d = os.path.join(index_root, TOMBSTONES_DIR)
    if not os.path.isdir(d) or not os.listdir(d):
        return np.empty(0, np.uint64)
    t = pq.read_table(d)
    return np.unique(t["doc_id"].to_numpy(zero_copy_only=False).astype(np.uint64))


def delete_by_term(index_root: str, field: str, term: str) -> int:
    """Tombstone every doc containing ``term``; returns docs_affected
    (counted before/after like the reference)."""
    from toshi_ray.search import Searcher

    before = load_tombstones(index_root)
    s = Searcher(index_root, distributed=False)
    s._ensure_groups()
    plan = s._plan({"query": {"term": {field: term}}}).query
    stats = s._stats_for(plan)
    matches = []
    for _, g in s._groups:
        for reader in g.readers:
            ids, _ = g._eval(plan, reader, stats)
            matches.append(ids)
    ids = np.unique(np.concatenate(matches)) if matches else np.empty(0, np.uint64)
    new = np.setdiff1d(ids, before)
    if new.size:
        os.makedirs(os.path.join(index_root, TOMBSTONES_DIR), exist_ok=True)
        pq.write_table(
            pa.table({"doc_id": pa.array(new, type=pa.uint64())}),
            os.path.join(index_root, TOMBSTONES_DIR, f"del-{uuid.uuid4().hex[:8]}.parquet"),
        )
    return int(new.size)


def _resolve(path: str) -> str:
    """A segment file may be a single parquet file (fresh build) or a
    directory of part files (merged segment)."""
    if os.path.exists(path):
        return path
    alt = path.replace(".parquet", "")
    if os.path.isdir(alt):
        return alt
    raise FileNotFoundError(path)
