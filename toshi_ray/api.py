"""Index catalog + handler surface — the reference's REST semantics as a
Python API.

Mirrors the route table at `toshi-server/src/router.rs:52-74`:

    GET  /_list            → IndexCatalog.list_indexes()
    PUT  /{idx}/_create    → create_index(name, schema_json)
    GET  /{idx}/_summary   → index_summary(name, include_sizes)
    GET  /{idx}/_flush     → flush(name)
    POST /{idx}/_bulk      → bulk_insert(name, ndjson)      (rollback on error)
    POST /{idx}            → search(name, body)
    PUT  /{idx}            → add_document(name, {options, document})
    DELETE /{idx}          → delete_term(name, {field: term})
    GET  /{idx}            → all_docs(name)

The reference's catalog is a dir-scan over a base path
(`toshi-server/src/index.rs:102-124`); ours scans for index manifests.
"Commit" everywhere is an atomic manifest swap, which also gives the
bulk path its whole-batch rollback for free (parse error ⇒ nothing
published — `handlers/bulk.rs:121-129` semantics).
"""

from __future__ import annotations

import json
import os
import threading

import numpy as np
import pyarrow as pa

from toshi_ray.pipelines.build import (
    MANIFEST_FILE,
    SCHEMA_FILE,
    SEGMENTS_DIR,
    load_manifest,
    publish_manifest,
)
from toshi_ray.query import QueryError
from toshi_ray.schema import Schema
from toshi_ray.search import Searcher
from toshi_ray.segments import build_segment_tables, write_segment


class AutoCommitWatcher:
    """Analogue of the reference's commit watcher (`commit.rs:11-28`):
    every ``every_s`` seconds, commit any index whose opstamp advanced
    since the last commit — unless the bulk-ingest lock is held
    (`bulk.rs:67` suppression). Only meaningful for a catalog in
    buffered-writes mode; with the default publish-on-write mode every
    write already IS a commit (atomic manifest swap)."""

    def __init__(self, catalog: "IndexCatalog", every_s: float = 10.0):
        self.catalog = catalog
        self.every_s = every_s
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._run, daemon=True)

    def start(self) -> "AutoCommitWatcher":
        self._thread.start()
        return self

    def _run(self) -> None:
        import logging

        while not self._stop.wait(self.every_s):
            try:
                self.tick()
            except Exception:
                # one failing commit must not kill the ticker thread
                logging.getLogger("toshi_ray.api").exception("auto-commit tick failed")

    def tick(self) -> list[str]:
        """One watcher pass; returns the indexes committed (callable
        directly for deterministic tests, mirroring commit.rs:88-109).
        One failing index must not starve the others."""
        import logging

        c = self.catalog
        if c._bulk_lock.is_set():  # suppressed during bulk ingest
            return []
        out = []
        for name, ops in list(c._opstamp.items()):
            if ops > 0:
                try:
                    c.flush(name)
                    out.append(name)
                except Exception:
                    logging.getLogger("toshi_ray.api").exception(
                        "auto-commit failed for index %r", name
                    )
        return out

    def stop(self) -> None:
        self._stop.set()
        if self._thread.is_alive():
            self._thread.join(timeout=5)


class IndexCatalog:
    def __init__(self, base_path: str, buffered_writes: bool = False,
                 auto_commit_s: float | None = None):
        """``buffered_writes=True`` mirrors the reference's writer-arena
        visibility: added docs stay PENDING (invisible) until an
        explicit flush, a per-doc ``options.commit``, or the auto-commit
        ticker fires. The default (False) publishes every write
        immediately — each append is an atomic manifest swap."""
        self.base_path = base_path
        os.makedirs(base_path, exist_ok=True)
        self._searchers: dict[str, Searcher] = {}
        self.buffered_writes = buffered_writes
        self._pending: dict[str, list[dict]] = {}
        self._opstamp: dict[str, int] = {}
        self._mutex = threading.Lock()  # guards _pending/_opstamp (ticker thread)
        self._flush_lock = threading.Lock()  # serializes WHOLE commits:
        # publish_manifest is load-then-write, so two concurrent flushes
        # (user thread + ticker) could publish a stale segment list and
        # silently drop a just-committed segment
        self._bulk_lock = threading.Event()
        self._watcher: AutoCommitWatcher | None = None
        if auto_commit_s:
            self.start_auto_commit(auto_commit_s)

    def start_auto_commit(self, every_s: float = 10.0) -> AutoCommitWatcher:
        """Spawn the commit ticker (reference default 10 s,
        `settings.rs` auto_commit_duration)."""
        if self._watcher is None:
            self._watcher = AutoCommitWatcher(self, every_s).start()
        return self._watcher

    def stop_auto_commit(self) -> None:
        if self._watcher is not None:
            self._watcher.stop()
            self._watcher = None

    # ---- GET / — service banner (reference handlers/root.rs:5-7) ----
    def root(self) -> dict:
        from toshi_ray import __version__

        return {"name": "toshi-ray", "version": __version__}

    # ---- S5: create ----
    def create_index(self, name: str, schema_json: list[dict]) -> dict:
        root = self._root(name)
        if os.path.exists(os.path.join(root, MANIFEST_FILE)):
            raise QueryError.index(f"Index {name} already exists")
        os.makedirs(os.path.join(root, SEGMENTS_DIR), exist_ok=True)
        schema = Schema.from_json(schema_json)
        with open(os.path.join(root, SCHEMA_FILE), "w") as f:
            f.write(schema.dumps())
        publish_manifest(root, [])
        return {"created": name}

    # ---- S6/S9: catalog refresh + list (sorted, deduped — index.rs:51-56) ----
    def list_indexes(self) -> list[str]:
        out = set()
        for entry in os.listdir(self.base_path):
            if os.path.exists(os.path.join(self.base_path, entry, MANIFEST_FILE)):
                out.add(entry)
        return sorted(out)

    # ---- S8: summary ----
    def index_summary(self, name: str, include_sizes: bool = False) -> dict:
        root = self._require(name)
        manifest = load_manifest(root)
        out = {
            "summaries": {
                "num_docs": sum(s["num_docs"] for s in manifest["segments"]),
                "segments": [s["name"] for s in manifest["segments"]],
                "version": manifest["version"],
            }
        }
        if include_sizes:
            sizes = {}
            for s in manifest["segments"]:
                d = os.path.join(root, SEGMENTS_DIR, s["name"])
                sizes[s["name"]] = sum(
                    os.path.getsize(os.path.join(dp, f))
                    for dp, _, fs in os.walk(d)
                    for f in fs
                )
            out["summaries"]["segment_sizes"] = sizes
        return out

    # ---- S7: flush/commit (publish pending docs + bump the version) ----
    def flush(self, name: str) -> dict:
        root = self._require(name)
        with self._flush_lock:
            with self._mutex:
                pending = self._pending.pop(name, [])
                self._opstamp[name] = 0
            if pending:
                try:
                    self._append_docs(name, pending)
                except Exception:
                    with self._mutex:  # re-stage: a failed commit loses nothing
                        self._pending[name] = pending + self._pending.get(name, [])
                        self._opstamp[name] = self._opstamp.get(name, 0) + len(pending)
                    raise
                return {"opstamp": load_manifest(root)["version"]}
            manifest = load_manifest(root)
            m = publish_manifest(root, manifest["segments"],
                                 extra={k: v for k, v in manifest.items()
                                        if k not in ("version", "segments")})
            self._invalidate(name)
            return {"opstamp": m["version"]}

    # ---- S3: single-doc add (PUT /{idx}) ----
    def add_document(self, name: str, body: dict) -> dict:
        doc = body.get("document") if "document" in body else body
        if not isinstance(doc, dict):
            # golden: handlers/index.rs:150-169
            raise QueryError.index("The provided string is not valid JSON")
        self._require(name)
        # validate NOW, in BOTH modes: a bad typed value must be a
        # QueryError here, not a raw ArrowInvalid from the segment build
        # (or a dead ticker commit with the whole batch staged)
        self._validate(self._schema(name), doc)
        if self.buffered_writes:
            with self._mutex:
                self._pending.setdefault(name, []).append(doc)
                self._opstamp[name] = self._opstamp.get(name, 0) + 1
            if body.get("options", {}).get("commit"):
                self.flush(name)
        else:
            self._append_docs(name, [doc])
            if body.get("options", {}).get("commit"):
                self.flush(name)
        return {"created": True}

    # ---- S1/S2/S4: bulk NDJSON with whole-batch rollback ----
    def bulk_insert(self, name: str, ndjson: str, max_line_length: int = 10_000) -> dict:
        root = self._require(name)
        schema = self._schema(name)
        # auto-commit suppression for the duration of the bulk
        # (bulk.rs:67 sets the watcher's AtomicBool)
        self._bulk_lock.set()
        try:
            docs = []
            for i, line in enumerate(ndjson.splitlines()):
                if not line.strip():
                    continue
                if len(line) > max_line_length:  # settings.rs:41 default
                    raise QueryError.index(f"Line {i} exceeds max_line_length")
                try:
                    doc = json.loads(line)
                except json.JSONDecodeError:
                    raise QueryError.index("The provided string is not valid JSON")
                if not isinstance(doc, dict):
                    raise QueryError.index("The provided string is not valid JSON")
                self._validate(schema, doc)
                docs.append(doc)
            # all lines parsed+validated → stage or publish once (atomic
            # commit = the rollback guarantee: a bad line above aborted
            # before any publish)
            if self.buffered_writes:
                with self._mutex:
                    self._pending.setdefault(name, []).extend(docs)
                    self._opstamp[name] = self._opstamp.get(name, 0) + len(docs)
            else:
                self._append_docs(name, docs)
            return {"docs": len(docs)}
        finally:
            self._bulk_lock.clear()

    # ---- T5: delete by term (DELETE /{idx}) ----
    def delete_term(self, name: str, terms: dict) -> dict:
        from toshi_ray.pipelines.merge import delete_by_term

        root = self._require(name)
        total = 0
        for field, term in terms.items():
            total += delete_by_term(root, field, str(term))
        self._invalidate(name)
        return {"docs_affected": total}

    # ---- search (POST /{idx}) + all_docs (GET /{idx}) ----
    def search(self, name: str, body: dict | None = None, pretty: bool = False):
        """``pretty`` mirrors the reference's ?pretty URL option
        (`toshi-types/src/query/mod.rs:28-59`): return an indented JSON
        string instead of the dict."""
        out = self._searcher(name).search(body)
        return json.dumps(out, indent=2) if pretty else out

    def all_docs(self, name: str) -> dict:
        return self.search(name, None)

    # ---- internals ----
    def _root(self, name: str) -> str:
        return os.path.join(self.base_path, name)

    def _require(self, name: str) -> str:
        root = self._root(name)
        if not os.path.exists(os.path.join(root, MANIFEST_FILE)):
            raise QueryError.index(f"Unknown Index: '{name}' does not exist")
        return root

    def _schema(self, name: str) -> Schema:
        with open(os.path.join(self._root(name), SCHEMA_FILE)) as f:
            return Schema.loads(f.read())

    def _searcher(self, name: str) -> Searcher:
        root = self._require(name)
        if name not in self._searchers:
            self._searchers[name] = Searcher(root, distributed=False)
        return self._searchers[name]

    def _invalidate(self, name: str) -> None:
        self._searchers.pop(name, None)

    def _validate(self, schema: Schema, doc: dict) -> None:
        for k, v in doc.items():
            fdef = schema.field(k)
            if fdef is None:
                raise QueryError.execution(f"Unknown field: {k}")
            if fdef.type == "u64":
                if not isinstance(v, int) or isinstance(v, bool) or v < 0:
                    # bulk.rs:174-189: bad u64 fails the whole bulk
                    raise QueryError.json(f"invalid value: integer `{v}`, expected u64")
            elif fdef.type == "i64" and (not isinstance(v, int) or isinstance(v, bool)):
                raise QueryError.json(f"invalid type: {json.dumps(v)}, expected i64")

    def _append_docs(self, name: str, docs: list[dict]) -> None:
        """Micro-segment append: docs → one new segment + manifest bump."""
        if not docs:
            return
        root = self._require(name)
        schema = self._schema(name)
        manifest = load_manifest(root)
        next_id = 1 + max((s["max_doc_id"] for s in manifest["segments"]), default=-1)
        rows = {"doc_id": pa.array(
            np.arange(next_id, next_id + len(docs), dtype=np.uint64))}
        for f in schema.fields:
            if f.name == "doc_id":
                continue
            vals = [d.get(f.name) for d in docs]
            if f.type in ("i64",):
                rows[f.name] = pa.array(vals, type=pa.int64())
            elif f.type == "u64":
                rows[f.name] = pa.array(vals, type=pa.uint64())
            else:
                rows[f.name] = pa.array(
                    [str(v) if v is not None else None for v in vals], type=pa.string()
                )
        batch = pa.table(rows)
        postings, dv, store, meta = build_segment_tables(batch, schema)
        meta = write_segment(os.path.join(root, SEGMENTS_DIR), postings, dv, store, meta)
        publish_manifest(root, manifest["segments"] + [meta],
                         extra={k: v for k, v in manifest.items()
                                if k not in ("version", "segments")})
        self._invalidate(name)
