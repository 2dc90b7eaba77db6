"""toshi_ray — a Ray-Data-native full-text index + BM25 search engine.

A from-scratch rebuild of the capabilities of toshi-search/Toshi
(reference surveyed in SURVEY.md): an inverted-index build over
Common-Crawl-style Parquet web pages expressed as Ray Data pipelines
(``read_parquet → map_batches(analyze) → per-partition posting build →
groupby(term) merge → write_parquet`` segments), plus BM25 top-k search
with Toshi's JSON query DSL (term / phrase / fuzzy / regex / range /
bool / raw / all / facets / sort_by), and the training-data operators a
100 TB pipeline needs (dedup, ANN, text analysis).

Nothing here calls ``ray.init()`` — the caller owns the Ray session.
"""

_LAZY = {
    "Schema": ("toshi_ray.schema", "Schema"),
    "FieldDef": ("toshi_ray.schema", "FieldDef"),
    "DefaultAnalyzer": ("toshi_ray.analyzer", "DefaultAnalyzer"),
    "get_analyzer": ("toshi_ray.analyzer", "get_analyzer"),
    "build_index": ("toshi_ray.pipelines.build", "build_index"),
    "Searcher": ("toshi_ray.search", "Searcher"),
    "parse_query": ("toshi_ray.query", "parse_query"),
    "QueryError": ("toshi_ray.query", "QueryError"),
    "IndexCatalog": ("toshi_ray.api", "IndexCatalog"),
    "merge_segments": ("toshi_ray.pipelines.merge", "merge_segments"),
    "maybe_merge": ("toshi_ray.pipelines.merge", "maybe_merge"),
    "delete_by_term": ("toshi_ray.pipelines.merge", "delete_by_term"),
    "bulk_index_ndjson": ("toshi_ray.sources.ndjson", "bulk_index_ndjson"),
    "AutoCommitWatcher": ("toshi_ray.api", "AutoCommitWatcher"),
}


def __getattr__(name):
    if name in _LAZY:
        import importlib

        mod, attr = _LAZY[name]
        return getattr(importlib.import_module(mod), attr)
    raise AttributeError(name)


__all__ = [
    "Schema",
    "FieldDef",
    "DefaultAnalyzer",
    "get_analyzer",
    "build_index",
    "Searcher",
    "parse_query",
    "QueryError",
    "IndexCatalog",
    "merge_segments",
    "maybe_merge",
    "delete_by_term",
    "bulk_index_ndjson",
    "AutoCommitWatcher",
]

__version__ = "0.1.0"
