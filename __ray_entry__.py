"""Driver contract for the graft builder (Ray Data target).

The driver's verify calls ``entry()`` as a smoke check (Ray is already
initialised, local mode), runs each ``queries()[name](sf_dir)`` at
sf=0.01 and compares it against the matching ``oracle_sql()[name]`` via
DuckDB (row-count + schema + order-insensitive value-hash →
CORRECTNESS_r{N}.json).

Ray is initialised by the driver BEFORE this module is imported: nothing
here (or in toshi_ray) calls ``ray.init()`` / ``ray.shutdown()``.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001: Ray-Data inverted-index
    build over the documents table → distributed BM25 top-k search."""
    from toshi_ray.pipelines.queries import q_term_topk

    return q_term_topk("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    """One entry per implemented operator/pipeline from SURVEY.md §2 +
    the training-data ops (dedup / ANN / text analysis)."""
    from toshi_ray.pipelines.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB twins for EVERY query — 71 of 71. ``dedup_minhash``, the
    composed ``minhash_verify``, the cluster-resolving
    ``dedup_cluster`` (recursive min-label CTE) and the full-curation
    ``curate_corpus`` (quality filter → exact dedup → LSH components →
    mixing, all in ONE statement) run the derandomized
    `perm_hash="sql"` permutation scheme so DuckDB can recompute
    signatures, band buckets and agreement counts exactly (the
    production path keeps seeded random permutations)."""
    from toshi_ray.pipelines.queries import oracle_sql_map

    return oracle_sql_map()
