"""Driver contract for the graft builder (Ray Data target).

The driver's verify calls ``entry()`` as a smoke check (Ray is already
initialised, local mode), runs each ``queries()[name](sf_dir)`` at
sf=0.01 and compares it against the matching ``oracle_sql()[name]`` via
DuckDB (row-count + schema + order-insensitive value-hash).

Ray is initialised by the driver BEFORE this module is imported: nothing
here (nor in the library) calls ``ray.init()`` / ``ray.shutdown()``.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001: build the inverted
    index over `documents`, serve the pinned BM25 query set via
    block-max WAND."""
    from web_search_engine_ray.pipelines.reference_queries import bm25_topk
    return bm25_topk("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    from web_search_engine_ray.pipelines.reference_queries import QUERIES
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from web_search_engine_ray.pipelines.reference_queries import ORACLE_SQL
    return dict(ORACLE_SQL)
