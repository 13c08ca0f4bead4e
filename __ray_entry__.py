"""Driver contract for the graft builder (Ray Data target).

The driver's verify calls ``entry()`` as a smoke check (Ray is already
initialised, local mode), runs each ``queries()[name](sf_dir)`` at
sf=0.01 and compares it against the matching ``oracle_sql()[name]`` via
DuckDB (row-count + schema + order-insensitive value-hash).

Nothing here (or in the ``dedup`` package) calls ``ray.init()`` /
``ray.shutdown()`` — only bench.py and the test fixture own a session.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship near-dup pipeline (MinHash → LSH → union-find clusters)
    on /root/testdata/sf0.001 pages; returns the clusters Dataset."""
    from dedup.adapters import pages_from_documents
    from dedup.pipeline import near_dup_pipeline

    pages = pages_from_documents("/root/testdata/sf0.001")
    return near_dup_pipeline(pages).clusters


def queries() -> dict[str, Callable[[str], Any]]:
    """One entry per implemented operator/pipeline (see dedup/queries.py
    for the SURVEY.md §2 coverage map)."""
    from dedup.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every SQL-expressible query (generated
    from the same constants as the Ray operators — see dedup/queries.py)."""
    from dedup.queries import ORACLES

    return dict(ORACLES)
