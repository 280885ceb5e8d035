"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship rollup pipeline on sf0.001; ``queries()``
exposes one Ray Data pipeline per implemented operator (SURVEY.md §2);
``oracle_sql()`` gives the DuckDB-equivalent SQL per query. Ray is
initialised by the driver BEFORE this module is imported — nothing here
calls ray.init()/ray.shutdown().
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001: documents -> canonical
    sequences (with token payloads) -> 1m rollup -> LOCF gap-fill."""
    from mimirsbrunn_ray.sources.documents_adapter import sequences_from_documents
    from mimirsbrunn_ray.stages.gapfill import gapfill
    from mimirsbrunn_ray.stages.rollup import rollup

    seq = sequences_from_documents("/root/testdata/sf0.001", with_tokens=True)
    t1m = rollup(seq, "1m", from_tier="raw")
    return gapfill(t1m, "1m", policy="locf")


def queries() -> dict[str, Callable[[str], Any]]:
    from mimirsbrunn_ray.pipelines.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from mimirsbrunn_ray.pipelines.queries import ORACLES

    return dict(ORACLES)
