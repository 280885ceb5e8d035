"""Round-4 ADVICE item 1: the empty-corpus probe must grow with the
registry. This sweep runs EVERY ``queries()`` entry against a corpus
where ALL ten tables exist but hold zero rows (schemas taken from the
driver's own testdata), enforcing the platform contract: NO crash and a
bounded (not runaway) result. The stricter typed-empty / constant-row
assertions for the curated event/document lists stay in
tests/test_empty_corpus_r4.py.

Chunked so a failure names its chunk without paying per-query pytest
overhead for ~960 entries."""

from __future__ import annotations

import pandas as pd
import pytest

_N_CHUNKS = 8


@pytest.fixture(scope="module")
def empty_all_sf(tmp_path_factory):
    import pyarrow.parquet as pq

    d = tmp_path_factory.mktemp("empty_all_sf")
    for t in ["region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "documents", "embeddings"]:
        schema = pq.read_schema(f"/root/testdata/sf0.001/{t}.parquet")
        pq.write_table(schema.empty_table(), str(d / f"{t}.parquet"))
    return str(d)


@pytest.mark.parametrize("chunk", range(_N_CHUNKS))
def test_registry_on_all_empty_tables(ray_session, empty_all_sf, chunk):
    from mimirsbrunn_ray.pipelines.queries import QUERIES

    names = sorted(QUERIES)[chunk::_N_CHUNKS]
    failures = []
    for name in names:
        try:
            res = QUERIES[name](empty_all_sf)
            df = (res if isinstance(res, pd.DataFrame)
                  else res.to_pandas() if hasattr(res, "to_pandas")
                  else pd.DataFrame(res))
            if len(df) > 1000:
                failures.append((name, f"unbounded: {len(df)} rows"))
        except Exception as ex:  # noqa: BLE001 — collected, reported below
            failures.append((name, repr(ex)[:160]))
    assert not failures, (
        f"{len(failures)} of {len(names)} queries break on an all-empty "
        f"corpus: {failures[:10]}"
    )
