"""Session-scoped Ray + deterministic corpus fixtures.

Ray is initialised ONCE per pytest session (the driver contract and the
reference's one-docker-for-all-tests strategy,
/root/reference/tests/tests.rs:132-172).
"""

from __future__ import annotations

import glob
import os
import shutil

import pyarrow as pa
import pytest


@pytest.fixture(scope="session")
def ray_session():
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=4,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    from mimirsbrunn_ray.context import quiet_data_context

    quiet_data_context()
    yield ray
    ray.shutdown()


CORPUS_DIR = "/tmp/mimirsbrunn_ray_test_corpus"
CORPUS_ROWS = 12_000


@pytest.fixture(scope="session")
def corpus():
    """Deterministic synthetic sequences corpus + its generator metadata."""
    from mimirsbrunn_ray.sources.synth import generate_sequences

    shutil.rmtree(CORPUS_DIR, ignore_errors=True)
    meta = generate_sequences(CORPUS_DIR, CORPUS_ROWS, n_files=6)
    meta["main_paths"] = sorted(glob.glob(os.path.join(CORPUS_DIR, "part-*.parquet")))
    return meta


@pytest.fixture(scope="session")
def dim_table():
    return pa.table(
        {
            "source": ["web", "code", "books", "wiki", "news", "forum", "social", "misc"],
            "family": ["crawl", "crawl", "curated", "curated", "curated", "social", "social", "misc"],
            "priority": pa.array([1, 2, 3, 3, 4, 5, 5, 6], pa.int32()),
            "weight": [8.0, 4.0, 2.0, 2.0, 1.0, 0.5, 0.5, 0.2],
        }
    )


@pytest.fixture(scope="session")
def tier_root(ray_session, corpus, dim_table):
    """Full tier chain run once per session; tests assert against it."""
    from mimirsbrunn_ray.pipelines.tiering import run_tiering_job

    root = "/tmp/mimirsbrunn_ray_test_tiers"
    shutil.rmtree(root, ignore_errors=True)
    run_tiering_job(
        corpus["main_paths"], root, "test-run", dim_table=dim_table, gap_policy="locf"
    )
    return root
