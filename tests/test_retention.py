"""Multi-run supersede + retention: LATEST always moves atomically, old runs
are garbage-collected down to keep_runs, live segments survive."""

import json
import os

import pytest


def test_three_runs_retention(tmp_path, ray_session):
    import ray.data as rd

    from mimirsbrunn_ray.state.publish import TierStore

    store = TierStore(str(tmp_path))
    for i in range(3):
        store.publish(rd.range(10 + i), "raw", f"r{i}", keep_runs=2)
    latest = store.latest("raw")
    assert latest["run_id"] == "r2"
    runs = sorted(d for d in os.listdir(store.tier_dir("raw")) if d.startswith("run="))
    assert runs == ["run=r1", "run=r2"]  # r0 retired (D5 graft)


def test_segments_survive_retention(tmp_path, ray_session):
    import ray.data as rd

    from mimirsbrunn_ray.state.publish import TierStore

    store = TierStore(str(tmp_path))
    store.publish(rd.range(10), "raw", "base")
    store.publish(rd.range(5), "raw", "late1", append_segment=True)
    store.publish(rd.range(5), "raw", "late2", append_segment=True)
    segs = store.latest_segments("raw")
    assert len(segs) == 3
    for seg in segs:
        assert os.path.isdir(seg), "live segment must never be GC'd"
    # union read sees all rows
    assert sum(1 for _ in range(1)) == 1
    paths = store.latest_data_paths("raw")
    total = rd.read_parquet(paths).count()
    assert total == 20


def test_supersede_after_segments_collapses(tmp_path, ray_session):
    """A full republish (no append) collapses the segment list back to one —
    the compaction path after many late merges."""
    import ray.data as rd

    from mimirsbrunn_ray.state.publish import TierStore

    store = TierStore(str(tmp_path))
    store.publish(rd.range(10), "raw", "base")
    store.publish(rd.range(5), "raw", "late", append_segment=True)
    store.publish(rd.range(15), "raw", "compacted")
    assert store.latest_segments("raw") == [store.run_dir("raw", "compacted")]
    assert rd.read_parquet(store.latest_data_paths("raw")).count() == 15
