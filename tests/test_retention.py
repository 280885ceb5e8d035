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


def test_compact_merges_segments_and_counters(tmp_path, ray_session):
    """TierStore.compact: three live segments -> one fresh run holding the
    identical row multiset, counters summed across segment manifests,
    lineage = the source segments, old segments retained per keep_runs."""
    import ray.data as rd

    from mimirsbrunn_ray.state.manifest import read_manifest
    from mimirsbrunn_ray.state.publish import TierStore

    store = TierStore(str(tmp_path))
    store.publish(rd.range(10), "raw", "base", counters={"rows_ok": 10})
    store.publish(
        rd.range(5), "raw", "late1", append_segment=True,
        counters={"rows_ok": 5},
    )
    store.publish(
        rd.range(3), "raw", "late2", append_segment=True,
        counters={"rows_ok": 3, "rows_dropped_dirty": 1},
    )
    old_segments = store.latest_segments("raw")
    assert len(old_segments) == 3
    before = sorted(
        rd.read_parquet(store.latest_data_paths("raw")).to_pandas()["id"]
    )

    run_dir = store.compact("raw", "compacted", keep_runs=3)

    assert store.latest_segments("raw") == [run_dir]
    after = sorted(
        rd.read_parquet(store.latest_data_paths("raw")).to_pandas()["id"]
    )
    assert after == before
    m = read_manifest(run_dir)
    assert m["counters"]["rows_ok"] == 18
    assert m["counters"]["rows_dropped_dirty"] == 1
    assert sorted(m["input_paths"]) == sorted(old_segments)
    # keep_runs=3 retention: superseded segments still on disk for
    # in-flight readers of the old LATEST
    surviving = [d for d in old_segments if os.path.isdir(d)]
    assert len(surviving) >= 2


def test_compact_via_cli(tmp_path, ray_session):
    """The compact subcommand drives TierStore.compact end-to-end."""
    import ray.data as rd

    from mimirsbrunn_ray.cli import main
    from mimirsbrunn_ray.state.publish import TierStore

    store = TierStore(str(tmp_path))
    store.publish(rd.range(4), "raw", "base")
    store.publish(rd.range(2), "raw", "late", append_segment=True)
    rc = main(
        ["compact", "--root", str(tmp_path), "--tier", "raw",
         "--run-id", "c1"]
    )
    assert rc == 0
    assert store.latest_segments("raw") == [store.run_dir("raw", "c1")]
    assert rd.read_parquet(store.latest_data_paths("raw")).count() == 6


def test_time_travel_read_of_superseded_run(tmp_path, ray_session):
    """A superseded-but-retained run stays readable by run_id (time
    travel inside the retention window); evicted runs raise."""
    import pytest
    import ray.data as rd

    from mimirsbrunn_ray.state.publish import TierStore

    store = TierStore(str(tmp_path))
    store.publish(rd.range(10), "raw", "v1")
    store.publish(rd.range(20), "raw", "v2")  # supersedes v1, keep_runs=2
    assert rd.read_parquet(store.run_data_paths("raw", "v1")).count() == 10
    assert rd.read_parquet(store.run_data_paths("raw", "v2")).count() == 20
    store.publish(rd.range(5), "raw", "v3")  # v1 falls out of retention
    with pytest.raises(FileNotFoundError):
        store.run_data_paths("raw", "v1")
    assert rd.read_parquet(store.run_data_paths("raw", "v2")).count() == 20
