"""Publish atomicity, ghost cleanup, kill-and-resume (FIXTURES §4 assertions
5-6; grafting /root/reference/tests/rubber_test.rs:62,239 and the alias
topology check tests/bano2mimir_test.rs:70-76)."""

import glob
import hashlib
import json
import os
import shutil

import pytest

from mimirsbrunn_ray.state.publish import TierStore


def _sha_tree(run_dir):
    out = {}
    for f in sorted(glob.glob(os.path.join(run_dir, "**", "*.parquet"), recursive=True)):
        out[os.path.relpath(f, run_dir)] = hashlib.sha256(open(f, "rb").read()).hexdigest()
    return out


def test_latest_points_at_exactly_one_complete_run(tier_root):
    for tier in ["raw", "1m", "1h", "1d", "compressed"]:
        latest = json.load(open(os.path.join(tier_root, tier, "LATEST.json")))
        assert latest["run_id"] == "test-run"
        man = json.load(open(os.path.join(latest["run_dir"], "_manifest.json")))
        assert man["committed"] is True
        assert man["rows_out"] == sum(p["rows_out"] for p in man["partitions"])


def test_ghost_cleanup(tmp_path, ray_session):
    import ray.data as rd

    store = TierStore(str(tmp_path))
    ds = rd.range(10)
    store.publish(ds, "raw", "good")
    # simulate a killed run: data written, manifest never committed
    ghost = store.run_dir("raw", "ghost")
    os.makedirs(ghost)
    open(os.path.join(ghost, "orphan.parquet"), "wb").close()
    removed = store.cleanup_ghosts("raw")
    assert ghost in removed
    assert not os.path.exists(ghost)
    assert store.latest("raw")["run_id"] == "good"


def test_error_budget_aborts_and_leaves_no_run(tmp_path, ray_session):
    import ray.data as rd

    from mimirsbrunn_ray.state.metrics import ErrorBudgetExceeded

    store = TierStore(str(tmp_path))
    with pytest.raises(ErrorBudgetExceeded):
        store.publish(
            rd.range(5), "raw", "bad",
            counters={"rows_dropped_dirty": 3}, max_dropped=0,
        )
    assert store.latest("raw") is None
    assert not os.path.exists(store.run_dir("raw", "bad"))


def test_kill_and_resume_reproduces_committed_tiers(ray_session, corpus, dim_table, tmp_path):
    """Run raw+1m, snapshot; 'kill'; resume -> raw/1m untouched byte-identical,
    remaining tiers completed."""
    from mimirsbrunn_ray.pipelines.tiering import run_tiering_job

    root = str(tmp_path / "tiers")
    run_tiering_job(corpus["main_paths"], root, "rA", dim_table=dim_table,
                    stop_after="1m")
    raw_before = _sha_tree(os.path.join(root, "raw", "run=rA"))
    t1m_before = _sha_tree(os.path.join(root, "1m", "run=rA"))
    assert not os.path.exists(os.path.join(root, "1h"))

    summary = run_tiering_job(corpus["main_paths"], root, "rA", dim_table=dim_table)
    assert summary["tiers"]["raw"] == {"skipped": "already committed"}
    assert summary["tiers"]["1m"] == {"skipped": "already committed"}
    assert "run_dir" in summary["tiers"]["1d"]
    assert _sha_tree(os.path.join(root, "raw", "run=rA")) == raw_before
    assert _sha_tree(os.path.join(root, "1m", "run=rA")) == t1m_before
    for tier in ["1h", "1d", "compressed"]:
        man = json.load(open(os.path.join(root, tier, "run=rA", "_manifest.json")))
        assert man["committed"]


def test_manifest_checksums_detect_corruption(tmp_path, ray_session):
    import ray.data as rd

    from mimirsbrunn_ray.state.manifest import verify_partitions

    store = TierStore(str(tmp_path))
    run_dir = store.publish(rd.range(100), "raw", "r1")
    assert verify_partitions(run_dir) == []
    # corrupt one partition
    part = glob.glob(os.path.join(run_dir, "*.parquet"))[0]
    with open(part, "r+b") as f:
        f.seek(10)
        f.write(b"\xde\xad")
    bad = verify_partitions(run_dir)
    assert bad == [os.path.basename(part)]


def test_boundaries_recorded_in_rollup_manifests(tier_root):
    for tier in ["1m", "1h", "1d"]:
        man = json.load(
            open(os.path.join(tier_root, tier, "run=test-run", "_manifest.json"))
        )
        assert "boundaries" in man and "web" in man["boundaries"]
        b = man["boundaries"]["web"]
        assert b["bucket_us"] > 0 and b["boundary_last_value"] >= 0
