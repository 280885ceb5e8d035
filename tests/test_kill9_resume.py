"""Real-process-kill resume (VERDICT r4 item 6): a subprocess running
the tier chain dies by ACTUAL SIGKILL mid-publish (between data write and
manifest commit — the widest uncommitted window, via the
GRAFT_SIGKILL_BEFORE_COMMIT hook in state/publish.py), then a fresh
process resumes: the ghost run dir is rewritten, every tier commits, and
the final tier contents equal an uninterrupted run's
(reference crash-recovery analog: tests/rubber_test.rs:239)."""

from __future__ import annotations

import glob
import hashlib
import json
import os
import shutil
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = """
import glob, json, sys
import ray

ray.init(address="local", num_cpus=4, include_dashboard=False)
from mimirsbrunn_ray.context import quiet_data_context
quiet_data_context()
from mimirsbrunn_ray.pipelines.tiering import run_tiering_job

paths = sorted(glob.glob(sys.argv[1] + "/part-*.parquet"))
summary = run_tiering_job(paths, sys.argv[2], "r1")
print("DONE " + json.dumps(list(summary["tiers"])))
ray.shutdown()
"""


def _tier_hash(root: str) -> dict:
    import pandas as pd

    out = {}
    for tier in ["raw", "1m", "1h", "1d", "compressed"]:
        files = sorted(glob.glob(f"{root}/{tier}/run=*/*.parquet"))
        frames = [pd.read_parquet(f) for f in files]
        df = pd.concat(frames, ignore_index=True)
        df = df[sorted(df.columns)]
        for c in df.columns:
            if df[c].dtype == object:
                df[c] = df[c].map(
                    lambda v: v.hex() if isinstance(v, bytes) else str(v))
        df = df.sort_values(list(df.columns), ignore_index=True)
        out[tier] = hashlib.sha256(
            df.to_csv(index=False).encode()).hexdigest()
    return out


def _run_child(corpus_dir: str, root: str, extra_env=None):
    env = dict(os.environ)
    env.pop("RAY_ADDRESS", None)
    env.update(extra_env or {})
    return subprocess.run(
        [sys.executable, "-c", CHILD, corpus_dir, root],
        capture_output=True, text=True, timeout=420, env=env, cwd=REPO,
    )


def test_sigkill_mid_publish_then_resume(corpus):
    corpus_dir = os.path.dirname(corpus["main_paths"][0])
    root = "/tmp/graft_kill9_tiers"
    shutil.rmtree(root, ignore_errors=True)

    # leg 1: the child is SIGKILLed between writing the 1h tier's data
    # files and committing its manifest — a real kill -9, no cleanup
    p1 = _run_child(corpus_dir, root,
                    {"GRAFT_SIGKILL_BEFORE_COMMIT": "1h"})
    assert p1.returncode == -9, (p1.returncode, p1.stdout[-500:])
    # raw + 1m committed; 1h dir exists but is an uncommitted ghost
    assert os.path.exists(f"{root}/raw/LATEST.json")
    assert os.path.exists(f"{root}/1m/LATEST.json")
    assert glob.glob(f"{root}/1h/run=r1")  # ghost data dir left behind
    assert not os.path.exists(f"{root}/1h/LATEST.json")

    # leg 2: fresh process resumes — committed tiers skip, the ghost is
    # rewritten, the chain completes
    p2 = _run_child(corpus_dir, root)
    assert p2.returncode == 0, p2.stdout[-1000:] + p2.stderr[-1000:]
    done = [ln for ln in p2.stdout.splitlines() if ln.startswith("DONE")]
    assert done and set(json.loads(done[0][5:])) == {
        "raw", "1m", "1h", "1d", "compressed"}
    for tier in ["raw", "1m", "1h", "1d", "compressed"]:
        assert os.path.exists(f"{root}/{tier}/LATEST.json"), tier
    resumed = _tier_hash(root)

    # control: an uninterrupted run must produce identical tier bytes
    clean_root = "/tmp/graft_kill9_tiers_clean"
    shutil.rmtree(clean_root, ignore_errors=True)
    p3 = _run_child(corpus_dir, clean_root)
    assert p3.returncode == 0
    assert resumed == _tier_hash(clean_root)
