"""Two-virtual-node execution parity (VERDICT r4 item 4): the flagship
tier chain and three shuffle-heavy queries must hash identically on a
``ray.cluster_utils.Cluster`` with 2 nodes (cross-node object transfer)
and on a plain single-node session. Runs in a SUBPROCESS because the
checker owns its Ray sessions (the suite's session fixture must not be
connected to the virtual cluster)."""

from __future__ import annotations

import json
import os
import subprocess
import sys


def test_two_node_tier_parity():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env.pop("RAY_ADDRESS", None)
    env["GRAFT_2NODE_ROWS"] = "60000"  # CI-sized; the tool default is 120k
    proc = subprocess.run(
        [sys.executable, os.path.join(repo, "tools", "two_node_check.py")],
        capture_output=True, text=True, timeout=540, env=env, cwd=repo,
    )
    lines = [ln for ln in proc.stdout.splitlines()
             if ln.startswith("{")]
    assert proc.returncode == 0, proc.stdout[-2000:] + proc.stderr[-2000:]
    out = json.loads(lines[-1])
    assert out["match"] is True
    assert out["nodes"] == 2
    assert set(out["two_node"]["tiers"]) == {
        "raw", "1m", "1h", "1d", "compressed"}
