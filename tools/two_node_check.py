#!/usr/bin/env python
"""Two-virtual-node execution evidence (VERDICT r4 item 4).

The north rule's deployment is ``ray job submit`` on a multi-node
cluster; this sandbox is one box, so the closest honest proxy is
``ray.cluster_utils.Cluster`` with TWO virtual nodes — object transfer
crosses node boundaries through the object store, which exercises the
serialization / locality paths a single ``ray.init`` never sees
(reference lifecycle analog: documentation/architecture.md:19-55).

Runs the flagship tier chain raw -> 1m -> 1h -> 1d -> compressed plus
three shuffle-heavy registry queries on the 2-node cluster, then the
same work single-node in a fresh session, and asserts the published
tier contents and query results hash identically.

Usage: python tools/two_node_check.py  (prints one JSON line; exit 0 on
match). Owns its Ray sessions — do not run inside another Ray session.
"""

from __future__ import annotations

import glob
import hashlib
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROWS = int(os.environ.get("GRAFT_2NODE_ROWS", "120000"))
BASE = "/tmp/graft_2node"
SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.001")
SHUFFLE_QUERIES = [
    "order_priority_revenue",   # big-big orderkey exchange
    "dedup_exact_documents",    # hash-bucketed dedup shuffle
    "sessionize_events",        # per-user grouped window shuffle
]


def _tier_hash(root: str) -> dict:
    import pandas as pd

    out = {}
    for tier in ["raw", "1m", "1h", "1d", "compressed"]:
        files = sorted(glob.glob(f"{root}/{tier}/run=*/*.parquet"))
        frames = [pd.read_parquet(f) for f in files]
        df = pd.concat(frames, ignore_index=True) if frames else pd.DataFrame()
        df = df[sorted(df.columns)]
        for c in df.columns:
            if df[c].dtype == object:
                df[c] = df[c].map(
                    lambda v: v.hex() if isinstance(v, bytes) else str(v))
        df = df.sort_values(list(df.columns), ignore_index=True)
        out[tier] = hashlib.sha256(
            df.to_csv(index=False).encode()
        ).hexdigest()[:16]
    return out


def _df_hash(res) -> str:
    import pandas as pd

    df = res if isinstance(res, pd.DataFrame) else res.to_pandas()
    df = df[sorted(df.columns)]
    for c in df.columns:
        if df[c].dtype == object or str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype(str)
    df = df.sort_values(list(df.columns), ignore_index=True)
    return hashlib.sha256(df.to_csv(index=False).encode()).hexdigest()[:16]


def _run_workload(tag: str, corpus: list[str]) -> dict:
    from mimirsbrunn_ray.context import quiet_data_context
    from mimirsbrunn_ray.pipelines.tiering import run_tiering_job

    quiet_data_context()
    root = f"{BASE}/tiers_{tag}"
    shutil.rmtree(root, ignore_errors=True)
    run_tiering_job(corpus, root, "r1", resume=False)
    tiers = _tier_hash(root)

    import __ray_entry__ as entry

    qs = entry.queries()
    q_hashes = {q: _df_hash(qs[q](SF_DIR)) for q in SHUFFLE_QUERIES}
    return {"tiers": tiers, "queries": q_hashes}


def main() -> int:
    import ray
    from ray.cluster_utils import Cluster

    os.environ.pop("RAY_ADDRESS", None)  # Cluster owns its address
    corpus_dir = f"{BASE}/corpus_{ROWS}"
    if not glob.glob(f"{corpus_dir}/part-*.parquet"):
        ray.init(address="local", num_cpus=4, include_dashboard=False)
        from mimirsbrunn_ray.sources.synth import generate_sequences

        shutil.rmtree(corpus_dir, ignore_errors=True)
        generate_sequences(corpus_dir, ROWS, n_files=8)
        ray.shutdown()
    corpus = sorted(glob.glob(f"{corpus_dir}/part-*.parquet"))

    t0 = time.perf_counter()
    cluster = Cluster(
        initialize_head=True,
        head_node_args={"num_cpus": 4,
                        "object_store_memory": 1_000_000_000},
    )
    cluster.add_node(num_cpus=4, object_store_memory=1_000_000_000)
    ray.init(address=cluster.address, include_dashboard=False)
    nodes = [n for n in ray.nodes() if n["Alive"]]
    assert len(nodes) == 2, f"expected 2 alive nodes, got {len(nodes)}"
    two = _run_workload("2node", corpus)
    ray.shutdown()
    cluster.shutdown()
    t_two = time.perf_counter() - t0

    t0 = time.perf_counter()
    ray.init(address="local", num_cpus=8, include_dashboard=False)
    one = _run_workload("1node", corpus)
    ray.shutdown()
    t_one = time.perf_counter() - t0

    match = two == one
    print(json.dumps({
        "metric": "two_node_parity",
        "rows": ROWS,
        "nodes": 2,
        "match": match,
        "two_node": two,
        "single_node": one,
        "sec_two_node": round(t_two, 1),
        "sec_single_node": round(t_one, 1),
    }))
    return 0 if match else 1


if __name__ == "__main__":
    raise SystemExit(main())
