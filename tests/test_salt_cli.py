"""Salted two-stage aggregate equals the combiner path; CLI smoke."""

import json
import subprocess
import sys

import numpy as np
import pandas as pd
import pytest


def test_salt_plan():
    from mimirsbrunn_ray.stages.salt import salt_plan

    plan = salt_plan({"web": 800, "misc": 100, "code": 100}, hot_frac=0.2)
    assert plan["web"] > 1  # hot source fans out
    assert plan["misc"] == 1 and plan["code"] == 1


def test_salted_rollup_equals_combiner_rollup(ray_session, corpus):
    import ray.data as rd

    from mimirsbrunn_ray.sources.ingest import validated
    from mimirsbrunn_ray.stages.rollup import rollup
    from mimirsbrunn_ray.stages.salt import salt_plan, salted_rollup_1m

    ds = validated(rd.read_parquet(corpus["main_paths"][:2]))
    plan = salt_plan({"web": 40, "code": 20, "books": 12, "wiki": 8,
                      "news": 7, "forum": 5, "social": 5, "misc": 3})
    a = salted_rollup_1m(ds, plan).to_pandas()
    b = rollup(ds, "1m", from_tier="raw").to_pandas()
    # plan=None: batch-local hot-source detection — same exact result
    c_auto = salted_rollup_1m(ds, plan=None).to_pandas()
    key = ["source", "bucket"]
    a = a.sort_values(key).reset_index(drop=True)
    b = b.sort_values(key).reset_index(drop=True)
    c_auto = c_auto.sort_values(key).reset_index(drop=True)
    assert len(a) == len(b) == len(c_auto)
    for c in ("n_rows", "sum_tok", "min_tok", "max_tok"):
        assert np.array_equal(a[c].to_numpy(), b[c].to_numpy()), c
        assert np.array_equal(c_auto[c].to_numpy(), b[c].to_numpy()), c


def test_cli_end_to_end(tmp_path):
    """generate -> tier -> query in subprocesses (fresh Ray sessions)."""
    corpus = str(tmp_path / "corpus")
    root = str(tmp_path / "tiers")

    def run(*args):
        out = subprocess.run(
            [sys.executable, "-m", "mimirsbrunn_ray.cli", "--num-cpus", "4", *args],
            capture_output=True, text=True, cwd="/root/repo",
        )
        assert out.returncode == 0, out.stderr[-2000:]
        return out.stdout.strip().splitlines()[-1]

    meta = json.loads(run("generate", "--out", corpus, "--rows", "3000",
                          "--files", "2"))
    assert meta["n_rows_written"] > 0
    summary = json.loads(run("tier", "--input", f"{corpus}/part-*.parquet",
                             "--out", root, "--run-id", "cli-run"))
    assert "compressed" in summary["tiers"]
    st = json.loads(run("query", "--root", root, "status"))
    assert st["1d"]["committed"]
    # debug explain is driver-facing via the CLI (each query subprocess is
    # a fresh session, so latency counters are per-invocation)
    rows = json.loads(run("query", "--root", root, "top-k", "--k", "2",
                          "--debug"))
    assert len(rows) == 2 and all("explain" in r for r in rows)
    assert rows[0]["explain"]["metric"] == "sum_tok"


def test_job_config_layering(tmp_path):
    import pytest as _pytest

    from mimirsbrunn_ray.config import load_job_config

    cfg = tmp_path / "job.toml"
    cfg.write_text(
        """
[job]
input = "/data/part-*.parquet"
out_root = "/data/tiers"
run_id = "r1"
gap_policy = "linear"

[classify]
fallback = "other"
[[classify.rules]]
category = "big"
all = [{col = "n_chars", op = ">=", value = 300}]
"""
    )
    job = load_job_config(str(cfg))
    assert job["gap_policy"] == "linear" and job["max_dropped"] is None
    assert job["classify"]["rules"][0]["category"] == "big"
    # explicit overrides win over the file
    job2 = load_job_config(str(cfg), gap_policy="locf", run_id="r2")
    assert job2["gap_policy"] == "locf" and job2["run_id"] == "r2"
    # validation failures are loud
    bad = tmp_path / "bad.toml"
    bad.write_text("[job]\ninput='x'\n")
    with _pytest.raises(ValueError, match="missing required"):
        load_job_config(str(bad))


def test_cli_merge_late(tmp_path):
    corpus = str(tmp_path / "corpus")
    root = str(tmp_path / "tiers")

    def run(*args):
        out = subprocess.run(
            [sys.executable, "-m", "mimirsbrunn_ray.cli", "--num-cpus", "4", *args],
            capture_output=True, text=True, cwd="/root/repo",
        )
        assert out.returncode == 0, out.stderr[-2000:]
        return out.stdout.strip().splitlines()[-1]

    run("generate", "--out", corpus, "--rows", "3000", "--files", "2")
    run("tier", "--input", f"{corpus}/part-*.parquet", "--out", root,
        "--run-id", "base")
    summary = json.loads(run("merge-late", "--input", f"{corpus}/late/*.parquet",
                             "--out", root, "--run-id", "late1"))
    assert summary["late_rows_merged"] > 0
    st = json.loads(run("query", "--root", root, "status"))
    assert st["1m"]["run_id"] == "late1"


def test_source_counts_distributed(ray_session):
    """The distributed per-source count matches exact counts (driver holds
    only the (source, n) rows)."""
    import pyarrow as pa
    import ray.data as rd

    from mimirsbrunn_ray.stages.salt import source_counts

    srcs = ["web"] * 500 + ["code"] * 120 + ["wiki"] * 7
    ds = rd.from_arrow(pa.table({"source": srcs})).repartition(8)
    assert source_counts(ds) == {"web": 500, "code": 120, "wiki": 7}


def test_config_unbounded_path_knobs(tmp_path):
    """single_partition / dedup_scan_shards layer defaults <- TOML <- CLI
    flags like every other job key, with validation."""
    from mimirsbrunn_ray.config import load_job_config

    cfg = tmp_path / "job.toml"
    cfg.write_text(
        '[job]\ninput = "/x/*.parquet"\nout_root = "/y"\nrun_id = "r"\n'
        "single_partition = false\ndedup_scan_shards = 4\n"
    )
    job = load_job_config(str(cfg))
    assert job["single_partition"] is False
    assert job["dedup_scan_shards"] == 4
    # explicit kwargs (CLI flags) override the file
    job2 = load_job_config(str(cfg), dedup_scan_shards=9)
    assert job2["dedup_scan_shards"] == 9
    # defaults when the file is silent
    cfg2 = tmp_path / "job2.toml"
    cfg2.write_text('[job]\ninput = "/x"\nout_root = "/y"\nrun_id = "r"\n')
    job3 = load_job_config(str(cfg2))
    assert job3["single_partition"] is None  # auto-switch by tier size
    assert job3["dedup_scan_shards"] is None
    # validation
    cfg3 = tmp_path / "job3.toml"
    cfg3.write_text(
        '[job]\ninput = "/x"\nout_root = "/y"\nrun_id = "r"\n'
        "dedup_scan_shards = 0\n"
    )
    with pytest.raises(ValueError, match="dedup_scan_shards"):
        load_job_config(str(cfg3))


def test_cli_multi_partition_flag(tmp_path):
    """`tier --multi-partition --dedup-scan-shards` runs the sharded
    unbounded path end-to-end in a subprocess and commits every tier."""
    corpus = str(tmp_path / "corpus")
    root = str(tmp_path / "tiers")

    def run(*args):
        out = subprocess.run(
            [sys.executable, "-m", "mimirsbrunn_ray.cli", "--num-cpus", "4", *args],
            capture_output=True, text=True, cwd="/root/repo",
        )
        assert out.returncode == 0, out.stderr[-2000:]
        return out.stdout.strip().splitlines()[-1]

    json.loads(run("generate", "--out", corpus, "--rows", "2000", "--files", "2"))
    summary = json.loads(
        run("tier", "--input", f"{corpus}/part-*.parquet", "--out", root,
            "--run-id", "cli-mp", "--multi-partition", "--dedup-scan-shards", "2")
    )
    assert "compressed" in summary["tiers"]
    st = json.loads(run("query", "--root", root, "status"))
    assert st["1d"]["committed"]
