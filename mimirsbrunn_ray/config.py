"""TOML job configuration — the reference's layered config graft.

The reference layers defaults <- config file <- CLI flags
(/root/reference/src/settings/osm2mimir.rs:68-175) and drives POI rules,
street exclusions, and query weights from pure data. Here a job TOML
configures the tier chain:

    [job]
    input = "/data/seq/part-*.parquet"
    out_root = "/data/tiers"
    run_id = "2026-01-01"
    gap_policy = "locf"          # or "linear"
    max_dropped = 1000           # error budget (absent = unlimited)
    verify_resume = false

    [classify]                   # optional rule classifier config
    fallback = "other"
    [[classify.rules]]
    category = "long_en"
    all = [{col = "lang", op = "==", value = "en"},
           {col = "n_chars", op = ">=", value = 300}]

Defaults <- file <- explicit kwargs, in that order.
"""

from __future__ import annotations

import tomllib

DEFAULTS = {
    "gap_policy": "locf",
    "max_dropped": None,
    "verify_resume": False,
    # unbounded-path knobs (VERDICT r2 item 8): single_partition=None
    # (default) auto-switches the final per-tier combines on the tier's
    # materialized row count (context.SINGLE_PARTITION_ROW_BUDGET) —
    # small tiers coalesce to one task, large ones take the per-key
    # shuffle path; true/false forces a path. dedup_scan_shards overrides
    # the byte-sized auto-sharding of the duplicate scan combine
    "single_partition": None,
    "dedup_scan_shards": None,
    # rollup_shards shards the raw->1m partial combine (None = auto by raw
    # tier row count, 1 = never)
    "rollup_shards": None,
    # quarantine_dir: also write dropped-dirty rows (+ reason) as parquet
    # under this directory (forces the standalone validation path)
    "quarantine_dir": None,
}


def load_job_config(path: str, **overrides) -> dict:
    with open(path, "rb") as f:
        raw = tomllib.load(f)
    job = dict(DEFAULTS)
    job.update(raw.get("job", {}))
    job.update({k: v for k, v in overrides.items() if v is not None})
    for required in ("input", "out_root", "run_id"):
        if not job.get(required):
            raise ValueError(f"job config missing required key: {required}")
    if job["gap_policy"] not in ("locf", "linear"):
        raise ValueError(f"unknown gap_policy {job['gap_policy']!r}")
    if job["single_partition"] is not None and not isinstance(
        job["single_partition"], bool
    ):
        raise ValueError("single_partition must be a boolean (or absent = auto)")
    if job["dedup_scan_shards"] is not None and (
        not isinstance(job["dedup_scan_shards"], int)
        or job["dedup_scan_shards"] < 1
    ):
        raise ValueError("dedup_scan_shards must be a positive integer")
    if job["rollup_shards"] is not None and (
        not isinstance(job["rollup_shards"], int) or job["rollup_shards"] < 1
    ):
        raise ValueError("rollup_shards must be a positive integer")
    if "classify" in raw:
        from mimirsbrunn_ray.stages.classify import validate_rules

        rules = raw["classify"].get("rules", [])
        fallback = raw["classify"].get("fallback", "other")
        validate_rules(rules, fallback)
        job["classify"] = {"rules": rules, "fallback": fallback}
    return job
