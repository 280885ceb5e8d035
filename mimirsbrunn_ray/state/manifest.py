"""Per-tier run manifests: lineage, counters, commit flag.

Schema follows FIXTURES.md §5. The manifest is the durable record the
reference keeps implicitly in Elasticsearch index metadata + aliases
(/root/reference/libs/mimir/src/rubber.rs:553-602); making it an explicit
JSON file per run directory is what enables resume-at-tier-boundary.
"""

from __future__ import annotations

import glob
import json
import os

import pyarrow.parquet as pq

MANIFEST_NAME = "_manifest.json"


def _crc32_file(path: str) -> str:
    import zlib

    crc = 0
    with open(path, "rb") as f:
        while chunk := f.read(1 << 20):
            crc = zlib.crc32(chunk, crc)
    return f"{crc:08x}"


def partition_stats(run_dir: str, checksums: bool = True) -> tuple[int, int, list[dict]]:
    """rows/bytes per parquet file from footers + a crc32 content checksum
    (FIXTURES.md §5 lineage fields; the checksum lets resume verify that a
    committed partition wasn't truncated or tampered with)."""
    parts = []
    rows = 0
    size = 0
    for f in sorted(glob.glob(os.path.join(run_dir, "**", "*.parquet"), recursive=True)):
        md = pq.read_metadata(f)
        st = os.stat(f)
        parts.append(
            {
                "key": os.path.relpath(f, run_dir),
                "rows_out": md.num_rows,
                "bytes_out": st.st_size,
                "checksum": _crc32_file(f) if checksums else None,
            }
        )
        rows += md.num_rows
        size += st.st_size
    return rows, size, parts


def verify_partitions(run_dir: str) -> list[str]:
    """Return relative paths whose current checksum mismatches the manifest
    (empty list = intact). Used before trusting a resumed tier."""
    m = read_manifest(run_dir)
    bad = []
    for p in m.get("partitions", []):
        if not p.get("checksum"):
            continue
        f = os.path.join(run_dir, p["key"])
        if not os.path.exists(f) or _crc32_file(f) != p["checksum"]:
            bad.append(p["key"])
    return bad


def write_manifest(
    run_dir: str,
    run_id: str,
    tier: str,
    input_paths: list[str],
    counters: dict,
    previous_run: str | None,
    committed: bool,
) -> dict:
    rows, size, parts = partition_stats(run_dir)
    manifest = {
        "run_id": run_id,
        "tier": tier,
        "input_paths": list(input_paths),
        "rows_out": rows,
        "bytes_out": size,
        "partitions": parts,
        "counters": dict(counters or {}),
        "committed": committed,
        "previous_run": previous_run,
    }
    tmp = os.path.join(run_dir, MANIFEST_NAME + ".tmp")
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=1)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, os.path.join(run_dir, MANIFEST_NAME))
    return manifest


def read_manifest(run_dir: str) -> dict | None:
    p = os.path.join(run_dir, MANIFEST_NAME)
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return json.load(f)


def is_committed(run_dir: str) -> bool:
    m = read_manifest(run_dir)
    return bool(m and m.get("committed"))
