"""Canonical Arrow schemas for every table the engine produces or consumes.

The reference declares one fixed serde schema per document type plus an
Elasticsearch mapping template with dynamic mapping disabled
(/root/reference/libs/mimir/src/objects.rs:54-60, config/addr_settings.json);
the analog here is one explicit ``pyarrow.Schema`` constant per tier, checked
at ingest so schema drift fails fast instead of silently widening columns.
"""

from __future__ import annotations

import pyarrow as pa

# ---------------------------------------------------------------------------
# Input: pre-tokenized training sequences (BASELINE.json input_hint).
# The reference analog is the Place/Addr document universe
# (/root/reference/libs/mimir/src/objects.rs:538-785): doc_id <-> es_id,
# source <-> the import "dataset" dimension (src/bin/bano2mimir.rs:197-198).
# ---------------------------------------------------------------------------
SEQUENCES_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("tokens", pa.list_(pa.int32())),
        ("n_tok", pa.int32()),
        ("source", pa.string()),
    ]
)

# Raw tier = validated pass-through rows + derived event time and 1m bucket.
# Per-row invariant: `tokens` byte-equal to the input (BASELINE.json).
RAW_TIER_SCHEMA = pa.schema(
    list(SEQUENCES_SCHEMA)
    + [
        ("ts", pa.timestamp("us")),
        ("bucket_1m", pa.timestamp("us")),
    ]
)

# ---------------------------------------------------------------------------
# Rollup tiers (1m / 1h / 1d): hierarchical continuous aggregates keyed on
# (source, bucket). Integer sums keep aggregation order-insensitive
# (SURVEY.md §7.6); mean is derived as sum/count at the end.
# ---------------------------------------------------------------------------
ROLLUP_SCHEMA = pa.schema(
    [
        ("source", pa.string()),
        ("bucket", pa.timestamp("us")),
        ("n_rows", pa.int64()),
        ("sum_tok", pa.int64()),
        ("min_tok", pa.int32()),
        ("max_tok", pa.int32()),
        ("mean_tok", pa.float64()),
        ("filled", pa.bool_()),
        ("fill_kind", pa.string()),  # "none" | "locf" | "linear"
    ]
)

# ---------------------------------------------------------------------------
# Compressed blocks: one row per (source, day) holding delta-of-delta encoded
# bucket timestamps and Gorilla XOR encoded values for that day's 1m stream.
# ---------------------------------------------------------------------------
COMPRESSED_BLOCK_SCHEMA = pa.schema(
    [
        ("source", pa.string()),
        ("bucket", pa.timestamp("us")),  # day the block covers
        ("ts_dod", pa.binary()),
        ("val_gorilla", pa.binary()),
        ("n_points", pa.int32()),
    ]
)

# ---------------------------------------------------------------------------
# Dimension table broadcast into the enrichment actor pool — the graft of the
# AdminGeoFinder + INSEE map side inputs
# (/root/reference/src/admin_geofinder.rs:105-286, src/bin/bano2mimir.rs:243-252).
# ---------------------------------------------------------------------------
SOURCES_DIM_SCHEMA = pa.schema(
    [
        ("source", pa.string()),
        ("family", pa.string()),
        ("priority", pa.int32()),
        ("weight", pa.float64()),
    ]
)

ENRICHED_SCHEMA = pa.schema(
    list(RAW_TIER_SCHEMA)
    + [
        ("family", pa.string()),
        ("priority", pa.int32()),
        ("weight", pa.float64()),  # normalized to [0,1] by global max (A2 graft)
    ]
)

TIER_SCHEMAS = {
    "raw": RAW_TIER_SCHEMA,
    "1m": ROLLUP_SCHEMA,
    "1h": ROLLUP_SCHEMA,
    "1d": ROLLUP_SCHEMA,
    "compressed": COMPRESSED_BLOCK_SCHEMA,
}


def validate_schema(actual: pa.Schema, expected: pa.Schema, where: str) -> None:
    """Fail fast on drift — the analog of ES ``"dynamic": "false"`` mappings."""
    exp = {f.name: f.type for f in expected}
    act = {f.name: f.type for f in actual}
    missing = [n for n in exp if n not in act]
    mistyped = [
        (n, str(act[n]), str(exp[n])) for n in exp if n in act and act[n] != exp[n]
    ]
    if missing or mistyped:
        raise ValueError(
            f"schema drift at {where}: missing={missing} mistyped={mistyped}"
        )
