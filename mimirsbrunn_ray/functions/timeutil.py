"""Event-time derivation and bucket truncation (pure, vectorized).

The reference derives document identity deterministically from content —
ids built from rounded coordinates + sanitized house numbers
(/root/reference/src/bin/bano2mimir.rs:139-159) — and puts timestamps only
in index names (libs/mimir/src/rubber.rs:144-150). The target makes time a
first-class column: each sequence's event time is a deterministic function
of its doc index, ``ts = EPOCH0 + index * TS_STEP``, so golden bucket
counts are computable by hand (FIXTURES.md §2).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# 2026-01-01T00:00:00Z in microseconds since the Unix epoch.
EPOCH0_US = 1_767_225_600_000_000
TS_STEP_US = 7_000_000  # 7 s between consecutive arrival ticks
DOCS_PER_TICK = 64  # docs sharing one arrival tick (realistic bucket density)

US_PER_MINUTE = 60_000_000
US_PER_HOUR = 3_600_000_000
US_PER_DAY = 86_400_000_000

BUCKET_US = {"1m": US_PER_MINUTE, "1h": US_PER_HOUR, "1d": US_PER_DAY}


def ts_from_index(index: np.ndarray) -> np.ndarray:
    """int64 doc index -> int64 event-time microseconds.

    ``ts = EPOCH0 + (index // DOCS_PER_TICK) * 7s`` — DOCS_PER_TICK docs
    arrive per tick, so a 1m bucket holds ~548 docs across sources instead
    of ~8.6 (with one doc per tick the number of (source, bucket) groups
    approaches the row count and partial aggregation collapses nothing).
    SQL equivalent: EPOCH0 + INTERVAL ((doc_id // 64) * 7) SECOND.
    """
    return EPOCH0_US + (index.astype(np.int64) // DOCS_PER_TICK) * TS_STEP_US


def trunc_us(ts_us: np.ndarray, granularity: str) -> np.ndarray:
    """Truncate int64 microsecond timestamps down to a bucket boundary.

    Equivalent to SQL date_trunc for epochs >= 0 (all engine timestamps are).
    """
    width = BUCKET_US[granularity]
    return (ts_us // width) * width


def ts_array(ts_us: np.ndarray) -> pa.Array:
    return pa.array(ts_us, type=pa.timestamp("us"))


def append_time_columns(batch: pa.Table, index_col: str = "doc_index") -> pa.Table:
    """Append ts + bucket_1m derived from an int64 index column (vectorized)."""
    idx = batch[index_col].to_numpy(zero_copy_only=False)
    ts_us = ts_from_index(idx)
    batch = batch.append_column("ts", ts_array(ts_us))
    batch = batch.append_column("bucket_1m", ts_array(trunc_us(ts_us, "1m")))
    return batch


def retruncate(batch: pa.Table, src_col: str, granularity: str, out_col: str) -> pa.Table:
    """Truncate a timestamp[us] column to a coarser bucket (for tier chaining)."""
    ts_us = batch[src_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
    out = ts_array(trunc_us(ts_us, granularity))
    if out_col in batch.column_names:
        batch = batch.set_column(batch.column_names.index(out_col), out_col, out)
    else:
        batch = batch.append_column(out_col, out)
    return batch


def floor_timestamp(col: pa.ChunkedArray, granularity: str) -> pa.Array:
    """pyarrow path: floor a timestamp[us] column to the bucket boundary."""
    unit = {"1m": "minute", "1h": "hour", "1d": "day"}[granularity]
    return pc.floor_temporal(col, unit=unit)
