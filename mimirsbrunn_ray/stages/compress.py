"""Compressed tier: one Gorilla/DoD block per (source, day) of the 1m stream.

Partitioning assumption: a group is one source-day of 1m buckets (<= 1440
points), sorted by bucket inside the group before encoding — the in-group
sort discipline the reference uses for deterministic doc ids
(/root/reference/src/osm_reader/street.rs:137-151). The groupby shuffle key
(source, day) inherits the rollup partitioning (SURVEY.md §7.5).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from mimirsbrunn_ray.functions.codecs import (
    decode_dod,
    decode_gorilla,
    encode_dod,
    encode_gorilla,
)
from mimirsbrunn_ray.functions.timeutil import US_PER_DAY


def _compress_group(g: pd.DataFrame) -> pd.DataFrame:
    g = g.sort_values("bucket")
    ts = g["bucket"].astype("datetime64[us]").astype(np.int64).to_numpy()
    vals = g["sum_tok"].to_numpy(dtype=np.float64)
    return pd.DataFrame(
        {
            "source": [g["source"].iloc[0]],
            "bucket": [np.datetime64(int(g["_day"].iloc[0]), "us")],
            "ts_dod": [encode_dod(ts)],
            "val_gorilla": [encode_gorilla(vals)],
            "n_points": np.array([len(g)], dtype=np.int32),
        }
    )


def compress_tier(
    ds: "rd.Dataset",
    single_partition: bool | None = None,
    n_rows: int | None = None,
) -> "rd.Dataset":
    """1m rollup Dataset -> compressed blocks Dataset (COMPRESSED_BLOCK_SCHEMA).

    ``single_partition=None`` (default) auto-switches on the caller's
    ``n_rows`` hint: a small tier (at most ``SINGLE_PARTITION_ROW_BUDGET``
    rows) is built by a pandas groupby-apply inside one coalesced task —
    Ray's sort-based map_groups costs seconds of fixed overhead for the
    same result — while a large or unknown-size tier shuffles by
    (source, day), the scale-safe default. Pass an explicit bool to force
    either path.
    """
    if single_partition is None:
        from mimirsbrunn_ray.context import SINGLE_PARTITION_ROW_BUDGET

        single_partition = (
            n_rows is not None and n_rows <= SINGLE_PARTITION_ROW_BUDGET
        )

    def add_day(batch: pa.Table) -> pa.Table:
        b = batch["bucket"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        day = (b // US_PER_DAY) * US_PER_DAY
        return batch.append_column("_day", pa.array(day))

    keyed = ds.map_batches(add_day, batch_format="pyarrow", batch_size=None)
    if not single_partition:
        return keyed.groupby(["source", "_day"]).map_groups(
            _compress_group, batch_format="pandas"
        )

    def compress_all(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame(
                columns=["source", "bucket", "ts_dod", "val_gorilla", "n_points"]
            )
        parts = [
            _compress_group(g) for _, g in df.groupby(["source", "_day"], sort=True)
        ]
        return pd.concat(parts, ignore_index=True)

    return keyed.repartition(1).map_batches(
        compress_all, batch_format="pandas", batch_size=None
    )


def decompress_block(ts_dod: bytes, val_gorilla: bytes) -> tuple[np.ndarray, np.ndarray]:
    """Inverse of one block — used by tests and the query layer."""
    return decode_dod(ts_dod), decode_gorilla(val_gorilla)
