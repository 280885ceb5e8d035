"""Exact deduplication with a deterministic winner.

Grafts the reference's street dedup — ways with the same (name, city) key
collapse to the smallest OSM id, a deterministic keep-min winner
(/root/reference/src/osm_reader/street.rs:202-234) — and its cross-dataset
stop merge by id (/root/reference/src/stops.rs:151-187).

Scale design: a ``groupby(doc_id).map_groups`` would create one group per
key (millions of tiny pandas groups). Instead rows are bucketed by a
deterministic 64-bit hash of the key into ``num_buckets`` coarse partitions,
shuffled once on the small int bucket column, and deduped VECTORIZED inside
each bucket (np.unique keep-first over key-sorted rows). Duplicate keys are
uniform under the hash, so the hot-source skew never concentrates in one
bucket — this is the explicit salted-partitioning path of SURVEY.md §4.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

_BUCKET = "_dedup_bucket"


def _hash64(values: pa.ChunkedArray) -> np.ndarray:
    """Deterministic (process-independent) 64-bit hash of a string column."""
    s = pd.Series(values.to_pandas())
    return pd.util.hash_pandas_object(s, index=False).to_numpy()


def add_bucket(batch: pa.Table, key: str, num_buckets: int) -> pa.Table:
    h = _hash64(batch[key])
    return batch.append_column(
        _BUCKET, pa.array((h % np.uint64(num_buckets)).astype(np.int32))
    )


def _dedup_bucket(group: pa.Table, key: str, tiebreak: list[str]) -> pa.Table:
    """Vectorized keep-first within one hash bucket.

    Rows are sorted by (key, *tiebreak) so the winner is deterministic
    regardless of block arrival order; np.unique(return_index=True) then
    yields the first occurrence per key.
    """
    if group.num_rows == 0:
        return group.drop_columns([_BUCKET])
    order = group.sort_by([(key, "ascending")] + [(t, "ascending") for t in tiebreak])
    keys = order[key].to_numpy(zero_copy_only=False)
    _, first_idx = np.unique(keys, return_index=True)
    return order.take(np.sort(first_idx)).drop_columns([_BUCKET])


def dedup_exact(
    ds: "rd.Dataset",
    key: str = "doc_id",
    tiebreak: list[str] | None = None,
    num_buckets: int = 64,
    counters=None,
) -> "rd.Dataset":
    """Drop all but the deterministic first row per ``key``."""
    tiebreak = tiebreak or []
    bucketed = ds.map_batches(
        lambda b: add_bucket(b, key, num_buckets), batch_format="pyarrow"
    )

    def fn(group: pa.Table) -> pa.Table:
        n_in = group.num_rows
        out = _dedup_bucket(group, key, tiebreak)
        if counters is not None and n_in != out.num_rows:
            counters.inc.remote({"rows_deduped": n_in - out.num_rows})
        return out

    return bucketed.groupby(_BUCKET).map_groups(fn, batch_format="pyarrow")
