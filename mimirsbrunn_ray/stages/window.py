"""Stream-shaped operators over ordered, keyed logs: sessionization and
as-of joins.

The reference has no windows or watermarks (SURVEY.md §2.11) — its one
nearest-neighbor lookup is the POI <- nearest-address join against the
published index (/root/reference/src/osm_reader/poi.rs:228-239, J5). Here:

* ``sessionize``: tumbling-gap sessions per key, computed inside
  ``groupby(key).map_groups`` over ts-sorted groups (the documented Ray
  pattern for event-time windows; ordering assumption: one group = one
  key's full history).
* ``asof_join``: each left row matched to the greatest right-side ts <= its
  ts within the same key — ``pd.merge_asof`` per batch against a BROADCAST
  sorted right side (the small-side-broadcast rule; for a large right side,
  hash-bucket both sides by key and merge_asof inside each bucket).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data as rd


def sessionize(
    ds: "rd.Dataset",
    key: str = "user_id",
    ts_col: str = "ts",
    gap: pd.Timedelta = pd.Timedelta(minutes=30),
    num_buckets: int = 64,
) -> "rd.Dataset":
    """Per key: count gap-delimited sessions and events.

    Output: key, n_sessions (int64), n_events (int64).

    Scale shape: keys are HASH-BUCKETED into ``num_buckets`` coarse
    partitions (one shuffle on a small int column), then each bucket is
    sessionized VECTORIZED — one sort by (key, ts) plus a diff, never one
    pandas group per key (millions of tiny groups is the exact anti-pattern
    stages/dedup.py documents; this is the same fix).
    """
    from mimirsbrunn_ray.stages.dedup import _BUCKET, add_bucket

    bucketed = ds.map_batches(
        lambda b: add_bucket(b, key, num_buckets),
        batch_format="pyarrow",
        batch_size=None,
    )

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key, ts_col], kind="mergesort")
        key_change = g[key].ne(g[key].shift())
        new_session = key_change | (g[ts_col].diff() > gap)
        out = (
            g.assign(_ns=new_session)
            .groupby(key, sort=True)
            .agg(n_sessions=("_ns", "sum"), n_events=(key, "size"))
            .reset_index()
        )
        out["n_sessions"] = out["n_sessions"].astype(np.int64)
        out["n_events"] = out["n_events"].astype(np.int64)
        return out

    return bucketed.groupby(_BUCKET).map_groups(fn, batch_format="pandas")


def asof_join(
    left: "rd.Dataset",
    right_df: pd.DataFrame,
    key: str,
    ts_col: str,
    right_ts_col: str,
    out_col: str,
    inner: bool = True,
) -> "rd.Dataset":
    """For each left row: greatest right ts <= left ts with equal key.

    ``right_df`` is broadcast (ray.put once, resolved once per actor).
    """
    import ray

    right_sorted = right_df[[key, right_ts_col]].sort_values(right_ts_col)
    right_ref = ray.put(right_sorted)

    class AsOf:
        def __init__(self):
            self.right = ray.get(right_ref)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            b = batch.sort_values(ts_col)
            merged = pd.merge_asof(
                b,
                self.right.rename(columns={right_ts_col: out_col}),
                left_on=ts_col,
                right_on=out_col,
                by=key,
                direction="backward",
            )
            if inner:
                merged = merged[merged[out_col].notna()]
            return merged

    from mimirsbrunn_ray.context import pool_size

    return left.map_batches(
        AsOf,
        batch_format="pandas",
        batch_size=None,
        concurrency=(1, pool_size()),
    )
