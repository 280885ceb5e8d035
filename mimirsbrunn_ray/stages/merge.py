"""D3 graft: cross-run merge by key with set-union of list-valued fields.

The reference merges stops with equal ids across datasets — scalar fields
first-seen-wins, collection fields set-unioned through a BTreeSet
(/root/reference/src/stops.rs:151-187, ``merge_collection`` 151-160,
``merge_stops`` 165-187). Here:

  * rows are hash-bucketed on the key (the stages/dedup.py shape — never
    one pandas group per key),
  * inside each bucket: scalars keep the first row per key after a
    deterministic (key, *tiebreak) sort; every list column is exploded,
    deduped, and re-collected SORTED (the BTreeSet determinism).
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import ray.data as rd

from mimirsbrunn_ray.stages.dedup import _BUCKET, add_bucket


def _merge_bucket(
    g: pd.DataFrame, key: str, list_cols, scalar_cols, tiebreak
) -> pd.DataFrame:
    g = g.sort_values([key, *tiebreak], kind="mergesort")
    base = g[[key, *scalar_cols]].drop_duplicates(key, keep="first")
    for c in list_cols:
        ex = g[[key, c]].explode(c).dropna(subset=[c]).drop_duplicates()
        un = (
            ex.sort_values([key, c], kind="mergesort")
            .groupby(key, sort=False)[c]
            .agg(list)
        )
        base = base.merge(un, on=key, how="left")
        base[c] = base[c].apply(lambda v: v if isinstance(v, list) else [])
    return base.reset_index(drop=True)


def merge_list_union(
    ds: "rd.Dataset",
    key: str,
    list_cols,
    scalar_cols=(),
    tiebreak=(),
    num_buckets: int = 64,
) -> "rd.Dataset":
    """Merge all rows sharing ``key``: first-seen scalars (deterministic
    via the (key, *tiebreak) sort), sorted set-union of each list column."""
    list_cols = list(list_cols)
    scalar_cols = list(scalar_cols)
    tiebreak = list(tiebreak)
    bucketed = ds.map_batches(
        lambda b: add_bucket(b, key, num_buckets),
        batch_format="pyarrow",
        batch_size=None,
    )

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        return _merge_bucket(
            g.drop(columns=[_BUCKET]), key, list_cols, scalar_cols, tiebreak
        )

    return bucketed.groupby(_BUCKET).map_groups(fn, batch_format="pandas")
