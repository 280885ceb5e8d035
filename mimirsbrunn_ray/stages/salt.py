"""Explicit salted two-stage aggregation for skewed keys.

The north rule requires explicit salted partitioning for hot sources (the
synthetic corpus plants "web" at >= 40% of rows — the skew analog of the
reference's single-threaded hot-city dedup, SURVEY.md §4 "Skew" row).

When is this needed? The engine's default rollup path pre-combines inside
``map_batches`` (a combiner), which bounds any key's reducer input to one
row per input batch — skew never concentrates. Salting is the fallback for
operations WITHOUT a batch-level combiner: full-row shuffles
(groupby().map_groups with custom logic), exact quantiles, or third-party
aggregates. There:

  salt = hash(row_key) % k(source)        # k > 1 only for hot sources
  stage 1: groupby (source, bucket, salt) -> partial aggregate (parallel
           across k reducers even for the hottest key)
  stage 2: groupby (source, bucket)       -> exact merge of k partials

Hot-source detection reads per-source row counts from the previous run's
manifest counters (or a provided dict) — the tier-0-manifest feedback loop
of SURVEY.md §7.4 step 9.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd


def salt_plan(source_counts: dict, max_salts: int = 16, hot_frac: float = 0.2) -> dict:
    """source -> number of salts; >1 only for sources above ``hot_frac``."""
    total = sum(source_counts.values()) or 1
    plan = {}
    for s, n in source_counts.items():
        frac = n / total
        plan[s] = min(max_salts, max(1, int(np.ceil(frac / hot_frac)))) if frac >= hot_frac else 1
    return plan


def add_salt(
    batch: pa.Table,
    plan: dict,
    key_col: str = "source",
    row_key_col: str = "doc_id",
) -> pa.Table:
    """Vectorized salt column: hash(row_key) % k(source), 0 where k == 1."""
    from mimirsbrunn_ray.stages.dedup import _hash64

    src = batch[key_col].to_numpy(zero_copy_only=False)
    k = np.asarray([plan.get(s, 1) for s in src], dtype=np.uint64)
    h = _hash64(batch[row_key_col])
    salt = (h % np.maximum(k, 1)).astype(np.int32)
    return batch.append_column("salt", pa.array(salt))


def salted_rollup_1m(
    ds: "rd.Dataset",
    plan: dict,
) -> "rd.Dataset":
    """1m rollup via the explicit salted two-stage Ray groupby shuffle.

    Semantically identical to stages.rollup.rollup(ds, "1m", "raw") —
    asserted by tests — but exercises the salt route: stage 1 shuffles on
    (source, bucket, salt) so the hot source fans across k reducers; stage
    2 merges the k partials exactly (integer sums/min/max).
    """
    import pyarrow.compute as pc

    from mimirsbrunn_ray.functions.timeutil import trunc_us, ts_array
    from mimirsbrunn_ray.stages.rollup import _finish

    def prep(b: pa.Table) -> pa.Table:
        ts_us = b["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        out = pa.table(
            {
                "source": b["source"],
                "bucket": ts_array(trunc_us(ts_us, "1m")),
                "n_tok": b["n_tok"].cast(pa.int64()),
                "doc_id": b["doc_id"],
            }
        )
        return add_salt(out, plan).drop_columns(["doc_id"])

    keyed = ds.map_batches(prep, batch_format="pyarrow", batch_size=None)

    def stage1(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "source": [g["source"].iloc[0]],
                "bucket": [g["bucket"].iloc[0]],
                "n_rows": np.array([len(g)], dtype=np.int64),
                "sum_tok": np.array([g["n_tok"].sum()], dtype=np.int64),
                "min_tok": np.array([g["n_tok"].min()], dtype=np.int64),
                "max_tok": np.array([g["n_tok"].max()], dtype=np.int64),
            }
        )

    partial = keyed.groupby(["source", "bucket", "salt"]).map_groups(
        stage1, batch_format="pandas"
    )

    def stage2(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "source": [g["source"].iloc[0]],
                "bucket": [g["bucket"].iloc[0]],
                "n_rows": np.array([g["n_rows"].sum()], dtype=np.int64),
                "sum_tok": np.array([g["sum_tok"].sum()], dtype=np.int64),
                "min_tok": np.array([g["min_tok"].min()], dtype=np.int64),
                "max_tok": np.array([g["max_tok"].max()], dtype=np.int64),
            }
        )

    merged = partial.groupby(["source", "bucket"]).map_groups(
        stage2, batch_format="pandas"
    )
    return merged.map_batches(_finish, batch_format="pyarrow", batch_size=None)
