"""Generic tier chain for ANY keyed time-series table.

The sequences pipeline (pipelines/tiering.py) is the flagship; this module
runs the same raw -> 1m -> 1h -> 1d -> compressed chain over an arbitrary
(key, ts, value) table — e.g. the `events` stream — so the engine is a
general rollup/downsample/retention engine, not a single-schema tool.

Differences from the sequences chain: validation drops null key/ts/value
rows (no token invariant); tiers use generic column names
(n_rows, sum_val, min_val, max_val, mean_val); dedup is skipped (generic
streams have no unique-id contract — callers can pre-apply stages.dedup).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from mimirsbrunn_ray.functions.timeutil import BUCKET_US, trunc_us, ts_array
from mimirsbrunn_ray.stages.compress import compress_tier
from mimirsbrunn_ray.stages.gapfill import GENERIC_SPEC, gapfill
from mimirsbrunn_ray.stages.rollup import generic_rollup, tree_merge
from mimirsbrunn_ray.state.metrics import new_counters
from mimirsbrunn_ray.state.publish import TierStore


def _generic_partial_from_rollup(batch: pa.Table, key: str, gran: str) -> pa.Table:
    if "filled" in batch.column_names:
        batch = batch.filter(pc.fill_null(pc.invert(batch["filled"]), True))
    b_us = batch["bucket"].cast(pa.int64()).to_numpy(zero_copy_only=False)
    t = pa.table(
        {
            key: batch[key],
            "bucket": ts_array(trunc_us(b_us, gran)),
            "n_rows": batch["n_rows"].cast(pa.int64()),
            "sum_val": batch["sum_val"].cast(pa.float64()),
            "min_val": batch["min_val"].cast(pa.float64()),
            "max_val": batch["max_val"].cast(pa.float64()),
        }
    )
    g = t.group_by([key, "bucket"]).aggregate(
        [("n_rows", "sum"), ("sum_val", "sum"), ("min_val", "min"), ("max_val", "max")]
    )
    g = g.select([key, "bucket", "n_rows_sum", "sum_val_sum", "min_val_min", "max_val_max"])
    return g.rename_columns([key, "bucket", "n_rows", "sum_val", "min_val", "max_val"])


def _generic_finish(batch: pa.Table, key: str) -> pa.Table:
    import numpy as np

    n = batch["n_rows"].cast(pa.int64())
    s = batch["sum_val"].cast(pa.float64())
    return pa.table(
        {
            key: batch[key],
            "bucket": batch["bucket"].cast(pa.timestamp("us")),
            "n_rows": n,
            "sum_val": s,
            "min_val": batch["min_val"].cast(pa.float64()),
            "max_val": batch["max_val"].cast(pa.float64()),
            "mean_val": pc.divide(s, n.cast(pa.float64())),
            "filled": pa.array(np.zeros(batch.num_rows, dtype=bool)),
            "fill_kind": pa.array(["none"] * batch.num_rows, type=pa.string()),
        }
    )


def generic_rollup_from_rollup(
    ds: "rd.Dataset", key: str, gran: str
) -> "rd.Dataset":
    partials = ds.map_batches(
        lambda b: _generic_partial_from_rollup(b, key, gran),
        batch_format="pyarrow", batch_size=None,
    )

    def combine(b: pa.Table) -> pa.Table:
        g = b.group_by([key, "bucket"]).aggregate(
            [("n_rows", "sum"), ("sum_val", "sum"), ("min_val", "min"),
             ("max_val", "max")]
        )
        g = g.select(
            [key, "bucket", "n_rows_sum", "sum_val_sum", "min_val_min", "max_val_max"]
        )
        return g.rename_columns([key, "bucket", "n_rows", "sum_val", "min_val", "max_val"])

    return tree_merge(partials, combine).map_batches(
        lambda b: _generic_finish(b, key), batch_format="pyarrow", batch_size=None
    )


def run_generic_tiering_job(
    input_paths,
    out_root: str,
    run_id: str,
    key_col: str,
    ts_col: str,
    value_col: str,
    gap_policy: str = "locf",
    resume: bool = True,
) -> dict:
    """Tier an arbitrary (key, ts, value) parquet table; resumable like the
    sequences chain."""
    store = TierStore(out_root)
    input_paths = list(input_paths) if isinstance(input_paths, (list, tuple)) else [input_paths]
    summary: dict = {"run_id": run_id, "tiers": {}}

    def done(tier: str) -> bool:
        if resume and store.is_run_committed(tier, run_id):
            summary["tiers"][tier] = {"skipped": "already committed"}
            return True
        return False

    # raw: validated pass-through (null key/ts/value dropped + counted)
    if not done("raw"):
        counters = new_counters()

        def validate(b: pa.Table) -> pa.Table:
            n_in = b.num_rows
            ok = pc.and_(
                pc.and_(pc.is_valid(b[key_col]), pc.is_valid(b[ts_col])),
                pc.is_valid(b[value_col]),
            )
            out = b.filter(ok)
            if counters is not None and out.num_rows != n_in:
                counters.inc.remote(
                    {"rows_in": n_in, "rows_dropped_dirty": n_in - out.num_rows}
                )
            elif counters is not None:
                counters.inc.remote({"rows_in": n_in})
            return out

        ds = rd.read_parquet(input_paths).map_batches(
            validate, batch_format="pyarrow", batch_size=None
        )
        run_dir = store.publish(ds, "raw", run_id, input_paths=input_paths,
                                counters=counters)
        summary["tiers"]["raw"] = {"run_dir": run_dir}

    # 1m from raw, then hierarchical
    prev_mat = None
    for gran, prev in (("1m", "raw"), ("1h", "1m"), ("1d", "1h")):
        if done(gran):
            prev_mat = None
            continue
        counters = new_counters()
        if prev == "raw":
            from mimirsbrunn_ray.sources.ingest import order_paths_by_time

            # footer-stat time sort: blocks packing several uuid-named
            # files then cover contiguous time (see pipelines/tiering.py)
            raw = rd.read_parquet(
                order_paths_by_time(store.latest_data_paths("raw"), ts_col),
                columns=[key_col, ts_col, value_col])
            t = generic_rollup(raw, key_col, ts_col, value_col, gran)

            def add_fill_cols(b: pa.Table) -> pa.Table:
                import numpy as np

                b = b.append_column(
                    "filled", pa.array(np.zeros(b.num_rows, dtype=bool))
                )
                return b.append_column(
                    "fill_kind", pa.array(["none"] * b.num_rows, type=pa.string())
                )

            t = t.map_batches(add_fill_cols, batch_format="pyarrow",
                              batch_size=None)
        else:
            fine = prev_mat if prev_mat is not None else rd.read_parquet(
                store.latest_data_paths(prev)
            )
            t = generic_rollup_from_rollup(fine, key_col, gran)
        t = t.materialize()
        t = gapfill(
            t, gran, policy=gap_policy, counters=counters,
            key_col=key_col, spec=GENERIC_SPEC, n_rows=t.count(),
        ).materialize()
        run_dir = store.publish(t, gran, run_id,
                                input_paths=[store.latest_run_dir(prev)],
                                counters=counters)
        summary["tiers"][gran] = {"run_dir": run_dir}
        if gran == "1m":
            t1m_mat = t
        prev_mat = t

    # compressed blocks over the 1m sum_val stream
    if not done("compressed"):
        try:
            t1m = t1m_mat
        except (NameError, UnboundLocalError):
            t1m = rd.read_parquet(store.latest_data_paths("1m"))

        def to_seq_layout(b: pa.Table) -> pa.Table:
            # compress_tier speaks the sequences-tier layout; rename the
            # generic columns once in Arrow (zero-copy) and reuse its
            # auto-switching single-task / (source, day)-shuffle paths
            b = b.select([key_col, "bucket", "sum_val"])
            return b.rename_columns(["source", "bucket", "sum_tok"])

        blocks = compress_tier(
            t1m.map_batches(to_seq_layout, batch_format="pyarrow",
                            batch_size=None),
            n_rows=t1m.count(),
        )
        run_dir = store.publish(blocks, "compressed", run_id,
                                input_paths=[store.latest_run_dir("1m")])
        summary["tiers"]["compressed"] = {"run_dir": run_dir}
    return summary
