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
  stage 1: shuffle on (source, bucket, salt) -> partial aggregate (the hot
           source fans across k reducers), VECTORIZED inside each coarse
           hash bucket — never one pandas group per key
  stage 2: shuffle on (source, bucket)    -> exact merge of the k partials

Hot-source detection reads per-source row counts from the previous run's
manifest counters (the tier-0-manifest feedback loop of SURVEY.md §7.4
step 9) or, absent a manifest, from ``source_counts`` — a DISTRIBUTED
partial-count scan; only the (source, n) rows ever reach the driver,
never a corpus-sized column.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

_FNV = np.uint64(1099511628211)


def source_counts(ds: "rd.Dataset", col: str = "source") -> dict:
    """Distributed per-source row counts: per-batch ``value_counts``
    partials tree-merged to one tiny (source, n) table. Driver memory is
    O(distinct sources)."""
    from mimirsbrunn_ray.stages.rollup import tree_merge

    def partial(b: pa.Table) -> pa.Table:
        vc = pc.value_counts(b[col])
        return pa.table(
            {"source": vc.field("values").cast(pa.string()),
             "n": vc.field("counts").cast(pa.int64())}
        )

    def combine(b: pa.Table) -> pa.Table:
        g = b.group_by(["source"]).aggregate([("n", "sum")])
        return g.rename_columns(["source", "n"])

    parts = list(
        tree_merge(
            ds.map_batches(partial, batch_format="pyarrow", batch_size=None),
            combine,
        ).iter_batches(batch_format="pyarrow")
    )
    if not parts:
        return {}
    t = pa.concat_tables(parts)
    return {
        s: int(n)
        for s, n in zip(t["source"].to_pylist(), t["n"].to_pylist())
    }


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
    plan: dict | None,
    key_col: str = "source",
    row_key_col: str = "doc_id",
    max_salts: int = 16,
    hot_frac: float = 0.2,
) -> pa.Table:
    """Vectorized salt column: hash(row_key) % k(source), 0 where k == 1.

    ``plan`` is a source -> k dict (manifest counters or ``source_counts``)
    or None for BATCH-LOCAL detection: a source at >= ``hot_frac`` of THIS
    batch gets k salts. A globally hot source is hot in essentially every
    batch, so it still fans across reducers, and any salt assignment is
    CORRECT (stage 2 merges exactly) — the auto mode just skips the global
    pre-count pass, which is what you want at corpus scale.

    Either way the lookup runs over the batch's UNIQUE sources only (a
    handful), then fans out with the unique-inverse gather — never a
    per-row ``plan.get`` loop."""
    from mimirsbrunn_ray.stages.dedup import _hash64

    src = batch[key_col].to_numpy(zero_copy_only=False)
    uniq, inv, cnt = np.unique(src, return_inverse=True, return_counts=True)
    if plan is None:
        frac = cnt / max(1, len(src))
        ks = np.where(
            frac >= hot_frac,
            np.minimum(max_salts, np.ceil(frac / hot_frac)).astype(np.int64),
            1,
        ).astype(np.uint64)
    else:
        ks = np.asarray([plan.get(s, 1) for s in uniq], dtype=np.uint64)
    k = ks[inv]
    h = _hash64(batch[row_key_col])
    salt = (h % np.maximum(k, np.uint64(1))).astype(np.int32)
    return batch.append_column("salt", pa.array(salt))


def _hash_bucket_cols(b: pa.Table, cols, num_buckets: int) -> np.ndarray:
    """Deterministic coarse bucket id over a composite of columns."""
    h = np.zeros(b.num_rows, dtype=np.uint64)
    for c in cols:
        vals = pd.Series(b[c].to_pandas())
        h = h * _FNV ^ pd.util.hash_pandas_object(vals, index=False).to_numpy()
    return (h % np.uint64(num_buckets)).astype(np.int32)


def salted_rollup_1m(
    ds: "rd.Dataset",
    plan: dict | None = None,
    num_buckets: int = 64,
) -> "rd.Dataset":
    """1m rollup via the explicit salted two-stage Ray shuffle.

    Semantically identical to stages.rollup.rollup(ds, "1m", "raw") —
    asserted by tests — but exercises the salt route: stage 1 shuffles on
    a hash of (source, bucket, salt) so the hot source fans across k
    reducers and aggregates VECTORIZED inside each coarse bucket (one
    pandas groupby.agg per bucket, never one call per key); stage 2
    merges the k partials exactly (integer sums/min/max).

    ``plan=None`` uses batch-local hot-source detection (zero extra pass —
    see ``add_salt``); pass an explicit plan when manifest counters or a
    ``source_counts`` scan are available.
    """
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
        out = add_salt(out, plan).drop_columns(["doc_id"])
        return out.append_column(
            "_b",
            pa.array(
                _hash_bucket_cols(out, ["source", "bucket", "salt"], num_buckets)
            ),
        )

    keyed = ds.map_batches(prep, batch_format="pyarrow", batch_size=None)

    def stage1(g: pd.DataFrame) -> pd.DataFrame:
        out = (
            g.groupby(["source", "bucket", "salt"], sort=False, observed=True)
            .agg(
                n_rows=("n_tok", "size"),
                sum_tok=("n_tok", "sum"),
                min_tok=("n_tok", "min"),
                max_tok=("n_tok", "max"),
            )
            .reset_index()
            .drop(columns=["salt"])  # partials stay distinct rows; stage 2 merges
        )
        out["n_rows"] = out["n_rows"].astype(np.int64)
        return out

    partial = keyed.groupby("_b").map_groups(
        lambda g: stage1(g.drop(columns=["_b"])), batch_format="pandas"
    )

    # stage 2: the k partials per (source, bucket) merge associatively
    # (sum/sum/min/max), so a TREE MERGE combines them without a second
    # all-to-all shuffle — the partial row count is bounded by
    # sources x buckets x salts, tiny next to the stage-1 row shuffle
    from mimirsbrunn_ray.stages.rollup import tree_merge

    def stage2(b: pa.Table) -> pa.Table:
        g = b.group_by(["source", "bucket"]).aggregate(
            [("n_rows", "sum"), ("sum_tok", "sum"),
             ("min_tok", "min"), ("max_tok", "max")]
        )
        g = g.select(
            ["source", "bucket", "n_rows_sum", "sum_tok_sum",
             "min_tok_min", "max_tok_max"]
        )
        return g.rename_columns(
            ["source", "bucket", "n_rows", "sum_tok", "min_tok", "max_tok"]
        )

    merged = tree_merge(partial, stage2)
    return merged.map_batches(_finish, batch_format="pyarrow", batch_size=None)
