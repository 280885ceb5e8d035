"""Hierarchical continuous aggregates: raw -> 1m -> 1h -> 1d.

Generalizes the reference's two-phase aggregate pattern — per-key partial
accumulation then a global reduce + broadcast normalize
(/root/reference/src/stops.rs:44-58 global max; src/bin/stops2mimir.rs:94-103
child counts) — into Ray Data's canonical partial+final aggregation:

  1. ``map_batches`` pre-aggregates each Arrow batch down to one row per
     (source, bucket) key (a combiner), so the shuffle moves only partials;
  2. a small ``groupby(["source","bucket"]).aggregate(...)`` merges partials.

Skew note (SURVEY.md §4): the hot source ("web", >= 40% of rows) never
overloads a reducer because step 1 bounds each key's final group to at most
one row per input batch — the partial combine IS the salt. Integer sums
(n_tok is int32 -> int64 sums) keep results order-insensitive; mean is
derived as sum/count at the very end.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from mimirsbrunn_ray.functions.timeutil import BUCKET_US, trunc_us, ts_array

PARTIAL_COLS = ["n_rows", "sum_tok", "min_tok", "max_tok"]


def _shard_hash(tbl: pa.Table, cols: list[str], n: int) -> np.ndarray:
    """Deterministic int32 shard id from one or more key columns."""
    import pandas as pd

    acc = np.zeros(tbl.num_rows, dtype=np.uint64)
    for c in cols:
        col = tbl[c]
        if pa.types.is_timestamp(col.type) or pa.types.is_integer(col.type):
            v = col.cast(pa.int64()).to_numpy(zero_copy_only=False).view(np.uint64)
        else:
            v = pd.util.hash_pandas_object(
                pd.Series(col.to_pandas()), index=False
            ).to_numpy()
        # splitmix-style mix so (a xor b) collisions don't align shards
        z = (acc ^ v) + np.uint64(0x9E3779B97F4A7C15)
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        acc = z ^ (z >> np.uint64(27))
    return (acc % np.uint64(n)).astype(np.int32)


def tree_merge(
    partials: "rd.Dataset",
    combine_fn,
    level1_width: int | None = None,
    final_shards: int = 1,
    shard_cols: list[str] | None = None,
) -> "rd.Dataset":
    """Merge per-block partial aggregates by tree-reduction instead of a
    sort-based groupby shuffle.

    Partial rows are associatively combinable (sum/min/max/count), so key
    co-location is unnecessary: coalesce blocks (repartition WITHOUT
    shuffle — no row movement beyond concatenation), combine within each,
    then combine the survivors in one final block. Measured ~20x faster
    than ``Dataset.groupby().aggregate()`` on ~1M partial rows.

    Scale bound: the final combine holds one row per distinct key, i.e.
    sources x buckets inside the run's ingest window — bounded by design
    (runs process bounded time windows, the reference's per-run dataset
    import model). When level-1 blocks overlap heavily in keys (inputs not
    clustered by key), the single final combine becomes a serial wall that
    grows with corpus size; pass ``final_shards > 1`` + ``shard_cols`` to
    replace it with a key-hash shuffle of the (already lvl1-combined)
    partials and a PARALLEL per-shard combine — shards are key-disjoint so
    no further merge is needed. Same shape as the dup-scan's sharded
    combine (stages/dedup.py scan_duplicate_keys), measured 2.6x faster at
    8 CPUs there; output rows identical up to order (pytest-asserted).
    """
    from mimirsbrunn_ray.context import pool_size

    width = level1_width or max(4, pool_size())
    lvl1 = partials.repartition(width).map_batches(
        combine_fn, batch_format="pyarrow", batch_size=None
    )
    if final_shards > 1:
        assert shard_cols, "final_shards > 1 requires shard_cols"
        cols = list(shard_cols)

        def add_shard(b: pa.Table) -> pa.Table:
            return b.append_column(
                "_s", pa.array(_shard_hash(b, cols, final_shards))
            )

        return (
            lvl1.map_batches(add_shard, batch_format="pyarrow", batch_size=None)
            .groupby("_s")
            .map_groups(
                lambda g: combine_fn(g.drop_columns(["_s"])),
                batch_format="pyarrow",
            )
        )
    return lvl1.repartition(1).map_batches(
        combine_fn, batch_format="pyarrow", batch_size=None
    )


def _partial_from_raw(batch: pa.Table, granularity: str) -> pa.Table:
    """Combine a raw-tier batch to one partial row per (source, bucket)."""
    ts_us = batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
    bucket = ts_array(trunc_us(ts_us, granularity))
    t = pa.table(
        {
            "source": batch["source"],
            "bucket": bucket,
            "n_tok": batch["n_tok"].cast(pa.int64()),
        }
    )
    g = t.group_by(["source", "bucket"]).aggregate(
        [("n_tok", "count"), ("n_tok", "sum"), ("n_tok", "min"), ("n_tok", "max")]
    )
    g = g.select(
        ["source", "bucket", "n_tok_count", "n_tok_sum", "n_tok_min", "n_tok_max"]
    )
    return g.rename_columns(
        ["source", "bucket", "n_rows", "sum_tok", "min_tok", "max_tok"]
    )


def _partial_from_rollup(batch: pa.Table, granularity: str) -> pa.Table:
    """Combine a finer-tier batch (1m->1h, 1h->1d) to coarser partials."""
    # ignore gap-filled rows: synthetic points must not contaminate sums
    if "filled" in batch.column_names:
        batch = batch.filter(
            pc.fill_null(pc.invert(batch["filled"]), True)
        )
    b_us = batch["bucket"].cast(pa.int64()).to_numpy(zero_copy_only=False)
    bucket = ts_array(trunc_us(b_us, granularity))
    t = pa.table(
        {
            "source": batch["source"],
            "bucket": bucket,
            "n_rows": batch["n_rows"].cast(pa.int64()),
            "sum_tok": batch["sum_tok"].cast(pa.int64()),
            "min_tok": batch["min_tok"].cast(pa.int64()),
            "max_tok": batch["max_tok"].cast(pa.int64()),
        }
    )
    g = t.group_by(["source", "bucket"]).aggregate(
        [
            ("n_rows", "sum"),
            ("sum_tok", "sum"),
            ("min_tok", "min"),
            ("max_tok", "max"),
        ]
    )
    g = g.select(
        ["source", "bucket", "n_rows_sum", "sum_tok_sum", "min_tok_min", "max_tok_max"]
    )
    return g.rename_columns(
        ["source", "bucket", "n_rows", "sum_tok", "min_tok", "max_tok"]
    )


def _combine_rollup_partials(b: pa.Table) -> pa.Table:
    """Associative merge of ROLLUP partial rows sharing (source, bucket)."""
    g = b.group_by(["source", "bucket"]).aggregate(
        [("n_rows", "sum"), ("sum_tok", "sum"), ("min_tok", "min"), ("max_tok", "max")]
    )
    g = g.select(
        ["source", "bucket", "n_rows_sum", "sum_tok_sum", "min_tok_min", "max_tok_max"]
    )
    return g.rename_columns(
        ["source", "bucket", "n_rows", "sum_tok", "min_tok", "max_tok"]
    )


def _finish(batch: pa.Table) -> pa.Table:
    """Derive mean, stamp fill columns, enforce ROLLUP_SCHEMA types."""
    n = batch["n_rows"].cast(pa.int64())
    s = batch["sum_tok"].cast(pa.int64())
    mean = pc.divide(s.cast(pa.float64()), n.cast(pa.float64()))
    return pa.table(
        {
            "source": batch["source"],
            "bucket": batch["bucket"].cast(pa.timestamp("us")),
            "n_rows": n,
            "sum_tok": s,
            "min_tok": batch["min_tok"].cast(pa.int32()),
            "max_tok": batch["max_tok"].cast(pa.int32()),
            "mean_tok": mean,
            "filled": pa.array(np.zeros(batch.num_rows, dtype=bool)),
            "fill_kind": pa.array(["none"] * batch.num_rows, type=pa.string()),
        }
    )


def generic_rollup(
    ds: "rd.Dataset",
    key: str,
    ts_col: str,
    value_col: str,
    granularity: str,
    int_scale: float | None = None,
) -> "rd.Dataset":
    """Partial+final rollup of an arbitrary (key, ts, value) stream — the
    engine's windowed-aggregate operator applied to non-sequence tables
    (e.g. the `events` table).

    ``int_scale``: emit value aggregates as ``round(v * int_scale)`` int64
    (e.g. 100 -> cents). Float sums depend on addition order, so ULP-level
    differences between engines are expected; snapping to scaled integers
    makes results bit-stable and cross-engine comparable.

    Output columns: key, bucket, n_rows, sum_val, min_val, max_val, mean_val.
    """

    def partial(batch: pa.Table) -> pa.Table:
        ts_us = batch[ts_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
        t = pa.table(
            {
                key: batch[key],
                "bucket": ts_array(trunc_us(ts_us, granularity)),
                "v": batch[value_col].cast(pa.float64()),
            }
        )
        g = t.group_by([key, "bucket"]).aggregate(
            [("v", "count"), ("v", "sum"), ("v", "min"), ("v", "max")]
        )
        g = g.select([key, "bucket", "v_count", "v_sum", "v_min", "v_max"])
        return g.rename_columns([key, "bucket", "n_rows", "sum_v", "min_v", "max_v"])

    def combine(b: pa.Table) -> pa.Table:
        g = b.group_by([key, "bucket"]).aggregate(
            [("n_rows", "sum"), ("sum_v", "sum"), ("min_v", "min"), ("max_v", "max")]
        )
        g = g.select([key, "bucket", "n_rows_sum", "sum_v_sum", "min_v_min", "max_v_max"])
        return g.rename_columns([key, "bucket", "n_rows", "sum_v", "min_v", "max_v"])

    partials = ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
    agg = tree_merge(partials, combine)

    def _snap(col) -> pa.ChunkedArray:
        # half_towards_infinity == ties away from zero, matching SQL ROUND
        scaled = pc.multiply(col.cast(pa.float64()), float(int_scale))
        return pc.cast(
            pc.round(scaled, ndigits=0, round_mode="half_towards_infinity"),
            pa.int64(),
        )

    def finish(batch: pa.Table) -> pa.Table:
        n = batch["n_rows"].cast(pa.int64())
        s = batch["sum_v"].cast(pa.float64())
        mean = pc.divide(s, n.cast(pa.float64()))
        mn, mx = batch["min_v"], batch["max_v"]
        if int_scale is not None:
            s, mn, mx = _snap(s), _snap(mn), _snap(mx)
            # derive mean from the SNAPPED integer sum: both engines then
            # divide identical integers -> identical doubles -> identical ties
            mean = pc.cast(
                pc.round(
                    pc.divide(s.cast(pa.float64()), n.cast(pa.float64())),
                    ndigits=0,
                    round_mode="half_towards_infinity",
                ),
                pa.int64(),
            )
        return pa.table(
            {
                key: batch[key],
                "bucket": batch["bucket"].cast(pa.timestamp("us")),
                "n_rows": n,
                "sum_val": s,
                "min_val": mn,
                "max_val": mx,
                "mean_val": mean,
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow", batch_size=None)


def rollup(
    ds: "rd.Dataset",
    granularity: str,
    from_tier: str,
    final_shards: int = 1,
) -> "rd.Dataset":
    """Roll a raw or finer rollup tier up to ``granularity``.

    ``from_tier`` is "raw" or a finer granularity ("1m", "1h").
    Returns a Dataset with ROLLUP_SCHEMA. ``final_shards > 1`` routes the
    partial merge through tree_merge's parallel sharded combine — use for
    large raw tiers whose blocks are not time-clustered (every block then
    emits partials for most (source, bucket) keys and the single final
    combine becomes the tier's serial wall).
    """
    assert granularity in BUCKET_US
    if from_tier == "raw":
        partial = lambda b: _partial_from_raw(b, granularity)  # noqa: E731
    else:
        assert BUCKET_US[from_tier] < BUCKET_US[granularity]
        partial = lambda b: _partial_from_rollup(b, granularity)  # noqa: E731

    partials = ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
    agg = tree_merge(
        partials,
        _combine_rollup_partials,
        final_shards=final_shards,
        shard_cols=["source", "bucket"],
    )
    return agg.map_batches(_finish, batch_format="pyarrow", batch_size=None)


def exact_quantiles_small_domain(
    ds: "rd.Dataset",
    key: str,
    val_fn,
    qs=(0.5, 0.9, 0.99),
    q_names=("p50", "p90", "p99"),
) -> "pa.Table":
    """EXACT per-key quantiles of a bounded integer domain via histogram
    counting — the scalable exact-quantile trick: no sort shuffle, no
    approximation. Per-batch (key, value) counts tree-merge (the combine
    is bounded by keys x |domain|, NOT by rows); the final cumulative
    walk applies the SQL-standard PERCENTILE_DISC rank (smallest v with
    cumulative count >= ceil(q * n) — matches DuckDB quantile_disc).

    ``val_fn(batch) -> pa.Array`` extracts the integer metric. For
    unbounded/continuous domains use a t-digest-style sketch instead;
    token counts, lengths, and score buckets are all small-int domains.
    """
    import pandas as pd
    import pyarrow.compute as pc

    def partial(b: pa.Table) -> pa.Table:
        t = pa.table({key: b[key], "v": val_fn(b).cast(pa.int64())})
        # null metrics would create a (key, null) bin that inflates the
        # rank denominator and puts NaN at the end of the driver's
        # cumulative walk (SQL aggregates ignore NULL inputs)
        t = t.filter(pc.is_valid(t["v"]))
        g = t.group_by([key, "v"]).aggregate([([], "count_all")])
        g = g.select([key, "v", "count_all"])
        return g.rename_columns([key, "v", "n"])

    def combine(b: pa.Table) -> pa.Table:
        g = b.group_by([key, "v"]).aggregate([("n", "sum")])
        return g.rename_columns([key, "v", "n"])

    parts = list(
        tree_merge(
            ds.map_batches(partial, batch_format="pyarrow", batch_size=None),
            combine,
        ).iter_batches(batch_format="pyarrow")
    )
    if not parts:
        cols = {key: pa.array([], pa.string())}
        cols.update({qn: pa.array([], pa.int64()) for qn in q_names})
        return pa.table(cols)
    hist = pa.concat_tables(parts).to_pandas()

    rows = []
    for k, g in hist.groupby(key, sort=True):
        g = g.sort_values("v")
        cum = g["n"].cumsum().to_numpy()
        vals = g["v"].to_numpy()
        total = int(cum[-1])
        row = {key: k}
        for q, qn in zip(qs, q_names):
            rank = int(np.ceil(q * total - 1e-9))
            row[qn] = int(vals[np.searchsorted(cum, rank)])
        rows.append(row)
    out = pd.DataFrame(rows)
    return pa.Table.from_pandas(out, preserve_index=False)


def pivot_counts(
    ds: "rd.Dataset",
    key: str,
    cat_col: str,
    categories: list,
    prefix: str = "n_",
) -> "rd.Dataset":
    """PIVOT: one row per key with a count column per category — the
    conditional-aggregation form (SQL COUNT(*) FILTER (WHERE cat = c)),
    not a per-group Python pivot.

    Shape: per-batch partials compute ALL category columns in one
    ``group_by`` over boolean-cast indicator columns (each category is a
    vectorized equality + sum — wide and flat, no row explosion), then the
    fixed-width partial rows tree-merge; the output is keys x |categories|
    ints. Unlisted categories count nothing (the SQL FILTER analog);
    NULL keys are dropped.
    """
    import pyarrow.compute as pc

    cols = [f"{prefix}{c}" for c in categories]

    def partial(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_valid(b[key]))
        data = {key: b[key]}
        for c, name in zip(categories, cols):
            data[name] = pc.cast(
                pc.fill_null(pc.equal(b[cat_col], c), False), pa.int64()
            )
        t = pa.table(data)
        g = t.group_by([key]).aggregate([(n, "sum") for n in cols])
        g = g.select([key] + [f"{n}_sum" for n in cols])
        return g.rename_columns([key] + cols)

    def combine(b: pa.Table) -> pa.Table:
        g = b.group_by([key]).aggregate([(n, "sum") for n in cols])
        g = g.select([key] + [f"{n}_sum" for n in cols])
        return g.rename_columns([key] + cols)

    return tree_merge(
        ds.map_batches(partial, batch_format="pyarrow", batch_size=None),
        combine,
    )


def group_standardize(
    ds: "rd.Dataset",
    key: str,
    val_col: str,
    id_cols: list[str],
    scale: int = 100,
) -> "rd.Dataset":
    """Per-group z-score standardization — the feature-normalization
    operator ((v - mean_g) / sd_g) ML pipelines run before training,
    expressed as the engine's canonical two-pass broadcast shape:

      1. one decomposable (n, sum, sumsq) partial pass, tree-merged (the
         combine is bounded by GROUPS, not rows — same triple as
         q_value_moments_per_type);
      2. the tiny per-group (mean, sd) table ships in the task spec and
         every batch standardizes via one vectorized index_in lookup —
         no shuffle touches the big side, partitioning-independent.

    Output: id_cols + [key, f"z_x{scale}" int64]. Rows with a null key,
    a null value, or a NaN value are dropped (NaN is VALID to Arrow but
    would poison the whole group's moments; the engine treats it as
    missing — the SQL twin filters NOT isnan); groups with zero
    variance emit NULL z (SQL NULLIF(sd, 0) division semantics). Scores
    are fixed-point (ROUND half away from zero) per the engine's
    float-parity convention; the op order mirrors the SQL
    ``((v - mean) / sd) * scale`` exactly.
    """
    import pyarrow.compute as pc

    from mimirsbrunn_ray.stages.ordered import _round_half_away

    def _keep(b: pa.Table) -> pa.Table:
        v = b[val_col].cast(pa.float64())
        return b.filter(
            pc.and_(
                pc.and_(pc.is_valid(b[key]), pc.is_valid(v)),
                pc.invert(pc.is_nan(pc.fill_null(v, 0.0))),
            )
        )

    def partial(b: pa.Table) -> pa.Table:
        b = _keep(b)
        v = b[val_col].cast(pa.float64())
        t = pa.table({key: b[key], "v": v, "v2": pc.multiply(v, v)})
        g = t.group_by([key]).aggregate(
            [([], "count_all"), ("v", "sum"), ("v2", "sum")]
        )
        g = g.select([key, "count_all", "v_sum", "v2_sum"])
        return g.rename_columns([key, "n", "s", "s2"])

    def combine(b: pa.Table) -> pa.Table:
        g = b.group_by([key]).aggregate(
            [("n", "sum"), ("s", "sum"), ("s2", "sum")]
        )
        g = g.select([key, "n_sum", "s_sum", "s2_sum"])
        return g.rename_columns([key, "n", "s", "s2"])

    parts = list(
        tree_merge(
            ds.map_batches(partial, batch_format="pyarrow", batch_size=None),
            combine,
        ).iter_batches(batch_format="pyarrow")
    )
    zcol = f"z_x{scale}"
    if parts:
        stats = pa.concat_tables(parts)
        keys_arr = stats[key].combine_chunks()
        n = stats["n"].to_numpy(zero_copy_only=False).astype(np.float64)
        s = stats["s"].to_numpy(zero_copy_only=False)
        s2 = stats["s2"].to_numpy(zero_copy_only=False)
        mean = s / n
        var = s2 / n - mean * mean
        sd = np.sqrt(np.maximum(var, 0.0))
    else:
        keys_arr, mean, sd = None, None, None

    def transform(b: pa.Table) -> pa.Table:
        b = _keep(b)
        if keys_arr is None or len(b) == 0:
            # no stats can only coexist with no valid rows; typed empty
            out = {c: b[c] for c in id_cols}
            out[key] = b[key]
            out[zcol] = pa.array([], pa.int64())
            return pa.table(out)
        idx = pc.index_in(b[key], value_set=keys_arr)
        pos = pc.fill_null(idx, 0).to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        v = b[val_col].cast(pa.float64()).to_numpy(zero_copy_only=False)
        g_sd = sd[pos]
        with np.errstate(divide="ignore", invalid="ignore"):
            z = (v - mean[pos]) / g_sd * float(scale)
        ok = g_sd > 0.0
        vals = np.where(ok, z, 0.0)
        z_int = _round_half_away(vals)
        out = {c: b[c] for c in id_cols}
        out[key] = b[key]
        out[zcol] = pa.array(
            np.ma.masked_array(z_int, mask=~ok), type=pa.int64()
        )
        return pa.table(out)

    return ds.map_batches(transform, batch_format="pyarrow", batch_size=None)


def exact_continuous_quantile(
    ds: "rd.Dataset",
    val_fn,
    qs=(0.5,),
    coarse_bins: int = 4096,
    bin_row_budget: int = 4_000_000,
    interpolation: str = "disc",
) -> list:
    """EXACT PERCENTILE_DISC over a CONTINUOUS (double) column in two
    streaming passes — the selection-algorithm complement to
    exact_quantiles_small_domain (which needs a bounded int domain) and
    to the t-digest (which is approximate):

      pass 1: global min/max + a fixed coarse histogram (bin index =
              linear map of the value; decomposable, tree-merged,
              driver state = coarse_bins counts);
      driver: cumulative walk locates, for each q, the BIN holding the
              rank-ceil(q*n) element (the PERCENTILE_DISC rank rule the
              quantile family uses);
      pass 2: ONE filtered collect of the boundary bins' values (each
              bounded by the densest bin, the budget_prefix_select
              boundary trick), sorted on the driver; the exact element
              is picked by its within-bin rank.

    Returns the selected elements (python floats) in ``qs`` order —
    ACTUAL data elements, so cross-engine comparison is exact float
    equality, no rounding convention needed.

    ``interpolation="cont"`` computes PERCENTILE_CONT instead: the two
    neighboring elements at rank floor/ceil of ``(n-1)*q`` are resolved
    through the SAME rank machinery (one extra rank per q, no extra
    passes) and linearly interpolated with DuckDB/Postgres's exact
    operation order ``(crn-rn)*lo + (rn-frn)*hi`` so cross-engine floats
    agree bit-for-bit away from 1-ulp rounding boundaries.

    Adversarially dense bins (heavy ties / constant columns concentrating
    the mass in one coarse bin) are handled by RECURSIVE BIN REFINEMENT
    (VERDICT r3 item 4): when a boundary bin's count exceeds
    ``bin_row_budget``, the bin is re-histogrammed within its ACTUAL
    value range (a min/max pass over the bin makes progress guaranteed:
    min < max splits into >= 2 sub-bins, min == max answers directly),
    descending until the target bin fits the budget — the driver pull is
    always <= bin_row_budget rows, never "the whole corpus happens to be
    one bin".
    """
    import pyarrow.compute as pc

    from mimirsbrunn_ray.stages.rollup import tree_merge

    def mm_partial(b: pa.Table) -> pa.Table:
        v = val_fn(b).cast(pa.float64())
        # drop nulls AND NaNs: pass 2's histogram excludes NaN, so the
        # pass-1 total must too or the rank walk runs off the histogram
        v = v.filter(pc.and_(pc.is_valid(v), pc.invert(pc.is_nan(v))))
        if len(v) == 0:
            return pa.table(
                {
                    "lo": pa.array([], pa.float64()),
                    "hi": pa.array([], pa.float64()),
                    "n": pa.array([], pa.int64()),
                }
            )
        mm = pc.min_max(v)
        return pa.table(
            {
                "lo": pa.array([mm["min"].as_py()]),
                "hi": pa.array([mm["max"].as_py()]),
                "n": pa.array([len(v)], pa.int64()),
            }
        )

    def mm_combine(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return b
        return pa.table(
            {
                "lo": pa.array([pc.min(b["lo"]).as_py()]),
                "hi": pa.array([pc.max(b["hi"]).as_py()]),
                "n": pa.array([pc.sum(b["n"]).as_py()], pa.int64()),
            }
        )

    parts = list(
        tree_merge(
            ds.map_batches(
                mm_partial, batch_format="pyarrow", batch_size=None
            ),
            mm_combine,
        ).iter_batches(batch_format="pyarrow")
    )
    parts = [p for p in parts if p.num_rows]
    if not parts:
        return [None for _ in qs]
    mm = mm_combine(pa.concat_tables(parts))
    lo, hi = mm["lo"][0].as_py(), mm["hi"][0].as_py()
    total = mm["n"][0].as_py()
    if lo == hi:
        return [lo for _ in qs]
    scale = coarse_bins / (hi - lo)

    def bin_of(v: np.ndarray) -> np.ndarray:
        idx = np.floor((v - lo) * scale).astype(np.int64)
        return np.clip(idx, 0, coarse_bins - 1)

    def hist_partial(b: pa.Table) -> pa.Table:
        v = val_fn(b).cast(pa.float64())
        arr = v.to_numpy(zero_copy_only=False)
        arr = arr[~np.isnan(arr)]
        if len(arr) == 0:
            return pa.table(
                {"b": pa.array([], pa.int64()), "n": pa.array([], pa.int64())}
            )
        counts = np.bincount(bin_of(arr), minlength=coarse_bins)
        nz = np.flatnonzero(counts)
        return pa.table(
            {"b": pa.array(nz), "n": pa.array(counts[nz].astype(np.int64))}
        )

    def hist_combine(b: pa.Table) -> pa.Table:
        g = b.group_by(["b"]).aggregate([("n", "sum")])
        return g.rename_columns(["b", "n"])

    hparts = list(
        tree_merge(
            ds.map_batches(
                hist_partial, batch_format="pyarrow", batch_size=None
            ),
            hist_combine,
        ).iter_batches(batch_format="pyarrow")
    )
    hist = hist_combine(pa.concat_tables(hparts)).to_pandas().sort_values(
        "b", ignore_index=True
    )
    cum = hist["n"].cumsum().to_numpy()
    bins = hist["b"].to_numpy()

    if interpolation not in ("disc", "cont"):
        raise ValueError(f"unknown interpolation {interpolation!r}")
    # per-q rank spec: disc needs ONE 1-based rank; cont needs the two
    # neighbors of rn = (n-1)*q (identical machinery, one extra rank)
    specs = []
    ranks_needed = set()
    for q in qs:
        if interpolation == "disc":
            rank = int(np.ceil(q * total - 1e-9))  # 1-based PERCENTILE_DISC
            specs.append(("disc", rank, rank, 0.0))
            ranks_needed.add(rank)
        else:
            rn = (total - 1) * float(q)  # 0-based, fractional
            frn = int(np.floor(rn))
            crn = int(np.ceil(rn))
            specs.append(("cont", frn + 1, crn + 1, rn))
            ranks_needed.update((frn + 1, crn + 1))

    targets = {}
    for rank in sorted(ranks_needed):
        i = int(np.searchsorted(cum, rank))
        before = int(cum[i - 1]) if i > 0 else 0
        targets[rank] = (int(bins[i]), rank - before)

    counts_by_bin = dict(zip(bins.tolist(), hist["n"].to_numpy().tolist()))

    def _clean(b: pa.Table) -> np.ndarray:
        arr = val_fn(b).cast(pa.float64()).to_numpy(zero_copy_only=False)
        return arr[~np.isnan(arr)]

    def _chain_mask(arr: np.ndarray, chain) -> np.ndarray:
        m = np.ones(len(arr), bool)
        for clo, cscale, cb in chain:
            idx = np.clip(
                np.floor((arr - clo) * cscale).astype(np.int64),
                0,
                coarse_bins - 1,
            )
            m &= idx == cb
        return m

    def _refine(first_bin: int, within_rank: int) -> float:
        # descend one histogram level at a time; each level's linear map
        # is built from the ACTUAL min/max of the current selection, so
        # min < max guarantees >= 2 nonempty sub-bins (progress) and
        # min == max answers directly (constant selection)
        chain = ((lo, scale, first_bin),)

        while True:
            def sel_mm(b: pa.Table, _c=chain) -> pa.Table:
                arr = _clean(b)
                arr = arr[_chain_mask(arr, _c)]
                if len(arr) == 0:
                    return pa.table(
                        {
                            "lo": pa.array([], pa.float64()),
                            "hi": pa.array([], pa.float64()),
                            "n": pa.array([], pa.int64()),
                        }
                    )
                return pa.table(
                    {
                        "lo": pa.array([float(arr.min())]),
                        "hi": pa.array([float(arr.max())]),
                        "n": pa.array([len(arr)], pa.int64()),
                    }
                )

            mparts = [
                p
                for p in tree_merge(
                    ds.map_batches(
                        sel_mm, batch_format="pyarrow", batch_size=None
                    ),
                    mm_combine,
                ).iter_batches(batch_format="pyarrow")
                if p.num_rows
            ]
            smm = mm_combine(pa.concat_tables(mparts))
            slo, shi = smm["lo"][0].as_py(), smm["hi"][0].as_py()
            n_sel = smm["n"][0].as_py()
            if slo == shi:
                return float(slo)
            if n_sel <= bin_row_budget:
                def sel_vals(b: pa.Table, _c=chain) -> pa.Table:
                    arr = _clean(b)
                    return pa.table(
                        {"v": pa.array(arr[_chain_mask(arr, _c)])}
                    )

                vals = np.sort(
                    ds.map_batches(
                        sel_vals, batch_format="pyarrow", batch_size=None
                    )
                    .to_pandas()["v"]
                    .to_numpy()
                )
                return float(vals[within_rank - 1])

            sscale = coarse_bins / (shi - slo)

            def sel_hist(b: pa.Table, _c=chain) -> pa.Table:
                arr = _clean(b)
                arr = arr[_chain_mask(arr, _c)]
                if len(arr) == 0:
                    return pa.table(
                        {
                            "b": pa.array([], pa.int64()),
                            "n": pa.array([], pa.int64()),
                        }
                    )
                idx = np.clip(
                    np.floor((arr - slo) * sscale).astype(np.int64),
                    0,
                    coarse_bins - 1,
                )
                cnt = np.bincount(idx, minlength=coarse_bins)
                nz = np.flatnonzero(cnt)
                return pa.table(
                    {
                        "b": pa.array(nz),
                        "n": pa.array(cnt[nz].astype(np.int64)),
                    }
                )

            sh = (
                hist_combine(
                    pa.concat_tables(
                        tree_merge(
                            ds.map_batches(
                                sel_hist,
                                batch_format="pyarrow",
                                batch_size=None,
                            ),
                            hist_combine,
                        ).iter_batches(batch_format="pyarrow")
                    )
                )
                .to_pandas()
                .sort_values("b", ignore_index=True)
            )
            scum = sh["n"].cumsum().to_numpy()
            sbins = sh["b"].to_numpy()
            i = int(np.searchsorted(scum, within_rank))
            before = int(scum[i - 1]) if i > 0 else 0
            within_rank -= before
            chain = chain + ((slo, sscale, int(sbins[i])),)

    # shared fast path: every budget-sized boundary bin resolves from ONE
    # filtered collect; oversized bins go through _refine
    need_bins = sorted(
        {b for b, _ in targets.values() if counts_by_bin[b] <= bin_row_budget}
    )
    bvals = None
    if need_bins:
        need_set = pa.array(need_bins, pa.int64())

        def boundary(b: pa.Table) -> pa.Table:
            arr = _clean(b)
            if len(arr) == 0:
                return pa.table(
                    {
                        "b": pa.array([], pa.int64()),
                        "v": pa.array([], pa.float64()),
                    }
                )
            bi = bin_of(arr)
            keep = pc.is_in(pa.array(bi), value_set=need_set).to_numpy(
                zero_copy_only=False
            )
            return pa.table({"b": pa.array(bi[keep]), "v": pa.array(arr[keep])})

        bvals = ds.map_batches(
            boundary, batch_format="pyarrow", batch_size=None
        ).to_pandas()

    value_at = {}
    for rank, (tb, within_rank) in targets.items():
        if counts_by_bin[tb] <= bin_row_budget:
            vals = np.sort(bvals[bvals["b"] == tb]["v"].to_numpy())
            value_at[rank] = float(vals[within_rank - 1])
        else:
            value_at[rank] = _refine(tb, within_rank)

    out = []
    for kind, lo_rank, hi_rank, rn in specs:
        if kind == "disc" or lo_rank == hi_rank:
            out.append(value_at[lo_rank])
        else:
            frn = float(np.floor(rn))
            crn = float(np.ceil(rn))
            out.append(
                (crn - rn) * value_at[lo_rank] + (rn - frn) * value_at[hi_rank]
            )
    return out


def melt(
    ds: "rd.Dataset",
    id_cols: list[str],
    value_cols: list[str],
    var_name: str = "variable",
    value_name: str = "value",
) -> "rd.Dataset":
    """UNPIVOT / wide-to-long melt — the inverse of pivot_counts: each
    input row emits one output row per value column, tagged with the
    column's name. Embarrassingly parallel and allocation-light: one
    concat of ``len(value_cols)`` zero-copy column slices per batch, no
    shuffle, no Python row loop. Value columns are cast to a common
    int64 (this engine's count-melt use); generalize the cast for mixed
    numeric melts."""

    def fn(b: pa.Table) -> pa.Table:
        parts = []
        for c in value_cols:
            cols = {k: b[k] for k in id_cols}
            cols[var_name] = pa.array([c] * b.num_rows, pa.string())
            cols[value_name] = b[c].cast(pa.int64())
            parts.append(pa.table(cols))
        return pa.concat_tables(parts)

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=None)
