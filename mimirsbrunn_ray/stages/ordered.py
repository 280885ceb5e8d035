"""Ordered-per-key analytics — the SQL window-function family (LAG,
SUM OVER RANGE/ROWS, argmax-per-partition) as distributed Ray Data stages.

The reference has no window functions; its closest shapes are the
order-dependent in-group rules it enforces by construction — deterministic
in-group sorts before keep-first dedup (O1/D1,
/root/reference/src/osm_reader/street.rs:202-246) and the "first stop
wins" cross-dataset merge (/root/reference/src/stops.rs:165-187). This
module generalizes that "sorted group, then a vectorized scan over it"
discipline to the classic log analytics every time-series engine needs:

* ``interarrival_stats`` — per-key LAG(ts) deltas reduced to gap stats.
* ``rolling_bucket_agg`` — bucket-grain rolling window (SUM/COUNT/MEAN
  OVER ... RANGE BETWEEN k-1 buckets PRECEDING AND CURRENT ROW),
  aggregated to bucket grain FIRST so the windowed pass touches
  keys x buckets rows, never the raw stream.
* ``cumulative_bucket_agg`` — running totals over bucket grain (SUM OVER
  ... ROWS UNBOUNDED PRECEDING), same pre-aggregation discipline.
* ``mode_per_key`` — the most frequent value per key with a deterministic
  tiebreak (ROW_NUMBER()=1 over count DESC, value ASC).

Scale shapes: every operator pre-reduces inside ``map_batches`` (partial
counts / bucket-grain partials) before its ONE hash shuffle, and every
per-group body is a vectorized sort + segment scan — never a Python loop
over rows, never one pandas group per key (the tiny-groups anti-pattern
stages/dedup.py documents). Keys are hash-bucketed into coarse partitions
where per-key groups would be tiny (interarrival), and grouped directly
where the grouped rows are already bounded (bucket-grain windows: rows =
keys x buckets in the run window, the generic_rollup bound).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from mimirsbrunn_ray.functions.timeutil import BUCKET_US, trunc_us, ts_array


def _round_half_away(x: np.ndarray) -> np.ndarray:
    """SQL ROUND semantics (half away from zero) as int64 — np.round is
    half-EVEN and silently diverges from the DuckDB oracle on .5 values
    (same reason the rollup path uses pc.round half_towards_infinity)."""
    return np.trunc(x + np.copysign(0.5, x)).astype(np.int64)


def interarrival_stats(
    ds: "rd.Dataset",
    key: str = "user_id",
    ts_col: str = "ts",
    num_buckets: int = 64,
) -> "rd.Dataset":
    """Per key: stats over the LAG(ts) inter-arrival deltas.

    Output: key, n_events int64, mean_gap_s double, max_gap_s double —
    keys with a single (non-null-ts) event are omitted (no gaps exist;
    SQL HAVING COUNT(*) >= 2). mean_gap_s mirrors the SQL expression
    ``(SUM(delta_us)::DOUBLE / COUNT(delta_us)) / 1e6`` exactly.

    Shape: the sessionize bucketing — one hash shuffle on a coarse key
    bucket, then each bucket sorts ONCE by (key, ts) and reduces the
    diff column per key segment (C-level groupby, no per-key loop).
    Null-ts rows are dropped up front (LAG ordering over NULL ts is
    undefined) and so are null-KEY rows (SQL PARTITION BY groups nulls
    into one partition, pandas groupby drops them); the oracle filters
    identically on both.
    """
    from mimirsbrunn_ray.stages.dedup import _BUCKET, add_bucket

    def project(b: pa.Table) -> pa.Table:
        b = b.filter(pc.and_(pc.is_valid(b[ts_col]), pc.is_valid(b[key])))
        return pa.table(
            {
                key: b[key],
                "_ts": b[ts_col].cast(pa.timestamp("us")).cast(pa.int64()),
            }
        )

    bucketed = ds.map_batches(
        project, batch_format="pyarrow", batch_size=None
    ).map_batches(
        lambda b: add_bucket(b, key, num_buckets),
        batch_format="pyarrow",
        batch_size=None,
    )

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame(
                {
                    key: pd.Series([], dtype=g[key].dtype if key in g else "int64"),
                    "n_events": pd.Series([], dtype="int64"),
                    "mean_gap_s": pd.Series([], dtype="float64"),
                    "max_gap_s": pd.Series([], dtype="float64"),
                }
            )
        g = g.sort_values([key, "_ts"], kind="mergesort")
        ts = g["_ts"].to_numpy(dtype=np.int64)
        same_key = g[key].eq(g[key].shift()).to_numpy()
        d = np.diff(ts, prepend=ts[:1])
        # masked columns so the per-key reduce is a pure C groupby —
        # never a Python lambda per group (the tiny-groups anti-pattern)
        agg = (
            g.assign(
                _gap_sum=np.where(same_key, d, 0),
                _gap_n=same_key.astype(np.int64),
                _gap_max=np.where(same_key, d, np.int64(-1)),
            )
            .groupby(key, sort=True)
            .agg(
                n_events=(key, "size"),
                _sum_gap=("_gap_sum", "sum"),
                _n_gap=("_gap_n", "sum"),
                _max_gap=("_gap_max", "max"),
            )
            .reset_index()
        )
        agg = agg[agg["_n_gap"] > 0]
        mean_s = (
            agg["_sum_gap"].astype(np.float64) / agg["_n_gap"]
        ) / 1e6
        return pd.DataFrame(
            {
                key: agg[key],
                "n_events": agg["n_events"].astype(np.int64),
                "mean_gap_s": mean_s,
                "max_gap_s": agg["_max_gap"].astype(np.float64) / 1e6,
            }
        )

    return bucketed.groupby(_BUCKET).map_groups(
        lambda g: per_bucket(g.drop(columns=[_BUCKET])),
        batch_format="pandas",
    )


def _bucket_grain_partials(
    ds: "rd.Dataset", key: str, ts_col: str, value_col: str, bucket: str
) -> "rd.Dataset":
    """(key, bucket) -> (n int64, s double) partial aggregate rows,
    combiner-first + tree-merged (the generic_rollup discipline): the
    downstream windowed pass sees keys x buckets rows, never the stream.

    Null semantics, pinned so the windowed consumers stay NaN-free and
    SQL-comparable: null-ts and null-KEY rows are dropped (SQL PARTITION
    BY groups nulls into one partition, pandas groupby drops them — the
    paired oracles filter identically), and null VALUES sum as 0 while n
    counts the row (oracle: SUM(COALESCE(v, 0)) + COUNT(*)); without the
    coalesce an all-null bucket yields a null Arrow sum that turns into
    NaN and poisons every downstream prefix/window sum through the int64
    cast."""
    from mimirsbrunn_ray.stages.rollup import tree_merge

    def partial(b: pa.Table) -> pa.Table:
        b = b.filter(pc.and_(pc.is_valid(b[ts_col]), pc.is_valid(b[key])))
        ts_us = (
            b[ts_col].cast(pa.timestamp("us")).cast(pa.int64())
            .to_numpy(zero_copy_only=False)
        )
        t = pa.table(
            {
                key: b[key],
                "bucket": ts_array(trunc_us(ts_us, bucket)),
                "v": pc.fill_null(b[value_col].cast(pa.float64()), 0.0),
            }
        )
        g = t.group_by([key, "bucket"]).aggregate(
            [([], "count_all"), ("v", "sum")]
        )
        g = g.select([key, "bucket", "count_all", "v_sum"])
        return g.rename_columns([key, "bucket", "n", "s"])

    def combine(b: pa.Table) -> pa.Table:
        g = b.group_by([key, "bucket"]).aggregate(
            [("n", "sum"), ("s", "sum")]
        )
        g = g.select([key, "bucket", "n_sum", "s_sum"])
        return g.rename_columns([key, "bucket", "n", "s"])

    return tree_merge(
        ds.map_batches(partial, batch_format="pyarrow", batch_size=None),
        combine,
    )


def rolling_bucket_agg(
    ds: "rd.Dataset",
    key: str,
    ts_col: str,
    value_col: str,
    bucket: str = "1m",
    window_buckets: int = 5,
    scale: float = 100.0,
) -> "rd.Dataset":
    """Rolling window over bucket grain: for each (key, bucket) present in
    the stream, SUM/COUNT/MEAN of the value over the trailing
    ``window_buckets`` buckets (RANGE frame — absent buckets contribute
    nothing but DO advance the window).

    Output: key, bucket timestamp[us], roll_n int64, roll_sum int64
    (snapped x``scale``, the engine's cross-engine float convention),
    roll_mean int64 (ROUND(roll_sum_snapped / roll_n)).

    Shape: ONE bucket-grain pre-aggregation (partials + tree merge), then
    ONE hash shuffle on the key over the bounded (key x bucket) rows; each
    group sorts by bucket once and resolves every window by at most
    ``window_buckets`` vectorized shifted adds (buckets are grid-aligned
    and distinct per key, so a trailing RANGE window never holds more than
    ``window_buckets`` rows) — no per-window loop, no row replication of
    the raw stream (the hopping_window_rollup lesson).
    """
    width = BUCKET_US[bucket]
    span_us = window_buckets * width
    grain = _bucket_grain_partials(ds, key, ts_col, value_col, bucket)

    def per_key(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame(
                {
                    key: pd.Series([], dtype=g[key].dtype if key in g else "int64"),
                    "bucket": pd.Series([], dtype="datetime64[us]"),
                    "roll_n": pd.Series([], dtype="int64"),
                    "roll_sum": pd.Series([], dtype="int64"),
                    "roll_mean": pd.Series([], dtype="int64"),
                }
            )
        g = g.sort_values([key, "bucket"], kind="mergesort")
        bu = (
            g["bucket"].to_numpy().astype("datetime64[us]").astype(np.int64)
        )
        same_key = g[key].eq(g[key].shift()).to_numpy()
        n = g["n"].to_numpy(dtype=np.int64)
        s = g["s"].to_numpy(dtype=np.float64)
        roll_n = n.copy()
        roll_s = s.copy()
        for j in range(1, window_buckets):
            # row i-j is in i's trailing window iff same key and the
            # bucket distance stays under the window span
            in_win = np.zeros(len(bu), dtype=bool)
            if len(bu) > j:
                contiguous = same_key[j:].copy()
                for jj in range(1, j):
                    contiguous &= same_key[j - jj:-jj]
                in_win[j:] = contiguous & ((bu[j:] - bu[:-j]) < span_us)
            roll_n[in_win] += n[np.flatnonzero(in_win) - j]
            roll_s[in_win] += s[np.flatnonzero(in_win) - j]
        snapped = _round_half_away(roll_s * scale)
        mean = _round_half_away(snapped.astype(np.float64) / roll_n)
        return pd.DataFrame(
            {
                key: g[key],
                "bucket": g["bucket"],
                "roll_n": roll_n,
                "roll_sum": snapped,
                "roll_mean": mean,
            }
        )

    out = grain.groupby(key).map_groups(per_key, batch_format="pandas")
    return out.map_batches(
        lambda b: b.set_column(
            b.schema.get_field_index("bucket"),
            "bucket",
            b["bucket"].cast(pa.timestamp("us")),
        ),
        batch_format="pyarrow",
        batch_size=None,
    )


def cumulative_bucket_agg(
    ds: "rd.Dataset",
    key: str,
    ts_col: str,
    value_col: str,
    bucket: str = "1d",
    scale: float = 100.0,
) -> "rd.Dataset":
    """Running totals over bucket grain: for each (key, bucket), the
    cumulative COUNT/SUM of everything at or before it (SUM OVER ...
    ROWS UNBOUNDED PRECEDING on the bucket-grain aggregate).

    Output: key, bucket timestamp[us], day_n int64, cum_n int64,
    cum_sum int64 (snapped x``scale``).

    Shape: same bounded pre-aggregation as ``rolling_bucket_agg``; each
    key's prefix sums accumulate in ascending bucket order — the exact
    summation order of the SQL running frame, so the snapped values agree
    bit-for-bit in practice. Per-key history at bucket grain is bounded
    by the run window (the generic_rollup bound), which is what makes a
    sequential prefix scan per key acceptable; the scan itself is one
    ``np.cumsum`` per group segment.
    """
    grain = _bucket_grain_partials(ds, key, ts_col, value_col, bucket)

    def per_key(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame(
                {
                    key: pd.Series([], dtype=g[key].dtype if key in g else "int64"),
                    "bucket": pd.Series([], dtype="datetime64[us]"),
                    "day_n": pd.Series([], dtype="int64"),
                    "cum_n": pd.Series([], dtype="int64"),
                    "cum_sum": pd.Series([], dtype="int64"),
                }
            )
        g = g.sort_values([key, "bucket"], kind="mergesort")
        n = g["n"].to_numpy(dtype=np.int64)
        s = g["s"].to_numpy(dtype=np.float64)
        # segment-local cumsum: subtract each key segment's running
        # baseline (vectorized per-segment reset, no per-key loop)
        new_seg = ~g[key].eq(g[key].shift()).to_numpy()
        seg_id = np.cumsum(new_seg) - 1
        cn = np.cumsum(n)
        cs = np.cumsum(s)
        starts = np.flatnonzero(new_seg)
        base_n = np.where(starts > 0, cn[starts - 1], 0)[seg_id]
        base_s = np.where(starts > 0, cs[starts - 1], 0.0)[seg_id]
        cum_n = cn - base_n
        cum_s = cs - base_s
        return pd.DataFrame(
            {
                key: g[key],
                "bucket": g["bucket"],
                "day_n": n,
                "cum_n": cum_n.astype(np.int64),
                "cum_sum": _round_half_away(cum_s * scale),
            }
        )

    out = grain.groupby(key).map_groups(per_key, batch_format="pandas")
    return out.map_batches(
        lambda b: b.set_column(
            b.schema.get_field_index("bucket"),
            "bucket",
            b["bucket"].cast(pa.timestamp("us")),
        ),
        batch_format="pyarrow",
        batch_size=None,
    )


def mode_per_key(
    ds: "rd.Dataset",
    key: str,
    value_col: str,
    out_col: str = "top_value",
    count_col: str = "n_events",
) -> "rd.Dataset":
    """Most frequent value per key, ties broken by ascending value —
    ROW_NUMBER()=1 OVER (PARTITION BY key ORDER BY n DESC, value ASC).

    The argmax analog of the reference's keep-min-id winner rule (D1,
    /root/reference/src/osm_reader/street.rs:222-231): a deterministic
    single winner per group regardless of arrival order.

    Shape: combiner-first — per-batch PARTIAL (key, value) counts inside
    ``map_batches`` (the shuffle moves distinct pairs per batch, never
    rows), ONE hash shuffle on the key, then each group merges partial
    counts and takes its argmax in two vectorized sorts. Null keys or
    values are dropped (SQL GROUP BY + COUNT semantics over NULL pairs
    are engine-divergent; the oracle filters identically).
    """

    def partial(b: pa.Table) -> pa.Table:
        b = b.filter(
            pc.and_(pc.is_valid(b[key]), pc.is_valid(b[value_col]))
        )
        g = b.select([key, value_col]).group_by([key, value_col]).aggregate(
            [([], "count_all")]
        )
        g = g.select([key, value_col, "count_all"])
        return g.rename_columns([key, value_col, "_n"])

    partials = ds.map_batches(
        partial, batch_format="pyarrow", batch_size=None
    )

    def argmax(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame(
                {
                    key: pd.Series([], dtype=g[key].dtype if key in g else "int64"),
                    out_col: pd.Series(
                        [], dtype=g[value_col].dtype if value_col in g else "object"
                    ),
                    count_col: pd.Series([], dtype="int64"),
                }
            )
        c = (
            g.groupby([key, value_col], sort=False, as_index=False)["_n"]
            .sum()
        )
        c = c.sort_values(
            [key, "_n", value_col],
            ascending=[True, False, True],
            kind="mergesort",
        )
        first = ~c[key].eq(c[key].shift()).to_numpy()
        win = c[first]
        return pd.DataFrame(
            {
                key: win[key],
                out_col: win[value_col],
                count_col: win["_n"].astype(np.int64),
            }
        )

    # coarse key buckets: one pandas group per key would be the
    # tiny-groups anti-pattern for high-cardinality keys; argmax segments
    # by the real key internally, so bucketing never changes output
    from mimirsbrunn_ray.stages.dedup import _BUCKET, add_bucket

    bucketed = partials.map_batches(
        lambda b: add_bucket(b, key, 64), batch_format="pyarrow",
        batch_size=None,
    )
    return bucketed.groupby(_BUCKET).map_groups(
        lambda g: argmax(g.drop(columns=[_BUCKET])), batch_format="pandas"
    )


def group_cume_dist(
    ds: "rd.Dataset",
    key: str,
    val_col: str,
    id_cols: list[str],
    scale: int = 1_000_000,
) -> "rd.Dataset":
    """Distributed CUME_DIST() OVER (PARTITION BY key ORDER BY val) — the
    percentile-rank window function, chosen over NTILE because tied
    values share one deterministic rank (NTILE splits ties by physical
    row order, which no distributed engine should promise).

    Scale shape: same trick as exact_quantiles_small_domain — cume_dist
    only depends on the per-key VALUE HISTOGRAM, so one decomposable
    (key, v, n) count pass tree-merges into a table bounded by
    keys x |domain| (never rows), the driver turns it into cumulative
    counts, and a second stream pass assigns each row
    round(cum(v) / n_key * scale) via one vectorized searchsorted per
    KEY PRESENT IN THE BATCH (bounded by group cardinality, not rows —
    for high-cardinality keys hash-bucket the assignment or switch to a
    t-digest percentile). No sort shuffle, no rank exchange; rows with
    a null key or value are dropped (the SQL WHERE twin).

    Output: id_cols + [key, val_col, f"cd_x{scale}" int64].
    """
    from mimirsbrunn_ray.stages.rollup import tree_merge

    def partial(b: pa.Table) -> pa.Table:
        b = b.filter(pc.and_(pc.is_valid(b[key]), pc.is_valid(b[val_col])))
        t = pa.table({key: b[key], "v": b[val_col].cast(pa.int64())})
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
    cdcol = f"cd_x{scale}"
    if parts:
        hist = (
            pa.concat_tables(parts)
            .to_pandas()
            .sort_values([key, "v"], ignore_index=True)
        )
        keys_np = hist[key].to_numpy()
        vals_np = hist["v"].to_numpy()
        counts = hist["n"].to_numpy()
        key_start = np.ones(len(hist), dtype=bool)
        key_start[1:] = keys_np[1:] != keys_np[:-1]
        seg = np.cumsum(key_start) - 1
        cum = np.cumsum(counts)
        seg_starts = np.flatnonzero(key_start)
        base = np.zeros(len(hist), dtype=np.int64)
        base[seg_starts[1:]] = cum[seg_starts[1:] - 1]
        cum = cum - np.maximum.accumulate(base)
        totals = cum[np.append(seg_starts[1:] - 1, len(hist) - 1)][seg]
        # distinct (key, v) rows sorted -> composite searchsorted lookup
        key_arr = pa.array(keys_np)
    else:
        key_arr = None

    def assign(b: pa.Table) -> pa.Table:
        b = b.filter(pc.and_(pc.is_valid(b[key]), pc.is_valid(b[val_col])))
        out = {c: b[c] for c in id_cols}
        out[key] = b[key]
        out[val_col] = b[val_col]
        if key_arr is None or len(b) == 0:
            # no histogram can only coexist with no valid rows
            out[cdcol] = pa.array([], pa.int64())
            return pa.table(out)
        # composite (key, v) -> row in the sorted histogram: key segment
        # via index_in against the FIRST occurrence array, then a
        # searchsorted within [seg_start, seg_end) on v
        kidx = pc.index_in(b[key], value_set=key_arr).to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        v = b[val_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
        # index_in returns the FIRST match = the key's segment start
        seg_id = seg[kidx]
        ends = np.append(seg_starts[1:], len(keys_np))
        row = np.empty(len(v), dtype=np.int64)
        for s_id in np.unique(seg_id):
            m = seg_id == s_id
            lo, hi = seg_starts[s_id], ends[s_id]
            row[m] = lo + np.searchsorted(vals_np[lo:hi], v[m])
        cd = np.floor(
            cum[row].astype(np.float64)
            / totals[row].astype(np.float64)
            * float(scale)
            + 0.5
        ).astype(np.int64)
        out[cdcol] = pa.array(cd)
        return pa.table(out)

    return ds.map_batches(assign, batch_format="pyarrow", batch_size=None)


def lead_pairs(
    ds: "rd.Dataset",
    key: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    type_col: str = "event_type",
    start_type: str = "click",
    num_buckets: int = 64,
) -> "rd.Dataset":
    """Row-level LEAD pairing: for every ``start_type`` event, the key's
    NEXT event in (ts, id) order — the click->what-happened-next join
    behind attribution and abandonment analyses. The last event of a key
    pairs with NULL (SQL LEAD semantics); ties in ts are broken by the
    unique id, so the pairing is deterministic under any partitioning.

    Same scale shape as the rest of this module: one coarse hash-bucket
    shuffle on the key, then one mergesort + one shift per bucket —
    vectorized, never per-key groups. Null key/ts rows are dropped (the
    SQL WHERE twin), and so are start events with NO next event (a key's
    final row): INNER pairing keeps every output column non-null, which
    also sidesteps the engines' divergent nullable-int pandas mappings
    (Int64 vs float64) in the driver's value compare.

    Output: id_col, next_event_id int64, next_event_type string.
    """
    from mimirsbrunn_ray.stages.dedup import _BUCKET, add_bucket

    filtered = ds.map_batches(
        lambda b: add_bucket(
            b.filter(
                pc.and_(pc.is_valid(b[key]), pc.is_valid(b[ts_col]))
            ),
            key,
            num_buckets,
        ),
        batch_format="pyarrow",
        batch_size=None,
    )

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                id_col: pd.Series([], dtype=np.int64),
                "next_event_id": pd.Series([], dtype=np.int64),
                "next_event_type": pd.Series([], dtype=object),
            }
        )
        if len(g) == 0:
            return empty
        g = g.sort_values([key, ts_col, id_col], kind="mergesort")
        keep = (
            g[key].shift(-1).eq(g[key]) & g[type_col].eq(start_type)
        ).to_numpy()
        if not keep.any():
            return empty
        # index into the raw int64 array instead of pandas shift(-1):
        # shift converts int64 -> float64 and silently rounds ids above
        # 2^53. keep is False on each key's last row, so pos+1 is safe.
        ids_np = g[id_col].to_numpy()
        types_np = g[type_col].to_numpy()
        pos = np.flatnonzero(keep)
        return pd.DataFrame(
            {
                id_col: ids_np[pos],
                "next_event_id": ids_np[pos + 1],
                "next_event_type": types_np[pos + 1],
            }
        )

    return filtered.groupby(_BUCKET).map_groups(fn, batch_format="pandas")


def hourly_retention(
    ds: "rd.Dataset",
    key: str = "user_id",
    ts_col: str = "ts",
    num_buckets: int = 64,
) -> "rd.Dataset":
    """Bucket-over-bucket retention: for every hour H, how many keys
    were active in H-1 (n_prev) and how many of those were active in H
    too (n_retained) — the cohort-retention analytic, in ONE key-hash
    shuffle instead of the textbook distinct + self-join.

    The trick: each activity row emits two tagged rows — (key, its
    bucket, cur=1) and (key, bucket+1h, prev=1). One groupby over the
    key-hash bucket then collapses duplicates AND aligns each key's
    H-1/H presence in the same group (max of each tag), and a
    fixed-size (buckets) partial count tree-merges to the final table.
    Buckets with no prior-hour actives are absent (the SQL twin groups
    the prev side).

    Output: bucket timestamp[us], n_prev int64, n_retained int64.
    """
    from mimirsbrunn_ray.stages.dedup import _BUCKET, add_bucket
    from mimirsbrunn_ray.stages.rollup import tree_merge

    hour_us = 3_600_000_000

    def emit(b: pa.Table) -> pa.Table:
        b = b.filter(
            pc.and_(pc.is_valid(b[key]), pc.is_valid(b[ts_col]))
        )
        bucket = trunc_us(
            b[ts_col].cast(pa.timestamp("us")).cast(pa.int64()).to_numpy(
                zero_copy_only=False
            ),
            "1h",
        )
        k = b[key]
        two = pa.table(
            {
                key: pa.concat_arrays(
                    [k.combine_chunks(), k.combine_chunks()]
                ),
                "b": pa.array(
                    np.concatenate([bucket, bucket + hour_us])
                ),
                "cur": pa.array(
                    np.concatenate(
                        [np.ones(len(k), np.int8), np.zeros(len(k), np.int8)]
                    )
                ),
                "prev": pa.array(
                    np.concatenate(
                        [np.zeros(len(k), np.int8), np.ones(len(k), np.int8)]
                    )
                ),
            }
        )
        return add_bucket(two, key, num_buckets)

    tagged = ds.map_batches(emit, batch_format="pyarrow", batch_size=None)

    def per_bucket(group: pa.Table) -> pa.Table:
        t = group.drop_columns([_BUCKET])
        if t.num_rows == 0:
            return pa.table(
                {
                    "b": pa.array([], pa.int64()),
                    "n_prev": pa.array([], pa.int64()),
                    "n_retained": pa.array([], pa.int64()),
                }
            )
        g = t.group_by([key, "b"]).aggregate([("cur", "max"), ("prev", "max")])
        prev = g["prev_max"].to_numpy(zero_copy_only=False).astype(np.int64)
        cur = g["cur_max"].to_numpy(zero_copy_only=False).astype(np.int64)
        bb = g["b"].to_numpy(zero_copy_only=False)
        t2 = pa.table(
            {
                "b": pa.array(bb),
                "p": pa.array(prev),
                "r": pa.array(prev & cur),
            }
        )
        c = t2.group_by(["b"]).aggregate([("p", "sum"), ("r", "sum")])
        c = c.select(["b", "p_sum", "r_sum"])
        return c.rename_columns(["b", "n_prev", "n_retained"])

    partials = tagged.groupby(_BUCKET).map_groups(
        per_bucket, batch_format="pyarrow"
    )

    def combine(b: pa.Table) -> pa.Table:
        g = b.group_by(["b"]).aggregate(
            [("n_prev", "sum"), ("n_retained", "sum")]
        )
        return g.rename_columns(["b", "n_prev", "n_retained"])

    merged = tree_merge(partials, combine)

    def finish(b: pa.Table) -> pa.Table:
        b = b.filter(pc.greater(b["n_prev"], 0))
        return pa.table(
            {
                "bucket": b["b"].cast(pa.timestamp("us")),
                "n_prev": b["n_prev"].cast(pa.int64()),
                "n_retained": b["n_retained"].cast(pa.int64()),
            }
        )

    return merged.map_batches(finish, batch_format="pyarrow", batch_size=None)


def budget_prefix_select(
    ds: "rd.Dataset",
    weight_col: str,
    id_col: str,
    budget: int,
    boundary_row_budget: int = 2_000_000,
) -> "rd.Dataset":
    """Global budget selection: keep rows in ascending (weight, id) order
    while the running weight total stays within ``budget`` — the
    "shortest documents until N total tokens" curriculum/packing cut,
    WITHOUT a global sort shuffle.

    The running total only depends on the WEIGHT HISTOGRAM, so:
      1. one decomposable (weight -> sum, since the weights being summed
         ARE the histogram keys) count pass tree-merges into a table
         bounded by |weight domain|;
      2. the driver's cumulative walk finds the cutoff weight: every row
         strictly below it is IN, every row above is OUT;
      3. only the BOUNDARY weight's rows (one histogram bin) need id
         resolution: while the bin count fits ``boundary_row_budget``
         they are filtered out of the stream (bounded collect), sorted
         by id, and prefix-summed against the residual budget; an
         ADVERSARIAL bin (heavy ties — e.g. a constant weight column
         putting the whole corpus in one bin) instead resolves fully
         DISTRIBUTED: filter boundary rows -> ``Dataset.sort(id)`` ->
         ``limit(residual // boundary_w)`` — a shuffle sort of just that
         bin, zero driver pull (VERDICT r3 item 4).
    Two streaming passes, driver state = one histogram + (at most) one
    budget-sized bin.

    Ties at the boundary weight resolve by ascending id (deterministic,
    engine-independent). Null weights/ids are dropped (the SQL WHERE
    twin). Output: (id_col, weight_col) of the selected rows.
    """
    from mimirsbrunn_ray.stages.rollup import tree_merge

    def partial(b: pa.Table) -> pa.Table:
        b = b.filter(
            pc.and_(pc.is_valid(b[weight_col]), pc.is_valid(b[id_col]))
        )
        t = pa.table({"w": b[weight_col].cast(pa.int64())})
        g = t.group_by(["w"]).aggregate([([], "count_all")])
        return g.rename_columns(["w", "n"])

    def combine(b: pa.Table) -> pa.Table:
        g = b.group_by(["w"]).aggregate([("n", "sum")])
        return g.rename_columns(["w", "n"])

    parts = list(
        tree_merge(
            ds.map_batches(partial, batch_format="pyarrow", batch_size=None),
            combine,
        ).iter_batches(batch_format="pyarrow")
    )
    out_empty = ds.map_batches(
        lambda b: pa.table(
            {
                id_col: b[id_col].slice(0, 0),
                weight_col: b[weight_col].slice(0, 0),
            }
        ),
        batch_format="pyarrow",
        batch_size=None,
    )
    if not parts:
        return out_empty
    # defensive final combine (tree_merge converges to one block, but the
    # cutoff walk requires strictly unique bins)
    hist = combine(pa.concat_tables(parts))
    order = pc.sort_indices(hist["w"])
    w = hist["w"].take(order).to_numpy(zero_copy_only=False)
    n = hist["n"].take(order).to_numpy(zero_copy_only=False)
    bin_tot = w * n
    cum = np.cumsum(bin_tot)
    # full bins that fit entirely
    full = cum <= budget
    cutoff = w[full][-1] if full.any() else None
    spent = int(cum[full][-1]) if full.any() else 0
    boundary_idx = int(full.sum())
    boundary_w = int(w[boundary_idx]) if boundary_idx < len(w) else None
    residual = budget - spent

    def keep_full(b: pa.Table) -> pa.Table:
        b = b.filter(
            pc.and_(pc.is_valid(b[weight_col]), pc.is_valid(b[id_col]))
        )
        wv = b[weight_col].cast(pa.int64())
        keep = (
            pc.less_equal(wv, pa.scalar(int(cutoff), pa.int64()))
            if cutoff is not None
            else pa.array([False] * len(b))
        )
        return pa.table(
            {id_col: b[id_col], weight_col: b[weight_col]}
        ).filter(keep)

    selected = ds.map_batches(
        keep_full, batch_format="pyarrow", batch_size=None
    )
    if boundary_w is None or residual < boundary_w:
        return selected

    # boundary bin: resolve by id against the residual budget
    def boundary_rows(b: pa.Table) -> pa.Table:
        b = b.filter(
            pc.and_(pc.is_valid(b[weight_col]), pc.is_valid(b[id_col]))
        )
        keep = pc.equal(
            b[weight_col].cast(pa.int64()),
            pa.scalar(boundary_w, pa.int64()),
        )
        return pa.table(
            {id_col: b[id_col], weight_col: b[weight_col]}
        ).filter(keep)

    bnd_ds = ds.map_batches(
        boundary_rows, batch_format="pyarrow", batch_size=None
    )
    boundary_count = int(n[boundary_idx])
    if boundary_count > boundary_row_budget:
        # adversarial one-bin distribution: distributed shuffle sort of
        # the bin + streaming limit — nothing bin-sized on the driver
        take = int(min(boundary_count, residual // boundary_w))
        if take == 0:
            return selected
        picked_ds = bnd_ds.sort(id_col).limit(take)
        return selected.union(picked_ds)

    # bounded collect: exactly one budget-sized histogram bin's rows
    bnd = bnd_ds.to_pandas()
    bnd = bnd.sort_values(id_col, ignore_index=True)
    take = int(min(len(bnd), residual // boundary_w))
    if take == 0:
        return selected
    import ray.data as _rd

    picked = _rd.from_arrow(
        pa.Table.from_pandas(bnd.iloc[:take], preserve_index=False)
    )
    return selected.union(picked)


def last_touch_attribution(
    ds: "rd.Dataset",
    key: str,
    ts_col: str,
    type_col: str,
    trigger: str,
    touch: str,
    id_col: str,
) -> "rd.Dataset":
    """First-touch-style attribution: for every ``trigger`` row, the
    timestamp of the same key's most recent PRECEDING ``touch`` row —
    `MAX(CASE WHEN type=touch THEN ts END) OVER (PARTITION BY key
    ORDER BY ts, id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)`
    filtered to trigger rows.

    Scale shape: rows of other types are dropped BEFORE the shuffle (the
    stream moves only trigger+touch rows), ONE hash shuffle on the key,
    then per-group a pandas segment cummax kept in int64 end-to-end — the
    int64 sentinel (never float NaN) avoids the float64 precision trap on
    microsecond timestamps. Null key/ts rows are dropped (SQL window
    semantics). Output: id_col, key, ts timestamp[us],
    last_touch_ts timestamp[us] (null when no touch precedes).
    """
    imin = np.iinfo(np.int64).min

    def prune(b: pa.Table) -> pa.Table:
        keep = pc.and_(
            pc.and_(pc.is_valid(b[key]), pc.is_valid(b[ts_col])),
            pc.is_in(
                b[type_col], value_set=pa.array([trigger, touch], pa.string())
            ),
        )
        b = b.filter(keep)
        return pa.table(
            {
                id_col: b[id_col],
                key: b[key],
                "ts": b[ts_col].cast(pa.timestamp("us")),
                "is_touch": pc.equal(b[type_col], touch),
                "is_trigger": pc.equal(b[type_col], trigger),
            }
        )

    pruned = ds.map_batches(prune, batch_format="pyarrow", batch_size=None)

    def per_key(g: pd.DataFrame) -> pd.DataFrame:
        out_cols = {
            id_col: pd.Series([], dtype="int64"),
            key: pd.Series([], dtype="int64"),
            "ts": pd.Series([], dtype="datetime64[us]"),
            "last_touch_ts": pd.Series([], dtype="datetime64[us]"),
        }
        if len(g) == 0:
            return pd.DataFrame(out_cols)
        g = g.sort_values([key, "ts", id_col], kind="mergesort")
        ts_int = g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        touch_ts = np.where(g["is_touch"].to_numpy(), ts_int, imin)
        # segment cummax in int64 (groupby preserves order, stays int64)
        cm = (
            pd.Series(touch_ts)
            .groupby(g[key].to_numpy(), sort=False)
            .cummax()
            .to_numpy()
        )
        prev = np.empty(len(cm), np.int64)
        prev[0] = imin
        prev[1:] = cm[:-1]
        new_seg = np.ones(len(g), bool)
        kv = g[key].to_numpy()
        new_seg[1:] = kv[1:] != kv[:-1]
        prev[new_seg] = imin  # frame is empty at each key's first row
        trig = g["is_trigger"].to_numpy()
        last = prev[trig]
        return pd.DataFrame(
            {
                id_col: g[id_col].to_numpy()[trig],
                key: kv[trig],
                "ts": g["ts"].to_numpy()[trig],
                "last_touch_ts": pd.Series(
                    np.where(last == imin, np.datetime64("NaT", "us"),
                             last.view("datetime64[us]")),
                    dtype="datetime64[us]",
                ),
            }
        )

    # coarse key buckets (per_key segments by the real key internally):
    # user-grade keys are high-cardinality, one pandas group per key would
    # be the tiny-groups anti-pattern
    from mimirsbrunn_ray.stages.dedup import _BUCKET, add_bucket

    bucketed = pruned.map_batches(
        lambda b: add_bucket(b, key, 64), batch_format="pyarrow",
        batch_size=None,
    )
    out = bucketed.groupby(_BUCKET).map_groups(
        lambda g: per_key(g.drop(columns=[_BUCKET])), batch_format="pandas"
    )
    return out.map_batches(
        lambda b: pa.table(
            {
                id_col: b[id_col],
                key: b[key],
                "ts": b["ts"].cast(pa.timestamp("us")),
                "last_touch_ts": b["last_touch_ts"].cast(pa.timestamp("us")),
            }
        ),
        batch_format="pyarrow",
        batch_size=None,
    )


def rolling_bucket_median(
    ds: "rd.Dataset",
    key: str,
    ts_col: str,
    value_col: str,
    bucket: str = "1m",
    window_buckets: int = 5,
    scale: float = 1e6,
) -> "rd.Dataset":
    """Rolling MEDIAN over a trailing bucket-grain RANGE frame — the
    holistic-aggregate sibling of ``rolling_bucket_agg`` (sums decompose
    into bucket partials; a median needs the raw values, so each row is
    replicated into the <= ``window_buckets`` anchor buckets whose
    trailing window contains it — the hopping-window cost, explicit and
    bounded by the window size).

    Anchors that have NO own-bucket row are dropped (matching
    `median(...) OVER (ORDER BY bucket RANGE ...)` evaluated at existing
    buckets only): replication tags the offset-0 copy and a window
    without one never surfaces.

    Shape: ONE hash shuffle on (key, anchor-bucket); per group a single
    sort + segment-offset median, vectorized across all segments of the
    block. Output: key, bucket timestamp[us], roll_n int64,
    roll_median_x{scale} int64 (DuckDB-convention even-count median =
    mean of the two middle elements, snapped fixed-point).
    """
    width = BUCKET_US[bucket]

    def replicate(b: pa.Table) -> pa.Table:
        b = b.filter(
            pc.and_(
                pc.and_(pc.is_valid(b[key]), pc.is_valid(b[ts_col])),
                pc.is_valid(b[value_col]),
            )
        )
        n = b.num_rows
        ts_us = (
            b[ts_col].cast(pa.timestamp("us")).to_numpy(zero_copy_only=False)
            .astype("datetime64[us]").astype(np.int64)
        )
        own = (ts_us // width) * width
        keys = b[key].to_numpy(zero_copy_only=False)
        vals = b[value_col].cast(pa.float64()).to_numpy(zero_copy_only=False)
        anchor = np.concatenate(
            [own + j * width for j in range(window_buckets)]
        )
        keys_r = np.tile(keys, window_buckets)
        vals_r = np.tile(vals, window_buckets)
        offset0 = np.concatenate(
            [np.full(n, j == 0, bool) for j in range(window_buckets)]
        )
        return pa.table(
            {
                key: pa.array(keys_r),
                "anchor": pa.array(anchor),
                "v": pa.array(vals_r),
                "own": pa.array(offset0),
            }
        )

    rep = ds.map_batches(replicate, batch_format="pyarrow", batch_size=None)

    # coarse composite-hash bucketing: one group per (key, anchor) pair
    # would be the tiny-groups anti-pattern (keys x buckets pandas groups);
    # 64 coarse buckets keep each map_groups body a big vectorized block
    def bucketize(b: pa.Table) -> pa.Table:
        from mimirsbrunn_ray.stages.dedup import _hash64

        h = _hash64(b[key]).view(np.int64) ^ b["anchor"].to_numpy(
            zero_copy_only=False
        )
        return b.append_column(
            "_b", pa.array((h % 64).astype(np.int32))
        )

    rep = rep.map_batches(bucketize, batch_format="pyarrow", batch_size=None)

    def per_group(g: pd.DataFrame) -> pd.DataFrame:
        out_empty = pd.DataFrame(
            {
                key: pd.Series([], dtype="str"),
                "bucket": pd.Series([], dtype="datetime64[us]"),
                "roll_n": pd.Series([], dtype="int64"),
                "roll_median_snapped": pd.Series([], dtype="int64"),
            }
        )
        if len(g) == 0:
            return out_empty
        g = g.sort_values([key, "anchor", "v"], kind="mergesort")
        kv = g[key].to_numpy()
        an = g["anchor"].to_numpy()
        new_seg = np.ones(len(g), bool)
        new_seg[1:] = (kv[1:] != kv[:-1]) | (an[1:] != an[:-1])
        starts = np.flatnonzero(new_seg)
        sizes = np.diff(np.append(starts, len(g)))
        # anchors lacking an own-bucket row are phantom windows: drop
        has_own = np.logical_or.reduceat(g["own"].to_numpy(), starts)
        v = g["v"].to_numpy()
        lo_idx = starts + (sizes - 1) // 2
        hi_idx = starts + sizes // 2
        med = (v[lo_idx] + v[hi_idx]) / 2.0  # segments sorted by v
        snapped = _round_half_away(med * scale)
        keep = has_own
        return pd.DataFrame(
            {
                key: kv[starts][keep],
                "bucket": an[starts][keep].view("datetime64[us]"),
                "roll_n": sizes[keep].astype(np.int64),
                "roll_median_snapped": snapped[keep],
            }
        )

    out = rep.groupby("_b").map_groups(
        lambda g: per_group(g.drop(columns=["_b"])), batch_format="pandas"
    )
    return out.map_batches(
        lambda b: b.set_column(
            b.schema.get_field_index("bucket"),
            "bucket",
            b["bucket"].cast(pa.timestamp("us")),
        ),
        batch_format="pyarrow",
        batch_size=None,
    )


def pareto_front_2d(
    ds: "rd.Dataset",
    minimize_col: str,
    maximize_col: str,
    id_col: str,
) -> "rd.Dataset":
    """2-D skyline (Pareto front): rows not dominated by any other row,
    where q dominates p iff q is <= p on ``minimize_col`` AND >= p on
    ``maximize_col`` with at least one strict inequality. Ties on BOTH
    axes are mutually non-dominating — every tied row stays.

    Classic distributed shape: a LOCAL skyline per block (the global
    skyline is a subset of every block's local skyline, so local pruning
    is lossless), then the same vectorized rule once over the union of
    the tiny local fronts. Per block it is one sort + two segment scans
    (O(n log n), no pairwise matrix): after sorting by (min asc,
    max desc), a row survives iff it carries its minimize-group's max
    AND that max strictly exceeds the running max over all strictly
    smaller minimize values.

    For 100-TB inputs the union stage stays bounded because each block
    contributes only its front (expected O(log n) rows for independent
    axes); a pathological anti-correlated distribution — where the true
    skyline IS corpus-sized — is output-bounded, not an engine flaw.
    """

    def local_front(b: pa.Table) -> pa.Table:
        b = b.filter(
            pc.and_(pc.is_valid(b[minimize_col]), pc.is_valid(b[maximize_col]))
        )
        if b.num_rows == 0:
            return b
        g = b.select([id_col, minimize_col, maximize_col]).to_pandas()
        g = g.sort_values(
            [minimize_col, maximize_col, id_col],
            ascending=[True, False, True],
            kind="mergesort",
        )
        mn = g[minimize_col].to_numpy()
        mx = g[maximize_col].to_numpy()
        # first row of each minimize-group holds the group max (sort order)
        starts = np.empty(len(g), dtype=bool)
        starts[0] = True
        starts[1:] = mn[1:] != mn[:-1]
        seg = np.cumsum(starts) - 1
        gmax = mx[starts][seg]  # per-row: max of its own group (sort order)
        in_group_max = mx == gmax
        firsts = mx[starts]  # per group (ordered by minimize asc)
        run_before = np.concatenate(([-np.inf], np.maximum.accumulate(firsts)[:-1]))
        keep = in_group_max & (gmax > run_before[seg])
        return pa.Table.from_pandas(g[keep], preserve_index=False)

    local = ds.map_batches(local_front, batch_format="pyarrow", batch_size=None)
    # union of local fronts is small: one partition, same rule, globally exact
    return local.repartition(1).map_batches(
        local_front, batch_format="pyarrow", batch_size=None
    )
