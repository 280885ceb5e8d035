"""Counter / bar / window analytics over irregular event series.

The reference engine's import pipeline rolls raw points into retention
tiers (count/sum/min/max — `stages/rollup.py`); this module adds the
*ordered* time-series reductions a metrics store layers on top of those
tiers: monotonic-counter increase with reset detection (the PromQL
``increase()`` semantic), OHLC candlestick bars (deterministic open/close
via (ts, id) tie-break), trailing exponential moving averages, and
sliding-window distinct counts.

Scale shape shared by every operator here (same discipline as
stages/ordered.py): ONE coarse hash-bucket shuffle on the series key so
each series lands wholly in one group, then one vectorized mergesort +
shift/segment-reduce per bucket — never per-key Python groups, never a
global sort. Outputs are per-(key, bucket) aggregates, so result
cardinality is bounded by key-cardinality × time-range regardless of
input row count.

Float discipline: anything summed is quantized per-term to int64 fixed
point BEFORE the sum (integer addition is associative — the distributed
sum is bit-equal to any oracle's), and anything divided is divided once,
from identical operands on both sides.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

try:  # absent only in stripped-down test harnesses
    import ray.data as rd
except ImportError:  # pragma: no cover
    rd = None

from mimirsbrunn_ray.stages.dedup import _BUCKET, add_bucket


def _round_half_away_x(x: np.ndarray, scale: float) -> np.ndarray:
    """DuckDB ROUND(x*scale, 0) — half away from zero, as int64."""
    s = x * scale
    return np.where(s >= 0, np.floor(s + 0.5), np.ceil(s - 0.5)).astype(np.int64)


def counter_increase(
    ds: "rd.Dataset",
    key: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
    freq: str = "h",
    num_buckets: int = 64,
) -> "rd.Dataset":
    """PromQL-style ``increase()`` with counter-reset detection, bucketed
    to ``freq``: per series (``key``), order samples by (ts, id); each
    sample after the first contributes ``delta = v_i - v_{i-1}`` when the
    counter moved forward, else (a reset: the counter restarted from ~0)
    ``v_i`` itself. Contributions are credited to the bucket of the
    LATER sample and quantized to x100 fixed point per term, so the
    per-(key, bucket) sums are exact integers.

    Graft note: the reference rolls import counters into per-run totals
    (/root/reference/libs/mimir/src/rubber.rs bulk ok/err counters); a
    metrics store over those counters needs exactly this reset-aware
    rate. One bucket shuffle; resets never cross the shuffle because a
    series lives wholly inside its hash bucket.

    Output: key, bucket (timestamp), increase_x100 int64, n_samples int64.
    """
    proj = ds.map_batches(
        lambda b: add_bucket(
            b.filter(
                pc.and_(
                    pc.and_(pc.is_valid(b[key]), pc.is_valid(b[ts_col])),
                    pc.is_valid(b[value_col]),
                )
            ).select([key, ts_col, id_col, value_col]),
            key,
            num_buckets,
        ),
        batch_format="pyarrow",
        batch_size=None,
    )

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                key: pd.Series([], dtype=np.int64),
                "bucket": pd.Series([], dtype="datetime64[us]"),
                "increase_x100": pd.Series([], dtype=np.int64),
                "n_samples": pd.Series([], dtype=np.int64),
            }
        )
        if len(g) == 0:
            return empty
        g = g.sort_values([key, ts_col, id_col], kind="mergesort")
        k = g[key].to_numpy()
        v = g[value_col].to_numpy(dtype=np.float64)
        same = np.empty(len(g), dtype=bool)
        same[0] = False
        same[1:] = k[1:] == k[:-1]  # row i continues row i-1's series
        delta = np.empty_like(v)
        delta[0] = 0.0
        delta[1:] = v[1:] - v[:-1]
        contrib = np.where(delta >= 0, delta, v)  # reset -> restart from v_i
        contrib_x100 = _round_half_away_x(contrib, 100.0)
        out = pd.DataFrame(
            {
                key: k[same],
                "bucket": g[ts_col].dt.floor(freq).to_numpy()[same],
                "inc": contrib_x100[same],
            }
        )
        if len(out) == 0:
            return empty
        agg = (
            out.groupby([key, "bucket"], sort=False, as_index=False)
            .agg(increase_x100=("inc", "sum"), n_samples=("inc", "size"))
        )
        agg["increase_x100"] = agg["increase_x100"].astype(np.int64)
        agg["n_samples"] = agg["n_samples"].astype(np.int64)
        return agg

    return proj.groupby(_BUCKET).map_groups(per_bucket, batch_format="pandas")


def ohlc_bars(
    ds: "rd.Dataset",
    key: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
    freq: str = "h",
) -> "rd.Dataset":
    """OHLC candlestick bars per (key, freq-bucket): open/close are the
    values at the (ts, id)-min/max sample — deterministic under ties and
    any partitioning — high/low are min/max, volume is the x100
    fixed-point sum of values, n the sample count.

    Decomposable: map_batches emits one partial bar per (key, bucket)
    per batch (argmin/argmax carried WITH their ordering keys), then a
    single groupby combines partials with the same argmin/argmax merge —
    the same partial/combine shape as stages/rollup.py's tier aggregate,
    so no sort shuffle and no full-series group ever materializes.

    Output: key, bucket, open, high, low, close, volume_x100, n_samples.
    """

    def partial(b: pa.Table) -> pa.Table:
        b = b.filter(
            pc.and_(
                pc.and_(pc.is_valid(b[key]), pc.is_valid(b[ts_col])),
                pc.is_valid(b[value_col]),
            )
        )
        g = pd.DataFrame(
            {
                key: b[key].to_pandas(),
                "bucket": b[ts_col].to_pandas().dt.floor(freq),
                "_ts": b[ts_col].to_pandas(),
                "_id": b[id_col].to_pandas(),
                "val": b[value_col].to_numpy(zero_copy_only=False),
            }
        )
        if len(g) == 0:
            return pa.table(
                {
                    key: pa.array([], type=b.schema.field(key).type),
                    "bucket": pa.array([], type=pa.timestamp("us")),
                    "o_ts": pa.array([], type=pa.timestamp("us")),
                    "o_id": pa.array([], type=pa.int64()),
                    "open": pa.array([], type=pa.float64()),
                    "c_ts": pa.array([], type=pa.timestamp("us")),
                    "c_id": pa.array([], type=pa.int64()),
                    "close": pa.array([], type=pa.float64()),
                    "high": pa.array([], type=pa.float64()),
                    "low": pa.array([], type=pa.float64()),
                    "volume_x100": pa.array([], type=pa.int64()),
                    "n_samples": pa.array([], type=pa.int64()),
                }
            )
        g["vx100"] = _round_half_away_x(g["val"].to_numpy(dtype=np.float64), 100.0)
        # one mergesort by (key, bucket, ts, id): first/last row per group
        # ARE the argmin/argmax by (ts, id)
        g = g.sort_values([key, "bucket", "_ts", "_id"], kind="mergesort")
        gb = g.groupby([key, "bucket"], sort=False, as_index=False)
        out = gb.agg(
            o_ts=("_ts", "first"),
            o_id=("_id", "first"),
            open=("val", "first"),
            c_ts=("_ts", "last"),
            c_id=("_id", "last"),
            close=("val", "last"),
            high=("val", "max"),
            low=("val", "min"),
            volume_x100=("vx100", "sum"),
            n_samples=("val", "size"),
        )
        out["volume_x100"] = out["volume_x100"].astype(np.int64)
        out["n_samples"] = out["n_samples"].astype(np.int64)
        return pa.Table.from_pandas(out, preserve_index=False)

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["o_ts", "o_id"], kind="mergesort")
        first = g.iloc[0]
        lastpos = g[["c_ts", "c_id"]].sort_values(["c_ts", "c_id"], kind="mergesort").index[-1]
        last = g.loc[lastpos]
        return pd.DataFrame(
            {
                key: [first[key]],
                "bucket": [first["bucket"]],
                "open": [first["open"]],
                "high": [g["high"].max()],
                "low": [g["low"].min()],
                "close": [last["close"]],
                "volume_x100": np.array([g["volume_x100"].sum()], dtype=np.int64),
                "n_samples": np.array([g["n_samples"].sum()], dtype=np.int64),
            }
        )

    partials = ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
    return partials.groupby([key, "bucket"]).map_groups(combine, batch_format="pandas")


def trailing_ewma(
    ds: "rd.Dataset",
    key: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
    window: int = 32,
    num_buckets: int = 16,
) -> "rd.Dataset":
    """Trailing exponential moving average (alpha = 1/2) over each
    series' last ``window`` samples in (ts, id) order — EXACT integer
    arithmetic end to end: values are quantized to x100 once, weights are
    powers of two (2^j is exact, and with window<=32 and x100 values the
    weighted sum stays far below 2^63), so the num/den integers are
    order-independent and the single final division is performed from
    identical operands by any conforming engine.

    ewma = sum_j(v100_j * 2^j) / sum_j(2^j),  j = window-1 (newest) .. 0.

    Output: key, n_used int64, ewma_num int64, ewma_den int64,
    ewma_x100 double (= num/den).
    """
    proj = ds.map_batches(
        lambda b: add_bucket(
            b.filter(
                pc.and_(
                    pc.and_(pc.is_valid(b[key]), pc.is_valid(b[ts_col])),
                    pc.is_valid(b[value_col]),
                )
            ).select([key, ts_col, id_col, value_col]),
            key,
            num_buckets,
        ),
        batch_format="pyarrow",
        batch_size=None,
    )

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                key: pd.Series([], dtype=object),
                "n_used": pd.Series([], dtype=np.int64),
                "ewma_num": pd.Series([], dtype=np.int64),
                "ewma_den": pd.Series([], dtype=np.int64),
                "ewma_x100": pd.Series([], dtype=np.float64),
            }
        )
        if len(g) == 0:
            return empty
        # newest-first within each key, keep the first `window` rows
        g = g.sort_values([key, ts_col, id_col], ascending=[True, False, False], kind="mergesort")
        tail = g.groupby(key, sort=False).head(window).copy()
        rank = tail.groupby(key, sort=False).cumcount()  # 0 = newest
        v100 = _round_half_away_x(tail[value_col].to_numpy(dtype=np.float64), 100.0)
        w = np.int64(1) << (window - 1 - rank.to_numpy())
        tail["num"] = v100 * w
        tail["den"] = w
        out = tail.groupby(key, sort=False, as_index=False).agg(
            n_used=("den", "size"), ewma_num=("num", "sum"), ewma_den=("den", "sum")
        )
        out["n_used"] = out["n_used"].astype(np.int64)
        out["ewma_x100"] = out["ewma_num"].to_numpy(dtype=np.float64) / out[
            "ewma_den"
        ].to_numpy(dtype=np.float64)
        return out

    return proj.groupby(_BUCKET).map_groups(per_bucket, batch_format="pandas")


def sliding_distinct(
    ds: "rd.Dataset",
    entity: str = "user_id",
    ts_col: str = "ts",
    freq: str = "h",
    window_buckets: int = 2,
) -> "rd.Dataset":
    """Distinct-``entity`` count in a trailing window of
    ``window_buckets`` freq-buckets, evaluated at every window label an
    entity could contribute to: label ``w`` counts entities seen in
    buckets (w - window_buckets, w]. Exact, via bucket-level fan-out:
    each event's (entity, bucket) is replicated — vectorized, inside
    map_batches, AFTER a batch-local pair-distinct so the fan-out
    multiplies per-block distinct pairs, not raw rows — to its
    window_buckets window labels, and exact_distinct_per_group
    (stages/dedup.py: combiner-first, one value-hash shuffle, additive
    partials) finishes the COUNT(DISTINCT) per label.

    Output: win (timestamp), n_entities int64.
    """
    from mimirsbrunn_ray.stages.dedup import exact_distinct_per_group

    step = pd.Timedelta(1, unit=freq).value // 1000  # us per bucket

    def fanout(b: pa.Table) -> pa.Table:
        b = b.filter(pc.and_(pc.is_valid(b[entity]), pc.is_valid(b[ts_col])))
        bkt = pd.DatetimeIndex(b[ts_col].to_pandas()).floor(freq)
        t = pd.DataFrame(
            {entity: b[entity].to_numpy(zero_copy_only=False), "bkt": bkt}
        ).drop_duplicates()  # batch-local combiner before replication
        n = len(t)
        off = np.tile(np.arange(window_buckets, dtype=np.int64), n) * step
        win = np.repeat(t["bkt"].to_numpy().astype("datetime64[us]").astype(np.int64), window_buckets) + off
        return pa.table(
            {
                entity: pa.array(np.repeat(t[entity].to_numpy(), window_buckets)),
                "win": pa.array(win.astype("datetime64[us]")),
            }
        )

    labeled = ds.map_batches(fanout, batch_format="pyarrow", batch_size=None)
    return exact_distinct_per_group(
        labeled, group_col=["win"], distinct_col=entity, out_col="n_entities"
    )


def day_over_day(
    ds: "rd.Dataset",
    key: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
) -> "rd.Dataset":
    """Day-over-day delta of per-(key, day) x100 fixed-point value sums.

    Stage 1 is a combiner-first partial aggregate inside map_batches
    (input rows collapse to key x day partials before any shuffle);
    stage 2 groups BY KEY — each group is one key's daily series, a few
    hundred rows at most regardless of input size — sorts it, and shifts.
    The LAG never crosses groups, so no boundary carry is needed.

    Output: key, day, total_x100, prev_x100, delta_x100 (int64; rows
    with no previous day are dropped, SQL-LAG-INNER semantics).
    """

    def partial(b: pa.Table) -> pa.Table:
        b = b.filter(
            pc.and_(
                pc.and_(pc.is_valid(b[key]), pc.is_valid(b[ts_col])),
                pc.is_valid(b[value_col]),
            )
        )
        t = pd.DataFrame(
            {
                key: b[key].to_pandas(),
                "day": b[ts_col].to_pandas().dt.floor("D"),
                "vx100": _round_half_away_x(
                    b[value_col].to_numpy(zero_copy_only=False).astype(np.float64), 100.0
                ),
            }
        )
        out = t.groupby([key, "day"], sort=False, as_index=False)["vx100"].sum()
        out["vx100"] = out["vx100"].astype(np.int64)
        return pa.Table.from_pandas(out, preserve_index=False)

    def per_key(g: pd.DataFrame) -> pd.DataFrame:
        tot = g.groupby("day", as_index=False)["vx100"].sum().sort_values("day")
        tot["total_x100"] = tot["vx100"].astype(np.int64)
        tot["prev_x100"] = tot["total_x100"].shift(1)
        tot = tot.dropna(subset=["prev_x100"])
        if len(tot) == 0:
            return pd.DataFrame(
                {
                    key: pd.Series([], dtype=object),
                    "day": pd.Series([], dtype="datetime64[us]"),
                    "total_x100": pd.Series([], dtype=np.int64),
                    "prev_x100": pd.Series([], dtype=np.int64),
                    "delta_x100": pd.Series([], dtype=np.int64),
                }
            )
        tot[key] = g.iloc[0][key]
        tot["prev_x100"] = tot["prev_x100"].astype(np.int64)
        tot["delta_x100"] = (tot["total_x100"] - tot["prev_x100"]).astype(np.int64)
        return tot[[key, "day", "total_x100", "prev_x100", "delta_x100"]]

    return (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby(key)
        .map_groups(per_key, batch_format="pandas")
    )


def session_durations(
    ds: "rd.Dataset",
    key: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: int = 30,
    num_buckets: int = 64,
) -> "rd.Dataset":
    """Gap-delimited session SPANS per key: (key, session_id, dur_us).

    Same shape as stages/window.sessionize (one coarse key-bucket
    shuffle, vectorized sort + diff per bucket) but emits one row per
    SESSION with its wall-clock duration instead of per-key counts, so
    downstream distribution operators (exact quantiles, histograms) can
    consume sessions as a stream. Single-event sessions have dur_us = 0.
    """
    gap_us = np.int64(gap_minutes) * 60_000_000

    proj = ds.map_batches(
        lambda b: add_bucket(
            b.filter(pc.and_(pc.is_valid(b[key]), pc.is_valid(b[ts_col]))).select(
                [key, ts_col]
            ),
            key,
            num_buckets,
        ),
        batch_format="pyarrow",
        batch_size=None,
    )

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame(
                {
                    key: pd.Series([], dtype=np.int64),
                    "session_id": pd.Series([], dtype=np.int64),
                    "dur_us": pd.Series([], dtype=np.int64),
                }
            )
        g = g.sort_values([key, ts_col], kind="mergesort")
        k = g[key].to_numpy()
        t = g[ts_col].to_numpy().astype("datetime64[us]").astype(np.int64)
        new_s = np.empty(len(g), dtype=bool)
        new_s[0] = True
        new_s[1:] = (k[1:] != k[:-1]) | ((t[1:] - t[:-1]) > gap_us)
        sid = np.cumsum(new_s)  # bucket-local session ids, 1-based
        # segment min = value at session start; segment max via reduceat
        starts = np.flatnonzero(new_s)
        first_ts = t[starts]
        last_ts = np.maximum.reduceat(t, starts)  # sorted -> just t at ends
        return pd.DataFrame(
            {
                key: k[starts],
                "session_id": sid[starts].astype(np.int64),
                "dur_us": (last_ts - first_ts).astype(np.int64),
            }
        )

    return proj.groupby(_BUCKET).map_groups(per_bucket, batch_format="pandas")


def bollinger_bands(
    ds: "rd.Dataset",
    key: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
    freq: str = "h",
    window_buckets: int = 4,
    k_sigma: float = 2.0,
) -> "rd.Dataset":
    """Bollinger bands at bucket grain: for each (key, bucket), the
    mean and population std-dev of x100-quantized values over the
    trailing ``window_buckets`` buckets (RANGE frame — absent buckets
    advance the window), plus mean +/- k_sigma * std.

    Cross-engine exactness WITHOUT rounding snaps: the window state is
    three int64 sums (n, sum(v100), sum(v100^2)) — order-free integer
    addition — and every float output is derived from those integers by
    the SAME IEEE expression tree the SQL oracle uses (one division, one
    fused (n*Sxx - Sx*Sx)/n^2, one sqrt — each correctly rounded, so
    identical operands give identical bits on any engine).

    Shape: bucket-grain integer partials inside map_batches (input rows
    collapse to key x bucket rows before anything wide), tree-merged,
    then one shuffle on the key; per key one sort + at most
    window_buckets vectorized shifted adds (same discipline as
    stages/ordered.rolling_bucket_agg).

    Output: key, bucket, roll_n int64, mean_x100, std_x100, upper_x100,
    lower_x100 (float64).
    """
    from mimirsbrunn_ray.stages.rollup import tree_merge

    step_us = np.int64(pd.Timedelta(1, unit=freq).value // 1000)
    span_us = window_buckets * step_us

    def partial(b: pa.Table) -> pa.Table:
        b = b.filter(
            pc.and_(
                pc.and_(pc.is_valid(b[key]), pc.is_valid(b[ts_col])),
                pc.is_valid(b[value_col]),
            )
        )
        v100 = _round_half_away_x(
            b[value_col].to_numpy(zero_copy_only=False).astype(np.float64), 100.0
        )
        t = pd.DataFrame(
            {
                key: b[key].to_pandas(),
                "bucket": pd.DatetimeIndex(b[ts_col].to_pandas()).floor(freq),
                "sx": v100,
                "sxx": v100 * v100,
            }
        )
        g = t.groupby([key, "bucket"], sort=False, as_index=False).agg(
            n=("sx", "size"), sx=("sx", "sum"), sxx=("sxx", "sum")
        )
        for c in ("n", "sx", "sxx"):
            g[c] = g[c].astype(np.int64)
        return pa.Table.from_pandas(g, preserve_index=False)

    def combine(b: pa.Table) -> pa.Table:
        g = b.group_by([key, "bucket"]).aggregate(
            [("n", "sum"), ("sx", "sum"), ("sxx", "sum")]
        )
        return g.rename_columns([key, "bucket", "n", "sx", "sxx"])

    grain = tree_merge(
        ds.map_batches(partial, batch_format="pyarrow", batch_size=None),
        combine,
        final_shards=4,
        shard_cols=[key],
    )

    def per_key(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame(
                {
                    key: pd.Series([], dtype=object),
                    "bucket": pd.Series([], dtype="datetime64[us]"),
                    "roll_n": pd.Series([], dtype=np.int64),
                    "mean_x100": pd.Series([], dtype=np.float64),
                    "std_x100": pd.Series([], dtype=np.float64),
                    "upper_x100": pd.Series([], dtype=np.float64),
                    "lower_x100": pd.Series([], dtype=np.float64),
                }
            )
        g = g.sort_values([key, "bucket"], kind="mergesort")
        bu = g["bucket"].to_numpy().astype("datetime64[us]").astype(np.int64)
        same_key = g[key].eq(g[key].shift()).to_numpy()
        n = g["n"].to_numpy(dtype=np.int64)
        sx = g["sx"].to_numpy(dtype=np.int64)
        sxx = g["sxx"].to_numpy(dtype=np.int64)
        roll_n, roll_sx, roll_sxx = n.copy(), sx.copy(), sxx.copy()
        for j in range(1, window_buckets):
            in_win = np.zeros(len(bu), dtype=bool)
            if len(bu) > j:
                contiguous = same_key[j:].copy()
                for jj in range(1, j):
                    contiguous &= same_key[j - jj:-jj]
                in_win[j:] = contiguous & ((bu[j:] - bu[:-j]) < span_us)
            src = np.flatnonzero(in_win) - j
            roll_n[in_win] += n[src]
            roll_sx[in_win] += sx[src]
            roll_sxx[in_win] += sxx[src]
        nf = roll_n.astype(np.float64)
        sxf = roll_sx.astype(np.float64)
        sxxf = roll_sxx.astype(np.float64)
        mean = sxf / nf
        var = (nf * sxxf - sxf * sxf) / (nf * nf)
        std = np.sqrt(np.maximum(var, 0.0))
        return pd.DataFrame(
            {
                key: g[key],
                "bucket": g["bucket"],
                "roll_n": roll_n,
                "mean_x100": mean,
                "std_x100": std,
                "upper_x100": mean + k_sigma * std,
                "lower_x100": mean - k_sigma * std,
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


def lttb_downsample(
    ds: "rd.Dataset",
    key: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
    freq: str = "h",
    target_points: int = 50,
) -> "rd.Dataset":
    """Largest-Triangle-Three-Buckets downsampling per series — the
    standard visualization-grade reducer (Steinarsson 2013): keep first
    and last points, split the interior into target_points-2 frames, and
    from each frame keep the point maximizing the triangle area with the
    previously kept point and the next frame's centroid.

    Runs over BUCKET GRAIN, not raw rows: a combiner-first (key, bucket)
    mean pre-aggregation (x100 integer sums, exact) bounds the per-key
    series at time-range/freq points regardless of input size, then one
    vectorized LTTB pass per key group. The selected points are actual
    (bucket, mean) elements of the pre-aggregated series.

    Output: key, bucket, mean_x100 (double), selected by LTTB in bucket
    order; series with <= target_points buckets pass through whole.
    """
    from mimirsbrunn_ray.stages.rollup import tree_merge

    def partial(b: pa.Table) -> pa.Table:
        b = b.filter(
            pc.and_(
                pc.and_(pc.is_valid(b[key]), pc.is_valid(b[ts_col])),
                pc.is_valid(b[value_col]),
            )
        )
        v100 = _round_half_away_x(
            b[value_col].to_numpy(zero_copy_only=False).astype(np.float64), 100.0
        )
        t = pd.DataFrame(
            {
                key: b[key].to_pandas(),
                "bucket": pd.DatetimeIndex(b[ts_col].to_pandas()).floor(freq),
                "sx": v100,
            }
        )
        g = t.groupby([key, "bucket"], sort=False, as_index=False).agg(
            n=("sx", "size"), sx=("sx", "sum")
        )
        g["n"] = g["n"].astype(np.int64)
        g["sx"] = g["sx"].astype(np.int64)
        return pa.Table.from_pandas(g, preserve_index=False)

    grain = tree_merge(
        ds.map_batches(partial, batch_format="pyarrow", batch_size=None),
        lambda b: b.group_by([key, "bucket"])
        .aggregate([("n", "sum"), ("sx", "sum")])
        .rename_columns([key, "bucket", "n", "sx"]),
        final_shards=4,
        shard_cols=[key],
    )

    def per_key(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                key: pd.Series([], dtype=object),
                "bucket": pd.Series([], dtype="datetime64[us]"),
                "mean_x100": pd.Series([], dtype=np.float64),
            }
        )
        if len(g) == 0:
            return empty
        g = g.sort_values("bucket", kind="mergesort", ignore_index=True)
        x = g["bucket"].to_numpy().astype("datetime64[us]").astype(np.int64).astype(np.float64)
        y = g["sx"].to_numpy(dtype=np.float64) / g["n"].to_numpy(dtype=np.float64)
        n = len(g)
        m = target_points
        if n <= m:
            keep = np.arange(n)
        else:
            # frame boundaries over the interior points 1..n-2
            bounds = np.linspace(1, n - 1, m - 1).astype(np.int64)
            keep_list = [0]
            a = 0  # index of previously kept point
            for fi in range(m - 2):
                lo, hi = bounds[fi], bounds[fi + 1]
                nlo, nhi = hi, (bounds[fi + 2] if fi + 2 < len(bounds) else n)
                cx, cy = x[nlo:nhi].mean(), y[nlo:nhi].mean()
                seg_x, seg_y = x[lo:hi], y[lo:hi]
                area = np.abs(
                    (x[a] - cx) * (seg_y - y[a]) - (x[a] - seg_x) * (cy - y[a])
                )
                a = lo + int(np.argmax(area))
                keep_list.append(a)
            keep_list.append(n - 1)
            keep = np.array(keep_list)
        return pd.DataFrame(
            {
                key: g[key].to_numpy()[keep],
                "bucket": g["bucket"].to_numpy()[keep],
                "mean_x100": y[keep],
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


def _project_series(
    ds: "rd.Dataset",
    key: str,
    ts_col: str,
    id_col: str,
    value_col: str,
    num_buckets: int,
) -> "rd.Dataset":
    """Null-filtered (key, ts, id, value) projection + series hash bucket —
    the shared front half of every ordered-series reduction here."""
    return ds.map_batches(
        lambda b: add_bucket(
            b.filter(
                pc.and_(
                    pc.and_(pc.is_valid(b[key]), pc.is_valid(b[ts_col])),
                    pc.is_valid(b[value_col]),
                )
            ).select([key, ts_col, id_col, value_col]),
            key,
            num_buckets,
        ),
        batch_format="pyarrow",
        batch_size=None,
    )


def _series_segments(g: pd.DataFrame, key: str, ts_col: str, id_col: str):
    """Sort one hash-bucket group by (key, ts, id) and return the sorted
    frame plus the boolean mask of rows that CONTINUE their predecessor's
    series (row i-1 has the same key)."""
    g = g.sort_values([key, ts_col, id_col], kind="mergesort", ignore_index=True)
    k = g[key].to_numpy()
    same = np.empty(len(g), dtype=bool)
    if len(g):
        same[0] = False
        same[1:] = k[1:] == k[:-1]
    return g, same


def time_weighted_avg(
    ds: "rd.Dataset",
    key: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
    num_buckets: int = 64,
) -> "rd.Dataset":
    """LOCF time-weighted average per series over its observed span — the
    TSDB ``time_weight('locf')`` primitive: each sample holds its value
    until the next sample, so segment i contributes ``value_i * dt_us``.

    Exactness: the numerator is SUM(value_i_x100 * dt_us) with both
    factors int64 (value quantized per-term, dt exact microseconds), so
    the distributed sum is bit-equal to any engine's; numerator and
    denominator (span_us) are emitted as separate integer columns — no
    float division anywhere. Keys with < 2 samples have no segments and
    drop out (matching SQL's LEAD IS NOT NULL).

    One series-key hash shuffle; one vectorized diff per bucket.
    Output: key, n_segments int64, span_us int64, twa_num_x100 int64.
    """
    proj = _project_series(ds, key, ts_col, id_col, value_col, num_buckets)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                key: pd.Series([], dtype=np.int64),
                "n_segments": pd.Series([], dtype=np.int64),
                "span_us": pd.Series([], dtype=np.int64),
                "twa_num_x100": pd.Series([], dtype=np.int64),
            }
        )
        if len(g) == 0:
            return empty
        g, same = _series_segments(g, key, ts_col, id_col)
        ts_us = g[ts_col].to_numpy().astype("datetime64[us]").astype(np.int64)
        v100 = _round_half_away_x(g[value_col].to_numpy(dtype=np.float64), 100.0)
        dt = np.empty(len(g), dtype=np.int64)
        dt[0] = 0
        dt[1:] = ts_us[1:] - ts_us[:-1]
        # segment row i (same[i]) carries value of row i-1 over dt[i]
        prev_v = np.empty(len(g), dtype=np.int64)
        prev_v[0] = 0
        prev_v[1:] = v100[:-1]
        seg = pd.DataFrame(
            {key: g[key].to_numpy()[same], "dt": dt[same],
             "num": (prev_v * dt)[same]}
        )
        if len(seg) == 0:
            return empty
        agg = seg.groupby(key, sort=False, as_index=False).agg(
            n_segments=("dt", "size"), span_us=("dt", "sum"),
            twa_num_x100=("num", "sum"),
        )
        for c in ("n_segments", "span_us", "twa_num_x100"):
            agg[c] = agg[c].astype(np.int64)
        return agg

    return proj.groupby(_BUCKET).map_groups(per_bucket, batch_format="pandas")


def acf_lags(
    ds: "rd.Dataset",
    key: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
    lags: tuple = (1, 2, 3),
    num_buckets: int = 16,
    snap: float = 1e6,
) -> "rd.Dataset":
    """Lag-k autocorrelation per series: Pearson correlation of the
    (x_i, x_{i+k}) pairs of the (ts, id)-ordered x100-quantized value
    series, for each requested lag.

    Exactness: all five correlation moments (sx, sy, sxy, sxx, syy) are
    int64 sums of int64 terms — order-free — and the final correlation is
    ONE float expression from identical integer operands on both sides,
    snapped to ``snap`` fixed point. Series with zero variance at a lag
    drop out (correlation undefined; SQL's corr yields NULL).

    Output: key, lag int64, n_pairs int64, acf_x1e6 int64.
    """
    proj = _project_series(ds, key, ts_col, id_col, value_col, num_buckets)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                key: pd.Series([], dtype=object),
                "lag": pd.Series([], dtype=np.int64),
                "n_pairs": pd.Series([], dtype=np.int64),
                "acf_x1e6": pd.Series([], dtype=np.int64),
            }
        )
        if len(g) == 0:
            return empty
        g, _same = _series_segments(g, key, ts_col, id_col)
        k = g[key].to_numpy()
        x = _round_half_away_x(g[value_col].to_numpy(dtype=np.float64), 100.0)
        rows = []
        for lag in lags:
            if len(g) <= lag:
                continue
            # pair (xi, xj) = (later, lag-earlier) within the same series
            ok = k[lag:] == k[:-lag]
            xi, xj, kk = x[lag:][ok], x[:-lag][ok], k[lag:][ok]
            if len(xi) == 0:
                continue
            d = pd.DataFrame(
                {key: kk, "xi": xi, "xj": xj, "xy": xi * xj,
                 "xx": xi * xi, "yy": xj * xj}
            )
            a = d.groupby(key, sort=False, as_index=False).agg(
                n=("xi", "size"), sx=("xi", "sum"), sy=("xj", "sum"),
                sxy=("xy", "sum"), sxx=("xx", "sum"), syy=("yy", "sum"),
            )
            n = a["n"].to_numpy(dtype=np.float64)
            sx = a["sx"].to_numpy(dtype=np.float64)
            sy = a["sy"].to_numpy(dtype=np.float64)
            sxy = a["sxy"].to_numpy(dtype=np.float64)
            sxx = a["sxx"].to_numpy(dtype=np.float64)
            syy = a["syy"].to_numpy(dtype=np.float64)
            vx, vy = n * sxx - sx * sx, n * syy - sy * sy
            keep = (vx > 0) & (vy > 0)
            acf = (n * sxy - sx * sy)[keep] / np.sqrt(vx[keep] * vy[keep])
            rows.append(
                pd.DataFrame(
                    {
                        key: a[key].to_numpy()[keep],
                        "lag": np.int64(lag),
                        "n_pairs": a["n"].to_numpy()[keep].astype(np.int64),
                        "acf_x1e6": _round_half_away_x(acf, snap),
                    }
                )
            )
        return pd.concat(rows, ignore_index=True) if rows else empty

    return proj.groupby(_BUCKET).map_groups(per_bucket, batch_format="pandas")


def cumdev_anomalies(
    ds: "rd.Dataset",
    key: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
    q: float = 0.95,
    num_buckets: int = 16,
) -> "rd.Dataset":
    """Cumulative-deviation anomaly counting per series (a Page-test
    variant): over the (ts, id)-ordered x100 series, the scaled deviation
    at position i is ``|n * S_i - i * S_n|`` (the cumulative sum's
    distance from the uniform-accumulation line, cross-multiplied by n so
    it stays INTEGER — no float mean anywhere). A point is anomalous when
    its deviation strictly exceeds the series' exact PERCENTILE_DISC(q)
    of deviations.

    Output: key, n_points int64, n_anomalies int64, max_absdev int64.
    """
    proj = _project_series(ds, key, ts_col, id_col, value_col, num_buckets)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                key: pd.Series([], dtype=object),
                "n_points": pd.Series([], dtype=np.int64),
                "n_anomalies": pd.Series([], dtype=np.int64),
                "max_absdev": pd.Series([], dtype=np.int64),
            }
        )
        if len(g) == 0:
            return empty
        g, _same = _series_segments(g, key, ts_col, id_col)
        k = g[key].to_numpy()
        x = _round_half_away_x(g[value_col].to_numpy(dtype=np.float64), 100.0)
        # series boundaries in the bucket-sorted frame
        starts = np.flatnonzero(np.r_[True, k[1:] != k[:-1]])
        ends = np.r_[starts[1:], len(k)]
        out = []
        for s, e in zip(starts, ends):
            xs = x[s:e]
            n = e - s
            cs = np.cumsum(xs)
            i = np.arange(1, n + 1, dtype=np.int64)
            d = np.abs(n * cs - i * cs[-1])
            p = np.sort(d)[int(np.ceil(q * n)) - 1]  # PERCENTILE_DISC(q)
            out.append((k[s], n, int((d > p).sum()), int(d.max())))
        return pd.DataFrame(
            {
                key: [o[0] for o in out],
                "n_points": np.array([o[1] for o in out], dtype=np.int64),
                "n_anomalies": np.array([o[2] for o in out], dtype=np.int64),
                "max_absdev": np.array([o[3] for o in out], dtype=np.int64),
            }
        )

    return proj.groupby(_BUCKET).map_groups(per_bucket, batch_format="pandas")


def coverage_sla(
    ds: "rd.Dataset",
    key: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
    staleness_us: int = 1_800_000_000,  # 30 min
    num_buckets: int = 64,
) -> "rd.Dataset":
    """Per-series coverage / SLA report: over the (ts, id)-ordered series,
    a sample "covers" up to ``staleness_us`` after itself, so covered
    time is SUM(min(dt_us, staleness_us)) across consecutive gaps and the
    uptime ratio is covered / span. All integer: uptime_ppm uses floor
    division on both sides. Series with zero span drop out.

    Output: key, n_gaps int64, span_us int64, covered_us int64,
    uptime_ppm int64.
    """
    proj = _project_series(ds, key, ts_col, id_col, value_col, num_buckets)
    cap = np.int64(staleness_us)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                key: pd.Series([], dtype=np.int64),
                "n_gaps": pd.Series([], dtype=np.int64),
                "span_us": pd.Series([], dtype=np.int64),
                "covered_us": pd.Series([], dtype=np.int64),
                "uptime_ppm": pd.Series([], dtype=np.int64),
            }
        )
        if len(g) == 0:
            return empty
        g, same = _series_segments(g, key, ts_col, id_col)
        ts_us = g[ts_col].to_numpy().astype("datetime64[us]").astype(np.int64)
        dt = np.empty(len(g), dtype=np.int64)
        dt[0] = 0
        dt[1:] = ts_us[1:] - ts_us[:-1]
        seg = pd.DataFrame(
            {key: g[key].to_numpy()[same], "dt": dt[same],
             "cov": np.minimum(dt, cap)[same]}
        )
        if len(seg) == 0:
            return empty
        agg = seg.groupby(key, sort=False, as_index=False).agg(
            n_gaps=("dt", "size"), span_us=("dt", "sum"),
            covered_us=("cov", "sum"),
        )
        agg = agg[agg["span_us"] > 0].reset_index(drop=True)
        agg["uptime_ppm"] = (
            agg["covered_us"].to_numpy(dtype=np.int64) * np.int64(1_000_000)
        ) // agg["span_us"].to_numpy(dtype=np.int64)
        for c in ("n_gaps", "span_us", "covered_us", "uptime_ppm"):
            agg[c] = agg[c].astype(np.int64)
        return agg

    return proj.groupby(_BUCKET).map_groups(per_bucket, batch_format="pandas")


def rolling_median(
    ds: "rd.Dataset",
    key: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
    window: int = 5,
    num_buckets: int = 16,
) -> "rd.Dataset":
    """Trailing rolling MEDIAN per series — the order-statistic window the
    mean/sum rolling family (stages/ordered.rolling_bucket_agg) can't
    decompose: per (ts, id)-ordered series, the median of the last
    ``window`` samples (shorter prefix at series start, SQL's ROWS
    BETWEEN n-1 PRECEDING AND CURRENT ROW semantics).

    Exactness: values are x100-quantized int64; the median of an
    even-width frame is the midpoint of the two middle elements, so the
    output is emitted x200 (2x the x100 median) which is always integer.

    Output: one row per input sample — key, ts, id, med_x200 int64.
    """
    proj = _project_series(ds, key, ts_col, id_col, value_col, num_buckets)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                key: pd.Series([], dtype=object),
                ts_col: pd.Series([], dtype="datetime64[us]"),
                id_col: pd.Series([], dtype=np.int64),
                "med_x200": pd.Series([], dtype=np.int64),
            }
        )
        if len(g) == 0:
            return empty
        g, _same = _series_segments(g, key, ts_col, id_col)
        x = _round_half_away_x(g[value_col].to_numpy(dtype=np.float64), 100.0)
        med = (
            pd.Series(x)
            .groupby(g[key].to_numpy(), sort=False)
            .rolling(window, min_periods=1)
            .median()
            .to_numpy()
        )
        return pd.DataFrame(
            {
                key: g[key].to_numpy(),
                ts_col: g[ts_col].to_numpy().astype("datetime64[us]"),
                id_col: g[id_col].to_numpy().astype(np.int64),
                "med_x200": _round_half_away_x(med, 2.0),
            }
        )

    return proj.groupby(_BUCKET).map_groups(per_bucket, batch_format="pandas")


def alert_transitions(
    ds: "rd.Dataset",
    key: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
    hi_x100: int = 15000,
    lo_x100: int = 7500,
) -> "rd.Dataset":
    """Hysteresis alerting state machine per series — the two-threshold
    alert rule every metrics store ships (alert fires when the value
    reaches ``hi``, clears only when it falls to ``lo``; the dead band
    between them suppresses flapping). Per series ordered by (ts, id),
    starting OFF: count rising/falling transitions and total time in
    alert (microseconds between consecutive samples whose PREVIOUS
    state was ON — LOCF semantics, same convention as time_weighted_avg).

    Vectorization: the sequential state recurrence is a last-marker
    carry-forward, computed with one np.maximum.accumulate over marker
    positions (series starts are seeded with the implicit OFF marker so
    carries can never cross a series boundary inside the hash bucket).

    Output: key, n_samples, n_rising, n_falling, alert_us — one row per
    series, bounded by key cardinality.
    """
    proj = _project_series(ds, key, ts_col, id_col, value_col, 64)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                key: pd.Series([], dtype=object),
                "n_samples": pd.Series([], dtype=np.int64),
                "n_rising": pd.Series([], dtype=np.int64),
                "n_falling": pd.Series([], dtype=np.int64),
                "alert_us": pd.Series([], dtype=np.int64),
            }
        )
        if len(g) == 0:
            return empty
        g, same = _series_segments(g, key, ts_col, id_col)
        n = len(g)
        x = _round_half_away_x(g[value_col].to_numpy(dtype=np.float64), 100.0)
        marker = np.full(n, -1, dtype=np.int8)
        marker[x >= hi_x100] = 1
        marker[x <= lo_x100] = 0
        # implicit OFF marker at a series start that has no explicit one
        seed = (~same) & (marker == -1)
        marker[seed] = 0
        valid = marker != -1
        idx = np.where(valid, np.arange(n), 0)
        np.maximum.accumulate(idx, out=idx)
        state = marker[idx]
        prev_state = np.where(same, np.concatenate(([0], state[:-1])), 0)
        tu = g[ts_col].to_numpy().astype("datetime64[us]").astype(np.int64)
        dt = np.where(same, tu - np.concatenate(([0], tu[:-1])), 0)
        out = pd.DataFrame(
            {
                key: g[key].to_numpy(),
                "rising": ((state == 1) & (prev_state == 0)).astype(np.int64),
                "falling": ((state == 0) & (prev_state == 1)).astype(np.int64),
                "aus": np.where(prev_state == 1, dt, 0).astype(np.int64),
            }
        )
        agg = out.groupby(key, sort=False, as_index=False).agg(
            n_samples=("rising", "size"),
            n_rising=("rising", "sum"),
            n_falling=("falling", "sum"),
            alert_us=("aus", "sum"),
        )
        for c in ("n_samples", "n_rising", "n_falling", "alert_us"):
            agg[c] = agg[c].astype(np.int64)
        return agg

    return proj.groupby(_BUCKET).map_groups(per_bucket, batch_format="pandas")


# Knuth multiplicative permutation: bijective on [0, 2^32) for odd
# multipliers — models out-of-order ARRIVAL over ts-ordered event_ids
# deterministically (both engine and oracle compute it in exact int64).
_ARRIVAL_MULT = 2654435761
_ARRIVAL_MOD = 1 << 32


def watermark_late(
    ds: "rd.Dataset",
    key: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
    lateness_us: int = 0,
    num_ranges: int = 64,
) -> "rd.Dataset":
    """Streaming watermark lateness audit — the event-time/arrival-time
    skew report a streaming ingest keeps (SURVEY §2.11): replay events in
    ARRIVAL order (the deterministic multiplicative-hash permutation of
    event_id), maintain watermark = max event ts seen so far, and flag an
    event late when it arrives more than ``lateness_us`` behind the
    watermark.

    The arrival-order prefix-max is distributed as a two-pass range scan
    (the classic prefix-sum shape): split arrival-key space into
    ``num_ranges`` contiguous ranges; pass 1 reduces each range to its
    max ts (tree-merged, ~num_ranges rows on the driver); the exclusive
    prefix-max over those range maxima is the carry-in each range needs,
    broadcast to pass 2 which sorts only WITHIN its range. No global
    sort, no sequential scan across partitions.

    Output per key: n_total, n_late, max_late_us (0 when none late).
    """
    def project(b: pa.Table) -> pa.Table:
        b = b.filter(
            pc.and_(
                pc.and_(pc.is_valid(b[key]), pc.is_valid(b[ts_col])),
                pc.is_valid(b[id_col]),
            )
        )
        ids = b[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        ak = (ids * _ARRIVAL_MULT) % _ARRIVAL_MOD
        r = ak // (_ARRIVAL_MOD // num_ranges)
        return pa.table(
            {
                key: b[key],
                "tu": pc.cast(pc.cast(b[ts_col], pa.timestamp("us")), pa.int64()),
                "ak": pa.array(ak),
                "r": pa.array(r.astype(np.int32)),
            }
        )

    proj = ds.map_batches(project, batch_format="pyarrow", batch_size=None)

    # pass 1: per-range max ts -> exclusive prefix-max (num_ranges rows)
    from mimirsbrunn_ray.stages.rollup import tree_merge

    def partial(b: pa.Table) -> pa.Table:
        return (
            b.select(["r", "tu"])
            .group_by(["r"])
            .aggregate([("tu", "max")])
            .rename_columns(["r", "mx"])
        )

    rng = tree_merge(
        proj.map_batches(partial, batch_format="pyarrow", batch_size=None),
        lambda b: b.group_by(["r"]).aggregate([("mx", "max")])
        .rename_columns(["r", "mx"]),
    ).to_pandas()
    sentinel = np.iinfo(np.int64).min
    if len(rng) == 0 or "r" not in rng.columns:  # empty corpus
        # return the TYPED table itself: a bare empty Dataset loses its
        # schema (round-2 learning), a pa.Table keeps it
        return pa.table(
            {
                key: pa.array([], type=pa.string()),
                "n_total": pa.array([], type=pa.int64()),
                "n_late": pa.array([], type=pa.int64()),
                "max_late_us": pa.array([], type=pa.int64()),
            }
        )
    rng = rng.sort_values("r", ignore_index=True)
    run = np.maximum.accumulate(rng["mx"].to_numpy(dtype=np.int64))
    excl = np.concatenate(([sentinel], run[:-1]))  # exclusive prefix-max
    carry = dict(zip(rng["r"].astype(int), excl.tolist()))

    def per_range(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                key: pd.Series([], dtype=object),
                "n_total": pd.Series([], dtype=np.int64),
                "n_late": pd.Series([], dtype=np.int64),
                "max_late_us": pd.Series([], dtype=np.int64),
            }
        )
        if len(g) == 0:
            return empty
        g = g.sort_values("ak", kind="mergesort", ignore_index=True)
        tu = g["tu"].to_numpy(dtype=np.int64)
        cin = carry.get(int(g["r"].iloc[0]), sentinel)
        run_max = np.maximum.accumulate(tu)
        wm = np.maximum(
            np.concatenate(([sentinel], run_max[:-1])), cin
        )
        late_us = wm - tu
        late = (wm > sentinel) & (late_us > lateness_us)
        out = pd.DataFrame(
            {
                key: g[key].to_numpy(),
                "late": late.astype(np.int64),
                "lus": np.where(late, late_us, 0).astype(np.int64),
            }
        )
        agg = out.groupby(key, sort=False, as_index=False).agg(
            n_total=("late", "size"),
            n_late=("late", "sum"),
            max_late_us=("lus", "max"),
        )
        for c in ("n_total", "n_late", "max_late_us"):
            agg[c] = agg[c].astype(np.int64)
        return agg

    per_rng = proj.groupby("r").map_groups(per_range, batch_format="pandas")
    # final per-key combine: range partials are disjoint in rows, sum them
    return tree_merge(
        per_rng,
        lambda b: b.group_by([key])
        .aggregate([("n_total", "sum"), ("n_late", "sum"), ("max_late_us", "max")])
        .rename_columns([key, "n_total", "n_late", "max_late_us"]),
    )
