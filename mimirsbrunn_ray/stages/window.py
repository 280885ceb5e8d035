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
import pyarrow as pa
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
        # NaT handling is pinned by test_sessionize_null_ts: a null-ts event
        # (and the event after it) starts a NEW session — `diff > gap` alone
        # would evaluate NaT comparisons as False and silently merge them.
        d = g[ts_col].diff()
        new_session = key_change | (d > gap) | d.isna()
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


def asof_join_bucketed(
    left: "rd.Dataset",
    right: "rd.Dataset",
    key: str,
    ts_col: str,
    right_ts_col: str,
    out_col: str,
    inner: bool = True,
    num_buckets: int = 64,
) -> "rd.Dataset":
    """As-of join for a LARGE right side: both sides are Datasets.

    Same semantics as ``asof_join`` (greatest right ts <= left ts within
    the key) but nothing is pulled to the driver: both sides tag a side
    column and union, keys hash-bucket once (the ``point_in_window_join``
    shape), and each bucket resolves matches VECTORIZED — one sort of the
    bucket's right rows plus one ``searchsorted`` over a (key, ts)
    composite int64, chunked so the composite never overflows. Use this
    when the right side grows with the corpus (the reference's J5 lookup
    join, /root/reference/src/osm_reader/poi.rs:228-239, generalized past
    its in-RAM index); ``asof_join`` stays the small-right fast path.

    ``right`` needs columns (key, right_ts_col); ``left`` keeps all its
    columns. Null-ts rows never match (right) / never get a match (left).
    """
    from mimirsbrunn_ray.stages.dedup import _BUCKET, add_bucket

    schema = left.schema()
    if schema is None:
        # fully-empty-input short-circuit (round-4 learning): no schema,
        # no rows — the as-of result is empty either way
        return rd.from_items([])
    base = getattr(schema, "base_schema", schema)
    if isinstance(base, pa.Schema):
        arrow_schema = base
    else:
        # PandasBlockSchema (from_pandas datasets): map numpy dtypes to
        # Arrow; object columns are strings in this engine's data model
        def _conv(t):
            try:
                if t == np.dtype("O"):
                    return pa.string()
                return pa.from_numpy_dtype(t)
            except (pa.ArrowNotImplementedError, TypeError):
                return pa.string()

        arrow_schema = pa.schema(
            [(n, _conv(t)) for n, t in zip(base.names, base.types)]
        )
    left_cols = list(arrow_schema.names)

    def tag_left(b: pa.Table) -> pa.Table:
        b = b.select(left_cols)
        ts_us = b[ts_col].cast(pa.timestamp("us")).cast(pa.int64())
        b = b.append_column("_ts", ts_us)
        return b.append_column(
            "_side", pa.array(np.zeros(b.num_rows, dtype=np.int8))
        )

    def tag_right(b: pa.Table) -> pa.Table:
        ts_us = b[right_ts_col].cast(pa.timestamp("us")).cast(pa.int64())
        cols = {
            name: (b[key] if name == key
                   else pa.nulls(b.num_rows, arrow_schema.field(name).type))
            for name in left_cols
        }
        t = pa.table(cols)
        t = t.append_column("_ts", ts_us)
        return t.append_column(
            "_side", pa.array(np.ones(b.num_rows, dtype=np.int8))
        )

    tagged = left.map_batches(
        tag_left, batch_format="pyarrow", batch_size=None
    ).union(
        right.map_batches(tag_right, batch_format="pyarrow", batch_size=None)
    )
    bucketed = tagged.map_batches(
        lambda b: add_bucket(b, key, num_buckets),
        batch_format="pyarrow",
        batch_size=None,
    )

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop(columns=[_BUCKET])
        ts_f = g["_ts"]
        null_ts = ts_f.isna().to_numpy()
        side = g["_side"].to_numpy()
        ts = ts_f.fillna(0).to_numpy(dtype=np.int64)
        left_mask = side == 0
        out_ts = np.zeros(len(g), dtype=np.int64)
        matched = np.zeros(len(g), dtype=bool)
        if left_mask.any():
            keys = g[key].to_numpy()
            uk, kidx = np.unique(keys, return_inverse=True)
            usable = ~null_ts
            # span over NON-NULL ts only: a fillna(0) row would stretch the
            # span to the full epoch and shrink max_keys ~500x (chunk storm)
            tu = ts[usable] if usable.any() else np.zeros(1, dtype=np.int64)
            t0 = tu.min()
            span = np.int64(tu.max() - t0 + 2)
            max_keys = max(1, int((np.iinfo(np.int64).max // 2) // span))
            for start in range(0, len(uk), max_keys):
                stop = min(start + max_keys, len(uk))
                sel = (kidx >= start) & (kidx < stop) & usable
                ck = (kidx[sel] - start).astype(np.int64)
                comp = ck * span + (ts[sel] - t0)
                s = side[sel]
                r_comp = comp[s == 1]
                order = np.argsort(r_comp, kind="stable")
                r_comp = r_comp[order]
                r_ts = ts[sel][s == 1][order]
                l_comp = comp[s == 0]
                gl = np.flatnonzero(sel)[s == 0]
                if len(r_comp) == 0 or len(l_comp) == 0:
                    continue
                pos = np.searchsorted(r_comp, l_comp, side="right") - 1
                posc = np.clip(pos, 0, len(r_comp) - 1)
                # the hit must fall in the SAME key's composite segment
                ok = (pos >= 0) & ((r_comp[posc] // span) == (l_comp // span))
                matched[gl[ok]] = True
                out_ts[gl[ok]] = r_ts[posc[ok]]
        lsel = np.flatnonzero(left_mask)
        out = g.iloc[lsel].drop(columns=["_ts", "_side"]).copy()
        m = matched[lsel]
        dt = pd.Series(pd.to_datetime(out_ts[lsel], unit="us"))
        dt[~m] = pd.NaT
        out[out_col] = dt.to_numpy()
        if inner:
            out = out[m]
        return out.reset_index(drop=True)

    joined = bucketed.groupby(_BUCKET).map_groups(
        per_bucket, batch_format="pandas"
    )

    def restore_types(b: pa.Table) -> pa.Table:
        # the null-filled right rows widen int left columns to float in the
        # pandas groups; cast back to the left schema (values are integral)
        cols = {}
        for name in b.schema.names:
            col = b[name]
            if name in left_cols:
                col = col.cast(arrow_schema.field(name).type)
            elif name == out_col:
                # the join computes at us precision; pandas hands back ns
                col = col.cast(pa.timestamp("us"))
            cols[name] = col
        return pa.table(cols)

    return joined.map_batches(
        restore_types, batch_format="pyarrow", batch_size=None
    )


def hopping_window_rollup(
    ds: "rd.Dataset",
    key: str,
    ts_col: str,
    value_col: str,
    window: str = "5m",
    hop: str = "1m",
    int_scale: float | None = None,
) -> "rd.Dataset":
    """Overlapping (hopping) window aggregate — each event counts in every
    ``window``-long window whose hop-aligned start covers it.

    Not expressible as a plain groupby (windows overlap), and the naive
    shape replicates every ROW k = window/hop times before aggregating.
    This implementation aggregates to HOP grain first (n/sum/min/max are
    all decomposable), then replicates only the BOUNDED hop-grain
    aggregate rows into their k covering windows and combines — the
    replication factor applies to keys x hop-buckets, never to the raw
    stream. Output columns match generic_rollup with ``bucket`` = window
    start (``int_scale`` snapping identical, cross-engine comparable).
    """
    import pyarrow.compute as pc

    from mimirsbrunn_ray.functions.timeutil import BUCKET_US, trunc_us, ts_array
    from mimirsbrunn_ray.stages.rollup import tree_merge

    hop_us = BUCKET_US[hop]
    win_us = BUCKET_US[window] if window in BUCKET_US else (
        int(window[:-1]) * BUCKET_US["1" + window[-1]]
    )
    k = win_us // hop_us
    if k < 1 or win_us % hop_us:
        raise ValueError(f"window {window!r} must be a multiple of hop {hop!r}")

    def partial(batch: pa.Table) -> pa.Table:
        # normalize to us regardless of source resolution (pandas gives ns)
        ts_us = (
            batch[ts_col].cast(pa.timestamp("us")).cast(pa.int64())
            .to_numpy(zero_copy_only=False)
        )
        t = pa.table(
            {
                key: batch[key],
                "bucket": ts_array(trunc_us(ts_us, hop)),
                "v": batch[value_col].cast(pa.float64()),
            }
        )
        # count_all == SQL COUNT(*): ("v", "count") would skip null values
        # and diverge from the oracle on rows with a null metric
        g = t.group_by([key, "bucket"]).aggregate(
            [([], "count_all"), ("v", "sum"), ("v", "min"), ("v", "max")]
        )
        g = g.select([key, "bucket", "count_all", "v_sum", "v_min", "v_max"])
        return g.rename_columns([key, "bucket", "n_rows", "sum_v", "min_v", "max_v"])

    def combine(b: pa.Table) -> pa.Table:
        g = b.group_by([key, "bucket"]).aggregate(
            [("n_rows", "sum"), ("sum_v", "sum"), ("min_v", "min"), ("max_v", "max")]
        )
        g = g.select(
            [key, "bucket", "n_rows_sum", "sum_v_sum", "min_v_min", "max_v_max"]
        )
        return g.rename_columns([key, "bucket", "n_rows", "sum_v", "min_v", "max_v"])

    hop_agg = tree_merge(
        ds.map_batches(partial, batch_format="pyarrow", batch_size=None), combine
    )

    def replicate(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return b
        n = b.num_rows
        idx = np.repeat(np.arange(n), k)
        buck = b["bucket"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        ws = buck[idx] - np.tile(
            np.arange(k, dtype=np.int64) * hop_us, n
        )
        out = b.take(pa.array(idx))
        return out.set_column(
            out.schema.get_field_index("bucket"), "bucket", ts_array(ws)
        )

    win_agg = tree_merge(
        hop_agg.map_batches(replicate, batch_format="pyarrow", batch_size=None),
        combine,
    )

    def _snap(col):
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
            mean = pc.cast(
                pc.round(
                    pc.divide(s.cast(pa.float64()), n.cast(pa.float64())),
                    ndigits=0, round_mode="half_towards_infinity",
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

    return win_agg.map_batches(finish, batch_format="pyarrow", batch_size=None)


def point_in_window_join(
    points: "rd.Dataset",
    anchors: "rd.Dataset",
    key: str = "user_id",
    ts_col: str = "ts",
    window: pd.Timedelta = pd.Timedelta(minutes=10),
    num_buckets: int = 64,
) -> "rd.Dataset":
    """Range (interval) join, counted per key: each POINT row matches every
    ANCHOR row of the same key with ``anchor.ts <= point.ts <
    anchor.ts + window``. Returns per-key ``n_pairs`` (1:N inner-join
    cardinality) and ``n_matched_points`` (semi-join cardinality).

    Not expressible as groupby or as-of (as-of gives only the NEAREST
    anchor; this counts every anchor in range). Shape: both sides tag a
    source column and union, keys hash-bucket once (the sessionize
    bucketing), and each bucket resolves ranges VECTORIZED — one sort of
    the bucket's anchors plus two ``searchsorted`` per point column over a
    (key, ts) composite, never a per-key loop or an O(n*m) scan.
    """
    import pyarrow.compute as pc

    from mimirsbrunn_ray.stages.dedup import _BUCKET, add_bucket

    win_us = int(window.value // 1000)

    def tag(side: int):
        def fn(b: pa.Table) -> pa.Table:
            # SQL join semantics: null keys/timestamps never match — and
            # an unfiltered NaT wraps to INT64_MIN in the composite-key
            # arithmetic below, fabricating pairs (caught by the
            # randomized differential test)
            b = b.filter(
                pc.and_(pc.is_valid(b[key]), pc.is_valid(b[ts_col]))
            )
            ts_us = b[ts_col].cast(pa.timestamp("us")).cast(pa.int64())
            return pa.table(
                {
                    key: b[key],
                    "_ts": ts_us,
                    "_side": pa.array(
                        np.full(b.num_rows, side, dtype=np.int8)
                    ),
                }
            )
        return fn

    tagged = points.map_batches(tag(0), batch_format="pyarrow",
                                batch_size=None).union(
        anchors.map_batches(tag(1), batch_format="pyarrow", batch_size=None)
    )
    bucketed = tagged.map_batches(
        lambda b: add_bucket(b, key, num_buckets),
        batch_format="pyarrow",
        batch_size=None,
    )

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame(
                {
                    key: pd.Series([], dtype=g[key].dtype if key in g else "int64"),
                    "n_pairs": pd.Series([], dtype="int64"),
                    "n_matched_points": pd.Series([], dtype="int64"),
                }
            )
        keys = g[key].to_numpy()
        ts = g["_ts"].to_numpy(dtype=np.int64)
        side = g["_side"].to_numpy()
        # composite (key, ts) as one sortable int64: offset ts into the
        # bucket's span so key * span + ts never overflows. For buckets
        # where n_keys * span would exceed int64 (huge key cardinality
        # over a long span), process the keys in CHUNKS that fit — each
        # chunk stays fully vectorized
        t0 = ts.min()
        span = np.int64(ts.max() - t0 + win_us + 2)
        uk, kidx = np.unique(keys, return_inverse=True)
        max_keys = max(1, int((np.iinfo(np.int64).max // 2) // span))
        frames = []
        for start in range(0, len(uk), max_keys):
            stop = min(start + max_keys, len(uk))
            sel = (kidx >= start) & (kidx < stop)
            ck = kidx[sel] - start
            comp = ck.astype(np.int64) * span + (ts[sel] - t0)
            a_mask = side[sel] == 1
            a_comp = np.sort(comp[a_mask])
            p_comp = comp[~a_mask]
            p_kidx = ck[~a_mask]
            # anchors in (p.ts - window, p.ts]
            #   <=>  a.ts <= p.ts < a.ts + win
            # (side="right" on lo EXCLUDES a.ts == p.ts - window: the
            # window end is exclusive). The composite keeps keys disjoint
            # because span covers ts range + window.
            lo = np.searchsorted(
                a_comp, p_comp - np.int64(win_us), side="right"
            )
            hi = np.searchsorted(a_comp, p_comp, side="right")
            n = (hi - lo).astype(np.int64)
            n_k = stop - start
            pairs = np.bincount(p_kidx, weights=n, minlength=n_k).astype(np.int64)
            matched = np.bincount(p_kidx[n > 0], minlength=n_k).astype(np.int64)
            frames.append(
                pd.DataFrame(
                    {key: uk[start:stop], "n_pairs": pairs,
                     "n_matched_points": matched}
                )
            )
        out = pd.concat(frames, ignore_index=True)
        return out[out["n_pairs"] > 0].reset_index(drop=True)

    return (
        bucketed.groupby(_BUCKET)
        .map_groups(
            lambda g: per_bucket(g.drop(columns=[_BUCKET])),
            batch_format="pandas",
        )
    )


def session_funnel(
    ds: "rd.Dataset",
    key: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    start_type: str = "click",
    convert_type: str = "purchase",
    gap: pd.Timedelta = pd.Timedelta(minutes=30),
    num_buckets: int = 64,
) -> "rd.Dataset":
    """Sessionized funnel conversion — the product-analytics composition
    of sessionize: per key, how many gap-delimited sessions exist, how
    many contain a ``start_type`` event, and in how many a
    ``convert_type`` event lands STRICTLY AFTER the first start (equal
    timestamps do not convert, so the answer is independent of the
    engine's ordering of ts ties).

    Same scale shape as sessionize (one coarse hash-bucket shuffle, then
    fully vectorized within the bucket: one mergesort by (key, ts), one
    diff, one session-id cumsum, two per-session groupby aggregates —
    never a pandas group per key). Null keys / timestamps are dropped
    (the SQL WHERE twin); a null-ts row can't be placed in a session
    timeline, unlike sessionize's count-only semantics where it starts a
    new session.

    Output: key, n_sessions, n_click_sessions, n_converted (all int64).
    """
    from mimirsbrunn_ray.stages.dedup import _BUCKET, add_bucket

    filtered = ds.map_batches(
        lambda b: add_bucket(
            b.filter(
                pa.compute.and_(
                    pa.compute.is_valid(b[key]),
                    pa.compute.is_valid(b[ts_col]),
                )
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
                key: pd.Series([], dtype=g[key].dtype),
                "n_sessions": pd.Series([], dtype=np.int64),
                "n_click_sessions": pd.Series([], dtype=np.int64),
                "n_converted": pd.Series([], dtype=np.int64),
            }
        )
        if len(g) == 0:
            return empty
        g = g.sort_values([key, ts_col], kind="mergesort")
        key_change = g[key].ne(g[key].shift())
        d = g[ts_col].diff()
        sid = (key_change | (d > gap)).cumsum()
        ts = g[ts_col]
        is_start = g[type_col].eq(start_type)
        is_conv = g[type_col].eq(convert_type)
        sess = pd.DataFrame(
            {
                key: g[key],
                "_first_start": ts.where(is_start),
                "_last_conv": ts.where(is_conv),
            }
        ).groupby(sid, sort=False).agg(
            **{
                key: (key, "first"),
                "_first_start": ("_first_start", "min"),
                "_last_conv": ("_last_conv", "max"),
            }
        )
        # NaT comparisons are False: sessions without a start or without a
        # conversion never count as converted — exactly the SQL CASE twin
        sess["_hit"] = sess["_first_start"].notna()
        sess["_conv"] = sess["_last_conv"] > sess["_first_start"]
        out = sess.groupby(key, sort=True).agg(
            n_sessions=(key, "size"),
            n_click_sessions=("_hit", "sum"),
            n_converted=("_conv", "sum"),
        ).reset_index()
        for c in ("n_sessions", "n_click_sessions", "n_converted"):
            out[c] = out[c].astype(np.int64)
        return out

    return filtered.groupby(_BUCKET).map_groups(fn, batch_format="pandas")


def interval_union(
    ds: "rd.Dataset",
    key: str,
    s_col: str,
    e_col: str,
    num_buckets: int = 64,
) -> "rd.Dataset":
    """Per-key union of possibly-overlapping intervals — merge every
    overlapping-or-touching [s, e) pair (s <= running max e joins the
    current island) and report how many disjoint islands remain and the
    total covered time. The gaps-and-islands operator behind alerting
    windows, maintenance coverage, and dedup of retried spans.

    Scale shape: identical to sessionize — one coarse hash-bucket
    shuffle on the key, then fully vectorized inside the bucket (one
    mergesort by (key, s, e), one per-key cummax, one cumsum island id,
    two grouped aggregates). Rows with null key/bounds are dropped (the
    SQL WHERE twin). Merge decisions use only (s, running-max-e), so
    exact duplicate intervals and containment cases fold in naturally
    and the result is independent of tie order.

    Output: key, n_intervals int64, covered_us int64 (sum over islands
    of e_max - s_min in microseconds).
    """
    from mimirsbrunn_ray.stages.dedup import _BUCKET, add_bucket

    filtered = ds.map_batches(
        lambda b: add_bucket(
            b.filter(
                pa.compute.and_(
                    pa.compute.and_(
                        pa.compute.is_valid(b[key]),
                        pa.compute.is_valid(b[s_col]),
                    ),
                    pa.compute.is_valid(b[e_col]),
                )
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
                key: pd.Series([], dtype=g[key].dtype),
                "n_intervals": pd.Series([], dtype=np.int64),
                "covered_us": pd.Series([], dtype=np.int64),
            }
        )
        if len(g) == 0:
            return empty
        g = g.sort_values([key, s_col, e_col], kind="mergesort")
        prev_max_e = g.groupby(key, sort=False)[e_col].cummax().shift()
        key_change = g[key].ne(g[key].shift())
        new_island = key_change | (g[s_col] > prev_max_e)
        island = new_island.cumsum()
        spans = (
            pd.DataFrame({key: g[key], "s": g[s_col], "e": g[e_col]})
            .groupby(island, sort=False)
            .agg(**{key: (key, "first"), "s0": ("s", "min"), "e1": ("e", "max")})
        )
        # exact integer microseconds — no float detour
        cov = (spans["e1"] - spans["s0"]) // pd.Timedelta(microseconds=1)
        out = (
            pd.DataFrame({key: spans[key], "_c": cov})
            .groupby(key, sort=True)
            .agg(n_intervals=(key, "size"), covered_us=("_c", "sum"))
            .reset_index()
        )
        out["n_intervals"] = out["n_intervals"].astype(np.int64)
        out["covered_us"] = out["covered_us"].astype(np.int64)
        return out

    return filtered.groupby(_BUCKET).map_groups(fn, batch_format="pandas")
