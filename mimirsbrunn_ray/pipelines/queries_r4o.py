"""Round-4 batch O: value-entropy sufficient statistics, robust
median/MAD interarrival spread, above-average-hour burst islands,
lineitems-per-order histogram, and time-to-first-error.

Exactness discipline: counts / gaps / epoch microseconds are exact
int64 end to end; the single float expression (c * log2(c)) is computed
from an exact integer operand and snapped to x1e6 fixed point PER TERM
before summation (the queries_r4i discipline), so distributed addition
order cannot change a bit. Median/MAD use PERCENTILE_DISC semantics
(an actual sample, no interpolation) to stay integer-exact.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from mimirsbrunn_ray.functions.timeutil import trunc_us, ts_array
from mimirsbrunn_ray.stages.dedup import _BUCKET, add_bucket
from mimirsbrunn_ray.stages.rollup import tree_merge

_HOUR_US = 3_600_000_000


def _not_null(b: pa.Table, cols) -> pa.Table:
    m = None
    for c in cols:
        v = pc.is_valid(b[c])
        m = v if m is None else pc.and_(m, v)
    return b.filter(m)


def _round_half_away(x: np.ndarray) -> np.ndarray:
    return np.where(
        x >= 0, np.floor(x + 0.5), np.ceil(x - 0.5)
    ).astype(np.int64)


# ---------------------------------------------------------------------------
# value-entropy sufficient statistics per event type
# ---------------------------------------------------------------------------


def q_value_entropy_per_type(sf_dir):
    """Shannon-entropy sufficient statistics of each type's x100 value
    distribution: distinct-value count, total count, and
    SUM(round(c * log2(c) * 1e6)) over the per-value counts c —
    H = log2(n) - S / (n * 1e6) derives exactly from these integers.
    Scale shape: the raw stream collapses combiner-first into the
    (type, value) count tier (bounded by types x value domain) with a
    key-sharded tree merge; shards are key-disjoint, so per-type
    partials (each (type, value) contributes exactly one term) merge in
    a second, types-bounded reduction."""
    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "value"]
    )

    def partial(b: pa.Table) -> pa.Table:
        b = _not_null(b, ("event_type", "value"))
        v = b["value"].to_numpy(zero_copy_only=False).astype(np.float64)
        x = _round_half_away(v * 100.0)
        t = pa.table({"event_type": b["event_type"], "x": pa.array(x)})
        g = t.group_by(["event_type", "x"]).aggregate([([], "count_all")])
        return g.select(["event_type", "x", "count_all"]).rename_columns(
            ["event_type", "x", "c"]
        )

    def combine(b: pa.Table) -> pa.Table:
        g = b.group_by(["event_type", "x"]).aggregate([("c", "sum")])
        return g.select(["event_type", "x", "c_sum"]).rename_columns(
            ["event_type", "x", "c"]
        )

    tier = tree_merge(
        ev.map_batches(partial, batch_format="pyarrow", batch_size=None),
        combine,
        final_shards=8,
        shard_cols=["event_type", "x"],
    )

    def terms(b: pa.Table) -> pa.Table:
        c = b["c"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        term = _round_half_away(c * np.log2(c) * 1e6)
        t = pa.table(
            {
                "event_type": b["event_type"],
                "one": pa.array(np.ones(len(c), dtype=np.int64)),
                "c": pa.array(c),
                "t": pa.array(term),
            }
        )
        g = t.group_by(["event_type"]).aggregate(
            [("one", "sum"), ("c", "sum"), ("t", "sum")]
        )
        g = g.select(["event_type", "one_sum", "c_sum", "t_sum"])
        return g.rename_columns(
            ["event_type", "n_distinct", "n_total", "sum_clog2c_x1e6"]
        )

    def combine_t(b: pa.Table) -> pa.Table:
        g = b.group_by(["event_type"]).aggregate(
            [("n_distinct", "sum"), ("n_total", "sum"),
             ("sum_clog2c_x1e6", "sum")]
        )
        g = g.select(
            ["event_type", "n_distinct_sum", "n_total_sum",
             "sum_clog2c_x1e6_sum"]
        )
        return g.rename_columns(
            ["event_type", "n_distinct", "n_total", "sum_clog2c_x1e6"]
        )

    out = tree_merge(
        tier.map_batches(terms, batch_format="pyarrow", batch_size=None),
        combine_t,
    )

    def finish(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_type": b["event_type"],
                "n_distinct": b["n_distinct"].cast(pa.int64()),
                "n_total": b["n_total"].cast(pa.int64()),
                "sum_clog2c_x1e6": b["sum_clog2c_x1e6"].cast(pa.int64()),
            }
        )

    return out.map_batches(finish, batch_format="pyarrow", batch_size=None)


VALUE_ENTROPY_SQL = """
WITH v AS (
  SELECT event_type, CAST(ROUND(value * 100, 0) AS BIGINT) AS x
  FROM events WHERE event_type IS NOT NULL AND value IS NOT NULL
), c AS (
  SELECT event_type, x, CAST(COUNT(*) AS BIGINT) AS c
  FROM v GROUP BY 1, 2
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_distinct,
       CAST(SUM(c) AS BIGINT) AS n_total,
       CAST(SUM(CAST(ROUND(c * log2(c) * 1000000, 0) AS BIGINT)) AS BIGINT)
         AS sum_clog2c_x1e6
FROM c GROUP BY 1
"""


# ---------------------------------------------------------------------------
# robust interarrival spread: PERCENTILE_DISC median + MAD per type
# ---------------------------------------------------------------------------


def q_mad_interarrival_per_type(sf_dir):
    """Per event type: the PERCENTILE_DISC(0.5) median of consecutive
    interarrival gaps (microseconds, (ts, id) order) and the median
    absolute deviation around it — the robust regularity signal a
    scrape-health monitor uses where one outage would wreck a mean.
    DISC semantics (an actual sample) keep everything int64-exact.
    One series hash-bucket shuffle; each type's gaps sort twice inside
    its bucket (gaps, then absolute deviations)."""
    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "ts", "event_id"]
    )

    def project(b: pa.Table) -> pa.Table:
        b = _not_null(b, ("event_type", "ts"))
        t = pa.table(
            {
                "event_type": b["event_type"],
                "us": b["ts"].cast(pa.timestamp("us")).cast(pa.int64()),
                "event_id": b["event_id"],
            }
        )
        return add_bucket(t, "event_type", 64)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "event_type": pd.Series([], dtype=object),
                "n_gaps": pd.Series([], dtype=np.int64),
                "median_gap_us": pd.Series([], dtype=np.int64),
                "mad_gap_us": pd.Series([], dtype=np.int64),
            }
        )
        if len(g) == 0:
            return empty
        g = g.sort_values(
            ["event_type", "us", "event_id"], kind="mergesort",
            ignore_index=True,
        )
        k = g["event_type"].to_numpy()
        us = g["us"].to_numpy(dtype=np.int64)
        same = np.empty(len(g), dtype=bool)
        same[0] = False
        same[1:] = k[1:] == k[:-1]
        gap = us - np.concatenate(([np.int64(0)], us[:-1]))
        rows = {"event_type": [], "n_gaps": [], "median_gap_us": [],
                "mad_gap_us": []}
        for t in pd.unique(k):  # bounded: distinct types per bucket
            m = (k == t) & same
            gs = np.sort(gap[m])
            n = len(gs)
            if n == 0:
                continue
            med = gs[(n - 1) // 2]
            mad = np.sort(np.abs(gs - med))[(n - 1) // 2]
            rows["event_type"].append(t)
            rows["n_gaps"].append(n)
            rows["median_gap_us"].append(int(med))
            rows["mad_gap_us"].append(int(mad))
        out = pd.DataFrame(rows)
        for c in ("n_gaps", "median_gap_us", "mad_gap_us"):
            out[c] = out[c].astype(np.int64)
        return out

    return (
        ev.map_batches(project, batch_format="pyarrow", batch_size=None)
        .groupby(_BUCKET)
        .map_groups(per_bucket, batch_format="pandas")
    )


MAD_GAP_SQL = """
WITH v AS (
  SELECT event_type, ts, event_id FROM events
  WHERE event_type IS NOT NULL AND ts IS NOT NULL
), g AS (
  SELECT event_type,
         epoch_us(ts) - epoch_us(
           LAG(ts) OVER (PARTITION BY event_type ORDER BY ts, event_id)
         ) AS gap
  FROM v
), g2 AS (
  SELECT event_type, CAST(gap AS BIGINT) AS gap FROM g WHERE gap IS NOT NULL
), m AS (
  SELECT event_type,
         CAST(COUNT(*) AS BIGINT) AS n_gaps,
         CAST(PERCENTILE_DISC(0.5) WITHIN GROUP (ORDER BY gap) AS BIGINT)
           AS med
  FROM g2 GROUP BY 1
)
SELECT g2.event_type,
       CAST(MAX(m.n_gaps) AS BIGINT) AS n_gaps,
       CAST(MAX(m.med) AS BIGINT) AS median_gap_us,
       CAST(PERCENTILE_DISC(0.5) WITHIN GROUP (ORDER BY ABS(g2.gap - m.med))
         AS BIGINT) AS mad_gap_us
FROM g2 JOIN m USING (event_type) GROUP BY 1
"""


# ---------------------------------------------------------------------------
# burst islands: runs of consecutive above-average hours
# ---------------------------------------------------------------------------


def q_burst_hours_per_type(sf_dir):
    """Burst detection per event type: an hour is HOT when its count is
    STRICTLY above the type's mean over observed hours (the exact
    integer comparison c * n_hours > sum_c — no division; strict
    inequality keeps the definition scale-robust where relative
    fluctuations shrink); bursts are maximal runs of consecutive hot
    hours. Reports hot hours, burst count and the longest burst. Scale
    shape: the 1h count tier is combiner-first; totals are a
    types-bounded broadcast; islands resolve inside one type-hash
    bucket shuffle of tier rows."""
    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "ts"]
    )

    def partial(b: pa.Table) -> pa.Table:
        b = _not_null(b, ("event_type", "ts"))
        ts_us = (
            b["ts"].cast(pa.timestamp("us")).cast(pa.int64()).to_numpy(
                zero_copy_only=False
            )
        )
        t = pa.table(
            {
                "event_type": b["event_type"],
                "m": pa.array(trunc_us(ts_us, "1h")),
            }
        )
        g = t.group_by(["event_type", "m"]).aggregate([([], "count_all")])
        return g.select(["event_type", "m", "count_all"]).rename_columns(
            ["event_type", "m", "c"]
        )

    def combine(b: pa.Table) -> pa.Table:
        g = b.group_by(["event_type", "m"]).aggregate([("c", "sum")])
        return g.select(["event_type", "m", "c_sum"]).rename_columns(
            ["event_type", "m", "c"]
        )

    tier = tree_merge(
        ev.map_batches(partial, batch_format="pyarrow", batch_size=None),
        combine,
        final_shards=8,
        shard_cols=["event_type", "m"],
    )

    def totals(b: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "event_type": b["event_type"],
                "one": pa.array(np.ones(b.num_rows, dtype=np.int64)),
                "c": b["c"].cast(pa.int64()),
            }
        )
        g = t.group_by(["event_type"]).aggregate(
            [("one", "sum"), ("c", "sum")]
        )
        g = g.select(["event_type", "one_sum", "c_sum"])
        return g.rename_columns(["event_type", "nm", "sc"])

    def combine_tot(b: pa.Table) -> pa.Table:
        g = b.group_by(["event_type"]).aggregate(
            [("nm", "sum"), ("sc", "sum")]
        )
        g = g.select(["event_type", "nm_sum", "sc_sum"])
        return g.rename_columns(["event_type", "nm", "sc"])

    tier = tier.materialize()
    tot = tree_merge(
        tier.map_batches(totals, batch_format="pyarrow", batch_size=None),
        combine_tot,
    ).to_pandas()  # bounded: one row per event type
    if "event_type" not in tot.columns:  # fully-empty input short-circuit
        tot = pd.DataFrame({"event_type": [], "nm": [], "sc": []})
    nm_map = dict(zip(tot["event_type"], tot["nm"].astype(np.int64)))
    sc_map = dict(zip(tot["event_type"], tot["sc"].astype(np.int64)))

    def rebucket(b: pa.Table) -> pa.Table:
        return add_bucket(b, "event_type", 64)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "event_type": pd.Series([], dtype=object),
                "n_hot_hours": pd.Series([], dtype=np.int64),
                "n_bursts": pd.Series([], dtype=np.int64),
                "longest_burst": pd.Series([], dtype=np.int64),
            }
        )
        if len(g) == 0:
            return empty
        nm = g["event_type"].map(nm_map).to_numpy(dtype=np.int64)
        sc = g["event_type"].map(sc_map).to_numpy(dtype=np.int64)
        hot = g["c"].to_numpy(dtype=np.int64) * nm > sc
        g = g[hot]
        if len(g) == 0:
            return empty
        g = g.sort_values(
            ["event_type", "m"], kind="mergesort", ignore_index=True
        )
        k = g["event_type"].to_numpy()
        m = g["m"].to_numpy(dtype=np.int64)
        new_run = np.empty(len(g), dtype=bool)
        new_run[0] = True
        new_run[1:] = (k[1:] != k[:-1]) | (m[1:] != m[:-1] + _HOUR_US)
        rid = np.cumsum(new_run)
        runs = pd.DataFrame({"k": k, "rid": rid}).groupby(
            ["k", "rid"], sort=False, as_index=False
        ).size()
        agg = runs.groupby("k", sort=False, as_index=False).agg(
            n_hot_hours=("size", "sum"),
            n_bursts=("size", "size"),
            longest_burst=("size", "max"),
        )
        out = agg.rename(columns={"k": "event_type"})
        for c in ("n_hot_hours", "n_bursts", "longest_burst"):
            out[c] = out[c].astype(np.int64)
        return out

    res = (
        tier.map_batches(rebucket, batch_format="pyarrow", batch_size=None)
        .groupby(_BUCKET)
        .map_groups(per_bucket, batch_format="pandas")
        .to_pandas()  # bounded: one row per event type
    )
    # every bucket can legitimately filter to empty (no hour above the
    # mean), and an ALL-empty map_groups output loses its schema — this
    # is a types-bounded result, so assemble the typed table driver-side
    if "event_type" not in res.columns:
        res = pd.DataFrame(
            {"event_type": [], "n_hot_hours": [], "n_bursts": [],
             "longest_burst": []}
        )
    return pa.table(
        {
            "event_type": pa.array(res["event_type"].tolist(), pa.string()),
            "n_hot_hours": pa.array(
                res["n_hot_hours"].astype(np.int64), pa.int64()
            ),
            "n_bursts": pa.array(
                res["n_bursts"].astype(np.int64), pa.int64()
            ),
            "longest_burst": pa.array(
                res["longest_burst"].astype(np.int64), pa.int64()
            ),
        }
    )


BURST_SQL = """
WITH t AS (
  SELECT event_type, date_trunc('hour', ts) AS m,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM events
  WHERE event_type IS NOT NULL AND ts IS NOT NULL
  GROUP BY 1, 2
), tot AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS nm,
         CAST(SUM(c) AS BIGINT) AS sc
  FROM t GROUP BY 1
), f AS (
  SELECT t.event_type, t.m
  FROM t JOIN tot USING (event_type)
  WHERE t.c * tot.nm > tot.sc
), i AS (
  SELECT event_type, m,
         epoch_us(m) // 3600000000
           - ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY m)
           AS anchor
  FROM f
), runs AS (
  SELECT event_type, anchor, COUNT(*) AS len FROM i GROUP BY 1, 2
)
SELECT event_type,
       CAST(SUM(len) AS BIGINT) AS n_hot_hours,
       CAST(COUNT(*) AS BIGINT) AS n_bursts,
       CAST(MAX(len) AS BIGINT) AS longest_burst
FROM runs GROUP BY 1
"""


# ---------------------------------------------------------------------------
# lineitems-per-order histogram (fan-out distribution audit)
# ---------------------------------------------------------------------------


def q_lineitems_per_order_hist(sf_dir):
    """Distribution of order fan-out: for each lineitem-count k, how
    many orders have exactly k lineitems — the join-cardinality audit
    run before a big-big join to predict skew. Same shape as the dedup
    cluster-size histogram: batch-local per-key counts, ONE key-hash
    bucket shuffle, per-bucket final sizes -> partial histograms,
    histogram tree merge."""
    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey"]
    )

    def partial(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_valid(b["l_orderkey"]))
        g = b.group_by(["l_orderkey"]).aggregate([([], "count_all")])
        return g.select(["l_orderkey", "count_all"]).rename_columns(
            ["l_orderkey", "c"]
        )

    def with_bucket(b: pa.Table) -> pa.Table:
        return add_bucket(b, "l_orderkey", 64)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "n_items": pd.Series([], dtype=np.int64),
                "n_orders": pd.Series([], dtype=np.int64),
            }
        )
        if len(g) == 0:
            return empty
        sizes = g.groupby("l_orderkey", sort=False)["c"].sum()
        h = sizes.value_counts()
        return pd.DataFrame(
            {
                "n_items": h.index.to_numpy(dtype=np.int64),
                "n_orders": h.to_numpy(dtype=np.int64),
            }
        )

    def combine(b: pa.Table) -> pa.Table:
        g = b.group_by(["n_items"]).aggregate([("n_orders", "sum")])
        g = g.select(["n_items", "n_orders_sum"])
        return g.rename_columns(["n_items", "n_orders"])

    out = tree_merge(
        li.map_batches(partial, batch_format="pyarrow", batch_size=None)
        .map_batches(with_bucket, batch_format="pyarrow", batch_size=None)
        .groupby(_BUCKET)
        .map_groups(per_bucket, batch_format="pandas"),
        combine,
    )

    def finish(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "n_items": b["n_items"].cast(pa.int64()),
                "n_orders": b["n_orders"].cast(pa.int64()),
            }
        )

    return out.map_batches(finish, batch_format="pyarrow", batch_size=None)


LINEITEM_HIST_SQL = """
WITH c AS (
  SELECT l_orderkey, CAST(COUNT(*) AS BIGINT) AS k
  FROM lineitem WHERE l_orderkey IS NOT NULL GROUP BY 1
)
SELECT CAST(k AS BIGINT) AS n_items,
       CAST(COUNT(*) AS BIGINT) AS n_orders
FROM c GROUP BY 1
"""


# ---------------------------------------------------------------------------
# time to first error per user
# ---------------------------------------------------------------------------


def q_time_to_first_error(sf_dir):
    """Per user who ever hit an 'error' event: the timestamp of their
    first event, their first error, and the exact microsecond delta —
    the time-to-failure funnel input. Combiner-first conditional MINs
    (min over all events / min over error events, nulls ignored),
    user-sharded tree merge, then one vectorized finish filter."""
    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts", "event_type"]
    )

    def partial(b: pa.Table) -> pa.Table:
        b = _not_null(b, ("user_id", "ts"))
        us = b["ts"].cast(pa.timestamp("us")).cast(pa.int64())
        is_err = pc.equal(
            pc.fill_null(b["event_type"], ""), pa.scalar("error")
        )
        err_us = pc.if_else(is_err, us, pa.scalar(None, pa.int64()))
        t = pa.table({"user_id": b["user_id"], "a": us, "e": err_us})
        g = t.group_by(["user_id"]).aggregate([("a", "min"), ("e", "min")])
        return g.select(["user_id", "a_min", "e_min"]).rename_columns(
            ["user_id", "a", "e"]
        )

    def combine(b: pa.Table) -> pa.Table:
        g = b.group_by(["user_id"]).aggregate([("a", "min"), ("e", "min")])
        return g.select(["user_id", "a_min", "e_min"]).rename_columns(
            ["user_id", "a", "e"]
        )

    out = tree_merge(
        ev.map_batches(partial, batch_format="pyarrow", batch_size=None),
        combine,
        final_shards=8,
        shard_cols=["user_id"],
    )

    def finish(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_valid(b["e"]))
        a = b["a"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        e = b["e"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "user_id": b["user_id"],
                "first_any": ts_array(a.astype(np.int64)),
                "first_error": ts_array(e.astype(np.int64)),
                "delta_us": pa.array((e - a).astype(np.int64)),
            }
        )

    return out.map_batches(finish, batch_format="pyarrow", batch_size=None)


FIRST_ERROR_SQL = """
WITH u AS (
  SELECT user_id, MIN(ts) AS fa,
         MIN(CASE WHEN event_type = 'error' THEN ts END) AS fe
  FROM events
  WHERE user_id IS NOT NULL AND ts IS NOT NULL
  GROUP BY 1
)
SELECT user_id, fa AS first_any, fe AS first_error,
       CAST(epoch_us(fe) - epoch_us(fa) AS BIGINT) AS delta_us
FROM u WHERE fe IS NOT NULL
"""


def register_r4o(queries: dict, oracles: dict) -> None:
    queries.update(
        {
            "value_entropy_per_type": q_value_entropy_per_type,
            "mad_interarrival_per_type": q_mad_interarrival_per_type,
            "burst_hours_per_type": q_burst_hours_per_type,
            "lineitems_per_order_hist": q_lineitems_per_order_hist,
            "time_to_first_error": q_time_to_first_error,
        }
    )
    oracles.update(
        {
            "value_entropy_per_type": VALUE_ENTROPY_SQL,
            "mad_interarrival_per_type": MAD_GAP_SQL,
            "burst_hours_per_type": BURST_SQL,
            "lineitems_per_order_hist": LINEITEM_HIST_SQL,
            "time_to_first_error": FIRST_ERROR_SQL,
        }
    )
