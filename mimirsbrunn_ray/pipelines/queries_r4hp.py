"""Round-4 batch HP: year-over-year growth, preference
persistence, and supply-base consolidation — same-month YoY
revenue growth (each month against itself a year earlier — the
seasonality-immune growth read), modal-type persistence (the
share of users whose dominant event type is the SAME in both
halves of their own activity — are preferences traits or
phases?), and the active-supplier trend (distinct shipping
suppliers per month plus slope — a shrinking base is
consolidation risk nobody announces).

Exactness discipline: revenue cents and supplier counts fold
exactly; YoY ratios and the slope mirror; modal types break ties
to the lexicographically first type on both sides."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from mimirsbrunn_ray.pipelines.queries_r4fk import _round_half_away
from mimirsbrunn_ray.stages.dedup import _BUCKET, add_bucket
from mimirsbrunn_ray.stages.rollup import tree_merge


def _valid(b: pa.Table, cols) -> pa.Table:
    m = None
    for c in cols:
        v = pc.is_valid(b[c])
        m = v if m is None else pc.and_(m, v)
    return b.filter(m)


_YOY_COLS = ["mon", "rev_cents", "prev_year_cents",
             "yoy_growth_ppm"]


def q_yoy_same_month_growth(sf_dir):
    """Seasonality-immune growth: each month's order revenue
    against the SAME month one year earlier (cents ratio minus 1,
    ppm) — month-over-month growth confounds seasonality; this
    cancels it by construction.  Monthly cents fold exactly."""
    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderdate", "o_totalprice"])

    def part(b: pa.Table) -> pa.Table:
        b = _valid(b, ("o_orderdate", "o_totalprice"))
        if b.num_rows == 0:
            return pa.table({
                "mon": pa.array([], pa.int64()),
                "cents": pa.array([], pa.int64()),
            })
        d = b["o_orderdate"].cast(pa.timestamp("us")).to_pandas()
        mon = (d.dt.year * 12 + d.dt.month - 1).to_numpy(np.int64)
        x = b["o_totalprice"].cast(pa.float64()).to_numpy(
            zero_copy_only=False)
        cents = np.where(
            x >= 0, np.floor(x * 100.0 + 0.5),
            np.ceil(x * 100.0 - 0.5)).astype(np.int64)
        t = pa.table({"mon": pa.array(mon),
                      "cents": pa.array(cents)})
        g = t.group_by(["mon"]).aggregate([("cents", "sum")])
        return g.rename_columns(["mon", "cents"])

    def comb(b: pa.Table) -> pa.Table:
        g = b.group_by(["mon"]).aggregate([("cents", "sum")])
        return g.rename_columns(["mon", "cents"])

    mm = tree_merge(
        orders.map_batches(part, batch_format="pyarrow",
                           batch_size=None),
        comb,
    ).to_pandas()
    if "mon" not in mm.columns or len(mm) == 0:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _YOY_COLS})
    cmap = dict(zip(mm["mon"].astype(np.int64),
                    mm["cents"].astype(np.int64)))
    out = {c: [] for c in _YOY_COLS}
    for m in sorted(cmap):
        if m - 12 not in cmap:
            continue
        prev = cmap[m - 12]
        if prev == 0:
            continue
        cur = cmap[m]
        out["mon"].append(int(m))
        out["rev_cents"].append(int(cur))
        out["prev_year_cents"].append(int(prev))
        out["yoy_growth_ppm"].append(
            _round_half_away((cur / prev - 1.0) * 1e6))
    return pa.table(
        {c: pa.array(out[c], pa.int64()) for c in _YOY_COLS})


YOY_SQL = """
WITH mm AS MATERIALIZED (
  SELECT YEAR(o_orderdate) * 12 + MONTH(o_orderdate) - 1 AS mon,
         CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT))
              AS BIGINT) AS cents
  FROM orders
  WHERE o_orderdate IS NOT NULL AND o_totalprice IS NOT NULL
  GROUP BY 1
)
SELECT CAST(a.mon AS BIGINT) AS mon,
       a.cents AS rev_cents,
       b.cents AS prev_year_cents,
       CAST(ROUND((CAST(a.cents AS DOUBLE) / b.cents - 1.0)
            * 1000000, 0) AS BIGINT) AS yoy_growth_ppm
FROM mm a JOIN mm b ON b.mon = a.mon - 12
WHERE b.cents <> 0
ORDER BY mon
"""

_MTP_COLS = ["n_users", "n_persistent", "persistence_ppm"]


def q_modal_type_persistence(sf_dir):
    """Are preferences traits or phases?  For each user with 4+
    events, split their (ts, event_id)-ordered stream at its
    median rank and compare the MODAL event type of each half
    (ties to the lexicographically first type); the persistent
    share says whether a 'preferred type' feature will survive a
    train/serve time gap.  Users resolve in disjoint shards; modal
    selection is exact."""
    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "ts", "event_id", "event_type"])

    def project(b: pa.Table) -> pa.Table:
        b = _valid(b, ("user_id", "ts", "event_id", "event_type"))
        t = pa.table({
            "user_id": b["user_id"],
            "us": b["ts"].cast(pa.timestamp("us")).cast(pa.int64()),
            "event_id": b["event_id"],
            "event_type": b["event_type"],
        })
        return add_bucket(t, "user_id", 64)

    def persist(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({
            "n": pd.Series([], dtype=np.int64),
            "p": pd.Series([], dtype=np.int64),
        })
        if len(g) == 0:
            return empty
        g = g.sort_values(["user_id", "us", "event_id"],
                          kind="mergesort", ignore_index=True)
        n_users = 0
        n_pers = 0
        for _, sub in g.groupby("user_id", sort=False):
            n = len(sub)
            if n < 4:
                continue
            half = n // 2
            et = sub["event_type"].to_numpy()

            def modal(arr):
                vals, counts = np.unique(arr,
                                         return_counts=True)
                cmax = counts.max()
                return min(vals[counts == cmax])

            m1 = modal(et[:half])
            m2 = modal(et[half:])
            n_users += 1
            if m1 == m2:
                n_pers += 1
        return pd.DataFrame({
            "n": [np.int64(n_users)],
            "p": [np.int64(n_pers)],
        })

    def comb(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({
                "n": pa.array([], pa.int64()),
                "p": pa.array([], pa.int64()),
            })
        return pa.table({
            c: pa.array([pc.sum(b[c]).as_py() or 0], pa.int64())
            for c in ["n", "p"]})

    t = tree_merge(
        ev.map_batches(project, batch_format="pyarrow",
                       batch_size=None)
        .groupby(_BUCKET)
        .map_groups(persist, batch_format="pandas"),
        comb,
    ).to_pandas()
    if "n" not in t.columns or len(t) == 0 or int(
            t["n"].iloc[0]) == 0:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _MTP_COLS})
    n = int(t["n"].iloc[0])
    p = int(t["p"].iloc[0])
    return pa.table({
        "n_users": pa.array([n], pa.int64()),
        "n_persistent": pa.array([p], pa.int64()),
        "persistence_ppm": pa.array(
            [_round_half_away(p / n * 1e6)], pa.int64()),
    })


MTP_SQL = """
WITH e AS MATERIALIZED (
  SELECT user_id, event_type,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY EPOCH_US(ts), event_id)
           AS rn,
         COUNT(*) OVER (PARTITION BY user_id) AS n
  FROM events
  WHERE user_id IS NOT NULL AND ts IS NOT NULL
    AND event_id IS NOT NULL AND event_type IS NOT NULL
), halves AS MATERIALIZED (
  SELECT user_id, event_type,
         CASE WHEN rn <= n // 2 THEN 1 ELSE 2 END AS half,
         n
  FROM e WHERE n >= 4
), hc AS MATERIALIZED (
  SELECT user_id, half, event_type,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM halves GROUP BY 1, 2, 3
), modal AS MATERIALIZED (
  SELECT user_id, half, event_type
  FROM hc
  QUALIFY ROW_NUMBER() OVER (PARTITION BY user_id, half
                             ORDER BY c DESC, event_type) = 1
), pairs AS (
  SELECT m1.user_id,
         CASE WHEN m1.event_type = m2.event_type THEN 1 ELSE 0
         END AS pers
  FROM modal m1 JOIN modal m2
    ON m2.user_id = m1.user_id
  WHERE m1.half = 1 AND m2.half = 2
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
       CAST(SUM(pers) AS BIGINT) AS n_persistent,
       CAST(ROUND(CAST(SUM(pers) AS DOUBLE) / COUNT(*)
            * 1000000, 0) AS BIGINT) AS persistence_ppm
FROM pairs HAVING COUNT(*) > 0
"""

_AST_COLS = ["n_months", "slope_x1e3", "first_count",
             "last_count"]


def q_active_supplier_trend(sf_dir):
    """Supply-base consolidation watch: distinct suppliers
    shipping anything each month, with the OLS slope across months
    — a negative slope means the base is quietly shrinking and
    single-source risk is compounding.  Distinct (supplier, month)
    pairs fold exactly; the slope mirrors."""
    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_suppkey", "l_shipdate"])

    def part(b: pa.Table) -> pa.Table:
        b = _valid(b, ("l_suppkey", "l_shipdate"))
        if b.num_rows == 0:
            return pa.table({
                "sk": pa.array([], pa.int64()),
                "mon": pa.array([], pa.int64()),
            })
        d = b["l_shipdate"].cast(pa.timestamp("us")).to_pandas()
        mon = (d.dt.year * 12 + d.dt.month - 1).to_numpy(np.int64)
        t = pa.table({
            "sk": b["l_suppkey"].cast(pa.int64()),
            "mon": pa.array(mon),
        })
        return t.group_by(["sk", "mon"]).aggregate([])

    def distinct(b: pa.Table) -> pa.Table:
        return b.select(["sk", "mon"]).group_by(
            ["sk", "mon"]).aggregate([])

    sm = tree_merge(
        li.map_batches(part, batch_format="pyarrow",
                       batch_size=None),
        distinct,
        final_shards=8,
        shard_cols=["sk"],
    ).to_pandas()
    if "mon" not in sm.columns or len(sm) == 0:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _AST_COLS})
    per_mon = sm.groupby("mon").size().sort_index()
    if len(per_mon) < 2:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _AST_COLS})
    x = per_mon.index.to_numpy(np.int64).astype(np.float64)
    y = per_mon.to_numpy(np.int64).astype(np.float64)
    n = len(x)
    sx, sy = x.sum(), y.sum()
    sxx = (x * x).sum()
    sxy = (x * y).sum()
    den = n * sxx - sx * sx
    if den == 0:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _AST_COLS})
    slope = (n * sxy - sx * sy) / den
    return pa.table({
        "n_months": pa.array([n], pa.int64()),
        "slope_x1e3": pa.array(
            [_round_half_away(slope * 1e3)], pa.int64()),
        "first_count": pa.array([int(y[0])], pa.int64()),
        "last_count": pa.array([int(y[-1])], pa.int64()),
    })


AST_SQL = """
WITH sm AS MATERIALIZED (
  SELECT DISTINCT l_suppkey,
         YEAR(l_shipdate) * 12 + MONTH(l_shipdate) - 1 AS mon
  FROM lineitem
  WHERE l_suppkey IS NOT NULL AND l_shipdate IS NOT NULL
), pm AS MATERIALIZED (
  SELECT mon, CAST(COUNT(*) AS BIGINT) AS n
  FROM sm GROUP BY 1
), st AS MATERIALIZED (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         SUM(CAST(mon AS DOUBLE)) AS sx,
         SUM(CAST(pm.n AS DOUBLE)) AS sy,
         SUM(CAST(mon AS DOUBLE) * mon) AS sxx,
         SUM(CAST(mon AS DOUBLE) * pm.n) AS sxy,
         MIN(mon) AS m0, MAX(mon) AS m1
  FROM pm
)
SELECT st.n AS n_months,
       CAST(ROUND((st.n * st.sxy - st.sx * st.sy)
            / (st.n * st.sxx - st.sx * st.sx) * 1000, 0)
            AS BIGINT) AS slope_x1e3,
       (SELECT n FROM pm WHERE mon = st.m0) AS first_count,
       (SELECT n FROM pm WHERE mon = st.m1) AS last_count
FROM st
WHERE st.n >= 2 AND st.n * st.sxx - st.sx * st.sx <> 0
"""


def register_r4hp(queries: dict, oracles: dict) -> None:
    queries.update(
        {
            "yoy_same_month_growth": q_yoy_same_month_growth,
            "modal_type_persistence": q_modal_type_persistence,
            "active_supplier_trend": q_active_supplier_trend,
        }
    )
    oracles.update(
        {
            "yoy_same_month_growth": YOY_SQL,
            "modal_type_persistence": MTP_SQL,
            "active_supplier_trend": AST_SQL,
        }
    )
