"""Round-4 batch IK: fulfilment drift, ordinal association, and
regional churn — the ship-latency monthly trend (mean days from
order date to line shipment, by month, plus its OLS slope — is
the warehouse getting slower?), the Goodman–Kruskal gamma
between customer balance quartile and order-count band (ordinal
association from exact concordant/discordant pair counts), and
the region revenue share swing (each region's max-minus-min
yearly revenue share — which region's importance is churning).

Exactness discipline: latency days are exact integer
differences; gamma's concordant/discordant pair counts are
exact integer products over the 4×4 contingency; yearly cents
fold exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd
from mimirsbrunn_ray.stages.broadcast import safe_join as _safe_join

from mimirsbrunn_ray.pipelines.queries_r4fk import (
    _DAY_US,
    _round_half_away,
)
from mimirsbrunn_ray.stages.rollup import tree_merge


def _valid(b: pa.Table, cols) -> pa.Table:
    m = None
    for c in cols:
        v = pc.is_valid(b[c])
        m = v if m is None else pc.and_(m, v)
    return b.filter(m)


_SLM_COLS = ["n_months", "slope_days_per_month_x1e6",
             "first_mean_days_x1e3", "last_mean_days_x1e3"]


def q_ship_latency_monthly_trend(sf_dir):
    """Is the warehouse getting slower?  Lineitems join their
    order header by key (hash join); latency = shipdate −
    orderdate in whole days, averaged per order month, with the
    OLS slope across months.  Day differences and monthly sums
    fold exactly; only the final per-month means divide."""
    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_shipdate"])
    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderdate"])
    li = li.materialize()
    orders = orders.materialize()
    if li.count() == 0 or orders.count() == 0:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _SLM_COLS})
    joined = _safe_join(
        li, orders,
        on=("l_orderkey",),
        right_on=("o_orderkey",),
        join_type="inner",
        num_partitions=16,
    )

    def part(b: pa.Table) -> pa.Table:
        b = _valid(b, ("l_shipdate", "o_orderdate"))
        if b.num_rows == 0:
            return pa.table({
                "mon": pa.array([], pa.int64()),
                "n": pa.array([], pa.int64()),
                "sd": pa.array([], pa.int64()),
            })
        od = b["o_orderdate"].cast(pa.timestamp("us"))
        sd = b["l_shipdate"].cast(pa.timestamp("us"))
        odp = od.to_pandas()
        mon = (odp.dt.year * 12 + odp.dt.month - 1).to_numpy(
            np.int64)
        lat = ((sd.cast(pa.int64()).to_numpy(
            zero_copy_only=False)
            - od.cast(pa.int64()).to_numpy(
                zero_copy_only=False)) // _DAY_US)
        df = pd.DataFrame({"mon": mon, "n": 1, "sd": lat})
        agg = df.groupby("mon").sum().reset_index()
        for c in ["mon", "n", "sd"]:
            agg[c] = agg[c].astype(np.int64)
        return pa.Table.from_pandas(agg, preserve_index=False)

    def comb(b: pa.Table) -> pa.Table:
        g = b.group_by(["mon"]).aggregate(
            [("n", "sum"), ("sd", "sum")])
        return g.rename_columns(["mon", "n", "sd"])

    mm = tree_merge(
        joined.map_batches(part, batch_format="pyarrow",
                           batch_size=None), comb).to_pandas()
    if "mon" not in mm.columns or len(mm) < 2:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _SLM_COLS})
    mm = mm.sort_values("mon")
    x = mm["mon"].to_numpy(np.int64).astype(np.float64)
    y = (mm["sd"].to_numpy(np.int64).astype(np.float64)
         / mm["n"].to_numpy(np.int64))
    n = len(x)
    sx, sy = x.sum(), y.sum()
    sxx = (x * x).sum()
    sxy = (x * y).sum()
    den = n * sxx - sx * sx
    if den == 0:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _SLM_COLS})
    slope = (n * sxy - sx * sy) / den
    return pa.table({
        "n_months": pa.array([n], pa.int64()),
        "slope_days_per_month_x1e6": pa.array(
            [_round_half_away(slope * 1e6)], pa.int64()),
        "first_mean_days_x1e3": pa.array(
            [_round_half_away(float(y[0]) * 1e3)], pa.int64()),
        "last_mean_days_x1e3": pa.array(
            [_round_half_away(float(y[-1]) * 1e3)], pa.int64()),
    })


SLM_SQL = f"""
WITH lat AS MATERIALIZED (
  SELECT YEAR(o.o_orderdate) * 12 + MONTH(o.o_orderdate) - 1
           AS mon,
         (EPOCH_US(l.l_shipdate) - EPOCH_US(o.o_orderdate))
           // {_DAY_US} AS d
  FROM lineitem l
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  WHERE l.l_shipdate IS NOT NULL AND o.o_orderdate IS NOT NULL
), mm AS MATERIALIZED (
  SELECT mon, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(d) AS BIGINT) AS sd
  FROM lat GROUP BY 1
), pts AS MATERIALIZED (
  SELECT mon, CAST(sd AS DOUBLE) / n AS y FROM mm
), st AS MATERIALIZED (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         SUM(CAST(mon AS DOUBLE)) AS sx, SUM(y) AS sy,
         SUM(CAST(mon AS DOUBLE) * mon) AS sxx,
         SUM(CAST(mon AS DOUBLE) * y) AS sxy,
         MIN(mon) AS m0, MAX(mon) AS m1
  FROM pts
)
SELECT st.n AS n_months,
       CAST(ROUND((st.n * st.sxy - st.sx * st.sy)
            / (st.n * st.sxx - st.sx * st.sx) * 1000000, 0)
            AS BIGINT) AS slope_days_per_month_x1e6,
       CAST(ROUND((SELECT y FROM pts WHERE mon = st.m0)
            * 1000, 0) AS BIGINT) AS first_mean_days_x1e3,
       CAST(ROUND((SELECT y FROM pts WHERE mon = st.m1)
            * 1000, 0) AS BIGINT) AS last_mean_days_x1e3
FROM st
WHERE st.n >= 2 AND st.n * st.sxx - st.sx * st.sx <> 0
"""

_GKG_COLS = ["n_customers", "concordant", "discordant",
             "gamma_ppm"]


def q_goodman_kruskal_balance_orders(sf_dir):
    """Does money order more?  Goodman–Kruskal gamma between a
    customer's balance quartile and their order-count band (0,
    1–2, 3–5, 6+) — a rank association built from EXACT
    concordant/discordant pair counts over the 4×4 contingency,
    immune to the heavy ties both ordinals carry.  Quartile
    edges use integer ranks; the pair counts are integer
    products."""
    # scale shape: the quartile cut resolves via a distributed balance
    # histogram + bounded straddle pulls (stages/exactrank.py), order
    # counts reduce per customer in the cluster, and the 4x4 contingency
    # folds as per-batch partials — neither fact table lands whole on
    # the driver.
    from mimirsbrunn_ray.stages.broadcast import attach_table, keyed_counts
    from mimirsbrunn_ray.stages.exactrank import band_of, rank_band_lut

    def cust_proj(b: pa.Table) -> pa.Table:
        b = b.filter(pc.and_(pc.is_valid(b["c_custkey"]),
                             pc.is_valid(b["c_acctbal"])))
        bal = b["c_acctbal"].to_numpy(zero_copy_only=False).astype(
            np.float64)
        cents = np.where(bal >= 0, np.floor(bal * 100 + 0.5),
                         np.ceil(bal * 100 - 0.5)).astype(np.int64)
        return pa.table({
            "ck": b["c_custkey"].cast(pa.int64()),
            "cents": pa.array(cents),
        })

    cust_ds = rd.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_acctbal"]
    ).map_batches(cust_proj, batch_format="pyarrow",
                  batch_size=None).materialize()
    lut, n = rank_band_lut(cust_ds, "cents", "ck", 4)
    if lut is None:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _GKG_COLS})

    onc = keyed_counts(sf_dir, "orders", "o_custkey")
    withc = attach_table(cust_ds, "ck", onc, "o_custkey", ["n"],
                         how="left")

    def cell_part(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"band": pa.array([], pa.int64()),
                             "oband": pa.array([], pa.int64()),
                             "cnt": pa.array([], pa.int64())})
        ck = b["ck"].to_numpy(zero_copy_only=False)
        cents = b["cents"].to_numpy(zero_copy_only=False)
        band = band_of(cents, ck, lut)
        ocount = pc.fill_null(b["n"], 0).to_numpy(
            zero_copy_only=False).astype(np.int64)
        oband = np.where(ocount == 0, 0,
                         np.where(ocount <= 2, 1,
                                  np.where(ocount <= 5, 2, 3)))
        t = pa.table({"band": pa.array(band),
                      "oband": pa.array(oband),
                      "cnt": pa.array(np.ones(len(band), np.int64))})
        g = t.group_by(["band", "oband"]).aggregate([("cnt", "sum")])
        return g.rename_columns(["band", "oband", "cnt"])

    cells = withc.map_batches(
        cell_part, batch_format="pyarrow", batch_size=None).to_pandas()
    tab = np.zeros((4, 4), np.int64)
    for bb, ob, cn in zip(cells["band"], cells["oband"], cells["cnt"]):
        tab[int(bb), int(ob)] += int(cn)
    conc = 0
    disc = 0
    for i in range(4):
        for j in range(4):
            nij = int(tab[i, j])
            if nij == 0:
                continue
            conc += nij * int(tab[i + 1:, j + 1:].sum())
            disc += nij * int(tab[i + 1:, :j].sum())
    if conc + disc == 0:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _GKG_COLS})
    gamma = (conc - disc) / (conc + disc)
    return pa.table({
        "n_customers": pa.array([n], pa.int64()),
        "concordant": pa.array([conc], pa.int64()),
        "discordant": pa.array([disc], pa.int64()),
        "gamma_ppm": pa.array(
            [_round_half_away(gamma * 1e6)], pa.int64()),
    })


GKG_SQL = """
WITH cb AS MATERIALIZED (
  SELECT c_custkey AS ck,
         CAST(ROUND(c_acctbal * 100, 0) AS BIGINT) AS cents
  FROM customer
  WHERE c_custkey IS NOT NULL AND c_acctbal IS NOT NULL
), rk AS MATERIALIZED (
  SELECT ck,
         (4 * (ROW_NUMBER() OVER (ORDER BY cents, ck) - 1))
           // (SELECT COUNT(*) FROM cb) AS band
  FROM cb
), onc AS MATERIALIZED (
  SELECT o_custkey AS ck, CAST(COUNT(*) AS BIGINT) AS n
  FROM orders WHERE o_custkey IS NOT NULL GROUP BY 1
), ob AS MATERIALIZED (
  SELECT rk.ck, rk.band,
         CASE WHEN COALESCE(onc.n, 0) = 0 THEN 0
              WHEN onc.n <= 2 THEN 1
              WHEN onc.n <= 5 THEN 2
              ELSE 3 END AS oband
  FROM rk LEFT JOIN onc USING (ck)
), cell AS MATERIALIZED (
  SELECT band, oband, CAST(COUNT(*) AS BIGINT) AS n
  FROM ob GROUP BY 1, 2
), pairs AS MATERIALIZED (
  SELECT
    CAST(SUM(a.n * b.n) FILTER (
      WHERE b.band > a.band AND b.oband > a.oband) AS BIGINT)
      AS conc,
    CAST(SUM(a.n * b.n) FILTER (
      WHERE b.band > a.band AND b.oband < a.oband) AS BIGINT)
      AS disc
  FROM cell a CROSS JOIN cell b
)
SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM cb)
         AS n_customers,
       COALESCE(pairs.conc, 0) AS concordant,
       COALESCE(pairs.disc, 0) AS discordant,
       CAST(ROUND(CAST(COALESCE(pairs.conc, 0)
                       - COALESCE(pairs.disc, 0) AS DOUBLE)
            / (COALESCE(pairs.conc, 0)
               + COALESCE(pairs.disc, 0)) * 1000000, 0)
            AS BIGINT) AS gamma_ppm
FROM pairs
WHERE COALESCE(pairs.conc, 0) + COALESCE(pairs.disc, 0) > 0
"""

_RSS_COLS = ["r_name", "n_years", "min_share_ppm",
             "max_share_ppm", "swing_ppm"]


def q_region_share_swing(sf_dir):
    """Which region's importance is churning?  Per region, the
    min and max of its YEARLY share of global revenue and the
    swing between them — a stable business shows tight bands,
    a shifting one shows crossovers.  Yearly (region, cents)
    folds exactly through the customer → nation → region
    broadcast maps."""
    nation = rd.read_parquet(
        f"{sf_dir}/nation.parquet",
        columns=["n_nationkey", "n_regionkey"]).to_pandas()
    region = rd.read_parquet(
        f"{sf_dir}/region.parquet",
        columns=["r_regionkey", "r_name"]).to_pandas()
    if len(nation) == 0 or len(region) == 0:
        return pa.table({
            "r_name": pa.array([], pa.string()),
            "n_years": pa.array([], pa.int64()),
            "min_share_ppm": pa.array([], pa.int64()),
            "max_share_ppm": pa.array([], pa.int64()),
            "swing_ppm": pa.array([], pa.int64()),
        })
    # nation -> region is 25 rows (reference-blessed driver map); the
    # customer hop attaches via budget-gated broadcast / join instead of
    # a driver dict (stages/broadcast.py)
    from mimirsbrunn_ray.stages.broadcast import attach_dim

    n2r = dict(zip(nation["n_nationkey"].astype(np.int64),
                   nation["n_regionkey"].astype(np.int64)))

    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_orderdate", "o_totalprice"])
    orders = orders.map_batches(
        lambda b: _valid(b, ("o_custkey", "o_orderdate",
                             "o_totalprice")),
        batch_format="pyarrow", batch_size=None)
    orders = attach_dim(orders, "o_custkey", sf_dir, "customer",
                        "c_custkey", ["c_nationkey"], how="inner")

    def part(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({
                "rk": pa.array([], pa.int64()),
                "yr": pa.array([], pa.int64()),
                "cents": pa.array([], pa.int64()),
            })
        nk = b["c_nationkey"].to_numpy(
            zero_copy_only=False).astype(np.int64)
        rk = np.array([n2r.get(int(k), -1) for k in nk], np.int64)
        d = b["o_orderdate"].cast(pa.timestamp("us")).to_pandas()
        yr = d.dt.year.to_numpy(np.int64)
        tp = b["o_totalprice"].cast(pa.float64()).to_numpy(
            zero_copy_only=False)
        cents = np.where(tp >= 0, np.floor(tp * 100 + 0.5),
                         np.ceil(tp * 100 - 0.5)).astype(
            np.int64)
        keep = rk >= 0
        df = pd.DataFrame({"rk": rk[keep], "yr": yr[keep],
                           "cents": cents[keep]})
        agg = df.groupby(["rk", "yr"])["cents"].sum(
        ).reset_index()
        for c in ["rk", "yr", "cents"]:
            agg[c] = agg[c].astype(np.int64)
        return pa.Table.from_pandas(agg, preserve_index=False)

    def comb(b: pa.Table) -> pa.Table:
        g = b.group_by(["rk", "yr"]).aggregate(
            [("cents", "sum")])
        return g.rename_columns(["rk", "yr", "cents"])

    ry = tree_merge(
        orders.map_batches(part, batch_format="pyarrow",
                           batch_size=None), comb).to_pandas()
    if "rk" not in ry.columns or len(ry) == 0:
        return pa.table({
            "r_name": pa.array([], pa.string()),
            "n_years": pa.array([], pa.int64()),
            "min_share_ppm": pa.array([], pa.int64()),
            "max_share_ppm": pa.array([], pa.int64()),
            "swing_ppm": pa.array([], pa.int64()),
        })
    ytot = ry.groupby("yr")["cents"].sum()
    rows = []
    rname = dict(zip(region["r_regionkey"].astype(np.int64),
                     region["r_name"]))
    for rk, g in ry.groupby("rk"):
        shares = []
        for _, r in g.iterrows():
            t = int(ytot[r["yr"]])
            if t > 0:
                shares.append(int(r["cents"]) / t)
        if not shares:
            continue
        mn = _round_half_away(min(shares) * 1e6)
        mx = _round_half_away(max(shares) * 1e6)
        rows.append((rname.get(int(rk), str(rk)), len(shares),
                     mn, mx, mx - mn))
    rows.sort(key=lambda r: r[0])
    return pa.table({
        "r_name": pa.array([r[0] for r in rows], pa.string()),
        "n_years": pa.array([r[1] for r in rows], pa.int64()),
        "min_share_ppm": pa.array(
            [r[2] for r in rows], pa.int64()),
        "max_share_ppm": pa.array(
            [r[3] for r in rows], pa.int64()),
        "swing_ppm": pa.array([r[4] for r in rows], pa.int64()),
    })


RSS_SQL = """
WITH ry AS MATERIALIZED (
  SELECT n.n_regionkey AS rk, YEAR(o.o_orderdate) AS yr,
         CAST(SUM(CAST(ROUND(o.o_totalprice * 100, 0)
                       AS BIGINT)) AS BIGINT) AS cents
  FROM orders o
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation n ON n.n_nationkey = c.c_nationkey
  WHERE o.o_orderdate IS NOT NULL
    AND o.o_totalprice IS NOT NULL
  GROUP BY 1, 2
), yt AS MATERIALIZED (
  SELECT yr, CAST(SUM(cents) AS BIGINT) AS t
  FROM ry GROUP BY 1
), sh AS MATERIALIZED (
  SELECT ry.rk,
         CAST(ROUND(CAST(ry.cents AS DOUBLE) / yt.t
              * 1000000, 0) AS BIGINT) AS share
  FROM ry JOIN yt USING (yr)
  WHERE yt.t > 0
)
SELECT r.r_name,
       CAST(COUNT(*) AS BIGINT) AS n_years,
       CAST(MIN(sh.share) AS BIGINT) AS min_share_ppm,
       CAST(MAX(sh.share) AS BIGINT) AS max_share_ppm,
       CAST(MAX(sh.share) - MIN(sh.share) AS BIGINT)
         AS swing_ppm
FROM sh JOIN region r ON r.r_regionkey = sh.rk
GROUP BY r.r_name
ORDER BY r.r_name
"""


def register_r4ik(queries: dict, oracles: dict) -> None:
    queries.update(
        {
            "ship_latency_monthly_trend":
                q_ship_latency_monthly_trend,
            "goodman_kruskal_balance_orders":
                q_goodman_kruskal_balance_orders,
            "region_share_swing": q_region_share_swing,
        }
    )
    oracles.update(
        {
            "ship_latency_monthly_trend": SLM_SQL,
            "goodman_kruskal_balance_orders": GKG_SQL,
            "region_share_swing": RSS_SQL,
        }
    )
