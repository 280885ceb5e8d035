"""Round-4 batch GI: winback dynamics, multidimensional layout, and
service inversion — the monthly reactivation rate (customers
ordering this month after 2+ idle months but with history — the
winback KPI next to NRR's churn), a Z-order vs linear clustering
locality audit (mean Manhattan step between consecutive orders in
(custkey, day) space under Morton-code ordering versus plain date
ordering — the multidim-layout decision behind every clustered
table), and the priority-latency inversion probability (chance a
5-LOW order ships faster than a 1-URGENT one, ties half — the SLA
credibility number, computed exactly from latency histograms, no
pair enumeration).

Exactness discipline: everything here is pure integer — month
sets, Morton interleaves of bucketed coordinates, Manhattan sums,
and histogram cross products; only final shares divide once."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from mimirsbrunn_ray.pipelines.queries_r4fk import (
    _DAY_US,
    _round_half_away,
)
from mimirsbrunn_ray.stages.rollup import tree_merge

_Z_BITS = 8


def _valid(b: pa.Table, cols) -> pa.Table:
    m = None
    for c in cols:
        v = pc.is_valid(b[c])
        m = v if m is None else pc.and_(m, v)
    return b.filter(m)


_REACT_COLS = ["mon", "n_active", "n_reactivated",
               "react_ppm"]


def q_reactivation_rate_monthly(sf_dir):
    """Monthly winback census: customers active in month m, idle
    in both m-1 and m-2, but with at least one order BEFORE m-2 —
    the reactivated share of each month's actives (the KPI that
    separates winback from acquisition, which 'new actives' counts
    conflate).  Distinct (customer, month) pairs fold in one
    user-sharded pass; the month-set logic is vectorized on
    customer-disjoint shards."""
    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_orderdate"])

    def part(b: pa.Table) -> pa.Table:
        b = _valid(b, ("o_custkey", "o_orderdate"))
        if b.num_rows == 0:
            return pa.table({
                "cust": pa.array([], pa.int64()),
                "mon": pa.array([], pa.int64()),
            })
        d = b["o_orderdate"].cast(pa.timestamp("us")).to_pandas()
        mon = (d.dt.year * 12 + d.dt.month - 1).to_numpy(np.int64)
        t = pa.table({
            "cust": b["o_custkey"].cast(pa.int64()),
            "mon": pa.array(mon),
        })
        return t.group_by(["cust", "mon"]).aggregate([])

    def distinct(b: pa.Table) -> pa.Table:
        return b.select(["cust", "mon"]).group_by(
            ["cust", "mon"]).aggregate([])

    cm = tree_merge(
        orders.map_batches(part, batch_format="pyarrow",
                           batch_size=None),
        distinct,
        final_shards=8,
        shard_cols=["cust"],
    ).materialize()

    def react_partial(b: pa.Table) -> pa.Table:
        cols = ["mon", "n_active", "n_react"]
        if b.num_rows == 0 or "cust" not in b.column_names:
            return pa.table(
                {c: pa.array([], pa.int64()) for c in cols})
        df = b.select(["cust", "mon"]).to_pandas()
        df = df.sort_values(["cust", "mon"], ignore_index=True)
        cust = df["cust"].to_numpy(np.int64)
        mon = df["mon"].to_numpy(np.int64)
        # same-customer runs: for each row, check m-1/m-2 presence
        # and any-earlier-than-m-2 presence within the run
        first = np.ones(len(df), dtype=bool)
        first[1:] = cust[1:] != cust[:-1]
        starts = np.flatnonzero(first)
        run_id = np.cumsum(first) - 1
        run_start_mon = mon[starts][run_id]
        prev1 = np.zeros(len(df), dtype=bool)
        prev1[1:] = (cust[1:] == cust[:-1]) & (
            mon[1:] == mon[:-1] + 1)
        prev2 = np.zeros(len(df), dtype=bool)
        prev2[1:] = (cust[1:] == cust[:-1]) & (
            mon[1:] == mon[:-1] + 2)
        # m-1 present iff previous row is exactly m-1; m-2 present
        # needs a lookup: use searchsorted-free trick via shifted
        # comparison of the two previous rows in the run
        prev2b = np.zeros(len(df), dtype=bool)
        prev2b[2:] = (cust[2:] == cust[:-2]) & (
            mon[2:] == mon[:-2] + 2)
        has_m1 = prev1
        has_m2 = prev2 | prev2b
        had_earlier = run_start_mon < mon - 2
        react = (~has_m1) & (~has_m2) & had_earlier
        out = pd.DataFrame({
            "mon": mon,
            "n_active": np.ones(len(df), np.int64),
            "n_react": react.astype(np.int64),
        })
        agg = out.groupby("mon", sort=False).agg(
            n_active=("n_active", "sum"),
            n_react=("n_react", "sum")).reset_index()
        for c in cols:
            agg[c] = agg[c].astype(np.int64)
        return pa.Table.from_pandas(agg, preserve_index=False)

    def comb(b: pa.Table) -> pa.Table:
        g = b.group_by(["mon"]).aggregate(
            [("n_active", "sum"), ("n_react", "sum")])
        return g.rename_columns(["mon", "n_active", "n_react"])

    res = tree_merge(
        cm.map_batches(react_partial, batch_format="pyarrow",
                       batch_size=None),
        comb,
    ).to_pandas()
    if "mon" not in res.columns or len(res) == 0:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _REACT_COLS})
    res = res.sort_values("mon", ignore_index=True)
    ppm = [
        _round_half_away(r / a * 1e6)
        for r, a in zip(res["n_react"].astype(np.int64),
                        res["n_active"].astype(np.int64))
    ]
    return pa.table({
        "mon": pa.array(res["mon"].to_numpy(np.int64)),
        "n_active": pa.array(
            res["n_active"].to_numpy(np.int64)),
        "n_reactivated": pa.array(
            res["n_react"].to_numpy(np.int64)),
        "react_ppm": pa.array(ppm, pa.int64()),
    })


REACT_SQL = """
WITH cm AS MATERIALIZED (
  SELECT DISTINCT o_custkey AS cust,
         YEAR(o_orderdate) * 12 + MONTH(o_orderdate) - 1 AS mon
  FROM orders
  WHERE o_custkey IS NOT NULL AND o_orderdate IS NOT NULL
), flags AS MATERIALIZED (
  SELECT a.cust, a.mon,
         MAX(CASE WHEN b.mon = a.mon - 1 THEN 1 ELSE 0 END)
           AS has_m1,
         MAX(CASE WHEN b.mon = a.mon - 2 THEN 1 ELSE 0 END)
           AS has_m2,
         MAX(CASE WHEN b.mon < a.mon - 2 THEN 1 ELSE 0 END)
           AS had_earlier
  FROM cm a JOIN cm b ON b.cust = a.cust
  GROUP BY 1, 2
)
SELECT CAST(mon AS BIGINT) AS mon,
       CAST(COUNT(*) AS BIGINT) AS n_active,
       CAST(SUM(CASE WHEN has_m1 = 0 AND has_m2 = 0
                      AND had_earlier = 1
                     THEN 1 ELSE 0 END) AS BIGINT)
         AS n_reactivated,
       CAST(ROUND(CAST(SUM(CASE WHEN has_m1 = 0 AND has_m2 = 0
                                 AND had_earlier = 1
                                THEN 1 ELSE 0 END) AS DOUBLE)
            / COUNT(*) * 1000000, 0) AS BIGINT) AS react_ppm
FROM flags GROUP BY mon ORDER BY mon
"""

_ZORD_COLS = ["n_orders", "mean_step_linear_x1e3",
              "mean_step_zorder_x1e3", "improvement_ppm"]


def q_zorder_locality_audit(sf_dir):
    """Z-order vs linear clustering audit on orders: bucket
    (custkey, order-day) each to 8 bits over their observed ranges,
    interleave the bits into a Morton code, and compare the mean
    Manhattan step |d_cust| + |d_day| between CONSECUTIVE orders
    under Morton ordering versus plain date ordering — small steps
    = co-located pages for 2-D range scans; the improvement ratio
    is the case for Z-ordering this table.  Bucketing, codes and
    step sums are pure integers; ordering ties break by the code
    then custkey then day on both sides."""
    # scale shape: the two orderings are DISTRIBUTED sorts (the operator
    # is inherently an all-to-all); per-block consecutive steps fold
    # inside map_batches and only one boundary row per block reaches the
    # driver for stitching. Orders never land whole on the driver.
    def proj(b: pa.Table) -> pa.Table:
        b = b.filter(pc.and_(pc.is_valid(b["o_custkey"]),
                             pc.is_valid(b["o_orderdate"])))
        return pa.table({
            "cust": b["o_custkey"].cast(pa.int64()),
            "day": pc.divide(
                b["o_orderdate"].cast(pa.timestamp("us")).cast(pa.int64()),
                pa.scalar(_DAY_US, pa.int64())),
        })

    base = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_orderdate"],
    ).map_batches(proj, batch_format="pyarrow", batch_size=None).materialize()

    def mm_part(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({c: pa.array([], pa.int64()) for c in
                             ("n", "cmin", "cmax", "dmin", "dmax")})
        c = b["cust"].to_numpy(zero_copy_only=False)
        d = b["day"].to_numpy(zero_copy_only=False)
        return pa.table({
            "n": pa.array([np.int64(len(c))]),
            "cmin": pa.array([np.int64(c.min())]),
            "cmax": pa.array([np.int64(c.max())]),
            "dmin": pa.array([np.int64(d.min())]),
            "dmax": pa.array([np.int64(d.max())]),
        })

    mm = base.map_batches(
        mm_part, batch_format="pyarrow", batch_size=None).to_pandas()
    if "n" not in mm.columns or mm["n"].sum() < 2:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _ZORD_COLS})
    n = int(mm["n"].sum())
    cmin, cmax = int(mm["cmin"].min()), int(mm["cmax"].max())
    dmin, dmax = int(mm["dmin"].min()), int(mm["dmax"].max())
    maxb = (1 << _Z_BITS) - 1
    cspan = max(cmax - cmin, 1)
    dspan = max(dmax - dmin, 1)

    def add_codes(b: pa.Table) -> pa.Table:
        cust = b["cust"].to_numpy(zero_copy_only=False)
        day = b["day"].to_numpy(zero_copy_only=False)
        cb = (cust - cmin) * maxb // cspan
        db = (day - dmin) * maxb // dspan
        morton = np.zeros(len(cust), dtype=np.int64)
        for bit in range(_Z_BITS):
            morton |= ((cb >> bit) & 1) << (2 * bit + 1)
            morton |= ((db >> bit) & 1) << (2 * bit)
        return pa.table({
            "cust": b["cust"], "day": b["day"],
            "cb": pa.array(cb), "db": pa.array(db),
            "morton": pa.array(morton),
        })

    coded = base.map_batches(
        add_codes, batch_format="pyarrow", batch_size=None).materialize()

    def block_summary(b: pa.Table) -> pa.Table:
        cols = ["steps", "nrows", "f_cb", "f_db", "l_cb", "l_db",
                "f_k1", "f_k2", "f_k3"]
        if b.num_rows == 0:
            return pa.table({c: pa.array([], pa.int64()) for c in cols})
        cb = b["cb"].to_numpy(zero_copy_only=False)
        db = b["db"].to_numpy(zero_copy_only=False)
        steps = (np.abs(np.diff(cb)) + np.abs(np.diff(db))).sum() \
            if len(cb) > 1 else 0
        # first-row sort key (3 ints) orders the block summaries
        return pa.table({
            "steps": pa.array([np.int64(steps)]),
            "nrows": pa.array([np.int64(len(cb))]),
            "f_cb": pa.array([np.int64(cb[0])]),
            "f_db": pa.array([np.int64(db[0])]),
            "l_cb": pa.array([np.int64(cb[-1])]),
            "l_db": pa.array([np.int64(db[-1])]),
            "f_k1": pa.array([np.int64(b["_k1"][0].as_py())]),
            "f_k2": pa.array([np.int64(b["_k2"][0].as_py())]),
            "f_k3": pa.array([np.int64(b["_k3"][0].as_py())]),
        })

    def mean_step(sort_keys) -> float:
        k1, k2, k3 = sort_keys

        def keyed(b: pa.Table) -> pa.Table:
            return pa.table({
                "cb": b["cb"], "db": b["db"],
                "_k1": b[k1], "_k2": b[k2], "_k3": b[k3],
            })

        s = (coded.map_batches(keyed, batch_format="pyarrow",
                               batch_size=None)
             .sort(key=["_k1", "_k2", "_k3"])
             .map_batches(block_summary, batch_format="pyarrow",
                          batch_size=None)
             .to_pandas())
        s = s[s["nrows"] > 0].sort_values(
            ["f_k1", "f_k2", "f_k3"], ignore_index=True)
        total = int(s["steps"].sum())
        for i in range(1, len(s)):
            total += abs(int(s["l_cb"][i - 1]) - int(s["f_cb"][i]))
            total += abs(int(s["l_db"][i - 1]) - int(s["f_db"][i]))
        return total / (int(s["nrows"].sum()) - 1)

    # linear: day, tie custkey (third key inert); z-order: morton, ties
    m_lin = mean_step(("day", "cust", "cust"))
    m_z = mean_step(("morton", "cust", "day"))
    return pa.table({
        "n_orders": pa.array([n], pa.int64()),
        "mean_step_linear_x1e3": pa.array(
            [_round_half_away(m_lin * 1e3)], pa.int64()),
        "mean_step_zorder_x1e3": pa.array(
            [_round_half_away(m_z * 1e3)], pa.int64()),
        "improvement_ppm": pa.array(
            [_round_half_away(m_z / m_lin * 1e6)
             if m_lin > 0 else None],
            pa.int64()),
    })


def _morton_expr(col: str) -> str:
    terms = []
    for bit in range(_Z_BITS):
        terms.append(
            f"(((cb >> {bit}) & 1) << {2 * bit + 1})")
        terms.append(
            f"(((db >> {bit}) & 1) << {2 * bit})")
    return " + ".join(terms)


ZORDER_SQL = f"""
WITH o AS MATERIALIZED (
  SELECT o_custkey AS cust,
         EPOCH_US(o_orderdate) // {_DAY_US} AS day
  FROM orders
  WHERE o_custkey IS NOT NULL AND o_orderdate IS NOT NULL
), span AS MATERIALIZED (
  SELECT MIN(cust) AS cmin,
         GREATEST(MAX(cust) - MIN(cust), 1) AS cspan,
         MIN(day) AS dmin,
         GREATEST(MAX(day) - MIN(day), 1) AS dspan,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM o
), bk AS MATERIALIZED (
  SELECT o.cust, o.day,
         (o.cust - s.cmin) * {(1 << _Z_BITS) - 1} // s.cspan
           AS cb,
         (o.day - s.dmin) * {(1 << _Z_BITS) - 1} // s.dspan
           AS db,
         s.n
  FROM o CROSS JOIN span s
), mz AS MATERIALIZED (
  SELECT cust, day, cb, db, n,
         {_morton_expr('x')} AS morton
  FROM bk
), lin AS MATERIALIZED (
  SELECT SUM(step) AS tot, ANY_VALUE(n) AS n
  FROM (SELECT ABS(cb - LAG(cb) OVER w)
               + ABS(db - LAG(db) OVER w) AS step, n
        FROM mz WINDOW w AS (ORDER BY day, cust))
), zz AS MATERIALIZED (
  SELECT SUM(step) AS tot, ANY_VALUE(n) AS n
  FROM (SELECT ABS(cb - LAG(cb) OVER w)
               + ABS(db - LAG(db) OVER w) AS step, n
        FROM mz WINDOW w AS (ORDER BY morton, cust, day))
)
SELECT lin.n AS n_orders,
       CAST(ROUND(CAST(lin.tot AS DOUBLE) / (lin.n - 1) * 1000,
            0) AS BIGINT) AS mean_step_linear_x1e3,
       CAST(ROUND(CAST(zz.tot AS DOUBLE) / (zz.n - 1) * 1000, 0)
            AS BIGINT) AS mean_step_zorder_x1e3,
       CASE WHEN lin.tot = 0 THEN NULL
            ELSE CAST(ROUND(CAST(zz.tot AS DOUBLE) / lin.tot
                 * 1000000, 0) AS BIGINT) END AS improvement_ppm
FROM lin CROSS JOIN zz
WHERE lin.n >= 2
"""

_INV_COLS = ["n_urgent", "n_low", "p_inversion_ppm"]


def q_priority_latency_inversion(sf_dir):
    """SLA inversion probability: the chance that a randomly
    chosen 5-LOW order shipped its first lineitem FASTER than a
    randomly chosen 1-URGENT one (ties count half) — computed
    exactly from the two latency-day histograms via cumulative
    cross products, never enumerating pairs.  An inversion
    probability near 0.5 means priority does nothing.  Per-order
    first-ship latencies fold in one distributed pass."""
    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderdate", "o_orderpriority"])

    def o_part(b: pa.Table) -> pa.Table:
        b = _valid(b, ("o_orderkey", "o_orderdate",
                       "o_orderpriority"))
        m = pc.or_(pc.equal(b["o_orderpriority"], "1-URGENT"),
                   pc.equal(b["o_orderpriority"], "5-LOW"))
        b = b.filter(m)
        return pa.table({
            "okey": b["o_orderkey"].cast(pa.int64()),
            "oday": b["o_orderdate"].cast(
                pa.timestamp("us")).cast(pa.int64()),
            "prio": b["o_orderpriority"],
        })

    okeys = orders.map_batches(o_part, batch_format="pyarrow",
                               batch_size=None).to_pandas()
    if "okey" not in okeys.columns or len(okeys) == 0:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _INV_COLS})
    odict_day = dict(zip(okeys["okey"].astype(np.int64),
                         okeys["oday"].astype(np.int64)))
    odict_pr = dict(zip(okeys["okey"].astype(np.int64),
                        okeys["prio"]))

    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey", "l_shipdate"])

    def l_part(b: pa.Table) -> pa.Table:
        b = _valid(b, ("l_orderkey", "l_shipdate"))
        ok = pd.Series(
            b["l_orderkey"].to_numpy(zero_copy_only=False))
        keep = ok.isin(odict_day).to_numpy()
        t = pa.table({
            "okey": pa.array(
                ok.to_numpy()[keep].astype(np.int64)),
            "ship": pa.array(
                b["l_shipdate"].cast(pa.timestamp("us")).cast(
                    pa.int64()).to_numpy(
                    zero_copy_only=False)[keep]),
        })
        g = t.group_by(["okey"]).aggregate([("ship", "min")])
        return g.rename_columns(["okey", "ship"])

    def l_comb(b: pa.Table) -> pa.Table:
        g = b.group_by(["okey"]).aggregate([("ship", "min")])
        return g.rename_columns(["okey", "ship"])

    fs = tree_merge(
        li.map_batches(l_part, batch_format="pyarrow",
                       batch_size=None),
        l_comb,
        final_shards=8,
        shard_cols=["okey"],
    ).to_pandas()
    if "okey" not in fs.columns or len(fs) == 0:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _INV_COLS})
    ok = fs["okey"].to_numpy(np.int64)
    lat = np.array([
        (int(s) - odict_day[int(k)]) // _DAY_US
        for k, s in zip(ok, fs["ship"].astype(np.int64))
    ], dtype=np.int64)
    pr = np.array([odict_pr[int(k)] for k in ok])
    u = lat[pr == "1-URGENT"]
    lo = lat[pr == "5-LOW"]
    if len(u) == 0 or len(lo) == 0:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _INV_COLS})
    # P(lat_low < lat_urgent) + 0.5 P(equal) via histograms
    vmax = int(max(u.max(), lo.max()))
    vmin = int(min(u.min(), lo.min()))
    size = vmax - vmin + 1
    hu = np.bincount(u - vmin, minlength=size).astype(np.int64)
    hl = np.bincount(lo - vmin, minlength=size).astype(np.int64)
    cum_l = np.concatenate(([0], np.cumsum(hl)[:-1]))
    less = int((hu * cum_l).sum())       # low strictly faster
    ties = int((hu * hl).sum())
    total = len(u) * len(lo)
    p = (less + 0.5 * ties) / total
    return pa.table({
        "n_urgent": pa.array([len(u)], pa.int64()),
        "n_low": pa.array([len(lo)], pa.int64()),
        "p_inversion_ppm": pa.array(
            [_round_half_away(p * 1e6)], pa.int64()),
    })


INVERSION_SQL = f"""
WITH fs AS MATERIALIZED (
  SELECT o.o_orderkey,
         o.o_orderpriority AS prio,
         (MIN(EPOCH_US(l.l_shipdate))
          - EPOCH_US(o.o_orderdate)) // {_DAY_US} AS lat
  FROM orders o JOIN lineitem l
    ON l.l_orderkey = o.o_orderkey
  WHERE o.o_orderpriority IN ('1-URGENT', '5-LOW')
    AND o.o_orderdate IS NOT NULL AND l.l_shipdate IS NOT NULL
    AND o.o_orderkey IS NOT NULL
  GROUP BY 1, 2, EPOCH_US(o.o_orderdate)
), hu AS MATERIALIZED (
  SELECT lat, CAST(COUNT(*) AS BIGINT) AS n FROM fs
  WHERE prio = '1-URGENT' GROUP BY 1
), hl AS MATERIALIZED (
  SELECT lat, CAST(COUNT(*) AS BIGINT) AS n FROM fs
  WHERE prio = '5-LOW' GROUP BY 1
), tot AS MATERIALIZED (
  SELECT (SELECT CAST(SUM(n) AS BIGINT) FROM hu) AS nu,
         (SELECT CAST(SUM(n) AS BIGINT) FROM hl) AS nl
), cross_ AS (
  SELECT
    CAST(SUM(CASE WHEN hl.lat < hu.lat
                  THEN hu.n * hl.n ELSE 0 END) AS BIGINT)
      AS less,
    CAST(SUM(CASE WHEN hl.lat = hu.lat
                  THEN hu.n * hl.n ELSE 0 END) AS BIGINT)
      AS ties
  FROM hu CROSS JOIN hl
)
SELECT tot.nu AS n_urgent,
       tot.nl AS n_low,
       CAST(ROUND((cross_.less + 0.5 * cross_.ties)
            / (CAST(tot.nu AS DOUBLE) * tot.nl) * 1000000, 0)
            AS BIGINT) AS p_inversion_ppm
FROM cross_ CROSS JOIN tot
WHERE tot.nu > 0 AND tot.nl > 0
"""


def register_r4gi(queries: dict, oracles: dict) -> None:
    queries.update(
        {
            "reactivation_rate_monthly": q_reactivation_rate_monthly,
            "zorder_locality_audit": q_zorder_locality_audit,
            "priority_latency_inversion":
                q_priority_latency_inversion,
        }
    )
    oracles.update(
        {
            "reactivation_rate_monthly": REACT_SQL,
            "zorder_locality_audit": ZORDER_SQL,
            "priority_latency_inversion": INVERSION_SQL,
        }
    )
