"""Round-4 batch HW: habit decay, log-normality, and the
annualization trap — the DAU-overlap decay curve (user-set
Jaccard between days at lags 1, 2, 3, 7 and 14 — how fast the
active base turns over, and whether a weekly echo exists), a
Jarque-Bera normality test on LOG order values (log-normal money
is the modeling default; this is the check), and the
annualization error (12x each month versus the actual surrounding
year — the worst-case cost of naive run-rate math).

Exactness discipline: day-lag overlaps are pure integer set
counts; JB folds exact-input double central moments two-pass;
annualization uses exact cents with one mirrored division per
month."""

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

_LAGS = (1, 2, 3, 7, 14)


def _valid(b: pa.Table, cols) -> pa.Table:
    m = None
    for c in cols:
        v = pc.is_valid(b[c])
        m = v if m is None else pc.and_(m, v)
    return b.filter(m)


_DJL_COLS = ["lag_days", "n_day_pairs", "mean_jaccard_ppm"]


def q_dau_jaccard_by_lag(sf_dir):
    """Habit decay curve: the mean user-set Jaccard between days d
    and d+L for L in (1, 2, 3, 7, 14) — the decay rate is the
    active base's turnover speed, and a bump at L=7 is the weekly
    rhythm in one number.  Distinct (user, day) pairs fold once;
    the per-lag overlap scan is vectorized on user-disjoint
    shards."""
    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts"])

    def part(b: pa.Table) -> pa.Table:
        b = _valid(b, ("user_id", "ts"))
        us = b["ts"].cast(pa.timestamp("us")).cast(pa.int64())
        t = pa.table({
            "user_id": b["user_id"].cast(pa.int64()),
            "day": pc.divide(us, _DAY_US),
        })
        return t.group_by(["user_id", "day"]).aggregate([])

    def distinct(b: pa.Table) -> pa.Table:
        return b.select(["user_id", "day"]).group_by(
            ["user_id", "day"]).aggregate([])

    ud = tree_merge(
        ev.map_batches(part, batch_format="pyarrow",
                       batch_size=None),
        distinct,
        final_shards=8,
        shard_cols=["user_id"],
    ).materialize()

    def day_counts(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "day" not in b.column_names:
            return pa.table({
                "day": pa.array([], pa.int64()),
                "c": pa.array([], pa.int64()),
            })
        g = b.select(["day"]).group_by(["day"]).aggregate(
            [([], "count_all")])
        return g.rename_columns(["day", "c"])

    def sum_c(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "day" not in b.column_names:
            return pa.table({
                "day": pa.array([], pa.int64()),
                "c": pa.array([], pa.int64()),
            })
        g = b.group_by(["day"]).aggregate([("c", "sum")])
        return g.rename_columns(["day", "c"])

    dc = tree_merge(
        ud.map_batches(day_counts, batch_format="pyarrow",
                       batch_size=None),
        sum_c,
    ).to_pandas()

    def lag_inter(b: pa.Table) -> pa.Table:
        cols = ["lag", "day", "c"]
        if b.num_rows == 0 or "user_id" not in b.column_names:
            return pa.table(
                {c: pa.array([], pa.int64()) for c in cols})
        df = b.select(["user_id", "day"]).to_pandas()
        df = df.sort_values(["user_id", "day"],
                            ignore_index=True)
        uid = df["user_id"].to_numpy(np.int64)
        day = df["day"].to_numpy(np.int64)
        rows = {"lag": [], "day": [], "c": []}
        # shards are user-disjoint: per-user day sets complete
        for lag in _LAGS:
            # membership check day+lag within same user via
            # searchsorted on the user's sorted days
            first = np.ones(len(df), dtype=bool)
            first[1:] = uid[1:] != uid[:-1]
            starts = np.flatnonzero(first)
            ends = np.append(starts[1:], len(df))
            for s, e in zip(starts, ends):
                ds = day[s:e]
                hits = np.isin(ds + lag, ds,
                               assume_unique=True)
                hd = ds[hits]
                for d in hd:
                    rows["lag"].append(lag)
                    rows["day"].append(int(d))
                    rows["c"].append(1)
        if not rows["lag"]:
            return pa.table(
                {c: pa.array([], pa.int64()) for c in cols})
        df2 = pd.DataFrame(rows).groupby(
            ["lag", "day"])["c"].sum().reset_index()
        for c in cols:
            df2[c] = df2[c].astype(np.int64)
        return pa.Table.from_pandas(df2, preserve_index=False)

    def comb(b: pa.Table) -> pa.Table:
        g = b.group_by(["lag", "day"]).aggregate([("c", "sum")])
        return g.rename_columns(["lag", "day", "c"])

    inter = tree_merge(
        ud.map_batches(lag_inter, batch_format="pyarrow",
                       batch_size=None),
        comb,
    ).to_pandas()
    if ("day" not in dc.columns or len(dc) == 0):
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _DJL_COLS})
    cnt = dict(zip(dc["day"].astype(np.int64),
                   dc["c"].astype(np.int64)))
    imap = {}
    if "lag" in inter.columns:
        for _, r in inter.iterrows():
            imap[(int(r["lag"]), int(r["day"]))] = int(r["c"])
    out = {c: [] for c in _DJL_COLS}
    for lag in _LAGS:
        jacs = []
        for d in sorted(cnt):
            if d + lag not in cnt:
                continue
            a, b_ = cnt[d], cnt[d + lag]
            nb = imap.get((lag, d), 0)
            jacs.append(nb / (a + b_ - nb))
        if not jacs:
            continue
        out["lag_days"].append(lag)
        out["n_day_pairs"].append(len(jacs))
        out["mean_jaccard_ppm"].append(
            _round_half_away(float(np.mean(jacs)) * 1e6))
    return pa.table(
        {c: pa.array(out[c], pa.int64()) for c in _DJL_COLS})


DJL_SQL = f"""
WITH ud AS MATERIALIZED (
  SELECT DISTINCT user_id, EPOCH_US(ts) // {_DAY_US} AS day
  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
), dc AS MATERIALIZED (
  SELECT day, CAST(COUNT(*) AS BIGINT) AS c FROM ud GROUP BY 1
), lags AS (
  SELECT * FROM (VALUES (1), (2), (3), (7), (14)) v(lag)
), inter AS MATERIALIZED (
  SELECT lags.lag, a.day, CAST(COUNT(*) AS BIGINT) AS nb
  FROM lags
  CROSS JOIN ud a
  JOIN ud b ON b.user_id = a.user_id
           AND b.day = a.day + lags.lag
  GROUP BY 1, 2
), jac AS (
  SELECT lags.lag, d1.day,
         CAST(COALESCE(inter.nb, 0) AS DOUBLE)
           / (d1.c + d2.c - COALESCE(inter.nb, 0)) AS j
  FROM lags
  CROSS JOIN dc d1
  JOIN dc d2 ON d2.day = d1.day + lags.lag
  LEFT JOIN inter ON inter.lag = lags.lag
                 AND inter.day = d1.day
)
SELECT CAST(lag AS BIGINT) AS lag_days,
       CAST(COUNT(*) AS BIGINT) AS n_day_pairs,
       CAST(ROUND(AVG(j) * 1000000, 0) AS BIGINT)
         AS mean_jaccard_ppm
FROM jac GROUP BY 1 ORDER BY lag_days
"""

_JBO_COLS = ["n_orders", "skew_x1e6", "ex_kurt_x1e6",
             "jb_x1e3"]


def q_jb_log_order_value(sf_dir):
    """Is order money log-normal?  The Jarque-Bera statistic on
    LOG order values (cents): skewness, excess kurtosis, and JB =
    n/6 (S^2 + K^2/4) — a huge JB means even the log transform
    does not tame the tail and median-based models are mandatory.
    Two-pass central moments fold exactly-derived doubles."""
    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_totalprice"])

    def part(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_valid(b["o_totalprice"]))
        x = b["o_totalprice"].cast(pa.float64()).to_numpy(
            zero_copy_only=False)
        cents = np.where(
            x >= 0, np.floor(x * 100.0 + 0.5),
            np.ceil(x * 100.0 - 0.5)).astype(np.int64)
        cents = cents[cents > 0]
        return pa.table(
            {"lv": pa.array(np.log(cents.astype(np.float64)))})

    lv = orders.map_batches(part, batch_format="pyarrow",
                            batch_size=None).to_pandas()
    if "lv" not in lv.columns or len(lv) < 4:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _JBO_COLS})
    v = lv["lv"].to_numpy(np.float64)
    n = len(v)
    mu = v.mean()
    d = v - mu
    m2 = float((d * d).mean())
    m3 = float((d ** 3).mean())
    m4 = float((d ** 4).mean())
    if m2 == 0:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _JBO_COLS})
    s = m3 / m2 ** 1.5
    k = m4 / (m2 * m2) - 3.0
    jb = n / 6.0 * (s * s + k * k / 4.0)
    return pa.table({
        "n_orders": pa.array([n], pa.int64()),
        "skew_x1e6": pa.array(
            [_round_half_away(s * 1e6)], pa.int64()),
        "ex_kurt_x1e6": pa.array(
            [_round_half_away(k * 1e6)], pa.int64()),
        "jb_x1e3": pa.array(
            [_round_half_away(jb * 1e3)], pa.int64()),
    })


JBO_SQL = """
WITH lv AS MATERIALIZED (
  SELECT LN(CAST(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)
               AS DOUBLE)) AS v
  FROM orders
  WHERE o_totalprice IS NOT NULL
    AND CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) > 0
), mu AS MATERIALIZED (
  SELECT AVG(v) AS m, CAST(COUNT(*) AS BIGINT) AS n FROM lv
), mom AS (
  SELECT AVG((lv.v - mu.m) * (lv.v - mu.m)) AS m2,
         AVG((lv.v - mu.m) * (lv.v - mu.m)
             * (lv.v - mu.m)) AS m3,
         AVG((lv.v - mu.m) * (lv.v - mu.m)
             * (lv.v - mu.m) * (lv.v - mu.m)) AS m4
  FROM lv CROSS JOIN mu
)
SELECT mu.n AS n_orders,
       CAST(ROUND(mom.m3 / POW(mom.m2, 1.5) * 1000000, 0)
            AS BIGINT) AS skew_x1e6,
       CAST(ROUND((mom.m4 / (mom.m2 * mom.m2) - 3.0) * 1000000,
            0) AS BIGINT) AS ex_kurt_x1e6,
       CAST(ROUND(mu.n / 6.0
            * (POW(mom.m3 / POW(mom.m2, 1.5), 2)
               + POW(mom.m4 / (mom.m2 * mom.m2) - 3.0, 2) / 4.0)
            * 1000, 0) AS BIGINT) AS jb_x1e3
FROM mu CROSS JOIN mom
WHERE mu.n >= 4 AND mom.m2 <> 0
"""

_ANE_COLS = ["n_months", "max_over_ppm", "max_under_ppm"]


def q_annualization_error(sf_dir):
    """The run-rate trap, quantified: for each month with a full
    surrounding calendar YEAR of data, compare 12x that month's
    revenue to the year's actual total — the worst over- and
    under-annualization (ppm of the true total) is exactly how
    wrong 'multiply this month by twelve' can be on this data.
    Monthly cents fold exactly."""
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
            {c: pa.array([], pa.int64()) for c in _ANE_COLS})
    cmap = dict(zip(mm["mon"].astype(np.int64),
                    mm["cents"].astype(np.int64)))
    # calendar years fully covered: months y*12 .. y*12+11
    years = {}
    for m in cmap:
        years.setdefault(m // 12, []).append(m)
    ratios = []
    for y, mons in years.items():
        if len(mons) != 12:
            continue
        total = sum(cmap[m] for m in mons)
        if total == 0:
            continue
        for m in mons:
            ratios.append(12 * cmap[m] / total)
    if not ratios:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _ANE_COLS})
    arr = np.array(ratios)
    return pa.table({
        "n_months": pa.array([len(arr)], pa.int64()),
        "max_over_ppm": pa.array(
            [_round_half_away(float(arr.max()) * 1e6)],
            pa.int64()),
        "max_under_ppm": pa.array(
            [_round_half_away(float(arr.min()) * 1e6)],
            pa.int64()),
    })


ANE_SQL = """
WITH mm AS MATERIALIZED (
  SELECT YEAR(o_orderdate) * 12 + MONTH(o_orderdate) - 1 AS mon,
         CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT))
              AS BIGINT) AS cents
  FROM orders
  WHERE o_orderdate IS NOT NULL AND o_totalprice IS NOT NULL
  GROUP BY 1
), yr AS MATERIALIZED (
  SELECT mon // 12 AS y,
         CAST(COUNT(*) AS BIGINT) AS n_mon,
         CAST(SUM(cents) AS BIGINT) AS total
  FROM mm GROUP BY 1
), ratios AS (
  SELECT 12.0 * mm.cents / yr.total AS r
  FROM mm JOIN yr ON yr.y = mm.mon // 12
  WHERE yr.n_mon = 12 AND yr.total <> 0
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_months,
       CAST(ROUND(MAX(r) * 1000000, 0) AS BIGINT)
         AS max_over_ppm,
       CAST(ROUND(MIN(r) * 1000000, 0) AS BIGINT)
         AS max_under_ppm
FROM ratios HAVING COUNT(*) > 0
"""


def register_r4hw(queries: dict, oracles: dict) -> None:
    queries.update(
        {
            "dau_jaccard_by_lag": q_dau_jaccard_by_lag,
            "jb_log_order_value": q_jb_log_order_value,
            "annualization_error": q_annualization_error,
        }
    )
    oracles.update(
        {
            "dau_jaccard_by_lag": DJL_SQL,
            "jb_log_order_value": JBO_SQL,
            "annualization_error": ANE_SQL,
        }
    )
