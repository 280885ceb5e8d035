"""Round-4 batch FT: categorical association, higher-order memory,
and profile concordance — the Goodman-Kruskal lambda + tau and
Theil's U of predicting a customer's market segment from their
nation (three asymmetric PRE/information measures on one
contingency table), the order-2 Markov conditional entropy of
pooled per-user event-type streams (how much the SECOND lag adds
over a first-order chain), and Lin's concordance correlation
between consecutive days' 24-hour activity profiles (agreement, not
just correlation — it penalizes level and scale shifts).

Exactness discipline: lambda is a pure integer ratio; tau and U
fold the same double expressions over identical integer cell
counts; Markov triple/pair counts are exact int64 with mirrored
log2 entropy folds; CCC uses population moments over the identical
dense 24-cell grids."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from mimirsbrunn_ray.pipelines.queries_r4fk import (
    _HOUR_US,
    _round_half_away,
)
from mimirsbrunn_ray.stages.dedup import _BUCKET, add_bucket
from mimirsbrunn_ray.stages.rollup import tree_merge

_DAY_US = 86_400_000_000


def _valid(b: pa.Table, cols) -> pa.Table:
    m = None
    for c in cols:
        v = pc.is_valid(b[c])
        m = v if m is None else pc.and_(m, v)
    return b.filter(m)


_ASSOC_COLS = ["n_cust", "lambda_ppm", "gk_tau_ppm",
               "theils_u_ppm"]


def q_categorical_association_nation_segment(sf_dir):
    """One-row association panel for predicting market segment from
    nation on the customer table: Goodman-Kruskal lambda (modal
    error reduction — an exact integer ratio), Goodman-Kruskal tau
    (Gini-variance reduction), and Theil's U (entropy reduction
    I(N;S)/H(S)).  Three asymmetric measures, one distributed
    contingency pass."""
    cust = rd.read_parquet(
        f"{sf_dir}/customer.parquet",
        columns=["c_nationkey", "c_mktsegment"])

    def part(b: pa.Table) -> pa.Table:
        b = _valid(b, ("c_nationkey", "c_mktsegment"))
        g = b.group_by(["c_nationkey", "c_mktsegment"]).aggregate(
            [([], "count_all")])
        return g.rename_columns(
            ["c_nationkey", "c_mktsegment", "n"])

    def comb(b: pa.Table) -> pa.Table:
        g = b.group_by(["c_nationkey", "c_mktsegment"]).aggregate(
            [("n", "sum")])
        return g.rename_columns(
            ["c_nationkey", "c_mktsegment", "n"])

    cc = tree_merge(
        cust.map_batches(part, batch_format="pyarrow",
                         batch_size=None),
        comb,
    ).to_pandas()
    if "c_nationkey" not in cc.columns or len(cc) == 0:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _ASSOC_COLS})
    piv = cc.pivot_table(index="c_nationkey",
                         columns="c_mktsegment", values="n",
                         aggfunc="sum", fill_value=0)
    m = piv.to_numpy(np.int64)
    n = int(m.sum())
    row = m.sum(axis=1)
    col = m.sum(axis=0)
    max_col = int(col.max())
    if n == 0 or n == max_col:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _ASSOC_COLS})
    lam = (int(m.max(axis=1).sum()) - max_col) / (n - max_col)
    mf = m.astype(np.float64)
    rowf = row.astype(np.float64)
    sum_sq_rows = float(
        ((mf * mf).sum(axis=1) / rowf).sum())
    sum_sq_col = float(
        (col.astype(np.float64) ** 2).sum()) / n
    tau = (sum_sq_rows - sum_sq_col) / (n - sum_sq_col)
    pj = col.astype(np.float64) / n
    pi = rowf / n
    pij = mf / n
    hs = float(-(pj[pj > 0] * np.log(pj[pj > 0])).sum())
    hn = float(-(pi[pi > 0] * np.log(pi[pi > 0])).sum())
    flat = pij[pij > 0]
    hns = float(-(flat * np.log(flat)).sum())
    if hs == 0:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _ASSOC_COLS})
    u = (hs + hn - hns) / hs
    return pa.table({
        "n_cust": pa.array([n], pa.int64()),
        "lambda_ppm": pa.array(
            [_round_half_away(lam * 1e6)], pa.int64()),
        "gk_tau_ppm": pa.array(
            [_round_half_away(tau * 1e6)], pa.int64()),
        "theils_u_ppm": pa.array(
            [_round_half_away(u * 1e6)], pa.int64()),
    })


ASSOC_SQL = """
WITH c AS MATERIALIZED (
  SELECT c_nationkey AS nk, c_mktsegment AS seg,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM customer
  WHERE c_nationkey IS NOT NULL AND c_mktsegment IS NOT NULL
  GROUP BY 1, 2
), tot AS MATERIALIZED (
  SELECT CAST(SUM(n) AS BIGINT) AS n_all FROM c
), rowt AS MATERIALIZED (
  SELECT nk, CAST(SUM(n) AS BIGINT) AS rn,
         CAST(MAX(n) AS BIGINT) AS rmax
  FROM c GROUP BY 1
), colt AS MATERIALIZED (
  SELECT seg, CAST(SUM(n) AS BIGINT) AS cn FROM c GROUP BY 1
), colagg AS MATERIALIZED (
  SELECT CAST(MAX(cn) AS BIGINT) AS cmax,
         SUM(CAST(cn AS DOUBLE) * cn) AS sumsq_col,
         -SUM(CASE WHEN cn > 0 THEN
                CAST(cn AS DOUBLE) / tot.n_all
                * LN(CAST(cn AS DOUBLE) / tot.n_all)
              ELSE 0 END) AS hs
  FROM colt CROSS JOIN tot GROUP BY tot.n_all
), rowagg AS MATERIALIZED (
  SELECT CAST(SUM(rmax) AS BIGINT) AS sum_rmax,
         -SUM(CASE WHEN rn > 0 THEN
                CAST(rn AS DOUBLE) / tot.n_all
                * LN(CAST(rn AS DOUBLE) / tot.n_all)
              ELSE 0 END) AS hn
  FROM rowt CROSS JOIN tot GROUP BY tot.n_all
), cellagg AS MATERIALIZED (
  SELECT SUM(CAST(c.n AS DOUBLE) * c.n / rowt.rn) AS sumsq_rows,
         -SUM(CASE WHEN c.n > 0 THEN
                CAST(c.n AS DOUBLE) / tot.n_all
                * LN(CAST(c.n AS DOUBLE) / tot.n_all)
              ELSE 0 END) AS hns
  FROM c JOIN rowt USING (nk) CROSS JOIN tot
  GROUP BY tot.n_all
)
SELECT tot.n_all AS n_cust,
       CAST(ROUND(CAST(rowagg.sum_rmax - colagg.cmax AS DOUBLE)
            / (tot.n_all - colagg.cmax) * 1000000, 0) AS BIGINT)
         AS lambda_ppm,
       CAST(ROUND((cellagg.sumsq_rows
                   - colagg.sumsq_col / tot.n_all)
            / (tot.n_all - colagg.sumsq_col / tot.n_all)
            * 1000000, 0) AS BIGINT) AS gk_tau_ppm,
       CAST(ROUND((colagg.hs + rowagg.hn - cellagg.hns)
            / colagg.hs * 1000000, 0) AS BIGINT) AS theils_u_ppm
FROM tot CROSS JOIN colagg CROSS JOIN rowagg CROSS JOIN cellagg
WHERE tot.n_all > 0 AND tot.n_all <> colagg.cmax
  AND colagg.hs <> 0
"""


def q_markov2_conditional_entropy(sf_dir):
    """Order-2 memory of the pooled event-type process: over every
    per-user consecutive triple (x_{t-2}, x_{t-1}, x_t) in
    (ts, event_id) order, the conditional entropy
    H(X_t | X_{t-1}, X_{t-2}) = H(triple) - H(first-two) in bits —
    compare with the order-1 rate to see what a second lag of
    context buys a sequence model.  Triple counts fold as exact
    int64 through user-disjoint shards; only the ~125-term entropy
    fold is float."""
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

    def triples(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({
            "a": pd.Series([], dtype=object),
            "b": pd.Series([], dtype=object),
            "c": pd.Series([], dtype=object),
            "n": pd.Series([], dtype=np.int64),
        })
        if len(g) == 0:
            return empty
        g = g.sort_values(["user_id", "us", "event_id"],
                          kind="mergesort", ignore_index=True)
        uid = g["user_id"].to_numpy()
        et = g["event_type"].to_numpy()
        if len(g) < 3:
            return empty
        same2 = (uid[2:] == uid[1:-1]) & (uid[1:-1] == uid[:-2])
        a = et[:-2][same2]
        b = et[1:-1][same2]
        c = et[2:][same2]
        if len(a) == 0:
            return empty
        df = pd.DataFrame({"a": a, "b": b, "c": c})
        out = df.groupby(["a", "b", "c"], sort=False).size()
        out = out.reset_index(name="n")
        out["n"] = out["n"].astype(np.int64)
        return out

    def comb(b: pa.Table) -> pa.Table:
        g = b.group_by(["a", "b", "c"]).aggregate([("n", "sum")])
        return g.rename_columns(["a", "b", "c", "n"])

    tc = tree_merge(
        ev.map_batches(project, batch_format="pyarrow",
                       batch_size=None)
        .groupby(_BUCKET)
        .map_groups(triples, batch_format="pandas"),
        comb,
    ).to_pandas()
    cols = ["n_triples", "h_cond2_x1e6", "h_cond1_x1e6"]
    if "a" not in tc.columns or len(tc) == 0:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in cols})
    n = tc["n"].to_numpy(np.int64)
    tot = int(n.sum())
    if tot == 0:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in cols})

    def h_of(counts: np.ndarray) -> float:
        p = counts[counts > 0].astype(np.float64) / tot
        return float(-(p * np.log2(p)).sum())

    h3 = h_of(n)
    pre = tc.groupby(["a", "b"])["n"].sum().to_numpy(np.int64)
    h2pre = h_of(pre)
    suf = tc.groupby(["b", "c"])["n"].sum().to_numpy(np.int64)
    h2suf = h_of(suf)
    mid = tc.groupby(["b"])["n"].sum().to_numpy(np.int64)
    h1mid = h_of(mid)
    return pa.table({
        "n_triples": pa.array([tot], pa.int64()),
        "h_cond2_x1e6": pa.array(
            [_round_half_away((h3 - h2pre) * 1e6)], pa.int64()),
        "h_cond1_x1e6": pa.array(
            [_round_half_away((h2suf - h1mid) * 1e6)], pa.int64()),
    })


MARKOV2_SQL = """
WITH e AS MATERIALIZED (
  SELECT user_id, event_type, EPOCH_US(ts) AS us, event_id
  FROM events
  WHERE user_id IS NOT NULL AND ts IS NOT NULL
    AND event_id IS NOT NULL AND event_type IS NOT NULL
), lagd AS MATERIALIZED (
  SELECT user_id, event_type AS c,
         LAG(event_type, 1) OVER w AS b,
         LAG(event_type, 2) OVER w AS a,
         LAG(user_id, 2) OVER w AS ua
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
), tri AS MATERIALIZED (
  SELECT a, b, c, CAST(COUNT(*) AS BIGINT) AS n
  FROM lagd
  WHERE a IS NOT NULL AND ua = user_id
  GROUP BY 1, 2, 3
), tot AS MATERIALIZED (
  SELECT CAST(SUM(n) AS BIGINT) AS t FROM tri
), h3 AS (
  SELECT -SUM(CAST(n AS DOUBLE) / tot.t
              * LOG2(CAST(n AS DOUBLE) / tot.t)) AS h
  FROM tri CROSS JOIN tot GROUP BY tot.t
), h2pre AS (
  SELECT -SUM(CAST(s AS DOUBLE) / tot.t
              * LOG2(CAST(s AS DOUBLE) / tot.t)) AS h
  FROM (SELECT a, b, SUM(n) AS s FROM tri GROUP BY 1, 2)
  CROSS JOIN tot GROUP BY tot.t
), h2suf AS (
  SELECT -SUM(CAST(s AS DOUBLE) / tot.t
              * LOG2(CAST(s AS DOUBLE) / tot.t)) AS h
  FROM (SELECT b, c, SUM(n) AS s FROM tri GROUP BY 1, 2)
  CROSS JOIN tot GROUP BY tot.t
), h1mid AS (
  SELECT -SUM(CAST(s AS DOUBLE) / tot.t
              * LOG2(CAST(s AS DOUBLE) / tot.t)) AS h
  FROM (SELECT b, SUM(n) AS s FROM tri GROUP BY 1)
  CROSS JOIN tot GROUP BY tot.t
)
SELECT tot.t AS n_triples,
       CAST(ROUND((h3.h - h2pre.h) * 1000000, 0) AS BIGINT)
         AS h_cond2_x1e6,
       CAST(ROUND((h2suf.h - h1mid.h) * 1000000, 0) AS BIGINT)
         AS h_cond1_x1e6
FROM tot CROSS JOIN h3 CROSS JOIN h2pre
CROSS JOIN h2suf CROSS JOIN h1mid
WHERE tot.t > 0
"""


def q_lins_ccc_day_profiles(sf_dir):
    """Lin's concordance correlation between each consecutive day
    pair's 24-hour activity profiles: CCC = 2*s_xy / (s_x^2 + s_y^2
    + (mean_x - mean_y)^2) over the dense hour-of-day count vectors
    — unlike Pearson r it punishes days that correlate but run at a
    different level or amplitude, making it the right day-over-day
    regression-shape monitor.  Counts fold in one distributed pass;
    the 24-cell moments are mirrored double math."""
    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["ts"])

    def part(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_valid(b["ts"]))
        us = b["ts"].cast(pa.timestamp("us")).cast(pa.int64())
        day = pc.divide(us, _DAY_US)
        hr = pc.divide(us, _HOUR_US)
        hod = pc.subtract(
            hr, pc.multiply(pc.divide(hr, 24),
                            pa.scalar(24, pa.int64())))
        t = pa.table({"day": day, "hod": hod})
        g = t.group_by(["day", "hod"]).aggregate(
            [([], "count_all")])
        return g.rename_columns(["day", "hod", "c"])

    def comb(b: pa.Table) -> pa.Table:
        g = b.group_by(["day", "hod"]).aggregate([("c", "sum")])
        return g.rename_columns(["day", "hod", "c"])

    cc = tree_merge(
        ev.map_batches(part, batch_format="pyarrow",
                       batch_size=None),
        comb,
    ).to_pandas()
    cols = ["day", "ccc_ppm"]
    if "day" not in cc.columns or len(cc) == 0:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in cols})
    days = sorted(cc["day"].astype(np.int64).unique())
    grid = pd.MultiIndex.from_product(
        [days, range(24)], names=["day", "hod"]
    ).to_frame(index=False)
    g = grid.merge(cc, on=["day", "hod"], how="left")
    g["c"] = g["c"].fillna(0).astype(np.int64)
    piv = g.pivot_table(index="day", columns="hod", values="c",
                        aggfunc="sum", fill_value=0)
    m = piv.to_numpy(np.float64)
    di = list(piv.index)
    rows = {c: [] for c in cols}
    for i in range(len(di) - 1):
        if di[i + 1] != di[i] + 1:
            continue
        x, y = m[i], m[i + 1]
        mx, my = x.mean(), y.mean()
        sx = ((x - mx) ** 2).mean()
        sy = ((y - my) ** 2).mean()
        sxy = ((x - mx) * (y - my)).mean()
        den = sx + sy + (mx - my) ** 2
        if den == 0:
            continue
        ccc = 2.0 * sxy / den
        rows["day"].append(int(di[i]))
        rows["ccc_ppm"].append(_round_half_away(ccc * 1e6))
    return pa.table(
        {c: pa.array(rows[c], pa.int64()) for c in cols})


LINS_CCC_SQL = f"""
WITH e AS MATERIALIZED (
  SELECT EPOCH_US(ts) // {_DAY_US} AS day,
         (EPOCH_US(ts) // {_HOUR_US}) % 24 AS hod,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM events WHERE ts IS NOT NULL
  GROUP BY 1, 2
), grid AS MATERIALIZED (
  SELECT d.day, h.hod, CAST(COALESCE(e.c, 0) AS DOUBLE) AS c
  FROM (SELECT DISTINCT day FROM e) d
  CROSS JOIN (SELECT CAST(k AS BIGINT) AS hod
              FROM range(0, 24) r(k)) h
  LEFT JOIN e ON e.day = d.day AND e.hod = h.hod
), mom AS MATERIALIZED (
  SELECT a.day,
         AVG(a.c) AS mx, AVG(b.c) AS my,
         AVG(a.c * a.c) - AVG(a.c) * AVG(a.c) AS sx,
         AVG(b.c * b.c) - AVG(b.c) * AVG(b.c) AS sy,
         AVG(a.c * b.c) - AVG(a.c) * AVG(b.c) AS sxy
  FROM grid a JOIN grid b
    ON b.day = a.day + 1 AND b.hod = a.hod
  GROUP BY 1
)
SELECT CAST(day AS BIGINT) AS day,
       CAST(ROUND(2.0 * sxy
            / (sx + sy + (mx - my) * (mx - my)) * 1000000, 0)
            AS BIGINT) AS ccc_ppm
FROM mom
WHERE sx + sy + (mx - my) * (mx - my) <> 0
ORDER BY day
"""


def register_r4ft(queries: dict, oracles: dict) -> None:
    queries.update(
        {
            "categorical_association_nation_segment":
                q_categorical_association_nation_segment,
            "markov2_conditional_entropy":
                q_markov2_conditional_entropy,
            "lins_ccc_day_profiles": q_lins_ccc_day_profiles,
        }
    )
    oracles.update(
        {
            "categorical_association_nation_segment": ASSOC_SQL,
            "markov2_conditional_entropy": MARKOV2_SQL,
            "lins_ccc_day_profiles": LINS_CCC_SQL,
        }
    )
