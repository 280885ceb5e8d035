"""Round-4 batch FP: autoregression, rank association, and privacy
risk — AR(2) Yule-Walker coefficients per event type over the dense
hourly grid (the minimal model distinguishing momentum from mean
reversion), Kendall tau-b (tie-corrected) between per-user click and
purchase volumes, and a t-closeness audit of customer nations
(total-variation distance between each nation's market-segment mix
and the global mix — the privacy criterion beyond k-anonymity /
l-diversity).

Exactness discipline: AR(2) folds mirrored double moment sums over
identical dense grids; tau-b's concordant/discordant/tie counts are
pure integers (one O(n^2) pair sweep over the bounded per-user
table) with a single final sqrt; t-closeness is exact rational
count ratios folded through the same 5-term abs sum on both
sides."""

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
from mimirsbrunn_ray.pipelines.queries_r4fl import (
    _dense_hour_counts,
)
from mimirsbrunn_ray.stages.rollup import tree_merge


def _valid(b: pa.Table, cols) -> pa.Table:
    m = None
    for c in cols:
        v = pc.is_valid(b[c])
        m = v if m is None else pc.and_(m, v)
    return b.filter(m)


def q_ar2_yule_walker_hourly(sf_dir):
    """AR(2) fit per event type by Yule-Walker on the dense hourly
    count grid: from the lag-1/lag-2 autocorrelations r1, r2,
    phi1 = r1(1 - r2)/(1 - r1^2) and phi2 = (r2 - r1^2)/(1 - r1^2)
    — phi2 < 0 is mean reversion, phi2 > 0 momentum beyond what
    lag-1 explains.  Counts are one distributed pass; the moment
    sums are vectorized driver math on the tiny grid."""
    g = _dense_hour_counts(sf_dir)
    cols = ["event_type", "n_hours", "r1_x1e6", "r2_x1e6",
            "phi1_x1e6", "phi2_x1e6"]
    if g is None:
        return pa.table({
            "event_type": pa.array([], pa.string()),
            **{c: pa.array([], pa.int64()) for c in cols[1:]},
        })
    out = {c: [] for c in cols}
    for et, sub in g.groupby("event_type", sort=True):
        x = sub.sort_values("hour")["c"].to_numpy(np.float64)
        T = len(x)
        if T < 3:
            continue
        xb = x.mean()
        d = x - xb
        c0 = float((d * d).sum())
        if c0 == 0:
            continue
        r1 = float((d[:-1] * d[1:]).sum()) / c0
        r2 = float((d[:-2] * d[2:]).sum()) / c0
        den = 1.0 - r1 * r1
        if den == 0:
            continue
        phi1 = r1 * (1.0 - r2) / den
        phi2 = (r2 - r1 * r1) / den
        out["event_type"].append(et)
        out["n_hours"].append(T)
        out["r1_x1e6"].append(_round_half_away(r1 * 1e6))
        out["r2_x1e6"].append(_round_half_away(r2 * 1e6))
        out["phi1_x1e6"].append(_round_half_away(phi1 * 1e6))
        out["phi2_x1e6"].append(_round_half_away(phi2 * 1e6))
    return pa.table({
        "event_type": pa.array(out["event_type"], pa.string()),
        **{c: pa.array(out[c], pa.int64()) for c in cols[1:]},
    })


AR2_SQL = f"""
WITH hc AS MATERIALIZED (
  SELECT event_type, EPOCH_US(ts) // {_HOUR_US} AS hour,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM events
  WHERE event_type IS NOT NULL AND ts IS NOT NULL
  GROUP BY 1, 2
), span AS MATERIALIZED (
  SELECT MIN(hour) AS hmin, MAX(hour) AS hmax FROM hc
), grid AS MATERIALIZED (
  SELECT t.event_type, s.hmin + r.k AS hour,
         CAST(COALESCE(hc.c, 0) AS DOUBLE) AS c
  FROM (SELECT DISTINCT event_type FROM hc) t
  CROSS JOIN span s
  JOIN range(0, 100000) r(k) ON s.hmin + r.k <= s.hmax
  LEFT JOIN hc ON hc.event_type = t.event_type
              AND hc.hour = s.hmin + r.k
), d AS MATERIALIZED (
  SELECT event_type, hour,
         c - AVG(c) OVER (PARTITION BY event_type) AS dv,
         COUNT(*) OVER (PARTITION BY event_type) AS n_hours
  FROM grid
), mom AS MATERIALIZED (
  SELECT a.event_type,
         ANY_VALUE(a.n_hours) AS n_hours,
         SUM(a.dv * a.dv) AS c0,
         SUM(CASE WHEN b1.dv IS NOT NULL
                  THEN a.dv * b1.dv ELSE 0 END) AS c1,
         SUM(CASE WHEN b2.dv IS NOT NULL
                  THEN a.dv * b2.dv ELSE 0 END) AS c2
  FROM d a
  LEFT JOIN d b1 ON b1.event_type = a.event_type
                AND b1.hour = a.hour + 1
  LEFT JOIN d b2 ON b2.event_type = a.event_type
                AND b2.hour = a.hour + 2
  GROUP BY 1
), r AS (
  SELECT event_type, n_hours, c1 / c0 AS r1, c2 / c0 AS r2
  FROM mom WHERE n_hours >= 3 AND c0 <> 0
)
SELECT event_type,
       CAST(n_hours AS BIGINT) AS n_hours,
       CAST(ROUND(r1 * 1000000, 0) AS BIGINT) AS r1_x1e6,
       CAST(ROUND(r2 * 1000000, 0) AS BIGINT) AS r2_x1e6,
       CAST(ROUND(r1 * (1 - r2) / (1 - r1 * r1) * 1000000, 0)
            AS BIGINT) AS phi1_x1e6,
       CAST(ROUND((r2 - r1 * r1) / (1 - r1 * r1) * 1000000, 0)
            AS BIGINT) AS phi2_x1e6
FROM r WHERE 1 - r1 * r1 <> 0
ORDER BY event_type
"""


def q_kendall_taub_clicks_purchases(sf_dir):
    """One-row tie-corrected rank association: Kendall tau-b between
    each user's click count and purchase count — concordant,
    discordant and per-variable tie pair counts are exact integers
    from one O(n^2) sweep over the bounded per-user table; tau-b =
    (C - D)/sqrt((n0 - t_x)(n0 - t_y)) is the only float step.
    Per-user features fold in one distributed pass."""
    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "event_type"])

    def part(b: pa.Table) -> pa.Table:
        b = _valid(b, ("user_id", "event_type"))
        t = pa.table({
            "user_id": b["user_id"],
            "clicks": pc.cast(
                pc.equal(b["event_type"], "click"), pa.int64()),
            "purch": pc.cast(
                pc.equal(b["event_type"], "purchase"), pa.int64()),
        })
        g = t.group_by(["user_id"]).aggregate(
            [("clicks", "sum"), ("purch", "sum")])
        return g.rename_columns(["user_id", "clicks", "purch"])

    def comb(b: pa.Table) -> pa.Table:
        g = b.group_by(["user_id"]).aggregate(
            [("clicks", "sum"), ("purch", "sum")])
        return g.rename_columns(["user_id", "clicks", "purch"])

    per_user = tree_merge(
        ev.map_batches(part, batch_format="pyarrow",
                       batch_size=None),
        comb,
        final_shards=8,
        shard_cols=["user_id"],
    ).to_pandas()
    cols = ["n_users", "concordant", "discordant", "taub_x1e6"]
    if "user_id" not in per_user.columns or len(per_user) < 2:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in cols})
    x = per_user["clicks"].to_numpy(np.int64)
    y = per_user["purch"].to_numpy(np.int64)
    n = len(x)
    dx = np.sign(x[:, None] - x[None, :])
    dy = np.sign(y[:, None] - y[None, :])
    iu = np.triu_indices(n, k=1)
    s = dx[iu] * dy[iu]
    conc = int((s > 0).sum())
    disc = int((s < 0).sum())
    tx = int((dx[iu] == 0).sum())
    ty = int((dy[iu] == 0).sum())
    n0 = n * (n - 1) // 2
    den = np.sqrt(float(n0 - tx) * float(n0 - ty))
    if den == 0:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in cols})
    taub = (conc - disc) / den
    return pa.table({
        "n_users": pa.array([n], pa.int64()),
        "concordant": pa.array([conc], pa.int64()),
        "discordant": pa.array([disc], pa.int64()),
        "taub_x1e6": pa.array(
            [_round_half_away(taub * 1e6)], pa.int64()),
    })


TAUB_SQL = """
WITH u AS MATERIALIZED (
  SELECT user_id,
         CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
              AS BIGINT) AS x,
         CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0
                  END) AS BIGINT) AS y
  FROM events
  WHERE user_id IS NOT NULL AND event_type IS NOT NULL
  GROUP BY 1
), p AS MATERIALIZED (
  SELECT SIGN(a.x - b.x) * SIGN(a.y - b.y) AS s,
         CASE WHEN a.x = b.x THEN 1 ELSE 0 END AS tie_x,
         CASE WHEN a.y = b.y THEN 1 ELSE 0 END AS tie_y
  FROM u a JOIN u b ON a.user_id < b.user_id
), agg AS (
  SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM u) AS n,
         CAST(SUM(CASE WHEN s > 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS conc,
         CAST(SUM(CASE WHEN s < 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS disc,
         CAST(SUM(tie_x) AS BIGINT) AS tx,
         CAST(SUM(tie_y) AS BIGINT) AS ty,
         CAST(COUNT(*) AS BIGINT) AS n0
  FROM p
)
SELECT n AS n_users,
       conc AS concordant,
       disc AS discordant,
       CAST(ROUND((conc - disc)
            / SQRT(CAST(n0 - tx AS DOUBLE)
                   * CAST(n0 - ty AS DOUBLE)) * 1000000, 0)
            AS BIGINT) AS taub_x1e6
FROM agg
WHERE n >= 2 AND (n0 - tx) * (n0 - ty) > 0
"""


def q_t_closeness_audit(sf_dir):
    """t-closeness privacy audit of the customer table: treating
    nation as the quasi-identifier group and market segment as the
    sensitive attribute, report per nation the total-variation
    distance 0.5 * sum_s |p_g(s) - q(s)| between the group's segment
    mix and the global mix — the strongest of the k-anonymity /
    l-diversity / t-closeness ladder.  Counts fold in one
    distributed pass; the distance is a 5-term mirrored abs sum."""
    cust = rd.read_parquet(
        f"{sf_dir}/customer.parquet",
        columns=["c_nationkey", "c_mktsegment"])

    def part(b: pa.Table) -> pa.Table:
        b = _valid(b, ("c_nationkey", "c_mktsegment"))
        g = b.group_by(["c_nationkey", "c_mktsegment"]).aggregate(
            [([], "count_all")])
        return g.rename_columns(
            ["c_nationkey", "c_mktsegment", "c"])

    def comb(b: pa.Table) -> pa.Table:
        g = b.group_by(["c_nationkey", "c_mktsegment"]).aggregate(
            [("c", "sum")])
        return g.rename_columns(
            ["c_nationkey", "c_mktsegment", "c"])

    cc = tree_merge(
        cust.map_batches(part, batch_format="pyarrow",
                         batch_size=None),
        comb,
    ).to_pandas()
    cols = ["nationkey", "n_cust", "tv_ppm"]
    if "c_nationkey" not in cc.columns or len(cc) == 0:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in cols})
    segs = sorted(cc["c_mktsegment"].unique())
    nats = sorted(cc["c_nationkey"].astype(np.int64).unique())
    grid = pd.MultiIndex.from_product(
        [nats, segs], names=["c_nationkey", "c_mktsegment"]
    ).to_frame(index=False)
    g = grid.merge(cc, on=["c_nationkey", "c_mktsegment"],
                   how="left")
    g["c"] = g["c"].fillna(0).astype(np.int64)
    piv = g.pivot_table(index="c_nationkey",
                        columns="c_mktsegment", values="c",
                        aggfunc="sum", fill_value=0)
    m = piv.to_numpy(np.float64)
    ng = m.sum(axis=1)
    tot = m.sum()
    q = m.sum(axis=0) / tot
    rows = {c: [] for c in cols}
    for i, nat in enumerate(piv.index):
        if ng[i] == 0:
            continue
        p = m[i] / ng[i]
        tv = 0.5 * float(np.abs(p - q).sum())
        rows["nationkey"].append(int(nat))
        rows["n_cust"].append(int(ng[i]))
        rows["tv_ppm"].append(_round_half_away(tv * 1e6))
    return pa.table(
        {c: pa.array(rows[c], pa.int64()) for c in cols})


T_CLOSE_SQL = """
WITH c AS MATERIALIZED (
  SELECT c_nationkey, c_mktsegment,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM customer
  WHERE c_nationkey IS NOT NULL AND c_mktsegment IS NOT NULL
  GROUP BY 1, 2
), grid AS MATERIALIZED (
  SELECT nk.c_nationkey, sg.c_mktsegment, COALESCE(c.n, 0) AS n
  FROM (SELECT DISTINCT c_nationkey FROM c) nk
  CROSS JOIN (SELECT DISTINCT c_mktsegment FROM c) sg
  LEFT JOIN c USING (c_nationkey, c_mktsegment)
), tots AS MATERIALIZED (
  SELECT c_mktsegment,
         CAST(SUM(n) AS BIGINT) AS n_seg
  FROM grid GROUP BY 1
), gl AS MATERIALIZED (
  SELECT CAST(SUM(n) AS BIGINT) AS n_all FROM grid
), ngc AS MATERIALIZED (
  SELECT c_nationkey, CAST(SUM(n) AS BIGINT) AS ng
  FROM grid GROUP BY 1
)
SELECT CAST(g.c_nationkey AS BIGINT) AS nationkey,
       CAST(ANY_VALUE(ngc.ng) AS BIGINT) AS n_cust,
       CAST(ROUND(0.5 * SUM(ABS(
              CAST(g.n AS DOUBLE) / ngc.ng
              - CAST(t.n_seg AS DOUBLE) / gl.n_all))
            * 1000000, 0) AS BIGINT) AS tv_ppm
FROM grid g
JOIN ngc USING (c_nationkey)
JOIN tots t USING (c_mktsegment)
CROSS JOIN gl
WHERE ngc.ng > 0
GROUP BY g.c_nationkey
ORDER BY nationkey
"""


def register_r4fp(queries: dict, oracles: dict) -> None:
    queries.update(
        {
            "ar2_yule_walker_hourly": q_ar2_yule_walker_hourly,
            "kendall_taub_clicks_purchases":
                q_kendall_taub_clicks_purchases,
            "t_closeness_audit": q_t_closeness_audit,
        }
    )
    oracles.update(
        {
            "ar2_yule_walker_hourly": AR2_SQL,
            "kendall_taub_clicks_purchases": TAUB_SQL,
            "t_closeness_audit": T_CLOSE_SQL,
        }
    )
