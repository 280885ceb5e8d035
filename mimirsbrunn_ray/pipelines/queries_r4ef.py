"""Round-4 batch EF: partial autocorrelations (Durbin-Levinson, lags
1-3) over dense hourly counts, the Atkinson inequality index of
per-user event counts, and Croston's intermittent-demand forecast in
integer fixed point per part.

Exactness discipline: PACF builds on exact int64 lag-product sums with
the Durbin-Levinson algebra mirrored expression-for-expression; the
Atkinson index folds per-term x1e6-snapped square roots (exact integer
sums) and closes with one mirrored ratio; Croston is an integer floor
recursion (alpha = 1/2) identical to the engine's Holt discipline, so
level/interval states compare exactly and only the closing rate ratio
is snapped."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from mimirsbrunn_ray.stages.dedup import _BUCKET, add_bucket
from mimirsbrunn_ray.stages.rollup import tree_merge

_HOUR_US = 3_600_000_000
_DAY_US = 86_400_000_000


def _round_half_away(x):
    if isinstance(x, np.ndarray):
        return np.where(
            x >= 0, np.floor(x + 0.5), np.ceil(x - 0.5)
        ).astype(np.int64)
    return int(np.floor(x + 0.5) if x >= 0 else np.ceil(x - 0.5))


def _not_null(b: pa.Table, cols) -> pa.Table:
    m = None
    for c in cols:
        v = pc.is_valid(b[c])
        m = v if m is None else pc.and_(m, v)
    return b.filter(m)


def _sum_by(t: pa.Table, keys: list[str], vals: list[str]) -> pa.Table:
    g = t.group_by(keys).aggregate([(v, "sum") for v in vals])
    g = g.select(keys + [f"{v}_sum" for v in vals])
    return g.rename_columns(keys + vals)


# ---------------------------------------------------------------------------
# PACF lags 1-3 via Durbin-Levinson over dense hourly counts
# ---------------------------------------------------------------------------


def q_pacf_hourly(sf_dir):
    """Per event type: partial autocorrelations at lags 1-3 of the
    dense 0-filled hourly count series via the Durbin-Levinson
    recursion — the AR-order diagnostic that separates 'carries real
    hour-to-hour momentum' (pacf2/3 die out) from 'needs a longer AR
    memory'. Lag products fold from exact int64 counts; the recursion
    algebra runs in mirrored doubles, x1e6 snap, NULL where a
    denominator degenerates."""
    ev = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_type", "ts"])

    def partial(b: pa.Table) -> pa.Table:
        b = _not_null(b, ("event_type", "ts"))
        us = b["ts"].cast(pa.timestamp("us")).cast(pa.int64()).to_numpy()
        t = pa.table(
            {
                "event_type": b["event_type"],
                "h": pa.array((us // _HOUR_US).astype(np.int64)),
                "c": pa.array(np.ones(len(us), np.int64)),
            }
        )
        return _sum_by(t, ["event_type", "h"], ["c"])

    hourly = tree_merge(
        ev.map_batches(partial, batch_format="pyarrow", batch_size=None),
        lambda b: _sum_by(b, ["event_type", "h"], ["c"]),
    ).to_pandas()
    cols = ["event_type", "t_len", "pacf1_x1e6", "pacf2_x1e6", "pacf3_x1e6"]
    if not len(hourly) or "event_type" not in hourly.columns:
        return pa.table(
            {
                "event_type": pa.array([], pa.string()),
                **{c: pa.array([], pa.int64()) for c in cols[1:]},
            }
        )
    types = sorted(hourly["event_type"].unique())
    hmin = int(hourly["h"].min())
    width = int(hourly["h"].max()) - hmin + 1
    tix = {t: i for i, t in enumerate(types)}
    mat = np.zeros((len(types), width), dtype=np.int64)
    mat[
        hourly["event_type"].map(tix).to_numpy(),
        hourly["h"].to_numpy(dtype=np.int64) - hmin,
    ] = hourly["c"].to_numpy(dtype=np.int64)
    out = {c: [] for c in cols}
    for t in types:
        c = mat[tix[t]].astype(np.float64)
        n = len(c)
        if n < 4:
            continue
        mu = float(np.sum(mat[tix[t]])) / n
        d = c - mu
        denom = np.sum(d * d)
        if denom <= 0.0:
            continue  # mirrors the SQL dd > 0 filter
        p1 = p2 = p3 = None
        if True:
            r1 = np.sum(d[1:] * d[:-1]) / denom
            r2 = np.sum(d[2:] * d[:-2]) / denom
            r3 = np.sum(d[3:] * d[:-3]) / denom
            p1 = r1
            den2 = 1.0 - p1 * r1
            if den2 != 0.0:
                p2 = (r2 - p1 * r1) / den2
                p21 = p1 - p2 * p1
                den3 = 1.0 - p21 * r1 - p2 * r2
                if den3 != 0.0:
                    p3 = (r3 - p21 * r2 - p2 * r1) / den3
        out["event_type"].append(t)
        out["t_len"].append(n)
        out["pacf1_x1e6"].append(
            None if p1 is None else _round_half_away(p1 * 1e6)
        )
        out["pacf2_x1e6"].append(
            None if p2 is None else _round_half_away(p2 * 1e6)
        )
        out["pacf3_x1e6"].append(
            None if p3 is None else _round_half_away(p3 * 1e6)
        )
    return pa.table(
        {
            "event_type": pa.array(out["event_type"], pa.string()),
            **{c: pa.array(out[c], pa.int64()) for c in cols[1:]},
        }
    )


PACF_SQL = """
WITH hh AS MATERIALIZED (
  SELECT event_type,
         CAST(FLOOR(EPOCH_US(ts) / 3600000000) AS BIGINT) AS h,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM events
  WHERE event_type IS NOT NULL AND ts IS NOT NULL
  GROUP BY 1, 2
), bounds AS MATERIALIZED (
  SELECT MIN(h) AS mn, MAX(h) AS mx FROM hh
), grid AS MATERIALIZED (
  SELECT unnest(generate_series(mn, mx)) AS h FROM bounds
), types AS MATERIALIZED (
  SELECT DISTINCT event_type FROM hh
), dense AS MATERIALIZED (
  SELECT t.event_type, g.h, COALESCE(hh.c, 0) AS c
  FROM types t CROSS JOIN grid g
  LEFT JOIN hh ON hh.event_type = t.event_type AND hh.h = g.h
), stats AS MATERIALIZED (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS t,
         CAST(SUM(c) AS DOUBLE) / COUNT(*) AS mu
  FROM dense GROUP BY 1
), centered AS MATERIALIZED (
  SELECT d.event_type, d.h, d.c - s.mu AS d, s.t
  FROM dense d JOIN stats s ON s.event_type = d.event_type
), denom AS MATERIALIZED (
  SELECT event_type, SUM(d * d) AS dd FROM centered GROUP BY 1
), rho AS (
  SELECT a.event_type,
         SUM(CASE WHEN a.h - b.h = 1 THEN a.d * b.d END) / MAX(dn.dd)
           AS r1,
         SUM(CASE WHEN a.h - b.h = 2 THEN a.d * b.d END) / MAX(dn.dd)
           AS r2,
         SUM(CASE WHEN a.h - b.h = 3 THEN a.d * b.d END) / MAX(dn.dd)
           AS r3,
         MAX(s.t) AS t
  FROM centered a
  JOIN centered b
    ON a.event_type = b.event_type AND a.h - b.h BETWEEN 1 AND 3
  JOIN denom dn ON dn.event_type = a.event_type
  JOIN stats s ON s.event_type = a.event_type
  WHERE dn.dd > 0.0
  GROUP BY 1
), lvl AS (
  SELECT event_type, t, r1, r2, r3,
         r1 AS p1,
         CASE WHEN 1.0 - r1 * r1 <> 0.0
              THEN (r2 - r1 * r1) / (1.0 - r1 * r1) END AS p2
  FROM rho WHERE t >= 4
), lvl2 AS (
  SELECT event_type, t, r1, r2, r3, p1, p2,
         p1 - p2 * p1 AS p21
  FROM lvl
)
SELECT event_type, CAST(t AS BIGINT) AS t_len,
       CAST(ROUND(p1 * 1000000, 0) AS BIGINT) AS pacf1_x1e6,
       CASE WHEN p2 IS NULL THEN NULL
            ELSE CAST(ROUND(p2 * 1000000, 0) AS BIGINT) END AS pacf2_x1e6,
       CASE WHEN p2 IS NULL
              OR 1.0 - p21 * r1 - p2 * r2 = 0.0 THEN NULL
            ELSE CAST(ROUND((r3 - p21 * r2 - p2 * r1)
                 / (1.0 - p21 * r1 - p2 * r2) * 1000000, 0) AS BIGINT)
       END AS pacf3_x1e6
FROM lvl2 ORDER BY 1
"""


# ---------------------------------------------------------------------------
# Atkinson inequality index (epsilon = 1/2) of per-user event counts
# ---------------------------------------------------------------------------


def q_atkinson_index_users(sf_dir):
    """Per event type: the Atkinson inequality index (epsilon = 0.5)
    of per-user event counts — A = 1 - (mean sqrt(x))^2 / mean(x), the
    welfare-weighted inequality measure whose value reads directly as
    'the fraction of total activity society could give up and be as
    well off if it were spread evenly'. Square roots fold as x1e6
    per-term snapped integers, so the distributed sum is exact; the
    closing ratio is the one mirrored double, x1e6 snap."""
    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "user_id"]
    )

    def partial(b: pa.Table) -> pa.Table:
        b = _not_null(b, ("event_type", "user_id"))
        t = pa.table(
            {
                "event_type": b["event_type"],
                "user_id": b["user_id"],
                "x": pa.array(np.ones(b.num_rows, np.int64)),
            }
        )
        return _sum_by(t, ["event_type", "user_id"], ["x"])

    per_user = tree_merge(
        ev.map_batches(partial, batch_format="pyarrow", batch_size=None),
        lambda b: _sum_by(b, ["event_type", "user_id"], ["x"]),
        final_shards=8,
        shard_cols=["event_type", "user_id"],
    )

    def fold(b: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "event_type": pa.array([], pa.string()),
                "n": pa.array([], pa.int64()),
                "sx": pa.array([], pa.int64()),
                "sr": pa.array([], pa.int64()),
            }
        )
        if b.num_rows == 0 or "event_type" not in b.column_names:
            return empty
        x = b["x"].to_numpy(zero_copy_only=False).astype(np.int64)
        r = _round_half_away(np.sqrt(x.astype(np.float64)) * 1e6)
        t = pa.table(
            {
                "event_type": b["event_type"],
                "n": pa.array(np.ones(len(x), np.int64)),
                "sx": pa.array(x),
                "sr": pa.array(r),
            }
        )
        return _sum_by(t, ["event_type"], ["n", "sx", "sr"])

    agg = tree_merge(
        per_user.map_batches(fold, batch_format="pyarrow", batch_size=None),
        lambda b: _sum_by(b, ["event_type"], ["n", "sx", "sr"]),
    ).to_pandas()
    cols = ["event_type", "n_users", "total_events", "atkinson_x1e6"]
    if not len(agg) or "event_type" not in agg.columns:
        return pa.table(
            {
                "event_type": pa.array([], pa.string()),
                **{c: pa.array([], pa.int64()) for c in cols[1:]},
            }
        )
    agg = agg.sort_values("event_type", ignore_index=True)
    out = {c: [] for c in cols}
    for i in range(len(agg)):
        n = int(agg["n"].iloc[i])
        sx = int(agg["sx"].iloc[i])
        sr = int(agg["sr"].iloc[i])
        a = (
            None
            if n == 0 or sx == 0
            else 1.0
            - ((sr / 1e6) * (sr / 1e6)) / (float(n) * float(sx))
        )
        out["event_type"].append(agg["event_type"].iloc[i])
        out["n_users"].append(n)
        out["total_events"].append(sx)
        out["atkinson_x1e6"].append(
            None if a is None else _round_half_away(a * 1e6)
        )
    return pa.table(
        {
            "event_type": pa.array(out["event_type"], pa.string()),
            **{c: pa.array(out[c], pa.int64()) for c in cols[1:]},
        }
    )


ATKINSON_SQL = """
WITH u AS (
  SELECT event_type, user_id, CAST(COUNT(*) AS BIGINT) AS x
  FROM events
  WHERE event_type IS NOT NULL AND user_id IS NOT NULL
  GROUP BY 1, 2
), m AS (
  SELECT event_type,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x) AS BIGINT) AS sx,
         CAST(SUM(CAST(ROUND(SQRT(CAST(x AS DOUBLE)) * 1000000, 0)
                  AS BIGINT)) AS BIGINT) AS sr
  FROM u GROUP BY 1
)
SELECT event_type, n AS n_users, sx AS total_events,
       CASE WHEN n = 0 OR sx = 0 THEN NULL
            ELSE CAST(ROUND((1.0
              - ((sr / 1000000.0) * (sr / 1000000.0))
                / (CAST(n AS DOUBLE) * CAST(sx AS DOUBLE)))
              * 1000000, 0) AS BIGINT) END AS atkinson_x1e6
FROM m ORDER BY 1
"""


# ---------------------------------------------------------------------------
# Croston's intermittent-demand forecast (integer fixed point) per part
# ---------------------------------------------------------------------------


def q_croston_forecast_parts(sf_dir):
    """Per part with >= 2 demand days: Croston's method in integer
    fixed point (alpha = 1/2, floor division — the engine's Holt
    discipline) — smooth the nonzero daily demand sizes (cents) and
    the inter-demand intervals (days) as two separate exponential
    states, then forecast demand rate = size-level / interval-level.
    The pairing of demand_classification_parts: the classifier says
    WHICH parts are intermittent, Croston says WHAT to stock for them.
    Integer recursion states compare exactly; the closing rate is the
    one snapped double."""
    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_shipdate", "l_quantity"],
    )

    def project(b: pa.Table) -> pa.Table:
        b = _not_null(b, ("l_partkey", "l_shipdate", "l_quantity"))
        us = b["l_shipdate"].cast(pa.timestamp("us")).cast(pa.int64()).to_numpy()
        q = b["l_quantity"].to_numpy(zero_copy_only=False)
        cents = np.where(
            q >= 0, np.floor(q * 100 + 0.5), np.ceil(q * 100 - 0.5)
        ).astype(np.int64)
        t = pa.table(
            {
                "l_partkey": b["l_partkey"],
                "day": pa.array((us // _DAY_US).astype(np.int64)),
                "s": pa.array(cents),
            }
        )
        t = _sum_by(t, ["l_partkey", "day"], ["s"])
        return add_bucket(t, "l_partkey", 64)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "l_partkey": pd.Series([], dtype=np.int64),
                "n_days": pd.Series([], dtype=np.int64),
                "z_cents": pd.Series([], dtype=np.int64),
                "p_days": pd.Series([], dtype=np.int64),
                "croston_rate_x1e6": pd.Series([], dtype=np.int64),
            }
        )
        if len(g) == 0:
            return empty
        g = g.groupby(["l_partkey", "day"], as_index=False)["s"].sum()
        g = g.sort_values(["l_partkey", "day"], ignore_index=True)
        rows = {"l_partkey": [], "n_days": [], "z_cents": [], "p_days": [],
                "croston_rate_x1e6": []}
        for pk, gg in g.groupby("l_partkey", sort=False):
            s = gg["s"].to_numpy(dtype=np.int64)
            days = gg["day"].to_numpy(dtype=np.int64)
            n = len(s)
            if n < 2:
                continue
            z = int(s[0])
            p = 0
            for i in range(1, n):
                z = (int(s[i]) + z) // 2
                q_i = int(days[i] - days[i - 1])
                p = q_i if i == 1 else (q_i + p) // 2
            rate = None if p == 0 else float(z) / float(p)
            rows["l_partkey"].append(int(pk))
            rows["n_days"].append(n)
            rows["z_cents"].append(z)
            rows["p_days"].append(p)
            rows["croston_rate_x1e6"].append(
                None if rate is None else _round_half_away(rate * 1e6)
            )
        out = pd.DataFrame(rows)
        for c in ("l_partkey", "n_days", "z_cents", "p_days"):
            out[c] = out[c].astype(np.int64)
        return out

    return (
        li.map_batches(project, batch_format="pyarrow", batch_size=None)
        .groupby(_BUCKET)
        .map_groups(per_bucket, batch_format="pandas")
    )


CROSTON_SQL = """
WITH RECURSIVE d AS (
  SELECT l_partkey,
         CAST(FLOOR(EPOCH_US(l_shipdate) / 86400000000) AS BIGINT) AS day,
         CAST(SUM(CAST(ROUND(l_quantity * 100, 0) AS BIGINT)) AS BIGINT)
           AS s
  FROM lineitem
  WHERE l_partkey IS NOT NULL AND l_shipdate IS NOT NULL
    AND l_quantity IS NOT NULL
  GROUP BY 1, 2
), seq AS (
  SELECT l_partkey,
         CAST(ROW_NUMBER()
              OVER (PARTITION BY l_partkey ORDER BY day) AS BIGINT) AS i,
         s,
         CAST(day - LAG(day) OVER (PARTITION BY l_partkey ORDER BY day)
              AS BIGINT) AS q
  FROM d
), nmax AS (
  SELECT l_partkey, MAX(i) AS n FROM seq GROUP BY 1 HAVING MAX(i) >= 2
), rec AS (
  SELECT seq.l_partkey, seq.i, seq.s AS z, CAST(0 AS BIGINT) AS p
  FROM seq JOIN nmax ON nmax.l_partkey = seq.l_partkey
  WHERE seq.i = 1
  UNION ALL
  SELECT r.l_partkey, s.i,
         CAST((s.s + r.z) // 2 AS BIGINT) AS z,
         CAST(CASE WHEN s.i = 2 THEN s.q ELSE (s.q + r.p) // 2 END
              AS BIGINT) AS p
  FROM rec r JOIN seq s ON s.l_partkey = r.l_partkey AND s.i = r.i + 1
)
SELECT r.l_partkey, n.n AS n_days, r.z AS z_cents, r.p AS p_days,
       CASE WHEN r.p = 0 THEN NULL
            ELSE CAST(ROUND(CAST(r.z AS DOUBLE) / CAST(r.p AS DOUBLE)
                 * 1000000, 0) AS BIGINT) END AS croston_rate_x1e6
FROM rec r JOIN nmax n ON n.l_partkey = r.l_partkey AND r.i = n.n
ORDER BY 1
"""


def register_r4ef(queries: dict, oracles: dict) -> None:
    queries.update(
        {
            "pacf_hourly": q_pacf_hourly,
            "atkinson_index_users": q_atkinson_index_users,
            "croston_forecast_parts": q_croston_forecast_parts,
        }
    )
    oracles.update(
        {
            "pacf_hourly": PACF_SQL,
            "atkinson_index_users": ATKINSON_SQL,
            "croston_forecast_parts": CROSTON_SQL,
        }
    )
