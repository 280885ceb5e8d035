"""Round-4 batch FV: the rest of the survival-analysis family —
competing-risks cumulative incidence (first purchase vs first error
after signup, the estimator that 1-KM gets WRONG under competing
events), the log-rank test between early- and late-signup cohorts'
time-to-purchase, and the 30-day restricted mean survival time
(RMST, the honest "average days purchase-free" under censoring).

Exactness discipline: every risk/event table is exact integers on
the shared day grid; Kaplan-Meier-style products are evaluated
SEQUENTIALLY on both sides (numpy cumprod vs a recursive CTE that
multiplies in the same day order — bit-identical doubles, no
exp-sum-log detour); log-rank O/E/V fold the same per-day closed
forms."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from mimirsbrunn_ray.pipelines.queries_r4fk import _round_half_away
from mimirsbrunn_ray.pipelines.queries_r4fo import (
    _DAY_US,
    _NA_DAYS,
    _global_tmax_us,
)
from mimirsbrunn_ray.stages.dedup import _BUCKET, add_bucket
from mimirsbrunn_ray.stages.rollup import tree_merge


def _valid(b: pa.Table, cols) -> pa.Table:
    m = None
    for c in cols:
        v = pc.is_valid(b[c])
        m = v if m is None else pc.and_(m, v)
    return b.filter(m)


def _user_durations(sf_dir, tmax_us: int) -> rd.Dataset:
    """Per-user (dur_days, ev) rows where ev is 1 = purchase,
    2 = error (whichever strictly FIRST at/after the user's first
    signup; purchase wins exact ties), 0 = censored at the window
    end.  User-disjoint hash shards; also carries the user's signup
    day for cohort splits."""
    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "ts", "event_type"])

    def project(b: pa.Table) -> pa.Table:
        b = _valid(b, ("user_id", "ts", "event_type"))
        m = pc.or_(
            pc.or_(pc.equal(b["event_type"], "signup"),
                   pc.equal(b["event_type"], "purchase")),
            pc.equal(b["event_type"], "error"))
        b = b.filter(m)
        kind = pc.case_when(
            pc.make_struct(
                pc.equal(b["event_type"], "signup"),
                pc.equal(b["event_type"], "purchase")),
            pa.scalar(0, pa.int64()),
            pa.scalar(1, pa.int64()),
            pa.scalar(2, pa.int64()),
        )
        t = pa.table({
            "user_id": b["user_id"],
            "us": b["ts"].cast(pa.timestamp("us")).cast(pa.int64()),
            "kind": kind,
        })
        return add_bucket(t, "user_id", 64)

    def durations(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({
            "dur": pd.Series([], dtype=np.int64),
            "ev": pd.Series([], dtype=np.int64),
            "sign_day": pd.Series([], dtype=np.int64),
        })
        if len(g) == 0:
            return empty
        g = g.sort_values(["user_id", "us"], kind="mergesort",
                          ignore_index=True)
        uid = g["user_id"].to_numpy()
        us = g["us"].to_numpy(dtype=np.int64)
        kind = g["kind"].to_numpy(dtype=np.int64)
        first = np.ones(len(g), dtype=bool)
        first[1:] = uid[1:] != uid[:-1]
        starts = np.flatnonzero(first)
        ends = np.append(starts[1:], len(g))
        big = np.int64(np.iinfo(np.int64).max)
        s_us = np.where(kind == 0, us, big)
        t_sign = np.minimum.reduceat(s_us, starts)
        t_sign_b = np.repeat(t_sign, ends - starts)
        p_us = np.where((kind == 1) & (us >= t_sign_b), us, big)
        e_us = np.where((kind == 2) & (us >= t_sign_b), us, big)
        t_p = np.minimum.reduceat(p_us, starts)
        t_e = np.minimum.reduceat(e_us, starts)
        has_sign = t_sign < big
        t_ev = np.minimum(t_p, t_e)
        has_ev = t_ev < big
        ev_kind = np.where(~has_ev, 0, np.where(t_p <= t_e, 1, 2))
        dur = np.where(
            has_ev,
            (t_ev - t_sign) // _DAY_US,
            (tmax_us - t_sign) // _DAY_US,
        )
        keep = has_sign
        return pd.DataFrame({
            "dur": dur[keep].astype(np.int64),
            "ev": ev_kind[keep].astype(np.int64),
            "sign_day": (t_sign[keep] // _DAY_US).astype(np.int64),
        })

    return (
        ev.map_batches(project, batch_format="pyarrow",
                       batch_size=None)
        .groupby(_BUCKET)
        .map_groups(durations, batch_format="pandas")
    )


_DUR_SQL_PREFIX = f"""
WITH RECURSIVE tm AS MATERIALIZED (
  SELECT MAX(EPOCH_US(ts)) AS tmax FROM events
  WHERE ts IS NOT NULL
), sp AS MATERIALIZED (
  SELECT user_id, EPOCH_US(ts) AS us, event_type
  FROM events
  WHERE user_id IS NOT NULL AND ts IS NOT NULL
    AND event_type IN ('signup', 'purchase', 'error')
), su AS MATERIALIZED (
  SELECT user_id, MIN(us) AS t_sign FROM sp
  WHERE event_type = 'signup' GROUP BY 1
), pu AS MATERIALIZED (
  SELECT sp.user_id, MIN(sp.us) AS t_p
  FROM sp JOIN su USING (user_id)
  WHERE sp.event_type = 'purchase' AND sp.us >= su.t_sign
  GROUP BY 1
), er AS MATERIALIZED (
  SELECT sp.user_id, MIN(sp.us) AS t_e
  FROM sp JOIN su USING (user_id)
  WHERE sp.event_type = 'error' AND sp.us >= su.t_sign
  GROUP BY 1
), du AS MATERIALIZED (
  SELECT su.user_id,
         su.t_sign // {_DAY_US} AS sign_day,
         CASE
           WHEN pu.t_p IS NULL AND er.t_e IS NULL THEN 0
           WHEN er.t_e IS NULL OR (pu.t_p IS NOT NULL
                                   AND pu.t_p <= er.t_e) THEN 1
           ELSE 2 END AS ev,
         CASE
           WHEN pu.t_p IS NULL AND er.t_e IS NULL
             THEN (tm.tmax - su.t_sign) // {_DAY_US}
           WHEN er.t_e IS NULL OR (pu.t_p IS NOT NULL
                                   AND pu.t_p <= er.t_e)
             THEN (pu.t_p - su.t_sign) // {_DAY_US}
           ELSE (er.t_e - su.t_sign) // {_DAY_US} END AS dur
  FROM su
  LEFT JOIN pu USING (user_id)
  LEFT JOIN er USING (user_id)
  CROSS JOIN tm
)"""


_CR_COLS = ["day", "n_risk", "n_purchase", "n_error",
            "cif_purchase_x1e6", "cif_error_x1e6"]


def q_competing_risks_signup(sf_dir):
    """Aalen-Johansen cumulative incidence of the two COMPETING
    first outcomes after signup — purchase vs error — on a 0..30
    day grid: per day the at-risk count and each cause's events,
    plus CIF_k(d) = sum_{d'<=d} S(d'-) * d_k(d')/n(d') with S the
    all-cause KM survival (1-KM per cause would overstate both).
    The risk table is exact integers; the KM product multiplies
    sequentially on both engines."""
    tmax_us = _global_tmax_us(rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["ts"]))
    empty = pa.table(
        {c: pa.array([], pa.int64()) for c in _CR_COLS})
    if tmax_us is None:
        return empty
    dur = _user_durations(sf_dir, tmax_us)

    def table_partial(b: pa.Table) -> pa.Table:
        cols = ["day", "n_risk", "n_p", "n_e"]
        if b.num_rows == 0 or "dur" not in b.column_names:
            return pa.table(
                {c: pa.array([], pa.int64()) for c in cols})
        d = b["dur"].to_numpy(zero_copy_only=False)
        e = b["ev"].to_numpy(zero_copy_only=False)
        days = np.arange(_NA_DAYS + 1, dtype=np.int64)
        n_risk = (d[None, :] >= days[:, None]).sum(axis=1)
        n_p = ((d[None, :] == days[:, None])
               & (e[None, :] == 1)).sum(axis=1)
        n_e = ((d[None, :] == days[:, None])
               & (e[None, :] == 2)).sum(axis=1)
        return pa.table({
            "day": pa.array(days),
            "n_risk": pa.array(n_risk.astype(np.int64)),
            "n_p": pa.array(n_p.astype(np.int64)),
            "n_e": pa.array(n_e.astype(np.int64)),
        })

    def comb(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "day" not in b.column_names:
            return pa.table({
                "day": pa.array([], pa.int64()),
                "n_risk": pa.array([], pa.int64()),
                "n_p": pa.array([], pa.int64()),
                "n_e": pa.array([], pa.int64()),
            })
        g = b.group_by(["day"]).aggregate(
            [("n_risk", "sum"), ("n_p", "sum"), ("n_e", "sum")])
        return g.rename_columns(["day", "n_risk", "n_p", "n_e"])

    tab = tree_merge(
        dur.map_batches(table_partial, batch_format="pyarrow",
                        batch_size=None),
        comb,
    ).to_pandas()
    if "day" not in tab.columns or len(tab) == 0:
        return empty
    tab = tab.sort_values("day", ignore_index=True)
    nr = tab["n_risk"].to_numpy(np.int64)
    np_ = tab["n_p"].to_numpy(np.int64)
    ne = tab["n_e"].to_numpy(np.int64)
    s_prev = 1.0
    cif_p = np.zeros(len(tab))
    cif_e = np.zeros(len(tab))
    cp = ce = 0.0
    for i in range(len(tab)):
        n = nr[i]
        if n > 0:
            hp = 1.0 * np_[i] / n
            he = 1.0 * ne[i] / n
            cp = cp + s_prev * hp
            ce = ce + s_prev * he
            s_prev = s_prev * (1.0 - hp - he)
        cif_p[i] = cp
        cif_e[i] = ce
    return pa.table({
        "day": pa.array(tab["day"].to_numpy(np.int64)),
        "n_risk": pa.array(nr),
        "n_purchase": pa.array(np_),
        "n_error": pa.array(ne),
        "cif_purchase_x1e6": pa.array(
            [_round_half_away(v * 1e6) for v in cif_p],
            pa.int64()),
        "cif_error_x1e6": pa.array(
            [_round_half_away(v * 1e6) for v in cif_e],
            pa.int64()),
    })


COMPETING_SQL = _DUR_SQL_PREFIX + f""",
grid AS MATERIALIZED (
  SELECT CAST(r.k AS BIGINT) AS day,
         CAST(COUNT(*) FILTER (WHERE du.dur >= r.k) AS BIGINT)
           AS n_risk,
         CAST(COUNT(*) FILTER (WHERE du.dur = r.k AND du.ev = 1)
              AS BIGINT) AS n_p,
         CAST(COUNT(*) FILTER (WHERE du.dur = r.k AND du.ev = 2)
              AS BIGINT) AS n_e
  FROM range(0, {_NA_DAYS + 1}) r(k)
  LEFT JOIN du ON TRUE
  GROUP BY 1
), seq AS (
  SELECT day, n_risk, n_p, n_e,
         CASE WHEN n_risk > 0
              THEN 1.0 * n_p / n_risk ELSE 0.0 END AS hp,
         CASE WHEN n_risk > 0
              THEN 1.0 * n_e / n_risk ELSE 0.0 END AS he
  FROM grid
), rec AS (
  SELECT day, n_risk, n_p, n_e,
         hp AS cif_p, he AS cif_e,
         1.0 * (1.0 - hp - he) AS s
  FROM seq WHERE day = 0
  UNION ALL
  SELECT q.day, q.n_risk, q.n_p, q.n_e,
         rec.cif_p + rec.s * q.hp,
         rec.cif_e + rec.s * q.he,
         rec.s * (1.0 - q.hp - q.he)
  FROM seq q JOIN rec ON q.day = rec.day + 1
)
SELECT day, n_risk,
       n_p AS n_purchase,
       n_e AS n_error,
       CAST(ROUND(cif_p * 1000000, 0) AS BIGINT)
         AS cif_purchase_x1e6,
       CAST(ROUND(cif_e * 1000000, 0) AS BIGINT)
         AS cif_error_x1e6
FROM rec ORDER BY day
"""

_LR_COLS = ["n_early", "n_late", "o1", "e1_x1e3", "v_x1e3",
            "chi2_x1e3"]


def q_logrank_cohort_purchase(sf_dir):
    """Log-rank test of time-to-first-purchase between EARLY and
    LATE signup cohorts (first-signup day at or before vs after the
    midpoint of the observed signup-day span), right-censored at
    the window end: per event day the hypergeometric O/E/V terms
    fold into chi2 = (O1 - E1)^2 / V — the standard two-sample
    survival comparison.  Durations resolve in user-disjoint
    shards; the day table is exact integers."""
    tmax_us = _global_tmax_us(rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["ts"]))
    empty = pa.table(
        {c: pa.array([], pa.int64()) for c in _LR_COLS})
    if tmax_us is None:
        return empty
    dur = _user_durations(sf_dir, tmax_us).materialize()

    # global signup-day span -> cohort midpoint
    def span_part(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "sign_day" not in b.column_names:
            return pa.table({"mn": pa.array([], pa.int64()),
                             "mx": pa.array([], pa.int64())})
        return pa.table({
            "mn": pa.array([pc.min(b["sign_day"]).as_py()],
                           pa.int64()),
            "mx": pa.array([pc.max(b["sign_day"]).as_py()],
                           pa.int64()),
        })

    def span_comb(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"mn": pa.array([], pa.int64()),
                             "mx": pa.array([], pa.int64())})
        return pa.table({
            "mn": pa.array([pc.min(b["mn"]).as_py()], pa.int64()),
            "mx": pa.array([pc.max(b["mx"]).as_py()], pa.int64()),
        })

    sp = tree_merge(
        dur.map_batches(span_part, batch_format="pyarrow",
                        batch_size=None),
        span_comb,
    ).to_pandas()
    if not len(sp) or "mn" not in sp.columns:
        return empty
    mid = (int(sp["mn"].iloc[0]) + int(sp["mx"].iloc[0])) // 2

    def table_partial(b: pa.Table) -> pa.Table:
        cols = ["day", "n1", "n2", "d1", "d2"]
        if b.num_rows == 0 or "dur" not in b.column_names:
            return pa.table(
                {c: pa.array([], pa.int64()) for c in cols})
        d = b["dur"].to_numpy(zero_copy_only=False)
        e = b["ev"].to_numpy(zero_copy_only=False)
        sd = b["sign_day"].to_numpy(zero_copy_only=False)
        g1 = sd <= mid
        # treat error as censoring at its day for this two-sample
        # purchase comparison (ev==1 is the event)
        days = np.arange(_NA_DAYS + 1, dtype=np.int64)
        n1 = ((d[None, :] >= days[:, None])
              & g1[None, :]).sum(axis=1)
        n2 = ((d[None, :] >= days[:, None])
              & (~g1)[None, :]).sum(axis=1)
        d1 = ((d[None, :] == days[:, None]) & (e[None, :] == 1)
              & g1[None, :]).sum(axis=1)
        d2 = ((d[None, :] == days[:, None]) & (e[None, :] == 1)
              & (~g1)[None, :]).sum(axis=1)
        return pa.table({
            "day": pa.array(days),
            "n1": pa.array(n1.astype(np.int64)),
            "n2": pa.array(n2.astype(np.int64)),
            "d1": pa.array(d1.astype(np.int64)),
            "d2": pa.array(d2.astype(np.int64)),
        })

    def comb(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "day" not in b.column_names:
            return pa.table({
                "day": pa.array([], pa.int64()),
                "n1": pa.array([], pa.int64()),
                "n2": pa.array([], pa.int64()),
                "d1": pa.array([], pa.int64()),
                "d2": pa.array([], pa.int64()),
            })
        g = b.group_by(["day"]).aggregate(
            [("n1", "sum"), ("n2", "sum"), ("d1", "sum"),
             ("d2", "sum")])
        return g.rename_columns(["day", "n1", "n2", "d1", "d2"])

    tab = tree_merge(
        dur.map_batches(table_partial, batch_format="pyarrow",
                        batch_size=None),
        comb,
    ).to_pandas()
    if "day" not in tab.columns or len(tab) == 0:
        return empty
    tab = tab.sort_values("day", ignore_index=True)
    n1 = tab["n1"].to_numpy(np.int64)
    n2 = tab["n2"].to_numpy(np.int64)
    d1 = tab["d1"].to_numpy(np.int64)
    d2 = tab["d2"].to_numpy(np.int64)
    n = n1 + n2
    d = d1 + d2
    o1 = int(d1.sum())
    m = n > 0
    e1 = float((n1[m] * d[m] / n[m]).sum())
    m2 = n > 1
    v = float((n1[m2] * n2[m2] * d[m2] * (n[m2] - d[m2])
               / (n[m2].astype(np.float64) ** 2
                  * (n[m2] - 1))).sum())
    if v == 0:
        return empty
    chi2 = (o1 - e1) ** 2 / v
    return pa.table({
        "n_early": pa.array([int(n1[0])], pa.int64()),
        "n_late": pa.array([int(n2[0])], pa.int64()),
        "o1": pa.array([o1], pa.int64()),
        "e1_x1e3": pa.array(
            [_round_half_away(e1 * 1e3)], pa.int64()),
        "v_x1e3": pa.array(
            [_round_half_away(v * 1e3)], pa.int64()),
        "chi2_x1e3": pa.array(
            [_round_half_away(chi2 * 1e3)], pa.int64()),
    })


LOGRANK_SQL = _DUR_SQL_PREFIX + f""",
mid AS MATERIALIZED (
  SELECT (MIN(sign_day) + MAX(sign_day)) // 2 AS m FROM du
), grid AS MATERIALIZED (
  SELECT CAST(r.k AS BIGINT) AS day,
         CAST(COUNT(*) FILTER (WHERE du.dur >= r.k
                AND du.sign_day <= mid.m) AS BIGINT) AS n1,
         CAST(COUNT(*) FILTER (WHERE du.dur >= r.k
                AND du.sign_day > mid.m) AS BIGINT) AS n2,
         CAST(COUNT(*) FILTER (WHERE du.dur = r.k AND du.ev = 1
                AND du.sign_day <= mid.m) AS BIGINT) AS d1,
         CAST(COUNT(*) FILTER (WHERE du.dur = r.k AND du.ev = 1
                AND du.sign_day > mid.m) AS BIGINT) AS d2
  FROM range(0, {_NA_DAYS + 1}) r(k)
  LEFT JOIN du ON TRUE CROSS JOIN mid
  GROUP BY 1
), agg AS (
  SELECT
    (SELECT n1 FROM grid WHERE day = 0) AS n_early,
    (SELECT n2 FROM grid WHERE day = 0) AS n_late,
    CAST(SUM(d1) AS BIGINT) AS o1,
    SUM(CASE WHEN n1 + n2 > 0
             THEN 1.0 * n1 * (d1 + d2) / (n1 + n2)
             ELSE 0 END) AS e1,
    SUM(CASE WHEN n1 + n2 > 1
             THEN 1.0 * n1 * n2 * (d1 + d2)
                  * (n1 + n2 - d1 - d2)
                  / (CAST(n1 + n2 AS DOUBLE)
                     * (n1 + n2) * (n1 + n2 - 1))
             ELSE 0 END) AS v
  FROM grid
)
SELECT CAST(n_early AS BIGINT) AS n_early,
       CAST(n_late AS BIGINT) AS n_late,
       o1,
       CAST(ROUND(e1 * 1000, 0) AS BIGINT) AS e1_x1e3,
       CAST(ROUND(v * 1000, 0) AS BIGINT) AS v_x1e3,
       CAST(ROUND((o1 - e1) * (o1 - e1) / v * 1000, 0)
            AS BIGINT) AS chi2_x1e3
FROM agg WHERE v <> 0
"""

_RMST_COLS = ["n_users", "rmst_days_x1e3"]


def q_rmst_signup_purchase(sf_dir):
    """30-day restricted mean survival time for signup-to-purchase:
    RMST = sum_{d=0..29} S(d) with S the all-event KM survival
    (purchase or error as the event, censoring at the window end) —
    the average purchase/error-free days in the first month, well-
    defined even when the median is never reached.  Integer risk
    table; sequential KM product on both engines."""
    tmax_us = _global_tmax_us(rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["ts"]))
    empty = pa.table(
        {c: pa.array([], pa.int64()) for c in _RMST_COLS})
    if tmax_us is None:
        return empty
    dur = _user_durations(sf_dir, tmax_us)

    def table_partial(b: pa.Table) -> pa.Table:
        cols = ["day", "n_risk", "n_ev"]
        if b.num_rows == 0 or "dur" not in b.column_names:
            return pa.table(
                {c: pa.array([], pa.int64()) for c in cols})
        d = b["dur"].to_numpy(zero_copy_only=False)
        e = b["ev"].to_numpy(zero_copy_only=False)
        days = np.arange(_NA_DAYS + 1, dtype=np.int64)
        n_risk = (d[None, :] >= days[:, None]).sum(axis=1)
        n_ev = ((d[None, :] == days[:, None])
                & (e[None, :] > 0)).sum(axis=1)
        return pa.table({
            "day": pa.array(days),
            "n_risk": pa.array(n_risk.astype(np.int64)),
            "n_ev": pa.array(n_ev.astype(np.int64)),
        })

    def comb(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "day" not in b.column_names:
            return pa.table({
                "day": pa.array([], pa.int64()),
                "n_risk": pa.array([], pa.int64()),
                "n_ev": pa.array([], pa.int64()),
            })
        g = b.group_by(["day"]).aggregate(
            [("n_risk", "sum"), ("n_ev", "sum")])
        return g.rename_columns(["day", "n_risk", "n_ev"])

    tab = tree_merge(
        dur.map_batches(table_partial, batch_format="pyarrow",
                        batch_size=None),
        comb,
    ).to_pandas()
    if "day" not in tab.columns or len(tab) == 0:
        return empty
    tab = tab.sort_values("day", ignore_index=True)
    nr = tab["n_risk"].to_numpy(np.int64)
    ne = tab["n_ev"].to_numpy(np.int64)
    s = 1.0
    rmst = 0.0
    for i in range(_NA_DAYS):
        if nr[i] > 0:
            s = s * (1.0 - ne[i] / nr[i])
        rmst += s
    n_users = int(nr[0]) if len(nr) else 0
    if n_users == 0:
        return empty
    return pa.table({
        "n_users": pa.array([n_users], pa.int64()),
        "rmst_days_x1e3": pa.array(
            [_round_half_away(rmst * 1e3)], pa.int64()),
    })


RMST_SQL = _DUR_SQL_PREFIX + f""",
grid AS MATERIALIZED (
  SELECT CAST(r.k AS BIGINT) AS day,
         CAST(COUNT(*) FILTER (WHERE du.dur >= r.k) AS BIGINT)
           AS n_risk,
         CAST(COUNT(*) FILTER (WHERE du.dur = r.k AND du.ev > 0)
              AS BIGINT) AS n_ev
  FROM range(0, {_NA_DAYS + 1}) r(k)
  LEFT JOIN du ON TRUE
  GROUP BY 1
), seq AS (
  SELECT day, n_risk, n_ev,
         CASE WHEN n_risk > 0
              THEN 1.0 - 1.0 * n_ev / n_risk
              ELSE 1.0 END AS term
  FROM grid
), rec AS (
  SELECT day, n_risk, term AS s, term AS acc
  FROM seq WHERE day = 0
  UNION ALL
  SELECT q.day, q.n_risk, rec.s * q.term,
         rec.acc + rec.s * q.term
  FROM seq q JOIN rec ON q.day = rec.day + 1
  WHERE q.day < {_NA_DAYS}
)
SELECT CAST((SELECT n_risk FROM grid WHERE day = 0) AS BIGINT)
         AS n_users,
       CAST(ROUND((SELECT acc FROM rec
                   WHERE day = {_NA_DAYS - 1}) * 1000, 0)
            AS BIGINT) AS rmst_days_x1e3
WHERE (SELECT n_risk FROM grid WHERE day = 0) > 0
"""


def register_r4fv(queries: dict, oracles: dict) -> None:
    queries.update(
        {
            "competing_risks_signup": q_competing_risks_signup,
            "logrank_cohort_purchase": q_logrank_cohort_purchase,
            "rmst_signup_purchase": q_rmst_signup_purchase,
        }
    )
    oracles.update(
        {
            "competing_risks_signup": COMPETING_SQL,
            "logrank_cohort_purchase": LOGRANK_SQL,
            "rmst_signup_purchase": RMST_SQL,
        }
    )
