"""Round-4 batch FO: survival hazard, ranking quality, and sequential
patterns — the Nelson-Aalen cumulative hazard of time from signup to
first purchase (right-censored at the observation window end), the
tie-adjusted Mann-Whitney AUC of click volume as a purchase
predictor, and subsequence pattern support (type A occurs strictly
before type B) per ordered type pair.

Exactness discipline: the Nelson-Aalen risk/event table is all
integers on an exact day grid and both engines fold the same ~30
d_i/n_i terms in day order; AUC uses average ranks expressed as the
exact rational (2*min_rank + ties - 1)/2 so every rank is a .0/.5
double; A-before-B uses the composite (ts, event_id) strict order on
both sides — pure integer comparisons end-to-end."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from mimirsbrunn_ray.stages.dedup import _BUCKET, add_bucket
from mimirsbrunn_ray.stages.rollup import tree_merge

_DAY_US = 86_400_000_000
_NA_DAYS = 30


def _round_half_away(x: float) -> int:
    return int(np.floor(x + 0.5) if x >= 0 else np.ceil(x - 0.5))


def _valid(b: pa.Table, cols) -> pa.Table:
    m = None
    for c in cols:
        v = pc.is_valid(b[c])
        m = v if m is None else pc.and_(m, v)
    return b.filter(m)


def _global_tmax_us(ev: rd.Dataset) -> int | None:
    def part(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_valid(b["ts"]))
        if b.num_rows == 0:
            return pa.table({"tmax": pa.array([], pa.int64())})
        us = b["ts"].cast(pa.timestamp("us")).cast(pa.int64())
        return pa.table(
            {"tmax": pa.array([pc.max(us).as_py()], pa.int64())})

    def comb(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"tmax": pa.array([], pa.int64())})
        return pa.table(
            {"tmax": pa.array([pc.max(b["tmax"]).as_py()],
                              pa.int64())})

    t = tree_merge(
        ev.map_batches(part, batch_format="pyarrow",
                       batch_size=None),
        comb,
    ).to_pandas()
    if not len(t) or "tmax" not in t.columns:
        return None
    return int(t["tmax"].iloc[0])


def q_nelson_aalen_signup_purchase(sf_dir):
    """Nelson-Aalen cumulative hazard of days from a user's FIRST
    signup to their first purchase AT OR AFTER it, right-censored at
    the global observation end: per day d on a 0..30 grid, the
    at-risk count, event count, and H(d) = sum_{d' <= d} d_{d'} /
    n_{d'} — the hazard-scale survival estimate (additive, so it
    distributes as exact integer partials; only the final ~30-term
    fold is float).  Per-user durations resolve in user-disjoint
    hash shards."""
    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "ts", "event_type"])
    tmax_us = _global_tmax_us(ev)
    empty = pa.table({
        "day": pa.array([], pa.int64()),
        "n_risk": pa.array([], pa.int64()),
        "n_event": pa.array([], pa.int64()),
        "cumhaz_x1e6": pa.array([], pa.int64()),
    })
    if tmax_us is None:
        return empty

    def project(b: pa.Table) -> pa.Table:
        b = _valid(b, ("user_id", "ts", "event_type"))
        m = pc.or_(pc.equal(b["event_type"], "signup"),
                   pc.equal(b["event_type"], "purchase"))
        b = b.filter(m)
        t = pa.table({
            "user_id": b["user_id"],
            "us": b["ts"].cast(pa.timestamp("us")).cast(pa.int64()),
            "is_purch": pc.cast(
                pc.equal(b["event_type"], "purchase"), pa.int64()),
        })
        return add_bucket(t, "user_id", 64)

    def durations(g: pd.DataFrame) -> pd.DataFrame:
        empty_d = pd.DataFrame({
            "dur": pd.Series([], dtype=np.int64),
            "ev": pd.Series([], dtype=np.int64),
        })
        if len(g) == 0:
            return empty_d
        g = g.sort_values(["user_id", "us"], kind="mergesort",
                          ignore_index=True)
        uid = g["user_id"].to_numpy()
        us = g["us"].to_numpy(dtype=np.int64)
        isp = g["is_purch"].to_numpy(dtype=np.int64)
        first = np.ones(len(g), dtype=bool)
        first[1:] = uid[1:] != uid[:-1]
        starts = np.flatnonzero(first)
        ends = np.append(starts[1:], len(g))
        big = np.int64(np.iinfo(np.int64).max)
        # first signup per user
        s_us = np.where(isp == 0, us, big)
        t_sign = np.minimum.reduceat(s_us, starts)
        # first purchase at/after the signup
        t_sign_b = np.repeat(t_sign, ends - starts)
        p_us = np.where((isp == 1) & (us >= t_sign_b), us, big)
        t_purch = np.minimum.reduceat(p_us, starts)
        has_sign = t_sign < big
        has_purch = t_purch < big
        dur = np.where(
            has_purch,
            (t_purch - t_sign) // _DAY_US,
            (tmax_us - t_sign) // _DAY_US,
        )
        keep = has_sign
        return pd.DataFrame({
            "dur": dur[keep].astype(np.int64),
            "ev": has_purch[keep].astype(np.int64),
        })

    def table_partial(b: pa.Table) -> pa.Table:
        cols = ["day", "n_risk", "n_event"]
        if b.num_rows == 0 or "dur" not in b.column_names:
            return pa.table(
                {c: pa.array([], pa.int64()) for c in cols})
        dur = b["dur"].to_numpy(zero_copy_only=False)
        ev = b["ev"].to_numpy(zero_copy_only=False)
        days = np.arange(_NA_DAYS + 1, dtype=np.int64)
        n_risk = (dur[None, :] >= days[:, None]).sum(axis=1)
        n_event = ((dur[None, :] == days[:, None])
                   & (ev[None, :] == 1)).sum(axis=1)
        return pa.table({
            "day": pa.array(days),
            "n_risk": pa.array(n_risk.astype(np.int64)),
            "n_event": pa.array(n_event.astype(np.int64)),
        })

    def table_comb(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "day" not in b.column_names:
            return pa.table({
                "day": pa.array([], pa.int64()),
                "n_risk": pa.array([], pa.int64()),
                "n_event": pa.array([], pa.int64()),
            })
        g = b.group_by(["day"]).aggregate(
            [("n_risk", "sum"), ("n_event", "sum")])
        return g.rename_columns(["day", "n_risk", "n_event"])

    dur_ds = (
        ev.map_batches(project, batch_format="pyarrow",
                       batch_size=None)
        .groupby(_BUCKET)
        .map_groups(durations, batch_format="pandas")
    )
    tab = tree_merge(
        dur_ds.map_batches(table_partial, batch_format="pyarrow",
                           batch_size=None),
        table_comb,
    ).to_pandas()
    if "day" not in tab.columns or len(tab) == 0:
        return empty
    tab = tab.sort_values("day", ignore_index=True)
    nr = tab["n_risk"].to_numpy(np.int64)
    ne = tab["n_event"].to_numpy(np.int64)
    with np.errstate(divide="ignore", invalid="ignore"):
        h = np.where(nr > 0, ne / np.maximum(nr, 1), 0.0)
    ch = np.cumsum(h)
    return pa.table({
        "day": pa.array(tab["day"].to_numpy(np.int64)),
        "n_risk": pa.array(nr),
        "n_event": pa.array(ne),
        "cumhaz_x1e6": pa.array(
            [_round_half_away(v * 1e6) for v in ch], pa.int64()),
    })


NELSON_AALEN_SQL = f"""
WITH tm AS MATERIALIZED (
  SELECT MAX(EPOCH_US(ts)) AS tmax FROM events
  WHERE ts IS NOT NULL
), sp AS MATERIALIZED (
  SELECT user_id, EPOCH_US(ts) AS us, event_type
  FROM events
  WHERE user_id IS NOT NULL AND ts IS NOT NULL
    AND event_type IN ('signup', 'purchase')
), su AS MATERIALIZED (
  SELECT user_id, MIN(us) AS t_sign FROM sp
  WHERE event_type = 'signup' GROUP BY 1
), pu AS MATERIALIZED (
  SELECT sp.user_id, MIN(sp.us) AS t_purch
  FROM sp JOIN su USING (user_id)
  WHERE sp.event_type = 'purchase' AND sp.us >= su.t_sign
  GROUP BY 1
), du AS MATERIALIZED (
  SELECT su.user_id,
         CASE WHEN pu.t_purch IS NOT NULL
              THEN (pu.t_purch - su.t_sign) // {_DAY_US}
              ELSE (tm.tmax - su.t_sign) // {_DAY_US} END AS dur,
         CASE WHEN pu.t_purch IS NOT NULL THEN 1 ELSE 0 END AS ev
  FROM su LEFT JOIN pu USING (user_id) CROSS JOIN tm
), grid AS MATERIALIZED (
  SELECT CAST(r.k AS BIGINT) AS day,
         CAST(COUNT(*) FILTER (WHERE du.dur >= r.k) AS BIGINT)
           AS n_risk,
         CAST(COUNT(*) FILTER (WHERE du.dur = r.k AND du.ev = 1)
              AS BIGINT) AS n_event
  FROM range(0, {_NA_DAYS + 1}) r(k)
  LEFT JOIN du ON TRUE
  GROUP BY 1
)
SELECT day, n_risk, n_event,
       CAST(ROUND(SUM(CASE WHEN n_risk > 0
                           THEN CAST(n_event AS DOUBLE)
                                / GREATEST(n_risk, 1)
                           ELSE 0.0 END)
              OVER (ORDER BY day ROWS UNBOUNDED PRECEDING)
            * 1000000, 0) AS BIGINT) AS cumhaz_x1e6
FROM grid ORDER BY day
"""


def q_click_purchase_auc(sf_dir):
    """One-row ranking-quality audit: the tie-adjusted Mann-Whitney
    AUC of a user's total click count as a predictor of whether the
    user is a HEAVY purchaser (purchase count strictly above the
    across-users median).  Average ranks are the exact rational
    (2*min_rank + ties - 1)/2 over the integer click scores, so the
    AUC is reproducible bit-for-bit.  Per-user features fold in one
    distributed pass; the rank step runs on the bounded per-user
    table."""
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
    cols = ["n_pos", "n_neg", "auc_ppm"]
    if "user_id" not in per_user.columns or len(per_user) == 0:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in cols})
    score = per_user["clicks"].to_numpy(np.int64)
    purch = per_user["purch"].to_numpy(np.int64)
    med = float(np.median(purch))
    label = purch > med
    n1 = int(label.sum())
    n0 = int((~label).sum())
    if n1 == 0 or n0 == 0:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in cols})
    order = np.argsort(score, kind="mergesort")
    s_sorted = score[order]
    # average ranks: (2*min_rank + ties - 1) / 2, 1-based
    uniq, first_idx, counts = np.unique(
        s_sorted, return_index=True, return_counts=True)
    avg_rank_u = (2 * (first_idx + 1) + counts - 1) / 2.0
    rank_map = dict(zip(uniq.tolist(), avg_rank_u.tolist()))
    ranks = np.array([rank_map[v] for v in score.tolist()])
    r_pos = float(ranks[label].sum())
    auc = (r_pos - n1 * (n1 + 1) / 2.0) / (n1 * n0)
    return pa.table({
        "n_pos": pa.array([n1], pa.int64()),
        "n_neg": pa.array([n0], pa.int64()),
        "auc_ppm": pa.array(
            [_round_half_away(auc * 1e6)], pa.int64()),
    })


AUC_SQL = """
WITH u0 AS MATERIALIZED (
  SELECT user_id,
         CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
              AS BIGINT) AS clicks,
         CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0
                  END) AS BIGINT) AS purchases
  FROM events
  WHERE user_id IS NOT NULL AND event_type IS NOT NULL
  GROUP BY 1
), med AS MATERIALIZED (
  SELECT MEDIAN(CAST(purchases AS DOUBLE)) AS m FROM u0
), u AS MATERIALIZED (
  SELECT user_id, clicks,
         CASE WHEN CAST(purchases AS DOUBLE) > med.m
              THEN 1 ELSE 0 END AS pos
  FROM u0 CROSS JOIN med
), rk AS MATERIALIZED (
  SELECT pos,
         (2.0 * RANK() OVER (ORDER BY clicks)
          + COUNT(*) OVER (PARTITION BY clicks) - 1) / 2.0
           AS avg_rank
  FROM u
), agg AS (
  SELECT CAST(SUM(pos) AS BIGINT) AS n_pos,
         CAST(SUM(1 - pos) AS BIGINT) AS n_neg,
         SUM(CASE WHEN pos = 1 THEN avg_rank ELSE 0 END) AS r_pos
  FROM rk
)
SELECT n_pos, n_neg,
       CAST(ROUND((r_pos - n_pos * (n_pos + 1) / 2.0)
            / (n_pos * n_neg) * 1000000, 0) AS BIGINT) AS auc_ppm
FROM agg
WHERE n_pos > 0 AND n_neg > 0
"""


def q_seq_pattern_ab_support(sf_dir):
    """Sequential-pattern support for every ordered event-type pair
    (A, B): the number of users whose stream contains an A event
    STRICTLY before a B event under the composite (ts, event_id)
    order (A = B counts users with two distinct-position A events) —
    the length-2 PrefixSpan support table.  A exists before B iff
    the user's FIRST A precedes their LAST B, so only per-(user,
    type) first/last keys shuffle; pair evaluation is vectorized in
    user-disjoint shards and counts tree-merge by sum."""
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

    def pair_partial(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({
            "ta": pd.Series([], dtype=object),
            "tb": pd.Series([], dtype=object),
            "n_users": pd.Series([], dtype=np.int64),
        })
        if len(g) == 0:
            return empty
        g = g.sort_values(["user_id", "event_type", "us",
                           "event_id"],
                          kind="mergesort", ignore_index=True)
        uid = g["user_id"].to_numpy()
        et = g["event_type"].to_numpy()
        us = g["us"].to_numpy(dtype=np.int64)
        eid = g["event_id"].to_numpy(dtype=np.int64)
        brk = np.ones(len(g), dtype=bool)
        brk[1:] = (uid[1:] != uid[:-1]) | (et[1:] != et[:-1])
        starts = np.flatnonzero(brk)
        ends = np.append(starts[1:], len(g)) - 1
        ft = pd.DataFrame({
            "user_id": uid[starts],
            "et": et[starts],
            "f_us": us[starts], "f_id": eid[starts],
            "l_us": us[ends], "l_id": eid[ends],
        })
        pairs = ft.merge(ft, on="user_id",
                         suffixes=("_a", "_b"))
        before = (
            (pairs["f_us_a"] < pairs["l_us_b"])
            | ((pairs["f_us_a"] == pairs["l_us_b"])
               & (pairs["f_id_a"] < pairs["l_id_b"]))
        )
        pairs = pairs[before]
        out = pairs.groupby(["et_a", "et_b"], sort=False).size()
        out = out.reset_index(name="n_users")
        out.columns = ["ta", "tb", "n_users"]
        out["n_users"] = out["n_users"].astype(np.int64)
        return out

    def comb(b: pa.Table) -> pa.Table:
        g = b.group_by(["ta", "tb"]).aggregate(
            [("n_users", "sum")])
        return g.rename_columns(["ta", "tb", "n_users"])

    res = tree_merge(
        ev.map_batches(project, batch_format="pyarrow",
                       batch_size=None)
        .groupby(_BUCKET)
        .map_groups(pair_partial, batch_format="pandas"),
        comb,
    ).to_pandas()
    if "ta" not in res.columns or len(res) == 0:
        return pa.table({
            "ta": pa.array([], pa.string()),
            "tb": pa.array([], pa.string()),
            "n_users": pa.array([], pa.int64()),
        })
    res = res.sort_values(["ta", "tb"], ignore_index=True)
    return pa.table({
        "ta": pa.array(res["ta"], pa.string()),
        "tb": pa.array(res["tb"], pa.string()),
        "n_users": pa.array(res["n_users"].to_numpy(np.int64)),
    })


SEQ_AB_SQL = """
WITH e AS MATERIALIZED (
  SELECT user_id, event_type, EPOCH_US(ts) AS us, event_id
  FROM events
  WHERE user_id IS NOT NULL AND ts IS NOT NULL
    AND event_id IS NOT NULL AND event_type IS NOT NULL
), r AS MATERIALIZED (
  SELECT user_id, event_type, us, event_id,
         ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                            ORDER BY us, event_id) AS rna,
         ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                            ORDER BY us DESC, event_id DESC)
           AS rnd
  FROM e
), fst AS MATERIALIZED (
  SELECT user_id, event_type, us AS f_us, event_id AS f_id
  FROM r WHERE rna = 1
), lst AS MATERIALIZED (
  SELECT user_id, event_type, us AS l_us, event_id AS l_id
  FROM r WHERE rnd = 1
)
SELECT a.event_type AS ta, b.event_type AS tb,
       CAST(COUNT(*) AS BIGINT) AS n_users
FROM fst a JOIN lst b USING (user_id)
WHERE a.f_us < b.l_us
   OR (a.f_us = b.l_us AND a.f_id < b.l_id)
GROUP BY 1, 2 ORDER BY ta, tb
"""


def register_r4fo(queries: dict, oracles: dict) -> None:
    queries.update(
        {
            "nelson_aalen_signup_purchase":
                q_nelson_aalen_signup_purchase,
            "click_purchase_auc": q_click_purchase_auc,
            "seq_pattern_ab_support": q_seq_pattern_ab_support,
        }
    )
    oracles.update(
        {
            "nelson_aalen_signup_purchase": NELSON_AALEN_SQL,
            "click_purchase_auc": AUC_SQL,
            "seq_pattern_ab_support": SEQ_AB_SQL,
        }
    )
