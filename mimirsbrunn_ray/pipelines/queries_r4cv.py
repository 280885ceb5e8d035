"""Round-4 batch CV: empirical-Bayes beta prior for per-user purchase
rates, monetary-unit (dollar-unit) audit sampling of orders, and Neyman
optimal stratified-sample allocation across event types.

Sampling/shrinkage operators a curation pipeline runs before spending
label budget. Exactness: per-user counts are complete inside their hash
bucket; the monetary-unit selection is pure int64 arithmetic over an
exact cumulative-cents ledger (boundary multiples counted by integer
floor division); the beta-prior and allocation folds are mirrored
doubles over exact integers, x1e6 snap, with allocation rounding done
on the snapped integers so both sides agree bit-for-bit.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from mimirsbrunn_ray.stages.dedup import _BUCKET, add_bucket
from mimirsbrunn_ray.stages.rollup import tree_merge


def _round_half_away(x: np.ndarray) -> np.ndarray:
    return np.where(x >= 0, np.floor(x + 0.5), np.ceil(x - 0.5)).astype(
        np.int64
    )


def _round_half_away_x(x: np.ndarray, scale: float) -> np.ndarray:
    y = x * scale
    return np.where(y >= 0, np.floor(y + 0.5), np.ceil(y - 0.5)).astype(
        np.int64
    )


def _sum_by(t: pa.Table, keys: list[str], vals: list[str]) -> pa.Table:
    g = t.group_by(keys).aggregate([(v, "sum") for v in vals])
    g = g.select(keys + [f"{v}_sum" for v in vals])
    return g.rename_columns(keys + vals)


def _clean(b: pa.Table, cols) -> pa.Table:
    m = None
    for c in cols:
        v = pc.is_valid(b[c])
        m = v if m is None else pc.and_(m, v)
    return b.filter(m)


# ---------------------------------------------------------------------------
# empirical-Bayes beta prior over per-user purchase rates
# ---------------------------------------------------------------------------


def q_eb_beta_prior_purchase(sf_dir):
    """One-row empirical-Bayes prior fit: the method-of-moments Beta
    (alpha, beta) over per-user purchase rates p_u = purchases / events
    — the prior a curation pipeline shrinks small-sample user rates
    toward (James-Stein style) before ranking users by conversion.
    alpha = p_bar * (p_bar (1 - p_bar) / var - 1), beta scales by
    (1 - p_bar). Per-user counts are complete inside their hash bucket
    (exact int64); each p_u divides identical integers on both sides,
    so the moment folds (sum p, sum p²) are mirrored doubles; NULL when
    the variance degenerates or exceeds p(1-p) (no valid Beta)."""
    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "event_type"]
    )

    def prep(b: pa.Table) -> pa.Table:
        b = _clean(b, ("user_id", "event_type"))
        pur = pc.equal(b["event_type"], "purchase").to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        t = pa.table(
            {
                "user_id": b["user_id"].cast(pa.int64()),
                "n": pa.array(np.ones(len(pur), np.int64)),
                "s": pa.array(pur),
            }
        )
        return add_bucket(_sum_by(t, ["user_id"], ["n", "s"]), "user_id", 64)

    bucketed = ev.map_batches(prep, batch_format="pyarrow", batch_size=None)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "n_users": pd.Series([], dtype=np.int64),
                "sp": pd.Series([], dtype=np.float64),
                "sp2": pd.Series([], dtype=np.float64),
            }
        )
        if len(g) == 0:
            return empty
        per = g.groupby("user_id", sort=False)[["n", "s"]].sum()
        p = per["s"].to_numpy(dtype=np.float64) / per["n"].to_numpy(
            dtype=np.int64
        )
        return pd.DataFrame(
            {
                "n_users": [len(per)],
                "sp": [float(np.sum(p))],
                "sp2": [float(np.sum(p * p))],
            }
        )

    parts = bucketed.groupby(_BUCKET).map_groups(
        per_bucket, batch_format="pandas"
    ).to_pandas()

    if not len(parts) or "n_users" not in parts.columns:
        return pa.table(
            {
                "n_users": pa.array([0], pa.int64()),
                "alpha_x1e6": pa.array([None], pa.int64()),
                "beta_x1e6": pa.array([None], pa.int64()),
            }
        )
    n = int(parts["n_users"].sum())
    sp = float(parts["sp"].sum())
    sp2 = float(parts["sp2"].sum())
    if n < 2:
        a_val = b_val = None
    else:
        pbar = sp / n
        var = (sp2 - sp * sp / n) / (n - 1)
        if var <= 0.0 or pbar <= 0.0 or pbar >= 1.0 or var >= pbar * (1.0 - pbar):
            a_val = b_val = None
        else:
            common = pbar * (1.0 - pbar) / var - 1.0
            a_val = int(_round_half_away(np.array([pbar * common * 1e6]))[0])
            b_val = int(
                _round_half_away(np.array([(1.0 - pbar) * common * 1e6]))[0]
            )
    return pa.table(
        {
            "n_users": pa.array([n], pa.int64()),
            "alpha_x1e6": pa.array([a_val], pa.int64()),
            "beta_x1e6": pa.array([b_val], pa.int64()),
        }
    )


EB_BETA_SQL = """
WITH per AS MATERIALIZED (
  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
              AS BIGINT) AS s
  FROM events
  WHERE user_id IS NOT NULL AND event_type IS NOT NULL
  GROUP BY 1
), m AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         SUM(CAST(s AS DOUBLE) / per.n) AS sp,
         SUM((CAST(s AS DOUBLE) / per.n) * (CAST(s AS DOUBLE) / per.n))
           AS sp2
  FROM per
)
SELECT n AS n_users,
       CASE WHEN n < 2 OR (sp2 - sp * sp / n) / (n - 1) <= 0
              OR sp / n <= 0 OR sp / n >= 1
              OR (sp2 - sp * sp / n) / (n - 1)
                 >= (sp / n) * (1.0 - sp / n)
            THEN NULL
            ELSE CAST(ROUND(
              (sp / n) * ((sp / n) * (1.0 - sp / n)
                          / ((sp2 - sp * sp / n) / (n - 1)) - 1.0)
              * 1000000, 0) AS BIGINT) END AS alpha_x1e6,
       CASE WHEN n < 2 OR (sp2 - sp * sp / n) / (n - 1) <= 0
              OR sp / n <= 0 OR sp / n >= 1
              OR (sp2 - sp * sp / n) / (n - 1)
                 >= (sp / n) * (1.0 - sp / n)
            THEN NULL
            ELSE CAST(ROUND(
              (1.0 - sp / n) * ((sp / n) * (1.0 - sp / n)
                                / ((sp2 - sp * sp / n) / (n - 1)) - 1.0)
              * 1000000, 0) AS BIGINT) END AS beta_x1e6
FROM m
"""


# ---------------------------------------------------------------------------
# monetary-unit (dollar-unit) sampling of orders
# ---------------------------------------------------------------------------

_MUS_SAMPLES = 100


def q_monetary_unit_sample(sf_dir):
    """Monetary-unit sampling (the financial-audit standard): lay all
    order totals end-to-end as a cents ledger ordered by orderkey and
    select every order whose cents interval contains a multiple of the
    sampling interval T = floor(total / 100) — selection probability
    proportional to value, deterministic, no RNG. Pure int64: the
    cumulative ledger is a window sum of exact cents, and an order is
    selected iff floor(cum / T) > floor((cum - amt) / T). The
    per-order cumsum is an ordered prefix sum by orderkey — computed
    per key-range shard from exact per-shard offsets (block partials
    then a broadcast offset), the classic distributed scan shape.
    Output: the selected (orderkey, cents, hits) rows, bounded ~100."""
    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_totalprice"]
    )

    def prep(b: pa.Table) -> pa.Table:
        b = _clean(b, ("o_orderkey", "o_totalprice"))
        amt = _round_half_away_x(
            b["o_totalprice"].to_numpy(zero_copy_only=False).astype(np.float64),
            100.0,
        )
        t = pa.table(
            {
                "o_orderkey": b["o_orderkey"].cast(pa.int64()),
                "amt": pa.array(amt),
            }
        )
        return t.filter(pa.array(amt > 0))

    led = orders.map_batches(prep, batch_format="pyarrow", batch_size=None)
    # driver fold over the (orderkey, amt) pairs; the ledger order is BY
    # ORDERKEY, so sort the key/amount pairs once.  At 100 TB the same
    # shape shards by orderkey range with per-shard cumulative offsets
    # (block partials + one broadcast prefix), never a single sort.
    tbl = led.to_pandas()
    if not len(tbl) or "o_orderkey" not in tbl.columns:
        return pa.table(
            {
                "o_orderkey": pa.array([], pa.int64()),
                "amt_e2": pa.array([], pa.int64()),
                "hits": pa.array([], pa.int64()),
            }
        )
    tbl = tbl.sort_values("o_orderkey", ignore_index=True)
    amt = tbl["amt"].to_numpy(dtype=np.int64)
    cum = np.cumsum(amt)
    total = int(cum[-1])
    T = total // _MUS_SAMPLES
    if T == 0:
        return pa.table(
            {
                "o_orderkey": pa.array([], pa.int64()),
                "amt_e2": pa.array([], pa.int64()),
                "hits": pa.array([], pa.int64()),
            }
        )
    hi = cum // T
    lo = (cum - amt) // T
    hits = hi - lo
    sel = hits > 0
    return pa.table(
        {
            "o_orderkey": pa.array(
                tbl["o_orderkey"].to_numpy(dtype=np.int64)[sel]
            ),
            "amt_e2": pa.array(amt[sel]),
            "hits": pa.array(hits[sel].astype(np.int64)),
        }
    )


MUS_SQL = f"""
WITH o AS (
  SELECT o_orderkey, CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS amt
  FROM orders
  WHERE o_orderkey IS NOT NULL AND o_totalprice IS NOT NULL
    AND CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) > 0
), led AS (
  SELECT o_orderkey, amt,
         SUM(amt) OVER (ORDER BY o_orderkey
                        ROWS UNBOUNDED PRECEDING) AS cum,
         SUM(amt) OVER () AS total
  FROM o
), sel AS (
  SELECT o_orderkey, amt,
         CAST(cum // (total // {_MUS_SAMPLES})
              - (cum - amt) // (total // {_MUS_SAMPLES}) AS BIGINT) AS hits
  FROM led WHERE total // {_MUS_SAMPLES} > 0
)
SELECT o_orderkey, amt AS amt_e2, hits
FROM sel WHERE hits > 0 ORDER BY 1
"""


# ---------------------------------------------------------------------------
# Neyman optimal stratified-sample allocation across event types
# ---------------------------------------------------------------------------

_NEYMAN_BUDGET = 10_000


def q_neyman_allocation_types(sf_dir):
    """Per event type: the Neyman-optimal share of a 10k-sample label
    budget — n_h proportional to N_h * sigma_h (stratum size times
    x100-value standard deviation), the allocation that minimizes the
    stratified estimator's variance; the sampling-design step a
    curation pipeline runs before drawing the actual stratified sample
    (which `stratified_sample_docs` implements). Stratum (n, s1, s2)
    fold exact int64; weights and shares are mirrored doubles; the
    integer allocation rounds the snapped share so both engines agree
    exactly."""
    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "value"]
    )

    def partial(b: pa.Table) -> pa.Table:
        b = _clean(b, ("event_type", "value"))
        x = _round_half_away_x(
            b["value"].to_numpy(zero_copy_only=False).astype(np.float64), 100.0
        )
        t = pa.table(
            {
                "g": b["event_type"],
                "n": pa.array(np.ones(len(x), np.int64)),
                "s1": pa.array(x),
                "s2": pa.array(x * x),
            }
        )
        return _sum_by(t, ["g"], ["n", "s1", "s2"])

    grp = tree_merge(
        ev.map_batches(partial, batch_format="pyarrow", batch_size=None),
        lambda b: _sum_by(b, ["g"], ["n", "s1", "s2"]),
    ).to_pandas()

    if not len(grp) or "g" not in grp.columns:
        return pa.table(
            {
                "event_type": pa.array([], pa.string()),
                "n": pa.array([], pa.int64()),
                "alloc": pa.array([], pa.int64()),
            }
        )
    grp = grp.sort_values("g", ignore_index=True)
    ng = grp["n"].to_numpy(dtype=np.int64)
    s1 = grp["s1"].to_numpy(dtype=np.int64)
    s2 = grp["s2"].to_numpy(dtype=np.int64)
    sd = np.sqrt(
        np.maximum(
            (s2.astype(np.float64) - s1.astype(np.float64) * s1 / ng)
            / np.maximum(ng - 1, 1),
            0.0,
        )
    )
    w = ng.astype(np.float64) * sd
    tot = float(np.sum(w))
    if tot == 0.0:
        alloc = np.zeros(len(grp), dtype=np.int64)
    else:
        alloc = _round_half_away(w / tot * _NEYMAN_BUDGET)
    return pa.table(
        {
            "event_type": pa.array(grp["g"].tolist(), pa.string()),
            "n": pa.array(ng),
            "alloc": pa.array(alloc),
        }
    )


NEYMAN_SQL = f"""
WITH v AS (
  SELECT event_type AS g, CAST(ROUND(value * 100, 0) AS BIGINT) AS x
  FROM events
  WHERE event_type IS NOT NULL AND value IS NOT NULL
), a AS MATERIALIZED (
  SELECT g, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x) AS BIGINT) AS s1, CAST(SUM(x * x) AS BIGINT) AS s2
  FROM v GROUP BY 1
), w AS MATERIALIZED (
  SELECT g, n,
         n * SQRT(GREATEST((s2 - CAST(s1 AS DOUBLE) * s1 / n)
                           / GREATEST(n - 1, 1), 0.0)) AS w
  FROM a
), t AS (SELECT SUM(w) AS tot FROM w)
SELECT w.g AS event_type, w.n,
       CASE WHEN t.tot = 0 THEN 0
            ELSE CAST(ROUND(w.w / t.tot * {_NEYMAN_BUDGET}, 0) AS BIGINT)
       END AS alloc
FROM w, t ORDER BY 1
"""


def register_r4cv(queries: dict, oracles: dict) -> None:
    queries.update(
        {
            "eb_beta_prior_purchase": q_eb_beta_prior_purchase,
            "monetary_unit_sample": q_monetary_unit_sample,
            "neyman_allocation_types": q_neyman_allocation_types,
        }
    )
    oracles.update(
        {
            "eb_beta_prior_purchase": EB_BETA_SQL,
            "monetary_unit_sample": MUS_SQL,
            "neyman_allocation_types": NEYMAN_SQL,
        }
    )
