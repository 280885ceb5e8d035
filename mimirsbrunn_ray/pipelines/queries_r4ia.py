"""Round-4 batch IA: asymmetric location, weekly amplitude, and
the tax/discount tug-of-war — the τ=0.9 expectile of order value
(the value level where upside mass is 9× down-weighted: the
risk-sensitive planner's 'high' scenario, found by a mirrored
12-step fixed-point iteration), the day-of-week amplitude per
event type (peak-to-trough swing of DOW mean counts — which
types have a real weekly pulse), and the tax-exceeds-discount
census per return flag (on how many lines does tax claw back
more than the discount gave — the net-multiplier tug-of-war).

Exactness discipline: the expectile iteration runs EXACTLY 12
identical steps on both sides (cents sums are exact integers,
each step's division mirrored); DOW means are exact count
ratios; tax/discount compare in exact basis points."""

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
from mimirsbrunn_ray.pipelines.queries_r4fl import _dense_hour_counts
from mimirsbrunn_ray.stages.rollup import tree_merge

_TAU = 0.9
_ITERS = 12


def _valid(b: pa.Table, cols) -> pa.Table:
    m = None
    for c in cols:
        v = pc.is_valid(b[c])
        m = v if m is None else pc.and_(m, v)
    return b.filter(m)


_EXP_COLS = ["n_orders", "mean_cents", "expectile90_cents",
             "median_gap_ppm"]


def q_expectile_value_tau90(sf_dir):
    """The risk-sensitive 'high' scenario: the τ=0.9 expectile of
    order total cents, via the fixed-point e ← (τ·S> + (1−τ)·S≤)
    / (τ·n> + (1−τ)·n≤) run exactly 12 steps from the mean —
    mirrored step-for-step in an unrolled SQL CTE chain.  The gap
    above the mean (ppm of mean) measures upper-tail weight."""
    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_totalprice"])

    def part(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_valid(b["o_totalprice"]))
        if b.num_rows == 0:
            return pa.table({
                "cents": pa.array([], pa.int64()),
                "n": pa.array([], pa.int64()),
            })
        tp = b["o_totalprice"].cast(pa.float64()).to_numpy(
            zero_copy_only=False)
        cents = np.where(
            tp >= 0, np.floor(tp * 100.0 + 0.5),
            np.ceil(tp * 100.0 - 0.5)).astype(np.int64)
        t = pa.table({
            "cents": pa.array(cents),
            "n": pa.array(np.ones(len(cents), np.int64)),
        })
        g = t.group_by(["cents"]).aggregate([("n", "sum")])
        return g.rename_columns(["cents", "n"])

    def comb(b: pa.Table) -> pa.Table:
        g = b.group_by(["cents"]).aggregate([("n", "sum")])
        return g.rename_columns(["cents", "n"])

    hist = tree_merge(
        orders.map_batches(part, batch_format="pyarrow",
                           batch_size=None),
        comb,
        final_shards=8,
        shard_cols=["cents"],
    ).to_pandas()
    if "cents" not in hist.columns or len(hist) == 0:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _EXP_COLS})
    c = hist["cents"].to_numpy(np.int64).astype(np.float64)
    w = hist["n"].to_numpy(np.int64).astype(np.float64)
    n = w.sum()
    s = (c * w).sum()
    e = s / n
    for _ in range(_ITERS):
        hi = c > e
        s_hi = float((c[hi] * w[hi]).sum())
        n_hi = float(w[hi].sum())
        s_lo = s - s_hi
        n_lo = n - n_hi
        e = ((_TAU * s_hi + (1.0 - _TAU) * s_lo)
             / (_TAU * n_hi + (1.0 - _TAU) * n_lo))
    mean = s / n
    return pa.table({
        "n_orders": pa.array([int(n)], pa.int64()),
        "mean_cents": pa.array(
            [_round_half_away(mean)], pa.int64()),
        "expectile90_cents": pa.array(
            [_round_half_away(e)], pa.int64()),
        "median_gap_ppm": pa.array(
            [_round_half_away((e - mean) / mean * 1e6)],
            pa.int64()),
    })


def _exp_steps() -> str:
    steps = []
    prev = "e0"
    for i in range(1, _ITERS + 1):
        steps.append(f"""e{i} AS MATERIALIZED (
  SELECT ({_TAU} * SUM(CASE WHEN oc.cents > {prev}.e
                            THEN CAST(oc.cents AS DOUBLE)
                            ELSE 0 END)
          + {1.0 - _TAU} * SUM(CASE WHEN oc.cents <= {prev}.e
                               THEN CAST(oc.cents AS DOUBLE)
                               ELSE 0 END))
         / ({_TAU} * SUM(CASE WHEN oc.cents > {prev}.e
                              THEN 1.0 ELSE 0 END)
            + {1.0 - _TAU} * SUM(CASE WHEN oc.cents <= {prev}.e
                                 THEN 1.0 ELSE 0 END)) AS e
  FROM oc CROSS JOIN {prev}
)""")
        prev = f"e{i}"
    return ", ".join(steps)


EXP_SQL = f"""
WITH oc AS MATERIALIZED (
  SELECT CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS cents
  FROM orders WHERE o_totalprice IS NOT NULL
), e0 AS MATERIALIZED (
  SELECT SUM(CAST(cents AS DOUBLE)) / COUNT(*) AS e FROM oc
), {_exp_steps()}, base AS MATERIALIZED (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         SUM(CAST(cents AS DOUBLE)) / COUNT(*) AS mean
  FROM oc
)
SELECT base.n AS n_orders,
       CAST(ROUND(base.mean, 0) AS BIGINT) AS mean_cents,
       CAST(ROUND(e{_ITERS}.e, 0) AS BIGINT)
         AS expectile90_cents,
       CAST(ROUND((e{_ITERS}.e - base.mean) / base.mean
            * 1000000, 0) AS BIGINT) AS median_gap_ppm
FROM base CROSS JOIN e{_ITERS}
WHERE base.n > 0
"""

_DAT_COLS = ["event_type", "peak_dow", "trough_dow",
             "amplitude_ppm"]


def q_dow_amplitude_by_type(sf_dir):
    """Which types have a real weekly pulse?  Per event type, the
    mean events per day-of-week occurrence; the amplitude
    (max − min) / overall-mean in ppm plus the peak and trough
    DOW (0 = Thursday epoch anchor convention, ties broken by
    smallest DOW).  Dense hour counts fold once and collapse to
    exact (type, dow) sums."""
    hc = _dense_hour_counts(sf_dir)
    if hc is None or len(hc) == 0:
        return pa.table({
            "event_type": pa.array([], pa.string()),
            "peak_dow": pa.array([], pa.int64()),
            "trough_dow": pa.array([], pa.int64()),
            "amplitude_ppm": pa.array([], pa.int64()),
        })
    df = hc.copy()
    df["day"] = df["hour"] // 24
    dc = df.groupby(["event_type", "day"])["c"].sum().reset_index()
    dc["dow"] = dc["day"] % 7
    out_t, out_p, out_tr, out_a = [], [], [], []
    for et, g in dc.groupby("event_type"):
        m = g.groupby("dow")["c"].mean()
        overall = g["c"].mean()
        if overall == 0 or len(m) < 2:
            continue
        mx = m.max()
        mn = m.min()
        peak = int(min(d for d in m.index if m[d] == mx))
        trough = int(min(d for d in m.index if m[d] == mn))
        out_t.append(et)
        out_p.append(peak)
        out_tr.append(trough)
        out_a.append(_round_half_away(
            (mx - mn) / overall * 1e6))
    order = sorted(range(len(out_t)), key=lambda i: out_t[i])
    return pa.table({
        "event_type": pa.array(
            [out_t[i] for i in order], pa.string()),
        "peak_dow": pa.array(
            [out_p[i] for i in order], pa.int64()),
        "trough_dow": pa.array(
            [out_tr[i] for i in order], pa.int64()),
        "amplitude_ppm": pa.array(
            [out_a[i] for i in order], pa.int64()),
    })


DAT_SQL = f"""
WITH RECURSIVE span AS MATERIALIZED (
  SELECT MIN(EPOCH_US(ts)) // {_DAY_US} AS d0,
         MAX(EPOCH_US(ts)) // {_DAY_US} AS d1
  FROM events WHERE ts IS NOT NULL AND event_type IS NOT NULL
), days AS (
  SELECT d0 AS day FROM span WHERE d0 IS NOT NULL
  UNION ALL
  SELECT day + 1 FROM days
  WHERE day + 1 <= (SELECT d1 FROM span)
), grid AS MATERIALIZED (
  SELECT t.event_type, d.day
  FROM (SELECT DISTINCT event_type FROM events
        WHERE event_type IS NOT NULL AND ts IS NOT NULL) t
  CROSS JOIN days d
), dc AS MATERIALIZED (
  SELECT g.event_type, g.day,
         COALESCE(c.c, 0) AS c
  FROM grid g
  LEFT JOIN (
    SELECT event_type, EPOCH_US(ts) // {_DAY_US} AS day,
           CAST(COUNT(*) AS BIGINT) AS c
    FROM events
    WHERE event_type IS NOT NULL AND ts IS NOT NULL
    GROUP BY 1, 2
  ) c ON c.event_type = g.event_type AND c.day = g.day
), dm AS MATERIALIZED (
  SELECT event_type, day % 7 AS dow, AVG(CAST(c AS DOUBLE)) AS m
  FROM dc GROUP BY 1, 2
), ov AS MATERIALIZED (
  SELECT event_type, AVG(CAST(c AS DOUBLE)) AS overall,
         COUNT(DISTINCT day % 7) AS ndow
  FROM dc GROUP BY 1
)
SELECT dm.event_type,
       CAST(MIN(CASE WHEN dm.m = mx.mx THEN dm.dow END)
            AS BIGINT) AS peak_dow,
       CAST(MIN(CASE WHEN dm.m = mx.mn THEN dm.dow END)
            AS BIGINT) AS trough_dow,
       CAST(ROUND((ANY_VALUE(mx.mx) - ANY_VALUE(mx.mn))
            / ANY_VALUE(ov.overall) * 1000000, 0) AS BIGINT)
         AS amplitude_ppm
FROM dm
JOIN (SELECT event_type, MAX(m) AS mx, MIN(m) AS mn
      FROM dm GROUP BY 1) mx USING (event_type)
JOIN ov USING (event_type)
WHERE ov.overall > 0 AND ov.ndow >= 2
GROUP BY dm.event_type
ORDER BY dm.event_type
"""

_TED_COLS = ["l_returnflag", "n_lines", "n_tax_wins",
             "n_discount_wins", "n_ties", "mean_net_mult_ppm"]


def q_tax_exceeds_discount_census(sf_dir):
    """The tug-of-war on every line: per return flag, how many
    lines have tax > discount (the state claws back more than the
    seller gave), discount > tax, or a dead heat — plus the mean
    net multiplier (1 − d)(1 + t).  Rates compare in exact basis
    points; multiplier sums fold as exact bp products."""
    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_discount", "l_tax"])

    def part(b: pa.Table) -> pa.Table:
        b = _valid(b, ("l_returnflag", "l_discount", "l_tax"))
        if b.num_rows == 0:
            return pa.table({
                "rf": pa.array([], pa.string()),
                "n": pa.array([], pa.int64()),
                "tw": pa.array([], pa.int64()),
                "dw": pa.array([], pa.int64()),
                "mult": pa.array([], pa.int64()),
            })
        d = b["l_discount"].cast(pa.float64()).to_numpy(
            zero_copy_only=False)
        t = b["l_tax"].cast(pa.float64()).to_numpy(
            zero_copy_only=False)
        dbp = np.where(d >= 0, np.floor(d * 10000 + 0.5),
                       np.ceil(d * 10000 - 0.5)).astype(np.int64)
        tbp = np.where(t >= 0, np.floor(t * 10000 + 0.5),
                       np.ceil(t * 10000 - 0.5)).astype(np.int64)
        mult = (10000 - dbp) * (10000 + tbp)
        df = pd.DataFrame({
            "rf": np.asarray(
                b["l_returnflag"].to_numpy(zero_copy_only=False)),
            "n": 1,
            "tw": (tbp > dbp).astype(np.int64),
            "dw": (dbp > tbp).astype(np.int64),
            "mult": mult,
        })
        agg = df.groupby("rf").agg(
            n=("n", "sum"), tw=("tw", "sum"), dw=("dw", "sum"),
            mult=("mult", "sum")).reset_index()
        for cn in ["n", "tw", "dw", "mult"]:
            agg[cn] = agg[cn].astype(np.int64)
        return pa.Table.from_pandas(agg, preserve_index=False)

    def comb(b: pa.Table) -> pa.Table:
        g = b.group_by(["rf"]).aggregate(
            [("n", "sum"), ("tw", "sum"), ("dw", "sum"),
             ("mult", "sum")])
        return g.rename_columns(["rf", "n", "tw", "dw", "mult"])

    cc = tree_merge(
        li.map_batches(part, batch_format="pyarrow",
                       batch_size=None),
        comb,
    ).to_pandas()
    if "rf" not in cc.columns or len(cc) == 0:
        return pa.table({
            "l_returnflag": pa.array([], pa.string()),
            "n_lines": pa.array([], pa.int64()),
            "n_tax_wins": pa.array([], pa.int64()),
            "n_discount_wins": pa.array([], pa.int64()),
            "n_ties": pa.array([], pa.int64()),
            "mean_net_mult_ppm": pa.array([], pa.int64()),
        })
    cc = cc.sort_values("rf")
    n = cc["n"].to_numpy(np.int64)
    tw = cc["tw"].to_numpy(np.int64)
    dw = cc["dw"].to_numpy(np.int64)
    mult = cc["mult"].to_numpy(np.int64)
    return pa.table({
        "l_returnflag": pa.array(cc["rf"], pa.string()),
        "n_lines": pa.array(n, pa.int64()),
        "n_tax_wins": pa.array(tw, pa.int64()),
        "n_discount_wins": pa.array(dw, pa.int64()),
        "n_ties": pa.array(n - tw - dw, pa.int64()),
        "mean_net_mult_ppm": pa.array(
            [_round_half_away(m / cnt / 1e8 * 1e6)
             for m, cnt in zip(mult, n)], pa.int64()),
    })


TED_SQL = """
WITH bp AS MATERIALIZED (
  SELECT l_returnflag AS rf,
         CAST(ROUND(l_discount * 10000, 0) AS BIGINT) AS dbp,
         CAST(ROUND(l_tax * 10000, 0) AS BIGINT) AS tbp
  FROM lineitem
  WHERE l_returnflag IS NOT NULL AND l_discount IS NOT NULL
    AND l_tax IS NOT NULL
)
SELECT rf AS l_returnflag,
       CAST(COUNT(*) AS BIGINT) AS n_lines,
       CAST(SUM(CASE WHEN tbp > dbp THEN 1 ELSE 0 END)
            AS BIGINT) AS n_tax_wins,
       CAST(SUM(CASE WHEN dbp > tbp THEN 1 ELSE 0 END)
            AS BIGINT) AS n_discount_wins,
       CAST(SUM(CASE WHEN dbp = tbp THEN 1 ELSE 0 END)
            AS BIGINT) AS n_ties,
       CAST(ROUND(CAST(SUM((10000 - dbp) * (10000 + tbp))
            AS DOUBLE) / COUNT(*) / 100000000 * 1000000, 0)
            AS BIGINT) AS mean_net_mult_ppm
FROM bp
GROUP BY rf
ORDER BY rf
"""


def register_r4ia(queries: dict, oracles: dict) -> None:
    queries.update(
        {
            "expectile_value_tau90": q_expectile_value_tau90,
            "dow_amplitude_by_type": q_dow_amplitude_by_type,
            "tax_exceeds_discount_census":
                q_tax_exceeds_discount_census,
        }
    )
    oracles.update(
        {
            "expectile_value_tau90": EXP_SQL,
            "dow_amplitude_by_type": DAT_SQL,
            "tax_exceeds_discount_census": TED_SQL,
        }
    )
