"""Round-4 batch CP: one-way ANOVA F across event types, Welch's
unequal-variance t between high/low order priorities, and the Poisson
dispersion (variance-to-mean) index of per-minute arrival counts.

Exactness discipline: every test folds to exact int64 group sufficient
statistics (n, s1, s2 at x100 grain; minute-bucket counts); the final
F / t / dispersion expressions are mirrored token-for-token against
DuckDB, x1e6 snap, NULL on degenerate denominators.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from mimirsbrunn_ray.stages.rollup import tree_merge

_MIN_US = 60_000_000
_HIGH_PRIO = ("1-URGENT", "2-HIGH")


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


def _group_nss(sf_dir, table, key_expr_partial):
    """Exact (group, n, s1, s2) via combiner-first partials."""
    return tree_merge(
        key_expr_partial,
        lambda b: _sum_by(b, ["g"], ["n", "s1", "s2"]),
    ).to_pandas()


# ---------------------------------------------------------------------------
# one-way ANOVA F: does mean value differ across event types?
# ---------------------------------------------------------------------------


def q_anova_value_by_type(sf_dir):
    """One-row one-way ANOVA across event types on x100 values: the F
    statistic (between-group mean square over within-group mean square)
    and the eta² effect size (SSB / SST) — the parametric k-group
    companion to the pairwise tests already in the registry. Group
    sufficient statistics (n, s1, s2) fold exact int64 in one
    combiner-first pass; SSB = sum(s1_g²/n_g) - S1²/N and SSW = SST -
    SSB are mirrored doubles; output also carries the exact integer
    degrees of freedom. NULL F when SSW = 0 or df degenerate."""
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
    ).to_pandas()  # bounded: one row per type

    if not len(grp) or "g" not in grp.columns:
        return pa.table(
            {
                "k": pa.array([], pa.int64()),
                "n": pa.array([], pa.int64()),
                "f_x1e6": pa.array([], pa.int64()),
                "eta2_x1e6": pa.array([], pa.int64()),
            }
        )
    k = len(grp)
    n = int(grp["n"].sum())
    s1 = int(grp["s1"].sum())
    s2 = int(grp["s2"].sum())
    ssb = float(
        np.sum(
            grp["s1"].to_numpy(dtype=np.float64) ** 2
            / grp["n"].to_numpy(dtype=np.float64)
        )
    ) - float(s1) * s1 / n
    sst = float(s2) - float(s1) * s1 / n
    ssw = sst - ssb
    f = (
        None
        if k < 2 or n <= k or ssw == 0.0
        else int(
            _round_half_away(
                np.array([(ssb / (k - 1)) / (ssw / (n - k)) * 1e6])
            )[0]
        )
    )
    eta2 = (
        None
        if sst == 0.0
        else int(_round_half_away(np.array([ssb / sst * 1e6]))[0])
    )
    return pa.table(
        {
            "k": pa.array([k], pa.int64()),
            "n": pa.array([n], pa.int64()),
            "f_x1e6": pa.array([f], pa.int64()),
            "eta2_x1e6": pa.array([eta2], pa.int64()),
        }
    )


ANOVA_SQL = """
WITH v AS (
  SELECT event_type AS g, CAST(ROUND(value * 100, 0) AS BIGINT) AS x
  FROM events
  WHERE event_type IS NOT NULL AND value IS NOT NULL
), a AS MATERIALIZED (
  SELECT g, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x) AS BIGINT) AS s1, CAST(SUM(x * x) AS BIGINT) AS s2
  FROM v GROUP BY 1
), t AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS k, CAST(SUM(n) AS BIGINT) AS n,
         CAST(SUM(s1) AS BIGINT) AS s1, CAST(SUM(s2) AS BIGINT) AS s2,
         SUM(CAST(s1 AS DOUBLE) * s1 / n) AS sb_raw
  FROM a
)
SELECT k, n,
       CASE WHEN k < 2 OR n <= k
              OR (s2 - CAST(s1 AS DOUBLE) * s1 / n)
                 - (sb_raw - CAST(s1 AS DOUBLE) * s1 / n) = 0
            THEN NULL
            ELSE CAST(ROUND(
              ((sb_raw - CAST(s1 AS DOUBLE) * s1 / n) / (k - 1))
              / (((s2 - CAST(s1 AS DOUBLE) * s1 / n)
                  - (sb_raw - CAST(s1 AS DOUBLE) * s1 / n)) / (n - k))
              * 1000000, 0) AS BIGINT) END AS f_x1e6,
       CASE WHEN s2 - CAST(s1 AS DOUBLE) * s1 / n = 0 THEN NULL
            ELSE CAST(ROUND(
              (sb_raw - CAST(s1 AS DOUBLE) * s1 / n)
              / (s2 - CAST(s1 AS DOUBLE) * s1 / n)
              * 1000000, 0) AS BIGINT) END AS eta2_x1e6
FROM t
"""


# ---------------------------------------------------------------------------
# Welch's t: order totalprice, high vs low priority
# ---------------------------------------------------------------------------


def q_welch_t_priority_value(sf_dir):
    """One-row Welch unequal-variance t-test between order total prices
    of HIGH (1-URGENT/2-HIGH) and LOW priority orders, with the
    Welch-Satterthwaite degrees of freedom — the robust two-sample mean
    comparison when variances differ (the parametric twin of the
    Mann-Whitney query, which only ranks). Cents-quantized sufficient
    statistics fold exact int64; t and df are mirrored doubles, x1e6
    snap, NULL when either side has < 2 samples or both variances
    vanish."""
    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderpriority", "o_totalprice"]
    )

    def partial(b: pa.Table) -> pa.Table:
        b = _clean(b, ("o_orderpriority", "o_totalprice"))
        hi = pc.is_in(
            b["o_orderpriority"], value_set=pa.array(list(_HIGH_PRIO))
        ).to_numpy(zero_copy_only=False).astype(np.int64)
        x = _round_half_away_x(
            b["o_totalprice"].to_numpy(zero_copy_only=False).astype(np.float64),
            100.0,
        )
        # cents grain: x <= ~6e7, x² <= 3.6e15 — partial batch sums stay
        # inside int64 for any batch below ~2.5k rows * 1e3 blocks; the
        # per-batch combiner keeps per-row squares from ever accumulating
        # beyond one batch in a single int64 add chain
        xf = x.astype(np.float64)
        t = pa.table(
            {
                "g": pa.array(hi),
                "n": pa.array(np.ones(len(x), np.int64)),
                "s1": pa.array(x),
                "s2f": pa.array(xf * xf),
            }
        )
        return _sum_by(t, ["g"], ["n", "s1", "s2f"])

    grp = tree_merge(
        orders.map_batches(partial, batch_format="pyarrow", batch_size=None),
        lambda b: _sum_by(b, ["g"], ["n", "s1", "s2f"]),
    ).to_pandas()

    def row(gv):
        r = grp[grp["g"] == gv]
        if not len(r):
            return 0, 0, 0.0
        return (
            int(r["n"].iloc[0]),
            int(r["s1"].iloc[0]),
            float(r["s2f"].iloc[0]),
        )

    if not len(grp) or "g" not in grp.columns:
        grp = pd.DataFrame({"g": [], "n": [], "s1": [], "s2f": []})
    nh, s1h, s2h = row(1)
    nl, s1l, s2l = row(0)
    if nh < 2 or nl < 2:
        t_val, df_val = None, None
    else:
        vh = (s2h - float(s1h) * s1h / nh) / (nh - 1)
        vl = (s2l - float(s1l) * s1l / nl) / (nl - 1)
        se2 = vh / nh + vl / nl
        if se2 == 0.0:
            t_val, df_val = None, None
        else:
            t = (float(s1h) / nh - float(s1l) / nl) / np.sqrt(se2)
            df = se2 * se2 / (
                (vh / nh) * (vh / nh) / (nh - 1)
                + (vl / nl) * (vl / nl) / (nl - 1)
            )
            t_val = int(_round_half_away(np.array([t * 1e6]))[0])
            df_val = int(_round_half_away(np.array([df * 1e6]))[0])
    return pa.table(
        {
            "n_high": pa.array([nh], pa.int64()),
            "n_low": pa.array([nl], pa.int64()),
            "t_x1e6": pa.array([t_val], pa.int64()),
            "df_x1e6": pa.array([df_val], pa.int64()),
        }
    )


WELCH_SQL = f"""
WITH v AS (
  SELECT CASE WHEN o_orderpriority IN {_HIGH_PRIO} THEN 1 ELSE 0 END AS g,
         CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS x
  FROM orders
  WHERE o_orderpriority IS NOT NULL AND o_totalprice IS NOT NULL
), a AS MATERIALIZED (
  SELECT g, CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(x) AS BIGINT) AS s1,
         SUM(CAST(x AS DOUBLE) * CAST(x AS DOUBLE)) AS s2f
  FROM v GROUP BY 1
), p AS (
  SELECT
    (SELECT n FROM a WHERE g = 1) AS nh,
    (SELECT s1 FROM a WHERE g = 1) AS s1h,
    (SELECT s2f FROM a WHERE g = 1) AS s2h,
    (SELECT n FROM a WHERE g = 0) AS nl,
    (SELECT s1 FROM a WHERE g = 0) AS s1l,
    (SELECT s2f FROM a WHERE g = 0) AS s2l
), c AS (
  SELECT COALESCE(nh, 0) AS nh, COALESCE(nl, 0) AS nl,
         (s2h - CAST(s1h AS DOUBLE) * s1h / nh) / (nh - 1) AS vh,
         (s2l - CAST(s1l AS DOUBLE) * s1l / nl) / (nl - 1) AS vl,
         CAST(s1h AS DOUBLE) / nh - CAST(s1l AS DOUBLE) / nl AS dmean
  FROM p
)
SELECT nh AS n_high, nl AS n_low,
       CASE WHEN nh < 2 OR nl < 2 OR vh / nh + vl / nl = 0 THEN NULL
            ELSE CAST(ROUND(dmean / SQRT(vh / nh + vl / nl) * 1000000, 0)
                 AS BIGINT) END AS t_x1e6,
       CASE WHEN nh < 2 OR nl < 2 OR vh / nh + vl / nl = 0 THEN NULL
            ELSE CAST(ROUND(
              (vh / nh + vl / nl) * (vh / nh + vl / nl)
              / ((vh / nh) * (vh / nh) / (nh - 1)
                 + (vl / nl) * (vl / nl) / (nl - 1))
              * 1000000, 0) AS BIGINT) END AS df_x1e6
FROM c
"""


# ---------------------------------------------------------------------------
# Poisson dispersion index of per-minute arrival counts
# ---------------------------------------------------------------------------


def q_poisson_dispersion_minutes(sf_dir):
    """Per event type: the dispersion (variance-to-mean) index of
    per-minute arrival counts over the type's DENSE minute grid (gap
    minutes count as zero) — D ~ 1 is Poisson, D >> 1 flags bursty
    clustering, the standard overdispersion screen before assuming
    Poisson arrivals. Per-minute counts fold exact int64 (observed
    cells only); the zero cells enter through the exact span arithmetic
    n_buckets = (max-min)/60s + 1, sum-of-zeros = 0. D = s²/mean is one
    mirrored double per type, x1e6 snap."""
    ev = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_type", "ts"])

    def partial(b: pa.Table) -> pa.Table:
        b = _clean(b, ("event_type", "ts"))
        us = b["ts"].cast(pa.timestamp("us")).cast(pa.int64()).to_numpy()
        m = (us // _MIN_US).astype(np.int64)
        t = pa.table(
            {
                "event_type": b["event_type"],
                "m": pa.array(m),
                "c": pa.array(np.ones(len(m), np.int64)),
            }
        )
        return _sum_by(t, ["event_type", "m"], ["c"])

    obs = tree_merge(
        ev.map_batches(partial, batch_format="pyarrow", batch_size=None),
        lambda b: _sum_by(b, ["event_type", "m"], ["c"]),
    )

    def reduce_partial(b: pa.Table) -> pa.Table:
        c = b["c"].to_numpy()
        m = b["m"].to_numpy()
        t = pa.table(
            {
                "event_type": b["event_type"],
                "sc": pa.array(c),
                "sc2": pa.array(c * c),
                "mn": pa.array(m),
                "mx": pa.array(m),
                "n_obs": pa.array(np.ones(len(c), np.int64)),
            }
        )
        g = t.group_by(["event_type"]).aggregate(
            [("sc", "sum"), ("sc2", "sum"), ("mn", "min"), ("mx", "max"),
             ("n_obs", "sum")]
        )
        return g.select(
            ["event_type", "sc_sum", "sc2_sum", "mn_min", "mx_max",
             "n_obs_sum"]
        ).rename_columns(["event_type", "sc", "sc2", "mn", "mx", "n_obs"])

    def reduce_combine(b: pa.Table) -> pa.Table:
        g = b.group_by(["event_type"]).aggregate(
            [("sc", "sum"), ("sc2", "sum"), ("mn", "min"), ("mx", "max"),
             ("n_obs", "sum")]
        )
        return g.select(
            ["event_type", "sc_sum", "sc2_sum", "mn_min", "mx_max",
             "n_obs_sum"]
        ).rename_columns(["event_type", "sc", "sc2", "mn", "mx", "n_obs"])

    stats = tree_merge(
        obs.map_batches(reduce_partial, batch_format="pyarrow", batch_size=None),
        reduce_combine,
    ).to_pandas()

    if not len(stats) or "event_type" not in stats.columns:
        return pa.table(
            {
                "event_type": pa.array([], pa.string()),
                "n_minutes": pa.array([], pa.int64()),
                "n_events": pa.array([], pa.int64()),
                "d_x1e6": pa.array([], pa.int64()),
            }
        )
    stats = stats.sort_values("event_type", ignore_index=True)
    outs = {"event_type": [], "n_minutes": [], "n_events": [], "d_x1e6": []}
    for i in range(len(stats)):
        sc = int(stats["sc"].iloc[i])
        sc2 = int(stats["sc2"].iloc[i])
        nb = int(stats["mx"].iloc[i]) - int(stats["mn"].iloc[i]) + 1
        outs["event_type"].append(stats["event_type"].iloc[i])
        outs["n_minutes"].append(nb)
        outs["n_events"].append(sc)
        if nb < 2 or sc == 0:
            outs["d_x1e6"].append(None)
            continue
        mean = float(sc) / nb
        var = (float(sc2) - float(sc) * sc / nb) / (nb - 1)
        outs["d_x1e6"].append(
            int(_round_half_away(np.array([var / mean * 1e6]))[0])
        )
    return pa.table(
        {
            "event_type": pa.array(outs["event_type"], pa.string()),
            "n_minutes": pa.array(outs["n_minutes"], pa.int64()),
            "n_events": pa.array(outs["n_events"], pa.int64()),
            "d_x1e6": pa.array(outs["d_x1e6"], pa.int64()),
        }
    )


POISSON_DISP_SQL = """
WITH c AS MATERIALIZED (
  SELECT event_type,
         CAST(FLOOR(EPOCH_US(ts) / 60000000) AS BIGINT) AS m,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM events
  WHERE event_type IS NOT NULL AND ts IS NOT NULL
  GROUP BY 1, 2
), a AS (
  SELECT event_type,
         CAST(SUM(c) AS BIGINT) AS sc,
         CAST(SUM(c * c) AS BIGINT) AS sc2,
         CAST(MAX(m) - MIN(m) + 1 AS BIGINT) AS nb
  FROM c GROUP BY 1
)
SELECT event_type, nb AS n_minutes, sc AS n_events,
       CASE WHEN nb < 2 OR sc = 0 THEN NULL
            ELSE CAST(ROUND(
              ((sc2 - CAST(sc AS DOUBLE) * sc / nb) / (nb - 1))
              / (CAST(sc AS DOUBLE) / nb)
              * 1000000, 0) AS BIGINT) END AS d_x1e6
FROM a ORDER BY 1
"""


def register_r4cp(queries: dict, oracles: dict) -> None:
    queries.update(
        {
            "anova_value_by_type": q_anova_value_by_type,
            "welch_t_priority_value": q_welch_t_priority_value,
            "poisson_dispersion_minutes": q_poisson_dispersion_minutes,
        }
    )
    oracles.update(
        {
            "anova_value_by_type": ANOVA_SQL,
            "welch_t_priority_value": WELCH_SQL,
            "poisson_dispersion_minutes": POISSON_DISP_SQL,
        }
    )
