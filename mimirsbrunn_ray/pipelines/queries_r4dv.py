"""Round-4 batch DV: Kruskal-Wallis rank test across event types,
Brown-Forsythe variance-homogeneity test, and Moors octile kurtosis.

Exactness discipline: every statistic reduces over the exact
(event_type, cents) histogram — tied ranks enter as half-integers kept
as 2x int64 (R2 = 2 * rank sum is exact), tie corrections fold
t**3 - t in arbitrary-precision Python ints mirrored by HUGEINT in
SQL, octiles and medians select by integer cross-multiplication, and
only the final scalar assembly runs in mirrored doubles, x1e6 snap.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from mimirsbrunn_ray.stages.rollup import tree_merge
from mimirsbrunn_ray.stages.timeseries import _round_half_away_x


def _round_half_away(x: float):
    return int(np.floor(x + 0.5) if x >= 0 else np.ceil(x - 0.5))


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


def _type_cent_hist(sf_dir) -> pd.DataFrame:
    """Exact (event_type, cents) histogram of events.value — the shared
    decomposable front half: one column-pruned scan, vectorized cents
    quantization, per-batch partial counts, tree merge.  The histogram
    is bounded by (types x distinct cents), not by row count."""
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
                "event_type": b["event_type"],
                "x": pa.array(x),
                "c": pa.array(np.ones(len(x), np.int64)),
            }
        )
        return _sum_by(t, ["event_type", "x"], ["c"])

    return tree_merge(
        ev.map_batches(partial, batch_format="pyarrow", batch_size=None),
        lambda b: _sum_by(b, ["event_type", "x"], ["c"]),
    ).to_pandas()


# ---------------------------------------------------------------------------
# Kruskal-Wallis H across event types
# ---------------------------------------------------------------------------


def q_kruskal_wallis_value_types(sf_dir):
    """One row: the Kruskal-Wallis H statistic (with tie correction)
    testing whether the cents-quantized value distributions of the
    event types share a location — the nonparametric ANOVA that stays
    honest under the skew that breaks the F test. Average tied ranks
    are half-integers carried as exact 2x int64 rank sums per type;
    the tie-correction fold t^3 - t runs in Python ints (HUGEINT in
    the oracle); only the closing H assembly is a mirrored double,
    x1e6 snap. NULL H when every value ties (correction hits zero)."""
    hist = _type_cent_hist(sf_dir)
    if not len(hist) or "event_type" not in hist.columns:
        return pa.table(
            {
                "n_total": pa.array([], pa.int64()),
                "k_types": pa.array([], pa.int64()),
                "h_x1e6": pa.array([], pa.int64()),
                "h_adj_x1e6": pa.array([], pa.int64()),
            }
        )
    glob = (
        hist.groupby("x", sort=True)["c"].sum().reset_index()
    )
    xs = glob["x"].to_numpy(dtype=np.int64)
    tg = glob["c"].to_numpy(dtype=np.int64)
    n = int(tg.sum())
    cum_before = np.concatenate([[0], np.cumsum(tg)[:-1]])
    # 2 * average rank of each distinct cents value (exact int64)
    r2 = 2 * cum_before + tg + 1
    r2_map = dict(zip(xs.tolist(), r2.tolist()))
    k = 0
    sum_term = 0.0
    for _, g in hist.sort_values(["event_type", "x"]).groupby(
        "event_type", sort=True
    ):
        k += 1
        cg = g["c"].to_numpy(dtype=np.int64)
        xg = g["x"].to_numpy(dtype=np.int64)
        ng = int(cg.sum())
        # exact integer 2 * rank sum of the group
        r2_g = int(np.sum(cg * np.array([r2_map[v] for v in xg], np.int64)))
        sum_term += (float(r2_g) / 2.0) ** 2 / ng
    h = 12.0 / (n * (n + 1.0)) * sum_term - 3.0 * (n + 1.0)
    ties = sum(int(t) ** 3 - int(t) for t in tg.tolist())
    denom = n**3 - n
    corr = 1.0 - float(ties) / float(denom) if denom else 0.0
    h_adj = None if corr == 0.0 else h / corr
    return pa.table(
        {
            "n_total": pa.array([n], pa.int64()),
            "k_types": pa.array([k], pa.int64()),
            "h_x1e6": pa.array([_round_half_away(h * 1e6)], pa.int64()),
            "h_adj_x1e6": pa.array(
                [None if h_adj is None else _round_half_away(h_adj * 1e6)],
                pa.int64(),
            ),
        }
    )


KRUSKAL_SQL = """
WITH v AS MATERIALIZED (
  SELECT event_type, CAST(ROUND(value * 100, 0) AS BIGINT) AS x
  FROM events WHERE event_type IS NOT NULL AND value IS NOT NULL
), hist AS MATERIALIZED (
  SELECT event_type, x, CAST(COUNT(*) AS BIGINT) AS c
  FROM v GROUP BY 1, 2
), gq AS MATERIALIZED (
  SELECT x, CAST(SUM(c) AS BIGINT) AS t,
         CAST(2 * (SUM(SUM(c)) OVER (ORDER BY x
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              - SUM(c)) + SUM(c) + 1 AS BIGINT) AS r2
  FROM hist GROUP BY x
), grp AS (
  SELECT h.event_type, CAST(SUM(h.c) AS BIGINT) AS ng,
         CAST(SUM(h.c * g.r2) AS BIGINT) AS r2g
  FROM hist h JOIN gq g USING (x) GROUP BY 1
), tot AS (
  SELECT CAST(SUM(t) AS BIGINT) AS n,
         SUM(CAST(t AS HUGEINT) * t * t - t) AS ties
  FROM gq
), s AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS k,
         SUM((CAST(r2g AS DOUBLE) / 2) * (CAST(r2g AS DOUBLE) / 2) / ng)
           AS st
  FROM grp
)
SELECT tot.n AS n_total, s.k AS k_types,
       CAST(ROUND((12.0 / (tot.n * (tot.n + 1.0)) * s.st
             - 3.0 * (tot.n + 1.0)) * 1000000, 0) AS BIGINT) AS h_x1e6,
       CASE WHEN 1.0 - CAST(tot.ties AS DOUBLE)
                 / (CAST(tot.n AS HUGEINT) * tot.n * tot.n - tot.n) = 0
            THEN NULL
            ELSE CAST(ROUND((12.0 / (tot.n * (tot.n + 1.0)) * s.st
                  - 3.0 * (tot.n + 1.0))
                  / (1.0 - CAST(tot.ties AS DOUBLE)
                     / (CAST(tot.n AS HUGEINT) * tot.n * tot.n - tot.n))
                  * 1000000, 0) AS BIGINT) END AS h_adj_x1e6
FROM tot, s
"""


# ---------------------------------------------------------------------------
# Brown-Forsythe variance-homogeneity test
# ---------------------------------------------------------------------------


def q_brown_forsythe_value_types(sf_dir):
    """One row: the Brown-Forsythe W statistic — Levene's variance-
    homogeneity test on absolute deviations from each type's MEDIAN
    (the robust centering that keeps the test honest under skew).
    Medians select from the exact histogram by integer cross-
    multiplication; |x - median| folds are exact int64 (n, sum z,
    sum z^2 per type); W assembles in mirrored doubles, x1e6 snap,
    NULL on a zero within-group sum of squares."""
    hist = _type_cent_hist(sf_dir)
    if not len(hist) or "event_type" not in hist.columns:
        return pa.table(
            {
                "n_total": pa.array([], pa.int64()),
                "k_types": pa.array([], pa.int64()),
                "df2": pa.array([], pa.int64()),
                "w_x1e6": pa.array([], pa.int64()),
            }
        )
    stats = []  # (ng, s1, s2) per type from exact histogram arithmetic
    for _, g in hist.sort_values(["event_type", "x"]).groupby(
        "event_type", sort=True
    ):
        xg = g["x"].to_numpy(dtype=np.int64)
        cg = g["c"].to_numpy(dtype=np.int64)
        ng = int(cg.sum())
        cum = np.cumsum(cg)
        med = int(xg[int(np.argmax(2 * cum >= ng))])
        z = np.abs(xg - med)
        s1 = int(np.sum(cg * z))
        s2 = int(np.sum(cg * z * z))
        stats.append((ng, s1, s2))
    n = sum(s[0] for s in stats)
    k = len(stats)
    s1_tot = sum(s[1] for s in stats)
    zbar = float(s1_tot) / n
    between = sum(
        ng * (float(s1) / ng - zbar) ** 2 for ng, s1, _ in stats
    )
    within = sum(
        float(s2) - float(s1) * s1 / ng for ng, s1, s2 in stats
    )
    w = (
        None
        if within == 0.0 or k < 2
        else (float(n - k) / (k - 1)) * between / within
    )
    return pa.table(
        {
            "n_total": pa.array([n], pa.int64()),
            "k_types": pa.array([k], pa.int64()),
            "df2": pa.array([n - k], pa.int64()),
            "w_x1e6": pa.array(
                [None if w is None else _round_half_away(w * 1e6)],
                pa.int64(),
            ),
        }
    )


BROWN_FORSYTHE_SQL = """
WITH v AS MATERIALIZED (
  SELECT event_type, CAST(ROUND(value * 100, 0) AS BIGINT) AS x
  FROM events WHERE event_type IS NOT NULL AND value IS NOT NULL
), m AS MATERIALIZED (
  SELECT event_type,
         CAST(PERCENTILE_DISC(0.5) WITHIN GROUP (ORDER BY x) AS BIGINT)
           AS med
  FROM v GROUP BY 1
), z AS (
  SELECT v.event_type, ABS(v.x - m.med) AS z
  FROM v JOIN m USING (event_type)
), g AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS ng,
         CAST(SUM(z) AS BIGINT) AS s1, CAST(SUM(z * z) AS BIGINT) AS s2
  FROM z GROUP BY 1
), t AS (
  SELECT CAST(SUM(ng) AS BIGINT) AS n, CAST(COUNT(*) AS BIGINT) AS k,
         CAST(SUM(s1) AS BIGINT) AS s1t,
         SUM(ng * POWER(CAST(s1 AS DOUBLE) / ng
             - (SELECT CAST(SUM(s1) AS DOUBLE) / SUM(ng) FROM g), 2))
           AS between_ss,
         SUM(CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / ng)
           AS within_ss
  FROM g
)
SELECT n AS n_total, k AS k_types, n - k AS df2,
       CASE WHEN within_ss = 0 OR k < 2 THEN NULL
            ELSE CAST(ROUND((CAST(n - k AS DOUBLE) / (k - 1))
                 * between_ss / within_ss * 1000000, 0) AS BIGINT)
       END AS w_x1e6
FROM t
"""


# ---------------------------------------------------------------------------
# Moors octile kurtosis per event type
# ---------------------------------------------------------------------------


def q_moors_kurtosis_value(sf_dir):
    """Per event type: the Moors octile kurtosis ((E7-E5)+(E3-E1)) /
    (E6-E2) of cents-quantized values — the quantile kurtosis that a
    single wild outlier cannot move (unlike the fourth moment; the
    normal reference value is ~1.233). Octiles select from the exact
    histogram by integer cross-multiplication (8*cum >= i*n, i.e.
    PERCENTILE_DISC(i/8)); the ratio is a mirrored double, x1e6 snap,
    NULL when the inter-sextile range E6-E2 is zero."""
    hist = _type_cent_hist(sf_dir)
    if not len(hist) or "event_type" not in hist.columns:
        return pa.table(
            {
                "event_type": pa.array([], pa.string()),
                "n": pa.array([], pa.int64()),
                "moors_x1e6": pa.array([], pa.int64()),
            }
        )
    out = {"event_type": [], "n": [], "moors_x1e6": []}
    for et, g in hist.sort_values(["event_type", "x"]).groupby(
        "event_type", sort=True
    ):
        xg = g["x"].to_numpy(dtype=np.int64)
        cg = g["c"].to_numpy(dtype=np.int64)
        ng = int(cg.sum())
        cum = np.cumsum(cg)
        e = {
            i: int(xg[int(np.argmax(8 * cum >= i * ng))])
            for i in (1, 2, 3, 5, 6, 7)
        }
        den = e[6] - e[2]
        moors = (
            None
            if den == 0
            else float((e[7] - e[5]) + (e[3] - e[1])) / den
        )
        out["event_type"].append(et)
        out["n"].append(ng)
        out["moors_x1e6"].append(
            None if moors is None else _round_half_away(moors * 1e6)
        )
    return pa.table(
        {
            "event_type": pa.array(out["event_type"], pa.string()),
            "n": pa.array(out["n"], pa.int64()),
            "moors_x1e6": pa.array(out["moors_x1e6"], pa.int64()),
        }
    )


MOORS_SQL = """
WITH v AS MATERIALIZED (
  SELECT event_type, CAST(ROUND(value * 100, 0) AS BIGINT) AS x
  FROM events WHERE event_type IS NOT NULL AND value IS NOT NULL
), q AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(PERCENTILE_DISC(0.125) WITHIN GROUP (ORDER BY x) AS BIGINT) AS e1,
         CAST(PERCENTILE_DISC(0.25)  WITHIN GROUP (ORDER BY x) AS BIGINT) AS e2,
         CAST(PERCENTILE_DISC(0.375) WITHIN GROUP (ORDER BY x) AS BIGINT) AS e3,
         CAST(PERCENTILE_DISC(0.625) WITHIN GROUP (ORDER BY x) AS BIGINT) AS e5,
         CAST(PERCENTILE_DISC(0.75)  WITHIN GROUP (ORDER BY x) AS BIGINT) AS e6,
         CAST(PERCENTILE_DISC(0.875) WITHIN GROUP (ORDER BY x) AS BIGINT) AS e7
  FROM v GROUP BY 1
)
SELECT event_type, n,
       CASE WHEN e6 - e2 = 0 THEN NULL
            ELSE CAST(ROUND(CAST((e7 - e5) + (e3 - e1) AS DOUBLE)
                 / (e6 - e2) * 1000000, 0) AS BIGINT) END AS moors_x1e6
FROM q ORDER BY 1
"""


def register_r4dv(queries: dict, oracles: dict) -> None:
    queries.update(
        {
            "kruskal_wallis_value_types": q_kruskal_wallis_value_types,
            "brown_forsythe_value_types": q_brown_forsythe_value_types,
            "moors_kurtosis_value": q_moors_kurtosis_value,
        }
    )
    oracles.update(
        {
            "kruskal_wallis_value_types": KRUSKAL_SQL,
            "brown_forsythe_value_types": BROWN_FORSYTHE_SQL,
            "moors_kurtosis_value": MOORS_SQL,
        }
    )
