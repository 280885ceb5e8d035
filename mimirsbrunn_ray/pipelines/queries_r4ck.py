"""Round-4 batch CK: Durbin-Watson serial correlation, gamma
method-of-moments fit of inter-purchase gaps, and Cramér's V effect
size for the type x hour association.

Exactness discipline: every statistic folds to exact int64 sufficient
statistics (dollar/hour-grain sums, squared sums, contingency counts)
via combiner-first partials; the single final float expression per row
is MIRRORED token-for-token against the DuckDB oracle and snapped to
fixed point. Ordered statistics ride the shared series-bucket idiom
(stages/timeseries.py:_project_series): one hash shuffle on the series
key, a mergesort inside each bucket, vectorized diffs.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from mimirsbrunn_ray.stages.dedup import _BUCKET, add_bucket
from mimirsbrunn_ray.stages.join import broadcast_join, make_lookup_ref
from mimirsbrunn_ray.stages.rollup import tree_merge
from mimirsbrunn_ray.stages.timeseries import (
    _project_series,
    _round_half_away_x,
    _series_segments,
)

_HOUR_US = 3_600_000_000


def _round_half_away(x: np.ndarray) -> np.ndarray:
    return np.where(x >= 0, np.floor(x + 0.5), np.ceil(x - 0.5)).astype(
        np.int64
    )


def _sum_by(t: pa.Table, keys: list[str], vals: list[str]) -> pa.Table:
    g = t.group_by(keys).aggregate([(v, "sum") for v in vals])
    g = g.select(keys + [f"{v}_sum" for v in vals])
    return g.rename_columns(keys + vals)


# ---------------------------------------------------------------------------
# Durbin-Watson statistic per event type
# ---------------------------------------------------------------------------


def q_durbin_watson_value(sf_dir):
    """Per event type: the Durbin-Watson statistic of the dollar-grain
    value series ordered by (ts, event_id) — DW = sum((x_t - x_{t-1})^2)
    / sum((x_t - mean)^2), the classic lag-1 serial-correlation screen
    (DW ~ 2 means no autocorrelation; the mean cancels in the numerator
    differences, so both sums fold from exact int64 partials: n, s1, s2
    and the adjacent-difference square sum). Dollar grain keeps every
    square inside int64 at bench scales (|x| <= ~330). One series-key
    hash shuffle; each type's series is contiguous inside its bucket so
    the lag never crosses partitions; the final division is one mirrored
    double per type, x1e6 snap."""
    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_type", "ts", "event_id", "value"],
    )
    proj = _project_series(ev, "event_type", "ts", "event_id", "value", 64)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "event_type": pd.Series([], dtype=object),
                "n": pd.Series([], dtype=np.int64),
                "s1": pd.Series([], dtype=np.int64),
                "s2": pd.Series([], dtype=np.int64),
                "num": pd.Series([], dtype=np.int64),
            }
        )
        if len(g) == 0:
            return empty
        g, same = _series_segments(g, "event_type", "ts", "event_id")
        x = _round_half_away_x(g["value"].to_numpy(dtype=np.float64), 1.0)
        dx = np.zeros(len(g), dtype=np.int64)
        dx[1:] = x[1:] - x[:-1]
        dx2 = np.where(same, dx * dx, 0)
        out = pd.DataFrame(
            {"event_type": g["event_type"], "x": x, "x2": x * x, "dx2": dx2}
        )
        a = out.groupby("event_type", sort=False).agg(
            n=("x", "size"), s1=("x", "sum"), s2=("x2", "sum"),
            num=("dx2", "sum"),
        )
        return a.reset_index().astype(
            {"n": np.int64, "s1": np.int64, "s2": np.int64, "num": np.int64}
        )

    # each type hashes to exactly one bucket, so per-bucket rows are
    # already final per-type totals — no cross-bucket merge needed
    stats = (
        proj.groupby(_BUCKET)
        .map_groups(per_bucket, batch_format="pandas")
        .to_pandas()
    )  # bounded: one row per event type

    if not len(stats) or "event_type" not in stats.columns:
        return pa.table(
            {
                "event_type": pa.array([], pa.string()),
                "n": pa.array([], pa.int64()),
                "dw_x1e6": pa.array([], pa.int64()),
            }
        )
    stats = stats.sort_values("event_type", ignore_index=True)
    n = stats["n"].to_numpy(dtype=np.int64)
    s1 = stats["s1"].to_numpy(dtype=np.int64)
    s2 = stats["s2"].to_numpy(dtype=np.int64)
    num = stats["num"].to_numpy(dtype=np.int64)
    den = s2.astype(np.float64) - s1.astype(np.float64) * s1 / n
    vals = [
        None
        if den[i] == 0.0
        else int(_round_half_away(np.array([num[i] / den[i] * 1e6]))[0])
        for i in range(len(stats))
    ]
    return pa.table(
        {
            "event_type": pa.array(stats["event_type"].tolist(), pa.string()),
            "n": pa.array(n),
            "dw_x1e6": pa.array(vals, pa.int64()),
        }
    )


DW_SQL = """
WITH v AS (
  SELECT event_type, ts, event_id, CAST(ROUND(value, 0) AS BIGINT) AS x
  FROM events
  WHERE event_type IS NOT NULL AND ts IS NOT NULL AND value IS NOT NULL
), lagd AS (
  SELECT event_type, x,
         x - LAG(x) OVER (PARTITION BY event_type
                          ORDER BY ts, event_id) AS dx
  FROM v
), agg AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x) AS BIGINT) AS s1,
         CAST(SUM(x * x) AS BIGINT) AS s2,
         CAST(SUM(CASE WHEN dx IS NOT NULL THEN dx * dx ELSE 0 END)
              AS BIGINT) AS num
  FROM lagd GROUP BY 1
)
SELECT event_type, n,
       CASE WHEN s2 - CAST(s1 AS DOUBLE) * s1 / n = 0 THEN NULL
            ELSE CAST(ROUND(CAST(num AS DOUBLE)
                            / (s2 - CAST(s1 AS DOUBLE) * s1 / n)
                            * 1000000, 0) AS BIGINT) END AS dw_x1e6
FROM agg ORDER BY 1
"""


# ---------------------------------------------------------------------------
# gamma method-of-moments fit of inter-purchase gaps per market segment
# ---------------------------------------------------------------------------


def q_gamma_fit_interpurchase(sf_dir):
    """Per market segment: method-of-moments gamma fit (shape k =
    mean^2/var, scale theta = var/mean) of the HOUR-grain gaps between
    a customer's consecutive orders — the renewal-process model behind
    inter-arrival burstiness scoring (k < 1 = bursty, k > 1 = regular).
    Gaps come from one custkey hash shuffle + per-bucket mergesort
    (custkey, orderdate, orderkey); hour grain keeps dt^2 sums inside
    int64 at bench scales. Per-customer partials are complete inside
    their bucket; segments attach to the bounded per-customer table via
    the broadcast dimension join (J1); k/theta are mirrored doubles over
    exact (n, s1, s2), x1e6 snap, NULL for degenerate variance/mean."""
    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_orderdate", "o_orderkey"],
    )

    def prep(b: pa.Table) -> pa.Table:
        m = pc.and_(pc.is_valid(b["o_custkey"]), pc.is_valid(b["o_orderdate"]))
        return add_bucket(b.filter(m), "o_custkey", 64)

    bucketed = orders.map_batches(prep, batch_format="pyarrow", batch_size=None)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "o_custkey": pd.Series([], dtype=np.int64),
                "n_gaps": pd.Series([], dtype=np.int64),
                "s1": pd.Series([], dtype=np.int64),
                "s2": pd.Series([], dtype=np.int64),
            }
        )
        if len(g) == 0:
            return empty
        g, same = _series_segments(g, "o_custkey", "o_orderdate", "o_orderkey")
        ts_us = (
            g["o_orderdate"].to_numpy().astype("datetime64[us]").astype(np.int64)
        )
        dt = np.zeros(len(g), dtype=np.int64)
        dt[1:] = ts_us[1:] - ts_us[:-1]
        dt_h = dt // _HOUR_US  # FLOOR(EPOCH(diff)/3600) mirror
        d = pd.DataFrame(
            {
                "o_custkey": g["o_custkey"].to_numpy()[same],
                "dt": dt_h[same],
            }
        )
        if not len(d):
            return empty
        a = d.groupby("o_custkey", sort=False)["dt"].agg(
            n_gaps="size", s1="sum"
        )
        a["s2"] = d.assign(q=d["dt"] * d["dt"]).groupby(
            "o_custkey", sort=False
        )["q"].sum()
        return a.reset_index().astype(
            {
                "o_custkey": np.int64,
                "n_gaps": np.int64,
                "s1": np.int64,
                "s2": np.int64,
            }
        )

    per_cust = bucketed.groupby(_BUCKET).map_groups(
        per_bucket, batch_format="pandas"
    )

    from mimirsbrunn_ray.stages.join import lookup_ref_from_parquet

    # budget-gated: broadcast arrays under the byte budget, else the
    # distributed left-join fallback via dim_spec
    _dim = (f"{sf_dir}/customer.parquet", "c_custkey", "c_mktsegment")
    lookup = lookup_ref_from_parquet(*_dim)
    with_seg = broadcast_join(
        per_cust, lookup, "o_custkey", "c_mktsegment", default=None,
        dim_spec=_dim,
    ).map_batches(
        lambda b: b.filter(pc.is_valid(b["c_mktsegment"])),
        batch_format="pyarrow",
        batch_size=None,
    )

    agg = tree_merge(
        with_seg.map_batches(
            lambda b: _sum_by(
                b.select(["c_mktsegment", "n_gaps", "s1", "s2"]),
                ["c_mktsegment"],
                ["n_gaps", "s1", "s2"],
            ),
            batch_format="pyarrow",
            batch_size=None,
        ),
        lambda b: _sum_by(b, ["c_mktsegment"], ["n_gaps", "s1", "s2"]),
    ).to_pandas()  # bounded: one row per segment

    if not len(agg) or "c_mktsegment" not in agg.columns:
        return pa.table(
            {
                "c_mktsegment": pa.array([], pa.string()),
                "n_gaps": pa.array([], pa.int64()),
                "k_x1e6": pa.array([], pa.int64()),
                "theta_x1e6": pa.array([], pa.int64()),
            }
        )
    agg = agg.sort_values("c_mktsegment", ignore_index=True)
    n = agg["n_gaps"].to_numpy(dtype=np.int64)
    s1 = agg["s1"].to_numpy(dtype=np.int64)
    s2 = agg["s2"].to_numpy(dtype=np.int64)
    ks, thetas = [], []
    for i in range(len(agg)):
        if n[i] < 2:
            ks.append(None)
            thetas.append(None)
            continue
        mean = float(s1[i]) / n[i]
        var = (float(s2[i]) - float(s1[i]) * s1[i] / n[i]) / (n[i] - 1)
        ks.append(
            None
            if var == 0.0
            else int(_round_half_away(np.array([mean * mean / var * 1e6]))[0])
        )
        thetas.append(
            None
            if mean == 0.0
            else int(_round_half_away(np.array([var / mean * 1e6]))[0])
        )
    return pa.table(
        {
            "c_mktsegment": pa.array(agg["c_mktsegment"].tolist(), pa.string()),
            "n_gaps": pa.array(n),
            "k_x1e6": pa.array(ks, pa.int64()),
            "theta_x1e6": pa.array(thetas, pa.int64()),
        }
    )


GAMMA_FIT_SQL = """
WITH o AS (
  SELECT o_custkey, o_orderdate, o_orderkey FROM orders
  WHERE o_custkey IS NOT NULL AND o_orderdate IS NOT NULL
), g AS (
  SELECT o_custkey,
         CAST(FLOOR(EPOCH(o_orderdate - LAG(o_orderdate) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey))
           / 3600) AS BIGINT) AS dt
  FROM o
), d AS (
  SELECT o_custkey, dt FROM g WHERE dt IS NOT NULL
), a AS (
  SELECT c.c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n_gaps,
         CAST(SUM(d.dt) AS BIGINT) AS s1,
         CAST(SUM(d.dt * d.dt) AS BIGINT) AS s2
  FROM d JOIN customer c ON c.c_custkey = d.o_custkey
  WHERE c.c_mktsegment IS NOT NULL
  GROUP BY 1
)
SELECT c_mktsegment, n_gaps,
       CASE WHEN n_gaps < 2
              OR (s2 - CAST(s1 AS DOUBLE) * s1 / n_gaps) / (n_gaps - 1) = 0
            THEN NULL
            ELSE CAST(ROUND(
              (CAST(s1 AS DOUBLE) / n_gaps) * (CAST(s1 AS DOUBLE) / n_gaps)
              / ((s2 - CAST(s1 AS DOUBLE) * s1 / n_gaps) / (n_gaps - 1))
              * 1000000, 0) AS BIGINT) END AS k_x1e6,
       CASE WHEN n_gaps < 2 OR CAST(s1 AS DOUBLE) / n_gaps = 0
            THEN NULL
            ELSE CAST(ROUND(
              ((s2 - CAST(s1 AS DOUBLE) * s1 / n_gaps) / (n_gaps - 1))
              / (CAST(s1 AS DOUBLE) / n_gaps)
              * 1000000, 0) AS BIGINT) END AS theta_x1e6
FROM a ORDER BY 1
"""


# ---------------------------------------------------------------------------
# Cramér's V for the event-type x hour-of-day association
# ---------------------------------------------------------------------------


def q_cramers_v_type_hour(sf_dir):
    """One-row corpus statistic: Cramér's V effect size of the event
    type x hour-of-day association — V = sqrt(chi2 / (n * (min(r,c) -
    1))), the normalized companion to the raw chi-square query that is
    comparable ACROSS tables of different shapes. The chi-square here
    walks the FULL r x c grid (unobserved cells contribute their
    expected count), which the count-only contingency pass misses —
    expected counts come from exact int64 marginals; the grid fold is
    one mirrored double over a bounded (types x 24) matrix, x1e6 snap,
    NULL when min(r,c) = 1."""
    ev = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_type", "ts"])

    def partial(b: pa.Table) -> pa.Table:
        m = pc.and_(pc.is_valid(b["event_type"]), pc.is_valid(b["ts"]))
        b = b.filter(m)
        us = b["ts"].cast(pa.timestamp("us")).cast(pa.int64()).to_numpy()
        h = ((us // _HOUR_US) % 24).astype(np.int64)
        t = pa.table(
            {
                "r": b["event_type"],
                "h": pa.array(h),
                "o": pa.array(np.ones(len(h), np.int64)),
            }
        )
        return _sum_by(t, ["r", "h"], ["o"])

    cont = tree_merge(
        ev.map_batches(partial, batch_format="pyarrow", batch_size=None),
        lambda b: _sum_by(b, ["r", "h"], ["o"]),
    ).to_pandas()  # bounded: types x 24

    if not len(cont) or "r" not in cont.columns:
        return pa.table(
            {
                "n": pa.array([], pa.int64()),
                "r_levels": pa.array([], pa.int64()),
                "c_levels": pa.array([], pa.int64()),
                "v_x1e6": pa.array([], pa.int64()),
            }
        )
    ru, ri = np.unique(cont["r"].to_numpy(), return_inverse=True)
    cu, ci = np.unique(cont["h"].to_numpy(dtype=np.int64), return_inverse=True)
    M = np.zeros((len(ru), len(cu)), dtype=np.int64)
    np.add.at(M, (ri, ci), cont["o"].to_numpy(dtype=np.int64))
    n = int(M.sum())
    rn = M.sum(1).astype(np.float64)
    cn = M.sum(0).astype(np.float64)
    e = rn[:, None] * cn[None, :] / n
    chi2 = float(((M - e) * (M - e) / e).sum())
    k = min(len(ru), len(cu))
    v = (
        None
        if k <= 1 or n == 0
        else int(
            _round_half_away(
                np.array([np.sqrt(chi2 / (n * (k - 1))) * 1e6])
            )[0]
        )
    )
    return pa.table(
        {
            "n": pa.array([n], pa.int64()),
            "r_levels": pa.array([len(ru)], pa.int64()),
            "c_levels": pa.array([len(cu)], pa.int64()),
            "v_x1e6": pa.array([v], pa.int64()),
        }
    )


CRAMERS_V_SQL = """
WITH c AS MATERIALIZED (
  SELECT event_type AS r, hour(ts) AS h, CAST(COUNT(*) AS BIGINT) AS o
  FROM events
  WHERE event_type IS NOT NULL AND ts IS NOT NULL
  GROUP BY 1, 2
), rm AS MATERIALIZED (
  SELECT r, CAST(SUM(o) AS BIGINT) AS rn FROM c GROUP BY 1
), cm AS MATERIALIZED (
  SELECT h, CAST(SUM(o) AS BIGINT) AS cn FROM c GROUP BY 1
), tot AS MATERIALIZED (
  SELECT CAST(SUM(o) AS BIGINT) AS n FROM c
), grid AS (
  SELECT rm.rn, cm.cn, COALESCE(c.o, 0) AS o
  FROM rm CROSS JOIN cm
  LEFT JOIN c ON c.r = rm.r AND c.h = cm.h
), chi AS (
  SELECT SUM((o - CAST(rn AS DOUBLE) * cn / tot.n)
             * (o - CAST(rn AS DOUBLE) * cn / tot.n)
             / (CAST(rn AS DOUBLE) * cn / tot.n)) AS chi2
  FROM grid, tot
)
SELECT tot.n,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM rm) AS r_levels,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM cm) AS c_levels,
       CASE WHEN LEAST((SELECT COUNT(*) FROM rm),
                       (SELECT COUNT(*) FROM cm)) <= 1 OR tot.n = 0
            THEN NULL
            ELSE CAST(ROUND(SQRT(chi.chi2
                   / (tot.n * (LEAST((SELECT COUNT(*) FROM rm),
                                     (SELECT COUNT(*) FROM cm)) - 1)))
                 * 1000000, 0) AS BIGINT) END AS v_x1e6
FROM chi, tot
"""


def register_r4ck(queries: dict, oracles: dict) -> None:
    queries.update(
        {
            "durbin_watson_value": q_durbin_watson_value,
            "gamma_fit_interpurchase": q_gamma_fit_interpurchase,
            "cramers_v_type_hour": q_cramers_v_type_hour,
        }
    )
    oracles.update(
        {
            "durbin_watson_value": DW_SQL,
            "gamma_fit_interpurchase": GAMMA_FIT_SQL,
            "cramers_v_type_hour": CRAMERS_V_SQL,
        }
    )
