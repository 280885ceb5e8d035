"""Round-4 batch CY: Laspeyres/Paasche price indices between two years,
a KS-style sup-norm uniformity test on minute-of-hour, and the Theil
between/within inequality decomposition across nations.

Exactness discipline: per-(part, year) price/quantity sums, minute
counts, and positive-balance cents fold exact int64; the KS statistic
is chosen by exact integer cross-multiplication (|cum * 60 - k * n|
compares with no float CDF); index and Theil folds are mirrored
doubles over bounded tables, x1e6 snap.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from mimirsbrunn_ray.stages.rollup import tree_merge

_MIN_US = 60_000_000
_BASE_YEAR = 1995
_CURR_YEAR = 1998


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
# Laspeyres and Paasche price indices over parts between two years
# ---------------------------------------------------------------------------


def q_price_index_parts(sf_dir):
    """One-row economics pair: the Laspeyres (base-quantity-weighted)
    and Paasche (current-quantity-weighted) price indices between ship
    years 1995 and 1998 over parts shipped in BOTH years — the two
    canonical answers to "how much did the basket's price level move",
    bracketing the true index. Unit prices are per-(part, year)
    aggregates p = sum(extendedprice) / sum(quantity) dividing exact
    int64 cents / quantity sums; the index folds sum(p1 q0) / sum(p0
    q0) (resp. q1) over the bounded common-part table as mirrored
    doubles, x1e6 snap."""
    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_shipdate", "l_quantity", "l_extendedprice"],
    )

    def partial(b: pa.Table) -> pa.Table:
        b = _clean(
            b, ("l_partkey", "l_shipdate", "l_quantity", "l_extendedprice")
        )
        us = b["l_shipdate"].cast(pa.timestamp("us")).cast(pa.int64())
        yr = pc.year(us.cast(pa.timestamp("us"))).to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        keep = (yr == _BASE_YEAR) | (yr == _CURR_YEAR)
        qty = _round_half_away_x(
            b["l_quantity"].to_numpy(zero_copy_only=False).astype(np.float64),
            1.0,
        )
        price = _round_half_away_x(
            b["l_extendedprice"]
            .to_numpy(zero_copy_only=False)
            .astype(np.float64),
            100.0,
        )
        t = pa.table(
            {
                "p": b["l_partkey"].cast(pa.int64()),
                "yr": pa.array(yr),
                "q": pa.array(qty),
                "v": pa.array(price),
            }
        ).filter(pa.array(keep))
        return _sum_by(t, ["p", "yr"], ["q", "v"])

    cells = tree_merge(
        li.map_batches(partial, batch_format="pyarrow", batch_size=None),
        lambda b: _sum_by(b, ["p", "yr"], ["q", "v"]),
    ).to_pandas()  # bounded: parts x 2 years

    empty = pa.table(
        {
            "n_parts": pa.array([0], pa.int64()),
            "laspeyres_x1e6": pa.array([None], pa.int64()),
            "paasche_x1e6": pa.array([None], pa.int64()),
        }
    )
    if not len(cells) or "p" not in cells.columns:
        return empty
    base = cells[(cells["yr"] == _BASE_YEAR) & (cells["q"] > 0)]
    curr = cells[(cells["yr"] == _CURR_YEAR) & (cells["q"] > 0)]
    m = base.merge(curr, on="p", suffixes=("0", "1"))
    if not len(m):
        return empty
    m = m.sort_values("p", ignore_index=True)
    p0 = m["v0"].to_numpy(dtype=np.float64) / m["q0"].to_numpy(dtype=np.int64)
    p1 = m["v1"].to_numpy(dtype=np.float64) / m["q1"].to_numpy(dtype=np.int64)
    q0 = m["q0"].to_numpy(dtype=np.int64)
    q1 = m["q1"].to_numpy(dtype=np.int64)
    lasp_den = float(np.sum(p0 * q0))
    paas_den = float(np.sum(p0 * q1))
    lasp = (
        None
        if lasp_den == 0.0
        else int(
            _round_half_away(
                np.array([float(np.sum(p1 * q0)) / lasp_den * 1e6])
            )[0]
        )
    )
    paas = (
        None
        if paas_den == 0.0
        else int(
            _round_half_away(
                np.array([float(np.sum(p1 * q1)) / paas_den * 1e6])
            )[0]
        )
    )
    return pa.table(
        {
            "n_parts": pa.array([len(m)], pa.int64()),
            "laspeyres_x1e6": pa.array([lasp], pa.int64()),
            "paasche_x1e6": pa.array([paas], pa.int64()),
        }
    )


PRICE_INDEX_SQL = f"""
WITH cell AS MATERIALIZED (
  SELECT l_partkey AS p, year(l_shipdate) AS yr,
         CAST(SUM(CAST(ROUND(l_quantity, 0) AS BIGINT)) AS BIGINT) AS q,
         CAST(SUM(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT))
              AS BIGINT) AS v
  FROM lineitem
  WHERE l_partkey IS NOT NULL AND l_shipdate IS NOT NULL
    AND l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL
    AND year(l_shipdate) IN ({_BASE_YEAR}, {_CURR_YEAR})
  GROUP BY 1, 2
), m AS MATERIALIZED (
  SELECT b.p,
         CAST(b.v AS DOUBLE) / b.q AS p0, b.q AS q0,
         CAST(c.v AS DOUBLE) / c.q AS p1, c.q AS q1
  FROM (SELECT * FROM cell WHERE yr = {_BASE_YEAR} AND q > 0) b
  JOIN (SELECT * FROM cell WHERE yr = {_CURR_YEAR} AND q > 0) c
    ON c.p = b.p
), agg AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_parts,
         SUM(p1 * q0) AS l_num, SUM(p0 * q0) AS l_den,
         SUM(p1 * q1) AS p_num, SUM(p0 * q1) AS p_den
  FROM m
)
SELECT n_parts,
       CASE WHEN n_parts = 0 OR l_den = 0 THEN NULL
            ELSE CAST(ROUND(l_num / l_den * 1000000, 0) AS BIGINT) END
         AS laspeyres_x1e6,
       CASE WHEN n_parts = 0 OR p_den = 0 THEN NULL
            ELSE CAST(ROUND(p_num / p_den * 1000000, 0) AS BIGINT) END
         AS paasche_x1e6
FROM agg
"""


# ---------------------------------------------------------------------------
# KS-style sup-norm uniformity of minute-of-hour
# ---------------------------------------------------------------------------


def q_ks_minute_uniformity(sf_dir):
    """Per event type: the discrete KS statistic D = max_k |F_n(k) -
    k/60| comparing the minute-of-hour distribution against uniform —
    the sup-norm goodness-of-fit twin of the chi-square/G tests (KS
    weights systematic CDF drift, not cell-level noise). Minute counts
    fold exact int64; the sup is selected by EXACT integer
    cross-multiplication max|60 * cum - k * n| (no float CDF feeds the
    argmax); only the final D = that integer / (60 n) divides, x1e6
    snap."""
    ev = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_type", "ts"])

    def partial(b: pa.Table) -> pa.Table:
        b = _clean(b, ("event_type", "ts"))
        us = b["ts"].cast(pa.timestamp("us")).cast(pa.int64()).to_numpy()
        mn = ((us // _MIN_US) % 60).astype(np.int64)
        t = pa.table(
            {
                "event_type": b["event_type"],
                "m": pa.array(mn),
                "c": pa.array(np.ones(len(mn), np.int64)),
            }
        )
        return _sum_by(t, ["event_type", "m"], ["c"])

    cells = tree_merge(
        ev.map_batches(partial, batch_format="pyarrow", batch_size=None),
        lambda b: _sum_by(b, ["event_type", "m"], ["c"]),
    ).to_pandas()  # bounded: types x 60

    if not len(cells) or "event_type" not in cells.columns:
        return pa.table(
            {
                "event_type": pa.array([], pa.string()),
                "n": pa.array([], pa.int64()),
                "d_x1e6": pa.array([], pa.int64()),
            }
        )
    out = {"event_type": [], "n": [], "d_x1e6": []}
    for et, g in cells.sort_values(["event_type", "m"]).groupby(
        "event_type", sort=True
    ):
        dense = np.zeros(60, dtype=np.int64)
        dense[g["m"].to_numpy(dtype=np.int64)] = g["c"].to_numpy(
            dtype=np.int64
        )
        n = int(dense.sum())
        cum = np.cumsum(dense)
        k = np.arange(1, 61, dtype=np.int64)
        dev = np.abs(60 * cum - k * n)  # exact integer sup selection
        dmax = int(dev.max())
        out["event_type"].append(et)
        out["n"].append(n)
        out["d_x1e6"].append(
            None
            if n == 0
            else int(
                _round_half_away(np.array([dmax / (60.0 * n) * 1e6]))[0]
            )
        )
    return pa.table(
        {
            "event_type": pa.array(out["event_type"], pa.string()),
            "n": pa.array(out["n"], pa.int64()),
            "d_x1e6": pa.array(out["d_x1e6"], pa.int64()),
        }
    )


KS_MINUTE_SQL = """
WITH c AS MATERIALIZED (
  SELECT event_type, minute(ts) AS m, CAST(COUNT(*) AS BIGINT) AS c
  FROM events
  WHERE event_type IS NOT NULL AND ts IS NOT NULL
  GROUP BY 1, 2
), grid AS (
  SELECT n.event_type, k.k,
         CAST(COALESCE((SELECT SUM(c.c) FROM c
                        WHERE c.event_type = n.event_type
                          AND c.m < k.k), 0) AS BIGINT) AS cum,
         n.n
  FROM (SELECT event_type, CAST(SUM(c) AS BIGINT) AS n FROM c GROUP BY 1) n
  CROSS JOIN (SELECT unnest(range(1, 61)) AS k) k
)
SELECT event_type, n,
       CASE WHEN n = 0 THEN NULL
            ELSE CAST(ROUND(CAST(MAX(ABS(60 * cum - k * n)) AS DOUBLE)
                            / (60.0 * n) * 1000000, 0) AS BIGINT) END
         AS d_x1e6
FROM grid GROUP BY 1, 2 ORDER BY 1
"""


# ---------------------------------------------------------------------------
# Theil between/within inequality decomposition across nations
# ---------------------------------------------------------------------------


def q_theil_decomposition_nation(sf_dir):
    """One-row inequality decomposition: Theil's T over positive
    customer balances split EXACTLY into between-nation and
    within-nation components (T = T_between + T_within — the additive
    decomposability that makes Theil, not Gini, the tool for "is
    inequality across groups or inside them"). Per-nation (n, sum
    cents) fold exact int64; the within component needs sum(x ln x)
    which folds as mirrored per-row doubles (each term computed from
    the same exact integer on both sides); the decomposition is a
    bounded per-nation double fold, x1e6 snap."""
    cust = rd.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_nationkey", "c_acctbal"]
    )

    def partial(b: pa.Table) -> pa.Table:
        b = _clean(b, ("c_nationkey", "c_acctbal"))
        bal = _round_half_away_x(
            b["c_acctbal"].to_numpy(zero_copy_only=False).astype(np.float64),
            100.0,
        )
        keep = bal > 0
        bal = bal[keep]
        nk = b["c_nationkey"].cast(pa.int64()).to_numpy()[keep]
        xlnx = bal.astype(np.float64) * np.log(bal.astype(np.float64))
        t = pa.table(
            {
                "nk": pa.array(nk),
                "n": pa.array(np.ones(len(bal), np.int64)),
                "s": pa.array(bal),
                "xlnx": pa.array(xlnx),
            }
        )
        return _sum_by(t, ["nk"], ["n", "s", "xlnx"])

    grp = tree_merge(
        cust.map_batches(partial, batch_format="pyarrow", batch_size=None),
        lambda b: _sum_by(b, ["nk"], ["n", "s", "xlnx"]),
    ).to_pandas()  # bounded: one row per nation

    if not len(grp) or "nk" not in grp.columns:
        return pa.table(
            {
                "n": pa.array([0], pa.int64()),
                "t_total_x1e6": pa.array([None], pa.int64()),
                "t_between_x1e6": pa.array([None], pa.int64()),
                "t_within_x1e6": pa.array([None], pa.int64()),
            }
        )
    grp = grp.sort_values("nk", ignore_index=True)
    ng = grp["n"].to_numpy(dtype=np.int64)
    sg = grp["s"].to_numpy(dtype=np.int64)
    xg = grp["xlnx"].to_numpy(dtype=np.float64)
    n = int(ng.sum())
    s = int(sg.sum())
    if n == 0 or s == 0:
        return pa.table(
            {
                "n": pa.array([n], pa.int64()),
                "t_total_x1e6": pa.array([None], pa.int64()),
                "t_between_x1e6": pa.array([None], pa.int64()),
                "t_within_x1e6": pa.array([None], pa.int64()),
            }
        )
    mu = float(s) / n
    # T_total = (1/n) sum(x/mu ln(x/mu)) = sum(x ln x)/(n mu) - ln(mu)
    t_total = float(np.sum(xg)) / (n * mu) - np.log(mu)
    # T_between = sum_g (s_g/s) ln((s_g/s)/(n_g/n))
    share = sg.astype(np.float64) / s
    t_between = float(
        np.sum(share * np.log(share / (ng.astype(np.float64) / n)))
    )
    t_within = t_total - t_between
    return pa.table(
        {
            "n": pa.array([n], pa.int64()),
            "t_total_x1e6": pa.array(
                [int(_round_half_away(np.array([t_total * 1e6]))[0])],
                pa.int64(),
            ),
            "t_between_x1e6": pa.array(
                [int(_round_half_away(np.array([t_between * 1e6]))[0])],
                pa.int64(),
            ),
            "t_within_x1e6": pa.array(
                [int(_round_half_away(np.array([t_within * 1e6]))[0])],
                pa.int64(),
            ),
        }
    )


THEIL_DECOMP_SQL = """
WITH v AS (
  SELECT c_nationkey AS nk,
         CAST(ROUND(c_acctbal * 100, 0) AS BIGINT) AS x
  FROM customer
  WHERE c_nationkey IS NOT NULL AND c_acctbal IS NOT NULL
    AND CAST(ROUND(c_acctbal * 100, 0) AS BIGINT) > 0
), g AS MATERIALIZED (
  SELECT nk, CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(x) AS BIGINT) AS s,
         SUM(CAST(x AS DOUBLE) * LN(CAST(x AS DOUBLE))) AS xlnx
  FROM v GROUP BY 1
), t AS (
  SELECT CAST(SUM(n) AS BIGINT) AS n, CAST(SUM(s) AS BIGINT) AS s,
         SUM(xlnx) AS xlnx
  FROM g
), comp AS (
  SELECT t.n, t.s,
         t.xlnx / (t.n * (CAST(t.s AS DOUBLE) / t.n))
           - LN(CAST(t.s AS DOUBLE) / t.n) AS t_total,
         (SELECT SUM((CAST(g.s AS DOUBLE) / t.s)
                     * LN((CAST(g.s AS DOUBLE) / t.s)
                          / (CAST(g.n AS DOUBLE) / t.n)))
          FROM g) AS t_between
  FROM t
)
SELECT n,
       CASE WHEN n = 0 OR s = 0 THEN NULL
            ELSE CAST(ROUND(t_total * 1000000, 0) AS BIGINT) END
         AS t_total_x1e6,
       CASE WHEN n = 0 OR s = 0 THEN NULL
            ELSE CAST(ROUND(t_between * 1000000, 0) AS BIGINT) END
         AS t_between_x1e6,
       CASE WHEN n = 0 OR s = 0 THEN NULL
            ELSE CAST(ROUND((t_total - t_between) * 1000000, 0) AS BIGINT)
       END AS t_within_x1e6
FROM comp
"""


def register_r4cy(queries: dict, oracles: dict) -> None:
    queries.update(
        {
            "price_index_parts": q_price_index_parts,
            "ks_minute_uniformity": q_ks_minute_uniformity,
            "theil_decomposition_nation": q_theil_decomposition_nation,
        }
    )
    oracles.update(
        {
            "price_index_parts": PRICE_INDEX_SQL,
            "ks_minute_uniformity": KS_MINUTE_SQL,
            "theil_decomposition_nation": THEIL_DECOMP_SQL,
        }
    )
