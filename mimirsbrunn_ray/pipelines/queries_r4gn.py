"""Round-4 batch GN: supplier consistency, second-digit forensics,
and error regimes — the top-10 most latency-VARIABLE suppliers by
interquartile range of per-lineitem ship latency (consistency, not
speed, is what planning needs), the Benford SECOND-digit chi^2 of
extended prices (the harder-to-game digit law auditors check after
the first digit passes), and error-regime run lengths (maximal
runs of hours whose error share exceeds twice the global share —
how long incidents last, not just how often they happen).

Exactness discipline: latencies are exact integer days with
interpolated quantiles on both engines (ranking snaps the IQR to
x1e3 before the top-10 cut); Benford-2 expected probabilities fold
the identical log10 sum; regime thresholds compare integer counts
cross-multiplied (no float threshold), and run counts are pure
integers."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from mimirsbrunn_ray.pipelines.queries_r4fk import (
    _DAY_US,
    _HOUR_US,
    _round_half_away,
)
from mimirsbrunn_ray.stages.rollup import tree_merge

_IQR_TOP = 10


def _valid(b: pa.Table, cols) -> pa.Table:
    m = None
    for c in cols:
        v = pc.is_valid(b[c])
        m = v if m is None else pc.and_(m, v)
    return b.filter(m)


_IQR_COLS = ["suppkey", "n_lineitems", "median_x1e3",
             "iqr_x1e3"]


def q_supplier_latency_iqr(sf_dir):
    """Top-10 most latency-variable suppliers: per supplier the
    median and interquartile range of per-lineitem ship latency
    (ship date minus order date, integer days), ranked by IQR
    snapped to x1e3 (ties to the lowest suppkey) — the supplier
    whose p75-p25 spread is widest wrecks safety-stock math even
    at a good median.  The order-date map broadcasts; per-supplier
    latency lists group in supplier-disjoint shards with
    interpolated quantiles."""
    from mimirsbrunn_ray.stages.broadcast import attach_dim

    # the order-date bridge attaches via budget-gated broadcast / join
    # (stages/broadcast.py) — orders never land on the driver
    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_suppkey", "l_shipdate"])
    li = li.map_batches(
        lambda b: _valid(b, ("l_orderkey", "l_suppkey", "l_shipdate")),
        batch_format="pyarrow", batch_size=None)
    li = attach_dim(li, "l_orderkey", sf_dir, "orders", "o_orderkey",
                    ["o_orderdate"], how="inner")

    def part(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({
                "suppkey": pa.array([], pa.int64()),
                "lat": pa.array([], pa.int64()),
            })
        ship = b["l_shipdate"].cast(pa.timestamp("us")).cast(
            pa.int64()).to_numpy(zero_copy_only=False)
        od = b["o_orderdate"].cast(pa.timestamp("us")).cast(
            pa.int64()).to_numpy(zero_copy_only=False)
        lat = (ship - od) // _DAY_US
        return pa.table({
            "suppkey": pa.array(
                b["l_suppkey"].to_numpy(
                    zero_copy_only=False).astype(np.int64)),
            "lat": pa.array(lat.astype(np.int64)),
        })

    from mimirsbrunn_ray.stages.dedup import _BUCKET, add_bucket

    def per_supplier(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({
            "suppkey": pd.Series([], dtype=np.int64),
            "n": pd.Series([], dtype=np.int64),
            "median_x1e3": pd.Series([], dtype=np.int64),
            "iqr_x1e3": pd.Series([], dtype=np.int64),
        })
        if len(g) == 0:
            return empty
        rows = {k: [] for k in
                ["suppkey", "n", "median_x1e3", "iqr_x1e3"]}
        for sk, sub in g.groupby("suppkey"):
            v = sub["lat"].to_numpy(np.int64)
            rows["suppkey"].append(int(sk))
            rows["n"].append(len(v))
            rows["median_x1e3"].append(
                _round_half_away(float(np.percentile(v, 50))
                                 * 1e3))
            rows["iqr_x1e3"].append(
                _round_half_away(
                    (float(np.percentile(v, 75))
                     - float(np.percentile(v, 25))) * 1e3))
        df = pd.DataFrame(rows)
        for c in df.columns:
            df[c] = df[c].astype(np.int64)
        return df

    agg = (
        li.map_batches(
            lambda b: add_bucket(part(b), "suppkey", 16),
            batch_format="pyarrow", batch_size=None)
        .groupby(_BUCKET)
        .map_groups(per_supplier, batch_format="pandas")
        .to_pandas()
    )
    if "suppkey" not in agg.columns or len(agg) == 0:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _IQR_COLS})
    agg = agg.sort_values(["iqr_x1e3", "suppkey"],
                          ascending=[False, True],
                          ignore_index=True).head(_IQR_TOP)
    return pa.table({
        "suppkey": pa.array(agg["suppkey"].to_numpy(np.int64)),
        "n_lineitems": pa.array(agg["n"].to_numpy(np.int64)),
        "median_x1e3": pa.array(
            agg["median_x1e3"].to_numpy(np.int64)),
        "iqr_x1e3": pa.array(agg["iqr_x1e3"].to_numpy(np.int64)),
    })


IQR_SQL = f"""
WITH lat AS MATERIALIZED (
  SELECT l.l_suppkey AS suppkey,
         CAST((EPOCH_US(l.l_shipdate)
               - EPOCH_US(o.o_orderdate)) // {_DAY_US}
              AS DOUBLE) AS lat
  FROM lineitem l JOIN orders o
    ON o.o_orderkey = l.l_orderkey
  WHERE l.l_orderkey IS NOT NULL AND l.l_suppkey IS NOT NULL
    AND l.l_shipdate IS NOT NULL AND o.o_orderdate IS NOT NULL
), agg AS MATERIALIZED (
  SELECT suppkey,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(ROUND(MEDIAN(lat) * 1000, 0) AS BIGINT)
           AS median_x1e3,
         CAST(ROUND((QUANTILE_CONT(lat, 0.75)
                     - QUANTILE_CONT(lat, 0.25)) * 1000, 0)
              AS BIGINT) AS iqr_x1e3
  FROM lat GROUP BY 1
)
SELECT CAST(suppkey AS BIGINT) AS suppkey,
       n AS n_lineitems,
       median_x1e3,
       iqr_x1e3
FROM agg
ORDER BY iqr_x1e3 DESC, suppkey
LIMIT {_IQR_TOP}
"""

_B2_COLS = ["n_values", "chi2_x1e3", "mad_x1e6"]


def q_benford_second_digit(sf_dir):
    """Benford SECOND-digit audit of extended prices: observed
    second-significant-digit frequencies (prices >= 10 cents)
    against P(d) = sum over first digits of log10(1 + 1/(10*f +
    d)), with the chi^2 and the mean absolute deviation — the
    digit law fabricators who know about the first digit still
    break.  Second digits extract by pure integer/string math on
    exact cents; expectations fold the same log10 terms."""
    orders = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                             columns=["l_extendedprice"])

    def part(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_valid(b["l_extendedprice"]))
        x = b["l_extendedprice"].cast(pa.float64()).to_numpy(
            zero_copy_only=False)
        cents = np.where(
            x >= 0, np.floor(x * 100.0 + 0.5),
            np.ceil(x * 100.0 - 0.5)).astype(np.int64)
        cents = np.abs(cents)
        cents = cents[cents >= 10]
        if len(cents) == 0:
            return pa.table({
                "d2": pa.array([], pa.int64()),
                "n": pa.array([], pa.int64()),
            })
        # second significant digit via decimal string of the int
        s = cents.astype("U20")
        d2 = np.array([int(v[1]) for v in s], dtype=np.int64)
        df = pd.DataFrame({"d2": d2})
        agg = df.groupby("d2").size().reset_index(name="n")
        agg["n"] = agg["n"].astype(np.int64)
        return pa.Table.from_pandas(agg, preserve_index=False)

    def comb(b: pa.Table) -> pa.Table:
        g = b.group_by(["d2"]).aggregate([("n", "sum")])
        return g.rename_columns(["d2", "n"])

    cc = tree_merge(
        orders.map_batches(part, batch_format="pyarrow",
                           batch_size=None),
        comb,
    ).to_pandas()
    if "d2" not in cc.columns or len(cc) == 0:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _B2_COLS})
    counts = np.zeros(10, dtype=np.int64)
    counts[cc["d2"].to_numpy(np.int64)] = cc["n"].to_numpy(
        np.int64)
    n = int(counts.sum())
    if n == 0:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _B2_COLS})
    d = np.arange(10, dtype=np.float64)
    p = np.zeros(10)
    for f in range(1, 10):
        p += np.log10(1.0 + 1.0 / (10.0 * f + d))
    e = n * p
    chi2 = float(((counts - e) ** 2 / e).sum())
    mad = float(np.abs(counts / n - p).mean())
    return pa.table({
        "n_values": pa.array([n], pa.int64()),
        "chi2_x1e3": pa.array(
            [_round_half_away(chi2 * 1e3)], pa.int64()),
        "mad_x1e6": pa.array(
            [_round_half_away(mad * 1e6)], pa.int64()),
    })


BENFORD2_SQL = """
WITH cents AS MATERIALIZED (
  SELECT ABS(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT))
           AS c
  FROM lineitem WHERE l_extendedprice IS NOT NULL
), d2c AS MATERIALIZED (
  SELECT CAST(substr(CAST(c AS VARCHAR), 2, 1) AS BIGINT) AS d2,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM cents WHERE c >= 10
  GROUP BY 1
), tot AS MATERIALIZED (
  SELECT CAST(SUM(n) AS BIGINT) AS t FROM d2c
), expd AS MATERIALIZED (
  SELECT d.k AS d2,
         SUM(LOG10(1.0 + 1.0 / (10.0 * f.k + d.k))) AS p
  FROM range(0, 10) d(k) CROSS JOIN range(1, 10) f(k)
  GROUP BY 1
), cells AS (
  SELECT expd.d2, COALESCE(d2c.n, 0) AS n, expd.p, tot.t
  FROM expd LEFT JOIN d2c USING (d2) CROSS JOIN tot
)
SELECT CAST(ANY_VALUE(t) AS BIGINT) AS n_values,
       CAST(ROUND(SUM((n - t * p) * (n - t * p) / (t * p))
            * 1000, 0) AS BIGINT) AS chi2_x1e3,
       CAST(ROUND(AVG(ABS(CAST(n AS DOUBLE) / t - p)) * 1000000,
            0) AS BIGINT) AS mad_x1e6
FROM cells
HAVING ANY_VALUE(t) > 0
"""

_ERR_COLS = ["n_regime_hours", "n_regimes", "mean_len_x1e3",
             "max_len"]


def q_error_regime_lengths(sf_dir):
    """Incident-duration census: hours whose error share exceeds
    TWICE the global error share (compared exactly by integer
    cross-multiplication err_h * total > 2 * share_num * n_h ...
    i.e. err_h * N_tot_events > 2 * N_err_events * n_h), grouped
    into maximal consecutive runs — the count, mean and max run
    length say whether errors arrive as blips or as sustained
    regimes.  Hourly counts fold in one distributed pass; the
    regime scan is pure integer."""
    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["ts", "event_type"])

    def part(b: pa.Table) -> pa.Table:
        b = _valid(b, ("ts", "event_type"))
        us = b["ts"].cast(pa.timestamp("us")).cast(pa.int64())
        t = pa.table({
            "hour": pc.divide(us, _HOUR_US),
            "n": pa.array(np.ones(b.num_rows, np.int64)),
            "e": pc.cast(pc.equal(b["event_type"], "error"),
                         pa.int64()),
        })
        g = t.group_by(["hour"]).aggregate(
            [("n", "sum"), ("e", "sum")])
        return g.rename_columns(["hour", "n", "e"])

    def comb(b: pa.Table) -> pa.Table:
        g = b.group_by(["hour"]).aggregate(
            [("n", "sum"), ("e", "sum")])
        return g.rename_columns(["hour", "n", "e"])

    hc = tree_merge(
        ev.map_batches(part, batch_format="pyarrow",
                       batch_size=None),
        comb,
    ).to_pandas()
    if "hour" not in hc.columns or len(hc) == 0:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _ERR_COLS})
    hc = hc.sort_values("hour", ignore_index=True)
    hour = hc["hour"].to_numpy(np.int64)
    n = hc["n"].to_numpy(np.int64)
    e = hc["e"].to_numpy(np.int64)
    n_tot = int(n.sum())
    e_tot = int(e.sum())
    if n_tot == 0 or e_tot == 0:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _ERR_COLS})
    # e/n > 2 * e_tot/n_tot  <=>  e * n_tot > 2 * e_tot * n
    regime = e * n_tot > 2 * e_tot * n
    if not regime.any():
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _ERR_COLS})
    rh = hour[regime]
    brk = np.ones(len(rh), dtype=bool)
    brk[1:] = rh[1:] != rh[:-1] + 1
    starts = np.flatnonzero(brk)
    lens = np.diff(np.append(starts, len(rh)))
    return pa.table({
        "n_regime_hours": pa.array([len(rh)], pa.int64()),
        "n_regimes": pa.array([len(starts)], pa.int64()),
        "mean_len_x1e3": pa.array(
            [_round_half_away(len(rh) / len(starts) * 1e3)],
            pa.int64()),
        "max_len": pa.array([int(lens.max())], pa.int64()),
    })


ERR_REGIME_SQL = f"""
WITH hc AS MATERIALIZED (
  SELECT EPOCH_US(ts) // {_HOUR_US} AS hour,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0
                  END) AS BIGINT) AS e
  FROM events
  WHERE ts IS NOT NULL AND event_type IS NOT NULL
  GROUP BY 1
), tot AS MATERIALIZED (
  SELECT CAST(SUM(n) AS BIGINT) AS n_tot,
         CAST(SUM(e) AS BIGINT) AS e_tot
  FROM hc
), reg AS MATERIALIZED (
  SELECT hc.hour,
         CASE WHEN LAG(hc.hour) OVER (ORDER BY hc.hour)
                   = hc.hour - 1
              THEN 0 ELSE 1 END AS is_start
  FROM hc CROSS JOIN tot
  WHERE hc.e * tot.n_tot > 2 * tot.e_tot * hc.n
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_regime_hours,
       CAST(SUM(is_start) AS BIGINT) AS n_regimes,
       CAST(ROUND(CAST(COUNT(*) AS DOUBLE) / SUM(is_start)
            * 1000, 0) AS BIGINT) AS mean_len_x1e3,
       (SELECT CAST(MAX(cnt) AS BIGINT) FROM (
          SELECT COUNT(*) AS cnt FROM (
            SELECT hour,
                   SUM(is_start) OVER (ORDER BY hour
                       ROWS UNBOUNDED PRECEDING) AS rid
            FROM reg)
          GROUP BY rid)) AS max_len
FROM reg
HAVING COUNT(*) > 0
"""


def register_r4gn(queries: dict, oracles: dict) -> None:
    queries.update(
        {
            "supplier_latency_iqr": q_supplier_latency_iqr,
            "benford_second_digit": q_benford_second_digit,
            "error_regime_lengths": q_error_regime_lengths,
        }
    )
    oracles.update(
        {
            "supplier_latency_iqr": IQR_SQL,
            "benford_second_digit": BENFORD2_SQL,
            "error_regime_lengths": ERR_REGIME_SQL,
        }
    )
