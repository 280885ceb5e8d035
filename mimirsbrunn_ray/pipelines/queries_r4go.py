"""Round-4 batch GO: concentration drift, circular distribution
distance, and the planner's matrix — the top-decile customer
revenue share per quarter (is the business getting MORE dependent
on its whales?), the circular earth-mover distance between weekend
and weekday hour-of-day profiles (the rotation-aware distance;
linear EMD overcharges shapes that differ by a shift across
midnight), and the ABC x XYZ joint matrix (revenue importance
crossed with demand stability — the 9-cell grid inventory
planning actually runs on).

Exactness discipline: decile membership uses exact integer ranks
and cum-share comparisons by cross-multiplication (5*cum <=
4*total, 20*cum <= 19*total — no float thresholds); circular EMD
is sum |C - median(C)| over the 24-bin cumulative difference with
the interpolated median on both sides; XYZ classes cut on the
same rounded cv_ppm as batch FR."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from mimirsbrunn_ray.pipelines.queries_r4fk import (
    _HOUR_US,
    _round_half_away,
)
from mimirsbrunn_ray.pipelines.queries_r4fr import (
    _XYZ_X,
    _XYZ_Y,
    _round_half_away_arr,
)
from mimirsbrunn_ray.stages.rollup import tree_merge

_DAY_US = 86_400_000_000


def _valid(b: pa.Table, cols) -> pa.Table:
    m = None
    for c in cols:
        v = pc.is_valid(b[c])
        m = v if m is None else pc.and_(m, v)
    return b.filter(m)


_PAR_COLS = ["quarter", "n_cust", "n_top", "share_ppm"]


def q_pareto_share_drift(sf_dir):
    """Whale-dependence drift: per calendar quarter, the revenue
    share of the top decile of that quarter's customers (top
    ceil(n/10) by revenue cents, ties to the lowest custkey) — a
    rising series means concentration risk is compounding even if
    totals look healthy.  Per-(customer, quarter) cents fold in
    one distributed pass; decile membership is exact integer
    rank."""
    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_orderdate", "o_totalprice"])

    def part(b: pa.Table) -> pa.Table:
        b = _valid(b, ("o_custkey", "o_orderdate", "o_totalprice"))
        if b.num_rows == 0:
            return pa.table({
                "cust": pa.array([], pa.int64()),
                "q": pa.array([], pa.int64()),
                "cents": pa.array([], pa.int64()),
            })
        d = b["o_orderdate"].cast(pa.timestamp("us")).to_pandas()
        q = (d.dt.year * 4
             + (d.dt.month - 1) // 3).to_numpy(np.int64)
        x = b["o_totalprice"].cast(pa.float64()).to_numpy(
            zero_copy_only=False)
        cents = np.where(
            x >= 0, np.floor(x * 100.0 + 0.5),
            np.ceil(x * 100.0 - 0.5)).astype(np.int64)
        t = pa.table({
            "cust": b["o_custkey"].cast(pa.int64()),
            "q": pa.array(q),
            "cents": pa.array(cents),
        })
        g = t.group_by(["cust", "q"]).aggregate(
            [("cents", "sum")])
        return g.rename_columns(["cust", "q", "cents"])

    def comb(b: pa.Table) -> pa.Table:
        g = b.group_by(["cust", "q"]).aggregate(
            [("cents", "sum")])
        return g.rename_columns(["cust", "q", "cents"])

    cq = tree_merge(
        orders.map_batches(part, batch_format="pyarrow",
                           batch_size=None),
        comb,
        final_shards=8,
        shard_cols=["cust"],
    ).to_pandas()
    if "cust" not in cq.columns or len(cq) == 0:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _PAR_COLS})
    out = {c: [] for c in _PAR_COLS}
    for q, g in cq.groupby("q", sort=True):
        g = g.sort_values(["cents", "cust"],
                          ascending=[False, True],
                          ignore_index=True)
        n = len(g)
        top_n = (n + 9) // 10
        total = int(g["cents"].sum())
        if total == 0:
            continue
        top_rev = int(g["cents"].iloc[:top_n].sum())
        out["quarter"].append(int(q))
        out["n_cust"].append(n)
        out["n_top"].append(top_n)
        out["share_ppm"].append(
            _round_half_away(top_rev / total * 1e6))
    return pa.table(
        {c: pa.array(out[c], pa.int64()) for c in _PAR_COLS})


PARETO_SQL = """
WITH cq AS MATERIALIZED (
  SELECT o_custkey AS cust,
         YEAR(o_orderdate) * 4 + (MONTH(o_orderdate) - 1) // 3
           AS q,
         CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT))
              AS BIGINT) AS cents
  FROM orders
  WHERE o_custkey IS NOT NULL AND o_orderdate IS NOT NULL
    AND o_totalprice IS NOT NULL
  GROUP BY 1, 2
), rk AS MATERIALIZED (
  SELECT q, cust, cents,
         ROW_NUMBER() OVER (PARTITION BY q
                            ORDER BY cents DESC, cust) AS rn,
         CAST(COUNT(*) OVER (PARTITION BY q) AS BIGINT) AS n
  FROM cq
)
SELECT CAST(q AS BIGINT) AS quarter,
       CAST(ANY_VALUE(n) AS BIGINT) AS n_cust,
       CAST((ANY_VALUE(n) + 9) // 10 AS BIGINT) AS n_top,
       CAST(ROUND(CAST(SUM(CASE WHEN rn <= (n + 9) // 10
                                THEN cents ELSE 0 END)
                       AS DOUBLE)
            / SUM(cents) * 1000000, 0) AS BIGINT) AS share_ppm
FROM rk GROUP BY q
HAVING SUM(cents) <> 0
ORDER BY quarter
"""

_CEMD_COLS = ["n_weekend", "n_weekday", "emd_x1e9"]


def q_circular_emd_weekpart(sf_dir):
    """Circular earth-mover distance between the weekend and
    weekday hour-of-day probability profiles: with C(h) the
    cumulative difference of the two 24-bin distributions, the
    circular EMD is sum_h |C(h) - median(C)| — shift-invariant
    across midnight, where plain (linear) EMD punishes a
    2-hour-rotated identical shape as if it were a new
    distribution.  Counts fold in one distributed pass; the 24-term
    fold mirrors."""
    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["ts"])

    def part(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_valid(b["ts"]))
        us = b["ts"].cast(pa.timestamp("us")).cast(pa.int64())
        day = pc.divide(us, _DAY_US)
        hr = pc.divide(us, _HOUR_US)
        hod = pc.subtract(
            hr, pc.multiply(pc.divide(hr, 24),
                            pa.scalar(24, pa.int64())))
        dow = pc.subtract(
            pc.add(day, pa.scalar(4, pa.int64())),
            pc.multiply(
                pc.divide(pc.add(day, pa.scalar(4, pa.int64())),
                          pa.scalar(7, pa.int64())),
                pa.scalar(7, pa.int64())))
        t = pa.table({
            "hod": hod,
            "we": pc.cast(pc.greater_equal(dow, 5), pa.int64()),
            "n": pa.array(np.ones(b.num_rows, np.int64)),
        })
        g = t.group_by(["hod", "we"]).aggregate([("n", "sum")])
        return g.rename_columns(["hod", "we", "n"])

    def comb(b: pa.Table) -> pa.Table:
        g = b.group_by(["hod", "we"]).aggregate([("n", "sum")])
        return g.rename_columns(["hod", "we", "n"])

    cc = tree_merge(
        ev.map_batches(part, batch_format="pyarrow",
                       batch_size=None),
        comb,
    ).to_pandas()
    if "hod" not in cc.columns or len(cc) == 0:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _CEMD_COLS})
    a = np.zeros(24)
    b_ = np.zeros(24)
    for _, r in cc.iterrows():
        if int(r["we"]) == 1:
            a[int(r["hod"])] = int(r["n"])
        else:
            b_[int(r["hod"])] = int(r["n"])
    na, nb = a.sum(), b_.sum()
    if na == 0 or nb == 0:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _CEMD_COLS})
    diff = a / na - b_ / nb
    c = np.cumsum(diff)
    med = float(np.median(c))
    emd = float(np.abs(c - med).sum())
    return pa.table({
        "n_weekend": pa.array([int(na)], pa.int64()),
        "n_weekday": pa.array([int(nb)], pa.int64()),
        "emd_x1e9": pa.array(
            [_round_half_away(emd * 1e9)], pa.int64()),
    })


CEMD_SQL = f"""
WITH e AS MATERIALIZED (
  SELECT (EPOCH_US(ts) // {_HOUR_US}) % 24 AS hod,
         CASE WHEN ((EPOCH_US(ts) // {_DAY_US}) + 4) % 7 >= 5
              THEN 1 ELSE 0 END AS we,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM events WHERE ts IS NOT NULL
  GROUP BY 1, 2
), grid AS MATERIALIZED (
  SELECT r.k AS hod,
         CAST(COALESCE(a.n, 0) AS DOUBLE) AS na_h,
         CAST(COALESCE(b.n, 0) AS DOUBLE) AS nb_h
  FROM range(0, 24) r(k)
  LEFT JOIN e a ON a.hod = r.k AND a.we = 1
  LEFT JOIN e b ON b.hod = r.k AND b.we = 0
), tot AS MATERIALIZED (
  SELECT SUM(na_h) AS na, SUM(nb_h) AS nb FROM grid
), cum AS MATERIALIZED (
  SELECT hod,
         SUM(na_h / tot.na - nb_h / tot.nb)
           OVER (ORDER BY hod ROWS UNBOUNDED PRECEDING) AS c
  FROM grid CROSS JOIN tot
  WHERE tot.na > 0 AND tot.nb > 0
), med AS MATERIALIZED (
  SELECT MEDIAN(c) AS m FROM cum
)
SELECT CAST(tot.na AS BIGINT) AS n_weekend,
       CAST(tot.nb AS BIGINT) AS n_weekday,
       CAST(ROUND(SUM(ABS(cum.c - med.m)) * 1000000000, 0)
            AS BIGINT) AS emd_x1e9
FROM cum CROSS JOIN med CROSS JOIN tot
GROUP BY tot.na, tot.nb
HAVING tot.na > 0 AND tot.nb > 0
"""

_AXM_COLS = ["abc_class", "xyz_class", "n_parts"]


def q_abc_xyz_matrix(sf_dir):
    """The planner's 9-cell matrix: parts classified by revenue
    importance (A = within the first 80% of cumulative discounted
    revenue in (revenue DESC, partkey) order, B = to 95%, C =
    rest — thresholds compared by exact cross-multiplication) and
    by demand stability (X/Y/Z on the monthly-demand cv_ppm with
    batch FR's exact convention), cross-tabulated — AZ cells
    (important but erratic) are where buffer stock burns money.
    Revenue and demand fold in one distributed pass each."""
    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_shipdate", "l_extendedprice",
                 "l_discount", "l_quantity"])

    def part(b: pa.Table) -> pa.Table:
        b = _valid(b, ("l_partkey", "l_shipdate",
                       "l_extendedprice", "l_discount",
                       "l_quantity"))
        if b.num_rows == 0:
            return pa.table({
                "pk": pa.array([], pa.int64()),
                "mon": pa.array([], pa.int64()),
                "cents": pa.array([], pa.int64()),
                "q": pa.array([], pa.int64()),
            })
        d = b["l_shipdate"].cast(pa.timestamp("us")).to_pandas()
        mon = (d.dt.year * 12 + d.dt.month - 1).to_numpy(np.int64)
        rev = (b["l_extendedprice"].cast(pa.float64()).to_numpy(
            zero_copy_only=False)
            * (1.0 - b["l_discount"].cast(pa.float64()).to_numpy(
                zero_copy_only=False)))
        cents = np.where(
            rev >= 0, np.floor(rev * 100.0 + 0.5),
            np.ceil(rev * 100.0 - 0.5)).astype(np.int64)
        qty = _round_half_away_arr(
            b["l_quantity"].cast(pa.float64()).to_numpy(
                zero_copy_only=False))
        t = pa.table({
            "pk": b["l_partkey"].cast(pa.int64()),
            "mon": pa.array(mon),
            "cents": pa.array(cents),
            "q": pa.array(qty),
        })
        g = t.group_by(["pk", "mon"]).aggregate(
            [("cents", "sum"), ("q", "sum")])
        return g.rename_columns(["pk", "mon", "cents", "q"])

    def comb(b: pa.Table) -> pa.Table:
        g = b.group_by(["pk", "mon"]).aggregate(
            [("cents", "sum"), ("q", "sum")])
        return g.rename_columns(["pk", "mon", "cents", "q"])

    pm = tree_merge(
        li.map_batches(part, batch_format="pyarrow",
                       batch_size=None),
        comb,
        final_shards=8,
        shard_cols=["pk"],
    ).to_pandas()
    if "pk" not in pm.columns or len(pm) == 0:
        return pa.table({
            "abc_class": pa.array([], pa.string()),
            "xyz_class": pa.array([], pa.string()),
            "n_parts": pa.array([], pa.int64()),
        })
    n_months = int(pm["mon"].max() - pm["mon"].min() + 1)
    per_part = pm.groupby("pk").agg(
        rev=("cents", "sum"),
        s=("q", "sum"),
        ss=("q", lambda v: int((v.astype(np.int64) ** 2).sum())),
    ).reset_index()
    per_part = per_part.sort_values(
        ["rev", "pk"], ascending=[False, True],
        ignore_index=True)
    rev = per_part["rev"].to_numpy(np.int64)
    total = int(rev.sum())
    cum = np.cumsum(rev)
    abc = np.where(5 * cum <= 4 * total, "A",
                   np.where(20 * cum <= 19 * total, "B", "C"))
    s = per_part["s"].to_numpy(np.int64).astype(np.float64)
    ss = per_part["ss"].to_numpy(np.int64).astype(np.float64)
    n = float(n_months)
    mean = s / n
    var = (ss - s * s / n) / n
    keep = mean > 0
    cv_ppm = np.full(len(per_part), -1, dtype=np.int64)
    cv_ppm[keep] = np.array([
        _round_half_away(v) for v in
        np.sqrt(np.maximum(var[keep], 0.0)) / mean[keep] * 1e6
    ], dtype=np.int64)
    xyz = np.where(cv_ppm < 0, "Z",
                   np.where(cv_ppm < _XYZ_X, "X",
                            np.where(cv_ppm < _XYZ_Y, "Y", "Z")))
    df = pd.DataFrame({"abc_class": abc, "xyz_class": xyz})
    out = df.groupby(["abc_class", "xyz_class"],
                     sort=True).size().reset_index(name="n_parts")
    return pa.table({
        "abc_class": pa.array(out["abc_class"], pa.string()),
        "xyz_class": pa.array(out["xyz_class"], pa.string()),
        "n_parts": pa.array(
            out["n_parts"].to_numpy(np.int64)),
    })


ABC_XYZ_SQL = f"""
WITH pm AS MATERIALIZED (
  SELECT l_partkey AS pk,
         YEAR(l_shipdate) * 12 + (MONTH(l_shipdate) - 1) AS mon,
         CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount)
                             * 100, 0) AS BIGINT)) AS BIGINT)
           AS cents,
         CAST(SUM(CAST(ROUND(l_quantity, 0) AS BIGINT))
              AS BIGINT) AS q
  FROM lineitem
  WHERE l_partkey IS NOT NULL AND l_shipdate IS NOT NULL
    AND l_extendedprice IS NOT NULL AND l_discount IS NOT NULL
    AND l_quantity IS NOT NULL
  GROUP BY 1, 2
), span AS MATERIALIZED (
  SELECT MAX(mon) - MIN(mon) + 1 AS n_months FROM pm
), per_part AS MATERIALIZED (
  SELECT pk,
         CAST(SUM(cents) AS BIGINT) AS rev,
         CAST(SUM(q) AS BIGINT) AS s,
         CAST(SUM(q * q) AS BIGINT) AS ss
  FROM pm GROUP BY 1
), ranked AS MATERIALIZED (
  SELECT pk, rev, s, ss,
         SUM(rev) OVER (ORDER BY rev DESC, pk
                        ROWS UNBOUNDED PRECEDING) AS cum,
         SUM(rev) OVER () AS total
  FROM per_part
), classed AS MATERIALIZED (
  SELECT pk, s, ss,
         CASE WHEN 5 * cum <= 4 * total THEN 'A'
              WHEN 20 * cum <= 19 * total THEN 'B'
              ELSE 'C' END AS abc_class
  FROM ranked
), cv AS MATERIALIZED (
  SELECT pk, abc_class,
         CASE WHEN s > 0 THEN
           CAST(ROUND(SQRT(GREATEST(
                   (ss - CAST(s AS DOUBLE) * s / span.n_months)
                     / span.n_months, 0.0))
                / (CAST(s AS DOUBLE) / span.n_months)
                * 1000000, 0) AS BIGINT)
         ELSE -1 END AS cv_ppm
  FROM classed CROSS JOIN span
)
SELECT abc_class,
       CASE WHEN cv_ppm < 0 THEN 'Z'
            WHEN cv_ppm < {_XYZ_X} THEN 'X'
            WHEN cv_ppm < {_XYZ_Y} THEN 'Y'
            ELSE 'Z' END AS xyz_class,
       CAST(COUNT(*) AS BIGINT) AS n_parts
FROM cv GROUP BY 1, 2 ORDER BY abc_class, xyz_class
"""


def register_r4go(queries: dict, oracles: dict) -> None:
    queries.update(
        {
            "pareto_share_drift": q_pareto_share_drift,
            "circular_emd_weekpart": q_circular_emd_weekpart,
            "abc_xyz_matrix": q_abc_xyz_matrix,
        }
    )
    oracles.update(
        {
            "pareto_share_drift": PARETO_SQL,
            "circular_emd_weekpart": CEMD_SQL,
            "abc_xyz_matrix": ABC_XYZ_SQL,
        }
    )
