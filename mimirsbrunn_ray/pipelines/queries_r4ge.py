"""Round-4 batch GE: 1-bit sketch fidelity, revenue retention, and
circular alignment — an audit of the sign-hash (1-bit-per-dim)
angle estimator on consecutive embedding pairs (Goemans-Williamson:
angle ~ pi * hamming / d; how big is the error at d = 64?), monthly
net revenue retention (this month's revenue from customers who
also bought LAST month, over last month's total — the
revenue-weighted churn metric), and the best circular shift
aligning every pair of 24-hour type profiles (integer-exact argmax
of the circular cross-correlation over all 24 rotations — do two
types share a diurnal shape at an offset?).

Exactness discipline: hamming distances and profile dot products
are pure integers (shift ties break to the smallest shift); the
angle audit folds mirrored acos on identical cosines; NRR is exact
integer cents end-to-end."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from mimirsbrunn_ray.pipelines.queries_r4fk import (
    _HOUR_US,
    _round_half_away,
    _type_cell_counts,
)
from mimirsbrunn_ray.stages.rollup import tree_merge

_EMB_DIM = 64


def _valid(b: pa.Table, cols) -> pa.Table:
    m = None
    for c in cols:
        v = pc.is_valid(b[c])
        m = v if m is None else pc.and_(m, v)
    return b.filter(m)


_SH_COLS = ["n_pairs", "mean_err_x1e6", "max_err_x1e6"]


def q_signhash_angle_audit(sf_dir):
    """Sign-hash angle fidelity audit: for every consecutive vec_id
    embedding pair, the true angle arccos(cosine) versus the 1-bit
    estimate pi * hamming(sign(x), sign(y)) / 64 — the mean and max
    absolute error (radians) of the cheapest possible similarity
    sketch on this corpus.  Hamming counts are pure integers;
    angles fold mirrored acos."""
    emb = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                          columns=["vec_id", "embedding"])

    def part(b: pa.Table) -> pa.Table:
        b = _valid(b, ("vec_id", "embedding"))
        if b.num_rows == 0:
            return pa.table({
                "vec_id": pa.array([], pa.int64()),
                "x": pa.array([], pa.list_(pa.float64())),
            })
        vid = b["vec_id"].to_numpy(zero_copy_only=False).astype(
            np.int64)
        x = b["embedding"].combine_chunks().flatten().to_numpy(
            zero_copy_only=False).astype(np.float64).reshape(
            len(vid), -1)
        return pa.table({
            "vec_id": pa.array(vid),
            "x": pa.array(list(x), pa.list_(pa.float64())),
        })

    tbl = emb.map_batches(part, batch_format="pyarrow",
                          batch_size=None).to_pandas()
    if "vec_id" not in tbl.columns or len(tbl) == 0:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _SH_COLS})
    tbl = tbl.sort_values("vec_id", ignore_index=True)
    vid = tbl["vec_id"].to_numpy(np.int64)
    x = np.stack(tbl["x"].to_numpy())
    adj = vid[1:] == vid[:-1] + 1
    if not adj.any():
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _SH_COLS})
    a = x[:-1][adj]
    b_ = x[1:][adj]
    dots = (a * b_).sum(axis=1)
    na = np.sqrt((a * a).sum(axis=1))
    nb = np.sqrt((b_ * b_).sum(axis=1))
    keep = (na > 0) & (nb > 0)
    if not keep.any():
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _SH_COLS})
    cosv = np.clip(dots[keep] / (na[keep] * nb[keep]),
                   -1.0, 1.0)
    true_ang = np.arccos(cosv)
    ham = ((a[keep] >= 0) != (b_[keep] >= 0)).sum(
        axis=1).astype(np.float64)
    est_ang = np.pi * ham / a.shape[1]
    err = np.abs(true_ang - est_ang)
    return pa.table({
        "n_pairs": pa.array([int(keep.sum())], pa.int64()),
        "mean_err_x1e6": pa.array(
            [_round_half_away(float(err.mean()) * 1e6)],
            pa.int64()),
        "max_err_x1e6": pa.array(
            [_round_half_away(float(err.max()) * 1e6)],
            pa.int64()),
    })


SIGNHASH_SQL = f"""
WITH v AS MATERIALIZED (
  SELECT vec_id, r.k - 1 AS j,
         CAST(embedding[CAST(r.k AS INTEGER)] AS DOUBLE) AS x
  FROM embeddings CROSS JOIN range(1, {_EMB_DIM + 1}) r(k)
  WHERE vec_id IS NOT NULL AND embedding IS NOT NULL
), pairs AS MATERIALIZED (
  SELECT a.vec_id,
         SUM(a.x * b.x) AS dot,
         SQRT(SUM(a.x * a.x)) AS na,
         SQRT(SUM(b.x * b.x)) AS nb,
         CAST(SUM(CASE WHEN (a.x >= 0) <> (b.x >= 0)
                       THEN 1 ELSE 0 END) AS BIGINT) AS ham
  FROM v a JOIN v b ON b.vec_id = a.vec_id + 1 AND b.j = a.j
  GROUP BY 1
), errs AS (
  SELECT ABS(ACOS(LEAST(GREATEST(dot / (na * nb), -1.0), 1.0))
             - PI() * ham / {_EMB_DIM}) AS err
  FROM pairs WHERE na > 0 AND nb > 0
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
       CAST(ROUND(AVG(err) * 1000000, 0) AS BIGINT)
         AS mean_err_x1e6,
       CAST(ROUND(MAX(err) * 1000000, 0) AS BIGINT)
         AS max_err_x1e6
FROM errs HAVING COUNT(*) > 0
"""

_NRR_COLS = ["mon", "prev_total_cents", "retained_cents",
             "nrr_ppm"]


def q_net_revenue_retention_monthly(sf_dir):
    """Monthly net revenue retention: for each month m, the order
    value from customers who ALSO ordered in month m-1, divided by
    month m-1's total order value — revenue-weighted churn (a 90%
    count retention can hide a 50% NRR when the big accounts are
    the ones leaving).  Per-(customer, month) cents fold in one
    distributed pass; the month scan is exact integer driver
    math."""
    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_orderdate", "o_totalprice"])

    def part(b: pa.Table) -> pa.Table:
        b = _valid(b, ("o_custkey", "o_orderdate", "o_totalprice"))
        if b.num_rows == 0:
            return pa.table({
                "cust": pa.array([], pa.int64()),
                "mon": pa.array([], pa.int64()),
                "cents": pa.array([], pa.int64()),
            })
        d = b["o_orderdate"].cast(pa.timestamp("us")).to_pandas()
        mon = (d.dt.year * 12 + d.dt.month - 1).to_numpy(np.int64)
        x = b["o_totalprice"].cast(pa.float64()).to_numpy(
            zero_copy_only=False)
        cents = np.where(
            x >= 0, np.floor(x * 100.0 + 0.5),
            np.ceil(x * 100.0 - 0.5)).astype(np.int64)
        t = pa.table({
            "cust": b["o_custkey"].cast(pa.int64()),
            "mon": pa.array(mon),
            "cents": pa.array(cents),
        })
        g = t.group_by(["cust", "mon"]).aggregate(
            [("cents", "sum")])
        return g.rename_columns(["cust", "mon", "cents"])

    def comb(b: pa.Table) -> pa.Table:
        g = b.group_by(["cust", "mon"]).aggregate(
            [("cents", "sum")])
        return g.rename_columns(["cust", "mon", "cents"])

    cm = tree_merge(
        orders.map_batches(part, batch_format="pyarrow",
                           batch_size=None),
        comb,
        final_shards=8,
        shard_cols=["cust"],
    ).to_pandas()
    if "cust" not in cm.columns or len(cm) == 0:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _NRR_COLS})
    cm = cm.sort_values(["cust", "mon"], ignore_index=True)
    cust = cm["cust"].to_numpy(np.int64)
    mon = cm["mon"].to_numpy(np.int64)
    cents = cm["cents"].to_numpy(np.int64)
    # retained revenue of month m: rows whose (cust, m-1) exists
    prev_exists = np.zeros(len(cm), dtype=bool)
    prev_exists[1:] = (cust[1:] == cust[:-1]) & (
        mon[1:] == mon[:-1] + 1)
    month_tot = pd.Series(cents).groupby(mon).sum()
    ret = pd.Series(cents[prev_exists]).groupby(
        mon[prev_exists]).sum()
    rows = {c: [] for c in _NRR_COLS}
    for m in sorted(month_tot.index):
        if m - 1 not in month_tot.index:
            continue
        prev_total = int(month_tot.loc[m - 1])
        retained = int(ret.get(m, 0))
        if prev_total == 0:
            continue
        rows["mon"].append(int(m))
        rows["prev_total_cents"].append(prev_total)
        rows["retained_cents"].append(retained)
        rows["nrr_ppm"].append(
            _round_half_away(retained / prev_total * 1e6))
    return pa.table(
        {c: pa.array(rows[c], pa.int64()) for c in _NRR_COLS})


NRR_SQL = """
WITH cm AS MATERIALIZED (
  SELECT o_custkey AS cust,
         YEAR(o_orderdate) * 12 + MONTH(o_orderdate) - 1 AS mon,
         CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT))
              AS BIGINT) AS cents
  FROM orders
  WHERE o_custkey IS NOT NULL AND o_orderdate IS NOT NULL
    AND o_totalprice IS NOT NULL
  GROUP BY 1, 2
), mt AS MATERIALIZED (
  SELECT mon, CAST(SUM(cents) AS BIGINT) AS total
  FROM cm GROUP BY 1
), ret AS MATERIALIZED (
  SELECT a.mon, CAST(SUM(a.cents) AS BIGINT) AS retained
  FROM cm a JOIN cm b
    ON b.cust = a.cust AND b.mon = a.mon - 1
  GROUP BY 1
)
SELECT CAST(mt.mon AS BIGINT) AS mon,
       pm.total AS prev_total_cents,
       COALESCE(ret.retained, 0) AS retained_cents,
       CAST(ROUND(CAST(COALESCE(ret.retained, 0) AS DOUBLE)
            / pm.total * 1000000, 0) AS BIGINT) AS nrr_ppm
FROM mt
JOIN mt pm ON pm.mon = mt.mon - 1
LEFT JOIN ret ON ret.mon = mt.mon
WHERE pm.total <> 0
ORDER BY mon
"""

_SHIFT_COLS = ["type_a", "type_b", "best_shift", "dot_best",
               "dot_zero"]


def q_profile_shift_alignment_pairs(sf_dir):
    """Circular alignment of 24-hour profiles: for every unordered
    event-type pair, the rotation s in 0..23 maximizing the
    INTEGER dot product sum_h a[h] * b[(h + s) % 24] of their
    hour-of-day count profiles (ties to the smallest shift), next
    to the unshifted dot — types sharing a diurnal shape at an
    offset (e.g. errors trailing clicks by 2 hours) light up here.
    Profiles fold in one distributed pass; the 24-rotation sweep is
    exact integer math."""
    cc = _type_cell_counts(sf_dir, "hod", _HOUR_US, 24)
    if "event_type" not in cc.columns or len(cc) == 0:
        return pa.table({
            "type_a": pa.array([], pa.string()),
            "type_b": pa.array([], pa.string()),
            **{c: pa.array([], pa.int64())
               for c in _SHIFT_COLS[2:]},
        })
    prof = {}
    for et, g in cc.groupby("event_type", sort=True):
        v = np.zeros(24, dtype=np.int64)
        v[g["hod"].to_numpy(np.int64)] = g["c"].to_numpy(np.int64)
        prof[et] = v
    types = sorted(prof)
    out = {c: [] for c in _SHIFT_COLS}
    for i in range(len(types)):
        for j in range(i + 1, len(types)):
            a, b = prof[types[i]], prof[types[j]]
            dots = np.array([
                int((a * np.roll(b, -s)).sum()) for s in range(24)
            ], dtype=np.int64)
            s_best = int(np.argmax(dots))  # first max = min shift
            out["type_a"].append(types[i])
            out["type_b"].append(types[j])
            out["best_shift"].append(s_best)
            out["dot_best"].append(int(dots[s_best]))
            out["dot_zero"].append(int(dots[0]))
    return pa.table({
        "type_a": pa.array(out["type_a"], pa.string()),
        "type_b": pa.array(out["type_b"], pa.string()),
        **{c: pa.array(out[c], pa.int64())
           for c in _SHIFT_COLS[2:]},
    })


SHIFT_SQL = f"""
WITH e AS MATERIALIZED (
  SELECT event_type,
         (EPOCH_US(ts) // {_HOUR_US}) % 24 AS hod,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM events
  WHERE event_type IS NOT NULL AND ts IS NOT NULL
  GROUP BY 1, 2
), grid AS MATERIALIZED (
  SELECT t.event_type, h.hod, COALESCE(e.c, 0) AS c
  FROM (SELECT DISTINCT event_type FROM e) t
  CROSS JOIN (SELECT CAST(k AS BIGINT) AS hod
              FROM range(0, 24) r(k)) h
  LEFT JOIN e USING (event_type, hod)
), dots AS MATERIALIZED (
  SELECT a.event_type AS type_a, b.event_type AS type_b,
         s.k AS shift,
         CAST(SUM(a.c * b.c) AS BIGINT) AS dot
  FROM range(0, 24) s(k)
  CROSS JOIN grid a
  JOIN grid b ON b.event_type > a.event_type
             AND b.hod = (a.hod + s.k) % 24
  GROUP BY 1, 2, 3
)
SELECT type_a, type_b,
       CAST(shift AS BIGINT) AS best_shift,
       dot AS dot_best,
       (SELECT d2.dot FROM dots d2
        WHERE d2.type_a = dots.type_a
          AND d2.type_b = dots.type_b AND d2.shift = 0)
         AS dot_zero
FROM dots
QUALIFY ROW_NUMBER() OVER (PARTITION BY type_a, type_b
                           ORDER BY dot DESC, shift) = 1
ORDER BY type_a, type_b
"""


def register_r4ge(queries: dict, oracles: dict) -> None:
    queries.update(
        {
            "signhash_angle_audit": q_signhash_angle_audit,
            "net_revenue_retention_monthly":
                q_net_revenue_retention_monthly,
            "profile_shift_alignment_pairs":
                q_profile_shift_alignment_pairs,
        }
    )
    oracles.update(
        {
            "signhash_angle_audit": SIGNHASH_SQL,
            "net_revenue_retention_monthly": NRR_SQL,
            "profile_shift_alignment_pairs": SHIFT_SQL,
        }
    )
