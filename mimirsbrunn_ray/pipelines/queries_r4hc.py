"""Round-4 batch HC: burst coupling, intra-order pricing spread,
and packaging bias — burst co-occurrence lift per type pair (do
two types' top-decile hours coincide beyond what their individual
burst rates predict? — shared-cause detection on counts, the
companion to value-tail dependence), the intra-order discount
spread (orders whose own lines carry different discounts, and how
wide — the pricing-consistency audit WITHIN a basket), and the
dozen bias of quantities (mod-12 residue census with chi^2 and
the multiples-of-12 lift — pack-size quantization in the demand
stream).

Exactness discipline: burst sets use the exact (9n+9)//10 order-
statistic threshold; co-occurrence, spread and residue counts are
pure integers; lifts and chi^2 fold identical double closed
forms."""

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
from mimirsbrunn_ray.pipelines.queries_r4fl import (
    _dense_hour_counts,
)
from mimirsbrunn_ray.stages.rollup import tree_merge


def _valid(b: pa.Table, cols) -> pa.Table:
    m = None
    for c in cols:
        v = pc.is_valid(b[c])
        m = v if m is None else pc.and_(m, v)
    return b.filter(m)


_BCL_COLS = ["type_a", "type_b", "n_hours", "n_both_burst",
             "lift_ppm"]


def q_burst_cooccurrence_lift(sf_dir):
    """Shared-cause detector on counts: per unordered type pair,
    the joint burst rate (hours where BOTH types exceed their own
    top-decile threshold) over the product of the marginal burst
    rates — lift far above 1e6 ppm means one upstream driver moves
    both streams, so alerting on them separately double-pages.
    Dense hourly counts fold once; the pair sweep is integer set
    math on the tiny grid."""
    g = _dense_hour_counts(sf_dir)
    if g is None:
        return pa.table({
            "type_a": pa.array([], pa.string()),
            "type_b": pa.array([], pa.string()),
            **{c: pa.array([], pa.int64()) for c in _BCL_COLS[2:]},
        })
    burst = {}
    T = None
    for et, sub in g.groupby("event_type", sort=True):
        c = sub.sort_values("hour")["c"].to_numpy(np.int64)
        T = len(c)
        rank = (9 * T + 9) // 10
        thr = int(np.sort(c, kind="mergesort")[rank - 1])
        burst[et] = c > thr
    types = sorted(burst)
    out = {c: [] for c in _BCL_COLS}
    for i in range(len(types)):
        for j in range(i + 1, len(types)):
            a, b = burst[types[i]], burst[types[j]]
            na, nb = int(a.sum()), int(b.sum())
            nboth = int((a & b).sum())
            if na == 0 or nb == 0 or T == 0:
                continue
            expect = na * nb / T
            if expect == 0:
                continue
            out["type_a"].append(types[i])
            out["type_b"].append(types[j])
            out["n_hours"].append(T)
            out["n_both_burst"].append(nboth)
            out["lift_ppm"].append(
                _round_half_away(nboth / expect * 1e6))
    return pa.table({
        "type_a": pa.array(out["type_a"], pa.string()),
        "type_b": pa.array(out["type_b"], pa.string()),
        **{c: pa.array(out[c], pa.int64()) for c in _BCL_COLS[2:]},
    })


BCL_SQL = f"""
WITH hc AS MATERIALIZED (
  SELECT event_type, EPOCH_US(ts) // {_HOUR_US} AS hour,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM events
  WHERE event_type IS NOT NULL AND ts IS NOT NULL
  GROUP BY 1, 2
), span AS MATERIALIZED (
  SELECT MIN(hour) AS hmin, MAX(hour) AS hmax FROM hc
), grid AS MATERIALIZED (
  SELECT t.event_type, s.hmin + r.k AS hour,
         COALESCE(hc.c, 0) AS c
  FROM (SELECT DISTINCT event_type FROM hc) t
  CROSS JOIN span s
  JOIN range(0, 100000) r(k) ON s.hmin + r.k <= s.hmax
  LEFT JOIN hc ON hc.event_type = t.event_type
              AND hc.hour = s.hmin + r.k
), thr AS MATERIALIZED (
  SELECT event_type, c AS threshold, t
  FROM (SELECT event_type, c, hour,
               ROW_NUMBER() OVER (PARTITION BY event_type
                                  ORDER BY c, hour) AS rn,
               COUNT(*) OVER (PARTITION BY event_type) AS t
        FROM grid)
  WHERE rn = (9 * t + 9) // 10
), bs AS MATERIALIZED (
  SELECT g.event_type, g.hour,
         CASE WHEN g.c > thr.threshold THEN 1 ELSE 0 END AS b,
         thr.t
  FROM grid g JOIN thr USING (event_type)
), pair AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b,
         CAST(ANY_VALUE(a.t) AS BIGINT) AS n_hours,
         CAST(SUM(a.b * b.b) AS BIGINT) AS nboth,
         CAST(SUM(a.b) AS BIGINT) AS na,
         CAST(SUM(b.b) AS BIGINT) AS nb
  FROM bs a
  JOIN bs b ON b.hour = a.hour
           AND b.event_type > a.event_type
  GROUP BY 1, 2
)
SELECT type_a, type_b, n_hours,
       nboth AS n_both_burst,
       CAST(ROUND(CAST(nboth AS DOUBLE)
            / (CAST(na AS DOUBLE) * nb / n_hours) * 1000000, 0)
            AS BIGINT) AS lift_ppm
FROM pair
WHERE na > 0 AND nb > 0 AND n_hours > 0
ORDER BY type_a, type_b
"""

_IOD_COLS = ["n_orders", "n_mixed_orders", "mixed_ppm",
             "mean_range_bp_x1e3"]


def q_intra_order_discount_spread(sf_dir):
    """Within-basket pricing consistency: orders whose OWN lines
    carry two or more distinct discount levels (basis points), and
    the mean max-minus-min discount range among them — a wide
    intra-order spread means pricing is per-line arbitrary, which
    basket-level analyses average away.  Per-order min/max
    discount bp fold exactly in one pass."""
    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey", "l_discount"])

    def part(b: pa.Table) -> pa.Table:
        b = _valid(b, ("l_orderkey", "l_discount"))
        if b.num_rows == 0:
            return pa.table({
                "okey": pa.array([], pa.int64()),
                "mn": pa.array([], pa.int64()),
                "mx": pa.array([], pa.int64()),
            })
        d = b["l_discount"].cast(pa.float64()).to_numpy(
            zero_copy_only=False)
        bp = np.where(d >= 0, np.floor(d * 1e4 + 0.5),
                      np.ceil(d * 1e4 - 0.5)).astype(np.int64)
        t = pa.table({
            "okey": b["l_orderkey"].cast(pa.int64()),
            "mn": pa.array(bp),
            "mx": pa.array(bp),
        })
        g = t.group_by(["okey"]).aggregate(
            [("mn", "min"), ("mx", "max")])
        return g.rename_columns(["okey", "mn", "mx"])

    def comb(b: pa.Table) -> pa.Table:
        g = b.group_by(["okey"]).aggregate(
            [("mn", "min"), ("mx", "max")])
        return g.rename_columns(["okey", "mn", "mx"])

    om = tree_merge(
        li.map_batches(part, batch_format="pyarrow",
                       batch_size=None),
        comb,
        final_shards=8,
        shard_cols=["okey"],
    ).to_pandas()
    if "okey" not in om.columns or len(om) == 0:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _IOD_COLS})
    rng = (om["mx"] - om["mn"]).to_numpy(np.int64)
    n = len(om)
    mixed = rng > 0
    n_mixed = int(mixed.sum())
    if n == 0:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _IOD_COLS})
    mean_range = (float(rng[mixed].sum()) / n_mixed
                  if n_mixed else 0.0)
    return pa.table({
        "n_orders": pa.array([n], pa.int64()),
        "n_mixed_orders": pa.array([n_mixed], pa.int64()),
        "mixed_ppm": pa.array(
            [_round_half_away(n_mixed / n * 1e6)], pa.int64()),
        "mean_range_bp_x1e3": pa.array(
            [_round_half_away(mean_range * 1e3)], pa.int64()),
    })


IOD_SQL = """
WITH om AS MATERIALIZED (
  SELECT l_orderkey,
         CAST(MIN(CAST(ROUND(l_discount * 10000, 0) AS BIGINT))
              AS BIGINT) AS mn,
         CAST(MAX(CAST(ROUND(l_discount * 10000, 0) AS BIGINT))
              AS BIGINT) AS mx
  FROM lineitem
  WHERE l_orderkey IS NOT NULL AND l_discount IS NOT NULL
  GROUP BY 1
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CASE WHEN mx > mn THEN 1 ELSE 0 END) AS BIGINT)
         AS n_mixed_orders,
       CAST(ROUND(CAST(SUM(CASE WHEN mx > mn THEN 1 ELSE 0 END)
                       AS DOUBLE) / COUNT(*) * 1000000, 0)
            AS BIGINT) AS mixed_ppm,
       CAST(ROUND(CASE WHEN SUM(CASE WHEN mx > mn THEN 1 ELSE 0
                                END) = 0 THEN 0.0
                       ELSE CAST(SUM(CASE WHEN mx > mn
                                          THEN mx - mn ELSE 0
                                     END) AS DOUBLE)
                            / SUM(CASE WHEN mx > mn THEN 1
                                       ELSE 0 END) END
            * 1000, 0) AS BIGINT) AS mean_range_bp_x1e3
FROM om HAVING COUNT(*) > 0
"""

_DOZ_COLS = ["n_lineitems", "chi2_x1e3", "mult12_lift_ppm"]


def q_dozen_bias_quantity(sf_dir):
    """Pack-size quantization forensic: the mod-12 residue census
    of quantities with a uniformity chi^2 and the lift of exact
    multiples of 12 over the uniform 1/12 — dozen-lot ordering
    shows up here long before it is visible in the raw quantity
    histogram.  Residue counts are pure integers; chi^2 and lift
    mirror."""
    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_quantity"])

    def part(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_valid(b["l_quantity"]))
        x = b["l_quantity"].cast(pa.float64()).to_numpy(
            zero_copy_only=False)
        q = np.where(x >= 0, np.floor(x + 0.5),
                     np.ceil(x - 0.5)).astype(np.int64)
        r = q % 12
        t = pa.table({
            "r": pa.array(r),
            "n": pa.array(np.ones(len(r), np.int64)),
        })
        g = t.group_by(["r"]).aggregate([("n", "sum")])
        return g.rename_columns(["r", "n"])

    def comb(b: pa.Table) -> pa.Table:
        g = b.group_by(["r"]).aggregate([("n", "sum")])
        return g.rename_columns(["r", "n"])

    cc = tree_merge(
        li.map_batches(part, batch_format="pyarrow",
                       batch_size=None),
        comb,
    ).to_pandas()
    if "r" not in cc.columns or len(cc) == 0:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _DOZ_COLS})
    counts = np.zeros(12, dtype=np.int64)
    counts[cc["r"].to_numpy(np.int64)] = cc["n"].to_numpy(
        np.int64)
    n = int(counts.sum())
    if n == 0:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _DOZ_COLS})
    e = n / 12.0
    chi2 = float(((counts - e) ** 2 / e).sum())
    lift = int(counts[0]) / e
    return pa.table({
        "n_lineitems": pa.array([n], pa.int64()),
        "chi2_x1e3": pa.array(
            [_round_half_away(chi2 * 1e3)], pa.int64()),
        "mult12_lift_ppm": pa.array(
            [_round_half_away(lift * 1e6)], pa.int64()),
    })


DOZ_SQL = """
WITH r AS MATERIALIZED (
  SELECT CAST(ROUND(l_quantity, 0) AS BIGINT) % 12 AS res,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM lineitem WHERE l_quantity IS NOT NULL
  GROUP BY 1
), grid AS MATERIALIZED (
  SELECT CAST(k.k AS BIGINT) AS res, COALESCE(r.n, 0) AS n
  FROM range(0, 12) k(k) LEFT JOIN r ON r.res = k.k
), tot AS MATERIALIZED (
  SELECT CAST(SUM(n) AS BIGINT) AS t FROM grid
)
SELECT tot.t AS n_lineitems,
       CAST(ROUND(SUM((grid.n - tot.t / 12.0)
                      * (grid.n - tot.t / 12.0)
                      / (tot.t / 12.0)) * 1000, 0) AS BIGINT)
         AS chi2_x1e3,
       CAST(ROUND((SELECT CAST(n AS DOUBLE) FROM grid
                   WHERE res = 0) / (tot.t / 12.0)
            * 1000000, 0) AS BIGINT) AS mult12_lift_ppm
FROM grid CROSS JOIN tot
GROUP BY tot.t
HAVING tot.t > 0
"""


def register_r4hc(queries: dict, oracles: dict) -> None:
    queries.update(
        {
            "burst_cooccurrence_lift": q_burst_cooccurrence_lift,
            "intra_order_discount_spread":
                q_intra_order_discount_spread,
            "dozen_bias_quantity": q_dozen_bias_quantity,
        }
    )
    oracles.update(
        {
            "burst_cooccurrence_lift": BCL_SQL,
            "intra_order_discount_spread": IOD_SQL,
            "dozen_bias_quantity": DOZ_SQL,
        }
    )
