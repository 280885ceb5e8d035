"""Round-4 batch GM: difference-process fitting, duplicate
forensics, and coordinate shape — a Skellam moment fit of
day-over-day count differences per event type (the difference of
two Poissons: recovers the up-rate and down-rate that the net
change hides), a duplicate-order candidate census (same customer,
same day, same total cents — the double-submit fingerprint), and
the mean excess kurtosis of embedding coordinates (how non-
Gaussian each dimension's marginal is — heavy-tailed coordinates
break product-quantization codebooks trained with Gaussian
assumptions).

Exactness discipline: Skellam inputs are integer day counts with
mirrored moment algebra; duplicate keys are exact (custkey, day,
cents) triples; kurtosis uses TWO passes (means first, then
centered fourth/second moments) to dodge the cancellation that a
one-pass raw-moment identity suffers on near-zero-mean data."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from mimirsbrunn_ray.pipelines.queries_r4fk import (
    _DAY_US,
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


_SKEL_COLS = ["event_type", "n_diffs", "mean_diff_x1e3",
              "var_x1e3", "mu_up_x1e3", "mu_down_x1e3"]


def q_skellam_fit_dod(sf_dir):
    """Skellam moment fit of day-over-day total-count differences
    per event type on the dense day grid: with m = mean difference
    and v = population variance, the implied up-rate mu1 = (v + m)
    / 2 and down-rate mu2 = (v - m) / 2 — the two opposing Poisson
    flows whose NET the daily delta hides (a flat series with
    large v is high churn, not stability).  Counts fold in one
    distributed pass; moments mirror."""
    cc = _type_cell_counts(sf_dir, "day", _DAY_US, None)
    if "event_type" not in cc.columns or len(cc) == 0:
        return pa.table({
            "event_type": pa.array([], pa.string()),
            **{c: pa.array([], pa.int64())
               for c in _SKEL_COLS[1:]},
        })
    dmin = int(cc["day"].min())
    dmax = int(cc["day"].max())
    n_days = dmax - dmin + 1
    out = {c: [] for c in _SKEL_COLS}
    for et, g in cc.groupby("event_type", sort=True):
        v = np.zeros(n_days, dtype=np.int64)
        v[g["day"].to_numpy(np.int64) - dmin] = g["c"].to_numpy(
            np.int64)
        d = np.diff(v).astype(np.float64)
        n = len(d)
        if n < 2:
            continue
        m = d.mean()
        var = ((d - m) ** 2).mean()
        out["event_type"].append(et)
        out["n_diffs"].append(n)
        out["mean_diff_x1e3"].append(_round_half_away(m * 1e3))
        out["var_x1e3"].append(_round_half_away(var * 1e3))
        out["mu_up_x1e3"].append(
            _round_half_away((var + m) / 2.0 * 1e3))
        out["mu_down_x1e3"].append(
            _round_half_away((var - m) / 2.0 * 1e3))
    return pa.table({
        "event_type": pa.array(out["event_type"], pa.string()),
        **{c: pa.array(out[c], pa.int64())
           for c in _SKEL_COLS[1:]},
    })


SKELLAM_SQL = f"""
WITH dc AS MATERIALIZED (
  SELECT event_type, EPOCH_US(ts) // {_DAY_US} AS day,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM events
  WHERE event_type IS NOT NULL AND ts IS NOT NULL
  GROUP BY 1, 2
), span AS MATERIALIZED (
  SELECT MIN(day) AS dmin, MAX(day) AS dmax FROM dc
), grid AS MATERIALIZED (
  SELECT t.event_type, s.dmin + r.k AS day,
         CAST(COALESCE(dc.c, 0) AS DOUBLE) AS c
  FROM (SELECT DISTINCT event_type FROM dc) t
  CROSS JOIN span s
  JOIN range(0, 100000) r(k) ON s.dmin + r.k <= s.dmax
  LEFT JOIN dc ON dc.event_type = t.event_type
              AND dc.day = s.dmin + r.k
), dif AS MATERIALIZED (
  SELECT a.event_type, b.c - a.c AS d
  FROM grid a JOIN grid b ON b.event_type = a.event_type
                         AND b.day = a.day + 1
), mu AS MATERIALIZED (
  SELECT event_type, AVG(d) AS m,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM dif GROUP BY 1
), vr AS MATERIALIZED (
  SELECT dif.event_type,
         AVG((dif.d - mu.m) * (dif.d - mu.m)) AS v
  FROM dif JOIN mu USING (event_type)
  GROUP BY 1
)
SELECT mu.event_type,
       mu.n AS n_diffs,
       CAST(ROUND(mu.m * 1000, 0) AS BIGINT) AS mean_diff_x1e3,
       CAST(ROUND(vr.v * 1000, 0) AS BIGINT) AS var_x1e3,
       CAST(ROUND((vr.v + mu.m) / 2.0 * 1000, 0) AS BIGINT)
         AS mu_up_x1e3,
       CAST(ROUND((vr.v - mu.m) / 2.0 * 1000, 0) AS BIGINT)
         AS mu_down_x1e3
FROM mu JOIN vr USING (event_type)
WHERE mu.n >= 2
ORDER BY mu.event_type
"""

_DUP_COLS = ["n_orders", "n_dup_groups", "n_dup_orders",
             "dup_ppm"]


def q_duplicate_order_candidates(sf_dir):
    """Double-submit forensics: orders sharing (customer, order
    day, total cents) with at least one other order — the classic
    retry-without-idempotency fingerprint; reports duplicate
    groups, involved orders, and their share.  Exact integer
    triple keys, one distributed group pass."""
    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_orderdate", "o_totalprice"])

    def part(b: pa.Table) -> pa.Table:
        b = _valid(b, ("o_custkey", "o_orderdate", "o_totalprice"))
        if b.num_rows == 0:
            return pa.table({
                "cust": pa.array([], pa.int64()),
                "day": pa.array([], pa.int64()),
                "cents": pa.array([], pa.int64()),
                "n": pa.array([], pa.int64()),
            })
        us = b["o_orderdate"].cast(pa.timestamp("us")).cast(
            pa.int64()).to_numpy(zero_copy_only=False)
        x = b["o_totalprice"].cast(pa.float64()).to_numpy(
            zero_copy_only=False)
        cents = np.where(
            x >= 0, np.floor(x * 100.0 + 0.5),
            np.ceil(x * 100.0 - 0.5)).astype(np.int64)
        t = pa.table({
            "cust": b["o_custkey"].cast(pa.int64()),
            "day": pa.array(us // _DAY_US),
            "cents": pa.array(cents),
            "n": pa.array(np.ones(len(cents), np.int64)),
        })
        g = t.group_by(["cust", "day", "cents"]).aggregate(
            [("n", "sum")])
        return g.rename_columns(["cust", "day", "cents", "n"])

    def comb(b: pa.Table) -> pa.Table:
        g = b.group_by(["cust", "day", "cents"]).aggregate(
            [("n", "sum")])
        return g.rename_columns(["cust", "day", "cents", "n"])

    gk = tree_merge(
        orders.map_batches(part, batch_format="pyarrow",
                           batch_size=None),
        comb,
        final_shards=8,
        shard_cols=["cust"],
    ).to_pandas()
    if "cust" not in gk.columns or len(gk) == 0:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _DUP_COLS})
    n = gk["n"].to_numpy(np.int64)
    total = int(n.sum())
    dup = n >= 2
    if total == 0:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _DUP_COLS})
    return pa.table({
        "n_orders": pa.array([total], pa.int64()),
        "n_dup_groups": pa.array([int(dup.sum())], pa.int64()),
        "n_dup_orders": pa.array([int(n[dup].sum())], pa.int64()),
        "dup_ppm": pa.array(
            [_round_half_away(int(n[dup].sum()) / total * 1e6)],
            pa.int64()),
    })


DUP_SQL = f"""
WITH gk AS MATERIALIZED (
  SELECT o_custkey,
         EPOCH_US(o_orderdate) // {_DAY_US} AS day,
         CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS cents,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM orders
  WHERE o_custkey IS NOT NULL AND o_orderdate IS NOT NULL
    AND o_totalprice IS NOT NULL
  GROUP BY 1, 2, 3
)
SELECT CAST(SUM(n) AS BIGINT) AS n_orders,
       CAST(SUM(CASE WHEN n >= 2 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_dup_groups,
       CAST(SUM(CASE WHEN n >= 2 THEN n ELSE 0 END) AS BIGINT)
         AS n_dup_orders,
       CAST(ROUND(CAST(SUM(CASE WHEN n >= 2 THEN n ELSE 0 END)
                       AS DOUBLE) / SUM(n) * 1000000, 0)
            AS BIGINT) AS dup_ppm
FROM gk HAVING SUM(n) > 0
"""

_KURT_COLS = ["dim", "n_vecs", "mean_excess_kurt_x1e3",
              "max_excess_kurt_x1e3"]


def q_embedding_coord_kurtosis(sf_dir):
    """Coordinate-marginal shape census of the embedding space:
    per dimension the excess kurtosis m4/m2^2 - 3 from TWO-pass
    centered moments, reported as the mean and max across the 64
    dims — heavy-tailed coordinates (positive excess) break
    codebooks and quantizers tuned for Gaussian marginals.  Means
    fold first; centered fourth powers fold second."""
    emb = rd.read_parquet(
        f"{sf_dir}/embeddings.parquet",
        columns=["embedding"]).materialize()

    def mean_part(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_valid(b["embedding"]))
        if b.num_rows == 0:
            return pa.table({
                "j": pa.array([], pa.int64()),
                "s": pa.array([], pa.float64()),
                "n": pa.array([], pa.int64()),
            })
        x = b["embedding"].combine_chunks().flatten().to_numpy(
            zero_copy_only=False).astype(np.float64).reshape(
            b.num_rows, -1)
        d = x.shape[1]
        return pa.table({
            "j": pa.array(np.arange(d, dtype=np.int64)),
            "s": pa.array(x.sum(axis=0)),
            "n": pa.array(np.full(d, len(x), np.int64)),
        })

    def mean_comb(b: pa.Table) -> pa.Table:
        g = b.group_by(["j"]).aggregate(
            [("s", "sum"), ("n", "sum")])
        return g.rename_columns(["j", "s", "n"])

    mm = tree_merge(
        emb.map_batches(mean_part, batch_format="pyarrow",
                        batch_size=None),
        mean_comb,
    ).to_pandas()
    if "j" not in mm.columns or len(mm) == 0:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _KURT_COLS})
    mm = mm.sort_values("j")
    n_tot = int(mm["n"].iloc[0])
    mu = (mm["s"].to_numpy(np.float64)
          / mm["n"].to_numpy(np.float64))

    def cm_part(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_valid(b["embedding"]))
        if b.num_rows == 0:
            return pa.table({
                "j": pa.array([], pa.int64()),
                "s2": pa.array([], pa.float64()),
                "s4": pa.array([], pa.float64()),
            })
        x = b["embedding"].combine_chunks().flatten().to_numpy(
            zero_copy_only=False).astype(np.float64).reshape(
            b.num_rows, -1)
        d = x - mu[None, :]
        d2 = d * d
        return pa.table({
            "j": pa.array(np.arange(x.shape[1], dtype=np.int64)),
            "s2": pa.array(d2.sum(axis=0)),
            "s4": pa.array((d2 * d2).sum(axis=0)),
        })

    def cm_comb(b: pa.Table) -> pa.Table:
        g = b.group_by(["j"]).aggregate(
            [("s2", "sum"), ("s4", "sum")])
        return g.rename_columns(["j", "s2", "s4"])

    cm = tree_merge(
        emb.map_batches(cm_part, batch_format="pyarrow",
                        batch_size=None),
        cm_comb,
    ).to_pandas()
    if "j" not in cm.columns or len(cm) == 0:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _KURT_COLS})
    cm = cm.sort_values("j")
    m2 = cm["s2"].to_numpy(np.float64) / n_tot
    m4 = cm["s4"].to_numpy(np.float64) / n_tot
    keep = m2 > 0
    if not keep.any():
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _KURT_COLS})
    kurt = m4[keep] / (m2[keep] * m2[keep]) - 3.0
    return pa.table({
        "dim": pa.array([int(keep.sum())], pa.int64()),
        "n_vecs": pa.array([n_tot], pa.int64()),
        "mean_excess_kurt_x1e3": pa.array(
            [_round_half_away(float(kurt.mean()) * 1e3)],
            pa.int64()),
        "max_excess_kurt_x1e3": pa.array(
            [_round_half_away(float(kurt.max()) * 1e3)],
            pa.int64()),
    })


KURT_SQL = f"""
WITH v AS MATERIALIZED (
  SELECT vec_id, r.k - 1 AS j,
         CAST(embedding[CAST(r.k AS INTEGER)] AS DOUBLE) AS x
  FROM embeddings CROSS JOIN range(1, {_EMB_DIM + 1}) r(k)
  WHERE embedding IS NOT NULL AND vec_id IS NOT NULL
), mu AS MATERIALIZED (
  SELECT j, AVG(x) AS m, CAST(COUNT(*) AS BIGINT) AS n
  FROM v GROUP BY 1
), cmom AS MATERIALIZED (
  SELECT v.j,
         AVG((v.x - mu.m) * (v.x - mu.m)) AS m2,
         AVG((v.x - mu.m) * (v.x - mu.m)
             * (v.x - mu.m) * (v.x - mu.m)) AS m4,
         ANY_VALUE(mu.n) AS n
  FROM v JOIN mu USING (j)
  GROUP BY 1
), kt AS (
  SELECT j, m4 / (m2 * m2) - 3.0 AS kurt, n
  FROM cmom WHERE m2 > 0
)
SELECT CAST(COUNT(*) AS BIGINT) AS dim,
       CAST(ANY_VALUE(n) AS BIGINT) AS n_vecs,
       CAST(ROUND(AVG(kurt) * 1000, 0) AS BIGINT)
         AS mean_excess_kurt_x1e3,
       CAST(ROUND(MAX(kurt) * 1000, 0) AS BIGINT)
         AS max_excess_kurt_x1e3
FROM kt HAVING COUNT(*) > 0
"""


def register_r4gm(queries: dict, oracles: dict) -> None:
    queries.update(
        {
            "skellam_fit_dod": q_skellam_fit_dod,
            "duplicate_order_candidates":
                q_duplicate_order_candidates,
            "embedding_coord_kurtosis": q_embedding_coord_kurtosis,
        }
    )
    oracles.update(
        {
            "skellam_fit_dod": SKELLAM_SQL,
            "duplicate_order_candidates": DUP_SQL,
            "embedding_coord_kurtosis": KURT_SQL,
        }
    )
