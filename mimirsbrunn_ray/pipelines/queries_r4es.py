"""Round-4 batch ES: TPC-H parity widening — Q6 (forecasting revenue
change), Q14 (promotion effect), Q17 (small-quantity-order revenue),
re-expressed Ray-Data-first over the sf tables (no partsupp /
shipmode columns in this corpus, so Q14/Q17 use the available p_type
/ p_brand predicates; provenance: the reference's import pipeline has
no ad-hoc SQL layer, these extend the engine's analytic surface the
way tpch_q3/q5/q21/q22 already do).

Exactness discipline: prices carry exactly 2 decimals and discounts
sit on a 1% grid, so revenue terms are computed on INTEGER grids —
``price_cents = round(price*100)`` (int64) and ``disc_pct =
round(disc*100)`` (int64); ``price*disc`` -> ``price_cents*disc_pct``
(x1e4), ``price*(1-disc)`` -> ``price_cents*(100-disc_pct)`` (x1e4) —
summed as int64 with NO float rounding anywhere, mirrored term-for-
term in the SQL. Shares/averages are snapped once at the end
(half-away ppm / cents)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as _pq
import ray.data as rd

from mimirsbrunn_ray.stages.ordered import _round_half_away
from mimirsbrunn_ray.stages.rollup import tree_merge

_Q6_LO = np.datetime64("1996-01-01", "us")
_Q6_HI = np.datetime64("1997-01-01", "us")


def _cents(col: pa.ChunkedArray) -> np.ndarray:
    v = col.to_numpy(zero_copy_only=False)
    return np.floor(v * 100.0 + 0.5).astype(np.int64)


def q_tpch_q6_revenue(sf_dir):
    """TPC-H Q6: revenue increase from eliminating small discounts —
    one column-pruned streaming pass over lineitem, per-batch filter +
    integer partial (count, sum of price_cents*disc_pct), driver folds
    the per-block one-row partials. No shuffle at all."""
    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_shipdate", "l_discount", "l_quantity",
                 "l_extendedprice"],
    )
    lo_us = _Q6_LO.astype(np.int64)
    hi_us = _Q6_HI.astype(np.int64)

    def partial(b: pa.Table) -> pa.Table:
        ship = b["l_shipdate"].cast(pa.timestamp("us")).cast(pa.int64())
        ship = ship.to_numpy(zero_copy_only=False)
        disc = b["l_discount"].to_numpy(zero_copy_only=False)
        qty = b["l_quantity"].to_numpy(zero_copy_only=False)
        dpct = np.floor(disc * 100.0 + 0.5).astype(np.int64)
        keep = (
            (ship >= lo_us) & (ship < hi_us)
            & (dpct >= 5) & (dpct <= 7) & (qty < 24.0)
        )
        pcents = _cents(b["l_extendedprice"])
        rev = np.sum(pcents[keep] * dpct[keep])
        return pa.table(
            {
                "n_lines": pa.array([int(keep.sum())], pa.int64()),
                "revenue_e4": pa.array([int(rev)], pa.int64()),
            }
        )

    parts = li.map_batches(
        partial, batch_format="pyarrow", batch_size=None
    ).to_pandas()
    n = int(parts["n_lines"].sum()) if len(parts) else 0
    rev = int(parts["revenue_e4"].sum()) if len(parts) else 0
    return pa.table(
        {
            "n_lines": pa.array([n], pa.int64()),
            "revenue_e4": pa.array([rev], pa.int64()),
        }
    )


TPCH_Q6_SQL = """
SELECT CAST(COUNT(*) AS BIGINT) AS n_lines,
       CAST(COALESCE(SUM(
         CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)
         * CAST(ROUND(l_discount * 100, 0) AS BIGINT)), 0) AS BIGINT)
         AS revenue_e4
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1997-01-01'
  AND CAST(ROUND(l_discount * 100, 0) AS BIGINT) BETWEEN 5 AND 7
  AND l_quantity < 24
"""


def q_tpch_q14_promo_share(sf_dir):
    """TPC-H Q14: promotion-revenue share per ship month. The part
    dim ships ONCE per task as a sorted (partkey -> is-PROMO) numpy
    lookup (dim-sized, same broadcast class as every other part-dim
    attach in this repo); lineitem streams once with a searchsorted
    flag attach and per-(month) integer partials; the month-keyed
    partial table is tiny and tree-merges."""
    from mimirsbrunn_ray.stages.broadcast import dim_fits

    if not dim_fits(sf_dir, "part"):  # pragma: no cover - scale path
        raise NotImplementedError(
            "distributed-dim fallback: attach_dim lineitem->part on "
            "partkey (stages/broadcast.py)")
    part = _pq.read_table(
        f"{sf_dir}/part.parquet", columns=["p_partkey", "p_type"]
    )
    pk = part["p_partkey"].to_numpy()
    promo = pc.equal(part["p_type"], "PROMO").to_numpy(
        zero_copy_only=False
    )
    order = np.argsort(pk, kind="stable")
    pk, promo = pk[order], promo[order].astype(bool)

    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_shipdate", "l_extendedprice",
                 "l_discount"],
    )

    def partial(b: pa.Table) -> pa.Table:
        key = b["l_partkey"].to_numpy(zero_copy_only=False)
        if len(pk) == 0:
            is_promo = np.zeros(len(key), bool)
        else:
            idx_c = np.clip(np.searchsorted(pk, key), 0, len(pk) - 1)
            is_promo = np.where(pk[idx_c] == key, promo[idx_c], False)
        disc = b["l_discount"].to_numpy(zero_copy_only=False)
        dpct = np.floor(disc * 100.0 + 0.5).astype(np.int64)
        rev = _cents(b["l_extendedprice"]) * (100 - dpct)
        month = pc.strftime(
            b["l_shipdate"].cast(pa.timestamp("us")), format="%Y-%m"
        )
        t = pa.table(
            {
                "month": month,
                "promo_e4": pa.array(
                    np.where(is_promo, rev, 0), pa.int64()
                ),
                "total_e4": pa.array(rev, pa.int64()),
            }
        )
        g = t.group_by(["month"]).aggregate(
            [("promo_e4", "sum"), ("total_e4", "sum")]
        )
        return g.rename_columns(["month", "promo_e4", "total_e4"])

    def combine(b: pa.Table) -> pa.Table:
        g = b.group_by(["month"]).aggregate(
            [("promo_e4", "sum"), ("total_e4", "sum")]
        )
        return g.rename_columns(["month", "promo_e4", "total_e4"])

    merged = tree_merge(
        li.map_batches(partial, batch_format="pyarrow",
                       batch_size=None),
        combine,
    )

    def finish(b: pa.Table) -> pa.Table:
        p = b["promo_e4"].to_numpy(zero_copy_only=False)
        t = b["total_e4"].to_numpy(zero_copy_only=False)
        share = np.array(
            [
                _round_half_away(float(pi) / float(ti) * 1e6)
                if ti > 0 else 0
                for pi, ti in zip(p, t)
            ],
            np.int64,
        )
        return pa.table(
            {
                "month": b["month"],
                "promo_e4": b["promo_e4"],
                "total_e4": b["total_e4"],
                "promo_share_ppm": pa.array(share),
            }
        )

    out = merged.map_batches(
        finish, batch_format="pyarrow", batch_size=None
    ).to_pandas()
    if "month" not in out.columns:  # empty-corpus schema loss
        return pa.table({
            "month": pa.array([], pa.string()),
            "promo_e4": pa.array([], pa.int64()),
            "total_e4": pa.array([], pa.int64()),
            "promo_share_ppm": pa.array([], pa.int64()),
        })
    return out.sort_values("month", ignore_index=True)


TPCH_Q14_SQL = """
WITH l AS (
  SELECT strftime(l_shipdate, '%Y-%m') AS month,
         CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)
           * (100 - CAST(ROUND(l_discount * 100, 0) AS BIGINT))
           AS rev_e4,
         CASE WHEN p_type = 'PROMO' THEN 1 ELSE 0 END AS is_promo
  FROM lineitem JOIN part ON l_partkey = p_partkey
)
SELECT month,
       CAST(SUM(CASE WHEN is_promo = 1 THEN rev_e4 ELSE 0 END)
            AS BIGINT) AS promo_e4,
       CAST(SUM(rev_e4) AS BIGINT) AS total_e4,
       CAST(ROUND(CAST(SUM(CASE WHEN is_promo = 1 THEN rev_e4
                              ELSE 0 END) AS DOUBLE)
            / CAST(SUM(rev_e4) AS DOUBLE) * 1000000, 0) AS BIGINT)
         AS promo_share_ppm
FROM l GROUP BY month ORDER BY month
"""

_Q17_BRAND = "Brand#17"


def q_tpch_q17_small_qty_revenue(sf_dir):
    """TPC-H Q17: revenue lost to small-quantity orders of one brand.
    Two column-pruned lineitem passes, both pre-filtered to the
    brand's partkeys (a 1/|brands| slice of the part dim, broadcast as
    a sorted array): pass 1 builds exact per-part (qty_sum, n)
    integer partials (combiner-first, tree-merged — quantities are
    integral so the avg threshold 0.2*sum/n is the same double on
    both sides); pass 2 filters l_quantity < threshold(part) via a
    searchsorted threshold lookup and folds integer price-cents
    partials. No all-to-all shuffle — both exchanges are dim-sized."""
    from mimirsbrunn_ray.stages.broadcast import dim_fits

    if not dim_fits(sf_dir, "part"):  # pragma: no cover - scale path
        raise NotImplementedError(
            "distributed-dim fallback: attach_dim lineitem->part on "
            "partkey (stages/broadcast.py)")
    part = _pq.read_table(
        f"{sf_dir}/part.parquet", columns=["p_partkey", "p_brand"]
    )
    bp = part.filter(pc.equal(part["p_brand"], _Q17_BRAND))
    bkeys = np.sort(bp["p_partkey"].to_numpy())

    li_cols = ["l_partkey", "l_quantity", "l_extendedprice"]

    def brand_mask(b: pa.Table) -> np.ndarray:
        key = b["l_partkey"].to_numpy(zero_copy_only=False)
        if len(bkeys) == 0:
            return np.zeros(len(key), bool)
        idx = np.clip(np.searchsorted(bkeys, key), 0, len(bkeys) - 1)
        return bkeys[idx] == key

    def pass1(b: pa.Table) -> pa.Table:
        m = brand_mask(b)
        t = pa.table(
            {
                "p": b["l_partkey"].filter(pa.array(m)),
                "q": pa.array(
                    b["l_quantity"].to_numpy(
                        zero_copy_only=False
                    )[m].astype(np.int64)
                ),
                "n": pa.array(np.ones(int(m.sum()), np.int64)),
            }
        )
        g = t.group_by(["p"]).aggregate([("q", "sum"), ("n", "sum")])
        return g.rename_columns(["p", "q", "n"])

    def comb(b: pa.Table) -> pa.Table:
        g = b.group_by(["p"]).aggregate([("q", "sum"), ("n", "sum")])
        return g.rename_columns(["p", "q", "n"])

    stats = tree_merge(
        rd.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_partkey", "l_quantity"],
        ).map_batches(pass1, batch_format="pyarrow", batch_size=None),
        comb,
    ).to_pandas()
    if len(stats) == 0:
        return pa.table(
            {
                "n_lines": pa.array([0], pa.int64()),
                "total_cents": pa.array([0], pa.int64()),
                "avg_yearly_cents": pa.array([0], pa.int64()),
            }
        )
    tk = stats["p"].to_numpy(dtype=np.int64)
    thr = 0.2 * (
        stats["q"].to_numpy(dtype=np.float64)
        / stats["n"].to_numpy(dtype=np.float64)
    )
    order = np.argsort(tk, kind="stable")
    tk, thr = tk[order], thr[order]

    def pass2(b: pa.Table) -> pa.Table:
        m = brand_mask(b)
        key = b["l_partkey"].to_numpy(zero_copy_only=False)
        qty = b["l_quantity"].to_numpy(zero_copy_only=False)
        idx = np.clip(np.searchsorted(tk, key), 0, len(tk) - 1)
        keep = m & (tk[idx] == key) & (qty < thr[idx])
        cents = _cents(b["l_extendedprice"])[keep]
        return pa.table(
            {
                "n_lines": pa.array([int(keep.sum())], pa.int64()),
                "total_cents": pa.array(
                    [int(np.sum(cents))], pa.int64()
                ),
            }
        )

    parts = (
        rd.read_parquet(f"{sf_dir}/lineitem.parquet", columns=li_cols)
        .map_batches(pass2, batch_format="pyarrow", batch_size=None)
        .to_pandas()
    )
    n = int(parts["n_lines"].sum()) if len(parts) else 0
    tot = int(parts["total_cents"].sum()) if len(parts) else 0
    return pa.table(
        {
            "n_lines": pa.array([n], pa.int64()),
            "total_cents": pa.array([tot], pa.int64()),
            "avg_yearly_cents": pa.array(
                [_round_half_away(tot / 7.0)], pa.int64()
            ),
        }
    )


TPCH_Q17_SQL = f"""
WITH brand_parts AS (
  SELECT p_partkey FROM part WHERE p_brand = '{_Q17_BRAND}'
), stats AS (
  SELECT l_partkey,
         0.2 * (CAST(SUM(CAST(l_quantity AS BIGINT)) AS DOUBLE)
                / CAST(COUNT(*) AS DOUBLE)) AS thr
  FROM lineitem JOIN brand_parts ON l_partkey = p_partkey
  GROUP BY l_partkey
), small AS (
  SELECT CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT) AS cents
  FROM lineitem JOIN stats USING (l_partkey)
  WHERE l_quantity < thr
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_lines,
       CAST(COALESCE(SUM(cents), 0) AS BIGINT) AS total_cents,
       CAST(ROUND(CAST(COALESCE(SUM(cents), 0) AS DOUBLE) / 7.0, 0)
            AS BIGINT) AS avg_yearly_cents
FROM small
"""


def register_r4es(queries: dict, oracles: dict) -> None:
    queries.update(
        {
            "tpch_q6_revenue": q_tpch_q6_revenue,
            "tpch_q14_promo_share": q_tpch_q14_promo_share,
            "tpch_q17_small_qty_revenue": q_tpch_q17_small_qty_revenue,
        }
    )
    oracles.update(
        {
            "tpch_q6_revenue": TPCH_Q6_SQL,
            "tpch_q14_promo_share": TPCH_Q14_SQL,
            "tpch_q17_small_qty_revenue": TPCH_Q17_SQL,
        }
    )
