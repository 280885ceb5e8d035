"""Round-4 batch DJ: order-total reconciliation bands, the basket-size
vs item-price slope, and the shipment-splitting histogram.

Financial/fulfillment audits exercising the big-big orderkey exchange:
reconciliation recomputes every order's total from its lines under the
cents-exact price model and bands the disagreement; the basket slope
asks whether larger orders buy cheaper items (per-order sufficient
statistics from one combiner pass); the split histogram counts distinct
ship dates per order. Exactness: cents/quantity arithmetic folds exact
int64 (per-term quantization BEFORE sums); only the final slope and
shares divide, x1e6 snap.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd
from mimirsbrunn_ray.stages.broadcast import safe_join as _safe_join

from mimirsbrunn_ray.context import pool_size
from mimirsbrunn_ray.stages.dedup import _BUCKET, add_bucket
from mimirsbrunn_ray.stages.rollup import tree_merge

_DAY_US = 86_400_000_000


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
# order-total reconciliation bands
# ---------------------------------------------------------------------------


def q_order_total_reconciliation(sf_dir):
    """Reconciliation audit: recompute each order's total from its
    lineitems under the cents-exact model round(extendedprice * (1 -
    discount) * (1 + tax) * 100) summed per order, compare against the
    order header's cents total, and band the absolute disagreement
    (exact, <= 1 cent, <= 1 dollar, beyond) — the ledger-integrity
    check every billing pipeline runs nightly. Per-order recomputed
    cents fold exact int64 (per-TERM quantization, so the distributed
    sum is associative); the header attaches through one big-big
    orderkey exchange; band counts are exact, the shares x1e6."""
    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount", "l_tax"],
    )

    def line_partial(b: pa.Table) -> pa.Table:
        b = _clean(b, ("l_orderkey", "l_extendedprice", "l_discount", "l_tax"))
        price = b["l_extendedprice"].to_numpy(zero_copy_only=False).astype(
            np.float64
        )
        disc = b["l_discount"].to_numpy(zero_copy_only=False).astype(np.float64)
        tax = b["l_tax"].to_numpy(zero_copy_only=False).astype(np.float64)
        cents = _round_half_away(price * (1.0 - disc) * (1.0 + tax) * 100.0)
        t = pa.table(
            {
                "l_orderkey": b["l_orderkey"].cast(pa.int64()),
                "recomputed_e2": pa.array(cents),
            }
        )
        return _sum_by(t, ["l_orderkey"], ["recomputed_e2"])

    per_order = tree_merge(
        li.map_batches(line_partial, batch_format="pyarrow", batch_size=None),
        lambda b: _sum_by(b, ["l_orderkey"], ["recomputed_e2"]),
    )

    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_totalprice"]
    ).map_batches(
        lambda b: (
            lambda f: pa.table(
                {
                    "o_orderkey": f["o_orderkey"].cast(pa.int64()),
                    "header_e2": pa.array(
                        _round_half_away(
                            f["o_totalprice"]
                            .to_numpy(zero_copy_only=False)
                            .astype(np.float64)
                            * 100.0
                        )
                    ),
                }
            )
        )(_clean(b, ("o_orderkey", "o_totalprice"))),
        batch_format="pyarrow",
        batch_size=None,
    )

    n_part = max(8, pool_size())
    joined = _safe_join(
        per_order, orders,
        on=("l_orderkey",),
        right_on=("o_orderkey",),
        join_type="inner",
        num_partitions=n_part,
    )

    def band(b: pa.Table) -> pa.Table:
        d = np.abs(
            b["recomputed_e2"].to_numpy() - b["header_e2"].to_numpy()
        )
        t = pa.table(
            {
                "k": pa.array(np.zeros(len(d), np.int64)),
                "exact": pa.array((d == 0).astype(np.int64)),
                "within_1c": pa.array(((d > 0) & (d <= 1)).astype(np.int64)),
                "within_1d": pa.array(((d > 1) & (d <= 100)).astype(np.int64)),
                "beyond": pa.array((d > 100).astype(np.int64)),
            }
        )
        return _sum_by(t, ["k"], ["exact", "within_1c", "within_1d", "beyond"])

    agg = tree_merge(
        joined.map_batches(band, batch_format="pyarrow", batch_size=None),
        lambda b: _sum_by(
            b, ["k"], ["exact", "within_1c", "within_1d", "beyond"]
        ),
    ).to_pandas()
    if not len(agg) or "exact" not in agg.columns:
        return pa.table(
            {
                "band": pa.array([], pa.string()),
                "n_orders": pa.array([], pa.int64()),
                "share_x1e6": pa.array([], pa.int64()),
            }
        )
    vals = {
        "1_exact": int(agg["exact"].iloc[0]),
        "2_within_1c": int(agg["within_1c"].iloc[0]),
        "3_within_1d": int(agg["within_1d"].iloc[0]),
        "4_beyond": int(agg["beyond"].iloc[0]),
    }
    total = sum(vals.values())
    bands = sorted(vals)
    return pa.table(
        {
            "band": pa.array(bands, pa.string()),
            "n_orders": pa.array([vals[b] for b in bands], pa.int64()),
            "share_x1e6": pa.array(
                [
                    None
                    if total == 0
                    else int(
                        _round_half_away(
                            np.array([float(vals[b]) / total * 1e6])
                        )[0]
                    )
                    for b in bands
                ],
                pa.int64(),
            ),
        }
    )


RECON_SQL = """
WITH per AS MATERIALIZED (
  SELECT l_orderkey,
         CAST(SUM(CAST(ROUND(l_extendedprice * (1.0 - l_discount)
                             * (1.0 + l_tax) * 100, 0) AS BIGINT))
              AS BIGINT) AS recomputed_e2
  FROM lineitem
  WHERE l_orderkey IS NOT NULL AND l_extendedprice IS NOT NULL
    AND l_discount IS NOT NULL AND l_tax IS NOT NULL
  GROUP BY 1
), j AS MATERIALIZED (
  SELECT ABS(per.recomputed_e2
             - CAST(ROUND(o.o_totalprice * 100, 0) AS BIGINT)) AS d
  FROM per JOIN orders o ON o.o_orderkey = per.l_orderkey
  WHERE o.o_totalprice IS NOT NULL
), c AS (
  SELECT CAST(SUM(CASE WHEN d = 0 THEN 1 ELSE 0 END) AS BIGINT) AS exact_n,
         CAST(SUM(CASE WHEN d > 0 AND d <= 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS c1,
         CAST(SUM(CASE WHEN d > 1 AND d <= 100 THEN 1 ELSE 0 END) AS BIGINT)
           AS c2,
         CAST(SUM(CASE WHEN d > 100 THEN 1 ELSE 0 END) AS BIGINT) AS c3,
         CAST(COUNT(*) AS BIGINT) AS total
  FROM j
)
SELECT band, n_orders,
       CASE WHEN total = 0 THEN NULL
            ELSE CAST(ROUND(CAST(n_orders AS DOUBLE) / total * 1000000, 0)
                 AS BIGINT) END AS share_x1e6
FROM (
  SELECT '1_exact' AS band, exact_n AS n_orders, total FROM c
  UNION ALL SELECT '2_within_1c', c1, total FROM c
  UNION ALL SELECT '3_within_1d', c2, total FROM c
  UNION ALL SELECT '4_beyond', c3, total FROM c
)
ORDER BY 1
"""


# ---------------------------------------------------------------------------
# basket size vs mean item price slope
# ---------------------------------------------------------------------------


def q_basket_size_price_slope(sf_dir):
    """One-row economy-of-scale audit: the least-squares slope (and
    Pearson r) of an order's MEAN item price (cents) on its line count
    — negative slope = bigger baskets skew toward cheaper items, the
    mix effect that breaks naive revenue-per-order forecasts. Per-order
    (n_lines, cents total) fold exact int64 inside one combiner pass
    (complete per hash bucket); each order then contributes identical
    doubles (x = n_lines, y = cents/n_lines) to the mirrored regression
    sums, x1e6 snap."""
    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_extendedprice"]
    )

    def prep(b: pa.Table) -> pa.Table:
        b = _clean(b, ("l_orderkey", "l_extendedprice"))
        cents = _round_half_away_x(
            b["l_extendedprice"].to_numpy(zero_copy_only=False).astype(
                np.float64
            ),
            100.0,
        )
        t = pa.table(
            {
                "l_orderkey": b["l_orderkey"].cast(pa.int64()),
                "n": pa.array(np.ones(len(cents), np.int64)),
                "s": pa.array(cents),
            }
        )
        return add_bucket(_sum_by(t, ["l_orderkey"], ["n", "s"]), "l_orderkey", 64)

    bucketed = li.map_batches(prep, batch_format="pyarrow", batch_size=None)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "n": pd.Series([], dtype=np.int64),
                "sx": pd.Series([], dtype=np.float64),
                "sy": pd.Series([], dtype=np.float64),
                "sxx": pd.Series([], dtype=np.float64),
                "sxy": pd.Series([], dtype=np.float64),
                "syy": pd.Series([], dtype=np.float64),
            }
        )
        if len(g) == 0:
            return empty
        per = g.groupby("l_orderkey", sort=False)[["n", "s"]].sum()
        x = per["n"].to_numpy(dtype=np.int64).astype(np.float64)
        y = per["s"].to_numpy(dtype=np.int64) / per["n"].to_numpy(
            dtype=np.int64
        )
        return pd.DataFrame(
            {
                "n": [len(per)],
                "sx": [float(np.sum(x))],
                "sy": [float(np.sum(y))],
                "sxx": [float(np.sum(x * x))],
                "sxy": [float(np.sum(x * y))],
                "syy": [float(np.sum(y * y))],
            }
        )

    parts = bucketed.groupby(_BUCKET).map_groups(
        per_bucket, batch_format="pandas"
    ).to_pandas()
    if not len(parts) or "n" not in parts.columns or parts["n"].sum() < 3:
        return pa.table(
            {
                "n_orders": pa.array([0], pa.int64()),
                "slope_x1e6": pa.array([None], pa.int64()),
                "r_x1e6": pa.array([None], pa.int64()),
            }
        )
    n = int(parts["n"].sum())
    sx = float(parts["sx"].sum())
    sy = float(parts["sy"].sum())
    sxx = float(parts["sxx"].sum())
    sxy = float(parts["sxy"].sum())
    syy = float(parts["syy"].sum())
    vx = sxx - sx * sx / n
    vy = syy - sy * sy / n
    cov = sxy - sx * sy / n
    slope = (
        None
        if vx == 0.0
        else int(_round_half_away(np.array([cov / vx * 1e6]))[0])
    )
    r = (
        None
        if vx == 0.0 or vy == 0.0
        else int(_round_half_away(np.array([cov / np.sqrt(vx * vy) * 1e6]))[0])
    )
    return pa.table(
        {
            "n_orders": pa.array([n], pa.int64()),
            "slope_x1e6": pa.array([slope], pa.int64()),
            "r_x1e6": pa.array([r], pa.int64()),
        }
    )


BASKET_SLOPE_SQL = """
WITH per AS MATERIALIZED (
  SELECT l_orderkey, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT))
              AS BIGINT) AS s
  FROM lineitem
  WHERE l_orderkey IS NOT NULL AND l_extendedprice IS NOT NULL
  GROUP BY 1
), d AS (
  SELECT CAST(n AS DOUBLE) AS x, CAST(s AS DOUBLE) / n AS y FROM per
), a AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n, SUM(x) AS sx, SUM(y) AS sy,
         SUM(x * x) AS sxx, SUM(x * y) AS sxy, SUM(y * y) AS syy
  FROM d
)
SELECT n AS n_orders,
       CASE WHEN n < 3 OR sxx - sx * sx / n = 0 THEN NULL
            ELSE CAST(ROUND((sxy - sx * sy / n) / (sxx - sx * sx / n)
                 * 1000000, 0) AS BIGINT) END AS slope_x1e6,
       CASE WHEN n < 3 OR sxx - sx * sx / n = 0 OR syy - sy * sy / n = 0
            THEN NULL
            ELSE CAST(ROUND((sxy - sx * sy / n)
                   / SQRT((sxx - sx * sx / n) * (syy - sy * sy / n))
                 * 1000000, 0) AS BIGINT) END AS r_x1e6
FROM a
"""


# ---------------------------------------------------------------------------
# shipment-splitting histogram
# ---------------------------------------------------------------------------


def q_shipment_split_hist(sf_dir):
    """Histogram of shipment splitting: for k = 1, 2, ... the number of
    orders whose lineitems shipped on exactly k DISTINCT dates — the
    fulfillment-fragmentation audit (every extra ship date is an extra
    delivery cost; a heavy tail here pays for a consolidation pass).
    Distinct (order, day) pairs are complete per hash bucket; the
    k-histogram folds exact int64; shares x1e6."""
    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_shipdate"]
    )

    def prep(b: pa.Table) -> pa.Table:
        b = _clean(b, ("l_orderkey", "l_shipdate"))
        us = b["l_shipdate"].cast(pa.timestamp("us")).cast(pa.int64())
        d = (us.to_numpy() // _DAY_US).astype(np.int64)
        t = pa.table(
            {
                "l_orderkey": b["l_orderkey"].cast(pa.int64()),
                "d": pa.array(d),
            }
        )
        g = t.group_by(["l_orderkey", "d"]).aggregate([])
        return add_bucket(g, "l_orderkey", 64)

    bucketed = li.map_batches(prep, batch_format="pyarrow", batch_size=None)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame(
                {
                    "k": pd.Series([], dtype=np.int64),
                    "n_orders": pd.Series([], dtype=np.int64),
                }
            )
        d = g.drop_duplicates(["l_orderkey", "d"])
        per = d.groupby("l_orderkey", sort=False).size()
        hist = per.value_counts().rename("n_orders")
        out = hist.reset_index().rename(columns={"index": "k"})
        out.columns = ["k", "n_orders"]
        return out.astype({"k": np.int64, "n_orders": np.int64})

    hist = tree_merge(
        bucketed.groupby(_BUCKET).map_groups(per_bucket, batch_format="pandas"),
        lambda b: _sum_by(b, ["k"], ["n_orders"]),
    ).to_pandas()
    if not len(hist) or "k" not in hist.columns:
        return pa.table(
            {
                "k": pa.array([], pa.int64()),
                "n_orders": pa.array([], pa.int64()),
                "share_x1e6": pa.array([], pa.int64()),
            }
        )
    hist = hist.sort_values("k", ignore_index=True)
    total = int(hist["n_orders"].sum())
    return pa.table(
        {
            "k": pa.array(hist["k"].to_numpy(dtype=np.int64)),
            "n_orders": pa.array(hist["n_orders"].to_numpy(dtype=np.int64)),
            "share_x1e6": pa.array(
                [
                    None
                    if total == 0
                    else int(
                        _round_half_away(np.array([float(v) / total * 1e6]))[0]
                    )
                    for v in hist["n_orders"]
                ],
                pa.int64(),
            ),
        }
    )


SPLIT_HIST_SQL = """
WITH per AS MATERIALIZED (
  SELECT l_orderkey,
         CAST(COUNT(DISTINCT CAST(FLOOR(EPOCH_US(l_shipdate) / 86400000000)
                                  AS BIGINT)) AS BIGINT) AS k
  FROM lineitem
  WHERE l_orderkey IS NOT NULL AND l_shipdate IS NOT NULL
  GROUP BY 1
), h AS MATERIALIZED (
  SELECT k, CAST(COUNT(*) AS BIGINT) AS n_orders FROM per GROUP BY 1
), t AS (SELECT CAST(SUM(n_orders) AS BIGINT) AS total FROM h)
SELECT h.k, h.n_orders,
       CASE WHEN t.total = 0 THEN NULL
            ELSE CAST(ROUND(CAST(h.n_orders AS DOUBLE) / t.total
                 * 1000000, 0) AS BIGINT) END AS share_x1e6
FROM h, t ORDER BY 1
"""


def register_r4dj(queries: dict, oracles: dict) -> None:
    queries.update(
        {
            "order_total_reconciliation": q_order_total_reconciliation,
            "basket_size_price_slope": q_basket_size_price_slope,
            "shipment_split_hist": q_shipment_split_hist,
        }
    )
    oracles.update(
        {
            "order_total_reconciliation": RECON_SQL,
            "basket_size_price_slope": BASKET_SLOPE_SQL,
            "shipment_split_hist": SPLIT_HIST_SQL,
        }
    )
