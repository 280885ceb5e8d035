"""Round-4 batch CE: supplier co-sourcing pairs, log-log price
elasticity per brand, and the cohort LTV (lifetime-value) curve.

Exactness discipline: the pair counts and LTV sums are pure int64; the
elasticity snaps LN of exact integer cents/quantity to x1e4 fixed point
(identical double input -> one libm LN -> one ROUND both engines), then
folds exact int64 sufficient statistics into the mirrored
num/den closed form with one final x1e6 rounding.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray.data as rd

from mimirsbrunn_ray.stages.dedup import _BUCKET, add_bucket
from mimirsbrunn_ray.stages.rollup import tree_merge


def _round_half_away(x: np.ndarray) -> np.ndarray:
    return np.where(x >= 0, np.floor(x + 0.5), np.ceil(x - 0.5)).astype(
        np.int64
    )


def _clean(b: pa.Table, cols: tuple[str, ...]) -> pa.Table:
    m = None
    for c in cols:
        v = pc.is_valid(b[c])
        m = v if m is None else pc.and_(m, v)
    return b.filter(m)


# ---------------------------------------------------------------------------
# supplier co-sourcing pairs (bipartite projection, top-20)
# ---------------------------------------------------------------------------


def q_supplier_shared_part_pairs(sf_dir):
    """Top-20 supplier pairs by the number of DISTINCT parts both have
    shipped (the bipartite supplier-part graph projected onto
    suppliers) — the co-sourcing affinity a procurement team reads for
    consolidation. Stages: combiner-first distinct (supp, part) sharded
    by part; per-part pair emission grouped by part hash bucket with
    the size-grouped triu trick (one triu_indices per distinct segment
    size, no per-part Python loop); combiner-first pair counts; global
    top-20 prune by (n DESC, s1, s2)."""
    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_suppkey", "l_partkey"]
    )

    def distinct_partial(b: pa.Table) -> pa.Table:
        b = _clean(b, ("l_suppkey", "l_partkey"))
        t = pa.table(
            {
                "s": b["l_suppkey"].cast(pa.int64()),
                "p": b["l_partkey"].cast(pa.int64()),
            }
        )
        return t.group_by(["s", "p"]).aggregate([])

    def distinct_combine(b: pa.Table) -> pa.Table:
        return b.group_by(["s", "p"]).aggregate([])

    sp = tree_merge(
        li.map_batches(
            distinct_partial, batch_format="pyarrow", batch_size=None
        ),
        distinct_combine,
        final_shards=8,
        shard_cols=["p"],
    )

    bucketed = sp.map_batches(
        lambda b: add_bucket(b, "p", 32),
        batch_format="pyarrow",
        batch_size=None,
    )

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "s1": pd.Series([], dtype=np.int64),
                "s2": pd.Series([], dtype=np.int64),
                "n": pd.Series([], dtype=np.int64),
            }
        )
        if len(g) == 0:
            return empty
        g = g.sort_values(["p", "s"], kind="mergesort", ignore_index=True)
        p = g["p"].to_numpy(dtype=np.int64)
        s = g["s"].to_numpy(dtype=np.int64)
        # segment starts + sizes per part
        new = np.empty(len(p), dtype=bool)
        new[0] = True
        new[1:] = p[1:] != p[:-1]
        starts = np.flatnonzero(new)
        sizes = np.diff(np.append(starts, len(p)))
        out_a, out_b = [], []
        for size in np.unique(sizes):
            if size < 2:
                continue
            seg = starts[sizes == size]
            ti, tj = np.triu_indices(int(size), 1)
            # (n_segments, n_pairs) index matrices in one shot
            a = seg[:, None] + ti[None, :]
            b_ = seg[:, None] + tj[None, :]
            out_a.append(s[a.reshape(-1)])
            out_b.append(s[b_.reshape(-1)])
        if not out_a:
            return empty
        s1 = np.concatenate(out_a)
        s2 = np.concatenate(out_b)
        lo = np.minimum(s1, s2)
        hi = np.maximum(s1, s2)
        t = pd.DataFrame({"s1": lo, "s2": hi})
        cnt = t.groupby(["s1", "s2"], sort=False, as_index=False).size()
        return pd.DataFrame(
            {
                "s1": cnt["s1"].astype(np.int64),
                "s2": cnt["s2"].astype(np.int64),
                "n": cnt["size"].astype(np.int64),
            }
        )

    pairs = bucketed.groupby(_BUCKET).map_groups(
        per_bucket, batch_format="pandas"
    )

    def resum(b: pa.Table) -> pa.Table:
        # a PAIR recurs across part buckets, so level-1 pruning would be
        # lossy — combines only RE-SUM; the pair universe is bounded by
        # the supplier dimension squared
        g = b.group_by(["s1", "s2"]).aggregate([("n", "sum")])
        return g.select(["s1", "s2", "n_sum"]).rename_columns(
            ["s1", "s2", "n"]
        )

    def prune_top20(b: pa.Table) -> pa.Table:
        df = b.to_pandas()
        df["_negn"] = -df["n"]
        df = df.sort_values(["_negn", "s1", "s2"]).head(20)
        return pa.Table.from_pandas(
            df[["s1", "s2", "n"]], preserve_index=False
        )

    # tree_merge's default final_shards=1 leaves ONE fully-merged block,
    # so the top-20 prune maps over exactly the global pair table
    return tree_merge(pairs, resum).map_batches(
        prune_top20, batch_format="pyarrow", batch_size=None
    )


SHARED_PARTS_SQL = """
WITH sp AS (
  SELECT DISTINCT CAST(l_suppkey AS BIGINT) AS s,
                  CAST(l_partkey AS BIGINT) AS p
  FROM lineitem
  WHERE l_suppkey IS NOT NULL AND l_partkey IS NOT NULL
), pr AS (
  SELECT a.s AS s1, b.s AS s2, CAST(COUNT(*) AS BIGINT) AS n
  FROM sp a JOIN sp b ON a.p = b.p AND a.s < b.s
  GROUP BY 1, 2
)
SELECT s1, s2, n FROM pr
ORDER BY n DESC, s1, s2 LIMIT 20
"""


# ---------------------------------------------------------------------------
# log-log price elasticity per brand
# ---------------------------------------------------------------------------


def q_loglog_elasticity_by_brand(sf_dir):
    """Per-brand least-squares slope of ln(quantity) on ln(price cents)
    — the log-log demand-elasticity regression. Both engines snap each
    LN to x1e4 fixed point from the SAME exact integer inputs (cents =
    ROUND(price*100), qty int), so the sufficient statistics (n, Sx,
    Sy, Sxx, Sxy) are exact int64 and the slope is the one mirrored
    double expression. Part's brand broadcasts (J1)."""
    from mimirsbrunn_ray.pipelines.queries import BROADCAST_BYTE_BUDGET
    from mimirsbrunn_ray.stages.join import (
        broadcast_join,
        make_lookup_ref_arrays,
    )

    part = pq.read_table(
        f"{sf_dir}/part.parquet", columns=["p_partkey", "p_brand"]
    )
    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_quantity", "l_extendedprice"],
    )
    if part.nbytes > BROADCAST_BYTE_BUDGET:  # pragma: no cover - scale path
        raise NotImplementedError(
            "distributed-dim fallback: Dataset.join lineitem to part on "
            "partkey (orders_per_nation's else-branch shape)"
        )
    lookup = make_lookup_ref_arrays(
        part["p_partkey"].to_numpy(zero_copy_only=False),
        part["p_brand"].to_numpy(zero_copy_only=False),
    )
    joined = broadcast_join(
        li, lookup, key_col="l_partkey", out_col="p_brand",
        out_type=pa.string(),
    )

    def partial(b: pa.Table) -> pa.Table:
        b = _clean(b, ("p_brand", "l_quantity", "l_extendedprice"))
        cents = _round_half_away(
            b["l_extendedprice"].cast(pa.float64()).to_numpy(
                zero_copy_only=False
            )
            * 100.0
        )
        qty = _round_half_away(
            b["l_quantity"].cast(pa.float64()).to_numpy(zero_copy_only=False)
        )
        ok = (cents > 0) & (qty > 0)
        cents, qty = cents[ok], qty[ok]
        brand = b["p_brand"].to_numpy(zero_copy_only=False)[ok]
        x = _round_half_away(np.log(cents.astype(np.float64)) * 1e4)
        y = _round_half_away(np.log(qty.astype(np.float64)) * 1e4)
        t = pa.table(
            {
                "brand": pa.array(brand, pa.string()),
                "n": pa.array(np.ones(len(x), dtype=np.int64)),
                "sx": pa.array(x),
                "sy": pa.array(y),
                "sxx": pa.array(x * x),
                "sxy": pa.array(x * y),
            }
        )
        g = t.group_by(["brand"]).aggregate(
            [("n", "sum"), ("sx", "sum"), ("sy", "sum"),
             ("sxx", "sum"), ("sxy", "sum")]
        )
        g = g.select(
            ["brand", "n_sum", "sx_sum", "sy_sum", "sxx_sum", "sxy_sum"]
        )
        return g.rename_columns(["brand", "n", "sx", "sy", "sxx", "sxy"])

    def combine(b: pa.Table) -> pa.Table:
        g = b.group_by(["brand"]).aggregate(
            [("n", "sum"), ("sx", "sum"), ("sy", "sum"),
             ("sxx", "sum"), ("sxy", "sum")]
        )
        g = g.select(
            ["brand", "n_sum", "sx_sum", "sy_sum", "sxx_sum", "sxy_sum"]
        )
        return g.rename_columns(["brand", "n", "sx", "sy", "sxx", "sxy"])

    m = tree_merge(
        joined.map_batches(partial, batch_format="pyarrow", batch_size=None),
        combine,
    ).to_pandas()  # bounded: one row per brand

    if not len(m) or "brand" not in m.columns:
        return pa.table(
            {
                "brand": pa.array([], pa.string()),
                "n": pa.array([], pa.int64()),
                "slope_x1e6": pa.array([], pa.int64()),
            }
        )
    m = m.sort_values("brand", ignore_index=True)
    n = m["n"].to_numpy(dtype=np.int64)
    sx = m["sx"].to_numpy(dtype=np.int64)
    sy = m["sy"].to_numpy(dtype=np.int64)
    sxx = m["sxx"].to_numpy(dtype=np.int64)
    sxy = m["sxy"].to_numpy(dtype=np.int64)
    num = (n * sxy - sx * sy).astype(np.float64)
    den = (n * sxx - sx * sx).astype(np.float64)
    ok = den > 0
    slope = np.where(
        ok, _round_half_away(np.where(ok, num / np.where(ok, den, 1), 0.0) * 1e6), 0
    )
    vals = np.where(ok, slope, None)
    return pa.table(
        {
            "brand": pa.array(m["brand"], pa.string()),
            "n": pa.array(n),
            "slope_x1e6": pa.array(vals.tolist(), pa.int64()),
        }
    )


ELASTICITY_SQL = """
WITH v AS (
  SELECT p.p_brand AS brand,
         CAST(ROUND(LN(CAST(ROUND(l.l_extendedprice * 100, 0) AS BIGINT))
                    * 10000, 0) AS BIGINT) AS x,
         CAST(ROUND(LN(CAST(ROUND(l.l_quantity, 0) AS BIGINT))
                    * 10000, 0) AS BIGINT) AS y
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
  WHERE p.p_brand IS NOT NULL AND l.l_quantity IS NOT NULL
    AND l.l_extendedprice IS NOT NULL
    AND ROUND(l.l_extendedprice * 100, 0) > 0 AND ROUND(l.l_quantity, 0) > 0
), s AS (
  SELECT brand, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
         CAST(SUM(x * x) AS BIGINT) AS sxx,
         CAST(SUM(x * y) AS BIGINT) AS sxy
  FROM v GROUP BY 1
)
SELECT brand, n,
       CASE WHEN n * sxx - sx * sx > 0
            THEN CAST(ROUND(
              CAST(n * sxy - sx * sy AS DOUBLE)
              / CAST(n * sxx - sx * sx AS DOUBLE) * 1000000, 0) AS BIGINT)
            ELSE NULL END AS slope_x1e6
FROM s ORDER BY brand
"""


# ---------------------------------------------------------------------------
# cohort LTV curve
# ---------------------------------------------------------------------------


def q_cohort_ltv_curve(sf_dir):
    """Cohort lifetime-value curve: customers grouped by first-order
    month; per (cohort, months-since-first) the order count, exact
    cents, and the running cumulative cents — the LTV table growth
    teams plot. Two passes over orders: a combiner-first per-customer
    first-month tier (dimension-scale, broadcast back as an int->int
    lookup), then a fused age-bucketed partial aggregate; the cumsum
    runs over the bounded (cohorts x ages) tier."""
    from mimirsbrunn_ray.stages.join import (
        broadcast_join,
        make_lookup_ref_arrays,
    )

    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_orderdate", "o_totalprice"],
    )

    def fpartial(b: pa.Table) -> pa.Table:
        b = _clean(b, ("o_custkey", "o_orderdate"))
        d = b["o_orderdate"].to_pandas()
        mi = (d.dt.year * 12 + (d.dt.month - 1)).to_numpy(dtype=np.int64)
        t = pa.table(
            {
                "c": b["o_custkey"].cast(pa.int64()),
                "m0": pa.array(mi),
            }
        )
        g = t.group_by(["c"]).aggregate([("m0", "min")])
        return g.select(["c", "m0_min"]).rename_columns(["c", "m0"])

    def fcombine(b: pa.Table) -> pa.Table:
        g = b.group_by(["c"]).aggregate([("m0", "min")])
        return g.select(["c", "m0_min"]).rename_columns(["c", "m0"])

    first = tree_merge(
        orders.map_batches(fpartial, batch_format="pyarrow", batch_size=None),
        fcombine,
        final_shards=8,
        shard_cols=["c"],
    ).to_pandas()  # bounded: one row per customer (dimension-scale)

    if not len(first) or "c" not in first.columns:
        return pa.table(
            {
                "cohort_month": pa.array([], pa.timestamp("us")),
                "age_months": pa.array([], pa.int64()),
                "n_orders": pa.array([], pa.int64()),
                "cents": pa.array([], pa.int64()),
                "cum_cents": pa.array([], pa.int64()),
            }
        )
    lookup = make_lookup_ref_arrays(
        first["c"].to_numpy(dtype=np.int64),
        first["m0"].to_numpy(dtype=np.int64),
    )
    joined = broadcast_join(
        orders, lookup, key_col="o_custkey", out_col="m0",
        out_type=pa.int64(),
    )

    def apartial(b: pa.Table) -> pa.Table:
        b = _clean(b, ("o_custkey", "o_orderdate", "o_totalprice", "m0"))
        d = b["o_orderdate"].to_pandas()
        mi = (d.dt.year * 12 + (d.dt.month - 1)).to_numpy(dtype=np.int64)
        m0 = b["m0"].to_numpy(zero_copy_only=False)
        cents = _round_half_away(
            b["o_totalprice"].cast(pa.float64()).to_numpy(
                zero_copy_only=False
            )
            * 100.0
        )
        t = pa.table(
            {
                "m0": pa.array(m0.astype(np.int64)),
                "age_months": pa.array(mi - m0),
                "n_orders": pa.array(np.ones(len(mi), dtype=np.int64)),
                "cents": pa.array(cents),
            }
        )
        g = t.group_by(["m0", "age_months"]).aggregate(
            [("n_orders", "sum"), ("cents", "sum")]
        )
        g = g.select(["m0", "age_months", "n_orders_sum", "cents_sum"])
        return g.rename_columns(["m0", "age_months", "n_orders", "cents"])

    def acombine(b: pa.Table) -> pa.Table:
        g = b.group_by(["m0", "age_months"]).aggregate(
            [("n_orders", "sum"), ("cents", "sum")]
        )
        g = g.select(["m0", "age_months", "n_orders_sum", "cents_sum"])
        return g.rename_columns(["m0", "age_months", "n_orders", "cents"])

    tier = tree_merge(
        joined.map_batches(apartial, batch_format="pyarrow", batch_size=None),
        acombine,
    ).to_pandas()  # bounded: cohorts x ages

    tier = tier.sort_values(["m0", "age_months"], ignore_index=True)
    tier["cum_cents"] = (
        tier.groupby("m0", sort=False)["cents"].cumsum().astype(np.int64)
    )
    m0 = tier["m0"].to_numpy(dtype=np.int64)
    # m0 = year*12 + (month-1); rebuild the month timestamp
    cohort = (
        np.array((m0 // 12) - 1970, dtype="timedelta64[Y]").astype(
            "timedelta64[M]"
        )
        + np.array(m0 % 12, dtype="timedelta64[M]")
        + np.datetime64("1970-01-01", "M")
    ).astype("datetime64[us]")
    return pa.table(
        {
            "cohort_month": pa.array(cohort, pa.timestamp("us")),
            "age_months": pa.array(
                tier["age_months"].to_numpy(dtype=np.int64)
            ),
            "n_orders": pa.array(tier["n_orders"].to_numpy(dtype=np.int64)),
            "cents": pa.array(tier["cents"].to_numpy(dtype=np.int64)),
            "cum_cents": pa.array(
                tier["cum_cents"].to_numpy(dtype=np.int64)
            ),
        }
    )


COHORT_LTV_SQL = """
WITH f AS (
  SELECT o_custkey AS c, MIN(date_trunc('month', o_orderdate)) AS m0
  FROM orders
  WHERE o_custkey IS NOT NULL AND o_orderdate IS NOT NULL
  GROUP BY 1
), o AS (
  SELECT o.o_custkey AS c, date_trunc('month', o.o_orderdate) AS m,
         CAST(ROUND(o.o_totalprice * 100, 0) AS BIGINT) AS cents
  FROM orders o
  WHERE o.o_custkey IS NOT NULL AND o.o_orderdate IS NOT NULL
    AND o.o_totalprice IS NOT NULL
), j AS (
  SELECT f.m0,
         (YEAR(o.m) * 12 + MONTH(o.m))
           - (YEAR(f.m0) * 12 + MONTH(f.m0)) AS age,
         o.cents
  FROM o JOIN f ON o.c = f.c
), g AS (
  SELECT m0 AS cohort_month, CAST(age AS BIGINT) AS age_months,
         CAST(COUNT(*) AS BIGINT) AS n_orders,
         CAST(SUM(cents) AS BIGINT) AS cents
  FROM j GROUP BY 1, 2
)
SELECT cohort_month, age_months, n_orders, cents,
       CAST(SUM(cents) OVER (PARTITION BY cohort_month ORDER BY age_months)
            AS BIGINT) AS cum_cents
FROM g
"""


def register_r4ce(queries: dict, oracles: dict) -> None:
    queries.update(
        {
            "supplier_shared_part_pairs": q_supplier_shared_part_pairs,
            "loglog_elasticity_by_brand": q_loglog_elasticity_by_brand,
            "cohort_ltv_curve": q_cohort_ltv_curve,
        }
    )
    oracles.update(
        {
            "supplier_shared_part_pairs": SHARED_PARTS_SQL,
            "loglog_elasticity_by_brand": ELASTICITY_SQL,
            "cohort_ltv_curve": COHORT_LTV_SQL,
        }
    )
