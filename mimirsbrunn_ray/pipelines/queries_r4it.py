"""Round-4 batch IT: seasonal spikes, the loyal core, and
one-price integrity — the year-end spike audit (December's order
and revenue rate against the other eleven months — is there a
holiday business hiding in the aggregate?), the full-tenure
customer census (customers active in EVERY observed year and the
revenue share that loyal core carries), and the part unit-price
dispersion (does the same part sell at one unit price or many —
the one-price-rule audit).

Exactness discipline: month partitioned counts and cents fold
exactly; the every-year test is an exact distinct-count
equality; unit prices snap per line with the identical
cents·10/qty double expression on both sides."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from mimirsbrunn_ray.pipelines.queries_r4fk import (
    _round_half_away,
)
from mimirsbrunn_ray.stages.rollup import tree_merge


def _valid(b: pa.Table, cols) -> pa.Table:
    m = None
    for c in cols:
        v = pc.is_valid(b[c])
        m = v if m is None else pc.and_(m, v)
    return b.filter(m)


_YES_COLS = ["n_dec_orders", "n_other_orders",
             "order_rate_ratio_x1e3", "revenue_rate_ratio_x1e3"]


def q_year_end_spike_audit(sf_dir):
    """Is there a holiday business hiding in the aggregate?
    December's per-month order and revenue rate against the mean
    of the other eleven months (each scaled by how many times
    that calendar month occurs in the data) — a ratio over 1000
    (x1e3) means Q4 capacity planning is its own problem.
    Month-cell counts and cents fold exactly."""
    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderdate", "o_totalprice"])

    def part(b: pa.Table) -> pa.Table:
        b = _valid(b, ("o_orderdate", "o_totalprice"))
        if b.num_rows == 0:
            return pa.table({
                "yr": pa.array([], pa.int64()),
                "mo": pa.array([], pa.int64()),
                "n": pa.array([], pa.int64()),
                "cents": pa.array([], pa.int64()),
            })
        d = b["o_orderdate"].cast(pa.timestamp("us")).to_pandas()
        yr = d.dt.year.to_numpy(np.int64)
        mo = d.dt.month.to_numpy(np.int64)
        tp = b["o_totalprice"].cast(pa.float64()).to_numpy(
            zero_copy_only=False)
        cents = np.where(tp >= 0, np.floor(tp * 100 + 0.5),
                         np.ceil(tp * 100 - 0.5)).astype(
            np.int64)
        df = pd.DataFrame({"yr": yr, "mo": mo, "n": 1,
                           "cents": cents})
        agg = df.groupby(["yr", "mo"]).sum().reset_index()
        for c in ["yr", "mo", "n", "cents"]:
            agg[c] = agg[c].astype(np.int64)
        return pa.Table.from_pandas(agg, preserve_index=False)

    def comb(b: pa.Table) -> pa.Table:
        g = b.group_by(["yr", "mo"]).aggregate(
            [("n", "sum"), ("cents", "sum")])
        return g.rename_columns(["yr", "mo", "n", "cents"])

    cc = tree_merge(
        orders.map_batches(part, batch_format="pyarrow",
                           batch_size=None), comb).to_pandas()
    if "yr" not in cc.columns or len(cc) == 0:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _YES_COLS})
    dec = cc[cc["mo"] == 12]
    oth = cc[cc["mo"] != 12]
    if len(dec) == 0 or len(oth) == 0:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _YES_COLS})
    n_dec_cells = len(dec)
    n_oth_cells = len(oth)
    dec_n = int(dec["n"].sum())
    oth_n = int(oth["n"].sum())
    dec_c = int(dec["cents"].sum())
    oth_c = int(oth["cents"].sum())
    if oth_n == 0 or oth_c == 0:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _YES_COLS})
    rate_ratio = ((dec_n / n_dec_cells)
                  / (oth_n / n_oth_cells))
    rev_ratio = ((dec_c / n_dec_cells)
                 / (oth_c / n_oth_cells))
    return pa.table({
        "n_dec_orders": pa.array([dec_n], pa.int64()),
        "n_other_orders": pa.array([oth_n], pa.int64()),
        "order_rate_ratio_x1e3": pa.array(
            [_round_half_away(rate_ratio * 1e3)], pa.int64()),
        "revenue_rate_ratio_x1e3": pa.array(
            [_round_half_away(rev_ratio * 1e3)], pa.int64()),
    })


YES_SQL = """
WITH mc AS MATERIALIZED (
  SELECT YEAR(o_orderdate) AS yr, MONTH(o_orderdate) AS mo,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT))
              AS BIGINT) AS cents
  FROM orders
  WHERE o_orderdate IS NOT NULL AND o_totalprice IS NOT NULL
  GROUP BY 1, 2
), agg AS MATERIALIZED (
  SELECT
    CAST(SUM(CASE WHEN mo = 12 THEN n ELSE 0 END) AS BIGINT)
      AS dec_n,
    CAST(SUM(CASE WHEN mo <> 12 THEN n ELSE 0 END) AS BIGINT)
      AS oth_n,
    CAST(SUM(CASE WHEN mo = 12 THEN cents ELSE 0 END)
         AS BIGINT) AS dec_c,
    CAST(SUM(CASE WHEN mo <> 12 THEN cents ELSE 0 END)
         AS BIGINT) AS oth_c,
    CAST(SUM(CASE WHEN mo = 12 THEN 1 ELSE 0 END) AS BIGINT)
      AS dec_cells,
    CAST(SUM(CASE WHEN mo <> 12 THEN 1 ELSE 0 END) AS BIGINT)
      AS oth_cells
  FROM mc
)
SELECT dec_n AS n_dec_orders, oth_n AS n_other_orders,
       CAST(ROUND((CAST(dec_n AS DOUBLE) / dec_cells)
            / (CAST(oth_n AS DOUBLE) / oth_cells) * 1000, 0)
            AS BIGINT) AS order_rate_ratio_x1e3,
       CAST(ROUND((CAST(dec_c AS DOUBLE) / dec_cells)
            / (CAST(oth_c AS DOUBLE) / oth_cells) * 1000, 0)
            AS BIGINT) AS revenue_rate_ratio_x1e3
FROM agg
WHERE dec_cells > 0 AND oth_cells > 0 AND oth_n > 0
  AND oth_c > 0
"""

_FTC_COLS = ["n_customers", "n_full_tenure",
             "full_tenure_ppm", "revenue_share_ppm",
             "n_years"]


def q_full_tenure_customers(sf_dir):
    """The loyal core: customers with at least one order in
    EVERY observed calendar year, and the share of ALL revenue
    they carry — the cohort whose churn would actually move the
    P&L.  Distinct (customer, year) pairs and per-customer cents
    fold exactly."""
    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_orderdate", "o_totalprice"])

    def part(b: pa.Table) -> pa.Table:
        b = _valid(b, ("o_custkey", "o_orderdate",
                       "o_totalprice"))
        if b.num_rows == 0:
            return pa.table({
                "ck": pa.array([], pa.int64()),
                "yr": pa.array([], pa.int64()),
                "cents": pa.array([], pa.int64()),
            })
        d = b["o_orderdate"].cast(pa.timestamp("us")).to_pandas()
        yr = d.dt.year.to_numpy(np.int64)
        tp = b["o_totalprice"].cast(pa.float64()).to_numpy(
            zero_copy_only=False)
        cents = np.where(tp >= 0, np.floor(tp * 100 + 0.5),
                         np.ceil(tp * 100 - 0.5)).astype(
            np.int64)
        df = pd.DataFrame({
            "ck": b["o_custkey"].cast(pa.int64()).to_numpy(
                zero_copy_only=False),
            "yr": yr, "cents": cents,
        })
        agg = df.groupby(["ck", "yr"])["cents"].sum(
        ).reset_index()
        for c in ["ck", "yr", "cents"]:
            agg[c] = agg[c].astype(np.int64)
        return pa.Table.from_pandas(agg, preserve_index=False)

    def comb(b: pa.Table) -> pa.Table:
        g = b.group_by(["ck", "yr"]).aggregate(
            [("cents", "sum")])
        return g.rename_columns(["ck", "yr", "cents"])

    cy = tree_merge(
        orders.map_batches(part, batch_format="pyarrow",
                           batch_size=None),
        comb,
        final_shards=8,
        shard_cols=["ck"],
    ).to_pandas()
    if "ck" not in cy.columns or len(cy) == 0:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _FTC_COLS})
    n_years = int(cy["yr"].nunique())
    per = cy.groupby("ck").agg(
        years=("yr", "nunique"),
        cents=("cents", "sum")).reset_index()
    n_cust = len(per)
    full = per[per["years"] == n_years]
    tot = int(per["cents"].sum())
    if tot == 0:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _FTC_COLS})
    return pa.table({
        "n_customers": pa.array([n_cust], pa.int64()),
        "n_full_tenure": pa.array([len(full)], pa.int64()),
        "full_tenure_ppm": pa.array(
            [_round_half_away(len(full) / n_cust * 1e6)],
            pa.int64()),
        "revenue_share_ppm": pa.array(
            [_round_half_away(
                int(full["cents"].sum()) / tot * 1e6)],
            pa.int64()),
        "n_years": pa.array([n_years], pa.int64()),
    })


FTC_SQL = """
WITH cy AS MATERIALIZED (
  SELECT o_custkey AS ck, YEAR(o_orderdate) AS yr,
         CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT))
              AS BIGINT) AS cents
  FROM orders
  WHERE o_custkey IS NOT NULL AND o_orderdate IS NOT NULL
    AND o_totalprice IS NOT NULL
  GROUP BY 1, 2
), ny AS MATERIALIZED (
  SELECT CAST(COUNT(DISTINCT yr) AS BIGINT) AS n FROM cy
), per AS MATERIALIZED (
  SELECT ck, CAST(COUNT(DISTINCT yr) AS BIGINT) AS years,
         CAST(SUM(cents) AS BIGINT) AS cents
  FROM cy GROUP BY 1
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_customers,
       CAST(SUM(CASE WHEN years = ny.n THEN 1 ELSE 0 END)
            AS BIGINT) AS n_full_tenure,
       CAST(ROUND(CAST(SUM(CASE WHEN years = ny.n THEN 1
                                ELSE 0 END) AS DOUBLE)
            / COUNT(*) * 1000000, 0) AS BIGINT)
         AS full_tenure_ppm,
       CAST(ROUND(CAST(SUM(CASE WHEN years = ny.n THEN cents
                                ELSE 0 END) AS DOUBLE)
            / SUM(cents) * 1000000, 0) AS BIGINT)
         AS revenue_share_ppm,
       CAST(ANY_VALUE(ny.n) AS BIGINT) AS n_years
FROM per CROSS JOIN ny
GROUP BY ny.n
HAVING SUM(cents) > 0
"""

_PUD_COLS = ["n_parts_multi", "one_price_ppm",
             "mean_range_mills_x1e3", "max_range_mills"]


def q_part_unit_price_dispersion(sf_dir):
    """The one-price-rule audit: among parts with 2+ lines, how
    many sell at a single unit price (per-line unit mills =
    round(cents·10 / qty), the identical double expression on
    both sides), the mean max-minus-min spread, and the widest.
    Per-part (min, max, n) fold exactly after the per-line
    snap."""
    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_extendedprice", "l_quantity"])

    def part(b: pa.Table) -> pa.Table:
        b = _valid(b, ("l_partkey", "l_extendedprice",
                       "l_quantity"))
        if b.num_rows == 0:
            return pa.table({
                "pk": pa.array([], pa.int64()),
                "mn": pa.array([], pa.int64()),
                "mx": pa.array([], pa.int64()),
                "n": pa.array([], pa.int64()),
            })
        ep = b["l_extendedprice"].cast(pa.float64()).to_numpy(
            zero_copy_only=False)
        cents = np.where(ep >= 0, np.floor(ep * 100 + 0.5),
                         np.ceil(ep * 100 - 0.5)).astype(
            np.int64)
        qf = b["l_quantity"].cast(pa.float64()).to_numpy(
            zero_copy_only=False)
        q = np.where(qf >= 0, np.floor(qf + 0.5),
                     np.ceil(qf - 0.5)).astype(np.int64)
        keep = q > 0
        cents, q = cents[keep], q[keep]
        pk = b["l_partkey"].cast(pa.int64()).to_numpy(
            zero_copy_only=False)[keep]
        um = cents.astype(np.float64) * 10.0 / q
        unit = np.where(um >= 0, np.floor(um + 0.5),
                        np.ceil(um - 0.5)).astype(np.int64)
        t = pa.table({
            "pk": pa.array(pk),
            "mn": pa.array(unit),
            "mx": pa.array(unit),
            "n": pa.array(np.ones(len(unit), np.int64)),
        })
        g = t.group_by(["pk"]).aggregate(
            [("mn", "min"), ("mx", "max"), ("n", "sum")])
        return g.rename_columns(["pk", "mn", "mx", "n"])

    def comb(b: pa.Table) -> pa.Table:
        g = b.group_by(["pk"]).aggregate(
            [("mn", "min"), ("mx", "max"), ("n", "sum")])
        return g.rename_columns(["pk", "mn", "mx", "n"])

    per = tree_merge(
        li.map_batches(part, batch_format="pyarrow",
                       batch_size=None),
        comb,
        final_shards=8,
        shard_cols=["pk"],
    ).to_pandas()
    if "pk" not in per.columns or len(per) == 0:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _PUD_COLS})
    multi = per[per["n"] >= 2]
    if len(multi) == 0:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _PUD_COLS})
    rng = (multi["mx"] - multi["mn"]).to_numpy(np.int64)
    n = len(multi)
    return pa.table({
        "n_parts_multi": pa.array([n], pa.int64()),
        "one_price_ppm": pa.array(
            [_round_half_away(int((rng == 0).sum()) / n * 1e6)],
            pa.int64()),
        "mean_range_mills_x1e3": pa.array(
            [_round_half_away(int(rng.sum()) / n * 1e3)],
            pa.int64()),
        "max_range_mills": pa.array(
            [int(rng.max())], pa.int64()),
    })


PUD_SQL = """
WITH ul AS MATERIALIZED (
  SELECT l_partkey AS pk,
         CAST(ROUND(CAST(ROUND(l_extendedprice * 100, 0)
                         AS BIGINT) * 10.0
                    / CAST(ROUND(l_quantity, 0) AS BIGINT), 0)
              AS BIGINT) AS unit
  FROM lineitem
  WHERE l_partkey IS NOT NULL AND l_extendedprice IS NOT NULL
    AND l_quantity IS NOT NULL
    AND CAST(ROUND(l_quantity, 0) AS BIGINT) > 0
), per AS MATERIALIZED (
  SELECT pk, CAST(MIN(unit) AS BIGINT) AS mn,
         CAST(MAX(unit) AS BIGINT) AS mx,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM ul GROUP BY 1
), multi AS MATERIALIZED (
  SELECT mx - mn AS rng FROM per WHERE n >= 2
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_parts_multi,
       CAST(ROUND(CAST(SUM(CASE WHEN rng = 0 THEN 1 ELSE 0
                           END) AS DOUBLE) / COUNT(*)
            * 1000000, 0) AS BIGINT) AS one_price_ppm,
       CAST(ROUND(CAST(SUM(rng) AS DOUBLE) / COUNT(*)
            * 1000, 0) AS BIGINT) AS mean_range_mills_x1e3,
       CAST(MAX(rng) AS BIGINT) AS max_range_mills
FROM multi HAVING COUNT(*) > 0
"""


def register_r4it(queries: dict, oracles: dict) -> None:
    queries.update(
        {
            "year_end_spike_audit": q_year_end_spike_audit,
            "full_tenure_customers": q_full_tenure_customers,
            "part_unit_price_dispersion":
                q_part_unit_price_dispersion,
        }
    )
    oracles.update(
        {
            "year_end_spike_audit": YES_SQL,
            "full_tenure_customers": FTC_SQL,
            "part_unit_price_dispersion": PUD_SQL,
        }
    )
