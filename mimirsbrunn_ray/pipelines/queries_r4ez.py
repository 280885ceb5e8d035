"""Round-4 batch EZ: TPC-H parity, part 3 — Q8 (nation market share
per year), a Q16 analog (distinct suppliers per brand x size, the
partsupp-free variant this corpus supports), and an order fill-rate
SLA (share of orders whose LAST line ships within 30 days — the
all-lines-shipped predicate, a per-order MAX folded through the
orderkey join rather than a latency quantile).

Exactness discipline: revenue terms on the x1e4 integer grid
(price_cents * (100 - disc_pct)); market share and SLA rates snap
ppm once from exact int64 sums; the Q16 distinct-supplier census
dedups (brand, size, suppkey) triples through a key-disjoint
sharded combine before counting."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as _pq
import ray.data as rd
from mimirsbrunn_ray.stages.broadcast import safe_join as _safe_join

from mimirsbrunn_ray.context import pool_size
from mimirsbrunn_ray.stages.rollup import tree_merge

_Q8_REGION = "ASIA"
_Q8_NATION = "CHINA"
_Q8_PTYPE = "ECONOMY"
_SLA_US = 30 * 86_400_000_000


def _round_half_away(x: float) -> int:
    return int(np.floor(x + 0.5) if x >= 0 else np.ceil(x - 0.5))


def _rev_e4(b: pa.Table) -> np.ndarray:
    cents = np.floor(
        b["l_extendedprice"].to_numpy(zero_copy_only=False) * 100.0
        + 0.5
    ).astype(np.int64)
    dpct = np.floor(
        b["l_discount"].to_numpy(zero_copy_only=False) * 100.0 + 0.5
    ).astype(np.int64)
    return cents * (100 - dpct)


def _sorted_lookup(keys: np.ndarray, vals: np.ndarray):
    order = np.argsort(keys, kind="stable")
    return keys[order], vals[order]


def _probe(lk: np.ndarray, lv: np.ndarray, keys: np.ndarray):
    if len(lk) == 0:
        return np.zeros(len(keys), np.int64), np.zeros(len(keys),
                                                       bool)
    idx = np.clip(np.searchsorted(lk, keys), 0, len(lk) - 1)
    hit = lk[idx] == keys
    return lv[idx], hit


def q_tpch_q8_market_share(sf_dir):
    """TPC-H Q8: CHINA suppliers' share of ASIA-customer ECONOMY-part
    revenue per order year. Lineitem streams once: the ECONOMY
    partkey set and the supplier->nation map broadcast as sorted
    arrays (dim-scale, the q5 discipline), per-(orderkey, is-china)
    integer revenue partials pre-aggregate BEFORE the only big-big
    exchange — the orderkey join against ASIA-customer orders (the
    customer filter itself is a distributed join, no customer
    broadcast) — and the per-year share folds from int64 sums."""
    n_part = max(8, pool_size())

    _q8_empty = pa.table({
        "yr": pa.array([], pa.int64()),
        "china_e4": pa.array([], pa.int64()),
        "total_e4": pa.array([], pa.int64()),
        "share_ppm": pa.array([], pa.int64()),
    })
    region = _pq.read_table(f"{sf_dir}/region.parquet")
    nation = _pq.read_table(f"{sf_dir}/nation.parquet")
    _rk = region.filter(
        pc.equal(region["r_name"], _Q8_REGION))["r_regionkey"]
    if len(_rk) == 0:  # empty-corpus guard
        return _q8_empty
    rkey = _rk[0]
    nat_keys = nation.filter(
        pc.equal(nation["n_regionkey"], rkey)
    )["n_nationkey"].to_numpy().astype(np.int64)
    china = nation.filter(pc.equal(nation["n_name"], _Q8_NATION))
    china_nk = (
        int(china["n_nationkey"][0].as_py())
        if china.num_rows else -1
    )

    from mimirsbrunn_ray.stages.broadcast import dim_fits

    if not dim_fits(sf_dir, "part"):  # pragma: no cover - scale path
        raise NotImplementedError(
            "distributed-dim fallback: attach_dim on the part key "
            "(stages/broadcast.py)")
    part = _pq.read_table(
        f"{sf_dir}/part.parquet", columns=["p_partkey", "p_type"]
    )
    pkeys = np.sort(
        part.filter(pc.equal(part["p_type"], _Q8_PTYPE))
        ["p_partkey"].to_numpy()
    ).astype(np.int64)

    if not dim_fits(sf_dir, "supplier"):  # pragma: no cover - scale path
        raise NotImplementedError(
            "distributed-dim fallback: attach_dim on the supplier key "
            "(stages/broadcast.py)")
    supp = _pq.read_table(
        f"{sf_dir}/supplier.parquet",
        columns=["s_suppkey", "s_nationkey"],
    )
    sk, sn = _sorted_lookup(
        supp["s_suppkey"].to_numpy().astype(np.int64),
        supp["s_nationkey"].to_numpy().astype(np.int64),
    )

    def li_partial(b: pa.Table) -> pa.Table:
        key = b["l_partkey"].to_numpy(zero_copy_only=False)
        if len(pkeys):
            idx = np.clip(np.searchsorted(pkeys, key), 0,
                          len(pkeys) - 1)
            keep = pkeys[idx] == key
        else:
            keep = np.zeros(len(key), bool)
        b = b.filter(pa.array(keep))
        s_nat, hit = _probe(
            sk, sn,
            b["l_suppkey"].to_numpy(zero_copy_only=False).astype(
                np.int64
            ),
        )
        b = b.filter(pa.array(hit))
        is_china = (s_nat[hit] == china_nk).astype(np.int64)
        t = pa.table(
            {
                "l_orderkey": b["l_orderkey"],
                "china_e4": pa.array(_rev_e4(b) * is_china),
                "total_e4": pa.array(_rev_e4(b)),
            }
        )
        g = t.group_by(["l_orderkey"]).aggregate(
            [("china_e4", "sum"), ("total_e4", "sum")]
        )
        return g.rename_columns(["l_orderkey", "china_e4",
                                 "total_e4"])

    li = (
        rd.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_orderkey", "l_partkey", "l_suppkey",
                     "l_extendedprice", "l_discount"],
        )
        .map_batches(li_partial, batch_format="pyarrow",
                     batch_size=None)
        .repartition(n_part)
    )

    nat_set = pa.array(nat_keys)

    def cust_project(b: pa.Table) -> pa.Table:
        keep = pc.is_in(b["c_nationkey"].cast(pa.int64()),
                        value_set=nat_set)
        return pa.table({"c_custkey": b["c_custkey"].filter(keep)})

    cust = (
        rd.read_parquet(
            f"{sf_dir}/customer.parquet",
            columns=["c_custkey", "c_nationkey"],
        )
        .map_batches(cust_project, batch_format="pyarrow",
                     batch_size=None)
        .repartition(n_part)
    )

    def ord_project(b: pa.Table) -> pa.Table:
        yr = pc.year(b["o_orderdate"].cast(pa.timestamp("us")))
        return pa.table(
            {
                "o_orderkey": b["o_orderkey"],
                "o_custkey": b["o_custkey"],
                "yr": yr.cast(pa.int64()),
            }
        )

    orders = (
        rd.read_parquet(
            f"{sf_dir}/orders.parquet",
            columns=["o_orderkey", "o_custkey", "o_orderdate"],
        )
        .map_batches(ord_project, batch_format="pyarrow",
                     batch_size=None)
        .repartition(n_part)
        .join(
            cust,
            join_type="inner",
            num_partitions=n_part,
            on=("o_custkey",),
            right_on=("c_custkey",),
        )
        .repartition(n_part)
    )

    joined = _safe_join(
        li, orders,
        on=("l_orderkey",),
        right_on=("o_orderkey",),
        join_type="inner",
        num_partitions=n_part,
    )

    def yr_partial(b: pa.Table) -> pa.Table:
        g = b.group_by(["yr"]).aggregate(
            [("china_e4", "sum"), ("total_e4", "sum")]
        )
        return g.rename_columns(["yr", "china_e4", "total_e4"])

    out = tree_merge(
        joined.map_batches(yr_partial, batch_format="pyarrow",
                           batch_size=None),
        yr_partial,
    ).to_pandas()
    if "yr" not in out.columns:  # empty-corpus schema loss
        return _q8_empty
    out = out.sort_values("yr", ignore_index=True)
    share = np.array(
        [
            _round_half_away(float(c) / float(t) * 1e6) if t else 0
            for c, t in zip(out["china_e4"], out["total_e4"])
        ],
        np.int64,
    )
    return pa.table(
        {
            "yr": pa.array(out["yr"].to_numpy(dtype=np.int64)),
            "china_e4": pa.array(
                out["china_e4"].to_numpy(dtype=np.int64)
            ),
            "total_e4": pa.array(
                out["total_e4"].to_numpy(dtype=np.int64)
            ),
            "share_ppm": pa.array(share),
        }
    )


TPCH_Q8_SQL = f"""
WITH rev AS MATERIALIZED (
  SELECT CAST(YEAR(o_orderdate) AS BIGINT) AS yr,
         CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)
           * (100 - CAST(ROUND(l_discount * 100, 0) AS BIGINT))
           AS rev_e4,
         CASE WHEN n2.n_name = '{_Q8_NATION}' THEN 1 ELSE 0 END
           AS is_china
  FROM lineitem
  JOIN part ON l_partkey = p_partkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation n2 ON s_nationkey = n2.n_nationkey
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation n1 ON c_nationkey = n1.n_nationkey
  JOIN region ON n1.n_regionkey = r_regionkey
  WHERE r_name = '{_Q8_REGION}' AND p_type = '{_Q8_PTYPE}'
)
SELECT yr,
       CAST(SUM(CASE WHEN is_china = 1 THEN rev_e4 ELSE 0 END)
            AS BIGINT) AS china_e4,
       CAST(SUM(rev_e4) AS BIGINT) AS total_e4,
       CAST(ROUND(CAST(SUM(CASE WHEN is_china = 1 THEN rev_e4
                          ELSE 0 END) AS DOUBLE)
            / CAST(SUM(rev_e4) AS DOUBLE) * 1000000, 0) AS BIGINT)
         AS share_ppm
FROM rev GROUP BY yr ORDER BY yr
"""


def q_tpch_q16_brand_size_suppliers(sf_dir):
    """Q16 analog (no partsupp in this corpus): distinct suppliers
    that shipped each (brand, size) — the assortment-breadth census.
    (brand, size, suppkey) triples dedup per batch, fold through a
    key-disjoint sharded combine, then count per (brand, size)."""
    from mimirsbrunn_ray.stages.broadcast import dim_fits

    if not dim_fits(sf_dir, "part"):  # pragma: no cover - scale path
        raise NotImplementedError(
            "distributed-dim fallback: attach_dim on the part key "
            "(stages/broadcast.py)")
    part = _pq.read_table(
        f"{sf_dir}/part.parquet",
        columns=["p_partkey", "p_brand", "p_size"],
    )
    pk, idx_v = _sorted_lookup(
        part["p_partkey"].to_numpy().astype(np.int64),
        np.arange(part.num_rows, dtype=np.int64),
    )
    brands = part["p_brand"].to_numpy(zero_copy_only=False)
    sizes = part["p_size"].to_numpy(zero_copy_only=False).astype(
        np.int64
    )

    def partial(b: pa.Table) -> pa.Table:
        key = b["l_partkey"].to_numpy(zero_copy_only=False)
        row, hit = _probe(pk, idx_v, key.astype(np.int64))
        sup = b["l_suppkey"].to_numpy(zero_copy_only=False)[hit]
        row = row[hit]
        t = pa.table(
            {
                "p_brand": pa.array(brands[row], pa.string()),
                "p_size": pa.array(sizes[row]),
                "s": pa.array(sup.astype(np.int64)),
            }
        )
        g = t.group_by(["p_brand", "p_size", "s"]).aggregate(
            [([], "count_all")]
        )
        return g.select(["p_brand", "p_size", "s"])

    def dedup(b: pa.Table) -> pa.Table:
        g = b.group_by(["p_brand", "p_size", "s"]).aggregate(
            [([], "count_all")]
        )
        return g.select(["p_brand", "p_size", "s"])

    triples = tree_merge(
        rd.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_partkey", "l_suppkey"],
        ).map_batches(partial, batch_format="pyarrow",
                      batch_size=None),
        dedup,
        final_shards=8,
        shard_cols=["p_brand", "p_size", "s"],
    )

    def count_partial(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "p_brand" not in b.column_names:
            return pa.table(
                {"p_brand": pa.array([], pa.string()),
                 "p_size": pa.array([], pa.int64()),
                 "supplier_cnt": pa.array([], pa.int64())}
            )
        g = b.group_by(["p_brand", "p_size"]).aggregate(
            [([], "count_all")]
        )
        return g.select(
            ["p_brand", "p_size", "count_all"]
        ).rename_columns(["p_brand", "p_size", "supplier_cnt"])

    def count_comb(b: pa.Table) -> pa.Table:
        g = b.group_by(["p_brand", "p_size"]).aggregate(
            [("supplier_cnt", "sum")]
        )
        return g.rename_columns(["p_brand", "p_size",
                                 "supplier_cnt"])

    out = tree_merge(
        triples.map_batches(count_partial, batch_format="pyarrow",
                            batch_size=None),
        count_comb,
    ).to_pandas()
    if "supplier_cnt" not in out.columns:  # empty-corpus schema loss
        return pa.table({"p_brand": pa.array([], pa.string()),
                         "p_size": pa.array([], pa.int64()),
                         "supplier_cnt": pa.array([], pa.int64())})
    out = out.sort_values(
        ["supplier_cnt", "p_brand", "p_size"],
        ascending=[False, True, True], ignore_index=True,
    )
    return pa.table(
        {
            "p_brand": pa.array(out["p_brand"], pa.string()),
            "p_size": pa.array(
                out["p_size"].to_numpy(dtype=np.int64)
            ),
            "supplier_cnt": pa.array(
                out["supplier_cnt"].to_numpy(dtype=np.int64)
            ),
        }
    )


TPCH_Q16_SQL = """
SELECT p_brand, CAST(p_size AS BIGINT) AS p_size,
       CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY p_brand, p_size
ORDER BY supplier_cnt DESC, p_brand, p_size
"""


def q_order_fill_rate_sla(sf_dir):
    """Per order month: the share of orders FULLY shipped within 30
    days of ordering — per-order MAX(shipdate) folds combiner-first
    through a key-disjoint sharded combine, joins the orders table
    on the one big-big orderkey exchange, and the met/total counts
    fold per month."""
    n_part = max(8, pool_size())

    def li_partial(b: pa.Table) -> pa.Table:
        us = b["l_shipdate"].cast(pa.timestamp("us")).cast(pa.int64())
        t = pa.table(
            {"l_orderkey": b["l_orderkey"], "mx": us}
        )
        g = t.group_by(["l_orderkey"]).aggregate([("mx", "max")])
        return g.rename_columns(["l_orderkey", "mx"])

    def li_comb(b: pa.Table) -> pa.Table:
        g = b.group_by(["l_orderkey"]).aggregate([("mx", "max")])
        return g.rename_columns(["l_orderkey", "mx"])

    last_ship = tree_merge(
        rd.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_orderkey", "l_shipdate"],
        ).map_batches(li_partial, batch_format="pyarrow",
                      batch_size=None),
        li_comb,
        final_shards=8,
        shard_cols=["l_orderkey"],
    ).repartition(n_part)

    def ord_project(b: pa.Table) -> pa.Table:
        us = b["o_orderdate"].cast(pa.timestamp("us")).cast(
            pa.int64()
        )
        month = pc.strftime(
            b["o_orderdate"].cast(pa.timestamp("us")), format="%Y-%m"
        )
        return pa.table(
            {
                "o_orderkey": b["o_orderkey"],
                "month": month,
                "ous": us,
            }
        )

    orders = (
        rd.read_parquet(
            f"{sf_dir}/orders.parquet",
            columns=["o_orderkey", "o_orderdate"],
        )
        .map_batches(ord_project, batch_format="pyarrow",
                     batch_size=None)
        .repartition(n_part)
    )

    joined = _safe_join(
        orders, last_ship,
        on=("o_orderkey",),
        right_on=("l_orderkey",),
        join_type="inner",
        num_partitions=n_part,
    )

    def month_partial(b: pa.Table) -> pa.Table:
        ous = b["ous"].to_numpy(zero_copy_only=False)
        mx = b["mx"].to_numpy(zero_copy_only=False)
        met = (mx <= ous + _SLA_US).astype(np.int64)
        t = pa.table(
            {
                "month": b["month"],
                "n_orders": pa.array(np.ones(len(met), np.int64)),
                "n_met": pa.array(met),
            }
        )
        g = t.group_by(["month"]).aggregate(
            [("n_orders", "sum"), ("n_met", "sum")]
        )
        return g.rename_columns(["month", "n_orders", "n_met"])

    def month_comb(b: pa.Table) -> pa.Table:
        g = b.group_by(["month"]).aggregate(
            [("n_orders", "sum"), ("n_met", "sum")]
        )
        return g.rename_columns(["month", "n_orders", "n_met"])

    out = tree_merge(
        joined.map_batches(month_partial, batch_format="pyarrow",
                           batch_size=None),
        month_comb,
    ).to_pandas()
    if "month" not in out.columns:  # empty-corpus schema loss
        return pa.table({
            "month": pa.array([], pa.string()),
            "n_orders": pa.array([], pa.int64()),
            "n_met": pa.array([], pa.int64()),
            "met_ppm": pa.array([], pa.int64()),
        })
    out = out.sort_values("month", ignore_index=True)
    ppm = np.array(
        [
            _round_half_away(float(m) / float(n) * 1e6) if n else 0
            for m, n in zip(out["n_met"], out["n_orders"])
        ],
        np.int64,
    )
    return pa.table(
        {
            "month": pa.array(out["month"], pa.string()),
            "n_orders": pa.array(
                out["n_orders"].to_numpy(dtype=np.int64)
            ),
            "n_met": pa.array(out["n_met"].to_numpy(dtype=np.int64)),
            "met_ppm": pa.array(ppm),
        }
    )


FILL_RATE_SQL = f"""
WITH last_ship AS MATERIALIZED (
  SELECT l_orderkey, MAX(EPOCH_US(l_shipdate)) AS mx
  FROM lineitem GROUP BY 1
), per AS MATERIALIZED (
  SELECT strftime(o_orderdate, '%Y-%m') AS month,
         CASE WHEN ls.mx <= EPOCH_US(o_orderdate) + {_SLA_US}
              THEN 1 ELSE 0 END AS met
  FROM orders JOIN last_ship ls ON o_orderkey = ls.l_orderkey
)
SELECT month,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(met) AS BIGINT) AS n_met,
       CAST(ROUND(CAST(SUM(met) AS DOUBLE)
            / CAST(COUNT(*) AS DOUBLE) * 1000000, 0) AS BIGINT)
         AS met_ppm
FROM per GROUP BY month ORDER BY month
"""


def register_r4ez(queries: dict, oracles: dict) -> None:
    queries.update(
        {
            "tpch_q8_market_share": q_tpch_q8_market_share,
            "tpch_q16_brand_size_suppliers":
                q_tpch_q16_brand_size_suppliers,
            "order_fill_rate_sla": q_order_fill_rate_sla,
        }
    )
    oracles.update(
        {
            "tpch_q8_market_share": TPCH_Q8_SQL,
            "tpch_q16_brand_size_suppliers": TPCH_Q16_SQL,
            "order_fill_rate_sla": FILL_RATE_SQL,
        }
    )
