"""Round-4 continuation batch 4: the six remaining TPC-H shapes, closing
the full 22-query suite on the available columns (the test tables carry no
``partsupp`` and no shipmode/commitdate lineitem columns, so Q2/Q9/Q11/
Q12/Q16/Q20 are re-expressed on lineitem-derived supply facts — each
docstring states the mapping).

Shapes exercised (SURVEY.md §2.5/§2.6 families):
- Q2: per-group argmin over a derived (part, supplier) fact table with two
  broadcast dimension filters (region via nation via supplier).
- Q9: multi-dimension star join (part filter + supplier->nation broadcast)
  feeding a big-big lineitem x orders exchange, grouped by (nation, year).
- Q11: combiner-first per-key value partials + a global scalar threshold
  applied as an exact cross-multiplied integer predicate.
- Q12: big-big join then a fully vectorized date-lag classification into a
  small grouped count (the late-shipment pivot).
- Q16: distinct (part, supplier) pairs via per-batch group partials +
  keyed tree merge, broadcast part attrs, exclusion lists, then an exact
  COUNT(DISTINCT) over the composite group.
- Q20: per-supplier quantity partials over a broadcast-filtered part set,
  kept by an above-average cross-multiplied predicate.

Exactness discipline (SURVEY.md §6): every float feeding a SUM is
quantized per-term to int64 fixed point BEFORE summation (cents x
(100 - disc%) for revenue, x100 for price/qty); thresholds compare by
integer cross-multiplication so no float average ever feeds a filter.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd
from mimirsbrunn_ray.stages.broadcast import safe_join as _safe_join

from mimirsbrunn_ray.context import pool_size
from mimirsbrunn_ray.pipelines.queries_r4c import (
    _member_mask,
    _rev_e4,
    _sorted_key_ref,
)
from mimirsbrunn_ray.stages.rollup import tree_merge


def _dim_pd(sf_dir: str, table: str, columns: list[str]):
    """Driver-side read of a SMALL dimension (region/nation/supplier/part —
    bounded by design; the big tables never go through here)."""
    import pyarrow.parquet as pq

    return pq.read_table(f"{sf_dir}/{table}.parquet", columns=columns)


def _region_suppkeys(sf_dir: str, region: str) -> np.ndarray:
    """Supplier keys whose nation sits in ``region`` (dim-only chain)."""
    reg = _dim_pd(sf_dir, "region", ["r_regionkey", "r_name"])
    rkeys = reg.filter(pc.equal(reg["r_name"], region))["r_regionkey"]
    nat = _dim_pd(sf_dir, "nation", ["n_nationkey", "n_regionkey"])
    nkeys = nat.filter(pc.is_in(nat["n_regionkey"], value_set=rkeys.combine_chunks()))[
        "n_nationkey"
    ].to_numpy()
    sup = _dim_pd(sf_dir, "supplier", ["s_suppkey", "s_nationkey"])
    mask = np.isin(sup["s_nationkey"].to_numpy(), nkeys)
    return sup["s_suppkey"].to_numpy()[mask]


# ---------------------------------------------------------------------------
# TPC-H Q2 shape: minimum-cost supplier per part
# ---------------------------------------------------------------------------

_Q2_TYPE = "LARGE"
_Q2_REGION = "EUROPE"


def q_tpch_q2_min_cost_supplier(sf_dir):
    """TPC-H Q2's structural core on the available columns: for every part
    of type ``LARGE``, the EUROPE-region supplier offering it at the lowest
    observed sale price (min over lineitem of extendedprice, exact cents),
    ties broken by the smaller suppkey — the correlated-MIN subquery of
    Q2 as a grouped argmin (no partsupp table; lineitem is the supply
    fact). One lineitem scan: broadcast part/supplier key sets prune
    batches vectorized, per-batch (part, supp) min partials tree-merge by
    part shard, and the final per-part argmin is a composite-key min
    ``price_e2 * 2^20 + suppkey`` — exact because suppkey < 2^20 is
    asserted against the dim."""
    part = _dim_pd(sf_dir, "part", ["p_partkey", "p_type"])
    pkeys = part.filter(pc.equal(part["p_type"], _Q2_TYPE))["p_partkey"].to_numpy()
    skeys = _region_suppkeys(sf_dir, _Q2_REGION)
    assert skeys.size == 0 or int(skeys.max()) < (1 << 20)
    pref, sref = _sorted_key_ref(pkeys), _sorted_key_ref(skeys)

    def pair_min(b: pa.Table) -> pa.Table:
        keep = _member_mask(
            b["l_partkey"].to_numpy(), pref
        ) & _member_mask(b["l_suppkey"].to_numpy(), sref)
        b = b.filter(pa.array(keep))
        price_e2 = pc.round(pc.multiply(b["l_extendedprice"], pa.scalar(100.0))).cast(
            pa.int64()
        )
        t = pa.table(
            {
                "p_partkey": b["l_partkey"],
                # composite: min over this picks min price, then min suppkey
                "cost_key": pc.add(
                    pc.multiply(price_e2, pa.scalar(1 << 20, pa.int64())),
                    b["l_suppkey"].cast(pa.int64()),
                ),
            }
        )
        g = t.group_by(["p_partkey"]).aggregate([("cost_key", "min")])
        return g.rename_columns(["p_partkey", "cost_key"])

    merged = tree_merge(
        rd.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_partkey", "l_suppkey", "l_extendedprice"],
        ).map_batches(pair_min, batch_format="pyarrow", batch_size=None),
        lambda b: b.group_by(["p_partkey"])
        .aggregate([("cost_key", "min")])
        .rename_columns(["p_partkey", "cost_key"]),
        final_shards=4,
        shard_cols=["p_partkey"],
    )

    def finish(b: pa.Table) -> pa.Table:
        ck = b["cost_key"].to_numpy()
        return pa.table(
            {
                "p_partkey": b["p_partkey"].cast(pa.int64()),
                "s_suppkey": pa.array(ck & ((1 << 20) - 1), pa.int64()),
                "min_price_e2": pa.array(ck >> 20, pa.int64()),
            }
        )

    return merged.map_batches(finish, batch_format="pyarrow", batch_size=None)


TPCH_Q2_SQL = f"""
WITH costs AS (
  SELECT l.l_partkey AS p_partkey, l.l_suppkey AS s_suppkey,
         CAST(ROUND(l.l_extendedprice * 100, 0) AS BIGINT) AS price_e2
  FROM lineitem l
  JOIN part p ON p.p_partkey = l.l_partkey AND p.p_type = '{_Q2_TYPE}'
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN nation n ON n.n_nationkey = s.s_nationkey
  JOIN region r ON r.r_regionkey = n.n_regionkey AND r.r_name = '{_Q2_REGION}'
),
best AS (
  SELECT p_partkey, s_suppkey, price_e2,
         ROW_NUMBER() OVER (PARTITION BY p_partkey
                            ORDER BY price_e2, s_suppkey) AS rn
  FROM costs
)
SELECT CAST(p_partkey AS BIGINT) AS p_partkey,
       CAST(s_suppkey AS BIGINT) AS s_suppkey,
       CAST(price_e2 AS BIGINT) AS min_price_e2
FROM best WHERE rn = 1
"""


# ---------------------------------------------------------------------------
# TPC-H Q9 shape: profit by supplier nation and order year
# ---------------------------------------------------------------------------

_Q9_NAME_SUBSTR = "widget"


def q_tpch_q9_profit(sf_dir):
    """TPC-H Q9's structural core: revenue of parts whose name contains
    ``widget``, grouped by the SUPPLIER's nation and the ORDER year (no
    ps_supplycost term — the tables carry no partsupp). Star side (part
    filter, supplier->nation name) broadcasts; the lineitem x orders
    big-big exchange joins only the part-filtered lineitem slice (the
    selective filter runs first, Q8's discipline), with revenue already
    reduced to per-(orderkey, nation) int64 partials BEFORE the join."""
    part = _dim_pd(sf_dir, "part", ["p_partkey", "p_name"])
    pkeys = part.filter(
        pc.match_substring(part["p_name"], _Q9_NAME_SUBSTR)
    )["p_partkey"].to_numpy()
    pref = _sorted_key_ref(pkeys)

    sup = _dim_pd(sf_dir, "supplier", ["s_suppkey", "s_nationkey"])
    nat = _dim_pd(sf_dir, "nation", ["n_nationkey", "n_name"])
    nmap = dict(zip(nat["n_nationkey"].to_numpy(), nat["n_name"].to_pylist()))
    skeys = sup["s_suppkey"].to_numpy().astype(np.int64)
    order = np.argsort(skeys, kind="stable")
    snames = np.asarray(
        [nmap[int(v)] for v in sup["s_nationkey"].to_numpy()], dtype=object
    )[order]
    import ray as _ray

    sn_ref = _ray.put((skeys[order], snames))

    def li_partial(b: pa.Table) -> pa.Table:
        keep = _member_mask(b["l_partkey"].to_numpy(), pref)
        b = b.filter(pa.array(keep))
        sk, sv = _ray.get(sn_ref)
        pos = np.clip(
            np.searchsorted(sk, b["l_suppkey"].to_numpy()), 0, max(len(sk) - 1, 0)
        )
        nation = pa.array(sv[pos], pa.string())
        t = pa.table(
            {
                "l_orderkey": b["l_orderkey"],
                "n_name": nation,
                "rev_e4": _rev_e4(b),
            }
        )
        g = t.group_by(["l_orderkey", "n_name"]).aggregate([("rev_e4", "sum")])
        return g.rename_columns(["l_orderkey", "n_name", "rev_e4"])

    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"],
    ).map_batches(li_partial, batch_format="pyarrow", batch_size=None)

    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_orderdate"]
    ).map_batches(
        lambda b: pa.table(
            {
                "o_orderkey": b["o_orderkey"],
                "o_year": pc.year(b["o_orderdate"]).cast(pa.int64()),
            }
        ),
        batch_format="pyarrow",
        batch_size=None,
    )

    n_part = max(8, pool_size())
    joined = _safe_join(
        li, orders,
        on=("l_orderkey",),
        right_on=("o_orderkey",),
        join_type="inner",
        num_partitions=n_part,
    )

    def year_partial(b: pa.Table) -> pa.Table:
        g = b.select(["n_name", "o_year", "rev_e4"]).group_by(
            ["n_name", "o_year"]
        ).aggregate([("rev_e4", "sum")])
        return g.rename_columns(["n_name", "o_year", "profit_e4"])

    return tree_merge(
        joined.map_batches(year_partial, batch_format="pyarrow", batch_size=None),
        lambda b: b.group_by(["n_name", "o_year"])
        .aggregate([("profit_e4", "sum")])
        .rename_columns(["n_name", "o_year", "profit_e4"]),
    )


TPCH_Q9_SQL = f"""
SELECT n.n_name,
       CAST(EXTRACT(year FROM o.o_orderdate) AS BIGINT) AS o_year,
       CAST(SUM(CAST(ROUND(l.l_extendedprice * 100, 0) AS BIGINT)
                * (100 - CAST(ROUND(l.l_discount * 100, 0) AS BIGINT)))
            AS BIGINT) AS profit_e4
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
           AND p.p_name LIKE '%{_Q9_NAME_SUBSTR}%'
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation n ON n.n_nationkey = s.s_nationkey
JOIN orders o ON o.o_orderkey = l.l_orderkey
GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# TPC-H Q11 shape: important parts by supply value from one nation
# ---------------------------------------------------------------------------

_Q11_NATION = "NATION_3"


def q_tpch_q11_important_parts(sf_dir):
    """TPC-H Q11's structural core: per-part supply value (revenue from
    suppliers of one nation), keeping parts whose value exceeds the
    average — the scalar-subquery-threshold shape, made scale-free by
    using ``value * n_parts > total`` (TPC-H's fixed 1/200 fraction is
    degenerate on small SF: no part clears 0.5% share).  One lineitem
    scan produces per-part int64 partials; the global total and part
    count come from the SAME merged partials (no second scan); the
    threshold is the exact cross-multiplied integer predicate."""
    sup = _dim_pd(sf_dir, "supplier", ["s_suppkey", "s_nationkey"])
    nat = _dim_pd(sf_dir, "nation", ["n_nationkey", "n_name"])
    nkey = nat.filter(pc.equal(nat["n_name"], _Q11_NATION))["n_nationkey"]
    smask = np.isin(
        sup["s_nationkey"].to_numpy(), nkey.to_numpy()
    )
    sref = _sorted_key_ref(sup["s_suppkey"].to_numpy()[smask])

    def part_partial(b: pa.Table) -> pa.Table:
        keep = _member_mask(b["l_suppkey"].to_numpy(), sref)
        b = b.filter(pa.array(keep))
        t = pa.table({"p_partkey": b["l_partkey"], "value_e4": _rev_e4(b)})
        g = t.group_by(["p_partkey"]).aggregate([("value_e4", "sum")])
        return g.rename_columns(["p_partkey", "value_e4"])

    merged = tree_merge(
        rd.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_partkey", "l_suppkey", "l_extendedprice", "l_discount"],
        ).map_batches(part_partial, batch_format="pyarrow", batch_size=None),
        lambda b: b.group_by(["p_partkey"])
        .aggregate([("value_e4", "sum")])
        .rename_columns(["p_partkey", "value_e4"]),
        final_shards=4,
        shard_cols=["p_partkey"],
    ).materialize()

    total = 0
    n_parts = 0
    for b in merged.iter_batches(batch_format="pyarrow"):
        total += pc.sum(b["value_e4"]).as_py() or 0
        n_parts += b.num_rows

    den = pa.scalar(int(n_parts), pa.int64())
    tot = pa.scalar(int(total), pa.int64())

    def threshold(b: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "p_partkey": b["p_partkey"].cast(pa.int64()),
                "value_e4": b["value_e4"].cast(pa.int64()),
            }
        )
        return t.filter(pc.greater(pc.multiply(t["value_e4"], den), tot))

    return merged.map_batches(threshold, batch_format="pyarrow", batch_size=None)


TPCH_Q11_SQL = f"""
WITH v AS (
  SELECT l.l_partkey AS p_partkey,
         CAST(SUM(CAST(ROUND(l.l_extendedprice * 100, 0) AS BIGINT)
                  * (100 - CAST(ROUND(l.l_discount * 100, 0) AS BIGINT)))
              AS BIGINT) AS value_e4
  FROM lineitem l
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN nation n ON n.n_nationkey = s.s_nationkey
                AND n.n_name = '{_Q11_NATION}'
  GROUP BY 1
)
SELECT CAST(p_partkey AS BIGINT) AS p_partkey, value_e4
FROM v, (SELECT SUM(value_e4) AS total, COUNT(*) AS n FROM v) t
WHERE value_e4 * t.n > t.total
"""


# ---------------------------------------------------------------------------
# TPC-H Q12 shape: late shipments per order priority
# ---------------------------------------------------------------------------

_Q12_LATE_DAYS = 90


def q_tpch_q12_late_shipments(sf_dir):
    """TPC-H Q12's structural core on the available columns: lineitems
    shipped more than 90 days after their order date count as LATE (the
    tables carry no commitdate/receiptdate/shipmode, so ship-vs-order lag
    replaces receipt-vs-commit and the grouping key is o_orderpriority).
    The lineitem x orders exchange carries only (orderkey, shipdate) x
    (orderkey, date, priority); classification is one vectorized compare;
    the per-priority (late, total) count pivot tree-merges."""
    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_shipdate"]
    )
    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderdate", "o_orderpriority"],
    )
    n_part = max(8, pool_size())
    joined = _safe_join(
        li, orders,
        on=("l_orderkey",),
        right_on=("o_orderkey",),
        join_type="inner",
        num_partitions=n_part,
    )

    lag_us = np.int64(_Q12_LATE_DAYS) * 86_400_000_000

    def classify(b: pa.Table) -> pa.Table:
        ship = b["l_shipdate"].cast(pa.int64()).to_numpy()
        ordd = b["o_orderdate"].cast(pa.int64()).to_numpy()
        late = (ship - ordd > lag_us).astype(np.int64)
        t = pa.table(
            {
                "o_orderpriority": b["o_orderpriority"],
                "late_count": pa.array(late, pa.int64()),
                "n_lines": pa.array(np.ones(len(late), np.int64)),
            }
        )
        g = t.group_by(["o_orderpriority"]).aggregate(
            [("late_count", "sum"), ("n_lines", "sum")]
        )
        return g.rename_columns(["o_orderpriority", "late_count", "n_lines"])

    return tree_merge(
        joined.map_batches(classify, batch_format="pyarrow", batch_size=None),
        lambda b: b.group_by(["o_orderpriority"])
        .aggregate([("late_count", "sum"), ("n_lines", "sum")])
        .rename_columns(["o_orderpriority", "late_count", "n_lines"]),
    )


TPCH_Q12_SQL = f"""
SELECT o.o_orderpriority,
       CAST(SUM(CASE WHEN l.l_shipdate > o.o_orderdate
                          + INTERVAL {_Q12_LATE_DAYS} DAY
                     THEN 1 ELSE 0 END) AS BIGINT) AS late_count,
       CAST(COUNT(*) AS BIGINT) AS n_lines
FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# TPC-H Q16 shape: distinct supplier count per part attribute group
# ---------------------------------------------------------------------------

_Q16_EXCL_BRAND = "Brand#13"
_Q16_MIN_BAL = 1000.0  # complaint-supplier proxy: exclude low balances


def q_tpch_q16_supplier_counts(sf_dir):
    """TPC-H Q16's structural core: how many DISTINCT suppliers ship each
    (brand, type, size) part group, excluding one brand and excluding
    low-balance suppliers (the s_comment '%Customer%Complaints%' proxy on
    the available columns). Distinct (part, supplier) pairs come from
    per-batch group partials + a part-sharded tree merge (the supply fact
    replaces partsupp); part attrs attach from a broadcast map; the final
    exact COUNT(DISTINCT suppkey) re-groups the already-distinct
    (attrs, suppkey) rows — every stage's state is bounded by the distinct
    pair count, never the scan."""
    part = _dim_pd(sf_dir, "part", ["p_partkey", "p_brand", "p_type", "p_size"])
    keep_mask = pc.not_equal(part["p_brand"], _Q16_EXCL_BRAND)
    part = part.filter(keep_mask)
    pkeys = part["p_partkey"].to_numpy().astype(np.int64)
    import ray as _ray

    order = np.argsort(pkeys, kind="stable")
    attrs_ref = _ray.put(
        (
            pkeys[order],
            np.asarray(part["p_brand"].to_pylist(), dtype=object)[order],
            np.asarray(part["p_type"].to_pylist(), dtype=object)[order],
            part["p_size"].to_numpy().astype(np.int64)[order],
        )
    )
    pref = _sorted_key_ref(pkeys)

    sup = _dim_pd(sf_dir, "supplier", ["s_suppkey", "s_acctbal"])
    ok = sup["s_acctbal"].to_numpy() >= _Q16_MIN_BAL
    sref = _sorted_key_ref(sup["s_suppkey"].to_numpy()[ok])

    def pair_partial(b: pa.Table) -> pa.Table:
        keep = _member_mask(
            b["l_partkey"].to_numpy(), pref
        ) & _member_mask(b["l_suppkey"].to_numpy(), sref)
        b = b.filter(pa.array(keep))
        t = pa.table({"p_partkey": b["l_partkey"], "s_suppkey": b["l_suppkey"]})
        return (
            t.group_by(["p_partkey", "s_suppkey"])
            .aggregate([])
        )

    pairs = tree_merge(
        rd.read_parquet(
            f"{sf_dir}/lineitem.parquet", columns=["l_partkey", "l_suppkey"]
        ).map_batches(pair_partial, batch_format="pyarrow", batch_size=None),
        lambda b: b.group_by(["p_partkey", "s_suppkey"]).aggregate([]),
        final_shards=4,
        shard_cols=["p_partkey"],
    )

    def attach_and_count(b: pa.Table) -> pa.Table:
        pk, brands, types, sizes = _ray.get(attrs_ref)
        pos = np.clip(
            np.searchsorted(pk, b["p_partkey"].to_numpy()), 0, max(len(pk) - 1, 0)
        )
        t = pa.table(
            {
                "p_brand": pa.array(brands[pos], pa.string()),
                "p_type": pa.array(types[pos], pa.string()),
                "p_size": pa.array(sizes[pos], pa.int64()),
                "s_suppkey": b["s_suppkey"],
            }
        )
        # distinct (attrs, supp) inside the batch — pairs are distinct per
        # (part, supp) already, so this only collapses same-attr parts
        return t.group_by(["p_brand", "p_type", "p_size", "s_suppkey"]).aggregate([])

    distinct_attr_supp = tree_merge(
        pairs.map_batches(attach_and_count, batch_format="pyarrow", batch_size=None),
        lambda b: b.group_by(["p_brand", "p_type", "p_size", "s_suppkey"]).aggregate(
            []
        ),
    )

    def count_partial(b: pa.Table) -> pa.Table:
        g = b.group_by(["p_brand", "p_type", "p_size"]).aggregate(
            [("s_suppkey", "count")]
        )
        return g.rename_columns(["p_brand", "p_type", "p_size", "supplier_cnt"])

    return tree_merge(
        distinct_attr_supp.map_batches(
            count_partial, batch_format="pyarrow", batch_size=None
        ),
        lambda b: b.group_by(["p_brand", "p_type", "p_size"])
        .aggregate([("supplier_cnt", "sum")])
        .rename_columns(["p_brand", "p_type", "p_size", "supplier_cnt"]),
    )


TPCH_Q16_SQL = f"""
SELECT p.p_brand, p.p_type, CAST(p.p_size AS BIGINT) AS p_size,
       CAST(COUNT(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
           AND p.p_brand <> '{_Q16_EXCL_BRAND}'
JOIN supplier s ON s.s_suppkey = l.l_suppkey
               AND s.s_acctbal >= {_Q16_MIN_BAL}
GROUP BY 1, 2, 3
"""


# ---------------------------------------------------------------------------
# TPC-H Q20 shape: above-average shippers of a part-name prefix
# ---------------------------------------------------------------------------

_Q20_NAME_PREFIX = "large"


def q_tpch_q20_heavy_suppliers(sf_dir):
    """TPC-H Q20's structural core: suppliers whose shipped quantity of
    parts named ``large*`` exceeds the all-supplier average for those
    parts (the ps_availqty > 0.5 * shipped threshold re-expressed on the
    lineitem supply fact). One scan -> per-supplier int64 quantity
    partials; the average is the exact cross-multiplied predicate
    ``qty * n_suppliers > grand_total`` over the SAME merged partials."""
    part = _dim_pd(sf_dir, "part", ["p_partkey", "p_name"])
    pkeys = part.filter(
        pc.starts_with(part["p_name"], _Q20_NAME_PREFIX)
    )["p_partkey"].to_numpy()
    pref = _sorted_key_ref(pkeys)

    def supp_partial(b: pa.Table) -> pa.Table:
        keep = _member_mask(b["l_partkey"].to_numpy(), pref)
        b = b.filter(pa.array(keep))
        qty = pc.round(b["l_quantity"]).cast(pa.int64())
        t = pa.table({"s_suppkey": b["l_suppkey"], "total_qty": qty})
        g = t.group_by(["s_suppkey"]).aggregate([("total_qty", "sum")])
        return g.rename_columns(["s_suppkey", "total_qty"])

    merged = tree_merge(
        rd.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_partkey", "l_suppkey", "l_quantity"],
        ).map_batches(supp_partial, batch_format="pyarrow", batch_size=None),
        lambda b: b.group_by(["s_suppkey"])
        .aggregate([("total_qty", "sum")])
        .rename_columns(["s_suppkey", "total_qty"]),
    ).materialize()

    total = 0
    n_supp = 0
    for b in merged.iter_batches(batch_format="pyarrow"):
        total += pc.sum(b["total_qty"]).as_py() or 0
        n_supp += b.num_rows
    tot = pa.scalar(int(total), pa.int64())
    n = pa.scalar(int(n_supp), pa.int64())

    return merged.map_batches(
        lambda b: pa.table(
            {
                "s_suppkey": b["s_suppkey"].cast(pa.int64()),
                "total_qty": b["total_qty"].cast(pa.int64()),
            }
        ).filter(
            pc.greater(
                pc.multiply(b["total_qty"].cast(pa.int64()), n), tot
            )
        ),
        batch_format="pyarrow",
        batch_size=None,
    )


TPCH_Q20_SQL = f"""
WITH q AS (
  SELECT l.l_suppkey AS s_suppkey,
         CAST(SUM(CAST(ROUND(l.l_quantity, 0) AS BIGINT)) AS BIGINT)
           AS total_qty
  FROM lineitem l
  JOIN part p ON p.p_partkey = l.l_partkey
             AND p.p_name LIKE '{_Q20_NAME_PREFIX}%'
  GROUP BY 1
)
SELECT CAST(s_suppkey AS BIGINT) AS s_suppkey, total_qty
FROM q, (SELECT SUM(total_qty) AS total, COUNT(*) AS n FROM q) t
WHERE total_qty * t.n > t.total
"""


def register_r4d(queries: dict, oracles: dict) -> None:
    queries.update(
        {
            "tpch_q2_min_cost_supplier": q_tpch_q2_min_cost_supplier,
            "tpch_q9_profit": q_tpch_q9_profit,
            "tpch_q11_important_parts": q_tpch_q11_important_parts,
            "tpch_q12_late_shipments": q_tpch_q12_late_shipments,
            "tpch_q16_supplier_counts": q_tpch_q16_supplier_counts,
            "tpch_q20_heavy_suppliers": q_tpch_q20_heavy_suppliers,
        }
    )
    oracles.update(
        {
            "tpch_q2_min_cost_supplier": TPCH_Q2_SQL,
            "tpch_q9_profit": TPCH_Q9_SQL,
            "tpch_q11_important_parts": TPCH_Q11_SQL,
            "tpch_q12_late_shipments": TPCH_Q12_SQL,
            "tpch_q16_supplier_counts": TPCH_Q16_SQL,
            "tpch_q20_heavy_suppliers": TPCH_Q20_SQL,
        }
    )
