"""Round-4 time-series + join extension queries: counter-rate semantics,
OHLC bars, trailing EWMA, sliding-window distinct counts, day-over-day
deltas, a 2-D skyline, and three more TPC-H join-aggregate shapes
(Q10 / Q19 / Q7 adapted to the available columns).

Exactness discipline (SURVEY.md §6): every float that feeds a SUM is
quantized per-term to int64 fixed point BEFORE summation (integer sums
are order-free, so the distributed result is bit-equal to any engine's);
open/close/high/low are actual data elements; the only divisions happen
once, from identical operands on both sides.

Reference parity notes: the counter-increase operator is the metrics-
store semantic over the reference's bulk ok/err import counters
(/root/reference/libs/mimir/src/rubber.rs:413-452); OHLC/EWMA/sliding
windows generalize its per-run import stats to per-bucket series; the
TPC-H shapes exercise the same broadcast-dimension + big-big exchange
machinery as the reference's admin/street denormalizing joins
(/root/reference/src/osm_reader/street.rs:118-167).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd
from mimirsbrunn_ray.stages.broadcast import read_dim_table
from mimirsbrunn_ray.stages.broadcast import safe_join as _safe_join

# ---------------------------------------------------------------------------
# counter increase (PromQL-style reset-aware rate), per user x hour
# ---------------------------------------------------------------------------


def q_counter_increase(sf_dir):
    """Reset-aware counter ``increase()`` per (user, hour) — see
    stages/timeseries.counter_increase (one series-key bucket shuffle,
    vectorized LAG + per-term x100 quantization)."""
    from mimirsbrunn_ray.stages.timeseries import counter_increase

    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "ts", "event_id", "value"],
    )
    return counter_increase(ev, key="user_id", freq="h")


COUNTER_INCREASE_SQL = """
WITH d AS (
  SELECT user_id, ts, value,
         value - LAG(value) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
         ) AS delta
  FROM events
  WHERE user_id IS NOT NULL AND ts IS NOT NULL AND value IS NOT NULL
)
SELECT user_id, date_trunc('hour', ts) AS bucket,
       CAST(SUM(CAST(ROUND(
         (CASE WHEN delta >= 0 THEN delta ELSE value END) * 100, 0
       ) AS BIGINT)) AS BIGINT) AS increase_x100,
       CAST(COUNT(*) AS BIGINT) AS n_samples
FROM d WHERE delta IS NOT NULL
GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# OHLC bars per event_type x hour
# ---------------------------------------------------------------------------


def q_ohlc_bars(sf_dir):
    """Hourly OHLC candlesticks per event type — decomposable partial
    bars merged by one groupby; open/close deterministic via (ts, id)
    tie-break (stages/timeseries.ohlc_bars)."""
    from mimirsbrunn_ray.stages.timeseries import ohlc_bars

    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_type", "ts", "event_id", "value"],
    )
    return ohlc_bars(ev, key="event_type", freq="h")


OHLC_SQL = """
WITH e AS (
  SELECT event_type, date_trunc('hour', ts) AS bucket, ts, event_id, value
  FROM events
  WHERE event_type IS NOT NULL AND ts IS NOT NULL AND value IS NOT NULL
), r AS (
  SELECT *,
         ROW_NUMBER() OVER (
           PARTITION BY event_type, bucket ORDER BY ts, event_id
         ) AS rn_a,
         ROW_NUMBER() OVER (
           PARTITION BY event_type, bucket ORDER BY ts DESC, event_id DESC
         ) AS rn_d
  FROM e
), oc AS (
  SELECT event_type, bucket,
         MAX(CASE WHEN rn_a = 1 THEN value END) AS open,
         MAX(CASE WHEN rn_d = 1 THEN value END) AS close
  FROM r GROUP BY 1, 2
), agg AS (
  SELECT event_type, bucket, MAX(value) AS high, MIN(value) AS low,
         CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT)
           AS volume_x100,
         CAST(COUNT(*) AS BIGINT) AS n_samples
  FROM e GROUP BY 1, 2
)
SELECT agg.event_type, agg.bucket, oc.open, agg.high, agg.low, oc.close,
       agg.volume_x100, agg.n_samples
FROM agg JOIN oc USING (event_type, bucket)
"""


# ---------------------------------------------------------------------------
# trailing EWMA (alpha = 1/2, exact integer arithmetic)
# ---------------------------------------------------------------------------


def q_ewma_trailing(sf_dir):
    """Trailing-32-sample EWMA per event type in exact integer
    arithmetic (power-of-two weights, x100 values) — the one float is a
    single division both engines perform on identical int64 operands
    (stages/timeseries.trailing_ewma)."""
    from mimirsbrunn_ray.stages.timeseries import trailing_ewma

    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_type", "ts", "event_id", "value"],
    )
    return trailing_ewma(ev, key="event_type", window=32)


EWMA_SQL = """
WITH r AS (
  SELECT event_type, value,
         ROW_NUMBER() OVER (
           PARTITION BY event_type ORDER BY ts DESC, event_id DESC
         ) AS rn
  FROM events
  WHERE event_type IS NOT NULL AND ts IS NOT NULL AND value IS NOT NULL
), t AS (
  SELECT event_type,
         CAST(ROUND(value * 100, 0) AS BIGINT)
           * CAST(POWER(2, 32 - rn) AS BIGINT) AS num,
         CAST(POWER(2, 32 - rn) AS BIGINT) AS den
  FROM r WHERE rn <= 32
)
SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_used,
       CAST(SUM(num) AS BIGINT) AS ewma_num,
       CAST(SUM(den) AS BIGINT) AS ewma_den,
       CAST(SUM(num) AS DOUBLE) / CAST(SUM(den) AS DOUBLE) AS ewma_x100
FROM t GROUP BY 1
"""


# ---------------------------------------------------------------------------
# sliding-window distinct users (trailing 2 hours)
# ---------------------------------------------------------------------------


def q_sliding_active_users(sf_dir):
    """Trailing-2h distinct users at every hour label — bucket-pair
    fan-out (vectorized, after a batch-local pair distinct) into the
    exact_distinct_per_group machinery
    (stages/timeseries.sliding_distinct)."""
    from mimirsbrunn_ray.stages.timeseries import sliding_distinct

    ev = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id", "ts"])
    return sliding_distinct(ev, entity="user_id", freq="h", window_buckets=2)


SLIDING_DISTINCT_SQL = """
WITH uh AS (
  SELECT DISTINCT user_id, date_trunc('hour', ts) AS h
  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
), lab AS (
  SELECT DISTINCT user_id, h + o * INTERVAL 1 HOUR AS win
  FROM uh CROSS JOIN (SELECT UNNEST([0, 1]) AS o)
)
SELECT win, CAST(COUNT(*) AS BIGINT) AS n_entities
FROM lab GROUP BY win
"""


# ---------------------------------------------------------------------------
# day-over-day delta of daily value sums
# ---------------------------------------------------------------------------


def q_day_over_day(sf_dir):
    """Day-over-day delta of per-type daily x100 sums — combiner-first
    daily partials, then a per-key sort+shift over key x days rows
    (stages/timeseries.day_over_day)."""
    from mimirsbrunn_ray.stages.timeseries import day_over_day

    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "ts", "value"]
    )
    return day_over_day(ev, key="event_type")


DOD_SQL = """
WITH d AS (
  SELECT event_type, date_trunc('day', ts) AS day,
         CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT)
           AS total_x100
  FROM events
  WHERE event_type IS NOT NULL AND ts IS NOT NULL AND value IS NOT NULL
  GROUP BY 1, 2
), l AS (
  SELECT event_type, day, total_x100,
         LAG(total_x100) OVER (
           PARTITION BY event_type ORDER BY day
         ) AS prev_x100
  FROM d
)
SELECT event_type, day, total_x100, prev_x100,
       total_x100 - prev_x100 AS delta_x100
FROM l WHERE prev_x100 IS NOT NULL
"""


# ---------------------------------------------------------------------------
# 2-D skyline over part (cheapest-for-its-size Pareto front)
# ---------------------------------------------------------------------------


def q_pareto_parts(sf_dir):
    """Pareto front of parts (minimize retail price, maximize size):
    lossless local-front pruning per block, then the same vectorized
    rule over the union of tiny fronts
    (stages/ordered.pareto_front_2d)."""
    from mimirsbrunn_ray.stages.ordered import pareto_front_2d

    parts = rd.read_parquet(
        f"{sf_dir}/part.parquet",
        columns=["p_partkey", "p_retailprice", "p_size"],
    )
    return pareto_front_2d(
        parts, minimize_col="p_retailprice", maximize_col="p_size",
        id_col="p_partkey",
    )


PARETO_SQL = """
SELECT CAST(p_partkey AS BIGINT) AS p_partkey, p_retailprice, p_size
FROM part p
WHERE p_retailprice IS NOT NULL AND p_size IS NOT NULL
  AND NOT EXISTS (
    SELECT 1 FROM part q
    WHERE q.p_retailprice IS NOT NULL AND q.p_size IS NOT NULL
      AND q.p_retailprice <= p.p_retailprice AND q.p_size >= p.p_size
      AND (q.p_retailprice < p.p_retailprice OR q.p_size > p.p_size)
  )
"""


# ---------------------------------------------------------------------------
# TPC-H Q10: revenue lost to returned items, top-20 customers
# ---------------------------------------------------------------------------


def q_tpch_q10_returns(sf_dir):
    """TPC-H Q10 shape: returned-lineitem revenue per customer for a
    half-year of orders. Combiner-first per-orderkey revenue partials
    (x1e4 int) -> big-big hash join with date-filtered orders -> small
    per-custkey aggregate -> constant-group top-20 prune -> broadcast
    customer + nation dims onto the 20 survivors."""
    from mimirsbrunn_ray.context import pool_size
    from mimirsbrunn_ray.stages.rollup import tree_merge
    from mimirsbrunn_ray.stages.search import grouped_top_k

    lo = np.datetime64("1997-01-01", "us")
    hi = np.datetime64("1997-07-01", "us")

    def li_partial(b: pa.Table) -> pa.Table:
        b = b.filter(pc.equal(b["l_returnflag"], "R"))
        price_c = pc.round(pc.multiply(b["l_extendedprice"], pa.scalar(100.0)))
        disc_c = pc.round(pc.multiply(b["l_discount"], pa.scalar(100.0)))
        rev_e4 = pc.multiply(
            price_c.cast(pa.int64()),
            pc.subtract(pa.scalar(100, type=pa.int64()), disc_c.cast(pa.int64())),
        )
        t = pa.table({"l_orderkey": b["l_orderkey"], "rev_e4": rev_e4})
        g = t.group_by(["l_orderkey"]).aggregate([("rev_e4", "sum")])
        return g.rename_columns(["l_orderkey", "rev_e4"])

    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount", "l_returnflag"],
    ).map_batches(li_partial, batch_format="pyarrow", batch_size=None)

    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate"],
    ).map_batches(
        lambda b: b.filter(
            pc.and_(
                pc.greater_equal(b["o_orderdate"], pa.scalar(lo)),
                pc.less(b["o_orderdate"], pa.scalar(hi)),
            )
        ).select(["o_orderkey", "o_custkey"]),
        batch_format="pyarrow",
        batch_size=None,
    )

    # coalesce both sides to pool-sized blocks before the exchange —
    # the hash-join over per-file micro-blocks measured 2x slower
    n_part = max(8, pool_size())
    joined = _safe_join(
        li, orders,
        on=("l_orderkey",),
        right_on=("o_orderkey",),
        join_type="inner",
        num_partitions=n_part,
    )

    def cust_partial(b: pa.Table) -> pa.Table:
        g = b.group_by(["o_custkey"]).aggregate([("rev_e4", "sum")])
        return g.rename_columns(["c_custkey", "revenue_e4"])

    per_cust = tree_merge(
        joined.map_batches(cust_partial, batch_format="pyarrow", batch_size=None),
        lambda b: b.group_by(["c_custkey"])
        .aggregate([("revenue_e4", "sum")])
        .rename_columns(["c_custkey", "revenue_e4"]),
    )

    top = grouped_top_k(
        per_cust.map_batches(
            lambda b: b.append_column("_g", pa.array(np.zeros(b.num_rows, dtype=np.int8))),
            batch_format="pyarrow",
            batch_size=None,
        ),
        group_cols=["_g"],
        order_col="revenue_e4",
        k=20,
        descending=True,
        tiebreak_cols=("c_custkey",),
    ).drop_columns(["_g"])

    # dim attach: customer + nation are the classic broadcast small side
    # (ship once via ray.put, searchsorted per batch in ONE task stage —
    # three chained actor pools for a 20-row survivor set measured ~6s of
    # pure pool spin-up, the single fused stage is milliseconds)
    import ray as _ray

    cust = read_dim_table(sf_dir, "customer", ["c_custkey", "c_name", "c_nationkey"])
    nat = read_dim_table(sf_dir, "nation", ["n_nationkey", "n_name"])
    nmap = dict(
        zip(
            nat["n_nationkey"].to_numpy().tolist(),
            nat["n_name"].to_numpy(zero_copy_only=False).tolist(),
        )
    )
    ckey = cust["c_custkey"].to_numpy()
    order_c = np.argsort(ckey, kind="stable")
    dims_ref = _ray.put(
        (
            ckey[order_c],
            cust["c_name"].to_numpy(zero_copy_only=False)[order_c],
            np.array(
                [nmap.get(int(k)) for k in cust["c_nationkey"].to_numpy()],
                dtype=object,
            )[order_c],
        )
    )

    def attach_dims(b: pa.Table) -> pa.Table:
        keys_sorted, names, nations = _ray.get(dims_ref)
        k = b["c_custkey"].to_numpy()
        if len(keys_sorted) == 0:
            cn = nn = np.full(len(k), None, dtype=object)
        else:
            pos = np.clip(np.searchsorted(keys_sorted, k), 0, len(keys_sorted) - 1)
            hit = keys_sorted[pos] == k
            cn = np.where(hit, names[pos], None)
            nn = np.where(hit, nations[pos], None)
        return pa.table(
            {
                "c_name": pa.array(cn, type=pa.string()),
                "c_custkey": b["c_custkey"],
                "n_name": pa.array(nn, type=pa.string()),
                "revenue_e4": b["revenue_e4"],
            }
        )

    return top.map_batches(attach_dims, batch_format="pyarrow", batch_size=None)


Q10_SQL = """
WITH l AS (
  SELECT l_orderkey,
         CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)
           * (100 - CAST(ROUND(l_discount * 100, 0) AS BIGINT)) AS rev_e4
  FROM lineitem WHERE l_returnflag = 'R'
), o AS (
  SELECT o_orderkey, o_custkey FROM orders
  WHERE o_orderdate >= TIMESTAMP '1997-01-01'
    AND o_orderdate < TIMESTAMP '1997-07-01'
), r AS (
  SELECT o.o_custkey AS c_custkey, CAST(SUM(l.rev_e4) AS BIGINT) AS revenue_e4
  FROM l JOIN o ON l.l_orderkey = o.o_orderkey GROUP BY 1
)
SELECT c.c_name, CAST(r.c_custkey AS BIGINT) AS c_custkey, n.n_name,
       r.revenue_e4
FROM r
JOIN customer c ON c.c_custkey = r.c_custkey
JOIN nation n ON n.n_nationkey = c.c_nationkey
ORDER BY r.revenue_e4 DESC, r.c_custkey LIMIT 20
"""


# ---------------------------------------------------------------------------
# TPC-H Q19: OR-of-brackets revenue (broadcast part attributes)
# ---------------------------------------------------------------------------

_Q19_BRACKETS = (
    ("Brand#13", 1, 10, 1.0, 20.0),
    ("Brand#20", 5, 25, 10.0, 35.0),
    ("Brand#5", 15, 50, 25.0, 50.0),
)


def q_tpch_q19_brackets(sf_dir):
    """TPC-H Q19 shape: discounted revenue over an OR of three
    (brand, size-range, quantity-range) brackets. Part attributes ship
    once as broadcast (partkey -> brand, partkey -> size) lookups; the
    bracket mask is pure vectorized Arrow/numpy per batch; the two
    output sums are per-term-quantized int64 partials tree-merged to a
    single row."""
    from mimirsbrunn_ray.stages.join import broadcast_join, make_lookup_ref_arrays
    from mimirsbrunn_ray.stages.rollup import tree_merge

    part = read_dim_table(sf_dir, "part", ["p_partkey", "p_brand", "p_size"])
    pkey = part["p_partkey"].to_numpy()
    order = np.argsort(pkey, kind="stable")
    brand_ref = make_lookup_ref_arrays(
        pkey[order], part["p_brand"].to_numpy(zero_copy_only=False)[order]
    )
    size_ref = make_lookup_ref_arrays(
        pkey[order], part["p_size"].to_numpy(zero_copy_only=False)[order].astype(np.int64)
    )

    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_quantity", "l_extendedprice", "l_discount"],
    )
    li = broadcast_join(li, brand_ref, "l_partkey", "p_brand", out_type=pa.string())
    li = broadcast_join(li, size_ref, "l_partkey", "p_size", out_type=pa.int64())

    def partial(b: pa.Table) -> pa.Table:
        brand = b["p_brand"].to_numpy(zero_copy_only=False)
        size = b["p_size"].to_numpy(zero_copy_only=False).astype(np.float64)
        qty = b["l_quantity"].to_numpy(zero_copy_only=False)
        mask = np.zeros(len(brand), dtype=bool)
        for br, slo, shi, qlo, qhi in _Q19_BRACKETS:
            mask |= (
                (brand == br)
                & (size >= slo) & (size <= shi)
                & (qty >= qlo) & (qty <= qhi)
            )
        b = b.filter(pa.array(mask))
        price_c = pc.round(pc.multiply(b["l_extendedprice"], pa.scalar(100.0)))
        disc_c = pc.round(pc.multiply(b["l_discount"], pa.scalar(100.0)))
        rev = pc.multiply(
            price_c.cast(pa.int64()),
            pc.subtract(pa.scalar(100, type=pa.int64()), disc_c.cast(pa.int64())),
        )
        return pa.table(
            {
                "revenue_e4": pa.array(
                    [pc.sum(rev).as_py() or 0], type=pa.int64()
                ),
                "n_items": pa.array([b.num_rows], type=pa.int64()),
            }
        )

    partials = li.map_batches(partial, batch_format="pyarrow", batch_size=None)

    def combine(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "revenue_e4": pa.array(
                    [pc.sum(b["revenue_e4"]).as_py() or 0], type=pa.int64()
                ),
                "n_items": pa.array(
                    [pc.sum(b["n_items"]).as_py() or 0], type=pa.int64()
                ),
            }
        )

    return tree_merge(partials, combine)


Q19_SQL = """
SELECT CAST(SUM(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)
         * (100 - CAST(ROUND(l_discount * 100, 0) AS BIGINT))) AS BIGINT)
         AS revenue_e4,
       CAST(COUNT(*) AS BIGINT) AS n_items
FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
WHERE (p.p_brand = 'Brand#13' AND p.p_size BETWEEN 1 AND 10
       AND l.l_quantity BETWEEN 1 AND 20)
   OR (p.p_brand = 'Brand#20' AND p.p_size BETWEEN 5 AND 25
       AND l.l_quantity BETWEEN 10 AND 35)
   OR (p.p_brand = 'Brand#5' AND p.p_size BETWEEN 15 AND 50
       AND l.l_quantity BETWEEN 25 AND 50)
"""


# ---------------------------------------------------------------------------
# TPC-H Q7: bilateral shipping volume between two nations by order year
# ---------------------------------------------------------------------------

_Q7_NATIONS = ("NATION_3", "NATION_7")


def q_tpch_q7_volume(sf_dir):
    """TPC-H Q7 shape: yearly discounted revenue between two nations
    (supplier side x customer side, both directions). The supplier and
    customer nation attributes ship as broadcast lookups onto the two
    big tables; ONE big-big exchange (lineitem partial-projected x
    orders) carries the join, and the final aggregate is keys x years
    sized."""
    from mimirsbrunn_ray.stages.join import broadcast_join, make_lookup_ref_arrays
    from mimirsbrunn_ray.stages.rollup import tree_merge

    sup = read_dim_table(sf_dir, "supplier", ["s_suppkey", "s_nationkey"])
    cust = read_dim_table(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    nat = read_dim_table(sf_dir, "nation", ["n_nationkey", "n_name"])
    nk = nat["n_nationkey"].to_numpy()
    nv = nat["n_name"].to_numpy(zero_copy_only=False)
    name_of = dict(zip(nk.tolist(), nv.tolist()))

    skey = sup["s_suppkey"].to_numpy()
    so = np.argsort(skey, kind="stable")
    snat = np.array(
        [name_of.get(int(x)) for x in sup["s_nationkey"].to_numpy()], dtype=object
    )
    sup_ref = make_lookup_ref_arrays(skey[so], snat[so])

    ckey = cust["c_custkey"].to_numpy()
    co = np.argsort(ckey, kind="stable")
    cnat = np.array(
        [name_of.get(int(x)) for x in cust["c_nationkey"].to_numpy()], dtype=object
    )
    cust_ref = make_lookup_ref_arrays(ckey[co], cnat[co])

    a, bn = _Q7_NATIONS

    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"],
    )
    li = broadcast_join(li, sup_ref, "l_suppkey", "supp_nation", out_type=pa.string())

    def li_partial(b: pa.Table) -> pa.Table:
        keep = pc.fill_null(
            pc.is_in(b["supp_nation"], value_set=pa.array([a, bn])), False
        )
        b = b.filter(keep)
        price_c = pc.round(pc.multiply(b["l_extendedprice"], pa.scalar(100.0)))
        disc_c = pc.round(pc.multiply(b["l_discount"], pa.scalar(100.0)))
        rev = pc.multiply(
            price_c.cast(pa.int64()),
            pc.subtract(pa.scalar(100, type=pa.int64()), disc_c.cast(pa.int64())),
        )
        t = pa.table(
            {
                "l_orderkey": b["l_orderkey"],
                "supp_nation": b["supp_nation"],
                "rev_e4": rev,
            }
        )
        g = t.group_by(["l_orderkey", "supp_nation"]).aggregate([("rev_e4", "sum")])
        return g.rename_columns(["l_orderkey", "supp_nation", "rev_e4"])

    li = li.map_batches(li_partial, batch_format="pyarrow", batch_size=None)

    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey", "o_orderdate"]
    )
    orders = broadcast_join(
        orders, cust_ref, "o_custkey", "cust_nation", out_type=pa.string()
    )

    def o_proj(b: pa.Table) -> pa.Table:
        keep = pc.fill_null(
            pc.is_in(b["cust_nation"], value_set=pa.array([a, bn])), False
        )
        b = b.filter(keep)
        year = pc.year(b["o_orderdate"]).cast(pa.int64())
        return pa.table(
            {
                "o_orderkey": b["o_orderkey"],
                "cust_nation": b["cust_nation"],
                "o_year": year,
            }
        )

    orders = orders.map_batches(o_proj, batch_format="pyarrow", batch_size=None)

    from mimirsbrunn_ray.context import pool_size

    n_part = max(8, pool_size())
    joined = _safe_join(
        li, orders,
        on=("l_orderkey",),
        right_on=("o_orderkey",),
        join_type="inner",
        num_partitions=n_part,
    )

    def final_partial(b: pa.Table) -> pa.Table:
        # keep only cross-nation flows (supp != cust), both directions
        keep = pc.invert(pc.equal(b["supp_nation"], b["cust_nation"]))
        b = b.filter(pc.fill_null(keep, False))
        g = b.group_by(["supp_nation", "cust_nation", "o_year"]).aggregate(
            [("rev_e4", "sum")]
        )
        return g.rename_columns(
            ["supp_nation", "cust_nation", "o_year", "revenue_e4"]
        )

    partials = joined.map_batches(final_partial, batch_format="pyarrow", batch_size=None)

    def combine(b: pa.Table) -> pa.Table:
        g = b.group_by(["supp_nation", "cust_nation", "o_year"]).aggregate(
            [("revenue_e4", "sum")]
        )
        return g.rename_columns(
            ["supp_nation", "cust_nation", "o_year", "revenue_e4"]
        )

    return tree_merge(partials, combine)


Q7_SQL = """
WITH l AS (
  SELECT l_orderkey, s.s_nationkey AS s_nk,
         CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)
           * (100 - CAST(ROUND(l_discount * 100, 0) AS BIGINT)) AS rev_e4
  FROM lineitem li JOIN supplier s ON s.s_suppkey = li.l_suppkey
)
SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
       CAST(EXTRACT(year FROM o.o_orderdate) AS BIGINT) AS o_year,
       CAST(SUM(l.rev_e4) AS BIGINT) AS revenue_e4
FROM l
JOIN orders o ON o.o_orderkey = l.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation ns ON ns.n_nationkey = l.s_nk
JOIN nation nc ON nc.n_nationkey = c.c_nationkey
WHERE ns.n_name IN ('NATION_3', 'NATION_7')
  AND nc.n_name IN ('NATION_3', 'NATION_7')
  AND ns.n_name <> nc.n_name
GROUP BY 1, 2, 3
"""



# ---------------------------------------------------------------------------
# session duration quantiles (sessionize -> exact PERCENTILE_DISC)
# ---------------------------------------------------------------------------


def q_session_duration_quantiles(sf_dir):
    """Distribution of gap-delimited session durations: the sessionize
    machinery emitting per-session spans (stages/timeseries.
    session_durations) feeding the two-pass exact continuous quantile
    (stages/rollup.exact_continuous_quantile) — no sort shuffle, and the
    p50/p90/p99 results are ACTUAL data elements (bit-exact compare)."""
    from mimirsbrunn_ray.stages.rollup import exact_continuous_quantile
    from mimirsbrunn_ray.stages.timeseries import session_durations

    ev = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id", "ts"])
    durs = session_durations(ev, key="user_id", gap_minutes=30).materialize()
    n = durs.count()
    if n == 0:  # empty-corpus guard: no sessions, no quantiles
        return pa.table({c: pa.array([], pa.int64()) for c in
                         ("n_sessions", "p50_us", "p90_us", "p99_us")})
    p50, p90, p99 = exact_continuous_quantile(
        durs, val_fn=lambda b: b["dur_us"].cast(pa.float64()), qs=(0.5, 0.9, 0.99)
    )
    return pa.table(
        {
            "n_sessions": pa.array([n], pa.int64()),
            "p50_us": pa.array([int(p50)], pa.int64()),
            "p90_us": pa.array([int(p90)], pa.int64()),
            "p99_us": pa.array([int(p99)], pa.int64()),
        }
    )


SESSION_DUR_SQL = """
WITH e AS (
  SELECT user_id, ts,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS new_s
  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
), s AS (
  SELECT user_id, ts,
         SUM(new_s) OVER (
           PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING
         ) AS sid
  FROM e
), d AS (
  SELECT user_id, sid,
         epoch_us(MAX(ts)) - epoch_us(MIN(ts)) AS dur_us
  FROM s GROUP BY user_id, sid
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_sessions,
       CAST(quantile_disc(dur_us, 0.5) AS BIGINT) AS p50_us,
       CAST(quantile_disc(dur_us, 0.9) AS BIGINT) AS p90_us,
       CAST(quantile_disc(dur_us, 0.99) AS BIGINT) AS p99_us
FROM d
"""


# ---------------------------------------------------------------------------
# TPC-H Q6: forecast revenue change (pure filter + decomposable sum)
# ---------------------------------------------------------------------------


def q_tpch_q6_forecast(sf_dir):
    """TPC-H Q6 shape: revenue delta from a discount band in one ship
    year — the purest predicate-pushdown aggregate: column-pruned scan,
    vectorized mask, per-term x1e4 quantization, tree-merged int64 sum.
    Embarrassingly parallel; no shuffle at all."""
    from mimirsbrunn_ray.stages.rollup import tree_merge

    lo = np.datetime64("1997-01-01", "us")
    hi = np.datetime64("1998-01-01", "us")

    def partial(b: pa.Table) -> pa.Table:
        keep = pc.and_(
            pc.and_(
                pc.greater_equal(b["l_shipdate"], pa.scalar(lo)),
                pc.less(b["l_shipdate"], pa.scalar(hi)),
            ),
            pc.and_(
                pc.and_(
                    pc.greater_equal(b["l_discount"], pa.scalar(0.04)),
                    pc.less_equal(b["l_discount"], pa.scalar(0.07)),
                ),
                pc.less(b["l_quantity"], pa.scalar(24.0)),
            ),
        )
        b = b.filter(pc.fill_null(keep, False))
        price_c = pc.round(pc.multiply(b["l_extendedprice"], pa.scalar(100.0)))
        disc_c = pc.round(pc.multiply(b["l_discount"], pa.scalar(100.0)))
        rev = pc.multiply(price_c.cast(pa.int64()), disc_c.cast(pa.int64()))
        return pa.table(
            {
                "revenue_e4": pa.array([pc.sum(rev).as_py() or 0], type=pa.int64()),
                "n_items": pa.array([b.num_rows], type=pa.int64()),
            }
        )

    def combine(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "revenue_e4": pa.array(
                    [pc.sum(b["revenue_e4"]).as_py() or 0], type=pa.int64()
                ),
                "n_items": pa.array([pc.sum(b["n_items"]).as_py() or 0], type=pa.int64()),
            }
        )

    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_shipdate", "l_discount", "l_quantity", "l_extendedprice"],
    )
    return tree_merge(li.map_batches(partial, batch_format="pyarrow", batch_size=None), combine)


Q6_SQL = """
SELECT CAST(SUM(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)
             * CAST(ROUND(l_discount * 100, 0) AS BIGINT)) AS BIGINT)
         AS revenue_e4,
       CAST(COUNT(*) AS BIGINT) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01'
  AND l_shipdate < TIMESTAMP '1998-01-01'
  AND l_discount BETWEEN 0.04 AND 0.07
  AND l_quantity < 24
"""


# ---------------------------------------------------------------------------
# TPC-H Q13: customer order-count distribution (incl. zero-order row)
# ---------------------------------------------------------------------------


def q_tpch_q13_custdist(sf_dir):
    """TPC-H Q13 shape: how many customers placed k orders, INCLUDING
    k = 0 — the LEFT OUTER JOIN + double aggregate. Combiner-first
    per-custkey order counts (tree-merged), a broadcast customer-keyset
    semi filter (the dimension side, FK-validating the fact side), a
    second tiny count-of-counts aggregate, and the zero row derived as
    |customer| - |custkeys with orders| (exactly the outer join's
    unmatched set) without ever shuffling the customer table."""
    import pyarrow.parquet as _pq

    from mimirsbrunn_ray.stages.rollup import tree_merge

    cust_keys = read_dim_table(sf_dir, "customer", ["c_custkey"])["c_custkey"].combine_chunks()
    n_cust = len(cust_keys) - cust_keys.null_count

    def partial(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_valid(b["o_custkey"]))
        g = b.group_by(["o_custkey"]).aggregate([([], "count_all")])
        return g.rename_columns(["o_custkey", "n"])

    counts = tree_merge(
        rd.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_custkey"]).map_batches(
            partial, batch_format="pyarrow", batch_size=None
        ),
        lambda b: b.group_by(["o_custkey"])
        .aggregate([("n", "sum")])
        .rename_columns(["o_custkey", "n"]),
        final_shards=4,
        shard_cols=["o_custkey"],
    )

    def dist_partial(b: pa.Table) -> pa.Table:
        keep = pc.fill_null(pc.is_in(b["o_custkey"], value_set=cust_keys), False)
        b = b.filter(keep)
        g = b.group_by(["n"]).aggregate([([], "count_all")])
        return g.rename_columns(["c_count", "custdist"])

    dist = tree_merge(
        counts.map_batches(dist_partial, batch_format="pyarrow", batch_size=None),
        lambda b: b.group_by(["c_count"])
        .aggregate([("custdist", "sum")])
        .rename_columns(["c_count", "custdist"]),
    )

    from mimirsbrunn_ray.stages.broadcast import collect_typed

    tbl = collect_typed(dist, pa.schema([("c_count", pa.int64()),
                                         ("custdist", pa.int64())]))
    matched = pc.sum(tbl["custdist"]).as_py() or 0
    n_zero = n_cust - matched
    if n_zero > 0:
        tbl = pa.concat_tables(
            [
                tbl.select(["c_count", "custdist"]),
                pa.table(
                    {
                        "c_count": pa.array([0], type=tbl["c_count"].type),
                        "custdist": pa.array([n_zero], type=tbl["custdist"].type),
                    }
                ),
            ]
        )
    return tbl.set_column(
        0, "c_count", tbl["c_count"].cast(pa.int64())
    ).set_column(1, "custdist", tbl["custdist"].cast(pa.int64()))


Q13_SQL = """
WITH c_orders AS (
  SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
  FROM customer c LEFT OUTER JOIN orders o ON o.o_custkey = c.c_custkey
  GROUP BY c.c_custkey
)
SELECT CAST(c_count AS BIGINT) AS c_count,
       CAST(COUNT(*) AS BIGINT) AS custdist
FROM c_orders GROUP BY c_count
"""



# ---------------------------------------------------------------------------
# Bollinger bands (trailing mean +/- 2 sigma at bucket grain)
# ---------------------------------------------------------------------------


def q_bollinger_bands(sf_dir):
    """Trailing-4h Bollinger bands per event type — integer window
    state (n, sum, sum-of-squares of x100 values), every float derived
    by the oracle's exact IEEE expression tree
    (stages/timeseries.bollinger_bands)."""
    from mimirsbrunn_ray.stages.timeseries import bollinger_bands

    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "ts", "value"]
    )
    return bollinger_bands(ev, key="event_type", freq="h", window_buckets=4)


BOLLINGER_SQL = """
WITH g AS (
  SELECT event_type, date_trunc('hour', ts) AS bucket,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT) AS sx,
         CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)
                  * CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT) AS sxx
  FROM events
  WHERE event_type IS NOT NULL AND ts IS NOT NULL AND value IS NOT NULL
  GROUP BY 1, 2
), w AS (
  SELECT event_type, bucket,
         CAST(SUM(n) OVER win AS BIGINT) AS wn,
         CAST(SUM(sx) OVER win AS BIGINT) AS wsx,
         CAST(SUM(sxx) OVER win AS BIGINT) AS wsxx
  FROM g
  WINDOW win AS (
    PARTITION BY event_type ORDER BY bucket
    RANGE BETWEEN INTERVAL 3 HOUR PRECEDING AND CURRENT ROW
  )
), f AS (
  SELECT event_type, bucket, wn AS roll_n,
         CAST(wsx AS DOUBLE) / wn AS mean_x100,
         sqrt(GREATEST(
           (CAST(wn AS DOUBLE) * wsxx - CAST(wsx AS DOUBLE) * wsx)
             / (CAST(wn AS DOUBLE) * wn),
           0.0
         )) AS std_x100
  FROM w
)
SELECT event_type, bucket, roll_n, mean_x100, std_x100,
       mean_x100 + 2.0 * std_x100 AS upper_x100,
       mean_x100 - 2.0 * std_x100 AS lower_x100
FROM f
"""


# ---------------------------------------------------------------------------
# event-type co-occurrence PMI (bitmask distinct-set trick)
# ---------------------------------------------------------------------------


def q_event_type_pmi(sf_dir):
    """Pointwise mutual information between event-type PAIRS over user
    sets: which behaviors co-occur in the same users beyond chance — the
    association-mining complement of the funnel/path queries, and the
    same shape LLM-curation uses for tag/topic co-occurrence.

    Scale shape: the only per-user state is ONE int64 bitmask (type
    domain is small and known: one tiny distinct scan first). Batches
    collapse to distinct (user, bit) pairs, one tree-merge ORs masks per
    user (shard-exact), a second tiny aggregate histograms the <= 2^T
    distinct masks, and the pair PMI table is computed from that
    bounded histogram — no self-join, nothing user-count-sized beyond
    the mask table.

    Output per unordered pair (ta < tb): n_both, n_a, n_b, n_users,
    pmi_x1e6 (FLOOR(ln(n_both*n_users/(n_a*n_b)) * 1e6 + 0.5), the
    tfidf ln convention).
    """
    import math

    from mimirsbrunn_ray.stages.rollup import tree_merge

    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "event_type"]
    )

    types = sorted(
        x
        for x in {
            t.as_py()
            for b in ev.map_batches(
                lambda b: pa.table(
                    {"event_type": b["event_type"].unique()}
                ),
                batch_format="pyarrow",
                batch_size=None,
            ).iter_batches(batch_format="pyarrow")
            for t in b["event_type"]
        }
        if x is not None
    )
    bit_of = {t: 1 << i for i, t in enumerate(types)}

    def mask_partial(b: pa.Table) -> pa.Table:
        b = b.filter(
            pc.and_(pc.is_valid(b["user_id"]), pc.is_valid(b["event_type"]))
        )
        d = b.group_by(["user_id", "event_type"]).aggregate([])
        users = d["user_id"].to_numpy()
        bits = np.array(
            [bit_of[t] for t in d["event_type"].to_pylist()], dtype=np.int64
        )
        order = np.argsort(users, kind="stable")
        users, bits = users[order], bits[order]
        starts = np.empty(len(users), dtype=bool)
        if len(users):
            starts[0] = True
            starts[1:] = users[1:] != users[:-1]
            mask = np.bitwise_or.reduceat(bits, np.flatnonzero(starts))
            users = users[starts]
        else:
            mask = bits
        return pa.table(
            {"user_id": pa.array(users), "mask": pa.array(mask, pa.int64())}
        )

    def mask_combine(b: pa.Table) -> pa.Table:
        users = b["user_id"].to_numpy()
        bits = b["mask"].to_numpy()
        order = np.argsort(users, kind="stable")
        users, bits = users[order], bits[order]
        if len(users) == 0:
            return b
        starts = np.empty(len(users), dtype=bool)
        starts[0] = True
        starts[1:] = users[1:] != users[:-1]
        mask = np.bitwise_or.reduceat(bits, np.flatnonzero(starts))
        return pa.table(
            {
                "user_id": pa.array(users[starts]),
                "mask": pa.array(mask, pa.int64()),
            }
        )

    masks = tree_merge(
        ev.map_batches(mask_partial, batch_format="pyarrow", batch_size=None),
        mask_combine,
        final_shards=8,
        shard_cols=["user_id"],
    )

    hist = tree_merge(
        masks.map_batches(
            lambda b: b.group_by(["mask"])
            .aggregate([([], "count_all")])
            .rename_columns(["mask", "cnt"]),
            batch_format="pyarrow",
            batch_size=None,
        ),
        lambda b: b.group_by(["mask"])
        .aggregate([("cnt", "sum")])
        .rename_columns(["mask", "cnt"]),
    )
    from mimirsbrunn_ray.stages.broadcast import collect_typed

    h = collect_typed(hist, pa.schema([("mask", pa.int64()),
                                       ("cnt", pa.int64())]))
    mvals = h["mask"].to_numpy()
    mcnts = h["cnt"].to_numpy()
    n_users = int(mcnts.sum())

    rows = []
    for i, ta in enumerate(types):
        for j in range(i + 1, len(types)):
            tb = types[j]
            ba, bb = 1 << i, 1 << j
            n_a = int(mcnts[(mvals & ba) != 0].sum())
            n_b = int(mcnts[(mvals & bb) != 0].sum())
            n_both = int(mcnts[((mvals & ba) != 0) & ((mvals & bb) != 0)].sum())
            if n_both == 0:
                continue
            pmi = math.log(
                (float(n_both) * float(n_users)) / (float(n_a) * float(n_b))
            )
            rows.append(
                (ta, tb, n_both, n_a, n_b, n_users, int(math.floor(pmi * 1e6 + 0.5)))
            )
    cols = list(zip(*rows)) if rows else [[]] * 7
    return pa.table(
        {
            "ta": pa.array(list(cols[0]), pa.string()),
            "tb": pa.array(list(cols[1]), pa.string()),
            "n_both": pa.array(list(cols[2]), pa.int64()),
            "n_a": pa.array(list(cols[3]), pa.int64()),
            "n_b": pa.array(list(cols[4]), pa.int64()),
            "n_users": pa.array(list(cols[5]), pa.int64()),
            "pmi_x1e6": pa.array(list(cols[6]), pa.int64()),
        }
    )


PMI_SQL = """
WITH ut AS (
  SELECT DISTINCT user_id, event_type FROM events
  WHERE user_id IS NOT NULL AND event_type IS NOT NULL
), nu AS (SELECT COUNT(DISTINCT user_id) AS n_users FROM ut),
m AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS cnt1 FROM ut GROUP BY 1),
p AS (
  SELECT a.event_type AS ta, b.event_type AS tb,
         CAST(COUNT(*) AS BIGINT) AS n_both
  FROM ut a JOIN ut b USING (user_id)
  WHERE a.event_type < b.event_type
  GROUP BY 1, 2
)
SELECT p.ta, p.tb, p.n_both,
       ma.cnt1 AS n_a, mb.cnt1 AS n_b,
       CAST(nu.n_users AS BIGINT) AS n_users,
       CAST(FLOOR(ln(
         (CAST(p.n_both AS DOUBLE) * nu.n_users)
           / (CAST(ma.cnt1 AS DOUBLE) * mb.cnt1)
       ) * 1e6 + 0.5) AS BIGINT) AS pmi_x1e6
FROM p
JOIN m ma ON ma.event_type = p.ta
JOIN m mb ON mb.event_type = p.tb
CROSS JOIN nu
"""


# ---------------------------------------------------------------------------
# diurnal profile (hour-of-day seasonality per event type)
# ---------------------------------------------------------------------------


def q_diurnal_profile(sf_dir):
    """Mean value by (event_type, hour-of-day 0-23) — the diurnal
    seasonality profile a downsampling engine derives before fitting
    capacity baselines. Combiner-first x100 integer partials per
    (type, hod) inside map_batches (24 x |types| rows leave any block),
    tree-merged; the mean is one double division from identical int64
    operands."""
    from mimirsbrunn_ray.stages.rollup import tree_merge
    from mimirsbrunn_ray.stages.timeseries import _round_half_away_x

    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "ts", "value"]
    )

    def partial(b: pa.Table) -> pa.Table:
        b = b.filter(
            pc.and_(
                pc.and_(pc.is_valid(b["event_type"]), pc.is_valid(b["ts"])),
                pc.is_valid(b["value"]),
            )
        )
        v100 = _round_half_away_x(
            b["value"].to_numpy(zero_copy_only=False).astype(np.float64), 100.0
        )
        t = pa.table(
            {
                "event_type": b["event_type"],
                "hod": pc.hour(b["ts"]).cast(pa.int64()),
                "v": pa.array(v100),
            }
        )
        g = t.group_by(["event_type", "hod"]).aggregate(
            [("v", "sum"), ("v", "count")]
        )
        return g.rename_columns(["event_type", "hod", "sum_x100", "n"])

    def combine(b: pa.Table) -> pa.Table:
        g = b.group_by(["event_type", "hod"]).aggregate(
            [("sum_x100", "sum"), ("n", "sum")]
        )
        return g.rename_columns(["event_type", "hod", "sum_x100", "n"])

    agg = tree_merge(
        ev.map_batches(partial, batch_format="pyarrow", batch_size=None), combine
    )

    def finish(b: pa.Table) -> pa.Table:
        sx = b["sum_x100"].to_numpy(zero_copy_only=False).astype(np.float64)
        n = b["n"].to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table(
            {
                "event_type": b["event_type"],
                "hod": b["hod"],
                "n": b["n"].cast(pa.int64()),
                "sum_x100": b["sum_x100"].cast(pa.int64()),
                "mean_x100": pa.array(sx / n, pa.float64()),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow", batch_size=None)


DIURNAL_SQL = """
SELECT event_type, CAST(EXTRACT(hour FROM ts) AS BIGINT) AS hod,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT) AS sum_x100,
       CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS DOUBLE)
         / COUNT(*) AS mean_x100
FROM events
WHERE event_type IS NOT NULL AND ts IS NOT NULL AND value IS NOT NULL
GROUP BY 1, 2
"""



# ---------------------------------------------------------------------------
# integer-exact PageRank (iterative algorithm with an unrolled SQL oracle)
# ---------------------------------------------------------------------------


def q_part_pagerank(sf_dir):
    """3-iteration PageRank over the same deterministic multi-parent DAG
    as part_dep_closure (k -> k//2 and k -> k//3): the iterative-
    algorithm shape, made value-exactly verifiable by running the power
    iteration entirely in int64 arithmetic (floor-div shares, additive
    sums) so an UNROLLED recursive-free SQL oracle reproduces it bit for
    bit (stages/hierarchy.integer_pagerank)."""
    from mimirsbrunn_ray.stages.hierarchy import integer_pagerank

    part = rd.read_parquet(f"{sf_dir}/part.parquet", columns=["p_partkey"])
    _mx_raw = part.max("p_partkey")
    mx = int(_mx_raw) if _mx_raw is not None else 0
    ks = np.arange(2, mx + 1, dtype=np.int64)
    src = np.concatenate([ks, ks[ks >= 3]])
    dst = np.concatenate([ks // 2, ks[ks >= 3] // 3])
    pr = integer_pagerank(part, src, dst, node_col="p_partkey", iters=3)
    return pr.map_batches(
        lambda b: b.rename_columns(["node", "pr"]),
        batch_format="pyarrow",
        batch_size=None,
    ).sort("node")


_PR_ITER = """
it{n} AS (
  SELECT n.v, 150000000 + COALESCE(SUM((p.pr * 85) // (d.deg * 100)), 0) AS pr
  FROM nodes n
  LEFT JOIN edges e ON e.dst = n.v
  LEFT JOIN it{m} p ON p.v = e.src
  LEFT JOIN deg d ON d.src = e.src
  GROUP BY n.v
)"""

PAGERANK_SQL = (
    """
WITH nodes AS (
  SELECT p_partkey AS v FROM part WHERE p_partkey IS NOT NULL
),
edges AS (
  SELECT p_partkey AS src, p_partkey // 2 AS dst FROM part WHERE p_partkey >= 2
  UNION ALL
  SELECT p_partkey, p_partkey // 3 FROM part WHERE p_partkey >= 3
),
deg AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS deg FROM edges GROUP BY src),
it0 AS (SELECT v, CAST(1000000000 AS BIGINT) AS pr FROM nodes),"""
    + _PR_ITER.format(n=1, m=0)
    + ","
    + _PR_ITER.format(n=2, m=1)
    + ","
    + _PR_ITER.format(n=3, m=2)
    + """
SELECT v AS node, CAST(pr AS BIGINT) AS pr FROM it3 ORDER BY node
"""
)



# ---------------------------------------------------------------------------
# chi-square independence test (event_type x hour-of-day)
# ---------------------------------------------------------------------------


def q_chi2_type_hour(sf_dir):
    """Pearson chi-square independence statistic for the event_type x
    hour-of-day contingency table — is behavior diurnal?  Counting is
    the distributed part (combiner-first partials per (type, hod),
    tree-merged); the |types| x 24 table is then completed with its
    structural zero cells and reduced with the oracle's exact per-cell
    IEEE expression, each cell snapped to x1e6 int64 BEFORE the final
    sum (order-free)."""
    from mimirsbrunn_ray.stages.rollup import tree_merge

    ev = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_type", "ts"])

    def partial(b: pa.Table) -> pa.Table:
        b = b.filter(pc.and_(pc.is_valid(b["event_type"]), pc.is_valid(b["ts"])))
        t = pa.table(
            {
                "event_type": b["event_type"],
                "hod": pc.hour(b["ts"]).cast(pa.int64()),
            }
        )
        g = t.group_by(["event_type", "hod"]).aggregate([([], "count_all")])
        return g.rename_columns(["event_type", "hod", "o"])

    counts = tree_merge(
        ev.map_batches(partial, batch_format="pyarrow", batch_size=None),
        lambda b: b.group_by(["event_type", "hod"])
        .aggregate([("o", "sum")])
        .rename_columns(["event_type", "hod", "o"]),
    )
    from mimirsbrunn_ray.stages.broadcast import collect_typed

    tbl = collect_typed(counts, pa.schema([
        ("event_type", pa.string()), ("hod", pa.int64()),
        ("o", pa.int64())]))
    df = tbl.to_pandas()
    pivot = df.pivot_table(
        index="event_type", columns="hod", values="o", fill_value=0, aggfunc="sum"
    )
    O = pivot.to_numpy(dtype=np.int64)
    rt = O.sum(axis=1)
    ct = O.sum(axis=0)
    n = int(O.sum())
    rt_f = rt.astype(np.float64)[:, None]
    ct_f = ct.astype(np.float64)[None, :]
    e = (rt_f * ct_f) / float(n)
    diff = O.astype(np.float64) - e
    contrib = (diff * diff) / e
    cells = np.floor(contrib * 1e6 + 0.5).astype(np.int64)
    chi2 = int(cells.sum())
    dof = (O.shape[0] - 1) * (O.shape[1] - 1)
    return pa.table(
        {
            "chi2_x1e6": pa.array([chi2], pa.int64()),
            "dof": pa.array([dof], pa.int64()),
            "n": pa.array([n], pa.int64()),
        }
    )


CHI2_SQL = """
WITH c AS (
  SELECT event_type, CAST(EXTRACT(hour FROM ts) AS BIGINT) AS hod,
         CAST(COUNT(*) AS BIGINT) AS o
  FROM events WHERE event_type IS NOT NULL AND ts IS NOT NULL
  GROUP BY 1, 2
), rt AS (SELECT event_type, CAST(SUM(o) AS BIGINT) AS rt FROM c GROUP BY 1),
ct AS (SELECT hod, CAST(SUM(o) AS BIGINT) AS ct FROM c GROUP BY 1),
tot AS (SELECT CAST(SUM(o) AS BIGINT) AS n FROM c),
cells AS (
  SELECT COALESCE(c.o, 0) AS o, r.rt, cc.ct
  FROM rt r CROSS JOIN ct cc
  LEFT JOIN c ON c.event_type = r.event_type AND c.hod = cc.hod
)
SELECT CAST(SUM(CAST(FLOOR(
         ((CAST(o AS DOUBLE) - (CAST(rt AS DOUBLE) * ct) / (SELECT n FROM tot))
          * (CAST(o AS DOUBLE) - (CAST(rt AS DOUBLE) * ct) / (SELECT n FROM tot)))
         / ((CAST(rt AS DOUBLE) * ct) / (SELECT n FROM tot)) * 1e6 + 0.5
       ) AS BIGINT)) AS BIGINT) AS chi2_x1e6,
       CAST(((SELECT COUNT(*) FROM rt) - 1)
            * ((SELECT COUNT(*) FROM ct) - 1) AS BIGINT) AS dof,
       (SELECT n FROM tot) AS n
FROM cells
"""


# ---------------------------------------------------------------------------
# LTTB visualization downsampling (rows-only: algorithmic selection)
# ---------------------------------------------------------------------------


def q_lttb_value_series(sf_dir):
    """LTTB-downsampled hourly mean-value series per event type
    (stages/timeseries.lttb_downsample) — rows-only (the triangle-area
    selection rule is not SQL-expressible); invariants (endpoints kept,
    exact point budget, spike preservation, determinism) pinned in
    tests/test_timeseries.py."""
    from mimirsbrunn_ray.stages.timeseries import lttb_downsample

    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "ts", "value"]
    )
    return lttb_downsample(
        ev, key="event_type", freq="h", target_points=50
    )


def register_ts(queries: dict, oracles: dict) -> None:
    queries.update(
        {
            "counter_increase_hourly": q_counter_increase,
            "ohlc_bars_hourly": q_ohlc_bars,
            "ewma_trailing_per_type": q_ewma_trailing,
            "sliding_active_users_2h": q_sliding_active_users,
            "day_over_day_value": q_day_over_day,
            "pareto_front_parts": q_pareto_parts,
            "tpch_q10_returns": q_tpch_q10_returns,
            "tpch_q19_brackets": q_tpch_q19_brackets,
            "tpch_q7_nation_volume": q_tpch_q7_volume,
            "session_duration_quantiles": q_session_duration_quantiles,
            "tpch_q6_forecast": q_tpch_q6_forecast,
            "tpch_q13_custdist": q_tpch_q13_custdist,
            "bollinger_bands_4h": q_bollinger_bands,
            "event_type_pmi": q_event_type_pmi,
            "diurnal_profile": q_diurnal_profile,
            "part_pagerank": q_part_pagerank,
            "chi2_type_hour": q_chi2_type_hour,
            "lttb_value_series": q_lttb_value_series,
        }
    )
    oracles.update(
        {
            "counter_increase_hourly": COUNTER_INCREASE_SQL,
            "ohlc_bars_hourly": OHLC_SQL,
            "ewma_trailing_per_type": EWMA_SQL,
            "sliding_active_users_2h": SLIDING_DISTINCT_SQL,
            "day_over_day_value": DOD_SQL,
            "pareto_front_parts": PARETO_SQL,
            "tpch_q10_returns": Q10_SQL,
            "tpch_q19_brackets": Q19_SQL,
            "tpch_q7_nation_volume": Q7_SQL,
            "session_duration_quantiles": SESSION_DUR_SQL,
            "tpch_q6_forecast": Q6_SQL,
            "tpch_q13_custdist": Q13_SQL,
            "bollinger_bands_4h": BOLLINGER_SQL,
            "event_type_pmi": PMI_SQL,
            "diurnal_profile": DIURNAL_SQL,
            "part_pagerank": PAGERANK_SQL,
            "chi2_type_hour": CHI2_SQL,
        }
    )
