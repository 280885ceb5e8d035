"""Round-4 batch P: RFM customer segmentation over exact quantile
boundaries, order->first-ship latency quantiles, cross-source duplicate
share, and first-seen property-value novelty.

Exactness discipline: all per-row values quantize once at the raw grain
(x100 money, epoch-day ints, exact counts); quantile BOUNDARIES are
PERCENTILE_DISC elements (actual data values selected by the
exact_continuous_quantile two-pass machinery), so both engines classify
against identical integers and every output cell is an exact count.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd
from mimirsbrunn_ray.stages.broadcast import safe_join as _safe_join

from mimirsbrunn_ray.functions.timeutil import trunc_us, ts_array
from mimirsbrunn_ray.stages.dedup import _BUCKET, add_bucket
from mimirsbrunn_ray.stages.rollup import tree_merge

_DAY_US = 86_400_000_000


def _not_null(b: pa.Table, cols) -> pa.Table:
    m = None
    for c in cols:
        v = pc.is_valid(b[c])
        m = v if m is None else pc.and_(m, v)
    return b.filter(m)


def _round_half_away(x: np.ndarray) -> np.ndarray:
    return np.where(
        x >= 0, np.floor(x + 0.5), np.ceil(x - 0.5)
    ).astype(np.int64)


# ---------------------------------------------------------------------------
# RFM segmentation with exact PERCENTILE_DISC quintile boundaries
# ---------------------------------------------------------------------------

_RFM_QS = (0.2, 0.4, 0.6, 0.8)


def q_rfm_segments(sf_dir):
    """Classic RFM segmentation: per customer compute Recency (epoch
    day of the last order), Frequency (order count) and Monetary (x100
    total spend, quantized per order), find each dimension's exact
    PERCENTILE_DISC quintile boundaries, and count customers per
    (r_seg, f_seg, m_seg) cell (seg = 1 + #boundaries strictly below
    the value — identical tie semantics both engines). Scale shape:
    orders collapse combiner-first into one row per customer
    (customer-sharded tree merge); the three boundary searches run the
    exact_continuous_quantile two-pass selection over that reduced
    table (driver state = one coarse histogram per pass); the final
    cell count is a 125-row-bounded aggregate against 12 broadcast
    boundary integers."""
    from mimirsbrunn_ray.stages.rollup import exact_continuous_quantile

    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_orderdate", "o_totalprice"],
    )

    def partial(b: pa.Table) -> pa.Table:
        b = _not_null(b, ("o_custkey", "o_orderdate", "o_totalprice"))
        us = b["o_orderdate"].cast(pa.timestamp("us")).cast(pa.int64())
        day = pc.divide(us, _DAY_US)
        price = _round_half_away(
            b["o_totalprice"].to_numpy(zero_copy_only=False).astype(
                np.float64
            )
            * 100.0
        )
        t = pa.table(
            {
                "c": b["o_custkey"],
                "one": pa.array(np.ones(b.num_rows, dtype=np.int64)),
                "d": day,
                "m": pa.array(price),
            }
        )
        g = t.group_by(["c"]).aggregate(
            [("one", "sum"), ("d", "max"), ("m", "sum")]
        )
        g = g.select(["c", "one_sum", "d_max", "m_sum"])
        return g.rename_columns(["c", "f", "r", "m"])

    def combine(b: pa.Table) -> pa.Table:
        g = b.group_by(["c"]).aggregate(
            [("f", "sum"), ("r", "max"), ("m", "sum")]
        )
        g = g.select(["c", "f_sum", "r_max", "m_sum"])
        return g.rename_columns(["c", "f", "r", "m"])

    cust = tree_merge(
        orders.map_batches(partial, batch_format="pyarrow", batch_size=None),
        combine,
        final_shards=8,
        shard_cols=["c"],
    ).materialize()  # reused by three quantile passes + the classify pass

    bounds = {}
    for col in ("r", "f", "m"):
        bounds[col] = exact_continuous_quantile(
            cust,
            lambda b, col=col: b[col],  # int64 -> exact float64 inside
            qs=_RFM_QS,
        )

    def classify(b: pa.Table) -> pa.Table:
        seg = {}
        for col in ("r", "f", "m"):
            v = b[col].cast(pa.int64()).to_numpy(zero_copy_only=False)
            s = np.ones(len(v), dtype=np.int64)
            for bd in bounds[col]:
                s += (v > bd).astype(np.int64)
            seg[col] = s
        t = pa.table(
            {
                "r_seg": pa.array(seg["r"]),
                "f_seg": pa.array(seg["f"]),
                "m_seg": pa.array(seg["m"]),
                "one": pa.array(np.ones(b.num_rows, dtype=np.int64)),
            }
        )
        g = t.group_by(["r_seg", "f_seg", "m_seg"]).aggregate(
            [("one", "sum")]
        )
        g = g.select(["r_seg", "f_seg", "m_seg", "one_sum"])
        return g.rename_columns(["r_seg", "f_seg", "m_seg", "n_customers"])

    def combine_cells(b: pa.Table) -> pa.Table:
        g = b.group_by(["r_seg", "f_seg", "m_seg"]).aggregate(
            [("n_customers", "sum")]
        )
        g = g.select(["r_seg", "f_seg", "m_seg", "n_customers_sum"])
        return g.rename_columns(["r_seg", "f_seg", "m_seg", "n_customers"])

    out = tree_merge(
        cust.map_batches(classify, batch_format="pyarrow", batch_size=None),
        combine_cells,
    )

    def finish(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "r_seg": b["r_seg"].cast(pa.int64()),
                "f_seg": b["f_seg"].cast(pa.int64()),
                "m_seg": b["m_seg"].cast(pa.int64()),
                "n_customers": b["n_customers"].cast(pa.int64()),
            }
        )

    return out.map_batches(finish, batch_format="pyarrow", batch_size=None)


RFM_SQL = """
WITH c AS MATERIALIZED (
  SELECT o_custkey,
         CAST(epoch(date_trunc('day', MAX(o_orderdate))) // 86400 AS BIGINT)
           AS r,
         CAST(COUNT(*) AS BIGINT) AS f,
         CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
           AS m
  FROM orders
  WHERE o_custkey IS NOT NULL AND o_orderdate IS NOT NULL
    AND o_totalprice IS NOT NULL
  GROUP BY 1
), b AS MATERIALIZED (
  SELECT
    PERCENTILE_DISC(0.2) WITHIN GROUP (ORDER BY r) AS r1,
    PERCENTILE_DISC(0.4) WITHIN GROUP (ORDER BY r) AS r2,
    PERCENTILE_DISC(0.6) WITHIN GROUP (ORDER BY r) AS r3,
    PERCENTILE_DISC(0.8) WITHIN GROUP (ORDER BY r) AS r4,
    PERCENTILE_DISC(0.2) WITHIN GROUP (ORDER BY f) AS f1,
    PERCENTILE_DISC(0.4) WITHIN GROUP (ORDER BY f) AS f2,
    PERCENTILE_DISC(0.6) WITHIN GROUP (ORDER BY f) AS f3,
    PERCENTILE_DISC(0.8) WITHIN GROUP (ORDER BY f) AS f4,
    PERCENTILE_DISC(0.2) WITHIN GROUP (ORDER BY m) AS m1,
    PERCENTILE_DISC(0.4) WITHIN GROUP (ORDER BY m) AS m2,
    PERCENTILE_DISC(0.6) WITHIN GROUP (ORDER BY m) AS m3,
    PERCENTILE_DISC(0.8) WITHIN GROUP (ORDER BY m) AS m4
  FROM c
)
SELECT
  CAST(1 + CASE WHEN c.r > b.r1 THEN 1 ELSE 0 END
         + CASE WHEN c.r > b.r2 THEN 1 ELSE 0 END
         + CASE WHEN c.r > b.r3 THEN 1 ELSE 0 END
         + CASE WHEN c.r > b.r4 THEN 1 ELSE 0 END AS BIGINT) AS r_seg,
  CAST(1 + CASE WHEN c.f > b.f1 THEN 1 ELSE 0 END
         + CASE WHEN c.f > b.f2 THEN 1 ELSE 0 END
         + CASE WHEN c.f > b.f3 THEN 1 ELSE 0 END
         + CASE WHEN c.f > b.f4 THEN 1 ELSE 0 END AS BIGINT) AS f_seg,
  CAST(1 + CASE WHEN c.m > b.m1 THEN 1 ELSE 0 END
         + CASE WHEN c.m > b.m2 THEN 1 ELSE 0 END
         + CASE WHEN c.m > b.m3 THEN 1 ELSE 0 END
         + CASE WHEN c.m > b.m4 THEN 1 ELSE 0 END AS BIGINT) AS m_seg,
  CAST(COUNT(*) AS BIGINT) AS n_customers
FROM c, b
GROUP BY 1, 2, 3
"""


# ---------------------------------------------------------------------------
# order -> first-ship latency quantiles per priority
# ---------------------------------------------------------------------------

_SHIP_QS = (0.5, 0.9)


def q_ship_latency_quantiles(sf_dir):
    """Per order priority: exact PERCENTILE_DISC p50/p90 of the
    order-date -> FIRST-ship-date latency in whole days — the
    fulfillment SLA readout. Scale shape: lineitem collapses
    combiner-first to one MIN(shipdate) row per order (order-sharded
    tree merge); one hash join attaches (priority, orderdate); latencies
    collapse to the bounded (priority, days) histogram, and the
    quantile walk runs on that tiny final block — no sort shuffle
    anywhere."""
    from mimirsbrunn_ray.context import pool_size

    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_shipdate"]
    )

    def lpartial(b: pa.Table) -> pa.Table:
        b = _not_null(b, ("l_orderkey", "l_shipdate"))
        us = b["l_shipdate"].cast(pa.timestamp("us")).cast(pa.int64())
        t = pa.table({"l_orderkey": b["l_orderkey"], "s": us})
        g = t.group_by(["l_orderkey"]).aggregate([("s", "min")])
        return g.select(["l_orderkey", "s_min"]).rename_columns(
            ["l_orderkey", "s"]
        )

    def lcombine(b: pa.Table) -> pa.Table:
        g = b.group_by(["l_orderkey"]).aggregate([("s", "min")])
        return g.select(["l_orderkey", "s_min"]).rename_columns(
            ["l_orderkey", "s"]
        )

    first_ship = tree_merge(
        li.map_batches(lpartial, batch_format="pyarrow", batch_size=None),
        lcombine,
        final_shards=8,
        shard_cols=["l_orderkey"],
    )

    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderdate", "o_orderpriority"],
    ).map_batches(
        lambda b: _not_null(b, ("o_orderkey", "o_orderdate")),
        batch_format="pyarrow",
        batch_size=None,
    )

    n = max(4, pool_size())
    joined = _safe_join(
        first_ship, orders,
        on=("l_orderkey",),
        right_on=("o_orderkey",),
        join_type="inner",
        num_partitions=n,
    )

    def to_hist(b: pa.Table) -> pa.Table:
        s = b["s"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        o = (
            b["o_orderdate"].cast(pa.timestamp("us")).cast(pa.int64())
            .to_numpy(zero_copy_only=False)
        )
        days = s // _DAY_US - o // _DAY_US
        t = pa.table(
            {
                "priority": b["o_orderpriority"],
                "days": pa.array(days.astype(np.int64)),
            }
        )
        g = t.group_by(["priority", "days"]).aggregate([([], "count_all")])
        return g.select(["priority", "days", "count_all"]).rename_columns(
            ["priority", "days", "c"]
        )

    def combine_h(b: pa.Table) -> pa.Table:
        g = b.group_by(["priority", "days"]).aggregate([("c", "sum")])
        return g.select(["priority", "days", "c_sum"]).rename_columns(
            ["priority", "days", "c"]
        )

    hist = tree_merge(
        joined.map_batches(to_hist, batch_format="pyarrow", batch_size=None),
        combine_h,
    ).to_pandas()  # bounded: priorities x distinct day latencies
    if "priority" not in hist.columns:  # fully-empty input short-circuit
        hist = pd.DataFrame({"priority": [], "days": [], "c": []})
    rows = {"priority": [], "n_orders": [], "p50_days": [], "p90_days": []}
    for pri, sub in hist.groupby("priority", sort=True):
        sub = sub.sort_values("days")
        vals = sub["days"].to_numpy(dtype=np.int64)
        cum = np.cumsum(sub["c"].to_numpy(dtype=np.int64))
        n_tot = int(cum[-1])
        picks = []
        for q in _SHIP_QS:
            rank = int(np.ceil(q * n_tot))  # PERCENTILE_DISC rank rule
            picks.append(int(vals[np.searchsorted(cum, rank, side="left")]))
        rows["priority"].append(pri)
        rows["n_orders"].append(n_tot)
        rows["p50_days"].append(picks[0])
        rows["p90_days"].append(picks[1])
    return pa.table(
        {
            "priority": pa.array(rows["priority"], pa.string()),
            "n_orders": pa.array(rows["n_orders"], pa.int64()),
            "p50_days": pa.array(rows["p50_days"], pa.int64()),
            "p90_days": pa.array(rows["p90_days"], pa.int64()),
        }
    )


SHIP_LATENCY_SQL = """
WITH f AS (
  SELECT l_orderkey, MIN(l_shipdate) AS fs
  FROM lineitem
  WHERE l_orderkey IS NOT NULL AND l_shipdate IS NOT NULL
  GROUP BY 1
), d AS (
  SELECT o.o_orderpriority AS priority,
         CAST(epoch(date_trunc('day', f.fs)) // 86400
              - epoch(date_trunc('day', o.o_orderdate)) // 86400 AS BIGINT)
           AS days
  FROM orders o JOIN f ON f.l_orderkey = o.o_orderkey
  WHERE o.o_orderdate IS NOT NULL
)
SELECT priority,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(PERCENTILE_DISC(0.5) WITHIN GROUP (ORDER BY days) AS BIGINT)
         AS p50_days,
       CAST(PERCENTILE_DISC(0.9) WITHIN GROUP (ORDER BY days) AS BIGINT)
         AS p90_days
FROM d GROUP BY 1
"""


# ---------------------------------------------------------------------------
# cross-source duplicate share
# ---------------------------------------------------------------------------


def q_dup_share_per_source(sf_dir):
    """Per source: how many of its documents belong to a CORPUS-WIDE
    exact-duplicate cluster (identical text appearing >= 2 times
    anywhere, across sources) — the attribution view of the dedup
    audit, telling the corpus owner WHICH feed contributes the
    duplication mass. Batch-local (text, source) counts, ONE text-hash
    bucket shuffle (a text's counts co-locate), per-bucket cluster
    totals + per-source partials, types/sources-bounded tree merge."""
    docs = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["source", "text"]
    )

    def partial(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_valid(b["source"]))
        t = pa.table(
            {"t": pc.fill_null(b["text"], ""), "source": b["source"]}
        )
        g = t.group_by(["t", "source"]).aggregate([([], "count_all")])
        return g.select(["t", "source", "count_all"]).rename_columns(
            ["t", "source", "c"]
        )

    def with_bucket(b: pa.Table) -> pa.Table:
        return add_bucket(b, "t", 64)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "source": pd.Series([], dtype=object),
                "n_docs": pd.Series([], dtype=np.int64),
                "n_dup_docs": pd.Series([], dtype=np.int64),
            }
        )
        if len(g) == 0:
            return empty
        g = g.groupby(["t", "source"], sort=False, as_index=False)["c"].sum()
        tot = g.groupby("t", sort=False)["c"].transform("sum")
        dup = (tot >= 2).to_numpy()
        c = g["c"].to_numpy(dtype=np.int64)
        t = pd.DataFrame(
            {
                "source": g["source"].to_numpy(),
                "n_docs": c,
                "n_dup_docs": np.where(dup, c, 0),
            }
        )
        agg = t.groupby("source", sort=False, as_index=False).agg(
            n_docs=("n_docs", "sum"), n_dup_docs=("n_dup_docs", "sum")
        )
        for col in ("n_docs", "n_dup_docs"):
            agg[col] = agg[col].astype(np.int64)
        return agg

    def combine(b: pa.Table) -> pa.Table:
        g = b.group_by(["source"]).aggregate(
            [("n_docs", "sum"), ("n_dup_docs", "sum")]
        )
        g = g.select(["source", "n_docs_sum", "n_dup_docs_sum"])
        return g.rename_columns(["source", "n_docs", "n_dup_docs"])

    out = tree_merge(
        docs.map_batches(partial, batch_format="pyarrow", batch_size=None)
        .map_batches(with_bucket, batch_format="pyarrow", batch_size=None)
        .groupby(_BUCKET)
        .map_groups(per_bucket, batch_format="pandas"),
        combine,
    )

    def finish(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "source": b["source"],
                "n_docs": b["n_docs"].cast(pa.int64()),
                "n_dup_docs": b["n_dup_docs"].cast(pa.int64()),
            }
        )

    return out.map_batches(finish, batch_format="pyarrow", batch_size=None)


DUP_SHARE_SQL = """
WITH c AS (
  SELECT COALESCE(text, '') AS t, source, COUNT(*) AS c
  FROM documents WHERE source IS NOT NULL GROUP BY 1, 2
), tot AS (
  SELECT t, SUM(c) AS tc FROM c GROUP BY 1
)
SELECT c.source,
       CAST(SUM(c.c) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN tot.tc >= 2 THEN c.c ELSE 0 END) AS BIGINT)
         AS n_dup_docs
FROM c JOIN tot USING (t) GROUP BY 1
"""


# ---------------------------------------------------------------------------
# first-seen property-value novelty per day
# ---------------------------------------------------------------------------


def q_new_prop_values_daily(sf_dir):
    """Schema/vocabulary drift signal: per day, how many distinct
    ``props.k`` integer values appear for the FIRST time — the
    token-novelty curve a feature store watches to catch upstream
    format changes. Vectorized RE2 JSON extraction (no per-row
    json.loads); per-value MIN(day) partials, value-sharded tree
    merge, then a days-bounded count."""
    from mimirsbrunn_ray.functions.jsonx import extract_int_key

    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["ts", "props"]
    )

    def partial(b: pa.Table) -> pa.Table:
        b = _not_null(b, ("ts", "props"))
        k = extract_int_key(b["props"], "k")
        us = b["ts"].cast(pa.timestamp("us")).cast(pa.int64())
        t = pa.table({"k": k, "us": us}).filter(pc.is_valid(k))
        d = pc.multiply(pc.divide(t["us"], _DAY_US), _DAY_US)
        t = pa.table({"k": t["k"], "d": d})
        g = t.group_by(["k"]).aggregate([("d", "min")])
        return g.select(["k", "d_min"]).rename_columns(["k", "d"])

    def combine(b: pa.Table) -> pa.Table:
        g = b.group_by(["k"]).aggregate([("d", "min")])
        return g.select(["k", "d_min"]).rename_columns(["k", "d"])

    first = tree_merge(
        ev.map_batches(partial, batch_format="pyarrow", batch_size=None),
        combine,
        final_shards=8,
        shard_cols=["k"],
    )

    def per_day(b: pa.Table) -> pa.Table:
        g = b.group_by(["d"]).aggregate([([], "count_all")])
        return g.select(["d", "count_all"]).rename_columns(["d", "n"])

    def combine_d(b: pa.Table) -> pa.Table:
        g = b.group_by(["d"]).aggregate([("n", "sum")])
        return g.select(["d", "n_sum"]).rename_columns(["d", "n"])

    out = tree_merge(
        first.map_batches(per_day, batch_format="pyarrow", batch_size=None),
        combine_d,
    )

    def finish(b: pa.Table) -> pa.Table:
        d = b["d"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "bucket": ts_array(d.astype(np.int64)),
                "n_new_values": b["n"].cast(pa.int64()),
            }
        )

    return out.map_batches(finish, batch_format="pyarrow", batch_size=None)


NEW_PROPS_SQL = """
WITH v AS (
  SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
         date_trunc('day', ts) AS d
  FROM events
  WHERE ts IS NOT NULL AND props IS NOT NULL
), f AS (
  SELECT k, MIN(d) AS fd FROM v WHERE k IS NOT NULL GROUP BY 1
)
SELECT fd AS bucket, CAST(COUNT(*) AS BIGINT) AS n_new_values
FROM f GROUP BY 1
"""


def register_r4p(queries: dict, oracles: dict) -> None:
    queries.update(
        {
            "rfm_segments": q_rfm_segments,
            "ship_latency_quantiles": q_ship_latency_quantiles,
            "dup_share_per_source": q_dup_share_per_source,
            "new_prop_values_daily": q_new_prop_values_daily,
        }
    )
    oracles.update(
        {
            "rfm_segments": RFM_SQL,
            "ship_latency_quantiles": SHIP_LATENCY_SQL,
            "dup_share_per_source": DUP_SHARE_SQL,
            "new_prop_values_daily": NEW_PROPS_SQL,
        }
    )
