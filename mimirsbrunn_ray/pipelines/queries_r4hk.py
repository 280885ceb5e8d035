"""Round-4 batch HK: sampling design, burst buying, and opener
boilerplate — the realized stratification gain for estimating mean
event value with type strata (design effect = 1 minus the
between-strata variance share; how much a stratified sample
actually buys over SRS on THIS data), the maximum monthly order
burst per customer (top-5 (customer, month) cells — procurement
batching shows up as absurd single-month spikes), and the opener
diversity census (distinct first words over documents per source —
low diversity means every doc opens with the same boilerplate even
when full-text dedup passes).

Exactness discipline: all inputs fold as exact integers (value
via two-pass moments per stratum, order counts, first-word sets);
the design-effect and shares are mirrored single divisions."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from mimirsbrunn_ray.pipelines.queries_r4fk import _round_half_away
from mimirsbrunn_ray.stages.rollup import tree_merge

_BURST_TOP = 5


def _valid(b: pa.Table, cols) -> pa.Table:
    m = None
    for c in cols:
        v = pc.is_valid(b[c])
        m = v if m is None else pc.and_(m, v)
    return b.filter(m)


_SGV_COLS = ["n_events", "n_strata", "deff_ppm",
             "between_share_ppm"]


def q_stratification_gain_value(sf_dir):
    """What stratified sampling is worth HERE: for estimating the
    mean event value with event-type strata under proportional
    allocation, the design effect deff = within-variance share
    (1 - between-strata share) — deff near 1 means type strata buy
    nothing and the cheaper SRS is fine; small deff justifies the
    stratified pipeline.  Two-pass moments per stratum fold
    exactly."""
    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "value"])

    def mpart(b: pa.Table) -> pa.Table:
        b = _valid(b, ("event_type", "value"))
        t = pa.table({
            "event_type": b["event_type"],
            "n": pa.array(np.ones(b.num_rows, np.int64)),
            "s": b["value"].cast(pa.float64()),
        })
        g = t.group_by(["event_type"]).aggregate(
            [("n", "sum"), ("s", "sum")])
        return g.rename_columns(["event_type", "n", "s"])

    def mcomb(b: pa.Table) -> pa.Table:
        g = b.group_by(["event_type"]).aggregate(
            [("n", "sum"), ("s", "sum")])
        return g.rename_columns(["event_type", "n", "s"])

    mm = tree_merge(
        ev.map_batches(mpart, batch_format="pyarrow",
                       batch_size=None),
        mcomb,
    ).to_pandas()
    if "event_type" not in mm.columns or len(mm) == 0:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _SGV_COLS})
    mu_map = dict(zip(
        mm["event_type"],
        mm["s"].to_numpy(np.float64)
        / mm["n"].to_numpy(np.int64)))

    def vpart(b: pa.Table) -> pa.Table:
        b = _valid(b, ("event_type", "value"))
        if b.num_rows == 0:
            return pa.table({
                "event_type": pa.array([], pa.string()),
                "ss": pa.array([], pa.float64()),
            })
        et = b["event_type"].to_numpy(zero_copy_only=False)
        v = b["value"].cast(pa.float64()).to_numpy(
            zero_copy_only=False)
        mu = pd.Series(et).map(mu_map).to_numpy(np.float64)
        d = v - mu
        df = pd.DataFrame({"event_type": et, "d2": d * d})
        agg = df.groupby("event_type", sort=False)["d2"].sum()
        agg = agg.reset_index().rename(columns={"d2": "ss"})
        return pa.Table.from_pandas(agg, preserve_index=False)

    def vcomb(b: pa.Table) -> pa.Table:
        g = b.group_by(["event_type"]).aggregate([("ss", "sum")])
        return g.rename_columns(["event_type", "ss"])

    vv = tree_merge(
        ev.map_batches(vpart, batch_format="pyarrow",
                       batch_size=None),
        vcomb,
    ).to_pandas()
    if "event_type" not in vv.columns or len(vv) == 0:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _SGV_COLS})
    merged = mm.merge(vv, on="event_type")
    n = merged["n"].to_numpy(np.int64)
    s = merged["s"].to_numpy(np.float64)
    ss = merged["ss"].to_numpy(np.float64)
    N = int(n.sum())
    if N < 2:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _SGV_COLS})
    grand = s.sum() / N
    mu = s / n
    within = float(ss.sum()) / N
    between = float((n * (mu - grand) ** 2).sum()) / N
    total = within + between
    if total == 0:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _SGV_COLS})
    return pa.table({
        "n_events": pa.array([N], pa.int64()),
        "n_strata": pa.array([len(merged)], pa.int64()),
        "deff_ppm": pa.array(
            [_round_half_away(within / total * 1e6)], pa.int64()),
        "between_share_ppm": pa.array(
            [_round_half_away(between / total * 1e6)],
            pa.int64()),
    })


SGV_SQL = """
WITH mu AS MATERIALIZED (
  SELECT event_type, AVG(CAST(value AS DOUBLE)) AS m,
         CAST(COUNT(*) AS BIGINT) AS n,
         SUM(CAST(value AS DOUBLE)) AS s
  FROM events
  WHERE event_type IS NOT NULL AND value IS NOT NULL
  GROUP BY 1
), ssw AS MATERIALIZED (
  SELECT e.event_type,
         SUM((CAST(e.value AS DOUBLE) - mu.m)
             * (CAST(e.value AS DOUBLE) - mu.m)) AS ss
  FROM events e JOIN mu USING (event_type)
  WHERE e.value IS NOT NULL
  GROUP BY 1
), tot AS MATERIALIZED (
  SELECT CAST(SUM(n) AS BIGINT) AS nn,
         SUM(s) / SUM(n) AS grand,
         CAST(COUNT(*) AS BIGINT) AS k
  FROM mu
), parts AS (
  SELECT SUM(ssw.ss) / tot.nn AS within_,
         SUM(mu.n * (mu.m - tot.grand)
             * (mu.m - tot.grand)) / tot.nn AS between_
  FROM mu JOIN ssw USING (event_type) CROSS JOIN tot
  GROUP BY tot.nn
)
SELECT tot.nn AS n_events,
       tot.k AS n_strata,
       CAST(ROUND(parts.within_
            / (parts.within_ + parts.between_) * 1000000, 0)
            AS BIGINT) AS deff_ppm,
       CAST(ROUND(parts.between_
            / (parts.within_ + parts.between_) * 1000000, 0)
            AS BIGINT) AS between_share_ppm
FROM tot CROSS JOIN parts
WHERE tot.nn >= 2 AND parts.within_ + parts.between_ <> 0
"""

_MMO_COLS = ["custkey", "mon", "n_orders"]


def q_max_monthly_orders_per_customer(sf_dir):
    """Burst-buying extremes: the top-5 (customer, month) cells by
    order count (ties to the lowest custkey then month) —
    procurement batching and promo abuse live at this extreme, and
    monthly AVERAGE orders per customer smooth it into
    invisibility.  Cell counts fold exactly."""
    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_orderdate"])

    def part(b: pa.Table) -> pa.Table:
        b = _valid(b, ("o_custkey", "o_orderdate"))
        if b.num_rows == 0:
            return pa.table({
                "cust": pa.array([], pa.int64()),
                "mon": pa.array([], pa.int64()),
                "n": pa.array([], pa.int64()),
            })
        d = b["o_orderdate"].cast(pa.timestamp("us")).to_pandas()
        mon = (d.dt.year * 12 + d.dt.month - 1).to_numpy(np.int64)
        t = pa.table({
            "cust": b["o_custkey"].cast(pa.int64()),
            "mon": pa.array(mon),
            "n": pa.array(np.ones(len(mon), np.int64)),
        })
        g = t.group_by(["cust", "mon"]).aggregate([("n", "sum")])
        return g.rename_columns(["cust", "mon", "n"])

    def comb(b: pa.Table) -> pa.Table:
        g = b.group_by(["cust", "mon"]).aggregate([("n", "sum")])
        return g.rename_columns(["cust", "mon", "n"])

    cm = tree_merge(
        orders.map_batches(part, batch_format="pyarrow",
                           batch_size=None),
        comb,
        final_shards=8,
        shard_cols=["cust"],
    ).to_pandas()
    if "cust" not in cm.columns or len(cm) == 0:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _MMO_COLS})
    cm = cm.sort_values(["n", "cust", "mon"],
                        ascending=[False, True, True],
                        ignore_index=True).head(_BURST_TOP)
    return pa.table({
        "custkey": pa.array(cm["cust"].to_numpy(np.int64)),
        "mon": pa.array(cm["mon"].to_numpy(np.int64)),
        "n_orders": pa.array(cm["n"].to_numpy(np.int64)),
    })


MMO_SQL = f"""
WITH cm AS MATERIALIZED (
  SELECT o_custkey AS cust,
         YEAR(o_orderdate) * 12 + MONTH(o_orderdate) - 1 AS mon,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM orders
  WHERE o_custkey IS NOT NULL AND o_orderdate IS NOT NULL
  GROUP BY 1, 2
)
SELECT CAST(cust AS BIGINT) AS custkey,
       CAST(mon AS BIGINT) AS mon,
       n AS n_orders
FROM cm
ORDER BY n DESC, cust, mon
LIMIT {_BURST_TOP}
"""

_OPD_COLS = ["source", "n_docs", "n_openers",
             "top_opener_ppm", "diversity_ppm"]


def q_opener_diversity(sf_dir):
    """Opener boilerplate per source: distinct FIRST words across
    documents, the top opener's share, and the diversity ratio
    (openers / docs) — a source where half the docs start with the
    same word is templated even when full-text dedup finds nothing.
    First words extract vectorized; counts fold exactly."""
    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["source", "text"])

    def part(b: pa.Table) -> pa.Table:
        b = _valid(b, ("source", "text"))
        if b.num_rows == 0:
            return pa.table({
                "source": pa.array([], pa.string()),
                "w1": pa.array([], pa.string()),
                "n": pa.array([], pa.int64()),
            })
        words = pc.split_pattern(b["text"], pattern=" ")
        first = pc.list_element(words, 0)
        t = pa.table({
            "source": b["source"],
            "w1": first,
            "n": pa.array(np.ones(b.num_rows, np.int64)),
        })
        g = t.group_by(["source", "w1"]).aggregate([("n", "sum")])
        return g.rename_columns(["source", "w1", "n"])

    def comb(b: pa.Table) -> pa.Table:
        g = b.group_by(["source", "w1"]).aggregate([("n", "sum")])
        return g.rename_columns(["source", "w1", "n"])

    cc = tree_merge(
        docs.map_batches(part, batch_format="pyarrow",
                         batch_size=None),
        comb,
    ).to_pandas()
    if "source" not in cc.columns or len(cc) == 0:
        return pa.table({
            "source": pa.array([], pa.string()),
            **{c: pa.array([], pa.int64()) for c in _OPD_COLS[1:]},
        })
    out = {c: [] for c in _OPD_COLS}
    for src, g in cc.groupby("source", sort=True):
        n = g["n"].to_numpy(np.int64)
        n_docs = int(n.sum())
        if n_docs == 0:
            continue
        out["source"].append(src)
        out["n_docs"].append(n_docs)
        out["n_openers"].append(len(g))
        out["top_opener_ppm"].append(
            _round_half_away(int(n.max()) / n_docs * 1e6))
        out["diversity_ppm"].append(
            _round_half_away(len(g) / n_docs * 1e6))
    return pa.table({
        "source": pa.array(out["source"], pa.string()),
        **{c: pa.array(out[c], pa.int64()) for c in _OPD_COLS[1:]},
    })


OPD_SQL = """
WITH fw AS MATERIALIZED (
  SELECT source, string_split(text, ' ')[1] AS w1
  FROM documents
  WHERE source IS NOT NULL AND text IS NOT NULL
), c AS MATERIALIZED (
  SELECT source, w1, CAST(COUNT(*) AS BIGINT) AS n
  FROM fw GROUP BY 1, 2
)
SELECT source,
       CAST(SUM(n) AS BIGINT) AS n_docs,
       CAST(COUNT(*) AS BIGINT) AS n_openers,
       CAST(ROUND(CAST(MAX(n) AS DOUBLE) / SUM(n) * 1000000, 0)
            AS BIGINT) AS top_opener_ppm,
       CAST(ROUND(CAST(COUNT(*) AS DOUBLE) / SUM(n) * 1000000,
            0) AS BIGINT) AS diversity_ppm
FROM c GROUP BY source
HAVING SUM(n) > 0
ORDER BY source
"""


def register_r4hk(queries: dict, oracles: dict) -> None:
    queries.update(
        {
            "stratification_gain_value": q_stratification_gain_value,
            "max_monthly_orders_per_customer":
                q_max_monthly_orders_per_customer,
            "opener_diversity": q_opener_diversity,
        }
    )
    oracles.update(
        {
            "stratification_gain_value": SGV_SQL,
            "max_monthly_orders_per_customer": MMO_SQL,
            "opener_diversity": OPD_SQL,
        }
    )
