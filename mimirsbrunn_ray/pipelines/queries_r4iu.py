"""Round-4 batch IU: audience maturity by weekday, supply
dominance inside each part, and the customer's personal price
band — the returning-user share by day of week (which days are
carried by veterans versus day-one users), the part supplier
dominance census (among multi-supplier parts, how often one
supplier still owns more than half the lines — nominal
multi-sourcing that isn't), and the median within-customer value
CV (how wide the typical customer's own order-value band is).

Exactness discipline: first-seen days, line counts and the >50%
dominance test (2·top > total) are exact integers; CVs fold
from exact per-customer (n, Σ, Σ²) with the interpolated median
mirrored."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from mimirsbrunn_ray.pipelines.queries_r4fk import (
    _DAY_US,
    _round_half_away,
)
from mimirsbrunn_ray.stages.rollup import tree_merge


def _valid(b: pa.Table, cols) -> pa.Table:
    m = None
    for c in cols:
        v = pc.is_valid(b[c])
        m = v if m is None else pc.and_(m, v)
    return b.filter(m)


_RSD_COLS = ["dow", "n_events", "returning_ppm"]


def q_returning_share_by_dow(sf_dir):
    """Which days belong to the veterans?  Per day of week, the
    share of events from RETURNING users (first seen on an
    earlier calendar day) — a weekday/weekend split here says
    whether weekends recruit or retain.  Per-user first days
    fold exactly, then broadcast into a second exact counting
    pass."""
    path = f"{sf_dir}/events.parquet"
    ev = rd.read_parquet(path, columns=["user_id", "ts"])

    def fpart(b: pa.Table) -> pa.Table:
        b = _valid(b, ("user_id", "ts"))
        us = b["ts"].cast(pa.timestamp("us")).cast(pa.int64())
        t = pa.table({
            "u": b["user_id"].cast(pa.int64()),
            "d0": pc.divide(us, _DAY_US),
        })
        g = t.group_by(["u"]).aggregate([("d0", "min")])
        return g.rename_columns(["u", "d0"])

    def fcomb(b: pa.Table) -> pa.Table:
        g = b.group_by(["u"]).aggregate([("d0", "min")])
        return g.rename_columns(["u", "d0"])

    fd = tree_merge(
        ev.map_batches(fpart, batch_format="pyarrow",
                       batch_size=None), fcomb).to_pandas()
    if "u" not in fd.columns or len(fd) == 0:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _RSD_COLS})
    fmap = dict(zip(fd["u"].astype(np.int64),
                    fd["d0"].astype(np.int64)))

    def cpart(b: pa.Table) -> pa.Table:
        b = _valid(b, ("user_id", "ts"))
        if b.num_rows == 0:
            return pa.table({
                "dow": pa.array([], pa.int64()),
                "n": pa.array([], pa.int64()),
                "ret": pa.array([], pa.int64()),
            })
        us = b["ts"].cast(pa.timestamp("us")).cast(
            pa.int64()).to_numpy(zero_copy_only=False)
        day = (us // _DAY_US).astype(np.int64)
        dow = day % 7
        u = b["user_id"].cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        first = np.array([fmap.get(int(k), 1 << 60)
                          for k in u], np.int64)
        ret = (day > first).astype(np.int64)
        df = pd.DataFrame({"dow": dow, "n": 1, "ret": ret})
        agg = df.groupby("dow").sum().reset_index()
        for c in ["dow", "n", "ret"]:
            agg[c] = agg[c].astype(np.int64)
        return pa.Table.from_pandas(agg, preserve_index=False)

    def ccomb(b: pa.Table) -> pa.Table:
        g = b.group_by(["dow"]).aggregate(
            [("n", "sum"), ("ret", "sum")])
        return g.rename_columns(["dow", "n", "ret"])

    cc = tree_merge(
        ev.map_batches(cpart, batch_format="pyarrow",
                       batch_size=None), ccomb).to_pandas()
    if "dow" not in cc.columns or len(cc) == 0:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _RSD_COLS})
    cc = cc.sort_values("dow")
    return pa.table({
        "dow": pa.array(
            cc["dow"].to_numpy(np.int64), pa.int64()),
        "n_events": pa.array(
            cc["n"].to_numpy(np.int64), pa.int64()),
        "returning_ppm": pa.array(
            [_round_half_away(r / n * 1e6)
             for r, n in zip(cc["ret"], cc["n"])], pa.int64()),
    })


RSD_SQL = f"""
WITH fd AS MATERIALIZED (
  SELECT user_id AS u,
         MIN(EPOCH_US(ts) // {_DAY_US}) AS d0
  FROM events
  WHERE user_id IS NOT NULL AND ts IS NOT NULL
  GROUP BY 1
), ev AS MATERIALIZED (
  SELECT (EPOCH_US(e.ts) // {_DAY_US}) % 7 AS dow,
         CASE WHEN EPOCH_US(e.ts) // {_DAY_US} > fd.d0
              THEN 1 ELSE 0 END AS ret
  FROM events e JOIN fd ON fd.u = e.user_id
  WHERE e.ts IS NOT NULL
)
SELECT CAST(dow AS BIGINT) AS dow,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(ROUND(CAST(SUM(ret) AS DOUBLE) / COUNT(*)
            * 1000000, 0) AS BIGINT) AS returning_ppm
FROM ev
GROUP BY dow
ORDER BY dow
"""

_PSD_COLS = ["n_parts_multi", "dominated_ppm",
             "mean_top_share_ppm"]


def q_part_supplier_dominance(sf_dir):
    """Multi-sourcing that isn't: among parts served by 2+
    suppliers, how often one supplier still carries MORE than
    half the lines (exact test 2·top > total), and the mean top
    share — the de-risking is nominal if the answer is 'almost
    always'.  Per-(part, supplier) counts fold exactly in
    disjoint part shards."""
    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_suppkey"])

    def part(b: pa.Table) -> pa.Table:
        b = _valid(b, ("l_partkey", "l_suppkey"))
        t = pa.table({
            "pk": b["l_partkey"].cast(pa.int64()),
            "sk": b["l_suppkey"].cast(pa.int64()),
            "n": pa.array(np.ones(b.num_rows, np.int64)),
        })
        g = t.group_by(["pk", "sk"]).aggregate([("n", "sum")])
        return g.rename_columns(["pk", "sk", "n"])

    def comb(b: pa.Table) -> pa.Table:
        g = b.group_by(["pk", "sk"]).aggregate([("n", "sum")])
        return g.rename_columns(["pk", "sk", "n"])

    ps = tree_merge(
        li.map_batches(part, batch_format="pyarrow",
                       batch_size=None),
        comb,
        final_shards=8,
        shard_cols=["pk"],
    ).to_pandas()
    if "pk" not in ps.columns or len(ps) == 0:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _PSD_COLS})
    agg = ps.groupby("pk").agg(
        nsup=("sk", "count"), top=("n", "max"),
        tot=("n", "sum")).reset_index()
    multi = agg[agg["nsup"] >= 2]
    if len(multi) == 0:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _PSD_COLS})
    top = multi["top"].to_numpy(np.int64)
    tot = multi["tot"].to_numpy(np.int64)
    dom = int((2 * top > tot).sum())
    n = len(multi)
    return pa.table({
        "n_parts_multi": pa.array([n], pa.int64()),
        "dominated_ppm": pa.array(
            [_round_half_away(dom / n * 1e6)], pa.int64()),
        "mean_top_share_ppm": pa.array(
            [_round_half_away(
                float((top / tot).mean()) * 1e6)], pa.int64()),
    })


PSD_SQL = """
WITH ps AS MATERIALIZED (
  SELECT l_partkey AS pk, l_suppkey AS sk,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM lineitem
  WHERE l_partkey IS NOT NULL AND l_suppkey IS NOT NULL
  GROUP BY 1, 2
), agg AS MATERIALIZED (
  SELECT pk, CAST(COUNT(*) AS BIGINT) AS nsup,
         CAST(MAX(n) AS BIGINT) AS top,
         CAST(SUM(n) AS BIGINT) AS tot
  FROM ps GROUP BY 1
), multi AS MATERIALIZED (
  SELECT * FROM agg WHERE nsup >= 2
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_parts_multi,
       CAST(ROUND(CAST(SUM(CASE WHEN 2 * top > tot THEN 1
                                ELSE 0 END) AS DOUBLE)
            / COUNT(*) * 1000000, 0) AS BIGINT)
         AS dominated_ppm,
       CAST(ROUND(AVG(CAST(top AS DOUBLE) / tot)
            * 1000000, 0) AS BIGINT) AS mean_top_share_ppm
FROM multi HAVING COUNT(*) > 0
"""

_CVC_COLS = ["n_customers", "median_cv_ppm", "p90_cv_ppm"]


def q_customer_value_cv_median(sf_dir):
    """The typical customer's personal price band: for customers
    with 3+ orders, the population CV of their own order values
    (from exact per-customer cents sums), then the median and
    p90 across customers — narrow bands mean order value is a
    customer trait, wide bands mean it's situational.  The CVs
    derive from exact (n, Σ, Σ²); medians interpolate
    identically."""
    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_totalprice"])

    def part(b: pa.Table) -> pa.Table:
        b = _valid(b, ("o_custkey", "o_totalprice"))
        if b.num_rows == 0:
            return pa.table({
                "ck": pa.array([], pa.int64()),
                "n": pa.array([], pa.int64()),
                "s": pa.array([], pa.int64()),
                "ss": pa.array([], pa.int64()),
            })
        tp = b["o_totalprice"].cast(pa.float64()).to_numpy(
            zero_copy_only=False)
        cents = np.where(tp >= 0, np.floor(tp * 100 + 0.5),
                         np.ceil(tp * 100 - 0.5)).astype(
            np.int64)
        df = pd.DataFrame({
            "ck": b["o_custkey"].cast(pa.int64()).to_numpy(
                zero_copy_only=False),
            "n": 1, "s": cents, "ss": cents * cents,
        })
        agg = df.groupby("ck").sum().reset_index()
        for c in ["ck", "n", "s", "ss"]:
            agg[c] = agg[c].astype(np.int64)
        return pa.Table.from_pandas(agg, preserve_index=False)

    def comb(b: pa.Table) -> pa.Table:
        g = b.group_by(["ck"]).aggregate(
            [("n", "sum"), ("s", "sum"), ("ss", "sum")])
        return g.rename_columns(["ck", "n", "s", "ss"])

    per = tree_merge(
        orders.map_batches(part, batch_format="pyarrow",
                           batch_size=None),
        comb,
        final_shards=8,
        shard_cols=["ck"],
    ).to_pandas()
    if "ck" not in per.columns or len(per) == 0:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _CVC_COLS})
    per = per[per["n"] >= 3]
    if len(per) == 0:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _CVC_COLS})
    n = per["n"].to_numpy(np.int64).astype(np.float64)
    s = per["s"].to_numpy(np.int64).astype(np.float64)
    ss = per["ss"].to_numpy(np.int64).astype(np.float64)
    mu = s / n
    var = ss / n - mu * mu
    keep = (mu > 0) & (var > 0)
    cv = np.sqrt(var[keep]) / mu[keep]
    if len(cv) == 0:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _CVC_COLS})
    return pa.table({
        "n_customers": pa.array([len(cv)], pa.int64()),
        "median_cv_ppm": pa.array(
            [_round_half_away(float(np.percentile(cv, 50))
                              * 1e6)], pa.int64()),
        "p90_cv_ppm": pa.array(
            [_round_half_away(float(np.percentile(cv, 90))
                              * 1e6)], pa.int64()),
    })


CVC_SQL = """
WITH per AS MATERIALIZED (
  SELECT o_custkey AS ck, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT))
              AS BIGINT) AS s,
         CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)
                  * CAST(ROUND(o_totalprice * 100, 0)
                         AS BIGINT)) AS BIGINT) AS ss
  FROM orders
  WHERE o_custkey IS NOT NULL AND o_totalprice IS NOT NULL
  GROUP BY 1
  HAVING COUNT(*) >= 3
), cv AS MATERIALIZED (
  SELECT SQRT(CAST(ss AS DOUBLE) / n
              - (CAST(s AS DOUBLE) / n)
                * (CAST(s AS DOUBLE) / n))
           / (CAST(s AS DOUBLE) / n) AS v
  FROM per
  WHERE CAST(s AS DOUBLE) / n > 0
    AND CAST(ss AS DOUBLE) / n
        - (CAST(s AS DOUBLE) / n) * (CAST(s AS DOUBLE) / n) > 0
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_customers,
       CAST(ROUND(QUANTILE_CONT(v, 0.5) * 1000000, 0)
            AS BIGINT) AS median_cv_ppm,
       CAST(ROUND(QUANTILE_CONT(v, 0.9) * 1000000, 0)
            AS BIGINT) AS p90_cv_ppm
FROM cv HAVING COUNT(*) > 0
"""


def register_r4iu(queries: dict, oracles: dict) -> None:
    queries.update(
        {
            "returning_share_by_dow": q_returning_share_by_dow,
            "part_supplier_dominance":
                q_part_supplier_dominance,
            "customer_value_cv_median":
                q_customer_value_cv_median,
        }
    )
    oracles.update(
        {
            "returning_share_by_dow": RSD_SQL,
            "part_supplier_dominance": PSD_SQL,
            "customer_value_cv_median": CVC_SQL,
        }
    )
