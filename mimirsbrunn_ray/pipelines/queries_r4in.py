"""Round-4 batch IN: repurchase physics, value stratification,
and supply continuity — the part repurchase rate (how many
(customer, part) relationships come back for a second purchase —
the consumable-vs-durable split of the catalog), the value-band
mix per event type (micro / mid / large value events and where
the money actually sits), and the supplier activity coverage
(what share of suppliers ship in at least 90% of observed months
— the always-on supply base).

Exactness discipline: repurchase and coverage thresholds are
exact integer tests (pair counts ≥ 2; months·10 ≥ span·9);
value bands cut at exact mill thresholds; all shares snap at
ppm."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd
from mimirsbrunn_ray.stages.broadcast import safe_join as _safe_join

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


_PRR_COLS = ["n_pairs", "n_repurchased", "repurchase_ppm",
             "max_pair_purchases"]


def q_part_repurchase_rate(sf_dir):
    """Consumable or durable?  Of all (customer, part)
    relationships, how many placed a second order for the same
    part — plus the deepest single relationship.  Lineitems join
    their order header for the customer key (hash join); pair
    counts fold exactly in disjoint shards."""
    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_partkey"])
    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey"])
    li = li.materialize()
    orders = orders.materialize()
    if li.count() == 0 or orders.count() == 0:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _PRR_COLS})
    joined = _safe_join(
        li, orders,
        on=("l_orderkey",),
        right_on=("o_orderkey",),
        join_type="inner",
        num_partitions=16,
    )

    def part(b: pa.Table) -> pa.Table:
        b = _valid(b, ("l_partkey", "o_custkey"))
        if b.num_rows == 0:
            return pa.table({
                "ck": pa.array([], pa.int64()),
                "pk": pa.array([], pa.int64()),
                "n": pa.array([], pa.int64()),
            })
        t = pa.table({
            "ck": b["o_custkey"].cast(pa.int64()),
            "pk": b["l_partkey"].cast(pa.int64()),
            "n": pa.array(np.ones(b.num_rows, np.int64)),
        })
        g = t.group_by(["ck", "pk"]).aggregate([("n", "sum")])
        return g.rename_columns(["ck", "pk", "n"])

    def comb(b: pa.Table) -> pa.Table:
        g = b.group_by(["ck", "pk"]).aggregate([("n", "sum")])
        return g.rename_columns(["ck", "pk", "n"])

    def census(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({
                "pairs": pa.array([], pa.int64()),
                "rep": pa.array([], pa.int64()),
                "mx": pa.array([], pa.int64()),
            })
        n = b["n"].to_numpy(zero_copy_only=False)
        return pa.table({
            "pairs": pa.array([b.num_rows], pa.int64()),
            "rep": pa.array([int((n >= 2).sum())], pa.int64()),
            "mx": pa.array([int(n.max())], pa.int64()),
        })

    def ccomb(b: pa.Table) -> pa.Table:
        return pa.table({
            "pairs": pa.array(
                [pc.sum(b["pairs"]).as_py() or 0], pa.int64()),
            "rep": pa.array(
                [pc.sum(b["rep"]).as_py() or 0], pa.int64()),
            "mx": pa.array(
                [pc.max(b["mx"]).as_py() or 0], pa.int64()),
        })

    pairs = tree_merge(
        joined.map_batches(part, batch_format="pyarrow",
                           batch_size=None),
        comb,
        final_shards=8,
        shard_cols=["ck"],
    )
    st = tree_merge(
        pairs.map_batches(census, batch_format="pyarrow",
                          batch_size=None),
        ccomb,
    ).to_pandas()
    if "pairs" not in st.columns or len(st) == 0:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _PRR_COLS})
    np_ = int(st["pairs"].sum())
    if np_ == 0:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _PRR_COLS})
    rep = int(st["rep"].sum())
    return pa.table({
        "n_pairs": pa.array([np_], pa.int64()),
        "n_repurchased": pa.array([rep], pa.int64()),
        "repurchase_ppm": pa.array(
            [_round_half_away(rep / np_ * 1e6)], pa.int64()),
        "max_pair_purchases": pa.array(
            [int(st["mx"].max())], pa.int64()),
    })


PRR_SQL = """
WITH pr AS MATERIALIZED (
  SELECT o.o_custkey AS ck, l.l_partkey AS pk,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM lineitem l
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  WHERE l.l_partkey IS NOT NULL AND o.o_custkey IS NOT NULL
  GROUP BY 1, 2
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
       CAST(SUM(CASE WHEN n >= 2 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_repurchased,
       CAST(ROUND(CAST(SUM(CASE WHEN n >= 2 THEN 1 ELSE 0 END)
                       AS DOUBLE) / COUNT(*) * 1000000, 0)
            AS BIGINT) AS repurchase_ppm,
       CAST(MAX(n) AS BIGINT) AS max_pair_purchases
FROM pr HAVING COUNT(*) > 0
"""

_VBM_COLS = ["event_type", "band", "n_events",
             "count_share_ppm", "value_share_ppm"]

_BAND_LO = 1_000      # < 1.0 in mills
_BAND_HI = 10_000     # < 10.0 in mills


def q_value_band_mix_by_type(sf_dir):
    """Where does the money sit?  Per event type, events split
    into micro (< 1.0), mid (< 10.0) and large value bands —
    count share versus VALUE share per band exposes streams
    whose event count is noise but whose value is the business.
    Band cuts are exact mill thresholds; sums fold exactly."""
    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "value"])

    def part(b: pa.Table) -> pa.Table:
        b = _valid(b, ("event_type", "value"))
        if b.num_rows == 0:
            return pa.table({
                "et": pa.array([], pa.string()),
                "band": pa.array([], pa.string()),
                "n": pa.array([], pa.int64()),
                "s": pa.array([], pa.int64()),
            })
        v = b["value"].cast(pa.float64()).to_numpy(
            zero_copy_only=False)
        mills = np.where(v >= 0, np.floor(v * 1000 + 0.5),
                         np.ceil(v * 1000 - 0.5)).astype(
            np.int64)
        band = np.where(
            mills < _BAND_LO, "micro",
            np.where(mills < _BAND_HI, "mid", "large"))
        df = pd.DataFrame({
            "et": np.asarray(
                b["event_type"].to_numpy(zero_copy_only=False)),
            "band": band, "n": 1, "s": mills,
        })
        agg = df.groupby(["et", "band"]).sum().reset_index()
        for c in ["n", "s"]:
            agg[c] = agg[c].astype(np.int64)
        return pa.Table.from_pandas(agg, preserve_index=False)

    def comb(b: pa.Table) -> pa.Table:
        g = b.group_by(["et", "band"]).aggregate(
            [("n", "sum"), ("s", "sum")])
        return g.rename_columns(["et", "band", "n", "s"])

    cc = tree_merge(
        ev.map_batches(part, batch_format="pyarrow",
                       batch_size=None), comb).to_pandas()
    if "et" not in cc.columns or len(cc) == 0:
        return pa.table({
            "event_type": pa.array([], pa.string()),
            "band": pa.array([], pa.string()),
            "n_events": pa.array([], pa.int64()),
            "count_share_ppm": pa.array([], pa.int64()),
            "value_share_ppm": pa.array([], pa.int64()),
        })
    tot = cc.groupby("et").agg(
        tn=("n", "sum"), ts=("s", "sum")).reset_index()
    m = cc.merge(tot, on="et")
    m = m[(m["tn"] > 0) & (m["ts"] != 0)]
    m = m.sort_values(["et", "band"])
    return pa.table({
        "event_type": pa.array(m["et"], pa.string()),
        "band": pa.array(m["band"], pa.string()),
        "n_events": pa.array(
            m["n"].to_numpy(np.int64), pa.int64()),
        "count_share_ppm": pa.array(
            [_round_half_away(n / t * 1e6)
             for n, t in zip(m["n"], m["tn"])], pa.int64()),
        "value_share_ppm": pa.array(
            [_round_half_away(s / t * 1e6)
             for s, t in zip(m["s"], m["ts"])], pa.int64()),
    })


VBM_SQL = f"""
WITH vb AS MATERIALIZED (
  SELECT event_type AS et,
         CASE WHEN CAST(ROUND(value * 1000, 0) AS BIGINT)
                   < {_BAND_LO} THEN 'micro'
              WHEN CAST(ROUND(value * 1000, 0) AS BIGINT)
                   < {_BAND_HI} THEN 'mid'
              ELSE 'large' END AS band,
         CAST(ROUND(value * 1000, 0) AS BIGINT) AS m
  FROM events
  WHERE event_type IS NOT NULL AND value IS NOT NULL
), cc AS MATERIALIZED (
  SELECT et, band, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(m) AS BIGINT) AS s
  FROM vb GROUP BY 1, 2
), tot AS MATERIALIZED (
  SELECT et, CAST(SUM(n) AS BIGINT) AS tn,
         CAST(SUM(s) AS BIGINT) AS ts
  FROM cc GROUP BY 1
)
SELECT cc.et AS event_type, cc.band, cc.n AS n_events,
       CAST(ROUND(CAST(cc.n AS DOUBLE) / tot.tn * 1000000, 0)
            AS BIGINT) AS count_share_ppm,
       CAST(ROUND(CAST(cc.s AS DOUBLE) / tot.ts * 1000000, 0)
            AS BIGINT) AS value_share_ppm
FROM cc JOIN tot USING (et)
WHERE tot.tn > 0 AND tot.ts <> 0
ORDER BY cc.et, cc.band
"""

_SAC_COLS = ["n_suppliers", "n_always_on", "always_on_ppm",
             "mean_coverage_ppm", "n_months"]


def q_supplier_activity_coverage(sf_dir):
    """The always-on supply base: per supplier, the share of
    observed months with at least one shipment; how many cover
    ≥ 90% (exact test months·10 ≥ span·9) and the mean
    coverage — procurement can only lean on suppliers who are
    actually always there.  Distinct (supplier, month) pairs
    fold exactly."""
    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_suppkey", "l_shipdate"])

    def part(b: pa.Table) -> pa.Table:
        b = _valid(b, ("l_suppkey", "l_shipdate"))
        if b.num_rows == 0:
            return pa.table({
                "sk": pa.array([], pa.int64()),
                "mon": pa.array([], pa.int64()),
            })
        d = b["l_shipdate"].cast(pa.timestamp("us")).to_pandas()
        mon = (d.dt.year * 12 + d.dt.month - 1).to_numpy(
            np.int64)
        t = pa.table({
            "sk": b["l_suppkey"].cast(pa.int64()),
            "mon": pa.array(mon),
        })
        return t.group_by(["sk", "mon"]).aggregate([])

    def distinct(b: pa.Table) -> pa.Table:
        return b.select(["sk", "mon"]).group_by(
            ["sk", "mon"]).aggregate([])

    sm = tree_merge(
        li.map_batches(part, batch_format="pyarrow",
                       batch_size=None),
        distinct,
        final_shards=8,
        shard_cols=["sk"],
    ).to_pandas()
    if "sk" not in sm.columns or len(sm) == 0:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _SAC_COLS})
    span = int(sm["mon"].max() - sm["mon"].min() + 1)
    per = sm.groupby("sk").size()
    n_sup = len(per)
    months = per.to_numpy(np.int64)
    always = int((months * 10 >= span * 9).sum())
    return pa.table({
        "n_suppliers": pa.array([n_sup], pa.int64()),
        "n_always_on": pa.array([always], pa.int64()),
        "always_on_ppm": pa.array(
            [_round_half_away(always / n_sup * 1e6)],
            pa.int64()),
        "mean_coverage_ppm": pa.array(
            [_round_half_away(
                float((months / span).mean()) * 1e6)],
            pa.int64()),
        "n_months": pa.array([span], pa.int64()),
    })


SAC_SQL = """
WITH sm AS MATERIALIZED (
  SELECT DISTINCT l_suppkey AS sk,
         YEAR(l_shipdate) * 12 + MONTH(l_shipdate) - 1 AS mon
  FROM lineitem
  WHERE l_suppkey IS NOT NULL AND l_shipdate IS NOT NULL
), span AS MATERIALIZED (
  SELECT MAX(mon) - MIN(mon) + 1 AS sp FROM sm
), per AS MATERIALIZED (
  SELECT sk, CAST(COUNT(*) AS BIGINT) AS months
  FROM sm GROUP BY 1
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_suppliers,
       CAST(SUM(CASE WHEN months * 10 >= span.sp * 9
                     THEN 1 ELSE 0 END) AS BIGINT)
         AS n_always_on,
       CAST(ROUND(CAST(SUM(CASE WHEN months * 10
                                     >= span.sp * 9
                                THEN 1 ELSE 0 END) AS DOUBLE)
            / COUNT(*) * 1000000, 0) AS BIGINT)
         AS always_on_ppm,
       CAST(ROUND(AVG(CAST(months AS DOUBLE) / span.sp)
            * 1000000, 0) AS BIGINT) AS mean_coverage_ppm,
       CAST(ANY_VALUE(span.sp) AS BIGINT) AS n_months
FROM per CROSS JOIN span
GROUP BY span.sp
HAVING COUNT(*) > 0
"""


def register_r4in(queries: dict, oracles: dict) -> None:
    queries.update(
        {
            "part_repurchase_rate": q_part_repurchase_rate,
            "value_band_mix_by_type": q_value_band_mix_by_type,
            "supplier_activity_coverage":
                q_supplier_activity_coverage,
        }
    )
    oracles.update(
        {
            "part_repurchase_rate": PRR_SQL,
            "value_band_mix_by_type": VBM_SQL,
            "supplier_activity_coverage": SAC_SQL,
        }
    )
