"""Round-4 batch JE: who owns the extreme tail, who places the
big orders, and how balanced the corpus is — the tail-mass
ownership census (events at or above the global p99 value
cutoff, attributed per type: which stream generates the
extremes), the big-order segment mix (the market-segment
composition of top-decile orders versus the overall base, with
lift), and the source balance entropy (the effective number of
sources actually feeding the corpus).

Exactness discipline: the p99 and decile cutoffs are exact
order statistics at integer ranks with tie-inclusive >= tests;
segment mixes are exact counts; entropy uses the identical
plug-in formula."""

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


_TMO_COLS = ["event_type", "n_tail", "type_tail_ppm",
             "share_of_tail_ppm"]


def q_tail_mass_ownership(sf_dir):
    """Which stream generates the extremes?  The global p99
    value cutoff (exact order statistic at ascending rank
    (99n+99)//100), then per type: how many of its events sit AT
    OR ABOVE the cutoff (tie-inclusive), what fraction of the
    type that is, and what share of the whole tail the type
    owns.  The (type, mills) histogram folds once."""
    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "value"])

    def part(b: pa.Table) -> pa.Table:
        b = _valid(b, ("event_type", "value"))
        if b.num_rows == 0:
            return pa.table({
                "et": pa.array([], pa.string()),
                "m": pa.array([], pa.int64()),
                "n": pa.array([], pa.int64()),
            })
        v = b["value"].cast(pa.float64()).to_numpy(
            zero_copy_only=False)
        mills = np.where(v >= 0, np.floor(v * 1000 + 0.5),
                         np.ceil(v * 1000 - 0.5)).astype(
            np.int64)
        df = pd.DataFrame({
            "et": np.asarray(
                b["event_type"].to_numpy(zero_copy_only=False)),
            "m": mills, "n": 1,
        })
        agg = df.groupby(["et", "m"]).sum().reset_index()
        agg["m"] = agg["m"].astype(np.int64)
        agg["n"] = agg["n"].astype(np.int64)
        return pa.Table.from_pandas(agg, preserve_index=False)

    def comb(b: pa.Table) -> pa.Table:
        g = b.group_by(["et", "m"]).aggregate([("n", "sum")])
        return g.rename_columns(["et", "m", "n"])

    hist = tree_merge(
        ev.map_batches(part, batch_format="pyarrow",
                       batch_size=None),
        comb,
        final_shards=8,
        shard_cols=["m"],
    ).to_pandas()
    if "et" not in hist.columns or len(hist) == 0:
        return pa.table({
            "event_type": pa.array([], pa.string()),
            "n_tail": pa.array([], pa.int64()),
            "type_tail_ppm": pa.array([], pa.int64()),
            "share_of_tail_ppm": pa.array([], pa.int64()),
        })
    vh = hist.groupby("m")["n"].sum().sort_index()
    n_tot = int(vh.sum())
    rank = (99 * n_tot + 99) // 100
    cum = vh.cumsum()
    cutoff = int(cum[cum >= rank].index[0])
    tail = hist[hist["m"] >= cutoff]
    tail_tot = int(tail["n"].sum())
    if tail_tot == 0:
        return pa.table({
            "event_type": pa.array([], pa.string()),
            "n_tail": pa.array([], pa.int64()),
            "type_tail_ppm": pa.array([], pa.int64()),
            "share_of_tail_ppm": pa.array([], pa.int64()),
        })
    per_type_tot = hist.groupby("et")["n"].sum()
    rows = []
    for et, g in tail.groupby("et"):
        nt = int(g["n"].sum())
        rows.append((et, nt,
                     _round_half_away(
                         nt / int(per_type_tot[et]) * 1e6),
                     _round_half_away(nt / tail_tot * 1e6)))
    rows.sort()
    return pa.table({
        "event_type": pa.array(
            [r[0] for r in rows], pa.string()),
        "n_tail": pa.array([r[1] for r in rows], pa.int64()),
        "type_tail_ppm": pa.array(
            [r[2] for r in rows], pa.int64()),
        "share_of_tail_ppm": pa.array(
            [r[3] for r in rows], pa.int64()),
    })


TMO_SQL = """
WITH v AS MATERIALIZED (
  SELECT event_type AS et,
         CAST(ROUND(value * 1000, 0) AS BIGINT) AS m
  FROM events
  WHERE event_type IS NOT NULL AND value IS NOT NULL
), cut AS MATERIALIZED (
  SELECT m AS cutoff
  FROM (SELECT m, ROW_NUMBER() OVER (ORDER BY m) AS rk,
               COUNT(*) OVER () AS n
        FROM v)
  WHERE rk = (99 * n + 99) // 100
), tt AS MATERIALIZED (
  SELECT et, CAST(COUNT(*) AS BIGINT) AS n_type,
         CAST(SUM(CASE WHEN v.m >= cut.cutoff THEN 1 ELSE 0
                  END) AS BIGINT) AS n_tail
  FROM v CROSS JOIN cut
  GROUP BY 1
), tot AS MATERIALIZED (
  SELECT CAST(SUM(n_tail) AS BIGINT) AS t FROM tt
)
SELECT tt.et AS event_type, tt.n_tail,
       CAST(ROUND(CAST(tt.n_tail AS DOUBLE) / tt.n_type
            * 1000000, 0) AS BIGINT) AS type_tail_ppm,
       CAST(ROUND(CAST(tt.n_tail AS DOUBLE) / tot.t
            * 1000000, 0) AS BIGINT) AS share_of_tail_ppm
FROM tt CROSS JOIN tot
WHERE tt.n_tail > 0 AND tot.t > 0
ORDER BY tt.et
"""

_BSM_COLS = ["c_mktsegment", "n_big_orders", "big_share_ppm",
             "base_share_ppm", "lift_x1e3"]


def q_big_order_segment_mix(sf_dir):
    """Who places the big orders?  The market-segment mix of
    top-decile orders by value (cutoff at the exact ascending
    rank (9n+9)//10, tie-inclusive) against each segment's share
    of ALL orders, with the lift — the segment the sales org
    should actually staff for.  Counts fold exactly through the
    broadcast customer → segment map."""
    # the segment attaches via budget-gated broadcast / join
    # (stages/broadcast.py) — the customer dim never lands whole on the
    # driver; only the (segment, cents) histogram does (value-grain)
    from mimirsbrunn_ray.stages.broadcast import attach_dim

    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_totalprice"])
    orders = orders.map_batches(
        lambda b: _valid(b, ("o_custkey", "o_totalprice")),
        batch_format="pyarrow", batch_size=None)
    orders = attach_dim(orders, "o_custkey", sf_dir, "customer",
                        "c_custkey", ["c_mktsegment"], how="inner",
                        out_names=["seg"])

    def part(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({
                "seg": pa.array([], pa.string()),
                "cents": pa.array([], pa.int64()),
                "n": pa.array([], pa.int64()),
            })
        tp = b["o_totalprice"].cast(pa.float64()).to_numpy(
            zero_copy_only=False)
        cents = np.where(tp >= 0, np.floor(tp * 100 + 0.5),
                         np.ceil(tp * 100 - 0.5)).astype(
            np.int64)
        df = pd.DataFrame({"seg": b["seg"].to_pandas(),
                           "cents": cents, "n": 1})
        agg = df.groupby(["seg", "cents"]).sum().reset_index()
        agg["cents"] = agg["cents"].astype(np.int64)
        agg["n"] = agg["n"].astype(np.int64)
        return pa.Table.from_pandas(agg, preserve_index=False)

    def comb(b: pa.Table) -> pa.Table:
        g = b.group_by(["seg", "cents"]).aggregate(
            [("n", "sum")])
        return g.rename_columns(["seg", "cents", "n"])

    hist = tree_merge(
        orders.map_batches(part, batch_format="pyarrow",
                           batch_size=None),
        comb,
        final_shards=8,
        shard_cols=["cents"],
    ).to_pandas()
    if "seg" not in hist.columns or len(hist) == 0:
        return pa.table({
            "c_mktsegment": pa.array([], pa.string()),
            "n_big_orders": pa.array([], pa.int64()),
            "big_share_ppm": pa.array([], pa.int64()),
            "base_share_ppm": pa.array([], pa.int64()),
            "lift_x1e3": pa.array([], pa.int64()),
        })
    vh = hist.groupby("cents")["n"].sum().sort_index()
    n_tot = int(vh.sum())
    rank = (9 * n_tot + 9) // 10
    cum = vh.cumsum()
    cutoff = int(cum[cum >= rank].index[0])
    big = hist[hist["cents"] >= cutoff]
    big_tot = int(big["n"].sum())
    base = hist.groupby("seg")["n"].sum()
    big_seg = big.groupby("seg")["n"].sum()
    rows = []
    for seg in sorted(base.index):
        nb = int(big_seg.get(seg, 0))
        if nb == 0:
            continue
        bs = nb / big_tot
        os_ = int(base[seg]) / n_tot
        rows.append((seg, nb, _round_half_away(bs * 1e6),
                     _round_half_away(os_ * 1e6),
                     _round_half_away(bs / os_ * 1e3)))
    return pa.table({
        "c_mktsegment": pa.array(
            [r[0] for r in rows], pa.string()),
        "n_big_orders": pa.array(
            [r[1] for r in rows], pa.int64()),
        "big_share_ppm": pa.array(
            [r[2] for r in rows], pa.int64()),
        "base_share_ppm": pa.array(
            [r[3] for r in rows], pa.int64()),
        "lift_x1e3": pa.array(
            [r[4] for r in rows], pa.int64()),
    })


BSM_SQL = """
WITH oc AS MATERIALIZED (
  SELECT c.c_mktsegment AS seg,
         CAST(ROUND(o.o_totalprice * 100, 0) AS BIGINT)
           AS cents
  FROM orders o
  JOIN customer c ON c.c_custkey = o.o_custkey
  WHERE o.o_totalprice IS NOT NULL
    AND c.c_mktsegment IS NOT NULL
), cut AS MATERIALIZED (
  SELECT cents AS cutoff
  FROM (SELECT cents,
               ROW_NUMBER() OVER (ORDER BY cents) AS rk,
               COUNT(*) OVER () AS n
        FROM oc)
  WHERE rk = (9 * n + 9) // 10
), st AS MATERIALIZED (
  SELECT seg, CAST(COUNT(*) AS BIGINT) AS n_base,
         CAST(SUM(CASE WHEN oc.cents >= cut.cutoff THEN 1
                  ELSE 0 END) AS BIGINT) AS n_big
  FROM oc CROSS JOIN cut
  GROUP BY 1
), tot AS MATERIALIZED (
  SELECT CAST(SUM(n_base) AS BIGINT) AS nb,
         CAST(SUM(n_big) AS BIGINT) AS ng
  FROM st
)
SELECT st.seg AS c_mktsegment, st.n_big AS n_big_orders,
       CAST(ROUND(CAST(st.n_big AS DOUBLE) / tot.ng
            * 1000000, 0) AS BIGINT) AS big_share_ppm,
       CAST(ROUND(CAST(st.n_base AS DOUBLE) / tot.nb
            * 1000000, 0) AS BIGINT) AS base_share_ppm,
       CAST(ROUND((CAST(st.n_big AS DOUBLE) / tot.ng)
            / (CAST(st.n_base AS DOUBLE) / tot.nb)
            * 1000, 0) AS BIGINT) AS lift_x1e3
FROM st CROSS JOIN tot
WHERE st.n_big > 0 AND tot.ng > 0
ORDER BY st.seg
"""

_SBE_COLS = ["n_sources", "n_docs", "entropy_ppm",
             "effective_sources_x1e3"]


def q_source_balance_entropy(sf_dir):
    """How many sources REALLY feed the corpus?  The entropy of
    the doc-count distribution across sources and its perplexity
    (the effective source count) — twenty nominal feeds with an
    effective count of three is a concentration risk.  Source
    counts fold exactly; entropy mirrors."""
    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["source"])

    def part(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_valid(b["source"]))
        t = pa.table({
            "src": b["source"].cast(pa.string()),
            "n": pa.array(np.ones(b.num_rows, np.int64)),
        })
        g = t.group_by(["src"]).aggregate([("n", "sum")])
        return g.rename_columns(["src", "n"])

    def comb(b: pa.Table) -> pa.Table:
        g = b.group_by(["src"]).aggregate([("n", "sum")])
        return g.rename_columns(["src", "n"])

    cc = tree_merge(
        docs.map_batches(part, batch_format="pyarrow",
                         batch_size=None), comb).to_pandas()
    if "src" not in cc.columns or len(cc) == 0:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _SBE_COLS})
    n = cc["n"].to_numpy(np.int64).astype(np.float64)
    tot = n.sum()
    if tot == 0:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _SBE_COLS})
    p = n / tot
    h = float(-(p * np.log2(p)).sum())
    return pa.table({
        "n_sources": pa.array([len(cc)], pa.int64()),
        "n_docs": pa.array([int(tot)], pa.int64()),
        "entropy_ppm": pa.array(
            [_round_half_away(h * 1e6)], pa.int64()),
        "effective_sources_x1e3": pa.array(
            [_round_half_away(2.0 ** h * 1e3)], pa.int64()),
    })


SBE_SQL = """
WITH sc AS MATERIALIZED (
  SELECT source AS src, CAST(COUNT(*) AS BIGINT) AS n
  FROM documents WHERE source IS NOT NULL
  GROUP BY 1
), tot AS MATERIALIZED (
  SELECT CAST(SUM(n) AS BIGINT) AS t,
         CAST(COUNT(*) AS BIGINT) AS k
  FROM sc
), h AS MATERIALIZED (
  SELECT -SUM((CAST(n AS DOUBLE) / tot.t)
              * LOG2(CAST(n AS DOUBLE) / tot.t)) AS v
  FROM sc CROSS JOIN tot
)
SELECT tot.k AS n_sources, tot.t AS n_docs,
       CAST(ROUND(h.v * 1000000, 0) AS BIGINT) AS entropy_ppm,
       CAST(ROUND(POWER(2.0, h.v) * 1000, 0) AS BIGINT)
         AS effective_sources_x1e3
FROM tot CROSS JOIN h
WHERE tot.t > 0
"""


def register_r4je(queries: dict, oracles: dict) -> None:
    queries.update(
        {
            "tail_mass_ownership": q_tail_mass_ownership,
            "big_order_segment_mix": q_big_order_segment_mix,
            "source_balance_entropy": q_source_balance_entropy,
        }
    )
    oracles.update(
        {
            "tail_mass_ownership": TMO_SQL,
            "big_order_segment_mix": BSM_SQL,
            "source_balance_entropy": SBE_SQL,
        }
    )
