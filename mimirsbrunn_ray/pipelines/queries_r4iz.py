"""Round-4 batch IZ: taxonomy information budget, single-user
stream capture, and basket-position fulfilment — the p_type
chain entropy (H(w1), H(w2|w1), H(w3|w1,w2): how the
three-word taxonomy's information is distributed along the
chain), the type top-user share (per event type, how much of the
stream its single heaviest user generates — bot detection's
first question), and the latency-by-line-number profile (do
later basket lines ship later — is fulfilment sequential or
parallel?).

Exactness discipline: all entropies build from exact joint
counts with the identical plug-in formula; top users break ties
on the smallest user id; latency day sums fold exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd
from mimirsbrunn_ray.stages.broadcast import safe_join as _safe_join

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


_PCE_COLS = ["n_parts", "h1_ppm", "h2_given_1_ppm",
             "h3_given_12_ppm", "joint_ppm"]


def q_ptype_chain_entropy(sf_dir):
    """Where does the taxonomy keep its information?  The chain
    decomposition H(w1) + H(w2|w1) + H(w3|w1,w2) of the
    three-word p_type (log2, plug-in) — a front-loaded chain
    means the first word routes, a back-loaded one means the
    suffix carries the signal.  Joint trigram counts fold
    exactly; conditional entropies are differences of joint
    entropies."""
    parts = rd.read_parquet(f"{sf_dir}/part.parquet",
                            columns=["p_type"])

    def part(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_valid(b["p_type"]))
        if b.num_rows == 0:
            return pa.table({
                "w1": pa.array([], pa.string()),
                "w2": pa.array([], pa.string()),
                "w3": pa.array([], pa.string()),
                "n": pa.array([], pa.int64()),
            })
        wl = pc.split_pattern(b["p_type"], " ").to_pylist()
        w1 = pa.array([w[0] if len(w) > 0 else ""
                       for w in wl], pa.string())
        w2 = pa.array([w[1] if len(w) > 1 else ""
                       for w in wl], pa.string())
        w3 = pa.array([w[2] if len(w) > 2 else ""
                       for w in wl], pa.string())
        t = pa.table({
            "w1": w1, "w2": w2, "w3": w3,
            "n": pa.array(np.ones(b.num_rows, np.int64)),
        })
        g = t.group_by(["w1", "w2", "w3"]).aggregate(
            [("n", "sum")])
        return g.rename_columns(["w1", "w2", "w3", "n"])

    def comb(b: pa.Table) -> pa.Table:
        g = b.group_by(["w1", "w2", "w3"]).aggregate(
            [("n", "sum")])
        return g.rename_columns(["w1", "w2", "w3", "n"])

    jc = tree_merge(
        parts.map_batches(part, batch_format="pyarrow",
                          batch_size=None), comb).to_pandas()
    if "w1" not in jc.columns or len(jc) == 0:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _PCE_COLS})
    n = float(jc["n"].sum())

    def ent(counts) -> float:
        p = counts.to_numpy(np.int64).astype(np.float64) / n
        return float(-(p * np.log2(p)).sum())

    h1 = ent(jc.groupby("w1")["n"].sum())
    h12 = ent(jc.groupby(["w1", "w2"])["n"].sum())
    h123 = ent(jc.groupby(["w1", "w2", "w3"])["n"].sum())
    return pa.table({
        "n_parts": pa.array([int(n)], pa.int64()),
        "h1_ppm": pa.array(
            [_round_half_away(h1 * 1e6)], pa.int64()),
        "h2_given_1_ppm": pa.array(
            [_round_half_away((h12 - h1) * 1e6)], pa.int64()),
        "h3_given_12_ppm": pa.array(
            [_round_half_away((h123 - h12) * 1e6)],
            pa.int64()),
        "joint_ppm": pa.array(
            [_round_half_away(h123 * 1e6)], pa.int64()),
    })


PCE_SQL = """
WITH w AS MATERIALIZED (
  SELECT COALESCE(STRING_SPLIT(p_type, ' ')[1], '') AS w1,
         COALESCE(STRING_SPLIT(p_type, ' ')[2], '') AS w2,
         COALESCE(STRING_SPLIT(p_type, ' ')[3], '') AS w3
  FROM part WHERE p_type IS NOT NULL
), jc AS MATERIALIZED (
  SELECT w1, w2, w3, CAST(COUNT(*) AS BIGINT) AS n
  FROM w GROUP BY 1, 2, 3
), tot AS MATERIALIZED (
  SELECT CAST(SUM(n) AS BIGINT) AS n FROM jc
), h1 AS MATERIALIZED (
  SELECT -SUM((CAST(s AS DOUBLE) / tot.n)
              * LOG2(CAST(s AS DOUBLE) / tot.n)) AS v
  FROM (SELECT w1, CAST(SUM(n) AS BIGINT) AS s
        FROM jc GROUP BY 1) m CROSS JOIN tot
), h12 AS MATERIALIZED (
  SELECT -SUM((CAST(s AS DOUBLE) / tot.n)
              * LOG2(CAST(s AS DOUBLE) / tot.n)) AS v
  FROM (SELECT w1, w2, CAST(SUM(n) AS BIGINT) AS s
        FROM jc GROUP BY 1, 2) m CROSS JOIN tot
), h123 AS MATERIALIZED (
  SELECT -SUM((CAST(jc.n AS DOUBLE) / tot.n)
              * LOG2(CAST(jc.n AS DOUBLE) / tot.n)) AS v
  FROM jc CROSS JOIN tot
)
SELECT tot.n AS n_parts,
       CAST(ROUND(h1.v * 1000000, 0) AS BIGINT) AS h1_ppm,
       CAST(ROUND((h12.v - h1.v) * 1000000, 0) AS BIGINT)
         AS h2_given_1_ppm,
       CAST(ROUND((h123.v - h12.v) * 1000000, 0) AS BIGINT)
         AS h3_given_12_ppm,
       CAST(ROUND(h123.v * 1000000, 0) AS BIGINT)
         AS joint_ppm
FROM tot CROSS JOIN h1 CROSS JOIN h12 CROSS JOIN h123
WHERE tot.n > 0
"""

_TTU_COLS = ["event_type", "n_events", "top_user",
             "top_share_ppm"]


def q_type_top_user_share(sf_dir):
    """Bot detection's first question: per event type, the
    single heaviest user's share of the whole stream (ties to
    the smallest user id) — any type where one account is a
    double-digit share isn't a population metric anymore.
    (type, user) counts fold exactly."""
    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "user_id"])

    def part(b: pa.Table) -> pa.Table:
        b = _valid(b, ("event_type", "user_id"))
        t = pa.table({
            "et": b["event_type"].cast(pa.string()),
            "u": b["user_id"].cast(pa.int64()),
            "n": pa.array(np.ones(b.num_rows, np.int64)),
        })
        g = t.group_by(["et", "u"]).aggregate([("n", "sum")])
        return g.rename_columns(["et", "u", "n"])

    def comb(b: pa.Table) -> pa.Table:
        g = b.group_by(["et", "u"]).aggregate([("n", "sum")])
        return g.rename_columns(["et", "u", "n"])

    tu = tree_merge(
        ev.map_batches(part, batch_format="pyarrow",
                       batch_size=None), comb).to_pandas()
    if "et" not in tu.columns or len(tu) == 0:
        return pa.table({
            "event_type": pa.array([], pa.string()),
            "n_events": pa.array([], pa.int64()),
            "top_user": pa.array([], pa.int64()),
            "top_share_ppm": pa.array([], pa.int64()),
        })
    rows = []
    for et, g in tu.groupby("et"):
        tot = int(g["n"].sum())
        if tot == 0:
            continue
        top = g.sort_values(["n", "u"],
                            ascending=[False, True]).iloc[0]
        rows.append((et, tot, int(top["u"]),
                     _round_half_away(int(top["n"]) / tot
                                      * 1e6)))
    rows.sort()
    return pa.table({
        "event_type": pa.array(
            [r[0] for r in rows], pa.string()),
        "n_events": pa.array([r[1] for r in rows], pa.int64()),
        "top_user": pa.array([r[2] for r in rows], pa.int64()),
        "top_share_ppm": pa.array(
            [r[3] for r in rows], pa.int64()),
    })


TTU_SQL = """
WITH tu AS MATERIALIZED (
  SELECT event_type AS et, user_id AS u,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM events
  WHERE event_type IS NOT NULL AND user_id IS NOT NULL
  GROUP BY 1, 2
), tot AS MATERIALIZED (
  SELECT et, CAST(SUM(n) AS BIGINT) AS t
  FROM tu GROUP BY 1
), top AS MATERIALIZED (
  SELECT et, u, n FROM tu
  QUALIFY ROW_NUMBER() OVER (PARTITION BY et
                             ORDER BY n DESC, u ASC) = 1
)
SELECT top.et AS event_type, tot.t AS n_events,
       CAST(top.u AS BIGINT) AS top_user,
       CAST(ROUND(CAST(top.n AS DOUBLE) / tot.t * 1000000, 0)
            AS BIGINT) AS top_share_ppm
FROM top JOIN tot USING (et)
WHERE tot.t > 0
ORDER BY top.et
"""

_LBL_COLS = ["l_linenumber", "n_lines", "mean_latency_x1e3"]


def q_latency_by_linenumber(sf_dir):
    """Sequential or parallel fulfilment?  Mean ship latency
    (days from order date) by line number — a rising staircase
    means the warehouse picks baskets line by line, flat means
    lines ship independently.  Lineitems join their header by
    key; latency day sums fold exactly."""
    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_linenumber", "l_shipdate"])
    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderdate"])
    li = li.materialize()
    orders = orders.materialize()
    if li.count() == 0 or orders.count() == 0:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _LBL_COLS})
    joined = _safe_join(
        li, orders,
        on=("l_orderkey",),
        right_on=("o_orderkey",),
        join_type="inner",
        num_partitions=16,
    )

    def part(b: pa.Table) -> pa.Table:
        b = _valid(b, ("l_linenumber", "l_shipdate",
                       "o_orderdate"))
        if b.num_rows == 0:
            return pa.table({
                "ln": pa.array([], pa.int64()),
                "n": pa.array([], pa.int64()),
                "s": pa.array([], pa.int64()),
            })
        lat = ((b["l_shipdate"].cast(pa.timestamp("us")).cast(
            pa.int64()).to_numpy(zero_copy_only=False)
            - b["o_orderdate"].cast(pa.timestamp("us")).cast(
                pa.int64()).to_numpy(zero_copy_only=False))
            // _DAY_US)
        df = pd.DataFrame({
            "ln": b["l_linenumber"].cast(pa.int64()).to_numpy(
                zero_copy_only=False),
            "n": 1, "s": lat,
        })
        agg = df.groupby("ln").sum().reset_index()
        for c in ["ln", "n", "s"]:
            agg[c] = agg[c].astype(np.int64)
        return pa.Table.from_pandas(agg, preserve_index=False)

    def comb(b: pa.Table) -> pa.Table:
        g = b.group_by(["ln"]).aggregate(
            [("n", "sum"), ("s", "sum")])
        return g.rename_columns(["ln", "n", "s"])

    cc = tree_merge(
        joined.map_batches(part, batch_format="pyarrow",
                           batch_size=None), comb).to_pandas()
    if "ln" not in cc.columns or len(cc) == 0:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _LBL_COLS})
    cc = cc.sort_values("ln")
    return pa.table({
        "l_linenumber": pa.array(
            cc["ln"].to_numpy(np.int64), pa.int64()),
        "n_lines": pa.array(
            cc["n"].to_numpy(np.int64), pa.int64()),
        "mean_latency_x1e3": pa.array(
            [_round_half_away(s / n * 1e3)
             for s, n in zip(cc["s"], cc["n"])], pa.int64()),
    })


LBL_SQL = f"""
WITH lat AS MATERIALIZED (
  SELECT CAST(l.l_linenumber AS BIGINT) AS ln,
         (EPOCH_US(l.l_shipdate) - EPOCH_US(o.o_orderdate))
           // {_DAY_US} AS d
  FROM lineitem l
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  WHERE l.l_linenumber IS NOT NULL
    AND l.l_shipdate IS NOT NULL
    AND o.o_orderdate IS NOT NULL
)
SELECT ln AS l_linenumber,
       CAST(COUNT(*) AS BIGINT) AS n_lines,
       CAST(ROUND(CAST(SUM(d) AS DOUBLE) / COUNT(*)
            * 1000, 0) AS BIGINT) AS mean_latency_x1e3
FROM lat
GROUP BY ln
ORDER BY ln
"""


def register_r4iz(queries: dict, oracles: dict) -> None:
    queries.update(
        {
            "ptype_chain_entropy": q_ptype_chain_entropy,
            "type_top_user_share": q_type_top_user_share,
            "latency_by_linenumber": q_latency_by_linenumber,
        }
    )
    oracles.update(
        {
            "ptype_chain_entropy": PCE_SQL,
            "type_top_user_share": TTU_SQL,
            "latency_by_linenumber": LBL_SQL,
        }
    )
