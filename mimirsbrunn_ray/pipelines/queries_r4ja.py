"""Round-4 batch JA: typographic hygiene, synthetic-balance
fingerprints, and the same-day-ship KPI — the double-space audit
(what share of docs carry consecutive-space runs and how dense
they are — the classic scraped-HTML artifact), the whole-dollar
balance share (account balances landing exactly on whole
dollars, against the 1% a uniform cents distribution predicts —
hand-entered or synthetic balances glow here), and the same-day
ship share by priority (lines shipped the very day the order was
placed — the only latency number operations brags about).

Exactness discipline: double-space counts use the identical
greedy non-overlapping semantics on both sides; whole-dollar
tests are exact modular arithmetic; same-day cuts are exact
integer day equality."""

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


_DSA_COLS = ["source", "n_docs", "affected_ppm",
             "runs_per_1k_chars_x1e3"]


def q_double_space_audit(sf_dir):
    """The scraped-HTML artifact: per source, the share of docs
    containing at least one double space and the density of
    double-space runs per 1000 characters (greedy
    non-overlapping count, identical on both engines) — clean
    prose has none; collapsed markup is full of them.  Counts
    fold exactly."""
    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["source", "text"])

    def part(b: pa.Table) -> pa.Table:
        b = _valid(b, ("source", "text"))
        if b.num_rows == 0:
            return pa.table({
                "source": pa.array([], pa.string()),
                "n": pa.array([], pa.int64()),
                "aff": pa.array([], pa.int64()),
                "runs": pa.array([], pa.int64()),
                "chars": pa.array([], pa.int64()),
            })
        runs = pc.count_substring(b["text"], "  ").to_numpy(
            zero_copy_only=False).astype(np.int64)
        chars = pc.utf8_length(b["text"]).to_numpy(
            zero_copy_only=False).astype(np.int64)
        df = pd.DataFrame({
            "source": np.asarray(
                b["source"].to_numpy(zero_copy_only=False)),
            "n": 1,
            "aff": (runs > 0).astype(np.int64),
            "runs": runs,
            "chars": chars,
        })
        agg = df.groupby("source").sum().reset_index()
        for c in ["n", "aff", "runs", "chars"]:
            agg[c] = agg[c].astype(np.int64)
        return pa.Table.from_pandas(agg, preserve_index=False)

    def comb(b: pa.Table) -> pa.Table:
        g = b.group_by(["source"]).aggregate(
            [("n", "sum"), ("aff", "sum"), ("runs", "sum"),
             ("chars", "sum")])
        return g.rename_columns(
            ["source", "n", "aff", "runs", "chars"])

    cc = tree_merge(
        docs.map_batches(part, batch_format="pyarrow",
                         batch_size=None), comb).to_pandas()
    if "source" not in cc.columns or len(cc) == 0:
        return pa.table({
            "source": pa.array([], pa.string()),
            "n_docs": pa.array([], pa.int64()),
            "affected_ppm": pa.array([], pa.int64()),
            "runs_per_1k_chars_x1e3": pa.array([], pa.int64()),
        })
    cc = cc[cc["chars"] > 0].sort_values("source")
    return pa.table({
        "source": pa.array(cc["source"], pa.string()),
        "n_docs": pa.array(
            cc["n"].to_numpy(np.int64), pa.int64()),
        "affected_ppm": pa.array(
            [_round_half_away(a / n * 1e6)
             for a, n in zip(cc["aff"], cc["n"])], pa.int64()),
        "runs_per_1k_chars_x1e3": pa.array(
            [_round_half_away(r / ch * 1000 * 1e3)
             for r, ch in zip(cc["runs"], cc["chars"])],
            pa.int64()),
    })


DSA_SQL = """
WITH dd AS MATERIALIZED (
  SELECT source,
         (LENGTH(text) - LENGTH(REPLACE(text, '  ', ''))) // 2
           AS runs,
         LENGTH(text) AS chars
  FROM documents
  WHERE source IS NOT NULL AND text IS NOT NULL
), agg AS MATERIALIZED (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CASE WHEN runs > 0 THEN 1 ELSE 0 END)
              AS BIGINT) AS aff,
         CAST(SUM(runs) AS BIGINT) AS runs,
         CAST(SUM(chars) AS BIGINT) AS chars
  FROM dd GROUP BY 1
)
SELECT source, n AS n_docs,
       CAST(ROUND(CAST(aff AS DOUBLE) / n * 1000000, 0)
            AS BIGINT) AS affected_ppm,
       CAST(ROUND(CAST(runs AS DOUBLE) / chars * 1000
            * 1000, 0) AS BIGINT) AS runs_per_1k_chars_x1e3
FROM agg
WHERE chars > 0
ORDER BY source
"""

_BWD_COLS = ["n_customers", "whole_dollar_count",
             "whole_dollar_ppm", "uniform_ratio_x1e3"]


def q_balance_whole_dollar_share(sf_dir):
    """Synthetic-balance fingerprint: how many account balances
    land exactly on whole dollars (cents % 100 == 0), against
    the 1% a uniform cents distribution predicts — a ratio far
    above 1000 (x1e3) means balances were typed or generated,
    not accrued.  Pure modular arithmetic on exact cents."""
    cust = rd.read_parquet(f"{sf_dir}/customer.parquet",
                           columns=["c_acctbal"])

    def part(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_valid(b["c_acctbal"]))
        if b.num_rows == 0:
            return pa.table({
                "n": pa.array([], pa.int64()),
                "wd": pa.array([], pa.int64()),
            })
        bal = b["c_acctbal"].cast(pa.float64()).to_numpy(
            zero_copy_only=False)
        cents = np.where(bal >= 0, np.floor(bal * 100 + 0.5),
                         np.ceil(bal * 100 - 0.5)).astype(
            np.int64)
        return pa.table({
            "n": pa.array([len(cents)], pa.int64()),
            "wd": pa.array(
                [int((np.mod(cents, 100) == 0).sum())],
                pa.int64()),
        })

    def comb(b: pa.Table) -> pa.Table:
        return pa.table({
            "n": pa.array(
                [pc.sum(b["n"]).as_py() or 0], pa.int64()),
            "wd": pa.array(
                [pc.sum(b["wd"]).as_py() or 0], pa.int64()),
        })

    st = tree_merge(
        cust.map_batches(part, batch_format="pyarrow",
                         batch_size=None), comb).to_pandas()
    if "n" not in st.columns or len(st) == 0:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _BWD_COLS})
    n = int(st["n"].sum())
    if n == 0:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _BWD_COLS})
    wd = int(st["wd"].sum())
    share = wd / n
    return pa.table({
        "n_customers": pa.array([n], pa.int64()),
        "whole_dollar_count": pa.array([wd], pa.int64()),
        "whole_dollar_ppm": pa.array(
            [_round_half_away(share * 1e6)], pa.int64()),
        "uniform_ratio_x1e3": pa.array(
            [_round_half_away(share / 0.01 * 1e3)],
            pa.int64()),
    })


BWD_SQL = """
WITH cb AS MATERIALIZED (
  SELECT CAST(ROUND(c_acctbal * 100, 0) AS BIGINT) AS cents
  FROM customer WHERE c_acctbal IS NOT NULL
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_customers,
       CAST(SUM(CASE WHEN cents % 100 = 0 THEN 1 ELSE 0 END)
            AS BIGINT) AS whole_dollar_count,
       CAST(ROUND(CAST(SUM(CASE WHEN cents % 100 = 0 THEN 1
                                ELSE 0 END) AS DOUBLE)
            / COUNT(*) * 1000000, 0) AS BIGINT)
         AS whole_dollar_ppm,
       CAST(ROUND(CAST(SUM(CASE WHEN cents % 100 = 0 THEN 1
                                ELSE 0 END) AS DOUBLE)
            / COUNT(*) / 0.01 * 1000, 0) AS BIGINT)
         AS uniform_ratio_x1e3
FROM cb HAVING COUNT(*) > 0
"""

_SDS_COLS = ["o_orderpriority", "n_lines", "same_day_ppm",
             "within_3d_ppm"]


def q_same_day_ship_share(sf_dir):
    """The number operations brags about: per order priority,
    the share of lines shipped THE SAME day the order was
    placed, and within 3 days — if urgent orders don't lead
    here, the priority field is decoration.  Lineitems join
    their header; day equality is an exact integer test."""
    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_shipdate"])
    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderdate",
                 "o_orderpriority"])
    li = li.materialize()
    orders = orders.materialize()
    if li.count() == 0 or orders.count() == 0:
        return pa.table({
            "o_orderpriority": pa.array([], pa.string()),
            "n_lines": pa.array([], pa.int64()),
            "same_day_ppm": pa.array([], pa.int64()),
            "within_3d_ppm": pa.array([], pa.int64()),
        })
    joined = _safe_join(
        li, orders,
        on=("l_orderkey",),
        right_on=("o_orderkey",),
        join_type="inner",
        num_partitions=16,
    )

    def part(b: pa.Table) -> pa.Table:
        b = _valid(b, ("l_shipdate", "o_orderdate",
                       "o_orderpriority"))
        if b.num_rows == 0:
            return pa.table({
                "pr": pa.array([], pa.string()),
                "n": pa.array([], pa.int64()),
                "sd": pa.array([], pa.int64()),
                "w3": pa.array([], pa.int64()),
            })
        lat = ((b["l_shipdate"].cast(pa.timestamp("us")).cast(
            pa.int64()).to_numpy(zero_copy_only=False)
            - b["o_orderdate"].cast(pa.timestamp("us")).cast(
                pa.int64()).to_numpy(zero_copy_only=False))
            // _DAY_US)
        df = pd.DataFrame({
            "pr": np.asarray(
                b["o_orderpriority"].to_numpy(
                    zero_copy_only=False)),
            "n": 1,
            "sd": (lat == 0).astype(np.int64),
            "w3": (lat <= 3).astype(np.int64),
        })
        agg = df.groupby("pr").sum().reset_index()
        for c in ["n", "sd", "w3"]:
            agg[c] = agg[c].astype(np.int64)
        return pa.Table.from_pandas(agg, preserve_index=False)

    def comb(b: pa.Table) -> pa.Table:
        g = b.group_by(["pr"]).aggregate(
            [("n", "sum"), ("sd", "sum"), ("w3", "sum")])
        return g.rename_columns(["pr", "n", "sd", "w3"])

    cc = tree_merge(
        joined.map_batches(part, batch_format="pyarrow",
                           batch_size=None), comb).to_pandas()
    if "pr" not in cc.columns or len(cc) == 0:
        return pa.table({
            "o_orderpriority": pa.array([], pa.string()),
            "n_lines": pa.array([], pa.int64()),
            "same_day_ppm": pa.array([], pa.int64()),
            "within_3d_ppm": pa.array([], pa.int64()),
        })
    cc = cc.sort_values("pr")
    return pa.table({
        "o_orderpriority": pa.array(cc["pr"], pa.string()),
        "n_lines": pa.array(
            cc["n"].to_numpy(np.int64), pa.int64()),
        "same_day_ppm": pa.array(
            [_round_half_away(s / n * 1e6)
             for s, n in zip(cc["sd"], cc["n"])], pa.int64()),
        "within_3d_ppm": pa.array(
            [_round_half_away(w / n * 1e6)
             for w, n in zip(cc["w3"], cc["n"])], pa.int64()),
    })


SDSS_SQL = f"""
WITH lat AS MATERIALIZED (
  SELECT o.o_orderpriority AS pr,
         (EPOCH_US(l.l_shipdate) - EPOCH_US(o.o_orderdate))
           // {_DAY_US} AS d
  FROM lineitem l
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  WHERE l.l_shipdate IS NOT NULL AND o.o_orderdate IS NOT NULL
    AND o.o_orderpriority IS NOT NULL
)
SELECT pr AS o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_lines,
       CAST(ROUND(CAST(SUM(CASE WHEN d = 0 THEN 1 ELSE 0 END)
                       AS DOUBLE) / COUNT(*) * 1000000, 0)
            AS BIGINT) AS same_day_ppm,
       CAST(ROUND(CAST(SUM(CASE WHEN d <= 3 THEN 1 ELSE 0 END)
                       AS DOUBLE) / COUNT(*) * 1000000, 0)
            AS BIGINT) AS within_3d_ppm
FROM lat
GROUP BY pr
ORDER BY pr
"""


def register_r4ja(queries: dict, oracles: dict) -> None:
    queries.update(
        {
            "double_space_audit": q_double_space_audit,
            "balance_whole_dollar_share":
                q_balance_whole_dollar_share,
            "same_day_ship_share": q_same_day_ship_share,
        }
    )
    oracles.update(
        {
            "double_space_audit": DSA_SQL,
            "balance_whole_dollar_share": BWD_SQL,
            "same_day_ship_share": SDSS_SQL,
        }
    )
