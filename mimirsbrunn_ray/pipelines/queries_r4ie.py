"""Round-4 batch IE: fiscal rhythm, orthographic fingerprints,
and the weekly heatmap's hot corner — the quarter-position load
(are orders and revenue front- or back-loaded within the fiscal
quarter, with a chi-square against uniform thirds), the
character-class mix per source (digits, uppercase and spaces per
1000 chars — the orthographic fingerprint that separates
tables-of-numbers corpora from prose corpora), and the week
heatmap peak concentration (what share of all events lands in
the top-5 of the 168 day-of-week × hour cells).

Exactness discipline: month-in-quarter and heatmap cells are
exact integer counts; char-class counts are exact per-row regex
match counts folded as integers; all shares snap at ppm."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from mimirsbrunn_ray.pipelines.queries_r4fk import (
    _DAY_US,
    _HOUR_US,
    _round_half_away,
)
from mimirsbrunn_ray.stages.rollup import tree_merge


def _valid(b: pa.Table, cols) -> pa.Table:
    m = None
    for c in cols:
        v = pc.is_valid(b[c])
        m = v if m is None else pc.and_(m, v)
    return b.filter(m)


_QEL_COLS = ["month_in_quarter", "n_orders", "order_share_ppm",
             "revenue_cents", "revenue_share_ppm", "chi2_x1e3"]


def q_quarter_end_load(sf_dir):
    """Fiscal rhythm: orders and revenue by month position
    within the quarter (0 = first, 2 = quarter-end), with the
    order-count chi-square against uniform thirds repeated on
    each row — back-loading means the sales org is sandbagging
    until the deadline.  Cents and counts fold exactly."""
    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderdate", "o_totalprice"])

    def part(b: pa.Table) -> pa.Table:
        b = _valid(b, ("o_orderdate", "o_totalprice"))
        if b.num_rows == 0:
            return pa.table({
                "miq": pa.array([], pa.int64()),
                "n": pa.array([], pa.int64()),
                "cents": pa.array([], pa.int64()),
            })
        d = b["o_orderdate"].cast(pa.timestamp("us")).to_pandas()
        miq = ((d.dt.month - 1) % 3).to_numpy(np.int64)
        tp = b["o_totalprice"].cast(pa.float64()).to_numpy(
            zero_copy_only=False)
        cents = np.where(tp >= 0, np.floor(tp * 100.0 + 0.5),
                         np.ceil(tp * 100.0 - 0.5)).astype(
            np.int64)
        df = pd.DataFrame({"miq": miq, "n": 1, "cents": cents})
        agg = df.groupby("miq").agg(
            n=("n", "sum"), cents=("cents", "sum")).reset_index()
        for c in ["miq", "n", "cents"]:
            agg[c] = agg[c].astype(np.int64)
        return pa.Table.from_pandas(agg, preserve_index=False)

    def comb(b: pa.Table) -> pa.Table:
        g = b.group_by(["miq"]).aggregate(
            [("n", "sum"), ("cents", "sum")])
        return g.rename_columns(["miq", "n", "cents"])

    cc = tree_merge(
        orders.map_batches(part, batch_format="pyarrow",
                           batch_size=None),
        comb,
    ).to_pandas()
    if "miq" not in cc.columns or len(cc) == 0:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _QEL_COLS})
    cc = cc.sort_values("miq")
    n = cc["n"].to_numpy(np.int64)
    cents = cc["cents"].to_numpy(np.int64)
    tot_n = int(n.sum())
    tot_c = int(cents.sum())
    if tot_n == 0 or tot_c == 0:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _QEL_COLS})
    exp = tot_n / 3.0
    chi2 = float((((n - exp) ** 2) / exp).sum())
    chi_snap = _round_half_away(chi2 * 1e3)
    return pa.table({
        "month_in_quarter": pa.array(
            cc["miq"].to_numpy(np.int64), pa.int64()),
        "n_orders": pa.array(n, pa.int64()),
        "order_share_ppm": pa.array(
            [_round_half_away(x / tot_n * 1e6) for x in n],
            pa.int64()),
        "revenue_cents": pa.array(cents, pa.int64()),
        "revenue_share_ppm": pa.array(
            [_round_half_away(x / tot_c * 1e6) for x in cents],
            pa.int64()),
        "chi2_x1e3": pa.array(
            [chi_snap] * len(cc), pa.int64()),
    })


QEL_SQL = """
WITH oc AS MATERIALIZED (
  SELECT (MONTH(o_orderdate) - 1) % 3 AS miq,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT))
              AS BIGINT) AS cents
  FROM orders
  WHERE o_orderdate IS NOT NULL AND o_totalprice IS NOT NULL
  GROUP BY 1
), tot AS MATERIALIZED (
  SELECT CAST(SUM(n) AS BIGINT) AS tn,
         CAST(SUM(cents) AS BIGINT) AS tc
  FROM oc
), chi AS MATERIALIZED (
  SELECT SUM((n - tot.tn / 3.0) * (n - tot.tn / 3.0)
             / (tot.tn / 3.0)) AS chi2
  FROM oc CROSS JOIN tot
)
SELECT CAST(oc.miq AS BIGINT) AS month_in_quarter,
       oc.n AS n_orders,
       CAST(ROUND(CAST(oc.n AS DOUBLE) / tot.tn * 1000000, 0)
            AS BIGINT) AS order_share_ppm,
       oc.cents AS revenue_cents,
       CAST(ROUND(CAST(oc.cents AS DOUBLE) / tot.tc
            * 1000000, 0) AS BIGINT) AS revenue_share_ppm,
       CAST(ROUND(chi.chi2 * 1000, 0) AS BIGINT) AS chi2_x1e3
FROM oc CROSS JOIN tot CROSS JOIN chi
WHERE tot.tn > 0 AND tot.tc > 0
ORDER BY oc.miq
"""

_CCM_COLS = ["source", "n_chars", "digits_per_1k_x1e3",
             "upper_per_1k_x1e3", "space_per_1k_x1e3"]


def q_char_class_mix_by_source(sf_dir):
    """Orthographic fingerprints: per source, digits, uppercase
    letters and spaces per 1000 characters — numbers-heavy feeds
    and SHOUTING feeds stand out before any language model runs.
    Per-row class counts are exact regex match counts; totals
    fold as integers."""
    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["source", "text"])

    def part(b: pa.Table) -> pa.Table:
        b = _valid(b, ("source", "text"))
        if b.num_rows == 0:
            return pa.table({
                "source": pa.array([], pa.string()),
                "chars": pa.array([], pa.int64()),
                "dig": pa.array([], pa.int64()),
                "up": pa.array([], pa.int64()),
                "sp": pa.array([], pa.int64()),
            })
        chars = pc.utf8_length(b["text"]).to_numpy(
            zero_copy_only=False).astype(np.int64)
        dig = pc.count_substring_regex(
            b["text"], "[0-9]").to_numpy(
            zero_copy_only=False).astype(np.int64)
        up = pc.count_substring_regex(
            b["text"], "[A-Z]").to_numpy(
            zero_copy_only=False).astype(np.int64)
        sp = pc.count_substring(b["text"], " ").to_numpy(
            zero_copy_only=False).astype(np.int64)
        df = pd.DataFrame({
            "source": np.asarray(
                b["source"].to_numpy(zero_copy_only=False)),
            "chars": chars, "dig": dig, "up": up, "sp": sp,
        })
        agg = df.groupby("source").sum().reset_index()
        for c in ["chars", "dig", "up", "sp"]:
            agg[c] = agg[c].astype(np.int64)
        return pa.Table.from_pandas(agg, preserve_index=False)

    def comb(b: pa.Table) -> pa.Table:
        g = b.group_by(["source"]).aggregate(
            [("chars", "sum"), ("dig", "sum"), ("up", "sum"),
             ("sp", "sum")])
        return g.rename_columns(
            ["source", "chars", "dig", "up", "sp"])

    cc = tree_merge(
        docs.map_batches(part, batch_format="pyarrow",
                         batch_size=None),
        comb,
    ).to_pandas()
    if "source" not in cc.columns or len(cc) == 0:
        return pa.table({
            "source": pa.array([], pa.string()),
            "n_chars": pa.array([], pa.int64()),
            "digits_per_1k_x1e3": pa.array([], pa.int64()),
            "upper_per_1k_x1e3": pa.array([], pa.int64()),
            "space_per_1k_x1e3": pa.array([], pa.int64()),
        })
    cc = cc[cc["chars"] > 0].sort_values("source")
    ch = cc["chars"].to_numpy(np.int64).astype(np.float64)
    return pa.table({
        "source": pa.array(cc["source"], pa.string()),
        "n_chars": pa.array(
            cc["chars"].to_numpy(np.int64), pa.int64()),
        "digits_per_1k_x1e3": pa.array(
            [_round_half_away(d / c * 1000 * 1e3)
             for d, c in zip(cc["dig"], ch)], pa.int64()),
        "upper_per_1k_x1e3": pa.array(
            [_round_half_away(u / c * 1000 * 1e3)
             for u, c in zip(cc["up"], ch)], pa.int64()),
        "space_per_1k_x1e3": pa.array(
            [_round_half_away(s / c * 1000 * 1e3)
             for s, c in zip(cc["sp"], ch)], pa.int64()),
    })


CCM_SQL = """
WITH cm AS MATERIALIZED (
  SELECT source,
         CAST(SUM(LENGTH(text)) AS BIGINT) AS chars,
         CAST(SUM(LENGTH(REGEXP_REPLACE(text, '[^0-9]', '',
                                        'g'))) AS BIGINT)
           AS dig,
         CAST(SUM(LENGTH(REGEXP_REPLACE(text, '[^A-Z]', '',
                                        'g'))) AS BIGINT)
           AS up,
         CAST(SUM(LENGTH(text)
                  - LENGTH(REPLACE(text, ' ', '')))
              AS BIGINT) AS sp
  FROM documents
  WHERE source IS NOT NULL AND text IS NOT NULL
  GROUP BY 1
)
SELECT source, chars AS n_chars,
       CAST(ROUND(CAST(dig AS DOUBLE) / chars * 1000 * 1000, 0)
            AS BIGINT) AS digits_per_1k_x1e3,
       CAST(ROUND(CAST(up AS DOUBLE) / chars * 1000 * 1000, 0)
            AS BIGINT) AS upper_per_1k_x1e3,
       CAST(ROUND(CAST(sp AS DOUBLE) / chars * 1000 * 1000, 0)
            AS BIGINT) AS space_per_1k_x1e3
FROM cm
WHERE chars > 0
ORDER BY source
"""

_WPC_COLS = ["n_events", "n_cells", "top1_share_ppm",
             "top5_share_ppm"]


def q_week_heatmap_peak_concentration(sf_dir):
    """The hot corner of the week: the share of ALL events that
    lands in the single hottest and the five hottest of the 168
    day-of-week × hour-of-day cells — capacity planning cares
    about this corner, not the average hour.  Cell counts fold
    exactly; top-k sums are tie-safe (equal counts at the
    boundary contribute equal sums)."""
    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["ts"])

    def part(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_valid(b["ts"]))
        if b.num_rows == 0:
            return pa.table({
                "cell": pa.array([], pa.int64()),
                "n": pa.array([], pa.int64()),
            })
        us = b["ts"].cast(pa.timestamp("us")).cast(
            pa.int64()).to_numpy(zero_copy_only=False)
        dow = (us // _DAY_US) % 7
        hod = (us // _HOUR_US) % 24
        cell = dow * 24 + hod
        t = pa.table({
            "cell": pa.array(cell.astype(np.int64)),
            "n": pa.array(np.ones(len(cell), np.int64)),
        })
        g = t.group_by(["cell"]).aggregate([("n", "sum")])
        return g.rename_columns(["cell", "n"])

    def comb(b: pa.Table) -> pa.Table:
        g = b.group_by(["cell"]).aggregate([("n", "sum")])
        return g.rename_columns(["cell", "n"])

    cc = tree_merge(
        ev.map_batches(part, batch_format="pyarrow",
                       batch_size=None),
        comb,
    ).to_pandas()
    if "cell" not in cc.columns or len(cc) == 0:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _WPC_COLS})
    n = np.sort(cc["n"].to_numpy(np.int64))[::-1]
    tot = int(n.sum())
    if tot == 0:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _WPC_COLS})
    return pa.table({
        "n_events": pa.array([tot], pa.int64()),
        "n_cells": pa.array([len(n)], pa.int64()),
        "top1_share_ppm": pa.array(
            [_round_half_away(int(n[0]) / tot * 1e6)],
            pa.int64()),
        "top5_share_ppm": pa.array(
            [_round_half_away(int(n[:5].sum()) / tot * 1e6)],
            pa.int64()),
    })


WPC_SQL = f"""
WITH cells AS MATERIALIZED (
  SELECT ((EPOCH_US(ts) // {_DAY_US}) % 7) * 24
         + (EPOCH_US(ts) // {_HOUR_US}) % 24 AS cell,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM events WHERE ts IS NOT NULL
  GROUP BY 1
), tot AS MATERIALIZED (
  SELECT CAST(SUM(n) AS BIGINT) AS t,
         CAST(COUNT(*) AS BIGINT) AS k
  FROM cells
), top5 AS MATERIALIZED (
  SELECT CAST(SUM(n) AS BIGINT) AS s5, CAST(MAX(n) AS BIGINT)
           AS s1
  FROM (SELECT n FROM cells ORDER BY n DESC LIMIT 5)
)
SELECT tot.t AS n_events, tot.k AS n_cells,
       CAST(ROUND(CAST(top5.s1 AS DOUBLE) / tot.t
            * 1000000, 0) AS BIGINT) AS top1_share_ppm,
       CAST(ROUND(CAST(top5.s5 AS DOUBLE) / tot.t
            * 1000000, 0) AS BIGINT) AS top5_share_ppm
FROM tot CROSS JOIN top5
WHERE tot.t > 0
"""


def register_r4ie(queries: dict, oracles: dict) -> None:
    queries.update(
        {
            "quarter_end_load": q_quarter_end_load,
            "char_class_mix_by_source":
                q_char_class_mix_by_source,
            "week_heatmap_peak_concentration":
                q_week_heatmap_peak_concentration,
        }
    )
    oracles.update(
        {
            "quarter_end_load": QEL_SQL,
            "char_class_mix_by_source": CCM_SQL,
            "week_heatmap_peak_concentration": WPC_SQL,
        }
    )
