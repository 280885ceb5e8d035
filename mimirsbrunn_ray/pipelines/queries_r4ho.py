"""Round-4 batch HO: effective schedule dimensionality,
cross-source contamination, and endpoint retention — the
participation ratio of the 168-cell hour-of-week activity profile
((sum p)^2 / sum p^2 — how many hour-week cells effectively carry
the load; capacity planning for 30 effective cells differs wildly
from 168), the cross-source 8-word prefix duplicate census
(identical openings appearing in MULTIPLE sources — the
contamination signal source-internal dedup misses), and endpoint
week retention (the user-set Jaccard between the window's first
and last calendar weeks — the bookend churn number).

Exactness discipline: all three are pure integer counts and
exact-rational ratios; prefixes compare as exact strings."""

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

_PREFIX_WORDS = 8


def _valid(b: pa.Table, cols) -> pa.Table:
    m = None
    for c in cols:
        v = pc.is_valid(b[c])
        m = v if m is None else pc.and_(m, v)
    return b.filter(m)


_HWP_COLS = ["n_events", "n_active_cells",
             "participation_ratio_x1e3", "top_cell_ppm"]


def q_hourweek_participation_ratio(sf_dir):
    """Effective schedule dimensionality: over the 168 hour-of-
    week cells, the participation ratio (sum p)^2 / sum p^2 of the
    activity distribution — 168 means perfectly even load, small
    values mean a few cells carry everything and 'average hourly
    capacity' is a fiction.  Cell counts fold exactly; the ratio
    is one mirrored division."""
    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["ts"])

    def part(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_valid(b["ts"]))
        us = b["ts"].cast(pa.timestamp("us")).cast(pa.int64())
        hr = pc.divide(us, _HOUR_US)
        how = pc.subtract(
            hr, pc.multiply(pc.divide(hr, 168),
                            pa.scalar(168, pa.int64())))
        t = pa.table({"how": how})
        g = t.group_by(["how"]).aggregate([([], "count_all")])
        return g.rename_columns(["how", "n"])

    def comb(b: pa.Table) -> pa.Table:
        g = b.group_by(["how"]).aggregate([("n", "sum")])
        return g.rename_columns(["how", "n"])

    cc = tree_merge(
        ev.map_batches(part, batch_format="pyarrow",
                       batch_size=None),
        comb,
    ).to_pandas()
    if "how" not in cc.columns or len(cc) == 0:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _HWP_COLS})
    n = cc["n"].to_numpy(np.int64)
    total = int(n.sum())
    if total == 0:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _HWP_COLS})
    s2 = float((n.astype(np.float64) ** 2).sum())
    pr = float(total) * total / s2
    return pa.table({
        "n_events": pa.array([total], pa.int64()),
        "n_active_cells": pa.array([len(cc)], pa.int64()),
        "participation_ratio_x1e3": pa.array(
            [_round_half_away(pr * 1e3)], pa.int64()),
        "top_cell_ppm": pa.array(
            [_round_half_away(int(n.max()) / total * 1e6)],
            pa.int64()),
    })


HWP_SQL = f"""
WITH hw AS MATERIALIZED (
  SELECT (EPOCH_US(ts) // {_HOUR_US}) % 168 AS how,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM events WHERE ts IS NOT NULL
  GROUP BY 1
)
SELECT CAST(SUM(n) AS BIGINT) AS n_events,
       CAST(COUNT(*) AS BIGINT) AS n_active_cells,
       CAST(ROUND(CAST(SUM(n) AS DOUBLE) * SUM(n)
            / SUM(CAST(n AS DOUBLE) * n) * 1000, 0) AS BIGINT)
         AS participation_ratio_x1e3,
       CAST(ROUND(CAST(MAX(n) AS DOUBLE) / SUM(n) * 1000000, 0)
            AS BIGINT) AS top_cell_ppm
FROM hw HAVING SUM(n) > 0
"""

_CSP_COLS = ["n_prefixes", "n_cross_source",
             "cross_source_ppm", "max_sources_per_prefix"]


def q_cross_source_prefix_dups(sf_dir):
    """Cross-source contamination: distinct 8-word opening
    prefixes that appear in documents of TWO OR MORE sources —
    source-internal dedup never sees these, and each one is either
    licensed boilerplate or leaked content.  Distinct (prefix,
    source) incidences fold exactly."""
    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["source", "text"])

    def part(b: pa.Table) -> pa.Table:
        b = _valid(b, ("source", "text"))
        if b.num_rows == 0:
            return pa.table({
                "pfx": pa.array([], pa.string()),
                "source": pa.array([], pa.string()),
            })
        words = pc.split_pattern(b["text"], pattern=" ")
        pfx = pc.binary_join(
            pc.list_slice(words, 0, _PREFIX_WORDS), " ")
        t = pa.table({"pfx": pfx, "source": b["source"]})
        return t.group_by(["pfx", "source"]).aggregate([])

    def distinct(b: pa.Table) -> pa.Table:
        return b.select(["pfx", "source"]).group_by(
            ["pfx", "source"]).aggregate([])

    ps = tree_merge(
        docs.map_batches(part, batch_format="pyarrow",
                         batch_size=None),
        distinct,
        final_shards=8,
        shard_cols=["pfx"],
    ).to_pandas()
    if "pfx" not in ps.columns or len(ps) == 0:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _CSP_COLS})
    per_pfx = ps.groupby("pfx").size()
    n_pfx = len(per_pfx)
    cross = int((per_pfx >= 2).sum())
    return pa.table({
        "n_prefixes": pa.array([n_pfx], pa.int64()),
        "n_cross_source": pa.array([cross], pa.int64()),
        "cross_source_ppm": pa.array(
            [_round_half_away(cross / n_pfx * 1e6)], pa.int64()),
        "max_sources_per_prefix": pa.array(
            [int(per_pfx.max())], pa.int64()),
    })


CSP_SQL = f"""
WITH ps AS MATERIALIZED (
  SELECT DISTINCT
         array_to_string(string_split(text, ' ')
                         [1:{_PREFIX_WORDS}], ' ') AS pfx,
         source
  FROM documents
  WHERE source IS NOT NULL AND text IS NOT NULL
), per_pfx AS MATERIALIZED (
  SELECT pfx, CAST(COUNT(*) AS BIGINT) AS k
  FROM ps GROUP BY 1
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_prefixes,
       CAST(SUM(CASE WHEN k >= 2 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_cross_source,
       CAST(ROUND(CAST(SUM(CASE WHEN k >= 2 THEN 1 ELSE 0 END)
                       AS DOUBLE) / COUNT(*) * 1000000, 0)
            AS BIGINT) AS cross_source_ppm,
       CAST(MAX(k) AS BIGINT) AS max_sources_per_prefix
FROM per_pfx HAVING COUNT(*) > 0
"""

_WRE_COLS = ["n_first_week", "n_last_week", "n_retained",
             "jaccard_ppm"]


def q_week_retention_endpoints(sf_dir):
    """Bookend churn: the user-set overlap between the window's
    FIRST and LAST calendar weeks (epoch week = (day+4)//7) —
    retained count and Jaccard; the single cheapest end-to-end
    retention number, immune to every intermediate wobble.
    Distinct (user, week) pairs fold exactly."""
    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts"])

    def part(b: pa.Table) -> pa.Table:
        b = _valid(b, ("user_id", "ts"))
        us = b["ts"].cast(pa.timestamp("us")).cast(pa.int64())
        day = pc.divide(us, _DAY_US)
        week = pc.divide(pc.add(day, pa.scalar(4, pa.int64())),
                         pa.scalar(7, pa.int64()))
        t = pa.table({
            "user_id": b["user_id"].cast(pa.int64()),
            "week": week,
        })
        return t.group_by(["user_id", "week"]).aggregate([])

    def distinct(b: pa.Table) -> pa.Table:
        return b.select(["user_id", "week"]).group_by(
            ["user_id", "week"]).aggregate([])

    uw = tree_merge(
        ev.map_batches(part, batch_format="pyarrow",
                       batch_size=None),
        distinct,
        final_shards=8,
        shard_cols=["user_id"],
    ).to_pandas()
    if "week" not in uw.columns or len(uw) == 0:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _WRE_COLS})
    wmin = int(uw["week"].min())
    wmax = int(uw["week"].max())
    first = set(uw[uw["week"] == wmin]["user_id"].astype(
        np.int64))
    last = set(uw[uw["week"] == wmax]["user_id"].astype(
        np.int64))
    inter = len(first & last)
    union = len(first | last)
    if union == 0:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _WRE_COLS})
    return pa.table({
        "n_first_week": pa.array([len(first)], pa.int64()),
        "n_last_week": pa.array([len(last)], pa.int64()),
        "n_retained": pa.array([inter], pa.int64()),
        "jaccard_ppm": pa.array(
            [_round_half_away(inter / union * 1e6)], pa.int64()),
    })


WRE_SQL = f"""
WITH uw AS MATERIALIZED (
  SELECT DISTINCT user_id,
         ((EPOCH_US(ts) // {_DAY_US}) + 4) // 7 AS week
  FROM events
  WHERE user_id IS NOT NULL AND ts IS NOT NULL
), span AS MATERIALIZED (
  SELECT MIN(week) AS w0, MAX(week) AS w1 FROM uw
), fw AS MATERIALIZED (
  SELECT uw.user_id FROM uw CROSS JOIN span
  WHERE uw.week = span.w0
), lw AS MATERIALIZED (
  SELECT uw.user_id FROM uw CROSS JOIN span
  WHERE uw.week = span.w1
), sets AS (
  SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM fw) AS nf,
         (SELECT CAST(COUNT(*) AS BIGINT) FROM lw) AS nl,
         (SELECT CAST(COUNT(*) AS BIGINT) FROM fw
          WHERE user_id IN (SELECT user_id FROM lw)) AS ni
)
SELECT nf AS n_first_week,
       nl AS n_last_week,
       ni AS n_retained,
       CAST(ROUND(CAST(ni AS DOUBLE) / (nf + nl - ni)
            * 1000000, 0) AS BIGINT) AS jaccard_ppm
FROM sets WHERE nf + nl - ni > 0
"""


def register_r4ho(queries: dict, oracles: dict) -> None:
    queries.update(
        {
            "hourweek_participation_ratio":
                q_hourweek_participation_ratio,
            "cross_source_prefix_dups": q_cross_source_prefix_dups,
            "week_retention_endpoints": q_week_retention_endpoints,
        }
    )
    oracles.update(
        {
            "hourweek_participation_ratio": HWP_SQL,
            "cross_source_prefix_dups": CSP_SQL,
            "week_retention_endpoints": WRE_SQL,
        }
    )
