"""Round-4 batch BR: hourly type concentration, word stutter runs, and
order gap days.

Exactness discipline: HHI ships the integer pair (sum of squared type
counts, squared total) per hour-of-day; stutter runs are exact island
lengths over token adjacency; gap days are integer span arithmetic.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from mimirsbrunn_ray.stages.rollup import tree_merge

_HOUR_US = 3_600_000_000
_DAY_US = 86_400_000_000


# ---------------------------------------------------------------------------
# type-concentration (HHI) profile by hour of day
# ---------------------------------------------------------------------------


def q_type_hhi_by_hour(sf_dir):
    """Per hour of day: the Herfindahl concentration of the event-type
    mix as the integer pair (sum of squared type counts, squared total)
    — hours where one type dominates vs balanced hours. One bounded
    (hod, type) pass; the squares fold over 24 x types rows."""
    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "ts"]
    )

    def partial(b: pa.Table) -> pa.Table:
        b = b.filter(
            pc.and_(pc.is_valid(b["event_type"]), pc.is_valid(b["ts"]))
        )
        ts_us = b["ts"].cast(pa.timestamp("us")).cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        hod = ((ts_us // _HOUR_US) % 24).astype(np.int64)
        t = pa.table(
            {"hod": pa.array(hod), "event_type": b["event_type"]}
        )
        g = t.group_by(["hod", "event_type"]).aggregate(
            [([], "count_all")]
        )
        g = g.select(["hod", "event_type", "count_all"])
        return g.rename_columns(["hod", "event_type", "n"])

    def combine(b: pa.Table) -> pa.Table:
        g = b.group_by(["hod", "event_type"]).aggregate([("n", "sum")])
        return g.rename_columns(["hod", "event_type", "n"])

    grid = tree_merge(
        ev.map_batches(partial, batch_format="pyarrow", batch_size=None),
        combine,
    ).to_pandas()  # bounded: 24 x types

    rows = {"hod": [], "hhi_num": [], "hhi_den": []}
    if len(grid):
        for hod, g in grid.groupby("hod", sort=True):
            n = g["n"].to_numpy(dtype=np.int64)
            rows["hod"].append(int(hod))
            rows["hhi_num"].append(int(np.dot(n, n)))
            rows["hhi_den"].append(int(n.sum()) ** 2)
    return pa.table(
        {
            "hod": pa.array(rows["hod"], pa.int64()),
            "hhi_num": pa.array(rows["hhi_num"], pa.int64()),
            "hhi_den": pa.array(rows["hhi_den"], pa.int64()),
        }
    )


HHI_HOUR_SQL = """
WITH g AS (
  SELECT CAST(hour(ts) AS BIGINT) AS hod, event_type,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM events
  WHERE event_type IS NOT NULL AND ts IS NOT NULL
  GROUP BY 1, 2
)
SELECT hod,
       CAST(SUM(n * n) AS BIGINT) AS hhi_num,
       CAST(SUM(n) * SUM(n) AS BIGINT) AS hhi_den
FROM g GROUP BY 1
"""


# ---------------------------------------------------------------------------
# word stutter: longest immediate-repeat run per doc
# ---------------------------------------------------------------------------


def q_word_stutter_hist(sf_dir):
    """Histogram of the longest IMMEDIATE word repeat per document
    (max island of consecutive equal tokens) — the stutter detector for
    generation loops and copy-paste artifacts ('the the the').
    Vectorized adjacency equality over CSR token segments; bounded
    (run-length, doc-count) output."""
    docs = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )

    def partial(b: pa.Table) -> pa.Table:
        b = b.filter(
            pc.and_(pc.is_valid(b["doc_id"]), pc.is_valid(b["text"]))
        )
        empty = pa.table(
            {
                "max_run": pa.array([], pa.int64()),
                "n_docs": pa.array([], pa.int64()),
            }
        )
        if b.num_rows == 0:
            return empty
        words = pc.split_pattern(pc.utf8_lower(b["text"]), " ")
        n_per = pc.list_value_length(words).to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        flat = pc.list_flatten(words).to_numpy(zero_copy_only=False)
        seg = np.repeat(np.arange(len(b)), n_per)
        same = np.zeros(len(flat), dtype=bool)
        if len(flat) > 1:
            same[1:] = (flat[1:] == flat[:-1]) & (seg[1:] == seg[:-1])
        # island lengths: run of consecutive `same` + 1
        run = np.zeros(len(flat), dtype=np.int64)
        cur = 0
        # vectorized run computation: positions where same is False reset
        # cumulative count trick: run_i = i - last_reset_index
        idxs = np.arange(len(flat))
        reset = np.where(~same, idxs, 0)
        np.maximum.accumulate(reset, out=reset)
        run = idxs - reset + 1  # length of the current equal-run
        per_doc = (
            pd.DataFrame({"seg": seg, "run": run})
            .groupby("seg", sort=False)["run"]
            .max()
        )
        mx = np.zeros(len(b), dtype=np.int64)
        mx[per_doc.index.to_numpy()] = per_doc.to_numpy(dtype=np.int64)
        lvl, cnt = np.unique(mx, return_counts=True)
        return pa.table(
            {
                "max_run": pa.array(lvl.astype(np.int64)),
                "n_docs": pa.array(cnt.astype(np.int64)),
            }
        )

    def combine(b: pa.Table) -> pa.Table:
        g = b.group_by(["max_run"]).aggregate([("n_docs", "sum")])
        return g.rename_columns(["max_run", "n_docs"])

    return tree_merge(
        docs.map_batches(partial, batch_format="pyarrow", batch_size=None),
        combine,
    )


STUTTER_SQL = """
WITH w AS (
  SELECT doc_id, string_split(lower(text), ' ') AS ws
  FROM documents WHERE doc_id IS NOT NULL AND text IS NOT NULL
), f AS (
  SELECT doc_id, CAST(i AS BIGINT) AS pos, ws[i] AS word
  FROM w, (SELECT unnest(generate_series(1, 4096)) AS i) idx
  WHERE i <= len(ws)
), flagged AS (
  SELECT doc_id, pos, word,
         CASE WHEN LAG(word) OVER (PARTITION BY doc_id ORDER BY pos)
                   IS DISTINCT FROM word THEN 1 ELSE 0 END AS new_run
  FROM f
), islands AS (
  SELECT doc_id,
         SUM(new_run) OVER (PARTITION BY doc_id ORDER BY pos) AS run_id
  FROM flagged
), runs AS (
  SELECT doc_id, run_id, CAST(COUNT(*) AS BIGINT) AS run_len
  FROM islands GROUP BY 1, 2
), per_doc AS (
  SELECT doc_id, CAST(MAX(run_len) AS BIGINT) AS max_run
  FROM runs GROUP BY 1
)
SELECT max_run, CAST(COUNT(*) AS BIGINT) AS n_docs
FROM per_doc GROUP BY 1
"""


# ---------------------------------------------------------------------------
# order gap days
# ---------------------------------------------------------------------------


def q_order_gap_days(sf_dir):
    """Span days, active order days, and GAP days (zero-order calendar
    days inside the [min, max] span) — the calendar-completeness
    counter (absent != zero; gaps mean outage or upstream loss).
    Distinct active days from one decomposable pass; integer span
    arithmetic."""
    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderdate"]
    )

    def partial(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_valid(b["o_orderdate"]))
        day = (
            b["o_orderdate"].cast(pa.timestamp("us")).cast(pa.int64())
            .to_numpy(zero_copy_only=False)
            // _DAY_US
        )
        t = pa.table({"day": pa.array(day)})
        g = t.group_by(["day"]).aggregate([([], "count_all")])
        return g.select(["day"])

    def combine(b: pa.Table) -> pa.Table:
        g = b.group_by(["day"]).aggregate([([], "count_all")])
        return g.select(["day"])

    days = tree_merge(
        orders.map_batches(partial, batch_format="pyarrow",
                           batch_size=None),
        combine,
    ).to_pandas()

    if not len(days):
        return pa.table(
            {
                "span_days": pa.array([0], pa.int64()),
                "active_days": pa.array([0], pa.int64()),
                "gap_days": pa.array([0], pa.int64()),
            }
        )
    d = days["day"].to_numpy(dtype=np.int64)
    span = int(d.max() - d.min() + 1)
    active = len(np.unique(d))
    return pa.table(
        {
            "span_days": pa.array([span], pa.int64()),
            "active_days": pa.array([active], pa.int64()),
            "gap_days": pa.array([span - active], pa.int64()),
        }
    )


GAP_DAYS_SQL = """
WITH d AS (
  SELECT DISTINCT CAST(FLOOR(epoch(o_orderdate) / 86400) AS BIGINT)
           AS day
  FROM orders WHERE o_orderdate IS NOT NULL
)
SELECT CAST(MAX(day) - MIN(day) + 1 AS BIGINT) AS span_days,
       CAST(COUNT(*) AS BIGINT) AS active_days,
       CAST(MAX(day) - MIN(day) + 1 - COUNT(*) AS BIGINT) AS gap_days
FROM d
"""


def register_r4br(queries: dict, oracles: dict) -> None:
    queries.update(
        {
            "type_hhi_by_hour": q_type_hhi_by_hour,
            "word_stutter_hist": q_word_stutter_hist,
            "order_gap_days": q_order_gap_days,
        }
    )
    oracles.update(
        {
            "type_hhi_by_hour": HHI_HOUR_SQL,
            "word_stutter_hist": STUTTER_SQL,
            "order_gap_days": GAP_DAYS_SQL,
        }
    )
