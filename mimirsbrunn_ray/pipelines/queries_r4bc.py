"""Round-4 batch BC: weekpart EMD per type, max hourly rate jump, and
a candidate-key uniqueness audit.

Exactness discipline: EMD keeps the integer numerator over the union
grid; rate jumps compare with the identical double ratio after exact
integer counts (prev > 0 guarded); uniqueness is exact distinct
counting of composite keys.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd
from mimirsbrunn_ray.stages.broadcast import scalar0 as _scalar0

from mimirsbrunn_ray.stages.rollup import tree_merge

_HOUR_US = 3_600_000_000
_DAY_US = 86_400_000_000


def _round_half_away(x: np.ndarray) -> np.ndarray:
    return np.where(
        x >= 0, np.floor(x + 0.5), np.ceil(x - 0.5)
    ).astype(np.int64)


# ---------------------------------------------------------------------------
# earth-mover distance between weekday and weekend values, per type
# ---------------------------------------------------------------------------


def q_emd_weekpart_value(sf_dir):
    """Per event type, the exact 1-D earth-mover distance between its
    WEEKDAY and WEEKEND cents-value distributions — the total-work
    twin of mannwhitney_weekend's rank test (EMD weighs how far mass
    moved, not just whether it did). Integer numerator
    sum(|ca*nb - cb*na| * gap) over the type's union grid; one bounded
    (type, weekpart, cents) histogram pass."""
    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "ts", "value"]
    )

    def partial(b: pa.Table) -> pa.Table:
        b = b.filter(
            pc.and_(
                pc.and_(
                    pc.is_valid(b["event_type"]), pc.is_valid(b["value"])
                ),
                pc.is_valid(b["ts"]),
            )
        )
        ts_us = b["ts"].cast(pa.timestamp("us")).cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        dow = (np.floor_divide(ts_us, _DAY_US) + 4) % 7
        we = ((dow == 0) | (dow == 6)).astype(np.int64)
        x = _round_half_away(
            b["value"].cast(pa.float64()).to_numpy(zero_copy_only=False)
            * 100.0
        )
        t = pa.table(
            {
                "event_type": b["event_type"],
                "we": pa.array(we),
                "v": pa.array(x),
            }
        )
        g = t.group_by(["event_type", "we", "v"]).aggregate(
            [([], "count_all")]
        )
        g = g.select(["event_type", "we", "v", "count_all"])
        return g.rename_columns(["event_type", "we", "v", "n"])

    def combine(b: pa.Table) -> pa.Table:
        g = b.group_by(["event_type", "we", "v"]).aggregate([("n", "sum")])
        return g.rename_columns(["event_type", "we", "v", "n"])

    hist = tree_merge(
        ev.map_batches(partial, batch_format="pyarrow", batch_size=None),
        combine,
    ).to_pandas()

    rows = {"event_type": [], "n_weekday": [], "n_weekend": [],
            "emd_num": []}
    if len(hist):
        for et, g in hist.groupby("event_type", sort=True):
            wd = g[g["we"] == 0]
            we = g[g["we"] == 1]
            if not len(wd) or not len(we):
                continue
            grid = np.sort(g["v"].unique()).astype(np.int64)
            gaps = np.diff(grid)

            def cum_on(h):
                c = np.zeros(len(grid), dtype=np.int64)
                idx = np.searchsorted(
                    grid, h["v"].to_numpy(dtype=np.int64)
                )
                np.add.at(c, idx, h["n"].to_numpy(dtype=np.int64))
                return np.cumsum(c)

            ca = cum_on(wd)
            cb = cum_on(we)
            na = int(ca[-1])
            nb = int(cb[-1])
            emd = int(
                np.dot(np.abs(ca[:-1] * nb - cb[:-1] * na), gaps)
            )
            rows["event_type"].append(et)
            rows["n_weekday"].append(na)
            rows["n_weekend"].append(nb)
            rows["emd_num"].append(emd)
    return pa.table(
        {
            "event_type": pa.array(rows["event_type"], pa.string()),
            "n_weekday": pa.array(rows["n_weekday"], pa.int64()),
            "n_weekend": pa.array(rows["n_weekend"], pa.int64()),
            "emd_num": pa.array(rows["emd_num"], pa.int64()),
        }
    )


EMD_WEEKPART_SQL = """
WITH v AS MATERIALIZED (
  SELECT event_type,
         CASE WHEN dayofweek(ts) IN (0, 6) THEN 1 ELSE 0 END AS we,
         CAST(ROUND(value * 100, 0) AS BIGINT) AS x
  FROM events
  WHERE event_type IS NOT NULL AND ts IS NOT NULL AND value IS NOT NULL
), h AS (
  SELECT event_type, we, x, CAST(COUNT(*) AS BIGINT) AS n
  FROM v GROUP BY 1, 2, 3
), tot AS (
  SELECT event_type,
         CAST(SUM(CASE WHEN we = 0 THEN n ELSE 0 END) AS BIGINT) AS na,
         CAST(SUM(CASE WHEN we = 1 THEN n ELSE 0 END) AS BIGINT) AS nb
  FROM h GROUP BY 1
), grid AS (
  -- distinct FIRST: a value present in both weekparts must form ONE
  -- grid point, or the cumulative joins double-count
  SELECT event_type, x,
         LEAD(x) OVER (PARTITION BY event_type ORDER BY x) - x AS gap
  FROM (SELECT DISTINCT event_type, x FROM h)
), cum AS (
  SELECT g.event_type, g.gap,
         SUM(COALESCE(ha.n, 0)) OVER (PARTITION BY g.event_type
                                      ORDER BY g.x) AS ca,
         SUM(COALESCE(hb.n, 0)) OVER (PARTITION BY g.event_type
                                      ORDER BY g.x) AS cb
  FROM grid g
  LEFT JOIN h ha ON ha.event_type = g.event_type AND ha.we = 0
                AND ha.x = g.x
  LEFT JOIN h hb ON hb.event_type = g.event_type AND hb.we = 1
                AND hb.x = g.x
)
SELECT c.event_type, t.na AS n_weekday, t.nb AS n_weekend,
       CAST(SUM(ABS(c.ca * t.nb - c.cb * t.na) * c.gap) AS BIGINT)
         AS emd_num
FROM cum c JOIN tot t USING (event_type)
WHERE c.gap IS NOT NULL AND t.na > 0 AND t.nb > 0
GROUP BY 1, 2, 3
"""


# ---------------------------------------------------------------------------
# max hourly rate jump per type
# ---------------------------------------------------------------------------


def q_type_max_rate_jump(sf_dir):
    """Per event type, the hour with the largest count RATIO vs the
    previous OBSERVED hour (prev > 0 by construction) — the burst
    detector a rate-limiter tunes against; ratio compared as the
    identical double n/prev, ties -> earliest hour. One bounded
    (type, hour) pass; the scan walks the bounded grid."""
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
        hr = np.floor_divide(ts_us, _HOUR_US)
        t = pa.table({"event_type": b["event_type"], "hr": pa.array(hr)})
        g = t.group_by(["event_type", "hr"]).aggregate([([], "count_all")])
        g = g.select(["event_type", "hr", "count_all"])
        return g.rename_columns(["event_type", "hr", "n"])

    def combine(b: pa.Table) -> pa.Table:
        g = b.group_by(["event_type", "hr"]).aggregate([("n", "sum")])
        return g.rename_columns(["event_type", "hr", "n"])

    grid = tree_merge(
        ev.map_batches(partial, batch_format="pyarrow", batch_size=None),
        combine,
    ).to_pandas()

    rows = {"event_type": [], "hr": [], "n": [], "prev_n": []}
    if len(grid):
        for et, g in grid.groupby("event_type", sort=True):
            g = g.sort_values("hr")
            n = g["n"].to_numpy(dtype=np.int64)
            hr = g["hr"].to_numpy(dtype=np.int64)
            if len(n) < 2:
                continue
            ratio = n[1:].astype(np.float64) / n[:-1].astype(np.float64)
            best = int(np.argmax(ratio))  # first max = earliest hour
            rows["event_type"].append(et)
            rows["hr"].append(int(hr[best + 1]))
            rows["n"].append(int(n[best + 1]))
            rows["prev_n"].append(int(n[best]))
    return pa.table(
        {
            "event_type": pa.array(rows["event_type"], pa.string()),
            "hr": pa.array(rows["hr"], pa.int64()),
            "n": pa.array(rows["n"], pa.int64()),
            "prev_n": pa.array(rows["prev_n"], pa.int64()),
        }
    )


RATE_JUMP_SQL = """
WITH grid AS (
  SELECT event_type,
         CAST(FLOOR(epoch(ts) / 3600) AS BIGINT) AS hr,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM events
  WHERE event_type IS NOT NULL AND ts IS NOT NULL
  GROUP BY 1, 2
), l AS (
  SELECT event_type, hr, n,
         LAG(n) OVER (PARTITION BY event_type ORDER BY hr) AS prev_n
  FROM grid
)
SELECT event_type, hr, n, prev_n
FROM l WHERE prev_n IS NOT NULL
QUALIFY ROW_NUMBER() OVER (
  PARTITION BY event_type
  ORDER BY CAST(n AS DOUBLE) / prev_n DESC, hr) = 1
"""


# ---------------------------------------------------------------------------
# candidate-key uniqueness audit
# ---------------------------------------------------------------------------


def q_candidate_key_audit(sf_dir):
    """Uniqueness audit of candidate keys over events: total rows,
    distinct event_id (the surrogate), and distinct (user_id, ts)
    composites — the 'is my natural key actually unique' check a
    modeler runs before declaring grain. Combiner-first distinct
    partials, key-disjoint shard dedup, bounded counter fold."""
    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "ts"]
    )

    def n_rows_partial(b: pa.Table) -> pa.Table:
        return pa.table({"n_rows": pa.array([b.num_rows], pa.int64())})

    def fold(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                c: pa.array([pc.sum(b[c]).as_py() or 0], pa.int64())
                for c in b.column_names
            }
        )

    n_rows = int(
        tree_merge(
            ev.map_batches(n_rows_partial, batch_format="pyarrow",
                           batch_size=None),
            fold,
        ).to_pandas().pipe(_scalar0, "n_rows")
    )

    def distinct_count(cols):
        def partial(b: pa.Table) -> pa.Table:
            m = None
            for c in cols:
                v = pc.is_valid(b[c])
                m = v if m is None else pc.and_(m, v)
            b = b.filter(m)
            g = b.group_by(cols).aggregate([([], "count_all")])
            return g.select(cols)

        def dedup(b: pa.Table) -> pa.Table:
            g = b.group_by(cols).aggregate([([], "count_all")])
            return g.select(cols)

        ded = tree_merge(
            ev.map_batches(partial, batch_format="pyarrow",
                           batch_size=None),
            dedup,
            final_shards=8,
            shard_cols=list(cols),
        )

        def cnt(b: pa.Table) -> pa.Table:
            return pa.table({"n": pa.array([b.num_rows], pa.int64())})

        return int(
            tree_merge(
                ded.map_batches(cnt, batch_format="pyarrow",
                                batch_size=None),
                fold,
            ).to_pandas().pipe(_scalar0, "n")
        )

    n_event_id = distinct_count(["event_id"])
    n_user_ts = distinct_count(["user_id", "ts"])
    return pa.table(
        {
            "n_rows": pa.array([n_rows], pa.int64()),
            "n_distinct_event_id": pa.array([n_event_id], pa.int64()),
            "n_distinct_user_ts": pa.array([n_user_ts], pa.int64()),
        }
    )


KEY_AUDIT_SQL = """
SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(COUNT(DISTINCT event_id) AS BIGINT) AS n_distinct_event_id,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM (
          SELECT DISTINCT user_id, ts FROM events
          WHERE user_id IS NOT NULL AND ts IS NOT NULL))
         AS n_distinct_user_ts
FROM events
"""


def register_r4bc(queries: dict, oracles: dict) -> None:
    queries.update(
        {
            "emd_weekpart_value": q_emd_weekpart_value,
            "type_max_rate_jump": q_type_max_rate_jump,
            "candidate_key_audit": q_candidate_key_audit,
        }
    )
    oracles.update(
        {
            "emd_weekpart_value": EMD_WEEKPART_SQL,
            "type_max_rate_jump": RATE_JUMP_SQL,
            "candidate_key_audit": KEY_AUDIT_SQL,
        }
    )
