"""Round-4 batch X: hour-of-day ANOVA sufficient statistics, global
top (user, type) activity pairs, and per-user type-switch counts.

Exactness discipline: x100 quantization at the raw grain; sums of
squares stay within int64 (x100 <= ~6e4 -> x^2 <= 3.6e9 per term); all
rankings use deterministic (count desc, key asc) tie-breaks.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from mimirsbrunn_ray.stages.dedup import _BUCKET, add_bucket
from mimirsbrunn_ray.stages.rollup import tree_merge

_HOUR_US = 3_600_000_000


def _not_null(b: pa.Table, cols) -> pa.Table:
    m = None
    for c in cols:
        v = pc.is_valid(b[c])
        m = v if m is None else pc.and_(m, v)
    return b.filter(m)


def _round_half_away(x: np.ndarray) -> np.ndarray:
    return np.where(
        x >= 0, np.floor(x + 0.5), np.ceil(x - 0.5)
    ).astype(np.int64)


# ---------------------------------------------------------------------------
# hour-of-day ANOVA sufficient statistics
# ---------------------------------------------------------------------------


def q_hod_variance_stats(sf_dir):
    """Seasonality-strength sufficient statistics: per (event type,
    hour-of-day) cell, the exact count and x100 sum, joined with the
    type's global count / sum / sum-of-squares — everything a reader
    needs to compute the between-hour R^2 (variance explained by the
    diurnal cycle) without the engine ever dividing. One combiner-first
    pass; the 24 x types grid is bounded; global moments attach by a
    types-bounded broadcast."""
    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "ts", "value"]
    )

    def partial(b: pa.Table) -> pa.Table:
        b = _not_null(b, ("event_type", "ts", "value"))
        us = (
            b["ts"].cast(pa.timestamp("us")).cast(pa.int64()).to_numpy(
                zero_copy_only=False
            )
        )
        hod = (np.floor_divide(us, _HOUR_US) % 24).astype(np.int64)
        x = _round_half_away(
            b["value"].to_numpy(zero_copy_only=False).astype(np.float64)
            * 100.0
        )
        t = pa.table(
            {
                "event_type": b["event_type"],
                "hod": pa.array(hod),
                "one": pa.array(np.ones(len(x), dtype=np.int64)),
                "x": pa.array(x),
                "x2": pa.array(x * x),
            }
        )
        g = t.group_by(["event_type", "hod"]).aggregate(
            [("one", "sum"), ("x", "sum"), ("x2", "sum")]
        )
        g = g.select(["event_type", "hod", "one_sum", "x_sum", "x2_sum"])
        return g.rename_columns(["event_type", "hod", "n", "s", "s2"])

    def combine(b: pa.Table) -> pa.Table:
        g = b.group_by(["event_type", "hod"]).aggregate(
            [("n", "sum"), ("s", "sum"), ("s2", "sum")]
        )
        g = g.select(["event_type", "hod", "n_sum", "s_sum", "s2_sum"])
        return g.rename_columns(["event_type", "hod", "n", "s", "s2"])

    cells = tree_merge(
        ev.map_batches(partial, batch_format="pyarrow", batch_size=None),
        combine,
    ).to_pandas()  # bounded: types x 24 cells
    if "event_type" not in cells.columns:  # fully-empty input short-circuit
        cells = pd.DataFrame(
            {"event_type": [], "hod": [], "n": [], "s": [], "s2": []}
        )
    tot = cells.groupby("event_type", sort=False).agg(
        n_total=("n", "sum"), sum_total=("s", "sum"),
        sumsq_total=("s2", "sum"),
    )
    cells = cells.merge(tot, left_on="event_type", right_index=True,
                        how="left")
    cells = cells.sort_values(["event_type", "hod"], ignore_index=True)
    return pa.table(
        {
            "event_type": pa.array(
                cells["event_type"].tolist(), pa.string()
            ),
            "hod": pa.array(cells["hod"].astype(np.int64), pa.int64()),
            "n_h": pa.array(cells["n"].astype(np.int64), pa.int64()),
            "sum_h_x100": pa.array(cells["s"].astype(np.int64), pa.int64()),
            "n_total": pa.array(
                cells["n_total"].astype(np.int64), pa.int64()
            ),
            "sum_total_x100": pa.array(
                cells["sum_total"].astype(np.int64), pa.int64()
            ),
            "sumsq_total_x10000": pa.array(
                cells["sumsq_total"].astype(np.int64), pa.int64()
            ),
        }
    )


HOD_ANOVA_SQL = """
WITH v AS MATERIALIZED (
  SELECT event_type, CAST(hour(ts) AS BIGINT) AS hod,
         CAST(ROUND(value * 100, 0) AS BIGINT) AS x
  FROM events
  WHERE event_type IS NOT NULL AND ts IS NOT NULL AND value IS NOT NULL
), cells AS (
  SELECT event_type, hod, CAST(COUNT(*) AS BIGINT) AS n_h,
         CAST(SUM(x) AS BIGINT) AS sum_h_x100
  FROM v GROUP BY 1, 2
), tot AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_total,
         CAST(SUM(x) AS BIGINT) AS sum_total_x100,
         CAST(SUM(x * x) AS BIGINT) AS sumsq_total_x10000
  FROM v GROUP BY 1
)
SELECT cells.event_type, cells.hod, cells.n_h, cells.sum_h_x100,
       tot.n_total, tot.sum_total_x100, tot.sumsq_total_x10000
FROM cells JOIN tot USING (event_type)
"""


# ---------------------------------------------------------------------------
# global top (user, type) activity pairs
# ---------------------------------------------------------------------------

_PAIR_K = 10


def q_top_user_type_pairs(sf_dir):
    """The 10 heaviest (user, event type) activity pairs globally
    (count desc, user asc, type asc) — the per-entity hotspot list a
    skew diagnosis starts from. Combiner-first pair counts, per-block
    partial top-k prune (each block forwards <= 10 rows), one
    single-block final rank."""
    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "event_type"]
    )

    def partial(b: pa.Table) -> pa.Table:
        b = _not_null(b, ("user_id", "event_type"))
        g = b.group_by(["user_id", "event_type"]).aggregate(
            [([], "count_all")]
        )
        return g.select(
            ["user_id", "event_type", "count_all"]
        ).rename_columns(["user_id", "event_type", "n_events"])

    def combine(b: pa.Table) -> pa.Table:
        g = b.group_by(["user_id", "event_type"]).aggregate(
            [("n_events", "sum")]
        )
        return g.select(
            ["user_id", "event_type", "n_events_sum"]
        ).rename_columns(["user_id", "event_type", "n_events"])

    counts = tree_merge(
        ev.map_batches(partial, batch_format="pyarrow", batch_size=None),
        combine,
        final_shards=8,
        shard_cols=["user_id", "event_type"],
    )

    def prune(b: pa.Table) -> pa.Table:
        return b.sort_by(
            [("n_events", "descending"), ("user_id", "ascending"),
             ("event_type", "ascending")]
        ).slice(0, _PAIR_K)

    return (
        counts.map_batches(prune, batch_format="pyarrow", batch_size=None)
        .repartition(1)
        .map_batches(prune, batch_format="pyarrow", batch_size=None)
    )


TOP_PAIRS_SQL = f"""
WITH c AS (
  SELECT user_id, event_type, CAST(COUNT(*) AS BIGINT) AS n_events
  FROM events
  WHERE user_id IS NOT NULL AND event_type IS NOT NULL
  GROUP BY 1, 2
)
SELECT user_id, event_type, n_events FROM (
  SELECT user_id, event_type, n_events,
         ROW_NUMBER() OVER (
           ORDER BY n_events DESC, user_id ASC, event_type ASC
         ) AS rn
  FROM c
) WHERE rn <= {_PAIR_K}
"""


# ---------------------------------------------------------------------------
# type-switch counts per user (behavioral alternation)
# ---------------------------------------------------------------------------


def q_type_switches_per_user(sf_dir):
    """Per user: event count and how many consecutive event pairs
    ((ts, event_id) order) CHANGE event type — the behavioral
    alternation signal (0 switches = single-mode user). One user-hash
    bucket shuffle; each user's sequence resolves inside its bucket."""
    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "ts", "event_id", "event_type"],
    )

    def project(b: pa.Table) -> pa.Table:
        b = _not_null(b, ("user_id", "ts", "event_id", "event_type"))
        t = pa.table(
            {
                "user_id": b["user_id"],
                "us": b["ts"].cast(pa.timestamp("us")).cast(pa.int64()),
                "event_id": b["event_id"],
                "event_type": b["event_type"],
            }
        )
        return add_bucket(t, "user_id", 64)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "user_id": pd.Series([], dtype=np.int64),
                "n_events": pd.Series([], dtype=np.int64),
                "n_switches": pd.Series([], dtype=np.int64),
            }
        )
        if len(g) == 0:
            return empty
        g = g.sort_values(
            ["user_id", "us", "event_id"], kind="mergesort",
            ignore_index=True,
        )
        u = g["user_id"].to_numpy(dtype=np.int64)
        et = g["event_type"].to_numpy()
        same = np.empty(len(g), dtype=bool)
        same[0] = False
        same[1:] = u[1:] == u[:-1]
        prev = np.concatenate((["\x00"], et[:-1]))
        sw = same & (et != prev)
        t = pd.DataFrame(
            {"user_id": u, "one": np.ones(len(g), dtype=np.int64),
             "sw": sw.astype(np.int64)}
        )
        agg = t.groupby("user_id", sort=False, as_index=False).agg(
            n_events=("one", "sum"), n_switches=("sw", "sum")
        )
        for c in ("n_events", "n_switches"):
            agg[c] = agg[c].astype(np.int64)
        return agg

    return (
        ev.map_batches(project, batch_format="pyarrow", batch_size=None)
        .groupby(_BUCKET)
        .map_groups(per_bucket, batch_format="pandas")
    )


TYPE_SWITCHES_SQL = """
WITH v AS (
  SELECT user_id, ts, event_id, event_type FROM events
  WHERE user_id IS NOT NULL AND ts IS NOT NULL
    AND event_id IS NOT NULL AND event_type IS NOT NULL
), l AS (
  SELECT user_id, event_type,
         LAG(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS pt
  FROM v
)
SELECT user_id,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CASE WHEN pt IS NOT NULL AND event_type <> pt
                THEN 1 ELSE 0 END) AS BIGINT) AS n_switches
FROM l GROUP BY 1
"""


def register_r4x(queries: dict, oracles: dict) -> None:
    queries.update(
        {
            "hod_variance_stats": q_hod_variance_stats,
            "top_user_type_pairs": q_top_user_type_pairs,
            "type_switches_per_user": q_type_switches_per_user,
        }
    )
    oracles.update(
        {
            "hod_variance_stats": HOD_ANOVA_SQL,
            "top_user_type_pairs": TOP_PAIRS_SQL,
            "type_switches_per_user": TYPE_SWITCHES_SQL,
        }
    )
