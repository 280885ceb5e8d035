"""Round-4 batch AY: streaming near-duplicate audit, VWAP, and the
Hill tail-index estimator.

Exactness discipline: near-duplicate detection keys on exact (user,
type, cents) triples with LAG microsecond gaps; VWAP ships as the
integer pair (sum px*qty, sum qty); the Hill estimator rides ln parity
over exact top-order-statistic integers, rounded once.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from mimirsbrunn_ray.stages.rollup import tree_merge

_DAY_US = 86_400_000_000


def _round_half_away(x: np.ndarray) -> np.ndarray:
    return np.where(
        x >= 0, np.floor(x + 0.5), np.ceil(x - 0.5)
    ).astype(np.int64)


# ---------------------------------------------------------------------------
# streaming near-duplicate audit: same (user, type, cents) within 1 s
# ---------------------------------------------------------------------------


def q_near_duplicate_events_1s(sf_dir):
    """At-least-once delivery audit: events repeating the SAME (user,
    type, cents value) triple within one second of the previous
    occurrence — the duplicate class a streaming dedup window would
    collapse. Per type: total events and near-duplicate count. One
    hash-bucket shuffle on the triple key; per-series LAG gaps are
    vectorized (sorted adjacency inside each triple group)."""
    from mimirsbrunn_ray.stages.dedup import _BUCKET, add_bucket

    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "ts", "event_id", "event_type", "value"],
    )

    def project(b: pa.Table) -> pa.Table:
        b = b.filter(
            pc.and_(
                pc.and_(
                    pc.is_valid(b["user_id"]), pc.is_valid(b["ts"])
                ),
                pc.and_(
                    pc.is_valid(b["event_type"]), pc.is_valid(b["value"])
                ),
            )
        )
        x = _round_half_away(
            b["value"].cast(pa.float64()).to_numpy(zero_copy_only=False)
            * 100.0
        )
        t = pa.table(
            {
                "user_id": b["user_id"],
                "ts": b["ts"],
                "event_id": b["event_id"],
                "event_type": b["event_type"],
                "x": pa.array(x),
            }
        )
        return add_bucket(t, "user_id", 64)

    proj = ev.map_batches(project, batch_format="pyarrow", batch_size=None)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "event_type": pd.Series([], dtype=object),
                "n_events": pd.Series([], dtype=np.int64),
                "n_near_dups": pd.Series([], dtype=np.int64),
            }
        )
        if len(g) == 0:
            return empty
        g = g.sort_values(
            ["user_id", "event_type", "x", "ts", "event_id"],
            kind="mergesort", ignore_index=True,
        )
        ts_us = g["ts"].to_numpy(dtype="datetime64[us]").astype(np.int64)
        same = np.zeros(len(g), dtype=bool)
        if len(g) > 1:
            same[1:] = (
                (g["user_id"].to_numpy()[1:]
                 == g["user_id"].to_numpy()[:-1])
                & (g["event_type"].to_numpy()[1:]
                   == g["event_type"].to_numpy()[:-1])
                & (g["x"].to_numpy()[1:] == g["x"].to_numpy()[:-1])
            )
        gap = np.empty(len(g), dtype=np.int64)
        gap[0] = np.iinfo(np.int64).max
        if len(g) > 1:
            gap[1:] = ts_us[1:] - ts_us[:-1]
        dup = same & (gap <= 1_000_000)
        df = pd.DataFrame(
            {"event_type": g["event_type"], "dup": dup.astype(np.int64)}
        )
        agg = df.groupby("event_type", sort=False).agg(
            n_events=("dup", "size"), n_near_dups=("dup", "sum")
        ).reset_index()
        agg["n_events"] = agg["n_events"].astype(np.int64)
        agg["n_near_dups"] = agg["n_near_dups"].astype(np.int64)
        return agg

    partials = proj.groupby(_BUCKET).map_groups(
        per_bucket, batch_format="pandas"
    )

    def combine(b: pa.Table) -> pa.Table:
        g = b.group_by(["event_type"]).aggregate(
            [("n_events", "sum"), ("n_near_dups", "sum")]
        )
        return g.rename_columns(["event_type", "n_events", "n_near_dups"])

    return tree_merge(partials, combine)


NEAR_DUP_1S_SQL = """
WITH v AS (
  SELECT user_id, ts, event_id, event_type,
         CAST(ROUND(value * 100, 0) AS BIGINT) AS x
  FROM events
  WHERE user_id IS NOT NULL AND ts IS NOT NULL
    AND event_type IS NOT NULL AND value IS NOT NULL
), l AS (
  SELECT event_type,
         EPOCH_US(ts) - EPOCH_US(LAG(ts) OVER (
           PARTITION BY user_id, event_type, x
           ORDER BY ts, event_id)) AS gap
  FROM v
)
SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CASE WHEN gap <= 1000000 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_near_dups
FROM l GROUP BY 1
"""


# ---------------------------------------------------------------------------
# daily volume-weighted average price over lineitems
# ---------------------------------------------------------------------------


def q_vwap_daily_lineitem(sf_dir):
    """Per ship day: the volume-weighted average price ingredients —
    sum of extendedprice_x100 * quantity and sum of quantity (VWAP =
    num/den/100), the standard volume-weighted aggregate. One
    decomposable pass, bounded by days."""
    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_shipdate", "l_extendedprice", "l_quantity"],
    )

    def partial(b: pa.Table) -> pa.Table:
        b = b.filter(
            pc.and_(
                pc.and_(
                    pc.is_valid(b["l_shipdate"]),
                    pc.is_valid(b["l_extendedprice"]),
                ),
                pc.is_valid(b["l_quantity"]),
            )
        )
        ship = (
            b["l_shipdate"].cast(pa.timestamp("us")).cast(pa.int64())
            .to_numpy(zero_copy_only=False)
        )
        day = np.floor_divide(ship, _DAY_US)
        px = _round_half_away(
            b["l_extendedprice"].cast(pa.float64()).to_numpy(
                zero_copy_only=False
            )
            * 100.0
        )
        qty = _round_half_away(
            b["l_quantity"].cast(pa.float64()).to_numpy(
                zero_copy_only=False
            )
        )
        t = pa.table(
            {
                "day": pa.array(day),
                "pq": pa.array(px * qty),
                "q": pa.array(qty),
            }
        )
        g = t.group_by(["day"]).aggregate(
            [([], "count_all"), ("pq", "sum"), ("q", "sum")]
        )
        g = g.select(["day", "count_all", "pq_sum", "q_sum"])
        return g.rename_columns(
            ["day", "n_items", "vwap_num_x100", "vwap_den"]
        )

    def combine(b: pa.Table) -> pa.Table:
        g = b.group_by(["day"]).aggregate(
            [("n_items", "sum"), ("vwap_num_x100", "sum"),
             ("vwap_den", "sum")]
        )
        return g.rename_columns(
            ["day", "n_items", "vwap_num_x100", "vwap_den"]
        )

    return tree_merge(
        li.map_batches(partial, batch_format="pyarrow", batch_size=None),
        combine,
    )


VWAP_SQL = """
SELECT CAST(FLOOR(epoch(l_shipdate) / 86400) AS BIGINT) AS day,
       CAST(COUNT(*) AS BIGINT) AS n_items,
       CAST(SUM(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)
                * CAST(ROUND(l_quantity, 0) AS BIGINT)) AS BIGINT)
         AS vwap_num_x100,
       CAST(SUM(CAST(ROUND(l_quantity, 0) AS BIGINT)) AS BIGINT)
         AS vwap_den
FROM lineitem
WHERE l_shipdate IS NOT NULL AND l_extendedprice IS NOT NULL
  AND l_quantity IS NOT NULL
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# Hill tail-index estimator over document lengths
# ---------------------------------------------------------------------------

_HILL_K = 50


def q_hill_tail_index(sf_dir):
    """The Hill estimator of the document-length tail index: over the
    top `_HILL_K` order statistics x_(1) >= ... >= x_(k), alpha^-1 =
    mean of ln(x_(i) / x_(k)) — how heavy the length tail is (the
    long-document risk a context-window planner sizes against). The
    order statistics come EXACTLY from the bounded length histogram;
    the estimate rides ln parity, rounded once x1e6."""
    docs = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["n_chars"]
    )

    def partial(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_valid(b["n_chars"]))
        g = b.group_by(["n_chars"]).aggregate([([], "count_all")])
        g = g.select(["n_chars", "count_all"])
        return g.rename_columns(["v", "n"])

    def combine(b: pa.Table) -> pa.Table:
        g = b.group_by(["v"]).aggregate([("n", "sum")])
        return g.rename_columns(["v", "n"])

    hist = tree_merge(
        docs.map_batches(partial, batch_format="pyarrow", batch_size=None),
        combine,
    ).to_pandas()  # bounded: distinct lengths

    if not len(hist):
        return pa.table(
            {
                "k": pa.array([0], pa.int64()),
                "x_k": pa.array([None], pa.int64()),
                "hill_inv_alpha_x1e6": pa.array([None], pa.int64()),
            }
        )
    hist = hist.sort_values("v", ascending=False)
    v = hist["v"].to_numpy(dtype=np.int64)
    c = hist["n"].to_numpy(dtype=np.int64)
    top = np.repeat(v, np.minimum(c, _HILL_K))[:_HILL_K]
    xk = int(top[-1])
    hill = float(
        np.sum(np.log(top.astype(np.float64))
               - np.log(np.float64(xk))) / len(top)
    )
    return pa.table(
        {
            "k": pa.array([len(top)], pa.int64()),
            "x_k": pa.array([xk], pa.int64()),
            "hill_inv_alpha_x1e6": pa.array(
                [int(_round_half_away(np.array([hill * 1e6]))[0])],
                pa.int64(),
            ),
        }
    )


HILL_SQL = f"""
WITH top AS MATERIALIZED (
  SELECT CAST(n_chars AS BIGINT) AS x
  FROM documents WHERE n_chars IS NOT NULL
  ORDER BY n_chars DESC LIMIT {_HILL_K}
), xk AS (
  SELECT CAST(MIN(x) AS BIGINT) AS x_k, CAST(COUNT(*) AS BIGINT) AS k
  FROM top
)
SELECT xk.k, xk.x_k,
       CAST(ROUND(SUM(LN(CAST(top.x AS DOUBLE))
                      - LN(CAST(xk.x_k AS DOUBLE))) / xk.k
                  * 1000000, 0) AS BIGINT) AS hill_inv_alpha_x1e6
FROM top, xk
GROUP BY xk.k, xk.x_k
"""


def register_r4ay(queries: dict, oracles: dict) -> None:
    queries.update(
        {
            "near_duplicate_events_1s": q_near_duplicate_events_1s,
            "vwap_daily_lineitem": q_vwap_daily_lineitem,
            "hill_tail_index": q_hill_tail_index,
        }
    )
    oracles.update(
        {
            "near_duplicate_events_1s": NEAR_DUP_1S_SQL,
            "vwap_daily_lineitem": VWAP_SQL,
            "hill_tail_index": HILL_SQL,
        }
    )
