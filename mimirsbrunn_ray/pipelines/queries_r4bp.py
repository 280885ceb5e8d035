"""Round-4 batch BP: session-level type association, crest factors,
and segment-mix drift.

Exactness discipline: association counts are exact session-set
integers (support/confidence/lift derivable); crest factors ship the
(max, sum, n) integer triple; the drift split point is exact integer
midpoint arithmetic on epoch days.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from mimirsbrunn_ray.stages.rollup import tree_merge

_HOUR_US = 3_600_000_000
_GAP_US = 30 * 60_000_000
_DAY_US = 86_400_000_000


# ---------------------------------------------------------------------------
# session-level event-type association (market-basket lift)
# ---------------------------------------------------------------------------


def q_session_type_lift(sf_dir):
    """Association-rule ingredients at SESSION grain: for every type
    pair, sessions containing both vs each alone, plus the session
    total — support, confidence and lift all derive from the four
    integers (the market-basket mining shape, with the 30-minute
    strict-gap island as the basket). Sessions and their type sets
    resolve inside one user hash-bucket shuffle; the pair fold runs
    over bounded per-bucket type-set counts."""
    from mimirsbrunn_ray.stages.dedup import _BUCKET
    from mimirsbrunn_ray.stages.timeseries import (
        _project_series,
        _series_segments,
    )

    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "ts", "event_id", "event_type"],
    )
    proj = _project_series(ev, "user_id", "ts", "event_id", "event_type", 64)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "type_a": pd.Series([], dtype=object),
                "type_b": pd.Series([], dtype=object),
                "n_both": pd.Series([], dtype=np.int64),
                "n_sessions": pd.Series([], dtype=np.int64),
            }
        )
        if len(g) == 0:
            return empty
        g, same = _series_segments(g, "user_id", "ts", "event_id")
        ts_us = g["ts"].to_numpy(dtype="datetime64[us]").astype(np.int64)
        gap = np.empty(len(g), dtype=np.int64)
        gap[0] = np.iinfo(np.int64).max
        if len(g) > 1:
            gap[1:] = ts_us[1:] - ts_us[:-1]
        new_s = (~same) | (gap > _GAP_US)
        sid = np.cumsum(new_s)
        df = pd.DataFrame(
            {"sid": sid, "t": g["event_type"].to_numpy()}
        ).drop_duplicates()
        n_sessions = int(sid[-1]) if len(sid) else 0
        types = sorted(df["t"].unique())
        sets = {
            t: set(df[df["t"] == t]["sid"].to_numpy()) for t in types
        }
        rows = {"type_a": [], "type_b": [], "n_both": [],
                "n_sessions": []}
        # the diagonal row (a == b) carries each type's own session count
        for i, ta in enumerate(types):
            for tb in types[i:]:
                rows["type_a"].append(ta)
                rows["type_b"].append(tb)
                rows["n_both"].append(
                    len(sets[ta] & sets[tb]) if ta != tb
                    else len(sets[ta])
                )
                rows["n_sessions"].append(n_sessions)
        return pd.DataFrame(
            {
                "type_a": rows["type_a"],
                "type_b": rows["type_b"],
                "n_both": pd.Series(rows["n_both"], dtype=np.int64),
                "n_sessions": pd.Series(rows["n_sessions"],
                                        dtype=np.int64),
            }
        )

    partials = proj.groupby(_BUCKET).map_groups(
        per_bucket, batch_format="pandas"
    )

    def combine(b: pa.Table) -> pa.Table:
        g = b.group_by(["type_a", "type_b"]).aggregate(
            [("n_both", "sum"), ("n_sessions", "sum")]
        )
        return g.rename_columns(
            ["type_a", "type_b", "n_both", "n_sessions"]
        )

    return tree_merge(partials, combine)


SESSION_LIFT_SQL = """
WITH e AS MATERIALIZED (
  SELECT user_id, ts, event_id, event_type,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS new_s
  FROM events
  WHERE user_id IS NOT NULL AND ts IS NOT NULL
    AND event_type IS NOT NULL
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), s AS MATERIALIZED (
  SELECT DISTINCT user_id,
         SUM(new_s) OVER (PARTITION BY user_id
                          ORDER BY ts, event_id) AS sid,
         event_type
  FROM e
), tot AS (
  SELECT CAST(COUNT(DISTINCT (user_id, sid)) AS BIGINT) AS n_sessions
  FROM s
)
SELECT a.event_type AS type_a, b.event_type AS type_b,
       CAST(COUNT(*) AS BIGINT) AS n_both,
       tot.n_sessions
FROM s a
JOIN s b ON a.user_id = b.user_id AND a.sid = b.sid
       AND a.event_type <= b.event_type
CROSS JOIN tot
GROUP BY 1, 2, tot.n_sessions
"""


# ---------------------------------------------------------------------------
# crest factor of hourly load per type
# ---------------------------------------------------------------------------


def q_crest_factor_per_type(sf_dir):
    """Per event type: the (peak, total, n_hours) integer triple of its
    hourly counts over OBSERVED hours — peak-to-mean (crest factor)
    derives exactly; capacity planning sizes for the peak, billing for
    the mean. One bounded pass."""
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
    )

    def fold(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "event_type" not in b.column_names:
            return pa.table(
                {
                    "event_type": pa.array([], pa.string()),
                    "n_hours": pa.array([], pa.int64()),
                    "peak": pa.array([], pa.int64()),
                    "total": pa.array([], pa.int64()),
                }
            )
        g = b.group_by(["event_type"]).aggregate(
            [([], "count_all"), ("n", "max"), ("n", "sum")]
        )
        g = g.select(["event_type", "count_all", "n_max", "n_sum"])
        return g.rename_columns(["event_type", "n_hours", "peak", "total"])

    def fold_combine(b: pa.Table) -> pa.Table:
        g = b.group_by(["event_type"]).aggregate(
            [("n_hours", "sum"), ("peak", "max"), ("total", "sum")]
        )
        return g.rename_columns(["event_type", "n_hours", "peak", "total"])

    return tree_merge(
        grid.map_batches(fold, batch_format="pyarrow", batch_size=None),
        fold_combine,
    )


CREST_SQL = """
WITH grid AS (
  SELECT event_type,
         CAST(FLOOR(epoch(ts) / 3600) AS BIGINT) AS hr,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM events
  WHERE event_type IS NOT NULL AND ts IS NOT NULL
  GROUP BY 1, 2
)
SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_hours,
       CAST(MAX(n) AS BIGINT) AS peak,
       CAST(SUM(n) AS BIGINT) AS total
FROM grid GROUP BY 1
"""


# ---------------------------------------------------------------------------
# segment-mix drift between the two halves of the order date range
# ---------------------------------------------------------------------------


def q_segment_mix_drift(sf_dir):
    """Per market segment: orders in the FIRST vs SECOND half of the
    corpus date range (split at the exact integer midpoint day of
    [min, max]) — the mix-shift table behind a composition-drift test.
    The min/max come from one distributed aggregate; the split pass is
    decomposable; the segment map broadcasts (J1)."""
    from mimirsbrunn_ray.pipelines.queries import BROADCAST_BYTE_BUDGET
    from mimirsbrunn_ray.stages.join import (
        broadcast_join,
        make_lookup_ref_arrays,
    )
    import pyarrow.parquet as pq

    cust = pq.read_table(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_mktsegment"]
    )
    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_orderdate"]
    )
    if cust.nbytes > BROADCAST_BYTE_BUDGET:  # pragma: no cover - scale
        raise NotImplementedError(
            "distributed-dim fallback: Dataset.join orders to customer"
        )
    import pandas as _pd

    mn_day = int(
        _pd.Timestamp(orders.min("o_orderdate")).value // 1000 // _DAY_US
    )
    mx_day = int(
        _pd.Timestamp(orders.max("o_orderdate")).value // 1000 // _DAY_US
    )
    mid = (mn_day + mx_day) // 2  # first half: day <= mid

    lookup = make_lookup_ref_arrays(
        cust["c_custkey"].to_numpy(zero_copy_only=False),
        cust["c_mktsegment"].to_numpy(zero_copy_only=False),
    )
    joined = broadcast_join(
        orders, lookup, key_col="o_custkey", out_col="seg",
        out_type=pa.string(),
    )

    def partial(b: pa.Table) -> pa.Table:
        b = b.filter(
            pc.and_(pc.is_valid(b["seg"]), pc.is_valid(b["o_orderdate"]))
        )
        day = (
            b["o_orderdate"].cast(pa.timestamp("us")).cast(pa.int64())
            .to_numpy(zero_copy_only=False)
            // _DAY_US
        )
        first = (day <= mid).astype(np.int64)
        t = pa.table(
            {
                "c_mktsegment": b["seg"],
                "f": pa.array(first),
                "s": pa.array(1 - first),
            }
        )
        g = t.group_by(["c_mktsegment"]).aggregate(
            [("f", "sum"), ("s", "sum")]
        )
        g = g.select(["c_mktsegment", "f_sum", "s_sum"])
        return g.rename_columns(
            ["c_mktsegment", "n_first_half", "n_second_half"]
        )

    def combine(b: pa.Table) -> pa.Table:
        g = b.group_by(["c_mktsegment"]).aggregate(
            [("n_first_half", "sum"), ("n_second_half", "sum")]
        )
        return g.rename_columns(
            ["c_mktsegment", "n_first_half", "n_second_half"]
        )

    return tree_merge(
        joined.map_batches(partial, batch_format="pyarrow",
                           batch_size=None),
        combine,
    )


MIX_DRIFT_SQL = """
WITH span AS (
  SELECT (CAST(FLOOR(epoch(MIN(o_orderdate)) / 86400) AS BIGINT)
          + CAST(FLOOR(epoch(MAX(o_orderdate)) / 86400) AS BIGINT))
         // 2 AS mid
  FROM orders WHERE o_orderdate IS NOT NULL
)
SELECT c.c_mktsegment,
       CAST(SUM(CASE WHEN FLOOR(epoch(o.o_orderdate) / 86400)
                          <= span.mid THEN 1 ELSE 0 END) AS BIGINT)
         AS n_first_half,
       CAST(SUM(CASE WHEN FLOOR(epoch(o.o_orderdate) / 86400)
                          > span.mid THEN 1 ELSE 0 END) AS BIGINT)
         AS n_second_half
FROM orders o
JOIN customer c ON c.c_custkey = o.o_custkey
CROSS JOIN span
WHERE o.o_orderdate IS NOT NULL
GROUP BY 1
"""


def register_r4bp(queries: dict, oracles: dict) -> None:
    queries.update(
        {
            "session_type_lift": q_session_type_lift,
            "crest_factor_per_type": q_crest_factor_per_type,
            "segment_mix_drift": q_segment_mix_drift,
        }
    )
    oracles.update(
        {
            "session_type_lift": SESSION_LIFT_SQL,
            "crest_factor_per_type": CREST_SQL,
            "segment_mix_drift": MIX_DRIFT_SQL,
        }
    )
