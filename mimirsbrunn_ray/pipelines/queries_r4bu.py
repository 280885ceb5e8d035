"""Round-4 batch BU: repeat cadence by segment, peak-hour offsets, and
session type diversity.

Exactness discipline: cadence medians use the small-domain day-gap
histogram rank rule per segment; peak hours are integer argmaxes with
smallest-hour tie rule; diversity is exact per-session distinct-type
counting.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray.data as rd

from mimirsbrunn_ray.stages.rollup import tree_merge

_HOUR_US = 3_600_000_000
_DAY_US = 86_400_000_000
_GAP_US = 30 * 60_000_000


# ---------------------------------------------------------------------------
# repeat-order cadence by market segment
# ---------------------------------------------------------------------------


def q_repeat_cadence_by_segment(sf_dir):
    """Per market segment: the exact median DAYS between a customer's
    consecutive orders (gaps pooled across the segment's repeat
    customers) — how purchase rhythm differs by segment. Gaps resolve
    inside customer-disjoint shards ((date, key) order); the per-segment
    median rides the small-domain day-gap histogram."""
    from mimirsbrunn_ray.pipelines.queries import BROADCAST_BYTE_BUDGET
    from mimirsbrunn_ray.stages.dedup import _BUCKET, add_bucket
    from mimirsbrunn_ray.stages.join import (
        broadcast_join,
        make_lookup_ref_arrays,
    )

    cust = pq.read_table(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_mktsegment"]
    )
    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_orderkey", "o_orderdate"],
    )
    if cust.nbytes > BROADCAST_BYTE_BUDGET:  # pragma: no cover - scale
        raise NotImplementedError(
            "distributed-dim fallback: Dataset.join orders to customer"
        )
    lookup = make_lookup_ref_arrays(
        cust["c_custkey"].to_numpy(zero_copy_only=False),
        cust["c_mktsegment"].to_numpy(zero_copy_only=False),
    )
    joined = broadcast_join(
        orders, lookup, key_col="o_custkey", out_col="seg",
        out_type=pa.string(),
    )

    def project(b: pa.Table) -> pa.Table:
        b = b.filter(
            pc.and_(pc.is_valid(b["seg"]), pc.is_valid(b["o_orderdate"]))
        )
        return add_bucket(b, "o_custkey", 64)

    proj = joined.map_batches(project, batch_format="pyarrow",
                              batch_size=None)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "seg": pd.Series([], dtype=object),
                "gap_days": pd.Series([], dtype=np.int64),
                "n": pd.Series([], dtype=np.int64),
            }
        )
        if len(g) == 0:
            return empty
        g = g.sort_values(
            ["o_custkey", "o_orderdate", "o_orderkey"],
            kind="mergesort", ignore_index=True,
        )
        day = (
            g["o_orderdate"].to_numpy(dtype="datetime64[us]")
            .astype(np.int64)
            // _DAY_US
        )
        ck = g["o_custkey"].to_numpy()
        same = np.zeros(len(g), dtype=bool)
        if len(g) > 1:
            same[1:] = ck[1:] == ck[:-1]
        idx = np.nonzero(same)[0]
        if len(idx) == 0:
            return empty
        df = pd.DataFrame(
            {
                "seg": g["seg"].to_numpy()[idx],
                "gap_days": (day[idx] - day[idx - 1]).astype(np.int64),
            }
        )
        agg = df.groupby(["seg", "gap_days"], sort=False).size()
        agg = agg.reset_index()
        agg.columns = ["seg", "gap_days", "n"]
        agg["n"] = agg["n"].astype(np.int64)
        return agg

    partials = proj.groupby(_BUCKET).map_groups(
        per_bucket, batch_format="pandas"
    )

    def combine(b: pa.Table) -> pa.Table:
        g = b.group_by(["seg", "gap_days"]).aggregate([("n", "sum")])
        return g.rename_columns(["seg", "gap_days", "n"])

    hist = tree_merge(partials, combine).to_pandas()

    rows = {"c_mktsegment": [], "n_gaps": [], "median_gap_days": []}
    if len(hist):
        for seg, g in hist.groupby("seg", sort=True):
            g = g.sort_values("gap_days")
            v = g["gap_days"].to_numpy(dtype=np.int64)
            cum = np.cumsum(g["n"].to_numpy(dtype=np.int64))
            total = int(cum[-1])
            rank = int(np.ceil(0.5 * total - 1e-9))
            rows["c_mktsegment"].append(seg)
            rows["n_gaps"].append(total)
            rows["median_gap_days"].append(
                int(v[np.searchsorted(cum, rank, "left")])
            )
    return pa.table(
        {
            "c_mktsegment": pa.array(rows["c_mktsegment"], pa.string()),
            "n_gaps": pa.array(rows["n_gaps"], pa.int64()),
            "median_gap_days": pa.array(
                rows["median_gap_days"], pa.int64()
            ),
        }
    )


CADENCE_SEGMENT_SQL = """
WITH o AS (
  SELECT c.c_mktsegment AS seg, o.o_custkey,
         CAST(FLOOR(epoch(o.o_orderdate) / 86400) AS BIGINT) AS day,
         o.o_orderkey
  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
  WHERE o.o_orderdate IS NOT NULL
), g AS (
  SELECT seg,
         day - LAG(day) OVER (PARTITION BY o_custkey
                              ORDER BY day, o_orderkey) AS gap_days
  FROM o
)
SELECT seg AS c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n_gaps,
       CAST(quantile_disc(gap_days, 0.5) AS BIGINT) AS median_gap_days
FROM g WHERE gap_days IS NOT NULL
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# peak hour-of-day offsets per type
# ---------------------------------------------------------------------------


def q_peak_hod_offsets(sf_dir):
    """Per event type: its peak hour-of-day (argmax count, ties ->
    smallest hour), the GLOBAL peak hour, and the circular offset
    between them — do all signals crest together or staggered? One
    bounded (type, hod) pass; integer argmaxes."""
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
            {"event_type": b["event_type"], "hod": pa.array(hod)}
        )
        g = t.group_by(["event_type", "hod"]).aggregate(
            [([], "count_all")]
        )
        g = g.select(["event_type", "hod", "count_all"])
        return g.rename_columns(["event_type", "hod", "n"])

    def combine(b: pa.Table) -> pa.Table:
        g = b.group_by(["event_type", "hod"]).aggregate([("n", "sum")])
        return g.rename_columns(["event_type", "hod", "n"])

    grid = tree_merge(
        ev.map_batches(partial, batch_format="pyarrow", batch_size=None),
        combine,
    ).to_pandas()

    rows = {"event_type": [], "peak_hod": [], "global_peak_hod": [],
            "offset_hours": []}
    if len(grid):
        tot = grid.groupby("hod")["n"].sum().sort_index()
        gbest = int(
            tot[tot == tot.max()].index.min()
        )  # ties -> smallest hour
        for et, g in grid.groupby("event_type", sort=True):
            m = g.groupby("hod")["n"].sum().sort_index()
            best = int(m[m == m.max()].index.min())
            rows["event_type"].append(et)
            rows["peak_hod"].append(best)
            rows["global_peak_hod"].append(gbest)
            rows["offset_hours"].append((best - gbest) % 24)
    return pa.table(
        {
            "event_type": pa.array(rows["event_type"], pa.string()),
            "peak_hod": pa.array(rows["peak_hod"], pa.int64()),
            "global_peak_hod": pa.array(
                rows["global_peak_hod"], pa.int64()
            ),
            "offset_hours": pa.array(rows["offset_hours"], pa.int64()),
        }
    )


PEAK_OFFSET_SQL = """
WITH g AS MATERIALIZED (
  SELECT event_type, CAST(hour(ts) AS BIGINT) AS hod,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM events
  WHERE event_type IS NOT NULL AND ts IS NOT NULL
  GROUP BY 1, 2
), per_type AS (
  SELECT event_type, hod AS peak_hod
  FROM g
  QUALIFY ROW_NUMBER() OVER (PARTITION BY event_type
                             ORDER BY n DESC, hod) = 1
), gpeak AS (
  SELECT hod AS global_peak_hod
  FROM (SELECT hod, SUM(n) AS n FROM g GROUP BY 1)
  ORDER BY n DESC, hod LIMIT 1
)
SELECT p.event_type, p.peak_hod, gl.global_peak_hod,
       CAST((p.peak_hod - gl.global_peak_hod + 24) % 24 AS BIGINT)
         AS offset_hours
FROM per_type p CROSS JOIN gpeak gl
"""


# ---------------------------------------------------------------------------
# session type diversity
# ---------------------------------------------------------------------------


def q_session_type_diversity(sf_dir):
    """Sessions split by type diversity: single-type vs multi-type
    (does a session mean one activity or a journey?). Islands and
    per-session distinct-type counts resolve inside one user
    hash-bucket shuffle."""
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
                "n_sessions": pd.Series([], dtype=np.int64),
                "n_single_type": pd.Series([], dtype=np.int64),
                "n_multi_type": pd.Series([], dtype=np.int64),
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
        per = df.groupby("sid").size()
        n = len(per)
        single = int((per == 1).sum())
        return pd.DataFrame(
            {
                "n_sessions": pd.Series([n], dtype=np.int64),
                "n_single_type": pd.Series([single], dtype=np.int64),
                "n_multi_type": pd.Series([n - single], dtype=np.int64),
            }
        )

    partials = proj.groupby(_BUCKET).map_groups(
        per_bucket, batch_format="pandas"
    )

    def combine(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                c: pa.array([pc.sum(b[c]).as_py() or 0], pa.int64())
                for c in b.column_names
            }
        )

    return tree_merge(partials, combine)


SESSION_DIVERSITY_SQL = """
WITH e AS MATERIALIZED (
  SELECT user_id, ts, event_id, event_type,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS new_s
  FROM events
  WHERE user_id IS NOT NULL AND ts IS NOT NULL
    AND event_type IS NOT NULL
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), s AS (
  SELECT user_id, event_type,
         SUM(new_s) OVER (PARTITION BY user_id
                          ORDER BY ts, event_id) AS sid
  FROM e
), per_session AS (
  SELECT user_id, sid,
         CAST(COUNT(DISTINCT event_type) AS BIGINT) AS nt
  FROM s GROUP BY 1, 2
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_sessions,
       CAST(SUM(CASE WHEN nt = 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_single_type,
       CAST(SUM(CASE WHEN nt > 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_multi_type
FROM per_session
"""


def register_r4bu(queries: dict, oracles: dict) -> None:
    queries.update(
        {
            "repeat_cadence_by_segment": q_repeat_cadence_by_segment,
            "peak_hod_offsets": q_peak_hod_offsets,
            "session_type_diversity": q_session_type_diversity,
        }
    )
    oracles.update(
        {
            "repeat_cadence_by_segment": CADENCE_SEGMENT_SQL,
            "peak_hod_offsets": PEAK_OFFSET_SQL,
            "session_type_diversity": SESSION_DIVERSITY_SQL,
        }
    )
