"""Round-4 batch BA: competing-risks race after clicks, the exact
Pareto 80/20 point, and modal inter-event gaps.

Exactness discipline: race outcomes compare exact microsecond
timestamps with composite tie rules; the Pareto point is the integer
cross-product 5*cum >= 4*total over descending customer totals; modal
gaps are whole-second integers with smallest-gap tie rule.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from mimirsbrunn_ray.stages.rollup import tree_merge


def _round_half_away(x: np.ndarray) -> np.ndarray:
    return np.where(
        x >= 0, np.floor(x + 0.5), np.ceil(x - 0.5)
    ).astype(np.int64)


# ---------------------------------------------------------------------------
# competing risks: after each click, purchase or error first?
# ---------------------------------------------------------------------------


def q_click_outcome_race(sf_dir):
    """For every click, which outcome arrives first — the user's next
    PURCHASE or next ERROR (competing risks; strictly later events,
    (ts, event_id) order; exact timestamp comparison, purchase wins
    exact ties by the repo's deterministic rule: earlier (ts, id)
    wins, and at full equality the race can't happen since events are
    distinct rows). Output: counts of purchase-first, error-first, and
    no-outcome clicks. One user hash-bucket shuffle with reverse
    cumulative mins per outcome type."""
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
                "n_purchase_first": pd.Series([], dtype=np.int64),
                "n_error_first": pd.Series([], dtype=np.int64),
                "n_no_outcome": pd.Series([], dtype=np.int64),
            }
        )
        if len(g) == 0:
            return empty
        g, _ = _series_segments(g, "user_id", "ts", "event_id")
        ts_us = g["ts"].to_numpy(dtype="datetime64[us]").astype(np.int64)
        eid = g["event_id"].to_numpy(dtype=np.int64)
        et = g["event_type"].to_numpy()
        uid = g["user_id"].to_numpy()
        big = np.iinfo(np.int64).max
        # composite order key (rows already sorted by it): next-of-type
        # via reverse cumulative min of the ROW POSITION
        pos = np.arange(len(g), dtype=np.int64)

        def next_pos_of(kind):
            p = np.where(et == kind, pos, big)
            s = pd.Series(p)
            rev = s[::-1].groupby(uid[::-1]).cummin()[::-1].to_numpy()
            nxt = np.concatenate((rev[1:], [big]))
            last = np.empty(len(g), dtype=bool)
            last[:-1] = uid[:-1] != uid[1:]
            last[-1] = True
            nxt[last] = big
            return nxt

        np_pos = next_pos_of("purchase")
        ne_pos = next_pos_of("error")
        is_click = et == "click"
        pf = int((is_click & (np_pos < ne_pos)).sum())
        ef = int((is_click & (ne_pos < np_pos)).sum())
        none_ = int((is_click & (np_pos == big) & (ne_pos == big)).sum())
        return pd.DataFrame(
            {
                "n_purchase_first": pd.Series([pf], dtype=np.int64),
                "n_error_first": pd.Series([ef], dtype=np.int64),
                "n_no_outcome": pd.Series([none_], dtype=np.int64),
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


RACE_SQL = """
WITH e AS MATERIALIZED (
  SELECT user_id, ts, event_id, event_type,
         ROW_NUMBER() OVER (ORDER BY user_id, ts, event_id) AS pos
  FROM events
  WHERE user_id IS NOT NULL AND ts IS NOT NULL
    AND event_type IS NOT NULL
), w AS (
  SELECT user_id, event_type, pos,
         MIN(CASE WHEN event_type = 'purchase' THEN pos END)
           OVER (PARTITION BY user_id ORDER BY pos
                 ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
           AS np,
         MIN(CASE WHEN event_type = 'error' THEN pos END)
           OVER (PARTITION BY user_id ORDER BY pos
                 ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
           AS ne
  FROM e
)
SELECT CAST(SUM(CASE WHEN np IS NOT NULL
                      AND (ne IS NULL OR np < ne)
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase_first,
       CAST(SUM(CASE WHEN ne IS NOT NULL
                      AND (np IS NULL OR ne < np)
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_error_first,
       CAST(SUM(CASE WHEN np IS NULL AND ne IS NULL
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_no_outcome
FROM w WHERE event_type = 'click'
"""


# ---------------------------------------------------------------------------
# the exact Pareto 80/20 point over customer revenue
# ---------------------------------------------------------------------------


def q_pareto_point_customers(sf_dir):
    """The exact Pareto point: the smallest number of top-revenue
    customers covering at least 80% of total order revenue (integer
    test 5*cum >= 4*total over the DESCENDING per-customer totals;
    ties in total are ordered together — any tie order yields the same
    k because tied customers contribute equal amounts). Per-customer
    cents totals from key-disjoint shards; the boundary walk runs over
    the bounded total-value histogram."""
    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_totalprice"]
    )

    def partial(b: pa.Table) -> pa.Table:
        b = b.filter(
            pc.and_(
                pc.is_valid(b["o_custkey"]), pc.is_valid(b["o_totalprice"])
            )
        )
        x = _round_half_away(
            b["o_totalprice"].cast(pa.float64()).to_numpy(
                zero_copy_only=False
            )
            * 100.0
        )
        t = pa.table({"o_custkey": b["o_custkey"], "x": pa.array(x)})
        g = t.group_by(["o_custkey"]).aggregate([("x", "sum")])
        g = g.select(["o_custkey", "x_sum"])
        return g.rename_columns(["o_custkey", "v"])

    def cust_combine(b: pa.Table) -> pa.Table:
        g = b.group_by(["o_custkey"]).aggregate([("v", "sum")])
        return g.rename_columns(["o_custkey", "v"])

    totals = tree_merge(
        orders.map_batches(partial, batch_format="pyarrow",
                           batch_size=None),
        cust_combine,
        final_shards=8,
        shard_cols=["o_custkey"],
    )

    def hist_partial(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "v" not in b.column_names:
            return pa.table(
                {"v": pa.array([], pa.int64()),
                 "c": pa.array([], pa.int64())}
            )
        g = b.group_by(["v"]).aggregate([([], "count_all")])
        g = g.select(["v", "count_all"])
        return g.rename_columns(["v", "c"])

    def hist_combine(b: pa.Table) -> pa.Table:
        g = b.group_by(["v"]).aggregate([("c", "sum")])
        return g.rename_columns(["v", "c"])

    hist = tree_merge(
        totals.map_batches(hist_partial, batch_format="pyarrow",
                           batch_size=None),
        hist_combine,
    ).to_pandas()  # bounded: distinct per-customer totals

    out = {"n_customers": [0], "k_top": [None],
           "cum_at_k_x100": [None], "total_x100": [0]}
    if len(hist):
        hist = hist.sort_values("v", ascending=False)
        v = hist["v"].to_numpy(dtype=np.int64)
        c = hist["c"].to_numpy(dtype=np.int64)
        n = int(c.sum())
        total = int(np.dot(v, c))
        out["n_customers"] = [n]
        out["total_x100"] = [total]
        # expand tie groups: customers within a group add equal v, so
        # the minimal k inside a group is exact integer arithmetic
        cum = 0
        seen = 0
        k = None
        for vi, ci in zip(v, c):
            # smallest j in [1, ci] with 5*(cum + j*vi) >= 4*total
            need = 4 * total - 5 * cum
            if need <= 0:
                k = seen if seen > 0 else 0
                break
            if vi > 0:
                j = -(-need // (5 * vi))  # ceil
                if j <= ci:
                    k = seen + int(j)
                    cum += int(j) * vi
                    break
            cum += ci * vi
            seen += ci
        if k is None:
            k = n
            cum = total
        out["k_top"] = [int(k)]
        out["cum_at_k_x100"] = [int(cum)]
    return pa.table(
        {
            "n_customers": pa.array(out["n_customers"], pa.int64()),
            "k_top": pa.array(out["k_top"], pa.int64()),
            "cum_at_k_x100": pa.array(out["cum_at_k_x100"], pa.int64()),
            "total_x100": pa.array(out["total_x100"], pa.int64()),
        }
    )


PARETO_POINT_SQL = """
WITH cust AS (
  SELECT o_custkey,
         CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT))
              AS BIGINT) AS v
  FROM orders
  WHERE o_custkey IS NOT NULL AND o_totalprice IS NOT NULL
  GROUP BY 1
), r AS (
  SELECT v,
         CAST(ROW_NUMBER() OVER (ORDER BY v DESC, o_custkey)
              AS BIGINT) AS k,
         CAST(SUM(v) OVER (ORDER BY v DESC, o_custkey) AS BIGINT)
           AS cum,
         CAST(SUM(v) OVER () AS BIGINT) AS total,
         CAST(COUNT(*) OVER () AS BIGINT) AS n
  FROM cust
)
SELECT n AS n_customers, k AS k_top, cum AS cum_at_k_x100,
       total AS total_x100
FROM r
WHERE 5 * cum >= 4 * total
ORDER BY k LIMIT 1
"""


# ---------------------------------------------------------------------------
# modal inter-event gap per type (periodicity fingerprint)
# ---------------------------------------------------------------------------


def q_modal_gap_per_type(sf_dir):
    """Per event type: the MOST COMMON whole-second gap between a
    user's consecutive events of that type (ties -> smallest gap) with
    its frequency — the periodicity fingerprint (bots and schedulers
    spike at one modal gap; humans spread). One user hash-bucket
    shuffle; per-series vectorized LAG inside (user, type) runs; the
    mode walks the bounded (type, gap) histogram."""
    from mimirsbrunn_ray.stages.dedup import _BUCKET, add_bucket

    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "ts", "event_id", "event_type"],
    )

    def project(b: pa.Table) -> pa.Table:
        b = b.filter(
            pc.and_(
                pc.and_(
                    pc.is_valid(b["user_id"]), pc.is_valid(b["ts"])
                ),
                pc.is_valid(b["event_type"]),
            )
        )
        return add_bucket(b, "user_id", 64)

    proj = ev.map_batches(project, batch_format="pyarrow", batch_size=None)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "event_type": pd.Series([], dtype=object),
                "gap_s": pd.Series([], dtype=np.int64),
                "c": pd.Series([], dtype=np.int64),
            }
        )
        if len(g) == 0:
            return empty
        g = g.sort_values(
            ["user_id", "event_type", "ts", "event_id"],
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
            )
        idx = np.nonzero(same)[0]
        if len(idx) == 0:
            return empty
        gap_s = (ts_us[idx] - ts_us[idx - 1]) // 1_000_000
        df = pd.DataFrame(
            {
                "event_type": g["event_type"].to_numpy()[idx],
                "gap_s": gap_s.astype(np.int64),
            }
        )
        agg = df.groupby(["event_type", "gap_s"], sort=False).size()
        agg = agg.reset_index()
        agg.columns = ["event_type", "gap_s", "c"]
        agg["c"] = agg["c"].astype(np.int64)
        return agg

    partials = proj.groupby(_BUCKET).map_groups(
        per_bucket, batch_format="pandas"
    )

    def combine(b: pa.Table) -> pa.Table:
        g = b.group_by(["event_type", "gap_s"]).aggregate([("c", "sum")])
        return g.rename_columns(["event_type", "gap_s", "c"])

    hist = tree_merge(partials, combine).to_pandas()
    # bounded: types x distinct whole-second gaps

    rows = {"event_type": [], "modal_gap_s": [], "n_at_mode": [],
            "n_gaps": []}
    if len(hist):
        for et, g in hist.groupby("event_type", sort=True):
            g = g.sort_values(["c", "gap_s"], ascending=[False, True])
            rows["event_type"].append(et)
            rows["modal_gap_s"].append(int(g["gap_s"].iloc[0]))
            rows["n_at_mode"].append(int(g["c"].iloc[0]))
            rows["n_gaps"].append(int(g["c"].sum()))
    return pa.table(
        {
            "event_type": pa.array(rows["event_type"], pa.string()),
            "modal_gap_s": pa.array(rows["modal_gap_s"], pa.int64()),
            "n_at_mode": pa.array(rows["n_at_mode"], pa.int64()),
            "n_gaps": pa.array(rows["n_gaps"], pa.int64()),
        }
    )


MODAL_GAP_SQL = """
WITH s AS (
  SELECT user_id, event_type,
         (EPOCH_US(ts) - EPOCH_US(LAG(ts) OVER (
            PARTITION BY user_id, event_type
            ORDER BY ts, event_id))) // 1000000 AS gap_s
  FROM events
  WHERE user_id IS NOT NULL AND ts IS NOT NULL
    AND event_type IS NOT NULL
), h AS (
  SELECT event_type, CAST(gap_s AS BIGINT) AS gap_s,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM s WHERE gap_s IS NOT NULL
  GROUP BY 1, 2
)
SELECT event_type, gap_s AS modal_gap_s, c AS n_at_mode,
       CAST(SUM(c) OVER (PARTITION BY event_type) AS BIGINT) AS n_gaps
FROM h
QUALIFY ROW_NUMBER() OVER (PARTITION BY event_type
                           ORDER BY c DESC, gap_s) = 1
"""


def register_r4ba(queries: dict, oracles: dict) -> None:
    queries.update(
        {
            "click_outcome_race": q_click_outcome_race,
            "pareto_point_customers": q_pareto_point_customers,
            "modal_gap_per_type": q_modal_gap_per_type,
        }
    )
    oracles.update(
        {
            "click_outcome_race": RACE_SQL,
            "pareto_point_customers": PARETO_POINT_SQL,
            "modal_gap_per_type": MODAL_GAP_SQL,
        }
    )
