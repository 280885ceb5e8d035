"""Round-4 batch AZ: Gini mean difference, single-day concentration
users, and a composite-key latency quantile grid.

Exactness discipline: the Gini mean difference uses the closed form
sum over pairs |xi-xj| = 2*sum_i((2i-n-1)*x_(i)) over the sorted
histogram — pure integers; concentration is the cross-product
2*max_day > total; grid quantiles follow the repo-wide
PERCENTILE_DISC rank rule on whole-day latencies.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd
from mimirsbrunn_ray.stages.broadcast import safe_join as _safe_join

from mimirsbrunn_ray.stages.rollup import tree_merge

_DAY_US = 86_400_000_000


def _round_half_away(x: np.ndarray) -> np.ndarray:
    return np.where(
        x >= 0, np.floor(x + 0.5), np.ceil(x - 0.5)
    ).astype(np.int64)


# ---------------------------------------------------------------------------
# Gini mean difference of value per type
# ---------------------------------------------------------------------------


def q_gini_mean_difference(sf_dir):
    """Per event type, the Gini mean difference of cents values — the
    robust dispersion E|X-X'| (pairwise absolute difference), emitted
    as the exact integer pair (gmd_num = sum over ordered pairs of
    |xi-xj| = sum_i (2i-n-1)*x_(i) doubled over unordered pairs,
    gmd_den = n*(n-1)). Computed in closed form from the bounded cents
    histogram: a tie group at rank range contributes value * sum of
    (2i-n-1), itself a closed-form integer — no pair enumeration, no
    sort shuffle."""
    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "value"]
    )

    def partial(b: pa.Table) -> pa.Table:
        b = b.filter(
            pc.and_(pc.is_valid(b["event_type"]), pc.is_valid(b["value"]))
        )
        x = _round_half_away(
            b["value"].cast(pa.float64()).to_numpy(zero_copy_only=False)
            * 100.0
        )
        t = pa.table({"event_type": b["event_type"], "v": pa.array(x)})
        g = t.group_by(["event_type", "v"]).aggregate([([], "count_all")])
        g = g.select(["event_type", "v", "count_all"])
        return g.rename_columns(["event_type", "v", "n"])

    def combine(b: pa.Table) -> pa.Table:
        g = b.group_by(["event_type", "v"]).aggregate([("n", "sum")])
        return g.rename_columns(["event_type", "v", "n"])

    hist = tree_merge(
        ev.map_batches(partial, batch_format="pyarrow", batch_size=None),
        combine,
    ).to_pandas()  # bounded: types x cents domain

    rows = {"event_type": [], "n": [], "gmd_num": [], "gmd_den": []}
    if len(hist):
        for et, g in hist.groupby("event_type", sort=True):
            g = g.sort_values("v")
            v = g["v"].to_numpy(dtype=np.int64)
            c = g["n"].to_numpy(dtype=np.int64)
            n = int(c.sum())
            cum_before = np.concatenate(([0], np.cumsum(c)[:-1]))
            # sum over the tie group's ranks i in [cb+1, cb+c] of
            # (2i - n - 1) = 2*(cb*c + c*(c+1)/2) - c*(n+1)
            coef = 2 * (cum_before * c + c * (c + 1) // 2) - c * (n + 1)
            s = int(np.dot(v, coef))
            rows["event_type"].append(et)
            rows["n"].append(n)
            rows["gmd_num"].append(2 * s)
            rows["gmd_den"].append(n * (n - 1))
    return pa.table(
        {
            "event_type": pa.array(rows["event_type"], pa.string()),
            "n": pa.array(rows["n"], pa.int64()),
            "gmd_num": pa.array(rows["gmd_num"], pa.int64()),
            "gmd_den": pa.array(rows["gmd_den"], pa.int64()),
        }
    )


GMD_SQL = """
WITH v AS (
  SELECT event_type, CAST(ROUND(value * 100, 0) AS BIGINT) AS x
  FROM events
  WHERE event_type IS NOT NULL AND value IS NOT NULL
), r AS (
  SELECT event_type, x,
         CAST(ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY x)
              AS BIGINT) AS i,
         CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT) AS n
  FROM v
)
SELECT event_type, CAST(MAX(n) AS BIGINT) AS n,
       CAST(2 * SUM((2 * i - n - 1) * x) AS BIGINT) AS gmd_num,
       CAST(MAX(n) * (MAX(n) - 1) AS BIGINT) AS gmd_den
FROM r GROUP BY 1
"""


# ---------------------------------------------------------------------------
# single-day concentration users
# ---------------------------------------------------------------------------


def q_single_day_users(sf_dir):
    """How many users concentrate MORE THAN HALF their activity into
    one day (2 * busiest-day count > total) vs spread out — the
    burst-vs-habitual user split. Per-user day histograms from one
    hash-bucket shuffle; the cross-product test needs no division."""
    from mimirsbrunn_ray.stages.dedup import _BUCKET, add_bucket

    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts"]
    )

    def project(b: pa.Table) -> pa.Table:
        b = b.filter(
            pc.and_(pc.is_valid(b["user_id"]), pc.is_valid(b["ts"]))
        )
        ts_us = b["ts"].cast(pa.timestamp("us")).cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        t = pa.table(
            {
                "user_id": b["user_id"],
                "day": pa.array(np.floor_divide(ts_us, _DAY_US)),
            }
        )
        return add_bucket(t, "user_id", 64)

    proj = ev.map_batches(project, batch_format="pyarrow", batch_size=None)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "n_concentrated": pd.Series([], dtype=np.int64),
                "n_spread": pd.Series([], dtype=np.int64),
            }
        )
        if len(g) == 0:
            return empty
        ud = g.groupby(["user_id", "day"], sort=False).size()
        per_user = ud.groupby(level=0).agg(["max", "sum"])
        conc = (2 * per_user["max"] > per_user["sum"]).sum()
        return pd.DataFrame(
            {
                "n_concentrated": pd.Series([int(conc)], dtype=np.int64),
                "n_spread": pd.Series(
                    [int(len(per_user) - conc)], dtype=np.int64
                ),
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


SINGLE_DAY_SQL = """
WITH ud AS (
  SELECT user_id, CAST(FLOOR(epoch(ts) / 86400) AS BIGINT) AS day,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
  GROUP BY 1, 2
), u AS (
  SELECT user_id, CAST(MAX(n) AS BIGINT) AS mx,
         CAST(SUM(n) AS BIGINT) AS tot
  FROM ud GROUP BY 1
)
SELECT CAST(SUM(CASE WHEN 2 * mx > tot THEN 1 ELSE 0 END) AS BIGINT)
         AS n_concentrated,
       CAST(SUM(CASE WHEN 2 * mx > tot THEN 0 ELSE 1 END) AS BIGINT)
         AS n_spread
FROM u
"""


# ---------------------------------------------------------------------------
# p90 ship latency per (priority, order month)
# ---------------------------------------------------------------------------


def q_ship_latency_p90_grid(sf_dir):
    """Exact p90 whole-day ship latency per (order priority, order
    month) — the composite-key quantile grid an operations review
    reads. One big-big join keyed on the order, then the decomposable
    (priority, month, latency-day) histogram (bounded by priorities x
    months x latency domain); the grid walk applies the PERCENTILE_DISC
    rank rule per cell."""
    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderdate", "o_orderpriority"],
    ).map_batches(
        lambda b: b.filter(
            pc.and_(
                pc.and_(
                    pc.is_valid(b["o_orderkey"]),
                    pc.is_valid(b["o_orderdate"]),
                ),
                pc.is_valid(b["o_orderpriority"]),
            )
        ),
        batch_format="pyarrow",
        batch_size=None,
    ).repartition(4)
    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_shipdate"]
    ).map_batches(
        lambda b: b.filter(
            pc.and_(
                pc.is_valid(b["l_orderkey"]), pc.is_valid(b["l_shipdate"])
            )
        ),
        batch_format="pyarrow",
        batch_size=None,
    ).repartition(4)
    joined = _safe_join(
        li, orders,
        on=("l_orderkey",),
        right_on=("o_orderkey",),
        join_type="inner",
        num_partitions=4,
    )

    def partial(b: pa.Table) -> pa.Table:
        ship = (
            b["l_shipdate"].cast(pa.timestamp("us")).cast(pa.int64())
            .to_numpy(zero_copy_only=False)
        )
        odate = (
            b["o_orderdate"].cast(pa.timestamp("us")).cast(pa.int64())
            .to_numpy(zero_copy_only=False)
        )
        lat = (ship - odate) // _DAY_US
        # calendar month index: year*12 + month - 1, exact from the date
        dt = b["o_orderdate"].cast(pa.timestamp("us"))
        yr = pc.year(dt).to_numpy(zero_copy_only=False).astype(np.int64)
        mo = pc.month(dt).to_numpy(zero_copy_only=False).astype(np.int64)
        midx = yr * 12 + mo - 1
        t = pa.table(
            {
                "prio": b["o_orderpriority"],
                "m": pa.array(midx),
                "lat": pa.array(lat),
            }
        )
        g = t.group_by(["prio", "m", "lat"]).aggregate([([], "count_all")])
        g = g.select(["prio", "m", "lat", "count_all"])
        return g.rename_columns(["prio", "m", "lat", "n"])

    def combine(b: pa.Table) -> pa.Table:
        g = b.group_by(["prio", "m", "lat"]).aggregate([("n", "sum")])
        return g.rename_columns(["prio", "m", "lat", "n"])

    hist = tree_merge(
        joined.map_batches(partial, batch_format="pyarrow",
                           batch_size=None),
        combine,
    ).to_pandas()  # bounded: priorities x months x latency days

    rows = {"o_orderpriority": [], "month_idx": [], "n_items": [],
            "p90_days": []}
    if len(hist):
        for (prio, m), g in hist.groupby(["prio", "m"], sort=True):
            g = g.sort_values("lat")
            v = g["lat"].to_numpy(dtype=np.int64)
            cum = np.cumsum(g["n"].to_numpy(dtype=np.int64))
            total = int(cum[-1])
            rank = int(np.ceil(0.9 * total - 1e-9))
            rows["o_orderpriority"].append(prio)
            rows["month_idx"].append(int(m))
            rows["n_items"].append(total)
            rows["p90_days"].append(
                int(v[np.searchsorted(cum, rank, "left")])
            )
    return pa.table(
        {
            "o_orderpriority": pa.array(
                rows["o_orderpriority"], pa.string()
            ),
            "month_idx": pa.array(rows["month_idx"], pa.int64()),
            "n_items": pa.array(rows["n_items"], pa.int64()),
            "p90_days": pa.array(rows["p90_days"], pa.int64()),
        }
    )


LATENCY_GRID_SQL = """
WITH j AS (
  SELECT o.o_orderpriority,
         CAST(year(o.o_orderdate) * 12 + month(o.o_orderdate) - 1
              AS BIGINT) AS month_idx,
         (EPOCH_US(l.l_shipdate) - EPOCH_US(o.o_orderdate))
           // 86400000000 AS lat
  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
  WHERE l.l_shipdate IS NOT NULL AND o.o_orderdate IS NOT NULL
    AND o.o_orderpriority IS NOT NULL
)
SELECT o_orderpriority, month_idx,
       CAST(COUNT(*) AS BIGINT) AS n_items,
       CAST(quantile_disc(lat, 0.9) AS BIGINT) AS p90_days
FROM j GROUP BY 1, 2
"""


def register_r4az(queries: dict, oracles: dict) -> None:
    queries.update(
        {
            "gini_mean_difference": q_gini_mean_difference,
            "single_day_users": q_single_day_users,
            "ship_latency_p90_grid": q_ship_latency_p90_grid,
        }
    )
    oracles.update(
        {
            "gini_mean_difference": GMD_SQL,
            "single_day_users": SINGLE_DAY_SQL,
            "ship_latency_p90_grid": LATENCY_GRID_SQL,
        }
    )
