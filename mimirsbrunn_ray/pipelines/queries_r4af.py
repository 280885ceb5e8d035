"""Round-4 batch AF: multiplicative and inequality statistics —
fixed-point geometric mean per type, click-to-purchase conversion-delay
quantiles, and the Gini coefficient of user activity per event type.

Exactness discipline: geometric means ride the engine's fixed-point
micro-nat convention (per-row round(ln(x)*1e6) then integer sums, the
unigram-LM discipline); delays are integer seconds with the repo-wide
PERCENTILE_DISC rank rule; Gini is emitted as an exact integer
numerator/denominator pair computed from the count-of-counts histogram.
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
# fixed-point geometric mean of value per type
# ---------------------------------------------------------------------------


def q_geomean_value_per_type(sf_dir):
    """Per event type: count and fixed-point sum of ln(cents value) over
    strictly-positive values — the geometric-mean aggregate (geomean =
    exp(sum / n / 1e6)), the right average for multiplicative
    quantities. Per-row micro-nats round(ln(x)*1e6) make the
    distributed sum pure integer arithmetic — order-independent and
    bit-equal to the SQL twin (the unigram-LM fixed-point discipline,
    stages/text.py:unigram_logprob_scores)."""
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
        pos = x > 0
        et = b["event_type"].filter(pa.array(pos))
        lnx = _round_half_away(np.log(x[pos].astype(np.float64)) * 1e6)
        t = pa.table({"event_type": et, "lnx": pa.array(lnx)})
        g = t.group_by(["event_type"]).aggregate(
            [([], "count_all"), ("lnx", "sum")]
        )
        g = g.select(["event_type", "count_all", "lnx_sum"])
        return g.rename_columns(["event_type", "n", "sum_ln_x1e6"])

    def combine(b: pa.Table) -> pa.Table:
        g = b.group_by(["event_type"]).aggregate(
            [("n", "sum"), ("sum_ln_x1e6", "sum")]
        )
        return g.rename_columns(["event_type", "n", "sum_ln_x1e6"])

    return tree_merge(
        ev.map_batches(partial, batch_format="pyarrow", batch_size=None),
        combine,
    )


GEOMEAN_SQL = """
WITH v AS (
  SELECT event_type, CAST(ROUND(value * 100, 0) AS BIGINT) AS x
  FROM events
  WHERE event_type IS NOT NULL AND value IS NOT NULL
)
SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(ROUND(LN(CAST(x AS DOUBLE)) * 1000000, 0)
                     AS BIGINT)) AS BIGINT) AS sum_ln_x1e6
FROM v WHERE x > 0
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# click -> purchase conversion-delay quantiles
# ---------------------------------------------------------------------------


def q_conversion_delay_quantiles(sf_dir):
    """Quantiles of the click-to-purchase delay: for every click, the
    gap to the user's NEXT purchase event (in whole seconds), then
    exact p50/p90/p99 over all converting clicks — the time-to-convert
    distribution behind conversion_within_1h's binary rate. One user
    hash-bucket shuffle computes next-purchase per click (reverse
    cumulative min inside each user series); the quantiles come from
    the decomposable seconds histogram with the repo-wide
    PERCENTILE_DISC rank rule — no sort shuffle."""
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
        empty = pd.DataFrame({"d_s": pd.Series([], dtype=np.int64)})
        if len(g) == 0:
            return empty
        g, _same = _series_segments(g, "user_id", "ts", "event_id")
        ts_us = g["ts"].to_numpy(dtype="datetime64[us]").astype(np.int64)
        et = g["event_type"].to_numpy()
        # purchase ts or +inf, reverse cummin within each user, shifted
        # one row so a click sees only STRICTLY LATER rows
        pts = np.where(et == "purchase", ts_us, np.iinfo(np.int64).max)
        s = pd.Series(pts)
        rev_min = (
            s[::-1].groupby(g["user_id"].to_numpy()[::-1]).cummin()[::-1]
        ).to_numpy()
        nxt = np.concatenate((rev_min[1:], [np.iinfo(np.int64).max]))
        # the shift must not leak across users: last row of a user series
        # has no successor
        uid = g["user_id"].to_numpy()
        last = np.empty(len(g), dtype=bool)
        if len(g):
            last[:-1] = uid[:-1] != uid[1:]
            last[-1] = True
        nxt[last] = np.iinfo(np.int64).max
        is_click = et == "click"
        conv = is_click & (nxt != np.iinfo(np.int64).max)
        d_s = (nxt[conv] - ts_us[conv]) // 1_000_000
        return pd.DataFrame({"d_s": d_s.astype(np.int64)})

    deltas = proj.groupby(_BUCKET).map_groups(
        per_bucket, batch_format="pandas"
    )

    def hist_partial(b: pa.Table) -> pa.Table:
        if "d_s" not in b.column_names or b.num_rows == 0:
            return pa.table(
                {"v": pa.array([], pa.int64()),
                 "n": pa.array([], pa.int64())}
            )
        g = b.group_by(["d_s"]).aggregate([([], "count_all")])
        g = g.select(["d_s", "count_all"])
        return g.rename_columns(["v", "n"])

    def hist_combine(b: pa.Table) -> pa.Table:
        g = b.group_by(["v"]).aggregate([("n", "sum")])
        return g.rename_columns(["v", "n"])

    hist = tree_merge(
        deltas.map_batches(hist_partial, batch_format="pyarrow",
                           batch_size=None),
        hist_combine,
    ).to_pandas()  # bounded: distinct delay seconds

    out = {"n_conversions": [0], "p50_s": [None], "p90_s": [None],
           "p99_s": [None]}
    if len(hist) and hist["n"].sum() > 0:
        hist = hist.sort_values("v")
        v = hist["v"].to_numpy(dtype=np.int64)
        cum = np.cumsum(hist["n"].to_numpy(dtype=np.int64))
        total = int(cum[-1])
        out["n_conversions"] = [total]
        for q, col in ((0.5, "p50_s"), (0.9, "p90_s"), (0.99, "p99_s")):
            rank = int(np.ceil(q * total - 1e-9))
            out[col] = [int(v[np.searchsorted(cum, rank, "left")])]
    return pa.table(
        {
            "n_conversions": pa.array(out["n_conversions"], pa.int64()),
            "p50_s": pa.array(out["p50_s"], pa.int64()),
            "p90_s": pa.array(out["p90_s"], pa.int64()),
            "p99_s": pa.array(out["p99_s"], pa.int64()),
        }
    )


CONV_DELAY_SQL = """
WITH s AS (
  SELECT user_id, ts, event_id, event_type,
         MIN(CASE WHEN event_type = 'purchase' THEN ts END)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
           AS next_p
  FROM events
  WHERE user_id IS NOT NULL AND ts IS NOT NULL AND event_type IS NOT NULL
), d AS (
  SELECT CAST((EPOCH_US(next_p) - EPOCH_US(ts)) // 1000000 AS BIGINT)
           AS d_s
  FROM s WHERE event_type = 'click' AND next_p IS NOT NULL
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_conversions,
       CAST(quantile_disc(d_s, 0.5) AS BIGINT) AS p50_s,
       CAST(quantile_disc(d_s, 0.9) AS BIGINT) AS p90_s,
       CAST(quantile_disc(d_s, 0.99) AS BIGINT) AS p99_s
FROM d
"""


# ---------------------------------------------------------------------------
# Gini coefficient of user activity per event type
# ---------------------------------------------------------------------------


def q_user_activity_gini(sf_dir):
    """Per event type, the Gini coefficient of how unevenly its events
    are spread across users — emitted as the exact integer pair
    (gini_num, gini_den) with G = gini_num / gini_den, where
    gini_num = 2*sum(i*x_i) - (n+1)*sum(x) over the per-user counts x_i
    sorted ascending (tie order is irrelevant: tied values contribute
    x * sum(ranks) either way). One user hash-bucket shuffle produces
    exact per-user counts; the count-of-counts histogram (bounded by
    distinct activity levels) yields sum(i*x_i) in closed form:
    sum_v v * (c_v*cum_before + c_v*(c_v+1)/2)."""
    from mimirsbrunn_ray.stages.dedup import _BUCKET, add_bucket

    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "event_type"]
    )

    def project(b: pa.Table) -> pa.Table:
        b = b.filter(
            pc.and_(pc.is_valid(b["user_id"]), pc.is_valid(b["event_type"]))
        )
        return add_bucket(b, "user_id", 64)

    proj = ev.map_batches(project, batch_format="pyarrow", batch_size=None)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "event_type": pd.Series([], dtype=object),
                "x": pd.Series([], dtype=np.int64),
                "c": pd.Series([], dtype=np.int64),
            }
        )
        if len(g) == 0:
            return empty
        uc = g.groupby(["event_type", "user_id"], sort=False).size()
        hist = (
            uc.groupby([uc.index.get_level_values(0), uc.values])
            .size()
            .reset_index()
        )
        hist.columns = ["event_type", "x", "c"]
        hist["x"] = hist["x"].astype(np.int64)
        hist["c"] = hist["c"].astype(np.int64)
        return hist

    partials = proj.groupby(_BUCKET).map_groups(
        per_bucket, batch_format="pandas"
    )

    def combine(b: pa.Table) -> pa.Table:
        g = b.group_by(["event_type", "x"]).aggregate([("c", "sum")])
        return g.rename_columns(["event_type", "x", "c"])

    hist = tree_merge(partials, combine).to_pandas()
    # bounded: types x distinct activity levels

    rows = {"event_type": [], "n_users": [], "gini_num": [],
            "gini_den": []}
    if len(hist):
        for et, g in hist.groupby("event_type", sort=True):
            g = g.sort_values("x")
            x = g["x"].to_numpy(dtype=np.int64)
            c = g["c"].to_numpy(dtype=np.int64)
            cum_before = np.concatenate(([0], np.cumsum(c)[:-1]))
            n = int(c.sum())
            s_x = int(np.dot(c, x))
            s_ix = int(np.dot(x, c * cum_before + c * (c + 1) // 2))
            rows["event_type"].append(et)
            rows["n_users"].append(n)
            rows["gini_num"].append(2 * s_ix - (n + 1) * s_x)
            rows["gini_den"].append(n * s_x)
    return pa.table(
        {
            "event_type": pa.array(rows["event_type"], pa.string()),
            "n_users": pa.array(rows["n_users"], pa.int64()),
            "gini_num": pa.array(rows["gini_num"], pa.int64()),
            "gini_den": pa.array(rows["gini_den"], pa.int64()),
        }
    )


GINI_ACTIVITY_SQL = """
WITH uc AS (
  SELECT event_type, user_id, CAST(COUNT(*) AS BIGINT) AS x
  FROM events
  WHERE user_id IS NOT NULL AND event_type IS NOT NULL
  GROUP BY 1, 2
), r AS (
  SELECT event_type, x,
         CAST(ROW_NUMBER()
              OVER (PARTITION BY event_type ORDER BY x, user_id)
              AS BIGINT) AS i
  FROM uc
)
SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_users,
       CAST(2 * SUM(i * x) - (COUNT(*) + 1) * SUM(x) AS BIGINT)
         AS gini_num,
       CAST(COUNT(*) * SUM(x) AS BIGINT) AS gini_den
FROM r GROUP BY 1
"""


def register_r4af(queries: dict, oracles: dict) -> None:
    queries.update(
        {
            "geomean_value_per_type": q_geomean_value_per_type,
            "conversion_delay_quantiles": q_conversion_delay_quantiles,
            "user_activity_gini": q_user_activity_gini,
        }
    )
    oracles.update(
        {
            "geomean_value_per_type": GEOMEAN_SQL,
            "conversion_delay_quantiles": CONV_DELAY_SQL,
            "user_activity_gini": GINI_ACTIVITY_SQL,
        }
    )
