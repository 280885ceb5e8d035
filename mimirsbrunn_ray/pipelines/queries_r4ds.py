"""Round-4 batch DS: the discrete session-length hazard curve, the
inspection-paradox (length-biased waiting) factor of interarrivals,
and the birthday-bound hash-collision risk model per table.

Exactness discipline: session sizes come from exact gap counting inside
user buckets; the hazard ratio divides two exact integers per length;
the inspection factor folds exact (sum d, sum d², n) at seconds grain;
collision risk is one mirrored double over exact integer pair counts.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from mimirsbrunn_ray.stages.dedup import _BUCKET, add_bucket
from mimirsbrunn_ray.stages.rollup import tree_merge
from mimirsbrunn_ray.stages.timeseries import _series_segments

_SESSION_GAP_US = 30 * 60_000_000
_HAZARD_MAX_K = 20


def _round_half_away(x: np.ndarray) -> np.ndarray:
    return np.where(x >= 0, np.floor(x + 0.5), np.ceil(x - 0.5)).astype(
        np.int64
    )


def _sum_by(t: pa.Table, keys: list[str], vals: list[str]) -> pa.Table:
    g = t.group_by(keys).aggregate([(v, "sum") for v in vals])
    g = g.select(keys + [f"{v}_sum" for v in vals])
    return g.rename_columns(keys + vals)


def _clean(b: pa.Table, cols) -> pa.Table:
    m = None
    for c in cols:
        v = pc.is_valid(b[c])
        m = v if m is None else pc.and_(m, v)
    return b.filter(m)


# ---------------------------------------------------------------------------
# discrete hazard curve over session lengths
# ---------------------------------------------------------------------------


def q_session_hazard_curve(sf_dir):
    """For session lengths k = 1..20 (30-minute-gap sessions): the
    discrete hazard h_k = P(session ends at its k-th event | it reached
    k) = (sessions of length exactly k) / (sessions of length >= k) —
    the survival view of engagement (a hazard spike at k = 3 says the
    third event is where users bail; the raw size histogram hides
    this). Session sizes fold exactly inside user buckets (one ordered
    pass, gap > 30 min splits); the at-risk denominators are suffix
    sums of exact counts; one mirrored ratio per k, x1e6 snap."""
    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts", "event_id"]
    )

    def prep(b: pa.Table) -> pa.Table:
        b = _clean(b, ("user_id", "ts", "event_id"))
        t = pa.table(
            {
                "user_id": b["user_id"].cast(pa.int64()),
                "ts": b["ts"].cast(pa.timestamp("us")),
                "event_id": b["event_id"].cast(pa.int64()),
            }
        )
        return add_bucket(t, "user_id", 64)

    bucketed = ev.map_batches(prep, batch_format="pyarrow", batch_size=None)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "k": pd.Series([], dtype=np.int64),
                "n_sessions": pd.Series([], dtype=np.int64),
            }
        )
        if len(g) == 0:
            return empty
        g, same = _series_segments(g, "user_id", "ts", "event_id")
        ts_us = g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        dt = np.zeros(len(g), dtype=np.int64)
        dt[1:] = ts_us[1:] - ts_us[:-1]
        new_session = (~same) | (dt > _SESSION_GAP_US)
        sid = np.cumsum(new_session)
        sizes = pd.Series(sid).value_counts().to_numpy()
        hist = pd.Series(sizes).value_counts().rename("n_sessions")
        out = hist.reset_index()
        out.columns = ["k", "n_sessions"]
        return out.astype({"k": np.int64, "n_sessions": np.int64})

    hist = tree_merge(
        bucketed.groupby(_BUCKET).map_groups(per_bucket, batch_format="pandas"),
        lambda b: _sum_by(b, ["k"], ["n_sessions"]),
    ).to_pandas()
    if not len(hist) or "k" not in hist.columns:
        return pa.table(
            {
                "k": pa.array([], pa.int64()),
                "ended_at_k": pa.array([], pa.int64()),
                "at_risk": pa.array([], pa.int64()),
                "hazard_x1e6": pa.array([], pa.int64()),
            }
        )
    hist = hist.sort_values("k", ignore_index=True)
    ks = hist["k"].to_numpy(dtype=np.int64)
    cs = hist["n_sessions"].to_numpy(dtype=np.int64)
    out = {"k": [], "ended_at_k": [], "at_risk": [], "hazard_x1e6": []}
    for k in range(1, _HAZARD_MAX_K + 1):
        ended = int(cs[ks == k].sum())
        at_risk = int(cs[ks >= k].sum())
        out["k"].append(k)
        out["ended_at_k"].append(ended)
        out["at_risk"].append(at_risk)
        out["hazard_x1e6"].append(
            None
            if at_risk == 0
            else int(
                _round_half_away(
                    np.array([float(ended) / at_risk * 1e6])
                )[0]
            )
        )
    return pa.table(
        {
            "k": pa.array(out["k"], pa.int64()),
            "ended_at_k": pa.array(out["ended_at_k"], pa.int64()),
            "at_risk": pa.array(out["at_risk"], pa.int64()),
            "hazard_x1e6": pa.array(out["hazard_x1e6"], pa.int64()),
        }
    )


SESSION_HAZARD_SQL = f"""
WITH g AS MATERIALIZED (
  SELECT user_id, ts, event_id,
         CASE WHEN EPOCH_US(ts) - LAG(EPOCH_US(ts)) OVER w
                   > {_SESSION_GAP_US} OR LAG(ts) OVER w IS NULL
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WHERE user_id IS NOT NULL AND ts IS NOT NULL AND event_id IS NOT NULL
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), sid AS MATERIALIZED (
  SELECT user_id,
         SUM(new_session) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS sid
  FROM g
), sizes AS MATERIALIZED (
  SELECT user_id, sid, CAST(COUNT(*) AS BIGINT) AS size
  FROM sid GROUP BY 1, 2
), hist AS MATERIALIZED (
  SELECT size AS k, CAST(COUNT(*) AS BIGINT) AS n_sessions
  FROM sizes GROUP BY 1
), ks AS (SELECT unnest(range(1, {_HAZARD_MAX_K} + 1)) AS k)
SELECT CAST(ks.k AS BIGINT) AS k,
       CAST(COALESCE((SELECT SUM(n_sessions) FROM hist
                      WHERE hist.k = ks.k), 0) AS BIGINT) AS ended_at_k,
       CAST(COALESCE((SELECT SUM(n_sessions) FROM hist
                      WHERE hist.k >= ks.k), 0) AS BIGINT) AS at_risk,
       CASE WHEN COALESCE((SELECT SUM(n_sessions) FROM hist
                           WHERE hist.k >= ks.k), 0) = 0 THEN NULL
            ELSE CAST(ROUND(
              CAST(COALESCE((SELECT SUM(n_sessions) FROM hist
                             WHERE hist.k = ks.k), 0) AS DOUBLE)
              / (SELECT SUM(n_sessions) FROM hist WHERE hist.k >= ks.k)
              * 1000000, 0) AS BIGINT) END AS hazard_x1e6
FROM ks ORDER BY 1
"""


# ---------------------------------------------------------------------------
# inspection-paradox factor of interarrival times
# ---------------------------------------------------------------------------


def q_inspection_paradox_factor(sf_dir):
    """Per event type: the inspection-paradox factor — the mean gap a
    RANDOM TIME PROBE lands in, E[X²]/E[X], over the plain mean gap
    E[X]: factor = (sum d² / sum d) / (sum d / n) = n sum d² / (sum d)²
    — the length-biased sampling correction (factor 2 for exponential
    gaps; anything higher means probes land in the long-tail gaps far
    more often than naive math expects — the "why does my sampler only
    see quiet periods" bug). Seconds-grain gap moments fold exact
    int64; one mirrored expression per type, x1e6 snap."""
    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_type", "ts", "event_id", "value"],
    )
    from mimirsbrunn_ray.stages.timeseries import _project_series

    proj = _project_series(ev, "event_type", "ts", "event_id", "value", 64)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "event_type": pd.Series([], dtype=object),
                "n": pd.Series([], dtype=np.int64),
                "s1": pd.Series([], dtype=np.int64),
                "s2": pd.Series([], dtype=np.int64),
            }
        )
        if len(g) == 0:
            return empty
        g, same = _series_segments(g, "event_type", "ts", "event_id")
        t_s = (
            g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
            // 1_000_000
        )
        dt = np.zeros(len(g), dtype=np.int64)
        dt[1:] = t_s[1:] - t_s[:-1]
        d = pd.DataFrame(
            {"event_type": g["event_type"].to_numpy()[same], "dt": dt[same]}
        )
        if not len(d):
            return empty
        a = d.groupby("event_type", sort=False)["dt"].agg(n="size", s1="sum")
        a["s2"] = d.assign(q=d["dt"] * d["dt"]).groupby(
            "event_type", sort=False
        )["q"].sum()
        return a.reset_index().astype(
            {"n": np.int64, "s1": np.int64, "s2": np.int64}
        )

    stats = tree_merge(
        proj.groupby(_BUCKET).map_groups(per_bucket, batch_format="pandas"),
        lambda b: _sum_by(b, ["event_type"], ["n", "s1", "s2"]),
    ).to_pandas()
    if not len(stats) or "event_type" not in stats.columns:
        return pa.table(
            {
                "event_type": pa.array([], pa.string()),
                "n_gaps": pa.array([], pa.int64()),
                "factor_x1e6": pa.array([], pa.int64()),
            }
        )
    stats = stats.sort_values("event_type", ignore_index=True)
    vals = []
    for i in range(len(stats)):
        n = int(stats["n"].iloc[i])
        s1 = int(stats["s1"].iloc[i])
        s2 = int(stats["s2"].iloc[i])
        vals.append(
            None
            if s1 == 0
            else int(
                _round_half_away(
                    np.array(
                        [
                            float(n)
                            * s2
                            / (float(s1) * s1)
                            * 1e6
                        ]
                    )
                )[0]
            )
        )
    return pa.table(
        {
            "event_type": pa.array(stats["event_type"].tolist(), pa.string()),
            "n_gaps": pa.array(stats["n"].to_numpy(dtype=np.int64)),
            "factor_x1e6": pa.array(vals, pa.int64()),
        }
    )


INSPECTION_SQL = """
WITH v AS (
  SELECT event_type, ts, event_id,
         CAST(FLOOR(EPOCH_US(ts) / 1000000) AS BIGINT) AS t_s
  FROM events
  WHERE event_type IS NOT NULL AND ts IS NOT NULL AND value IS NOT NULL
), g AS (
  SELECT event_type,
         t_s - LAG(t_s) OVER (PARTITION BY event_type
                              ORDER BY ts, event_id) AS dt
  FROM v
), a AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(dt) AS BIGINT) AS s1,
         CAST(SUM(dt * dt) AS BIGINT) AS s2
  FROM g WHERE dt IS NOT NULL GROUP BY 1
)
SELECT event_type, n AS n_gaps,
       CASE WHEN s1 = 0 THEN NULL
            ELSE CAST(ROUND(CAST(n AS DOUBLE) * s2
                            / (CAST(s1 AS DOUBLE) * s1) * 1000000, 0)
                 AS BIGINT) END AS factor_x1e6
FROM a ORDER BY 1
"""


# ---------------------------------------------------------------------------
# birthday-bound hash-collision risk per table
# ---------------------------------------------------------------------------

_HASH_BITS = 64.0


def q_hash_collision_risk(sf_dir):
    """Per table: the birthday-bound expected number of 64-bit
    content-hash collisions at the table's exact row count —
    E[collisions] ~ n (n - 1) / 2 / 2^64 — the risk budget for every
    hash-keyed dedup/claim stage in the engine (the audit says exactly
    when 64 bits stops being enough and the claim key needs 128).
    Row counts are exact int64; the expectation is one mirrored double
    per table, x1e18 snap (the numbers are tiny by design)."""
    rows = {"tbl": [], "n_rows": [], "exp_collisions_x1e18": []}
    for tbl in [
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ]:
        n = rd.read_parquet(f"{sf_dir}/{tbl}.parquet").count()
        exp = float(n) * (n - 1) / 2.0 / (2.0 ** _HASH_BITS)
        rows["tbl"].append(tbl)
        rows["n_rows"].append(n)
        rows["exp_collisions_x1e18"].append(
            int(_round_half_away(np.array([exp * 1e18]))[0])
        )
    return pa.table(
        {
            "tbl": pa.array(rows["tbl"], pa.string()),
            "n_rows": pa.array(rows["n_rows"], pa.int64()),
            "exp_collisions_x1e18": pa.array(
                rows["exp_collisions_x1e18"], pa.int64()
            ),
        }
    )


_COLLISION_SQL_ONE = """
SELECT '{tbl}' AS tbl, CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(ROUND(CAST(COUNT(*) AS DOUBLE) * (COUNT(*) - 1) / 2.0
                  / POWER(2.0, 64.0) * 1e18, 0) AS BIGINT)
         AS exp_collisions_x1e18
FROM {tbl}
"""

COLLISION_SQL = "\nUNION ALL\n".join(
    _COLLISION_SQL_ONE.format(tbl=t)
    for t in [
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ]
) + "\nORDER BY 1"


def register_r4ds(queries: dict, oracles: dict) -> None:
    queries.update(
        {
            "session_hazard_curve": q_session_hazard_curve,
            "inspection_paradox_factor": q_inspection_paradox_factor,
            "hash_collision_risk": q_hash_collision_risk,
        }
    )
    oracles.update(
        {
            "session_hazard_curve": SESSION_HAZARD_SQL,
            "inspection_paradox_factor": INSPECTION_SQL,
            "hash_collision_risk": COLLISION_SQL,
        }
    )
