"""Round-4 batch DE: Jain's fairness index over per-user load,
retractable-aggregate audit (tier minus one day computed by algebraic
subtraction), and the idempotent re-ingest audit (double-read + exact
dedup reproduces the corpus).

The last two are ENGINE-property demonstrations: retraction proves the
tier chain's sufficient statistics form a group (deletes can be applied
as negative partials instead of recomputing the tier), and the
re-ingest audit proves the exactly-once property the publish/claim path
relies on. Exactness: pure int64 counts and sums everywhere; Jain's
index performs the single mirrored double division, x1e6 snap.
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
_DAY_US = 86_400_000_000
_RETRACT_DAY = "2024-01-15"  # the day subtracted out by retraction


def _round_half_away(x: np.ndarray) -> np.ndarray:
    return np.where(x >= 0, np.floor(x + 0.5), np.ceil(x - 0.5)).astype(
        np.int64
    )


def _round_half_away_x(x: np.ndarray, scale: float) -> np.ndarray:
    y = x * scale
    return np.where(y >= 0, np.floor(y + 0.5), np.ceil(y - 0.5)).astype(
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
# Jain's fairness index over per-user event counts
# ---------------------------------------------------------------------------


def q_jains_fairness_users(sf_dir):
    """One-row load-balance statistic: Jain's fairness index J =
    (sum x)² / (n * sum x²) over per-user event counts — the networking
    standard for "how evenly is load spread" (J = 1 perfectly fair, 1/n
    = one user is everything); the skew signal that decides whether
    user-keyed partitions need salting. Per-user totals are complete
    inside their hash bucket; (n, sum, sum of squares) fold exact
    int64; J is one mirrored double division, x1e6 snap."""
    ev = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id"])

    def prep(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_valid(b["user_id"]))
        t = pa.table(
            {
                "user_id": b["user_id"].cast(pa.int64()),
                "c": pa.array(np.ones(b.num_rows, np.int64)),
            }
        )
        return add_bucket(_sum_by(t, ["user_id"], ["c"]), "user_id", 64)

    bucketed = ev.map_batches(prep, batch_format="pyarrow", batch_size=None)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "n": pd.Series([], dtype=np.int64),
                "s1": pd.Series([], dtype=np.int64),
                "s2": pd.Series([], dtype=np.int64),
            }
        )
        if len(g) == 0:
            return empty
        per = g.groupby("user_id", sort=False)["c"].sum().to_numpy(
            dtype=np.int64
        )
        return pd.DataFrame(
            {
                "n": [len(per)],
                "s1": [int(per.sum())],
                "s2": [int((per * per).sum())],
            }
        )

    parts = bucketed.groupby(_BUCKET).map_groups(
        per_bucket, batch_format="pandas"
    ).to_pandas()
    if not len(parts) or "n" not in parts.columns:
        return pa.table(
            {
                "n_users": pa.array([0], pa.int64()),
                "j_x1e6": pa.array([None], pa.int64()),
            }
        )
    n = int(parts["n"].sum())
    s1 = int(parts["s1"].sum())
    s2 = int(parts["s2"].sum())
    j = (
        None
        if n == 0 or s2 == 0
        else int(
            _round_half_away(
                np.array([float(s1) * s1 / (float(n) * s2) * 1e6])
            )[0]
        )
    )
    return pa.table(
        {
            "n_users": pa.array([n], pa.int64()),
            "j_x1e6": pa.array([j], pa.int64()),
        }
    )


JAIN_SQL = """
WITH per AS MATERIALIZED (
  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS c
  FROM events WHERE user_id IS NOT NULL GROUP BY 1
), a AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(c) AS BIGINT) AS s1,
         CAST(SUM(c * c) AS BIGINT) AS s2
  FROM per
)
SELECT n AS n_users,
       CASE WHEN n = 0 OR s2 = 0 THEN NULL
            ELSE CAST(ROUND(CAST(s1 AS DOUBLE) * s1
                            / (CAST(n AS DOUBLE) * s2) * 1000000, 0)
                 AS BIGINT) END AS j_x1e6
FROM a
"""


# ---------------------------------------------------------------------------
# retractable rollup: tier minus one day via algebraic subtraction
# ---------------------------------------------------------------------------


def q_retractable_rollup_audit(sf_dir):
    """Per (event type, hour-of-day): the hourly rollup with one
    calendar day RETRACTED — computed the ENGINE way: the full-corpus
    sufficient statistics MINUS the retracted day's partials (counts
    and x100 sums form a group under addition, so a delete is a
    negative partial — no tier recompute). The oracle computes the same
    rollup directly with the day filtered out, proving the retraction
    is bit-exact. This is the algebraic property that makes GDPR-style
    deletes O(delta), not O(corpus), in the tier chain."""
    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "ts", "value"]
    )
    day_lo = np.int64(
        pd.Timestamp(_RETRACT_DAY).value // 1000
    )
    day_hi = day_lo + _DAY_US

    def partial(b: pa.Table) -> pa.Table:
        b = _clean(b, ("event_type", "ts", "value"))
        us = b["ts"].cast(pa.timestamp("us")).cast(pa.int64()).to_numpy()
        h = ((us // _HOUR_US) % 24).astype(np.int64)
        x = _round_half_away_x(
            b["value"].to_numpy(zero_copy_only=False).astype(np.float64), 100.0
        )
        in_day = ((us >= day_lo) & (us < day_hi)).astype(np.int64)
        # full partials and the retraction day's partials fold SIDE BY
        # SIDE in one pass; the subtraction below is the group inverse
        t = pa.table(
            {
                "event_type": b["event_type"],
                "h": pa.array(h),
                "n_full": pa.array(np.ones(len(h), np.int64)),
                "s_full": pa.array(x),
                "n_day": pa.array(in_day),
                "s_day": pa.array(x * in_day),
            }
        )
        return _sum_by(t, ["event_type", "h"],
                       ["n_full", "s_full", "n_day", "s_day"])

    out = tree_merge(
        ev.map_batches(partial, batch_format="pyarrow", batch_size=None),
        lambda b: _sum_by(
            b, ["event_type", "h"], ["n_full", "s_full", "n_day", "s_day"]
        ),
    ).to_pandas()
    if len(out) and "n_full" in out.columns:
        # the retraction: tier statistics minus the deleted day's partials
        out["n"] = out["n_full"] - out["n_day"]
        out["s"] = out["s_full"] - out["s_day"]
    if not len(out) or "event_type" not in out.columns:
        return pa.table(
            {
                "event_type": pa.array([], pa.string()),
                "h": pa.array([], pa.int64()),
                "n": pa.array([], pa.int64()),
                "sum_e2": pa.array([], pa.int64()),
            }
        )
    out = out[out["n"] > 0].sort_values(
        ["event_type", "h"], ignore_index=True
    )
    return pa.table(
        {
            "event_type": pa.array(out["event_type"].tolist(), pa.string()),
            "h": pa.array(out["h"].to_numpy(dtype=np.int64)),
            "n": pa.array(out["n"].to_numpy(dtype=np.int64)),
            "sum_e2": pa.array(out["s"].to_numpy(dtype=np.int64)),
        }
    )


RETRACT_SQL = f"""
SELECT event_type, CAST(hour(ts) AS BIGINT) AS h,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT) AS sum_e2
FROM events
WHERE event_type IS NOT NULL AND ts IS NOT NULL AND value IS NOT NULL
  AND NOT (ts >= TIMESTAMP '{_RETRACT_DAY}'
           AND ts < TIMESTAMP '{_RETRACT_DAY}' + INTERVAL 1 DAY)
GROUP BY 1, 2
HAVING COUNT(*) > 0
ORDER BY 1, 2
"""


# ---------------------------------------------------------------------------
# idempotent re-ingest: double-read + exact dedup == single read
# ---------------------------------------------------------------------------


def q_reingest_dedup_audit(sf_dir):
    """Per event type: counts after reading the events corpus TWICE
    (union of two scans — the at-least-once delivery a resumed ingest
    produces) and collapsing duplicates with the exact keep-min dedup
    keyed on event_id — proving the exactly-once property the tier
    chain's claim/publish path guarantees. The oracle is the plain
    single-scan count: equality means re-delivered batches can never
    inflate a tier. Dedup is the hash-bucketed D1 stage; counts exact
    int64."""
    a = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_id", "event_type"])
    b = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_id", "event_type"])
    doubled = a.union(b).map_batches(
        lambda t: add_bucket(
            t.filter(
                pc.and_(pc.is_valid(t["event_id"]), pc.is_valid(t["event_type"]))
            ),
            "event_id",
            64,
        ),
        batch_format="pyarrow",
        batch_size=None,
    )

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame(
                {
                    "event_type": pd.Series([], dtype=object),
                    "n": pd.Series([], dtype=np.int64),
                }
            )
        d = g.drop_duplicates(["event_id"])
        out = d.groupby("event_type", sort=False).size().rename("n").reset_index()
        return out.astype({"n": np.int64})

    counts = tree_merge(
        doubled.groupby(_BUCKET).map_groups(per_bucket, batch_format="pandas"),
        lambda t: _sum_by(t, ["event_type"], ["n"]),
    ).to_pandas()
    if not len(counts) or "event_type" not in counts.columns:
        return pa.table(
            {
                "event_type": pa.array([], pa.string()),
                "n": pa.array([], pa.int64()),
            }
        )
    counts = counts.sort_values("event_type", ignore_index=True)
    return pa.table(
        {
            "event_type": pa.array(counts["event_type"].tolist(), pa.string()),
            "n": pa.array(counts["n"].to_numpy(dtype=np.int64)),
        }
    )


REINGEST_SQL = """
SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n
FROM events
WHERE event_id IS NOT NULL AND event_type IS NOT NULL
GROUP BY 1 ORDER BY 1
"""


def register_r4de(queries: dict, oracles: dict) -> None:
    queries.update(
        {
            "jains_fairness_users": q_jains_fairness_users,
            "retractable_rollup_audit": q_retractable_rollup_audit,
            "reingest_dedup_audit": q_reingest_dedup_audit,
        }
    )
    oracles.update(
        {
            "jains_fairness_users": JAIN_SQL,
            "retractable_rollup_audit": RETRACT_SQL,
            "reingest_dedup_audit": REINGEST_SQL,
        }
    )
