"""Round-4 batch AL: the full cohort-retention triangle, trailing
30-day MAU / stickiness, and a round-number value-bias audit.

Exactness discipline: retention cells and MAU are exact distinct
counts over integer (user, day) pairs; stickiness ships as the
(dau, mau) integer pair; round-number bias is pure modular arithmetic
on cents.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from mimirsbrunn_ray.stages.rollup import tree_merge

_DAY_US = 86_400_000_000
_MAU_WINDOW = 30


def _round_half_away(x: np.ndarray) -> np.ndarray:
    return np.where(
        x >= 0, np.floor(x + 0.5), np.ceil(x - 0.5)
    ).astype(np.int64)


def _user_day_pairs(sf_dir):
    """Distinct (user, epoch-day) activity pairs + each user's cohort
    (first active day), computed in ONE user hash-bucket shuffle —
    the shared front half of the retention triangle and the MAU curve."""
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
        g = t.group_by(["user_id", "day"]).aggregate([([], "count_all")])
        g = g.select(["user_id", "day"])
        return add_bucket(g, "user_id", 64)

    proj = ev.map_batches(project, batch_format="pyarrow", batch_size=None)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "user_id": pd.Series([], dtype=np.int64),
                "day": pd.Series([], dtype=np.int64),
                "cohort": pd.Series([], dtype=np.int64),
            }
        )
        if len(g) == 0:
            return empty
        g = g.drop_duplicates(["user_id", "day"])
        cohort = g.groupby("user_id")["day"].transform("min")
        return pd.DataFrame(
            {
                "user_id": g["user_id"].to_numpy(dtype=np.int64),
                "day": g["day"].to_numpy(dtype=np.int64),
                "cohort": cohort.to_numpy(dtype=np.int64),
            }
        )

    from mimirsbrunn_ray.stages.dedup import _BUCKET

    return proj.groupby(_BUCKET).map_groups(
        per_bucket, batch_format="pandas"
    )


# ---------------------------------------------------------------------------
# full cohort-retention triangle
# ---------------------------------------------------------------------------


def q_cohort_retention_triangle(sf_dir):
    """The full (cohort day, age) retention triangle: for every cohort
    (users whose FIRST active day is d) and every age a >= 0, how many
    of them were active on day d + a — the complete matrix behind the
    D1/D7 summary. One user hash-bucket shuffle derives distinct
    (user, day, cohort) rows; the (cohort, age) counts are decomposable
    partials over a days^2-bounded grid."""
    pairs = _user_day_pairs(sf_dir)

    def partial(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "cohort" not in b.column_names:
            return pa.table(
                {
                    "cohort": pa.array([], pa.int64()),
                    "age": pa.array([], pa.int64()),
                    "n_active": pa.array([], pa.int64()),
                }
            )
        day = b["day"].to_numpy(zero_copy_only=False)
        coh = b["cohort"].to_numpy(zero_copy_only=False)
        t = pa.table(
            {"cohort": pa.array(coh), "age": pa.array(day - coh)}
        )
        g = t.group_by(["cohort", "age"]).aggregate([([], "count_all")])
        g = g.select(["cohort", "age", "count_all"])
        return g.rename_columns(["cohort", "age", "n_active"])

    def combine(b: pa.Table) -> pa.Table:
        g = b.group_by(["cohort", "age"]).aggregate([("n_active", "sum")])
        return g.rename_columns(["cohort", "age", "n_active"])

    return tree_merge(
        pairs.map_batches(partial, batch_format="pyarrow",
                          batch_size=None),
        combine,
    )


TRIANGLE_SQL = """
WITH pairs AS MATERIALIZED (
  SELECT DISTINCT user_id,
         CAST(FLOOR(epoch(ts) / 86400) AS BIGINT) AS day
  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
), c AS (
  SELECT user_id, MIN(day) AS cohort FROM pairs GROUP BY 1
)
SELECT c.cohort, CAST(p.day - c.cohort AS BIGINT) AS age,
       CAST(COUNT(*) AS BIGINT) AS n_active
FROM pairs p JOIN c USING (user_id)
GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# trailing 30-day MAU + stickiness per day
# ---------------------------------------------------------------------------


def q_trailing_mau_daily(sf_dir):
    """Per day: DAU and the trailing `_MAU_WINDOW`-day MAU (distinct
    users active in [day-29, day]) — the (dau, mau) integer pair behind
    the stickiness ratio. Sliding COUNT DISTINCT at day grain: each
    distinct (user, day) pair fans out to its <= 30 covered target days
    and is deduped per (user, target) in one more key shuffle — the
    window is a constant, so the blow-up is bounded x30 of the distinct
    pairs, never of raw rows."""
    pairs = _user_day_pairs(sf_dir)

    def fanout(b: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "user_id": pa.array([], pa.int64()),
                "target": pa.array([], pa.int64()),
            }
        )
        if b.num_rows == 0 or "day" not in b.column_names:
            return empty
        day = b["day"].to_numpy(zero_copy_only=False)
        uid = b["user_id"].to_numpy(zero_copy_only=False)
        offs = np.arange(_MAU_WINDOW, dtype=np.int64)
        tgt = (day[:, None] + offs[None, :]).ravel()
        u = np.repeat(uid, _MAU_WINDOW)
        t = pa.table({"user_id": pa.array(u), "target": pa.array(tgt)})
        # batch-local dedup combiner before the shuffle
        g = t.group_by(["user_id", "target"]).aggregate(
            [([], "count_all")]
        )
        return g.select(["user_id", "target"])

    fanned = pairs.map_batches(fanout, batch_format="pyarrow",
                               batch_size=None)

    def dedup_pairs(b: pa.Table) -> pa.Table:
        # schema-stable associative combine: distinct (user, target)
        g = b.group_by(["user_id", "target"]).aggregate(
            [([], "count_all")]
        )
        return g.select(["user_id", "target"])

    # ONE key shuffle: shard by (user, target) and dedup per key-disjoint
    # shard; a target day can span shards (different users), so the
    # per-target counts below are partials summed in a bounded merge
    dedup = tree_merge(
        fanned,
        dedup_pairs,
        final_shards=8,
        shard_cols=["user_id", "target"],
    )

    def count_per_target(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "target" not in b.column_names:
            return pa.table(
                {"day": pa.array([], pa.int64()),
                 "mau": pa.array([], pa.int64())}
            )
        t = b.group_by(["target"]).aggregate([([], "count_all")])
        t = t.select(["target", "count_all"])
        return t.rename_columns(["day", "mau"])

    def mau_merge(b: pa.Table) -> pa.Table:
        g = b.group_by(["day"]).aggregate([("mau", "sum")])
        return g.rename_columns(["day", "mau"])

    mau_pd = tree_merge(
        dedup.map_batches(count_per_target, batch_format="pyarrow",
                          batch_size=None),
        mau_merge,
    ).to_pandas()

    def dau_partial(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "day" not in b.column_names:
            return pa.table(
                {"day": pa.array([], pa.int64()),
                 "dau": pa.array([], pa.int64())}
            )
        g = b.group_by(["day"]).aggregate([([], "count_all")])
        g = g.select(["day", "count_all"])
        return g.rename_columns(["day", "dau"])

    def dau_combine(b: pa.Table) -> pa.Table:
        g = b.group_by(["day"]).aggregate([("dau", "sum")])
        return g.rename_columns(["day", "dau"])

    dau_pd = tree_merge(
        pairs.map_batches(dau_partial, batch_format="pyarrow",
                          batch_size=None),
        dau_combine,
    ).to_pandas()

    if not len(dau_pd):
        return pa.table(
            {
                "day": pa.array([], pa.int64()),
                "dau": pa.array([], pa.int64()),
                "mau": pa.array([], pa.int64()),
            }
        )
    # MAU targets past the observed span are artifacts of the fan-out;
    # report only observed days (the SQL twin's day list)
    out = dau_pd.merge(mau_pd, on="day", how="left").sort_values(
        "day", ignore_index=True
    )
    return pa.table(
        {
            "day": pa.array(out["day"].to_numpy(dtype=np.int64)),
            "dau": pa.array(out["dau"].to_numpy(dtype=np.int64)),
            "mau": pa.array(out["mau"].to_numpy(dtype=np.int64)),
        }
    )


MAU_SQL = f"""
WITH pairs AS MATERIALIZED (
  SELECT DISTINCT user_id,
         CAST(FLOOR(epoch(ts) / 86400) AS BIGINT) AS day
  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
), days AS (
  SELECT DISTINCT day FROM pairs
)
SELECT d.day,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM pairs p
        WHERE p.day = d.day) AS dau,
       (SELECT CAST(COUNT(DISTINCT p.user_id) AS BIGINT) FROM pairs p
        WHERE p.day BETWEEN d.day - {_MAU_WINDOW - 1} AND d.day) AS mau
FROM days d
"""


# ---------------------------------------------------------------------------
# round-number bias audit
# ---------------------------------------------------------------------------


def q_round_number_bias(sf_dir):
    """Per event type: how many values land exactly on whole dollars
    and whole ten-dollar marks (cents % 100 == 0, % 1000 == 0) — the
    round-number bias audit that flags human-entered or synthetic
    values (organic measurements rarely favor round points). Pure
    modular arithmetic on cents; one decomposable pass."""
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
        t = pa.table(
            {
                "event_type": b["event_type"],
                "dollar": pa.array((x % 100 == 0).astype(np.int64)),
                "ten": pa.array((x % 1000 == 0).astype(np.int64)),
            }
        )
        g = t.group_by(["event_type"]).aggregate(
            [([], "count_all"), ("dollar", "sum"), ("ten", "sum")]
        )
        g = g.select(["event_type", "count_all", "dollar_sum", "ten_sum"])
        return g.rename_columns(
            ["event_type", "n", "n_whole_dollar", "n_whole_ten"]
        )

    def combine(b: pa.Table) -> pa.Table:
        g = b.group_by(["event_type"]).aggregate(
            [("n", "sum"), ("n_whole_dollar", "sum"),
             ("n_whole_ten", "sum")]
        )
        return g.rename_columns(
            ["event_type", "n", "n_whole_dollar", "n_whole_ten"]
        )

    return tree_merge(
        ev.map_batches(partial, batch_format="pyarrow", batch_size=None),
        combine,
    )


ROUND_BIAS_SQL = """
WITH v AS (
  SELECT event_type, CAST(ROUND(value * 100, 0) AS BIGINT) AS x
  FROM events
  WHERE event_type IS NOT NULL AND value IS NOT NULL
)
SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CASE WHEN x % 100 = 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_whole_dollar,
       CAST(SUM(CASE WHEN x % 1000 = 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_whole_ten
FROM v GROUP BY 1
"""


def register_r4al(queries: dict, oracles: dict) -> None:
    queries.update(
        {
            "cohort_retention_triangle": q_cohort_retention_triangle,
            "trailing_mau_daily": q_trailing_mau_daily,
            "round_number_bias": q_round_number_bias,
        }
    )
    oracles.update(
        {
            "cohort_retention_triangle": TRIANGLE_SQL,
            "trailing_mau_daily": MAU_SQL,
            "round_number_bias": ROUND_BIAS_SQL,
        }
    )
