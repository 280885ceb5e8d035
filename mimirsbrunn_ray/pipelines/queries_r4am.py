"""Round-4 batch AM: value-collision audit, a sink->source round-trip
made driver-visible, and a similarity-threshold sweep curve.

Exactness discipline: collision counts are exact distinct-user counts
per cents value; the round-trip re-reads exactly what the rollup wrote
(parquet preserves the integer/timestamp schema); the threshold curve
compares the identical IEEE double jaccard expression on both engines.
"""

from __future__ import annotations

import os
import shutil

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
# value collisions: cents values shared by >= 2 distinct users
# ---------------------------------------------------------------------------

_COLLISION_MIN_USERS = 2


def q_value_collision_groups(sf_dir):
    """Cents values observed from `_COLLISION_MIN_USERS`+ DISTINCT users
    — the value-fingerprint collision audit (shared exact amounts often
    mean scripted/duplicated traffic). Combiner-first distinct
    (value, user) partials, one key-hash sharded dedup, then a bounded
    per-value distinct-user count with a HAVING cut."""
    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "value"]
    )

    def partial(b: pa.Table) -> pa.Table:
        b = b.filter(
            pc.and_(pc.is_valid(b["user_id"]), pc.is_valid(b["value"]))
        )
        x = _round_half_away(
            b["value"].cast(pa.float64()).to_numpy(zero_copy_only=False)
            * 100.0
        )
        t = pa.table({"x": pa.array(x), "user_id": b["user_id"]})
        g = t.group_by(["x", "user_id"]).aggregate([([], "count_all")])
        g = g.select(["x", "user_id", "count_all"])
        return g.rename_columns(["x", "user_id", "n_events"])

    def dedup_combine(b: pa.Table) -> pa.Table:
        g = b.group_by(["x", "user_id"]).aggregate([("n_events", "sum")])
        return g.rename_columns(["x", "user_id", "n_events"])

    pairs = tree_merge(
        ev.map_batches(partial, batch_format="pyarrow", batch_size=None),
        dedup_combine,
        final_shards=8,
        shard_cols=["x"],  # shard by VALUE: per-value groups stay whole
    )

    def per_value(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "x" not in b.column_names:
            return pa.table(
                {
                    "value_x100": pa.array([], pa.int64()),
                    "n_users": pa.array([], pa.int64()),
                    "n_events": pa.array([], pa.int64()),
                }
            )
        g = b.group_by(["x"]).aggregate(
            [([], "count_all"), ("n_events", "sum")]
        )
        g = g.select(["x", "count_all", "n_events_sum"])
        g = g.rename_columns(["value_x100", "n_users", "n_events"])
        return g.filter(
            pc.greater_equal(g["n_users"], _COLLISION_MIN_USERS)
        )

    return pairs.map_batches(per_value, batch_format="pyarrow",
                             batch_size=None)


COLLISION_SQL = f"""
WITH p AS (
  SELECT CAST(ROUND(value * 100, 0) AS BIGINT) AS x, user_id,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM events
  WHERE user_id IS NOT NULL AND value IS NOT NULL
  GROUP BY 1, 2
)
SELECT x AS value_x100, CAST(COUNT(*) AS BIGINT) AS n_users,
       CAST(SUM(n) AS BIGINT) AS n_events
FROM p GROUP BY 1
HAVING COUNT(*) >= {_COLLISION_MIN_USERS}
"""


# ---------------------------------------------------------------------------
# sink -> source round-trip: publish the hourly rollup, re-read it
# ---------------------------------------------------------------------------


def q_publish_roundtrip_hourly(sf_dir):
    """W1/S9 through the driver gate: compute the hourly rollup, WRITE
    it as chunked parquet (the engine's sink), then RE-READ the files
    and return that — so the correctness compare covers the sink ->
    source round-trip (schema + values must survive serialization),
    not just the in-memory result. Scratch lives under /tmp keyed by
    the sf dir; each run rewrites it (the alias-swap overwrite rule)."""
    from mimirsbrunn_ray.pipelines.generic_tiering import generic_rollup

    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "ts", "value"]
    )
    rolled = generic_rollup(ev, "event_type", "ts", "value", "1h",
                            int_scale=100)
    tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    out_dir = f"/tmp/mimirsbrunn_roundtrip/{tag}"
    shutil.rmtree(out_dir, ignore_errors=True)
    os.makedirs(out_dir, exist_ok=True)
    rolled.write_parquet(out_dir)
    return rd.read_parquet(out_dir)


# the rollup twin (the same contract events_rollup_1h pins), re-read
ROUNDTRIP_SQL = """
SELECT event_type, date_trunc('hour', ts) AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(ROUND(SUM(value) * 100, 0) AS BIGINT) AS sum_val,
       CAST(ROUND(MIN(value) * 100, 0) AS BIGINT) AS min_val,
       CAST(ROUND(MAX(value) * 100, 0) AS BIGINT) AS max_val,
       CAST(ROUND(CAST(CAST(ROUND(SUM(value) * 100, 0) AS BIGINT)
                       AS DOUBLE) / COUNT(*), 0) AS BIGINT) AS mean_val
FROM events GROUP BY event_type, bucket
"""


# ---------------------------------------------------------------------------
# similarity-threshold sweep curve
# ---------------------------------------------------------------------------

_CURVE_TAUS = (0.5, 0.6, 0.7, 0.8, 0.9)


def q_jaccard_threshold_curve(sf_dir):
    """Pair count at each Jaccard threshold — the tuning curve a dedup
    operator reads before picking its cut (how many near-dup pairs does
    each threshold admit?). ONE exact n-gram Jaccard join at the lowest
    threshold; the curve is conditional counting over its bounded pair
    table, no recomputation per threshold."""
    from mimirsbrunn_ray.stages.simjoin import ngram_jaccard_join

    docs = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    pairs = ngram_jaccard_join(docs, threshold=min(_CURVE_TAUS), n=3)

    def count_partial(b: pa.Table) -> pa.Table:
        j = b["jaccard"].to_numpy(zero_copy_only=False)
        cols = {"tau_x10": [], "n_pairs": []}
        for tau in _CURVE_TAUS:
            cols["tau_x10"].append(int(round(tau * 10)))
            cols["n_pairs"].append(int((j >= tau).sum()))
        return pa.table(
            {
                "tau_x10": pa.array(cols["tau_x10"], pa.int64()),
                "n_pairs": pa.array(cols["n_pairs"], pa.int64()),
            }
        )

    def combine(b: pa.Table) -> pa.Table:
        g = b.group_by(["tau_x10"]).aggregate([("n_pairs", "sum")])
        return g.rename_columns(["tau_x10", "n_pairs"])

    return tree_merge(
        pairs.map_batches(count_partial, batch_format="pyarrow",
                          batch_size=None),
        combine,
    )


def _curve_sql(taus) -> str:
    tau_rows = ", ".join(f"({int(round(t * 10))}, {t})" for t in taus)
    return f"""
WITH toks AS (
  SELECT doc_id, string_split(lower(text), ' ') AS ws FROM documents
), grams AS (
  SELECT DISTINCT doc_id,
         unnest(list_transform(range(1, greatest(len(ws) - 1, 1)),
                i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) AS g
  FROM toks WHERE len(ws) >= 3
), sizes AS (
  SELECT doc_id, count(*) n FROM grams GROUP BY doc_id
), inter AS (
  SELECT a.doc_id da, b.doc_id db, count(*) i
  FROM grams a JOIN grams b ON a.g = b.g AND a.doc_id < b.doc_id
  GROUP BY 1, 2
), scored AS (
  SELECT i * 1.0 / (sa.n + sb.n - i) AS j
  FROM inter
  JOIN sizes sa ON sa.doc_id = da
  JOIN sizes sb ON sb.doc_id = db
), taus(tau_x10, tau) AS (VALUES {tau_rows})
SELECT t.tau_x10,
       CAST(COALESCE(SUM(CASE WHEN s.j >= t.tau THEN 1 END), 0)
            AS BIGINT) AS n_pairs
FROM taus t LEFT JOIN scored s ON TRUE
GROUP BY 1
"""


def register_r4am(queries: dict, oracles: dict) -> None:
    queries.update(
        {
            "value_collision_groups": q_value_collision_groups,
            "publish_roundtrip_hourly": q_publish_roundtrip_hourly,
            "jaccard_threshold_curve": q_jaccard_threshold_curve,
        }
    )
    oracles.update(
        {
            "value_collision_groups": COLLISION_SQL,
            "publish_roundtrip_hourly": ROUNDTRIP_SQL,
            "jaccard_threshold_curve": _curve_sql(_CURVE_TAUS),
        }
    )
