"""Round-4 batch AP: join-cardinality statistics, a strict three-step
funnel, and exponential time-decay scoring.

Exactness discipline: the cardinality audit computes the ACTUAL join
size as sum of per-key count products (never materializing the join);
funnel steps are first-occurrence chains with (ts, event_id) order;
decay weights are a 1024-entry fixed-point table generated once in
Python and inlined into the SQL twin, so no pow/exp parity is assumed.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd
from mimirsbrunn_ray.stages.broadcast import safe_join as _safe_join

from mimirsbrunn_ray.stages.rollup import tree_merge

_HOUR_US = 3_600_000_000


# ---------------------------------------------------------------------------
# join-cardinality estimation audit: orders |x| lineitem on orderkey
# ---------------------------------------------------------------------------


def q_join_cardinality_audit(sf_dir):
    """Optimizer-statistics audit for the orders |x| lineitem join:
    row counts, distinct key counts on both sides, and the ACTUAL join
    cardinality — computed as sum over keys of cnt_left * cnt_right
    from the two per-key count tables (one hash join of COUNT tables,
    never the row-level join). The |L|*|R|/max(ndv) textbook estimate
    is derivable from the emitted integers."""
    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey"]
    )
    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey"]
    )

    def counts(ds, col):
        def partial(b: pa.Table) -> pa.Table:
            b = b.filter(pc.is_valid(b[col]))
            g = b.group_by([col]).aggregate([([], "count_all")])
            g = g.select([col, "count_all"])
            return g.rename_columns(["k", "c"])

        def combine(b: pa.Table) -> pa.Table:
            g = b.group_by(["k"]).aggregate([("c", "sum")])
            return g.rename_columns(["k", "c"])

        return tree_merge(
            ds.map_batches(partial, batch_format="pyarrow",
                           batch_size=None),
            combine,
            final_shards=4,
            shard_cols=["k"],
        )

    oc = counts(orders, "o_orderkey").map_batches(
        lambda b: b.rename_columns(["k", "c_o"]),
        batch_format="pyarrow", batch_size=None,
    ).repartition(4)
    lc = counts(li, "l_orderkey").map_batches(
        lambda b: b.rename_columns(["k", "c_l"]),
        batch_format="pyarrow", batch_size=None,
    ).repartition(4)
    joined = _safe_join(
        oc, lc,
        on=("k",),
        join_type="inner",
        num_partitions=4,
    )

    def fold(b: pa.Table) -> pa.Table:
        co = b["c_o"].to_numpy(zero_copy_only=False)
        cl = b["c_l"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "n_left_rows": pa.array([int(co.sum())], pa.int64()),
                "n_right_rows": pa.array([int(cl.sum())], pa.int64()),
                "ndv_both": pa.array([len(co)], pa.int64()),
                "actual_join_rows": pa.array(
                    [int(np.dot(co, cl))], pa.int64()
                ),
            }
        )

    def fold_combine(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                c: pa.array([pc.sum(b[c]).as_py() or 0], pa.int64())
                for c in b.column_names
            }
        )

    return tree_merge(
        joined.map_batches(fold, batch_format="pyarrow", batch_size=None),
        fold_combine,
    )


JOIN_CARD_SQL = """
WITH oc AS (
  SELECT o_orderkey AS k, CAST(COUNT(*) AS BIGINT) AS c_o
  FROM orders WHERE o_orderkey IS NOT NULL GROUP BY 1
), lc AS (
  SELECT l_orderkey AS k, CAST(COUNT(*) AS BIGINT) AS c_l
  FROM lineitem WHERE l_orderkey IS NOT NULL GROUP BY 1
), j AS (
  SELECT oc.c_o, lc.c_l FROM oc JOIN lc USING (k)
)
SELECT CAST(SUM(c_o) AS BIGINT) AS n_left_rows,
       CAST(SUM(c_l) AS BIGINT) AS n_right_rows,
       CAST(COUNT(*) AS BIGINT) AS ndv_both,
       CAST(SUM(c_o * c_l) AS BIGINT) AS actual_join_rows
FROM j
"""


# ---------------------------------------------------------------------------
# strict three-step funnel: view -> click -> purchase
# ---------------------------------------------------------------------------


def q_funnel3_counts(sf_dir):
    """Strict-order three-step funnel: users with a view, a click
    strictly after their FIRST view, and a purchase strictly after that
    first qualifying click — the first-touch funnel definition (each
    step anchors on the earliest qualifying event, (ts, event_id)
    order). One user hash-bucket shuffle; per-user vectorized
    first-occurrence chain; bounded counter merge."""
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
                "n_step1": pd.Series([], dtype=np.int64),
                "n_step2": pd.Series([], dtype=np.int64),
                "n_step3": pd.Series([], dtype=np.int64),
            }
        )
        if len(g) == 0:
            return empty
        g = g.sort_values(
            ["user_id", "ts", "event_id"], kind="mergesort",
            ignore_index=True,
        )
        s1 = s2 = s3 = 0
        # per-user chain over the sorted bucket frame; users per bucket
        # bound the loop, rows inside stay vectorized
        for _, u in g.groupby("user_id", sort=False):
            et = u["event_type"].to_numpy()
            iv = np.nonzero(et == "view")[0]
            if not len(iv):
                continue
            s1 += 1
            ic = np.nonzero(et == "click")[0]
            ic = ic[ic > iv[0]]
            if not len(ic):
                continue
            s2 += 1
            ip = np.nonzero(et == "purchase")[0]
            if len(ip[ip > ic[0]]):
                s3 += 1
        return pd.DataFrame(
            {
                "n_step1": pd.Series([s1], dtype=np.int64),
                "n_step2": pd.Series([s2], dtype=np.int64),
                "n_step3": pd.Series([s3], dtype=np.int64),
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


FUNNEL3_SQL = """
WITH e AS MATERIALIZED (
  SELECT user_id, ts, event_id, event_type
  FROM events
  WHERE user_id IS NOT NULL AND ts IS NOT NULL
    AND event_type IS NOT NULL
), f1 AS (
  SELECT user_id, ts AS t1, event_id AS id1 FROM e
  WHERE event_type = 'view'
  QUALIFY ROW_NUMBER()
    OVER (PARTITION BY user_id ORDER BY ts, event_id) = 1
), c2 AS (
  SELECT e.user_id, e.ts, e.event_id
  FROM e JOIN f1 USING (user_id)
  WHERE e.event_type = 'click'
    AND (e.ts > f1.t1 OR (e.ts = f1.t1 AND e.event_id > f1.id1))
), f2 AS (
  SELECT user_id, ts AS t2, event_id AS id2 FROM c2
  QUALIFY ROW_NUMBER()
    OVER (PARTITION BY user_id ORDER BY ts, event_id) = 1
), f3 AS (
  SELECT DISTINCT e.user_id
  FROM e JOIN f2 USING (user_id)
  WHERE e.event_type = 'purchase'
    AND (e.ts > f2.t2 OR (e.ts = f2.t2 AND e.event_id > f2.id2))
)
SELECT CAST((SELECT COUNT(*) FROM f1) AS BIGINT) AS n_step1,
       CAST((SELECT COUNT(*) FROM f2) AS BIGINT) AS n_step2,
       CAST((SELECT COUNT(*) FROM f3) AS BIGINT) AS n_step3
"""


# ---------------------------------------------------------------------------
# exponential time-decay user scores
# ---------------------------------------------------------------------------

_DECAY_HALFLIFE_H = 24
_DECAY_MAX_AGE_H = 1024

# fixed-point half-life weights, generated ONCE and shared verbatim with
# the SQL twin: w[h] = round(2^(-h/24) * 1e9)
_DECAY_W = [
    int(math.floor(abs(2.0 ** (-h / _DECAY_HALFLIFE_H)) * 1e9 + 0.5))
    for h in range(_DECAY_MAX_AGE_H)
]


def q_decayed_user_scores(sf_dir):
    """Per user, the exponentially time-decayed event score: each event
    contributes 2^(-age/24h) relative to the corpus max timestamp, at
    whole-hour age resolution — the recency-weighted engagement score a
    ranking feature store maintains. The 1024-entry fixed-point weight
    table is generated once and INLINED into the SQL twin (no pow
    parity assumed); per-user sums are exact integers x1e9. Top 20
    users by score (ties -> user_id) keep the output bounded."""
    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts"]
    )
    max_ts = ev.max("ts")
    max_us = int(pd.Timestamp(max_ts).value // 1000)
    w = np.array(_DECAY_W, dtype=np.int64)

    def partial(b: pa.Table) -> pa.Table:
        b = b.filter(
            pc.and_(pc.is_valid(b["user_id"]), pc.is_valid(b["ts"]))
        )
        ts_us = b["ts"].cast(pa.timestamp("us")).cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        age_h = np.clip(
            (max_us - ts_us) // _HOUR_US, 0, _DECAY_MAX_AGE_H - 1
        )
        t = pa.table(
            {
                "user_id": b["user_id"],
                "s": pa.array(w[age_h]),
            }
        )
        g = t.group_by(["user_id"]).aggregate(
            [([], "count_all"), ("s", "sum")]
        )
        g = g.select(["user_id", "count_all", "s_sum"])
        return g.rename_columns(["user_id", "n_events", "score_x1e9"])

    def sum_combine(b: pa.Table) -> pa.Table:
        g = b.group_by(["user_id"]).aggregate(
            [("n_events", "sum"), ("score_x1e9", "sum")]
        )
        return g.rename_columns(["user_id", "n_events", "score_x1e9"])

    # top-k is only safe on COMPLETE totals: shard by user (key-disjoint
    # shards carry full per-user sums), prune top-20 per shard, then one
    # bounded final cut — pruning partial sums would drop users whose
    # score is split across level-1 blocks
    totals = tree_merge(
        ev.map_batches(partial, batch_format="pyarrow", batch_size=None),
        sum_combine,
        final_shards=8,
        shard_cols=["user_id"],
    )
    order = [("score_x1e9", "descending"), ("user_id", "ascending")]

    def topk(b: pa.Table) -> pa.Table:
        return b.sort_by(order).slice(0, 20)

    return tree_merge(
        totals.map_batches(topk, batch_format="pyarrow", batch_size=None),
        topk,
    )


_decay_values = ", ".join(
    f"({h}, {v})" for h, v in enumerate(_DECAY_W)
)
DECAY_SQL = f"""
WITH mx AS (SELECT MAX(ts) AS m FROM events),
w(age_h, wt) AS (VALUES {_decay_values}),
v AS (
  SELECT e.user_id,
         LEAST(CAST((EPOCH_US(mx.m) - EPOCH_US(e.ts)) // 3600000000
                    AS BIGINT), {_DECAY_MAX_AGE_H - 1}) AS age_h
  FROM events e, mx
  WHERE e.user_id IS NOT NULL AND e.ts IS NOT NULL
)
SELECT v.user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(w.wt) AS BIGINT) AS score_x1e9
FROM v JOIN w ON w.age_h = v.age_h
GROUP BY 1
ORDER BY score_x1e9 DESC, user_id LIMIT 20
"""


def register_r4ap(queries: dict, oracles: dict) -> None:
    queries.update(
        {
            "join_cardinality_audit": q_join_cardinality_audit,
            "funnel3_counts": q_funnel3_counts,
            "decayed_user_scores": q_decayed_user_scores,
        }
    )
    oracles.update(
        {
            "join_cardinality_audit": JOIN_CARD_SQL,
            "funnel3_counts": FUNNEL3_SQL,
            "decayed_user_scores": DECAY_SQL,
        }
    )
