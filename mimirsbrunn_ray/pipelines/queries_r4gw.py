"""Round-4 batch GW: bounce dynamics, catalog identity hygiene,
and thermodynamic irreversibility — the triple-pattern census of
per-user type streams (A-B-A bounce-backs vs A-A-A repeats vs
A-B-C progressions — is navigation exploratory or ping-pong?), a
duplicate part-name audit (distinct partkeys sharing a name — the
catalog-entity-resolution debt), and the Schnakenberg entropy
production rate of the type transition flow (0.5 * sum (p_ab -
p_ba) ln(p_ab / p_ba) — zero iff the stream is time-reversible;
large means directed funnels dominate).

Exactness discipline: triple and name counts are pure integers;
entropy production folds mirrored logs over exact count ratios,
skipping pairs with a zero in either direction (where the classic
rate is undefined) and counting them separately."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from mimirsbrunn_ray.pipelines.queries_r4fk import _round_half_away
from mimirsbrunn_ray.stages.dedup import _BUCKET, add_bucket
from mimirsbrunn_ray.stages.rollup import tree_merge


def _valid(b: pa.Table, cols) -> pa.Table:
    m = None
    for c in cols:
        v = pc.is_valid(b[c])
        m = v if m is None else pc.and_(m, v)
    return b.filter(m)


_BNC_COLS = ["n_triples", "n_bounce", "n_repeat", "n_progress",
             "bounce_ppm"]


def q_bounce_transition_census(sf_dir):
    """Triple-pattern census over per-user (ts, event_id)-ordered
    type streams: A-B-A bounce-backs (returned to where they came
    from), A-A-A repeats, and true progressions — a high bounce
    share means the 'next step' is mostly an undo, which funnel
    conversion metrics silently miscount as engagement.  Triples
    fold as exact integers in user-disjoint shards."""
    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "ts", "event_id", "event_type"])

    def project(b: pa.Table) -> pa.Table:
        b = _valid(b, ("user_id", "ts", "event_id", "event_type"))
        t = pa.table({
            "user_id": b["user_id"],
            "us": b["ts"].cast(pa.timestamp("us")).cast(pa.int64()),
            "event_id": b["event_id"],
            "event_type": b["event_type"],
        })
        return add_bucket(t, "user_id", 64)

    def triples(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({
            "n": pd.Series([], dtype=np.int64),
            "bounce": pd.Series([], dtype=np.int64),
            "repeat": pd.Series([], dtype=np.int64),
        })
        if len(g) < 3:
            return empty
        g = g.sort_values(["user_id", "us", "event_id"],
                          kind="mergesort", ignore_index=True)
        uid = g["user_id"].to_numpy()
        et = g["event_type"].to_numpy()
        same2 = (uid[2:] == uid[1:-1]) & (uid[1:-1] == uid[:-2])
        a = et[:-2][same2]
        b_ = et[1:-1][same2]
        c = et[2:][same2]
        n = len(a)
        if n == 0:
            return empty
        rep = (a == b_) & (b_ == c)
        bnc = (a == c) & (a != b_)
        return pd.DataFrame({
            "n": [np.int64(n)],
            "bounce": [np.int64(int(bnc.sum()))],
            "repeat": [np.int64(int(rep.sum()))],
        })

    def comb(b: pa.Table) -> pa.Table:
        cols = ["n", "bounce", "repeat"]
        if b.num_rows == 0:
            return pa.table(
                {c: pa.array([], pa.int64()) for c in cols})
        return pa.table({
            c: pa.array([pc.sum(b[c]).as_py() or 0], pa.int64())
            for c in cols})

    t = tree_merge(
        ev.map_batches(project, batch_format="pyarrow",
                       batch_size=None)
        .groupby(_BUCKET)
        .map_groups(triples, batch_format="pandas"),
        comb,
    ).to_pandas()
    if "n" not in t.columns or len(t) == 0 or int(
            t["n"].iloc[0]) == 0:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _BNC_COLS})
    n = int(t["n"].iloc[0])
    bounce = int(t["bounce"].iloc[0])
    repeat = int(t["repeat"].iloc[0])
    return pa.table({
        "n_triples": pa.array([n], pa.int64()),
        "n_bounce": pa.array([bounce], pa.int64()),
        "n_repeat": pa.array([repeat], pa.int64()),
        "n_progress": pa.array(
            [n - bounce - repeat], pa.int64()),
        "bounce_ppm": pa.array(
            [_round_half_away(bounce / n * 1e6)], pa.int64()),
    })


BOUNCE_SQL = """
WITH e AS MATERIALIZED (
  SELECT user_id, event_type, EPOCH_US(ts) AS us, event_id
  FROM events
  WHERE user_id IS NOT NULL AND ts IS NOT NULL
    AND event_id IS NOT NULL AND event_type IS NOT NULL
), tri AS MATERIALIZED (
  SELECT LAG(event_type, 2) OVER w AS a,
         LAG(event_type, 1) OVER w AS b,
         event_type AS c
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
), ok AS (
  SELECT a, b, c FROM tri WHERE a IS NOT NULL
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_triples,
       CAST(SUM(CASE WHEN a = c AND a <> b THEN 1 ELSE 0 END)
            AS BIGINT) AS n_bounce,
       CAST(SUM(CASE WHEN a = b AND b = c THEN 1 ELSE 0 END)
            AS BIGINT) AS n_repeat,
       CAST(COUNT(*)
            - SUM(CASE WHEN a = c AND a <> b THEN 1 ELSE 0 END)
            - SUM(CASE WHEN a = b AND b = c THEN 1 ELSE 0 END)
            AS BIGINT) AS n_progress,
       CAST(ROUND(CAST(SUM(CASE WHEN a = c AND a <> b
                                THEN 1 ELSE 0 END) AS DOUBLE)
            / COUNT(*) * 1000000, 0) AS BIGINT) AS bounce_ppm
FROM ok HAVING COUNT(*) > 0
"""

_DPN_COLS = ["n_names", "n_shared_names", "n_parts_affected",
             "max_keys_per_name"]


def q_duplicate_part_names(sf_dir):
    """Catalog identity hygiene: part NAMES claimed by two or more
    distinct partkeys — the unresolved-entity debt that silently
    splits demand history across keys and breaks name-keyed
    joins.  Distinct (name, partkey) pairs fold exactly in one
    pass."""
    parts = rd.read_parquet(f"{sf_dir}/part.parquet",
                            columns=["p_partkey", "p_name"])

    def part(b: pa.Table) -> pa.Table:
        b = _valid(b, ("p_partkey", "p_name"))
        return b.select(["p_name", "p_partkey"]).group_by(
            ["p_name", "p_partkey"]).aggregate([])

    def distinct(b: pa.Table) -> pa.Table:
        return b.select(["p_name", "p_partkey"]).group_by(
            ["p_name", "p_partkey"]).aggregate([])

    np_ = tree_merge(
        parts.map_batches(part, batch_format="pyarrow",
                          batch_size=None),
        distinct,
        final_shards=8,
        shard_cols=["p_name"],
    ).to_pandas()
    if "p_name" not in np_.columns or len(np_) == 0:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _DPN_COLS})
    per_name = np_.groupby("p_name").size()
    shared = per_name[per_name >= 2]
    return pa.table({
        "n_names": pa.array([len(per_name)], pa.int64()),
        "n_shared_names": pa.array([len(shared)], pa.int64()),
        "n_parts_affected": pa.array(
            [int(shared.sum())], pa.int64()),
        "max_keys_per_name": pa.array(
            [int(per_name.max())], pa.int64()),
    })


DUP_NAME_SQL = """
WITH pn AS MATERIALIZED (
  SELECT p_name, CAST(COUNT(DISTINCT p_partkey) AS BIGINT) AS k
  FROM part
  WHERE p_partkey IS NOT NULL AND p_name IS NOT NULL
  GROUP BY 1
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_names,
       CAST(SUM(CASE WHEN k >= 2 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_shared_names,
       CAST(SUM(CASE WHEN k >= 2 THEN k ELSE 0 END) AS BIGINT)
         AS n_parts_affected,
       CAST(MAX(k) AS BIGINT) AS max_keys_per_name
FROM pn HAVING COUNT(*) > 0
"""

_IRR_COLS = ["n_transitions", "n_live_pairs", "n_oneway_pairs",
             "entropy_prod_x1e6"]


def q_transition_irreversibility(sf_dir):
    """Schnakenberg entropy production of the pooled per-user type
    transition flow: 0.5 * sum over ordered type pairs of (p_ab -
    p_ba) * ln(p_ab / p_ba) — exactly zero iff the stream is
    time-reversible (detailed balance); large values mean directed
    funnels dominate and any model assuming reversibility (e.g.
    symmetric embeddings of 'co-occurrence') is wrong.  Pairs with
    flow in only one direction are counted separately (the rate is
    formally infinite there).  Transition counts fold exactly in
    user-disjoint shards."""
    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "ts", "event_id", "event_type"])

    def project(b: pa.Table) -> pa.Table:
        b = _valid(b, ("user_id", "ts", "event_id", "event_type"))
        t = pa.table({
            "user_id": b["user_id"],
            "us": b["ts"].cast(pa.timestamp("us")).cast(pa.int64()),
            "event_id": b["event_id"],
            "event_type": b["event_type"],
        })
        return add_bucket(t, "user_id", 64)

    def trans(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({
            "a": pd.Series([], dtype=object),
            "b": pd.Series([], dtype=object),
            "n": pd.Series([], dtype=np.int64),
        })
        if len(g) < 2:
            return empty
        g = g.sort_values(["user_id", "us", "event_id"],
                          kind="mergesort", ignore_index=True)
        uid = g["user_id"].to_numpy()
        et = g["event_type"].to_numpy()
        same = uid[1:] == uid[:-1]
        df = pd.DataFrame({"a": et[:-1][same],
                           "b": et[1:][same]})
        out = df.groupby(["a", "b"], sort=False).size()
        out = out.reset_index(name="n")
        out["n"] = out["n"].astype(np.int64)
        return out

    def comb(b: pa.Table) -> pa.Table:
        g = b.group_by(["a", "b"]).aggregate([("n", "sum")])
        return g.rename_columns(["a", "b", "n"])

    tc = tree_merge(
        ev.map_batches(project, batch_format="pyarrow",
                       batch_size=None)
        .groupby(_BUCKET)
        .map_groups(trans, batch_format="pandas"),
        comb,
    ).to_pandas()
    if "a" not in tc.columns or len(tc) == 0:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _IRR_COLS})
    total = int(tc["n"].sum())
    if total == 0:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _IRR_COLS})
    flow = {(a, b): int(n) for a, b, n in
            zip(tc["a"], tc["b"], tc["n"])}
    seen = set()
    ep = 0.0
    live = oneway = 0
    for (a, b) in sorted(flow):
        if a >= b:
            continue
        key = (a, b)
        if key in seen:
            continue
        seen.add(key)
        nab = flow.get((a, b), 0)
        nba = flow.get((b, a), 0)
        if nab == 0 and nba == 0:
            continue
        if nab == 0 or nba == 0:
            oneway += 1
            continue
        live += 1
        pab = nab / total
        pba = nba / total
        ep += (pab - pba) * np.log(pab / pba)
    return pa.table({
        "n_transitions": pa.array([total], pa.int64()),
        "n_live_pairs": pa.array([live], pa.int64()),
        "n_oneway_pairs": pa.array([oneway], pa.int64()),
        "entropy_prod_x1e6": pa.array(
            [_round_half_away(ep * 1e6)], pa.int64()),
    })


IRREV_SQL = """
WITH e AS MATERIALIZED (
  SELECT user_id, event_type, EPOCH_US(ts) AS us, event_id
  FROM events
  WHERE user_id IS NOT NULL AND ts IS NOT NULL
    AND event_id IS NOT NULL AND event_type IS NOT NULL
), tr AS MATERIALIZED (
  SELECT LAG(event_type) OVER w AS a, event_type AS b
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
), fl AS MATERIALIZED (
  SELECT a, b, CAST(COUNT(*) AS BIGINT) AS n
  FROM tr WHERE a IS NOT NULL
  GROUP BY 1, 2
), tot AS MATERIALIZED (
  SELECT CAST(SUM(n) AS BIGINT) AS t FROM fl
), pairs AS MATERIALIZED (
  SELECT f1.a, f1.b,
         f1.n AS nab,
         COALESCE(f2.n, 0) AS nba
  FROM fl f1
  LEFT JOIN fl f2 ON f2.a = f1.b AND f2.b = f1.a
  WHERE f1.a < f1.b
)
SELECT tot.t AS n_transitions,
       CAST(SUM(CASE WHEN nab > 0 AND nba > 0 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_live_pairs,
       CAST(SUM(CASE WHEN nab = 0 OR nba = 0 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_oneway_pairs,
       CAST(ROUND(SUM(CASE WHEN nab > 0 AND nba > 0 THEN
              (CAST(nab AS DOUBLE) / tot.t
               - CAST(nba AS DOUBLE) / tot.t)
              * LN((CAST(nab AS DOUBLE) / tot.t)
                   / (CAST(nba AS DOUBLE) / tot.t))
            ELSE 0 END) * 1000000, 0) AS BIGINT)
         AS entropy_prod_x1e6
FROM pairs CROSS JOIN tot
GROUP BY tot.t
HAVING tot.t > 0
"""


def register_r4gw(queries: dict, oracles: dict) -> None:
    queries.update(
        {
            "bounce_transition_census": q_bounce_transition_census,
            "duplicate_part_names": q_duplicate_part_names,
            "transition_irreversibility":
                q_transition_irreversibility,
        }
    )
    oracles.update(
        {
            "bounce_transition_census": BOUNCE_SQL,
            "duplicate_part_names": DUP_NAME_SQL,
            "transition_irreversibility": IRREV_SQL,
        }
    )
