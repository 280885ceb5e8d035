"""Round-4 batch EU: partition-placement operators for the sharded
store — rendezvous (HRW) hashing balance, mod-vs-consistent-ring
reshard move counts, and a deterministic half-sample bootstrap CI.
These model the engine's own placement choices (stages/dedup.py's
hash buckets, state/publish.py's segment layout): HRW and ring
placement are what a multi-node deployment would use to pin
(source, bucket) partitions to nodes, and the move-count query
quantifies exactly why mod-hashing is the wrong default (K -> K+1
remaps ~15/16 of keys; the ring remaps ~1/17).

Exactness discipline: every hash/score is 64-bit integer arithmetic
on a 2^31 grid (multipliers sized so no product exceeds int64),
mirrored literally in SQL; bootstrap replicate selection is an
integer LCG on (event_id, replicate); values snap to x100 ints
before any sum; the only float ops are final mean/sd snaps computed
from identical integer sums on both sides."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from mimirsbrunn_ray.stages.ordered import _round_half_away
from mimirsbrunn_ray.stages.rollup import tree_merge

_M31 = 2_147_483_648  # 2^31 score/position grid
_HRW_NODES = 8
_RING_NODES = 16
_RING_VNODES = 8
_BOOT_B = 64


def _distinct_users(sf_dir) -> "rd.Dataset":
    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id"])

    def partial(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_valid(b["user_id"]))
        g = b.group_by(["user_id"]).aggregate([([], "count_all")])
        return g.select(["user_id"])

    def combine(b: pa.Table) -> pa.Table:
        g = b.group_by(["user_id"]).aggregate([([], "count_all")])
        return g.select(["user_id"])

    return tree_merge(
        ev.map_batches(partial, batch_format="pyarrow",
                       batch_size=None),
        combine,
        final_shards=8,
        shard_cols=["user_id"],
    )


def q_rendezvous_hash_balance(sf_dir):
    """Highest-random-weight placement of every distinct user key
    over 8 nodes: score(key, node) = ((key%1000003 + 1) * (2*node+1)
    * 2654435761 + node) % 2^31, owner = argmax (ties -> lowest
    node). Per-node key counts + share ppm — the balance evidence
    for HRW vs mod placement. Distinct keys come from a sharded
    combine; scoring is one (n x 8) vectorized matrix per batch."""
    users = _distinct_users(sf_dir)

    def assign(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "user_id" not in b.column_names:
            return pa.table({"node": pa.array([], pa.int64()),
                             "n_keys": pa.array([], pa.int64())})
        uid = b["user_id"].to_numpy(zero_copy_only=False)
        k = (uid % 1_000_003 + 1).astype(np.int64)[:, None]
        node = np.arange(_HRW_NODES, dtype=np.int64)[None, :]
        score = (k * (2 * node + 1) * 2_654_435_761 + node) % _M31
        owner = np.argmax(score, axis=1).astype(np.int64)
        t = pa.table({"node": pa.array(owner, pa.int64())})
        g = t.group_by(["node"]).aggregate([([], "count_all")])
        return g.select(["node", "count_all"]).rename_columns(
            ["node", "n_keys"]
        )

    def combine(b: pa.Table) -> pa.Table:
        g = b.group_by(["node"]).aggregate([("n_keys", "sum")])
        return g.rename_columns(["node", "n_keys"])

    hist = tree_merge(
        users.map_batches(assign, batch_format="pyarrow",
                          batch_size=None),
        combine,
    ).to_pandas()
    from mimirsbrunn_ray.stages.broadcast import ensure_cols

    hist = ensure_cols(hist, ["node", "n_keys"])
    hist = hist.sort_values("node", ignore_index=True)
    total = int(hist["n_keys"].sum()) if len(hist) else 0
    share = (
        np.array(
            [
                _round_half_away(float(n) / total * 1e6)
                for n in hist["n_keys"]
            ],
            np.int64,
        )
        if total > 0
        else np.zeros(len(hist), np.int64)
    )
    return pa.table(
        {
            "node": pa.array(
                hist["node"].to_numpy(dtype=np.int64), pa.int64()
            ),
            "n_keys": pa.array(
                hist["n_keys"].to_numpy(dtype=np.int64), pa.int64()
            ),
            "share_ppm": pa.array(share),
        }
    )


RENDEZVOUS_SQL = f"""
WITH keys AS MATERIALIZED (
  SELECT DISTINCT user_id FROM events WHERE user_id IS NOT NULL
), scored AS MATERIALIZED (
  SELECT user_id, n.node,
         ((user_id % 1000003 + 1) * (2 * n.node + 1) * 2654435761
          + n.node) % {_M31} AS score
  FROM keys CROSS JOIN (
    SELECT UNNEST(RANGE({_HRW_NODES})) AS node
  ) n
), owned AS MATERIALIZED (
  SELECT user_id, node,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY score DESC, node) AS rk
  FROM scored
), hist AS (
  SELECT node, CAST(COUNT(*) AS BIGINT) AS n_keys
  FROM owned WHERE rk = 1 GROUP BY node
)
SELECT CAST(node AS BIGINT) AS node, n_keys,
       CAST(ROUND(CAST(n_keys AS DOUBLE)
            / (SELECT CAST(SUM(n_keys) AS DOUBLE) FROM hist)
            * 1000000, 0) AS BIGINT) AS share_ppm
FROM hist ORDER BY node
"""


def _ring(n_nodes: int):
    """Deterministic vnode ring: pos = ((node*131 + v + 1)
    * 2654435761 + 12345) % 2^31, one entry per (node, vnode),
    sorted by (pos, node, v) with duplicate positions dropped
    (first by that order wins — mirrored by the SQL argmin
    tie-break)."""
    node = np.repeat(np.arange(n_nodes, dtype=np.int64),
                     _RING_VNODES)
    v = np.tile(np.arange(_RING_VNODES, dtype=np.int64), n_nodes)
    pos = ((node * 131 + v + 1) * 2_654_435_761 + 12_345) % _M31
    order = np.lexsort((v, node, pos))
    pos, node = pos[order], node[order]
    keep = np.concatenate(([True], pos[1:] != pos[:-1]))
    return pos[keep], node[keep]


def q_reshard_move_counts(sf_dir):
    """How many keys change owner when the cluster grows by one
    node, under mod-hash vs a consistent vnode ring — the
    repartition-cost model for scaling the store from 16 to 17
    nodes. Ring ownership = ring point minimizing the circular
    distance (pos - keyhash) mod 2^31 (vectorized searchsorted per
    batch against the broadcast 128/136-point ring)."""
    p16, n16 = _ring(_RING_NODES)
    p17, n17 = _ring(_RING_NODES + 1)
    users = _distinct_users(sf_dir)

    def owner(kh: np.ndarray, pos: np.ndarray,
              node: np.ndarray) -> np.ndarray:
        idx = np.searchsorted(pos, kh)
        idx = np.where(idx == len(pos), 0, idx)
        return node[idx]

    def partial(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "user_id" not in b.column_names:
            return pa.table(
                {"strategy": pa.array([], pa.string()),
                 "n_keys": pa.array([], pa.int64()),
                 "n_moved": pa.array([], pa.int64())}
            )
        uid = b["user_id"].to_numpy(zero_copy_only=False)
        kh = ((uid + 7) * 2_654_435_761) % _M31
        n = len(uid)
        mod_moved = int(np.sum((uid % _RING_NODES)
                               != (uid % (_RING_NODES + 1))))
        ring_moved = int(
            np.sum(owner(kh, p16, n16) != owner(kh, p17, n17))
        )
        return pa.table(
            {
                "strategy": pa.array(["consistent", "mod"],
                                     pa.string()),
                "n_keys": pa.array([n, n], pa.int64()),
                "n_moved": pa.array([ring_moved, mod_moved],
                                    pa.int64()),
            }
        )

    def combine(b: pa.Table) -> pa.Table:
        g = b.group_by(["strategy"]).aggregate(
            [("n_keys", "sum"), ("n_moved", "sum")]
        )
        return g.rename_columns(["strategy", "n_keys", "n_moved"])

    out = tree_merge(
        users.map_batches(partial, batch_format="pyarrow",
                          batch_size=None),
        combine,
    ).to_pandas()
    from mimirsbrunn_ray.stages.broadcast import ensure_cols

    out = ensure_cols(out, ["strategy", "n_keys", "n_moved"])
    out = out.sort_values("strategy", ignore_index=True)
    ppm = np.array(
        [
            _round_half_away(float(m) / float(k) * 1e6) if k else 0
            for m, k in zip(out["n_moved"], out["n_keys"])
        ],
        np.int64,
    )
    return pa.table(
        {
            "strategy": pa.array(out["strategy"], pa.string()),
            "n_keys": pa.array(
                out["n_keys"].to_numpy(dtype=np.int64), pa.int64()
            ),
            "n_moved": pa.array(
                out["n_moved"].to_numpy(dtype=np.int64), pa.int64()
            ),
            "moved_ppm": pa.array(ppm),
        }
    )


RESHARD_SQL = f"""
WITH keys AS MATERIALIZED (
  SELECT DISTINCT user_id,
         ((user_id + 7) * 2654435761) % {_M31} AS kh
  FROM events WHERE user_id IS NOT NULL
), ring AS MATERIALIZED (
  SELECT n.node, v.v,
         ((n.node * 131 + v.v + 1) * 2654435761 + 12345) % {_M31}
           AS pos
  FROM (SELECT UNNEST(RANGE({_RING_NODES + 1})) AS node) n
  CROSS JOIN (SELECT UNNEST(RANGE({_RING_VNODES})) AS v) v
), own16 AS MATERIALIZED (
  SELECT user_id, node AS owner16 FROM (
    SELECT k.user_id, r.node,
           ROW_NUMBER() OVER (
             PARTITION BY k.user_id
             ORDER BY ((r.pos - k.kh) % {_M31} + {_M31}) % {_M31},
                      r.node, r.v
           ) AS rk
    FROM keys k CROSS JOIN ring r WHERE r.node < {_RING_NODES}
  ) WHERE rk = 1
), own17 AS MATERIALIZED (
  SELECT user_id, node AS owner17 FROM (
    SELECT k.user_id, r.node,
           ROW_NUMBER() OVER (
             PARTITION BY k.user_id
             ORDER BY ((r.pos - k.kh) % {_M31} + {_M31}) % {_M31},
                      r.node, r.v
           ) AS rk
    FROM keys k CROSS JOIN ring r
  ) WHERE rk = 1
), per AS MATERIALIZED (
  SELECT k.user_id,
         CASE WHEN (k.user_id % {_RING_NODES})
              <> (k.user_id % {_RING_NODES + 1})
              THEN 1 ELSE 0 END AS mod_moved,
         CASE WHEN a.owner16 <> b.owner17 THEN 1 ELSE 0 END
           AS ring_moved
  FROM keys k
  JOIN own16 a USING (user_id) JOIN own17 b USING (user_id)
), folded AS (
  SELECT 'consistent' AS strategy,
         CAST(COUNT(*) AS BIGINT) AS n_keys,
         CAST(SUM(ring_moved) AS BIGINT) AS n_moved
  FROM per
  UNION ALL
  SELECT 'mod', CAST(COUNT(*) AS BIGINT),
         CAST(SUM(mod_moved) AS BIGINT)
  FROM per
)
SELECT strategy, n_keys, n_moved,
       CAST(ROUND(CAST(n_moved AS DOUBLE) / CAST(n_keys AS DOUBLE)
            * 1000000, 0) AS BIGINT) AS moved_ppm
FROM folded ORDER BY strategy
"""


def q_bootstrap_mean_ci_value(sf_dir):
    """Half-sample bootstrap CI for mean(value): 64 replicates, each
    selecting rows by an integer LCG on (event_id, replicate) —
    fully deterministic, no RNG state, so any worker (or the SQL
    oracle) reproduces the same replicate membership. One streaming
    pass folds (sum_x100, n) per replicate via a 64-row integer
    partial per batch; replicate means snap to x100 ints and the
    sd/CI derive from exact integer sums of those means."""
    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "value"])

    def partial(b: pa.Table) -> pa.Table:
        b = b.filter(
            pc.and_(pc.is_valid(b["event_id"]),
                    pc.is_valid(b["value"]))
        )
        eid = b["event_id"].to_numpy(zero_copy_only=False)
        vx = np.floor(
            b["value"].to_numpy(zero_copy_only=False) * 100.0 + 0.5
        ).astype(np.int64)
        reps = np.arange(_BOOT_B, dtype=np.int64)[None, :]
        sel = (
            ((eid[:, None] * 1_103_515_245 + reps * 12_345) % _M31)
            < _M31 // 2
        ).astype(np.int64)
        s = vx @ sel  # exact int64 matmul: per-replicate sums
        n = sel.sum(axis=0)
        return pa.table(
            {
                "b": pa.array(np.arange(_BOOT_B, dtype=np.int64)),
                "s": pa.array(s.astype(np.int64)),
                "n": pa.array(n),
            }
        )

    def combine(b: pa.Table) -> pa.Table:
        g = b.group_by(["b"]).aggregate([("s", "sum"), ("n", "sum")])
        return g.rename_columns(["b", "s", "n"])

    reps = tree_merge(
        ev.map_batches(partial, batch_format="pyarrow",
                       batch_size=None),
        combine,
    ).to_pandas()
    from mimirsbrunn_ray.stages.broadcast import ensure_cols

    reps = ensure_cols(reps, ["b", "s", "n"])
    reps = reps[reps["n"] > 0]
    if len(reps) == 0:
        return pa.table(
            {
                "n_replicates": pa.array([0], pa.int64()),
                "boot_mean_x100": pa.array([None], pa.int64()),
                "boot_sd_x100": pa.array([None], pa.int64()),
                "ci_lo_x100": pa.array([None], pa.int64()),
                "ci_hi_x100": pa.array([None], pa.int64()),
            }
        )
    m = np.array(
        [
            _round_half_away(float(s) / float(n))
            for s, n in zip(reps["s"], reps["n"])
        ],
        np.int64,
    )
    bb = len(m)
    sm = int(m.sum())
    ss = int((m * m).sum())  # |m| <= ~1e7 so m*m fits int64 exactly
    mean = sm / bb
    var = (
        (bb * ss - sm * sm) / (bb * (bb - 1)) if bb > 1 else 0.0
    )
    sd = float(np.sqrt(max(var, 0.0)))
    return pa.table(
        {
            "n_replicates": pa.array([bb], pa.int64()),
            "boot_mean_x100": pa.array(
                [_round_half_away(mean)], pa.int64()
            ),
            "boot_sd_x100": pa.array(
                [_round_half_away(sd)], pa.int64()
            ),
            "ci_lo_x100": pa.array(
                [_round_half_away(mean - 1.96 * sd)], pa.int64()
            ),
            "ci_hi_x100": pa.array(
                [_round_half_away(mean + 1.96 * sd)], pa.int64()
            ),
        }
    )


BOOTSTRAP_SQL = f"""
WITH reps AS MATERIALIZED (
  SELECT b.b,
         CAST(SUM(CAST(ROUND(e.value * 100, 0) AS BIGINT))
              AS BIGINT) AS s,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM events e
  CROSS JOIN (SELECT UNNEST(RANGE({_BOOT_B})) AS b) b
  WHERE e.event_id IS NOT NULL AND e.value IS NOT NULL
    AND ((e.event_id * 1103515245 + b.b * 12345) % {_M31})
        < {_M31 // 2}
  GROUP BY b.b HAVING COUNT(*) > 0
), means AS MATERIALIZED (
  SELECT CAST(ROUND(CAST(s AS DOUBLE) / CAST(n AS DOUBLE), 0)
              AS BIGINT) AS m
  FROM reps
), agg AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS bb,
         CAST(SUM(m) AS BIGINT) AS sm,
         CAST(SUM(m * m) AS BIGINT) AS ss
  FROM means
)
SELECT bb AS n_replicates,
       CAST(ROUND(CAST(sm AS DOUBLE) / bb, 0) AS BIGINT)
         AS boot_mean_x100,
       CAST(ROUND(SQRT(GREATEST(
         (CAST(bb AS DOUBLE) * ss - CAST(sm AS DOUBLE) * sm)
         / (CAST(bb AS DOUBLE) * (bb - 1)), 0.0)), 0) AS BIGINT)
         AS boot_sd_x100,
       CAST(ROUND(CAST(sm AS DOUBLE) / bb - 1.96 * SQRT(GREATEST(
         (CAST(bb AS DOUBLE) * ss - CAST(sm AS DOUBLE) * sm)
         / (CAST(bb AS DOUBLE) * (bb - 1)), 0.0)), 0) AS BIGINT)
         AS ci_lo_x100,
       CAST(ROUND(CAST(sm AS DOUBLE) / bb + 1.96 * SQRT(GREATEST(
         (CAST(bb AS DOUBLE) * ss - CAST(sm AS DOUBLE) * sm)
         / (CAST(bb AS DOUBLE) * (bb - 1)), 0.0)), 0) AS BIGINT)
         AS ci_hi_x100
FROM agg
"""


def register_r4eu(queries: dict, oracles: dict) -> None:
    queries.update(
        {
            "rendezvous_hash_balance": q_rendezvous_hash_balance,
            "reshard_move_counts": q_reshard_move_counts,
            "bootstrap_mean_ci_value": q_bootstrap_mean_ci_value,
        }
    )
    oracles.update(
        {
            "rendezvous_hash_balance": RENDEZVOUS_SQL,
            "reshard_move_counts": RESHARD_SQL,
            "bootstrap_mean_ci_value": BOOTSTRAP_SQL,
        }
    )
