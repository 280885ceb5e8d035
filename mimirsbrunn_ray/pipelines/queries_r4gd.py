"""Round-4 batch GD: dimensionality-reduction audits and activity
texture — a Johnson-Lindenstrauss distortion audit of a
DETERMINISTIC Rademacher projection (64 -> 8 dims, signs from an
integer hash so both engines build the same matrix; how much do
pairwise distances move?), the top eigenvalue of the embedding
second-moment matrix by ten unrolled power iterations (the
anisotropy number, without any eigensolver dependency), and the
entropy of each type's active/inactive hour run-length
distribution (bursty streams have many short runs = high run
entropy; steady streams few long ones).

Exactness discipline: projection signs are pure integer hash
parity; distances and matvecs fold identical double sums from
identical inputs; power iterations are unrolled to the same fixed
10 steps with normalization deferred to the final Rayleigh
quotient; run-length counts are exact integers with one mirrored
log2 fold."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from mimirsbrunn_ray.pipelines.queries_r4fk import _round_half_away
from mimirsbrunn_ray.pipelines.queries_r4fl import (
    _dense_hour_counts,
)
from mimirsbrunn_ray.stages.rollup import tree_merge

_EMB_DIM = 64
_JL_DIM = 8
_JL_A = 73_856_093
_JL_B = 19_349_663
_POWER_ITERS = 10


def _valid(b: pa.Table, cols) -> pa.Table:
    m = None
    for c in cols:
        v = pc.is_valid(b[c])
        m = v if m is None else pc.and_(m, v)
    return b.filter(m)


def _jl_matrix() -> np.ndarray:
    i = np.arange(_JL_DIM, dtype=np.int64)[:, None]
    j = np.arange(_EMB_DIM, dtype=np.int64)[None, :]
    return ((i * _JL_A + j * _JL_B) % 2 * 2 - 1).astype(
        np.float64)


_JL_COLS = ["n_pairs", "mean_ratio_ppm", "min_ratio_ppm",
            "max_ratio_ppm"]


def q_jl_distortion_audit(sf_dir):
    """Johnson-Lindenstrauss distortion audit: project every
    embedding to 8 dims with the deterministic Rademacher matrix
    sign(i, j) = ((i*73856093 + j*19349663) mod 2)*2 - 1 scaled by
    1/sqrt(8), then for every consecutive vec_id pair compare the
    projected to the true squared distance — the mean/min/max ratio
    says whether an 8-dim sketch preserves this corpus's geometry.
    Projections compute distributed per batch against the broadcast
    sign matrix; consecutive-id pairing happens on the collected
    projected table (bounded by the embeddings corpus — at scale,
    shard pairs by vec_id range instead)."""
    emb = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                          columns=["vec_id", "embedding"])
    R = _jl_matrix()

    def part(b: pa.Table) -> pa.Table:
        b = _valid(b, ("vec_id", "embedding"))
        if b.num_rows == 0:
            return pa.table({
                "vec_id": pa.array([], pa.int64()),
                "true2": pa.array([], pa.float64()),
                "proj2": pa.array([], pa.float64()),
                "ok": pa.array([], pa.int64()),
            })
        vid = b["vec_id"].to_numpy(zero_copy_only=False).astype(
            np.int64)
        x = b["embedding"].combine_chunks().flatten().to_numpy(
            zero_copy_only=False).astype(np.float64).reshape(
            len(vid), -1)
        y = x @ R.T / np.sqrt(float(_JL_DIM))
        return pa.table({
            "vec_id": pa.array(vid),
            "x": pa.array(list(x), pa.list_(pa.float64())),
            "y": pa.array(list(y), pa.list_(pa.float64())),
        })

    # pairs (v, v+1): gather all rows to pair in vec_id-sharded
    # groups; adjacent ids may straddle batches, so shard by
    # vec_id // 2 parity trick: emit each row to shard of v and
    # v-1's pair id
    tbl = emb.map_batches(part, batch_format="pyarrow",
                          batch_size=None).to_pandas()
    if "vec_id" not in tbl.columns or len(tbl) == 0:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _JL_COLS})
    tbl = tbl.sort_values("vec_id", ignore_index=True)
    vid = tbl["vec_id"].to_numpy(np.int64)
    x = np.stack(tbl["x"].to_numpy())
    y = np.stack(tbl["y"].to_numpy())
    adj = vid[1:] == vid[:-1] + 1
    if not adj.any():
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _JL_COLS})
    dx = x[1:][adj] - x[:-1][adj]
    dy = y[1:][adj] - y[:-1][adj]
    true2 = (dx * dx).sum(axis=1)
    proj2 = (dy * dy).sum(axis=1)
    keep = true2 > 0
    if not keep.any():
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _JL_COLS})
    ratio = proj2[keep] / true2[keep]
    return pa.table({
        "n_pairs": pa.array([int(keep.sum())], pa.int64()),
        "mean_ratio_ppm": pa.array(
            [_round_half_away(float(ratio.mean()) * 1e6)],
            pa.int64()),
        "min_ratio_ppm": pa.array(
            [_round_half_away(float(ratio.min()) * 1e6)],
            pa.int64()),
        "max_ratio_ppm": pa.array(
            [_round_half_away(float(ratio.max()) * 1e6)],
            pa.int64()),
    })


JL_SQL = f"""
WITH v AS MATERIALIZED (
  SELECT vec_id, r.k - 1 AS j,
         CAST(embedding[CAST(r.k AS INTEGER)] AS DOUBLE) AS x
  FROM embeddings CROSS JOIN range(1, {_EMB_DIM + 1}) r(k)
  WHERE vec_id IS NOT NULL AND embedding IS NOT NULL
), proj AS MATERIALIZED (
  SELECT v.vec_id, o.k AS i,
         SUM(CAST(((o.k * {_JL_A} + v.j * {_JL_B}) % 2) * 2 - 1
                  AS DOUBLE) * v.x)
           / SQRT({_JL_DIM}.0) AS y
  FROM v CROSS JOIN range(0, {_JL_DIM}) o(k)
  GROUP BY 1, 2
), td AS MATERIALIZED (
  SELECT a.vec_id,
         SUM((b.x - a.x) * (b.x - a.x)) AS true2
  FROM v a JOIN v b ON b.vec_id = a.vec_id + 1 AND b.j = a.j
  GROUP BY 1
), pd_ AS MATERIALIZED (
  SELECT a.vec_id,
         SUM((b.y - a.y) * (b.y - a.y)) AS proj2
  FROM proj a JOIN proj b ON b.vec_id = a.vec_id + 1
                         AND b.i = a.i
  GROUP BY 1
), ratios AS (
  SELECT td.vec_id, pd_.proj2 / td.true2 AS ratio
  FROM td JOIN pd_ USING (vec_id)
  WHERE td.true2 > 0
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
       CAST(ROUND(AVG(ratio) * 1000000, 0) AS BIGINT)
         AS mean_ratio_ppm,
       CAST(ROUND(MIN(ratio) * 1000000, 0) AS BIGINT)
         AS min_ratio_ppm,
       CAST(ROUND(MAX(ratio) * 1000000, 0) AS BIGINT)
         AS max_ratio_ppm
FROM ratios HAVING COUNT(*) > 0
"""

_EIG_COLS = ["dim", "lambda1_x1e6", "trace_x1e6",
             "explained_ppm"]


def q_top_eigen_power_iteration(sf_dir):
    """Top eigenvalue of the embedding second-moment matrix
    S = E[x x^T] by ten unrolled power iterations from the all-ones
    vector (normalization deferred to the final Rayleigh quotient
    v'Sv / v'v — doubles hold 10 unnormalized matvecs fine), plus
    the explained share lambda_1 / trace(S) — the anisotropy
    number: how much of the embedding energy lives in ONE
    direction.  Moment cells fold in one distributed pass; the
    64-dim iteration is driver math mirroring the oracle's
    unrolled join chain."""
    emb = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                          columns=["embedding"])

    def part(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_valid(b["embedding"]))
        if b.num_rows == 0:
            return pa.table({
                "ij": pa.array([], pa.int64()),
                "s": pa.array([], pa.float64()),
                "n": pa.array([], pa.int64()),
            })
        x = b["embedding"].combine_chunks().flatten().to_numpy(
            zero_copy_only=False).astype(np.float64).reshape(
            b.num_rows, -1)
        d = x.shape[1]
        s = x.T @ x
        return pa.table({
            "ij": pa.array(np.arange(d * d, dtype=np.int64)),
            "s": pa.array(s.ravel()),
            "n": pa.array(np.full(d * d, len(x), np.int64)),
        })

    def comb(b: pa.Table) -> pa.Table:
        g = b.group_by(["ij"]).aggregate(
            [("s", "sum"), ("n", "sum")])
        return g.rename_columns(["ij", "s", "n"])

    mm = tree_merge(
        emb.map_batches(part, batch_format="pyarrow",
                        batch_size=None),
        comb,
    ).to_pandas()
    if "ij" not in mm.columns or len(mm) == 0:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _EIG_COLS})
    d = int(np.sqrt(len(mm)))
    mm = mm.sort_values("ij")
    n = int(mm["n"].iloc[0]) // 1  # n replicated per cell batch-sum
    # n column summed across batches equals total rows * 1 per cell
    n_total = int(mm["n"].max())
    s = (mm["s"].to_numpy(np.float64) / n_total).reshape(d, d)
    v = np.ones(d, dtype=np.float64)
    for _ in range(_POWER_ITERS):
        v = s @ v
    sv = s @ v
    vv = float(v @ v)
    if vv == 0:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _EIG_COLS})
    lam = float(v @ sv) / vv
    trace = float(np.trace(s))
    return pa.table({
        "dim": pa.array([d], pa.int64()),
        "lambda1_x1e6": pa.array(
            [_round_half_away(lam * 1e6)], pa.int64()),
        "trace_x1e6": pa.array(
            [_round_half_away(trace * 1e6)], pa.int64()),
        "explained_ppm": pa.array(
            [_round_half_away(lam / trace * 1e6)], pa.int64()),
    })


def _eigen_sql() -> str:
    chain = []
    prev = "v0"
    for it in range(1, _POWER_ITERS + 2):
        cur = f"v{it}"
        chain.append(f"""{cur} AS MATERIALIZED (
  SELECT mom.i, SUM(mom.s * {prev}.v) AS v
  FROM mom JOIN {prev} ON {prev}.i = mom.j
  GROUP BY 1
)""")
        prev = cur
    last = f"v{_POWER_ITERS}"
    nxt = f"v{_POWER_ITERS + 1}"
    return f"""
WITH vraw AS MATERIALIZED (
  SELECT vec_id, r.k - 1 AS j,
         CAST(embedding[CAST(r.k AS INTEGER)] AS DOUBLE) AS x
  FROM embeddings CROSS JOIN range(1, {_EMB_DIM + 1}) r(k)
  WHERE embedding IS NOT NULL
), nv AS MATERIALIZED (
  SELECT CAST(COUNT(DISTINCT vec_id) AS BIGINT) AS n FROM vraw
), mom AS MATERIALIZED (
  SELECT a.j AS i, b.j AS j, SUM(a.x * b.x) / ANY_VALUE(nv.n)
           AS s
  FROM vraw a JOIN vraw b ON a.vec_id = b.vec_id
  CROSS JOIN nv
  GROUP BY 1, 2
), v0 AS MATERIALIZED (
  SELECT CAST(k AS BIGINT) AS i, 1.0 AS v
  FROM range(0, {_EMB_DIM}) r(k)
), {', '.join(chain)},
tr AS (
  SELECT SUM(s) AS trace FROM mom WHERE i = j
), ray AS (
  SELECT (SELECT SUM(a.v * b.v) FROM {last} a
          JOIN {nxt} b USING (i)) AS vsv,
         (SELECT SUM(v * v) FROM {last}) AS vv
)
SELECT CAST({_EMB_DIM} AS BIGINT) AS dim,
       CAST(ROUND(ray.vsv / ray.vv * 1000000, 0) AS BIGINT)
         AS lambda1_x1e6,
       CAST(ROUND(tr.trace * 1000000, 0) AS BIGINT)
         AS trace_x1e6,
       CAST(ROUND((ray.vsv / ray.vv) / tr.trace * 1000000, 0)
            AS BIGINT) AS explained_ppm
FROM ray CROSS JOIN tr
WHERE ray.vv <> 0 AND tr.trace <> 0
"""


EIGEN_SQL = _eigen_sql()

_RLE_COLS = ["event_type", "n_runs", "h_runs_x1e6"]


def q_activity_runlength_entropy(sf_dir):
    """Entropy of the (state, run-length) distribution of each
    type's hourly activity indicator on the dense grid: segment
    active (count > 0) / inactive hours into maximal runs and take
    H over the empirical distribution of (state, length) classes —
    bursty traffic yields many distinct short-run classes (high H),
    steady or strongly periodic traffic collapses to a few classes.
    Counts are one distributed pass; runs and the entropy fold are
    mirrored integer-then-log2 math."""
    g = _dense_hour_counts(sf_dir)
    if g is None:
        return pa.table({
            "event_type": pa.array([], pa.string()),
            "n_runs": pa.array([], pa.int64()),
            "h_runs_x1e6": pa.array([], pa.int64()),
        })
    out = {c: [] for c in _RLE_COLS}
    for et, sub in g.groupby("event_type", sort=True):
        c = sub.sort_values("hour")["c"].to_numpy(np.int64)
        st = (c > 0).astype(np.int64)
        T = len(st)
        if T == 0:
            continue
        brk = np.ones(T, dtype=bool)
        brk[1:] = st[1:] != st[:-1]
        starts = np.flatnonzero(brk)
        lens = np.diff(np.append(starts, T))
        states = st[starts]
        df = pd.DataFrame({"s": states, "l": lens})
        cnt = df.groupby(["s", "l"]).size().to_numpy(np.int64)
        tot = int(cnt.sum())
        p = cnt.astype(np.float64) / tot
        h = float(-(p * np.log2(p)).sum())
        out["event_type"].append(et)
        out["n_runs"].append(tot)
        out["h_runs_x1e6"].append(_round_half_away(h * 1e6))
    return pa.table({
        "event_type": pa.array(out["event_type"], pa.string()),
        "n_runs": pa.array(out["n_runs"], pa.int64()),
        "h_runs_x1e6": pa.array(out["h_runs_x1e6"], pa.int64()),
    })


RUN_H_SQL = """
WITH hc AS MATERIALIZED (
  SELECT event_type, EPOCH_US(ts) // 3600000000 AS hour,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM events
  WHERE event_type IS NOT NULL AND ts IS NOT NULL
  GROUP BY 1, 2
), span AS MATERIALIZED (
  SELECT MIN(hour) AS hmin, MAX(hour) AS hmax FROM hc
), grid AS MATERIALIZED (
  SELECT t.event_type, s.hmin + r.k AS hour,
         CASE WHEN COALESCE(hc.c, 0) > 0 THEN 1 ELSE 0 END AS st
  FROM (SELECT DISTINCT event_type FROM hc) t
  CROSS JOIN span s
  JOIN range(0, 100000) r(k) ON s.hmin + r.k <= s.hmax
  LEFT JOIN hc ON hc.event_type = t.event_type
              AND hc.hour = s.hmin + r.k
), m AS MATERIALIZED (
  SELECT event_type, hour, st,
         CASE WHEN LAG(st) OVER w IS NULL
                OR LAG(st) OVER w <> st THEN 1 ELSE 0 END AS brk
  FROM grid WINDOW w AS (PARTITION BY event_type ORDER BY hour)
), runs AS MATERIALIZED (
  SELECT event_type, st,
         SUM(brk) OVER (PARTITION BY event_type ORDER BY hour
                        ROWS UNBOUNDED PRECEDING) AS rid
  FROM m
), rl AS MATERIALIZED (
  SELECT event_type, rid, ANY_VALUE(st) AS st,
         CAST(COUNT(*) AS BIGINT) AS len
  FROM runs GROUP BY 1, 2
), classes AS MATERIALIZED (
  SELECT event_type, st, len,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM rl GROUP BY 1, 2, 3
), tot AS MATERIALIZED (
  SELECT event_type, CAST(SUM(n) AS BIGINT) AS t
  FROM classes GROUP BY 1
)
SELECT c.event_type,
       ANY_VALUE(tot.t) AS n_runs,
       CAST(ROUND(-SUM(CAST(c.n AS DOUBLE) / tot.t
              * LOG2(CAST(c.n AS DOUBLE) / tot.t)) * 1000000, 0)
            AS BIGINT) AS h_runs_x1e6
FROM classes c JOIN tot USING (event_type)
GROUP BY c.event_type ORDER BY c.event_type
"""


def register_r4gd(queries: dict, oracles: dict) -> None:
    queries.update(
        {
            "jl_distortion_audit": q_jl_distortion_audit,
            "top_eigen_power_iteration":
                q_top_eigen_power_iteration,
            "activity_runlength_entropy":
                q_activity_runlength_entropy,
        }
    )
    oracles.update(
        {
            "jl_distortion_audit": JL_SQL,
            "top_eigen_power_iteration": EIGEN_SQL,
            "activity_runlength_entropy": RUN_H_SQL,
        }
    )
