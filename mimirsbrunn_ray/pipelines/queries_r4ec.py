"""Round-4 batch EC: k-NN hubness skew over the embedding table, the
two-sample energy distance between weekday/weekend value samples, and
an equi-depth range-partition plan audit over events.value.

Exactness discipline: hubness 5-NN selection orders by exact int64
squared distances over x1e6 codes (ties by neighbor id) so every
k-occurrence count is exact and only the skewness is a mirrored
double; energy-distance pairwise |diff| sums use the sorted prefix
identity sum_{i<j}|x_i-x_j| = sum_i (2i-n-1) x_(i) over exact cents,
so all three V-statistic numerators fold as exact int64; the partition
plan derives boundaries from the engine's exact PERCENTILE_DISC
machinery (actual data elements, bit-exact vs quantile_disc) and
counts are exact."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from mimirsbrunn_ray.stages.dedup import _BUCKET, add_bucket
from mimirsbrunn_ray.stages.rollup import tree_merge

_DAY_US = 86_400_000_000


def _round_half_away(x):
    if isinstance(x, np.ndarray):
        return np.where(
            x >= 0, np.floor(x + 0.5), np.ceil(x - 0.5)
        ).astype(np.int64)
    return int(np.floor(x + 0.5) if x >= 0 else np.ceil(x - 0.5))


def _not_null(b: pa.Table, cols) -> pa.Table:
    m = None
    for c in cols:
        v = pc.is_valid(b[c])
        m = v if m is None else pc.and_(m, v)
    return b.filter(m)


def _sum_by(t: pa.Table, keys: list[str], vals: list[str]) -> pa.Table:
    g = t.group_by(keys).aggregate([(v, "sum") for v in vals])
    g = g.select(keys + [f"{v}_sum" for v in vals])
    return g.rename_columns(keys + vals)


# ---------------------------------------------------------------------------
# k-NN hubness: k-occurrence distribution skewness
# ---------------------------------------------------------------------------


def q_hubness_embeddings(sf_dir):
    """Global hubness audit of the embedding space: each vector's 5
    nearest neighbors (exact int64 squared distance over x1e6 codes,
    ties to the smaller id) define the k-occurrence count o_i = how
    often vector i appears in others' 5-NN lists; the third-moment
    skewness of {o_i} is THE hubness diagnostic (Radovanovic et al.) —
    high skew means a few 'hub' vectors dominate every neighbor list
    and ANN recall will look better than retrieval quality. Counts are
    exact; mean is exactly k; skewness is the one mirrored double."""
    emb = rd.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    from mimirsbrunn_ray.stages.broadcast import ensure_cols

    all_tbl = ensure_cols(emb.to_pandas(), ["vec_id", "embedding"])
    all_tbl = all_tbl.sort_values("vec_id", ignore_index=True)
    cols = ["n", "k", "max_o", "n_antihubs", "n_hubs_2k", "skew_x1e6"]
    if len(all_tbl) < 7:
        return pa.table({c: pa.array([], pa.int64()) for c in cols})
    ids = all_tbl["vec_id"].to_numpy(dtype=np.int64)
    mat = _round_half_away(
        np.stack(all_tbl["embedding"].to_numpy()).astype(np.float64) * 1e6
    ).astype(np.float64)
    sq = np.sum(mat * mat, axis=1)
    import ray

    ref = ray.put((ids, mat, sq))
    k = 5

    def knn(b: pa.Table) -> pa.Table:
        ids_, mat_, sq_ = ray.get(ref)
        empty = pa.table({"nn_id": pa.array([], pa.int64()),
                          "c": pa.array([], pa.int64())})
        b = b.filter(pc.is_valid(b["vec_id"]))
        if b.num_rows == 0:
            return empty
        col = b["embedding"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        flat = pc.list_flatten(col).to_numpy(zero_copy_only=False).astype(
            np.float64
        )
        dim = mat_.shape[1]
        q = _round_half_away(flat.reshape(len(b), dim) * 1e6).astype(
            np.float64
        )
        vid = b["vec_id"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        d2 = sq_[None, :] - 2.0 * (q @ mat_.T) + np.sum(q * q, axis=1)[:, None]
        d2[np.arange(len(q)), np.searchsorted(ids_, vid)] = np.inf
        # deterministic (d2, id) order: argsort on d2 is stable with
        # ids_ ascending, ties resolve to the smaller vec_id
        nn = np.argsort(d2, axis=1, kind="stable")[:, :k]
        t = pa.table(
            {
                "nn_id": pa.array(ids_[nn].ravel()),
                "c": pa.array(np.ones(nn.size, np.int64)),
            }
        )
        return _sum_by(t, ["nn_id"], ["c"])

    occ = tree_merge(
        emb.map_batches(knn, batch_format="pyarrow", batch_size=None),
        lambda b: _sum_by(b, ["nn_id"], ["c"]),
    ).to_pandas()
    o = np.zeros(len(ids), dtype=np.int64)
    pos = np.searchsorted(ids, occ["nn_id"].to_numpy(dtype=np.int64))
    o[pos] = occ["c"].to_numpy(dtype=np.int64)
    n = len(o)
    s1, s2, s3 = int(np.sum(o)), int(np.sum(o * o)), int(np.sum(o**3))
    nf = float(n)
    mu = s1 / nf
    var = s2 / nf - mu * mu
    m3 = s3 / nf - 3.0 * mu * (s2 / nf) + 2.0 * mu**3
    skew = None if var <= 0.0 else m3 / (np.sqrt(var) ** 3)
    return pa.table(
        {
            "n": pa.array([n], pa.int64()),
            "k": pa.array([k], pa.int64()),
            "max_o": pa.array([int(np.max(o))], pa.int64()),
            "n_antihubs": pa.array([int(np.sum(o == 0))], pa.int64()),
            "n_hubs_2k": pa.array([int(np.sum(o > 2 * k))], pa.int64()),
            "skew_x1e6": pa.array(
                [None if skew is None else _round_half_away(skew * 1e6)],
                pa.int64(),
            ),
        }
    )


HUBNESS_SQL = """
WITH q AS MATERIALIZED (
  SELECT vec_id,
         list_transform(embedding,
                        x -> ROUND(CAST(x AS DOUBLE) * 1000000, 0)) AS c
  FROM embeddings WHERE vec_id IS NOT NULL
), d AS MATERIALIZED (
  SELECT a.vec_id AS va, b.vec_id AS vb,
         CAST(list_inner_product(a.c, a.c)
              + list_inner_product(b.c, b.c)
              - 2 * list_inner_product(a.c, b.c) AS BIGINT) AS d2
  FROM q a JOIN q b ON a.vec_id <> b.vec_id
), nn AS (
  SELECT va, vb FROM d
  QUALIFY ROW_NUMBER() OVER (PARTITION BY va ORDER BY d2, vb) <= 5
), occ AS (
  SELECT q.vec_id,
         CAST(COALESCE(cnt.c, 0) AS BIGINT) AS o
  FROM q LEFT JOIN (
    SELECT vb, CAST(COUNT(*) AS BIGINT) AS c FROM nn GROUP BY 1
  ) cnt ON cnt.vb = q.vec_id
), m AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(o) AS BIGINT) AS s1,
         CAST(SUM(o * o) AS BIGINT) AS s2,
         CAST(SUM(o * o * o) AS BIGINT) AS s3,
         CAST(MAX(o) AS BIGINT) AS max_o,
         CAST(SUM(CASE WHEN o = 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_antihubs,
         CAST(SUM(CASE WHEN o > 10 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_hubs_2k
  FROM occ
)
SELECT n, CAST(5 AS BIGINT) AS k, max_o, n_antihubs, n_hubs_2k,
       CASE WHEN CAST(s2 AS DOUBLE) / n
                 - (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n)
                 <= 0.0 THEN NULL
            ELSE CAST(ROUND(
              (CAST(s3 AS DOUBLE) / n
               - 3.0 * (CAST(s1 AS DOUBLE) / n) * (CAST(s2 AS DOUBLE) / n)
               + 2.0 * POW(CAST(s1 AS DOUBLE) / n, 3))
              / POW(SQRT(CAST(s2 AS DOUBLE) / n
                    - (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n)),
                    3)
              * 1000000, 0) AS BIGINT) END AS skew_x1e6
FROM m
"""


# ---------------------------------------------------------------------------
# two-sample energy distance: weekday vs weekend values
# ---------------------------------------------------------------------------


def q_energy_distance_weekpart(sf_dir):
    """Per event type: the two-sample energy distance D = 2 E|X-Y| -
    E|X-X'| - E|Y-Y'| between weekday and weekend value samples
    (cents) — the metric two-sample discrepancy that is zero iff the
    distributions match, sensitive everywhere a rank test is not. All
    three pairwise-|diff| numerators fold from the exact sorted-prefix
    identity (one in-bucket sort each); D in cents is the one mirrored
    double, x1e6 snap. One event-type hash-bucket shuffle."""
    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "ts", "value"]
    )

    def project(b: pa.Table) -> pa.Table:
        b = _not_null(b, ("event_type", "ts", "value"))
        us = b["ts"].cast(pa.timestamp("us")).cast(pa.int64()).to_numpy()
        dow = (us // _DAY_US + 4) % 7  # Sunday = 0
        we = ((dow == 0) | (dow == 6)).astype(np.int64)
        v = b["value"].to_numpy(zero_copy_only=False)
        cents = np.where(
            v >= 0, np.floor(v * 100 + 0.5), np.ceil(v * 100 - 0.5)
        ).astype(np.int64)
        t = pa.table(
            {
                "event_type": b["event_type"],
                "we": pa.array(we),
                "x": pa.array(cents),
            }
        )
        return add_bucket(t, "event_type", 64)

    def pairsum(x: np.ndarray) -> int:
        """sum_{i<j} |x_i - x_j| over exact int cents."""
        xs = np.sort(x)
        n = len(xs)
        coef = 2 * np.arange(1, n + 1, dtype=np.int64) - n - 1
        return int(np.sum(coef * xs))

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "event_type": pd.Series([], dtype=object),
                "n_weekday": pd.Series([], dtype=np.int64),
                "n_weekend": pd.Series([], dtype=np.int64),
                "edist_cents_x1e6": pd.Series([], dtype=np.int64),
            }
        )
        if len(g) == 0:
            return empty
        rows = {"event_type": [], "n_weekday": [], "n_weekend": [],
                "edist_cents_x1e6": []}
        for t, gg in g.groupby("event_type", sort=False):
            x = gg.loc[gg["we"] == 0, "x"].to_numpy(dtype=np.int64)
            y = gg.loc[gg["we"] == 1, "x"].to_numpy(dtype=np.int64)
            n, m = len(x), len(y)
            if n == 0 or m == 0:
                continue
            tx = pairsum(x)
            ty = pairsum(y)
            tp = pairsum(np.concatenate([x, y]))
            sxy = tp - tx - ty
            nf, mf = float(n), float(m)
            d = 2.0 * sxy / (nf * mf) - 2.0 * tx / (nf * nf) \
                - 2.0 * ty / (mf * mf)
            rows["event_type"].append(t)
            rows["n_weekday"].append(n)
            rows["n_weekend"].append(m)
            rows["edist_cents_x1e6"].append(_round_half_away(d * 1e6))
        out = pd.DataFrame(rows)
        for c in ("n_weekday", "n_weekend", "edist_cents_x1e6"):
            out[c] = out[c].astype(np.int64)
        return out

    return (
        ev.map_batches(project, batch_format="pyarrow", batch_size=None)
        .groupby(_BUCKET)
        .map_groups(per_bucket, batch_format="pandas")
    )


ENERGY_DIST_SQL = """
WITH v AS MATERIALIZED (
  SELECT event_type,
         CASE WHEN dayofweek(ts) IN (0, 6) THEN 1 ELSE 0 END AS we,
         CAST(ROUND(value * 100, 0) AS BIGINT) AS x
  FROM events
  WHERE event_type IS NOT NULL AND ts IS NOT NULL AND value IS NOT NULL
), tw AS (
  SELECT event_type, we,
         CAST(SUM((2 * rn - n - 1) * x) AS BIGINT) AS t,
         CAST(MAX(n) AS BIGINT) AS n
  FROM (
    SELECT event_type, we, x,
           ROW_NUMBER() OVER (PARTITION BY event_type, we ORDER BY x)
             AS rn,
           COUNT(*) OVER (PARTITION BY event_type, we) AS n
    FROM v
  ) GROUP BY 1, 2
), tp AS (
  SELECT event_type,
         CAST(SUM((2 * rn - n - 1) * x) AS BIGINT) AS t
  FROM (
    SELECT event_type, x,
           ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY x) AS rn,
           COUNT(*) OVER (PARTITION BY event_type) AS n
    FROM v
  ) GROUP BY 1
), j AS (
  SELECT a.event_type, a.n AS n, b.n AS m,
         a.t AS tx, b.t AS ty, p.t AS tpool
  FROM tw a JOIN tw b
    ON a.event_type = b.event_type AND a.we = 0 AND b.we = 1
  JOIN tp p ON p.event_type = a.event_type
)
SELECT event_type, n AS n_weekday, m AS n_weekend,
       CAST(ROUND((
         2.0 * (tpool - tx - ty) / (CAST(n AS DOUBLE) * CAST(m AS DOUBLE))
         - 2.0 * tx / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))
         - 2.0 * ty / (CAST(m AS DOUBLE) * CAST(m AS DOUBLE))
       ) * 1000000, 0) AS BIGINT) AS edist_cents_x1e6
FROM j ORDER BY 1
"""


# ---------------------------------------------------------------------------
# equi-depth range-partition plan over events.value
# ---------------------------------------------------------------------------


def q_range_partition_plan(sf_dir):
    """A 16-way equi-depth range-partition plan over events.value: the
    15 boundaries are exact PERCENTILE_DISC(k/16) elements (actual data
    values from the engine's two-pass histogram selection — no sort
    shuffle), each row lands in partition #{boundaries <= value}, and
    the audit reports per-partition exact counts — what a range
    partitioner must know before co-locating by value at scale, and
    the skew check that equi-depth actually held. Bit-exact values,
    exact counts."""
    from mimirsbrunn_ray.stages.rollup import exact_continuous_quantile

    ev = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["value"])
    qs = tuple(k / 16.0 for k in range(1, 16))
    bounds = exact_continuous_quantile(ev, val_fn=lambda b: b["value"], qs=qs)
    if any(x is None for x in bounds):  # empty-corpus guard
        return pa.table({"part_id": pa.array([], pa.int64()),
                         "lo_value": pa.array([], pa.float64()),
                         "n_rows": pa.array([], pa.int64())})
    barr = np.asarray(bounds, dtype=np.float64)
    import ray

    ref = ray.put(barr)

    def assign(b: pa.Table) -> pa.Table:
        bnd = ray.get(ref)
        b = b.filter(pc.is_valid(b["value"]))
        empty = pa.table({"part_id": pa.array([], pa.int64()),
                          "n_rows": pa.array([], pa.int64())})
        if b.num_rows == 0:
            return empty
        v = b["value"].to_numpy(zero_copy_only=False)
        p = np.searchsorted(bnd, v, side="right").astype(np.int64)
        t = pa.table(
            {
                "part_id": pa.array(p),
                "n_rows": pa.array(np.ones(len(p), np.int64)),
            }
        )
        return _sum_by(t, ["part_id"], ["n_rows"])

    counts = tree_merge(
        ev.map_batches(assign, batch_format="pyarrow", batch_size=None),
        lambda b: _sum_by(b, ["part_id"], ["n_rows"]),
    ).to_pandas()
    got = dict(zip(counts.get("part_id", []), counts.get("n_rows", [])))
    lo = [None] + [float(x) for x in bounds]
    return pa.table(
        {
            "part_id": pa.array(np.arange(16, dtype=np.int64)),
            "lo_value": pa.array(lo, pa.float64()),
            "n_rows": pa.array(
                [int(got.get(i, 0)) for i in range(16)], pa.int64()
            ),
        }
    )


RANGE_PLAN_SQL = """
WITH qarr AS MATERIALIZED (
  SELECT quantile_disc(value, [0.0625, 0.125, 0.1875, 0.25, 0.3125,
                               0.375, 0.4375, 0.5, 0.5625, 0.625,
                               0.6875, 0.75, 0.8125, 0.875, 0.9375])
           AS l
  FROM events WHERE value IS NOT NULL
), bnd AS MATERIALIZED (
  SELECT k, l[k] AS b
  FROM qarr, (SELECT unnest(generate_series(1, 15)) AS k)
), assigned AS MATERIALIZED (
  SELECT (SELECT COUNT(*) FROM bnd WHERE bnd.b <= v.value) AS part_id
  FROM (SELECT value FROM events WHERE value IS NOT NULL) v
), cnt AS (
  SELECT part_id, CAST(COUNT(*) AS BIGINT) AS n_rows
  FROM assigned GROUP BY 1
), parts AS (
  SELECT unnest(generate_series(0, 15)) AS part_id
)
SELECT CAST(p.part_id AS BIGINT) AS part_id,
       (SELECT b FROM bnd WHERE bnd.k = p.part_id) AS lo_value,
       COALESCE(c.n_rows, 0) AS n_rows
FROM parts p LEFT JOIN cnt c ON c.part_id = p.part_id
ORDER BY 1
"""


def register_r4ec(queries: dict, oracles: dict) -> None:
    queries.update(
        {
            "hubness_embeddings": q_hubness_embeddings,
            "energy_distance_weekpart": q_energy_distance_weekpart,
            "range_partition_plan": q_range_partition_plan,
        }
    )
    oracles.update(
        {
            "hubness_embeddings": HUBNESS_SQL,
            "energy_distance_weekpart": ENERGY_DIST_SQL,
            "range_partition_plan": RANGE_PLAN_SQL,
        }
    )
