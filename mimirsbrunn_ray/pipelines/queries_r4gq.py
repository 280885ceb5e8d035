"""Round-4 batch GQ: neighborhood purity, brand substitution, and
recovery latency — mean 5-NN label purity per embedding label
(what fraction of each vector's five nearest neighbors share its
label — the local complement to the global centroid confusion),
the cross-brand substitution census (orders carrying two or more
brands of the SAME part type — the assortment-overlap signal
behind substitution elasticity), and error-recovery latency (for
each error event, the time to the user's next non-error event;
median and p90 — how fast users recover, not how often they
fail).

Exactness discipline: neighbor sets rank by (cosine DESC, vec_id)
with identical float cosines from identical inputs; substitution
counts are exact integer (order, type, brand) triples; recovery
gaps are integer microseconds with interpolated quantiles."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from mimirsbrunn_ray.pipelines.queries_r4fk import _round_half_away
from mimirsbrunn_ray.stages.dedup import _BUCKET, add_bucket
from mimirsbrunn_ray.stages.rollup import tree_merge

_EMB_DIM = 64
_KNN_K = 5


def _valid(b: pa.Table, cols) -> pa.Table:
    m = None
    for c in cols:
        v = pc.is_valid(b[c])
        m = v if m is None else pc.and_(m, v)
    return b.filter(m)


_PUR_COLS = ["label", "n_vecs", "mean_purity_ppm"]


def q_knn_label_purity(sf_dir):
    """Mean 5-nearest-neighbor label purity per embedding label
    (cosine neighbors, ties broken by vec_id): purity near 1 means
    the label forms a locally coherent region, low purity with
    high centroid accuracy means a multi-modal label — the local
    structure audit every kNN-retrieval use case needs.
    Neighbor scoring is one matmul per batch against the broadcast
    matrix; the per-vector top-5 selection is vectorized."""
    emb = rd.read_parquet(
        f"{sf_dir}/embeddings.parquet",
        columns=["vec_id", "label", "embedding"]).materialize()

    base = emb.map_batches(
        lambda b: _collect(b), batch_format="pyarrow",
        batch_size=None).to_pandas()
    if "vec_id" not in base.columns or len(base) == 0:
        return pa.table({
            "label": pa.array([], pa.int64()),
            "n_vecs": pa.array([], pa.int64()),
            "mean_purity_ppm": pa.array([], pa.int64()),
        })
    base = base.sort_values("vec_id", ignore_index=True)
    vid = base["vec_id"].to_numpy(np.int64)
    lab = base["label"].to_numpy(np.int64)
    x = np.stack(base["x"].to_numpy())
    norms = np.sqrt((x * x).sum(axis=1))
    norms = np.maximum(norms, 1e-12)
    xn = x / norms[:, None]
    n = len(xn)
    if n <= _KNN_K:
        return pa.table({
            "label": pa.array([], pa.int64()),
            "n_vecs": pa.array([], pa.int64()),
            "mean_purity_ppm": pa.array([], pa.int64()),
        })
    sims = xn @ xn.T
    np.fill_diagonal(sims, -np.inf)
    # top-5 by (cos desc, vec_id asc): lexsort on (-cos, vid)
    purity = np.zeros(n)
    for i in range(n):
        order = np.lexsort((vid, -sims[i]))[:_KNN_K]
        purity[i] = (lab[order] == lab[i]).mean()
    df = pd.DataFrame({"label": lab, "p": purity})
    agg = df.groupby("label", sort=True).agg(
        n_vecs=("p", "size"), mp=("p", "mean")).reset_index()
    return pa.table({
        "label": pa.array(agg["label"].to_numpy(np.int64)),
        "n_vecs": pa.array(agg["n_vecs"].to_numpy(np.int64)),
        "mean_purity_ppm": pa.array(
            [_round_half_away(v * 1e6) for v in agg["mp"]],
            pa.int64()),
    })


def _collect(b: pa.Table) -> pa.Table:
    b = _valid(b, ("vec_id", "label", "embedding"))
    if b.num_rows == 0:
        return pa.table({
            "vec_id": pa.array([], pa.int64()),
            "label": pa.array([], pa.int64()),
            "x": pa.array([], pa.list_(pa.float64())),
        })
    vid = b["vec_id"].to_numpy(zero_copy_only=False).astype(
        np.int64)
    lab = b["label"].to_numpy(zero_copy_only=False).astype(
        np.int64)
    x = b["embedding"].combine_chunks().flatten().to_numpy(
        zero_copy_only=False).astype(np.float64).reshape(
        len(vid), -1)
    return pa.table({
        "vec_id": pa.array(vid),
        "label": pa.array(lab),
        "x": pa.array(list(x), pa.list_(pa.float64())),
    })


KNN_PURITY_SQL = f"""
WITH v AS MATERIALIZED (
  SELECT vec_id, label, r.k - 1 AS j,
         CAST(embedding[CAST(r.k AS INTEGER)] AS DOUBLE) AS x
  FROM embeddings CROSS JOIN range(1, {_EMB_DIM + 1}) r(k)
  WHERE vec_id IS NOT NULL AND label IS NOT NULL
    AND embedding IS NOT NULL
), nrm AS MATERIALIZED (
  SELECT vec_id, label,
         GREATEST(SQRT(SUM(x * x)), 1e-12) AS nn
  FROM v GROUP BY 1, 2
), sims AS MATERIALIZED (
  SELECT a.vec_id AS qa, b.vec_id AS qb,
         ANY_VALUE(na.label) AS la, ANY_VALUE(nb.label) AS lb,
         SUM(a.x * b.x) / (ANY_VALUE(na.nn) * ANY_VALUE(nb.nn))
           AS cos
  FROM v a
  JOIN v b ON b.j = a.j AND b.vec_id <> a.vec_id
  JOIN nrm na ON na.vec_id = a.vec_id
  JOIN nrm nb ON nb.vec_id = b.vec_id
  GROUP BY 1, 2
), topk AS MATERIALIZED (
  SELECT qa, la, lb,
         ROW_NUMBER() OVER (PARTITION BY qa
                            ORDER BY cos DESC, qb) AS rn
  FROM sims
), pur AS MATERIALIZED (
  SELECT qa, ANY_VALUE(la) AS label,
         AVG(CASE WHEN lb = la THEN 1.0 ELSE 0.0 END) AS p
  FROM topk WHERE rn <= {_KNN_K}
  GROUP BY 1
)
SELECT CAST(label AS BIGINT) AS label,
       CAST(COUNT(*) AS BIGINT) AS n_vecs,
       CAST(ROUND(AVG(p) * 1000000, 0) AS BIGINT)
         AS mean_purity_ppm
FROM pur GROUP BY 1 ORDER BY label
"""

_SUB_COLS = ["n_orders", "n_multi_type_orders",
             "n_substitution_orders", "substitution_ppm"]


def q_cross_brand_substitution(sf_dir):
    """Substitution-shopping census: among orders containing at
    least one part TYPE with two or more lineitems, how many carry
    TWO OR MORE BRANDS of the same type (the customer compared
    substitutes in one basket) — the signal behind substitution
    elasticity and assortment-rationalization decisions.  The part
    dim broadcasts; (order, type, brand) triples fold exactly in
    order-disjoint shards."""
    # type/brand attach via budget-gated broadcast / join
    # (stages/broadcast.py) — the part dim never lands whole on the
    # driver
    from mimirsbrunn_ray.stages.broadcast import attach_dim

    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey", "l_partkey"])
    li = li.map_batches(
        lambda b: _valid(b, ("l_orderkey", "l_partkey")),
        batch_format="pyarrow", batch_size=None)
    li = attach_dim(li, "l_partkey", sf_dir, "part", "p_partkey",
                    ["p_type", "p_brand"], how="inner",
                    out_names=["ptype", "brand"])

    def project(b: pa.Table) -> pa.Table:
        t = pa.table({
            "l_orderkey": b["l_orderkey"],
            "ptype": b["ptype"].cast(pa.string()),
            "brand": b["brand"].cast(pa.string()),
        })
        g = t.group_by(["l_orderkey", "ptype", "brand"]).aggregate(
            [])
        return add_bucket(g, "l_orderkey", 64)

    def census(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({
            "n_orders": pd.Series([], dtype=np.int64),
            "n_multi": pd.Series([], dtype=np.int64),
            "n_sub": pd.Series([], dtype=np.int64),
        })
        if len(g) == 0:
            return empty
        g = g[["l_orderkey", "ptype", "brand"]].drop_duplicates()
        tb = g.groupby(["l_orderkey", "ptype"]).size()
        tb = tb.reset_index(name="n_brands")
        per_order = tb.groupby("l_orderkey").agg(
            max_brands=("n_brands", "max"),
            n_pairs=("n_brands", "sum"))
        n_orders = len(per_order)
        # multi-item = >= 2 distinct (type, brand) pairs overall;
        # substitution = some single type carries >= 2 brands
        n_multi = int((per_order["n_pairs"] >= 2).sum())
        n_sub = int((per_order["max_brands"] >= 2).sum())
        return pd.DataFrame({
            "n_orders": [np.int64(n_orders)],
            "n_multi": [np.int64(n_multi)],
            "n_sub": [np.int64(n_sub)],
        })

    def comb(b: pa.Table) -> pa.Table:
        cols = ["n_orders", "n_multi", "n_sub"]
        if b.num_rows == 0:
            return pa.table(
                {c: pa.array([], pa.int64()) for c in cols})
        return pa.table({
            c: pa.array([pc.sum(b[c]).as_py() or 0], pa.int64())
            for c in cols})

    t = tree_merge(
        li.map_batches(project, batch_format="pyarrow",
                       batch_size=None)
        .groupby(_BUCKET)
        .map_groups(census, batch_format="pandas"),
        comb,
    ).to_pandas()
    if "n_orders" not in t.columns or len(t) == 0 or int(
            t["n_orders"].iloc[0]) == 0:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _SUB_COLS})
    n_orders = int(t["n_orders"].iloc[0])
    n_sub = int(t["n_sub"].iloc[0])
    return pa.table({
        "n_orders": pa.array([n_orders], pa.int64()),
        "n_multi_type_orders": pa.array(
            [int(t["n_multi"].iloc[0])], pa.int64()),
        "n_substitution_orders": pa.array([n_sub], pa.int64()),
        "substitution_ppm": pa.array(
            [_round_half_away(n_sub / n_orders * 1e6)],
            pa.int64()),
    })


SUBSTITUTION_SQL = """
WITH otb AS MATERIALIZED (
  SELECT DISTINCT l.l_orderkey, p.p_type, p.p_brand
  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
  WHERE l.l_orderkey IS NOT NULL AND l.l_partkey IS NOT NULL
), ot AS MATERIALIZED (
  SELECT l_orderkey, p_type,
         CAST(COUNT(*) AS BIGINT) AS n_brands
  FROM otb GROUP BY 1, 2
), per_order AS MATERIALIZED (
  SELECT l_orderkey,
         CAST(MAX(n_brands) AS BIGINT) AS mb,
         CAST(SUM(n_brands) AS BIGINT) AS np_
  FROM ot GROUP BY 1
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CASE WHEN np_ >= 2 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_multi_type_orders,
       CAST(SUM(CASE WHEN mb >= 2 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_substitution_orders,
       CAST(ROUND(CAST(SUM(CASE WHEN mb >= 2 THEN 1 ELSE 0 END)
                       AS DOUBLE) / COUNT(*) * 1000000, 0)
            AS BIGINT) AS substitution_ppm
FROM per_order
HAVING COUNT(*) > 0
"""

_REC_COLS = ["n_errors", "n_recovered", "median_sec_x1e3",
             "p90_sec_x1e3"]


def q_error_recovery_quantiles(sf_dir):
    """Error-recovery latency: for every error event, the time
    until that user's NEXT non-error event (recovery); reports the
    recovered count plus the median and p90 recovery time in
    seconds — the user-experience number that error RATES never
    show.  Streams resolve in user-disjoint shards; gaps are exact
    integer microseconds with interpolated quantiles."""
    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "ts", "event_id", "event_type"])

    def project(b: pa.Table) -> pa.Table:
        b = _valid(b, ("user_id", "ts", "event_id", "event_type"))
        t = pa.table({
            "user_id": b["user_id"],
            "us": b["ts"].cast(pa.timestamp("us")).cast(pa.int64()),
            "event_id": b["event_id"],
            "is_err": pc.cast(pc.equal(b["event_type"], "error"),
                              pa.int64()),
        })
        return add_bucket(t, "user_id", 64)

    def recover(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({
            "recovered": pd.Series([], dtype=np.int64),
            "gap": pd.Series([], dtype=np.int64),
        })
        if len(g) == 0:
            return empty
        g = g.sort_values(["user_id", "us", "event_id"],
                          kind="mergesort", ignore_index=True)
        uid = g["user_id"].to_numpy()
        us = g["us"].to_numpy(np.int64)
        err = g["is_err"].to_numpy(np.int64) == 1
        n = len(g)
        big = np.int64(n)
        idx = np.arange(n, dtype=np.int64)
        ok_idx = np.where(~err, idx, big)
        # per-user suffix MIN of ok indices strictly after i
        first = np.ones(n, dtype=bool)
        first[1:] = uid[1:] != uid[:-1]
        starts = np.flatnonzero(first)
        ends = np.append(starts[1:], n)
        nxt = np.full(n, big, dtype=np.int64)
        for s, e in zip(starts, ends):
            rev = ok_idx[s:e][::-1]
            acc = np.minimum.accumulate(rev)[::-1]
            nxt[s:e - 1] = acc[1:]
        eidx = np.flatnonzero(err)
        rec_mask = nxt[eidx] < big
        gaps = np.where(rec_mask,
                        us[np.minimum(nxt[eidx], big - 1)]
                        - us[eidx], -1)
        return pd.DataFrame({
            "recovered": rec_mask.astype(np.int64),
            "gap": gaps.astype(np.int64),
        })

    res = (
        ev.map_batches(project, batch_format="pyarrow",
                       batch_size=None)
        .groupby(_BUCKET)
        .map_groups(recover, batch_format="pandas")
        .to_pandas()
    )
    if "gap" not in res.columns or len(res) == 0:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _REC_COLS})
    n_errors = len(res)
    gaps = res["gap"].to_numpy(np.int64)
    gaps = gaps[gaps >= 0]
    if n_errors == 0 or len(gaps) == 0:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _REC_COLS})
    med = float(np.percentile(gaps, 50)) / 1e6
    p90 = float(np.percentile(gaps, 90)) / 1e6
    return pa.table({
        "n_errors": pa.array([n_errors], pa.int64()),
        "n_recovered": pa.array([len(gaps)], pa.int64()),
        "median_sec_x1e3": pa.array(
            [_round_half_away(med * 1e3)], pa.int64()),
        "p90_sec_x1e3": pa.array(
            [_round_half_away(p90 * 1e3)], pa.int64()),
    })


RECOVERY_SQL = """
WITH e AS MATERIALIZED (
  SELECT user_id, EPOCH_US(ts) AS us, event_id,
         CASE WHEN event_type = 'error' THEN 1 ELSE 0 END
           AS is_err
  FROM events
  WHERE user_id IS NOT NULL AND ts IS NOT NULL
    AND event_id IS NOT NULL AND event_type IS NOT NULL
), nx AS MATERIALIZED (
  SELECT user_id, us, event_id, is_err,
         MIN(CASE WHEN is_err = 0 THEN us END)
           OVER (PARTITION BY user_id ORDER BY us, event_id
                 ROWS BETWEEN 1 FOLLOWING
                 AND UNBOUNDED FOLLOWING) AS next_ok
  FROM e
), err AS MATERIALIZED (
  SELECT us, next_ok FROM nx WHERE is_err = 1
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_errors,
       CAST(COUNT(next_ok) AS BIGINT) AS n_recovered,
       CAST(ROUND(MEDIAN(CAST(next_ok - us AS DOUBLE))
            / 1000000.0 * 1000, 0) AS BIGINT)
         AS median_sec_x1e3,
       CAST(ROUND(QUANTILE_CONT(CAST(next_ok - us AS DOUBLE),
                                0.9)
            / 1000000.0 * 1000, 0) AS BIGINT) AS p90_sec_x1e3
FROM err
HAVING COUNT(*) > 0 AND COUNT(next_ok) > 0
"""


def register_r4gq(queries: dict, oracles: dict) -> None:
    queries.update(
        {
            "knn_label_purity": q_knn_label_purity,
            "cross_brand_substitution": q_cross_brand_substitution,
            "error_recovery_quantiles": q_error_recovery_quantiles,
        }
    )
    oracles.update(
        {
            "knn_label_purity": KNN_PURITY_SQL,
            "cross_brand_substitution": SUBSTITUTION_SQL,
            "error_recovery_quantiles": RECOVERY_SQL,
        }
    )
