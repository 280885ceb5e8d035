"""Round-4 batch FW: forecast calibration, circular uniformity, and
kernel two-sample distance — Brier score + 10-bin expected
calibration error of the naive per-user "historical rate predicts
tomorrow" purchase forecaster, the Kuiper V statistic (the
rotation-invariant KS) of minute-of-hour uniformity, and the
quadratic-kernel MMD^2 between embedding label groups, which for
k(x,y) = (x.y)^2 reduces EXACTLY to the squared Frobenius distance
of second-moment matrices — a moment-closed kernel two-sample test
that needs no pairwise pass.

Exactness discipline: Brier/ECE inputs are integer day counts with
mirrored rational rates; the Kuiper grid uses the same discrete
ECDF formula on integer minute counts; MMD folds per-label
sum(x_i * x_j) moments as doubles from identical float32 inputs,
then one mirrored Frobenius fold."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from mimirsbrunn_ray.pipelines.queries_r4fk import _round_half_away
from mimirsbrunn_ray.stages.rollup import tree_merge

_DAY_US = 86_400_000_000
_MIN_US = 60_000_000
_ECE_BINS = 10
_EMB_DIM = 64


def _valid(b: pa.Table, cols) -> pa.Table:
    m = None
    for c in cols:
        v = pc.is_valid(b[c])
        m = v if m is None else pc.and_(m, v)
    return b.filter(m)


_BRIER_COLS = ["n_users", "n_days", "brier_ppm", "ece_ppm"]


def q_brier_ece_purchase_rate(sf_dir):
    """Calibration audit of the naive forecaster "a user's chance
    of purchasing on the final observed day equals their purchase-
    day rate over the preceding calendar span": one row with the
    Brier score and the 10-equal-width-bin expected calibration
    error over all active users.  Distinct (user, purchase-day)
    pairs and the user roster fold in one distributed pass; rates
    are exact integer ratios."""
    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "ts", "event_type"])

    def part(b: pa.Table) -> pa.Table:
        b = _valid(b, ("user_id", "ts", "event_type"))
        us = b["ts"].cast(pa.timestamp("us")).cast(pa.int64())
        day = pc.divide(us, _DAY_US)
        t = pa.table({
            "user_id": b["user_id"],
            "day": day,
            "isp": pc.cast(pc.equal(b["event_type"], "purchase"),
                           pa.int64()),
        })
        g = t.group_by(["user_id", "day"]).aggregate(
            [("isp", "max")])
        return g.rename_columns(["user_id", "day", "isp"])

    def comb(b: pa.Table) -> pa.Table:
        g = b.group_by(["user_id", "day"]).aggregate(
            [("isp", "max")])
        return g.rename_columns(["user_id", "day", "isp"])

    ud = tree_merge(
        ev.map_batches(part, batch_format="pyarrow",
                       batch_size=None),
        comb,
        final_shards=8,
        shard_cols=["user_id"],
    ).to_pandas()
    if "user_id" not in ud.columns or len(ud) == 0:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _BRIER_COLS})
    dmin = int(ud["day"].min())
    dmax = int(ud["day"].max())
    n_days = dmax - dmin + 1
    if n_days < 2:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _BRIER_COLS})
    g = ud.groupby("user_id")
    pd_before = g.apply(
        lambda x: int(((x["day"] < dmax)
                       & (x["isp"] == 1)).sum()),
        include_groups=False)
    y = g.apply(
        lambda x: int(((x["day"] == dmax)
                       & (x["isp"] == 1)).any()),
        include_groups=False)
    rate = pd_before.to_numpy(np.float64) / (n_days - 1)
    yv = y.to_numpy(np.float64)
    n = len(rate)
    brier = float(((rate - yv) ** 2).mean())
    bins = np.minimum((rate * _ECE_BINS).astype(np.int64),
                      _ECE_BINS - 1)
    ece = 0.0
    for b_ in range(_ECE_BINS):
        m = bins == b_
        nb = int(m.sum())
        if nb == 0:
            continue
        ece += nb / n * abs(float(yv[m].mean())
                            - float(rate[m].mean()))
    return pa.table({
        "n_users": pa.array([n], pa.int64()),
        "n_days": pa.array([n_days], pa.int64()),
        "brier_ppm": pa.array(
            [_round_half_away(brier * 1e6)], pa.int64()),
        "ece_ppm": pa.array(
            [_round_half_away(ece * 1e6)], pa.int64()),
    })


BRIER_SQL = f"""
WITH ud AS MATERIALIZED (
  SELECT user_id, EPOCH_US(ts) // {_DAY_US} AS day,
         CAST(MAX(CASE WHEN event_type = 'purchase'
                       THEN 1 ELSE 0 END) AS BIGINT) AS isp
  FROM events
  WHERE user_id IS NOT NULL AND ts IS NOT NULL
    AND event_type IS NOT NULL
  GROUP BY 1, 2
), span AS MATERIALIZED (
  SELECT MIN(day) AS dmin, MAX(day) AS dmax,
         MAX(day) - MIN(day) + 1 AS n_days
  FROM ud
), per_user AS MATERIALIZED (
  SELECT ud.user_id,
         CAST(SUM(CASE WHEN ud.day < span.dmax AND ud.isp = 1
                       THEN 1 ELSE 0 END) AS BIGINT) AS pb,
         CAST(MAX(CASE WHEN ud.day = span.dmax AND ud.isp = 1
                       THEN 1 ELSE 0 END) AS BIGINT) AS y,
         ANY_VALUE(span.n_days) AS n_days
  FROM ud CROSS JOIN span
  GROUP BY 1
), rt AS MATERIALIZED (
  SELECT user_id, y, n_days,
         CAST(pb AS DOUBLE) / (n_days - 1) AS rate,
         LEAST(CAST(FLOOR(CAST(pb AS DOUBLE) / (n_days - 1)
                          * {_ECE_BINS}) AS BIGINT),
               {_ECE_BINS - 1}) AS bin
  FROM per_user WHERE n_days >= 2
), binstat AS MATERIALIZED (
  SELECT bin, CAST(COUNT(*) AS BIGINT) AS nb,
         AVG(CAST(y AS DOUBLE)) AS acc,
         AVG(rate) AS conf
  FROM rt GROUP BY 1
), tot AS MATERIALIZED (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         ANY_VALUE(n_days) AS n_days,
         AVG((rate - y) * (rate - y)) AS brier
  FROM rt
)
SELECT tot.n AS n_users,
       CAST(tot.n_days AS BIGINT) AS n_days,
       CAST(ROUND(tot.brier * 1000000, 0) AS BIGINT)
         AS brier_ppm,
       CAST(ROUND(SUM(CAST(binstat.nb AS DOUBLE) / tot.n
                      * ABS(binstat.acc - binstat.conf))
            * 1000000, 0) AS BIGINT) AS ece_ppm
FROM binstat CROSS JOIN tot
GROUP BY tot.n, tot.n_days, tot.brier
"""

_KUIPER_COLS = ["n_events", "dplus_ppm", "dminus_ppm", "v_ppm"]


def q_kuiper_minute_uniformity(sf_dir):
    """Kuiper V test of minute-of-hour uniformity over all events:
    on the discrete 0..59 grid, D+ = max_m (Fn(m) - F0(m)) and
    D- = max_m (F0(m) - Fn(m-1)) with F0(m) = (m+1)/60, V = D+ +
    D- — unlike plain KS, V is invariant to rotating the minute
    origin, which is the right property for circular clock data.
    Minute counts fold as exact integers in one distributed pass."""
    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["ts"])

    def part(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_valid(b["ts"]))
        us = b["ts"].cast(pa.timestamp("us")).cast(pa.int64())
        mn = pc.divide(us, _MIN_US)
        moh = pc.subtract(
            mn, pc.multiply(pc.divide(mn, 60),
                            pa.scalar(60, pa.int64())))
        t = pa.table({"moh": moh})
        g = t.group_by(["moh"]).aggregate([([], "count_all")])
        return g.rename_columns(["moh", "c"])

    def comb(b: pa.Table) -> pa.Table:
        g = b.group_by(["moh"]).aggregate([("c", "sum")])
        return g.rename_columns(["moh", "c"])

    cc = tree_merge(
        ev.map_batches(part, batch_format="pyarrow",
                       batch_size=None),
        comb,
    ).to_pandas()
    if "moh" not in cc.columns or len(cc) == 0:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _KUIPER_COLS})
    counts = np.zeros(60, dtype=np.int64)
    counts[cc["moh"].to_numpy(np.int64)] = cc["c"].to_numpy(
        np.int64)
    n = int(counts.sum())
    if n == 0:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _KUIPER_COLS})
    fn = np.cumsum(counts) / n
    f0 = (np.arange(60, dtype=np.float64) + 1.0) / 60.0
    fn_prev = np.concatenate(([0.0], fn[:-1]))
    dplus = float((fn - f0).max())
    dminus = float((f0 - fn_prev).max())
    return pa.table({
        "n_events": pa.array([n], pa.int64()),
        "dplus_ppm": pa.array(
            [_round_half_away(dplus * 1e6)], pa.int64()),
        "dminus_ppm": pa.array(
            [_round_half_away(dminus * 1e6)], pa.int64()),
        "v_ppm": pa.array(
            [_round_half_away((dplus + dminus) * 1e6)],
            pa.int64()),
    })


KUIPER_SQL = f"""
WITH mc AS MATERIALIZED (
  SELECT (EPOCH_US(ts) // {_MIN_US}) % 60 AS moh,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM events WHERE ts IS NOT NULL
  GROUP BY 1
), grid AS MATERIALIZED (
  SELECT CAST(r.k AS BIGINT) AS moh, COALESCE(mc.c, 0) AS c
  FROM range(0, 60) r(k) LEFT JOIN mc ON mc.moh = r.k
), tot AS MATERIALIZED (
  SELECT CAST(SUM(c) AS BIGINT) AS n FROM grid
), ecdf AS MATERIALIZED (
  SELECT moh,
         CAST(SUM(c) OVER (ORDER BY moh
              ROWS UNBOUNDED PRECEDING) AS DOUBLE) / tot.n AS fn,
         (CAST(moh AS DOUBLE) + 1.0) / 60.0 AS f0,
         CAST(COALESCE(SUM(c) OVER (ORDER BY moh
              ROWS BETWEEN UNBOUNDED PRECEDING
              AND 1 PRECEDING), 0) AS DOUBLE) / tot.n AS fn_prev
  FROM grid CROSS JOIN tot
)
SELECT tot.n AS n_events,
       CAST(ROUND(MAX(fn - f0) * 1000000, 0) AS BIGINT)
         AS dplus_ppm,
       CAST(ROUND(MAX(f0 - fn_prev) * 1000000, 0) AS BIGINT)
         AS dminus_ppm,
       CAST(ROUND((MAX(fn - f0) + MAX(f0 - fn_prev))
            * 1000000, 0) AS BIGINT) AS v_ppm
FROM ecdf CROSS JOIN tot
GROUP BY tot.n
HAVING tot.n > 0
"""


def q_mmd_poly2_labels(sf_dir):
    """Quadratic-kernel MMD^2 between every pair of embedding label
    groups: for k(x, y) = (x . y)^2 the (biased, V-statistic) MMD^2
    equals || S_A - S_B ||_F^2 with S the group's second-moment
    matrix E[x x^T] — the kernel two-sample distance collapses to a
    moment computation, so NO pairwise vector pass exists at any
    scale.  Per-label moment cells fold as exact-input double sums
    in one distributed pass; the 45-pair Frobenius fold is driver
    math."""
    emb = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                          columns=["label", "embedding"])

    def part(b: pa.Table) -> pa.Table:
        b = _valid(b, ("label", "embedding"))
        if b.num_rows == 0:
            return pa.table({
                "label": pa.array([], pa.int64()),
                "ij": pa.array([], pa.int64()),
                "s": pa.array([], pa.float64()),
                "n": pa.array([], pa.int64()),
            })
        lab = b["label"].to_numpy(zero_copy_only=False).astype(
            np.int64)
        flat = b["embedding"].combine_chunks().flatten().to_numpy(
            zero_copy_only=False).astype(np.float64)
        x = flat.reshape(len(lab), -1)
        d = x.shape[1]
        rows = {"label": [], "ij": [], "s": [], "n": []}
        for lv in np.unique(lab):
            xs = x[lab == lv]
            s = xs.T @ xs
            rows["label"].extend([int(lv)] * (d * d))
            rows["ij"].extend(range(d * d))
            rows["s"].extend(s.ravel().tolist())
            rows["n"].extend([len(xs)] * (d * d))
        return pa.table({
            "label": pa.array(rows["label"], pa.int64()),
            "ij": pa.array(rows["ij"], pa.int64()),
            "s": pa.array(rows["s"], pa.float64()),
            "n": pa.array(rows["n"], pa.int64()),
        })

    def comb(b: pa.Table) -> pa.Table:
        g = b.group_by(["label", "ij"]).aggregate(
            [("s", "sum"), ("n", "max")])
        return g.rename_columns(["label", "ij", "s", "n"])

    # n must SUM across batches but is replicated per ij within a
    # batch; track it separately via a count partial
    def nc_part(b: pa.Table) -> pa.Table:
        b = _valid(b, ("label", "embedding"))
        g = b.group_by(["label"]).aggregate([([], "count_all")])
        return g.rename_columns(["label", "n"])

    def nc_comb(b: pa.Table) -> pa.Table:
        g = b.group_by(["label"]).aggregate([("n", "sum")])
        return g.rename_columns(["label", "n"])

    def s_comb(b: pa.Table) -> pa.Table:
        g = b.group_by(["label", "ij"]).aggregate([("s", "sum")])
        return g.rename_columns(["label", "ij", "s"])

    emb = emb.materialize()
    sm = tree_merge(
        emb.map_batches(
            lambda b: part(b).select(["label", "ij", "s"]),
            batch_format="pyarrow", batch_size=None),
        s_comb,
    ).to_pandas()
    nm = tree_merge(
        emb.map_batches(nc_part, batch_format="pyarrow",
                        batch_size=None),
        nc_comb,
    ).to_pandas()
    cols = ["label_a", "label_b", "n_a", "n_b", "mmd2_x1e9"]
    if ("label" not in sm.columns or len(sm) == 0
            or "label" not in nm.columns):
        return pa.table(
            {c: pa.array([], pa.int64()) for c in cols})
    ncount = dict(zip(nm["label"].astype(np.int64),
                      nm["n"].astype(np.int64)))
    mats = {}
    for lv, g in sm.groupby("label"):
        d = int(np.sqrt(len(g)))
        s = np.zeros(d * d)
        s[g["ij"].to_numpy(np.int64)] = g["s"].to_numpy(
            np.float64)
        mats[int(lv)] = s / ncount[int(lv)]
    labels = sorted(mats)
    out = {c: [] for c in cols}
    for i in range(len(labels)):
        for j in range(i + 1, len(labels)):
            la, lb = labels[i], labels[j]
            diff = mats[la] - mats[lb]
            out["label_a"].append(la)
            out["label_b"].append(lb)
            out["n_a"].append(ncount[la])
            out["n_b"].append(ncount[lb])
            out["mmd2_x1e9"].append(
                _round_half_away(float((diff * diff).sum())
                                 * 1e9))
    return pa.table(
        {c: pa.array(out[c], pa.int64()) for c in cols})


MMD_SQL = f"""
WITH v AS MATERIALIZED (
  SELECT label, vec_id, r.k AS i,
         CAST(embedding[CAST(r.k AS INTEGER)] AS DOUBLE) AS x
  FROM embeddings CROSS JOIN range(1, {_EMB_DIM + 1}) r(k)
  WHERE label IS NOT NULL AND embedding IS NOT NULL
), nm AS MATERIALIZED (
  SELECT label, CAST(COUNT(DISTINCT vec_id) AS BIGINT) AS n
  FROM v GROUP BY 1
), mom AS MATERIALIZED (
  SELECT a.label, a.i, b.i AS j,
         SUM(a.x * b.x) / ANY_VALUE(nm.n) AS s
  FROM v a
  JOIN v b ON a.vec_id = b.vec_id AND a.label = b.label
  JOIN nm ON nm.label = a.label
  GROUP BY 1, 2, 3
)
SELECT CAST(ma.label AS BIGINT) AS label_a,
       CAST(mb.label AS BIGINT) AS label_b,
       ANY_VALUE(na.n) AS n_a,
       ANY_VALUE(nb.n) AS n_b,
       CAST(ROUND(SUM((ma.s - mb.s) * (ma.s - mb.s))
            * 1000000000, 0) AS BIGINT) AS mmd2_x1e9
FROM mom ma
JOIN mom mb ON ma.i = mb.i AND ma.j = mb.j
           AND ma.label < mb.label
JOIN nm na ON na.label = ma.label
JOIN nm nb ON nb.label = mb.label
GROUP BY ma.label, mb.label
ORDER BY label_a, label_b
"""


def register_r4fw(queries: dict, oracles: dict) -> None:
    queries.update(
        {
            "brier_ece_purchase_rate": q_brier_ece_purchase_rate,
            "kuiper_minute_uniformity": q_kuiper_minute_uniformity,
            "mmd_poly2_labels": q_mmd_poly2_labels,
        }
    )
    oracles.update(
        {
            "brier_ece_purchase_rate": BRIER_SQL,
            "kuiper_minute_uniformity": KUIPER_SQL,
            "mmd_poly2_labels": MMD_SQL,
        }
    )
