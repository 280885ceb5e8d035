"""Round-4 batch GG: blocking probability, market-share momentum,
and moment-closed cluster quality — the Erlang-B blocking
probability of each event stream at mean-rate capacity plus two
servers of headroom (the classic sizing recursion, evaluated
sequentially on both engines), supplier revenue-share momentum
between the first and second half of the observation window
(top-10 gainers — who is winning the catalog), and a silhouette-
style intra/inter squared-distance ratio per embedding label
computed ENTIRELY from first/second moments (E||x-y||^2 = tr(S_A)
+ tr(S_B) - 2 mu_A . mu_B — no pairwise pass at any scale).

Exactness discipline: the Erlang recursion B_k = a B_{k-1} / (k +
a B_{k-1}) runs the same fixed k order with identical doubles;
momentum shares are exact integer cents snapped to ppm BEFORE the
top-10 rank; silhouette moments fold identical double sums from
identical inputs."""

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

_ERLANG_HEADROOM = 2
_MOM_TOP = 10
_EMB_DIM = 64


def _valid(b: pa.Table, cols) -> pa.Table:
    m = None
    for c in cols:
        v = pc.is_valid(b[c])
        m = v if m is None else pc.and_(m, v)
    return b.filter(m)


_ERL_COLS = ["event_type", "capacity", "offered_x1e3",
             "blocking_ppm"]


def q_erlang_b_blocking(sf_dir):
    """Erlang-B blocking probability per event type: offered load
    a = mean hourly count (erlangs at unit service time), capacity
    c = ceil(a) + 2 headroom servers, B computed by the standard
    recursion B_k = a*B_{k-1} / (k + a*B_{k-1}) from B_0 = 1 — the
    fraction of arrivals a loss system of that size would turn
    away, i.e. the classic answer to "is mean-plus-two enough?".
    Counts fold in one distributed pass; the recursion runs the
    same k order on both engines."""
    g = _dense_hour_counts(sf_dir)
    if g is None:
        return pa.table({
            "event_type": pa.array([], pa.string()),
            **{c: pa.array([], pa.int64()) for c in _ERL_COLS[1:]},
        })
    out = {c: [] for c in _ERL_COLS}
    for et, sub in g.groupby("event_type", sort=True):
        c = sub.sort_values("hour")["c"].to_numpy(np.int64)
        T = len(c)
        total = int(c.sum())
        if T == 0 or total == 0:
            continue
        a = total / T
        cap = (total + T - 1) // T + _ERLANG_HEADROOM
        b = 1.0
        for k in range(1, cap + 1):
            b = a * b / (k + a * b)
        out["event_type"].append(et)
        out["capacity"].append(cap)
        out["offered_x1e3"].append(_round_half_away(a * 1e3))
        out["blocking_ppm"].append(_round_half_away(b * 1e6))
    return pa.table({
        "event_type": pa.array(out["event_type"], pa.string()),
        **{c: pa.array(out[c], pa.int64()) for c in _ERL_COLS[1:]},
    })


ERLANG_SQL = f"""
WITH RECURSIVE hc AS MATERIALIZED (
  SELECT event_type, EPOCH_US(ts) // 3600000000 AS hour,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM events
  WHERE event_type IS NOT NULL AND ts IS NOT NULL
  GROUP BY 1, 2
), span AS MATERIALIZED (
  SELECT MIN(hour) AS hmin, MAX(hour) AS hmax,
         MAX(hour) - MIN(hour) + 1 AS t
  FROM hc
), loads AS MATERIALIZED (
  SELECT hc.event_type,
         CAST(SUM(hc.c) AS BIGINT) AS total,
         ANY_VALUE(span.t) AS t,
         CAST(SUM(hc.c) AS DOUBLE) / ANY_VALUE(span.t) AS a,
         (CAST(SUM(hc.c) AS BIGINT) + ANY_VALUE(span.t) - 1)
           // ANY_VALUE(span.t) + {_ERLANG_HEADROOM} AS cap
  FROM hc CROSS JOIN span
  GROUP BY 1
  HAVING SUM(hc.c) > 0
), rec AS (
  SELECT event_type, a, cap, CAST(0 AS BIGINT) AS k,
         CAST(1.0 AS DOUBLE) AS b
  FROM loads
  UNION ALL
  SELECT event_type, a, cap, k + 1,
         a * b / ((k + 1) + a * b)
  FROM rec WHERE k < cap
)
SELECT event_type,
       CAST(cap AS BIGINT) AS capacity,
       CAST(ROUND(a * 1000, 0) AS BIGINT) AS offered_x1e3,
       CAST(ROUND(b * 1000000, 0) AS BIGINT) AS blocking_ppm
FROM rec WHERE k = cap ORDER BY event_type
"""

_MOM_COLS = ["suppkey", "rev_h1_cents", "rev_h2_cents",
             "share_h1_ppm", "share_h2_ppm", "delta_ppm"]


def q_supplier_share_momentum(sf_dir):
    """Top-10 suppliers by revenue-share momentum: split the
    observed ship-month span at its midpoint, compute each
    supplier's share of total discounted revenue in each half
    (exact cents), and rank by the ppm share delta (snapped BEFORE
    ranking; ties to the lowest suppkey) — who is actually gaining
    the catalog, volume growth aside.  One distributed revenue
    pass."""
    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_suppkey", "l_shipdate", "l_extendedprice",
                 "l_discount"])

    def part(b: pa.Table) -> pa.Table:
        b = _valid(b, ("l_suppkey", "l_shipdate",
                       "l_extendedprice", "l_discount"))
        if b.num_rows == 0:
            return pa.table({
                "suppkey": pa.array([], pa.int64()),
                "mon": pa.array([], pa.int64()),
                "cents": pa.array([], pa.int64()),
            })
        d = b["l_shipdate"].cast(pa.timestamp("us")).to_pandas()
        mon = (d.dt.year * 12 + d.dt.month - 1).to_numpy(np.int64)
        rev = (b["l_extendedprice"].cast(pa.float64()).to_numpy(
            zero_copy_only=False)
            * (1.0 - b["l_discount"].cast(pa.float64()).to_numpy(
                zero_copy_only=False)))
        cents = np.where(
            rev >= 0, np.floor(rev * 100.0 + 0.5),
            np.ceil(rev * 100.0 - 0.5)).astype(np.int64)
        t = pa.table({
            "suppkey": b["l_suppkey"].cast(pa.int64()),
            "mon": pa.array(mon),
            "cents": pa.array(cents),
        })
        g = t.group_by(["suppkey", "mon"]).aggregate(
            [("cents", "sum")])
        return g.rename_columns(["suppkey", "mon", "cents"])

    def comb(b: pa.Table) -> pa.Table:
        g = b.group_by(["suppkey", "mon"]).aggregate(
            [("cents", "sum")])
        return g.rename_columns(["suppkey", "mon", "cents"])

    sm = tree_merge(
        li.map_batches(part, batch_format="pyarrow",
                       batch_size=None),
        comb,
        final_shards=8,
        shard_cols=["suppkey"],
    ).to_pandas()
    if "suppkey" not in sm.columns or len(sm) == 0:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _MOM_COLS})
    mid = (int(sm["mon"].min()) + int(sm["mon"].max())) // 2
    sm["half"] = np.where(sm["mon"].to_numpy(np.int64) <= mid,
                          1, 2)
    agg = sm.pivot_table(index="suppkey", columns="half",
                         values="cents", aggfunc="sum",
                         fill_value=0)
    agg = agg.reindex(columns=[1, 2], fill_value=0)
    h1 = agg[1].to_numpy(np.int64)
    h2 = agg[2].to_numpy(np.int64)
    t1, t2 = int(h1.sum()), int(h2.sum())
    if t1 == 0 or t2 == 0:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _MOM_COLS})
    s1 = np.array([_round_half_away(v / t1 * 1e6) for v in h1],
                  np.int64)
    s2 = np.array([_round_half_away(v / t2 * 1e6) for v in h2],
                  np.int64)
    df = pd.DataFrame({
        "suppkey": agg.index.to_numpy(np.int64),
        "rev_h1_cents": h1, "rev_h2_cents": h2,
        "share_h1_ppm": s1, "share_h2_ppm": s2,
        "delta_ppm": s2 - s1,
    }).sort_values(["delta_ppm", "suppkey"],
                   ascending=[False, True],
                   ignore_index=True).head(_MOM_TOP)
    return pa.table(
        {c: pa.array(df[c].to_numpy(np.int64))
         for c in _MOM_COLS})


MOMENTUM_SQL = f"""
WITH lr AS MATERIALIZED (
  SELECT l_suppkey AS suppkey,
         YEAR(l_shipdate) * 12 + MONTH(l_shipdate) - 1 AS mon,
         CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount)
                             * 100, 0) AS BIGINT)) AS BIGINT)
           AS cents
  FROM lineitem
  WHERE l_suppkey IS NOT NULL AND l_shipdate IS NOT NULL
    AND l_extendedprice IS NOT NULL AND l_discount IS NOT NULL
  GROUP BY 1, 2
), span AS MATERIALIZED (
  SELECT (MIN(mon) + MAX(mon)) // 2 AS mid FROM lr
), halves AS MATERIALIZED (
  SELECT suppkey,
         CAST(SUM(CASE WHEN mon <= span.mid THEN cents ELSE 0
                  END) AS BIGINT) AS h1,
         CAST(SUM(CASE WHEN mon > span.mid THEN cents ELSE 0
                  END) AS BIGINT) AS h2
  FROM lr CROSS JOIN span GROUP BY 1
), tot AS MATERIALIZED (
  SELECT CAST(SUM(h1) AS BIGINT) AS t1,
         CAST(SUM(h2) AS BIGINT) AS t2
  FROM halves
), sh AS (
  SELECT suppkey, h1, h2,
         CAST(ROUND(CAST(h1 AS DOUBLE) / tot.t1 * 1000000, 0)
              AS BIGINT) AS s1,
         CAST(ROUND(CAST(h2 AS DOUBLE) / tot.t2 * 1000000, 0)
              AS BIGINT) AS s2
  FROM halves CROSS JOIN tot
  WHERE tot.t1 <> 0 AND tot.t2 <> 0
)
SELECT CAST(suppkey AS BIGINT) AS suppkey,
       h1 AS rev_h1_cents,
       h2 AS rev_h2_cents,
       s1 AS share_h1_ppm,
       s2 AS share_h2_ppm,
       s2 - s1 AS delta_ppm
FROM sh
ORDER BY s2 - s1 DESC, suppkey
LIMIT {_MOM_TOP}
"""

_SIL_COLS = ["label", "n_vecs", "intra_x1e6", "inter_x1e6",
             "ratio_ppm"]


def q_silhouette_moment_ratio(sf_dir):
    """Moment-closed silhouette-style quality per embedding label:
    mean intra-label squared distance 2*(tr(S_A) - ||mu_A||^2)
    versus the mean squared distance to the pooled complement
    tr(S_A) + tr(S_B) - 2 mu_A . mu_B — both derive from per-label
    (n, sum x, sum ||x||^2) partials only, so the cluster-quality
    number needs NO pairwise pass at any scale; ratio < 1 means
    the label is tighter than its surroundings.  One distributed
    moment pass."""
    emb = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                          columns=["label", "embedding"])

    def part(b: pa.Table) -> pa.Table:
        b = _valid(b, ("label", "embedding"))
        if b.num_rows == 0:
            return pa.table({
                "label": pa.array([], pa.int64()),
                "j": pa.array([], pa.int64()),
                "s": pa.array([], pa.float64()),
                "ss": pa.array([], pa.float64()),
                "n": pa.array([], pa.int64()),
            })
        lab = b["label"].to_numpy(zero_copy_only=False).astype(
            np.int64)
        x = b["embedding"].combine_chunks().flatten().to_numpy(
            zero_copy_only=False).astype(np.float64).reshape(
            len(lab), -1)
        d = x.shape[1]
        rows = {"label": [], "j": [], "s": [], "ss": [], "n": []}
        for lv in np.unique(lab):
            xs = x[lab == lv]
            ssv = float((xs * xs).sum())
            sums = xs.sum(axis=0)
            rows["label"].extend([int(lv)] * d)
            rows["j"].extend(range(d))
            rows["s"].extend(sums.tolist())
            rows["ss"].extend([ssv / d] * d)
            rows["n"].extend([len(xs)] * d)
        return pa.table({
            "label": pa.array(rows["label"], pa.int64()),
            "j": pa.array(rows["j"], pa.int64()),
            "s": pa.array(rows["s"], pa.float64()),
            "ss": pa.array(rows["ss"], pa.float64()),
            "n": pa.array(rows["n"], pa.int64()),
        })

    def comb(b: pa.Table) -> pa.Table:
        g = b.group_by(["label", "j"]).aggregate(
            [("s", "sum"), ("ss", "sum"), ("n", "sum")])
        return g.rename_columns(["label", "j", "s", "ss", "n"])

    mm = tree_merge(
        emb.map_batches(part, batch_format="pyarrow",
                        batch_size=None),
        comb,
    ).to_pandas()
    if "label" not in mm.columns or len(mm) == 0:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _SIL_COLS})
    labels = sorted(mm["label"].unique())
    stats = {}
    for lv in labels:
        g = mm[mm["label"] == lv].sort_values("j")
        n = int(g["n"].iloc[0])
        mu = g["s"].to_numpy(np.float64) / n
        tr = float(g["ss"].sum()) / n  # ss replicated per j / d
        stats[lv] = (n, mu, tr)
    out = {c: [] for c in _SIL_COLS}
    for lv in labels:
        n_a, mu_a, tr_a = stats[lv]
        # pooled complement moments
        n_b = sum(stats[o][0] for o in labels if o != lv)
        if n_b == 0 or n_a == 0:
            continue
        sum_b = np.zeros_like(mu_a)
        ss_b = 0.0
        for o in labels:
            if o == lv:
                continue
            n_o, mu_o, tr_o = stats[o]
            sum_b += mu_o * n_o
            ss_b += tr_o * n_o
        mu_b = sum_b / n_b
        tr_b = ss_b / n_b
        intra = 2.0 * (tr_a - float(mu_a @ mu_a))
        inter = tr_a + tr_b - 2.0 * float(mu_a @ mu_b)
        if inter == 0:
            continue
        out["label"].append(lv)
        out["n_vecs"].append(n_a)
        out["intra_x1e6"].append(_round_half_away(intra * 1e6))
        out["inter_x1e6"].append(_round_half_away(inter * 1e6))
        out["ratio_ppm"].append(
            _round_half_away(intra / inter * 1e6))
    return pa.table(
        {c: pa.array(out[c], pa.int64()) for c in _SIL_COLS})


SILHOUETTE_SQL = f"""
WITH v AS MATERIALIZED (
  SELECT label, vec_id, r.k - 1 AS j,
         CAST(embedding[CAST(r.k AS INTEGER)] AS DOUBLE) AS x
  FROM embeddings CROSS JOIN range(1, {_EMB_DIM + 1}) r(k)
  WHERE label IS NOT NULL AND embedding IS NOT NULL
), percell AS MATERIALIZED (
  SELECT label, j, SUM(x) AS s,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM v GROUP BY 1, 2
), pern AS MATERIALIZED (
  SELECT label, CAST(COUNT(DISTINCT vec_id) AS BIGINT) AS n,
         SUM(x * x) AS ss
  FROM v GROUP BY 1
), mu AS MATERIALIZED (
  SELECT pc.label, pc.j, pc.s / pn.n AS mu
  FROM percell pc JOIN pern pn USING (label)
), compl AS MATERIALIZED (
  SELECT a.label,
         SUM(CASE WHEN b.label <> a.label THEN b.n ELSE 0 END)
           AS n_b,
         SUM(CASE WHEN b.label <> a.label THEN b.ss ELSE 0 END)
           AS ss_b
  FROM pern a CROSS JOIN pern b
  GROUP BY 1
), mu_b AS MATERIALIZED (
  SELECT a.label, m.j,
         SUM(CASE WHEN m.label <> a.label
                  THEN m.mu * pn.n ELSE 0 END)
           / ANY_VALUE(c.n_b) AS mub
  FROM (SELECT DISTINCT label FROM pern) a
  CROSS JOIN mu m
  JOIN pern pn ON pn.label = m.label
  JOIN compl c ON c.label = a.label
  WHERE c.n_b > 0
  GROUP BY 1, 2
), dots AS MATERIALIZED (
  SELECT mu.label,
         SUM(mu.mu * mu.mu) AS mua2,
         SUM(mu.mu * mb.mub) AS muab
  FROM mu JOIN mu_b mb ON mb.label = mu.label
                      AND mb.j = mu.j
  GROUP BY 1
), fin AS (
  SELECT pn.label, pn.n,
         2.0 * (pn.ss / pn.n - d.mua2) AS intra,
         pn.ss / pn.n + c.ss_b / c.n_b - 2.0 * d.muab AS inter
  FROM pern pn
  JOIN dots d USING (label)
  JOIN compl c USING (label)
  WHERE c.n_b > 0 AND pn.n > 0
)
SELECT CAST(label AS BIGINT) AS label,
       n AS n_vecs,
       CAST(ROUND(intra * 1000000, 0) AS BIGINT) AS intra_x1e6,
       CAST(ROUND(inter * 1000000, 0) AS BIGINT) AS inter_x1e6,
       CAST(ROUND(intra / inter * 1000000, 0) AS BIGINT)
         AS ratio_ppm
FROM fin WHERE inter <> 0 ORDER BY label
"""


def register_r4gg(queries: dict, oracles: dict) -> None:
    queries.update(
        {
            "erlang_b_blocking": q_erlang_b_blocking,
            "supplier_share_momentum": q_supplier_share_momentum,
            "silhouette_moment_ratio": q_silhouette_moment_ratio,
        }
    )
    oracles.update(
        {
            "erlang_b_blocking": ERLANG_SQL,
            "supplier_share_momentum": MOMENTUM_SQL,
            "silhouette_moment_ratio": SILHOUETTE_SQL,
        }
    )
