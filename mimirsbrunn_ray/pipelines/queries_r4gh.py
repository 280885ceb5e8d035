"""Round-4 batch GH: timestamp forensics, inventory planning, and
embedding-norm structure — a timestamp precision census (what
fraction of event times are whole minutes / seconds / milliseconds
— the fingerprint of upstream truncation or synthetic data), a
newsvendor stocking plan per part brand (stock at the exact
rank-based 0.8 critical fractile of daily demand including zero
days, plus how often that stock would have run out), and a one-way
ANOVA F of squared embedding norms across labels (do labels differ
in vector magnitude — a common leak that distance-based probes
silently exploit).

Exactness discipline: precision shares and stockout counts are
pure integers (the fractile is an order statistic at integer rank
(8n+9)//10, no float quantile); the ANOVA folds exact-input double
(n, S, SS) partials through the identical F closed form."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from mimirsbrunn_ray.pipelines.queries_r4fk import (
    _DAY_US,
    _round_half_away,
)
from mimirsbrunn_ray.stages.dedup import _BUCKET, add_bucket
from mimirsbrunn_ray.stages.rollup import tree_merge


def _valid(b: pa.Table, cols) -> pa.Table:
    m = None
    for c in cols:
        v = pc.is_valid(b[c])
        m = v if m is None else pc.and_(m, v)
    return b.filter(m)


_TSP_COLS = ["n_events", "whole_minute_ppm", "whole_second_ppm",
             "whole_milli_ppm"]


def q_timestamp_precision_census(sf_dir):
    """Timestamp precision fingerprint over all events: the share
    of timestamps that are exact whole minutes, whole seconds, and
    whole milliseconds — real clickstreams are ~uniform in the
    sub-second digits, so a spike at whole units exposes upstream
    truncation, batch backfill, or synthetic generation.  Pure
    integer modular counts, one distributed pass."""
    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["ts"])

    def part(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_valid(b["ts"]))
        us = b["ts"].cast(pa.timestamp("us")).cast(
            pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table({
            "n": pa.array([len(us)], pa.int64()),
            "wm": pa.array([int((us % 60_000_000 == 0).sum())],
                           pa.int64()),
            "ws": pa.array([int((us % 1_000_000 == 0).sum())],
                           pa.int64()),
            "wms": pa.array([int((us % 1_000 == 0).sum())],
                            pa.int64()),
        })

    def comb(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({
                c: pa.array([], pa.int64())
                for c in ["n", "wm", "ws", "wms"]})
        return pa.table({
            c: pa.array([pc.sum(b[c]).as_py() or 0], pa.int64())
            for c in ["n", "wm", "ws", "wms"]})

    t = tree_merge(
        ev.map_batches(part, batch_format="pyarrow",
                       batch_size=None),
        comb,
    ).to_pandas()
    if "n" not in t.columns or len(t) == 0 or int(
            t["n"].iloc[0]) == 0:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _TSP_COLS})
    n = int(t["n"].iloc[0])
    wm = int(t["wm"].iloc[0])
    ws = int(t["ws"].iloc[0])
    wms = int(t["wms"].iloc[0])
    return pa.table({
        "n_events": pa.array([n], pa.int64()),
        "whole_minute_ppm": pa.array(
            [_round_half_away(wm / n * 1e6)], pa.int64()),
        "whole_second_ppm": pa.array(
            [_round_half_away(ws / n * 1e6)], pa.int64()),
        "whole_milli_ppm": pa.array(
            [_round_half_away(wms / n * 1e6)], pa.int64()),
    })


TSP_SQL = """
WITH e AS MATERIALIZED (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CASE WHEN EPOCH_US(ts) % 60000000 = 0
                       THEN 1 ELSE 0 END) AS BIGINT) AS wm,
         CAST(SUM(CASE WHEN EPOCH_US(ts) % 1000000 = 0
                       THEN 1 ELSE 0 END) AS BIGINT) AS ws,
         CAST(SUM(CASE WHEN EPOCH_US(ts) % 1000 = 0
                       THEN 1 ELSE 0 END) AS BIGINT) AS wms
  FROM events WHERE ts IS NOT NULL
)
SELECT n AS n_events,
       CAST(ROUND(CAST(wm AS DOUBLE) / n * 1000000, 0) AS BIGINT)
         AS whole_minute_ppm,
       CAST(ROUND(CAST(ws AS DOUBLE) / n * 1000000, 0) AS BIGINT)
         AS whole_second_ppm,
       CAST(ROUND(CAST(wms AS DOUBLE) / n * 1000000, 0)
            AS BIGINT) AS whole_milli_ppm
FROM e WHERE n > 0
"""

_NV_COLS = ["brand", "n_days", "stock_qty", "n_stockout_days",
            "stockout_ppm"]


def q_newsvendor_stock_plan(sf_dir):
    """Newsvendor stocking plan per part brand at the 0.8 critical
    fractile: daily shipped quantity per brand over the dense day
    span (zero-demand days included — omitting them is the classic
    overstocking bug), stock level = the exact order statistic at
    integer rank (8n+9)//10, and the share of days that demand
    would still have exceeded it.  Brand attaches by broadcast;
    per-(brand, day) quantities fold int64; the fractile is pure
    rank math."""
    # the brand attaches via budget-gated broadcast / join
    # (stages/broadcast.py) — the part dim never lands whole on the
    # driver
    from mimirsbrunn_ray.stages.broadcast import attach_dim

    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_shipdate", "l_quantity"])
    li = li.map_batches(
        lambda b: _valid(b, ("l_partkey", "l_shipdate", "l_quantity")),
        batch_format="pyarrow", batch_size=None)
    li = attach_dim(li, "l_partkey", sf_dir, "part", "p_partkey",
                    ["p_brand"], how="inner", out_names=["brand"])

    def part(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({
                "brand": pa.array([], pa.string()),
                "day": pa.array([], pa.int64()),
                "q": pa.array([], pa.int64()),
            })
        us = b["l_shipdate"].cast(pa.timestamp("us")).cast(
            pa.int64()).to_numpy(zero_copy_only=False)
        x = b["l_quantity"].cast(pa.float64()).to_numpy(
            zero_copy_only=False)
        q = np.where(x >= 0, np.floor(x + 0.5),
                     np.ceil(x - 0.5)).astype(np.int64)
        t = pa.table({
            "brand": b["brand"].cast(pa.string()),
            "day": pa.array(us // _DAY_US),
            "q": pa.array(q),
        })
        g = t.group_by(["brand", "day"]).aggregate([("q", "sum")])
        return g.rename_columns(["brand", "day", "q"])

    def comb(b: pa.Table) -> pa.Table:
        g = b.group_by(["brand", "day"]).aggregate([("q", "sum")])
        return g.rename_columns(["brand", "day", "q"])

    bd = tree_merge(
        li.map_batches(part, batch_format="pyarrow",
                       batch_size=None),
        comb,
        final_shards=8,
        shard_cols=["brand"],
    ).to_pandas()
    if "brand" not in bd.columns or len(bd) == 0:
        return pa.table({
            "brand": pa.array([], pa.string()),
            **{c: pa.array([], pa.int64()) for c in _NV_COLS[1:]},
        })
    dmin = int(bd["day"].min())
    dmax = int(bd["day"].max())
    n_days = dmax - dmin + 1
    out = {c: [] for c in _NV_COLS}
    for brand, g in bd.groupby("brand", sort=True):
        v = np.zeros(n_days, dtype=np.int64)
        v[g["day"].to_numpy(np.int64) - dmin] = g["q"].to_numpy(
            np.int64)
        rank = (8 * n_days + 9) // 10  # exact ceil(0.8 n), 1-based
        stock = int(np.sort(v, kind="mergesort")[rank - 1])
        n_out = int((v > stock).sum())
        out["brand"].append(brand)
        out["n_days"].append(n_days)
        out["stock_qty"].append(stock)
        out["n_stockout_days"].append(n_out)
        out["stockout_ppm"].append(
            _round_half_away(n_out / n_days * 1e6))
    return pa.table({
        "brand": pa.array(out["brand"], pa.string()),
        **{c: pa.array(out[c], pa.int64()) for c in _NV_COLS[1:]},
    })


NEWSVENDOR_SQL = f"""
WITH bdq AS MATERIALIZED (
  SELECT p.p_brand AS brand,
         EPOCH_US(l.l_shipdate) // {_DAY_US} AS day,
         CAST(SUM(CAST(ROUND(l.l_quantity, 0) AS BIGINT))
              AS BIGINT) AS q
  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
  WHERE l.l_partkey IS NOT NULL AND l.l_shipdate IS NOT NULL
    AND l.l_quantity IS NOT NULL
  GROUP BY 1, 2
), span AS MATERIALIZED (
  SELECT MIN(day) AS dmin, MAX(day) AS dmax,
         MAX(day) - MIN(day) + 1 AS n_days
  FROM bdq
), grid AS MATERIALIZED (
  SELECT b.brand, s.dmin + r.k AS day,
         COALESCE(bdq.q, 0) AS q, s.n_days
  FROM (SELECT DISTINCT brand FROM bdq) b
  CROSS JOIN span s
  JOIN range(0, 100000) r(k) ON s.dmin + r.k <= s.dmax
  LEFT JOIN bdq ON bdq.brand = b.brand
               AND bdq.day = s.dmin + r.k
), stock AS MATERIALIZED (
  SELECT brand, q AS stock_qty, n_days
  FROM (SELECT brand, q, n_days,
               ROW_NUMBER() OVER (PARTITION BY brand
                                  ORDER BY q, day) AS rn
        FROM grid)
  WHERE rn = (8 * n_days + 9) // 10
)
SELECT g.brand,
       CAST(ANY_VALUE(st.n_days) AS BIGINT) AS n_days,
       CAST(ANY_VALUE(st.stock_qty) AS BIGINT) AS stock_qty,
       CAST(SUM(CASE WHEN g.q > st.stock_qty THEN 1 ELSE 0 END)
            AS BIGINT) AS n_stockout_days,
       CAST(ROUND(CAST(SUM(CASE WHEN g.q > st.stock_qty
                                THEN 1 ELSE 0 END) AS DOUBLE)
            / ANY_VALUE(st.n_days) * 1000000, 0) AS BIGINT)
         AS stockout_ppm
FROM grid g JOIN stock st USING (brand)
GROUP BY g.brand
ORDER BY g.brand
"""

_ANOVA_COLS = ["n_labels", "n_vecs", "f_x1e3", "ss_between_x1e9",
               "ss_within_x1e9"]

_EMB_DIM = 64


def q_embedding_norm_anova(sf_dir):
    """One-way ANOVA of SQUARED embedding norms across labels: F =
    (SSB/(k-1)) / (SSW/(N-k)) over per-vector ||x||^2 — a large F
    means labels differ in magnitude, a leak that lets distance
    probes 'classify' without any directional signal (and the cue
    to L2-normalize before indexing).  TWO passes: per-label means
    first, then centered squared deviations — the one-pass ss -
    s^2/n identity loses ~8 digits to cancellation on near-unit
    norms and is exactly the bug this mirrors around."""
    emb = rd.read_parquet(
        f"{sf_dir}/embeddings.parquet",
        columns=["label", "embedding"]).materialize()

    def mpart(b: pa.Table) -> pa.Table:
        b = _valid(b, ("label", "embedding"))
        if b.num_rows == 0:
            return pa.table({
                "label": pa.array([], pa.int64()),
                "n": pa.array([], pa.int64()),
                "s": pa.array([], pa.float64()),
            })
        lab = b["label"].to_numpy(zero_copy_only=False).astype(
            np.int64)
        x = b["embedding"].combine_chunks().flatten().to_numpy(
            zero_copy_only=False).astype(np.float64).reshape(
            len(lab), -1)
        nrm2 = (x * x).sum(axis=1)
        df = pd.DataFrame({"label": lab, "v": nrm2})
        agg = df.groupby("label", sort=False).agg(
            n=("v", "size"), s=("v", "sum")).reset_index()
        agg["n"] = agg["n"].astype(np.int64)
        return pa.Table.from_pandas(agg, preserve_index=False)

    def mcomb(b: pa.Table) -> pa.Table:
        g = b.group_by(["label"]).aggregate(
            [("n", "sum"), ("s", "sum")])
        return g.rename_columns(["label", "n", "s"])

    mm = tree_merge(
        emb.map_batches(mpart, batch_format="pyarrow",
                        batch_size=None),
        mcomb,
    ).to_pandas()
    if "label" not in mm.columns or len(mm) == 0:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _ANOVA_COLS})
    n = mm["n"].to_numpy(np.int64)
    s = mm["s"].to_numpy(np.float64)
    k = len(mm)
    N = int(n.sum())
    if k < 2 or N <= k:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _ANOVA_COLS})
    means = dict(zip(mm["label"].astype(np.int64), s / n))

    def wpart(b: pa.Table) -> pa.Table:
        b = _valid(b, ("label", "embedding"))
        if b.num_rows == 0:
            return pa.table({"ssw": pa.array([], pa.float64())})
        lab = b["label"].to_numpy(zero_copy_only=False).astype(
            np.int64)
        x = b["embedding"].combine_chunks().flatten().to_numpy(
            zero_copy_only=False).astype(np.float64).reshape(
            len(lab), -1)
        nrm2 = (x * x).sum(axis=1)
        mu = np.array([means.get(int(v), 0.0) for v in lab])
        d = nrm2 - mu
        return pa.table(
            {"ssw": pa.array([float((d * d).sum())],
                             pa.float64())})

    def wcomb(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"ssw": pa.array([], pa.float64())})
        return pa.table(
            {"ssw": pa.array([pc.sum(b["ssw"]).as_py() or 0.0],
                             pa.float64())})

    wt = tree_merge(
        emb.map_batches(wpart, batch_format="pyarrow",
                        batch_size=None),
        wcomb,
    ).to_pandas()
    if "ssw" not in wt.columns or len(wt) == 0:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _ANOVA_COLS})
    ssw = float(wt["ssw"].iloc[0])
    grand = s.sum() / N
    ssb = float((n * (s / n - grand) ** 2).sum())
    if ssw == 0:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _ANOVA_COLS})
    f = (ssb / (k - 1)) / (ssw / (N - k))
    return pa.table({
        "n_labels": pa.array([k], pa.int64()),
        "n_vecs": pa.array([N], pa.int64()),
        "f_x1e3": pa.array(
            [_round_half_away(f * 1e3)], pa.int64()),
        "ss_between_x1e9": pa.array(
            [_round_half_away(ssb * 1e9)], pa.int64()),
        "ss_within_x1e9": pa.array(
            [_round_half_away(ssw * 1e9)], pa.int64()),
    })


NORM_ANOVA_SQL = f"""
WITH nv AS MATERIALIZED (
  SELECT label, vec_id,
         SUM(CAST(embedding[CAST(r.k AS INTEGER)] AS DOUBLE)
             * CAST(embedding[CAST(r.k AS INTEGER)] AS DOUBLE))
           AS v
  FROM embeddings CROSS JOIN range(1, {_EMB_DIM + 1}) r(k)
  WHERE label IS NOT NULL AND embedding IS NOT NULL
  GROUP BY 1, 2
), st AS MATERIALIZED (
  SELECT label, CAST(COUNT(*) AS BIGINT) AS n,
         SUM(v) AS s, SUM(v) / COUNT(*) AS mu
  FROM nv GROUP BY 1
), dims AS MATERIALIZED (
  SELECT CAST(COUNT(*) AS BIGINT) AS k,
         CAST(SUM(n) AS BIGINT) AS nn,
         SUM(s) / SUM(n) AS grand
  FROM st
), ssw_t AS MATERIALIZED (
  SELECT SUM((nv.v - st.mu) * (nv.v - st.mu)) AS ssw
  FROM nv JOIN st USING (label)
), ssb_t AS MATERIALIZED (
  SELECT SUM(st.n * (st.mu - dims.grand)
             * (st.mu - dims.grand)) AS ssb
  FROM st CROSS JOIN dims
)
SELECT dims.k AS n_labels,
       dims.nn AS n_vecs,
       CAST(ROUND((ssb_t.ssb / (dims.k - 1))
            / (ssw_t.ssw / (dims.nn - dims.k)) * 1000, 0)
            AS BIGINT) AS f_x1e3,
       CAST(ROUND(ssb_t.ssb * 1000000000, 0) AS BIGINT)
         AS ss_between_x1e9,
       CAST(ROUND(ssw_t.ssw * 1000000000, 0) AS BIGINT)
         AS ss_within_x1e9
FROM ssb_t CROSS JOIN ssw_t CROSS JOIN dims
WHERE dims.k >= 2 AND dims.nn > dims.k AND ssw_t.ssw <> 0
"""


def register_r4gh(queries: dict, oracles: dict) -> None:
    queries.update(
        {
            "timestamp_precision_census":
                q_timestamp_precision_census,
            "newsvendor_stock_plan": q_newsvendor_stock_plan,
            "embedding_norm_anova": q_embedding_norm_anova,
        }
    )
    oracles.update(
        {
            "timestamp_precision_census": TSP_SQL,
            "newsvendor_stock_plan": NEWSVENDOR_SQL,
            "embedding_norm_anova": NORM_ANOVA_SQL,
        }
    )
