"""Round-4 batch GT: cross-table unit economics, corpus language
drift, and value-speed coupling — window-aligned daily ARPU blending the
orders and events tables (revenue cents over daily active event
users at the same window offset),
the language-mix drift between each source's lower and upper
doc_id halves (total-variation distance — the ingestion-order
companion to the vocabulary drift forensic), and the correlation
between an order's value and its first-ship latency (do big
orders get expedited, neglected, or neither?).

Exactness discipline: ARPU divides exact cents by exact MAU;
language TV distances are exact count-ratio folds; the value-
latency Pearson folds identical centered sums over exact (cents,
days) pairs."""

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
from mimirsbrunn_ray.stages.rollup import tree_merge


def _valid(b: pa.Table, cols) -> pa.Table:
    m = None
    for c in cols:
        v = pc.is_valid(b[c])
        m = v if m is None else pc.and_(m, v)
    return b.filter(m)


_ARPU_COLS = ["day_offset", "revenue_cents", "dau",
              "arpu_cents_x1e3"]


def q_arpu_monthly(sf_dir):
    """Daily ARPU across tables on ALIGNED WINDOW OFFSETS: the two
    streams occupy different calendar ranges, so day k of the
    orders window pairs with day k of the events window (k from
    each table's own first day) — revenue cents over that offset's
    distinct active users; the cross-pipeline KPI that exposes
    window-convention drift between teams.  Two distributed
    passes, one tiny offset join."""
    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderdate", "o_totalprice"])

    def rev_part(b: pa.Table) -> pa.Table:
        b = _valid(b, ("o_orderdate", "o_totalprice"))
        if b.num_rows == 0:
            return pa.table({
                "mon": pa.array([], pa.int64()),
                "cents": pa.array([], pa.int64()),
            })
        us = b["o_orderdate"].cast(pa.timestamp("us")).cast(
            pa.int64()).to_numpy(zero_copy_only=False)
        x = b["o_totalprice"].cast(pa.float64()).to_numpy(
            zero_copy_only=False)
        cents = np.where(
            x >= 0, np.floor(x * 100.0 + 0.5),
            np.ceil(x * 100.0 - 0.5)).astype(np.int64)
        t = pa.table({"mon": pa.array(us // _DAY_US),
                      "cents": pa.array(cents)})
        g = t.group_by(["mon"]).aggregate([("cents", "sum")])
        return g.rename_columns(["mon", "cents"])

    def rev_comb(b: pa.Table) -> pa.Table:
        g = b.group_by(["mon"]).aggregate([("cents", "sum")])
        return g.rename_columns(["mon", "cents"])

    rev = tree_merge(
        orders.map_batches(rev_part, batch_format="pyarrow",
                           batch_size=None),
        rev_comb,
    ).to_pandas()

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts"])

    def mau_part(b: pa.Table) -> pa.Table:
        b = _valid(b, ("user_id", "ts"))
        if b.num_rows == 0:
            return pa.table({
                "user_id": pa.array([], pa.int64()),
                "mon": pa.array([], pa.int64()),
            })
        us = b["ts"].cast(pa.timestamp("us")).cast(
            pa.int64()).to_numpy(zero_copy_only=False)
        t = pa.table({
            "user_id": b["user_id"].cast(pa.int64()),
            "mon": pa.array(us // _DAY_US),
        })
        return t.group_by(["user_id", "mon"]).aggregate([])

    def mau_distinct(b: pa.Table) -> pa.Table:
        return b.select(["user_id", "mon"]).group_by(
            ["user_id", "mon"]).aggregate([])

    um = tree_merge(
        ev.map_batches(mau_part, batch_format="pyarrow",
                       batch_size=None),
        mau_distinct,
        final_shards=8,
        shard_cols=["user_id"],
    ).to_pandas()
    if ("mon" not in rev.columns or len(rev) == 0
            or "mon" not in um.columns or len(um) == 0):
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _ARPU_COLS})
    mau = um.groupby("mon").size()
    rev = rev.sort_values("mon", ignore_index=True)
    rev_d0 = int(rev["mon"].min())
    ev_d0 = int(min(mau.index))
    out = {c: [] for c in _ARPU_COLS}
    for _, r in rev.iterrows():
        k = int(r["mon"]) - rev_d0
        ev_day = ev_d0 + k
        if ev_day not in mau.index:
            continue
        mm = int(mau.loc[ev_day])
        if mm == 0:
            continue
        cents = int(r["cents"])
        out["day_offset"].append(k)
        out["revenue_cents"].append(cents)
        out["dau"].append(mm)
        out["arpu_cents_x1e3"].append(
            _round_half_away(cents / mm * 1e3))
    return pa.table(
        {c: pa.array(out[c], pa.int64()) for c in _ARPU_COLS})


ARPU_SQL = f"""
WITH rev AS MATERIALIZED (
  SELECT EPOCH_US(o_orderdate) // {_DAY_US} AS d,
         CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT))
              AS BIGINT) AS cents
  FROM orders
  WHERE o_orderdate IS NOT NULL AND o_totalprice IS NOT NULL
  GROUP BY 1
), mau AS MATERIALIZED (
  SELECT EPOCH_US(ts) // {_DAY_US} AS d,
         CAST(COUNT(DISTINCT user_id) AS BIGINT) AS dau
  FROM events
  WHERE user_id IS NOT NULL AND ts IS NOT NULL
  GROUP BY 1
), r0 AS MATERIALIZED (SELECT MIN(d) AS d0 FROM rev),
e0 AS MATERIALIZED (SELECT MIN(d) AS d0 FROM mau)
SELECT CAST(rev.d - r0.d0 AS BIGINT) AS day_offset,
       rev.cents AS revenue_cents,
       mau.dau AS dau,
       CAST(ROUND(CAST(rev.cents AS DOUBLE) / mau.dau * 1000, 0)
            AS BIGINT) AS arpu_cents_x1e3
FROM rev CROSS JOIN r0 CROSS JOIN e0
JOIN mau ON mau.d = e0.d0 + (rev.d - r0.d0)
WHERE mau.dau > 0
ORDER BY day_offset
"""

_LMD_COLS = ["source", "n_docs_h1", "n_docs_h2", "tv_ppm"]


def q_lang_mix_drift_halves(sf_dir):
    """Language-mix ingestion drift per source: the total-
    variation distance between the language distributions of the
    lower and upper doc_id halves (split at the median distinct
    doc_id, as in the vocabulary forensic) — nonzero TV means the
    corpus's language mix changed as it was assembled, and any
    sequential split shifts the language balance.  Distinct doc
    languages fold exactly; TV is a 5-ish-term exact-ratio
    fold."""
    docs = rd.read_parquet(
        f"{sf_dir}/documents.parquet",
        columns=["source", "doc_id", "lang"])

    meta = docs.map_batches(
        lambda b: _valid(b, ("source", "doc_id", "lang")).select(
            ["source", "doc_id"]).group_by(
            ["source", "doc_id"]).aggregate([]),
        batch_format="pyarrow", batch_size=None).to_pandas()
    if "source" not in meta.columns or len(meta) == 0:
        return pa.table({
            "source": pa.array([], pa.string()),
            **{c: pa.array([], pa.int64()) for c in _LMD_COLS[1:]},
        })
    meta = meta.drop_duplicates()
    med_map = {}
    for src, g in meta.groupby("source"):
        ids = np.sort(g["doc_id"].to_numpy(np.int64),
                      kind="mergesort")
        med_map[src] = int(ids[(len(ids) - 1) // 2])

    def part(b: pa.Table) -> pa.Table:
        b = _valid(b, ("source", "doc_id", "lang"))
        if b.num_rows == 0:
            return pa.table({
                "source": pa.array([], pa.string()),
                "lang": pa.array([], pa.string()),
                "half": pa.array([], pa.int64()),
                "n": pa.array([], pa.int64()),
            })
        src = b["source"].to_numpy(zero_copy_only=False)
        did = b["doc_id"].to_numpy(zero_copy_only=False).astype(
            np.int64)
        meds = np.array([med_map.get(s, 0) for s in src],
                        dtype=np.int64)
        half = (did > meds).astype(np.int64) + 1
        t = pa.table({
            "source": b["source"],
            "lang": b["lang"],
            "half": pa.array(half),
            "n": pa.array(np.ones(b.num_rows, np.int64)),
        })
        g = t.group_by(["source", "lang", "half"]).aggregate(
            [("n", "sum")])
        return g.rename_columns(["source", "lang", "half", "n"])

    def comb(b: pa.Table) -> pa.Table:
        g = b.group_by(["source", "lang", "half"]).aggregate(
            [("n", "sum")])
        return g.rename_columns(["source", "lang", "half", "n"])

    cc = tree_merge(
        docs.map_batches(part, batch_format="pyarrow",
                         batch_size=None),
        comb,
    ).to_pandas()
    if "source" not in cc.columns or len(cc) == 0:
        return pa.table({
            "source": pa.array([], pa.string()),
            **{c: pa.array([], pa.int64()) for c in _LMD_COLS[1:]},
        })
    out = {c: [] for c in _LMD_COLS}
    for src, g in cc.groupby("source", sort=True):
        piv = g.pivot_table(index="lang", columns="half",
                            values="n", aggfunc="sum",
                            fill_value=0)
        piv = piv.reindex(columns=[1, 2], fill_value=0)
        h1 = piv[1].to_numpy(np.int64)
        h2 = piv[2].to_numpy(np.int64)
        n1, n2 = int(h1.sum()), int(h2.sum())
        if n1 == 0 or n2 == 0:
            continue
        tv = 0.5 * float(
            np.abs(h1 / n1 - h2 / n2).sum())
        out["source"].append(src)
        out["n_docs_h1"].append(n1)
        out["n_docs_h2"].append(n2)
        out["tv_ppm"].append(_round_half_away(tv * 1e6))
    return pa.table({
        "source": pa.array(out["source"], pa.string()),
        **{c: pa.array(out[c], pa.int64()) for c in _LMD_COLS[1:]},
    })


LANG_DRIFT_SQL = """
WITH ids AS MATERIALIZED (
  SELECT DISTINCT source, doc_id FROM documents
  WHERE source IS NOT NULL AND doc_id IS NOT NULL
    AND lang IS NOT NULL
), med AS MATERIALIZED (
  SELECT source, doc_id AS med
  FROM (SELECT source, doc_id,
               ROW_NUMBER() OVER (PARTITION BY source
                                  ORDER BY doc_id) AS rn,
               COUNT(*) OVER (PARTITION BY source) AS n
        FROM ids)
  WHERE rn = (n + 1) // 2
), dl AS MATERIALIZED (
  SELECT d.source, d.lang,
         CASE WHEN d.doc_id > med.med THEN 2 ELSE 1 END AS half,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM documents d JOIN med ON med.source = d.source
  WHERE d.source IS NOT NULL AND d.doc_id IS NOT NULL
    AND d.lang IS NOT NULL
  GROUP BY 1, 2, 3
), tot AS MATERIALIZED (
  SELECT source,
         CAST(SUM(CASE WHEN half = 1 THEN n ELSE 0 END)
              AS BIGINT) AS n1,
         CAST(SUM(CASE WHEN half = 2 THEN n ELSE 0 END)
              AS BIGINT) AS n2
  FROM dl GROUP BY 1
), langs AS MATERIALIZED (
  SELECT dl.source, dl.lang,
         CAST(SUM(CASE WHEN half = 1 THEN n ELSE 0 END)
              AS BIGINT) AS c1,
         CAST(SUM(CASE WHEN half = 2 THEN n ELSE 0 END)
              AS BIGINT) AS c2
  FROM dl GROUP BY 1, 2
)
SELECT l.source,
       ANY_VALUE(t.n1) AS n_docs_h1,
       ANY_VALUE(t.n2) AS n_docs_h2,
       CAST(ROUND(0.5 * SUM(ABS(
              CAST(l.c1 AS DOUBLE) / t.n1
              - CAST(l.c2 AS DOUBLE) / t.n2)) * 1000000, 0)
            AS BIGINT) AS tv_ppm
FROM langs l JOIN tot t USING (source)
WHERE t.n1 > 0 AND t.n2 > 0
GROUP BY l.source
ORDER BY l.source
"""

_VLC_COLS = ["n_orders", "r_x1e6", "mean_lat_x1e3",
             "mean_cents"]


def q_value_latency_correlation(sf_dir):
    """Does money buy speed?  The Pearson correlation between an
    order's total value (cents) and its first-ship latency (days)
    — negative means big orders get expedited, positive means they
    queue behind their own complexity, ~0 means the warehouse is
    value-blind.  Per-order pairs fold exact integers through
    identical centered sums."""
    # scale shape: per-order first-ship stays a Dataset, order columns
    # attach via budget-gated broadcast / join, and the Pearson moments
    # stream in two passes (means, then centered sums). Orders never
    # land whole on the driver.
    from mimirsbrunn_ray.stages.broadcast import attach_dim

    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey", "l_shipdate"])

    def part(b: pa.Table) -> pa.Table:
        b = _valid(b, ("l_orderkey", "l_shipdate"))
        t = pa.table({
            "okey": b["l_orderkey"].cast(pa.int64()),
            "ship": b["l_shipdate"].cast(
                pa.timestamp("us")).cast(pa.int64()),
        })
        g = t.group_by(["okey"]).aggregate([("ship", "min")])
        return g.rename_columns(["okey", "ship"])

    def comb(b: pa.Table) -> pa.Table:
        g = b.group_by(["okey"]).aggregate([("ship", "min")])
        return g.rename_columns(["okey", "ship"])

    fs = tree_merge(
        li.map_batches(part, batch_format="pyarrow",
                       batch_size=None),
        comb,
        final_shards=8,
        shard_cols=["okey"],
    )
    fs = attach_dim(fs, "okey", sf_dir, "orders", "o_orderkey",
                    ["o_orderdate", "o_totalprice"], how="inner")

    def to_xy(b: pa.Table) -> pa.Table:
        x = b["o_totalprice"].to_numpy(zero_copy_only=False)
        cents = np.where(
            x >= 0, np.floor(x * 100.0 + 0.5),
            np.ceil(x * 100.0 - 0.5)).astype(np.int64)
        od = b["o_orderdate"].cast(pa.timestamp("us")).cast(
            pa.int64()).to_numpy(zero_copy_only=False)
        lat = (b["ship"].to_numpy(zero_copy_only=False) - od) // _DAY_US
        return pa.table({"val": pa.array(cents.astype(np.float64)),
                         "lat": pa.array(lat.astype(np.float64))})

    xy = fs.map_batches(
        to_xy, batch_format="pyarrow", batch_size=None).materialize()

    def sums1(b: pa.Table) -> pa.Table:
        v = b["val"].to_numpy(zero_copy_only=False)
        l = b["lat"].to_numpy(zero_copy_only=False)
        return pa.table({"n": pa.array([np.int64(len(v))]),
                         "sx": pa.array([float(v.sum())]),
                         "sy": pa.array([float(l.sum())])})

    p1 = xy.map_batches(
        sums1, batch_format="pyarrow", batch_size=None).to_pandas()
    n = int(p1["n"].sum()) if "n" in p1.columns else 0
    if n < 3:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _VLC_COLS})
    mx, my = float(p1["sx"].sum()) / n, float(p1["sy"].sum()) / n

    def sums2(b: pa.Table) -> pa.Table:
        dx = b["val"].to_numpy(zero_copy_only=False) - mx
        dy = b["lat"].to_numpy(zero_copy_only=False) - my
        return pa.table({"sxy": pa.array([float((dx * dy).sum())]),
                         "sxx": pa.array([float((dx * dx).sum())]),
                         "syy": pa.array([float((dy * dy).sum())])})

    p2 = xy.map_batches(
        sums2, batch_format="pyarrow", batch_size=None).to_pandas()
    sxx, syy = float(p2["sxx"].sum()), float(p2["syy"].sum())
    den = np.sqrt(sxx * syy)
    if den == 0:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _VLC_COLS})
    r = float(p2["sxy"].sum()) / float(den)
    return pa.table({
        "n_orders": pa.array([n], pa.int64()),
        "r_x1e6": pa.array(
            [_round_half_away(r * 1e6)], pa.int64()),
        "mean_lat_x1e3": pa.array(
            [_round_half_away(my * 1e3)], pa.int64()),
        "mean_cents": pa.array(
            [_round_half_away(mx)], pa.int64()),
    })


VALUE_LAT_SQL = f"""
WITH fs AS MATERIALIZED (
  SELECT o.o_orderkey,
         CAST(CAST(ROUND(o.o_totalprice * 100, 0) AS BIGINT)
              AS DOUBLE) AS val,
         CAST((MIN(EPOCH_US(l.l_shipdate))
               - EPOCH_US(o.o_orderdate)) // {_DAY_US}
              AS DOUBLE) AS lat
  FROM orders o JOIN lineitem l
    ON l.l_orderkey = o.o_orderkey
  WHERE o.o_orderkey IS NOT NULL AND o.o_orderdate IS NOT NULL
    AND o.o_totalprice IS NOT NULL AND l.l_shipdate IS NOT NULL
  GROUP BY 1, 2, EPOCH_US(o.o_orderdate)
), mu AS MATERIALIZED (
  SELECT AVG(val) AS mx, AVG(lat) AS my,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM fs
), mom AS (
  SELECT SUM((fs.val - mu.mx) * (fs.lat - mu.my)) AS sxy,
         SUM((fs.val - mu.mx) * (fs.val - mu.mx)) AS sxx,
         SUM((fs.lat - mu.my) * (fs.lat - mu.my)) AS syy
  FROM fs CROSS JOIN mu
)
SELECT mu.n AS n_orders,
       CAST(ROUND(mom.sxy / SQRT(mom.sxx * mom.syy) * 1000000,
            0) AS BIGINT) AS r_x1e6,
       CAST(ROUND(mu.my * 1000, 0) AS BIGINT) AS mean_lat_x1e3,
       CAST(ROUND(mu.mx, 0) AS BIGINT) AS mean_cents
FROM mu CROSS JOIN mom
WHERE mu.n >= 3 AND mom.sxx * mom.syy > 0
"""


def register_r4gt(queries: dict, oracles: dict) -> None:
    queries.update(
        {
            "arpu_daily_aligned": q_arpu_monthly,
            "lang_mix_drift_halves": q_lang_mix_drift_halves,
            "value_latency_correlation":
                q_value_latency_correlation,
        }
    )
    oracles.update(
        {
            "arpu_daily_aligned": ARPU_SQL,
            "lang_mix_drift_halves": LANG_DRIFT_SQL,
            "value_latency_correlation": VALUE_LAT_SQL,
        }
    )
