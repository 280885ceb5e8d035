"""Round-4 batch HT: demand stickiness, intra-source duplication,
and inequality trend — part-demand stickiness (the median across
parts of each part's lag-1 monthly-demand autocorrelation — can
last month's demand forecast this month's, per SKU?), the intra-
source exact-duplicate share (documents whose full text appears
more than once WITHIN their own source), and the order-value Gini
trend (monthly Gini of order sizes plus slope — is the order mix
polarizing into whales-and-minnows?).

Exactness discipline: monthly demand and text-duplicate counts
fold exactly; per-part autocorrelations and monthly Ginis use
tie-invariant exact formulas over integers with mirrored medians
and slopes."""

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


_PDS_COLS = ["n_parts", "median_r1_x1e6", "share_positive_ppm"]


def q_part_demand_stickiness(sf_dir):
    """Per-SKU forecastability: for each part with 3+ active
    months, the lag-1 autocorrelation of its dense monthly demand
    (zero months included); the median across parts and the
    positive share — a low median means last month's number
    forecasts nothing at SKU grain and safety stock must come from
    the distribution, not the trend.  Parts resolve in disjoint
    shards; the acf folds centered sums per part."""
    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_partkey", "l_shipdate",
                                  "l_quantity"])

    def project(b: pa.Table) -> pa.Table:
        b = _valid(b, ("l_partkey", "l_shipdate", "l_quantity"))
        if b.num_rows == 0:
            return pa.table({
                "pk": pa.array([], pa.int64()),
                "mon": pa.array([], pa.int64()),
                "q": pa.array([], pa.int64()),
            })
        d = b["l_shipdate"].cast(pa.timestamp("us")).to_pandas()
        mon = (d.dt.year * 12 + d.dt.month - 1).to_numpy(np.int64)
        qf = b["l_quantity"].cast(pa.float64()).to_numpy(
            zero_copy_only=False)
        q = np.where(qf >= 0, np.floor(qf + 0.5),
                     np.ceil(qf - 0.5)).astype(np.int64)
        t = pa.table({
            "pk": b["l_partkey"].cast(pa.int64()),
            "mon": pa.array(mon),
            "q": pa.array(q),
        })
        g = t.group_by(["pk", "mon"]).aggregate([("q", "sum")])
        return g.rename_columns(["pk", "mon", "q"])

    def comb(b: pa.Table) -> pa.Table:
        g = b.group_by(["pk", "mon"]).aggregate([("q", "sum")])
        return g.rename_columns(["pk", "mon", "q"])

    pm = tree_merge(
        li.map_batches(project, batch_format="pyarrow",
                       batch_size=None),
        comb,
        final_shards=8,
        shard_cols=["pk"],
    ).to_pandas()
    if "pk" not in pm.columns or len(pm) == 0:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _PDS_COLS})
    mmin = int(pm["mon"].min())
    mmax = int(pm["mon"].max())
    span = mmax - mmin + 1
    r1s = []
    for pk, g in pm.groupby("pk"):
        v = np.zeros(span, dtype=np.float64)
        v[g["mon"].to_numpy(np.int64) - mmin] = g["q"].to_numpy(
            np.int64)
        mu = v.mean()
        d = v - mu
        c0 = float((d * d).sum())
        if c0 == 0 or span < 3:
            continue
        r1s.append(float((d[:-1] * d[1:]).sum()) / c0)
    if len(r1s) == 0:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _PDS_COLS})
    arr = np.array(r1s)
    return pa.table({
        "n_parts": pa.array([len(arr)], pa.int64()),
        "median_r1_x1e6": pa.array(
            [_round_half_away(float(np.percentile(arr, 50))
                              * 1e6)], pa.int64()),
        "share_positive_ppm": pa.array(
            [_round_half_away(float((arr > 0).sum())
                              / len(arr) * 1e6)], pa.int64()),
    })


PDS_SQL = """
WITH pm AS MATERIALIZED (
  SELECT l_partkey AS pk,
         YEAR(l_shipdate) * 12 + MONTH(l_shipdate) - 1 AS mon,
         CAST(SUM(CAST(ROUND(l_quantity, 0) AS BIGINT))
              AS BIGINT) AS q
  FROM lineitem
  WHERE l_partkey IS NOT NULL AND l_shipdate IS NOT NULL
    AND l_quantity IS NOT NULL
  GROUP BY 1, 2
), span AS MATERIALIZED (
  SELECT MIN(mon) AS m0, MAX(mon) AS m1,
         MAX(mon) - MIN(mon) + 1 AS d
  FROM pm
), grid AS MATERIALIZED (
  SELECT p.pk, s.m0 + r.k AS mon,
         CAST(COALESCE(pm.q, 0) AS DOUBLE) AS q
  FROM (SELECT DISTINCT pk FROM pm) p
  CROSS JOIN span s
  JOIN range(0, 100000) r(k) ON s.m0 + r.k <= s.m1
  LEFT JOIN pm ON pm.pk = p.pk AND pm.mon = s.m0 + r.k
), mu AS MATERIALIZED (
  SELECT pk, AVG(q) AS m,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM grid GROUP BY 1
), mom AS MATERIALIZED (
  SELECT a.pk,
         SUM((a.q - mu.m) * (a.q - mu.m)) AS c0,
         SUM(CASE WHEN b.q IS NOT NULL
                  THEN (a.q - mu.m) * (b.q - mu.m)
                  ELSE 0 END) AS c1,
         ANY_VALUE(mu.n) AS n
  FROM grid a
  JOIN mu ON mu.pk = a.pk
  LEFT JOIN grid b ON b.pk = a.pk AND b.mon = a.mon + 1
  GROUP BY a.pk
), r1 AS MATERIALIZED (
  SELECT pk, c1 / c0 AS r1
  FROM mom WHERE c0 <> 0 AND n >= 3
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_parts,
       CAST(ROUND(MEDIAN(r1) * 1000000, 0) AS BIGINT)
         AS median_r1_x1e6,
       CAST(ROUND(CAST(SUM(CASE WHEN r1 > 0 THEN 1 ELSE 0 END)
                       AS DOUBLE) / COUNT(*) * 1000000, 0)
            AS BIGINT) AS share_positive_ppm
FROM r1 HAVING COUNT(*) > 0
"""

_ISD_COLS = ["source", "n_docs", "n_dup_docs", "dup_ppm"]


def q_intra_source_dup_share(sf_dir):
    """Duplication where it hides: per source, documents whose
    FULL text occurs two or more times within that same source —
    the share each source's own dedup pass would remove; global
    dedup numbers bury which source is the offender.  Exact text
    group counts fold in source-disjoint shards."""
    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["source", "text"])

    def part(b: pa.Table) -> pa.Table:
        b = _valid(b, ("source", "text"))
        g = b.group_by(["source", "text"]).aggregate(
            [([], "count_all")])
        return g.rename_columns(["source", "text", "n"])

    def comb(b: pa.Table) -> pa.Table:
        g = b.group_by(["source", "text"]).aggregate(
            [("n", "sum")])
        return g.rename_columns(["source", "text", "n"])

    st = tree_merge(
        docs.map_batches(part, batch_format="pyarrow",
                         batch_size=None),
        comb,
        final_shards=8,
        shard_cols=["source", "text"],
    ).to_pandas()
    if "source" not in st.columns or len(st) == 0:
        return pa.table({
            "source": pa.array([], pa.string()),
            **{c: pa.array([], pa.int64()) for c in _ISD_COLS[1:]},
        })
    out = {c: [] for c in _ISD_COLS}
    for src, g in st.groupby("source", sort=True):
        n = g["n"].to_numpy(np.int64)
        n_docs = int(n.sum())
        dups = int(n[n >= 2].sum())
        if n_docs == 0:
            continue
        out["source"].append(src)
        out["n_docs"].append(n_docs)
        out["n_dup_docs"].append(dups)
        out["dup_ppm"].append(
            _round_half_away(dups / n_docs * 1e6))
    return pa.table({
        "source": pa.array(out["source"], pa.string()),
        **{c: pa.array(out[c], pa.int64()) for c in _ISD_COLS[1:]},
    })


ISD_SQL = """
WITH st AS MATERIALIZED (
  SELECT source, text, CAST(COUNT(*) AS BIGINT) AS n
  FROM documents
  WHERE source IS NOT NULL AND text IS NOT NULL
  GROUP BY 1, 2
)
SELECT source,
       CAST(SUM(n) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN n >= 2 THEN n ELSE 0 END) AS BIGINT)
         AS n_dup_docs,
       CAST(ROUND(CAST(SUM(CASE WHEN n >= 2 THEN n ELSE 0 END)
                       AS DOUBLE) / SUM(n) * 1000000, 0)
            AS BIGINT) AS dup_ppm
FROM st GROUP BY source
HAVING SUM(n) > 0
ORDER BY source
"""

_OGT_COLS = ["n_months", "slope_ppm_per_month_x1e3",
             "first_gini_ppm", "last_gini_ppm"]


def q_order_gini_trend(sf_dir):
    """Is the order mix polarizing?  The monthly Gini of order
    values (tie-invariant sorted-coefficient formula over exact
    cents) and the OLS slope of Gini across months — a rising
    slope means revenue concentration into whale orders is
    compounding, which changes fulfillment risk even at flat
    totals.  Per-month Ginis fold from exact integers."""
    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderdate", "o_totalprice"])

    def project(b: pa.Table) -> pa.Table:
        b = _valid(b, ("o_orderdate", "o_totalprice"))
        if b.num_rows == 0:
            return pa.table({
                "mon": pa.array([], pa.int64()),
                "cents": pa.array([], pa.int64()),
            })
        d = b["o_orderdate"].cast(pa.timestamp("us")).to_pandas()
        mon = (d.dt.year * 12 + d.dt.month - 1).to_numpy(np.int64)
        x = b["o_totalprice"].cast(pa.float64()).to_numpy(
            zero_copy_only=False)
        cents = np.where(
            x >= 0, np.floor(x * 100.0 + 0.5),
            np.ceil(x * 100.0 - 0.5)).astype(np.int64)
        return pa.table({
            "mon": pa.array(mon),
            "cents": pa.array(cents),
        })

    def gini_partial(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({
            "mon": pd.Series([], dtype=np.int64),
            "gini_ppm": pd.Series([], dtype=np.int64),
        })
        if len(g) == 0:
            return empty
        rows = {"mon": [], "gini_ppm": []}
        for mon, sub in g.groupby("mon"):
            v = np.sort(sub["cents"].to_numpy(np.int64),
                        kind="mergesort").astype(np.float64)
            n = len(v)
            s = v.sum()
            if n < 2 or s == 0:
                continue
            i = np.arange(1, n + 1, dtype=np.float64)
            gini = float(((2 * i - n - 1) * v).sum()) / (n * s)
            rows["mon"].append(int(mon))
            rows["gini_ppm"].append(
                _round_half_away(gini * 1e6))
        df = pd.DataFrame(rows)
        for c in df.columns:
            df[c] = df[c].astype(np.int64)
        return df

    gm = (
        orders.map_batches(
            lambda b: add_bucket(project(b), "mon", 16),
            batch_format="pyarrow", batch_size=None)
        .groupby(_BUCKET)
        .map_groups(gini_partial, batch_format="pandas")
        .to_pandas()
    )
    if "mon" not in gm.columns or len(gm) < 2:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _OGT_COLS})
    gm = gm.sort_values("mon", ignore_index=True)
    x = gm["mon"].to_numpy(np.int64).astype(np.float64)
    y = gm["gini_ppm"].to_numpy(np.int64).astype(np.float64)
    n = len(x)
    sx, sy = x.sum(), y.sum()
    sxx = (x * x).sum()
    sxy = (x * y).sum()
    den = n * sxx - sx * sx
    if den == 0:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _OGT_COLS})
    slope = (n * sxy - sx * sy) / den
    return pa.table({
        "n_months": pa.array([n], pa.int64()),
        "slope_ppm_per_month_x1e3": pa.array(
            [_round_half_away(slope * 1e3)], pa.int64()),
        "first_gini_ppm": pa.array([int(y[0])], pa.int64()),
        "last_gini_ppm": pa.array([int(y[-1])], pa.int64()),
    })


OGT_SQL = """
WITH o AS MATERIALIZED (
  SELECT YEAR(o_orderdate) * 12 + MONTH(o_orderdate) - 1 AS mon,
         CAST(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)
              AS DOUBLE) AS cents
  FROM orders
  WHERE o_orderdate IS NOT NULL AND o_totalprice IS NOT NULL
), rk AS MATERIALIZED (
  SELECT mon, cents,
         ROW_NUMBER() OVER (PARTITION BY mon
                            ORDER BY cents) AS i,
         COUNT(*) OVER (PARTITION BY mon) AS n,
         SUM(cents) OVER (PARTITION BY mon) AS s
  FROM o
), gm AS MATERIALIZED (
  SELECT mon,
         CAST(ROUND(SUM((2 * i - n - 1) * cents)
              / (ANY_VALUE(n) * ANY_VALUE(s)) * 1000000, 0)
              AS BIGINT) AS gini_ppm
  FROM rk
  WHERE n >= 2 AND s <> 0
  GROUP BY mon
), st AS MATERIALIZED (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         SUM(CAST(mon AS DOUBLE)) AS sx,
         SUM(CAST(gini_ppm AS DOUBLE)) AS sy,
         SUM(CAST(mon AS DOUBLE) * mon) AS sxx,
         SUM(CAST(mon AS DOUBLE) * gini_ppm) AS sxy,
         MIN(mon) AS m0, MAX(mon) AS m1
  FROM gm
)
SELECT st.n AS n_months,
       CAST(ROUND((st.n * st.sxy - st.sx * st.sy)
            / (st.n * st.sxx - st.sx * st.sx) * 1000, 0)
            AS BIGINT) AS slope_ppm_per_month_x1e3,
       (SELECT gini_ppm FROM gm WHERE mon = st.m0)
         AS first_gini_ppm,
       (SELECT gini_ppm FROM gm WHERE mon = st.m1)
         AS last_gini_ppm
FROM st
WHERE st.n >= 2 AND st.n * st.sxx - st.sx * st.sx <> 0
"""


def register_r4ht(queries: dict, oracles: dict) -> None:
    queries.update(
        {
            "part_demand_stickiness": q_part_demand_stickiness,
            "intra_source_dup_share": q_intra_source_dup_share,
            "order_gini_trend": q_order_gini_trend,
        }
    )
    oracles.update(
        {
            "part_demand_stickiness": PDS_SQL,
            "intra_source_dup_share": ISD_SQL,
            "order_gini_trend": OGT_SQL,
        }
    )
