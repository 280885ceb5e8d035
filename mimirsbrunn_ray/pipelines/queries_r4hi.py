"""Round-4 batch HI: lexical anomalies, assortment holes, and
weekend operations — the top-10 Zipf-outlier words (largest
absolute log-frequency residual from the corpus's fitted rank-
frequency line: over-represented boilerplate and under-
represented suppressed terms both surface here), the brand x type
assortment gap census (how much of the possible grid the catalog
actually fills), and the weekend-ship trend (monthly share of
lineitems shipped on weekends plus its slope — is the warehouse
quietly becoming a 7-day operation?).

Exactness discipline: word counts and grid cells are pure
integers; the rank-frequency fit folds identical log-log OLS
sums (residuals snapped x1e6 BEFORE the top-10 rank, ties to the
word); weekend shares are exact count ratios with the shared
centered-slope fold."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from mimirsbrunn_ray.pipelines.queries_r4dd import (
    _word_counts_per_source,
)
from mimirsbrunn_ray.pipelines.queries_r4fk import (
    _DAY_US,
    _round_half_away,
)
from mimirsbrunn_ray.stages.rollup import tree_merge

_ZIPF_TOP = 10


def _valid(b: pa.Table, cols) -> pa.Table:
    m = None
    for c in cols:
        v = pc.is_valid(b[c])
        m = v if m is None else pc.and_(m, v)
    return b.filter(m)


_ZOW_COLS = ["word", "rank", "count", "resid_x1e6"]


def q_zipf_outlier_words(sf_dir):
    """The words that break Zipf: fit ln(count) on ln(rank) over
    the pooled corpus word frequencies (ranks in (count DESC,
    word) order) and report the top 10 by absolute residual
    (snapped x1e6 before ranking, ties to the word) — positive
    residuals are over-represented boilerplate, negative ones
    suspiciously suppressed terms.  Counts fold exactly; the
    log-log OLS mirrors."""
    wsc = _word_counts_per_source(sf_dir)
    if not len(wsc) or "source" not in wsc.columns:
        return pa.table({
            "word": pa.array([], pa.string()),
            **{c: pa.array([], pa.int64()) for c in _ZOW_COLS[1:]},
        })
    wc = wsc.groupby("w")["c"].sum().reset_index()
    wc = wc.sort_values(["c", "w"], ascending=[False, True],
                        ignore_index=True)
    n = len(wc)
    if n < 3:
        return pa.table({
            "word": pa.array([], pa.string()),
            **{c: pa.array([], pa.int64()) for c in _ZOW_COLS[1:]},
        })
    rank = np.arange(1, n + 1, dtype=np.float64)
    cnt = wc["c"].to_numpy(np.int64).astype(np.float64)
    x = np.log(rank)
    y = np.log(cnt)
    sx, sy = x.sum(), y.sum()
    sxx = (x * x).sum()
    sxy = (x * y).sum()
    den = n * sxx - sx * sx
    if den == 0:
        return pa.table({
            "word": pa.array([], pa.string()),
            **{c: pa.array([], pa.int64()) for c in _ZOW_COLS[1:]},
        })
    slope = (n * sxy - sx * sy) / den
    icept = (sy - slope * sx) / n
    resid = y - (icept + slope * x)
    resid_snap = np.array(
        [_round_half_away(v * 1e6) for v in resid], np.int64)
    df = pd.DataFrame({
        "word": wc["w"],
        "rank": np.arange(1, n + 1, dtype=np.int64),
        "count": wc["c"].to_numpy(np.int64),
        "resid_x1e6": resid_snap,
        "absr": np.abs(resid_snap),
    }).sort_values(["absr", "word"], ascending=[False, True],
                   ignore_index=True).head(_ZIPF_TOP)
    return pa.table({
        "word": pa.array(df["word"], pa.string()),
        "rank": pa.array(df["rank"].to_numpy(np.int64)),
        "count": pa.array(df["count"].to_numpy(np.int64)),
        "resid_x1e6": pa.array(
            df["resid_x1e6"].to_numpy(np.int64)),
    })


ZOW_SQL = f"""
WITH w AS (
  SELECT unnest(string_split(text, ' ')) AS w
  FROM documents
  WHERE source IS NOT NULL AND text IS NOT NULL
), c AS MATERIALIZED (
  SELECT w, CAST(COUNT(*) AS BIGINT) AS c FROM w GROUP BY 1
), rk AS MATERIALIZED (
  SELECT w, c,
         ROW_NUMBER() OVER (ORDER BY c DESC, w) AS rank
  FROM c
), st AS MATERIALIZED (
  SELECT CAST(COUNT(*) AS DOUBLE) AS n,
         SUM(LN(CAST(rank AS DOUBLE))) AS sx,
         SUM(LN(CAST(c AS DOUBLE))) AS sy,
         SUM(LN(CAST(rank AS DOUBLE))
             * LN(CAST(rank AS DOUBLE))) AS sxx,
         SUM(LN(CAST(rank AS DOUBLE))
             * LN(CAST(c AS DOUBLE))) AS sxy
  FROM rk
), fit AS MATERIALIZED (
  SELECT n,
         (n * sxy - sx * sy) / (n * sxx - sx * sx) AS slope,
         (sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx)
           / n AS icept
  FROM st WHERE n >= 3 AND n * sxx - sx * sx <> 0
), resid AS (
  SELECT rk.w, rk.rank, rk.c,
         CAST(ROUND((LN(CAST(rk.c AS DOUBLE))
                     - (fit.icept
                        + fit.slope
                          * LN(CAST(rk.rank AS DOUBLE))))
              * 1000000, 0) AS BIGINT) AS resid_x1e6
  FROM rk CROSS JOIN fit
)
SELECT w AS word,
       CAST(rank AS BIGINT) AS rank,
       c AS count,
       resid_x1e6
FROM resid
ORDER BY ABS(resid_x1e6) DESC, w
LIMIT {_ZIPF_TOP}
"""

_AGC_COLS = ["n_brands", "n_types", "n_possible", "n_present",
             "fill_ppm"]


def q_assortment_gap_census(sf_dir):
    """Catalog grid fill: of all brand x type combinations the
    catalog COULD offer (brands seen anywhere x types seen
    anywhere), how many actually exist — a low fill ratio means
    'brand' and 'type' interact and recommender fallbacks that
    assume a full grid will suggest phantom products.  Distinct
    pairs fold exactly."""
    parts = rd.read_parquet(f"{sf_dir}/part.parquet",
                            columns=["p_brand", "p_type"])

    def part(b: pa.Table) -> pa.Table:
        b = _valid(b, ("p_brand", "p_type"))
        return b.select(["p_brand", "p_type"]).group_by(
            ["p_brand", "p_type"]).aggregate([])

    def distinct(b: pa.Table) -> pa.Table:
        return b.select(["p_brand", "p_type"]).group_by(
            ["p_brand", "p_type"]).aggregate([])

    bt = tree_merge(
        parts.map_batches(part, batch_format="pyarrow",
                          batch_size=None),
        distinct,
    ).to_pandas()
    if "p_brand" not in bt.columns or len(bt) == 0:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _AGC_COLS})
    nb = bt["p_brand"].nunique()
    nt = bt["p_type"].nunique()
    n_possible = nb * nt
    n_present = len(bt)
    return pa.table({
        "n_brands": pa.array([nb], pa.int64()),
        "n_types": pa.array([nt], pa.int64()),
        "n_possible": pa.array([n_possible], pa.int64()),
        "n_present": pa.array([n_present], pa.int64()),
        "fill_ppm": pa.array(
            [_round_half_away(n_present / n_possible * 1e6)],
            pa.int64()),
    })


AGC_SQL = """
WITH bt AS MATERIALIZED (
  SELECT DISTINCT p_brand, p_type FROM part
  WHERE p_brand IS NOT NULL AND p_type IS NOT NULL
), dims AS MATERIALIZED (
  SELECT CAST(COUNT(DISTINCT p_brand) AS BIGINT) AS nb,
         CAST(COUNT(DISTINCT p_type) AS BIGINT) AS nt,
         CAST(COUNT(*) AS BIGINT) AS np_
  FROM bt
)
SELECT nb AS n_brands,
       nt AS n_types,
       CAST(nb * nt AS BIGINT) AS n_possible,
       np_ AS n_present,
       CAST(ROUND(CAST(np_ AS DOUBLE) / (nb * nt) * 1000000, 0)
            AS BIGINT) AS fill_ppm
FROM dims WHERE nb * nt > 0
"""

_WST_COLS = ["n_months", "slope_ppm_per_month_x1e3",
             "first_share_ppm", "last_share_ppm"]


def q_weekend_ship_trend(sf_dir):
    """Is the warehouse becoming a 7-day operation?  The monthly
    share of lineitems SHIPPED on weekends (epoch dow >= 5) and
    the OLS slope of that share across months — a positive slope
    is capacity policy changing under everyone's feet.  Counts
    fold exactly; the slope mirrors over month-indexed exact
    shares."""
    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_shipdate"])

    def part(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_valid(b["l_shipdate"]))
        if b.num_rows == 0:
            return pa.table({
                "mon": pa.array([], pa.int64()),
                "n": pa.array([], pa.int64()),
                "we": pa.array([], pa.int64()),
            })
        d = b["l_shipdate"].cast(pa.timestamp("us")).to_pandas()
        mon = (d.dt.year * 12 + d.dt.month - 1).to_numpy(np.int64)
        day = (d.astype(np.int64) // _DAY_US).to_numpy(np.int64)
        we = ((day + 4) % 7 >= 5).astype(np.int64)
        t = pa.table({
            "mon": pa.array(mon),
            "n": pa.array(np.ones(len(mon), np.int64)),
            "we": pa.array(we),
        })
        g = t.group_by(["mon"]).aggregate(
            [("n", "sum"), ("we", "sum")])
        return g.rename_columns(["mon", "n", "we"])

    def comb(b: pa.Table) -> pa.Table:
        g = b.group_by(["mon"]).aggregate(
            [("n", "sum"), ("we", "sum")])
        return g.rename_columns(["mon", "n", "we"])

    cc = tree_merge(
        li.map_batches(part, batch_format="pyarrow",
                       batch_size=None),
        comb,
    ).to_pandas()
    if "mon" not in cc.columns or len(cc) < 2:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _WST_COLS})
    cc = cc.sort_values("mon", ignore_index=True)
    x = cc["mon"].to_numpy(np.int64).astype(np.float64)
    share = (cc["we"].to_numpy(np.int64).astype(np.float64)
             / cc["n"].to_numpy(np.int64))
    n = len(x)
    sx, sy = x.sum(), share.sum()
    sxx = (x * x).sum()
    sxy = (x * share).sum()
    den = n * sxx - sx * sx
    if den == 0:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _WST_COLS})
    slope = (n * sxy - sx * sy) / den
    return pa.table({
        "n_months": pa.array([n], pa.int64()),
        "slope_ppm_per_month_x1e3": pa.array(
            [_round_half_away(slope * 1e9)], pa.int64()),
        "first_share_ppm": pa.array(
            [_round_half_away(float(share[0]) * 1e6)],
            pa.int64()),
        "last_share_ppm": pa.array(
            [_round_half_away(float(share[-1]) * 1e6)],
            pa.int64()),
    })


WST_SQL = f"""
WITH ms AS MATERIALIZED (
  SELECT YEAR(l_shipdate) * 12 + MONTH(l_shipdate) - 1 AS mon,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CASE WHEN ((EPOCH_US(l_shipdate)
                              // {_DAY_US}) + 4) % 7 >= 5
                       THEN 1 ELSE 0 END) AS BIGINT) AS we
  FROM lineitem WHERE l_shipdate IS NOT NULL
  GROUP BY 1
), sh AS MATERIALIZED (
  SELECT CAST(mon AS DOUBLE) AS x,
         CAST(we AS DOUBLE) / n AS y,
         mon
  FROM ms
), st AS MATERIALIZED (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         SUM(x) AS sx, SUM(y) AS sy,
         SUM(x * x) AS sxx, SUM(x * y) AS sxy,
         MIN(mon) AS m0, MAX(mon) AS m1
  FROM sh
)
SELECT st.n AS n_months,
       CAST(ROUND((st.n * st.sxy - st.sx * st.sy)
            / (st.n * st.sxx - st.sx * st.sx) * 1000000000, 0)
            AS BIGINT) AS slope_ppm_per_month_x1e3,
       CAST(ROUND((SELECT y FROM sh WHERE mon = st.m0)
            * 1000000, 0) AS BIGINT) AS first_share_ppm,
       CAST(ROUND((SELECT y FROM sh WHERE mon = st.m1)
            * 1000000, 0) AS BIGINT) AS last_share_ppm
FROM st
WHERE st.n >= 2 AND st.n * st.sxx - st.sx * st.sx <> 0
"""


def register_r4hi(queries: dict, oracles: dict) -> None:
    queries.update(
        {
            "zipf_outlier_words": q_zipf_outlier_words,
            "assortment_gap_census": q_assortment_gap_census,
            "weekend_ship_trend": q_weekend_ship_trend,
        }
    )
    oracles.update(
        {
            "zipf_outlier_words": ZOW_SQL,
            "assortment_gap_census": AGC_SQL,
            "weekend_ship_trend": WST_SQL,
        }
    )
