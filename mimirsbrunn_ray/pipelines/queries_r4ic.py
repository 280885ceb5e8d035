"""Round-4 batch IC: catalog taxonomy coupling, demand/supply
geography, and the props signal audit — the p_type word mutual
information (are the first and last words of the part-type
taxonomy independent axes or a coupled vocabulary?), the
customer-per-supplier ratio by nation (where demand outstrips
local supply — the import-pressure map), and the props-k value
slope per event type (does the embedded k payload predict event
value, per stream?).

Exactness discipline: MI builds from exact joint counts with the
identical plug-in formula on both sides; ratios are exact count
ratios; the per-type OLS runs on exact integer sums (value in
mills, k as-is) combined in double with mirrored operand
order."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from mimirsbrunn_ray.functions.jsonx import extract_int_key
from mimirsbrunn_ray.pipelines.queries_r4fk import _round_half_away
from mimirsbrunn_ray.stages.rollup import tree_merge


def _valid(b: pa.Table, cols) -> pa.Table:
    m = None
    for c in cols:
        v = pc.is_valid(b[c])
        m = v if m is None else pc.and_(m, v)
    return b.filter(m)


_PWM_COLS = ["n_parts", "n_first_words", "n_last_words",
             "mi_ppm", "h_first_ppm", "h_last_ppm"]


def q_ptype_word_mi(sf_dir):
    """Is the type taxonomy factorized?  Plug-in mutual
    information (log2) between the FIRST and LAST word of p_type
    — near-zero MI means the two taxonomy axes combine freely,
    high MI means the catalog only populates a corner of the
    grid.  Joint (first, last) counts fold exactly."""
    parts = rd.read_parquet(f"{sf_dir}/part.parquet",
                            columns=["p_type"])

    def part(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_valid(b["p_type"]))
        if b.num_rows == 0:
            return pa.table({
                "w1": pa.array([], pa.string()),
                "w2": pa.array([], pa.string()),
                "n": pa.array([], pa.int64()),
            })
        words = pc.split_pattern(b["p_type"], " ")
        first = pc.list_element(words, 0)
        wl = words.to_pylist()
        last = pa.array([w[-1] for w in wl], pa.string())
        t = pa.table({
            "w1": first,
            "w2": last,
            "n": pa.array(np.ones(b.num_rows, np.int64)),
        })
        g = t.group_by(["w1", "w2"]).aggregate([("n", "sum")])
        return g.rename_columns(["w1", "w2", "n"])

    def comb(b: pa.Table) -> pa.Table:
        g = b.group_by(["w1", "w2"]).aggregate([("n", "sum")])
        return g.rename_columns(["w1", "w2", "n"])

    jc = tree_merge(
        parts.map_batches(part, batch_format="pyarrow",
                          batch_size=None),
        comb,
    ).to_pandas()
    if "w1" not in jc.columns or len(jc) == 0:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _PWM_COLS})
    jc = jc.sort_values(["w1", "w2"]).reset_index(drop=True)
    n = float(jc["n"].sum())
    p1 = jc.groupby("w1")["n"].sum() / n
    p2 = jc.groupby("w2")["n"].sum() / n
    mi = 0.0
    for _, r in jc.iterrows():
        pxy = r["n"] / n
        mi += pxy * np.log2(
            pxy / (float(p1[r["w1"]]) * float(p2[r["w2"]])))
    h1 = float(-(p1 * np.log2(p1)).sum())
    h2 = float(-(p2 * np.log2(p2)).sum())
    return pa.table({
        "n_parts": pa.array([int(n)], pa.int64()),
        "n_first_words": pa.array([len(p1)], pa.int64()),
        "n_last_words": pa.array([len(p2)], pa.int64()),
        "mi_ppm": pa.array(
            [_round_half_away(mi * 1e6)], pa.int64()),
        "h_first_ppm": pa.array(
            [_round_half_away(h1 * 1e6)], pa.int64()),
        "h_last_ppm": pa.array(
            [_round_half_away(h2 * 1e6)], pa.int64()),
    })


PWM_SQL = """
WITH w AS MATERIALIZED (
  SELECT STRING_SPLIT(p_type, ' ')[1] AS w1,
         STRING_SPLIT(p_type, ' ')[LEN(STRING_SPLIT(
             p_type, ' '))] AS w2
  FROM part WHERE p_type IS NOT NULL
), jc AS MATERIALIZED (
  SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS n
  FROM w GROUP BY 1, 2
), tot AS MATERIALIZED (
  SELECT CAST(SUM(n) AS BIGINT) AS n FROM jc
), m1 AS MATERIALIZED (
  SELECT w1, CAST(SUM(n) AS BIGINT) AS n1 FROM jc GROUP BY 1
), m2 AS MATERIALIZED (
  SELECT w2, CAST(SUM(n) AS BIGINT) AS n2 FROM jc GROUP BY 1
), mi AS MATERIALIZED (
  SELECT SUM((CAST(jc.n AS DOUBLE) / tot.n)
             * LOG2((CAST(jc.n AS DOUBLE) / tot.n)
                    / ((CAST(m1.n1 AS DOUBLE) / tot.n)
                       * (CAST(m2.n2 AS DOUBLE) / tot.n))))
           AS v
  FROM jc JOIN m1 USING (w1) JOIN m2 USING (w2)
  CROSS JOIN tot
), h1 AS MATERIALIZED (
  SELECT -SUM((CAST(n1 AS DOUBLE) / tot.n)
              * LOG2(CAST(n1 AS DOUBLE) / tot.n)) AS v
  FROM m1 CROSS JOIN tot
), h2 AS MATERIALIZED (
  SELECT -SUM((CAST(n2 AS DOUBLE) / tot.n)
              * LOG2(CAST(n2 AS DOUBLE) / tot.n)) AS v
  FROM m2 CROSS JOIN tot
)
SELECT tot.n AS n_parts,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM m1)
         AS n_first_words,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM m2)
         AS n_last_words,
       CAST(ROUND(mi.v * 1000000, 0) AS BIGINT) AS mi_ppm,
       CAST(ROUND(h1.v * 1000000, 0) AS BIGINT) AS h_first_ppm,
       CAST(ROUND(h2.v * 1000000, 0) AS BIGINT) AS h_last_ppm
FROM tot CROSS JOIN mi CROSS JOIN h1 CROSS JOIN h2
WHERE tot.n > 0
"""

_CSR_COLS = ["n_name", "n_customers", "n_suppliers",
             "cust_per_supp_x1e3", "share_gap_bp"]


def q_cust_supp_ratio_by_nation(sf_dir):
    """The import-pressure map: per nation, customers per local
    supplier and the gap between the nation's share of all
    customers and its share of all suppliers (basis points) —
    nations far above 0 bp lean on foreign supply.  Both dims
    count distributed; the tiny nation name map joins last."""
    nation = rd.read_parquet(
        f"{sf_dir}/nation.parquet",
        columns=["n_nationkey", "n_name"]).to_pandas()
    if len(nation) == 0:
        return pa.table({
            "n_name": pa.array([], pa.string()),
            "n_customers": pa.array([], pa.int64()),
            "n_suppliers": pa.array([], pa.int64()),
            "cust_per_supp_x1e3": pa.array([], pa.int64()),
            "share_gap_bp": pa.array([], pa.int64()),
        })

    def counts(path, col):
        ds = rd.read_parquet(path, columns=[col])

        def part(b: pa.Table) -> pa.Table:
            b = b.filter(pc.is_valid(b[col]))
            t = pa.table({
                "nk": b[col].cast(pa.int64()),
                "n": pa.array(np.ones(b.num_rows, np.int64)),
            })
            g = t.group_by(["nk"]).aggregate([("n", "sum")])
            return g.rename_columns(["nk", "n"])

        def comb(b: pa.Table) -> pa.Table:
            g = b.group_by(["nk"]).aggregate([("n", "sum")])
            return g.rename_columns(["nk", "n"])

        return tree_merge(
            ds.map_batches(part, batch_format="pyarrow",
                           batch_size=None), comb).to_pandas()

    cc = counts(f"{sf_dir}/customer.parquet", "c_nationkey")
    sc = counts(f"{sf_dir}/supplier.parquet", "s_nationkey")
    if ("nk" not in cc.columns or len(cc) == 0
            or "nk" not in sc.columns or len(sc) == 0):
        return pa.table({
            "n_name": pa.array([], pa.string()),
            "n_customers": pa.array([], pa.int64()),
            "n_suppliers": pa.array([], pa.int64()),
            "cust_per_supp_x1e3": pa.array([], pa.int64()),
            "share_gap_bp": pa.array([], pa.int64()),
        })
    tot_c = int(cc["n"].sum())
    tot_s = int(sc["n"].sum())
    m = nation.rename(columns={"n_nationkey": "nk"}).merge(
        cc.rename(columns={"n": "nc"}), on="nk").merge(
        sc.rename(columns={"n": "ns"}), on="nk")
    m = m[(m["nc"] > 0) & (m["ns"] > 0)].sort_values("n_name")
    return pa.table({
        "n_name": pa.array(m["n_name"], pa.string()),
        "n_customers": pa.array(
            m["nc"].to_numpy(np.int64), pa.int64()),
        "n_suppliers": pa.array(
            m["ns"].to_numpy(np.int64), pa.int64()),
        "cust_per_supp_x1e3": pa.array(
            [_round_half_away(c / s * 1e3)
             for c, s in zip(m["nc"], m["ns"])], pa.int64()),
        "share_gap_bp": pa.array(
            [_round_half_away((c / tot_c - s / tot_s) * 1e4)
             for c, s in zip(m["nc"], m["ns"])], pa.int64()),
    })


CSR_SQL = """
WITH cc AS MATERIALIZED (
  SELECT c_nationkey AS nk, CAST(COUNT(*) AS BIGINT) AS nc
  FROM customer WHERE c_nationkey IS NOT NULL GROUP BY 1
), sc AS MATERIALIZED (
  SELECT s_nationkey AS nk, CAST(COUNT(*) AS BIGINT) AS ns
  FROM supplier WHERE s_nationkey IS NOT NULL GROUP BY 1
), tot AS MATERIALIZED (
  SELECT (SELECT CAST(SUM(nc) AS BIGINT) FROM cc) AS tc,
         (SELECT CAST(SUM(ns) AS BIGINT) FROM sc) AS ts
)
SELECT n.n_name, cc.nc AS n_customers, sc.ns AS n_suppliers,
       CAST(ROUND(CAST(cc.nc AS DOUBLE) / sc.ns * 1000, 0)
            AS BIGINT) AS cust_per_supp_x1e3,
       CAST(ROUND((CAST(cc.nc AS DOUBLE) / tot.tc
                   - CAST(sc.ns AS DOUBLE) / tot.ts)
            * 10000, 0) AS BIGINT) AS share_gap_bp
FROM nation n
JOIN cc ON cc.nk = n.n_nationkey
JOIN sc ON sc.nk = n.n_nationkey
CROSS JOIN tot
WHERE cc.nc > 0 AND sc.ns > 0
ORDER BY n.n_name
"""

_PKV_COLS = ["event_type", "n_events", "slope_x1e6",
             "corr_ppm"]


def q_props_k_value_slope(sf_dir):
    """Does the embedded k payload predict event value?  Per
    event type, the OLS slope and Pearson correlation of value
    (mills) on props.k — a flat slope everywhere means k is
    routing metadata, not a magnitude.  Per-type integer moment
    sums (n, Σk, Σv, Σk², Σv², Σkv) fold exactly."""
    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "value", "props"])

    def part(b: pa.Table) -> pa.Table:
        b = _valid(b, ("event_type", "value", "props"))
        if b.num_rows == 0:
            return pa.table({
                "et": pa.array([], pa.string()),
                "n": pa.array([], pa.int64()),
                "sk": pa.array([], pa.int64()),
                "sv": pa.array([], pa.int64()),
                "skk": pa.array([], pa.int64()),
                "svv": pa.array([], pa.int64()),
                "skv": pa.array([], pa.int64()),
            })
        k = extract_int_key(b["props"], "k")
        ok = pc.is_valid(k)
        b = b.filter(ok)
        k = pc.filter(k, ok)
        if b.num_rows == 0:
            return pa.table({
                "et": pa.array([], pa.string()),
                "n": pa.array([], pa.int64()),
                "sk": pa.array([], pa.int64()),
                "sv": pa.array([], pa.int64()),
                "skk": pa.array([], pa.int64()),
                "svv": pa.array([], pa.int64()),
                "skv": pa.array([], pa.int64()),
            })
        kk = k.to_numpy(zero_copy_only=False).astype(np.int64)
        val = b["value"].cast(pa.float64()).to_numpy(
            zero_copy_only=False)
        v = np.where(val >= 0, np.floor(val * 1000 + 0.5),
                     np.ceil(val * 1000 - 0.5)).astype(np.int64)
        df = pd.DataFrame({
            "et": np.asarray(
                b["event_type"].to_numpy(zero_copy_only=False)),
            "n": 1, "sk": kk, "sv": v, "skk": kk * kk,
            "svv": v * v, "skv": kk * v,
        })
        agg = df.groupby("et").sum().reset_index()
        for cn in ["n", "sk", "sv", "skk", "svv", "skv"]:
            agg[cn] = agg[cn].astype(np.int64)
        return pa.Table.from_pandas(agg, preserve_index=False)

    def comb(b: pa.Table) -> pa.Table:
        g = b.group_by(["et"]).aggregate(
            [("n", "sum"), ("sk", "sum"), ("sv", "sum"),
             ("skk", "sum"), ("svv", "sum"), ("skv", "sum")])
        return g.rename_columns(
            ["et", "n", "sk", "sv", "skk", "svv", "skv"])

    mm = tree_merge(
        ev.map_batches(part, batch_format="pyarrow",
                       batch_size=None),
        comb,
    ).to_pandas()
    if "et" not in mm.columns or len(mm) == 0:
        return pa.table({
            "event_type": pa.array([], pa.string()),
            "n_events": pa.array([], pa.int64()),
            "slope_x1e6": pa.array([], pa.int64()),
            "corr_ppm": pa.array([], pa.int64()),
        })
    mm = mm.sort_values("et")
    ets, ns, slopes, corrs = [], [], [], []
    for _, r in mm.iterrows():
        n = float(r["n"])
        if r["n"] < 3:
            continue
        sk, sv = float(r["sk"]), float(r["sv"])
        skk, svv, skv = (float(r["skk"]), float(r["svv"]),
                         float(r["skv"]))
        denx = n * skk - sk * sk
        deny = n * svv - sv * sv
        if denx <= 0 or deny <= 0:
            continue
        cov = n * skv - sk * sv
        ets.append(r["et"])
        ns.append(int(r["n"]))
        slopes.append(_round_half_away(cov / denx * 1e6))
        corrs.append(_round_half_away(
            cov / np.sqrt(denx * deny) * 1e6))
    return pa.table({
        "event_type": pa.array(ets, pa.string()),
        "n_events": pa.array(ns, pa.int64()),
        "slope_x1e6": pa.array(slopes, pa.int64()),
        "corr_ppm": pa.array(corrs, pa.int64()),
    })


PKV_SQL = """
WITH kv AS MATERIALIZED (
  SELECT event_type AS et,
         TRY_CAST(json_extract_string(props, '$.k') AS BIGINT)
           AS k,
         CAST(ROUND(value * 1000, 0) AS BIGINT) AS v
  FROM events
  WHERE event_type IS NOT NULL AND value IS NOT NULL
    AND props IS NOT NULL
), f AS MATERIALIZED (
  SELECT * FROM kv WHERE k IS NOT NULL
), mm AS MATERIALIZED (
  SELECT et, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(k) AS BIGINT) AS sk,
         CAST(SUM(v) AS BIGINT) AS sv,
         CAST(SUM(k * k) AS BIGINT) AS skk,
         CAST(SUM(v * v) AS BIGINT) AS svv,
         CAST(SUM(k * v) AS BIGINT) AS skv
  FROM f GROUP BY 1
)
SELECT et AS event_type, n AS n_events,
       CAST(ROUND((n * CAST(skv AS DOUBLE) -
                   CAST(sk AS DOUBLE) * sv)
            / (n * CAST(skk AS DOUBLE) -
               CAST(sk AS DOUBLE) * sk) * 1000000, 0)
            AS BIGINT) AS slope_x1e6,
       CAST(ROUND((n * CAST(skv AS DOUBLE) -
                   CAST(sk AS DOUBLE) * sv)
            / SQRT((n * CAST(skk AS DOUBLE) -
                    CAST(sk AS DOUBLE) * sk)
                   * (n * CAST(svv AS DOUBLE) -
                      CAST(sv AS DOUBLE) * sv)) * 1000000, 0)
            AS BIGINT) AS corr_ppm
FROM mm
WHERE n >= 3
  AND n * CAST(skk AS DOUBLE) - CAST(sk AS DOUBLE) * sk > 0
  AND n * CAST(svv AS DOUBLE) - CAST(sv AS DOUBLE) * sv > 0
ORDER BY et
"""


def register_r4ic(queries: dict, oracles: dict) -> None:
    queries.update(
        {
            "ptype_word_mi": q_ptype_word_mi,
            "cust_supp_ratio_by_nation":
                q_cust_supp_ratio_by_nation,
            "props_k_value_slope": q_props_k_value_slope,
        }
    )
    oracles.update(
        {
            "ptype_word_mi": PWM_SQL,
            "cust_supp_ratio_by_nation": CSR_SQL,
            "props_k_value_slope": PKV_SQL,
        }
    )
