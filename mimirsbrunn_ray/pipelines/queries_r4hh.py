"""Round-4 batch HH: naming combinatorics, priority effectiveness,
and load-speed coupling — the part-name word-reuse census (how
small a vocabulary generates all part names, and how much the top
word covers — compositional naming compresses; free-text naming
does not), a one-way ANOVA F of first-ship latency across order
priorities (the single number that says whether priority DOES
anything), and the supplier volume-latency correlation (do busy
suppliers ship slower — the capacity-stress signal across the
supplier fleet).

Exactness discipline: name-word counts are pure integers; the
ANOVA folds exact integer latencies through two-pass centered
moments per priority; the volume-latency correlation pairs exact
counts with interpolated per-supplier medians through the shared
centered form."""

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
from mimirsbrunn_ray.pipelines.queries_r4gz import _pearson
from mimirsbrunn_ray.stages.dedup import _BUCKET, add_bucket
from mimirsbrunn_ray.stages.rollup import tree_merge


def _valid(b: pa.Table, cols) -> pa.Table:
    m = None
    for c in cols:
        v = pc.is_valid(b[c])
        m = v if m is None else pc.and_(m, v)
    return b.filter(m)


_PNW_COLS = ["n_names", "n_name_words", "vocab", "top_word_ppm",
             "mean_words_per_name_x1e3"]


def q_part_name_word_reuse(sf_dir):
    """Naming-system census: the vocabulary behind part names —
    distinct words, total word slots, the top word's coverage, and
    mean words per name; a tiny vocabulary with high reuse means
    names are COMPOSITIONAL (word-level features work), a huge one
    means free text (they don't).  Word counts fold exactly in one
    pass."""
    parts = rd.read_parquet(f"{sf_dir}/part.parquet",
                            columns=["p_name"])

    def part(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_valid(b["p_name"]))
        if b.num_rows == 0:
            return pa.table({
                "w": pa.array([], pa.string()),
                "n": pa.array([], pa.int64()),
                "names": pa.array([], pa.int64()),
            })
        words = pc.split_pattern(b["p_name"], pattern=" ")
        flat = pc.list_flatten(words)
        t = pa.table({
            "w": flat,
            "n": pa.array(
                np.ones(len(flat), np.int64)),
        })
        g = t.group_by(["w"]).aggregate([("n", "sum")])
        g = g.rename_columns(["w", "n"])
        return g.append_column(
            "names", pa.array(
                np.full(g.num_rows, b.num_rows, np.int64)))

    def comb(b: pa.Table) -> pa.Table:
        g = b.group_by(["w"]).aggregate(
            [("n", "sum"), ("names", "max")])
        return g.rename_columns(["w", "n", "names"])

    # names count must SUM across batches, not max; track apart
    def nc_part(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_valid(b["p_name"]))
        return pa.table(
            {"names": pa.array([b.num_rows], pa.int64())})

    def nc_comb(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table(
                {"names": pa.array([], pa.int64())})
        return pa.table(
            {"names": pa.array([pc.sum(b["names"]).as_py() or 0],
                               pa.int64())})

    parts_ds = parts.materialize()
    wc = tree_merge(
        parts_ds.map_batches(
            lambda b: part(b).select(["w", "n"]),
            batch_format="pyarrow", batch_size=None),
        lambda b: b.group_by(["w"]).aggregate(
            [("n", "sum")]).rename_columns(["w", "n"]),
    ).to_pandas()
    nc = tree_merge(
        parts_ds.map_batches(nc_part, batch_format="pyarrow",
                             batch_size=None),
        nc_comb,
    ).to_pandas()
    if ("w" not in wc.columns or len(wc) == 0
            or "names" not in nc.columns or len(nc) == 0):
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _PNW_COLS})
    n_names = int(nc["names"].iloc[0])
    n = wc["n"].to_numpy(np.int64)
    total_words = int(n.sum())
    if n_names == 0 or total_words == 0:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _PNW_COLS})
    return pa.table({
        "n_names": pa.array([n_names], pa.int64()),
        "n_name_words": pa.array([total_words], pa.int64()),
        "vocab": pa.array([len(wc)], pa.int64()),
        "top_word_ppm": pa.array(
            [_round_half_away(int(n.max()) / n_names * 1e6)],
            pa.int64()),
        "mean_words_per_name_x1e3": pa.array(
            [_round_half_away(total_words / n_names * 1e3)],
            pa.int64()),
    })


PNW_SQL = """
WITH w AS (
  SELECT unnest(string_split(p_name, ' ')) AS w
  FROM part WHERE p_name IS NOT NULL
), c AS MATERIALIZED (
  SELECT w, CAST(COUNT(*) AS BIGINT) AS n FROM w GROUP BY 1
), nn AS MATERIALIZED (
  SELECT CAST(COUNT(*) AS BIGINT) AS names FROM part
  WHERE p_name IS NOT NULL
)
SELECT nn.names AS n_names,
       CAST(SUM(c.n) AS BIGINT) AS n_name_words,
       CAST(COUNT(*) AS BIGINT) AS vocab,
       CAST(ROUND(CAST(MAX(c.n) AS DOUBLE) / nn.names
            * 1000000, 0) AS BIGINT) AS top_word_ppm,
       CAST(ROUND(CAST(SUM(c.n) AS DOUBLE) / nn.names * 1000, 0)
            AS BIGINT) AS mean_words_per_name_x1e3
FROM c CROSS JOIN nn
GROUP BY nn.names
HAVING nn.names > 0 AND SUM(c.n) > 0
"""

_LPA_COLS = ["n_priorities", "n_orders", "f_x1e3",
             "eta2_ppm"]


def q_latency_priority_anova(sf_dir):
    """Does priority DO anything?  One-way ANOVA F of first-ship
    latency across the five order priorities plus eta^2 (the
    variance share priority explains) — a large F with tiny eta^2
    is the classic 'significant but irrelevant' outcome this pair
    of numbers disambiguates.  Latencies fold as exact integers
    through two-pass per-priority moments."""
    # scale shape: per-order first-ship stays a Dataset, order columns
    # attach via budget-gated broadcast / join, and the ANOVA moments
    # fold over a distributed (priority, latency-days) histogram —
    # 5 x small-int cells. Orders never land whole on the driver.
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
                    ["o_orderdate", "o_orderpriority"], how="inner")

    def hist_part(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"prio": pa.array([], pa.string()),
                             "lat": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        od = b["o_orderdate"].cast(pa.timestamp("us")).cast(
            pa.int64()).to_numpy(zero_copy_only=False)
        lat = (b["ship"].to_numpy(zero_copy_only=False) - od) // _DAY_US
        t = pa.table({
            "prio": b["o_orderpriority"],
            "lat": pa.array(lat.astype(np.int64)),
            "n": pa.array(np.ones(len(lat), np.int64)),
        })
        g = t.group_by(["prio", "lat"]).aggregate([("n", "sum")])
        return g.rename_columns(["prio", "lat", "n"])

    def hist_comb(b: pa.Table) -> pa.Table:
        g = b.group_by(["prio", "lat"]).aggregate([("n", "sum")])
        return g.rename_columns(["prio", "lat", "n"])

    hist = tree_merge(
        fs.map_batches(hist_part, batch_format="pyarrow",
                       batch_size=None),
        hist_comb).to_pandas()
    if "prio" not in hist.columns or len(hist) == 0:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _LPA_COLS})
    hist = hist.sort_values(["prio", "lat"], ignore_index=True)
    k = hist["prio"].nunique()
    N = int(hist["n"].sum())
    if k < 2 or N <= k:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _LPA_COLS})
    grand = float((hist["lat"] * hist["n"]).sum()) / N
    ssb = ssw = 0.0
    for _, g in hist.groupby("prio", sort=True):
        v = g["lat"].to_numpy(np.int64).astype(np.float64)
        c = g["n"].to_numpy(np.int64)
        ng = int(c.sum())
        mg = float((v * c).sum()) / ng
        ssb += ng * (mg - grand) ** 2
        ssw += float((c * (v - mg) ** 2).sum())
    if ssw == 0 or ssb + ssw == 0:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _LPA_COLS})
    f = (ssb / (k - 1)) / (ssw / (N - k))
    eta2 = ssb / (ssb + ssw)
    return pa.table({
        "n_priorities": pa.array([k], pa.int64()),
        "n_orders": pa.array([N], pa.int64()),
        "f_x1e3": pa.array(
            [_round_half_away(f * 1e3)], pa.int64()),
        "eta2_ppm": pa.array(
            [_round_half_away(eta2 * 1e6)], pa.int64()),
    })


LPA_SQL = f"""
WITH fs AS MATERIALIZED (
  SELECT o.o_orderkey, o.o_orderpriority AS prio,
         CAST((MIN(EPOCH_US(l.l_shipdate))
               - EPOCH_US(o.o_orderdate)) // {_DAY_US}
              AS DOUBLE) AS lat
  FROM orders o JOIN lineitem l
    ON l.l_orderkey = o.o_orderkey
  WHERE o.o_orderkey IS NOT NULL AND o.o_orderdate IS NOT NULL
    AND o.o_orderpriority IS NOT NULL
    AND l.l_shipdate IS NOT NULL
  GROUP BY 1, 2, EPOCH_US(o.o_orderdate)
), gm AS MATERIALIZED (
  SELECT prio, AVG(lat) AS mu,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM fs GROUP BY 1
), grand AS MATERIALIZED (
  SELECT AVG(lat) AS g, CAST(COUNT(*) AS BIGINT) AS nn,
         CAST((SELECT COUNT(*) FROM gm) AS BIGINT) AS k
  FROM fs
), ssb_t AS MATERIALIZED (
  SELECT SUM(gm.n * (gm.mu - grand.g) * (gm.mu - grand.g))
           AS ssb
  FROM gm CROSS JOIN grand
), ssw_t AS MATERIALIZED (
  SELECT SUM((fs.lat - gm.mu) * (fs.lat - gm.mu)) AS ssw
  FROM fs JOIN gm USING (prio)
)
SELECT grand.k AS n_priorities,
       grand.nn AS n_orders,
       CAST(ROUND((ssb_t.ssb / (grand.k - 1))
            / (ssw_t.ssw / (grand.nn - grand.k)) * 1000, 0)
            AS BIGINT) AS f_x1e3,
       CAST(ROUND(ssb_t.ssb / (ssb_t.ssb + ssw_t.ssw)
            * 1000000, 0) AS BIGINT) AS eta2_ppm
FROM grand CROSS JOIN ssb_t CROSS JOIN ssw_t
WHERE grand.k >= 2 AND grand.nn > grand.k
  AND ssw_t.ssw <> 0 AND ssb_t.ssb + ssw_t.ssw <> 0
"""

_SVL_COLS = ["n_suppliers", "r_x1e6", "mean_volume_x1e3",
             "mean_median_lat_x1e3"]


def q_supplier_volume_latency_corr(sf_dir):
    """Capacity stress across the fleet: the Pearson correlation
    between each supplier's lineitem volume and their MEDIAN ship
    latency — positive means busy suppliers run slower
    (under-capacity), ~0 means latency is supplier-intrinsic and
    rerouting volume won't help.  Per-supplier medians resolve in
    supplier-disjoint shards; the correlation folds the shared
    centered form."""
    # the order-date bridge attaches via budget-gated broadcast / join
    # (stages/broadcast.py) — orders never land on the driver
    from mimirsbrunn_ray.stages.broadcast import attach_dim

    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_suppkey", "l_shipdate"])
    li = li.map_batches(
        lambda b: _valid(b, ("l_orderkey", "l_suppkey", "l_shipdate")),
        batch_format="pyarrow", batch_size=None)
    li = attach_dim(li, "l_orderkey", sf_dir, "orders", "o_orderkey",
                    ["o_orderdate"], how="inner")

    def project(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({
                "suppkey": pa.array([], pa.int64()),
                "lat": pa.array([], pa.int64()),
            })
        ship = b["l_shipdate"].cast(pa.timestamp("us")).cast(
            pa.int64()).to_numpy(zero_copy_only=False)
        od = b["o_orderdate"].cast(pa.timestamp("us")).cast(
            pa.int64()).to_numpy(zero_copy_only=False)
        lat = (ship - od) // _DAY_US
        return pa.table({
            "suppkey": pa.array(
                b["l_suppkey"].to_numpy(
                    zero_copy_only=False).astype(np.int64)),
            "lat": pa.array(lat.astype(np.int64)),
        })

    def per_supplier(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({
            "suppkey": pd.Series([], dtype=np.int64),
            "vol": pd.Series([], dtype=np.int64),
            "med": pd.Series([], dtype=np.float64),
        })
        if len(g) == 0:
            return empty
        rows = {"suppkey": [], "vol": [], "med": []}
        for sk, sub in g.groupby("suppkey"):
            v = sub["lat"].to_numpy(np.int64)
            rows["suppkey"].append(int(sk))
            rows["vol"].append(len(v))
            rows["med"].append(float(np.percentile(v, 50)))
        df = pd.DataFrame(rows)
        df["suppkey"] = df["suppkey"].astype(np.int64)
        df["vol"] = df["vol"].astype(np.int64)
        return df

    per = (
        li.map_batches(
            lambda b: add_bucket(project(b), "suppkey", 16),
            batch_format="pyarrow", batch_size=None)
        .groupby(_BUCKET)
        .map_groups(per_supplier, batch_format="pandas")
        .to_pandas()
    )
    if "suppkey" not in per.columns or len(per) < 3:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _SVL_COLS})
    x = per["vol"].to_numpy(np.int64).astype(np.float64)
    y = per["med"].to_numpy(np.float64)
    r = _pearson(x, y)
    if r is None:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _SVL_COLS})
    return pa.table({
        "n_suppliers": pa.array([len(per)], pa.int64()),
        "r_x1e6": pa.array(
            [_round_half_away(r * 1e6)], pa.int64()),
        "mean_volume_x1e3": pa.array(
            [_round_half_away(float(x.mean()) * 1e3)],
            pa.int64()),
        "mean_median_lat_x1e3": pa.array(
            [_round_half_away(float(y.mean()) * 1e3)],
            pa.int64()),
    })


SVL_SQL = f"""
WITH lat AS MATERIALIZED (
  SELECT l.l_suppkey AS sk,
         CAST((EPOCH_US(l.l_shipdate)
               - EPOCH_US(o.o_orderdate)) // {_DAY_US}
              AS DOUBLE) AS lat
  FROM lineitem l JOIN orders o
    ON o.o_orderkey = l.l_orderkey
  WHERE l.l_orderkey IS NOT NULL AND l.l_suppkey IS NOT NULL
    AND l.l_shipdate IS NOT NULL AND o.o_orderdate IS NOT NULL
), per AS MATERIALIZED (
  SELECT sk, CAST(COUNT(*) AS DOUBLE) AS vol,
         MEDIAN(lat) AS med
  FROM lat GROUP BY 1
), mu AS MATERIALIZED (
  SELECT AVG(vol) AS mv, AVG(med) AS mm,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM per
), mom AS (
  SELECT SUM((p.vol - mu.mv) * (p.med - mu.mm)) AS sxy,
         SUM((p.vol - mu.mv) * (p.vol - mu.mv)) AS sxx,
         SUM((p.med - mu.mm) * (p.med - mu.mm)) AS syy
  FROM per p CROSS JOIN mu
)
SELECT mu.n AS n_suppliers,
       CAST(ROUND(mom.sxy / SQRT(mom.sxx * mom.syy) * 1000000,
            0) AS BIGINT) AS r_x1e6,
       CAST(ROUND(mu.mv * 1000, 0) AS BIGINT)
         AS mean_volume_x1e3,
       CAST(ROUND(mu.mm * 1000, 0) AS BIGINT)
         AS mean_median_lat_x1e3
FROM mu CROSS JOIN mom
WHERE mu.n >= 3 AND mom.sxx * mom.syy > 0
"""


def register_r4hh(queries: dict, oracles: dict) -> None:
    queries.update(
        {
            "part_name_word_reuse": q_part_name_word_reuse,
            "latency_priority_anova": q_latency_priority_anova,
            "supplier_volume_latency_corr":
                q_supplier_volume_latency_corr,
        }
    )
    oracles.update(
        {
            "part_name_word_reuse": PNW_SQL,
            "latency_priority_anova": LPA_SQL,
            "supplier_volume_latency_corr": SVL_SQL,
        }
    )
