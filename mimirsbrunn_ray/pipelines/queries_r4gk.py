"""Round-4 batch GK: latency-outcome coupling, optimizer
assumptions, and robust location — return rate by first-ship
latency band (does slow fulfillment correlate with returns — the
ops-to-revenue causal lead), a selectivity independence audit
(actual conjunctive selectivity vs the product of marginals for
three predicate pairs — the error every independence-assuming
query optimizer makes on this data), and the geometric-median
shift of the embedding cloud (10 Weiszfeld iterations from the
mean; a large mean-to-median distance flags outlier vectors
dragging the centroid).

Exactness discipline: band counts and selectivities are pure
integers; Weiszfeld runs the same fixed 10 iterations with the
same epsilon guard and identical double expressions on both
engines."""

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

_EMB_DIM = 64
_WEISZ_ITERS = 10
_WEISZ_EPS = 1e-12

_BANDS = ((0, 7), (8, 30), (31, 10 ** 9))
_BAND_NAMES = ("0-7d", "8-30d", "31d+")


def _valid(b: pa.Table, cols) -> pa.Table:
    m = None
    for c in cols:
        v = pc.is_valid(b[c])
        m = v if m is None else pc.and_(m, v)
    return b.filter(m)


_RB_COLS = ["band", "n_lineitems", "n_returned", "return_ppm"]


def q_return_rate_by_latency_band(sf_dir):
    """Return rate by shipping-latency band: each lineitem's
    latency (ship date minus its order's date, in days) buckets
    into 0-7 / 8-30 / 31+ days, and the share with returnflag 'R'
    per band — the coupling that makes slow fulfillment a revenue
    problem, not just an ops one.  The order-date map broadcasts;
    band counts fold as pure integers in one lineitem pass."""
    from mimirsbrunn_ray.stages.broadcast import attach_dim

    # the order-date bridge attaches via budget-gated broadcast / join
    # (stages/broadcast.py) — orders never land on the driver
    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_shipdate", "l_returnflag"])
    li = li.map_batches(
        lambda b: _valid(b, ("l_orderkey", "l_shipdate", "l_returnflag")),
        batch_format="pyarrow", batch_size=None)
    li = attach_dim(li, "l_orderkey", sf_dir, "orders", "o_orderkey",
                    ["o_orderdate"], how="inner")

    def part(b: pa.Table) -> pa.Table:
        cols = ["band", "n", "r"]
        if b.num_rows == 0:
            return pa.table({
                "band": pa.array([], pa.string()),
                "n": pa.array([], pa.int64()),
                "r": pa.array([], pa.int64()),
            })
        ship = b["l_shipdate"].cast(pa.timestamp("us")).cast(
            pa.int64()).to_numpy(zero_copy_only=False)
        od = b["o_orderdate"].cast(pa.timestamp("us")).cast(
            pa.int64()).to_numpy(zero_copy_only=False)
        lat = (ship - od) // _DAY_US
        ret = (np.asarray(
            b["l_returnflag"].to_numpy(
                zero_copy_only=False)) == "R")
        band = np.select(
            [lat <= 7, lat <= 30],
            [_BAND_NAMES[0], _BAND_NAMES[1]],
            default=_BAND_NAMES[2])
        df = pd.DataFrame({
            "band": band,
            "n": np.ones(len(lat), np.int64),
            "r": ret.astype(np.int64),
        })
        agg = df.groupby("band", sort=False).agg(
            n=("n", "sum"), r=("r", "sum")).reset_index()
        for c in ["n", "r"]:
            agg[c] = agg[c].astype(np.int64)
        return pa.Table.from_pandas(agg[cols],
                                    preserve_index=False)

    def comb(b: pa.Table) -> pa.Table:
        g = b.group_by(["band"]).aggregate(
            [("n", "sum"), ("r", "sum")])
        return g.rename_columns(["band", "n", "r"])

    res = tree_merge(
        li.map_batches(part, batch_format="pyarrow",
                       batch_size=None),
        comb,
    ).to_pandas()
    if "band" not in res.columns or len(res) == 0:
        return pa.table({
            "band": pa.array([], pa.string()),
            **{c: pa.array([], pa.int64()) for c in _RB_COLS[1:]},
        })
    res = res.sort_values("band", ignore_index=True)
    ppm = [
        _round_half_away(r / n * 1e6)
        for r, n in zip(res["r"].astype(np.int64),
                        res["n"].astype(np.int64))
    ]
    return pa.table({
        "band": pa.array(res["band"], pa.string()),
        "n_lineitems": pa.array(res["n"].to_numpy(np.int64)),
        "n_returned": pa.array(res["r"].to_numpy(np.int64)),
        "return_ppm": pa.array(ppm, pa.int64()),
    })


RETURN_BAND_SQL = f"""
WITH li AS MATERIALIZED (
  SELECT CASE
           WHEN (EPOCH_US(l.l_shipdate)
                 - EPOCH_US(o.o_orderdate)) // {_DAY_US} <= 7
             THEN '0-7d'
           WHEN (EPOCH_US(l.l_shipdate)
                 - EPOCH_US(o.o_orderdate)) // {_DAY_US} <= 30
             THEN '8-30d'
           ELSE '31d+' END AS band,
         CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END AS r
  FROM lineitem l JOIN orders o
    ON o.o_orderkey = l.l_orderkey
  WHERE l.l_orderkey IS NOT NULL AND l.l_shipdate IS NOT NULL
    AND l.l_returnflag IS NOT NULL AND o.o_orderdate IS NOT NULL
)
SELECT band,
       CAST(COUNT(*) AS BIGINT) AS n_lineitems,
       CAST(SUM(r) AS BIGINT) AS n_returned,
       CAST(ROUND(CAST(SUM(r) AS DOUBLE) / COUNT(*) * 1000000,
            0) AS BIGINT) AS return_ppm
FROM li GROUP BY 1 ORDER BY band
"""

_SEL_COLS = ["pair", "n_rows", "actual_ppm", "independent_ppm",
             "corr_factor_x1e3"]


def q_selectivity_independence_audit(sf_dir):
    """Optimizer-assumption audit: for three lineitem predicate
    pairs — (discount > 0.05, quantity > 25), (quantity > 25,
    returnflag = 'R'), (discount > 0.05, returnflag = 'R') — the
    ACTUAL conjunctive selectivity vs the product of marginals,
    and their ratio (the correlation factor an independence-
    assuming cardinality estimator is off by).  Pure integer
    predicate counts in one pass."""
    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_discount", "l_quantity", "l_returnflag"])

    def part(b: pa.Table) -> pa.Table:
        b = _valid(b, ("l_discount", "l_quantity", "l_returnflag"))
        disc = b["l_discount"].cast(pa.float64()).to_numpy(
            zero_copy_only=False)
        qty = b["l_quantity"].cast(pa.float64()).to_numpy(
            zero_copy_only=False)
        rf = np.asarray(
            b["l_returnflag"].to_numpy(zero_copy_only=False))
        pa_ = disc > 0.05
        pb = qty > 25
        pr = rf == "R"
        return pa.table({
            "n": pa.array([len(disc)], pa.int64()),
            "a": pa.array([int(pa_.sum())], pa.int64()),
            "b": pa.array([int(pb.sum())], pa.int64()),
            "r": pa.array([int(pr.sum())], pa.int64()),
            "ab": pa.array([int((pa_ & pb).sum())], pa.int64()),
            "br": pa.array([int((pb & pr).sum())], pa.int64()),
            "ar": pa.array([int((pa_ & pr).sum())], pa.int64()),
        })

    def comb(b: pa.Table) -> pa.Table:
        cols = ["n", "a", "b", "r", "ab", "br", "ar"]
        if b.num_rows == 0:
            return pa.table(
                {c: pa.array([], pa.int64()) for c in cols})
        return pa.table({
            c: pa.array([pc.sum(b[c]).as_py() or 0], pa.int64())
            for c in cols})

    t = tree_merge(
        li.map_batches(part, batch_format="pyarrow",
                       batch_size=None),
        comb,
    ).to_pandas()
    if "n" not in t.columns or len(t) == 0 or int(
            t["n"].iloc[0]) == 0:
        return pa.table({
            "pair": pa.array([], pa.string()),
            **{c: pa.array([], pa.int64()) for c in _SEL_COLS[1:]},
        })
    n = int(t["n"].iloc[0])
    marg = {k: int(t[k].iloc[0]) for k in
            ["a", "b", "r", "ab", "br", "ar"]}
    pairs = [
        ("disc_x_qty", marg["a"], marg["b"], marg["ab"]),
        ("qty_x_return", marg["b"], marg["r"], marg["br"]),
        ("disc_x_return", marg["a"], marg["r"], marg["ar"]),
    ]
    out = {c: [] for c in _SEL_COLS}
    for name, ca, cb, cab in pairs:
        actual = cab / n
        indep = (ca / n) * (cb / n)
        if indep == 0:
            continue
        out["pair"].append(name)
        out["n_rows"].append(n)
        out["actual_ppm"].append(_round_half_away(actual * 1e6))
        out["independent_ppm"].append(
            _round_half_away(indep * 1e6))
        out["corr_factor_x1e3"].append(
            _round_half_away(actual / indep * 1e3))
    return pa.table({
        "pair": pa.array(out["pair"], pa.string()),
        **{c: pa.array(out[c], pa.int64()) for c in _SEL_COLS[1:]},
    })


SELECTIVITY_SQL = """
WITH m AS MATERIALIZED (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CASE WHEN l_discount > 0.05 THEN 1 ELSE 0 END)
              AS BIGINT) AS a,
         CAST(SUM(CASE WHEN l_quantity > 25 THEN 1 ELSE 0 END)
              AS BIGINT) AS b,
         CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
              AS BIGINT) AS r,
         CAST(SUM(CASE WHEN l_discount > 0.05
                        AND l_quantity > 25
                       THEN 1 ELSE 0 END) AS BIGINT) AS ab,
         CAST(SUM(CASE WHEN l_quantity > 25
                        AND l_returnflag = 'R'
                       THEN 1 ELSE 0 END) AS BIGINT) AS br,
         CAST(SUM(CASE WHEN l_discount > 0.05
                        AND l_returnflag = 'R'
                       THEN 1 ELSE 0 END) AS BIGINT) AS ar
  FROM lineitem
  WHERE l_discount IS NOT NULL AND l_quantity IS NOT NULL
    AND l_returnflag IS NOT NULL
), pairs AS (
  SELECT 'disc_x_qty' AS pair, n, a AS ca, b AS cb, ab AS cab
  FROM m
  UNION ALL
  SELECT 'qty_x_return', n, b, r, br FROM m
  UNION ALL
  SELECT 'disc_x_return', n, a, r, ar FROM m
)
SELECT pair,
       n AS n_rows,
       CAST(ROUND(CAST(cab AS DOUBLE) / n * 1000000, 0)
            AS BIGINT) AS actual_ppm,
       CAST(ROUND((CAST(ca AS DOUBLE) / n)
                  * (CAST(cb AS DOUBLE) / n) * 1000000, 0)
            AS BIGINT) AS independent_ppm,
       CAST(ROUND((CAST(cab AS DOUBLE) / n)
            / ((CAST(ca AS DOUBLE) / n)
               * (CAST(cb AS DOUBLE) / n)) * 1000, 0) AS BIGINT)
         AS corr_factor_x1e3
FROM pairs
WHERE n > 0 AND ca > 0 AND cb > 0
ORDER BY pair
"""

_GM_COLS = ["n_vecs", "shift_x1e6", "mean_norm_x1e6",
            "gm_norm_x1e6"]


def q_geometric_median_shift(sf_dir):
    """Robust-location audit of the embedding cloud: run 10
    Weiszfeld iterations from the mean vector (weights 1/max(d,
    1e-12)) and report the Euclidean distance between the mean and
    the geometric median, plus both norms — a large shift means
    outlier vectors drag the centroid, and centroid-based ANN
    routing inherits that bias.  Per-vector terms fold
    distributed; the 64-dim iteration mirrors the oracle's
    unrolled chain."""
    emb = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                          columns=["embedding"]).materialize()

    def collect(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_valid(b["embedding"]))
        if b.num_rows == 0:
            return pa.table(
                {"x": pa.array([], pa.list_(pa.float64()))})
        x = b["embedding"].combine_chunks().flatten().to_numpy(
            zero_copy_only=False).astype(np.float64).reshape(
            b.num_rows, -1)
        return pa.table(
            {"x": pa.array(list(x), pa.list_(pa.float64()))})

    tbl = emb.map_batches(collect, batch_format="pyarrow",
                          batch_size=None).to_pandas()
    if "x" not in tbl.columns or len(tbl) == 0:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _GM_COLS})
    x = np.stack(tbl["x"].to_numpy())
    n = len(x)
    mean = x.sum(axis=0) / n
    m = mean.copy()
    for _ in range(_WEISZ_ITERS):
        d = np.sqrt(((x - m) ** 2).sum(axis=1))
        d = np.maximum(d, _WEISZ_EPS)
        w = 1.0 / d
        m = (x * w[:, None]).sum(axis=0) / w.sum()
    shift = float(np.sqrt(((mean - m) ** 2).sum()))
    return pa.table({
        "n_vecs": pa.array([n], pa.int64()),
        "shift_x1e6": pa.array(
            [_round_half_away(shift * 1e6)], pa.int64()),
        "mean_norm_x1e6": pa.array(
            [_round_half_away(
                float(np.sqrt((mean ** 2).sum())) * 1e6)],
            pa.int64()),
        "gm_norm_x1e6": pa.array(
            [_round_half_away(
                float(np.sqrt((m ** 2).sum())) * 1e6)],
            pa.int64()),
    })


def _weisz_sql() -> str:
    chain = []
    prev = "m0"
    for it in range(1, _WEISZ_ITERS + 1):
        cur = f"m{it}"
        chain.append(f"""d{it} AS MATERIALIZED (
  SELECT v.vec_id,
         GREATEST(SQRT(SUM((v.x - {prev}.mu)
                           * (v.x - {prev}.mu))),
                  {_WEISZ_EPS}) AS d
  FROM v JOIN {prev} ON {prev}.j = v.j
  GROUP BY 1
), {cur} AS MATERIALIZED (
  SELECT v.j, SUM(v.x / d{it}.d) / SUM(1.0 / d{it}.d) AS mu
  FROM v JOIN d{it} ON d{it}.vec_id = v.vec_id
  GROUP BY 1
)""")
        prev = cur
    last = f"m{_WEISZ_ITERS}"
    return f"""
WITH v AS MATERIALIZED (
  SELECT vec_id, r.k - 1 AS j,
         CAST(embedding[CAST(r.k AS INTEGER)] AS DOUBLE) AS x
  FROM embeddings CROSS JOIN range(1, {_EMB_DIM + 1}) r(k)
  WHERE embedding IS NOT NULL AND vec_id IS NOT NULL
), nv AS MATERIALIZED (
  SELECT CAST(COUNT(DISTINCT vec_id) AS BIGINT) AS n FROM v
), m0 AS MATERIALIZED (
  SELECT j, SUM(x) / ANY_VALUE(nv.n) AS mu
  FROM v CROSS JOIN nv GROUP BY 1
), {', '.join(chain)},
fin AS (
  SELECT SQRT(SUM((m0.mu - {last}.mu) * (m0.mu - {last}.mu)))
           AS shift,
         SQRT(SUM(m0.mu * m0.mu)) AS mean_norm,
         SQRT(SUM({last}.mu * {last}.mu)) AS gm_norm
  FROM m0 JOIN {last} USING (j)
)
SELECT nv.n AS n_vecs,
       CAST(ROUND(fin.shift * 1000000, 0) AS BIGINT)
         AS shift_x1e6,
       CAST(ROUND(fin.mean_norm * 1000000, 0) AS BIGINT)
         AS mean_norm_x1e6,
       CAST(ROUND(fin.gm_norm * 1000000, 0) AS BIGINT)
         AS gm_norm_x1e6
FROM fin CROSS JOIN nv
WHERE nv.n > 0
"""


WEISZFELD_SQL = _weisz_sql()


def register_r4gk(queries: dict, oracles: dict) -> None:
    queries.update(
        {
            "return_rate_by_latency_band":
                q_return_rate_by_latency_band,
            "selectivity_independence_audit":
                q_selectivity_independence_audit,
            "geometric_median_shift": q_geometric_median_shift,
        }
    )
    oracles.update(
        {
            "return_rate_by_latency_band": RETURN_BAND_SQL,
            "selectivity_independence_audit": SELECTIVITY_SQL,
            "geometric_median_shift": WEISZFELD_SQL,
        }
    )
