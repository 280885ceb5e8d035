"""Round-4 batch HV: who returns, what returns, and the first-
order discount myth — return rate by customer balance decile
(exact rank deciles over acctbal cents: do wealthy customers
return more?), return rate by quantity band (1-10 / 11-30 / 31+:
do big lines come back more?), and first versus repeat order size
(mean cents of each customer's FIRST order against all their
later ones, with a Welch t — is the first basket systematically
small, as onboarding lore claims?).

Exactness discipline: deciles are exact integer ranks (ties by
custkey), band and return counts pure integers, order-position
selection exact (date, orderkey); the Welch mirrors the shared
panel form."""

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


_RBD_COLS = ["decile", "n_lineitems", "n_returned",
             "return_ppm"]


def q_return_rate_by_balance_decile(sf_dir):
    """Do wealthy customers return more?  Lineitem return rate by
    the ordering customer's balance decile (decile = exact rank *
    10 // n over (acctbal cents, custkey) order) — a monotone
    gradient here prices returns into segment margins.  The
    decile map broadcasts; counts fold exactly."""
    # scale shape: the decile cut folds over a distributed balance-cents
    # histogram (value-grain); only the <=9 cents groups straddling a
    # decile boundary pull their custkeys (bounded by tie multiplicity)
    # to split exactly by the custkey tie-break. The decile then attaches
    # to orders via the budget-gated customer broadcast, and to lineitem
    # via a distributed orderkey join — no fact table lands on the
    # driver.
    import ray

    from mimirsbrunn_ray.stages.broadcast import (
        attach_dim, attach_ds, probe)
    from mimirsbrunn_ray.stages.exactrank import value_counts

    def cust_proj(b: pa.Table) -> pa.Table:
        b = _valid(b, ("c_custkey", "c_acctbal"))
        bal = b["c_acctbal"].to_numpy(zero_copy_only=False).astype(
            np.float64)
        cents = np.where(
            bal >= 0, np.floor(bal * 100.0 + 0.5),
            np.ceil(bal * 100.0 - 0.5)).astype(np.int64)
        return pa.table({
            "ck": b["c_custkey"].cast(pa.int64()),
            "cents": pa.array(cents),
        })

    cust_ds = rd.read_parquet(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_acctbal"],
    ).map_batches(cust_proj, batch_format="pyarrow",
                  batch_size=None).materialize()
    hist = value_counts(cust_ds, "cents")
    if len(hist) == 0:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _RBD_COLS})
    vals = hist.index.to_numpy(np.int64)
    cnts = hist.to_numpy(np.int64)
    n = int(cnts.sum())
    ends = np.cumsum(cnts)
    starts = ends - cnts
    dec_lo = starts * 10 // n
    dec_hi = (ends - 1) * 10 // n
    uniform = dec_lo == dec_hi
    # value -> decile for uniform groups; -1 marks a straddling group
    vdec = np.where(uniform, dec_lo, -1).astype(np.int64)
    strad_ck, strad_dec = [], []
    for v, s0 in zip(vals[~uniform], starts[~uniform]):
        def pull(b: pa.Table, _v=int(v)) -> pa.Table:
            keep = pc.equal(b["cents"], pa.scalar(_v, pa.int64()))
            return pa.table({"ck": b["ck"].filter(
                pc.fill_null(keep, False))})

        grp = cust_ds.map_batches(
            pull, batch_format="pyarrow", batch_size=None).to_pandas()
        cks = np.sort(grp["ck"].to_numpy(np.int64), kind="stable")
        ranks = int(s0) + np.arange(len(cks), dtype=np.int64)
        strad_ck.append(cks)
        strad_dec.append(ranks * 10 // n)
    sk = (np.concatenate(strad_ck) if strad_ck
          else np.array([], np.int64))
    sd = (np.concatenate(strad_dec) if strad_dec
          else np.array([], np.int64))
    s_order = np.argsort(sk, kind="stable")
    lut_ref = ray.put((vals, vdec, sk[s_order], sd[s_order]))

    # orders gain their customer's decile: customer cents attach via the
    # budget-gated broadcast, then the decile resolves per batch
    orders_ds = rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"])
    orders_ds = orders_ds.map_batches(
        lambda b: _valid(b, ("o_orderkey", "o_custkey")),
        batch_format="pyarrow", batch_size=None)
    orders_ds = attach_dim(orders_ds, "o_custkey", sf_dir, "customer",
                           "c_custkey", ["c_acctbal"], how="inner")

    def add_decile(b: pa.Table) -> pa.Table:
        v_arr, v_dec, s_ck, s_dc = ray.get(lut_ref)
        bal = b["c_acctbal"].to_numpy(zero_copy_only=False).astype(
            np.float64)
        cents = np.where(
            bal >= 0, np.floor(bal * 100.0 + 0.5),
            np.ceil(bal * 100.0 - 0.5)).astype(np.int64)
        idx = np.clip(np.searchsorted(v_arr, cents), 0, len(v_arr) - 1)
        hit = v_arr[idx] == cents
        dec = np.where(hit, v_dec[idx], np.int64(-2))
        need = dec == -1
        if need.any():
            ck = b["o_custkey"].to_numpy(
                zero_copy_only=False).astype(np.int64)
            h2, v2 = probe(ck[need], s_ck, {"d": s_dc})
            dd = dec[need]
            dd[h2] = v2["d"][h2]
            dec[need] = dd
        keep = dec >= 0
        return pa.table({
            "o_orderkey": b["o_orderkey"].filter(pa.array(keep)),
            "decile": pa.array(dec[keep]),
        })

    odec_ds = orders_ds.map_batches(
        add_decile, batch_format="pyarrow", batch_size=None)

    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey", "l_returnflag"])
    li = li.map_batches(
        lambda b: _valid(b, ("l_orderkey", "l_returnflag")),
        batch_format="pyarrow", batch_size=None)
    li = attach_ds(li, "l_orderkey", odec_ds, "o_orderkey", ["decile"],
                   how="inner")

    def part(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({
                "decile": pa.array([], pa.int64()),
                "n": pa.array([], pa.int64()),
                "r": pa.array([], pa.int64()),
            })
        ret = (np.asarray(b["l_returnflag"].to_numpy(
            zero_copy_only=False)) == "R")
        df = pd.DataFrame({
            "decile": b["decile"].to_numpy(
                zero_copy_only=False).astype(np.int64),
            "n": np.ones(b.num_rows, np.int64),
            "r": ret.astype(np.int64),
        })
        agg = df.groupby("decile", sort=False).agg(
            n=("n", "sum"), r=("r", "sum")).reset_index()
        for c in ["decile", "n", "r"]:
            agg[c] = agg[c].astype(np.int64)
        return pa.Table.from_pandas(agg, preserve_index=False)

    def comb(b: pa.Table) -> pa.Table:
        g = b.group_by(["decile"]).aggregate(
            [("n", "sum"), ("r", "sum")])
        return g.rename_columns(["decile", "n", "r"])

    res = tree_merge(
        li.map_batches(part, batch_format="pyarrow",
                       batch_size=None),
        comb,
    ).to_pandas()
    if "decile" not in res.columns or len(res) == 0:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _RBD_COLS})
    res = res.sort_values("decile", ignore_index=True)
    return pa.table({
        "decile": pa.array(res["decile"].to_numpy(np.int64)),
        "n_lineitems": pa.array(res["n"].to_numpy(np.int64)),
        "n_returned": pa.array(res["r"].to_numpy(np.int64)),
        "return_ppm": pa.array(
            [_round_half_away(r / n * 1e6)
             for r, n in zip(res["r"].astype(np.int64),
                             res["n"].astype(np.int64))],
            pa.int64()),
    })


RBD_SQL = """
WITH dk AS MATERIALIZED (
  SELECT c_custkey,
         (ROW_NUMBER() OVER (
            ORDER BY CAST(ROUND(c_acctbal * 100, 0) AS BIGINT),
                     c_custkey) - 1) * 10
           // COUNT(*) OVER () AS decile
  FROM customer
  WHERE c_custkey IS NOT NULL AND c_acctbal IS NOT NULL
), lr AS MATERIALIZED (
  SELECT dk.decile,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0
                  END) AS BIGINT) AS r
  FROM lineitem l
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN dk ON dk.c_custkey = o.o_custkey
  WHERE l.l_returnflag IS NOT NULL
  GROUP BY 1
)
SELECT CAST(decile AS BIGINT) AS decile,
       n AS n_lineitems,
       r AS n_returned,
       CAST(ROUND(CAST(r AS DOUBLE) / n * 1000000, 0) AS BIGINT)
         AS return_ppm
FROM lr ORDER BY decile
"""

_RQB_COLS = ["band", "n_lineitems", "n_returned", "return_ppm"]
_QBANDS = ("01-10", "11-30", "31+")


def q_return_rate_by_quantity_band(sf_dir):
    """Do big lines come back?  Return rate by quantity band
    (1-10 / 11-30 / 31+) — rising return rates with quantity mean
    bulk purchases are speculative and restocking fees are
    underpriced.  Pure integer band counts."""
    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_quantity", "l_returnflag"])

    def part(b: pa.Table) -> pa.Table:
        b = _valid(b, ("l_quantity", "l_returnflag"))
        if b.num_rows == 0:
            return pa.table({
                "band": pa.array([], pa.string()),
                "n": pa.array([], pa.int64()),
                "r": pa.array([], pa.int64()),
            })
        qf = b["l_quantity"].cast(pa.float64()).to_numpy(
            zero_copy_only=False)
        q = np.where(qf >= 0, np.floor(qf + 0.5),
                     np.ceil(qf - 0.5)).astype(np.int64)
        band = np.select([q <= 10, q <= 30],
                         [_QBANDS[0], _QBANDS[1]],
                         default=_QBANDS[2])
        ret = (np.asarray(b["l_returnflag"].to_numpy(
            zero_copy_only=False)) == "R")
        df = pd.DataFrame({
            "band": band,
            "n": np.ones(len(q), np.int64),
            "r": ret.astype(np.int64),
        })
        agg = df.groupby("band", sort=False).agg(
            n=("n", "sum"), r=("r", "sum")).reset_index()
        for c in ["n", "r"]:
            agg[c] = agg[c].astype(np.int64)
        return pa.Table.from_pandas(agg, preserve_index=False)

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
            **{c: pa.array([], pa.int64()) for c in _RQB_COLS[1:]},
        })
    res = res.sort_values("band", ignore_index=True)
    return pa.table({
        "band": pa.array(res["band"], pa.string()),
        "n_lineitems": pa.array(res["n"].to_numpy(np.int64)),
        "n_returned": pa.array(res["r"].to_numpy(np.int64)),
        "return_ppm": pa.array(
            [_round_half_away(r / n * 1e6)
             for r, n in zip(res["r"].astype(np.int64),
                             res["n"].astype(np.int64))],
            pa.int64()),
    })


RQB_SQL = """
WITH li AS MATERIALIZED (
  SELECT CASE
           WHEN CAST(ROUND(l_quantity, 0) AS BIGINT) <= 10
             THEN '01-10'
           WHEN CAST(ROUND(l_quantity, 0) AS BIGINT) <= 30
             THEN '11-30'
           ELSE '31+' END AS band,
         CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS r
  FROM lineitem
  WHERE l_quantity IS NOT NULL AND l_returnflag IS NOT NULL
)
SELECT band,
       CAST(COUNT(*) AS BIGINT) AS n_lineitems,
       CAST(SUM(r) AS BIGINT) AS n_returned,
       CAST(ROUND(CAST(SUM(r) AS DOUBLE) / COUNT(*) * 1000000,
            0) AS BIGINT) AS return_ppm
FROM li GROUP BY 1 ORDER BY band
"""

_FVR_COLS = ["n_first", "n_repeat", "mean_first_cents",
             "mean_repeat_cents", "welch_t_x1e3"]


def q_first_vs_repeat_order_size(sf_dir):
    """The small-first-basket myth, tested: mean value of
    customers' FIRST orders (earliest (date, orderkey)) versus
    all their LATER orders, with a Welch t — if first baskets are
    NOT smaller, onboarding discounts subsidize nothing.
    Positions resolve in customer-disjoint shards; moments fold
    exactly."""
    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_orderkey", "o_orderdate",
                 "o_totalprice"])

    def project(b: pa.Table) -> pa.Table:
        b = _valid(b, ("o_custkey", "o_orderkey", "o_orderdate",
                       "o_totalprice"))
        if b.num_rows == 0:
            return pa.table({
                "cust": pa.array([], pa.int64()),
                "us": pa.array([], pa.int64()),
                "okey": pa.array([], pa.int64()),
                "cents": pa.array([], pa.int64()),
            })
        x = b["o_totalprice"].cast(pa.float64()).to_numpy(
            zero_copy_only=False)
        cents = np.where(
            x >= 0, np.floor(x * 100.0 + 0.5),
            np.ceil(x * 100.0 - 0.5)).astype(np.int64)
        t = pa.table({
            "cust": b["o_custkey"].cast(pa.int64()),
            "us": b["o_orderdate"].cast(
                pa.timestamp("us")).cast(pa.int64()),
            "okey": b["o_orderkey"].cast(pa.int64()),
            "cents": pa.array(cents),
        })
        return add_bucket(t, "cust", 64)

    def split(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({
            "is_first": pd.Series([], dtype=np.int64),
            "cents": pd.Series([], dtype=np.int64),
        })
        if len(g) == 0:
            return empty
        g = g.sort_values(["cust", "us", "okey"],
                          kind="mergesort", ignore_index=True)
        cust = g["cust"].to_numpy(np.int64)
        first = np.ones(len(g), dtype=bool)
        first[1:] = cust[1:] != cust[:-1]
        return pd.DataFrame({
            "is_first": first.astype(np.int64),
            "cents": g["cents"].to_numpy(np.int64),
        })

    # first/repeat flags stay a Dataset (order grain); the Welch moments
    # stream in two passes (exact int64 sums -> means, then centered
    # float sums) — orders never land whole on the driver
    fr_ds = (
        orders.map_batches(project, batch_format="pyarrow",
                           batch_size=None)
        .groupby(_BUCKET)
        .map_groups(split, batch_format="pandas")
        .materialize()
    )

    def sums1(df: pd.DataFrame) -> pd.DataFrame:
        isf = df["is_first"].to_numpy(np.int64) == 1
        c = df["cents"].to_numpy(np.int64)
        return pd.DataFrame({
            "n_f": [np.int64(isf.sum())],
            "s_f": [np.int64(c[isf].sum())],
            "n_r": [np.int64((~isf).sum())],
            "s_r": [np.int64(c[~isf].sum())],
        })

    p1 = fr_ds.map_batches(
        sums1, batch_format="pandas", batch_size=None).to_pandas()
    if "n_f" not in p1.columns or len(p1) == 0:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _FVR_COLS})
    n_a, n_b = int(p1["n_f"].sum()), int(p1["n_r"].sum())
    if n_a < 2 or n_b < 2:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _FVR_COLS})
    ma = float(p1["s_f"].sum()) / n_a
    mb = float(p1["s_r"].sum()) / n_b

    def sums2(df: pd.DataFrame) -> pd.DataFrame:
        isf = df["is_first"].to_numpy(np.int64) == 1
        c = df["cents"].to_numpy(np.int64).astype(np.float64)
        da = c[isf] - ma
        db = c[~isf] - mb
        return pd.DataFrame({
            "ss_f": [float((da * da).sum())],
            "ss_r": [float((db * db).sum())],
        })

    p2 = fr_ds.map_batches(
        sums2, batch_format="pandas", batch_size=None).to_pandas()
    va = float(p2["ss_f"].sum()) / (n_a - 1)
    vb = float(p2["ss_r"].sum()) / (n_b - 1)
    se = np.sqrt(va / n_a + vb / n_b)
    if se == 0:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _FVR_COLS})
    t = (ma - mb) / se
    return pa.table({
        "n_first": pa.array([n_a], pa.int64()),
        "n_repeat": pa.array([n_b], pa.int64()),
        "mean_first_cents": pa.array(
            [_round_half_away(ma)], pa.int64()),
        "mean_repeat_cents": pa.array(
            [_round_half_away(mb)], pa.int64()),
        "welch_t_x1e3": pa.array(
            [_round_half_away(float(t) * 1e3)], pa.int64()),
    })


FVR_SQL = """
WITH seq AS MATERIALIZED (
  SELECT CASE WHEN ROW_NUMBER() OVER (PARTITION BY o_custkey
                     ORDER BY o_orderdate, o_orderkey) = 1
              THEN 1 ELSE 0 END AS is_first,
         CAST(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)
              AS DOUBLE) AS cents
  FROM orders
  WHERE o_custkey IS NOT NULL AND o_orderkey IS NOT NULL
    AND o_orderdate IS NOT NULL AND o_totalprice IS NOT NULL
), g AS MATERIALIZED (
  SELECT is_first, CAST(COUNT(*) AS BIGINT) AS n,
         AVG(cents) AS mu
  FROM seq GROUP BY 1
), v AS MATERIALIZED (
  SELECT seq.is_first,
         SUM((seq.cents - g.mu) * (seq.cents - g.mu))
           / (ANY_VALUE(g.n) - 1) AS var,
         ANY_VALUE(g.n) AS n, ANY_VALUE(g.mu) AS mu
  FROM seq JOIN g USING (is_first)
  GROUP BY seq.is_first
), wide AS (
  SELECT
    MAX(CASE WHEN is_first = 1 THEN n END) AS na,
    MAX(CASE WHEN is_first = 1 THEN mu END) AS ma,
    MAX(CASE WHEN is_first = 1 THEN var END) AS va,
    MAX(CASE WHEN is_first = 0 THEN n END) AS nb,
    MAX(CASE WHEN is_first = 0 THEN mu END) AS mb,
    MAX(CASE WHEN is_first = 0 THEN var END) AS vb
  FROM v
)
SELECT CAST(na AS BIGINT) AS n_first,
       CAST(nb AS BIGINT) AS n_repeat,
       CAST(ROUND(ma, 0) AS BIGINT) AS mean_first_cents,
       CAST(ROUND(mb, 0) AS BIGINT) AS mean_repeat_cents,
       CAST(ROUND((ma - mb) / SQRT(va / na + vb / nb) * 1000, 0)
            AS BIGINT) AS welch_t_x1e3
FROM wide
WHERE na >= 2 AND nb >= 2 AND SQRT(va / na + vb / nb) <> 0
"""


def register_r4hv(queries: dict, oracles: dict) -> None:
    queries.update(
        {
            "return_rate_by_balance_decile":
                q_return_rate_by_balance_decile,
            "return_rate_by_quantity_band":
                q_return_rate_by_quantity_band,
            "first_vs_repeat_order_size":
                q_first_vs_repeat_order_size,
        }
    )
    oracles.update(
        {
            "return_rate_by_balance_decile": RBD_SQL,
            "return_rate_by_quantity_band": RQB_SQL,
            "first_vs_repeat_order_size": FVR_SQL,
        }
    )
