"""Round-4 batch CM: priority/return odds ratio (semi-join driven 2x2),
Pareto-80% supplier concentration index per nation, and Matthews
correlation between the two deterministic doc labelers.

Exactness discipline: 2x2 cells and cumulative-share indexes fold from
exact int64 counts / x100 sums; each final float expression (log odds
ratio, MCC) is mirrored token-for-token vs DuckDB and snapped to fixed
point. The odds-ratio query reuses the packaged bloom-pruned EXACT
semi-join (D4 family) so the orders-with-returns flag never pays a full
join for bloom-absent keys.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from mimirsbrunn_ray.stages.join import bloom_semi_join
from mimirsbrunn_ray.stages.rollup import tree_merge


def _round_half_away(x: np.ndarray) -> np.ndarray:
    return np.where(x >= 0, np.floor(x + 0.5), np.ceil(x - 0.5)).astype(
        np.int64
    )


def _sum_by(t: pa.Table, keys: list[str], vals: list[str]) -> pa.Table:
    g = t.group_by(keys).aggregate([(v, "sum") for v in vals])
    g = g.select(keys + [f"{v}_sum" for v in vals])
    return g.rename_columns(keys + vals)


_HIGH_PRIO = ("1-URGENT", "2-HIGH")


# ---------------------------------------------------------------------------
# odds ratio: high order priority vs having a returned lineitem
# ---------------------------------------------------------------------------


def q_odds_ratio_priority_return(sf_dir):
    """One-row 2x2 association: the odds ratio between HIGH order
    priority (1-URGENT / 2-HIGH) and the order containing at least one
    RETURNED lineitem (l_returnflag = 'R') — OR = (a*d)/(b*c) over the
    exact cell counts, with its log. The returned-order flag is the
    packaged bloom-pruned EXACT semi-join (EXISTS shape): bloom-absent
    orderkeys never shuffle; the 2x2 folds as four int64 counts from
    combiner-first partials over the priority scan plus the semi-join
    survivors. NULL when any cell is zero (undefined OR). Cells: a =
    high+returned, b = high+not, c = low+returned, d = low+not."""
    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_orderpriority"]
    ).map_batches(
        lambda b: b.filter(
            pc.and_(
                pc.is_valid(b["o_orderkey"]), pc.is_valid(b["o_orderpriority"])
            )
        ),
        batch_format="pyarrow",
        batch_size=None,
    )
    returns = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_returnflag"]
    ).map_batches(
        lambda b: b.filter(
            pc.and_(
                pc.is_valid(b["l_orderkey"]),
                pc.equal(pc.fill_null(b["l_returnflag"], ""), "R"),
            )
        ).select(["l_orderkey"]),
        batch_format="pyarrow",
        batch_size=None,
    )

    def prio_counts(ds):
        def partial(b: pa.Table) -> pa.Table:
            hi = pc.is_in(
                b["o_orderpriority"], value_set=pa.array(list(_HIGH_PRIO))
            ).to_numpy(zero_copy_only=False).astype(np.int64)
            return pa.table(
                {
                    "k": pa.array(np.zeros(1, np.int64)),
                    "n_high": pa.array([int(hi.sum())], pa.int64()),
                    "n_all": pa.array([len(hi)], pa.int64()),
                }
            )

        return tree_merge(
            ds.map_batches(partial, batch_format="pyarrow", batch_size=None),
            lambda b: _sum_by(b, ["k"], ["n_high", "n_all"]),
        ).to_pandas()

    tot = prio_counts(orders)
    returned = bloom_semi_join(orders, returns, "o_orderkey", "l_orderkey")
    ret = prio_counts(returned)

    n_all = int(tot["n_all"].iloc[0]) if len(tot) else 0
    n_high = int(tot["n_high"].iloc[0]) if len(tot) else 0
    r_all = int(ret["n_all"].iloc[0]) if len(ret) else 0
    r_high = int(ret["n_high"].iloc[0]) if len(ret) else 0

    a = r_high  # high + returned
    b_ = n_high - r_high  # high + not returned
    c = r_all - r_high  # low + returned
    d = (n_all - n_high) - (r_all - r_high)  # low + not returned
    if min(a, b_, c, d) <= 0:
        orx = None
        logor = None
    else:
        orv = (float(a) * d) / (float(b_) * c)
        orx = int(_round_half_away(np.array([orv * 1e6]))[0])
        logor = int(_round_half_away(np.array([np.log(orv) * 1e6]))[0])
    return pa.table(
        {
            "a_high_ret": pa.array([a], pa.int64()),
            "b_high_ok": pa.array([b_], pa.int64()),
            "c_low_ret": pa.array([c], pa.int64()),
            "d_low_ok": pa.array([d], pa.int64()),
            "or_x1e6": pa.array([orx], pa.int64()),
            "log_or_x1e6": pa.array([logor], pa.int64()),
        }
    )


ODDS_RATIO_SQL = f"""
WITH o AS MATERIALIZED (
  SELECT o_orderkey,
         CASE WHEN o_orderpriority IN {_HIGH_PRIO} THEN 1 ELSE 0 END AS hi,
         CASE WHEN EXISTS (SELECT 1 FROM lineitem l
                           WHERE l.l_orderkey = o_orderkey
                             AND l.l_returnflag = 'R')
              THEN 1 ELSE 0 END AS ret
  FROM orders
  WHERE o_orderkey IS NOT NULL AND o_orderpriority IS NOT NULL
), c AS (
  SELECT CAST(SUM(hi * ret) AS BIGINT) AS a,
         CAST(SUM(hi * (1 - ret)) AS BIGINT) AS b,
         CAST(SUM((1 - hi) * ret) AS BIGINT) AS c,
         CAST(SUM((1 - hi) * (1 - ret)) AS BIGINT) AS d
  FROM o
)
SELECT a AS a_high_ret, b AS b_high_ok, c AS c_low_ret, d AS d_low_ok,
       CASE WHEN LEAST(a, b, c, d) <= 0 THEN NULL
            ELSE CAST(ROUND((CAST(a AS DOUBLE) * d) / (CAST(b AS DOUBLE) * c)
                 * 1000000, 0) AS BIGINT) END AS or_x1e6,
       CASE WHEN LEAST(a, b, c, d) <= 0 THEN NULL
            ELSE CAST(ROUND(LN((CAST(a AS DOUBLE) * d)
                               / (CAST(b AS DOUBLE) * c))
                 * 1000000, 0) AS BIGINT) END AS log_or_x1e6
FROM c
"""


# ---------------------------------------------------------------------------
# Pareto-80% concentration: suppliers covering 80% of nation balance
# ---------------------------------------------------------------------------


def q_pareto_k80_suppliers(sf_dir):
    """Per nation: the smallest number of suppliers whose descending
    positive account balances cover >= 80% of the nation's total
    positive balance — the "how concentrated is capacity" index behind
    80/20 planning (k small = a few suppliers dominate). Balances
    quantize to int64 cents; the per-nation group is dimension-bounded
    so the descending cumulative scan runs inside one map_groups; the
    80% threshold compares by exact integer cross-multiplication
    (5 * cum >= 4 * total), no float share ever feeds the argmin."""
    sup = rd.read_parquet(
        f"{sf_dir}/supplier.parquet",
        columns=["s_suppkey", "s_nationkey", "s_acctbal"],
    )

    def prep(b: pa.Table) -> pa.Table:
        m = pc.and_(
            pc.and_(pc.is_valid(b["s_suppkey"]), pc.is_valid(b["s_nationkey"])),
            pc.is_valid(b["s_acctbal"]),
        )
        b = b.filter(m)
        bal = b["s_acctbal"].to_numpy(zero_copy_only=False).astype(np.float64)
        bal_e2 = _round_half_away(bal * 100.0)
        t = pa.table(
            {
                "s_nationkey": b["s_nationkey"].cast(pa.int64()),
                "s_suppkey": b["s_suppkey"].cast(pa.int64()),
                "bal_e2": pa.array(bal_e2),
            }
        )
        return t.filter(pa.array(bal_e2 > 0))

    pos = sup.map_batches(prep, batch_format="pyarrow", batch_size=None)

    def per_nation(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "n_nationkey": pd.Series([], dtype=np.int64),
                "n_suppliers": pd.Series([], dtype=np.int64),
                "k80": pd.Series([], dtype=np.int64),
            }
        )
        if len(g) == 0:
            return empty
        g = g.sort_values(
            ["bal_e2", "s_suppkey"], ascending=[False, True],
            kind="mergesort", ignore_index=True,
        )
        bal = g["bal_e2"].to_numpy(dtype=np.int64)
        cum = np.cumsum(bal)
        total = int(cum[-1])
        # exact: first k with 5*cum >= 4*total
        k80 = int(np.argmax(5 * cum >= 4 * total)) + 1
        return pd.DataFrame(
            {
                "n_nationkey": [int(g["s_nationkey"].iloc[0])],
                "n_suppliers": [len(g)],
                "k80": [k80],
            }
        )

    out = (
        pos.groupby("s_nationkey")
        .map_groups(per_nation, batch_format="pandas")
        .to_pandas()
    )
    if not len(out) or "n_nationkey" not in out.columns:
        return pa.table(
            {
                "n_nationkey": pa.array([], pa.int64()),
                "n_suppliers": pa.array([], pa.int64()),
                "k80": pa.array([], pa.int64()),
            }
        )
    out = out.sort_values("n_nationkey", ignore_index=True)
    return pa.table(
        {
            "n_nationkey": pa.array(out["n_nationkey"].to_numpy(dtype=np.int64)),
            "n_suppliers": pa.array(
                out["n_suppliers"].to_numpy(dtype=np.int64)
            ),
            "k80": pa.array(out["k80"].to_numpy(dtype=np.int64)),
        }
    )


PARETO_K80_SQL = """
WITH s AS (
  SELECT s_nationkey, s_suppkey,
         CAST(ROUND(s_acctbal * 100, 0) AS BIGINT) AS bal
  FROM supplier
  WHERE s_suppkey IS NOT NULL AND s_nationkey IS NOT NULL
    AND s_acctbal IS NOT NULL
    AND CAST(ROUND(s_acctbal * 100, 0) AS BIGINT) > 0
), r AS (
  SELECT s_nationkey, bal,
         SUM(bal) OVER (PARTITION BY s_nationkey
                        ORDER BY bal DESC, s_suppkey
                        ROWS UNBOUNDED PRECEDING) AS cum,
         SUM(bal) OVER (PARTITION BY s_nationkey) AS total,
         ROW_NUMBER() OVER (PARTITION BY s_nationkey
                            ORDER BY bal DESC, s_suppkey) AS rk,
         COUNT(*) OVER (PARTITION BY s_nationkey) AS n_suppliers
  FROM s
)
SELECT s_nationkey AS n_nationkey,
       CAST(MAX(n_suppliers) AS BIGINT) AS n_suppliers,
       CAST(MIN(CASE WHEN 5 * cum >= 4 * total THEN rk END) AS BIGINT) AS k80
FROM r GROUP BY 1 ORDER BY 1
"""


# ---------------------------------------------------------------------------
# Matthews correlation between the two deterministic doc labelers
# ---------------------------------------------------------------------------


def q_mcc_labelers_docs(sf_dir):
    """Per source: the Matthews correlation coefficient between the two
    deterministic rule labelers used by the kappa query (A = word count
    > 50, B = 2 * distinct words >= words) — MCC = (n11*n00 - n10*n01)
    / sqrt((n11+n10)(n11+n01)(n00+n10)(n00+n01)), the
    chance-and-imbalance-robust agreement score preferred over raw
    accuracy for skewed label sets. Contingency cells fold exact int64;
    the marginal product runs in double (it overflows int64 by design);
    one mirrored expression per source, x1e6 snap, NULL when any
    marginal is zero."""
    docs = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["source", "text"]
    )

    def partial(b: pa.Table) -> pa.Table:
        m = pc.and_(pc.is_valid(b["source"]), pc.is_valid(b["text"]))
        b = b.filter(m)
        words = pc.split_pattern(b["text"], pattern=" ")
        lens = pc.list_value_length(words).to_numpy(zero_copy_only=False)
        flat = pc.list_flatten(words).to_numpy(zero_copy_only=False)
        doc_idx = np.repeat(np.arange(len(lens)), lens)
        per = (
            pd.DataFrame({"d": doc_idx, "w": flat})
            .groupby("d", sort=True)
            .agg(nw=("w", "size"), nd=("w", "nunique"))
        )
        nw = np.zeros(len(lens), dtype=np.int64)
        nd = np.zeros(len(lens), dtype=np.int64)
        nw[per.index.to_numpy()] = per["nw"].to_numpy()
        nd[per.index.to_numpy()] = per["nd"].to_numpy()
        a = (nw > 50).astype(np.int64)
        bb = (2 * nd >= nw).astype(np.int64)
        t = pa.table(
            {
                "source": b["source"],
                "n11": pa.array(a * bb),
                "n10": pa.array(a * (1 - bb)),
                "n01": pa.array((1 - a) * bb),
                "n00": pa.array((1 - a) * (1 - bb)),
            }
        )
        return _sum_by(t, ["source"], ["n11", "n10", "n01", "n00"])

    m = tree_merge(
        docs.map_batches(partial, batch_format="pyarrow", batch_size=None),
        lambda b: _sum_by(b, ["source"], ["n11", "n10", "n01", "n00"]),
    ).to_pandas()  # bounded: one row per source

    if not len(m) or "source" not in m.columns:
        return pa.table(
            {
                "source": pa.array([], pa.string()),
                "n": pa.array([], pa.int64()),
                "mcc_x1e6": pa.array([], pa.int64()),
            }
        )
    m = m.sort_values("source", ignore_index=True)
    vals, ns = [], []
    for i in range(len(m)):
        n11, n10 = int(m["n11"].iloc[i]), int(m["n10"].iloc[i])
        n01, n00 = int(m["n01"].iloc[i]), int(m["n00"].iloc[i])
        ns.append(n11 + n10 + n01 + n00)
        den = (
            float(n11 + n10) * (n11 + n01) * (n00 + n10) * (n00 + n01)
        )
        if den == 0.0:
            vals.append(None)
            continue
        mcc = (float(n11) * n00 - float(n10) * n01) / np.sqrt(den)
        vals.append(int(_round_half_away(np.array([mcc * 1e6]))[0]))
    return pa.table(
        {
            "source": pa.array(m["source"].tolist(), pa.string()),
            "n": pa.array(ns, pa.int64()),
            "mcc_x1e6": pa.array(vals, pa.int64()),
        }
    )


MCC_SQL = """
WITH w AS (
  SELECT source, doc_id, unnest(string_split(text, ' ')) AS word
  FROM documents
  WHERE source IS NOT NULL AND text IS NOT NULL AND doc_id IS NOT NULL
), per AS (
  SELECT source, doc_id,
         CAST(COUNT(*) AS BIGINT) AS nw,
         CAST(COUNT(DISTINCT word) AS BIGINT) AS nd
  FROM w GROUP BY 1, 2
), lab AS (
  SELECT source,
         CASE WHEN nw > 50 THEN 1 ELSE 0 END AS a,
         CASE WHEN 2 * nd >= nw THEN 1 ELSE 0 END AS b
  FROM per
), c AS (
  SELECT source,
         CAST(SUM(a * b) AS BIGINT) AS n11,
         CAST(SUM(a * (1 - b)) AS BIGINT) AS n10,
         CAST(SUM((1 - a) * b) AS BIGINT) AS n01,
         CAST(SUM((1 - a) * (1 - b)) AS BIGINT) AS n00
  FROM lab GROUP BY 1
)
SELECT source, n11 + n10 + n01 + n00 AS n,
       CASE WHEN CAST(n11 + n10 AS DOUBLE) * (n11 + n01) * (n00 + n10)
                 * (n00 + n01) = 0
            THEN NULL
            ELSE CAST(ROUND(
              (CAST(n11 AS DOUBLE) * n00 - CAST(n10 AS DOUBLE) * n01)
              / SQRT(CAST(n11 + n10 AS DOUBLE) * (n11 + n01) * (n00 + n10)
                     * (n00 + n01))
              * 1000000, 0) AS BIGINT) END AS mcc_x1e6
FROM c ORDER BY source
"""


def register_r4cm(queries: dict, oracles: dict) -> None:
    queries.update(
        {
            "odds_ratio_priority_return": q_odds_ratio_priority_return,
            "pareto_k80_suppliers": q_pareto_k80_suppliers,
            "mcc_labelers_docs": q_mcc_labelers_docs,
        }
    )
    oracles.update(
        {
            "odds_ratio_priority_return": ODDS_RATIO_SQL,
            "pareto_k80_suppliers": PARETO_K80_SQL,
            "mcc_labelers_docs": MCC_SQL,
        }
    )
