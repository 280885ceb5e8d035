"""Round-4 batch V: repeat-purchase cadence, part zero-movement gap
months, and dominant language per source.

Exactness discipline: epoch-day integer gaps, PERCENTILE_DISC medians
(actual samples), month indices as year*12+month ints, and
deterministic argmax (count desc, key asc) — every output is an exact
int64 or string.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from mimirsbrunn_ray.stages.dedup import _BUCKET, add_bucket
from mimirsbrunn_ray.stages.rollup import tree_merge

_DAY_US = 86_400_000_000


def _not_null(b: pa.Table, cols) -> pa.Table:
    m = None
    for c in cols:
        v = pc.is_valid(b[c])
        m = v if m is None else pc.and_(m, v)
    return b.filter(m)


# ---------------------------------------------------------------------------
# repeat-purchase cadence per customer
# ---------------------------------------------------------------------------


def q_repeat_order_cadence(sf_dir):
    """Per customer with >= 2 orders: order count and the
    PERCENTILE_DISC median of consecutive order-to-order gaps in whole
    days ((orderdate, orderkey) order) — the repeat-purchase cadence a
    lifecycle model consumes. One customer-hash bucket shuffle; each
    customer's gaps sort inside its bucket."""
    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_orderkey", "o_orderdate"],
    )

    def project(b: pa.Table) -> pa.Table:
        b = _not_null(b, ("o_custkey", "o_orderkey", "o_orderdate"))
        us = b["o_orderdate"].cast(pa.timestamp("us")).cast(pa.int64())
        t = pa.table(
            {
                "c": b["o_custkey"],
                "day": pc.divide(us, _DAY_US),
                "k": b["o_orderkey"],
            }
        )
        return add_bucket(t, "c", 64)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "o_custkey": pd.Series([], dtype=np.int64),
                "n_orders": pd.Series([], dtype=np.int64),
                "median_gap_days": pd.Series([], dtype=np.int64),
            }
        )
        if len(g) == 0:
            return empty
        g = g.sort_values(
            ["c", "day", "k"], kind="mergesort", ignore_index=True
        )
        c = g["c"].to_numpy(dtype=np.int64)
        d = g["day"].to_numpy(dtype=np.int64)
        same = np.empty(len(g), dtype=bool)
        same[0] = False
        same[1:] = c[1:] == c[:-1]
        gap = d - np.concatenate(([np.int64(0)], d[:-1]))
        rows = {"o_custkey": [], "n_orders": [], "median_gap_days": []}
        starts = np.flatnonzero(~same)
        ends = np.concatenate((starts[1:], [len(g)]))
        for s, e in zip(starts, ends):  # bounded: customers per bucket
            if e - s < 2:
                continue
            gs = np.sort(gap[s + 1:e])
            med = gs[(len(gs) - 1) // 2]  # PERCENTILE_DISC(0.5)
            rows["o_custkey"].append(int(c[s]))
            rows["n_orders"].append(int(e - s))
            rows["median_gap_days"].append(int(med))
        out = pd.DataFrame(rows)
        for col in out.columns:
            out[col] = out[col].astype(np.int64)
        return out

    return (
        orders.map_batches(project, batch_format="pyarrow", batch_size=None)
        .groupby(_BUCKET)
        .map_groups(per_bucket, batch_format="pandas")
    )


CADENCE_SQL = """
WITH v AS (
  SELECT o_custkey,
         CAST(epoch(date_trunc('day', o_orderdate)) // 86400 AS BIGINT)
           AS day,
         o_orderkey
  FROM orders
  WHERE o_custkey IS NOT NULL AND o_orderkey IS NOT NULL
    AND o_orderdate IS NOT NULL
), g AS (
  SELECT o_custkey,
         day - LAG(day) OVER (PARTITION BY o_custkey
                              ORDER BY day, o_orderkey) AS gap
  FROM v
), g2 AS (
  SELECT o_custkey, CAST(gap AS BIGINT) AS gap FROM g WHERE gap IS NOT NULL
)
SELECT o_custkey,
       CAST(COUNT(*) + 1 AS BIGINT) AS n_orders,
       CAST(PERCENTILE_DISC(0.5) WITHIN GROUP (ORDER BY gap) AS BIGINT)
         AS median_gap_days
FROM g2 GROUP BY 1
"""


# ---------------------------------------------------------------------------
# part zero-movement months
# ---------------------------------------------------------------------------


def q_part_zero_movement_months(sf_dir):
    """Inventory staleness: per part, the number of distinct months with
    at least one shipment, the month span from first to last shipment,
    and the dead months inside that span (span - active) — the
    zero-movement gap audit. Month index is the exact integer
    year*12 + (month-1); the (part, month) tier is combiner-first and
    per-part results are final inside one part-hash bucket."""
    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_partkey", "l_shipdate"]
    )

    def partial(b: pa.Table) -> pa.Table:
        b = _not_null(b, ("l_partkey", "l_shipdate"))
        ship = b["l_shipdate"].cast(pa.timestamp("us"))
        mi = pc.add(
            pc.multiply(pc.cast(pc.year(ship), pa.int64()), 12),
            pc.subtract(pc.cast(pc.month(ship), pa.int64()), 1),
        )
        t = pa.table({"p": b["l_partkey"], "m": mi})
        g = t.group_by(["p", "m"]).aggregate([])
        return add_bucket(g, "p", 64)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "l_partkey": pd.Series([], dtype=np.int64),
                "n_active_months": pd.Series([], dtype=np.int64),
                "span_months": pd.Series([], dtype=np.int64),
                "n_dead_months": pd.Series([], dtype=np.int64),
            }
        )
        if len(g) == 0:
            return empty
        t = g.drop_duplicates(["p", "m"])
        agg = t.groupby("p", sort=False).agg(
            n_active_months=("m", "size"),
            lo=("m", "min"),
            hi=("m", "max"),
        ).reset_index()
        span = (agg["hi"] - agg["lo"] + 1).astype(np.int64)
        out = pd.DataFrame(
            {
                "l_partkey": agg["p"].astype(np.int64),
                "n_active_months": agg["n_active_months"].astype(np.int64),
                "span_months": span,
                "n_dead_months": (
                    span - agg["n_active_months"].astype(np.int64)
                ),
            }
        )
        return out

    return (
        li.map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby(_BUCKET)
        .map_groups(per_bucket, batch_format="pandas")
    )


ZERO_MOVE_SQL = """
WITH v AS (
  SELECT DISTINCT l_partkey,
         CAST(year(l_shipdate) * 12 + month(l_shipdate) - 1 AS BIGINT)
           AS m
  FROM lineitem
  WHERE l_partkey IS NOT NULL AND l_shipdate IS NOT NULL
)
SELECT l_partkey,
       CAST(COUNT(*) AS BIGINT) AS n_active_months,
       CAST(MAX(m) - MIN(m) + 1 AS BIGINT) AS span_months,
       CAST(MAX(m) - MIN(m) + 1 - COUNT(*) AS BIGINT) AS n_dead_months
FROM v GROUP BY 1
"""


# ---------------------------------------------------------------------------
# dominant language per source
# ---------------------------------------------------------------------------


def q_dominant_lang_per_source(sf_dir):
    """Per source: document count, distinct language count, and the
    dominant language (count desc, lang asc on ties) with its count —
    the first line of a corpus language profile. The (source, lang)
    cell tier is combiner-first and bounded; the argmax walks the tiny
    final block."""
    docs = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["source", "lang"]
    )

    def partial(b: pa.Table) -> pa.Table:
        b = _not_null(b, ("source", "lang"))
        g = b.group_by(["source", "lang"]).aggregate([([], "count_all")])
        return g.select(["source", "lang", "count_all"]).rename_columns(
            ["source", "lang", "c"]
        )

    def combine(b: pa.Table) -> pa.Table:
        g = b.group_by(["source", "lang"]).aggregate([("c", "sum")])
        return g.select(["source", "lang", "c_sum"]).rename_columns(
            ["source", "lang", "c"]
        )

    cells = tree_merge(
        docs.map_batches(partial, batch_format="pyarrow", batch_size=None),
        combine,
    ).to_pandas()  # bounded: sources x langs
    if "source" not in cells.columns:  # fully-empty input short-circuit
        cells = pd.DataFrame({"source": [], "lang": [], "c": []})
    rows = {"source": [], "n_docs": [], "n_langs": [], "top_lang": [],
            "top_lang_docs": []}
    for src, sub in cells.groupby("source", sort=True):
        sub = sub.sort_values(
            ["c", "lang"], ascending=[False, True], ignore_index=True
        )
        rows["source"].append(src)
        rows["n_docs"].append(int(sub["c"].sum()))
        rows["n_langs"].append(int(len(sub)))
        rows["top_lang"].append(sub["lang"].iloc[0])
        rows["top_lang_docs"].append(int(sub["c"].iloc[0]))
    return pa.table(
        {
            "source": pa.array(rows["source"], pa.string()),
            "n_docs": pa.array(rows["n_docs"], pa.int64()),
            "n_langs": pa.array(rows["n_langs"], pa.int64()),
            "top_lang": pa.array(rows["top_lang"], pa.string()),
            "top_lang_docs": pa.array(rows["top_lang_docs"], pa.int64()),
        }
    )


DOMINANT_LANG_SQL = """
WITH cells AS MATERIALIZED (
  SELECT source, lang, CAST(COUNT(*) AS BIGINT) AS c
  FROM documents
  WHERE source IS NOT NULL AND lang IS NOT NULL
  GROUP BY 1, 2
), tot AS (
  SELECT source, CAST(SUM(c) AS BIGINT) AS n_docs,
         CAST(COUNT(*) AS BIGINT) AS n_langs
  FROM cells GROUP BY 1
), r AS (
  SELECT source, lang, c,
         ROW_NUMBER() OVER (
           PARTITION BY source ORDER BY c DESC, lang ASC
         ) AS rn
  FROM cells
)
SELECT r.source, tot.n_docs, tot.n_langs,
       r.lang AS top_lang, CAST(r.c AS BIGINT) AS top_lang_docs
FROM r JOIN tot USING (source) WHERE r.rn = 1
"""


def register_r4v(queries: dict, oracles: dict) -> None:
    queries.update(
        {
            "repeat_order_cadence": q_repeat_order_cadence,
            "part_zero_movement_months": q_part_zero_movement_months,
            "dominant_lang_per_source": q_dominant_lang_per_source,
        }
    )
    oracles.update(
        {
            "repeat_order_cadence": CADENCE_SQL,
            "part_zero_movement_months": ZERO_MOVE_SQL,
            "dominant_lang_per_source": DOMINANT_LANG_SQL,
        }
    )
