"""Round-4 batch BI: split length-distribution drift, the order/ship
day-of-week matrix, and part order coverage.

Exactness discipline: decile values are exact PERCENTILE_DISC lengths
per split; the dow matrix is pure integer counting under the repo-wide
(days+4)%7 convention; coverage is exact distinct-key set arithmetic.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd
from mimirsbrunn_ray.stages.broadcast import scalar0 as _scalar0
from mimirsbrunn_ray.stages.broadcast import safe_join as _safe_join

from mimirsbrunn_ray.stages.rollup import tree_merge

_DAY_US = 86_400_000_000


def _round_half_away(x: np.ndarray) -> np.ndarray:
    return np.where(
        x >= 0, np.floor(x + 0.5), np.ceil(x - 0.5)
    ).astype(np.int64)


# ---------------------------------------------------------------------------
# length-distribution drift across the train/val/test split
# ---------------------------------------------------------------------------


def q_split_length_deciles(sf_dir):
    """Per train/val/test split (doc_id % 10 -> 8/1/1): the exact
    decile values of n_chars — if the three rows diverge, the
    deterministic split is NOT iid in length and a model comparison on
    it is biased. One (split, length) histogram pass; the decile walk
    applies the PERCENTILE_DISC rank rule per split."""
    docs = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "n_chars"]
    )

    def partial(b: pa.Table) -> pa.Table:
        b = b.filter(
            pc.and_(pc.is_valid(b["doc_id"]), pc.is_valid(b["n_chars"]))
        )
        did = b["doc_id"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        m = did % 10
        split = np.where(m < 8, "train", np.where(m == 8, "val", "test"))
        t = pa.table(
            {
                "split": pa.array(split),
                "v": b["n_chars"].cast(pa.int64()),
            }
        )
        g = t.group_by(["split", "v"]).aggregate([([], "count_all")])
        g = g.select(["split", "v", "count_all"])
        return g.rename_columns(["split", "v", "n"])

    def combine(b: pa.Table) -> pa.Table:
        g = b.group_by(["split", "v"]).aggregate([("n", "sum")])
        return g.rename_columns(["split", "v", "n"])

    hist = tree_merge(
        docs.map_batches(partial, batch_format="pyarrow", batch_size=None),
        combine,
    ).to_pandas()

    rows = {"split": [], "decile": [], "len_at_decile": []}
    if len(hist):
        for sp, g in hist.groupby("split", sort=True):
            g = g.sort_values("v")
            v = g["v"].to_numpy(dtype=np.int64)
            cum = np.cumsum(g["n"].to_numpy(dtype=np.int64))
            total = int(cum[-1])
            for d in range(1, 10):
                rank = int(np.ceil(d / 10 * total - 1e-9))
                rows["split"].append(sp)
                rows["decile"].append(d)
                rows["len_at_decile"].append(
                    int(v[np.searchsorted(cum, rank, "left")])
                )
    return pa.table(
        {
            "split": pa.array(rows["split"], pa.string()),
            "decile": pa.array(rows["decile"], pa.int64()),
            "len_at_decile": pa.array(rows["len_at_decile"], pa.int64()),
        }
    )


SPLIT_DECILES_SQL = """
WITH s AS MATERIALIZED (
  SELECT CASE WHEN doc_id % 10 < 8 THEN 'train'
              WHEN doc_id % 10 = 8 THEN 'val'
              ELSE 'test' END AS split,
         CAST(n_chars AS BIGINT) AS v
  FROM documents WHERE doc_id IS NOT NULL AND n_chars IS NOT NULL
), q AS (
  SELECT split,
         quantile_disc(v, [0.1, 0.2, 0.3, 0.4, 0.5,
                           0.6, 0.7, 0.8, 0.9]) AS qs
  FROM s GROUP BY 1
)
SELECT q.split, CAST(d.d AS BIGINT) AS decile,
       CAST(q.qs[d.d] AS BIGINT) AS len_at_decile
FROM q, (SELECT unnest(generate_series(1, 9)) AS d) d
"""


# ---------------------------------------------------------------------------
# order-dow x ship-dow transition matrix
# ---------------------------------------------------------------------------


def q_order_ship_dow_matrix(sf_dir):
    """The 7x7 matrix of (order day-of-week, ship day-of-week) lineitem
    counts — where in the week work enters vs leaves the warehouse.
    One big-big join on the order key, then a bounded decomposable
    count pass under the repo-wide (days+4)%7 convention."""
    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_orderdate"]
    ).map_batches(
        lambda b: b.filter(
            pc.and_(
                pc.is_valid(b["o_orderkey"]), pc.is_valid(b["o_orderdate"])
            )
        ),
        batch_format="pyarrow",
        batch_size=None,
    ).repartition(4)
    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_shipdate"]
    ).map_batches(
        lambda b: b.filter(
            pc.and_(
                pc.is_valid(b["l_orderkey"]), pc.is_valid(b["l_shipdate"])
            )
        ),
        batch_format="pyarrow",
        batch_size=None,
    ).repartition(4)
    joined = _safe_join(
        li, orders,
        on=("l_orderkey",),
        right_on=("o_orderkey",),
        join_type="inner",
        num_partitions=4,
    )

    def partial(b: pa.Table) -> pa.Table:
        od = (
            b["o_orderdate"].cast(pa.timestamp("us")).cast(pa.int64())
            .to_numpy(zero_copy_only=False)
        )
        sd = (
            b["l_shipdate"].cast(pa.timestamp("us")).cast(pa.int64())
            .to_numpy(zero_copy_only=False)
        )
        odow = ((od // _DAY_US) + 4) % 7
        sdow = ((sd // _DAY_US) + 4) % 7
        t = pa.table(
            {"order_dow": pa.array(odow), "ship_dow": pa.array(sdow)}
        )
        g = t.group_by(["order_dow", "ship_dow"]).aggregate(
            [([], "count_all")]
        )
        g = g.select(["order_dow", "ship_dow", "count_all"])
        return g.rename_columns(["order_dow", "ship_dow", "n"])

    def combine(b: pa.Table) -> pa.Table:
        g = b.group_by(["order_dow", "ship_dow"]).aggregate([("n", "sum")])
        return g.rename_columns(["order_dow", "ship_dow", "n"])

    return tree_merge(
        joined.map_batches(partial, batch_format="pyarrow",
                           batch_size=None),
        combine,
    )


DOW_MATRIX_SQL = """
SELECT CAST(dayofweek(o.o_orderdate) AS BIGINT) AS order_dow,
       CAST(dayofweek(l.l_shipdate) AS BIGINT) AS ship_dow,
       CAST(COUNT(*) AS BIGINT) AS n
FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
WHERE o.o_orderdate IS NOT NULL AND l.l_shipdate IS NOT NULL
GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# part order coverage
# ---------------------------------------------------------------------------


def q_part_order_coverage(sf_dir):
    """Catalog coverage: total parts, parts that appear in at least one
    lineitem, and dead stock (never ordered) — the assortment health
    counter. Distinct ordered part keys from combiner-first partials in
    key-disjoint shards; the dimension census is one aggregate."""
    part = rd.read_parquet(f"{sf_dir}/part.parquet", columns=["p_partkey"])
    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_partkey"]
    )
    n_parts = int(part.count())

    def partial(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_valid(b["l_partkey"]))
        g = b.group_by(["l_partkey"]).aggregate([([], "count_all")])
        return g.select(["l_partkey"])

    def dedup(b: pa.Table) -> pa.Table:
        g = b.group_by(["l_partkey"]).aggregate([([], "count_all")])
        return g.select(["l_partkey"])

    ded = tree_merge(
        li.map_batches(partial, batch_format="pyarrow", batch_size=None),
        dedup,
        final_shards=8,
        shard_cols=["l_partkey"],
    )

    def cnt(b: pa.Table) -> pa.Table:
        return pa.table({"n": pa.array([b.num_rows], pa.int64())})

    def fold(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                c: pa.array([pc.sum(b[c]).as_py() or 0], pa.int64())
                for c in b.column_names
            }
        )

    n_ordered = int(
        tree_merge(
            ded.map_batches(cnt, batch_format="pyarrow", batch_size=None),
            fold,
        ).to_pandas().pipe(_scalar0, "n")
    )
    return pa.table(
        {
            "n_parts": pa.array([n_parts], pa.int64()),
            "n_ordered_parts": pa.array([n_ordered], pa.int64()),
            "n_dead_stock": pa.array([n_parts - n_ordered], pa.int64()),
        }
    )


COVERAGE_SQL = """
SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM part) AS n_parts,
       (SELECT CAST(COUNT(DISTINCT l_partkey) AS BIGINT)
        FROM lineitem WHERE l_partkey IS NOT NULL)
         AS n_ordered_parts,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM part)
         - (SELECT CAST(COUNT(DISTINCT l_partkey) AS BIGINT)
            FROM lineitem WHERE l_partkey IS NOT NULL)
         AS n_dead_stock
"""


def register_r4bi(queries: dict, oracles: dict) -> None:
    queries.update(
        {
            "split_length_deciles": q_split_length_deciles,
            "order_ship_dow_matrix": q_order_ship_dow_matrix,
            "part_order_coverage": q_part_order_coverage,
        }
    )
    oracles.update(
        {
            "split_length_deciles": SPLIT_DECILES_SQL,
            "order_ship_dow_matrix": DOW_MATRIX_SQL,
            "part_order_coverage": COVERAGE_SQL,
        }
    )
