"""Round-4 batch FR: demand variability, word-aligned bitmap
compression, and join pushdown economics — XYZ classification of
parts by the coefficient of variation of their monthly demand
(zero-filled over the global month span; the planning-stability
counterpart of ABC), a WAH (word-aligned hybrid) compressed-bitmap
word model of each type's active-minute bitmap (literal words vs
merged fill runs at 31 bits/word), and a semi-join reduction audit
(how many lineitem rows a segment-filter pushdown saves the
orders-lineitem exchange).

Exactness discipline: monthly demand folds exact int64 (quantities
snap to integers once at read), the CV uses the population-variance
identity over integer (n, S, SS) and classes cut on the ROUNDED
cv_ppm so class counts are integer-exact; WAH groups, classes and
fill runs are pure integers; the semi-join audit is exact integer
row counts through a hash-partitioned Dataset.join."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd
from mimirsbrunn_ray.stages.broadcast import safe_join as _safe_join

from mimirsbrunn_ray.pipelines.queries_r4fj import (
    _distinct_type_minutes,
)
from mimirsbrunn_ray.pipelines.queries_r4fk import _round_half_away
from mimirsbrunn_ray.stages.rollup import tree_merge

_XYZ_X = 500_000   # cv_ppm < 0.5 -> X
_XYZ_Y = 1_000_000  # cv_ppm < 1.0 -> Y, else Z
_WAH_BITS = 31


def q_xyz_classification_parts(sf_dir):
    """XYZ census of parts by monthly-demand stability: per part,
    the population CV of its monthly shipped quantity over the
    GLOBAL month span (months with no demand count as zero — the
    error that inflates naive CVs computed on active months only);
    parts classify X (cv < 0.5), Y (cv < 1.0), Z (else) and the
    census reports per class the part count and summed cv_ppm.
    Per-(part, month) partials fold int64 through one distributed
    pass; the CV law is the exact (n, S, SS) identity."""
    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_partkey", "l_shipdate",
                                  "l_quantity"])

    def part(b: pa.Table) -> pa.Table:
        m = None
        for c in ("l_partkey", "l_shipdate", "l_quantity"):
            v = pc.is_valid(b[c])
            m = v if m is None else pc.and_(m, v)
        b = b.filter(m)
        ship = b["l_shipdate"].cast(pa.timestamp("us"))
        mon = pc.add(
            pc.multiply(pc.year(ship).cast(pa.int64()),
                        pa.scalar(12, pa.int64())),
            pc.subtract(pc.month(ship).cast(pa.int64()),
                        pa.scalar(1, pa.int64())),
        )
        qty = pa.array(
            _round_half_away_arr(
                b["l_quantity"].cast(pa.float64()).to_numpy(
                    zero_copy_only=False)),
            pa.int64())
        t = pa.table({"l_partkey": b["l_partkey"], "mon": mon,
                      "q": qty})
        g = t.group_by(["l_partkey", "mon"]).aggregate(
            [("q", "sum")])
        return g.rename_columns(["l_partkey", "mon", "q"])

    def comb(b: pa.Table) -> pa.Table:
        g = b.group_by(["l_partkey", "mon"]).aggregate(
            [("q", "sum")])
        return g.rename_columns(["l_partkey", "mon", "q"])

    pm = tree_merge(
        li.map_batches(part, batch_format="pyarrow",
                       batch_size=None),
        comb,
        final_shards=8,
        shard_cols=["l_partkey"],
    ).to_pandas()
    cols = ["xyz_class", "n_parts", "sum_cv_ppm"]
    if "l_partkey" not in pm.columns or len(pm) == 0:
        return pa.table({
            "xyz_class": pa.array([], pa.string()),
            "n_parts": pa.array([], pa.int64()),
            "sum_cv_ppm": pa.array([], pa.int64()),
        })
    n_months = int(pm["mon"].max() - pm["mon"].min() + 1)
    agg = pm.groupby("l_partkey").agg(
        s=("q", "sum"), ss=("q", lambda v: int((v.astype(np.int64)
                                                ** 2).sum())),
    )
    s = agg["s"].to_numpy(np.int64).astype(np.float64)
    ss = agg["ss"].to_numpy(np.int64).astype(np.float64)
    n = float(n_months)
    mean = s / n
    var = (ss - s * s / n) / n
    keep = mean > 0
    cv_ppm = np.array([
        _round_half_away(v)
        for v in np.sqrt(np.maximum(var[keep], 0.0))
        / mean[keep] * 1e6
    ], dtype=np.int64)
    cls = np.where(cv_ppm < _XYZ_X, "X",
                   np.where(cv_ppm < _XYZ_Y, "Y", "Z"))
    df = pd.DataFrame({"xyz_class": cls, "cv_ppm": cv_ppm})
    out = df.groupby("xyz_class", sort=True).agg(
        n_parts=("cv_ppm", "size"),
        sum_cv_ppm=("cv_ppm", "sum"),
    ).reset_index()
    return pa.table({
        "xyz_class": pa.array(out["xyz_class"], pa.string()),
        "n_parts": pa.array(out["n_parts"].to_numpy(np.int64)),
        "sum_cv_ppm": pa.array(
            out["sum_cv_ppm"].to_numpy(np.int64)),
    })


def _round_half_away_arr(x: np.ndarray) -> np.ndarray:
    return np.where(x >= 0, np.floor(x + 0.5),
                    np.ceil(x - 0.5)).astype(np.int64)


XYZ_SQL = f"""
WITH pm AS MATERIALIZED (
  SELECT l_partkey,
         YEAR(l_shipdate) * 12 + (MONTH(l_shipdate) - 1) AS mon,
         CAST(SUM(CAST(ROUND(l_quantity, 0) AS BIGINT))
              AS BIGINT) AS q
  FROM lineitem
  WHERE l_partkey IS NOT NULL AND l_shipdate IS NOT NULL
    AND l_quantity IS NOT NULL
  GROUP BY 1, 2
), span AS MATERIALIZED (
  SELECT MAX(mon) - MIN(mon) + 1 AS n_months FROM pm
), st AS MATERIALIZED (
  SELECT l_partkey,
         CAST(SUM(q) AS BIGINT) AS s,
         CAST(SUM(q * q) AS BIGINT) AS ss
  FROM pm GROUP BY 1
), cv AS MATERIALIZED (
  SELECT l_partkey,
         CAST(ROUND(SQRT(GREATEST(
                 (ss - CAST(s AS DOUBLE) * s / span.n_months)
                   / span.n_months, 0.0))
              / (CAST(s AS DOUBLE) / span.n_months)
              * 1000000, 0) AS BIGINT) AS cv_ppm
  FROM st CROSS JOIN span
  WHERE s > 0
)
SELECT CASE WHEN cv_ppm < {_XYZ_X} THEN 'X'
            WHEN cv_ppm < {_XYZ_Y} THEN 'Y'
            ELSE 'Z' END AS xyz_class,
       CAST(COUNT(*) AS BIGINT) AS n_parts,
       CAST(SUM(cv_ppm) AS BIGINT) AS sum_cv_ppm
FROM cv GROUP BY 1 ORDER BY 1
"""

_WAH_COLS = ["event_type", "n_minutes", "n_groups", "n_literal",
             "n_fill_runs", "total_words"]


def q_wah_bitmap_words(sf_dir):
    """WAH (word-aligned hybrid) compressed-bitmap word model per
    event type: the active-minute bitmap over the global minute
    span splits into 31-bit groups; all-zero / all-one groups merge
    into fill runs (one word per run of equal fills), mixed groups
    are one literal word each — total words is the WAH size in
    32-bit words.  The third point of the bitmap-layout triangle
    next to Roaring containers and Elias-Fano.  One distinct
    shuffle; the group classification is a tiny driver scan over
    per-group bit counts."""
    tm = _distinct_type_minutes(sf_dir)

    def gstats(b: pa.Table) -> pa.Table:
        cols = ["event_type", "mn", "mx", "n"]
        if b.num_rows == 0 or "event_type" not in b.column_names:
            return pa.table({
                "event_type": pa.array([], pa.string()),
                **{c: pa.array([], pa.int64()) for c in cols[1:]},
            })
        g = b.group_by(["event_type"]).aggregate(
            [("minute", "min"), ("minute", "max"),
             ([], "count_all")])
        return g.rename_columns(["event_type", "mn", "mx", "n"])

    # global span and per-(type, group) bit counts need the span
    # first: fold global min/max, then regroup
    def span_part(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "minute" not in b.column_names:
            return pa.table({"mn": pa.array([], pa.int64()),
                             "mx": pa.array([], pa.int64())})
        return pa.table({
            "mn": pa.array([pc.min(b["minute"]).as_py()],
                           pa.int64()),
            "mx": pa.array([pc.max(b["minute"]).as_py()],
                           pa.int64()),
        })

    def span_comb(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"mn": pa.array([], pa.int64()),
                             "mx": pa.array([], pa.int64())})
        return pa.table({
            "mn": pa.array([pc.min(b["mn"]).as_py()], pa.int64()),
            "mx": pa.array([pc.max(b["mx"]).as_py()], pa.int64()),
        })

    tm = tm.materialize()
    sp = tree_merge(
        tm.map_batches(span_part, batch_format="pyarrow",
                       batch_size=None),
        span_comb,
    ).to_pandas()
    empty = pa.table({
        "event_type": pa.array([], pa.string()),
        **{c: pa.array([], pa.int64()) for c in _WAH_COLS[1:]},
    })
    if not len(sp) or "mn" not in sp.columns:
        return empty
    mmin = int(sp["mn"].iloc[0])
    mmax = int(sp["mx"].iloc[0])
    n_groups = (mmax - mmin) // _WAH_BITS + 1

    def gcounts(b: pa.Table) -> pa.Table:
        cols = ["event_type", "grp", "bits"]
        if b.num_rows == 0 or "event_type" not in b.column_names:
            return pa.table({
                "event_type": pa.array([], pa.string()),
                "grp": pa.array([], pa.int64()),
                "bits": pa.array([], pa.int64()),
            })
        df = b.select(["event_type", "minute"]).to_pandas()
        df["grp"] = ((df["minute"].to_numpy(np.int64) - mmin)
                     // _WAH_BITS)
        g = df.groupby(["event_type", "grp"], sort=False).size()
        g = g.reset_index(name="bits")
        g["bits"] = g["bits"].astype(np.int64)
        return pa.Table.from_pandas(g[cols], preserve_index=False)

    def gcomb(b: pa.Table) -> pa.Table:
        g = b.group_by(["event_type", "grp"]).aggregate(
            [("bits", "sum")])
        return g.rename_columns(["event_type", "grp", "bits"])

    gb = tree_merge(
        tm.map_batches(gcounts, batch_format="pyarrow",
                       batch_size=None),
        gcomb,
    ).to_pandas()
    if "event_type" not in gb.columns or len(gb) == 0:
        return empty
    out = {c: [] for c in _WAH_COLS}
    for et, sub in gb.groupby("event_type", sort=True):
        bits = np.zeros(n_groups, dtype=np.int64)
        grp = sub["grp"].to_numpy(np.int64)
        bits[grp] = sub["bits"].to_numpy(np.int64)
        # class: 0 = empty fill, 1 = full fill, 2 = literal
        cls = np.where(bits == 0, 0,
                       np.where(bits == _WAH_BITS, 1, 2))
        n_lit = int((cls == 2).sum())
        fill = cls != 2
        starts = fill & np.concatenate(
            ([True], (~fill[:-1]) | (cls[1:] != cls[:-1])))
        n_runs = int(starts.sum())
        out["event_type"].append(et)
        out["n_minutes"].append(int(bits.sum()))
        out["n_groups"].append(n_groups)
        out["n_literal"].append(n_lit)
        out["n_fill_runs"].append(n_runs)
        out["total_words"].append(n_lit + n_runs)
    return pa.table({
        "event_type": pa.array(out["event_type"], pa.string()),
        **{c: pa.array(out[c], pa.int64())
           for c in _WAH_COLS[1:]},
    })


WAH_SQL = f"""
WITH dm AS MATERIALIZED (
  SELECT DISTINCT event_type, EPOCH_US(ts) // 60000000 AS m
  FROM events WHERE event_type IS NOT NULL AND ts IS NOT NULL
), span AS MATERIALIZED (
  SELECT MIN(m) AS mmin, MAX(m) AS mmax FROM dm
), gc AS MATERIALIZED (
  SELECT event_type, (m - span.mmin) // {_WAH_BITS} AS grp,
         CAST(COUNT(*) AS BIGINT) AS bits
  FROM dm CROSS JOIN span GROUP BY 1, 2
), ng AS MATERIALIZED (
  SELECT (mmax - mmin) // {_WAH_BITS} + 1 AS n_groups FROM span
), grid AS MATERIALIZED (
  SELECT t.event_type, r.k AS grp, COALESCE(gc.bits, 0) AS bits
  FROM (SELECT DISTINCT event_type FROM gc) t
  CROSS JOIN ng
  JOIN range(0, 100000) r(k) ON r.k < ng.n_groups
  LEFT JOIN gc ON gc.event_type = t.event_type AND gc.grp = r.k
), cls AS MATERIALIZED (
  SELECT event_type, grp, bits,
         CASE WHEN bits = 0 THEN 0
              WHEN bits = {_WAH_BITS} THEN 1
              ELSE 2 END AS c,
         LAG(CASE WHEN bits = 0 THEN 0
                  WHEN bits = {_WAH_BITS} THEN 1
                  ELSE 2 END)
           OVER (PARTITION BY event_type ORDER BY grp) AS pc_
  FROM grid
)
SELECT event_type,
       CAST(SUM(bits) AS BIGINT) AS n_minutes,
       CAST(COUNT(*) AS BIGINT) AS n_groups,
       CAST(SUM(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_literal,
       CAST(SUM(CASE WHEN c <> 2
                      AND (pc_ IS NULL OR pc_ <> c)
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_fill_runs,
       CAST(SUM(CASE WHEN c = 2 THEN 1 ELSE 0 END)
            + SUM(CASE WHEN c <> 2
                        AND (pc_ IS NULL OR pc_ <> c)
                       THEN 1 ELSE 0 END) AS BIGINT)
         AS total_words
FROM cls GROUP BY event_type ORDER BY event_type
"""


def q_semijoin_reduction_audit(sf_dir):
    """Semi-join pushdown economics per market segment: how many
    lineitem rows reach the orders-lineitem exchange when the
    customer-segment filter is pushed down as a semi-join versus a
    naive plan that ships every lineitem — per segment the order
    count, surviving lineitem count, and the shipped share in ppm.
    The dimension filter broadcasts; lineitems pre-aggregate to
    per-order counts BEFORE a hash-partitioned Dataset.join (the
    combiner-first discipline), so the audit itself ships orders-
    sized rows, never the lineitem stream."""
    from mimirsbrunn_ray.context import pool_size

    # the segment attaches via budget-gated broadcast / join
    # (stages/broadcast.py) — the customer dim never lands whole on
    # the driver
    from mimirsbrunn_ray.stages.broadcast import attach_dim

    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey"])
    orders = orders.map_batches(
        lambda b: b.filter(pc.and_(pc.is_valid(b["o_orderkey"]),
                                   pc.is_valid(b["o_custkey"]))),
        batch_format="pyarrow", batch_size=None)
    orders = attach_dim(orders, "o_custkey", sf_dir, "customer",
                        "c_custkey", ["c_mktsegment"], how="inner",
                        out_names=["segment"])
    orders = orders.map_batches(
        lambda b: pa.table({"o_orderkey": b["o_orderkey"],
                            "segment": b["segment"].cast(pa.string())}),
        batch_format="pyarrow", batch_size=None)

    def li_partial(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_valid(b["l_orderkey"]))
        t = pa.table({"l_orderkey": b["l_orderkey"]})
        g = t.group_by(["l_orderkey"]).aggregate(
            [([], "count_all")])
        return g.rename_columns(["l_orderkey", "n_li"])

    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey"]
    ).map_batches(li_partial, batch_format="pyarrow",
                  batch_size=None)

    def li_comb(b: pa.Table) -> pa.Table:
        g = b.group_by(["l_orderkey"]).aggregate([("n_li", "sum")])
        return g.rename_columns(["l_orderkey", "n_li"])

    li_counts = tree_merge(li, li_comb, final_shards=8,
                           shard_cols=["l_orderkey"]).materialize()
    orders = orders.materialize()
    _empty_out = pa.table({
        "segment": pa.array([], pa.string()),
        **{c: pa.array([], pa.int64()) for c in
           ["n_orders", "n_lineitems", "total_lineitems",
            "ship_ppm"]},
    })
    # a fully-empty input file short-circuits the read and produces
    # schema-less blocks that crash the hash join — bail out first
    if li_counts.count() == 0 or orders.count() == 0:
        return _empty_out

    n_part = max(8, pool_size())
    joined = _safe_join(
        li_counts, orders,
        on=("l_orderkey",),
        right_on=("o_orderkey",),
        join_type="inner",
        num_partitions=n_part,
    )

    def seg_part(b: pa.Table) -> pa.Table:
        cols = ["segment", "n_orders", "n_lineitems"]
        if b.num_rows == 0 or "segment" not in b.column_names:
            return pa.table({
                "segment": pa.array([], pa.string()),
                "n_orders": pa.array([], pa.int64()),
                "n_lineitems": pa.array([], pa.int64()),
            })
        t = pa.table({
            "segment": b["segment"],
            "n_orders": pa.array(
                np.ones(b.num_rows, np.int64)),
            "n_lineitems": b["n_li"],
        })
        g = t.group_by(["segment"]).aggregate(
            [("n_orders", "sum"), ("n_lineitems", "sum")])
        return g.rename_columns(cols)

    def seg_comb(b: pa.Table) -> pa.Table:
        g = b.group_by(["segment"]).aggregate(
            [("n_orders", "sum"), ("n_lineitems", "sum")])
        return g.rename_columns(
            ["segment", "n_orders", "n_lineitems"])

    seg = tree_merge(
        joined.map_batches(seg_part, batch_format="pyarrow",
                           batch_size=None),
        seg_comb,
    ).to_pandas()
    cols = ["segment", "n_orders", "n_lineitems",
            "total_lineitems", "ship_ppm"]
    if "segment" not in seg.columns or len(seg) == 0:
        return pa.table({
            "segment": pa.array([], pa.string()),
            **{c: pa.array([], pa.int64()) for c in cols[1:]},
        })
    seg = seg.sort_values("segment", ignore_index=True)
    total = int(seg["n_lineitems"].sum())
    ppm = [
        _round_half_away(v / total * 1e6) if total else 0
        for v in seg["n_lineitems"].astype(np.int64)
    ]
    return pa.table({
        "segment": pa.array(seg["segment"], pa.string()),
        "n_orders": pa.array(seg["n_orders"].to_numpy(np.int64)),
        "n_lineitems": pa.array(
            seg["n_lineitems"].to_numpy(np.int64)),
        "total_lineitems": pa.array(
            np.full(len(seg), total, np.int64)),
        "ship_ppm": pa.array(ppm, pa.int64()),
    })


SEMIJOIN_SQL = """
WITH o AS MATERIALIZED (
  SELECT o.o_orderkey, c.c_mktsegment AS segment
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
  WHERE o.o_orderkey IS NOT NULL AND o.o_custkey IS NOT NULL
), lc AS MATERIALIZED (
  SELECT l_orderkey, CAST(COUNT(*) AS BIGINT) AS n_li
  FROM lineitem WHERE l_orderkey IS NOT NULL GROUP BY 1
), seg AS MATERIALIZED (
  SELECT o.segment,
         CAST(COUNT(*) AS BIGINT) AS n_orders,
         CAST(SUM(lc.n_li) AS BIGINT) AS n_lineitems
  FROM lc JOIN o ON lc.l_orderkey = o.o_orderkey
  GROUP BY 1
), tot AS MATERIALIZED (
  SELECT CAST(SUM(n_lineitems) AS BIGINT) AS total FROM seg
)
SELECT segment, n_orders, n_lineitems,
       tot.total AS total_lineitems,
       CAST(ROUND(CAST(n_lineitems AS DOUBLE) / tot.total
            * 1000000, 0) AS BIGINT) AS ship_ppm
FROM seg CROSS JOIN tot
ORDER BY segment
"""


def register_r4fr(queries: dict, oracles: dict) -> None:
    queries.update(
        {
            "xyz_classification_parts": q_xyz_classification_parts,
            "wah_bitmap_words": q_wah_bitmap_words,
            "semijoin_reduction_audit": q_semijoin_reduction_audit,
        }
    )
    oracles.update(
        {
            "xyz_classification_parts": XYZ_SQL,
            "wah_bitmap_words": WAH_SQL,
            "semijoin_reduction_audit": SEMIJOIN_SQL,
        }
    )
