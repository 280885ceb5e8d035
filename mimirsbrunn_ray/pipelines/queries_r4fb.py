"""Round-4 batch FB: the skyline (Pareto dominance) operator in its
canonical two-phase distributed form (local skyline per block, then
the skyline of the union — correct because skyline(S) =
skyline(union of local skylines)), TPC-H Q15 (top supplier by
quarterly revenue, WITH ties), and a partition-union reconciliation
audit (the hash-slice completeness invariant every shuffle in this
engine relies on: 4 disjoint event_id slices must rebuild the full
per-type totals exactly).

Exactness discipline: skyline dominance compares int64 price-cents
and int64 microsecond dates (no floats anywhere); Q15 revenue on
the x1e4 integer grid makes the max-with-ties test exact; the
reconciliation compares exact int64 counts and x100 value sums."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as _pq
import ray.data as rd

from mimirsbrunn_ray.stages.rollup import tree_merge

_Q15_LO = np.datetime64("1996-01-01", "us").astype(np.int64)
_Q15_HI = np.datetime64("1996-04-01", "us").astype(np.int64)
_RECON_SLICES = 4


def _skyline_2d(price: np.ndarray, date: np.ndarray) -> np.ndarray:
    """Boolean survivor mask: q is dominated iff some point has
    (price > q.price, date >= q.date) or (price >= q.price,
    date > q.date). Computed via per-price max dates + the prefix
    max over strictly higher prices."""
    if len(price) == 0:
        return np.zeros(0, bool)
    df = pd.DataFrame({"p": price, "d": date})
    per = (
        df.groupby("p")["d"].max().sort_index(ascending=False)
    )  # price desc
    prices_desc = per.index.to_numpy()
    maxd = per.to_numpy()
    # M1[i] = max date among prices strictly higher than prices_desc[i]
    m1 = np.concatenate(
        ([np.iinfo(np.int64).min], np.maximum.accumulate(maxd)[:-1])
    )
    m1_of = pd.Series(m1, index=prices_desc)
    s_m1 = df["p"].map(m1_of).to_numpy(dtype=np.int64)
    s_mpd = df["p"].map(per).to_numpy(dtype=np.int64)
    return ~((s_m1 >= df["d"].to_numpy())
             | (s_mpd > df["d"].to_numpy()))


def q_skyline_orders(sf_dir):
    """The skyline of orders on (totalprice high, orderdate recent):
    orders no other order beats on both axes. Phase 1 reduces each
    block to its local skyline (vectorized dominance via per-price
    max dates); phase 2 takes the skyline of the union of local
    skylines — the standard distributed-skyline identity, so the
    driver only ever sees the (tiny) candidate frontier."""
    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_totalprice", "o_orderdate"],
    )

    def local(b: pa.Table) -> pa.Table:
        m = pc.and_(
            pc.and_(pc.is_valid(b["o_orderkey"]),
                    pc.is_valid(b["o_totalprice"])),
            pc.is_valid(b["o_orderdate"]),
        )
        b = b.filter(m)
        cents = np.floor(
            b["o_totalprice"].to_numpy(zero_copy_only=False) * 100.0
            + 0.5
        ).astype(np.int64)
        dus = b["o_orderdate"].cast(pa.timestamp("us")).cast(
            pa.int64()
        ).to_numpy(zero_copy_only=False)
        keep = _skyline_2d(cents, dus)
        return pa.table(
            {
                "o_orderkey": pa.array(
                    b["o_orderkey"].to_numpy(zero_copy_only=False)[
                        keep
                    ].astype(np.int64)
                ),
                "total_cents": pa.array(cents[keep]),
                "date_us": pa.array(dus[keep]),
            }
        )

    cand = orders.map_batches(
        local, batch_format="pyarrow", batch_size=None
    ).to_pandas()
    if len(cand) == 0:
        return pa.table(
            {
                "o_orderkey": pa.array([], pa.int64()),
                "total_cents": pa.array([], pa.int64()),
                "o_orderdate": pa.array([], pa.timestamp("us")),
            }
        )
    keep = _skyline_2d(
        cand["total_cents"].to_numpy(dtype=np.int64),
        cand["date_us"].to_numpy(dtype=np.int64),
    )
    cand = cand[keep].sort_values(
        ["total_cents", "o_orderkey"], ascending=[False, True],
        ignore_index=True,
    )
    return pa.table(
        {
            "o_orderkey": pa.array(
                cand["o_orderkey"].to_numpy(dtype=np.int64)
            ),
            "total_cents": pa.array(
                cand["total_cents"].to_numpy(dtype=np.int64)
            ),
            "o_orderdate": pa.array(
                cand["date_us"].to_numpy(dtype=np.int64),
                pa.timestamp("us"),
            ),
        }
    )


SKYLINE_SQL = """
WITH o AS MATERIALIZED (
  SELECT o_orderkey,
         CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)
           AS total_cents,
         CAST(o_orderdate AS TIMESTAMP) AS o_orderdate
  FROM orders
  WHERE o_orderkey IS NOT NULL AND o_totalprice IS NOT NULL
    AND o_orderdate IS NOT NULL
)
SELECT q.o_orderkey, q.total_cents, q.o_orderdate
FROM o q
WHERE NOT EXISTS (
  SELECT 1 FROM o p
  WHERE (p.total_cents > q.total_cents
         AND p.o_orderdate >= q.o_orderdate)
     OR (p.total_cents >= q.total_cents
         AND p.o_orderdate > q.o_orderdate)
)
ORDER BY q.total_cents DESC, q.o_orderkey
"""


def q_tpch_q15_top_supplier(sf_dir):
    """TPC-H Q15: the supplier(s) with the maximum revenue in
    1996Q1 — ties INCLUDED, which the integer x1e4 revenue grid
    makes exact. Combiner-first per-suppkey partials fold through a
    key-disjoint sharded combine; each block then emits its local
    max-tier rows and the driver takes the global max tier; only
    the winners' supplier rows are fetched."""

    def partial(b: pa.Table) -> pa.Table:
        ship = b["l_shipdate"].cast(pa.timestamp("us")).cast(
            pa.int64()
        ).to_numpy(zero_copy_only=False)
        keep = (ship >= _Q15_LO) & (ship < _Q15_HI)
        b = b.filter(pa.array(keep))
        cents = np.floor(
            b["l_extendedprice"].to_numpy(zero_copy_only=False)
            * 100.0 + 0.5
        ).astype(np.int64)
        dpct = np.floor(
            b["l_discount"].to_numpy(zero_copy_only=False) * 100.0
            + 0.5
        ).astype(np.int64)
        t = pa.table(
            {
                "s": b["l_suppkey"],
                "rev": pa.array(cents * (100 - dpct)),
            }
        )
        g = t.group_by(["s"]).aggregate([("rev", "sum")])
        return g.rename_columns(["s", "rev"])

    def combine(b: pa.Table) -> pa.Table:
        g = b.group_by(["s"]).aggregate([("rev", "sum")])
        return g.rename_columns(["s", "rev"])

    totals = tree_merge(
        rd.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_suppkey", "l_shipdate", "l_extendedprice",
                     "l_discount"],
        ).map_batches(partial, batch_format="pyarrow",
                      batch_size=None),
        combine,
        final_shards=8,
        shard_cols=["s"],
    )

    def local_max(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "s" not in b.column_names:
            return pa.table(
                {"s": pa.array([], pa.int64()),
                 "rev": pa.array([], pa.int64())}
            )
        mx = pc.max(b["rev"])
        return b.filter(pc.equal(b["rev"], mx)).select(["s", "rev"])

    cand = (
        totals.map_batches(local_max, batch_format="pyarrow",
                           batch_size=None)
        .to_pandas()
    )
    if len(cand) == 0:
        return pa.table(
            {
                "s_suppkey": pa.array([], pa.int64()),
                "s_name": pa.array([], pa.string()),
                "total_rev_e4": pa.array([], pa.int64()),
            }
        )
    mx = int(cand["rev"].max())
    winners = np.sort(
        cand.loc[cand["rev"] == mx, "s"].to_numpy(dtype=np.int64)
    )
    from mimirsbrunn_ray.stages.broadcast import dim_fits

    if not dim_fits(sf_dir, "supplier"):  # pragma: no cover - scale path
        raise NotImplementedError(
            "distributed-dim fallback: attach_dim on the supplier key "
            "(stages/broadcast.py)")
    supp = _pq.read_table(
        f"{sf_dir}/supplier.parquet",
        columns=["s_suppkey", "s_name"],
        filters=[("s_suppkey", "in", winners.tolist())],
    )
    smap = dict(zip(supp["s_suppkey"].to_pylist(),
                    supp["s_name"].to_pylist()))
    return pa.table(
        {
            "s_suppkey": pa.array(winners, pa.int64()),
            "s_name": pa.array(
                [smap.get(int(k)) for k in winners], pa.string()
            ),
            "total_rev_e4": pa.array(
                np.full(len(winners), mx, np.int64)
            ),
        }
    )


TPCH_Q15_SQL = """
WITH rev AS MATERIALIZED (
  SELECT l_suppkey,
         CAST(SUM(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)
              * (100 - CAST(ROUND(l_discount * 100, 0) AS BIGINT)))
              AS BIGINT) AS total_rev_e4
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate < TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_rev_e4
FROM rev JOIN supplier ON l_suppkey = s_suppkey
WHERE total_rev_e4 = (SELECT MAX(total_rev_e4) FROM rev)
ORDER BY s_suppkey
"""


def q_partition_union_reconciliation(sf_dir):
    """Engine audit: 4 disjoint event_id hash slices must rebuild
    the full per-type totals exactly — the completeness invariant
    behind every hash-partitioned shuffle here. Emits per
    (event_type, slice) exact counts and x100 value sums plus the
    type-level matched flag (1 iff slices sum to the full scan)."""
    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_type", "event_id", "value"],
    )

    def partial(b: pa.Table) -> pa.Table:
        m = pc.and_(
            pc.and_(pc.is_valid(b["event_type"]),
                    pc.is_valid(b["event_id"])),
            pc.is_valid(b["value"]),
        )
        b = b.filter(m)
        eid = b["event_id"].to_numpy(zero_copy_only=False)
        sl = ((eid * 2_654_435_761) % 2_147_483_648) % _RECON_SLICES
        vx = np.floor(
            b["value"].to_numpy(zero_copy_only=False) * 100.0 + 0.5
        ).astype(np.int64)
        t = pa.table(
            {
                "event_type": b["event_type"],
                "slice": pa.array(sl.astype(np.int64)),
                "n": pa.array(np.ones(len(sl), np.int64)),
                "sum_x100": pa.array(vx),
            }
        )
        g = t.group_by(["event_type", "slice"]).aggregate(
            [("n", "sum"), ("sum_x100", "sum")]
        )
        return g.rename_columns(
            ["event_type", "slice", "n", "sum_x100"]
        )

    def combine(b: pa.Table) -> pa.Table:
        g = b.group_by(["event_type", "slice"]).aggregate(
            [("n", "sum"), ("sum_x100", "sum")]
        )
        return g.rename_columns(
            ["event_type", "slice", "n", "sum_x100"]
        )

    per = tree_merge(
        ev.map_batches(partial, batch_format="pyarrow",
                       batch_size=None),
        combine,
    ).to_pandas()
    from mimirsbrunn_ray.stages.broadcast import ensure_cols

    per = ensure_cols(per, ["event_type", "slice", "n", "sum_x100"])
    per = per.sort_values(["event_type", "slice"],
                          ignore_index=True)
    tot = per.groupby("event_type", sort=False).agg(
        tn=("n", "sum"), ts=("sum_x100", "sum")
    )
    # the full-scan totals, computed independently (no slice column)
    full = (
        ev.map_batches(
            lambda b: partial(b)
            .group_by(["event_type"])
            .aggregate([("n", "sum"), ("sum_x100", "sum")])
            .rename_columns(["event_type", "n", "sum_x100"]),
            batch_format="pyarrow",
            batch_size=None,
        )
        .to_pandas()
        .pipe(ensure_cols, ["event_type", "n", "sum_x100"])
        .groupby("event_type")
        .agg(fn=("n", "sum"), fs=("sum_x100", "sum"))
    )
    chk = tot.join(full)
    match = {
        t: int(r["tn"] == r["fn"] and r["ts"] == r["fs"])
        for t, r in chk.iterrows()
    }
    return pa.table(
        {
            "event_type": pa.array(per["event_type"], pa.string()),
            "slice": pa.array(
                per["slice"].to_numpy(dtype=np.int64)
            ),
            "n": pa.array(per["n"].to_numpy(dtype=np.int64)),
            "sum_x100": pa.array(
                per["sum_x100"].to_numpy(dtype=np.int64)
            ),
            "type_matched": pa.array(
                [match[t] for t in per["event_type"]], pa.int64()
            ),
        }
    )


RECON_SQL = f"""
WITH e AS MATERIALIZED (
  SELECT event_type,
         ((event_id * 2654435761) % 2147483648) % {_RECON_SLICES}
           AS sl,
         CAST(ROUND(value * 100, 0) AS BIGINT) AS vx
  FROM events
  WHERE event_type IS NOT NULL AND event_id IS NOT NULL
    AND value IS NOT NULL
)
SELECT event_type, CAST(sl AS BIGINT) AS slice,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(vx) AS BIGINT) AS sum_x100,
       CAST(1 AS BIGINT) AS type_matched
FROM e GROUP BY event_type, sl
ORDER BY event_type, slice
"""


def register_r4fb(queries: dict, oracles: dict) -> None:
    queries.update(
        {
            "skyline_orders": q_skyline_orders,
            "tpch_q15_top_supplier": q_tpch_q15_top_supplier,
            "partition_union_reconciliation":
                q_partition_union_reconciliation,
        }
    )
    oracles.update(
        {
            "skyline_orders": SKYLINE_SQL,
            "tpch_q15_top_supplier": TPCH_Q15_SQL,
            "partition_union_reconciliation": RECON_SQL,
        }
    )
