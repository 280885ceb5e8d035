"""Round-4 batch AC: entity-resolution pair generation and the
correlated-subquery filter shape — sorted-neighborhood windowed pairs
over a global name order, blocked pairwise edit-distance duplicate
candidates, and orders above their customer's average price.

Exactness discipline: all outputs are integers/strings (rank gaps,
edit distances, cents comparisons via cross-multiplication), so every
compare is exact.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd
from mimirsbrunn_ray.stages.broadcast import safe_join as _safe_join

from mimirsbrunn_ray.stages.rollup import tree_merge


def _round_half_away(x: np.ndarray) -> np.ndarray:
    return np.where(
        x >= 0, np.floor(x + 0.5), np.ceil(x - 0.5)
    ).astype(np.int64)


# ---------------------------------------------------------------------------
# sorted-neighborhood pair generation (windowed pairs over a global order)
# ---------------------------------------------------------------------------

_SN_WINDOW = 2


def q_sorted_neighborhood_pairs(sf_dir):
    """Sorted-neighborhood blocking: every pair of customer names within
    rank distance `_SN_WINDOW` of each other in the GLOBAL name order —
    the classic entity-resolution candidate generator (Hernandez &
    Stolfo's merge/purge), which beats key-equality blocking when near
    duplicates share a sort neighborhood but no exact key.

    Distributed shape WITHOUT materializing the global sort: rows are
    range-bucketed by a key monotone in the sort order (here the name's
    numeric suffix), each bucket emits its in-bucket window pairs from
    one local sort, and every bucket also emits its first/last w rows as
    EDGE rows (bounded: buckets x 2w). The driver stitches cross-bucket
    pairs from the edge rows alone — the global rank gap between two
    edge rows is (rows after a in a's bucket) + (interior buckets'
    sizes) + (rows before b in b's bucket) + 1, all known from the edge
    positions and the per-bucket size table, so sparse/small buckets
    are handled exactly.
    """
    w = _SN_WINDOW
    cust = rd.read_parquet(f"{sf_dir}/customer.parquet", columns=["c_name"])

    def bucketize(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_valid(b["c_name"]))
        names = b["c_name"].to_numpy(zero_copy_only=False)
        # 'Customer#000000042' -> 42; the suffix orders exactly like the
        # zero-padded name string, so buckets are sort-contiguous
        suf = np.array(
            [int(str(n).rsplit("#", 1)[-1]) for n in names], dtype=np.int64
        )
        return pa.table(
            {
                "c_name": b["c_name"],
                "bucket": pa.array(suf // 64),
            }
        )

    bucketed = cust.map_batches(
        bucketize, batch_format="pyarrow", batch_size=None
    )

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("c_name", ignore_index=True)
        names = g["c_name"].to_numpy()
        n = len(names)
        bkt = int(g["bucket"].iloc[0])
        rows = {"kind": [], "name_a": [], "name_b": [], "gap": [],
                "bucket": [], "pos_start": [], "pos_end": []}
        for d in range(1, w + 1):
            for i in range(n - d):
                rows["kind"].append("pair")
                rows["name_a"].append(names[i])
                rows["name_b"].append(names[i + d])
                rows["gap"].append(d)
                rows["bucket"].append(bkt)
                rows["pos_start"].append(0)
                rows["pos_end"].append(0)
        # edge rows: distance-from-start / distance-from-end (1-based),
        # 0 when the row is not within w of that end
        for i in range(n):
            ds_ = i + 1 if i < w else 0
            de = n - i if i >= n - w else 0
            if ds_ or de:
                rows["kind"].append("edge")
                rows["name_a"].append(names[i])
                rows["name_b"].append("")
                rows["gap"].append(0)
                rows["bucket"].append(bkt)
                rows["pos_start"].append(ds_)
                rows["pos_end"].append(de)
        # every bucket reports its size once (for interior-gap arithmetic)
        rows["kind"].append("size")
        rows["name_a"].append("")
        rows["name_b"].append("")
        rows["gap"].append(n)
        rows["bucket"].append(bkt)
        rows["pos_start"].append(0)
        rows["pos_end"].append(0)
        return pd.DataFrame(rows)

    mixed = bucketed.groupby("bucket").map_groups(
        per_bucket, batch_format="pandas"
    ).to_pandas()
    # in-bucket pairs stream through; edges+sizes are bounded
    # (buckets x (2w + 1) rows) — the only driver-side state
    if "kind" not in mixed.columns:
        mixed = pd.DataFrame(
            {"kind": [], "name_a": [], "name_b": [], "gap": [],
             "bucket": [], "pos_start": [], "pos_end": []}
        )
    pairs = mixed[mixed["kind"] == "pair"][
        ["name_a", "name_b", "gap"]
    ].copy()
    sizes = dict(
        zip(
            mixed[mixed["kind"] == "size"]["bucket"].astype(np.int64),
            mixed[mixed["kind"] == "size"]["gap"].astype(np.int64),
        )
    )
    edges = mixed[mixed["kind"] == "edge"].sort_values(
        "name_a", ignore_index=True
    )
    e_name = edges["name_a"].to_numpy()
    e_bkt = edges["bucket"].to_numpy(dtype=np.int64)
    e_end = edges["pos_end"].to_numpy(dtype=np.int64)
    e_start = edges["pos_start"].to_numpy(dtype=np.int64)
    xb = {"name_a": [], "name_b": [], "gap": []}
    buckets_sorted = np.array(sorted(sizes), dtype=np.int64)
    size_arr = np.array([sizes[k] for k in buckets_sorted], dtype=np.int64)
    cum_sizes = np.concatenate(([0], np.cumsum(size_arr)))
    # a cross-bucket pair with global gap <= w is within w POSITIONS in
    # the sorted edge list too (every intermediate edge row is itself a
    # distinct global row between them), so the scan is O(edges x w)
    for i in range(len(edges)):
        for j in range(i + 1, min(i + 1 + w, len(edges))):
            if e_bkt[i] == e_bkt[j]:
                continue  # in-bucket pairs already emitted
            if not (e_end[i] and e_start[j]):
                continue  # only tail-of-earlier x head-of-later can be close
            lo = int(np.searchsorted(buckets_sorted, e_bkt[i], "right"))
            hi = int(np.searchsorted(buckets_sorted, e_bkt[j], "left"))
            interior = int(cum_sizes[hi] - cum_sizes[lo])
            gap = int(e_end[i] - 1) + interior + int(e_start[j] - 1) + 1
            if gap <= w:
                xb["name_a"].append(e_name[i])
                xb["name_b"].append(e_name[j])
                xb["gap"].append(gap)
    out = pd.concat([pairs, pd.DataFrame(xb)], ignore_index=True)
    out["gap"] = out["gap"].astype(np.int64)
    return pa.Table.from_pandas(
        out.sort_values(["name_a", "name_b"], ignore_index=True),
        preserve_index=False,
    )


SORTED_NEIGHBORHOOD_SQL = f"""
WITH r AS (
  SELECT c_name, ROW_NUMBER() OVER (ORDER BY c_name) AS rk
  FROM customer WHERE c_name IS NOT NULL
)
SELECT a.c_name AS name_a, b.c_name AS name_b,
       CAST(b.rk - a.rk AS BIGINT) AS gap
FROM r a JOIN r b ON b.rk > a.rk AND b.rk - a.rk <= {_SN_WINDOW}
"""


# ---------------------------------------------------------------------------
# blocked pairwise edit-distance duplicate candidates
# ---------------------------------------------------------------------------

_EDIT_MAX = 2


def q_name_edit_dup_pairs(sf_dir):
    """Within-nation blocked pairwise Levenshtein: customer pairs in the
    same nation whose names are within edit distance `_EDIT_MAX` — the
    match-scoring half of a blocked entity-resolution pipeline (the
    blocking key bounds the quadratic: cost is sum over blocks of
    |block|^2 distances, never corpus^2). Distances come from the same
    vectorized batch DP as levenshtein_probe_customers — per block, one
    probe row against the block's tail, numpy over rows."""
    from mimirsbrunn_ray.pipelines.queries_r4aa import _lev_batch

    cust = rd.read_parquet(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_nationkey", "c_name"],
    )

    def per_block(g: pd.DataFrame) -> pd.DataFrame:
        g = g.dropna(subset=["c_custkey", "c_name"]).sort_values(
            "c_custkey", ignore_index=True
        )
        keys = g["c_custkey"].to_numpy(dtype=np.int64)
        names = g["c_name"].to_numpy()
        nk = int(g["c_nationkey"].iloc[0]) if len(g) else 0
        out = {"nationkey": [], "custkey_a": [], "custkey_b": [],
               "dist": []}
        for i in range(len(names) - 1):
            d = _lev_batch(str(names[i]), names[i + 1:])
            hit = np.nonzero(d <= _EDIT_MAX)[0]
            for h in hit:
                out["nationkey"].append(nk)
                out["custkey_a"].append(int(keys[i]))
                out["custkey_b"].append(int(keys[i + 1 + h]))
                out["dist"].append(int(d[h]))
        return pd.DataFrame(
            {
                "nationkey": pd.Series(out["nationkey"], dtype=np.int64),
                "custkey_a": pd.Series(out["custkey_a"], dtype=np.int64),
                "custkey_b": pd.Series(out["custkey_b"], dtype=np.int64),
                "dist": pd.Series(out["dist"], dtype=np.int64),
            }
        )

    return cust.groupby("c_nationkey").map_groups(
        per_block, batch_format="pandas"
    )


NAME_EDIT_SQL = f"""
SELECT CAST(a.c_nationkey AS BIGINT) AS nationkey,
       a.c_custkey AS custkey_a, b.c_custkey AS custkey_b,
       CAST(levenshtein(a.c_name, b.c_name) AS BIGINT) AS dist
FROM customer a JOIN customer b
  ON a.c_nationkey = b.c_nationkey AND a.c_custkey < b.c_custkey
WHERE a.c_name IS NOT NULL AND b.c_name IS NOT NULL
  AND levenshtein(a.c_name, b.c_name) <= {_EDIT_MAX}
"""


# ---------------------------------------------------------------------------
# correlated subquery: orders above their customer's average price
# ---------------------------------------------------------------------------


def q_orders_above_cust_avg(sf_dir):
    """Orders whose total price exceeds their own customer's average
    order price — the classic correlated-subquery shape, decorrelated
    into per-customer (n, sum) partials + one big-big hash join back to
    the fact rows. The comparison is the integer cross-multiplication
    price_x100 * n > sum_x100 (no division), so it is exact."""
    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_totalprice"],
    )

    def partial(b: pa.Table) -> pa.Table:
        b = b.filter(
            pc.and_(
                pc.is_valid(b["o_custkey"]), pc.is_valid(b["o_totalprice"])
            )
        )
        x = _round_half_away(
            b["o_totalprice"].cast(pa.float64()).to_numpy(
                zero_copy_only=False
            )
            * 100.0
        )
        t = pa.table(
            {"o_custkey": b["o_custkey"], "x": pa.array(x)}
        )
        g = t.group_by(["o_custkey"]).aggregate(
            [([], "count_all"), ("x", "sum")]
        )
        g = g.select(["o_custkey", "count_all", "x_sum"])
        return g.rename_columns(["o_custkey", "n_cust", "sum_cust_x100"])

    def combine(b: pa.Table) -> pa.Table:
        g = b.group_by(["o_custkey"]).aggregate(
            [("n_cust", "sum"), ("sum_cust_x100", "sum")]
        )
        return g.rename_columns(["o_custkey", "n_cust", "sum_cust_x100"])

    stats = tree_merge(
        orders.map_batches(partial, batch_format="pyarrow", batch_size=None),
        combine,
        final_shards=4,
        shard_cols=["o_custkey"],
    ).repartition(4)

    def fact(b: pa.Table) -> pa.Table:
        b = b.filter(
            pc.and_(
                pc.is_valid(b["o_custkey"]), pc.is_valid(b["o_totalprice"])
            )
        )
        x = _round_half_away(
            b["o_totalprice"].cast(pa.float64()).to_numpy(
                zero_copy_only=False
            )
            * 100.0
        )
        return pa.table(
            {
                "o_orderkey": b["o_orderkey"],
                "o_custkey": b["o_custkey"],
                "price_x100": pa.array(x),
            }
        )

    facts = orders.map_batches(
        fact, batch_format="pyarrow", batch_size=None
    ).repartition(4)
    joined = _safe_join(
        facts, stats,
        on=("o_custkey",),
        join_type="inner",
        num_partitions=4,
    )

    def finish(b: pa.Table) -> pa.Table:
        px = b["price_x100"].to_numpy(zero_copy_only=False)
        n = b["n_cust"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        s = b["sum_cust_x100"].cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        keep = px * n > s
        t = b.filter(pa.array(keep))
        return t.select(
            ["o_orderkey", "o_custkey", "price_x100", "n_cust"]
        )

    return joined.map_batches(finish, batch_format="pyarrow",
                              batch_size=None)


ABOVE_CUST_AVG_SQL = """
WITH v AS (
  SELECT o_orderkey, o_custkey,
         CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS price_x100
  FROM orders
  WHERE o_custkey IS NOT NULL AND o_totalprice IS NOT NULL
), m AS (
  SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n_cust,
         CAST(SUM(price_x100) AS BIGINT) AS s
  FROM v GROUP BY 1
)
SELECT v.o_orderkey, v.o_custkey, v.price_x100, m.n_cust
FROM v JOIN m USING (o_custkey)
WHERE v.price_x100 * m.n_cust > m.s
"""


def register_r4ac(queries: dict, oracles: dict) -> None:
    queries.update(
        {
            "sorted_neighborhood_pairs": q_sorted_neighborhood_pairs,
            "name_edit_dup_pairs": q_name_edit_dup_pairs,
            "orders_above_cust_avg": q_orders_above_cust_avg,
        }
    )
    oracles.update(
        {
            "sorted_neighborhood_pairs": SORTED_NEIGHBORHOOD_SQL,
            "name_edit_dup_pairs": NAME_EDIT_SQL,
            "orders_above_cust_avg": ABOVE_CUST_AVG_SQL,
        }
    )
