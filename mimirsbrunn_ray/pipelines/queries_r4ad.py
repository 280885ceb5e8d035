"""Round-4 batch AD: second-order event-type sequence mining, dwell-time
attribution per event type, and hierarchical share-of-parent revenue.

Exactness discipline: sequence counts, dwell microsecond sums, and
cents revenue are all integers; the share-of-parent emits numerator and
denominator as separate integer columns (no float division anywhere).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray.data as rd

from mimirsbrunn_ray.stages.rollup import tree_merge


def _round_half_away(x: np.ndarray) -> np.ndarray:
    return np.where(
        x >= 0, np.floor(x + 0.5), np.ceil(x - 0.5)
    ).astype(np.int64)


# ---------------------------------------------------------------------------
# second-order (trigram) event-type transitions
# ---------------------------------------------------------------------------

_TRIGRAM_TOPK = 20


def q_type_trigram_transitions(sf_dir):
    """Top second-order event-type transitions: count every consecutive
    (t1 -> t2 -> t3) triple inside each user's (ts, event_id)-ordered
    stream and keep the `_TRIGRAM_TOPK` most frequent — the sequence
    signal one Markov order above event_type_markov's matrix (what a
    session-path miner feeds next-action prediction with).

    Same one-shuffle shape as the first-order matrix: user hash buckets
    keep each series whole, per-bucket triple counts are exact partials
    (bounded by #types^3), tree-merged, then the global top-k runs over
    the tiny count table. Triples never cross users (the adjacency mask
    is ANDed with its own shift)."""
    from mimirsbrunn_ray.stages.dedup import _BUCKET
    from mimirsbrunn_ray.stages.timeseries import (
        _project_series,
        _series_segments,
    )

    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "ts", "event_id", "event_type"],
    )
    proj = _project_series(ev, "user_id", "ts", "event_id", "event_type", 64)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "t1": pd.Series([], dtype=object),
                "t2": pd.Series([], dtype=object),
                "t3": pd.Series([], dtype=object),
                "n": pd.Series([], dtype=np.int64),
            }
        )
        if len(g) == 0:
            return empty
        g, same = _series_segments(g, "user_id", "ts", "event_id")
        t = g["event_type"].to_numpy()
        # row i closes the triple (i-2, i-1, i): needs same[i] AND same[i-1]
        same2 = same.copy()
        same2[1:] &= same[:-1]
        same2[:2] = False
        idx = np.nonzero(same2)[0]
        if len(idx) == 0:
            return empty
        out = pd.DataFrame(
            {"t1": t[idx - 2], "t2": t[idx - 1], "t3": t[idx]}
        )
        agg = out.groupby(["t1", "t2", "t3"], sort=False,
                          as_index=False).size()
        agg = agg.rename(columns={"size": "n"})
        agg["n"] = agg["n"].astype(np.int64)
        return agg

    partials = proj.groupby(_BUCKET).map_groups(
        per_bucket, batch_format="pandas"
    )

    def combine(b: pa.Table) -> pa.Table:
        g = b.group_by(["t1", "t2", "t3"]).aggregate([("n", "sum")])
        return g.rename_columns(["t1", "t2", "t3", "n"])

    merged = tree_merge(partials, combine).to_pandas()
    if "n" not in merged.columns:  # empty-corpus schema loss
        merged = pd.DataFrame({c: pd.Series([], dtype=object)
                               for c in ("t1", "t2", "t3")} |
                              {"n": pd.Series([], dtype=np.int64)})
    # bounded: #types^3 rows
    merged = merged.sort_values(
        ["n", "t1", "t2", "t3"], ascending=[False, True, True, True],
        ignore_index=True,
    ).head(_TRIGRAM_TOPK)
    return pa.table(
        {
            "t1": pa.array(merged["t1"], pa.string()),
            "t2": pa.array(merged["t2"], pa.string()),
            "t3": pa.array(merged["t3"], pa.string()),
            "n": pa.array(merged["n"].to_numpy(dtype=np.int64)),
        }
    )


TRIGRAM_SQL = f"""
WITH s AS (
  SELECT user_id, event_type AS t1,
         LEAD(event_type, 1)
           OVER (PARTITION BY user_id ORDER BY ts, event_id) AS t2,
         LEAD(event_type, 2)
           OVER (PARTITION BY user_id ORDER BY ts, event_id) AS t3
  FROM events
  WHERE user_id IS NOT NULL AND ts IS NOT NULL
    AND event_type IS NOT NULL
)
SELECT t1, t2, t3, CAST(COUNT(*) AS BIGINT) AS n
FROM s WHERE t2 IS NOT NULL AND t3 IS NOT NULL
GROUP BY 1, 2, 3
ORDER BY n DESC, t1, t2, t3
LIMIT {_TRIGRAM_TOPK}
"""


# ---------------------------------------------------------------------------
# dwell-time attribution per event type
# ---------------------------------------------------------------------------


def q_dwell_time_per_type(sf_dir):
    """Per event type: how long users DWELL on it — the gap to the
    user's next event, attributed to the CURRENT event's type (last
    event of each user has no dwell and drops out). The engagement
    metric behind 'which step do users linger on'. One user hash-bucket
    shuffle; per-bucket exact (type, n, dwell_us) partials; microsecond
    integer sums end to end."""
    from mimirsbrunn_ray.stages.dedup import _BUCKET
    from mimirsbrunn_ray.stages.timeseries import (
        _project_series,
        _series_segments,
    )

    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "ts", "event_id", "event_type"],
    )
    proj = _project_series(ev, "user_id", "ts", "event_id", "event_type", 64)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "event_type": pd.Series([], dtype=object),
                "n": pd.Series([], dtype=np.int64),
                "dwell_us": pd.Series([], dtype=np.int64),
            }
        )
        if len(g) == 0:
            return empty
        g, same = _series_segments(g, "user_id", "ts", "event_id")
        ts_us = g["ts"].to_numpy(dtype="datetime64[us]").astype(np.int64)
        t = g["event_type"].to_numpy()
        # row i continues row i-1's series: dwell of row i-1 = ts_i - ts_{i-1}
        idx = np.nonzero(same)[0]
        if len(idx) == 0:
            return empty
        out = pd.DataFrame(
            {
                "event_type": t[idx - 1],
                "d": ts_us[idx] - ts_us[idx - 1],
            }
        )
        agg = out.groupby("event_type", sort=False, as_index=False).agg(
            n=("d", "size"), dwell_us=("d", "sum")
        )
        agg["n"] = agg["n"].astype(np.int64)
        agg["dwell_us"] = agg["dwell_us"].astype(np.int64)
        return agg

    partials = proj.groupby(_BUCKET).map_groups(
        per_bucket, batch_format="pandas"
    )

    def combine(b: pa.Table) -> pa.Table:
        g = b.group_by(["event_type"]).aggregate(
            [("n", "sum"), ("dwell_us", "sum")]
        )
        return g.rename_columns(["event_type", "n", "dwell_us"])

    return tree_merge(partials, combine)


DWELL_SQL = """
WITH s AS (
  SELECT user_id, event_type,
         EPOCH_US(LEAD(ts)
           OVER (PARTITION BY user_id ORDER BY ts, event_id))
           - EPOCH_US(ts) AS d
  FROM events
  WHERE user_id IS NOT NULL AND ts IS NOT NULL
    AND event_type IS NOT NULL
)
SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(d) AS BIGINT) AS dwell_us
FROM s WHERE d IS NOT NULL
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# share-of-parent: nation revenue within its region
# ---------------------------------------------------------------------------


def q_nation_revenue_share(sf_dir):
    """Per nation: order revenue and its region's total — the
    share-of-parent hierarchical rollup (percent-of-parent is the
    emitted integer pair revenue_x100 / region_revenue_x100, no float
    division). The 3-hop dimension chain orders -> customer -> nation ->
    region rides the J1 broadcast (customer |x| nation |x| region built
    all-Arrow, byte-budget guarded like orders_per_nation); the fact
    pass emits per-nation cents partials, tree-merged, and the region
    totals are computed over the bounded nation table."""
    from mimirsbrunn_ray.pipelines.queries import BROADCAST_BYTE_BUDGET
    from mimirsbrunn_ray.stages.join import (
        broadcast_join,
        make_lookup_ref_arrays,
    )

    cust = pq.read_table(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
    )
    nation = pq.read_table(
        f"{sf_dir}/nation.parquet",
        columns=["n_nationkey", "n_name", "n_regionkey"],
    )
    region = pq.read_table(
        f"{sf_dir}/region.parquet", columns=["r_regionkey", "r_name"]
    )
    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_totalprice"]
    )
    dim = nation.join(region, keys="n_regionkey", right_keys="r_regionkey")
    if cust.nbytes > BROADCAST_BYTE_BUDGET:  # pragma: no cover - scale path
        raise NotImplementedError(
            "distributed-dim fallback: join orders to customer with "
            "Dataset.join, then broadcast the nation|x|region map "
            "(orders_per_nation's else-branch shape)"
        )
    cd = cust.join(dim, keys="c_nationkey", right_keys="n_nationkey")
    # one composite broadcast: custkey -> "nation\x1fregion"
    lab = pc.binary_join_element_wise(
        cd["n_name"].cast(pa.string()),
        cd["r_name"].cast(pa.string()),
        "\x1f",
    )
    lookup = make_lookup_ref_arrays(
        cd["c_custkey"].to_numpy(zero_copy_only=False),
        lab.to_numpy(zero_copy_only=False),
    )
    joined = broadcast_join(
        orders, lookup, key_col="o_custkey", out_col="lab",
        out_type=pa.string(),
    )

    def partial(b: pa.Table) -> pa.Table:
        b = b.filter(
            pc.and_(pc.is_valid(b["lab"]), pc.is_valid(b["o_totalprice"]))
        )
        x = _round_half_away(
            b["o_totalprice"].cast(pa.float64()).to_numpy(
                zero_copy_only=False
            )
            * 100.0
        )
        t = pa.table({"lab": b["lab"], "x": pa.array(x)})
        g = t.group_by(["lab"]).aggregate([("x", "sum")])
        g = g.select(["lab", "x_sum"])
        return g.rename_columns(["lab", "revenue_x100"])

    def combine(b: pa.Table) -> pa.Table:
        g = b.group_by(["lab"]).aggregate([("revenue_x100", "sum")])
        return g.rename_columns(["lab", "revenue_x100"])

    per_nation = tree_merge(
        joined.map_batches(partial, batch_format="pyarrow",
                           batch_size=None),
        combine,
    ).to_pandas()  # bounded: one row per nation
    if "lab" not in per_nation.columns:
        per_nation = pd.DataFrame(
            {"lab": pd.Series([], dtype=object),
             "revenue_x100": pd.Series([], dtype=np.int64)})
    parts = per_nation["lab"].astype(object).str.split("\x1f", expand=True)
    if len(per_nation):
        per_nation["nation"] = parts[0]
        per_nation["region"] = parts[1]
    else:
        per_nation["nation"] = pd.Series([], dtype=object)
        per_nation["region"] = pd.Series([], dtype=object)
    reg = per_nation.groupby("region")["revenue_x100"].sum()
    per_nation["region_revenue_x100"] = per_nation["region"].map(reg)
    out = per_nation.sort_values("nation", ignore_index=True)
    return pa.table(
        {
            "nation": pa.array(out["nation"], pa.string()),
            "region": pa.array(out["region"], pa.string()),
            "revenue_x100": pa.array(
                out["revenue_x100"].to_numpy(dtype=np.int64)
            ),
            "region_revenue_x100": pa.array(
                out["region_revenue_x100"].to_numpy(dtype=np.int64)
            ),
        }
    )


NATION_SHARE_SQL = """
WITH v AS (
  SELECT n.n_name AS nation, r.r_name AS region,
         CAST(ROUND(o.o_totalprice * 100, 0) AS BIGINT) AS x
  FROM orders o
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation n ON n.n_nationkey = c.c_nationkey
  JOIN region r ON r.r_regionkey = n.n_regionkey
  WHERE o.o_totalprice IS NOT NULL
), per_nation AS (
  SELECT nation, region, CAST(SUM(x) AS BIGINT) AS revenue_x100
  FROM v GROUP BY 1, 2
)
SELECT nation, region, revenue_x100,
       CAST(SUM(revenue_x100) OVER (PARTITION BY region) AS BIGINT)
         AS region_revenue_x100
FROM per_nation
"""


def register_r4ad(queries: dict, oracles: dict) -> None:
    queries.update(
        {
            "type_trigram_transitions": q_type_trigram_transitions,
            "dwell_time_per_type": q_dwell_time_per_type,
            "nation_revenue_share": q_nation_revenue_share,
        }
    )
    oracles.update(
        {
            "type_trigram_transitions": TRIGRAM_SQL,
            "dwell_time_per_type": DWELL_SQL,
            "nation_revenue_share": NATION_SHARE_SQL,
        }
    )
