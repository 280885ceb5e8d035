"""Round-4 batch BT: orders-per-customer quantiles, vocabulary
coverage curve, and max active-hour streaks.

Exactness discipline: count quantiles ride the small-domain histogram
rank rule; vocabulary coverage is an exact descending cumulative walk
with deterministic (count DESC, word ASC) order; streaks are integer
runs over the bounded hourly grid.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from mimirsbrunn_ray.stages.rollup import tree_merge

_HOUR_US = 3_600_000_000


# ---------------------------------------------------------------------------
# orders-per-customer quantiles
# ---------------------------------------------------------------------------


def q_orders_per_customer_quantiles(sf_dir):
    """Exact p50/p90/p99/max of ORDERS PER CUSTOMER — the engagement
    skew of the commercial base. Per-customer counts from key-disjoint
    shards feed the small-int-domain histogram rank rule."""
    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey"]
    )

    def partial(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_valid(b["o_custkey"]))
        g = b.group_by(["o_custkey"]).aggregate([([], "count_all")])
        g = g.select(["o_custkey", "count_all"])
        return g.rename_columns(["o_custkey", "c"])

    def cust_combine(b: pa.Table) -> pa.Table:
        g = b.group_by(["o_custkey"]).aggregate([("c", "sum")])
        return g.rename_columns(["o_custkey", "c"])

    totals = tree_merge(
        orders.map_batches(partial, batch_format="pyarrow",
                           batch_size=None),
        cust_combine,
        final_shards=8,
        shard_cols=["o_custkey"],
    )

    def hist_partial(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "c" not in b.column_names:
            return pa.table(
                {"v": pa.array([], pa.int64()),
                 "n": pa.array([], pa.int64())}
            )
        g = b.group_by(["c"]).aggregate([([], "count_all")])
        g = g.select(["c", "count_all"])
        return g.rename_columns(["v", "n"])

    def hist_combine(b: pa.Table) -> pa.Table:
        g = b.group_by(["v"]).aggregate([("n", "sum")])
        return g.rename_columns(["v", "n"])

    hist = tree_merge(
        totals.map_batches(hist_partial, batch_format="pyarrow",
                           batch_size=None),
        hist_combine,
    ).to_pandas()

    out = {"n_customers": [0], "p50": [None], "p90": [None],
           "p99": [None], "max": [None]}
    if len(hist):
        hist = hist.sort_values("v")
        v = hist["v"].to_numpy(dtype=np.int64)
        cum = np.cumsum(hist["n"].to_numpy(dtype=np.int64))
        total = int(cum[-1])
        out["n_customers"] = [total]
        for q, col in ((0.5, "p50"), (0.9, "p90"), (0.99, "p99")):
            rank = int(np.ceil(q * total - 1e-9))
            out[col] = [int(v[np.searchsorted(cum, rank, "left")])]
        out["max"] = [int(v[-1])]
    return pa.table(
        {
            "n_customers": pa.array(out["n_customers"], pa.int64()),
            "p50": pa.array(out["p50"], pa.int64()),
            "p90": pa.array(out["p90"], pa.int64()),
            "p99": pa.array(out["p99"], pa.int64()),
            "max": pa.array(out["max"], pa.int64()),
        }
    )


ORDERS_PER_CUST_SQL = """
WITH c AS (
  SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n
  FROM orders WHERE o_custkey IS NOT NULL GROUP BY 1
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_customers,
       CAST(quantile_disc(n, 0.5) AS BIGINT) AS p50,
       CAST(quantile_disc(n, 0.9) AS BIGINT) AS p90,
       CAST(quantile_disc(n, 0.99) AS BIGINT) AS p99,
       CAST(MAX(n) AS BIGINT) AS max
FROM c
"""


# ---------------------------------------------------------------------------
# vocabulary coverage curve
# ---------------------------------------------------------------------------

_COVERAGE_KS = (10, 100, 1000)


def q_vocab_coverage_curve(sf_dir):
    """Token coverage of the top-k vocabulary for k = 10/100/1000 — the
    curve a tokenizer designer reads to size a vocab (how much of the
    stream do the k most frequent words absorb?). Word counts ride the
    vocabulary-grain shuffle; the exact cumulative walk orders by
    (count DESC, word ASC) identically in both engines."""
    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])

    def partial(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_valid(b["text"]))
        words = pc.split_pattern(pc.utf8_lower(b["text"]), " ")
        flat = pc.list_flatten(words)
        t = pa.table({"w": flat})
        g = t.group_by(["w"]).aggregate([([], "count_all")])
        g = g.select(["w", "count_all"])
        return g.rename_columns(["w", "c"])

    def combine(b: pa.Table) -> pa.Table:
        g = b.group_by(["w"]).aggregate([("c", "sum")])
        return g.rename_columns(["w", "c"])

    vocab = tree_merge(
        docs.map_batches(partial, batch_format="pyarrow", batch_size=None),
        combine,
    ).to_pandas()  # bounded: vocabulary (min-df caveat for open vocabs)

    rows = {"k": [], "covered_tokens": [], "total_tokens": []}
    if len(vocab):
        vocab = vocab.sort_values(
            ["c", "w"], ascending=[False, True], ignore_index=True
        )
        c = vocab["c"].to_numpy(dtype=np.int64)
        cum = np.cumsum(c)
        total = int(cum[-1])
        for k in _COVERAGE_KS:
            rows["k"].append(k)
            rows["covered_tokens"].append(
                int(cum[min(k, len(cum)) - 1]) if len(cum) else 0
            )
            rows["total_tokens"].append(total)
    return pa.table(
        {
            "k": pa.array(rows["k"], pa.int64()),
            "covered_tokens": pa.array(rows["covered_tokens"], pa.int64()),
            "total_tokens": pa.array(rows["total_tokens"], pa.int64()),
        }
    )


def _coverage_sql(ks) -> str:
    k_rows = ", ".join(f"({k})" for k in ks)
    return f"""
WITH w AS (
  SELECT unnest(string_split(lower(text), ' ')) AS w
  FROM documents WHERE text IS NOT NULL
), c AS (
  SELECT w, CAST(COUNT(*) AS BIGINT) AS c FROM w GROUP BY 1
), r AS (
  SELECT c,
         CAST(ROW_NUMBER() OVER (ORDER BY c DESC, w) AS BIGINT) AS rk,
         CAST(SUM(c) OVER (ORDER BY c DESC, w) AS BIGINT) AS cum,
         CAST(SUM(c) OVER () AS BIGINT) AS total
  FROM c
), ks(k) AS (VALUES {k_rows})
SELECT CAST(ks.k AS BIGINT) AS k,
       CAST(MAX(CASE WHEN r.rk <= ks.k THEN r.cum END) AS BIGINT)
         AS covered_tokens,
       CAST(MAX(r.total) AS BIGINT) AS total_tokens
FROM ks CROSS JOIN r
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# longest consecutive active-hour streak per type
# ---------------------------------------------------------------------------


def q_max_active_hour_streak_per_type(sf_dir):
    """Per event type: the longest run of CONSECUTIVE active hours —
    uptime-style continuity of each signal. One bounded (type, hour)
    presence pass; the run scan (gaps-and-islands on the integer hour
    sequence) walks the bounded grid."""
    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "ts"]
    )

    def partial(b: pa.Table) -> pa.Table:
        b = b.filter(
            pc.and_(pc.is_valid(b["event_type"]), pc.is_valid(b["ts"]))
        )
        ts_us = b["ts"].cast(pa.timestamp("us")).cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        hr = np.floor_divide(ts_us, _HOUR_US)
        t = pa.table({"event_type": b["event_type"], "hr": pa.array(hr)})
        g = t.group_by(["event_type", "hr"]).aggregate([([], "count_all")])
        return g.select(["event_type", "hr"])

    def combine(b: pa.Table) -> pa.Table:
        g = b.group_by(["event_type", "hr"]).aggregate([([], "count_all")])
        return g.select(["event_type", "hr"])

    grid = tree_merge(
        ev.map_batches(partial, batch_format="pyarrow", batch_size=None),
        combine,
    ).to_pandas()

    rows = {"event_type": [], "n_active_hours": [], "max_streak": []}
    if len(grid):
        for et, g in grid.groupby("event_type", sort=True):
            hr = np.sort(g["hr"].unique()).astype(np.int64)
            if not len(hr):
                continue
            brk = np.concatenate(([True], np.diff(hr) != 1))
            run_id = np.cumsum(brk)
            _, counts = np.unique(run_id, return_counts=True)
            rows["event_type"].append(et)
            rows["n_active_hours"].append(len(hr))
            rows["max_streak"].append(int(counts.max()))
    return pa.table(
        {
            "event_type": pa.array(rows["event_type"], pa.string()),
            "n_active_hours": pa.array(
                rows["n_active_hours"], pa.int64()
            ),
            "max_streak": pa.array(rows["max_streak"], pa.int64()),
        }
    )


HOUR_STREAK_SQL = """
WITH m AS (
  SELECT DISTINCT event_type,
         CAST(FLOOR(epoch(ts) / 3600) AS BIGINT) AS hr
  FROM events
  WHERE event_type IS NOT NULL AND ts IS NOT NULL
), g AS (
  SELECT event_type, hr,
         hr - CAST(ROW_NUMBER() OVER (PARTITION BY event_type
                                      ORDER BY hr) AS BIGINT) AS grp
  FROM m
), runs AS (
  SELECT event_type, grp, CAST(COUNT(*) AS BIGINT) AS run_len
  FROM g GROUP BY 1, 2
)
SELECT event_type,
       CAST(SUM(run_len) AS BIGINT) AS n_active_hours,
       CAST(MAX(run_len) AS BIGINT) AS max_streak
FROM runs GROUP BY 1
"""


def register_r4bt(queries: dict, oracles: dict) -> None:
    queries.update(
        {
            "orders_per_customer_quantiles":
                q_orders_per_customer_quantiles,
            "vocab_coverage_curve": q_vocab_coverage_curve,
            "max_active_hour_streak_per_type":
                q_max_active_hour_streak_per_type,
        }
    )
    oracles.update(
        {
            "orders_per_customer_quantiles": ORDERS_PER_CUST_SQL,
            "vocab_coverage_curve": _coverage_sql(_COVERAGE_KS),
            "max_active_hour_streak_per_type": HOUR_STREAK_SQL,
        }
    )
