"""Round-4 batch Y: per-document vocabulary stats, single-mode users,
and month-over-month revenue.

Exactness discipline: distinct-word counts are exact set cardinalities
computed batch-locally (a document lives wholly inside its batch);
revenue quantizes x100 per order row before any sum; previous-month
attachment is an exact integer month-index shift.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from mimirsbrunn_ray.stages.rollup import tree_merge


def _not_null(b: pa.Table, cols) -> pa.Table:
    m = None
    for c in cols:
        v = pc.is_valid(b[c])
        m = v if m is None else pc.and_(m, v)
    return b.filter(m)


def _round_half_away(x: np.ndarray) -> np.ndarray:
    return np.where(
        x >= 0, np.floor(x + 0.5), np.ceil(x - 0.5)
    ).astype(np.int64)


# ---------------------------------------------------------------------------
# per-document vocabulary stats
# ---------------------------------------------------------------------------


def q_doc_vocab_stats(sf_dir):
    """Per document: word count and DISTINCT word count over the
    lowercase whitespace tokens — the per-row vocabulary-richness
    signal (n_unique / n_words is the type-token ratio). Zero shuffles:
    each document is wholly inside its batch, so one vectorized
    map_batches (CSR segment ids + a batch-local pandas distinct)
    emits final rows."""
    docs = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )

    def batch(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_valid(b["doc_id"]))
        empty = pa.table(
            {
                "doc_id": pa.array([], b["doc_id"].type if b.num_rows
                                   else pa.string()),
                "n_words": pa.array([], pa.int64()),
                "n_unique_words": pa.array([], pa.int64()),
            }
        )
        if b.num_rows == 0:
            return empty
        words = pc.split_pattern(
            pc.utf8_lower(pc.fill_null(b["text"], "")), " "
        )
        n_per = pc.list_value_length(words).to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        flat = pc.list_flatten(words).to_numpy(zero_copy_only=False)
        seg = np.repeat(np.arange(len(b)), n_per)
        uniq = (
            pd.DataFrame({"seg": seg, "w": flat})
            .drop_duplicates()
            .groupby("seg", sort=False)
            .size()
        )
        n_uniq = np.zeros(len(b), dtype=np.int64)
        n_uniq[uniq.index.to_numpy()] = uniq.to_numpy(dtype=np.int64)
        return pa.table(
            {
                "doc_id": b["doc_id"],
                "n_words": pa.array(n_per),
                "n_unique_words": pa.array(n_uniq),
            }
        )

    return docs.map_batches(batch, batch_format="pyarrow", batch_size=None)


DOC_VOCAB_SQL = """
WITH w AS (
  SELECT doc_id,
         unnest(string_split(lower(COALESCE(text, '')), ' ')) AS word
  FROM documents WHERE doc_id IS NOT NULL
)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_words,
       CAST(COUNT(DISTINCT word) AS BIGINT) AS n_unique_words
FROM w GROUP BY 1
"""


# ---------------------------------------------------------------------------
# single-mode users per event type
# ---------------------------------------------------------------------------


def q_single_mode_users(sf_dir):
    """Per event type: how many users emit ONLY that type (single-mode
    audiences), alongside the type's total distinct users — the
    exclusivity readout next to the audience-overlap Jaccard table.
    Batch-local distinct (user, type), one combiner-first merge keyed
    on user (a user's distinct-type row count decides exclusivity),
    then a types-bounded count."""
    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "event_type"]
    )

    def partial(b: pa.Table) -> pa.Table:
        b = _not_null(b, ("user_id", "event_type"))
        return b.group_by(["user_id", "event_type"]).aggregate([])

    def combine(b: pa.Table) -> pa.Table:
        return b.group_by(["user_id", "event_type"]).aggregate([])

    pairs = tree_merge(
        ev.map_batches(partial, batch_format="pyarrow", batch_size=None),
        combine,
        final_shards=8,
        shard_cols=["user_id"],  # a user's pair rows land in ONE shard
    )

    def per_shard(b: pa.Table) -> pa.Table:
        # shard holds every (user, type) pair of its users -> per-user
        # type counts are final here
        df = pd.DataFrame(
            {
                "u": b["user_id"].to_numpy(zero_copy_only=False),
                "t": b["event_type"].to_numpy(zero_copy_only=False),
            }
        )
        k = df.groupby("u", sort=False)["t"].transform("size").to_numpy()
        t = pd.DataFrame(
            {
                "event_type": df["t"].to_numpy(),
                "one": np.ones(len(df), dtype=np.int64),
                "solo": (k == 1).astype(np.int64),
            }
        )
        agg = t.groupby("event_type", sort=False, as_index=False).agg(
            n_users=("one", "sum"), n_single_mode=("solo", "sum")
        )
        for c in ("n_users", "n_single_mode"):
            agg[c] = agg[c].astype(np.int64)
        return pa.Table.from_pandas(agg, preserve_index=False)

    def combine_t(b: pa.Table) -> pa.Table:
        g = b.group_by(["event_type"]).aggregate(
            [("n_users", "sum"), ("n_single_mode", "sum")]
        )
        g = g.select(["event_type", "n_users_sum", "n_single_mode_sum"])
        return g.rename_columns(["event_type", "n_users", "n_single_mode"])

    out = tree_merge(
        pairs.map_batches(per_shard, batch_format="pyarrow",
                          batch_size=None),
        combine_t,
    )

    def finish(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_type": b["event_type"],
                "n_users": b["n_users"].cast(pa.int64()),
                "n_single_mode": b["n_single_mode"].cast(pa.int64()),
            }
        )

    return out.map_batches(finish, batch_format="pyarrow", batch_size=None)


SINGLE_MODE_SQL = """
WITH p AS (
  SELECT DISTINCT user_id, event_type FROM events
  WHERE user_id IS NOT NULL AND event_type IS NOT NULL
), k AS (
  SELECT user_id, COUNT(*) AS n_types FROM p GROUP BY 1
)
SELECT p.event_type,
       CAST(COUNT(*) AS BIGINT) AS n_users,
       CAST(SUM(CASE WHEN k.n_types = 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_single_mode
FROM p JOIN k USING (user_id)
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# month-over-month revenue
# ---------------------------------------------------------------------------


def q_monthly_revenue_growth(sf_dir):
    """Per order month: exact x100 revenue, order count, and the
    PREVIOUS month's revenue (0 when the prior month index is absent) —
    the growth table a finance dashboard charts. Month index is the
    exact integer year*12 + (month-1); months are bounded, so the
    prev-month attachment is a dictionary probe on the final block."""
    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderdate", "o_totalprice"]
    )

    def partial(b: pa.Table) -> pa.Table:
        b = _not_null(b, ("o_orderdate", "o_totalprice"))
        od = b["o_orderdate"].cast(pa.timestamp("us"))
        mi = pc.add(
            pc.multiply(pc.cast(pc.year(od), pa.int64()), 12),
            pc.subtract(pc.cast(pc.month(od), pa.int64()), 1),
        )
        x = _round_half_away(
            b["o_totalprice"].to_numpy(zero_copy_only=False).astype(
                np.float64
            )
            * 100.0
        )
        t = pa.table(
            {
                "m": mi,
                "one": pa.array(np.ones(len(x), dtype=np.int64)),
                "r": pa.array(x),
            }
        )
        g = t.group_by(["m"]).aggregate([("one", "sum"), ("r", "sum")])
        g = g.select(["m", "one_sum", "r_sum"])
        return g.rename_columns(["m", "n", "r"])

    def combine(b: pa.Table) -> pa.Table:
        g = b.group_by(["m"]).aggregate([("n", "sum"), ("r", "sum")])
        return g.select(["m", "n_sum", "r_sum"]).rename_columns(
            ["m", "n", "r"]
        )

    months = tree_merge(
        orders.map_batches(partial, batch_format="pyarrow", batch_size=None),
        combine,
    ).to_pandas()  # bounded: one row per month
    if "m" not in months.columns:  # fully-empty input short-circuit
        months = pd.DataFrame({"m": [], "n": [], "r": []})
    months = months.sort_values("m", ignore_index=True)
    m = months["m"].to_numpy(dtype=np.int64)
    r = months["r"].to_numpy(dtype=np.int64)
    n = months["n"].to_numpy(dtype=np.int64)
    rmap = dict(zip(m, r))
    prev = np.array([rmap.get(int(x) - 1, 0) for x in m], dtype=np.int64)
    return pa.table(
        {
            "month_idx": pa.array(m),
            "n_orders": pa.array(n),
            "revenue_x100": pa.array(r),
            "prev_revenue_x100": pa.array(prev),
        }
    )


MONTHLY_REV_SQL = """
WITH v AS (
  SELECT CAST(year(o_orderdate) * 12 + month(o_orderdate) - 1 AS BIGINT)
           AS m,
         CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS x
  FROM orders
  WHERE o_orderdate IS NOT NULL AND o_totalprice IS NOT NULL
), mo AS (
  SELECT m, CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(x) AS BIGINT) AS r
  FROM v GROUP BY 1
)
SELECT a.m AS month_idx,
       a.n AS n_orders,
       a.r AS revenue_x100,
       CAST(COALESCE(b.r, 0) AS BIGINT) AS prev_revenue_x100
FROM mo a LEFT JOIN mo b ON b.m = a.m - 1
"""


def register_r4y(queries: dict, oracles: dict) -> None:
    queries.update(
        {
            "doc_vocab_stats": q_doc_vocab_stats,
            "single_mode_users": q_single_mode_users,
            "monthly_revenue_growth": q_monthly_revenue_growth,
        }
    )
    oracles.update(
        {
            "doc_vocab_stats": DOC_VOCAB_SQL,
            "single_mode_users": SINGLE_MODE_SQL,
            "monthly_revenue_growth": MONTHLY_REV_SQL,
        }
    )
