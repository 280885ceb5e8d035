"""Round-4 batch BW: Simpson lexical concentration, priority x segment
chi-square contingency, and active-days-per-user quantiles.

Exactness discipline: Simpson's index folds exact integer c*(c-1)
word-collision partials with one mirrored fixed-point division;
chi-square cells evaluate the identical IEEE double expression from
exact integer marginals before one x1e6 rounding; day-count quantiles
ride the small-domain histogram rank rule.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from mimirsbrunn_ray.stages.rollup import tree_merge

_DAY_US = 86_400_000_000


def _round_half_away(x: np.ndarray) -> np.ndarray:
    return np.where(
        x >= 0, np.floor(x + 0.5), np.ceil(x - 0.5)
    ).astype(np.int64)


# ---------------------------------------------------------------------------
# Simpson lexical concentration per source
# ---------------------------------------------------------------------------


def q_simpson_diversity_per_source(sf_dir):
    """Per source: Simpson's concentration index over the word
    distribution — the probability two random tokens collide on the
    same word (1/lambda is the 'effective vocabulary' under collision
    weighting; the repeated-boilerplate twin of the Shannon
    vocab_entropy_per_source). Word counts ride the vocabulary-grain
    shuffle; the c*(c-1) collision partials stay EXACT int64 through
    both fold levels, and the single lambda division is the one
    mirrored double op per source."""
    docs = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["source", "text"]
    )

    def partial(b: pa.Table) -> pa.Table:
        b = b.filter(
            pc.and_(pc.is_valid(b["source"]), pc.is_valid(b["text"]))
        )
        words = pc.split_pattern(pc.utf8_lower(b["text"]), " ")
        n_per = pc.list_value_length(words).to_numpy(zero_copy_only=False)
        flat = pc.list_flatten(words)
        src = pa.array(
            np.repeat(b["source"].to_numpy(zero_copy_only=False), n_per)
        )
        t = pa.table({"source": src, "w": flat})
        g = t.group_by(["source", "w"]).aggregate([([], "count_all")])
        g = g.select(["source", "w", "count_all"])
        return g.rename_columns(["source", "w", "c"])

    def combine(b: pa.Table) -> pa.Table:
        g = b.group_by(["source", "w"]).aggregate([("c", "sum")])
        return g.rename_columns(["source", "w", "c"])

    vocab = tree_merge(
        docs.map_batches(partial, batch_format="pyarrow", batch_size=None),
        combine,
        final_shards=8,
        shard_cols=["source", "w"],  # global per-word counts per shard
    )

    def fold(b: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "source": pa.array([], pa.string()),
                "n_tokens": pa.array([], pa.int64()),
                "collide2": pa.array([], pa.int64()),
            }
        )
        if b.num_rows == 0 or "source" not in b.column_names:
            return empty
        c = b["c"].to_numpy(zero_copy_only=False).astype(np.int64)
        t = pa.table(
            {
                "source": b["source"],
                "n_tokens": pa.array(c),
                "collide2": pa.array(c * (c - 1)),
            }
        )
        g = t.group_by(["source"]).aggregate(
            [("n_tokens", "sum"), ("collide2", "sum")]
        )
        g = g.select(["source", "n_tokens_sum", "collide2_sum"])
        return g.rename_columns(["source", "n_tokens", "collide2"])

    def fold_combine(b: pa.Table) -> pa.Table:
        g = b.group_by(["source"]).aggregate(
            [("n_tokens", "sum"), ("collide2", "sum")]
        )
        return g.rename_columns(["source", "n_tokens", "collide2"])

    m = tree_merge(
        vocab.map_batches(fold, batch_format="pyarrow", batch_size=None),
        fold_combine,
    ).to_pandas()

    if not len(m) or "source" not in m.columns:
        return pa.table(
            {
                "source": pa.array([], pa.string()),
                "n_tokens": pa.array([], pa.int64()),
                "simpson_x1e9": pa.array([], pa.int64()),
            }
        )
    m = m.sort_values("source", ignore_index=True)
    n = m["n_tokens"].to_numpy(dtype=np.int64)
    s2 = m["collide2"].to_numpy(dtype=np.int64)
    nf = n.astype(np.float64)
    lam = np.where(
        n > 1, s2.astype(np.float64) / (nf * (nf - 1.0)), np.nan
    )
    out = np.where(
        np.isnan(lam), None, _round_half_away(np.nan_to_num(lam) * 1e9)
    )
    return pa.table(
        {
            "source": pa.array(m["source"], pa.string()),
            "n_tokens": pa.array(n),
            "simpson_x1e9": pa.array(out.tolist(), pa.int64()),
        }
    )


SIMPSON_SQL = """
WITH w AS (
  SELECT source, unnest(string_split(lower(text), ' ')) AS w
  FROM documents WHERE source IS NOT NULL AND text IS NOT NULL
), c AS (
  SELECT source, w, CAST(COUNT(*) AS BIGINT) AS c
  FROM w GROUP BY 1, 2
), s AS (
  SELECT source, CAST(SUM(c) AS BIGINT) AS n_tokens,
         CAST(SUM(c * (c - 1)) AS BIGINT) AS collide2
  FROM c GROUP BY 1
)
SELECT source, n_tokens,
       CASE WHEN n_tokens > 1
            THEN CAST(ROUND(CAST(collide2 AS DOUBLE)
                            / (CAST(n_tokens AS DOUBLE)
                               * (CAST(n_tokens AS DOUBLE) - 1.0))
                            * 1000000000, 0) AS BIGINT)
            ELSE NULL END AS simpson_x1e9
FROM s ORDER BY source
"""


# ---------------------------------------------------------------------------
# priority x market-segment chi-square contingency
# ---------------------------------------------------------------------------


def q_priority_segment_chisq(sf_dir):
    """Chi-square contingency cells for order priority x customer
    market segment — the independence test behind "do some segments
    escalate more?". The segment dimension broadcasts once per actor
    (searchsorted lookup, no shuffle); observed cell counts tree-merge
    into a bounded priorities x segments table, and expected counts /
    chi terms evaluate the identical double expression from exact
    integer marginals in both engines."""
    from mimirsbrunn_ray.stages.join import (
        broadcast_join,
        lookup_ref_from_parquet,
    )

    # budget-gated: broadcast arrays under the byte budget, None past it
    # (broadcast_join then runs the distributed left join via dim_spec)
    _dim = (f"{sf_dir}/customer.parquet", "c_custkey", "c_mktsegment")
    lookup = lookup_ref_from_parquet(*_dim)

    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_orderpriority"],
    )
    joined = broadcast_join(
        orders, lookup, "o_custkey", "segment", out_type=pa.string(),
        dim_spec=_dim,
    )

    def partial(b: pa.Table) -> pa.Table:
        b = b.filter(
            pc.and_(
                pc.is_valid(b["o_orderpriority"]),
                pc.is_valid(b["segment"]),
            )
        )
        g = b.group_by(["o_orderpriority", "segment"]).aggregate(
            [([], "count_all")]
        )
        g = g.select(["o_orderpriority", "segment", "count_all"])
        return g.rename_columns(["priority", "segment", "n"])

    def combine(b: pa.Table) -> pa.Table:
        g = b.group_by(["priority", "segment"]).aggregate([("n", "sum")])
        return g.rename_columns(["priority", "segment", "n"])

    cells = tree_merge(
        joined.map_batches(partial, batch_format="pyarrow",
                           batch_size=None),
        combine,
    ).to_pandas()  # bounded: priorities x segments

    if not len(cells) or "priority" not in cells.columns:
        return pa.table(
            {
                "priority": pa.array([], pa.string()),
                "segment": pa.array([], pa.string()),
                "n": pa.array([], pa.int64()),
                "exp_x1e6": pa.array([], pa.int64()),
                "chi_x1e6": pa.array([], pa.int64()),
            }
        )
    cells = cells.sort_values(["priority", "segment"],
                              ignore_index=True)
    n = cells["n"].to_numpy(dtype=np.int64)
    rt = cells.groupby("priority")["n"].transform("sum").to_numpy(
        dtype=np.int64
    )
    ct = cells.groupby("segment")["n"].transform("sum").to_numpy(
        dtype=np.int64
    )
    tot = float(n.sum())
    e = (rt * ct).astype(np.float64) / tot
    exp6 = _round_half_away(e * 1000000.0)
    chi6 = _round_half_away((n - e) * (n - e) / e * 1000000.0)
    return pa.table(
        {
            "priority": pa.array(cells["priority"], pa.string()),
            "segment": pa.array(cells["segment"], pa.string()),
            "n": pa.array(n),
            "exp_x1e6": pa.array(exp6),
            "chi_x1e6": pa.array(chi6),
        }
    )


CHISQ_SQL = """
WITH j AS (
  SELECT o.o_orderpriority AS priority, c.c_mktsegment AS segment
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
  WHERE o.o_orderpriority IS NOT NULL AND c.c_mktsegment IS NOT NULL
), g AS (
  SELECT priority, segment, CAST(COUNT(*) AS BIGINT) AS n
  FROM j GROUP BY 1, 2
), t AS (
  SELECT priority, segment, n,
         CAST(SUM(n) OVER (PARTITION BY priority) AS BIGINT) AS rt,
         CAST(SUM(n) OVER (PARTITION BY segment) AS BIGINT) AS ct,
         CAST(SUM(n) OVER () AS DOUBLE) AS tot
  FROM g
)
SELECT priority, segment, n,
       CAST(ROUND(CAST(rt * ct AS DOUBLE) / tot * 1000000, 0)
            AS BIGINT) AS exp_x1e6,
       CAST(ROUND((n - CAST(rt * ct AS DOUBLE) / tot)
                  * (n - CAST(rt * ct AS DOUBLE) / tot)
                  / (CAST(rt * ct AS DOUBLE) / tot) * 1000000, 0)
            AS BIGINT) AS chi_x1e6
FROM t ORDER BY priority, segment
"""


# ---------------------------------------------------------------------------
# active-days-per-user quantiles
# ---------------------------------------------------------------------------


def q_user_active_days_quantiles(sf_dir):
    """Exact p25/p50/p75/p90/max of DISTINCT ACTIVE DAYS per user —
    the stickiness distribution behind DAU/MAU-style health metrics.
    Distinct (user, day) pairs dedup inside user-disjoint hash shards
    (one shuffle); per-user day counts collapse to a small-int-domain
    histogram that rides the exact rank rule."""
    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts"]
    )

    def partial(b: pa.Table) -> pa.Table:
        b = b.filter(
            pc.and_(pc.is_valid(b["user_id"]), pc.is_valid(b["ts"]))
        )
        ts_us = b["ts"].cast(pa.timestamp("us")).cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        t = pa.table(
            {
                "user_id": b["user_id"],
                "day": pa.array(np.floor_divide(ts_us, _DAY_US)),
            }
        )
        g = t.group_by(["user_id", "day"]).aggregate([([], "count_all")])
        return g.select(["user_id", "day"])

    def dedup(b: pa.Table) -> pa.Table:
        g = b.group_by(["user_id", "day"]).aggregate([([], "count_all")])
        return g.select(["user_id", "day"])

    pairs = tree_merge(
        ev.map_batches(partial, batch_format="pyarrow", batch_size=None),
        dedup,
        final_shards=8,
        shard_cols=["user_id"],  # a user's days stay in one shard
    )

    def hist_partial(b: pa.Table) -> pa.Table:
        empty = pa.table(
            {"v": pa.array([], pa.int64()), "n": pa.array([], pa.int64())}
        )
        if b.num_rows == 0 or "user_id" not in b.column_names:
            return empty
        g = b.group_by(["user_id"]).aggregate([([], "count_all")])
        g = g.select(["count_all"]).rename_columns(["v"])
        h = g.group_by(["v"]).aggregate([([], "count_all")])
        h = h.select(["v", "count_all"])
        return h.rename_columns(["v", "n"])

    def hist_combine(b: pa.Table) -> pa.Table:
        g = b.group_by(["v"]).aggregate([("n", "sum")])
        return g.rename_columns(["v", "n"])

    hist = tree_merge(
        pairs.map_batches(hist_partial, batch_format="pyarrow",
                          batch_size=None),
        hist_combine,
    ).to_pandas()

    out = {"n_users": [0], "p25": [None], "p50": [None],
           "p75": [None], "p90": [None], "max_days": [None]}
    if len(hist):
        hist = hist.sort_values("v")
        v = hist["v"].to_numpy(dtype=np.int64)
        cum = np.cumsum(hist["n"].to_numpy(dtype=np.int64))
        total = int(cum[-1])
        out["n_users"] = [total]
        for q, col in ((0.25, "p25"), (0.5, "p50"), (0.75, "p75"),
                       (0.9, "p90")):
            rank = int(np.ceil(q * total - 1e-9))
            out[col] = [int(v[np.searchsorted(cum, rank, "left")])]
        out["max_days"] = [int(v[-1])]
    return pa.table(
        {
            "n_users": pa.array(out["n_users"], pa.int64()),
            "p25": pa.array(out["p25"], pa.int64()),
            "p50": pa.array(out["p50"], pa.int64()),
            "p75": pa.array(out["p75"], pa.int64()),
            "p90": pa.array(out["p90"], pa.int64()),
            "max_days": pa.array(out["max_days"], pa.int64()),
        }
    )


ACTIVE_DAYS_SQL = """
WITH p AS (
  SELECT DISTINCT user_id,
         CAST(FLOOR(epoch(ts) / 86400) AS BIGINT) AS day
  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
), u AS (
  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n FROM p GROUP BY 1
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
       CAST(quantile_disc(n, 0.25) AS BIGINT) AS p25,
       CAST(quantile_disc(n, 0.5) AS BIGINT) AS p50,
       CAST(quantile_disc(n, 0.75) AS BIGINT) AS p75,
       CAST(quantile_disc(n, 0.9) AS BIGINT) AS p90,
       CAST(MAX(n) AS BIGINT) AS max_days
FROM u
"""


def register_r4bw(queries: dict, oracles: dict) -> None:
    queries.update(
        {
            "simpson_diversity_per_source": q_simpson_diversity_per_source,
            "priority_segment_chisq": q_priority_segment_chisq,
            "user_active_days_quantiles": q_user_active_days_quantiles,
        }
    )
    oracles.update(
        {
            "simpson_diversity_per_source": SIMPSON_SQL,
            "priority_segment_chisq": CHISQ_SQL,
            "user_active_days_quantiles": ACTIVE_DAYS_SQL,
        }
    )
