"""Round-4 batch BH: ABC inventory classification, max value swings,
and per-source vocabulary entropy.

Exactness discipline: ABC class boundaries are integer cross-products
(5*cum >= 4*total and 20*cum >= 19*total) over descending part
revenue; swings are exact cents differences; vocabulary entropy rides
ln parity over exact token counts, rounded once.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from mimirsbrunn_ray.stages.rollup import tree_merge


def _round_half_away(x: np.ndarray) -> np.ndarray:
    return np.where(
        x >= 0, np.floor(x + 0.5), np.ceil(x - 0.5)
    ).astype(np.int64)


# ---------------------------------------------------------------------------
# ABC classification of parts by revenue
# ---------------------------------------------------------------------------


def q_abc_classification_parts(sf_dir):
    """ABC inventory classification: parts ranked by extended-price
    revenue descending — class A carries the first 80% of revenue,
    B the next 15% (to 95%), C the tail; boundaries are the integer
    cross-products 5*cum >= 4*total and 20*cum >= 19*total evaluated
    on the running sum (rank order: revenue DESC, partkey — tied parts
    contribute equal amounts so class counts are tie-order free only
    within equal-revenue runs, which the deterministic tiebreak
    resolves identically in both engines). Output: per class, part
    count and revenue. Per-part totals from key-disjoint shards; the
    walk runs over the bounded revenue histogram with exact tie-group
    splitting."""
    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_extendedprice"],
    )

    def partial(b: pa.Table) -> pa.Table:
        b = b.filter(
            pc.and_(
                pc.is_valid(b["l_partkey"]),
                pc.is_valid(b["l_extendedprice"]),
            )
        )
        x = _round_half_away(
            b["l_extendedprice"].cast(pa.float64()).to_numpy(
                zero_copy_only=False
            )
            * 100.0
        )
        t = pa.table({"l_partkey": b["l_partkey"], "x": pa.array(x)})
        g = t.group_by(["l_partkey"]).aggregate([("x", "sum")])
        g = g.select(["l_partkey", "x_sum"])
        return g.rename_columns(["l_partkey", "v"])

    def part_combine(b: pa.Table) -> pa.Table:
        g = b.group_by(["l_partkey"]).aggregate([("v", "sum")])
        return g.rename_columns(["l_partkey", "v"])

    totals = tree_merge(
        li.map_batches(partial, batch_format="pyarrow", batch_size=None),
        part_combine,
        final_shards=8,
        shard_cols=["l_partkey"],
    )

    def hist_partial(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "v" not in b.column_names:
            return pa.table(
                {"v": pa.array([], pa.int64()),
                 "c": pa.array([], pa.int64())}
            )
        g = b.group_by(["v"]).aggregate([([], "count_all")])
        g = g.select(["v", "count_all"])
        return g.rename_columns(["v", "c"])

    def hist_combine(b: pa.Table) -> pa.Table:
        g = b.group_by(["v"]).aggregate([("c", "sum")])
        return g.rename_columns(["v", "c"])

    hist = tree_merge(
        totals.map_batches(hist_partial, batch_format="pyarrow",
                           batch_size=None),
        hist_combine,
    ).to_pandas()  # bounded: distinct part revenue levels

    rows = {"abc_class": [], "n_parts": [], "revenue_x100": []}
    if len(hist):
        hist = hist.sort_values("v", ascending=False)
        v = hist["v"].to_numpy(dtype=np.int64)
        c = hist["c"].to_numpy(dtype=np.int64)
        total = int(np.dot(v, c))
        counts = {"A": 0, "B": 0, "C": 0}
        revs = {"A": 0, "B": 0, "C": 0}
        cum = 0
        for vi, ci in zip(v, c):
            for _ in range(int(ci)):
                new_cum = cum + int(vi)
                if 5 * cum < 4 * total:  # still filling A
                    cls = "A"
                elif 20 * cum < 19 * total:  # filling B
                    cls = "B"
                else:
                    cls = "C"
                counts[cls] += 1
                revs[cls] += int(vi)
                cum = new_cum
        for cls in ("A", "B", "C"):
            rows["abc_class"].append(cls)
            rows["n_parts"].append(counts[cls])
            rows["revenue_x100"].append(revs[cls])
    return pa.table(
        {
            "abc_class": pa.array(rows["abc_class"], pa.string()),
            "n_parts": pa.array(rows["n_parts"], pa.int64()),
            "revenue_x100": pa.array(rows["revenue_x100"], pa.int64()),
        }
    )


ABC_SQL = """
WITH pt AS (
  SELECT l_partkey,
         CAST(SUM(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT))
              AS BIGINT) AS v
  FROM lineitem
  WHERE l_partkey IS NOT NULL AND l_extendedprice IS NOT NULL
  GROUP BY 1
), r AS (
  SELECT v,
         CAST(COALESCE(SUM(v) OVER (ORDER BY v DESC, l_partkey
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS BIGINT) AS cum_before,
         CAST(SUM(v) OVER () AS BIGINT) AS total
  FROM pt
)
SELECT CASE WHEN 5 * cum_before < 4 * total THEN 'A'
            WHEN 20 * cum_before < 19 * total THEN 'B'
            ELSE 'C' END AS abc_class,
       CAST(COUNT(*) AS BIGINT) AS n_parts,
       CAST(SUM(v) AS BIGINT) AS revenue_x100
FROM r GROUP BY 1
"""


# ---------------------------------------------------------------------------
# max consecutive value swing per user (top 10)
# ---------------------------------------------------------------------------

_SWING_TOPK = 10


def q_max_value_swing_users(sf_dir):
    """The `_SWING_TOPK` users with the largest absolute cents jump
    between CONSECUTIVE events — the volatility outlier list (a sudden
    value spike inside one user's stream usually means an instrumented
    retry or a unit bug). One user hash-bucket shuffle; per-series
    vectorized diffs; top-k over complete per-user maxima (users are
    bucket-local, so maxima are final before the cut)."""
    from mimirsbrunn_ray.stages.dedup import _BUCKET
    from mimirsbrunn_ray.stages.timeseries import (
        _project_series,
        _series_segments,
    )

    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "ts", "event_id", "value"],
    )
    proj = _project_series(ev, "user_id", "ts", "event_id", "value", 64)
    order = [("max_swing_x100", "descending"), ("user_id", "ascending")]

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "user_id": pd.Series([], dtype=np.int64),
                "max_swing_x100": pd.Series([], dtype=np.int64),
            }
        )
        if len(g) == 0:
            return empty
        g, same = _series_segments(g, "user_id", "ts", "event_id")
        x = _round_half_away(
            g["value"].to_numpy(dtype=np.float64) * 100.0
        )
        idx = np.nonzero(same)[0]
        if len(idx) == 0:
            return empty
        sw = np.abs(x[idx] - x[idx - 1])
        df = pd.DataFrame(
            {"user_id": g["user_id"].to_numpy()[idx], "sw": sw}
        )
        agg = df.groupby("user_id")["sw"].max().reset_index()
        agg.columns = ["user_id", "max_swing_x100"]
        agg["user_id"] = agg["user_id"].astype(np.int64)
        agg["max_swing_x100"] = agg["max_swing_x100"].astype(np.int64)
        # complete per-user maxima (users never span buckets): safe prune
        return agg.sort_values(
            ["max_swing_x100", "user_id"], ascending=[False, True],
            ignore_index=True,
        ).head(_SWING_TOPK)

    partials = proj.groupby(_BUCKET).map_groups(
        per_bucket, batch_format="pandas"
    )

    def topk(b: pa.Table) -> pa.Table:
        return b.sort_by(order).slice(0, _SWING_TOPK)

    return tree_merge(partials, topk)


SWING_SQL = f"""
WITH s AS (
  SELECT user_id,
         ABS(CAST(ROUND(value * 100, 0) AS BIGINT)
             - CAST(ROUND(LAG(value) OVER (
                 PARTITION BY user_id ORDER BY ts, event_id) * 100, 0)
                    AS BIGINT)) AS sw
  FROM events
  WHERE user_id IS NOT NULL AND ts IS NOT NULL AND value IS NOT NULL
)
SELECT user_id, CAST(MAX(sw) AS BIGINT) AS max_swing_x100
FROM s WHERE sw IS NOT NULL
GROUP BY 1
ORDER BY max_swing_x100 DESC, user_id
LIMIT {_SWING_TOPK}
"""


# ---------------------------------------------------------------------------
# vocabulary entropy per source
# ---------------------------------------------------------------------------


def q_vocab_entropy_per_source(sf_dir):
    """Per source: token count and the Shannon entropy of its word
    distribution in fixed-point micro-nats — exp(H) is the 'effective
    vocabulary size' (the perplexity of the source's own unigram LM),
    the lexical-diversity metric a mixture designer balances. Word
    counts ride the vocabulary-grain shuffle (min-df caveat for open
    vocabularies); the entropy is one identical double expression per
    source over exact integers."""
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
        shard_cols=["source", "w"],
    )

    def fold(b: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "source": pa.array([], pa.string()),
                "n_tokens": pa.array([], pa.int64()),
                "plogp_num": pa.array([], pa.float64()),
            }
        )
        if b.num_rows == 0 or "source" not in b.column_names:
            return empty
        # partial per shard: sum of c*ln(c) and token counts; H =
        # ln(N) - sum(c ln c)/N is computed once per source at the end
        c = b["c"].to_numpy(zero_copy_only=False).astype(np.float64)
        t = pa.table(
            {
                "source": b["source"],
                "n_tokens": b["c"].cast(pa.int64()),
                "plogp_num": pa.array(c * np.log(c)),
            }
        )
        g = t.group_by(["source"]).aggregate(
            [("n_tokens", "sum"), ("plogp_num", "sum")]
        )
        g = g.select(["source", "n_tokens_sum", "plogp_num_sum"])
        return g.rename_columns(["source", "n_tokens", "plogp_num"])

    def fold_combine(b: pa.Table) -> pa.Table:
        g = b.group_by(["source"]).aggregate(
            [("n_tokens", "sum"), ("plogp_num", "sum")]
        )
        return g.rename_columns(["source", "n_tokens", "plogp_num"])

    m = tree_merge(
        vocab.map_batches(fold, batch_format="pyarrow", batch_size=None),
        fold_combine,
    ).to_pandas()
    from mimirsbrunn_ray.stages.broadcast import ensure_cols

    m = ensure_cols(m, ["source"]).sort_values(
        "source", ignore_index=True)

    if not len(m):
        return pa.table(
            {
                "source": pa.array([], pa.string()),
                "n_tokens": pa.array([], pa.int64()),
                "entropy_x1e6": pa.array([], pa.int64()),
            }
        )
    n = m["n_tokens"].to_numpy(dtype=np.float64)
    plogp = m["plogp_num"].to_numpy(dtype=np.float64)
    h = np.log(n) - plogp / n
    return pa.table(
        {
            "source": pa.array(m["source"], pa.string()),
            "n_tokens": pa.array(
                m["n_tokens"].to_numpy(dtype=np.int64)
            ),
            "entropy_x1e6": pa.array(_round_half_away(h * 1e6)),
        }
    )


VOCAB_ENTROPY_SQL = """
WITH w AS (
  SELECT source, unnest(string_split(lower(text), ' ')) AS w
  FROM documents WHERE source IS NOT NULL AND text IS NOT NULL
), c AS (
  SELECT source, w, CAST(COUNT(*) AS BIGINT) AS c
  FROM w GROUP BY 1, 2
), s AS (
  SELECT source, CAST(SUM(c) AS BIGINT) AS n_tokens,
         SUM(c * 1.0 * LN(CAST(c AS DOUBLE))) AS plogp
  FROM c GROUP BY 1
)
SELECT source, n_tokens,
       CAST(ROUND((LN(CAST(n_tokens AS DOUBLE))
                   - plogp / n_tokens) * 1000000, 0) AS BIGINT)
         AS entropy_x1e6
FROM s
"""


def register_r4bh(queries: dict, oracles: dict) -> None:
    queries.update(
        {
            "abc_classification_parts": q_abc_classification_parts,
            "max_value_swing_users": q_max_value_swing_users,
            "vocab_entropy_per_source": q_vocab_entropy_per_source,
        }
    )
    oracles.update(
        {
            "abc_classification_parts": ABC_SQL,
            "max_value_swing_users": SWING_SQL,
            "vocab_entropy_per_source": VOCAB_ENTROPY_SQL,
        }
    )
