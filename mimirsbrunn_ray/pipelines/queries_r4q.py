"""Round-4 batch Q: cumulative user adoption curve, per-source top word
bigrams, and MASE forecast-error sufficient statistics.

Exactness discipline: counts and epoch-day/hour ints only; hourly means
snap once from exact integer sums (int sum -> one float division ->
ROUND half away), so both engines difference identical integers.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from mimirsbrunn_ray.functions.timeutil import trunc_us, ts_array
from mimirsbrunn_ray.stages.dedup import _BUCKET, add_bucket
from mimirsbrunn_ray.stages.rollup import tree_merge

_HOUR_US = 3_600_000_000


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
# cumulative adoption curve (daily new + cumulative distinct users)
# ---------------------------------------------------------------------------


def q_user_cumulative_adoption(sf_dir):
    """Daily adoption curve: per day, the number of first-seen users and
    the cumulative distinct-user count to date — the growth chart every
    ingest dashboard opens with. Scale shape: per-user MIN(ts) partials
    (user-sharded tree merge, the user dimension never sits in one
    block) collapse to days-bounded counts; the cumulative prefix sum
    runs on that bounded final block."""
    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts"]
    )

    def partial(b: pa.Table) -> pa.Table:
        b = _not_null(b, ("user_id", "ts"))
        t = pa.table(
            {
                "user_id": b["user_id"],
                "us": b["ts"].cast(pa.timestamp("us")).cast(pa.int64()),
            }
        )
        g = t.group_by(["user_id"]).aggregate([("us", "min")])
        return g.select(["user_id", "us_min"]).rename_columns(
            ["user_id", "us"]
        )

    def combine(b: pa.Table) -> pa.Table:
        g = b.group_by(["user_id"]).aggregate([("us", "min")])
        return g.select(["user_id", "us_min"]).rename_columns(
            ["user_id", "us"]
        )

    first = tree_merge(
        ev.map_batches(partial, batch_format="pyarrow", batch_size=None),
        combine,
        final_shards=8,
        shard_cols=["user_id"],
    )

    def per_day(b: pa.Table) -> pa.Table:
        us = b["us"].to_numpy(zero_copy_only=False).astype(np.int64)
        t = pa.table({"d": pa.array(trunc_us(us, "1d"))})
        g = t.group_by(["d"]).aggregate([([], "count_all")])
        return g.select(["d", "count_all"]).rename_columns(["d", "n"])

    def combine_d(b: pa.Table) -> pa.Table:
        g = b.group_by(["d"]).aggregate([("n", "sum")])
        return g.select(["d", "n_sum"]).rename_columns(["d", "n"])

    days = tree_merge(
        first.map_batches(per_day, batch_format="pyarrow", batch_size=None),
        combine_d,
    ).to_pandas()  # bounded: one row per day in the ingest window
    if "d" not in days.columns:  # fully-empty input short-circuit
        days = pd.DataFrame({"d": [], "n": []})
    days = days.sort_values("d", ignore_index=True)
    n = days["n"].to_numpy(dtype=np.int64) if len(days) else np.array(
        [], dtype=np.int64
    )
    d = days["d"].to_numpy(dtype=np.int64) if len(days) else np.array(
        [], dtype=np.int64
    )
    return pa.table(
        {
            "bucket": ts_array(d),
            "n_new_users": pa.array(n),
            "n_cum_users": pa.array(np.cumsum(n).astype(np.int64)),
        }
    )


ADOPTION_SQL = """
WITH f AS (
  SELECT user_id, MIN(date_trunc('day', ts)) AS fd
  FROM events
  WHERE user_id IS NOT NULL AND ts IS NOT NULL
  GROUP BY 1
), d AS (
  SELECT fd, CAST(COUNT(*) AS BIGINT) AS n FROM f GROUP BY 1
)
SELECT fd AS bucket,
       n AS n_new_users,
       CAST(SUM(n) OVER (ORDER BY fd
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         AS n_cum_users
FROM d
"""


# ---------------------------------------------------------------------------
# top word bigrams per source
# ---------------------------------------------------------------------------


def q_word_bigram_top_per_source(sf_dir):
    """Per source: the 3 most frequent word bigrams (count desc, bigram
    asc on ties) — the collocation signal a corpus profile reports
    (boilerplate headers and templated text surface instantly). Bigrams
    materialize per batch with zero Python loops (CSR gather over the
    split-word values, one binary_join_element_wise), collapse to
    batch-local (source, bigram) counts, tree-merge key-sharded, and
    rank through the partial-pruned grouped top-k — the corpus never
    reaches the shuffle."""
    from mimirsbrunn_ray.stages.search import grouped_top_k

    docs = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["source", "text"]
    )

    def partial(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_valid(b["source"]))
        empty = pa.table(
            {
                "source": pa.array([], pa.string()),
                "bigram": pa.array([], pa.string()),
                "n": pa.array([], pa.int64()),
            }
        )
        if b.num_rows == 0:
            return empty
        words = pc.split_pattern(
            pc.utf8_lower(pc.fill_null(b["text"], "")), " "
        )
        n_per = pc.list_value_length(words).to_numpy(zero_copy_only=False)
        n_per = n_per.astype(np.int64)
        flat = words.combine_chunks().flatten() if isinstance(
            words, pa.ChunkedArray
        ) else words.flatten()
        total = int(n_per.sum())
        if total == 0:
            return empty
        # positions within each doc: a bigram starts at every index whose
        # in-doc offset is >= 1 (pairs never cross documents)
        seg = np.repeat(np.arange(len(b)), n_per)
        starts = np.concatenate(([0], np.cumsum(n_per)[:-1]))
        pos = np.arange(total) - np.repeat(starts, n_per)
        right_idx = np.flatnonzero(pos >= 1)
        if len(right_idx) == 0:
            return empty
        left = flat.take(pa.array(right_idx - 1))
        right = flat.take(pa.array(right_idx))
        bigram = pc.binary_join_element_wise(left, right, " ")
        src = b["source"].combine_chunks() if isinstance(
            b["source"], pa.ChunkedArray
        ) else b["source"]
        t = pa.table(
            {
                "source": src.take(pa.array(seg[right_idx])),
                "bigram": bigram,
            }
        )
        g = t.group_by(["source", "bigram"]).aggregate([([], "count_all")])
        return g.select(["source", "bigram", "count_all"]).rename_columns(
            ["source", "bigram", "n"]
        )

    def combine(b: pa.Table) -> pa.Table:
        g = b.group_by(["source", "bigram"]).aggregate([("n", "sum")])
        return g.select(["source", "bigram", "n_sum"]).rename_columns(
            ["source", "bigram", "n"]
        )

    counts = tree_merge(
        docs.map_batches(partial, batch_format="pyarrow", batch_size=None),
        combine,
        final_shards=8,
        shard_cols=["source", "bigram"],
    )
    return grouped_top_k(
        counts, ["source"], "n", k=3, descending=True,
        tiebreak_cols=["bigram"],
    )


BIGRAM_TOP_SQL = """
WITH w AS (
  SELECT source, doc_id,
         string_split(lower(coalesce(text, '')), ' ') AS ws
  FROM documents WHERE source IS NOT NULL
), t AS (
  SELECT source, doc_id, UNNEST(ws) AS w,
         UNNEST(range(1, len(ws) + 1)) AS i
  FROM w
), p AS (
  SELECT a.source, a.w || ' ' || b.w AS bigram
  FROM t a JOIN t b ON a.doc_id = b.doc_id AND b.i = a.i + 1
), c AS (
  SELECT source, bigram, CAST(COUNT(*) AS BIGINT) AS n
  FROM p GROUP BY 1, 2
)
SELECT source, bigram, n FROM (
  SELECT source, bigram, n,
         ROW_NUMBER() OVER (
           PARTITION BY source ORDER BY n DESC, bigram ASC
         ) AS rn
  FROM c
) WHERE rn <= 3
"""


# ---------------------------------------------------------------------------
# MASE forecast-error sufficient statistics per type
# ---------------------------------------------------------------------------


def q_mase_stats_per_type(sf_dir):
    """MASE (mean absolute scaled error) sufficient statistics per
    event type over the hourly mean series: the seasonal-naive absolute
    error sum (|mean(h) - mean(h - 24h)| over hours whose seasonal
    partner was OBSERVED) and the one-step-naive absolute error sum
    (|mean(h) - mean(prev observed h)|) — the standard forecast
    benchmark denominators/numerators, exact because hourly means snap
    to x100 integers before differencing. Scale shape: the hours-
    bounded (type, hour) tier is combiner-first; both alignments are
    searchsorted walks inside one type-hash bucket shuffle."""
    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "ts", "value"]
    )

    def partial(b: pa.Table) -> pa.Table:
        b = _not_null(b, ("event_type", "ts", "value"))
        ts_us = (
            b["ts"].cast(pa.timestamp("us")).cast(pa.int64()).to_numpy(
                zero_copy_only=False
            )
        )
        x = _round_half_away(
            b["value"].to_numpy(zero_copy_only=False).astype(np.float64)
            * 100.0
        )
        t = pa.table(
            {
                "event_type": b["event_type"],
                "h": pa.array(trunc_us(ts_us, "1h")),
                "one": pa.array(np.ones(len(x), dtype=np.int64)),
                "x": pa.array(x),
            }
        )
        g = t.group_by(["event_type", "h"]).aggregate(
            [("one", "sum"), ("x", "sum")]
        )
        g = g.select(["event_type", "h", "one_sum", "x_sum"])
        return g.rename_columns(["event_type", "h", "n", "s"])

    def combine(b: pa.Table) -> pa.Table:
        g = b.group_by(["event_type", "h"]).aggregate(
            [("n", "sum"), ("s", "sum")]
        )
        g = g.select(["event_type", "h", "n_sum", "s_sum"])
        return g.rename_columns(["event_type", "h", "n", "s"])

    tier = tree_merge(
        ev.map_batches(partial, batch_format="pyarrow", batch_size=None),
        combine,
        final_shards=8,
        shard_cols=["event_type", "h"],
    )

    def rebucket(b: pa.Table) -> pa.Table:
        return add_bucket(b, "event_type", 64)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "event_type": pd.Series([], dtype=object),
                "n_naive": pd.Series([], dtype=np.int64),
                "sum_abs_naive_x100": pd.Series([], dtype=np.int64),
                "n_seasonal": pd.Series([], dtype=np.int64),
                "sum_abs_seasonal_x100": pd.Series([], dtype=np.int64),
            }
        )
        if len(g) == 0:
            return empty
        g = g.sort_values(
            ["event_type", "h"], kind="mergesort", ignore_index=True
        )
        rows = {k: [] for k in empty.columns}
        for t in pd.unique(g["event_type"].to_numpy()):
            sub = g[g["event_type"] == t]
            h = sub["h"].to_numpy(dtype=np.int64)
            s = sub["s"].to_numpy(dtype=np.int64)
            n = sub["n"].to_numpy(dtype=np.int64)
            mean = _round_half_away(s.astype(np.float64) / n)
            naive = np.abs(np.diff(mean))
            probe = h - 24 * _HOUR_US
            posn = np.clip(np.searchsorted(h, probe), 0, len(h) - 1)
            hit = h[posn] == probe
            seas = np.abs(mean[hit] - mean[posn[hit]])
            rows["event_type"].append(t)
            rows["n_naive"].append(len(naive))
            rows["sum_abs_naive_x100"].append(int(naive.sum()))
            rows["n_seasonal"].append(int(hit.sum()))
            rows["sum_abs_seasonal_x100"].append(int(seas.sum()))
        out = pd.DataFrame(rows)
        for c in empty.columns:
            if c != "event_type":
                out[c] = out[c].astype(np.int64)
        return out

    return (
        tier.map_batches(rebucket, batch_format="pyarrow", batch_size=None)
        .groupby(_BUCKET)
        .map_groups(per_bucket, batch_format="pandas")
    )


MASE_SQL = """
WITH t AS (
  SELECT event_type, date_trunc('hour', ts) AS h,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT) AS s
  FROM events
  WHERE event_type IS NOT NULL AND ts IS NOT NULL AND value IS NOT NULL
  GROUP BY 1, 2
), m AS (
  SELECT event_type, h,
         CAST(ROUND(CAST(s AS DOUBLE) / n, 0) AS BIGINT) AS mean
  FROM t
), nv AS (
  SELECT event_type,
         ABS(mean - LAG(mean) OVER (PARTITION BY event_type ORDER BY h))
           AS d
  FROM m
), nagg AS (
  SELECT event_type, CAST(COUNT(d) AS BIGINT) AS n_naive,
         CAST(COALESCE(SUM(d), 0) AS BIGINT) AS sum_abs_naive_x100
  FROM nv GROUP BY 1
), sv AS (
  SELECT a.event_type, ABS(a.mean - b.mean) AS d
  FROM m a JOIN m b
    ON a.event_type = b.event_type AND b.h = a.h - INTERVAL 24 HOUR
), sagg AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_seasonal,
         CAST(SUM(d) AS BIGINT) AS sum_abs_seasonal_x100
  FROM sv GROUP BY 1
)
SELECT nagg.event_type, nagg.n_naive, nagg.sum_abs_naive_x100,
       CAST(COALESCE(sagg.n_seasonal, 0) AS BIGINT) AS n_seasonal,
       CAST(COALESCE(sagg.sum_abs_seasonal_x100, 0) AS BIGINT)
         AS sum_abs_seasonal_x100
FROM nagg LEFT JOIN sagg USING (event_type)
"""


def register_r4q(queries: dict, oracles: dict) -> None:
    queries.update(
        {
            "user_cumulative_adoption": q_user_cumulative_adoption,
            "word_bigram_top_per_source": q_word_bigram_top_per_source,
            "mase_stats_per_type": q_mase_stats_per_type,
        }
    )
    oracles.update(
        {
            "user_cumulative_adoption": ADOPTION_SQL,
            "word_bigram_top_per_source": BIGRAM_TOP_SQL,
            "mase_stats_per_type": MASE_SQL,
        }
    )
