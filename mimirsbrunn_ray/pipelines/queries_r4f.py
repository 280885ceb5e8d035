"""Round-4 batch F: rolling MEDIAN (order-statistic window), Prometheus-
style log2 exponential value histogram, per-source lexical statistics
(type-token ratio, hapax count, Shannon word entropy), and a same-bucket
value band self-join pair count.

Exactness discipline: x100 per-term quantization before any distributed
sum; medians emitted x200 (always integer); ratios by floor division or
one snapped float from identical integer operands.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

# ---------------------------------------------------------------------------
# rolling median per event type
# ---------------------------------------------------------------------------

_ROLL_W = 5


def q_rolling_median(sf_dir):
    """Trailing 5-sample rolling median per event type, one row per
    sample (stages/timeseries.rolling_median; med emitted x200 so even
    frames stay integer)."""
    from mimirsbrunn_ray.stages.timeseries import rolling_median

    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_type", "ts", "event_id", "value"],
    )
    return rolling_median(ev, key="event_type", window=_ROLL_W)


ROLLMED_SQL = f"""
SELECT event_type, ts, event_id,
       CAST(ROUND(MEDIAN(CAST(ROUND(value * 100, 0) AS BIGINT)) OVER (
         PARTITION BY event_type ORDER BY ts, event_id
         ROWS BETWEEN {_ROLL_W - 1} PRECEDING AND CURRENT ROW
       ) * 2, 0) AS BIGINT) AS med_x200
FROM events
WHERE event_type IS NOT NULL AND ts IS NOT NULL AND value IS NOT NULL
"""


# ---------------------------------------------------------------------------
# log2 exponential histogram per event type
# ---------------------------------------------------------------------------


def q_log2_histogram(sf_dir):
    """Prometheus-native-histogram-style exponential buckets: per event
    type, bucket = floor(log2(value_x100)) over positive samples, with
    count / min / max per bucket. Combiner-first batch partials + one
    tiny (type, bucket)-grain merge — the result is bounded by
    #types x 64 buckets regardless of input size."""
    from mimirsbrunn_ray.stages.rollup import tree_merge
    from mimirsbrunn_ray.stages.timeseries import _round_half_away_x

    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "value"]
    )

    def partial(b: pa.Table) -> pa.Table:
        b = b.filter(
            pc.and_(pc.is_valid(b["event_type"]), pc.is_valid(b["value"]))
        )
        v100 = _round_half_away_x(
            b["value"].to_numpy(zero_copy_only=False).astype(np.float64), 100.0
        )
        pos = v100 > 0
        v = v100[pos]
        # float64 log2 is exact at integer powers of 2 and > 1 ulp away
        # from an integer everywhere else in this value range, so
        # floor(log2) agrees bit-for-bit with the oracle's FLOOR(log2(x))
        bucket = np.floor(np.log2(v.astype(np.float64))).astype(np.int64)
        t = pd.DataFrame(
            {
                "event_type": pd.Series(
                    b["event_type"].to_numpy(zero_copy_only=False)[pos]
                ),
                "bucket": bucket,
                "n": np.int64(1),
                "min_x100": v,
                "max_x100": v,
            }
        )
        g = t.groupby(["event_type", "bucket"], sort=False, as_index=False).agg(
            n=("n", "sum"), min_x100=("min_x100", "min"),
            max_x100=("max_x100", "max"),
        )
        for c in ("n", "min_x100", "max_x100"):
            g[c] = g[c].astype(np.int64)
        return pa.Table.from_pandas(g, preserve_index=False)

    return tree_merge(
        ev.map_batches(partial, batch_format="pyarrow", batch_size=None),
        lambda b: b.group_by(["event_type", "bucket"])
        .aggregate([("n", "sum"), ("min_x100", "min"), ("max_x100", "max")])
        .rename_columns(["event_type", "bucket", "n", "min_x100", "max_x100"]),
        final_shards=2,
        shard_cols=["event_type"],
    )


LOG2HIST_SQL = """
WITH v AS (
  SELECT event_type, CAST(ROUND(value * 100, 0) AS BIGINT) AS x
  FROM events
  WHERE event_type IS NOT NULL AND value IS NOT NULL
)
SELECT event_type,
       CAST(FLOOR(log2(x)) AS BIGINT) AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(MIN(x) AS BIGINT) AS min_x100,
       CAST(MAX(x) AS BIGINT) AS max_x100
FROM v WHERE x > 0
GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# lexical statistics per source
# ---------------------------------------------------------------------------


def q_lexical_stats(sf_dir):
    """Per-source lexical profile from exact word counts: token count,
    type (distinct-word) count, hapax count, type-token ratio (ppm,
    floor division), and Shannon word entropy ``ln N - (sum c ln c)/N``
    snapped x1e6 — one combiner-first (source, word) grain, then one
    vectorized per-source pass (the Zipf-slope shape)."""
    from mimirsbrunn_ray.stages.ordered import _round_half_away
    from mimirsbrunn_ray.stages.rollup import tree_merge

    docs = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["source", "text"]
    )

    def partial(b: pa.Table) -> pa.Table:
        b = b.filter(
            pc.and_(pc.is_valid(b["source"]), pc.is_valid(b["text"]))
        )
        words = pc.split_pattern(pc.utf8_lower(b["text"]), " ")
        n_per = pc.list_value_length(words).to_numpy(zero_copy_only=False)
        src = np.repeat(b["source"].to_numpy(zero_copy_only=False), n_per)
        flat = pc.list_flatten(words)
        keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        t = pa.table(
            {"source": pa.array(src[keep]), "word": flat.filter(pa.array(keep))}
        )
        g = t.group_by(["source", "word"]).aggregate([([], "count_all")])
        return g.rename_columns(["source", "word", "cnt"])

    counts = tree_merge(
        docs.map_batches(partial, batch_format="pyarrow", batch_size=None),
        lambda b: b.group_by(["source", "word"])
        .aggregate([("cnt", "sum")])
        .rename_columns(["source", "word", "cnt"]),
        final_shards=4,
        shard_cols=["source"],
    )

    def per_source(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "source": pd.Series([], dtype=object),
                "n_tokens": pd.Series([], dtype=np.int64),
                "n_types": pd.Series([], dtype=np.int64),
                "n_hapax": pd.Series([], dtype=np.int64),
                "ttr_ppm": pd.Series([], dtype=np.int64),
                "entropy_x1e6": pd.Series([], dtype=np.int64),
            }
        )
        if len(g) == 0:
            return empty
        c = g["cnt"].to_numpy(dtype=np.int64)
        n = int(c.sum())
        cf = c.astype(np.float64)
        ent = np.log(float(n)) - float((cf * np.log(cf)).sum()) / float(n)
        return pd.DataFrame(
            {
                "source": [g["source"].iloc[0]],
                "n_tokens": np.array([n], dtype=np.int64),
                "n_types": np.array([len(c)], dtype=np.int64),
                "n_hapax": np.array([(c == 1).sum()], dtype=np.int64),
                "ttr_ppm": np.array(
                    [len(c) * 1_000_000 // n], dtype=np.int64
                ),
                "entropy_x1e6": _round_half_away(np.array([ent * 1e6])),
            }
        )

    return counts.groupby("source").map_groups(per_source, batch_format="pandas")


LEXSTATS_SQL = """
WITH w AS (
  SELECT source, unnest(string_split(lower(text), ' ')) AS word
  FROM documents
  WHERE source IS NOT NULL AND text IS NOT NULL
), c AS (
  SELECT source, word, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM w WHERE word <> ''
  GROUP BY 1, 2
)
SELECT source,
       CAST(SUM(cnt) AS BIGINT) AS n_tokens,
       CAST(COUNT(*) AS BIGINT) AS n_types,
       CAST(SUM(CASE WHEN cnt = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax,
       CAST(COUNT(*) * 1000000 // SUM(cnt) AS BIGINT) AS ttr_ppm,
       CAST(ROUND((ln(SUM(cnt)) - SUM(cnt * ln(cnt)) / SUM(cnt)) * 1000000,
                  0) AS BIGINT) AS entropy_x1e6
FROM c
GROUP BY source
"""


# ---------------------------------------------------------------------------
# value band self-join pair count per (type, hour)
# ---------------------------------------------------------------------------

_BAND_EPS_X100 = 500  # |v_a - v_b| <= 5.00


def q_value_band_pairs(sf_dir):
    """Self band-join pair counting: within each (event_type, hour)
    bucket, the number of unordered sample pairs whose x100 values lie
    within 500 of each other. One (type, hour) group shuffle; inside a
    group the count is two searchsorted calls over the sorted value
    array — no O(n^2) pair materialization on either side of any
    exchange."""
    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "ts", "value"]
    )
    from mimirsbrunn_ray.stages.timeseries import _round_half_away_x

    def project(b: pa.Table) -> pa.Table:
        b = b.filter(
            pc.and_(
                pc.and_(pc.is_valid(b["event_type"]), pc.is_valid(b["ts"])),
                pc.is_valid(b["value"]),
            )
        )
        v100 = _round_half_away_x(
            b["value"].to_numpy(zero_copy_only=False).astype(np.float64), 100.0
        )
        return pa.table(
            {
                "event_type": b["event_type"],
                "bucket": pc.floor_temporal(b["ts"], unit="hour"),
                "v100": pa.array(v100),
            }
        )

    proj = ev.map_batches(project, batch_format="pyarrow", batch_size=None)

    def per_group(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "event_type": pd.Series([], dtype=object),
                "bucket": pd.Series([], dtype="datetime64[us]"),
                "n_samples": pd.Series([], dtype=np.int64),
                "n_pairs": pd.Series([], dtype=np.int64),
            }
        )
        if len(g) == 0:
            return empty
        v = np.sort(g["v100"].to_numpy(dtype=np.int64))
        lo = np.searchsorted(v, v - _BAND_EPS_X100, side="left")
        hi = np.searchsorted(v, v + _BAND_EPS_X100, side="right")
        n_pairs = int((hi - lo - 1).sum()) // 2
        return pd.DataFrame(
            {
                "event_type": [g["event_type"].iloc[0]],
                "bucket": pd.Series(
                    [g["bucket"].iloc[0]], dtype="datetime64[us]"
                ),
                "n_samples": np.array([len(v)], dtype=np.int64),
                "n_pairs": np.array([n_pairs], dtype=np.int64),
            }
        )

    return proj.groupby(["event_type", "bucket"]).map_groups(
        per_group, batch_format="pandas"
    )


BANDPAIRS_SQL = f"""
WITH v AS (
  SELECT event_type, date_trunc('hour', ts) AS bucket,
         CAST(ROUND(value * 100, 0) AS BIGINT) AS x,
         ROW_NUMBER() OVER () AS rid
  FROM events
  WHERE event_type IS NOT NULL AND ts IS NOT NULL AND value IS NOT NULL
), p AS (
  SELECT a.event_type, a.bucket, COUNT(*) AS twice_pairs
  FROM v a JOIN v b
    ON a.event_type = b.event_type AND a.bucket = b.bucket
   AND a.rid <> b.rid AND ABS(a.x - b.x) <= {_BAND_EPS_X100}
  GROUP BY 1, 2
)
SELECT v.event_type, v.bucket,
       CAST(COUNT(*) AS BIGINT) AS n_samples,
       CAST(COALESCE(MAX(p.twice_pairs), 0) // 2 AS BIGINT) AS n_pairs
FROM v LEFT JOIN p USING (event_type, bucket)
GROUP BY 1, 2
"""


def register_r4f(queries: dict, oracles: dict) -> None:
    queries.update(
        {
            "rolling_median_value": q_rolling_median,
            "log2_histogram_value": q_log2_histogram,
            "lexical_stats_per_source": q_lexical_stats,
            "value_band_pairs": q_value_band_pairs,
        }
    )
    oracles.update(
        {
            "rolling_median_value": ROLLMED_SQL,
            "log2_histogram_value": LOG2HIST_SQL,
            "lexical_stats_per_source": LEXSTATS_SQL,
            "value_band_pairs": BANDPAIRS_SQL,
        }
    )
