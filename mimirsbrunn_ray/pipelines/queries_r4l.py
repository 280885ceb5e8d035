"""Round-4 batch L: hierarchical tier re-aggregation parity (the
north-star invariant, oracled), max drawdown, mean-crossing counts,
exact-duplicate cluster-size histogram, daily type co-occurrence
baskets, and ordinal (permutation-entropy) pattern counts.

Exactness discipline: every value is quantized to x100 int64 at the RAW
grain (DuckDB ``ROUND(value*100, 0)`` semantics, half away from zero),
so all downstream sums / mins / maxes / comparisons are exact-integer
and associative — re-aggregation order cannot change a bit. Grafts the
reference's rollup invariant: the 1m -> 1h continuous-aggregate chain
(SURVEY.md north_star; reference per-run import stats
/root/reference/libs/mimir/src/rubber.rs bulk counters) must reproduce
the direct raw -> 1h aggregate exactly, which `tier_parity_1h` proves
against a direct-SQL oracle.
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
from mimirsbrunn_ray.stages.timeseries import (
    _project_series,
    _round_half_away_x,
    _series_segments,
)

# ---------------------------------------------------------------------------
# hierarchical tier parity: 1h tier derived FROM the 1m tier must equal
# the direct raw -> 1h aggregate (verified by the oracle computing the
# direct path)
# ---------------------------------------------------------------------------


def _mk_minute_partial(b: pa.Table) -> pa.Table:
    b = b.filter(
        pc.and_(
            pc.and_(pc.is_valid(b["event_type"]), pc.is_valid(b["ts"])),
            pc.is_valid(b["value"]),
        )
    )
    ts_us = (
        b["ts"].cast(pa.timestamp("us")).cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
    )
    x = _round_half_away_x(
        b["value"].to_numpy(zero_copy_only=False).astype(np.float64), 100.0
    )
    t = pa.table(
        {
            "event_type": b["event_type"],
            "m": pa.array(trunc_us(ts_us, "1m")),
            "x": pa.array(x),
        }
    )
    g = t.group_by(["event_type", "m"]).aggregate(
        [([], "count_all"), ("x", "sum"), ("x", "min"), ("x", "max")]
    )
    g = g.select(["event_type", "m", "count_all", "x_sum", "x_min", "x_max"])
    return g.rename_columns(["event_type", "m", "n", "s", "mn", "mx"])


def _combine_tier(keys):
    def combine(b: pa.Table) -> pa.Table:
        g = b.group_by(keys).aggregate(
            [("n", "sum"), ("s", "sum"), ("mn", "min"), ("mx", "max")]
        )
        g = g.select(keys + ["n_sum", "s_sum", "mn_min", "mx_max"])
        return g.rename_columns(keys + ["n", "s", "mn", "mx"])

    return combine


def q_tier_parity_1h(sf_dir):
    """The engine's hierarchical continuous-aggregate invariant as an
    oracled query: build the FULL 1m tier (per (event_type, minute):
    count, sum/min/max of x100-quantized values), then re-aggregate the
    1m tier — not the raw stream — into the 1h tier. The DuckDB oracle
    computes 1h DIRECTLY from raw rows, so a value-hash PASS proves
    "rolled-up point counts and values match at every retention tier"
    bit-exactly (quantize-per-term makes every tier aggregate an
    associative int64 reduction).

    Scale shape: combiner-first minute partials + sharded tree merge
    build the 1m tier without a sort shuffle; the hour step re-keys the
    (bounded: types x minutes-in-window) tier rows and tree-merges
    again — the raw stream is scanned exactly once."""
    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "ts", "value"]
    )
    tier_1m = tree_merge(
        ev.map_batches(
            _mk_minute_partial, batch_format="pyarrow", batch_size=None
        ),
        _combine_tier(["event_type", "m"]),
        final_shards=8,
        shard_cols=["event_type", "m"],
    )

    def to_hour(b: pa.Table) -> pa.Table:
        m = b["m"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "event_type": b["event_type"],
                "h": pa.array(trunc_us(m, "1h")),
                "n": b["n"],
                "s": b["s"],
                "mn": b["mn"],
                "mx": b["mx"],
            }
        )

    tier_1h = tree_merge(
        tier_1m.map_batches(to_hour, batch_format="pyarrow", batch_size=None),
        _combine_tier(["event_type", "h"]),
    )

    def finish(b: pa.Table) -> pa.Table:
        h = b["h"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "event_type": b["event_type"],
                "bucket": ts_array(h),
                "n_points": b["n"].cast(pa.int64()),
                "sum_x100": b["s"].cast(pa.int64()),
                "min_x100": b["mn"].cast(pa.int64()),
                "max_x100": b["mx"].cast(pa.int64()),
            }
        )

    return tier_1h.map_batches(finish, batch_format="pyarrow", batch_size=None)


TIER_PARITY_SQL = """
WITH v AS (
  SELECT event_type, ts, CAST(ROUND(value * 100, 0) AS BIGINT) AS x
  FROM events
  WHERE event_type IS NOT NULL AND ts IS NOT NULL AND value IS NOT NULL
)
SELECT event_type,
       date_trunc('hour', ts) AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n_points,
       CAST(SUM(x) AS BIGINT) AS sum_x100,
       CAST(MIN(x) AS BIGINT) AS min_x100,
       CAST(MAX(x) AS BIGINT) AS max_x100
FROM v GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# max drawdown per event type (running-peak minus current, maximized)
# ---------------------------------------------------------------------------


def q_max_drawdown_per_type(sf_dir):
    """Classic max drawdown over each event type's (ts, id)-ordered x100
    series: the largest drop from a running peak — the risk statistic a
    metrics store computes over gauge series. One series hash-bucket
    shuffle; the running peak is a per-key pandas cummax (each type lives
    wholly inside its bucket, so per-type results are final)."""
    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_type", "ts", "event_id", "value"],
    )
    proj = _project_series(ev, "event_type", "ts", "event_id", "value", 64)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "event_type": pd.Series([], dtype=object),
                "n_samples": pd.Series([], dtype=np.int64),
                "max_drawdown_x100": pd.Series([], dtype=np.int64),
                "peak_x100": pd.Series([], dtype=np.int64),
            }
        )
        if len(g) == 0:
            return empty
        g, _same = _series_segments(g, "event_type", "ts", "event_id")
        x = _round_half_away_x(g["value"].to_numpy(dtype=np.float64), 100.0)
        t = pd.DataFrame({"k": g["event_type"].to_numpy(), "x": x})
        t["dd"] = t.groupby("k", sort=False)["x"].cummax().to_numpy() - x
        agg = t.groupby("k", sort=False, as_index=False).agg(
            n_samples=("x", "size"),
            max_drawdown_x100=("dd", "max"),
            peak_x100=("x", "max"),
        )
        out = agg.rename(columns={"k": "event_type"})
        for c in ("n_samples", "max_drawdown_x100", "peak_x100"):
            out[c] = out[c].astype(np.int64)
        return out

    return proj.groupby(_BUCKET).map_groups(per_bucket, batch_format="pandas")


DRAWDOWN_SQL = """
WITH v AS (
  SELECT event_type, ts, event_id,
         CAST(ROUND(value * 100, 0) AS BIGINT) AS x
  FROM events
  WHERE event_type IS NOT NULL AND ts IS NOT NULL AND value IS NOT NULL
), w AS (
  SELECT event_type, x,
         CAST(MAX(x) OVER (PARTITION BY event_type ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) - x
           AS dd
  FROM v
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_samples,
       CAST(MAX(dd) AS BIGINT) AS max_drawdown_x100,
       CAST(MAX(x) AS BIGINT) AS peak_x100
FROM w GROUP BY 1
"""


# ---------------------------------------------------------------------------
# mean-crossing counts per event type (oscillation-rate signal)
# ---------------------------------------------------------------------------


def q_mean_crossings_per_type(sf_dir):
    """Number of times each type's ordered series strictly crosses its
    own mean — the zero-crossing oscillation statistic. Exactness: the
    per-row deviation sign is sign(x*n - s) with x, n, s all exact int64
    (x = x100 value, n/s = the type's count / x100 sum), so "above /
    below mean" needs no float division; samples exactly AT the mean
    contribute no crossing. Two passes: a tiny (types-bounded)
    combiner-first totals pass broadcast into the ordered per-bucket
    scan."""
    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_type", "ts", "event_id", "value"],
    )

    def tpartial(b: pa.Table) -> pa.Table:
        b = b.filter(
            pc.and_(
                pc.and_(pc.is_valid(b["event_type"]), pc.is_valid(b["ts"])),
                pc.is_valid(b["value"]),
            )
        )
        x = _round_half_away_x(
            b["value"].to_numpy(zero_copy_only=False).astype(np.float64),
            100.0,
        )
        t = pa.table({"event_type": b["event_type"], "x": pa.array(x)})
        g = t.group_by(["event_type"]).aggregate(
            [([], "count_all"), ("x", "sum")]
        )
        g = g.select(["event_type", "count_all", "x_sum"])
        return g.rename_columns(["event_type", "n", "s"])

    def tcombine(b: pa.Table) -> pa.Table:
        g = b.group_by(["event_type"]).aggregate([("n", "sum"), ("s", "sum")])
        g = g.select(["event_type", "n_sum", "s_sum"])
        return g.rename_columns(["event_type", "n", "s"])

    tot = tree_merge(
        ev.map_batches(tpartial, batch_format="pyarrow", batch_size=None),
        tcombine,
    ).to_pandas()  # bounded: one row per event type
    if "event_type" not in tot.columns:  # fully-empty input short-circuit
        tot = pd.DataFrame({"event_type": [], "n": [], "s": []})
    n_map = dict(zip(tot["event_type"], tot["n"].astype(np.int64)))
    s_map = dict(zip(tot["event_type"], tot["s"].astype(np.int64)))

    proj = _project_series(ev, "event_type", "ts", "event_id", "value", 64)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "event_type": pd.Series([], dtype=object),
                "n_samples": pd.Series([], dtype=np.int64),
                "n_crossings": pd.Series([], dtype=np.int64),
                "n_above": pd.Series([], dtype=np.int64),
                "n_below": pd.Series([], dtype=np.int64),
            }
        )
        if len(g) == 0:
            return empty
        g, same = _series_segments(g, "event_type", "ts", "event_id")
        k = g["event_type"].to_numpy()
        x = _round_half_away_x(g["value"].to_numpy(dtype=np.float64), 100.0)
        n = g["event_type"].map(n_map).to_numpy(dtype=np.int64)
        s = g["event_type"].map(s_map).to_numpy(dtype=np.int64)
        a = x * n - s
        prev = np.concatenate(([np.int64(0)], a[:-1]))
        cross = same & (
            ((prev > 0) & (a < 0)) | ((prev < 0) & (a > 0))
        )
        t = pd.DataFrame(
            {
                "k": k,
                "c": cross.astype(np.int64),
                "ab": (a > 0).astype(np.int64),
                "be": (a < 0).astype(np.int64),
            }
        )
        agg = t.groupby("k", sort=False, as_index=False).agg(
            n_samples=("c", "size"),
            n_crossings=("c", "sum"),
            n_above=("ab", "sum"),
            n_below=("be", "sum"),
        )
        out = agg.rename(columns={"k": "event_type"})
        for c in ("n_samples", "n_crossings", "n_above", "n_below"):
            out[c] = out[c].astype(np.int64)
        return out

    return proj.groupby(_BUCKET).map_groups(per_bucket, batch_format="pandas")


CROSSINGS_SQL = """
WITH v AS (
  SELECT event_type, ts, event_id,
         CAST(ROUND(value * 100, 0) AS BIGINT) AS x
  FROM events
  WHERE event_type IS NOT NULL AND ts IS NOT NULL AND value IS NOT NULL
), t AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x) AS BIGINT) AS s
  FROM v GROUP BY 1
), a AS (
  SELECT v.event_type, v.ts, v.event_id, v.x * t.n - t.s AS a
  FROM v JOIN t USING (event_type)
), l AS (
  SELECT event_type, a,
         LAG(a) OVER (PARTITION BY event_type ORDER BY ts, event_id) AS pa
  FROM a
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_samples,
       CAST(SUM(CASE WHEN (pa > 0 AND a < 0) OR (pa < 0 AND a > 0)
                THEN 1 ELSE 0 END) AS BIGINT) AS n_crossings,
       CAST(SUM(CASE WHEN a > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_above,
       CAST(SUM(CASE WHEN a < 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_below
FROM l GROUP BY 1
"""


# ---------------------------------------------------------------------------
# exact-duplicate cluster-size histogram (dedup audit statistic)
# ---------------------------------------------------------------------------


def q_dedup_cluster_sizes(sf_dir):
    """Histogram of exact-duplicate cluster sizes over the documents
    corpus (cluster = identical text): for each size, how many clusters
    and how many documents — the audit a dedup pass publishes so the
    corpus owner can see the duplication mass before deleting it.

    Scale shape: batch-local text counts collapse each block, ONE
    text-hash bucket shuffle co-locates all counts of a text, each
    bucket resolves final cluster sizes and emits a partial histogram
    (bounded: distinct sizes), and a tree merge sums histograms — the
    driver never sees a text key."""
    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])

    def partial(b: pa.Table) -> pa.Table:
        t = pa.table(
            {"t": pc.fill_null(b["text"], "")}
        )
        g = t.group_by(["t"]).aggregate([([], "count_all")])
        return g.select(["t", "count_all"]).rename_columns(["t", "c"])

    def with_bucket(b: pa.Table) -> pa.Table:
        return add_bucket(b, "t", 64)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "cluster_size": pd.Series([], dtype=np.int64),
                "n_clusters": pd.Series([], dtype=np.int64),
            }
        )
        if len(g) == 0:
            return empty
        sizes = g.groupby("t", sort=False)["c"].sum()
        h = sizes.value_counts()
        return pd.DataFrame(
            {
                "cluster_size": h.index.to_numpy(dtype=np.int64),
                "n_clusters": h.to_numpy(dtype=np.int64),
            }
        )

    def combine(b: pa.Table) -> pa.Table:
        g = b.group_by(["cluster_size"]).aggregate([("n_clusters", "sum")])
        g = g.select(["cluster_size", "n_clusters_sum"])
        return g.rename_columns(["cluster_size", "n_clusters"])

    hist = tree_merge(
        docs.map_batches(partial, batch_format="pyarrow", batch_size=None)
        .map_batches(with_bucket, batch_format="pyarrow", batch_size=None)
        .groupby(_BUCKET)
        .map_groups(per_bucket, batch_format="pandas"),
        combine,
    )

    def finish(b: pa.Table) -> pa.Table:
        cs = b["cluster_size"].cast(pa.int64())
        nc = b["n_clusters"].cast(pa.int64())
        return pa.table(
            {
                "cluster_size": cs,
                "n_clusters": nc,
                "n_docs": pc.multiply(cs, nc),
            }
        )

    return hist.map_batches(finish, batch_format="pyarrow", batch_size=None)


CLUSTER_SIZES_SQL = """
WITH c AS (
  SELECT COALESCE(text, '') AS t, COUNT(*) AS sz
  FROM documents GROUP BY 1
)
SELECT CAST(sz AS BIGINT) AS cluster_size,
       CAST(COUNT(*) AS BIGINT) AS n_clusters,
       CAST(SUM(sz) AS BIGINT) AS n_docs
FROM c GROUP BY 1
"""


# ---------------------------------------------------------------------------
# daily event-type co-occurrence baskets (market-basket support counts)
# ---------------------------------------------------------------------------


def q_type_cooccurrence_daily(sf_dir):
    """Market-basket support counts where a basket is one (user, day):
    for every unordered event-type pair (a < b), the number of baskets
    containing BOTH — the support table behind association-rule / lift
    analysis. Scale shape: batch-local distinct (user, day, type)
    triples, ONE user-hash bucket shuffle (a user's baskets are wholly
    inside its bucket), per-bucket pair expansion via a (user, day)
    self-merge over the tiny per-basket type sets, then a tree merge of
    per-pair partial counts (bounded: types^2 / 2 rows)."""
    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts", "event_type"]
    )

    def partial(b: pa.Table) -> pa.Table:
        b = b.filter(
            pc.and_(
                pc.and_(pc.is_valid(b["user_id"]), pc.is_valid(b["ts"])),
                pc.is_valid(b["event_type"]),
            )
        )
        ts_us = (
            b["ts"].cast(pa.timestamp("us")).cast(pa.int64()).to_numpy(
                zero_copy_only=False
            )
        )
        t = pa.table(
            {
                "user_id": b["user_id"],
                "d": pa.array(trunc_us(ts_us, "1d")),
                "event_type": b["event_type"],
            }
        )
        g = t.group_by(["user_id", "d", "event_type"]).aggregate([])
        return add_bucket(g, "user_id", 64)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "type_a": pd.Series([], dtype=object),
                "type_b": pd.Series([], dtype=object),
                "c": pd.Series([], dtype=np.int64),
            }
        )
        if len(g) == 0:
            return empty
        t = g.drop_duplicates(["user_id", "d", "event_type"])[
            ["user_id", "d", "event_type"]
        ]
        m = t.merge(t, on=["user_id", "d"])
        m = m[m["event_type_x"] < m["event_type_y"]]
        if len(m) == 0:
            return empty
        agg = (
            m.groupby(["event_type_x", "event_type_y"], sort=False)
            .size()
            .reset_index(name="c")
        )
        agg.columns = ["type_a", "type_b", "c"]
        agg["c"] = agg["c"].astype(np.int64)
        return agg

    def combine(b: pa.Table) -> pa.Table:
        g = b.group_by(["type_a", "type_b"]).aggregate([("c", "sum")])
        g = g.select(["type_a", "type_b", "c_sum"])
        return g.rename_columns(["type_a", "type_b", "c"])

    out = tree_merge(
        ev.map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby(_BUCKET)
        .map_groups(per_bucket, batch_format="pandas"),
        combine,
    )

    def finish(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "type_a": b["type_a"],
                "type_b": b["type_b"],
                "n_baskets": b["c"].cast(pa.int64()),
            }
        )

    return out.map_batches(finish, batch_format="pyarrow", batch_size=None)


COOCCUR_SQL = """
WITH t AS (
  SELECT DISTINCT user_id, date_trunc('day', ts) AS d, event_type
  FROM events
  WHERE user_id IS NOT NULL AND ts IS NOT NULL AND event_type IS NOT NULL
)
SELECT a.event_type AS type_a, b.event_type AS type_b,
       CAST(COUNT(*) AS BIGINT) AS n_baskets
FROM t a JOIN t b ON a.user_id = b.user_id AND a.d = b.d
                 AND a.event_type < b.event_type
GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# ordinal (permutation-entropy) pattern counts per event type
# ---------------------------------------------------------------------------

# stable ascending order of ((x0,0),(x1,1),(x2,2)): position-index
# tie-break makes every comparison a <= on the x's
_PATTERNS = ("012", "021", "201", "102", "120", "210")


def q_ordinal_patterns_per_type(sf_dir):
    """Bandt-Pompe ordinal pattern counts (order 3) per event type: each
    consecutive triple of the (ts, id)-ordered x100 series maps to the
    permutation that sorts it (ties broken by position, so the pattern
    is exact-integer decidable); the pattern histogram is what
    permutation entropy / complexity-estimation reads. One series
    hash-bucket shuffle; triples never cross series boundaries; counts
    are final per type because a type lives wholly inside its bucket."""
    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_type", "ts", "event_id", "value"],
    )
    proj = _project_series(ev, "event_type", "ts", "event_id", "value", 64)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "event_type": pd.Series([], dtype=object),
                "pattern": pd.Series([], dtype=object),
                "n": pd.Series([], dtype=np.int64),
            }
        )
        if len(g) < 3:
            return empty
        g, same = _series_segments(g, "event_type", "ts", "event_id")
        x = _round_half_away_x(g["value"].to_numpy(dtype=np.float64), 100.0)
        x0, x1, x2 = x[:-2], x[1:-1], x[2:]
        ok = same[2:] & same[1:-1]
        if not ok.any():
            return empty
        ab, ac, bc = x0 <= x1, x0 <= x2, x1 <= x2
        lab = np.select(
            [ab & ac & bc, ab & ac, ab, ac, bc],
            list(_PATTERNS[:5]),
            default=_PATTERNS[5],
        )
        t = pd.DataFrame(
            {"event_type": g["event_type"].to_numpy()[2:][ok],
             "pattern": lab[ok]}
        )
        agg = (
            t.groupby(["event_type", "pattern"], sort=False)
            .size()
            .reset_index(name="n")
        )
        agg["n"] = agg["n"].astype(np.int64)
        return agg

    return proj.groupby(_BUCKET).map_groups(per_bucket, batch_format="pandas")


ORDINAL_SQL = """
WITH v AS (
  SELECT event_type, ts, event_id,
         CAST(ROUND(value * 100, 0) AS BIGINT) AS x
  FROM events
  WHERE event_type IS NOT NULL AND ts IS NOT NULL AND value IS NOT NULL
), l AS (
  SELECT event_type,
         LAG(x, 2) OVER w AS x0, LAG(x, 1) OVER w AS x1, x AS x2
  FROM v WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id)
)
SELECT event_type,
       CASE
         WHEN x0 <= x1 AND x0 <= x2 AND x1 <= x2 THEN '012'
         WHEN x0 <= x1 AND x0 <= x2 THEN '021'
         WHEN x0 <= x1 THEN '201'
         WHEN x0 <= x2 THEN '102'
         WHEN x1 <= x2 THEN '120'
         ELSE '210'
       END AS pattern,
       CAST(COUNT(*) AS BIGINT) AS n
FROM l WHERE x0 IS NOT NULL
GROUP BY 1, 2
"""


def register_r4l(queries: dict, oracles: dict) -> None:
    queries.update(
        {
            "tier_parity_1h": q_tier_parity_1h,
            "max_drawdown_per_type": q_max_drawdown_per_type,
            "mean_crossings_per_type": q_mean_crossings_per_type,
            "dedup_cluster_sizes": q_dedup_cluster_sizes,
            "type_cooccurrence_daily": q_type_cooccurrence_daily,
            "ordinal_patterns_per_type": q_ordinal_patterns_per_type,
        }
    )
    oracles.update(
        {
            "tier_parity_1h": TIER_PARITY_SQL,
            "max_drawdown_per_type": DRAWDOWN_SQL,
            "mean_crossings_per_type": CROSSINGS_SQL,
            "dedup_cluster_sizes": CLUSTER_SIZES_SQL,
            "type_cooccurrence_daily": COOCCUR_SQL,
            "ordinal_patterns_per_type": ORDINAL_SQL,
        }
    )
