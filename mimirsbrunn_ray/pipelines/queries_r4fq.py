"""Round-4 batch FQ: richness extrapolation, extreme-value
clustering, and capture-recapture — the first-order jackknife
vocabulary estimator per source (the nonparametric "how many words
are we missing" bound), the runs estimator of the extremal index on
hourly count exceedances (do extreme hours arrive alone or in
clusters?), and the Schnabel multi-sample capture-recapture estimate
of the active-user population from daily activity panels.

Exactness discipline: jackknife inputs (V, f1, n) are exact int64
with one mirrored double law; the exceedance threshold is the exact
order statistic at integer rank (9n+9)//10 (no float quantile
convention), exceedance/cluster counts are pure integers; Schnabel's
sum(C_t * M_t) and sum(R_t) are exact integer folds with a single
final division."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from mimirsbrunn_ray.pipelines.queries_r4dd import (
    _word_counts_per_source,
)
from mimirsbrunn_ray.pipelines.queries_r4fk import (
    _DAY_US,
    _round_half_away,
)
from mimirsbrunn_ray.pipelines.queries_r4fl import (
    _dense_hour_counts,
)


_JACK_COLS = ["source", "n_tokens", "vocab", "hapax", "jack1_x1e6"]


def q_jackknife_vocab_richness(sf_dir):
    """First-order jackknife richness estimate per source:
    S_jack1 = V + f1 * (n - 1) / n, where V is the observed
    vocabulary, f1 the hapax count and n the token count — the
    classic nonparametric lower bound on unseen vocabulary
    (complements Chao1, which keys on f1^2/2f2).  One distributed
    word-count pass; the law is one mirrored double expression."""
    wsc = _word_counts_per_source(sf_dir)
    if not len(wsc) or "source" not in wsc.columns:
        return pa.table({
            "source": pa.array([], pa.string()),
            **{c: pa.array([], pa.int64()) for c in _JACK_COLS[1:]},
        })
    out = {c: [] for c in _JACK_COLS}
    for src, g in wsc.groupby("source", sort=True):
        c = g["c"].to_numpy(dtype=np.int64)
        n = int(c.sum())
        v = len(c)
        f1 = int((c == 1).sum())
        if n < 1:
            continue
        jack = v + f1 * (n - 1) / n
        out["source"].append(src)
        out["n_tokens"].append(n)
        out["vocab"].append(v)
        out["hapax"].append(f1)
        out["jack1_x1e6"].append(_round_half_away(jack * 1e6))
    return pa.table({
        "source": pa.array(out["source"], pa.string()),
        **{c: pa.array(out[c], pa.int64()) for c in _JACK_COLS[1:]},
    })


JACK_SQL = """
WITH w AS (
  SELECT source, unnest(string_split(text, ' ')) AS w
  FROM documents
  WHERE source IS NOT NULL AND text IS NOT NULL
), c AS MATERIALIZED (
  SELECT source, w, CAST(COUNT(*) AS BIGINT) AS c
  FROM w GROUP BY 1, 2
), a AS (
  SELECT source,
         CAST(SUM(c) AS BIGINT) AS n,
         CAST(COUNT(*) AS BIGINT) AS v,
         CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS f1
  FROM c GROUP BY 1
)
SELECT source,
       n AS n_tokens,
       v AS vocab,
       f1 AS hapax,
       CAST(ROUND((v + f1 * CAST(n - 1 AS DOUBLE) / n)
            * 1000000, 0) AS BIGINT) AS jack1_x1e6
FROM a WHERE n >= 1 ORDER BY source
"""

_EXT_COLS = ["event_type", "n_hours", "threshold", "n_exceed",
             "n_clusters", "theta_ppm"]


def q_extremal_index_hourly(sf_dir):
    """Runs estimator of the extremal index per event type on the
    dense hourly grid: threshold = the exact order statistic of the
    hourly counts at integer rank (9n+9)//10 (the ceil-0.9 quantile
    with no float convention), exceedances are hours with count
    STRICTLY above it, clusters are maximal runs of consecutive
    exceedance hours, and theta = clusters / exceedances — theta
    near 1 means isolated extreme hours, small theta means extremes
    arrive in bursts (the quantity that corrects naive return-period
    math).  Counts are one distributed pass."""
    g = _dense_hour_counts(sf_dir)
    if g is None:
        return pa.table({
            "event_type": pa.array([], pa.string()),
            **{c: pa.array([], pa.int64()) for c in _EXT_COLS[1:]},
        })
    out = {c: [] for c in _EXT_COLS}
    for et, sub in g.groupby("event_type", sort=True):
        c = sub.sort_values("hour")["c"].to_numpy(np.int64)
        n = len(c)
        if n == 0:
            continue
        rank = (9 * n + 9) // 10  # exact ceil(0.9 n), 1-based
        thr = int(np.sort(c, kind="mergesort")[rank - 1])
        exc = c > thr
        n_exc = int(exc.sum())
        if n_exc == 0:
            continue
        # clusters = runs of consecutive True on the dense grid
        starts = exc & ~np.concatenate(([False], exc[:-1]))
        n_cl = int(starts.sum())
        out["event_type"].append(et)
        out["n_hours"].append(n)
        out["threshold"].append(thr)
        out["n_exceed"].append(n_exc)
        out["n_clusters"].append(n_cl)
        out["theta_ppm"].append(
            _round_half_away(n_cl / n_exc * 1e6))
    return pa.table({
        "event_type": pa.array(out["event_type"], pa.string()),
        **{c: pa.array(out[c], pa.int64()) for c in _EXT_COLS[1:]},
    })


EXTREMAL_SQL = """
WITH hc AS MATERIALIZED (
  SELECT event_type, EPOCH_US(ts) // 3600000000 AS hour,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM events
  WHERE event_type IS NOT NULL AND ts IS NOT NULL
  GROUP BY 1, 2
), span AS MATERIALIZED (
  SELECT MIN(hour) AS hmin, MAX(hour) AS hmax FROM hc
), grid AS MATERIALIZED (
  SELECT t.event_type, s.hmin + r.k AS hour,
         COALESCE(hc.c, 0) AS c
  FROM (SELECT DISTINCT event_type FROM hc) t
  CROSS JOIN span s
  JOIN range(0, 100000) r(k) ON s.hmin + r.k <= s.hmax
  LEFT JOIN hc ON hc.event_type = t.event_type
              AND hc.hour = s.hmin + r.k
), thr AS MATERIALIZED (
  SELECT event_type, c AS threshold, n AS n_hours
  FROM (SELECT event_type, c,
               ROW_NUMBER() OVER (PARTITION BY event_type
                                  ORDER BY c, hour) AS rn,
               COUNT(*) OVER (PARTITION BY event_type) AS n
        FROM grid)
  WHERE rn = (9 * n + 9) // 10
), exc AS MATERIALIZED (
  SELECT g.event_type, g.hour, t.threshold, t.n_hours,
         CASE WHEN LAG(g.hour) OVER (PARTITION BY g.event_type
                                     ORDER BY g.hour)
                   = g.hour - 1
              THEN 0 ELSE 1 END AS is_start
  FROM grid g JOIN thr t USING (event_type)
  WHERE g.c > t.threshold
)
SELECT event_type,
       CAST(ANY_VALUE(n_hours) AS BIGINT) AS n_hours,
       CAST(ANY_VALUE(threshold) AS BIGINT) AS threshold,
       CAST(COUNT(*) AS BIGINT) AS n_exceed,
       CAST(SUM(is_start) AS BIGINT) AS n_clusters,
       CAST(ROUND(CAST(SUM(is_start) AS DOUBLE) / COUNT(*)
            * 1000000, 0) AS BIGINT) AS theta_ppm
FROM exc GROUP BY event_type ORDER BY event_type
"""

_SCHN_COLS = ["n_days", "n_users_seen", "sum_cm", "sum_r",
              "n_hat_x1e3"]


def q_schnabel_population_users(sf_dir):
    """Schnabel multi-sample capture-recapture estimate of the
    active-user population: treating each calendar day as a capture
    occasion, N_hat = sum_t(C_t * M_t) / sum_t(R_t), where C_t is
    that day's distinct users, M_t the users first seen on an
    earlier day, and R_t the recaptured users (active that day and
    marked) — the panel generalization of Lincoln-Petersen/Chapman.
    Distinct (user, day) pairs and per-user first days fold in one
    distributed pass; the occasion sums are exact integers."""
    import pyarrow.compute as pc
    import ray.data as rd

    from mimirsbrunn_ray.stages.rollup import tree_merge

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts"])

    def to_ud(b: pa.Table) -> pa.Table:
        m = pc.and_(pc.is_valid(b["user_id"]),
                    pc.is_valid(b["ts"]))
        b = b.filter(m)
        us = b["ts"].cast(pa.timestamp("us")).cast(pa.int64())
        t = pa.table({"user_id": b["user_id"],
                      "day": pc.divide(us, _DAY_US)})
        return t.group_by(["user_id", "day"]).aggregate([])

    def distinct(b: pa.Table) -> pa.Table:
        return b.select(["user_id", "day"]).group_by(
            ["user_id", "day"]).aggregate([])

    ud = tree_merge(
        ev.map_batches(to_ud, batch_format="pyarrow",
                       batch_size=None),
        distinct,
        final_shards=8,
        shard_cols=["user_id"],
    ).materialize()

    def day_first(b: pa.Table) -> pa.Table:
        cols = ["day", "c", "f"]
        if b.num_rows == 0 or "user_id" not in b.column_names:
            return pa.table(
                {c: pa.array([], pa.int64()) for c in cols})
        df = b.select(["user_id", "day"]).to_pandas()
        # shards are user-disjoint: per-user first day is exact
        cc_ = df.groupby("day").size().rename("c")
        fd = df.groupby("user_id")["day"].min()
        ff = fd.value_counts().rename("f")
        out = pd.concat([cc_, ff], axis=1).fillna(0).reset_index()
        out.columns = ["day", "c", "f"]
        for c in ["day", "c", "f"]:
            out[c] = out[c].astype(np.int64)
        return pa.Table.from_pandas(out, preserve_index=False)

    def comb(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "day" not in b.column_names:
            return pa.table({
                "day": pa.array([], pa.int64()),
                "c": pa.array([], pa.int64()),
                "f": pa.array([], pa.int64()),
            })
        g = b.group_by(["day"]).aggregate(
            [("c", "sum"), ("f", "sum")])
        return g.rename_columns(["day", "c", "f"])

    tab = tree_merge(
        ud.map_batches(day_first, batch_format="pyarrow",
                       batch_size=None),
        comb,
    ).to_pandas()
    if "day" not in tab.columns or len(tab) == 0:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _SCHN_COLS})
    tab = tab.sort_values("day", ignore_index=True)
    c = tab["c"].to_numpy(np.int64)
    f = tab["f"].to_numpy(np.int64)
    m = np.concatenate(([0], np.cumsum(f)[:-1]))  # marked before t
    r = c - f                                     # recaptures
    sum_cm = int((c * m).sum())
    sum_r = int(r.sum())
    if sum_r == 0:
        return pa.table(
            {c_: pa.array([], pa.int64()) for c_ in _SCHN_COLS})
    return pa.table({
        "n_days": pa.array([len(tab)], pa.int64()),
        "n_users_seen": pa.array([int(f.sum())], pa.int64()),
        "sum_cm": pa.array([sum_cm], pa.int64()),
        "sum_r": pa.array([sum_r], pa.int64()),
        "n_hat_x1e3": pa.array(
            [_round_half_away(sum_cm / sum_r * 1e3)], pa.int64()),
    })


SCHNABEL_SQL = f"""
WITH ud AS MATERIALIZED (
  SELECT DISTINCT user_id, EPOCH_US(ts) // {_DAY_US} AS day
  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
), fd AS MATERIALIZED (
  SELECT user_id, MIN(day) AS fday FROM ud GROUP BY 1
), dc AS MATERIALIZED (
  SELECT day, CAST(COUNT(*) AS BIGINT) AS c FROM ud GROUP BY 1
), ff AS MATERIALIZED (
  SELECT fday AS day, CAST(COUNT(*) AS BIGINT) AS f
  FROM fd GROUP BY 1
), occ AS MATERIALIZED (
  SELECT dc.day, dc.c, COALESCE(ff.f, 0) AS f,
         CAST(SUM(COALESCE(ff.f, 0)) OVER (ORDER BY dc.day
              ROWS UNBOUNDED PRECEDING) - COALESCE(ff.f, 0)
              AS BIGINT) AS m
  FROM dc LEFT JOIN ff USING (day)
), agg AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
         CAST(SUM(f) AS BIGINT) AS n_users_seen,
         CAST(SUM(c * m) AS BIGINT) AS sum_cm,
         CAST(SUM(c - f) AS BIGINT) AS sum_r
  FROM occ
)
SELECT n_days, n_users_seen, sum_cm, sum_r,
       CAST(ROUND(CAST(sum_cm AS DOUBLE) / sum_r * 1000, 0)
            AS BIGINT) AS n_hat_x1e3
FROM agg WHERE sum_r > 0
"""


def register_r4fq(queries: dict, oracles: dict) -> None:
    queries.update(
        {
            "jackknife_vocab_richness": q_jackknife_vocab_richness,
            "extremal_index_hourly": q_extremal_index_hourly,
            "schnabel_population_users":
                q_schnabel_population_users,
        }
    )
    oracles.update(
        {
            "jackknife_vocab_richness": JACK_SQL,
            "extremal_index_hourly": EXTREMAL_SQL,
            "schnabel_population_users": SCHNABEL_SQL,
        }
    )
