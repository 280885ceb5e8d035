"""Round-4 batch BE: transition entropy rate, term burstiness, and
conversion by session depth.

Exactness discipline: the entropy rate is the identical double
expression over exact transition counts (ln parity, rounded once);
burstiness ships raw integer moments; session bands use the repo-wide
30-minute strict-gap islands with (ts, event_id) order, and band
membership is integer comparison.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from mimirsbrunn_ray.stages.rollup import tree_merge

_GAP_US = 30 * 60_000_000


def _round_half_away(x: np.ndarray) -> np.ndarray:
    return np.where(
        x >= 0, np.floor(x + 0.5), np.ceil(x - 0.5)
    ).astype(np.int64)


# ---------------------------------------------------------------------------
# conditional entropy rate of the event-type Markov chain
# ---------------------------------------------------------------------------


def q_transition_entropy_rate(sf_dir):
    """The conditional entropy H(next type | current type) of the
    event-type transition chain, in fixed-point micro-nats — how
    predictable the next action is given the current one (0 =
    deterministic flows; ln(#types) = memoryless). Per from-type:
    H_x = sum_y -(c_xy/c_x) ln(c_xy/c_x); the rate is the
    count-weighted mean. Transition counts ride the same one-shuffle
    user-series pass as event_type_markov; the entropy is one
    identical double expression over the bounded matrix."""
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
                "f": pd.Series([], dtype=object),
                "t": pd.Series([], dtype=object),
                "n": pd.Series([], dtype=np.int64),
            }
        )
        if len(g) == 0:
            return empty
        g, same = _series_segments(g, "user_id", "ts", "event_id")
        t = g["event_type"].to_numpy()
        idx = np.nonzero(same)[0]
        if len(idx) == 0:
            return empty
        df = pd.DataFrame({"f": t[idx - 1], "t": t[idx]})
        agg = df.groupby(["f", "t"], sort=False, as_index=False).size()
        agg = agg.rename(columns={"size": "n"})
        agg["n"] = agg["n"].astype(np.int64)
        return agg

    partials = proj.groupby(_BUCKET).map_groups(
        per_bucket, batch_format="pandas"
    )

    def combine(b: pa.Table) -> pa.Table:
        g = b.group_by(["f", "t"]).aggregate([("n", "sum")])
        return g.rename_columns(["f", "t", "n"])

    m = tree_merge(partials, combine).to_pandas()
    # bounded: #types^2

    rows = {"from_type": [], "n_transitions": [],
            "cond_entropy_x1e6": []}
    total_n = 0
    weighted = 0.0
    if len(m):
        for f, g in m.groupby("f", sort=True):
            c = g["n"].to_numpy(dtype=np.int64)
            n = int(c.sum())
            p = c.astype(np.float64) / n
            h = float(np.sum(-p * np.log(p)))
            rows["from_type"].append(f)
            rows["n_transitions"].append(n)
            rows["cond_entropy_x1e6"].append(
                int(_round_half_away(np.array([h * 1e6]))[0])
            )
            total_n += n
            weighted += n * h
    # the rate row uses the reserved label '' (sorts first)
    rows["from_type"].append("")
    rows["n_transitions"].append(total_n)
    rows["cond_entropy_x1e6"].append(
        int(
            _round_half_away(
                np.array([(weighted / total_n if total_n else 0.0) * 1e6])
            )[0]
        )
    )
    return pa.table(
        {
            "from_type": pa.array(rows["from_type"], pa.string()),
            "n_transitions": pa.array(rows["n_transitions"], pa.int64()),
            "cond_entropy_x1e6": pa.array(
                rows["cond_entropy_x1e6"], pa.int64()
            ),
        }
    )


ENTROPY_RATE_SQL = """
WITH s AS MATERIALIZED (
  SELECT user_id, event_type AS f,
         LEAD(event_type)
           OVER (PARTITION BY user_id ORDER BY ts, event_id) AS t
  FROM events
  WHERE user_id IS NOT NULL AND ts IS NOT NULL
    AND event_type IS NOT NULL
), c AS (
  SELECT f, t, CAST(COUNT(*) AS BIGINT) AS n
  FROM s WHERE t IS NOT NULL GROUP BY 1, 2
), agg AS (
  SELECT f AS from_type,
         CAST(SUM(n) AS BIGINT) AS n_transitions,
         SUM(-(n * 1.0 / tot) * LN(n * 1.0 / tot)) AS h
  FROM (SELECT f, t, n,
               CAST(SUM(n) OVER (PARTITION BY f) AS BIGINT) AS tot
        FROM c)
  GROUP BY 1
)
SELECT from_type, n_transitions,
       CAST(ROUND(h * 1000000, 0) AS BIGINT) AS cond_entropy_x1e6
FROM agg
UNION ALL
SELECT '', CAST(SUM(n_transitions) AS BIGINT),
       CAST(ROUND(SUM(n_transitions * h) / SUM(n_transitions)
                  * 1000000, 0) AS BIGINT)
FROM agg
"""


# ---------------------------------------------------------------------------
# term burstiness for the top document-frequency terms
# ---------------------------------------------------------------------------

_BURST_TOP = 10


def q_term_burstiness_top(sf_dir):
    """For the corpus's `_BURST_TOP` most document-frequent terms: the
    integer moments of their per-document occurrence counts (docs
    containing it, total occurrences, sum of squared occurrences) —
    Katz burstiness (var/mean over containing docs) is derivable from
    the emitted integers. Candidate terms come from one df pass; the
    moment pass is vectorized per batch (one isin mask per candidate,
    bounded by the candidate list)."""
    docs = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )

    def df_partial(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_valid(b["text"]))
        words = pc.split_pattern(pc.utf8_lower(b["text"]), " ")
        n_per = pc.list_value_length(words).to_numpy(zero_copy_only=False)
        flat = pc.list_flatten(words).to_numpy(zero_copy_only=False)
        seg = np.repeat(np.arange(len(b)), n_per)
        dd = pd.DataFrame({"seg": seg, "w": flat}).drop_duplicates()
        agg = dd.groupby("w", sort=False).size()
        return pa.table(
            {
                "w": pa.array(agg.index.to_numpy()),
                "df": pa.array(agg.to_numpy(dtype=np.int64)),
            }
        )

    def df_combine(b: pa.Table) -> pa.Table:
        g = b.group_by(["w"]).aggregate([("df", "sum")])
        return g.rename_columns(["w", "df"])

    dfs = tree_merge(
        docs.map_batches(df_partial, batch_format="pyarrow",
                         batch_size=None),
        df_combine,
    ).to_pandas()
    if not len(dfs):
        return pa.table(
            {
                "term": pa.array([], pa.string()),
                "n_docs": pa.array([], pa.int64()),
                "total_occ": pa.array([], pa.int64()),
                "sum_sq_occ": pa.array([], pa.int64()),
            }
        )
    cand = (
        dfs.sort_values(["df", "w"], ascending=[False, True])
        .head(_BURST_TOP)["w"]
        .tolist()
    )

    def moment_partial(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_valid(b["text"]))
        empty = pa.table(
            {
                "term": pa.array([], pa.string()),
                "n_docs": pa.array([], pa.int64()),
                "total_occ": pa.array([], pa.int64()),
                "sum_sq_occ": pa.array([], pa.int64()),
            }
        )
        if b.num_rows == 0:
            return empty
        words = pc.split_pattern(pc.utf8_lower(b["text"]), " ")
        n_per = pc.list_value_length(words).to_numpy(zero_copy_only=False)
        flat = pc.list_flatten(words).to_numpy(zero_copy_only=False)
        seg = np.repeat(np.arange(len(b)), n_per)
        rows = {"term": [], "n_docs": [], "total_occ": [],
                "sum_sq_occ": []}
        for t in cand:
            tf = np.bincount(seg[flat == t], minlength=len(b))
            nz = tf > 0
            rows["term"].append(t)
            rows["n_docs"].append(int(nz.sum()))
            rows["total_occ"].append(int(tf.sum()))
            rows["sum_sq_occ"].append(int(np.dot(tf, tf)))
        return pa.table(
            {
                "term": pa.array(rows["term"], pa.string()),
                "n_docs": pa.array(rows["n_docs"], pa.int64()),
                "total_occ": pa.array(rows["total_occ"], pa.int64()),
                "sum_sq_occ": pa.array(rows["sum_sq_occ"], pa.int64()),
            }
        )

    def combine(b: pa.Table) -> pa.Table:
        g = b.group_by(["term"]).aggregate(
            [("n_docs", "sum"), ("total_occ", "sum"),
             ("sum_sq_occ", "sum")]
        )
        return g.rename_columns(
            ["term", "n_docs", "total_occ", "sum_sq_occ"]
        )

    return tree_merge(
        docs.map_batches(moment_partial, batch_format="pyarrow",
                         batch_size=None),
        combine,
    )


def _burst_sql(top: int) -> str:
    return f"""
WITH d AS MATERIALIZED (
  SELECT doc_id, string_split(lower(text), ' ') AS ws
  FROM documents WHERE text IS NOT NULL
), w AS (
  SELECT doc_id, unnest(ws) AS w FROM d
), df AS (
  SELECT w, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
  FROM w GROUP BY 1
), top AS (
  SELECT w FROM df ORDER BY df DESC, w LIMIT {top}
), tf AS (
  SELECT w.w AS term, w.doc_id, CAST(COUNT(*) AS BIGINT) AS tf
  FROM w JOIN top ON top.w = w.w
  GROUP BY 1, 2
)
SELECT term, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(tf) AS BIGINT) AS total_occ,
       CAST(SUM(tf * tf) AS BIGINT) AS sum_sq_occ
FROM tf GROUP BY 1
"""


# ---------------------------------------------------------------------------
# conversion rate by session depth band
# ---------------------------------------------------------------------------

_DEPTH_EDGES = (1, 4, 9)  # bands: ==1, 2-4, 5-9, 10+


def q_conversion_by_session_depth(sf_dir):
    """Purchase conversion by SESSION DEPTH band: sessions (30-minute
    strict-gap islands per user, the repo-wide rule) banded by event
    count (1, 2-4, 5-9, 10+), counting sessions and how many contain a
    purchase — does engagement depth buy conversion? One user
    hash-bucket shuffle; islands and bands resolve vectorized inside
    each series; integer band edges."""
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
    edges = np.array(_DEPTH_EDGES, dtype=np.int64)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "band": pd.Series([], dtype=np.int64),
                "n_sessions": pd.Series([], dtype=np.int64),
                "n_converting": pd.Series([], dtype=np.int64),
            }
        )
        if len(g) == 0:
            return empty
        g, same = _series_segments(g, "user_id", "ts", "event_id")
        ts_us = g["ts"].to_numpy(dtype="datetime64[us]").astype(np.int64)
        gap = np.empty(len(g), dtype=np.int64)
        gap[0] = np.iinfo(np.int64).max
        if len(g) > 1:
            gap[1:] = ts_us[1:] - ts_us[:-1]
        new_s = (~same) | (gap > _GAP_US)
        sid = np.cumsum(new_s)  # global session ids within the bucket
        isp = (g["event_type"].to_numpy() == "purchase").astype(np.int64)
        df = pd.DataFrame({"sid": sid, "one": 1, "p": isp})
        s = df.groupby("sid").agg(
            depth=("one", "sum"), has_p=("p", "max")
        )
        band = np.searchsorted(
            edges, s["depth"].to_numpy(dtype=np.int64), side="left"
        )
        out = pd.DataFrame(
            {"band": band.astype(np.int64),
             "has_p": s["has_p"].to_numpy(dtype=np.int64)}
        )
        agg = out.groupby("band").agg(
            n_sessions=("has_p", "size"), n_converting=("has_p", "sum")
        ).reset_index()
        for c in agg.columns:
            agg[c] = agg[c].astype(np.int64)
        return agg

    partials = proj.groupby(_BUCKET).map_groups(
        per_bucket, batch_format="pandas"
    )

    def combine(b: pa.Table) -> pa.Table:
        g = b.group_by(["band"]).aggregate(
            [("n_sessions", "sum"), ("n_converting", "sum")]
        )
        return g.rename_columns(["band", "n_sessions", "n_converting"])

    return tree_merge(partials, combine)


DEPTH_SQL = """
WITH e AS MATERIALIZED (
  SELECT user_id, ts, event_id, event_type,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS new_s
  FROM events
  WHERE user_id IS NOT NULL AND ts IS NOT NULL
    AND event_type IS NOT NULL
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), s AS (
  SELECT user_id, event_type,
         SUM(new_s) OVER (PARTITION BY user_id
                          ORDER BY ts, event_id) AS sid
  FROM e
), per_session AS (
  SELECT user_id, sid, CAST(COUNT(*) AS BIGINT) AS depth,
         CAST(MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
              AS BIGINT) AS has_p
  FROM s GROUP BY 1, 2
)
SELECT CAST(CASE WHEN depth <= 1 THEN 0
                 WHEN depth <= 4 THEN 1
                 WHEN depth <= 9 THEN 2
                 ELSE 3 END AS BIGINT) AS band,
       CAST(COUNT(*) AS BIGINT) AS n_sessions,
       CAST(SUM(has_p) AS BIGINT) AS n_converting
FROM per_session GROUP BY 1
"""


def register_r4be(queries: dict, oracles: dict) -> None:
    queries.update(
        {
            "transition_entropy_rate": q_transition_entropy_rate,
            "term_burstiness_top": q_term_burstiness_top,
            "conversion_by_session_depth": q_conversion_by_session_depth,
        }
    )
    oracles.update(
        {
            "transition_entropy_rate": ENTROPY_RATE_SQL,
            "term_burstiness_top": _burst_sql(_BURST_TOP),
            "conversion_by_session_depth": DEPTH_SQL,
        }
    )
