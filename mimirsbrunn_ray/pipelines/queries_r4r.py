"""Round-4 batch R: traffic concentration (top-10 users), hour-of-week
error hazard grid, per-language exact length quantiles, and the
session-size histogram.

Exactness discipline: counts and integer epoch arithmetic only;
quantiles are PERCENTILE_DISC picks from bounded (group, value) count
tiers, so every emitted number is an exact int64.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from mimirsbrunn_ray.stages.dedup import _BUCKET, add_bucket
from mimirsbrunn_ray.stages.rollup import tree_merge

_DAY_US = 86_400_000_000
_HOUR_US = 3_600_000_000
_SESSION_GAP_US = 30 * 60 * 1_000_000


def _not_null(b: pa.Table, cols) -> pa.Table:
    m = None
    for c in cols:
        v = pc.is_valid(b[c])
        m = v if m is None else pc.and_(m, v)
    return b.filter(m)


# ---------------------------------------------------------------------------
# traffic concentration: share of events from the top-10 users
# ---------------------------------------------------------------------------

_TOP_USERS_K = 10


def q_user_concentration_top10(sf_dir):
    """One-row concentration audit: total events, distinct users, and
    how many events the 10 heaviest users account for (count desc,
    user_id asc on ties) — the CR-k statistic a pipeline owner checks
    before per-user salting decisions. Scale shape: per-user counts are
    combiner-first + user-sharded tree merge; the global top-10 is a
    per-block partial top-k prune (each block forwards <= 10 rows) and
    the totals are a second, constant-size reduction over the SAME
    counts pass."""
    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id"]
    )

    def partial(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_valid(b["user_id"]))
        g = b.group_by(["user_id"]).aggregate([([], "count_all")])
        return g.select(["user_id", "count_all"]).rename_columns(
            ["user_id", "c"]
        )

    def combine(b: pa.Table) -> pa.Table:
        g = b.group_by(["user_id"]).aggregate([("c", "sum")])
        return g.select(["user_id", "c_sum"]).rename_columns(
            ["user_id", "c"]
        )

    counts = tree_merge(
        ev.map_batches(partial, batch_format="pyarrow", batch_size=None),
        combine,
        final_shards=8,
        shard_cols=["user_id"],
    ).materialize()  # reused: totals pass + top-k pass

    def totals(b: pa.Table) -> pa.Table:
        c = b["c"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "n_users": pa.array([len(c)], pa.int64()),
                "n_events": pa.array([int(c.sum())], pa.int64()),
            }
        )

    def combine_tot(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "n_users": pa.array(
                    [pc.sum(b["n_users"]).as_py() or 0], pa.int64()
                ),
                "n_events": pa.array(
                    [pc.sum(b["n_events"]).as_py() or 0], pa.int64()
                ),
            }
        )

    tot = tree_merge(
        counts.map_batches(totals, batch_format="pyarrow", batch_size=None),
        combine_tot,
    ).to_pandas()

    def top_prune(b: pa.Table) -> pa.Table:
        return b.sort_by(
            [("c", "descending"), ("user_id", "ascending")]
        ).slice(0, _TOP_USERS_K)

    top = (
        counts.map_batches(top_prune, batch_format="pyarrow", batch_size=None)
        .repartition(1)
        .map_batches(top_prune, batch_format="pyarrow", batch_size=None)
        .to_pandas()
    )
    n_top = (
        int(top["c"].astype(np.int64).sum()) if "c" in top.columns else 0
    )
    n_users = int(tot["n_users"].sum()) if "n_users" in tot.columns else 0
    n_events = int(tot["n_events"].sum()) if "n_events" in tot.columns else 0
    return pa.table(
        {
            "n_users": pa.array([n_users], pa.int64()),
            "n_events": pa.array([n_events], pa.int64()),
            "n_events_top10": pa.array([n_top], pa.int64()),
        }
    )


CONCENTRATION_SQL = f"""
WITH c AS (
  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS c
  FROM events WHERE user_id IS NOT NULL GROUP BY 1
), r AS (
  SELECT c, ROW_NUMBER() OVER (ORDER BY c DESC, user_id ASC) AS rn FROM c
)
SELECT CAST((SELECT COUNT(*) FROM c) AS BIGINT) AS n_users,
       CAST((SELECT COALESCE(SUM(c), 0) FROM c) AS BIGINT) AS n_events,
       CAST((SELECT COALESCE(SUM(c), 0) FROM r WHERE rn <= {_TOP_USERS_K})
         AS BIGINT) AS n_events_top10
"""


# ---------------------------------------------------------------------------
# hour-of-week error hazard grid
# ---------------------------------------------------------------------------


def q_hourweek_error_rates(sf_dir):
    """Per (day-of-week, hour-of-day) cell: total events and error
    events — the 168-cell hazard grid behind 'errors spike Monday 9am'
    seasonality claims. Weekday is integer epoch arithmetic
    ((epoch_days + 4) % 7, Sunday = 0, matching DuckDB's dayofweek);
    one combiner-first pass, output bounded at 168 rows."""
    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["ts", "event_type"]
    )

    def partial(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_valid(b["ts"]))
        us = (
            b["ts"].cast(pa.timestamp("us")).cast(pa.int64()).to_numpy(
                zero_copy_only=False
            )
        )
        dow = (np.floor_divide(us, _DAY_US) + 4) % 7
        hod = np.floor_divide(us, _HOUR_US) % 24
        err = pc.equal(
            pc.fill_null(b["event_type"], ""), pa.scalar("error")
        ).to_numpy(zero_copy_only=False)
        t = pa.table(
            {
                "dow": pa.array(dow.astype(np.int64)),
                "hod": pa.array(hod.astype(np.int64)),
                "one": pa.array(np.ones(len(us), dtype=np.int64)),
                "e": pa.array(err.astype(np.int64)),
            }
        )
        g = t.group_by(["dow", "hod"]).aggregate(
            [("one", "sum"), ("e", "sum")]
        )
        g = g.select(["dow", "hod", "one_sum", "e_sum"])
        return g.rename_columns(["dow", "hod", "n_events", "n_errors"])

    def combine(b: pa.Table) -> pa.Table:
        g = b.group_by(["dow", "hod"]).aggregate(
            [("n_events", "sum"), ("n_errors", "sum")]
        )
        g = g.select(["dow", "hod", "n_events_sum", "n_errors_sum"])
        return g.rename_columns(["dow", "hod", "n_events", "n_errors"])

    out = tree_merge(
        ev.map_batches(partial, batch_format="pyarrow", batch_size=None),
        combine,
    )

    def finish(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "dow": b["dow"].cast(pa.int64()),
                "hod": b["hod"].cast(pa.int64()),
                "n_events": b["n_events"].cast(pa.int64()),
                "n_errors": b["n_errors"].cast(pa.int64()),
            }
        )

    return out.map_batches(finish, batch_format="pyarrow", batch_size=None)


HOURWEEK_SQL = """
SELECT CAST(dayofweek(ts) AS BIGINT) AS dow,
       CAST(hour(ts) AS BIGINT) AS hod,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
         AS BIGINT) AS n_errors
FROM events WHERE ts IS NOT NULL
GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# per-language exact document-length quantiles
# ---------------------------------------------------------------------------

_LEN_QS = (0.25, 0.5, 0.75)


def q_doc_len_quantiles_per_lang(sf_dir):
    """Per language: document count and exact PERCENTILE_DISC p25/p50/
    p75 of n_chars — the per-partition quantile readout a mixture
    designer reads next to the global one. The (lang, n_chars) count
    tier is bounded (langs x distinct lengths), so the quantile walk
    runs on the tiny final block with zero sort shuffles."""
    docs = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["lang", "n_chars"]
    )

    def partial(b: pa.Table) -> pa.Table:
        b = _not_null(b, ("lang", "n_chars"))
        g = b.group_by(["lang", "n_chars"]).aggregate([([], "count_all")])
        return g.select(["lang", "n_chars", "count_all"]).rename_columns(
            ["lang", "n_chars", "c"]
        )

    def combine(b: pa.Table) -> pa.Table:
        g = b.group_by(["lang", "n_chars"]).aggregate([("c", "sum")])
        return g.select(["lang", "n_chars", "c_sum"]).rename_columns(
            ["lang", "n_chars", "c"]
        )

    hist = tree_merge(
        docs.map_batches(partial, batch_format="pyarrow", batch_size=None),
        combine,
    ).to_pandas()  # bounded: langs x distinct lengths
    if "lang" not in hist.columns:  # fully-empty input short-circuit
        hist = pd.DataFrame({"lang": [], "n_chars": [], "c": []})
    rows = {"lang": [], "n_docs": [], "p25_chars": [], "p50_chars": [],
            "p75_chars": []}
    for lang, sub in hist.groupby("lang", sort=True):
        sub = sub.sort_values("n_chars")
        vals = sub["n_chars"].to_numpy(dtype=np.int64)
        cum = np.cumsum(sub["c"].to_numpy(dtype=np.int64))
        n = int(cum[-1])
        picks = []
        for q in _LEN_QS:
            rank = int(np.ceil(q * n))  # PERCENTILE_DISC rank rule
            picks.append(int(vals[np.searchsorted(cum, rank, side="left")]))
        rows["lang"].append(lang)
        rows["n_docs"].append(n)
        rows["p25_chars"].append(picks[0])
        rows["p50_chars"].append(picks[1])
        rows["p75_chars"].append(picks[2])
    return pa.table(
        {
            "lang": pa.array(rows["lang"], pa.string()),
            "n_docs": pa.array(rows["n_docs"], pa.int64()),
            "p25_chars": pa.array(rows["p25_chars"], pa.int64()),
            "p50_chars": pa.array(rows["p50_chars"], pa.int64()),
            "p75_chars": pa.array(rows["p75_chars"], pa.int64()),
        }
    )


LEN_QUANTILES_SQL = """
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(PERCENTILE_DISC(0.25) WITHIN GROUP (ORDER BY n_chars)
         AS BIGINT) AS p25_chars,
       CAST(PERCENTILE_DISC(0.5) WITHIN GROUP (ORDER BY n_chars)
         AS BIGINT) AS p50_chars,
       CAST(PERCENTILE_DISC(0.75) WITHIN GROUP (ORDER BY n_chars)
         AS BIGINT) AS p75_chars
FROM documents
WHERE lang IS NOT NULL AND n_chars IS NOT NULL
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# session-size histogram
# ---------------------------------------------------------------------------


def q_session_size_hist(sf_dir):
    """Histogram of session sizes (30-minute-gap sessionization): for
    each event count k, how many sessions contain exactly k events —
    the engagement-depth distribution. Ties in ts never split a
    session (a zero gap is <= the threshold regardless of tie order),
    so the histogram is deterministic. One user-hash bucket shuffle;
    islands and per-bucket partial histograms resolve locally and
    tree-merge."""
    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts"]
    )

    def project(b: pa.Table) -> pa.Table:
        b = _not_null(b, ("user_id", "ts"))
        t = pa.table(
            {
                "user_id": b["user_id"],
                "us": b["ts"].cast(pa.timestamp("us")).cast(pa.int64()),
            }
        )
        return add_bucket(t, "user_id", 64)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "session_size": pd.Series([], dtype=np.int64),
                "n_sessions": pd.Series([], dtype=np.int64),
            }
        )
        if len(g) == 0:
            return empty
        g = g.sort_values(
            ["user_id", "us"], kind="mergesort", ignore_index=True
        )
        u = g["user_id"].to_numpy()
        us = g["us"].to_numpy(dtype=np.int64)
        new_s = np.empty(len(g), dtype=bool)
        new_s[0] = True
        new_s[1:] = (u[1:] != u[:-1]) | (
            us[1:] - us[:-1] > _SESSION_GAP_US
        )
        sid = np.cumsum(new_s)
        sizes = pd.DataFrame({"sid": sid}).groupby("sid").size()
        h = sizes.value_counts()
        return pd.DataFrame(
            {
                "session_size": h.index.to_numpy(dtype=np.int64),
                "n_sessions": h.to_numpy(dtype=np.int64),
            }
        )

    def combine(b: pa.Table) -> pa.Table:
        g = b.group_by(["session_size"]).aggregate([("n_sessions", "sum")])
        g = g.select(["session_size", "n_sessions_sum"])
        return g.rename_columns(["session_size", "n_sessions"])

    out = tree_merge(
        ev.map_batches(project, batch_format="pyarrow", batch_size=None)
        .groupby(_BUCKET)
        .map_groups(per_bucket, batch_format="pandas"),
        combine,
    )

    def finish(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "session_size": b["session_size"].cast(pa.int64()),
                "n_sessions": b["n_sessions"].cast(pa.int64()),
            }
        )

    return out.map_batches(finish, batch_format="pyarrow", batch_size=None)


SESSION_HIST_SQL = """
WITH e AS (
  SELECT user_id, ts,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS new_s
  FROM events
  WHERE user_id IS NOT NULL AND ts IS NOT NULL
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
), s AS (
  SELECT user_id,
         SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
  FROM e
), z AS (
  SELECT user_id, sid, COUNT(*) AS sz FROM s GROUP BY 1, 2
)
SELECT CAST(sz AS BIGINT) AS session_size,
       CAST(COUNT(*) AS BIGINT) AS n_sessions
FROM z GROUP BY 1
"""


def register_r4r(queries: dict, oracles: dict) -> None:
    queries.update(
        {
            "user_concentration_top10": q_user_concentration_top10,
            "hourweek_error_rates": q_hourweek_error_rates,
            "doc_len_quantiles_per_lang": q_doc_len_quantiles_per_lang,
            "session_size_hist": q_session_size_hist,
        }
    )
    oracles.update(
        {
            "user_concentration_top10": CONCENTRATION_SQL,
            "hourweek_error_rates": HOURWEEK_SQL,
            "doc_len_quantiles_per_lang": LEN_QUANTILES_SQL,
            "session_size_hist": SESSION_HIST_SQL,
        }
    )
