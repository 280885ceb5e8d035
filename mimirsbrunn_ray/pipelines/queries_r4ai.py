"""Round-4 batch AI: master-data survivorship, keyword-in-context
string search, and week-over-week type deltas.

Exactness discipline: survivorship picks are deterministic (latest by
the composite (ts, event_id) order, per column independently with
null-skipping); KWIC offsets and occurrence counts are exact integers
from vectorized substring kernels; weekly deltas are pure integer
count arithmetic.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from mimirsbrunn_ray.stages.rollup import tree_merge

_DAY_US = 86_400_000_000
_WEEK_US = 7 * _DAY_US


# ---------------------------------------------------------------------------
# survivorship: fuse each user's golden record
# ---------------------------------------------------------------------------


def q_survivorship_user_profile(sf_dir):
    """Record fusion / survivorship: each user's golden record — the
    latest event type by (ts, event_id) AND, INDEPENDENTLY, the latest
    non-null JSON 'k' property (null-skipping per column, the
    master-data-management rule that a stale non-null beats a fresh
    null), plus the observation count. One user hash-bucket shuffle;
    per-bucket vectorized column-wise argmax over each user series."""
    from mimirsbrunn_ray.functions.jsonx import extract_int_key
    from mimirsbrunn_ray.stages.dedup import _BUCKET, add_bucket

    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "ts", "event_id", "event_type", "props"],
    )

    def project(b: pa.Table) -> pa.Table:
        b = b.filter(
            pc.and_(pc.is_valid(b["user_id"]), pc.is_valid(b["ts"]))
        )
        k = extract_int_key(b["props"], "k")
        t = pa.table(
            {
                "user_id": b["user_id"],
                "ts": b["ts"],
                "event_id": b["event_id"],
                "event_type": b["event_type"],
                "k": k,
            }
        )
        return add_bucket(t, "user_id", 64)

    proj = ev.map_batches(project, batch_format="pyarrow", batch_size=None)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "user_id": pd.Series([], dtype=np.int64),
                "n_events": pd.Series([], dtype=np.int64),
                "last_type": pd.Series([], dtype=object),
                "last_k": pd.Series([], dtype="Int64"),
            }
        )
        if len(g) == 0:
            return empty
        g = g.sort_values(
            ["user_id", "ts", "event_id"], kind="mergesort",
            ignore_index=True,
        )
        gg = g.groupby("user_id", sort=True)
        last_type = gg["event_type"].last()
        n = gg.size()
        # null-skipping per column: the latest NON-NULL k; users with no
        # k at all carry the -1 sentinel (keeps the column plain int64 —
        # nullable extension dtypes trip pandas-level compares downstream)
        last_k = gg["k"].last()  # pandas last() skips NaN
        out = pd.DataFrame(
            {
                "user_id": n.index.to_numpy(dtype=np.int64),
                "n_events": n.to_numpy(dtype=np.int64),
                "last_type": last_type.fillna("").to_numpy(),
                "last_k": last_k.fillna(-1).to_numpy(dtype=np.int64),
            }
        )
        return out

    fused = proj.groupby(_BUCKET).map_groups(
        per_bucket, batch_format="pandas"
    )
    # normalize blocks to Arrow so the nullable last_k is an int64-with-
    # nulls column (downstream pandas sees float64/NaN, matching the SQL
    # twin), not a pandas Int64 extension dtype
    return fused.map_batches(
        lambda b: b.select(["user_id", "n_events", "last_type", "last_k"]),
        batch_format="pyarrow",
        batch_size=None,
    )


SURVIVORSHIP_SQL = """
WITH e AS MATERIALIZED (
  SELECT user_id, ts, event_id, event_type,
         CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
), lt AS (
  SELECT user_id, event_type AS last_type
  FROM e WHERE event_type IS NOT NULL
  QUALIFY ROW_NUMBER()
    OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1
), lk AS (
  SELECT user_id, k AS last_k
  FROM e WHERE k IS NOT NULL
  QUALIFY ROW_NUMBER()
    OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1
), n AS (
  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events
  FROM e GROUP BY 1
)
SELECT n.user_id, n.n_events,
       COALESCE(lt.last_type, '') AS last_type,
       CAST(COALESCE(lk.last_k, -1) AS BIGINT) AS last_k
FROM n
LEFT JOIN lt USING (user_id)
LEFT JOIN lk USING (user_id)
"""


# ---------------------------------------------------------------------------
# keyword-in-context: term offsets and occurrence counts
# ---------------------------------------------------------------------------

_KWIC_TERM = "data"


def q_kwic_term_offsets(sf_dir):
    """Keyword-in-context search for a literal term: every document
    containing `_KWIC_TERM` (case-sensitive), with the 1-based byte
    offset of the FIRST occurrence and the total occurrence count —
    the retrieval primitive behind snippet highlighting. One streaming
    pass of vectorized substring kernels (find_substring /
    count_substring); no Python row loop, no shuffle."""
    docs = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )

    def batch(b: pa.Table) -> pa.Table:
        b = b.filter(
            pc.and_(pc.is_valid(b["doc_id"]), pc.is_valid(b["text"]))
        )
        empty = pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "first_pos": pa.array([], pa.int64()),
                "n_occurrences": pa.array([], pa.int64()),
            }
        )
        if b.num_rows == 0:
            return empty
        pos0 = pc.find_substring(b["text"], _KWIC_TERM)  # -1 = miss
        cnt = pc.count_substring(b["text"], _KWIC_TERM)
        hit = pc.greater_equal(pos0, 0)
        t = pa.table(
            {
                "doc_id": b["doc_id"].cast(pa.int64()),
                "first_pos": pc.add(pos0.cast(pa.int64()), 1),
                "n_occurrences": cnt.cast(pa.int64()),
            }
        ).filter(hit)
        return t

    return docs.map_batches(batch, batch_format="pyarrow", batch_size=None)


KWIC_SQL = f"""
SELECT doc_id,
       CAST(strpos(text, '{_KWIC_TERM}') AS BIGINT) AS first_pos,
       CAST((length(text)
             - length(replace(text, '{_KWIC_TERM}', '')))
            // length('{_KWIC_TERM}') AS BIGINT) AS n_occurrences
FROM documents
WHERE text IS NOT NULL AND doc_id IS NOT NULL
  AND strpos(text, '{_KWIC_TERM}') > 0
"""


# ---------------------------------------------------------------------------
# week-over-week event-count deltas per type
# ---------------------------------------------------------------------------


def q_wow_type_changes(sf_dir):
    """Per (event type, epoch week): event count, the previous week's
    count, and the exact integer delta — the week-over-week movement
    table a growth dashboard plots. One decomposable weekly count pass
    (bounded by types x weeks); the previous-week attach is an integer
    week-index shift over that bounded table."""
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
        wk = np.floor_divide(ts_us, _WEEK_US)
        t = pa.table({"event_type": b["event_type"], "wk": pa.array(wk)})
        g = t.group_by(["event_type", "wk"]).aggregate([([], "count_all")])
        g = g.select(["event_type", "wk", "count_all"])
        return g.rename_columns(["event_type", "wk", "n"])

    def combine(b: pa.Table) -> pa.Table:
        g = b.group_by(["event_type", "wk"]).aggregate([("n", "sum")])
        return g.rename_columns(["event_type", "wk", "n"])

    weekly = tree_merge(
        ev.map_batches(partial, batch_format="pyarrow", batch_size=None),
        combine,
    ).to_pandas()  # bounded: types x weeks

    if not len(weekly):
        return pa.table(
            {
                "event_type": pa.array([], pa.string()),
                "week_idx": pa.array([], pa.int64()),
                "n": pa.array([], pa.int64()),
                "prev_n": pa.array([], pa.int64()),
                "delta": pa.array([], pa.int64()),
            }
        )
    weekly = weekly.sort_values(["event_type", "wk"], ignore_index=True)
    key = list(zip(weekly["event_type"], weekly["wk"].astype(np.int64)))
    nmap = dict(zip(key, weekly["n"].astype(np.int64)))
    prev = np.array(
        [
            nmap.get((et, int(w) - 1), 0)
            for et, w in zip(weekly["event_type"],
                             weekly["wk"].astype(np.int64))
        ],
        dtype=np.int64,
    )
    n = weekly["n"].to_numpy(dtype=np.int64)
    return pa.table(
        {
            "event_type": pa.array(weekly["event_type"], pa.string()),
            "week_idx": pa.array(weekly["wk"].to_numpy(dtype=np.int64)),
            "n": pa.array(n),
            "prev_n": pa.array(prev),
            "delta": pa.array(n - prev),
        }
    )


WOW_SQL = """
WITH w AS (
  SELECT event_type,
         CAST(FLOOR(epoch(ts) / 604800) AS BIGINT) AS wk,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM events
  WHERE event_type IS NOT NULL AND ts IS NOT NULL
  GROUP BY 1, 2
)
SELECT a.event_type, a.wk AS week_idx, a.n,
       CAST(COALESCE(b.n, 0) AS BIGINT) AS prev_n,
       CAST(a.n - COALESCE(b.n, 0) AS BIGINT) AS delta
FROM w a LEFT JOIN w b ON b.event_type = a.event_type AND b.wk = a.wk - 1
"""


def register_r4ai(queries: dict, oracles: dict) -> None:
    queries.update(
        {
            "survivorship_user_profile": q_survivorship_user_profile,
            "kwic_term_offsets": q_kwic_term_offsets,
            "wow_type_changes": q_wow_type_changes,
        }
    )
    oracles.update(
        {
            "survivorship_user_profile": SURVIVORSHIP_SQL,
            "kwic_term_offsets": KWIC_SQL,
            "wow_type_changes": WOW_SQL,
        }
    )
