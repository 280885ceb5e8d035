"""Round-4 batch W: dedup blocking-key efficiency audit and the
session entry/exit navigation matrix.

Exactness discipline: pure integer counts; blocking keys and session
boundaries are deterministic under timestamp ties (event_id
tie-break / character-based prefixes identical across engines).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from mimirsbrunn_ray.stages.dedup import _BUCKET, add_bucket
from mimirsbrunn_ray.stages.rollup import tree_merge

_SESSION_GAP_US = 30 * 60 * 1_000_000


def _not_null(b: pa.Table, cols) -> pa.Table:
    m = None
    for c in cols:
        v = pc.is_valid(b[c])
        m = v if m is None else pc.and_(m, v)
    return b.filter(m)


# ---------------------------------------------------------------------------
# dedup blocking-key efficiency audit
# ---------------------------------------------------------------------------


def q_blocking_key_stats(sf_dir):
    """One-row audit of the classic (length, 16-char-prefix) dedup
    blocking key: total keys, keys holding >= 2 documents, and the
    candidate-pair count sum(C(c, 2)) the verifier stage would face —
    the selectivity check run BEFORE committing to a blocking scheme
    (too many pairs = the key is too coarse). Batch-local key counts,
    ONE key-hash bucket shuffle, per-bucket exact sizes -> constant-
    size partial stats, tree merge."""
    docs = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["n_chars", "text"]
    )

    def partial(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_valid(b["n_chars"]))
        prefix = pc.utf8_slice_codeunits(
            pc.fill_null(b["text"], ""), 0, 16
        )
        key = pc.binary_join_element_wise(
            pc.cast(b["n_chars"], pa.string()), prefix, "|"
        )
        t = pa.table({"k": key})
        g = t.group_by(["k"]).aggregate([([], "count_all")])
        return add_bucket(
            g.select(["k", "count_all"]).rename_columns(["k", "c"]),
            "k",
            64,
        )

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "n_keys": pd.Series([], dtype=np.int64),
                "n_keys_multi": pd.Series([], dtype=np.int64),
                "n_candidate_pairs": pd.Series([], dtype=np.int64),
                "n_docs": pd.Series([], dtype=np.int64),
            }
        )
        if len(g) == 0:
            return empty
        sizes = g.groupby("k", sort=False)["c"].sum().to_numpy(
            dtype=np.int64
        )
        return pd.DataFrame(
            {
                "n_keys": pd.Series([len(sizes)], dtype=np.int64),
                "n_keys_multi": pd.Series(
                    [int((sizes >= 2).sum())], dtype=np.int64
                ),
                "n_candidate_pairs": pd.Series(
                    [int((sizes * (sizes - 1) // 2).sum())], dtype=np.int64
                ),
                "n_docs": pd.Series([int(sizes.sum())], dtype=np.int64),
            }
        )

    def combine(b: pa.Table) -> pa.Table:
        cols = {}
        for c in ("n_keys", "n_keys_multi", "n_candidate_pairs", "n_docs"):
            cols[c] = pa.array([pc.sum(b[c]).as_py() or 0], pa.int64())
        return pa.table(cols)

    tot = tree_merge(
        docs.map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby(_BUCKET)
        .map_groups(per_bucket, batch_format="pandas"),
        combine,
    ).to_pandas()
    out = {}
    for c in ("n_keys", "n_keys_multi", "n_candidate_pairs", "n_docs"):
        out[c] = pa.array(
            [int(tot[c].sum()) if c in tot.columns else 0], pa.int64()
        )
    return pa.table(out)


BLOCKING_SQL = """
WITH k AS (
  SELECT n_chars, substr(COALESCE(text, ''), 1, 16) AS p,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM documents WHERE n_chars IS NOT NULL GROUP BY 1, 2
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_keys,
       CAST(SUM(CASE WHEN c >= 2 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_keys_multi,
       CAST(SUM(c * (c - 1) // 2) AS BIGINT) AS n_candidate_pairs,
       CAST(SUM(c) AS BIGINT) AS n_docs
FROM k
"""


# ---------------------------------------------------------------------------
# session entry/exit navigation matrix
# ---------------------------------------------------------------------------


def q_session_entry_exit_matrix(sf_dir):
    """Navigation-flow matrix: per (entry event type, exit event type),
    how many 30-minute-gap sessions start with the one and end with the
    other ((ts, event_id) order makes first/last deterministic under
    timestamp ties) — the landing/leaving behavior readout. One
    user-hash bucket shuffle; islands and their boundary rows resolve
    locally; the (types x types)-bounded matrix tree-merges."""
    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "ts", "event_id", "event_type"],
    )

    def project(b: pa.Table) -> pa.Table:
        b = _not_null(b, ("user_id", "ts", "event_id", "event_type"))
        t = pa.table(
            {
                "user_id": b["user_id"],
                "us": b["ts"].cast(pa.timestamp("us")).cast(pa.int64()),
                "event_id": b["event_id"],
                "event_type": b["event_type"],
            }
        )
        return add_bucket(t, "user_id", 64)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "entry_type": pd.Series([], dtype=object),
                "exit_type": pd.Series([], dtype=object),
                "n_sessions": pd.Series([], dtype=np.int64),
            }
        )
        if len(g) == 0:
            return empty
        g = g.sort_values(
            ["user_id", "us", "event_id"], kind="mergesort",
            ignore_index=True,
        )
        u = g["user_id"].to_numpy()
        us = g["us"].to_numpy(dtype=np.int64)
        new_s = np.empty(len(g), dtype=bool)
        new_s[0] = True
        new_s[1:] = (u[1:] != u[:-1]) | (
            us[1:] - us[:-1] > _SESSION_GAP_US
        )
        starts = np.flatnonzero(new_s)
        ends = np.concatenate((starts[1:] - 1, [len(g) - 1]))
        et = g["event_type"].to_numpy()
        t = pd.DataFrame(
            {"entry_type": et[starts], "exit_type": et[ends]}
        )
        agg = (
            t.groupby(["entry_type", "exit_type"], sort=False)
            .size()
            .reset_index(name="n_sessions")
        )
        agg["n_sessions"] = agg["n_sessions"].astype(np.int64)
        return agg

    def combine(b: pa.Table) -> pa.Table:
        g = b.group_by(["entry_type", "exit_type"]).aggregate(
            [("n_sessions", "sum")]
        )
        g = g.select(["entry_type", "exit_type", "n_sessions_sum"])
        return g.rename_columns(["entry_type", "exit_type", "n_sessions"])

    out = tree_merge(
        ev.map_batches(project, batch_format="pyarrow", batch_size=None)
        .groupby(_BUCKET)
        .map_groups(per_bucket, batch_format="pandas"),
        combine,
    )

    def finish(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "entry_type": b["entry_type"],
                "exit_type": b["exit_type"],
                "n_sessions": b["n_sessions"].cast(pa.int64()),
            }
        )

    return out.map_batches(finish, batch_format="pyarrow", batch_size=None)


ENTRY_EXIT_SQL = """
WITH e AS (
  SELECT user_id, ts, event_id, event_type,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS new_s
  FROM events
  WHERE user_id IS NOT NULL AND ts IS NOT NULL
    AND event_id IS NOT NULL AND event_type IS NOT NULL
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), s AS (
  SELECT user_id, ts, event_id, event_type,
         SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
  FROM e
), fe AS (
  SELECT user_id, sid,
         FIRST_VALUE(event_type) OVER ws AS entry_type,
         LAST_VALUE(event_type) OVER
           (PARTITION BY user_id, sid ORDER BY ts, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
           AS exit_type,
         ROW_NUMBER() OVER ws AS rn
  FROM s
  WINDOW ws AS (PARTITION BY user_id, sid ORDER BY ts, event_id)
)
SELECT entry_type, exit_type, CAST(COUNT(*) AS BIGINT) AS n_sessions
FROM fe WHERE rn = 1 GROUP BY 1, 2
"""


def register_r4w(queries: dict, oracles: dict) -> None:
    queries.update(
        {
            "blocking_key_stats": q_blocking_key_stats,
            "session_entry_exit_matrix": q_session_entry_exit_matrix,
        }
    )
    oracles.update(
        {
            "blocking_key_stats": BLOCKING_SQL,
            "session_entry_exit_matrix": ENTRY_EXIT_SQL,
        }
    )
