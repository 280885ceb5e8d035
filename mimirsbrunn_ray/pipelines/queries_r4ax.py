"""Round-4 batch AX: dataset split manifests, boilerplate prefix
groups, and assisted purchases.

Exactness discipline: split assignment is doc_id modulo arithmetic
(engine-independent); prefix groups key on exact 20-char substrings;
the assist window is exact microsecond interval arithmetic with
composite-order tie rules.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from mimirsbrunn_ray.stages.rollup import tree_merge

_HOUR_US = 3_600_000_000


# ---------------------------------------------------------------------------
# train/val/test split manifest with stratification balance
# ---------------------------------------------------------------------------


def q_train_val_test_balance(sf_dir):
    """The dataset-split manifest: docs assigned 8/1/1 to
    train/val/test by doc_id % 10 (deterministic, engine-independent,
    resumable), cross-tabbed by language with exact char totals — the
    stratification-balance audit run before any training job. One
    decomposable pass, bounded (3 x languages) output."""
    docs = rd.read_parquet(
        f"{sf_dir}/documents.parquet",
        columns=["doc_id", "lang", "n_chars"],
    )

    def partial(b: pa.Table) -> pa.Table:
        b = b.filter(
            pc.and_(
                pc.and_(pc.is_valid(b["doc_id"]), pc.is_valid(b["lang"])),
                pc.is_valid(b["n_chars"]),
            )
        )
        did = b["doc_id"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        m = did % 10
        split = np.where(m < 8, "train", np.where(m == 8, "val", "test"))
        t = pa.table(
            {
                "split": pa.array(split),
                "lang": b["lang"],
                "n_chars": b["n_chars"].cast(pa.int64()),
            }
        )
        g = t.group_by(["split", "lang"]).aggregate(
            [([], "count_all"), ("n_chars", "sum")]
        )
        g = g.select(["split", "lang", "count_all", "n_chars_sum"])
        return g.rename_columns(["split", "lang", "n_docs", "sum_chars"])

    def combine(b: pa.Table) -> pa.Table:
        g = b.group_by(["split", "lang"]).aggregate(
            [("n_docs", "sum"), ("sum_chars", "sum")]
        )
        return g.rename_columns(["split", "lang", "n_docs", "sum_chars"])

    return tree_merge(
        docs.map_batches(partial, batch_format="pyarrow", batch_size=None),
        combine,
    )


SPLIT_BALANCE_SQL = """
SELECT CASE WHEN doc_id % 10 < 8 THEN 'train'
            WHEN doc_id % 10 = 8 THEN 'val'
            ELSE 'test' END AS split,
       lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars
FROM documents
WHERE doc_id IS NOT NULL AND lang IS NOT NULL AND n_chars IS NOT NULL
GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# boilerplate detection: common 20-char prefixes
# ---------------------------------------------------------------------------

_PREFIX_LEN = 20
_PREFIX_TOPK = 10


def q_common_prefix_groups(sf_dir):
    """The `_PREFIX_TOPK` most common `_PREFIX_LEN`-char document
    prefixes shared by 2+ docs — the boilerplate/template detector
    (shared openings usually mean injected headers or scaffolding a
    curation pass should strip). One prefix-key shuffle of combiner
    partials; ties by prefix text."""
    docs = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )

    def partial(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_valid(b["text"]))
        pre = pc.utf8_slice_codeunits(b["text"], 0, _PREFIX_LEN)
        t = pa.table({"prefix": pre})
        g = t.group_by(["prefix"]).aggregate([([], "count_all")])
        g = g.select(["prefix", "count_all"])
        return g.rename_columns(["prefix", "n_docs"])

    def combine(b: pa.Table) -> pa.Table:
        g = b.group_by(["prefix"]).aggregate([("n_docs", "sum")])
        return g.rename_columns(["prefix", "n_docs"])

    totals = tree_merge(
        docs.map_batches(partial, batch_format="pyarrow", batch_size=None),
        combine,
        final_shards=8,
        shard_cols=["prefix"],
    )
    order = [("n_docs", "descending"), ("prefix", "ascending")]

    def topk(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "prefix" not in b.column_names:
            return pa.table(
                {
                    "prefix": pa.array([], pa.string()),
                    "n_docs": pa.array([], pa.int64()),
                }
            )
        b = b.filter(pc.greater_equal(b["n_docs"], 2))
        return b.sort_by(order).slice(0, _PREFIX_TOPK)

    return tree_merge(
        totals.map_batches(topk, batch_format="pyarrow", batch_size=None),
        topk,
    )


PREFIX_GROUPS_SQL = f"""
SELECT substr(text, 1, {_PREFIX_LEN}) AS prefix,
       CAST(COUNT(*) AS BIGINT) AS n_docs
FROM documents WHERE text IS NOT NULL
GROUP BY 1
HAVING COUNT(*) >= 2
ORDER BY n_docs DESC, prefix
LIMIT {_PREFIX_TOPK}
"""


# ---------------------------------------------------------------------------
# assisted purchases: clicks within the preceding hour
# ---------------------------------------------------------------------------

_ASSIST_MIN_CLICKS = 2


def q_assisted_purchase_rate(sf_dir):
    """How many purchases were ASSISTED — preceded by at least
    `_ASSIST_MIN_CLICKS` clicks from the same user inside the prior
    hour (strictly before, composite (ts, event_id) order) — vs
    unassisted, plus the total prior-hour click count over assisted
    ones. One user hash-bucket shuffle; per-series vectorized
    searchsorted window counts; bounded counter merge."""
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
                "n_purchases": pd.Series([], dtype=np.int64),
                "n_assisted": pd.Series([], dtype=np.int64),
                "assist_clicks": pd.Series([], dtype=np.int64),
            }
        )
        if len(g) == 0:
            return empty
        g, _ = _series_segments(g, "user_id", "ts", "event_id")
        n_p = 0
        n_a = 0
        total_clicks = 0
        for _, u in g.groupby("user_id", sort=False):
            et = u["event_type"].to_numpy()
            ts_us = u["ts"].to_numpy(
                dtype="datetime64[us]"
            ).astype(np.int64)
            cl = ts_us[et == "click"]
            pu = ts_us[et == "purchase"]
            if not len(pu):
                continue
            n_p += len(pu)
            lo = np.searchsorted(cl, pu - _HOUR_US, side="left")
            hi = np.searchsorted(cl, pu, side="left")  # strictly before
            k = hi - lo
            hit = k >= _ASSIST_MIN_CLICKS
            n_a += int(hit.sum())
            total_clicks += int(k[hit].sum())
        return pd.DataFrame(
            {
                "n_purchases": pd.Series([n_p], dtype=np.int64),
                "n_assisted": pd.Series([n_a], dtype=np.int64),
                "assist_clicks": pd.Series([total_clicks],
                                           dtype=np.int64),
            }
        )

    partials = proj.groupby(_BUCKET).map_groups(
        per_bucket, batch_format="pandas"
    )

    def combine(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                c: pa.array([pc.sum(b[c]).as_py() or 0], pa.int64())
                for c in b.column_names
            }
        )

    return tree_merge(partials, combine)


ASSIST_SQL = f"""
WITH p AS MATERIALIZED (
  SELECT user_id, ts, event_id FROM events
  WHERE event_type = 'purchase'
    AND user_id IS NOT NULL AND ts IS NOT NULL
), c AS MATERIALIZED (
  SELECT user_id, ts FROM events
  WHERE event_type = 'click'
    AND user_id IS NOT NULL AND ts IS NOT NULL
), k AS (
  -- event_id keeps same-timestamp purchases as separate rows
  SELECT p.user_id, p.ts, p.event_id,
         CAST(COUNT(c.ts) AS BIGINT) AS n_clicks
  FROM p LEFT JOIN c
    ON c.user_id = p.user_id
   AND c.ts < p.ts
   AND c.ts >= p.ts - INTERVAL 1 HOUR
  GROUP BY 1, 2, 3
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_purchases,
       CAST(SUM(CASE WHEN n_clicks >= {_ASSIST_MIN_CLICKS}
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_assisted,
       CAST(SUM(CASE WHEN n_clicks >= {_ASSIST_MIN_CLICKS}
                     THEN n_clicks ELSE 0 END) AS BIGINT)
         AS assist_clicks
FROM k
"""


def register_r4ax(queries: dict, oracles: dict) -> None:
    queries.update(
        {
            "train_val_test_balance": q_train_val_test_balance,
            "common_prefix_groups": q_common_prefix_groups,
            "assisted_purchase_rate": q_assisted_purchase_rate,
        }
    )
    oracles.update(
        {
            "train_val_test_balance": SPLIT_BALANCE_SQL,
            "common_prefix_groups": PREFIX_GROUPS_SQL,
            "assisted_purchase_rate": ASSIST_SQL,
        }
    )
