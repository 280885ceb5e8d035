"""Round-4 batch AR: U-shaped multi-touch attribution, type-token-ratio
banding, and max quiet gaps.

Exactness discipline: attribution weights are basis-point integers
from the identical ROUND(2000/(k-2)) expression; TTR bands compare
integer cross-multiplications (no division); quiet gaps are integer
minute arithmetic over the bounded activity grid.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from mimirsbrunn_ray.stages.rollup import tree_merge

_MIN_US = 60_000_000
_HOUR_US = 3_600_000_000


def _round_half_away(x: np.ndarray) -> np.ndarray:
    return np.where(
        x >= 0, np.floor(x + 0.5), np.ceil(x - 0.5)
    ).astype(np.int64)


# ---------------------------------------------------------------------------
# U-shaped multi-touch attribution of purchases to click hours
# ---------------------------------------------------------------------------


def q_u_shaped_attribution(sf_dir):
    """U-shaped (position-based) multi-touch attribution: each purchase
    forms a journey of the user's clicks since their previous purchase;
    the first click earns 4000 bp, the last 4000 bp, the middles split
    2000 bp equally (round(2000/(k-2)) each; k=1 -> 10000, k=2 ->
    5000/5000) — credit lands on the CLICK's hour-of-day, answering
    'which hours start and close journeys'. One user hash-bucket
    shuffle; journeys resolve vectorized inside each user series;
    weights are integers from the identical expression in both
    engines."""
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
                "hod": pd.Series([], dtype=np.int64),
                "attributed_bp": pd.Series([], dtype=np.int64),
                "n_touches": pd.Series([], dtype=np.int64),
            }
        )
        if len(g) == 0:
            return empty
        g, same = _series_segments(g, "user_id", "ts", "event_id")
        et = g["event_type"].to_numpy()
        ts_us = g["ts"].to_numpy(dtype="datetime64[us]").astype(np.int64)
        uid = g["user_id"].to_numpy()
        # journey id = running purchase count per user BEFORE this row
        is_p = (et == "purchase").astype(np.int64)
        s = pd.Series(is_p)
        run = s.groupby(uid).cumsum().to_numpy() - is_p
        out = {"hod": [], "attributed_bp": [], "n_touches": []}
        df = pd.DataFrame(
            {
                "uid": uid,
                "jid": run,
                "click": et == "click",
                "purchase": et == "purchase",
                "hod": (ts_us // _HOUR_US) % 24,
            }
        )
        # journeys that END in a purchase: a purchase with journey id j
        # closes journey j of that user
        closed = set(
            map(tuple, df[df["purchase"]][["uid", "jid"]].to_numpy())
        )
        clicks = df[df["click"]]
        for (u, j), grp in clicks.groupby(["uid", "jid"], sort=False):
            if (u, j) not in closed:
                continue
            k = len(grp)
            hods = grp["hod"].to_numpy(dtype=np.int64)
            if k == 1:
                w = np.array([10_000], dtype=np.int64)
            elif k == 2:
                w = np.array([5_000, 5_000], dtype=np.int64)
            else:
                mid = int(
                    _round_half_away(np.array([2000.0 / (k - 2)]))[0]
                )
                w = np.full(k, mid, dtype=np.int64)
                w[0] = 4_000
                w[-1] = 4_000
            for h, ww in zip(hods, w):
                out["hod"].append(int(h))
                out["attributed_bp"].append(int(ww))
                out["n_touches"].append(1)
        if not out["hod"]:
            return empty
        agg = (
            pd.DataFrame(out)
            .groupby("hod", as_index=False)
            .sum()
        )
        for c in agg.columns:
            agg[c] = agg[c].astype(np.int64)
        return agg

    partials = proj.groupby(_BUCKET).map_groups(
        per_bucket, batch_format="pandas"
    )

    def combine(b: pa.Table) -> pa.Table:
        g = b.group_by(["hod"]).aggregate(
            [("attributed_bp", "sum"), ("n_touches", "sum")]
        )
        return g.rename_columns(["hod", "attributed_bp", "n_touches"])

    return tree_merge(partials, combine)


USHAPED_SQL = """
WITH e AS MATERIALIZED (
  SELECT user_id, ts, event_id, event_type,
         CAST(hour(ts) AS BIGINT) AS hod
  FROM events
  WHERE user_id IS NOT NULL AND ts IS NOT NULL
    AND event_type IS NOT NULL
), j AS (
  SELECT *,
         SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS jid
  FROM e
), jz AS (
  SELECT user_id, ts, event_id, event_type, hod,
         COALESCE(jid, 0) AS jid
  FROM j
), closed AS (
  SELECT DISTINCT user_id, jid FROM jz WHERE event_type = 'purchase'
), clicks AS (
  SELECT jz.user_id, jz.jid, jz.hod,
         ROW_NUMBER() OVER (PARTITION BY jz.user_id, jz.jid
                            ORDER BY jz.ts, jz.event_id) AS pos,
         COUNT(*) OVER (PARTITION BY jz.user_id, jz.jid) AS k
  FROM jz JOIN closed USING (user_id, jid)
  WHERE jz.event_type = 'click'
), weighted AS (
  SELECT hod,
         CASE WHEN k = 1 THEN 10000
              WHEN k = 2 THEN 5000
              WHEN pos = 1 OR pos = k THEN 4000
              ELSE CAST(ROUND(2000.0 / (k - 2), 0) AS BIGINT)
         END AS w
  FROM clicks
)
SELECT hod, CAST(SUM(w) AS BIGINT) AS attributed_bp,
       CAST(COUNT(*) AS BIGINT) AS n_touches
FROM weighted GROUP BY 1
"""


# ---------------------------------------------------------------------------
# type-token-ratio bands by language
# ---------------------------------------------------------------------------


def q_ttr_band_lang_matrix(sf_dir):
    """Documents cross-tabbed by (language, type-token-ratio band) —
    the redundancy screen a corpus curator reads per language. TTR =
    distinct words / words; banding compares integer cross-products
    (2*u <= w for TTR <= 0.5; 5*u <= 4*w for <= 0.8) so no division
    ever happens. One streaming pass (CSR segment distinct), bounded
    (lang x 3) output."""
    docs = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["lang", "text"]
    )

    def partial(b: pa.Table) -> pa.Table:
        b = b.filter(
            pc.and_(pc.is_valid(b["lang"]), pc.is_valid(b["text"]))
        )
        empty = pa.table(
            {
                "lang": pa.array([], pa.string()),
                "band": pa.array([], pa.int64()),
                "n_docs": pa.array([], pa.int64()),
            }
        )
        if b.num_rows == 0:
            return empty
        words = pc.split_pattern(pc.utf8_lower(b["text"]), " ")
        n_per = pc.list_value_length(words).to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        flat = pc.list_flatten(words).to_numpy(zero_copy_only=False)
        seg = np.repeat(np.arange(len(b)), n_per)
        uniq = (
            pd.DataFrame({"seg": seg, "w": flat})
            .drop_duplicates()
            .groupby("seg", sort=False)
            .size()
        )
        u = np.zeros(len(b), dtype=np.int64)
        u[uniq.index.to_numpy()] = uniq.to_numpy(dtype=np.int64)
        w = n_per
        band = np.where(
            2 * u <= w, 0, np.where(5 * u <= 4 * w, 1, 2)
        ).astype(np.int64)
        t = pa.table({"lang": b["lang"], "band": pa.array(band)})
        g = t.group_by(["lang", "band"]).aggregate([([], "count_all")])
        g = g.select(["lang", "band", "count_all"])
        return g.rename_columns(["lang", "band", "n_docs"])

    def combine(b: pa.Table) -> pa.Table:
        g = b.group_by(["lang", "band"]).aggregate([("n_docs", "sum")])
        return g.rename_columns(["lang", "band", "n_docs"])

    return tree_merge(
        docs.map_batches(partial, batch_format="pyarrow", batch_size=None),
        combine,
    )


TTR_BAND_SQL = """
WITH d AS (
  SELECT lang, string_split(lower(text), ' ') AS ws
  FROM documents WHERE lang IS NOT NULL AND text IS NOT NULL
), s AS (
  SELECT lang, CAST(len(ws) AS BIGINT) AS w,
         CAST(len(list_distinct(ws)) AS BIGINT) AS u
  FROM d
)
SELECT lang,
       CAST(CASE WHEN 2 * u <= w THEN 0
                 WHEN 5 * u <= 4 * w THEN 1
                 ELSE 2 END AS BIGINT) AS band,
       CAST(COUNT(*) AS BIGINT) AS n_docs
FROM s GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# max quiet gap per type at minute grain
# ---------------------------------------------------------------------------


def q_max_quiet_gap_per_type(sf_dir):
    """Per event type: the longest QUIET stretch — the max gap in
    minutes between consecutive ACTIVE minutes (plus the active-minute
    count) — the availability-hole question a monitoring system asks.
    One decomposable (type, minute) presence pass (bounded by types x
    minutes); the gap scan runs over that bounded grid."""
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
        mn = np.floor_divide(ts_us, _MIN_US)
        t = pa.table({"event_type": b["event_type"], "mn": pa.array(mn)})
        g = t.group_by(["event_type", "mn"]).aggregate([([], "count_all")])
        return g.select(["event_type", "mn"])

    def combine(b: pa.Table) -> pa.Table:
        g = b.group_by(["event_type", "mn"]).aggregate([([], "count_all")])
        return g.select(["event_type", "mn"])

    grid = tree_merge(
        ev.map_batches(partial, batch_format="pyarrow", batch_size=None),
        combine,
    ).to_pandas()  # bounded: types x active minutes

    rows = {"event_type": [], "n_active_minutes": [],
            "max_gap_minutes": []}
    if len(grid):
        for et, g in grid.groupby("event_type", sort=True):
            mn = np.sort(g["mn"].to_numpy(dtype=np.int64))
            gaps = np.diff(mn)
            rows["event_type"].append(et)
            rows["n_active_minutes"].append(len(mn))
            rows["max_gap_minutes"].append(
                int(gaps.max()) if len(gaps) else 0
            )
    return pa.table(
        {
            "event_type": pa.array(rows["event_type"], pa.string()),
            "n_active_minutes": pa.array(
                rows["n_active_minutes"], pa.int64()
            ),
            "max_gap_minutes": pa.array(
                rows["max_gap_minutes"], pa.int64()
            ),
        }
    )


QUIET_GAP_SQL = """
WITH m AS (
  SELECT DISTINCT event_type,
         CAST(FLOOR(epoch(ts) / 60) AS BIGINT) AS mn
  FROM events
  WHERE event_type IS NOT NULL AND ts IS NOT NULL
), g AS (
  SELECT event_type, mn,
         mn - LAG(mn) OVER (PARTITION BY event_type ORDER BY mn) AS gap
  FROM m
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_active_minutes,
       CAST(COALESCE(MAX(gap), 0) AS BIGINT) AS max_gap_minutes
FROM g GROUP BY 1
"""


def register_r4ar(queries: dict, oracles: dict) -> None:
    queries.update(
        {
            "u_shaped_attribution": q_u_shaped_attribution,
            "ttr_band_lang_matrix": q_ttr_band_lang_matrix,
            "max_quiet_gap_per_type": q_max_quiet_gap_per_type,
        }
    )
    oracles.update(
        {
            "u_shaped_attribution": USHAPED_SQL,
            "ttr_band_lang_matrix": TTR_BAND_SQL,
            "max_quiet_gap_per_type": QUIET_GAP_SQL,
        }
    )
