"""Round-4 batch FG: interval analytics over 30-min-gap sessions —
the global PEAK concurrent-session count (an endpoint sweep run as
per-time-bucket local maxima + a driver prefix carry, the parallel
prefix-max shape), the session x error-window INTERVAL-OVERLAP join
(interval-interval, the shape the point-in-window stage can't
express), and the conversion-window sensitivity curve (touch ->
same-user purchase within {5m, 1h, 6h} — how the attribution
window choice moves the headline rate).

Exactness discipline: sessions, endpoints and overlap predicates
are pure integer microsecond arithmetic (session = closed interval
[first, last]; error window = half-open [e, e+5m); concurrency
deltas order (+1 before -1) at equal times via an explicit
tie-break column mirrored in SQL); only rates snap ppm."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from mimirsbrunn_ray.stages.dedup import _BUCKET, add_bucket
from mimirsbrunn_ray.stages.rollup import tree_merge

def _round_half_away(x: float) -> int:
    return int(np.floor(x + 0.5) if x >= 0 else np.ceil(x - 0.5))


_GAP_US = 1_800_000_000
_ERR_WIN_US = 300_000_000
_CONV_WINS_US = [300_000_000, 3_600_000_000, 21_600_000_000]
_TIME_BUCKET_US = 3_600_000_000

_SESSION_SQL_HEAD = f"""
WITH e AS MATERIALIZED (
  SELECT user_id, EPOCH_US(ts) AS us, event_id
  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
), lagd AS MATERIALIZED (
  SELECT user_id, us,
         CASE WHEN us - LAG(us) OVER w > {_GAP_US}
              OR LAG(us) OVER w IS NULL THEN 1 ELSE 0 END AS brk
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
), sess_rows AS MATERIALIZED (
  SELECT user_id, us,
         SUM(brk) OVER (PARTITION BY user_id ORDER BY us
                        ROWS UNBOUNDED PRECEDING) AS sid
  FROM lagd
), sessions AS MATERIALIZED (
  SELECT user_id, sid, MIN(us) AS s0, MAX(us) AS s1
  FROM sess_rows GROUP BY 1, 2
)"""


def _sessions_dataset(sf_dir) -> "rd.Dataset":
    """(user_id, sid, s0, s1) session intervals — one user-hash
    shuffle, the sessionize shape."""
    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "ts", "event_id"],
    )

    def project(b: pa.Table) -> pa.Table:
        b = b.filter(
            pc.and_(pc.is_valid(b["user_id"]), pc.is_valid(b["ts"]))
        )
        t = pa.table(
            {
                "user_id": b["user_id"],
                "us": b["ts"].cast(pa.timestamp("us")).cast(
                    pa.int64()
                ),
                "event_id": b["event_id"],
            }
        )
        return add_bucket(t, "user_id", 64)

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame(
                {"user_id": pd.Series([], dtype=np.int64),
                 "s0": pd.Series([], dtype=np.int64),
                 "s1": pd.Series([], dtype=np.int64)}
            )
        g = g.sort_values(["user_id", "us", "event_id"],
                          kind="mergesort", ignore_index=True)
        uid = g["user_id"].to_numpy(dtype=np.int64)
        us = g["us"].to_numpy(dtype=np.int64)
        first = np.concatenate(([True], uid[1:] != uid[:-1]))
        gap = np.concatenate(([0], us[1:] - us[:-1]))
        brk = first | (gap > _GAP_US)
        sid = np.cumsum(brk)
        df = pd.DataFrame({"u": uid, "sid": sid, "us": us})
        per = df.groupby("sid", sort=True).agg(
            user_id=("u", "first"), s0=("us", "min"),
            s1=("us", "max"),
        ).reset_index(drop=True)
        return per

    return (
        ev.map_batches(project, batch_format="pyarrow",
                       batch_size=None)
        .groupby(_BUCKET)
        .map_groups(per_user, batch_format="pandas")
    )


def q_peak_concurrent_sessions(sf_dir):
    """The global maximum number of simultaneously open sessions:
    endpoint deltas (+1 at s0 BEFORE -1 at s1+1 on ties) fold into
    per-hour-bucket (total delta, local max prefix) partials; the
    driver carries the bucket prefix sums and takes the global max
    — exact parallel prefix-max, never a full endpoint sort on one
    node."""
    sess = _sessions_dataset(sf_dir)

    def deltas(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "s0" not in b.column_names:
            return pa.table(
                {"bk": pa.array([], pa.int64()),
                 "t": pa.array([], pa.int64()),
                 "tie": pa.array([], pa.int64()),
                 "d": pa.array([], pa.int64())}
            )
        s0 = b["s0"].to_numpy(zero_copy_only=False)
        s1 = b["s1"].to_numpy(zero_copy_only=False) + 1
        t = np.concatenate([s0, s1])
        tie = np.concatenate(
            [np.zeros(len(s0), np.int64), np.ones(len(s1), np.int64)]
        )
        d = np.concatenate(
            [np.ones(len(s0), np.int64), -np.ones(len(s1), np.int64)]
        )
        return pa.table(
            {
                "bk": pa.array((t // _TIME_BUCKET_US).astype(
                    np.int64
                )),
                "t": pa.array(t.astype(np.int64)),
                "tie": pa.array(tie),
                "d": pa.array(d),
            }
        )

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame(
                {"bk": pd.Series([], dtype=np.int64),
                 "total": pd.Series([], dtype=np.int64),
                 "lmax": pd.Series([], dtype=np.int64),
                 "n_open": pd.Series([], dtype=np.int64)}
            )
        g = g.sort_values(["t", "tie"], kind="mergesort",
                          ignore_index=True)
        dv = g["d"].to_numpy(dtype=np.int64)
        pref = np.cumsum(dv)
        return pd.DataFrame(
            {
                "bk": [int(g["bk"].iloc[0])],
                "total": [int(pref[-1])],
                "lmax": [int(pref.max())],
                "n_open": [int(np.sum(dv > 0))],
            }
        )

    parts = (
        sess.map_batches(deltas, batch_format="pyarrow",
                         batch_size=None)
        .groupby("bk")
        .map_groups(per_bucket, batch_format="pandas")
        .to_pandas()
    )
    if len(parts) == 0:
        return pa.table(
            {"n_sessions": pa.array([0], pa.int64()),
             "peak_concurrent": pa.array([0], pa.int64())}
        )
    parts = parts.sort_values("bk", ignore_index=True)
    totals = parts["total"].to_numpy(dtype=np.int64)
    carry = np.concatenate(([0], np.cumsum(totals)[:-1]))
    peak = int(np.max(carry + parts["lmax"].to_numpy(
        dtype=np.int64
    )))
    n_sessions = int(parts["n_open"].sum())  # one +1 per session
    return pa.table(
        {
            "n_sessions": pa.array([n_sessions], pa.int64()),
            "peak_concurrent": pa.array([peak], pa.int64()),
        }
    )


PEAK_SQL = (
    _SESSION_SQL_HEAD
    + """
, deltas AS MATERIALIZED (
  SELECT s0 AS t, 0 AS tie, 1 AS d FROM sessions
  UNION ALL
  SELECT s1 + 1 AS t, 1 AS tie, -1 AS d FROM sessions
), sweep AS MATERIALIZED (
  SELECT SUM(d) OVER (ORDER BY t, tie
                      ROWS UNBOUNDED PRECEDING) AS conc
  FROM deltas
)
SELECT CAST((SELECT COUNT(*) FROM sessions) AS BIGINT)
         AS n_sessions,
       CAST(COALESCE(MAX(conc), 0) AS BIGINT) AS peak_concurrent
FROM sweep
"""
)


def q_interval_overlap_sessions_errors(sf_dir):
    """Interval-interval overlap join: session [s0, s1] (closed)
    overlaps error window [e, e+5m) iff s0 < e + 5m AND e <= s1.
    Both interval sets fragment onto hour buckets; a pair counts
    ONLY in the bucket containing the overlap start max(s0, e)
    (the canonical dedup bucket), so fragments never double-count.
    Emits the inner-join pair count and the distinct overlapped
    session count."""
    sess = _sessions_dataset(sf_dir)
    # error windows: one scan, driver-bounded? NO — they fragment
    # distributed exactly like sessions
    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["ts", "event_type"]
    )

    def err_frag(b: pa.Table) -> pa.Table:
        b = b.filter(
            pc.and_(pc.is_valid(b["ts"]),
                    pc.equal(b["event_type"], "error"))
        )
        e0 = b["ts"].cast(pa.timestamp("us")).cast(pa.int64())
        e0 = e0.to_numpy(zero_copy_only=False)
        e1 = e0 + _ERR_WIN_US
        b0 = (e0 // _TIME_BUCKET_US).astype(np.int64)
        b1 = ((e1 - 1) // _TIME_BUCKET_US).astype(np.int64)
        reps = (b1 - b0 + 1).astype(np.int64)
        starts = np.zeros(len(reps), np.int64)
        if len(reps):
            starts[1:] = np.cumsum(reps)[:-1]
        off = np.arange(int(reps.sum()), dtype=np.int64) - np.repeat(
            starts, reps
        )
        return pa.table(
            {
                "bk": pa.array(np.repeat(b0, reps) + off),
                "kind": pa.array(
                    np.zeros(int(reps.sum()), np.int64)
                ),
                "a0": pa.array(np.repeat(e0, reps)),
                "a1": pa.array(np.repeat(e1, reps)),
                "u": pa.array(
                    np.full(int(reps.sum()), -1, np.int64)
                ),
            }
        )

    def sess_frag(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "s0" not in b.column_names:
            return pa.table(
                {"bk": pa.array([], pa.int64()),
                 "kind": pa.array([], pa.int64()),
                 "a0": pa.array([], pa.int64()),
                 "a1": pa.array([], pa.int64()),
                 "u": pa.array([], pa.int64())}
            )
        s0 = b["s0"].to_numpy(zero_copy_only=False)
        s1 = b["s1"].to_numpy(zero_copy_only=False)
        uid = b["user_id"].to_numpy(zero_copy_only=False)
        b0 = (s0 // _TIME_BUCKET_US).astype(np.int64)
        b1 = (s1 // _TIME_BUCKET_US).astype(np.int64)
        reps = (b1 - b0 + 1).astype(np.int64)
        starts = np.zeros(len(reps), np.int64)
        if len(reps):
            starts[1:] = np.cumsum(reps)[:-1]
        off = np.arange(int(reps.sum()), dtype=np.int64) - np.repeat(
            starts, reps
        )
        return pa.table(
            {
                "bk": pa.array(np.repeat(b0, reps) + off),
                "kind": pa.array(
                    np.ones(int(reps.sum()), np.int64)
                ),
                "a0": pa.array(np.repeat(s0, reps).astype(np.int64)),
                "a1": pa.array(np.repeat(s1, reps).astype(np.int64)),
                # (u, a0) identifies a session: s0 is unique per user
                "u": pa.array(np.repeat(uid, reps).astype(np.int64)),
            }
        )

    frags = sess.map_batches(
        sess_frag, batch_format="pyarrow", batch_size=None
    ).union(
        ev.map_batches(err_frag, batch_format="pyarrow",
                       batch_size=None)
    )

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {"u": pd.Series([], dtype=np.int64),
             "s0": pd.Series([], dtype=np.int64),
             "n_pairs": pd.Series([], dtype=np.int64)}
        )
        if len(g) == 0:
            return empty
        bk = int(g["bk"].iloc[0])
        er = g[g["kind"] == 0]
        se = g[g["kind"] == 1]
        if len(er) == 0 or len(se) == 0:
            return empty
        e0 = er["a0"].to_numpy(dtype=np.int64)
        e1 = er["a1"].to_numpy(dtype=np.int64)
        s0 = se["a0"].to_numpy(dtype=np.int64)
        s1 = se["a1"].to_numpy(dtype=np.int64)
        uu = se["u"].to_numpy(dtype=np.int64)
        lo, hi = bk * _TIME_BUCKET_US, (bk + 1) * _TIME_BUCKET_US
        cnt = np.zeros(len(s0), np.int64)
        step = max(1, 2_000_000 // max(len(e0), 1))
        for i in range(0, len(s0), step):
            j = min(i + step, len(s0))
            ov = (
                (s0[i:j, None] < e1[None, :])
                & (e0[None, :] <= s1[i:j, None])
            )
            start = np.maximum(s0[i:j, None], e0[None, :])
            m = ov & (start >= lo) & (start < hi)
            cnt[i:j] = m.sum(axis=1)
        hit = cnt > 0
        return pd.DataFrame(
            {"u": uu[hit], "s0": s0[hit], "n_pairs": cnt[hit]}
        )

    parts = (
        frags.groupby("bk")
        .map_groups(per_bucket, batch_format="pandas")
        .to_pandas()
    )
    if len(parts) == 0:
        return pa.table(
            {"n_pairs": pa.array([0], pa.int64()),
             "n_sessions_hit": pa.array([0], pa.int64())}
        )
    n_hit = len(parts[["u", "s0"]].drop_duplicates())
    return pa.table(
        {
            "n_pairs": pa.array(
                [int(parts["n_pairs"].sum())], pa.int64()
            ),
            "n_sessions_hit": pa.array([n_hit], pa.int64()),
        }
    )


OVERLAP_SQL = (
    _SESSION_SQL_HEAD
    + f"""
, errs AS MATERIALIZED (
  SELECT EPOCH_US(ts) AS e0, EPOCH_US(ts) + {_ERR_WIN_US} AS e1
  FROM events WHERE ts IS NOT NULL AND event_type = 'error'
), pairs AS MATERIALIZED (
  SELECT s.user_id, s.sid
  FROM sessions s JOIN errs e
    ON s.s0 < e.e1 AND e.e0 <= s.s1
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
       CAST(COUNT(DISTINCT (user_id, sid)) AS BIGINT)
         AS n_sessions_hit
FROM pairs
"""
)


def q_conversion_window_sensitivity(sf_dir):
    """For w in {5m, 1h, 6h}: the share of non-purchase touches
    followed by a same-user purchase within w — the attribution
    headline's sensitivity to the window knob. One user-hash
    shuffle; per user the next-purchase gap is one searchsorted."""
    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "ts", "event_id", "event_type"],
    )

    def project(b: pa.Table) -> pa.Table:
        m = None
        for c in ("user_id", "ts", "event_type"):
            v = pc.is_valid(b[c])
            m = v if m is None else pc.and_(m, v)
        b = b.filter(m)
        t = pa.table(
            {
                "user_id": b["user_id"],
                "us": b["ts"].cast(pa.timestamp("us")).cast(
                    pa.int64()
                ),
                "event_id": b["event_id"],
                "event_type": b["event_type"],
            }
        )
        return add_bucket(t, "user_id", 64)

    wins = np.array(_CONV_WINS_US, np.int64)

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "win_us": pd.Series([], dtype=np.int64),
                "n_touches": pd.Series([], dtype=np.int64),
                "n_conv": pd.Series([], dtype=np.int64),
            }
        )
        if len(g) == 0:
            return empty
        g = g.sort_values(["user_id", "us", "event_id"],
                          kind="mergesort", ignore_index=True)
        uid = g["user_id"].to_numpy(dtype=np.int64)
        us = g["us"].to_numpy(dtype=np.int64)
        et = g["event_type"].to_numpy()
        rows = {"win_us": [], "n_touches": [], "n_conv": []}
        n_t = np.zeros(len(wins), np.int64)
        n_c = np.zeros(len(wins), np.int64)
        for u in np.unique(uid):
            m = uid == u
            uus, uet = us[m], et[m]
            tch = uet != "purchase"
            pts = uus[uet == "purchase"]
            tts = uus[tch]
            if len(tts) == 0:
                continue
            n_t += len(tts)
            if len(pts) == 0:
                continue
            nxt = np.searchsorted(pts, tts, side="left")
            has = nxt < len(pts)
            gapv = np.where(
                has, pts[np.clip(nxt, 0, len(pts) - 1)] - tts,
                np.iinfo(np.int64).max,
            )
            for wi, w in enumerate(wins):
                n_c[wi] += int(np.sum(has & (gapv <= w)))
        rows["win_us"] = wins.tolist()
        rows["n_touches"] = n_t.tolist()
        rows["n_conv"] = n_c.tolist()
        return pd.DataFrame(rows)

    parts = (
        ev.map_batches(project, batch_format="pyarrow",
                       batch_size=None)
        .groupby(_BUCKET)
        .map_groups(per_user, batch_format="pandas")
        .to_pandas()
    )
    if len(parts) == 0:
        agg = pd.DataFrame(
            {"win_us": wins, "n_touches": 0, "n_conv": 0}
        )
    else:
        agg = parts.groupby("win_us", sort=True).sum().reset_index()
    ppm = [
        _round_half_away(float(c) / float(t) * 1e6) if t else 0
        for c, t in zip(agg["n_conv"], agg["n_touches"])
    ]
    return pa.table(
        {
            "win_us": pa.array(
                agg["win_us"].to_numpy(dtype=np.int64)
            ),
            "n_touches": pa.array(
                agg["n_touches"].to_numpy(dtype=np.int64)
            ),
            "n_conv": pa.array(
                agg["n_conv"].to_numpy(dtype=np.int64)
            ),
            "conv_ppm": pa.array(ppm, pa.int64()),
        }
    )


CONV_SENS_SQL = f"""
WITH e AS MATERIALIZED (
  SELECT user_id, EPOCH_US(ts) AS us, event_id, event_type
  FROM events
  WHERE user_id IS NOT NULL AND ts IS NOT NULL
    AND event_type IS NOT NULL
), touches AS MATERIALIZED (
  SELECT t.user_id, t.us,
         (SELECT MIN(p.us) FROM e p
          WHERE p.user_id = t.user_id
            AND p.event_type = 'purchase' AND p.us >= t.us) AS nxt
  FROM e t WHERE t.event_type <> 'purchase'
), wins AS (
  SELECT UNNEST([{", ".join(str(w) for w in _CONV_WINS_US)}])
    AS win_us
)
SELECT w.win_us,
       CAST(COUNT(*) AS BIGINT) AS n_touches,
       CAST(SUM(CASE WHEN t.nxt IS NOT NULL
                AND t.nxt - t.us <= w.win_us THEN 1 ELSE 0 END)
            AS BIGINT) AS n_conv,
       CAST(ROUND(CAST(SUM(CASE WHEN t.nxt IS NOT NULL
                AND t.nxt - t.us <= w.win_us THEN 1 ELSE 0 END)
            AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) * 1000000, 0)
            AS BIGINT) AS conv_ppm
FROM touches t CROSS JOIN wins w
GROUP BY w.win_us ORDER BY w.win_us
"""


def register_r4fg(queries: dict, oracles: dict) -> None:
    queries.update(
        {
            "peak_concurrent_sessions": q_peak_concurrent_sessions,
            "interval_overlap_sessions_errors":
                q_interval_overlap_sessions_errors,
            "conversion_window_sensitivity":
                q_conversion_window_sensitivity,
        }
    )
    oracles.update(
        {
            "peak_concurrent_sessions": PEAK_SQL,
            "interval_overlap_sessions_errors": OVERLAP_SQL,
            "conversion_window_sensitivity": CONV_SENS_SQL,
        }
    )
