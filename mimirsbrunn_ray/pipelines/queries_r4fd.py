"""Round-4 batch FD: cache planning + the last attribution model —
Mattson REUSE-DISTANCE analysis of the user-id access stream
(arrival order = event_id): the exact LRU hit-rate curve for cache
sizes {8, 32, 128} and the log2 reuse-distance histogram, plus
exponential TIME-DECAY attribution (half-life 10 min) completing the
first/last/U-shaped/Shapley/Markov family.

Reuse distance d_i of access i = distinct users touched since the
previous access of the same user = |{j : prev_i < j < i and
prev_j <= prev_i}| (each in-gap user counted once via its first
in-gap access; prev_j = -1 for first accesses). LRU hit iff
d_i < k; first accesses are compulsory misses. Distributed shape:
(1) per-user prev pointers from ONE user-hash shuffle (the
sessionize bucketing), (2) the (prev_i, i) query windows FRAGMENT
onto fixed event_id-range buckets and each bucket counts its
points against its fragments vectorized, (3) fragment partial
counts re-key by access id and fold. Bucket fan-out is bounded by
(#buckets x working-set size) — the model targets bounded key
cardinality (a cache working set), documented here.

Exactness discipline: reuse distances, hit counts and histogram
bins are pure integers; decay weights are the x1e6-snapped exp of
integer microsecond gaps (identical doubles both sides); only
hit-rate ppm snaps at the end."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from mimirsbrunn_ray.stages.dedup import _BUCKET, add_bucket
from mimirsbrunn_ray.stages.rollup import tree_merge

_LRU_KS = [8, 32, 128]
_N_ID_BUCKETS = 256
_DECAY_WIN_US = 3_600_000_000
_DECAY_HALF_US = 600_000_000


def _round_half_away(x: float) -> int:
    return int(np.floor(x + 0.5) if x >= 0 else np.ceil(x - 0.5))


def _reuse_distance_table(sf_dir):
    """Returns (d_df, n_nonfirst, n_total): reuse distances for
    every non-first access that has at least one id-bucket fragment
    (adjacent re-accesses have an EMPTY window, no fragments, and
    d = 0 — accounted via n_nonfirst - len(d_df)), plus the access
    counts. Three bounded shuffles as described in the module doc."""
    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id"]
    )
    _mx_raw = ev.max("event_id")
    mx = int(_mx_raw) if _mx_raw is not None else 0
    w = max(1, (mx + _N_ID_BUCKETS) // _N_ID_BUCKETS)

    # ---- pass 1: per-user prev pointers (user-hash shuffle) ----
    def project(b: pa.Table) -> pa.Table:
        b = b.filter(
            pc.and_(pc.is_valid(b["event_id"]),
                    pc.is_valid(b["user_id"]))
        )
        t = pa.table(
            {"user_id": b["user_id"], "event_id": b["event_id"]}
        )
        return add_bucket(t, "user_id", 64)

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame(
                {"i": pd.Series([], dtype=np.int64),
                 "prev": pd.Series([], dtype=np.int64)}
            )
        g = g.sort_values(["user_id", "event_id"], kind="mergesort",
                          ignore_index=True)
        uid = g["user_id"].to_numpy(dtype=np.int64)
        eid = g["event_id"].to_numpy(dtype=np.int64)
        first = np.concatenate(([True], uid[1:] != uid[:-1]))
        prev = np.concatenate(([0], eid[:-1]))
        prev = np.where(first, -1, prev)
        return pd.DataFrame({"i": eid, "prev": prev})

    prevs = (
        ev.map_batches(project, batch_format="pyarrow",
                       batch_size=None)
        .groupby(_BUCKET)
        .map_groups(per_user, batch_format="pandas")
    ).materialize()  # consumed twice: counts + fragments

    def counts(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "prev" not in b.column_names:
            return pa.table(
                {"n_total": pa.array([0], pa.int64()),
                 "n_nonfirst": pa.array([0], pa.int64())}
            )
        p = b["prev"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "n_total": pa.array([len(p)], pa.int64()),
                "n_nonfirst": pa.array(
                    [int(np.sum(p >= 0))], pa.int64()
                ),
            }
        )

    cdf = prevs.map_batches(
        counts, batch_format="pyarrow", batch_size=None
    ).to_pandas()
    n_total = int(cdf["n_total"].sum()) if len(cdf) else 0
    n_nonfirst = int(cdf["n_nonfirst"].sum()) if len(cdf) else 0

    # ---- pass 2: points + window fragments onto id-range buckets ----
    def frag(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "i" not in b.column_names:
            return pa.table(
                {"bk": pa.array([], pa.int64()),
                 "kind": pa.array([], pa.int64()),
                 "j": pa.array([], pa.int64()),
                 "p": pa.array([], pa.int64()),
                 "qid": pa.array([], pa.int64()),
                 "lo": pa.array([], pa.int64()),
                 "hi": pa.array([], pa.int64())}
            )
        i = b["i"].to_numpy(zero_copy_only=False)
        p = b["prev"].to_numpy(zero_copy_only=False)
        # points: every access is a candidate j with payload prev_j
        pts = pa.table(
            {
                "bk": pa.array((i // w).astype(np.int64)),
                "kind": pa.array(np.zeros(len(i), np.int64)),
                "j": pa.array(i.astype(np.int64)),
                "p": pa.array(p.astype(np.int64)),
                "qid": pa.array(np.zeros(len(i), np.int64)),
                "lo": pa.array(np.zeros(len(i), np.int64)),
                "hi": pa.array(np.zeros(len(i), np.int64)),
            }
        )
        # queries: windows (prev_i, i) for non-first accesses,
        # fragmented across the id buckets they overlap
        qm = p >= 0
        qi, qp = i[qm], p[qm]
        b0 = ((qp + 1) // w).astype(np.int64)
        b1 = ((qi - 1) // w).astype(np.int64)
        reps = np.maximum(b1 - b0 + 1, 0).astype(np.int64)
        qid = np.repeat(qi, reps)
        qpr = np.repeat(qp, reps)
        # bucket index per fragment: b0 + offset within each window
        starts = np.zeros(len(reps), np.int64)
        if len(reps):
            starts[1:] = np.cumsum(reps)[:-1]
        off = np.arange(int(reps.sum()), dtype=np.int64) - np.repeat(
            starts, reps
        )
        bks = np.repeat(b0, reps) + off
        frs = pa.table(
            {
                "bk": pa.array(bks),
                "kind": pa.array(np.ones(len(bks), np.int64)),
                "j": pa.array(np.zeros(len(bks), np.int64)),
                "p": pa.array(qpr),
                "qid": pa.array(qid),
                "lo": pa.array(qpr),  # exclusive lower bound
                "hi": pa.array(qid),  # exclusive upper bound
            }
        )
        return pa.concat_tables([pts, frs])

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame(
                {"qid": pd.Series([], dtype=np.int64),
                 "cnt": pd.Series([], dtype=np.int64)}
            )
        pts = g[g["kind"] == 0]
        qs = g[g["kind"] == 1]
        if len(qs) == 0:
            return pd.DataFrame(
                {"qid": pd.Series([], dtype=np.int64),
                 "cnt": pd.Series([], dtype=np.int64)}
            )
        js = pts["j"].to_numpy(dtype=np.int64)
        ps = pts["p"].to_numpy(dtype=np.int64)
        order = np.argsort(js, kind="stable")
        js, ps = js[order], ps[order]
        lo = qs["lo"].to_numpy(dtype=np.int64)
        hi = qs["hi"].to_numpy(dtype=np.int64)
        pp = qs["p"].to_numpy(dtype=np.int64)
        qid = qs["qid"].to_numpy(dtype=np.int64)
        cnt = np.zeros(len(qs), np.int64)
        # chunked broadcast: (#queries x #points) masks, bounded by
        # the bucket width x working-set fan-in
        step = max(1, 2_000_000 // max(len(js), 1))
        a0 = np.searchsorted(js, lo, side="right")
        a1 = np.searchsorted(js, hi, side="left")
        for s in range(0, len(qs), step):
            e = min(s + step, len(qs))
            if len(js) == 0:
                break
            mask = (
                (np.arange(len(js))[None, :] >= a0[s:e, None])
                & (np.arange(len(js))[None, :] < a1[s:e, None])
                & (ps[None, :] <= pp[s:e, None])
            )
            cnt[s:e] = mask.sum(axis=1)
        return pd.DataFrame({"qid": qid, "cnt": cnt})

    parts = (
        prevs.map_batches(frag, batch_format="pyarrow",
                          batch_size=None)
        .groupby("bk")
        .map_groups(per_bucket, batch_format="pandas")
        .to_pandas()
    )
    if len(parts) == 0:
        d = pd.DataFrame(
            {"i": pd.Series([], dtype=np.int64),
             "d": pd.Series([], dtype=np.int64)}
        )
        return d, n_nonfirst, n_total
    d = parts.groupby("qid", sort=True)["cnt"].sum().reset_index()
    d.columns = ["i", "d"]
    return d, n_nonfirst, n_total


def q_lru_cache_hit_curve(sf_dir):
    """Exact LRU hit-rate curve over the user-id access stream for
    cache sizes {8, 32, 128}: hit iff reuse distance < k; first
    accesses are compulsory misses. The one-pass-per-size
    simulation every cache planner runs, computed exactly from the
    distributed reuse distances."""
    d, n_nonfirst, n_total = _reuse_distance_table(sf_dir)
    n_zero_extra = n_nonfirst - len(d)  # empty-window accesses: d=0
    rows = {"k": [], "n_accesses": [], "n_hits": [],
            "hit_ppm": []}
    dv = d["d"].to_numpy(dtype=np.int64)
    for k in _LRU_KS:
        hits = int(np.sum(dv < k)) + n_zero_extra
        rows["k"].append(k)
        rows["n_accesses"].append(n_total)
        rows["n_hits"].append(hits)
        rows["hit_ppm"].append(
            _round_half_away(hits / n_total * 1e6) if n_total else 0
        )
    return pa.table(
        {c: pa.array(rows[c],
                     pa.int64() if c != "k" else pa.int64())
         for c in rows}
    )


_LRU_BASE_SQL = """
WITH e AS MATERIALIZED (
  SELECT event_id AS i, user_id
  FROM events WHERE event_id IS NOT NULL AND user_id IS NOT NULL
), prevs AS MATERIALIZED (
  SELECT i, user_id,
         COALESCE(LAG(i) OVER (PARTITION BY user_id ORDER BY i), -1)
           AS prev
  FROM e
), dists AS MATERIALIZED (
  SELECT q.i,
         (SELECT COUNT(*) FROM prevs j
          WHERE j.i > q.prev AND j.i < q.i AND j.prev <= q.prev)
           AS d
  FROM prevs q WHERE q.prev >= 0
)
"""

LRU_SQL = (
    _LRU_BASE_SQL
    + f"""
, ks AS (SELECT UNNEST([{", ".join(str(k) for k in _LRU_KS)}])
    AS k)
SELECT CAST(ks.k AS BIGINT) AS k,
       CAST((SELECT COUNT(*) FROM prevs) AS BIGINT) AS n_accesses,
       CAST(COALESCE(SUM(CASE WHEN d.d < ks.k THEN 1 ELSE 0 END), 0)
            AS BIGINT) AS n_hits,
       CAST(ROUND(CAST(COALESCE(SUM(CASE WHEN d.d < ks.k THEN 1
                       ELSE 0 END), 0) AS DOUBLE)
            / (SELECT COUNT(*) FROM prevs) * 1000000, 0) AS BIGINT)
         AS hit_ppm
FROM ks LEFT JOIN dists d ON TRUE
GROUP BY ks.k ORDER BY ks.k
"""
)


def q_reuse_distance_hist(sf_dir):
    """log2 histogram of the reuse distances (bin = floor(log2(d+1)))
    — the working-set profile the LRU curve integrates."""
    d, n_nonfirst, _ = _reuse_distance_table(sf_dir)
    n_zero_extra = n_nonfirst - len(d)
    if len(d) == 0 and n_zero_extra == 0:
        return pa.table(
            {"bin": pa.array([], pa.int64()),
             "n": pa.array([], pa.int64())}
        )
    dv = np.concatenate(
        [d["d"].to_numpy(dtype=np.int64),
         np.zeros(n_zero_extra, np.int64)]
    )
    bins = np.floor(np.log2(dv + 1)).astype(np.int64)
    per = pd.Series(bins).value_counts().sort_index()
    return pa.table(
        {
            "bin": pa.array(per.index.to_numpy(dtype=np.int64)),
            "n": pa.array(per.to_numpy(dtype=np.int64)),
        }
    )


REUSE_HIST_SQL = (
    _LRU_BASE_SQL
    + """
SELECT CAST(FLOOR(LOG2(d + 1)) AS BIGINT) AS bin,
       CAST(COUNT(*) AS BIGINT) AS n
FROM dists GROUP BY 1 ORDER BY 1
"""
)


def q_time_decay_attribution(sf_dir):
    """Exponential time-decay attribution (half-life 10 min, window
    1 h): every non-purchase touch preceding a same-user purchase
    within the window earns credit 2^(-dt/half_life), snapped x1e6
    per pair from the exact integer dt. One user-hash shuffle;
    per-user pair expansion is vectorized searchsorted + repeat."""
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

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "channel": pd.Series([], dtype=object),
                "n_touches": pd.Series([], dtype=np.int64),
                "credit_x1e6": pd.Series([], dtype=np.int64),
            }
        )
        if len(g) == 0:
            return empty
        g = g.sort_values(["user_id", "us", "event_id"],
                          kind="mergesort", ignore_index=True)
        uid = g["user_id"].to_numpy(dtype=np.int64)
        us = g["us"].to_numpy(dtype=np.int64)
        et = g["event_type"].to_numpy()
        chs, wts = [], []
        for u in np.unique(uid):
            m = uid == u
            uus = us[m]
            uet = et[m]
            pur = np.nonzero(uet == "purchase")[0]
            tch = np.nonzero(uet != "purchase")[0]
            if len(pur) == 0 or len(tch) == 0:
                continue
            tts = uus[tch]
            tet = uet[tch]
            for pi in pur:
                pt = uus[pi]
                s = np.searchsorted(tts, pt - _DECAY_WIN_US,
                                    side="left")
                e = np.searchsorted(tts, pt, side="left")
                if e <= s:
                    continue
                dt = (pt - tts[s:e]).astype(np.float64)
                # np.power, not exp2: mirrors SQL POWER's libm pow
                wts.append(
                    np.floor(
                        np.power(2.0, -dt / _DECAY_HALF_US) * 1e6
                        + 0.5
                    ).astype(np.int64)
                )
                chs.append(tet[s:e])
        if not chs:
            return empty
        df = pd.DataFrame(
            {
                "channel": np.concatenate(chs),
                "w": np.concatenate(wts),
            }
        )
        agg = df.groupby("channel", sort=False)["w"].agg(
            ["count", "sum"]
        ).reset_index()
        return pd.DataFrame(
            {
                "channel": agg["channel"],
                "n_touches": agg["count"].to_numpy(dtype=np.int64),
                "credit_x1e6": agg["sum"].to_numpy(dtype=np.int64),
            }
        )

    parts = (
        ev.map_batches(project, batch_format="pyarrow",
                       batch_size=None)
        .groupby(_BUCKET)
        .map_groups(per_user, batch_format="pandas")
        .to_pandas()
    )
    if len(parts) == 0:
        return pa.table(
            {
                "channel": pa.array([], pa.string()),
                "n_touches": pa.array([], pa.int64()),
                "credit_x1e6": pa.array([], pa.int64()),
            }
        )
    agg = parts.groupby("channel", sort=True).sum().reset_index()
    return pa.table(
        {
            "channel": pa.array(agg["channel"], pa.string()),
            "n_touches": pa.array(
                agg["n_touches"].to_numpy(dtype=np.int64)
            ),
            "credit_x1e6": pa.array(
                agg["credit_x1e6"].to_numpy(dtype=np.int64)
            ),
        }
    )


TIME_DECAY_SQL = f"""
WITH e AS MATERIALIZED (
  SELECT user_id, EPOCH_US(ts) AS us, event_type
  FROM events
  WHERE user_id IS NOT NULL AND ts IS NOT NULL
    AND event_type IS NOT NULL
), pairs AS MATERIALIZED (
  SELECT t.event_type AS channel,
         CAST(ROUND(POWER(2.0, -(p.us - t.us)
              / {_DECAY_HALF_US}.0) * 1000000, 0) AS BIGINT)
           AS wppm
  FROM e t JOIN e p
    ON p.user_id = t.user_id
   AND p.event_type = 'purchase'
   AND t.event_type <> 'purchase'
   AND t.us < p.us AND t.us >= p.us - {_DECAY_WIN_US}
)
SELECT channel,
       CAST(COUNT(*) AS BIGINT) AS n_touches,
       CAST(SUM(wppm) AS BIGINT) AS credit_x1e6
FROM pairs GROUP BY channel ORDER BY channel
"""


def register_r4fd(queries: dict, oracles: dict) -> None:
    queries.update(
        {
            "lru_cache_hit_curve": q_lru_cache_hit_curve,
            "reuse_distance_hist": q_reuse_distance_hist,
            "time_decay_attribution": q_time_decay_attribution,
        }
    )
    oracles.update(
        {
            "lru_cache_hit_curve": LRU_SQL,
            "reuse_distance_hist": REUSE_HIST_SQL,
            "time_decay_attribution": TIME_DECAY_SQL,
        }
    )
