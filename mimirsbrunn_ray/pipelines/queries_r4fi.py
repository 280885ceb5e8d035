"""Round-4 batch FI: retention, sequence compression, and itemset
census — day-over-day DAU-set Jaccard (the user-overlap retention
curve between consecutive calendar days), a run-length-encoding
byte model of per-user event-type sequences (the token-run
compressibility census, per type), and basket triple support (the
3-itemset frequency table behind association mining, top 20).

Exactness discipline: days are floor(epoch_us / 86400e6) int64 on
both sides; Jaccard and RLE ratios are ppm with the shared
round-half-away rule; runs are segmented over the SAME
(user, ts, event_id) total order as the oracle's window; triples
are emitted from per-order sorted distinct part sets so the
(p1<p2<p3) canonical form matches the oracle's inequality join."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from mimirsbrunn_ray.stages.dedup import _BUCKET, add_bucket
from mimirsbrunn_ray.stages.rollup import tree_merge

_DAY_US = 86_400_000_000


def _round_half_away(x: float) -> int:
    return int(np.floor(x + 0.5) if x >= 0 else np.ceil(x - 0.5))


def _valid(b: pa.Table, cols) -> pa.Table:
    m = None
    for c in cols:
        v = pc.is_valid(b[c])
        m = v if m is None else pc.and_(m, v)
    return b.filter(m)


def q_dau_jaccard_daily(sf_dir):
    """For every consecutive calendar-day pair (d, d+1) present in
    events: DAU of each day, the number of users active on BOTH,
    and the Jaccard similarity in ppm. One distinct-(user,day)
    pass feeds both per-day counts and the per-user adjacent-day
    intersection scan (sorted day list per user, vectorized
    diff==1 mask) — no user-level join, no full shuffle beyond the
    user-hash bucketing."""
    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts"])

    def to_ud(b: pa.Table) -> pa.Table:
        b = _valid(b, ("user_id", "ts"))
        us = b["ts"].cast(pa.timestamp("us")).cast(pa.int64())
        day = pc.divide(us, _DAY_US)
        t = pa.table({"user_id": b["user_id"], "day": day})
        return t.group_by(["user_id", "day"]).aggregate([])

    def distinct(b: pa.Table) -> pa.Table:
        return b.select(["user_id", "day"]).group_by(
            ["user_id", "day"]
        ).aggregate([])

    ud = tree_merge(
        ev.map_batches(to_ud, batch_format="pyarrow",
                       batch_size=None),
        distinct,
        final_shards=8,
        shard_cols=["user_id"],
    ).materialize()

    def day_counts(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "day" not in b.column_names:
            return pa.table({"day": pa.array([], pa.int64()),
                             "c": pa.array([], pa.int64())})
        g = b.group_by(["day"]).aggregate([([], "count_all")])
        return g.rename_columns(["day", "c"])

    def sum_c(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "day" not in b.column_names:
            return pa.table({"day": pa.array([], pa.int64()),
                             "c": pa.array([], pa.int64())})
        g = b.group_by(["day"]).aggregate([("c", "sum")])
        return g.rename_columns(["day", "c"])

    dc = tree_merge(
        ud.map_batches(day_counts, batch_format="pyarrow",
                       batch_size=None),
        sum_c,
    ).to_pandas()

    # shards are user-disjoint, so within-batch adjacency is exact:
    # each user's full day set lives in exactly one shard.
    def adj(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "user_id" not in b.column_names:
            return pa.table({"day": pa.array([], pa.int64()),
                             "c": pa.array([], pa.int64())})
        df = b.select(["user_id", "day"]).to_pandas()
        df = df.sort_values(["user_id", "day"], ignore_index=True)
        uid = df["user_id"].to_numpy(dtype=np.int64)
        day = df["day"].to_numpy(dtype=np.int64)
        hit = (uid[1:] == uid[:-1]) & (day[1:] == day[:-1] + 1)
        both = day[:-1][hit]
        t = pa.table({"day": pa.array(both, pa.int64()),
                      "c": pa.array(np.ones(len(both), np.int64))})
        return t.group_by(["day"]).aggregate([("c", "sum")]
                                             ).rename_columns(
            ["day", "c"])

    inter = tree_merge(
        ud.map_batches(adj, batch_format="pyarrow",
                       batch_size=None),
        sum_c,
    ).to_pandas()

    cnt = (dict(zip(dc["day"].astype(np.int64),
                    dc["c"].astype(np.int64)))
           if len(dc) and "day" in dc.columns else {})
    imap = (dict(zip(inter["day"].astype(np.int64),
                     inter["c"].astype(np.int64)))
            if len(inter) and "day" in inter.columns else {})
    days = sorted(cnt)
    rows = {"day": [], "dau_a": [], "dau_b": [], "n_both": [],
            "jaccard_ppm": []}
    for d in days:
        if d + 1 not in cnt:
            continue
        a, bb = cnt[d], cnt[d + 1]
        nb = imap.get(d, 0)
        rows["day"].append(int(d))
        rows["dau_a"].append(int(a))
        rows["dau_b"].append(int(bb))
        rows["n_both"].append(int(nb))
        rows["jaccard_ppm"].append(
            _round_half_away(nb / (a + bb - nb) * 1e6))
    return pa.table(
        {c: pa.array(rows[c], pa.int64()) for c in
         ["day", "dau_a", "dau_b", "n_both", "jaccard_ppm"]}
    )


DAU_JACCARD_SQL = f"""
WITH ud AS MATERIALIZED (
  SELECT DISTINCT user_id,
         EPOCH_US(ts) // {_DAY_US} AS day
  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
), dc AS MATERIALIZED (
  SELECT day, COUNT(*) AS c FROM ud GROUP BY 1
), inter AS MATERIALIZED (
  SELECT a.day AS day, COUNT(*) AS nb
  FROM ud a JOIN ud b
    ON a.user_id = b.user_id AND b.day = a.day + 1
  GROUP BY 1
)
SELECT CAST(d1.day AS BIGINT) AS day,
       CAST(d1.c AS BIGINT) AS dau_a,
       CAST(d2.c AS BIGINT) AS dau_b,
       CAST(COALESCE(i.nb, 0) AS BIGINT) AS n_both,
       CAST(ROUND(CAST(COALESCE(i.nb, 0) AS DOUBLE)
            / (d1.c + d2.c - COALESCE(i.nb, 0)) * 1000000, 0)
            AS BIGINT) AS jaccard_ppm
FROM dc d1
JOIN dc d2 ON d2.day = d1.day + 1
LEFT JOIN inter i ON i.day = d1.day
ORDER BY day
"""


def q_rle_type_runs(sf_dir):
    """Run-length-encoding census of per-user event-type sequences:
    segment each user's (ts, event_id)-ordered type stream into
    maximal same-type runs, then per event type report run count,
    event count, longest run, the RLE byte cost (1 tag byte +
    varint run length: 1B < 128, 2B < 16384, else 3B) and the
    bytes-per-event ratio in ppm — the compressibility profile of
    the type-token stream. One user-hash shuffle; runs are found by
    a vectorized boundary mask; per-type partials fold through a
    tree merge."""
    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "ts", "event_id", "event_type"],
    )

    def project(b: pa.Table) -> pa.Table:
        b = _valid(b, ("user_id", "ts", "event_type"))
        t = pa.table({
            "user_id": b["user_id"],
            "us": b["ts"].cast(pa.timestamp("us")).cast(pa.int64()),
            "event_id": b["event_id"],
            "event_type": b["event_type"],
        })
        return add_bucket(t, "user_id", 64)

    def runs_partial(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({
            "event_type": pd.Series([], dtype=object),
            "n_runs": pd.Series([], dtype=np.int64),
            "n_events": pd.Series([], dtype=np.int64),
            "max_run": pd.Series([], dtype=np.int64),
            "bytes_rle": pd.Series([], dtype=np.int64),
        })
        if len(g) == 0:
            return empty
        g = g.sort_values(["user_id", "us", "event_id"],
                          kind="mergesort", ignore_index=True)
        uid = g["user_id"].to_numpy(dtype=np.int64)
        et = g["event_type"].to_numpy()
        brk = np.ones(len(g), dtype=bool)
        brk[1:] = (uid[1:] != uid[:-1]) | (et[1:] != et[:-1])
        starts = np.flatnonzero(brk)
        lens = np.diff(np.append(starts, len(g)))
        rt = et[starts]
        vb = np.where(lens < 128, 1,
                      np.where(lens < 16384, 2, 3)).astype(np.int64)
        df = pd.DataFrame({"event_type": rt, "len": lens,
                           "b": 1 + vb})
        agg = df.groupby("event_type", sort=False).agg(
            n_runs=("len", "size"),
            n_events=("len", "sum"),
            max_run=("len", "max"),
            bytes_rle=("b", "sum"),
        ).reset_index()
        for c in ["n_runs", "n_events", "max_run", "bytes_rle"]:
            agg[c] = agg[c].astype(np.int64)
        return agg

    def combine(b: pa.Table) -> pa.Table:
        g = b.group_by(["event_type"]).aggregate(
            [("n_runs", "sum"), ("n_events", "sum"),
             ("max_run", "max"), ("bytes_rle", "sum")]
        )
        return g.rename_columns(
            ["event_type", "n_runs", "n_events", "max_run",
             "bytes_rle"])

    out = tree_merge(
        ev.map_batches(project, batch_format="pyarrow",
                       batch_size=None)
        .groupby(_BUCKET)
        .map_groups(runs_partial, batch_format="pandas"),
        combine,
    ).to_pandas()
    if "event_type" not in out.columns:
        return pa.table({
            "event_type": pa.array([], pa.string()),
            **{c: pa.array([], pa.int64()) for c in
               ["n_runs", "n_events", "max_run", "bytes_rle",
                "bytes_per_event_ppm"]},
        })
    out = out.sort_values("event_type", ignore_index=True)
    ratio = [
        _round_half_away(b / n * 1e6)
        for b, n in zip(out["bytes_rle"].astype(np.int64),
                        out["n_events"].astype(np.int64))
    ]
    return pa.table({
        "event_type": pa.array(out["event_type"], pa.string()),
        "n_runs": pa.array(out["n_runs"].to_numpy(np.int64)),
        "n_events": pa.array(out["n_events"].to_numpy(np.int64)),
        "max_run": pa.array(out["max_run"].to_numpy(np.int64)),
        "bytes_rle": pa.array(out["bytes_rle"].to_numpy(np.int64)),
        "bytes_per_event_ppm": pa.array(ratio, pa.int64()),
    })


RLE_SQL = """
WITH e AS MATERIALIZED (
  SELECT user_id, EPOCH_US(ts) AS us, event_id, event_type
  FROM events
  WHERE user_id IS NOT NULL AND ts IS NOT NULL
    AND event_type IS NOT NULL
), m AS MATERIALIZED (
  SELECT user_id, us, event_id, event_type,
         CASE WHEN LAG(user_id) OVER w IS NULL
                OR LAG(user_id) OVER w <> user_id
                OR LAG(event_type) OVER w <> event_type
              THEN 1 ELSE 0 END AS brk
  FROM e WINDOW w AS (ORDER BY user_id, us, event_id)
), r AS MATERIALIZED (
  SELECT event_type,
         SUM(brk) OVER (ORDER BY user_id, us, event_id
                        ROWS UNBOUNDED PRECEDING) AS rid
  FROM m
), rl AS MATERIALIZED (
  SELECT rid, ANY_VALUE(event_type) AS event_type,
         CAST(COUNT(*) AS BIGINT) AS len
  FROM r GROUP BY rid
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_runs,
       CAST(SUM(len) AS BIGINT) AS n_events,
       CAST(MAX(len) AS BIGINT) AS max_run,
       CAST(SUM(1 + CASE WHEN len < 128 THEN 1
                         WHEN len < 16384 THEN 2
                         ELSE 3 END) AS BIGINT) AS bytes_rle,
       CAST(ROUND(CAST(SUM(1 + CASE WHEN len < 128 THEN 1
                                    WHEN len < 16384 THEN 2
                                    ELSE 3 END) AS DOUBLE)
            / SUM(len) * 1000000, 0) AS BIGINT)
         AS bytes_per_event_ppm
FROM rl GROUP BY event_type ORDER BY event_type
"""

_TRI_TOP = 20
# precomputed C(k,3) index triplets for order sizes up to 32 parts
_TRI_IDX: dict[int, np.ndarray] = {}


def _tri_idx(k: int) -> np.ndarray:
    got = _TRI_IDX.get(k)
    if got is None:
        got = np.array(
            [(i, j, l) for i in range(k) for j in range(i + 1, k)
             for l in range(j + 1, k)],
            dtype=np.int64,
        )
        _TRI_IDX[k] = got
    return got


def q_basket_triple_support(sf_dir):
    """Top-20 part TRIPLES by the number of orders containing all
    three (support), ties broken by (p1,p2,p3) — the 3-itemset
    table behind association-rule mining. Per-order distinct part
    sets come from an order-hash groupby; triple emission is
    vectorized per distinct basket size k (one (n_orders_k, C(k,3))
    fancy-index per k, no per-order Python loop); counts fold
    through a (p1,p2,p3)-sharded combine whose key-disjoint shards
    make local top-20 pruning exact."""
    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey", "l_partkey"])

    def project(b: pa.Table) -> pa.Table:
        b = _valid(b, ("l_orderkey", "l_partkey"))
        t = b.group_by(["l_orderkey", "l_partkey"]).aggregate([])
        return add_bucket(t, "l_orderkey", 64)

    def triples(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({
            "p1": pd.Series([], dtype=np.int64),
            "p2": pd.Series([], dtype=np.int64),
            "p3": pd.Series([], dtype=np.int64),
            "support": pd.Series([], dtype=np.int64),
        })
        if len(g) == 0:
            return empty
        df = g[["l_orderkey", "l_partkey"]].drop_duplicates()
        df = df.sort_values(["l_orderkey", "l_partkey"],
                            ignore_index=True)
        ok = df["l_orderkey"].to_numpy(dtype=np.int64)
        pk = df["l_partkey"].to_numpy(dtype=np.int64)
        brk = np.ones(len(df), dtype=bool)
        brk[1:] = ok[1:] != ok[:-1]
        starts = np.flatnonzero(brk)
        sizes = np.diff(np.append(starts, len(df)))
        outs = []
        for k in np.unique(sizes):
            if k < 3:
                continue
            sel = starts[sizes == k]
            # (n_k, k) matrix of each order's sorted parts
            mat = pk[sel[:, None] + np.arange(k)[None, :]]
            idx = _tri_idx(int(k))
            outs.append(np.concatenate(
                [mat[:, idx[:, 0]].reshape(-1, 1),
                 mat[:, idx[:, 1]].reshape(-1, 1),
                 mat[:, idx[:, 2]].reshape(-1, 1)], axis=1))
        if not outs:
            return empty
        allt = np.concatenate(outs, axis=0)
        out = pd.DataFrame(
            {"p1": allt[:, 0], "p2": allt[:, 1], "p3": allt[:, 2]})
        out = out.groupby(["p1", "p2", "p3"], sort=False).size()
        out = out.reset_index(name="support")
        out["support"] = out["support"].astype(np.int64)
        return out

    def combine(b: pa.Table) -> pa.Table:
        g = b.group_by(["p1", "p2", "p3"]).aggregate(
            [("support", "sum")])
        return g.rename_columns(["p1", "p2", "p3", "support"])

    counted = tree_merge(
        li.map_batches(project, batch_format="pyarrow",
                       batch_size=None)
        .groupby(_BUCKET)
        .map_groups(triples, batch_format="pandas"),
        combine,
        final_shards=8,
        shard_cols=["p1", "p2", "p3"],
    )

    def local_top(b: pa.Table) -> pa.Table:
        cols = ["p1", "p2", "p3", "support"]
        if b.num_rows == 0 or "p1" not in b.column_names:
            return pa.table(
                {c: pa.array([], pa.int64()) for c in cols})
        df = b.select(cols).to_pandas()
        df = df.sort_values(
            ["support", "p1", "p2", "p3"],
            ascending=[False, True, True, True],
            ignore_index=True,
        ).head(_TRI_TOP)
        return pa.table(
            {c: pa.array(df[c].to_numpy(np.int64)) for c in cols})

    top = counted.map_batches(local_top, batch_format="pyarrow",
                              batch_size=None).to_pandas()
    cols = ["p1", "p2", "p3", "support"]
    if "p1" not in top.columns:
        return pa.table({c: pa.array([], pa.int64()) for c in cols})
    top = top.sort_values(["support", "p1", "p2", "p3"],
                          ascending=[False, True, True, True],
                          ignore_index=True).head(_TRI_TOP)
    return pa.table(
        {c: pa.array(top[c].to_numpy(np.int64)) for c in cols}
    )


TRIPLE_SQL = f"""
WITH dp AS MATERIALIZED (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
  WHERE l_orderkey IS NOT NULL AND l_partkey IS NOT NULL
)
SELECT CAST(a.l_partkey AS BIGINT) AS p1,
       CAST(b.l_partkey AS BIGINT) AS p2,
       CAST(c.l_partkey AS BIGINT) AS p3,
       CAST(COUNT(*) AS BIGINT) AS support
FROM dp a
JOIN dp b ON a.l_orderkey = b.l_orderkey
         AND b.l_partkey > a.l_partkey
JOIN dp c ON a.l_orderkey = c.l_orderkey
         AND c.l_partkey > b.l_partkey
GROUP BY 1, 2, 3
ORDER BY support DESC, p1, p2, p3
LIMIT {_TRI_TOP}
"""


def register_r4fi(queries: dict, oracles: dict) -> None:
    queries.update(
        {
            "dau_jaccard_daily": q_dau_jaccard_daily,
            "rle_type_runs": q_rle_type_runs,
            "basket_triple_support": q_basket_triple_support,
        }
    )
    oracles.update(
        {
            "dau_jaccard_daily": DAU_JACCARD_SQL,
            "rle_type_runs": RLE_SQL,
            "basket_triple_support": TRIPLE_SQL,
        }
    )
