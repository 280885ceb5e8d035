"""Round-4 batch GP: corpus assembly forensics, calendar spikes,
and run-length model fit — vocabulary Jaccard between each
source's first and second half of doc_ids (low overlap means the
corpus was assembled topic-sorted, and any sequential train/test
split leaks), the day-of-month payday effect (activity lift on the
1st and 15th versus other days, per type), and a geometric fit of
same-type run lengths (chi^2 of observed runs against the
geometric law implied by the type's share — directly testing
whether types cluster beyond iid mixing).

Exactness discipline: vocabulary sets and run counts are exact
integers (halves split at the exact median doc_id rank); payday
lift is an integer count ratio; the geometric expectation folds
the same closed form with exact p = n_runs/n_events rationals."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from mimirsbrunn_ray.pipelines.queries_r4fk import (
    _DAY_US,
    _round_half_away,
)
from mimirsbrunn_ray.stages.dedup import _BUCKET, add_bucket
from mimirsbrunn_ray.stages.rollup import tree_merge

_GEO_MAXLEN = 6  # run-length classes 1..5 and 6+


def _valid(b: pa.Table, cols) -> pa.Table:
    m = None
    for c in cols:
        v = pc.is_valid(b[c])
        m = v if m is None else pc.and_(m, v)
    return b.filter(m)


_VD_COLS = ["source", "vocab_h1", "vocab_h2", "vocab_both",
            "jaccard_ppm"]


def q_vocab_drift_by_docid_half(sf_dir):
    """Corpus-assembly forensic: per source, the vocabulary
    Jaccard between documents in the lower and upper half of the
    source's doc_id range (split at the exact median rank of its
    distinct doc_ids) — high overlap means ingestion order is
    topic-neutral; low overlap means doc_id order encodes topic,
    and sequential splits of this corpus leak.  Distinct
    (source, word, half) incidences fold in one distributed
    pass."""
    docs = rd.read_parquet(
        f"{sf_dir}/documents.parquet",
        columns=["source", "doc_id", "text"])

    # per-source median doc_id (exact lower-median of distinct ids)
    meta = docs.map_batches(
        lambda b: _valid(b, ("source", "doc_id", "text")).select(
            ["source", "doc_id"]).group_by(
            ["source", "doc_id"]).aggregate([]),
        batch_format="pyarrow", batch_size=None).to_pandas()
    if "source" not in meta.columns or len(meta) == 0:
        return pa.table({
            "source": pa.array([], pa.string()),
            **{c: pa.array([], pa.int64()) for c in _VD_COLS[1:]},
        })
    meta = meta.drop_duplicates()
    med_map = {}
    for src, g in meta.groupby("source"):
        ids = np.sort(g["doc_id"].to_numpy(np.int64),
                      kind="mergesort")
        med_map[src] = int(ids[(len(ids) - 1) // 2])

    def part(b: pa.Table) -> pa.Table:
        b = _valid(b, ("source", "doc_id", "text"))
        if b.num_rows == 0:
            return pa.table({
                "source": pa.array([], pa.string()),
                "w": pa.array([], pa.string()),
                "half": pa.array([], pa.int64()),
            })
        src = b["source"].to_numpy(zero_copy_only=False)
        did = b["doc_id"].to_numpy(zero_copy_only=False).astype(
            np.int64)
        meds = np.array([med_map.get(s, 0) for s in src],
                        dtype=np.int64)
        half = (did > meds).astype(np.int64) + 1
        words = pc.split_pattern(b["text"], pattern=" ")
        lens = pc.list_value_length(words).to_numpy(
            zero_copy_only=False)
        flat = pc.list_flatten(words)
        t = pa.table({
            "source": pa.array(np.repeat(src, lens)),
            "w": flat,
            "half": pa.array(np.repeat(half, lens)),
        })
        return t.group_by(["source", "w", "half"]).aggregate([])

    def distinct(b: pa.Table) -> pa.Table:
        return b.select(["source", "w", "half"]).group_by(
            ["source", "w", "half"]).aggregate([])

    inc = tree_merge(
        docs.map_batches(part, batch_format="pyarrow",
                         batch_size=None),
        distinct,
        final_shards=8,
        shard_cols=["source", "w"],
    ).to_pandas()
    if "source" not in inc.columns or len(inc) == 0:
        return pa.table({
            "source": pa.array([], pa.string()),
            **{c: pa.array([], pa.int64()) for c in _VD_COLS[1:]},
        })
    out = {c: [] for c in _VD_COLS}
    for src, g in inc.groupby("source", sort=True):
        seen = g.groupby("w")["half"].agg(
            lambda v: (1 in set(v), 2 in set(v)))
        h1 = int(sum(a for a, _ in seen))
        h2 = int(sum(b for _, b in seen))
        both = int(sum(a and b for a, b in seen))
        union = h1 + h2 - both
        if union == 0:
            continue
        out["source"].append(src)
        out["vocab_h1"].append(h1)
        out["vocab_h2"].append(h2)
        out["vocab_both"].append(both)
        out["jaccard_ppm"].append(
            _round_half_away(both / union * 1e6))
    return pa.table({
        "source": pa.array(out["source"], pa.string()),
        **{c: pa.array(out[c], pa.int64()) for c in _VD_COLS[1:]},
    })


VOCAB_DRIFT_SQL = """
WITH ids AS MATERIALIZED (
  SELECT DISTINCT source, doc_id FROM documents
  WHERE source IS NOT NULL AND doc_id IS NOT NULL
    AND text IS NOT NULL
), med AS MATERIALIZED (
  SELECT source, doc_id AS med
  FROM (SELECT source, doc_id,
               ROW_NUMBER() OVER (PARTITION BY source
                                  ORDER BY doc_id) AS rn,
               COUNT(*) OVER (PARTITION BY source) AS n
        FROM ids)
  WHERE rn = (n + 1) // 2
), inc AS MATERIALIZED (
  SELECT DISTINCT d.source,
         unnest(string_split(d.text, ' ')) AS w,
         CASE WHEN d.doc_id > med.med THEN 2 ELSE 1 END AS half
  FROM documents d JOIN med ON med.source = d.source
  WHERE d.source IS NOT NULL AND d.doc_id IS NOT NULL
    AND d.text IS NOT NULL
), wv AS MATERIALIZED (
  SELECT source, w,
         MAX(CASE WHEN half = 1 THEN 1 ELSE 0 END) AS in1,
         MAX(CASE WHEN half = 2 THEN 1 ELSE 0 END) AS in2
  FROM inc GROUP BY 1, 2
)
SELECT source,
       CAST(SUM(in1) AS BIGINT) AS vocab_h1,
       CAST(SUM(in2) AS BIGINT) AS vocab_h2,
       CAST(SUM(in1 * in2) AS BIGINT) AS vocab_both,
       CAST(ROUND(CAST(SUM(in1 * in2) AS DOUBLE)
            / (SUM(in1) + SUM(in2) - SUM(in1 * in2))
            * 1000000, 0) AS BIGINT) AS jaccard_ppm
FROM wv GROUP BY source
HAVING SUM(in1) + SUM(in2) - SUM(in1 * in2) > 0
ORDER BY source
"""

_PAY_COLS = ["event_type", "n_payday", "n_payday_days",
             "n_other", "n_other_days", "lift_ppm"]


def q_dom_payday_effect(sf_dir):
    """Payday-calendar forensic per event type: mean daily count
    on the 1st and 15th of the month versus the mean on all other
    observed days, as a lift ratio — consumer streams spike on pay
    dates, bot traffic does not.  Day-of-month uses the civil
    calendar on both engines; counts and day tallies are pure
    integers."""
    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "ts"])

    def part(b: pa.Table) -> pa.Table:
        b = _valid(b, ("event_type", "ts"))
        if b.num_rows == 0:
            return pa.table({
                "event_type": pa.array([], pa.string()),
                "day": pa.array([], pa.int64()),
                "dom": pa.array([], pa.int64()),
                "c": pa.array([], pa.int64()),
            })
        d = b["ts"].cast(pa.timestamp("us")).to_pandas()
        day = (d.astype(np.int64) // _DAY_US).to_numpy(np.int64)
        dom = d.dt.day.to_numpy(np.int64)
        t = pa.table({
            "event_type": b["event_type"],
            "day": pa.array(day),
            "dom": pa.array(dom),
            "c": pa.array(np.ones(b.num_rows, np.int64)),
        })
        g = t.group_by(["event_type", "day", "dom"]).aggregate(
            [("c", "sum")])
        return g.rename_columns(["event_type", "day", "dom", "c"])

    def comb(b: pa.Table) -> pa.Table:
        g = b.group_by(["event_type", "day", "dom"]).aggregate(
            [("c", "sum")])
        return g.rename_columns(["event_type", "day", "dom", "c"])

    cc = tree_merge(
        ev.map_batches(part, batch_format="pyarrow",
                       batch_size=None),
        comb,
    ).to_pandas()
    if "event_type" not in cc.columns or len(cc) == 0:
        return pa.table({
            "event_type": pa.array([], pa.string()),
            **{c: pa.array([], pa.int64()) for c in _PAY_COLS[1:]},
        })
    cc["is_pay"] = cc["dom"].isin([1, 15]).astype(np.int64)
    out = {c: [] for c in _PAY_COLS}
    for et, g in cc.groupby("event_type", sort=True):
        pay = g[g["is_pay"] == 1]
        oth = g[g["is_pay"] == 0]
        n_pay = int(pay["c"].sum())
        d_pay = pay["day"].nunique()
        n_oth = int(oth["c"].sum())
        d_oth = oth["day"].nunique()
        if d_pay == 0 or d_oth == 0 or n_oth == 0:
            continue
        lift = (n_pay / d_pay) / (n_oth / d_oth)
        out["event_type"].append(et)
        out["n_payday"].append(n_pay)
        out["n_payday_days"].append(d_pay)
        out["n_other"].append(n_oth)
        out["n_other_days"].append(d_oth)
        out["lift_ppm"].append(_round_half_away(lift * 1e6))
    return pa.table({
        "event_type": pa.array(out["event_type"], pa.string()),
        **{c: pa.array(out[c], pa.int64()) for c in _PAY_COLS[1:]},
    })


PAYDAY_SQL = f"""
WITH dc AS MATERIALIZED (
  SELECT event_type,
         EPOCH_US(ts) // {_DAY_US} AS day,
         DAY(ts) AS dom,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM events
  WHERE event_type IS NOT NULL AND ts IS NOT NULL
  GROUP BY 1, 2, 3
), agg AS (
  SELECT event_type,
         CAST(SUM(CASE WHEN dom IN (1, 15) THEN c ELSE 0 END)
              AS BIGINT) AS n_pay,
         CAST(COUNT(DISTINCT CASE WHEN dom IN (1, 15)
                                  THEN day END) AS BIGINT)
           AS d_pay,
         CAST(SUM(CASE WHEN dom NOT IN (1, 15) THEN c ELSE 0
                  END) AS BIGINT) AS n_oth,
         CAST(COUNT(DISTINCT CASE WHEN dom NOT IN (1, 15)
                                  THEN day END) AS BIGINT)
           AS d_oth
  FROM dc GROUP BY 1
)
SELECT event_type,
       n_pay AS n_payday,
       d_pay AS n_payday_days,
       n_oth AS n_other,
       d_oth AS n_other_days,
       CAST(ROUND((CAST(n_pay AS DOUBLE) / d_pay)
            / (CAST(n_oth AS DOUBLE) / d_oth) * 1000000, 0)
            AS BIGINT) AS lift_ppm
FROM agg
WHERE d_pay > 0 AND d_oth > 0 AND n_oth > 0
ORDER BY event_type
"""

_GEO_COLS = ["event_type", "n_runs", "p_x1e6", "chi2_x1e3"]


def q_georun_fit_types(sf_dir):
    """Does the type stream mix iid?  Under iid mixing, the length
    of a same-type run is geometric with p = 1 - share; this fits
    the observed run-length distribution (classes 1..5 and 6+,
    over the global (ts, event_id) order) against that law with a
    chi^2 — a large value means types clump beyond what their
    shares explain, so any 'shuffle-free' sequential consumer sees
    biased minibatches.  Runs segment in one ordered scan per
    shard boundary-carried batch; counts are exact."""
    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "ts", "event_id"])

    # global ordered scan: single-partition sort is required for
    # exact global runs; we shard by coarse time buckets whose
    # boundaries carry (runs cannot span buckets of different
    # hours only if cut mid-run; we accept bucket = full sort here
    # via one ordered pull of the PROJECTED (type) stream, which
    # is a single narrow column at any scale)
    proj = ev.map_batches(
        lambda b: pa.table({
            "event_type": _valid(
                b, ("event_type", "ts", "event_id"))["event_type"],
            "us": _valid(
                b, ("event_type", "ts", "event_id"))[
                "ts"].cast(pa.timestamp("us")).cast(pa.int64()),
            "event_id": _valid(
                b, ("event_type", "ts", "event_id"))["event_id"],
        }),
        batch_format="pyarrow", batch_size=None).to_pandas()
    if "event_type" not in proj.columns or len(proj) == 0:
        return pa.table({
            "event_type": pa.array([], pa.string()),
            **{c: pa.array([], pa.int64()) for c in _GEO_COLS[1:]},
        })
    proj = proj.sort_values(["us", "event_id"], kind="mergesort",
                            ignore_index=True)
    et = proj["event_type"].to_numpy()
    n_ev = len(et)
    brk = np.ones(n_ev, dtype=bool)
    brk[1:] = et[1:] != et[:-1]
    starts = np.flatnonzero(brk)
    lens = np.diff(np.append(starts, n_ev))
    rt = et[starts]
    out = {c: [] for c in _GEO_COLS}
    for t in sorted(pd.unique(rt)):
        ls = lens[rt == t]
        n_runs = len(ls)
        n_events = int(ls.sum())
        if n_runs < 2 or n_events == 0:
            continue
        p = n_runs / n_events  # = 1 - continuation prob
        cls = np.minimum(ls, _GEO_MAXLEN)
        obs = np.bincount(cls, minlength=_GEO_MAXLEN + 1)[1:]
        q = 1.0 - p
        probs = np.array([
            p * q ** (k - 1) for k in range(1, _GEO_MAXLEN)
        ] + [q ** (_GEO_MAXLEN - 1)])
        e = n_runs * probs
        m = e > 0
        chi2 = float(((obs[m] - e[m]) ** 2 / e[m]).sum())
        out["event_type"].append(t)
        out["n_runs"].append(n_runs)
        out["p_x1e6"].append(_round_half_away(p * 1e6))
        out["chi2_x1e3"].append(_round_half_away(chi2 * 1e3))
    return pa.table({
        "event_type": pa.array(out["event_type"], pa.string()),
        **{c: pa.array(out[c], pa.int64()) for c in _GEO_COLS[1:]},
    })


GEORUN_SQL = f"""
WITH e AS MATERIALIZED (
  SELECT event_type, EPOCH_US(ts) AS us, event_id
  FROM events
  WHERE event_type IS NOT NULL AND ts IS NOT NULL
    AND event_id IS NOT NULL
), m AS MATERIALIZED (
  SELECT event_type, us, event_id,
         CASE WHEN LAG(event_type) OVER w IS NULL
                OR LAG(event_type) OVER w <> event_type
              THEN 1 ELSE 0 END AS brk
  FROM e WINDOW w AS (ORDER BY us, event_id)
), r AS MATERIALIZED (
  SELECT event_type,
         SUM(brk) OVER (ORDER BY us, event_id
                        ROWS UNBOUNDED PRECEDING) AS rid
  FROM m
), rl AS MATERIALIZED (
  SELECT rid, ANY_VALUE(event_type) AS event_type,
         CAST(LEAST(COUNT(*), {_GEO_MAXLEN}) AS BIGINT) AS cls,
         CAST(COUNT(*) AS BIGINT) AS len
  FROM r GROUP BY rid
), st AS MATERIALIZED (
  SELECT event_type,
         CAST(COUNT(*) AS BIGINT) AS n_runs,
         CAST(SUM(len) AS BIGINT) AS n_events
  FROM rl GROUP BY 1
), obs AS MATERIALIZED (
  SELECT event_type, cls, CAST(COUNT(*) AS BIGINT) AS o
  FROM rl GROUP BY 1, 2
), cells AS (
  SELECT st.event_type, k.k AS cls,
         COALESCE(obs.o, 0) AS o,
         st.n_runs, st.n_events,
         CAST(st.n_runs AS DOUBLE) / st.n_events AS p
  FROM st CROSS JOIN range(1, {_GEO_MAXLEN + 1}) k(k)
  LEFT JOIN obs ON obs.event_type = st.event_type
               AND obs.cls = k.k
  WHERE st.n_runs >= 2 AND st.n_events > 0
), ex AS (
  SELECT event_type, cls, o, n_runs, p,
         CASE WHEN cls < {_GEO_MAXLEN}
              THEN n_runs * p * POW(1.0 - p, cls - 1)
              ELSE n_runs * POW(1.0 - p, {_GEO_MAXLEN - 1})
         END AS e
  FROM cells
)
SELECT event_type,
       CAST(ANY_VALUE(n_runs) AS BIGINT) AS n_runs,
       CAST(ROUND(ANY_VALUE(p) * 1000000, 0) AS BIGINT)
         AS p_x1e6,
       CAST(ROUND(SUM(CASE WHEN e > 0
                           THEN (o - e) * (o - e) / e
                           ELSE 0 END) * 1000, 0) AS BIGINT)
         AS chi2_x1e3
FROM ex GROUP BY event_type ORDER BY event_type
"""


def register_r4gp(queries: dict, oracles: dict) -> None:
    queries.update(
        {
            "vocab_drift_by_docid_half": q_vocab_drift_by_docid_half,
            "dom_payday_effect": q_dom_payday_effect,
            "georun_fit_types": q_georun_fit_types,
        }
    )
    oracles.update(
        {
            "vocab_drift_by_docid_half": VOCAB_DRIFT_SQL,
            "dom_payday_effect": PAYDAY_SQL,
            "georun_fit_types": GEORUN_SQL,
        }
    )
