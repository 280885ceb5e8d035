"""Round-4 batch FJ: index-compression planners — the storage-side
decisions a tiered rollup engine makes per posting list.  Elias-Fano
vs plain-bitmap sizing of each event type's active-minute postings,
the optimal Golomb-Rice parameter (exact argmin over k in 0..16) for
its minute-gap stream, and front-coding savings on the per-source
sorted doc-id dictionary.

Exactness discipline: everything is integer math — minutes are
floor(epoch_us / 60e6) int64; Elias-Fano low-bit width is
bit_length(ceil(u/n) - 1) (matched in SQL by LENGTH(BIN(cd-1)));
Rice bits are sum(gap >> k) + n*(k+1) with ties broken to the lowest
k; front-coding LCPs are byte-exact on ASCII decimal ids sorted in
binary collation on both sides; ratios are ppm with the shared
round-half-away rule."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from mimirsbrunn_ray.stages.dedup import _BUCKET, add_bucket
from mimirsbrunn_ray.stages.rollup import tree_merge

_MIN_US = 60_000_000


def _round_half_away(x: float) -> int:
    return int(np.floor(x + 0.5) if x >= 0 else np.ceil(x - 0.5))


def _valid(b: pa.Table, cols) -> pa.Table:
    m = None
    for c in cols:
        v = pc.is_valid(b[c])
        m = v if m is None else pc.and_(m, v)
    return b.filter(m)


def _distinct_type_minutes(sf_dir) -> rd.Dataset:
    """Globally-distinct (event_type, minute) pairs, sharded so each
    shard is key-disjoint (safe for per-shard partial aggregates)."""
    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "ts"])

    def to_tm(b: pa.Table) -> pa.Table:
        b = _valid(b, ("event_type", "ts"))
        us = b["ts"].cast(pa.timestamp("us")).cast(pa.int64())
        t = pa.table({"event_type": b["event_type"],
                      "minute": pc.divide(us, _MIN_US)})
        return t.group_by(["event_type", "minute"]).aggregate([])

    def distinct(b: pa.Table) -> pa.Table:
        return b.select(["event_type", "minute"]).group_by(
            ["event_type", "minute"]
        ).aggregate([])

    return tree_merge(
        ev.map_batches(to_tm, batch_format="pyarrow",
                       batch_size=None),
        distinct,
        final_shards=8,
        shard_cols=["event_type", "minute"],
    )


_EF_COLS = ["event_type", "n_minutes", "universe", "low_bits",
            "ef_bits", "bitmap_bits", "best_bits"]


def q_elias_fano_posting_size(sf_dir):
    """Per event type, size its sorted active-minute posting list
    under Elias-Fano (n*(2 + l) bits, l = bit_length(ceil(u/n)-1))
    versus a plain bitmap over the spanned universe (u bits), and
    report the winner — the succinct-index choice a posting store
    makes per term.  One distinct shuffle; per-shard (min,max,count)
    partials fold through a tree merge; the per-type closed form is
    O(#types) driver math."""
    tm = _distinct_type_minutes(sf_dir)

    def stats(b: pa.Table) -> pa.Table:
        cols = ["event_type", "n", "mn", "mx"]
        if b.num_rows == 0 or "event_type" not in b.column_names:
            return pa.table({
                "event_type": pa.array([], pa.string()),
                **{c: pa.array([], pa.int64()) for c in cols[1:]},
            })
        g = b.group_by(["event_type"]).aggregate(
            [([], "count_all"), ("minute", "min"), ("minute", "max")]
        )
        return g.rename_columns(cols)

    def combine(b: pa.Table) -> pa.Table:
        g = b.group_by(["event_type"]).aggregate(
            [("n", "sum"), ("mn", "min"), ("mx", "max")]
        )
        return g.rename_columns(["event_type", "n", "mn", "mx"])

    st = tree_merge(
        tm.map_batches(stats, batch_format="pyarrow",
                       batch_size=None),
        combine,
    ).to_pandas()
    if "event_type" not in st.columns or len(st) == 0:
        return pa.table({
            "event_type": pa.array([], pa.string()),
            **{c: pa.array([], pa.int64()) for c in _EF_COLS[1:]},
        })
    st = st.sort_values("event_type", ignore_index=True)
    rows = {c: [] for c in _EF_COLS}
    for et, n, mn, mx in zip(st["event_type"],
                             st["n"].astype(np.int64),
                             st["mn"].astype(np.int64),
                             st["mx"].astype(np.int64)):
        u = int(mx - mn + 1)
        cd = (u + n - 1) // n
        low = int(cd - 1).bit_length()
        ef = int(n) * (2 + low)
        rows["event_type"].append(et)
        rows["n_minutes"].append(int(n))
        rows["universe"].append(u)
        rows["low_bits"].append(low)
        rows["ef_bits"].append(ef)
        rows["bitmap_bits"].append(u)
        rows["best_bits"].append(min(ef, u))
    return pa.table({
        "event_type": pa.array(rows["event_type"], pa.string()),
        **{c: pa.array(rows[c], pa.int64()) for c in _EF_COLS[1:]},
    })


EF_SQL = f"""
WITH dm AS MATERIALIZED (
  SELECT DISTINCT event_type, EPOCH_US(ts) // {_MIN_US} AS m
  FROM events WHERE event_type IS NOT NULL AND ts IS NOT NULL
), s AS MATERIALIZED (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(MAX(m) - MIN(m) + 1 AS BIGINT) AS u
  FROM dm GROUP BY 1
), b AS (
  SELECT event_type, n, u,
         CASE WHEN (u + n - 1) // n <= 1 THEN 0
              ELSE LENGTH(BIN(CAST((u + n - 1) // n - 1 AS BIGINT)))
         END AS low_bits
  FROM s
)
SELECT event_type,
       n AS n_minutes,
       u AS universe,
       CAST(low_bits AS BIGINT) AS low_bits,
       CAST(n * (2 + low_bits) AS BIGINT) AS ef_bits,
       u AS bitmap_bits,
       CAST(LEAST(n * (2 + low_bits), u) AS BIGINT) AS best_bits
FROM b ORDER BY event_type
"""

_RICE_KMAX = 16


def q_rice_param_plan(sf_dir):
    """Optimal Golomb-Rice parameter per event type for its stream
    of gaps between consecutive distinct active minutes: evaluate
    the exact encoded size sum(gap >> k) + n*(k+1) for k = 0..16 and
    keep the argmin (ties to the lowest k) — the gap-coding knob a
    posting compressor tunes per term.  Types are hash-bucketed so
    each group holds whole types; the 17-way k sweep is one
    vectorized outer right-shift per group."""
    tm = _distinct_type_minutes(sf_dir)

    def project(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "event_type" not in b.column_names:
            return pa.table({
                "event_type": pa.array([], pa.string()),
                "minute": pa.array([], pa.int64()),
                _BUCKET: pa.array([], pa.int64()),
            })
        return add_bucket(b.select(["event_type", "minute"]),
                          "event_type", 8)

    def rice(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({
            "event_type": pd.Series([], dtype=object),
            "n_gaps": pd.Series([], dtype=np.int64),
            "k_opt": pd.Series([], dtype=np.int64),
            "bits_opt": pd.Series([], dtype=np.int64),
        })
        if len(g) == 0:
            return empty
        g = g.sort_values(["event_type", "minute"], kind="mergesort",
                          ignore_index=True)
        et = g["event_type"].to_numpy()
        m = g["minute"].to_numpy(dtype=np.int64)
        same = np.zeros(len(g), dtype=bool)
        same[1:] = et[1:] == et[:-1]
        gaps = np.where(same, m - np.concatenate(([0], m[:-1])), 0)
        out = {"event_type": [], "n_gaps": [], "k_opt": [],
               "bits_opt": []}
        ks = np.arange(_RICE_KMAX + 1, dtype=np.int64)
        brk = np.ones(len(g), dtype=bool)
        brk[1:] = et[1:] != et[:-1]
        starts = np.flatnonzero(brk)
        ends = np.append(starts[1:], len(g))
        for s, e in zip(starts, ends):
            gg = gaps[s:e][same[s:e]]
            n = len(gg)
            if n == 0:
                continue
            # bits per k: unary (g>>k)+1 each, plus k remainder bits
            bits = (gg[:, None] >> ks[None, :]).sum(axis=0) \
                + n * (ks + 1)
            k = int(np.argmin(bits))  # argmin takes first => lowest k
            out["event_type"].append(et[s])
            out["n_gaps"].append(n)
            out["k_opt"].append(k)
            out["bits_opt"].append(int(bits[k]))
        df = pd.DataFrame(out)
        for c in ["n_gaps", "k_opt", "bits_opt"]:
            df[c] = df[c].astype(np.int64)
        return df

    res = (
        tm.map_batches(project, batch_format="pyarrow",
                       batch_size=None)
        .groupby(_BUCKET)
        .map_groups(rice, batch_format="pandas")
        .to_pandas()
    )
    cols = ["event_type", "n_gaps", "k_opt", "bits_opt",
            "bits_per_gap_ppm"]
    if "event_type" not in res.columns or len(res) == 0:
        return pa.table({
            "event_type": pa.array([], pa.string()),
            **{c: pa.array([], pa.int64()) for c in cols[1:]},
        })
    res = res.sort_values("event_type", ignore_index=True)
    ppm = [
        _round_half_away(b / n * 1e6)
        for b, n in zip(res["bits_opt"].astype(np.int64),
                        res["n_gaps"].astype(np.int64))
    ]
    return pa.table({
        "event_type": pa.array(res["event_type"], pa.string()),
        "n_gaps": pa.array(res["n_gaps"].to_numpy(np.int64)),
        "k_opt": pa.array(res["k_opt"].to_numpy(np.int64)),
        "bits_opt": pa.array(res["bits_opt"].to_numpy(np.int64)),
        "bits_per_gap_ppm": pa.array(ppm, pa.int64()),
    })


RICE_SQL = f"""
WITH dm AS MATERIALIZED (
  SELECT DISTINCT event_type, EPOCH_US(ts) // {_MIN_US} AS m
  FROM events WHERE event_type IS NOT NULL AND ts IS NOT NULL
), g AS MATERIALIZED (
  SELECT event_type,
         m - LAG(m) OVER (PARTITION BY event_type ORDER BY m) AS gap
  FROM dm
), gg AS MATERIALIZED (
  SELECT event_type, gap FROM g WHERE gap IS NOT NULL
), kb AS MATERIALIZED (
  SELECT gg.event_type, r.k,
         SUM(gap >> CAST(r.k AS INTEGER))
           + COUNT(*) * (r.k + 1) AS bits,
         CAST(COUNT(*) AS BIGINT) AS n_gaps
  FROM gg CROSS JOIN range(0, {_RICE_KMAX + 1}) r(k)
  GROUP BY 1, 2
), sel AS (
  SELECT event_type, k, bits, n_gaps,
         ROW_NUMBER() OVER (PARTITION BY event_type
                            ORDER BY bits, k) AS rnk
  FROM kb
)
SELECT event_type,
       n_gaps,
       CAST(k AS BIGINT) AS k_opt,
       CAST(bits AS BIGINT) AS bits_opt,
       CAST(ROUND(CAST(bits AS DOUBLE) / n_gaps * 1000000, 0)
            AS BIGINT) AS bits_per_gap_ppm
FROM sel WHERE rnk = 1 ORDER BY event_type
"""

_FC_WIDTH = 32  # fixed byte width for the vectorized LCP scan


def q_front_coding_savings(sf_dir):
    """Front-coding plan for the per-source doc-id dictionary: sort
    each source's decimal doc-id strings, charge each entry only its
    suffix past the longest common prefix with its predecessor plus
    a 1-byte LCP-length header, and report bytes saved — the
    dictionary-block layout decision of a term index.  Sources are
    hash-bucketed whole; the LCP scan is one fixed-width uint8
    matrix equality + cumprod per source, no per-string loop."""
    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["source", "doc_id"])

    def project(b: pa.Table) -> pa.Table:
        b = _valid(b, ("source", "doc_id"))
        t = pa.table({
            "source": b["source"],
            "sid": pc.cast(b["doc_id"], pa.string()),
        })
        return add_bucket(t, "source", 16)

    def fc(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({
            "source": pd.Series([], dtype=object),
            "n_docs": pd.Series([], dtype=np.int64),
            "id_bytes": pd.Series([], dtype=np.int64),
            "saved_bytes": pd.Series([], dtype=np.int64),
            "front_bytes": pd.Series([], dtype=np.int64),
        })
        if len(g) == 0:
            return empty
        g = g.sort_values(["source", "sid"], kind="mergesort",
                          ignore_index=True)
        src = g["source"].to_numpy()
        sid = g["sid"].to_numpy()
        lens = np.frompyfunc(len, 1, 1)(sid).astype(np.int64)
        arr = np.array(sid, dtype=f"S{_FC_WIDTH}")
        mat = arr.view(np.uint8).reshape(len(g), _FC_WIDTH)
        eq = mat[1:] == mat[:-1]
        lcp_raw = np.cumprod(eq, axis=1).sum(axis=1)
        minlen = np.minimum(lens[1:], lens[:-1])
        lcp = np.concatenate(
            ([0], np.minimum(lcp_raw, minlen)))
        # predecessor must be the SAME source's previous id
        same = np.zeros(len(g), dtype=bool)
        same[1:] = src[1:] == src[:-1]
        lcp = np.where(same, lcp, 0)
        df = pd.DataFrame({"source": src, "len": lens, "lcp": lcp})
        agg = df.groupby("source", sort=False).agg(
            n_docs=("len", "size"),
            id_bytes=("len", "sum"),
            saved_bytes=("lcp", "sum"),
        ).reset_index()
        agg["front_bytes"] = (agg["id_bytes"] - agg["saved_bytes"]
                              + agg["n_docs"])
        for c in ["n_docs", "id_bytes", "saved_bytes", "front_bytes"]:
            agg[c] = agg[c].astype(np.int64)
        return agg

    res = (
        docs.map_batches(project, batch_format="pyarrow",
                         batch_size=None)
        .groupby(_BUCKET)
        .map_groups(fc, batch_format="pandas")
        .to_pandas()
    )
    cols = ["source", "n_docs", "id_bytes", "saved_bytes",
            "front_bytes", "saved_ppm"]
    if "source" not in res.columns or len(res) == 0:
        return pa.table({
            "source": pa.array([], pa.string()),
            **{c: pa.array([], pa.int64()) for c in cols[1:]},
        })
    res = res.sort_values("source", ignore_index=True)
    ppm = [
        _round_half_away(s / t * 1e6)
        for s, t in zip(res["saved_bytes"].astype(np.int64),
                        res["id_bytes"].astype(np.int64))
    ]
    return pa.table({
        "source": pa.array(res["source"], pa.string()),
        **{c: pa.array(res[c].to_numpy(np.int64), pa.int64())
           for c in cols[1:-1]},
        "saved_ppm": pa.array(ppm, pa.int64()),
    })


FRONT_SQL = f"""
WITH d AS MATERIALIZED (
  SELECT source, CAST(doc_id AS VARCHAR) AS sid
  FROM documents
  WHERE source IS NOT NULL AND doc_id IS NOT NULL
), p AS MATERIALIZED (
  SELECT source, sid,
         LAG(sid) OVER (PARTITION BY source ORDER BY sid) AS prev,
         ROW_NUMBER() OVER () AS rn
  FROM d
), lc AS MATERIALIZED (
  SELECT p.rn, p.source, p.sid, COALESCE(MAX(r.k), 0) AS lcp
  FROM p LEFT JOIN range(1, {_FC_WIDTH + 1}) r(k)
    ON p.prev IS NOT NULL
   AND r.k <= LEAST(LENGTH(p.sid), LENGTH(p.prev))
   AND substr(p.sid, 1, CAST(r.k AS INTEGER))
         = substr(p.prev, 1, CAST(r.k AS INTEGER))
  GROUP BY 1, 2, 3
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(LENGTH(sid)) AS BIGINT) AS id_bytes,
       CAST(SUM(lcp) AS BIGINT) AS saved_bytes,
       CAST(SUM(LENGTH(sid)) - SUM(lcp) + COUNT(*) AS BIGINT)
         AS front_bytes,
       CAST(ROUND(CAST(SUM(lcp) AS DOUBLE) / SUM(LENGTH(sid))
            * 1000000, 0) AS BIGINT) AS saved_ppm
FROM lc GROUP BY source ORDER BY source
"""


def register_r4fj(queries: dict, oracles: dict) -> None:
    queries.update(
        {
            "elias_fano_posting_size": q_elias_fano_posting_size,
            "rice_param_plan": q_rice_param_plan,
            "front_coding_savings": q_front_coding_savings,
        }
    )
    oracles.update(
        {
            "elias_fano_posting_size": EF_SQL,
            "rice_param_plan": RICE_SQL,
            "front_coding_savings": FRONT_SQL,
        }
    )
