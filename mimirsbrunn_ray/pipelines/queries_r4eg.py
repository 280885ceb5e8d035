"""Round-4 batch EG: weighted isotonic regression of the hour-of-day
value profile (PAVA via the minimax closed form), the Rousseeuw-Croux
Qn robust scale estimator over dense hourly counts, and the ACE
(abundance-based coverage) vocabulary-richness estimator per source.

Exactness discipline: the isotonic fit evaluates every interval
average Av(j,k) as ONE double division of exact int64 prefix sums and
takes max-of-min over the identical double set on both sides, so the
fitted values are bit-equal before the x1e6 snap; Qn's k-th order
statistic of pairwise |count differences| is a pure integer; ACE folds
exact frequency-of-frequency integer counts through one mirrored
double expression (same parenthesisation in numpy and SQL)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from mimirsbrunn_ray.stages.dedup import _BUCKET, add_bucket
from mimirsbrunn_ray.stages.rollup import tree_merge

_HOUR_US = 3_600_000_000


def _round_half_away(x: float) -> int:
    return int(np.floor(x + 0.5) if x >= 0 else np.ceil(x - 0.5))


def _not_null(b: pa.Table, cols) -> pa.Table:
    m = None
    for c in cols:
        v = pc.is_valid(b[c])
        m = v if m is None else pc.and_(m, v)
    return b.filter(m)


# ---------------------------------------------------------------------------
# Weighted isotonic (non-decreasing) fit of mean value by hour-of-day
# ---------------------------------------------------------------------------


def q_isotonic_hod_fit(sf_dir):
    """Per (event_type, hour-of-day): the weighted isotonic
    regression of mean value (cents) as a non-decreasing function of
    the hour 0..23 — the order-constrained trend fit (PAVA). Uses the
    minimax closed form fit_i = max_{j<=i} min_{k>=i} Av(j,k) over the
    bounded 24-point grain, where Av(j,k) is the weighted mean of
    hours j..k from exact int64 (sum_cents, count) prefix sums — so
    the whole fit is joins over a #types x 24^3 grain, never a
    sequential pool-adjacent scan over rows. One event-type
    hash-bucket shuffle; per-type work is a 24x24 numpy minimax."""
    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "ts", "value"]
    )

    def project(b: pa.Table) -> pa.Table:
        b = _not_null(b, ("event_type", "ts", "value"))
        us = b["ts"].cast(pa.timestamp("us")).cast(pa.int64()).to_numpy()
        hod = (us // _HOUR_US) % 24
        v = b["value"].to_numpy(zero_copy_only=False)
        cents = np.where(
            v >= 0, np.floor(v * 100 + 0.5), np.ceil(v * 100 - 0.5)
        ).astype(np.int64)
        t = pa.table(
            {
                "event_type": b["event_type"],
                "hod": pa.array(hod.astype(np.int64)),
                "s": pa.array(cents),
            }
        )
        g = t.group_by(["event_type", "hod"]).aggregate(
            [("s", "sum"), ([], "count_all")]
        )
        g = g.rename_columns(["event_type", "hod", "s", "cnt"])
        return add_bucket(g, "event_type", 64)

    def combine(b: pa.Table) -> pa.Table:
        g = b.group_by([_BUCKET, "event_type", "hod"]).aggregate(
            [("s", "sum"), ("cnt", "sum")]
        )
        return g.rename_columns(
            [_BUCKET, "event_type", "hod", "s", "cnt"]
        )

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "event_type": pd.Series([], dtype=object),
                "hod": pd.Series([], dtype=np.int64),
                "cnt": pd.Series([], dtype=np.int64),
                "sum_cents": pd.Series([], dtype=np.int64),
                "iso_x1e6": pd.Series([], dtype=np.int64),
            }
        )
        if len(g) == 0:
            return empty
        # merge cross-batch partials to the exact (type, hod) grain
        g = g.groupby(["event_type", "hod"], as_index=False)[
            ["s", "cnt"]
        ].sum()
        out_frames = []
        for t, gg in g.groupby("event_type", sort=False):
            gg = gg.sort_values("hod", ignore_index=True)
            s = gg["s"].to_numpy(dtype=np.int64)
            w = gg["cnt"].to_numpy(dtype=np.int64)
            m = len(gg)
            cs = np.concatenate(([0], np.cumsum(s)))
            cw = np.concatenate(([0], np.cumsum(w)))
            # Av[j, k] (0-indexed, j<=k) as ONE double division of ints
            num = (cs[None, 1:] - cs[:-1, None]).astype(np.float64)
            den = (cw[None, 1:] - cw[:-1, None]).astype(np.float64)
            with np.errstate(divide="ignore", invalid="ignore"):
                av = num / den
            av[np.tril_indices(m, -1)] = np.inf  # j > k: unused
            # M[j, i] = min_{k >= i} av[j, k]: reverse cummin along k
            mn = np.minimum.accumulate(av[:, ::-1], axis=1)[:, ::-1]
            mn[np.tril_indices(m, -1)] = -np.inf  # j > i: unused
            # fit[i] = max_{j <= i} M[j, i]: cummax down j
            fit = np.maximum.accumulate(mn, axis=0)[np.arange(m),
                                                    np.arange(m)]
            out_frames.append(
                pd.DataFrame(
                    {
                        "event_type": [t] * m,
                        "hod": gg["hod"].to_numpy(dtype=np.int64),
                        "cnt": w,
                        "sum_cents": s,
                        "iso_x1e6": np.array(
                            [_round_half_away(f * 1e6) for f in fit],
                            dtype=np.int64,
                        ),
                    }
                )
            )
        if not out_frames:
            return empty
        return pd.concat(out_frames, ignore_index=True)

    return (
        ev.map_batches(project, batch_format="pyarrow", batch_size=None)
        .map_batches(combine, batch_format="pyarrow", batch_size=None)
        .groupby(_BUCKET)
        .map_groups(per_bucket, batch_format="pandas")
    )


ISOTONIC_SQL = """
WITH hh AS MATERIALIZED (
  SELECT event_type,
         CAST((FLOOR(EPOCH_US(ts) / 3600000000) % 24) AS BIGINT) AS hod,
         CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT) AS s,
         CAST(COUNT(*) AS BIGINT) AS cnt
  FROM events
  WHERE event_type IS NOT NULL AND ts IS NOT NULL AND value IS NOT NULL
  GROUP BY 1, 2
), cum AS MATERIALIZED (
  SELECT event_type, hod, s, cnt,
         CAST(ROW_NUMBER() OVER w AS BIGINT) AS rn,
         CAST(SUM(s) OVER w AS BIGINT) AS cs,
         CAST(SUM(cnt) OVER w AS BIGINT) AS cw
  FROM hh WINDOW w AS (PARTITION BY event_type ORDER BY hod)
), av AS MATERIALIZED (
  SELECT lo.event_type, lo.rn AS j, hi.rn AS k,
         CAST(hi.cs - (lo.cs - lo.s) AS DOUBLE)
           / CAST(hi.cw - (lo.cw - lo.cnt) AS DOUBLE) AS av
  FROM cum lo
  JOIN cum hi ON hi.event_type = lo.event_type AND hi.rn >= lo.rn
), mn AS MATERIALIZED (
  SELECT av.event_type, av.j, i.rn AS i, MIN(av.av) AS mnv
  FROM av
  JOIN cum i ON i.event_type = av.event_type
            AND av.j <= i.rn AND av.k >= i.rn
  GROUP BY 1, 2, 3
), fit AS (
  SELECT event_type, i, MAX(mnv) AS iso FROM mn GROUP BY 1, 2
)
SELECT c.event_type, c.hod, c.cnt, c.s AS sum_cents,
       CAST(ROUND(f.iso * 1000000, 0) AS BIGINT) AS iso_x1e6
FROM cum c
JOIN fit f ON f.event_type = c.event_type AND f.i = c.rn
ORDER BY 1, 2
"""


# ---------------------------------------------------------------------------
# Rousseeuw-Croux Qn robust scale of the dense hourly count series
# ---------------------------------------------------------------------------

_QN_D = 2.2219  # consistency constant for the normal (literal both sides)


def q_qn_scale_hourly(sf_dir):
    """Per event type: the Rousseeuw-Croux Qn robust scale estimator
    of the dense 0-filled hourly count series — the k-th smallest of
    all C(n,2) pairwise |c_i - c_j| with k = h(h-1)/2, h = n//2 + 1.
    Unlike MAD (already in the registry) Qn needs no location estimate
    and keeps 50% breakdown with much better Gaussian efficiency. The
    order statistic is a pure integer (count differences), so only the
    d_n * Qn scaling is snapped. Grain: one hourly groupby, then a
    bounded per-type pairwise pass (~t_len^2/2 int ops)."""
    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "ts"]
    )

    def project(b: pa.Table) -> pa.Table:
        b = _not_null(b, ("event_type", "ts"))
        us = b["ts"].cast(pa.timestamp("us")).cast(pa.int64()).to_numpy()
        t = pa.table(
            {
                "event_type": b["event_type"],
                "h": pa.array((us // _HOUR_US).astype(np.int64)),
            }
        )
        g = t.group_by(["event_type", "h"]).aggregate([([], "count_all")])
        return g.rename_columns(["event_type", "h", "c"])

    hourly = tree_merge(
        ev.map_batches(project, batch_format="pyarrow", batch_size=None),
        lambda b: b.group_by(["event_type", "h"])
        .aggregate([("c", "sum")])
        .rename_columns(["event_type", "h", "c"]),
    ).to_pandas()

    cols = ["event_type", "t_len", "k_rank", "qn_raw", "qn_x1e6"]
    if not len(hourly) or "event_type" not in hourly.columns:
        return pa.table(
            {
                "event_type": pa.array([], pa.string()),
                **{c: pa.array([], pa.int64()) for c in cols[1:]},
            }
        )
    types = sorted(hourly["event_type"].unique())
    hmin = int(hourly["h"].min())
    n = int(hourly["h"].max()) - hmin + 1
    tix = {t: i for i, t in enumerate(types)}
    mat = np.zeros((len(types), n), dtype=np.int64)
    mat[
        hourly["event_type"].map(tix).to_numpy(),
        hourly["h"].to_numpy(dtype=np.int64) - hmin,
    ] = hourly["c"].to_numpy(dtype=np.int64)
    out = {c: [] for c in cols}
    if n >= 2:
        h_half = n // 2 + 1
        k = h_half * (h_half - 1) // 2
        iu = np.triu_indices(n, 1)
        for t in types:
            c = mat[tix[t]]
            d = np.abs(c[None, :] - c[:, None])[iu]
            qn_raw = int(np.partition(d, k - 1)[k - 1])
            out["event_type"].append(t)
            out["t_len"].append(n)
            out["k_rank"].append(k)
            out["qn_raw"].append(qn_raw)
            out["qn_x1e6"].append(
                _round_half_away(_QN_D * float(qn_raw) * 1e6)
            )
    return pa.table(
        {
            "event_type": pa.array(out["event_type"], pa.string()),
            **{c: pa.array(out[c], pa.int64()) for c in cols[1:]},
        }
    )


QN_SQL = f"""
WITH hh AS MATERIALIZED (
  SELECT event_type,
         CAST(FLOOR(EPOCH_US(ts) / 3600000000) AS BIGINT) AS h,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM events
  WHERE event_type IS NOT NULL AND ts IS NOT NULL
  GROUP BY 1, 2
), bounds AS MATERIALIZED (
  SELECT MIN(h) AS mn, MAX(h) AS mx FROM hh
), grid AS MATERIALIZED (
  SELECT unnest(generate_series(mn, mx)) AS h FROM bounds
), types AS MATERIALIZED (
  SELECT DISTINCT event_type FROM hh
), dense AS MATERIALIZED (
  SELECT t.event_type, g.h, COALESCE(hh.c, 0) AS c
  FROM types t CROSS JOIN grid g
  LEFT JOIN hh ON hh.event_type = t.event_type AND hh.h = g.h
), meta AS MATERIALIZED (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
         (COUNT(*) // 2 + 1) * (COUNT(*) // 2) // 2 AS k
  FROM dense GROUP BY 1
), diffs AS MATERIALIZED (
  SELECT a.event_type, ABS(a.c - b.c) AS d
  FROM dense a
  JOIN dense b ON a.event_type = b.event_type AND a.h < b.h
), ranked AS (
  SELECT event_type, d,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY d) AS rn
  FROM diffs
)
SELECT r.event_type, m.n AS t_len, m.k AS k_rank,
       CAST(r.d AS BIGINT) AS qn_raw,
       CAST(ROUND({_QN_D} * CAST(r.d AS DOUBLE) * 1000000, 0) AS BIGINT)
         AS qn_x1e6
FROM ranked r
JOIN meta m ON m.event_type = r.event_type AND r.rn = m.k
WHERE m.n >= 2
ORDER BY 1
"""


# ---------------------------------------------------------------------------
# ACE (abundance-based coverage estimator) vocabulary richness per source
# ---------------------------------------------------------------------------


def q_ace_vocab_estimator(sf_dir):
    """Per source: the ACE vocabulary-richness estimator (Chao & Lee)
    — the coverage-adjusted companion to the registry's Chao1.
    From exact (source, word) counts: rare words are freq <= 10,
    F_i = #words at frequency i, coverage C = 1 - F1/N_rare,
    gamma^2 = max(S_rare/C * sum(i(i-1)F_i) / (N_rare(N_rare-1)) - 1, 0),
    ACE = S_abund + S_rare/C + F1/C * gamma^2. All frequency counts
    are exact int64 via combiner-first word partials (the TF-IDF
    shape); only the closing composition is a mirrored double snapped
    x1e6 (NULL when every rare word is a singleton, C = 0)."""
    docs = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["source", "text"]
    )

    def partial(b: pa.Table) -> pa.Table:
        b = _not_null(b, ("source", "text"))
        words = pc.split_pattern(pc.utf8_lower(b["text"]), " ")
        n_per = pc.list_value_length(words).to_numpy(zero_copy_only=False)
        src = np.repeat(b["source"].to_numpy(zero_copy_only=False), n_per)
        flat = pc.list_flatten(words)
        keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        t = pa.table(
            {
                "source": pa.array(src[keep]),
                "word": flat.filter(pa.array(keep)),
            }
        )
        g = t.group_by(["source", "word"]).aggregate([([], "count_all")])
        return g.rename_columns(["source", "word", "cnt"])

    counts = tree_merge(
        docs.map_batches(partial, batch_format="pyarrow", batch_size=None),
        lambda b: b.group_by(["source", "word"])
        .aggregate([("cnt", "sum")])
        .rename_columns(["source", "word", "cnt"]),
        final_shards=4,
        shard_cols=["source"],
    )

    def freq_of_freq(b: pa.Table) -> pa.Table:
        g = b.group_by(["source", "cnt"]).aggregate([([], "count_all")])
        return g.rename_columns(["source", "cnt", "f"])

    fof = tree_merge(
        counts.map_batches(
            freq_of_freq, batch_format="pyarrow", batch_size=None
        ),
        lambda b: b.group_by(["source", "cnt"])
        .aggregate([("f", "sum")])
        .rename_columns(["source", "cnt", "f"]),
        final_shards=2,
        shard_cols=["source"],
    )

    def per_source(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "source": pd.Series([], dtype=object),
                "s_abund": pd.Series([], dtype=np.int64),
                "s_rare": pd.Series([], dtype=np.int64),
                "f1": pd.Series([], dtype=np.int64),
                "n_rare": pd.Series([], dtype=np.int64),
                "ace_x1e6": pd.Series([], dtype="Int64"),
            }
        )
        if len(g) == 0:
            return empty
        rows = {"source": [], "s_abund": [], "s_rare": [], "f1": [],
                "n_rare": [], "ace_x1e6": []}
        for src, gg in g.groupby("source", sort=False):
            cnt = gg["cnt"].to_numpy(dtype=np.int64)
            f = gg["f"].to_numpy(dtype=np.int64)
            rare = cnt <= 10
            sa = int(f[~rare].sum())
            sr = int(f[rare].sum())
            f1 = int(f[rare & (cnt == 1)].sum())
            nr = int((cnt[rare] * f[rare]).sum())
            sumi1 = int((cnt[rare] * (cnt[rare] - 1) * f[rare]).sum())
            ace = None
            if nr > 1 and f1 < nr:
                c_ace = 1.0 - float(f1) / float(nr)
                gsq = (float(sr) / c_ace) * float(sumi1) / (
                    float(nr) * (float(nr) - 1.0)
                ) - 1.0
                if gsq < 0.0:
                    gsq = 0.0
                ace = (
                    float(sa)
                    + float(sr) / c_ace
                    + (float(f1) / c_ace) * gsq
                )
            rows["source"].append(src)
            rows["s_abund"].append(sa)
            rows["s_rare"].append(sr)
            rows["f1"].append(f1)
            rows["n_rare"].append(nr)
            rows["ace_x1e6"].append(
                None if ace is None else _round_half_away(ace * 1e6)
            )
        out = pd.DataFrame(rows)
        for c in ("s_abund", "s_rare", "f1", "n_rare"):
            out[c] = out[c].astype(np.int64)
        out["ace_x1e6"] = out["ace_x1e6"].astype("Int64")
        return out

    return fof.groupby("source").map_groups(
        per_source, batch_format="pandas"
    )


ACE_SQL = """
WITH w AS MATERIALIZED (
  SELECT source, unnest(string_split(lower(text), ' ')) AS word
  FROM documents
  WHERE source IS NOT NULL AND text IS NOT NULL
), c AS MATERIALIZED (
  SELECT source, word, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM w WHERE word <> ''
  GROUP BY 1, 2
), agg AS MATERIALIZED (
  SELECT source,
         CAST(SUM(CASE WHEN cnt > 10 THEN 1 ELSE 0 END) AS BIGINT)
           AS s_abund,
         CAST(SUM(CASE WHEN cnt <= 10 THEN 1 ELSE 0 END) AS BIGINT)
           AS s_rare,
         CAST(SUM(CASE WHEN cnt = 1 THEN 1 ELSE 0 END) AS BIGINT) AS f1,
         CAST(SUM(CASE WHEN cnt <= 10 THEN cnt ELSE 0 END) AS BIGINT)
           AS n_rare,
         CAST(SUM(CASE WHEN cnt <= 10 THEN cnt * (cnt - 1) ELSE 0 END)
              AS BIGINT) AS sumi1
  FROM c GROUP BY 1
)
SELECT source, s_abund, s_rare, f1, n_rare,
       CASE WHEN n_rare > 1 AND f1 < n_rare THEN
         CAST(ROUND((
           CAST(s_abund AS DOUBLE)
           + CAST(s_rare AS DOUBLE)
             / (1.0 - CAST(f1 AS DOUBLE) / CAST(n_rare AS DOUBLE))
           + (CAST(f1 AS DOUBLE)
              / (1.0 - CAST(f1 AS DOUBLE) / CAST(n_rare AS DOUBLE)))
             * GREATEST(
                 (CAST(s_rare AS DOUBLE)
                  / (1.0 - CAST(f1 AS DOUBLE) / CAST(n_rare AS DOUBLE)))
                 * CAST(sumi1 AS DOUBLE)
                 / (CAST(n_rare AS DOUBLE)
                    * (CAST(n_rare AS DOUBLE) - 1.0))
                 - 1.0, 0.0)
         ) * 1000000, 0) AS BIGINT)
       ELSE NULL END AS ace_x1e6
FROM agg ORDER BY 1
"""


def register_r4eg(queries: dict, oracles: dict) -> None:
    queries.update(
        {
            "isotonic_hod_fit": q_isotonic_hod_fit,
            "qn_scale_hourly": q_qn_scale_hourly,
            "ace_vocab_estimator": q_ace_vocab_estimator,
        }
    )
    oracles.update(
        {
            "isotonic_hod_fit": ISOTONIC_SQL,
            "qn_scale_hourly": QN_SQL,
            "ace_vocab_estimator": ACE_SQL,
        }
    )
