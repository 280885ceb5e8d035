"""Round-4 batch EK: exact Shapley-value marketing attribution over
session touchpoint sets, Mood's median test across event types, and
tie-corrected Kendall's W concordance of day-of-week hour rankings.

Exactness discipline: Shapley runs on the SUBSET LATTICE of the (at
most 2^8) channel masks with factorial weights kept as integers
(phi * n! is an exact int64 fold over u_T counts); Mood's test uses
the engine's PERCENTILE_DISC rank rule over the bounded value
histogram so the pooled median is exact, with per-cell chi-square
terms snapped x1e6; Kendall's W is rearranged so numerator and
denominator are both exact integers (doubled average ranks make ties
integral, and sum-of-ranks invariance removes the mean term)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from mimirsbrunn_ray.stages.dedup import _BUCKET, add_bucket
from mimirsbrunn_ray.stages.rollup import tree_merge

_DAY_US = 86_400_000_000
_HOUR_US = 3_600_000_000
_SESSION_GAP_US = 1_800_000_000


def _round_half_away(x: float) -> int:
    return int(np.floor(x + 0.5) if x >= 0 else np.ceil(x - 0.5))


def _not_null(b: pa.Table, cols) -> pa.Table:
    m = None
    for c in cols:
        v = pc.is_valid(b[c])
        m = v if m is None else pc.and_(m, v)
    return b.filter(m)


# ---------------------------------------------------------------------------
# Exact Shapley-value channel attribution
# ---------------------------------------------------------------------------


def q_shapley_attribution(sf_dir):
    """Exact Shapley-value attribution of purchase conversions to
    touchpoint channels (the non-purchase event types): the coalition
    game v(S) = number of converting 30-min-gap sessions whose
    touchpoint set is contained in S, with phi_c the classic
    factorial-weighted marginal average. Sessions and their channel
    bitmasks + conversion flags compute distributed (one user-id
    hash-bucket shuffle); the u_T mask histogram (<= 2^#channels
    rows) folds on the driver, where phi_c * n! stays an EXACT int64
    — only the closing division by n! is snapped. Channel bit order
    is alphabetical on both sides."""
    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "ts", "event_id", "event_type"],
    )

    def project(b: pa.Table) -> pa.Table:
        b = _not_null(b, ("user_id", "ts", "event_type"))
        t = pa.table(
            {
                "user_id": b["user_id"],
                "us": b["ts"].cast(pa.timestamp("us")).cast(pa.int64()),
                "event_id": b["event_id"],
                "event_type": b["event_type"],
            }
        )
        return add_bucket(t, "user_id", 64)

    # channel alphabet (tiny, deterministic): distinct non-purchase types
    chan_tbl = tree_merge(
        ev.map_batches(
            lambda b: _not_null(b, ("event_type",))
            .group_by(["event_type"])
            .aggregate([([], "count_all")])
            .rename_columns(["event_type", "c"]),
            batch_format="pyarrow",
            batch_size=None,
        ),
        lambda b: b.group_by(["event_type"])
        .aggregate([("c", "sum")])
        .rename_columns(["event_type", "c"]),
    ).to_pandas()
    from mimirsbrunn_ray.stages.broadcast import ensure_cols

    chan_tbl = ensure_cols(chan_tbl, ["event_type", "c"])
    channels = sorted(
        t for t in chan_tbl["event_type"].tolist() if t != "purchase"
    )
    bit = {t: i for i, t in enumerate(channels)}
    n = len(channels)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "mask": pd.Series([], dtype=np.int64),
                "conv": pd.Series([], dtype=np.int64),
            }
        )
        if len(g) == 0:
            return empty
        g = g.sort_values(
            ["user_id", "us", "event_id"], kind="mergesort",
            ignore_index=True,
        )
        uid = g["user_id"].to_numpy(dtype=np.int64)
        us = g["us"].to_numpy(dtype=np.int64)
        new_user = np.concatenate(([True], uid[1:] != uid[:-1]))
        gap = np.concatenate(([0], us[1:] - us[:-1]))
        sid = np.cumsum(new_user | (gap > _SESSION_GAP_US))
        et = g["event_type"].to_numpy()
        bits = np.array(
            [1 << bit[t] if t in bit else 0 for t in et], dtype=np.int64
        )
        conv = (et == "purchase").astype(np.int64)
        df = pd.DataFrame({"sid": sid, "bits": bits, "conv": conv})
        agg = df.groupby("sid").agg(
            mask=("bits", lambda x: int(np.bitwise_or.reduce(
                x.to_numpy(dtype=np.int64)))),
            conv=("conv", "max"),
        )
        u = agg[agg["conv"] == 1].groupby("mask").size()
        return pd.DataFrame(
            {
                "mask": u.index.to_numpy(dtype=np.int64),
                "conv": u.to_numpy(dtype=np.int64),
            }
        )

    parts = (
        ev.map_batches(project, batch_format="pyarrow", batch_size=None)
        .groupby(_BUCKET)
        .map_groups(per_bucket, batch_format="pandas")
        .to_pandas()
    )
    cols = ["channel", "phi_num", "fact_n", "shapley_x1e6"]
    if n == 0:
        return pa.table(
            {
                "channel": pa.array([], pa.string()),
                **{c: pa.array([], pa.int64()) for c in cols[1:]},
            }
        )
    u_t = np.zeros(1 << n, dtype=np.int64)
    if len(parts):
        merged = parts.groupby("mask")["conv"].sum()
        for m, c in merged.items():
            u_t[int(m)] += int(c)
    # v(S) over the subset lattice
    v = np.zeros(1 << n, dtype=np.int64)
    for s in range(1 << n):
        tot = 0
        for t in range(1 << n):
            if (t & s) == t:
                tot += int(u_t[t])
        v[s] = tot
    fact = [1] * (n + 1)
    for k in range(2, n + 1):
        fact[k] = fact[k - 1] * k
    out = {c: [] for c in cols}
    for c_name in channels:
        b = bit[c_name]
        num = 0
        for s in range(1 << n):
            if (s >> b) & 1:
                continue
            p = bin(s).count("1")
            num += fact[p] * fact[n - 1 - p] * (
                int(v[s | (1 << b)]) - int(v[s])
            )
        out["channel"].append(c_name)
        out["phi_num"].append(num)
        out["fact_n"].append(fact[n])
        out["shapley_x1e6"].append(
            _round_half_away(float(num) / float(fact[n]) * 1e6)
        )
    return pa.table(
        {
            "channel": pa.array(out["channel"], pa.string()),
            **{c: pa.array(out[c], pa.int64()) for c in cols[1:]},
        }
    )


SHAPLEY_SQL = f"""
WITH e AS MATERIALIZED (
  SELECT user_id, EPOCH_US(ts) AS us, event_id, event_type
  FROM events
  WHERE user_id IS NOT NULL AND ts IS NOT NULL
    AND event_type IS NOT NULL
), chan AS MATERIALIZED (
  SELECT event_type,
         ROW_NUMBER() OVER (ORDER BY event_type) - 1 AS bit
  FROM (SELECT DISTINCT event_type FROM events
        WHERE event_type IS NOT NULL AND event_type <> 'purchase')
), nch AS MATERIALIZED (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM chan),
lagd AS MATERIALIZED (
  SELECT user_id, us, event_type,
         CASE WHEN us - LAG(us) OVER w > {_SESSION_GAP_US}
              OR LAG(us) OVER w IS NULL THEN 1 ELSE 0 END AS brk
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
), sess AS MATERIALIZED (
  SELECT user_id, event_type,
         SUM(brk) OVER (PARTITION BY user_id ORDER BY us
                        ROWS UNBOUNDED PRECEDING) AS sid
  FROM lagd
), smask AS MATERIALIZED (
  SELECT s.user_id, s.sid,
         COALESCE(SUM(DISTINCT 1 << c.bit), 0) AS mask,
         MAX(CASE WHEN s.event_type = 'purchase' THEN 1 ELSE 0 END)
           AS conv
  FROM sess s LEFT JOIN chan c ON c.event_type = s.event_type
  GROUP BY 1, 2
), u AS MATERIALIZED (
  SELECT mask, CAST(COUNT(*) AS BIGINT) AS c
  FROM smask WHERE conv = 1 GROUP BY 1
), subs AS MATERIALIZED (
  SELECT unnest(generate_series(0, (1 << n) - 1)) AS s FROM nch
), v AS MATERIALIZED (
  SELECT s.s, CAST(COALESCE(SUM(u.c), 0) AS BIGINT) AS v
  FROM subs s LEFT JOIN u ON (u.mask & s.s) = u.mask
  GROUP BY 1
), pop AS MATERIALIZED (
  SELECT s,
         ((s >> 0) & 1) + ((s >> 1) & 1) + ((s >> 2) & 1)
         + ((s >> 3) & 1) + ((s >> 4) & 1) + ((s >> 5) & 1)
         + ((s >> 6) & 1) + ((s >> 7) & 1) AS p
  FROM subs
), fact(k, f) AS (
  VALUES (0, 1), (1, 1), (2, 2), (3, 6), (4, 24), (5, 120),
         (6, 720), (7, 5040), (8, 40320)
), phi AS (
  SELECT ch.event_type AS channel,
         CAST(SUM(f1.f * f2.f * (v2.v - v1.v)) AS BIGINT) AS phi_num,
         MAX(fn.f) AS fact_n
  FROM chan ch
  CROSS JOIN nch
  JOIN subs s ON ((s.s >> ch.bit) & 1) = 0
  JOIN pop p ON p.s = s.s
  JOIN v v1 ON v1.s = s.s
  JOIN v v2 ON v2.s = (s.s | (1 << ch.bit))
  JOIN fact f1 ON f1.k = p.p
  JOIN fact f2 ON f2.k = nch.n - 1 - p.p
  JOIN fact fn ON fn.k = nch.n
  GROUP BY 1
)
SELECT channel, phi_num, CAST(fact_n AS BIGINT) AS fact_n,
       CAST(ROUND(CAST(phi_num AS DOUBLE) / CAST(fact_n AS DOUBLE)
            * 1000000.0, 0) AS BIGINT) AS shapley_x1e6
FROM phi ORDER BY 1
"""


# ---------------------------------------------------------------------------
# Mood's median test across event types
# ---------------------------------------------------------------------------


def q_mood_median_types(sf_dir):
    """Mood's median test: are event-type value distributions split
    evenly around the POOLED median? Pooled median = PERCENTILE_DISC
    (0.5) by the exact rank rule over the bounded (value x100)
    histogram; per type, counts above / at-or-below it are exact, and
    the two chi-square cell terms ((O-E)^2/E with E from the marginal
    product) are snapped x1e6 per cell. Combiner-first histogram
    partials; the type x 2 contingency table is dimension-scale."""
    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "value"]
    )

    def partial(b: pa.Table) -> pa.Table:
        b = _not_null(b, ("event_type", "value"))
        v = b["value"].to_numpy(zero_copy_only=False)
        cents = np.where(
            v >= 0, np.floor(v * 100 + 0.5), np.ceil(v * 100 - 0.5)
        ).astype(np.int64)
        t = pa.table({"event_type": b["event_type"],
                      "x": pa.array(cents)})
        g = t.group_by(["event_type", "x"]).aggregate([([], "count_all")])
        return g.rename_columns(["event_type", "x", "c"])

    hist = tree_merge(
        ev.map_batches(partial, batch_format="pyarrow", batch_size=None),
        lambda b: b.group_by(["event_type", "x"])
        .aggregate([("c", "sum")])
        .rename_columns(["event_type", "x", "c"]),
    ).to_pandas()
    cols = ["event_type", "n_above", "n_le", "chi2_contrib_x1e6"]
    if not len(hist) or "event_type" not in hist.columns:
        return pa.table(
            {
                "event_type": pa.array([], pa.string()),
                **{c: pa.array([], pa.int64()) for c in cols[1:]},
            }
        )
    # pooled PERCENTILE_DISC(0.5): smallest x with cum count >= ceil(N/2)
    pooled = hist.groupby("x")["c"].sum().sort_index()
    n_tot = int(pooled.sum())
    target = (n_tot + 1) // 2
    cum = pooled.cumsum()
    med = int(cum.index[np.searchsorted(cum.to_numpy(), target)])
    above = (
        hist[hist["x"] > med].groupby("event_type")["c"].sum()
    )
    le = hist[hist["x"] <= med].groupby("event_type")["c"].sum()
    types = sorted(hist["event_type"].unique())
    a_tot = int(above.sum()) if len(above) else 0
    out = {c: [] for c in cols}
    for t in types:
        a = int(above.get(t, 0))
        b2 = int(le.get(t, 0))
        nt = a + b2
        e_a = float(nt) * float(a_tot) / float(n_tot)
        e_b = float(nt) * (float(n_tot) - float(a_tot)) / float(n_tot)
        contrib = None
        if e_a > 0.0 and e_b > 0.0:
            da = float(a) - e_a
            db = float(b2) - e_b
            contrib = (
                _round_half_away(da * da / e_a * 1e6)
                + _round_half_away(db * db / e_b * 1e6)
            )
        out["event_type"].append(t)
        out["n_above"].append(a)
        out["n_le"].append(b2)
        out["chi2_contrib_x1e6"].append(contrib)
    return pa.table(
        {
            "event_type": pa.array(out["event_type"], pa.string()),
            **{c: pa.array(out[c], pa.int64()) for c in cols[1:]},
        }
    )


MOOD_SQL = """
WITH v AS MATERIALIZED (
  SELECT event_type, CAST(ROUND(value * 100, 0) AS BIGINT) AS x
  FROM events WHERE event_type IS NOT NULL AND value IS NOT NULL
), h AS MATERIALIZED (
  SELECT x, CAST(COUNT(*) AS BIGINT) AS c FROM v GROUP BY 1
), tot AS MATERIALIZED (SELECT CAST(SUM(c) AS BIGINT) AS n FROM h),
med AS MATERIALIZED (
  SELECT MIN(x) AS med FROM (
    SELECT x, SUM(c) OVER (ORDER BY x) AS cum FROM h
  ), tot WHERE cum >= (tot.n + 1) // 2
), cells AS MATERIALIZED (
  SELECT event_type,
         CAST(SUM(CASE WHEN x > med.med THEN 1 ELSE 0 END) AS BIGINT)
           AS n_above,
         CAST(SUM(CASE WHEN x <= med.med THEN 1 ELSE 0 END) AS BIGINT)
           AS n_le
  FROM v, med GROUP BY 1
), marg AS MATERIALIZED (
  SELECT CAST(SUM(n_above) AS BIGINT) AS a_tot,
         CAST(SUM(n_above + n_le) AS BIGINT) AS n FROM cells
)
SELECT c.event_type, c.n_above, c.n_le,
       CASE WHEN CAST(c.n_above + c.n_le AS DOUBLE)
                 * CAST(m.a_tot AS DOUBLE) / CAST(m.n AS DOUBLE) > 0.0
             AND CAST(c.n_above + c.n_le AS DOUBLE)
                 * (CAST(m.n AS DOUBLE) - CAST(m.a_tot AS DOUBLE))
                 / CAST(m.n AS DOUBLE) > 0.0 THEN
         CAST(ROUND((CAST(c.n_above AS DOUBLE)
               - CAST(c.n_above + c.n_le AS DOUBLE)
                 * CAST(m.a_tot AS DOUBLE) / CAST(m.n AS DOUBLE))
              * (CAST(c.n_above AS DOUBLE)
               - CAST(c.n_above + c.n_le AS DOUBLE)
                 * CAST(m.a_tot AS DOUBLE) / CAST(m.n AS DOUBLE))
              / (CAST(c.n_above + c.n_le AS DOUBLE)
                 * CAST(m.a_tot AS DOUBLE) / CAST(m.n AS DOUBLE))
              * 1000000.0, 0) AS BIGINT)
         + CAST(ROUND((CAST(c.n_le AS DOUBLE)
               - CAST(c.n_above + c.n_le AS DOUBLE)
                 * (CAST(m.n AS DOUBLE) - CAST(m.a_tot AS DOUBLE))
                 / CAST(m.n AS DOUBLE))
              * (CAST(c.n_le AS DOUBLE)
               - CAST(c.n_above + c.n_le AS DOUBLE)
                 * (CAST(m.n AS DOUBLE) - CAST(m.a_tot AS DOUBLE))
                 / CAST(m.n AS DOUBLE))
              / (CAST(c.n_above + c.n_le AS DOUBLE)
                 * (CAST(m.n AS DOUBLE) - CAST(m.a_tot AS DOUBLE))
                 / CAST(m.n AS DOUBLE))
              * 1000000.0, 0) AS BIGINT)
       END AS chi2_contrib_x1e6
FROM cells c, marg m ORDER BY 1
"""


# ---------------------------------------------------------------------------
# Kendall's W: concordance of day-of-week judges ranking hours-of-day
# ---------------------------------------------------------------------------


def q_kendalls_w_dow(sf_dir):
    """Per event type: Kendall's coefficient of concordance W, with
    the 7 days-of-week as judges each ranking the 24 hours-of-day by
    event count — W near 1 means every weekday agrees on the diurnal
    shape. Tie-corrected, and EXACT: doubled average ranks
    (2*rank = 2*#less + #ties + 1) are integers, the rank-sum
    invariant removes the mean term (D2_i = R2_i - m*(n+1)), and
    W = 3*sum(D2^2) / (m^2*(n^3-n) - m*sum(t^3-t)) is one double
    division of two int64s. Counting is combiner-first; the
    type x 7 x 24 grain is bounded."""
    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "ts"]
    )

    def partial(b: pa.Table) -> pa.Table:
        b = _not_null(b, ("event_type", "ts"))
        us = b["ts"].cast(pa.timestamp("us")).cast(pa.int64()).to_numpy()
        dow = ((us // _DAY_US + 4) % 7).astype(np.int64)
        hod = ((us // _HOUR_US) % 24).astype(np.int64)
        t = pa.table(
            {
                "event_type": b["event_type"],
                "dow": pa.array(dow),
                "hod": pa.array(hod),
            }
        )
        g = t.group_by(["event_type", "dow", "hod"]).aggregate(
            [([], "count_all")]
        )
        return g.rename_columns(["event_type", "dow", "hod", "c"])

    counts = tree_merge(
        ev.map_batches(partial, batch_format="pyarrow", batch_size=None),
        lambda b: b.group_by(["event_type", "dow", "hod"])
        .aggregate([("c", "sum")])
        .rename_columns(["event_type", "dow", "hod", "c"]),
    ).to_pandas()
    cols = ["event_type", "m_judges", "n_objects", "sum_d2_sq",
            "tie_term", "w_x1e6"]
    out = {c: [] for c in cols}
    if len(counts) and "event_type" in counts.columns:
        for t in sorted(counts["event_type"].unique()):
            sub = counts[counts["event_type"] == t]
            m, n = 7, 24
            grid = np.zeros((m, n), dtype=np.int64)
            grid[
                sub["dow"].to_numpy(dtype=np.int64),
                sub["hod"].to_numpy(dtype=np.int64),
            ] = sub["c"].to_numpy(dtype=np.int64)
            r2 = np.zeros(n, dtype=np.int64)
            tie_term = 0
            for d in range(m):
                row = grid[d]
                less = np.array(
                    [int(np.sum(row < x)) for x in row], dtype=np.int64
                )
                eq = np.array(
                    [int(np.sum(row == x)) for x in row], dtype=np.int64
                )
                r2 += 2 * less + eq + 1
                _, tc = np.unique(row, return_counts=True)
                tie_term += int(np.sum(tc**3 - tc))
            d2 = r2 - m * (n + 1)
            sum_d2 = int(np.sum(d2.astype(np.int64) ** 2))
            den = m * m * (n**3 - n) - m * tie_term
            w = None
            if den > 0:
                w = _round_half_away(
                    3.0 * float(sum_d2) / float(den) * 1e6
                )
            out["event_type"].append(t)
            out["m_judges"].append(m)
            out["n_objects"].append(n)
            out["sum_d2_sq"].append(sum_d2)
            out["tie_term"].append(tie_term)
            out["w_x1e6"].append(w)
    return pa.table(
        {
            "event_type": pa.array(out["event_type"], pa.string()),
            **{c: pa.array(out[c], pa.int64()) for c in cols[1:]},
        }
    )


KENDALL_W_SQL = """
WITH base AS MATERIALIZED (
  SELECT event_type,
         CAST((FLOOR(EPOCH_US(ts) / 86400000000) + 4) % 7 AS BIGINT)
           AS dow,
         CAST((FLOOR(EPOCH_US(ts) / 3600000000) % 24) AS BIGINT) AS hod,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM events WHERE event_type IS NOT NULL AND ts IS NOT NULL
  GROUP BY 1, 2, 3
), types AS MATERIALIZED (SELECT DISTINCT event_type FROM base),
grid AS MATERIALIZED (
  SELECT t.event_type, d.dow, h.hod, COALESCE(b.c, 0) AS c
  FROM types t
  CROSS JOIN (SELECT unnest(generate_series(0, 6)) AS dow) d
  CROSS JOIN (SELECT unnest(generate_series(0, 23)) AS hod) h
  LEFT JOIN base b ON b.event_type = t.event_type
       AND b.dow = d.dow AND b.hod = h.hod
), ranked AS MATERIALIZED (
  SELECT event_type, dow, hod,
         2 * (RANK() OVER (PARTITION BY event_type, dow ORDER BY c) - 1)
         + COUNT(*) OVER (PARTITION BY event_type, dow, c) + 1 AS r2
  FROM grid
), rsum AS MATERIALIZED (
  SELECT event_type, hod, CAST(SUM(r2) AS BIGINT) AS r2s
  FROM ranked GROUP BY 1, 2
), d2 AS MATERIALIZED (
  SELECT event_type,
         CAST(SUM((r2s - 7 * 25) * (r2s - 7 * 25)) AS BIGINT) AS sum_d2
  FROM rsum GROUP BY 1
), ties AS MATERIALIZED (
  SELECT event_type,
         CAST(SUM(tc * tc * tc - tc) AS BIGINT) AS tie_term
  FROM (
    SELECT event_type, dow, c, CAST(COUNT(*) AS BIGINT) AS tc
    FROM grid GROUP BY 1, 2, 3
  ) GROUP BY 1
)
SELECT d.event_type,
       CAST(7 AS BIGINT) AS m_judges,
       CAST(24 AS BIGINT) AS n_objects,
       d.sum_d2 AS sum_d2_sq,
       t.tie_term,
       CASE WHEN 49 * (24 * 24 * 24 - 24) - 7 * t.tie_term > 0 THEN
         CAST(ROUND(3.0 * CAST(d.sum_d2 AS DOUBLE)
              / CAST(49 * (24 * 24 * 24 - 24) - 7 * t.tie_term
                     AS DOUBLE) * 1000000.0, 0) AS BIGINT)
       END AS w_x1e6
FROM d2 d JOIN ties t ON t.event_type = d.event_type
ORDER BY 1
"""


def register_r4ek(queries: dict, oracles: dict) -> None:
    queries.update(
        {
            "shapley_attribution": q_shapley_attribution,
            "mood_median_types": q_mood_median_types,
            "kendalls_w_dow": q_kendalls_w_dow,
        }
    )
    oracles.update(
        {
            "shapley_attribution": SHAPLEY_SQL,
            "mood_median_types": MOOD_SQL,
            "kendalls_w_dow": KENDALL_W_SQL,
        }
    )
