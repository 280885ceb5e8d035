"""Round-4 batch DZ: Anderson-Darling uniformity of minute-of-hour
offsets, the two-sample Cramér-von Mises weekday/weekend value test,
and the Wilcoxon signed-rank test over paired hour-of-day profiles.

Exactness discipline: AD sorts an exactly-mirrored (us%hour + 0.5)/hour
uniform variate and folds (2i-1)-weighted logs whose 1e-11 absolute
error sits far under the x1e6 snap; CvM rank displacements (r_i - i)^2
are exact int64 (<= 4e15) with a deterministic (value-cents, side, id)
pooled tiebreak, and only the closing ratio is a mirrored double; the
signed-rank W+ uses the doubled-average-rank integer trick (2*RANK +
ties - 1) so the statistic folds exactly and only z is snapped.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from mimirsbrunn_ray.stages.dedup import _BUCKET, add_bucket
from mimirsbrunn_ray.stages.rollup import tree_merge

_HOUR_US = 3_600_000_000
_DAY_US = 86_400_000_000


def _round_half_away(x: float):
    return int(np.floor(x + 0.5) if x >= 0 else np.ceil(x - 0.5))


def _not_null(b: pa.Table, cols) -> pa.Table:
    m = None
    for c in cols:
        v = pc.is_valid(b[c])
        m = v if m is None else pc.and_(m, v)
    return b.filter(m)


def _sum_by(t: pa.Table, keys: list[str], vals: list[str]) -> pa.Table:
    g = t.group_by(keys).aggregate([(v, "sum") for v in vals])
    g = g.select(keys + [f"{v}_sum" for v in vals])
    return g.rename_columns(keys + vals)


# ---------------------------------------------------------------------------
# Anderson-Darling uniformity of minute-of-hour offsets
# ---------------------------------------------------------------------------


def q_anderson_darling_minute(sf_dir):
    """Per event type: the Anderson-Darling A^2 statistic testing the
    within-hour arrival offset u = (epoch_us mod hour + 0.5)/hour
    against Uniform(0,1) — the tail-sensitive upgrade of the KS
    uniformity check (A^2 weights the extremes, where cron-style
    clustering at :00 actually lands). One series hash-bucket shuffle;
    the (2i-1)-weighted log sum is a mirrored double whose error is
    ~1e-11 against the 1e-6 snap grid."""
    ev = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_type", "ts"])

    def project(b: pa.Table) -> pa.Table:
        b = _not_null(b, ("event_type", "ts"))
        us = b["ts"].cast(pa.timestamp("us")).cast(pa.int64())
        t = pa.table({"event_type": b["event_type"], "us": us})
        return add_bucket(t, "event_type", 64)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "event_type": pd.Series([], dtype=object),
                "n": pd.Series([], dtype=np.int64),
                "a2_x1e6": pd.Series([], dtype=np.int64),
            }
        )
        if len(g) == 0:
            return empty
        k = g["event_type"].to_numpy()
        us = g["us"].to_numpy(dtype=np.int64)
        rows = {"event_type": [], "n": [], "a2_x1e6": []}
        for t in pd.unique(k):
            m = k == t
            u = np.sort((us[m] % _HOUR_US + 0.5) / float(_HOUR_US))
            n = len(u)
            if n == 0:
                continue
            i = np.arange(1, n + 1, dtype=np.float64)
            s = np.sum((2.0 * i - 1.0) * np.log(u)
                       + (2.0 * n + 1.0 - 2.0 * i) * np.log(1.0 - u))
            a2 = -n - s / n
            rows["event_type"].append(t)
            rows["n"].append(n)
            rows["a2_x1e6"].append(_round_half_away(a2 * 1e6))
        out = pd.DataFrame(rows)
        for c in ("n", "a2_x1e6"):
            out[c] = out[c].astype(np.int64)
        return out

    return (
        ev.map_batches(project, batch_format="pyarrow", batch_size=None)
        .groupby(_BUCKET)
        .map_groups(per_bucket, batch_format="pandas")
    )


AD_MINUTE_SQL = """
WITH u AS (
  SELECT event_type,
         ((EPOCH_US(ts) % 3600000000) + 0.5) / 3600000000.0 AS u
  FROM events
  WHERE event_type IS NOT NULL AND ts IS NOT NULL
), r AS (
  SELECT event_type, u,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY u) AS i,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM u
), term AS (
  SELECT event_type, n,
         (2.0 * i - 1.0) * LN(u)
           + (2.0 * n + 1.0 - 2.0 * i) * LN(1.0 - u) AS t
  FROM r
)
SELECT event_type, CAST(MAX(n) AS BIGINT) AS n,
       CAST(ROUND((-MAX(n) - SUM(t) / MAX(n)) * 1000000, 0) AS BIGINT)
         AS a2_x1e6
FROM term GROUP BY 1 ORDER BY 1
"""


# ---------------------------------------------------------------------------
# two-sample Cramér-von Mises: weekday vs weekend values
# ---------------------------------------------------------------------------


def q_cramer_von_mises_weekpart(sf_dir):
    """Per event type: the two-sample Cramér-von Mises criterion T
    between weekday and weekend value samples (cents-quantized, pooled
    order broken deterministically by (value, side, event_id)) — the
    whole-CDF distance that catches distributional shifts KS's single
    max misses. U = n*A + m*B folds from exact int64 rank
    displacements; T = U/(n*m*N) - (4nm-1)/(6N) is the one mirrored
    double, x1e6 snap."""
    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_type", "ts", "value", "event_id"],
    )

    def project(b: pa.Table) -> pa.Table:
        b = _not_null(b, ("event_type", "ts", "value"))
        us = b["ts"].cast(pa.timestamp("us")).cast(pa.int64()).to_numpy()
        dow = (us // _DAY_US + 4) % 7  # Sunday = 0
        we = ((dow == 0) | (dow == 6)).astype(np.int64)
        v = b["value"].to_numpy(zero_copy_only=False)
        cents = np.where(
            v >= 0, np.floor(v * 100 + 0.5), np.ceil(v * 100 - 0.5)
        ).astype(np.int64)
        t = pa.table(
            {
                "event_type": b["event_type"],
                "we": pa.array(we),
                "v": pa.array(cents),
                "event_id": b["event_id"],
            }
        )
        return add_bucket(t, "event_type", 64)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "event_type": pd.Series([], dtype=object),
                "n_weekday": pd.Series([], dtype=np.int64),
                "n_weekend": pd.Series([], dtype=np.int64),
                "t_x1e6": pd.Series([], dtype=np.int64),
            }
        )
        if len(g) == 0:
            return empty
        rows = {"event_type": [], "n_weekday": [], "n_weekend": [],
                "t_x1e6": []}
        for t, gg in g.groupby("event_type", sort=False):
            gg = gg.sort_values(
                ["v", "we", "event_id"], kind="mergesort", ignore_index=True
            )
            we = gg["we"].to_numpy(dtype=np.int64)
            pooled = np.arange(1, len(gg) + 1, dtype=np.int64)
            n = int(np.sum(we == 0))
            m = int(np.sum(we == 1))
            if n == 0 or m == 0:
                continue
            r = pooled[we == 0]
            s = pooled[we == 1]
            a = int(np.sum((r - np.arange(1, n + 1)) ** 2))
            bsum = int(np.sum((s - np.arange(1, m + 1)) ** 2))
            nf, mf, nn = float(n), float(m), float(n + m)
            tstat = (nf * a + mf * bsum) / ((nf * mf) * nn) \
                - (4.0 * nf * mf - 1.0) / (6.0 * nn)
            rows["event_type"].append(t)
            rows["n_weekday"].append(n)
            rows["n_weekend"].append(m)
            rows["t_x1e6"].append(_round_half_away(tstat * 1e6))
        out = pd.DataFrame(rows)
        for c in ("n_weekday", "n_weekend", "t_x1e6"):
            out[c] = out[c].astype(np.int64)
        return out

    return (
        ev.map_batches(project, batch_format="pyarrow", batch_size=None)
        .groupby(_BUCKET)
        .map_groups(per_bucket, batch_format="pandas")
    )


CVM_WEEKPART_SQL = """
WITH v AS (
  SELECT event_type,
         CASE WHEN dayofweek(ts) IN (0, 6) THEN 1 ELSE 0 END AS we,
         CAST(ROUND(value * 100, 0) AS BIGINT) AS x,
         event_id
  FROM events
  WHERE event_type IS NOT NULL AND ts IS NOT NULL AND value IS NOT NULL
), p AS (
  SELECT event_type, we,
         ROW_NUMBER() OVER (PARTITION BY event_type
                            ORDER BY x, we, event_id) AS pooled,
         ROW_NUMBER() OVER (PARTITION BY event_type, we
                            ORDER BY x, we, event_id) AS own
  FROM v
), agg AS (
  SELECT event_type,
         CAST(SUM(CASE WHEN we = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n,
         CAST(SUM(CASE WHEN we = 1 THEN 1 ELSE 0 END) AS BIGINT) AS m,
         CAST(SUM(CASE WHEN we = 0
                  THEN (pooled - own) * (pooled - own) ELSE 0 END)
              AS BIGINT) AS a,
         CAST(SUM(CASE WHEN we = 1
                  THEN (pooled - own) * (pooled - own) ELSE 0 END)
              AS BIGINT) AS b
  FROM p GROUP BY 1
)
SELECT event_type, n AS n_weekday, m AS n_weekend,
       CAST(ROUND((
         (CAST(n AS DOUBLE) * a + CAST(m AS DOUBLE) * b)
           / ((CAST(n AS DOUBLE) * CAST(m AS DOUBLE))
              * CAST(n + m AS DOUBLE))
         - (4.0 * CAST(n AS DOUBLE) * CAST(m AS DOUBLE) - 1.0)
           / (6.0 * CAST(n + m AS DOUBLE))
       ) * 1000000, 0) AS BIGINT) AS t_x1e6
FROM agg WHERE n > 0 AND m > 0 ORDER BY 1
"""


# ---------------------------------------------------------------------------
# Wilcoxon signed-rank over paired hour-of-day weekday/weekend profiles
# ---------------------------------------------------------------------------


def q_wilcoxon_signed_rank_hod(sf_dir):
    """Per event type: the Wilcoxon signed-rank test over the 24
    hour-of-day pairs (mean hourly count on weekdays, mean on
    weekends) — the paired nonparametric 'is the weekend profile
    shifted' test that respects the hour pairing a pooled rank test
    throws away. Differences are mirrored double averages; average
    ranks of |d| fold exactly via the doubled-rank integer trick
    (wplus_x2 = sum of 2*RANK + ties - 1 over positive d); z is the
    one snapped double, NULL when no nonzero pairs."""
    ev = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_type", "ts"])

    def partial(b: pa.Table) -> pa.Table:
        b = _not_null(b, ("event_type", "ts"))
        us = b["ts"].cast(pa.timestamp("us")).cast(pa.int64()).to_numpy()
        h = (us // _HOUR_US).astype(np.int64)
        t = pa.table(
            {
                "event_type": b["event_type"],
                "h": pa.array(h),
                "c": pa.array(np.ones(len(h), np.int64)),
            }
        )
        return _sum_by(t, ["event_type", "h"], ["c"])

    hourly = tree_merge(
        ev.map_batches(partial, batch_format="pyarrow", batch_size=None),
        lambda b: _sum_by(b, ["event_type", "h"], ["c"]),
    ).to_pandas()
    cols = ["event_type", "n_pairs", "wplus_x2", "z_x1e6"]
    if not len(hourly) or "event_type" not in hourly.columns:
        return pa.table(
            {
                "event_type": pa.array([], pa.string()),
                **{c: pa.array([], pa.int64()) for c in cols[1:]},
            }
        )
    hourly["day"] = hourly["h"] // 24
    hourly["hod"] = hourly["h"] % 24
    dow = (hourly["day"] + 4) % 7  # Sunday = 0
    hourly["we"] = ((dow == 0) | (dow == 6)).astype(np.int64)
    out = {c: [] for c in cols}
    for et, g in hourly.groupby("event_type", sort=True):
        piv = g.groupby(["hod", "we"])["c"].agg(["sum", "count"]).unstack("we")
        if piv.shape[1] < 4:
            continue
        both = piv.dropna()
        if not len(both):
            continue
        d = (
            both[("sum", 0)].to_numpy(dtype=np.float64)
            / both[("count", 0)].to_numpy(dtype=np.float64)
            - both[("sum", 1)].to_numpy(dtype=np.float64)
            / both[("count", 1)].to_numpy(dtype=np.float64)
        )
        d = d[d != 0.0]
        n = len(d)
        if n == 0:
            out["event_type"].append(et)
            out["n_pairs"].append(0)
            out["wplus_x2"].append(0)
            out["z_x1e6"].append(None)
            continue
        absd = np.abs(d)
        uniq, inv, counts = np.unique(
            absd, return_inverse=True, return_counts=True
        )
        start = np.concatenate(([0], np.cumsum(counts)[:-1])) + 1
        avgrank_x2 = 2 * start + counts - 1
        wplus_x2 = int(np.sum(avgrank_x2[inv][d > 0]))
        nf = float(n)
        num = wplus_x2 / 2.0 - (nf * (nf + 1.0)) / 4.0
        den = np.sqrt((nf * (nf + 1.0) * (2.0 * nf + 1.0)) / 24.0)
        out["event_type"].append(et)
        out["n_pairs"].append(n)
        out["wplus_x2"].append(wplus_x2)
        out["z_x1e6"].append(
            None if den == 0.0 else _round_half_away(num / den * 1e6)
        )
    return pa.table(
        {
            "event_type": pa.array(out["event_type"], pa.string()),
            **{c: pa.array(out[c], pa.int64()) for c in cols[1:]},
        }
    )


WILCOXON_HOD_SQL = """
WITH hh AS MATERIALIZED (
  SELECT event_type,
         CAST(FLOOR(EPOCH_US(ts) / 3600000000) AS BIGINT) AS h,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM events
  WHERE event_type IS NOT NULL AND ts IS NOT NULL
  GROUP BY 1, 2
), lab AS (
  SELECT event_type, h % 24 AS hod,
         CASE WHEN ((h // 24) + 4) % 7 IN (0, 6) THEN 1 ELSE 0 END AS we,
         c
  FROM hh
), prof AS (
  SELECT event_type, hod, we,
         CAST(SUM(c) AS BIGINT) AS s, CAST(COUNT(*) AS BIGINT) AS k
  FROM lab GROUP BY 1, 2, 3
), pairs AS (
  SELECT a.event_type, a.hod,
         CAST(a.s AS DOUBLE) / CAST(a.k AS DOUBLE)
           - CAST(b.s AS DOUBLE) / CAST(b.k AS DOUBLE) AS d
  FROM prof a JOIN prof b
    ON a.event_type = b.event_type AND a.hod = b.hod
   AND a.we = 0 AND b.we = 1
), nz AS (
  SELECT event_type, d, ABS(d) AS absd FROM pairs WHERE d <> 0.0
), rk AS (
  SELECT event_type, d,
         RANK() OVER (PARTITION BY event_type ORDER BY absd) AS r,
         COUNT(*) OVER (PARTITION BY event_type, absd) AS ties
  FROM nz
), agg AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CASE WHEN d > 0 THEN 2 * r + ties - 1 ELSE 0 END)
              AS BIGINT) AS wplus_x2
  FROM rk GROUP BY 1
), base AS (
  SELECT p.event_type,
         COALESCE(a.n, 0) AS n_pairs,
         COALESCE(a.wplus_x2, 0) AS wplus_x2
  FROM (SELECT DISTINCT event_type FROM pairs) p
  LEFT JOIN agg a ON a.event_type = p.event_type
)
SELECT event_type, n_pairs, wplus_x2,
       CASE WHEN n_pairs = 0 THEN NULL
            ELSE CAST(ROUND(
              (wplus_x2 / 2.0
               - (CAST(n_pairs AS DOUBLE) * (n_pairs + 1.0)) / 4.0)
              / SQRT((CAST(n_pairs AS DOUBLE) * (n_pairs + 1.0)
                      * (2.0 * n_pairs + 1.0)) / 24.0)
              * 1000000, 0) AS BIGINT) END AS z_x1e6
FROM base ORDER BY 1
"""


def register_r4dz(queries: dict, oracles: dict) -> None:
    queries.update(
        {
            "anderson_darling_minute": q_anderson_darling_minute,
            "cramer_von_mises_weekpart": q_cramer_von_mises_weekpart,
            "wilcoxon_signed_rank_hod": q_wilcoxon_signed_rank_hod,
        }
    )
    oracles.update(
        {
            "anderson_darling_minute": AD_MINUTE_SQL,
            "cramer_von_mises_weekpart": CVM_WEEKPART_SQL,
            "wilcoxon_signed_rank_hod": WILCOXON_HOD_SQL,
        }
    )
