"""Round-4 batch AQ: distribution distance (1-D earth mover), mutual
information, and Wilson confidence intervals.

Exactness discipline: the EMD between two empirical distributions is
kept as the exact integer sum of |cum_a*n_b - cum_b*n_a| * gap over the
union grid (EMD = that / (n_a*n_b)); MI and Wilson bounds are the
identical double expression over exact integer counts, rounded once.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from mimirsbrunn_ray.stages.rollup import tree_merge

_HOUR_US = 3_600_000_000
_DAY_US = 86_400_000_000


def _round_half_away(x: np.ndarray) -> np.ndarray:
    return np.where(
        x >= 0, np.floor(x + 0.5), np.ceil(x - 0.5)
    ).astype(np.int64)


# ---------------------------------------------------------------------------
# 1-D earth-mover distance between source length distributions
# ---------------------------------------------------------------------------


def q_emd_doc_len_pairs(sf_dir):
    """Exact 1-D earth-mover (Wasserstein-1) distance between every
    source pair's n_chars distributions — the integral twin of
    ks_doc_len_matrix's max gap (EMD measures total distribution work,
    KS only the worst point). For empirical CDFs the distance is
    integral |F_a - F_b| dv = sum over union-grid gaps of
    |cum_a*n_b - cum_b*n_a| * gap / (n_a*n_b); the integer numerator is
    emitted exactly. Same bounded histogram pass as the KS matrix."""
    docs = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["source", "n_chars"]
    )

    def partial(b: pa.Table) -> pa.Table:
        b = b.filter(
            pc.and_(pc.is_valid(b["source"]), pc.is_valid(b["n_chars"]))
        )
        g = b.group_by(["source", "n_chars"]).aggregate([([], "count_all")])
        g = g.select(["source", "n_chars", "count_all"])
        return g.rename_columns(["source", "v", "n"])

    def combine(b: pa.Table) -> pa.Table:
        g = b.group_by(["source", "v"]).aggregate([("n", "sum")])
        return g.rename_columns(["source", "v", "n"])

    hist = tree_merge(
        docs.map_batches(partial, batch_format="pyarrow", batch_size=None),
        combine,
    ).to_pandas()  # bounded: sources x distinct lengths

    out = {"source_a": [], "source_b": [], "n_a": [], "n_b": [],
           "emd_num": []}
    if len(hist):
        sources = sorted(hist["source"].unique())
        grid = np.sort(hist["v"].unique()).astype(np.int64)
        gaps = np.diff(grid)
        cum = {}
        tot = {}
        for s in sources:
            h = hist[hist["source"] == s]
            c = np.zeros(len(grid), dtype=np.int64)
            idx = np.searchsorted(grid, h["v"].to_numpy(dtype=np.int64))
            c[idx] = h["n"].to_numpy(dtype=np.int64)
            cum[s] = np.cumsum(c)
            tot[s] = int(cum[s][-1])
        for i, sa in enumerate(sources):
            for sb in sources[i + 1:]:
                diff = np.abs(
                    cum[sa][:-1] * tot[sb] - cum[sb][:-1] * tot[sa]
                )
                out["source_a"].append(sa)
                out["source_b"].append(sb)
                out["n_a"].append(tot[sa])
                out["n_b"].append(tot[sb])
                out["emd_num"].append(int(np.dot(diff, gaps)))
    return pa.table(
        {
            "source_a": pa.array(out["source_a"], pa.string()),
            "source_b": pa.array(out["source_b"], pa.string()),
            "n_a": pa.array(out["n_a"], pa.int64()),
            "n_b": pa.array(out["n_b"], pa.int64()),
            "emd_num": pa.array(out["emd_num"], pa.int64()),
        }
    )


EMD_SQL = """
WITH h AS (
  SELECT source, n_chars AS v, CAST(COUNT(*) AS BIGINT) AS n
  FROM documents
  WHERE source IS NOT NULL AND n_chars IS NOT NULL
  GROUP BY 1, 2
), tot AS (
  SELECT source, CAST(SUM(n) AS BIGINT) AS nt FROM h GROUP BY 1
), vals AS (
  SELECT v, LEAD(v) OVER (ORDER BY v) - v AS gap
  FROM (SELECT DISTINCT v FROM h)
), grid AS (
  SELECT a.source AS sa, b.source AS sb, a.nt AS na, b.nt AS nb,
         v.v, v.gap
  FROM tot a JOIN tot b ON a.source < b.source CROSS JOIN vals v
), cum AS (
  SELECT g.sa, g.sb, g.na, g.nb, g.gap,
         SUM(COALESCE(ha.n, 0))
           OVER (PARTITION BY g.sa, g.sb ORDER BY g.v) AS ca,
         SUM(COALESCE(hb.n, 0))
           OVER (PARTITION BY g.sa, g.sb ORDER BY g.v) AS cb
  FROM grid g
  LEFT JOIN h ha ON ha.source = g.sa AND ha.v = g.v
  LEFT JOIN h hb ON hb.source = g.sb AND hb.v = g.v
)
SELECT sa AS source_a, sb AS source_b, na AS n_a, nb AS n_b,
       CAST(SUM(ABS(ca * nb - cb * na) * gap) AS BIGINT) AS emd_num
FROM cum WHERE gap IS NOT NULL
GROUP BY 1, 2, 3, 4
"""


# ---------------------------------------------------------------------------
# mutual information between event type and hour-of-day
# ---------------------------------------------------------------------------


def q_type_hour_mutual_info(sf_dir):
    """Mutual information I(event_type; hour-of-day) in fixed-point
    micro-nats — the information-theoretic twin of chi2_type_hour
    (how many nats does knowing the hour tell you about the type?).
    One decomposable joint-count pass (bounded by types x 24); MI is
    the identical double expression over those exact integers on both
    engines, rounded once x1e6."""
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
        hod = ((ts_us // _HOUR_US) % 24).astype(np.int64)
        t = pa.table(
            {"event_type": b["event_type"], "hod": pa.array(hod)}
        )
        g = t.group_by(["event_type", "hod"]).aggregate(
            [([], "count_all")]
        )
        g = g.select(["event_type", "hod", "count_all"])
        return g.rename_columns(["event_type", "hod", "n"])

    def combine(b: pa.Table) -> pa.Table:
        g = b.group_by(["event_type", "hod"]).aggregate([("n", "sum")])
        return g.rename_columns(["event_type", "hod", "n"])

    joint = tree_merge(
        ev.map_batches(partial, batch_format="pyarrow", batch_size=None),
        combine,
    ).to_pandas()  # bounded: types x 24

    if not len(joint):
        return pa.table(
            {
                "n": pa.array([0], pa.int64()),
                "mi_x1e6": pa.array([None], pa.int64()),
            }
        )
    n = int(joint["n"].sum())
    px = joint.groupby("event_type")["n"].sum()
    py = joint.groupby("hod")["n"].sum()
    c = joint["n"].to_numpy(dtype=np.float64)
    cx = joint["event_type"].map(px).to_numpy(dtype=np.float64)
    cy = joint["hod"].map(py).to_numpy(dtype=np.float64)
    # I = sum (c/n) * ln(c*n / (cx*cy)) — identical expression in SQL
    mi = float(np.sum((c / n) * np.log(c * n / (cx * cy))))
    return pa.table(
        {
            "n": pa.array([n], pa.int64()),
            "mi_x1e6": pa.array(
                [int(_round_half_away(np.array([mi * 1e6]))[0])],
                pa.int64(),
            ),
        }
    )


MI_SQL = """
WITH j AS MATERIALIZED (
  SELECT event_type, CAST(hour(ts) AS BIGINT) AS hod,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM events
  WHERE event_type IS NOT NULL AND ts IS NOT NULL
  GROUP BY 1, 2
), m AS (
  SELECT CAST(SUM(c) AS BIGINT) AS n FROM j
), px AS (
  SELECT event_type, CAST(SUM(c) AS BIGINT) AS cx FROM j GROUP BY 1
), py AS (
  SELECT hod, CAST(SUM(c) AS BIGINT) AS cy FROM j GROUP BY 1
)
SELECT m.n,
       CAST(ROUND(SUM(
         (j.c * 1.0 / m.n)
         * LN(j.c * 1.0 * m.n / (px.cx * 1.0 * py.cy))
       ) * 1000000, 0) AS BIGINT) AS mi_x1e6
FROM j JOIN px USING (event_type) JOIN py USING (hod)
CROSS JOIN m
GROUP BY m.n
"""


# ---------------------------------------------------------------------------
# Wilson 95% confidence interval for the weekend share per type
# ---------------------------------------------------------------------------

_WILSON_Z = 1.96


def q_weekend_share_wilson(sf_dir):
    """Per event type: the weekend-event share with its Wilson 95%
    confidence interval — the right interval for proportions (never
    leaves [0,1], works at extreme rates, unlike the normal
    approximation). Counts are one decomposable pass; the Wilson bounds
    are the identical double expression (z inlined as a literal) over
    exact integers, rounded once x1e9."""
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
        dow = (np.floor_divide(ts_us, _DAY_US) + 4) % 7
        we = ((dow == 0) | (dow == 6)).astype(np.int64)
        t = pa.table({"event_type": b["event_type"], "we": pa.array(we)})
        g = t.group_by(["event_type"]).aggregate(
            [([], "count_all"), ("we", "sum")]
        )
        g = g.select(["event_type", "count_all", "we_sum"])
        return g.rename_columns(["event_type", "n", "k"])

    def combine(b: pa.Table) -> pa.Table:
        g = b.group_by(["event_type"]).aggregate(
            [("n", "sum"), ("k", "sum")]
        )
        return g.rename_columns(["event_type", "n", "k"])

    counts = tree_merge(
        ev.map_batches(partial, batch_format="pyarrow", batch_size=None),
        combine,
    ).to_pandas()

    from mimirsbrunn_ray.stages.broadcast import ensure_cols

    counts = ensure_cols(counts, ["event_type", "n", "k"])
    rows = {"event_type": [], "n": [], "k": [], "lo_x1e9": [],
            "hi_x1e9": []}
    z = _WILSON_Z
    for _, r in counts.sort_values("event_type").iterrows():
        n = float(r["n"])
        k = float(r["k"])
        p = k / n
        denom = 1.0 + z * z / n
        center = (p + z * z / (2.0 * n)) / denom
        half = (
            z
            * np.sqrt(p * (1.0 - p) / n + z * z / (4.0 * n * n))
            / denom
        )
        rows["event_type"].append(r["event_type"])
        rows["n"].append(int(r["n"]))
        rows["k"].append(int(r["k"]))
        rows["lo_x1e9"].append(
            int(_round_half_away(np.array([(center - half) * 1e9]))[0])
        )
        rows["hi_x1e9"].append(
            int(_round_half_away(np.array([(center + half) * 1e9]))[0])
        )
    return pa.table(
        {
            "event_type": pa.array(rows["event_type"], pa.string()),
            "n": pa.array(rows["n"], pa.int64()),
            "k": pa.array(rows["k"], pa.int64()),
            "lo_x1e9": pa.array(rows["lo_x1e9"], pa.int64()),
            "hi_x1e9": pa.array(rows["hi_x1e9"], pa.int64()),
        }
    )


WILSON_SQL = f"""
WITH c AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CASE WHEN dayofweek(ts) IN (0, 6) THEN 1 ELSE 0 END)
              AS BIGINT) AS k
  FROM events
  WHERE event_type IS NOT NULL AND ts IS NOT NULL
  GROUP BY 1
), w AS (
  SELECT event_type, n, k,
         k * 1.0 / n AS p,
         1.0 + {_WILSON_Z} * {_WILSON_Z} / n AS denom
  FROM c
)
SELECT event_type, n, k,
       CAST(ROUND(((p + {_WILSON_Z} * {_WILSON_Z} / (2.0 * n)) / denom
         - {_WILSON_Z}
           * SQRT(p * (1.0 - p) / n
                  + {_WILSON_Z} * {_WILSON_Z} / (4.0 * n * n))
           / denom) * 1000000000, 0) AS BIGINT) AS lo_x1e9,
       CAST(ROUND(((p + {_WILSON_Z} * {_WILSON_Z} / (2.0 * n)) / denom
         + {_WILSON_Z}
           * SQRT(p * (1.0 - p) / n
                  + {_WILSON_Z} * {_WILSON_Z} / (4.0 * n * n))
           / denom) * 1000000000, 0) AS BIGINT) AS hi_x1e9
FROM w
"""


def register_r4aq(queries: dict, oracles: dict) -> None:
    queries.update(
        {
            "emd_doc_len_pairs": q_emd_doc_len_pairs,
            "type_hour_mutual_info": q_type_hour_mutual_info,
            "weekend_share_wilson": q_weekend_share_wilson,
        }
    )
    oracles.update(
        {
            "emd_doc_len_pairs": EMD_SQL,
            "type_hour_mutual_info": MI_SQL,
            "weekend_share_wilson": WILSON_SQL,
        }
    )
