"""Round-4 batch FL: bitmap-index planning and cross-series
information flow — a Roaring-style container census of each event
type's active-minute set (array vs bitmap container choice at a
scaled-down 4096-value container width), lag-1 plug-in transfer
entropy between type activity indicators on the dense hour grid,
and integer-exact moving-average crossover (golden/death cross)
counts on hourly series.

Exactness discipline: containers are minute >> 12 with the real
Roaring break-even rule scaled to width 4096 (array when n < 256 at
2 bytes/value, else a 512-byte bitmap) — all integer; TE uses the
identity TE = H(Y+,Y) + H(Y,X) - H(Y) - H(Y+,Y,X) with plug-in
log2 entropies over the SAME dense grid and median-binarized
indicators on both sides; crossovers compare 4*sum6 vs sum24
(integer, since lcm(6,24)/6 = 4), zero diffs are skipped via
last-nonzero-sign semantics on both sides."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from mimirsbrunn_ray.pipelines.queries_r4fj import (
    _distinct_type_minutes,
)
from mimirsbrunn_ray.pipelines.queries_r4fk import (
    _HOUR_US,
    _round_half_away,
    _type_cell_counts,
)
from mimirsbrunn_ray.stages.rollup import tree_merge

_CONT_SHIFT = 12          # 4096-minute containers
_CONT_ARRAY_MAX = 255     # n < 256 -> array (2n bytes), else bitmap
_CONT_BITMAP_BYTES = 512  # 4096 bits


_ROAR_COLS = ["event_type", "n_minutes", "n_containers", "n_array",
              "n_bitmap", "total_bytes"]


def q_roaring_container_census(sf_dir):
    """Roaring-bitmap layout plan for each event type's sorted
    active-minute posting set at a 4096-wide container geometry:
    minutes are grouped into containers by minute >> 12; a container
    with fewer than 256 values is stored as a 2-byte-per-value
    array, otherwise as a 512-byte bitmap.  Reports per type the
    container mix and total bytes — the hybrid set-index decision a
    bitmap store makes per key.  One distinct shuffle; per-shard
    container partials tree-merge by sum."""
    tm = _distinct_type_minutes(sf_dir)

    def part(b: pa.Table) -> pa.Table:
        cols = ["event_type", "cont", "n"]
        if b.num_rows == 0 or "event_type" not in b.column_names:
            return pa.table({
                "event_type": pa.array([], pa.string()),
                "cont": pa.array([], pa.int64()),
                "n": pa.array([], pa.int64()),
            })
        df = b.select(["event_type", "minute"]).to_pandas()
        df["cont"] = (
            df["minute"].to_numpy(np.int64) >> _CONT_SHIFT)
        g = df.groupby(["event_type", "cont"], sort=False).size()
        g = g.reset_index(name="n")
        g["n"] = g["n"].astype(np.int64)
        return pa.Table.from_pandas(g[cols], preserve_index=False)

    def comb(b: pa.Table) -> pa.Table:
        g = b.group_by(["event_type", "cont"]).aggregate(
            [("n", "sum")])
        return g.rename_columns(["event_type", "cont", "n"])

    pc_df = tree_merge(
        tm.map_batches(part, batch_format="pyarrow",
                       batch_size=None),
        comb,
    ).to_pandas()
    if "event_type" not in pc_df.columns or len(pc_df) == 0:
        return pa.table({
            "event_type": pa.array([], pa.string()),
            **{c: pa.array([], pa.int64()) for c in _ROAR_COLS[1:]},
        })
    n = pc_df["n"].astype(np.int64)
    pc_df = pc_df.assign(
        is_arr=(n <= _CONT_ARRAY_MAX).astype(np.int64),
        bytes=np.where(n <= _CONT_ARRAY_MAX, 2 * n,
                       _CONT_BITMAP_BYTES).astype(np.int64),
    )
    agg = pc_df.groupby("event_type", sort=True).agg(
        n_minutes=("n", "sum"),
        n_containers=("cont", "size"),
        n_array=("is_arr", "sum"),
        bytes_total=("bytes", "sum"),
    ).reset_index()
    return pa.table({
        "event_type": pa.array(agg["event_type"], pa.string()),
        "n_minutes": pa.array(
            agg["n_minutes"].to_numpy(np.int64)),
        "n_containers": pa.array(
            agg["n_containers"].to_numpy(np.int64)),
        "n_array": pa.array(agg["n_array"].to_numpy(np.int64)),
        "n_bitmap": pa.array(
            (agg["n_containers"] - agg["n_array"]).to_numpy(
                np.int64)),
        "total_bytes": pa.array(
            agg["bytes_total"].to_numpy(np.int64)),
    })


ROARING_SQL = f"""
WITH dm AS MATERIALIZED (
  SELECT DISTINCT event_type, EPOCH_US(ts) // 60000000 AS m
  FROM events WHERE event_type IS NOT NULL AND ts IS NOT NULL
), pc AS MATERIALIZED (
  SELECT event_type, m >> {_CONT_SHIFT} AS cont,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM dm GROUP BY 1, 2
)
SELECT event_type,
       CAST(SUM(n) AS BIGINT) AS n_minutes,
       CAST(COUNT(*) AS BIGINT) AS n_containers,
       CAST(SUM(CASE WHEN n <= {_CONT_ARRAY_MAX} THEN 1 ELSE 0 END)
            AS BIGINT) AS n_array,
       CAST(SUM(CASE WHEN n <= {_CONT_ARRAY_MAX} THEN 0 ELSE 1 END)
            AS BIGINT) AS n_bitmap,
       CAST(SUM(CASE WHEN n <= {_CONT_ARRAY_MAX} THEN 2 * n
                     ELSE {_CONT_BITMAP_BYTES} END) AS BIGINT)
         AS total_bytes
FROM pc GROUP BY event_type ORDER BY event_type
"""


def _dense_hour_counts(sf_dir) -> pd.DataFrame | None:
    """Dense (event_type x hour) count grid over the global hour
    span, zero-filled — shared input of the TE and crossover
    censuses.  Distributed count pass; the grid itself is tiny."""
    cc = _type_cell_counts(sf_dir, "hour", _HOUR_US, None)
    if "event_type" not in cc.columns or len(cc) == 0:
        return None
    hmin = int(cc["hour"].min())
    hmax = int(cc["hour"].max())
    types = sorted(cc["event_type"].unique())
    grid = pd.MultiIndex.from_product(
        [types, range(hmin, hmax + 1)],
        names=["event_type", "hour"],
    ).to_frame(index=False)
    g = grid.merge(cc, on=["event_type", "hour"], how="left")
    g["c"] = g["c"].fillna(0).astype(np.int64)
    return g.sort_values(["event_type", "hour"],
                         ignore_index=True)


def _plugin_h(counts: np.ndarray) -> float:
    n = counts[counts > 0].astype(np.float64)
    tot = n.sum()
    p = n / tot
    return float(-(p * np.log2(p)).sum())


def q_transfer_entropy_pairs(sf_dir):
    """Lag-1 plug-in transfer entropy TE(X -> Y) between every
    ordered pair of event types, over median-binarized activity
    indicators on the dense global hour grid (x_t = 1 iff the
    type's count that hour exceeds its own grid median).  TE =
    H(Y+,Y) + H(Y,X) - H(Y) - H(Y+,Y,X), all entropies plug-in
    log2 over the same T-1 aligned triples — the directed
    information-flow census between streams.  Counts are one
    distributed pass; the pair sweep is vectorized driver math on
    the tiny grid."""
    g = _dense_hour_counts(sf_dir)
    cols = ["src_type", "dst_type", "n_steps", "te_ppm"]
    if g is None:
        return pa.table({
            "src_type": pa.array([], pa.string()),
            "dst_type": pa.array([], pa.string()),
            "n_steps": pa.array([], pa.int64()),
            "te_ppm": pa.array([], pa.int64()),
        })
    ind = {}
    for et, sub in g.groupby("event_type", sort=True):
        c = sub.sort_values("hour")["c"].to_numpy(np.int64)
        med = float(np.median(c))
        ind[et] = (c > med).astype(np.int64)
    types = sorted(ind)
    out = {c: [] for c in cols}
    for a in types:
        for b in types:
            if a == b:
                continue
            x = ind[a][:-1]
            y = ind[b][:-1]
            yp = ind[b][1:]
            n = len(x)
            if n == 0:
                continue
            code3 = yp * 4 + y * 2 + x
            c3 = np.bincount(code3, minlength=8)
            c2a = np.bincount(yp * 2 + y, minlength=4)
            c2b = np.bincount(y * 2 + x, minlength=4)
            c1 = np.bincount(y, minlength=2)
            te = (_plugin_h(c2a) + _plugin_h(c2b)
                  - _plugin_h(c1) - _plugin_h(c3))
            out["src_type"].append(a)
            out["dst_type"].append(b)
            out["n_steps"].append(n)
            out["te_ppm"].append(_round_half_away(te * 1e6))
    return pa.table({
        "src_type": pa.array(out["src_type"], pa.string()),
        "dst_type": pa.array(out["dst_type"], pa.string()),
        "n_steps": pa.array(out["n_steps"], pa.int64()),
        "te_ppm": pa.array(out["te_ppm"], pa.int64()),
    })


TE_SQL = f"""
WITH hc AS MATERIALIZED (
  SELECT event_type, EPOCH_US(ts) // {_HOUR_US} AS hour,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM events
  WHERE event_type IS NOT NULL AND ts IS NOT NULL
  GROUP BY 1, 2
), span AS MATERIALIZED (
  SELECT MIN(hour) AS hmin, MAX(hour) AS hmax FROM hc
), grid AS MATERIALIZED (
  SELECT t.event_type, s.hmin + r.k AS hour,
         COALESCE(hc.c, 0) AS c
  FROM (SELECT DISTINCT event_type FROM hc) t
  CROSS JOIN span s
  JOIN range(0, 100000) r(k) ON s.hmin + r.k <= s.hmax
  LEFT JOIN hc ON hc.event_type = t.event_type
              AND hc.hour = s.hmin + r.k
), ind AS MATERIALIZED (
  SELECT event_type, hour,
         CASE WHEN CAST(c AS DOUBLE) >
                   MEDIAN(CAST(c AS DOUBLE)) OVER
                     (PARTITION BY event_type)
              THEN 1 ELSE 0 END AS i
  FROM grid
), tri AS MATERIALIZED (
  SELECT a.event_type AS src_type, b.event_type AS dst_type,
         a.i AS x, b.i AS y, b2.i AS yp
  FROM ind a
  JOIN ind b ON a.hour = b.hour
            AND a.event_type <> b.event_type
  JOIN ind b2 ON b2.event_type = b.event_type
             AND b2.hour = b.hour + 1
), c3 AS MATERIALIZED (
  SELECT src_type, dst_type, x, y, yp,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM tri GROUP BY 1, 2, 3, 4, 5
), h3 AS (
  SELECT src_type, dst_type, ANY_VALUE(tot) AS tot,
         -SUM(p * LOG2(p)) AS h
  FROM (SELECT src_type, dst_type,
               CAST(n AS DOUBLE)
                 / SUM(n) OVER (PARTITION BY src_type, dst_type)
                 AS p,
               SUM(n) OVER (PARTITION BY src_type, dst_type)
                 AS tot
        FROM c3)
  GROUP BY 1, 2
), h2a AS (
  SELECT src_type, dst_type, -SUM(p * LOG2(p)) AS h
  FROM (SELECT src_type, dst_type,
               CAST(n AS DOUBLE)
                 / SUM(n) OVER (PARTITION BY src_type, dst_type)
                 AS p
        FROM (SELECT src_type, dst_type, y, yp, SUM(n) AS n
              FROM c3 GROUP BY 1, 2, 3, 4))
  GROUP BY 1, 2
), h2b AS (
  SELECT src_type, dst_type, -SUM(p * LOG2(p)) AS h
  FROM (SELECT src_type, dst_type,
               CAST(n AS DOUBLE)
                 / SUM(n) OVER (PARTITION BY src_type, dst_type)
                 AS p
        FROM (SELECT src_type, dst_type, x, y, SUM(n) AS n
              FROM c3 GROUP BY 1, 2, 3, 4))
  GROUP BY 1, 2
), h1 AS (
  SELECT src_type, dst_type, -SUM(p * LOG2(p)) AS h
  FROM (SELECT src_type, dst_type,
               CAST(n AS DOUBLE)
                 / SUM(n) OVER (PARTITION BY src_type, dst_type)
                 AS p
        FROM (SELECT src_type, dst_type, y, SUM(n) AS n
              FROM c3 GROUP BY 1, 2, 3))
  GROUP BY 1, 2
)
SELECT h3.src_type, h3.dst_type,
       CAST(h3.tot AS BIGINT) AS n_steps,
       CAST(ROUND((h2a.h + h2b.h - h1.h - h3.h) * 1000000, 0)
            AS BIGINT) AS te_ppm
FROM h3
JOIN h2a USING (src_type, dst_type)
JOIN h2b USING (src_type, dst_type)
JOIN h1 USING (src_type, dst_type)
ORDER BY src_type, dst_type
"""


def q_ma_crossover_signals(sf_dir):
    """Golden/death-cross census per event type on the dense hourly
    count grid: compare the trailing 6-hour and 24-hour moving
    averages via the integer diff 4*sum6 - sum24 (exact, since
    24/6 = 4), valid once both windows are full; count sign flips
    of the diff with zero hours skipped (last-nonzero-sign rule).
    Counts are one distributed pass; the window scan is a cumsum
    subtraction on the tiny grid."""
    g = _dense_hour_counts(sf_dir)
    cols = ["event_type", "n_hours", "n_golden", "n_death"]
    if g is None:
        return pa.table({
            "event_type": pa.array([], pa.string()),
            **{c: pa.array([], pa.int64()) for c in cols[1:]},
        })
    out = {c: [] for c in cols}
    for et, sub in g.groupby("event_type", sort=True):
        c = sub.sort_values("hour")["c"].to_numpy(np.int64)
        T = len(c)
        if T < 24:
            continue
        cs = np.concatenate(([0], np.cumsum(c)))
        sum6 = cs[6:] - cs[:-6]    # ends at t = 5..T-1
        sum24 = cs[24:] - cs[:-24]  # ends at t = 23..T-1
        diff = 4 * sum6[18:] - sum24
        s = np.sign(diff)
        nz = s[s != 0]
        golden = int(((nz[1:] == 1) & (nz[:-1] == -1)).sum())
        death = int(((nz[1:] == -1) & (nz[:-1] == 1)).sum())
        out["event_type"].append(et)
        out["n_hours"].append(T)
        out["n_golden"].append(golden)
        out["n_death"].append(death)
    return pa.table({
        "event_type": pa.array(out["event_type"], pa.string()),
        **{c: pa.array(out[c], pa.int64()) for c in cols[1:]},
    })


MA_CROSS_SQL = f"""
WITH hc AS MATERIALIZED (
  SELECT event_type, EPOCH_US(ts) // {_HOUR_US} AS hour,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM events
  WHERE event_type IS NOT NULL AND ts IS NOT NULL
  GROUP BY 1, 2
), span AS MATERIALIZED (
  SELECT MIN(hour) AS hmin, MAX(hour) AS hmax FROM hc
), grid AS MATERIALIZED (
  SELECT t.event_type, s.hmin + r.k AS hour,
         COALESCE(hc.c, 0) AS c
  FROM (SELECT DISTINCT event_type FROM hc) t
  CROSS JOIN span s
  JOIN range(0, 100000) r(k) ON s.hmin + r.k <= s.hmax
  LEFT JOIN hc ON hc.event_type = t.event_type
              AND hc.hour = s.hmin + r.k
), w AS MATERIALIZED (
  SELECT event_type, hour,
         4 * SUM(c) OVER (PARTITION BY event_type ORDER BY hour
                          ROWS BETWEEN 5 PRECEDING AND CURRENT ROW)
           - SUM(c) OVER (PARTITION BY event_type ORDER BY hour
                          ROWS BETWEEN 23 PRECEDING AND CURRENT ROW)
           AS diff,
         ROW_NUMBER() OVER (PARTITION BY event_type
                            ORDER BY hour) AS rn,
         COUNT(*) OVER (PARTITION BY event_type) AS n_hours
  FROM grid
), nz AS MATERIALIZED (
  SELECT event_type, hour, n_hours,
         CASE WHEN diff > 0 THEN 1 ELSE -1 END AS s,
         LAG(CASE WHEN diff > 0 THEN 1 ELSE -1 END)
           OVER (PARTITION BY event_type ORDER BY hour) AS prev_s
  FROM w WHERE rn >= 24 AND diff <> 0
)
SELECT event_type,
       CAST(ANY_VALUE(n_hours) AS BIGINT) AS n_hours,
       CAST(SUM(CASE WHEN prev_s = -1 AND s = 1
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_golden,
       CAST(SUM(CASE WHEN prev_s = 1 AND s = -1
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_death
FROM nz GROUP BY event_type
HAVING ANY_VALUE(n_hours) >= 24
ORDER BY event_type
"""


def register_r4fl(queries: dict, oracles: dict) -> None:
    queries.update(
        {
            "roaring_container_census": q_roaring_container_census,
            "transfer_entropy_pairs": q_transfer_entropy_pairs,
            "ma_crossover_signals": q_ma_crossover_signals,
        }
    )
    oracles.update(
        {
            "roaring_container_census": ROARING_SQL,
            "transfer_entropy_pairs": TE_SQL,
            "ma_crossover_signals": MA_CROSS_SQL,
        }
    )
