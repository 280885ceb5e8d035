"""Round-4 batch CT: dictionary-encoding benefit audit for categorical
columns, diurnal (lag-24h) autocorrelation of hourly counts, and the
per-minute occupancy histogram.

Storage-planning + arrival-process diagnostics: the dict audit sizes
exactly what dictionary encoding saves per low-cardinality column (the
write-path decision for the publish stage); lag-24 count autocorrelation
measures diurnal memory on the DENSE hour grid (gap hours = zero); the
occupancy histogram is the full arrival distribution behind the Poisson
dispersion index. Exactness: everything folds as exact int64 (lengths,
distinct sets via hash-bucket dedup, dense-grid pair sums); bit widths
use exact integer machinery (frexp vs length(bin())); the single
autocorrelation division is a mirrored double, x1e6 snap.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from mimirsbrunn_ray.stages.rollup import tree_merge

_HOUR_US = 3_600_000_000
_MIN_US = 60_000_000


def _round_half_away(x: np.ndarray) -> np.ndarray:
    return np.where(x >= 0, np.floor(x + 0.5), np.ceil(x - 0.5)).astype(
        np.int64
    )


def _sum_by(t: pa.Table, keys: list[str], vals: list[str]) -> pa.Table:
    g = t.group_by(keys).aggregate([(v, "sum") for v in vals])
    g = g.select(keys + [f"{v}_sum" for v in vals])
    return g.rename_columns(keys + vals)


def _clean(b: pa.Table, cols) -> pa.Table:
    m = None
    for c in cols:
        v = pc.is_valid(b[c])
        m = v if m is None else pc.and_(m, v)
    return b.filter(m)


# ---------------------------------------------------------------------------
# dictionary-encoding benefit per categorical column
# ---------------------------------------------------------------------------

_DICT_COLS = (
    ("events", "event_type"),
    ("documents", "source"),
    ("documents", "lang"),
    ("orders", "o_orderpriority"),
    ("lineitem", "l_returnflag"),
)


def q_dict_encoding_benefit(sf_dir):
    """Per categorical column: the exact dictionary-encoding size model
    — raw bytes = sum of value lengths vs dict bytes = (sum of DISTINCT
    value lengths) + n * ceil(bits/8) with bits = bit length of
    (ndv - 1) — the write-path decision the publish stage makes when
    choosing Parquet encodings (ratio >> 1 = dictionary wins). Distinct
    values and their lengths fold via per-batch set partials + a keyed
    merge (cardinalities are design-bounded for these columns); byte
    sums fold exact int64; bit widths use exact integer machinery
    (numpy frexp vs DuckDB length(bin())), so every output column is an
    exact integer except the x1e6-snapped ratio."""
    rows = {
        "tbl": [],
        "col": [],
        "n": [],
        "ndv": [],
        "raw_bytes": [],
        "dict_bytes": [],
        "ratio_x1e6": [],
    }
    for tbl, col in _DICT_COLS:
        ds = rd.read_parquet(f"{sf_dir}/{tbl}.parquet", columns=[col])

        def partial(b: pa.Table, col=col) -> pa.Table:
            b = b.filter(pc.is_valid(b[col]))
            v = b[col]
            lens = pc.utf8_length(v).to_numpy(zero_copy_only=False).astype(
                np.int64
            )
            # per-batch distinct partial rides along as extra rows with
            # n = 0 so one tree merge folds both
            uniq = pc.unique(v.combine_chunks())
            t = pa.table(
                {
                    "val": pa.concat_arrays(
                        [pa.array(["\x00__count__"], pa.string()), uniq]
                    ),
                    "n": pa.array(
                        [b.num_rows] + [0] * len(uniq), pa.int64()
                    ),
                    "raw": pa.array(
                        [int(lens.sum())] + [0] * len(uniq), pa.int64()
                    ),
                }
            )
            return t

        def combine(b: pa.Table) -> pa.Table:
            g = b.group_by(["val"]).aggregate([("n", "sum"), ("raw", "sum")])
            return g.select(["val", "n_sum", "raw_sum"]).rename_columns(
                ["val", "n", "raw"]
            )

        merged = tree_merge(
            ds.map_batches(partial, batch_format="pyarrow", batch_size=None),
            combine,
        ).to_pandas()  # bounded: ndv + 1 rows

        if not len(merged) or "val" not in merged.columns:
            n = ndv = raw = 0
        else:
            cnt_row = merged[merged["val"] == "\x00__count__"]
            n = int(cnt_row["n"].sum())
            raw = int(cnt_row["raw"].sum())
            dv = merged[merged["val"] != "\x00__count__"]["val"]
            ndv = int(dv.nunique())
        rows["tbl"].append(tbl)
        rows["col"].append(col)
        rows["n"].append(n)
        rows["ndv"].append(ndv)
        rows["raw_bytes"].append(raw)
        if n == 0 or ndv == 0:
            rows["dict_bytes"].append(0)
            rows["ratio_x1e6"].append(None)
            continue
        dict_vals_bytes = int(
            np.sum([len(s.encode("utf-8")) for s in dv.unique()])
        )
        if ndv == 1:
            bits = 0
        else:
            _, e = np.frexp(np.array([ndv - 1], dtype=np.float64))
            bits = int(e[0])
        dict_bytes = dict_vals_bytes + n * ((bits + 7) // 8)
        rows["dict_bytes"].append(dict_bytes)
        rows["ratio_x1e6"].append(
            None
            if dict_bytes == 0
            else int(
                _round_half_away(
                    np.array([float(raw) / dict_bytes * 1e6])
                )[0]
            )
        )
    return pa.table(
        {
            "tbl": pa.array(rows["tbl"], pa.string()),
            "col": pa.array(rows["col"], pa.string()),
            "n": pa.array(rows["n"], pa.int64()),
            "ndv": pa.array(rows["ndv"], pa.int64()),
            "raw_bytes": pa.array(rows["raw_bytes"], pa.int64()),
            "dict_bytes": pa.array(rows["dict_bytes"], pa.int64()),
            "ratio_x1e6": pa.array(rows["ratio_x1e6"], pa.int64()),
        }
    )


_DICT_SQL_ONE = """
SELECT '{tbl}' AS tbl, '{col}' AS col,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(COUNT(DISTINCT {col}) AS BIGINT) AS ndv,
       CAST(SUM(length({col})) AS BIGINT) AS raw_bytes,
       CAST((SELECT SUM(length(v)) FROM
               (SELECT DISTINCT {col} AS v FROM {tbl}
                WHERE {col} IS NOT NULL))
            + COUNT(*) * CAST(FLOOR((CASE WHEN COUNT(DISTINCT {col}) = 1
                                          THEN 0
                                          ELSE length(bin(
                                            COUNT(DISTINCT {col}) - 1))
                                     END + 7) / 8) AS BIGINT)
            AS BIGINT) AS dict_bytes,
       CASE WHEN (SELECT SUM(length(v)) FROM
                    (SELECT DISTINCT {col} AS v FROM {tbl}
                     WHERE {col} IS NOT NULL))
                 + COUNT(*) * CAST(FLOOR((CASE
                       WHEN COUNT(DISTINCT {col}) = 1 THEN 0
                       ELSE length(bin(COUNT(DISTINCT {col}) - 1))
                     END + 7) / 8) AS BIGINT) = 0
            THEN NULL
            ELSE CAST(ROUND(CAST(SUM(length({col})) AS DOUBLE)
                   / ((SELECT SUM(length(v)) FROM
                        (SELECT DISTINCT {col} AS v FROM {tbl}
                         WHERE {col} IS NOT NULL))
                      + COUNT(*) * CAST(FLOOR((CASE
                            WHEN COUNT(DISTINCT {col}) = 1 THEN 0
                            ELSE length(bin(COUNT(DISTINCT {col}) - 1))
                          END + 7) / 8) AS BIGINT))
                 * 1000000, 0) AS BIGINT) END AS ratio_x1e6
FROM {tbl} WHERE {col} IS NOT NULL
"""

DICT_BENEFIT_SQL = "\nUNION ALL\n".join(
    _DICT_SQL_ONE.format(tbl=t, col=c) for t, c in _DICT_COLS
)


# ---------------------------------------------------------------------------
# lag-24h autocorrelation of hourly counts on the dense grid
# ---------------------------------------------------------------------------


def q_diurnal_count_autocorr(sf_dir):
    """Per event type: the Pearson autocorrelation at lag 24 HOURS of
    the hourly count series over the DENSE hour grid (gap hours count
    zero) — the diurnal-memory coefficient (near 1 = strong repeating
    daily load shape, the signal that justifies hour-of-day-aware
    capacity planning). Observed hourly counts fold exact int64; the
    dense-grid pair sums (c_t * c_{t+24}) fold exactly over observed
    pairs because zero terms vanish, and the marginal sums over the two
    24-trimmed windows are exact span arithmetic; r is one mirrored
    double per type, x1e6 snap."""
    ev = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_type", "ts"])

    def partial(b: pa.Table) -> pa.Table:
        b = _clean(b, ("event_type", "ts"))
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

    cells = tree_merge(
        ev.map_batches(partial, batch_format="pyarrow", batch_size=None),
        lambda b: _sum_by(b, ["event_type", "h"], ["c"]),
    ).to_pandas()  # bounded: types x hours

    if not len(cells) or "event_type" not in cells.columns:
        return pa.table(
            {
                "event_type": pa.array([], pa.string()),
                "n_pairs": pa.array([], pa.int64()),
                "r24_x1e6": pa.array([], pa.int64()),
            }
        )
    out = {"event_type": [], "n_pairs": [], "r24_x1e6": []}
    LAG = 24
    for et, g in cells.sort_values(["event_type", "h"]).groupby(
        "event_type", sort=True
    ):
        h = g["h"].to_numpy(dtype=np.int64)
        c = g["c"].to_numpy(dtype=np.int64)
        lo, hi = int(h.min()), int(h.max())
        span = hi - lo + 1
        m = span - LAG  # pairs (t, t+24) for t in [lo, hi-24]
        out["event_type"].append(et)
        out["n_pairs"].append(max(m, 0))
        if m < 2:
            out["r24_x1e6"].append(None)
            continue
        dense = np.zeros(span, dtype=np.int64)
        dense[h - lo] = c
        x = dense[:-LAG]
        y = dense[LAG:]
        sx, sy = int(x.sum()), int(y.sum())
        sxx, syy = int((x * x).sum()), int((y * y).sum())
        sxy = int((x * y).sum())
        num = float(sxy) - float(sx) * sy / m
        den = np.sqrt(
            (float(sxx) - float(sx) * sx / m)
            * (float(syy) - float(sy) * sy / m)
        )
        out["r24_x1e6"].append(
            None
            if den == 0.0
            else int(_round_half_away(np.array([num / den * 1e6]))[0])
        )
    return pa.table(
        {
            "event_type": pa.array(out["event_type"], pa.string()),
            "n_pairs": pa.array(out["n_pairs"], pa.int64()),
            "r24_x1e6": pa.array(out["r24_x1e6"], pa.int64()),
        }
    )


DIURNAL_ACF_SQL = """
WITH c AS MATERIALIZED (
  SELECT event_type,
         CAST(FLOOR(EPOCH_US(ts) / 3600000000) AS BIGINT) AS h,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM events
  WHERE event_type IS NOT NULL AND ts IS NOT NULL
  GROUP BY 1, 2
), span AS MATERIALIZED (
  SELECT event_type, MIN(h) AS lo, MAX(h) AS hi,
         CAST(MAX(h) - MIN(h) + 1 - 24 AS BIGINT) AS m
  FROM c GROUP BY 1
), xs AS (
  -- marginals over the two trimmed windows; zero cells contribute 0
  SELECT c.event_type,
         CAST(SUM(CASE WHEN c.h <= span.hi - 24 THEN c.c ELSE 0 END)
              AS BIGINT) AS sx,
         CAST(SUM(CASE WHEN c.h <= span.hi - 24 THEN c.c * c.c ELSE 0 END)
              AS BIGINT) AS sxx,
         CAST(SUM(CASE WHEN c.h >= span.lo + 24 THEN c.c ELSE 0 END)
              AS BIGINT) AS sy,
         CAST(SUM(CASE WHEN c.h >= span.lo + 24 THEN c.c * c.c ELSE 0 END)
              AS BIGINT) AS syy
  FROM c JOIN span ON span.event_type = c.event_type
  GROUP BY 1
), ps AS (
  SELECT a.event_type, CAST(SUM(a.c * b.c) AS BIGINT) AS sxy
  FROM c a JOIN c b ON b.event_type = a.event_type AND b.h = a.h + 24
  GROUP BY 1
)
SELECT span.event_type,
       CASE WHEN span.m > 0 THEN span.m ELSE 0 END AS n_pairs,
       CASE WHEN span.m < 2
              OR SQRT((xs.sxx - CAST(xs.sx AS DOUBLE) * xs.sx / span.m)
                      * (xs.syy - CAST(xs.sy AS DOUBLE) * xs.sy / span.m))
                 = 0
            THEN NULL
            ELSE CAST(ROUND(
              (COALESCE(ps.sxy, 0) - CAST(xs.sx AS DOUBLE) * xs.sy / span.m)
              / SQRT((xs.sxx - CAST(xs.sx AS DOUBLE) * xs.sx / span.m)
                     * (xs.syy - CAST(xs.sy AS DOUBLE) * xs.sy / span.m))
              * 1000000, 0) AS BIGINT) END AS r24_x1e6
FROM span
JOIN xs ON xs.event_type = span.event_type
LEFT JOIN ps ON ps.event_type = span.event_type
ORDER BY 1
"""


# ---------------------------------------------------------------------------
# per-minute occupancy histogram (arrival distribution)
# ---------------------------------------------------------------------------


def q_minute_count_histogram(sf_dir):
    """Per event type: the full occupancy histogram of events-per-minute
    over the DENSE minute grid — for each occupancy k, how many minutes
    held exactly k events (k = 0 from exact span arithmetic) — the
    complete arrival distribution behind the scalar Poisson dispersion
    index, used to pick gap-fill and batch-size policy. Pure exact
    int64 end-to-end: observed (type, minute) counts fold once, the
    k-histogram folds over that bounded table, and zero-minutes =
    span - observed."""
    ev = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_type", "ts"])

    def partial(b: pa.Table) -> pa.Table:
        b = _clean(b, ("event_type", "ts"))
        us = b["ts"].cast(pa.timestamp("us")).cast(pa.int64()).to_numpy()
        m = (us // _MIN_US).astype(np.int64)
        t = pa.table(
            {
                "event_type": b["event_type"],
                "m": pa.array(m),
                "c": pa.array(np.ones(len(m), np.int64)),
            }
        )
        return _sum_by(t, ["event_type", "m"], ["c"])

    obs = tree_merge(
        ev.map_batches(partial, batch_format="pyarrow", batch_size=None),
        lambda b: _sum_by(b, ["event_type", "m"], ["c"]),
    )

    def hist_partial(b: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "event_type": b["event_type"],
                "k": b["c"],
                "n_minutes": pa.array(np.ones(b.num_rows, np.int64)),
                "mn": b["m"],
                "mx": b["m"],
            }
        )
        g = t.group_by(["event_type", "k"]).aggregate(
            [("n_minutes", "sum"), ("mn", "min"), ("mx", "max")]
        )
        return g.select(
            ["event_type", "k", "n_minutes_sum", "mn_min", "mx_max"]
        ).rename_columns(["event_type", "k", "n_minutes", "mn", "mx"])

    def hist_combine(b: pa.Table) -> pa.Table:
        g = b.group_by(["event_type", "k"]).aggregate(
            [("n_minutes", "sum"), ("mn", "min"), ("mx", "max")]
        )
        return g.select(
            ["event_type", "k", "n_minutes_sum", "mn_min", "mx_max"]
        ).rename_columns(["event_type", "k", "n_minutes", "mn", "mx"])

    hist = tree_merge(
        obs.map_batches(hist_partial, batch_format="pyarrow", batch_size=None),
        hist_combine,
    ).to_pandas()  # bounded: types x distinct occupancies

    if not len(hist) or "event_type" not in hist.columns:
        return pa.table(
            {
                "event_type": pa.array([], pa.string()),
                "k": pa.array([], pa.int64()),
                "n_minutes": pa.array([], pa.int64()),
            }
        )
    frames = []
    for et, g in hist.groupby("event_type", sort=True):
        span = int(g["mx"].max()) - int(g["mn"].min()) + 1
        zero = span - int(g["n_minutes"].sum())
        f = g[["event_type", "k", "n_minutes"]]
        if zero > 0:
            f = pd.concat(
                [
                    pd.DataFrame(
                        {"event_type": [et], "k": [0], "n_minutes": [zero]}
                    ),
                    f,
                ],
                ignore_index=True,
            )
        frames.append(f)
    out = pd.concat(frames, ignore_index=True).sort_values(
        ["event_type", "k"], ignore_index=True
    )
    return pa.table(
        {
            "event_type": pa.array(out["event_type"].tolist(), pa.string()),
            "k": pa.array(out["k"].to_numpy(dtype=np.int64)),
            "n_minutes": pa.array(out["n_minutes"].to_numpy(dtype=np.int64)),
        }
    )


MINUTE_HIST_SQL = """
WITH c AS MATERIALIZED (
  SELECT event_type,
         CAST(FLOOR(EPOCH_US(ts) / 60000000) AS BIGINT) AS m,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM events
  WHERE event_type IS NOT NULL AND ts IS NOT NULL
  GROUP BY 1, 2
), h AS (
  SELECT event_type, c AS k, CAST(COUNT(*) AS BIGINT) AS n_minutes
  FROM c GROUP BY 1, 2
), z AS (
  SELECT event_type, CAST(0 AS BIGINT) AS k,
         CAST(MAX(m) - MIN(m) + 1 - COUNT(*) AS BIGINT) AS n_minutes
  FROM c GROUP BY 1
  HAVING MAX(m) - MIN(m) + 1 - COUNT(*) > 0
)
SELECT * FROM h
UNION ALL
SELECT * FROM z
ORDER BY 1, 2
"""


def register_r4ct(queries: dict, oracles: dict) -> None:
    queries.update(
        {
            "dict_encoding_benefit": q_dict_encoding_benefit,
            "diurnal_count_autocorr": q_diurnal_count_autocorr,
            "minute_count_histogram": q_minute_count_histogram,
        }
    )
    oracles.update(
        {
            "dict_encoding_benefit": DICT_BENEFIT_SQL,
            "diurnal_count_autocorr": DIURNAL_ACF_SQL,
            "minute_count_histogram": MINUTE_HIST_SQL,
        }
    )
