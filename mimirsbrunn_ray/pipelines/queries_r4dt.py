"""Round-4 batch DT: mean residual life of interarrival gaps, the
Lorenz asymmetry coefficient, and running-record counts.

Exactness discipline: gap/threshold sums, below-mean masses and record
breaks all fold exact int64 (mean compares by integer cross-
multiplication; records via a running max inside each series bucket);
the few final ratios are mirrored doubles, x1e6 snap.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from mimirsbrunn_ray.stages.dedup import _BUCKET
from mimirsbrunn_ray.stages.rollup import tree_merge
from mimirsbrunn_ray.stages.timeseries import (
    _project_series,
    _round_half_away_x,
    _series_segments,
)

_MRL_THRESHOLDS_S = (60, 300, 900, 1800)


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
# mean residual life of interarrival gaps
# ---------------------------------------------------------------------------


def q_mean_residual_life_gaps(sf_dir):
    """Per (event type, threshold in {60, 300, 900, 1800} s): the mean
    RESIDUAL life E[X - t | X > t] of second-grain interarrival gaps —
    the conditional tail expectation that tells an idle-timeout tuner
    "once a gap has lasted t, how much longer will it last on average"
    (increasing MRL = heavy tail, the regime where fixed timeouts
    misfire). One series-key shuffle emits, per type, the exact
    (count, excess-sum) pair at every threshold in the SAME pass; one
    mirrored division per row, x1e6 snap."""
    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_type", "ts", "event_id", "value"],
    )
    proj = _project_series(ev, "event_type", "ts", "event_id", "value", 64)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        cols = {"event_type": pd.Series([], dtype=object)}
        for t in _MRL_THRESHOLDS_S:
            cols[f"n_{t}"] = pd.Series([], dtype=np.int64)
            cols[f"s_{t}"] = pd.Series([], dtype=np.int64)
        empty = pd.DataFrame(cols)
        if len(g) == 0:
            return empty
        g, same = _series_segments(g, "event_type", "ts", "event_id")
        t_s = (
            g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
            // 1_000_000
        )
        dt = np.zeros(len(g), dtype=np.int64)
        dt[1:] = t_s[1:] - t_s[:-1]
        d = pd.DataFrame(
            {"event_type": g["event_type"].to_numpy()[same], "dt": dt[same]}
        )
        if not len(d):
            return empty
        aggs = {}
        for t in _MRL_THRESHOLDS_S:
            exc = d["dt"] - t
            over = exc > 0
            aggs[f"n_{t}"] = d[over].groupby("event_type")["dt"].size()
            aggs[f"s_{t}"] = exc[over].groupby(d["event_type"][over]).sum()
        out = pd.DataFrame(aggs).fillna(0).reset_index().rename(
            columns={"index": "event_type"}
        )
        for t in _MRL_THRESHOLDS_S:
            out[f"n_{t}"] = out[f"n_{t}"].astype(np.int64)
            out[f"s_{t}"] = out[f"s_{t}"].astype(np.int64)
        return out

    stats = tree_merge(
        proj.groupby(_BUCKET).map_groups(per_bucket, batch_format="pandas"),
        lambda b: _sum_by(
            b,
            ["event_type"],
            [f"{p}_{t}" for t in _MRL_THRESHOLDS_S for p in ("n", "s")],
        ),
    ).to_pandas()
    if not len(stats) or "event_type" not in stats.columns:
        return pa.table(
            {
                "event_type": pa.array([], pa.string()),
                "threshold_s": pa.array([], pa.int64()),
                "n_gaps": pa.array([], pa.int64()),
                "mrl_x1e6": pa.array([], pa.int64()),
            }
        )
    stats = stats.sort_values("event_type", ignore_index=True)
    rows = {"event_type": [], "threshold_s": [], "n_gaps": [], "mrl_x1e6": []}
    for i in range(len(stats)):
        for t in _MRL_THRESHOLDS_S:
            n = int(stats[f"n_{t}"].iloc[i])
            s = int(stats[f"s_{t}"].iloc[i])
            rows["event_type"].append(stats["event_type"].iloc[i])
            rows["threshold_s"].append(t)
            rows["n_gaps"].append(n)
            rows["mrl_x1e6"].append(
                None
                if n == 0
                else int(
                    _round_half_away(np.array([float(s) / n * 1e6]))[0]
                )
            )
    return pa.table(
        {
            "event_type": pa.array(rows["event_type"], pa.string()),
            "threshold_s": pa.array(rows["threshold_s"], pa.int64()),
            "n_gaps": pa.array(rows["n_gaps"], pa.int64()),
            "mrl_x1e6": pa.array(rows["mrl_x1e6"], pa.int64()),
        }
    )


MRL_SQL = """
WITH v AS (
  SELECT event_type, ts, event_id,
         CAST(FLOOR(EPOCH_US(ts) / 1000000) AS BIGINT) AS t_s
  FROM events
  WHERE event_type IS NOT NULL AND ts IS NOT NULL AND value IS NOT NULL
), g AS MATERIALIZED (
  SELECT event_type,
         t_s - LAG(t_s) OVER (PARTITION BY event_type
                              ORDER BY ts, event_id) AS dt
  FROM v
), th AS (SELECT unnest([60, 300, 900, 1800]) AS t)
SELECT g.event_type, CAST(th.t AS BIGINT) AS threshold_s,
       CAST(SUM(CASE WHEN g.dt > th.t THEN 1 ELSE 0 END) AS BIGINT)
         AS n_gaps,
       CASE WHEN SUM(CASE WHEN g.dt > th.t THEN 1 ELSE 0 END) = 0
            THEN NULL
            ELSE CAST(ROUND(
              CAST(SUM(CASE WHEN g.dt > th.t THEN g.dt - th.t ELSE 0 END)
                   AS DOUBLE)
              / SUM(CASE WHEN g.dt > th.t THEN 1 ELSE 0 END)
              * 1000000, 0) AS BIGINT) END AS mrl_x1e6
FROM g CROSS JOIN th
WHERE g.dt IS NOT NULL
GROUP BY 1, 2 ORDER BY 1, 2
"""


# ---------------------------------------------------------------------------
# Lorenz asymmetry coefficient
# ---------------------------------------------------------------------------


def q_lorenz_asymmetry_value(sf_dir):
    """Per event type (positive x100 values): the Lorenz asymmetry
    coefficient S = F(mu) + L(mu) — the share of OBSERVATIONS below the
    mean plus the share of MASS below the mean; S = 1 means the Lorenz
    curve is symmetric, S > 1 says inequality is driven by a few giants,
    S < 1 by many small values (two corpora can share a Gini yet differ
    here). Below-mean membership decides by exact cross-multiplication
    x * n < s1; both shares are ratios of exact integers, one mirrored
    sum, x1e6 snap."""
    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "value"]
    )

    def partial(b: pa.Table) -> pa.Table:
        b = _clean(b, ("event_type", "value"))
        x = _round_half_away_x(
            b["value"].to_numpy(zero_copy_only=False).astype(np.float64), 100.0
        )
        keep = x > 0
        t = pa.table(
            {
                "event_type": pa.array(
                    b["event_type"].to_numpy(zero_copy_only=False)[keep]
                ),
                "x": pa.array(x[keep]),
                "c": pa.array(np.ones(int(keep.sum()), np.int64)),
            }
        )
        return _sum_by(t, ["event_type", "x"], ["c"])

    hist = tree_merge(
        ev.map_batches(partial, batch_format="pyarrow", batch_size=None),
        lambda b: _sum_by(b, ["event_type", "x"], ["c"]),
    ).to_pandas()
    if not len(hist) or "event_type" not in hist.columns:
        return pa.table(
            {
                "event_type": pa.array([], pa.string()),
                "n": pa.array([], pa.int64()),
                "s_x1e6": pa.array([], pa.int64()),
            }
        )
    out = {"event_type": [], "n": [], "s_x1e6": []}
    for et, g in hist.sort_values(["event_type", "x"]).groupby(
        "event_type", sort=True
    ):
        xs = g["x"].to_numpy(dtype=np.int64)
        cs = g["c"].to_numpy(dtype=np.int64)
        n = int(cs.sum())
        s1 = int((xs * cs).sum())
        below = xs * n < s1  # exact: x < mean
        f_mu = float(cs[below].sum()) / n
        l_mu = float((xs[below] * cs[below]).sum()) / s1 if s1 else 0.0
        out["event_type"].append(et)
        out["n"].append(n)
        out["s_x1e6"].append(
            int(_round_half_away(np.array([(f_mu + l_mu) * 1e6]))[0])
        )
    return pa.table(
        {
            "event_type": pa.array(out["event_type"], pa.string()),
            "n": pa.array(out["n"], pa.int64()),
            "s_x1e6": pa.array(out["s_x1e6"], pa.int64()),
        }
    )


LORENZ_ASYM_SQL = """
WITH v AS MATERIALIZED (
  SELECT event_type, CAST(ROUND(value * 100, 0) AS BIGINT) AS x
  FROM events
  WHERE event_type IS NOT NULL AND value IS NOT NULL
    AND CAST(ROUND(value * 100, 0) AS BIGINT) > 0
), t AS MATERIALIZED (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x) AS BIGINT) AS s1
  FROM v GROUP BY 1
)
SELECT v.event_type, t.n,
       CAST(ROUND((CAST(SUM(CASE WHEN v.x * t.n < t.s1 THEN 1 ELSE 0 END)
                        AS DOUBLE) / t.n
                   + CAST(SUM(CASE WHEN v.x * t.n < t.s1 THEN v.x
                              ELSE 0 END) AS DOUBLE) / t.s1)
            * 1000000, 0) AS BIGINT) AS s_x1e6
FROM v JOIN t ON t.event_type = v.event_type
GROUP BY 1, 2, t.s1 ORDER BY 1
"""


# ---------------------------------------------------------------------------
# running-record counts per type
# ---------------------------------------------------------------------------


def q_record_breaks_value(sf_dir):
    """Per event type: how many times the ordered x100 value series set
    a NEW RUNNING MAXIMUM (the first value counts as record 1) — record
    statistics theory says an i.i.d. series of length n expects ~ln(n)
    records, so a materially larger count is direct evidence of upward
    drift without fitting any trend line. One series-key shuffle; the
    running max is a vectorized cumulative maximum inside each bucket;
    pure exact int64 output plus the ln(n) expectation for reference,
    x1e6 snap."""
    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_type", "ts", "event_id", "value"],
    )
    proj = _project_series(ev, "event_type", "ts", "event_id", "value", 64)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "event_type": pd.Series([], dtype=object),
                "n": pd.Series([], dtype=np.int64),
                "records": pd.Series([], dtype=np.int64),
            }
        )
        if len(g) == 0:
            return empty
        g, same = _series_segments(g, "event_type", "ts", "event_id")
        x = _round_half_away_x(g["value"].to_numpy(dtype=np.float64), 100.0)
        rows = {"event_type": [], "n": [], "records": []}
        starts = np.flatnonzero(~same)
        bounds = np.append(starts, len(g))
        keys = g["event_type"].to_numpy()
        for i in range(len(starts)):
            lo, hi = bounds[i], bounds[i + 1]
            xs = x[lo:hi]
            runmax = np.maximum.accumulate(xs)
            rec = 1 + int(np.sum(xs[1:] > runmax[:-1]))
            rows["event_type"].append(keys[lo])
            rows["n"].append(hi - lo)
            rows["records"].append(rec)
        return pd.DataFrame(rows).astype({"n": np.int64, "records": np.int64})

    stats = (
        proj.groupby(_BUCKET)
        .map_groups(per_bucket, batch_format="pandas")
        .to_pandas()
    )
    if not len(stats) or "event_type" not in stats.columns:
        return pa.table(
            {
                "event_type": pa.array([], pa.string()),
                "n": pa.array([], pa.int64()),
                "records": pa.array([], pa.int64()),
                "expected_x1e6": pa.array([], pa.int64()),
            }
        )
    stats = stats.sort_values("event_type", ignore_index=True)
    n = stats["n"].to_numpy(dtype=np.int64)
    exp = _round_half_away(np.log(n.astype(np.float64)) * 1e6)
    return pa.table(
        {
            "event_type": pa.array(stats["event_type"].tolist(), pa.string()),
            "n": pa.array(n),
            "records": pa.array(stats["records"].to_numpy(dtype=np.int64)),
            "expected_x1e6": pa.array(exp),
        }
    )


RECORDS_SQL = """
WITH v AS (
  SELECT event_type, ts, event_id,
         CAST(ROUND(value * 100, 0) AS BIGINT) AS x
  FROM events
  WHERE event_type IS NOT NULL AND ts IS NOT NULL AND value IS NOT NULL
), r AS (
  SELECT event_type, x,
         MAX(x) OVER (PARTITION BY event_type ORDER BY ts, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING
                      AND 1 PRECEDING) AS prev_max
  FROM v
)
SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CASE WHEN prev_max IS NULL OR x > prev_max
                     THEN 1 ELSE 0 END) AS BIGINT) AS records,
       CAST(ROUND(LN(CAST(COUNT(*) AS DOUBLE)) * 1000000, 0) AS BIGINT)
         AS expected_x1e6
FROM r GROUP BY 1 ORDER BY 1
"""


def register_r4dt(queries: dict, oracles: dict) -> None:
    queries.update(
        {
            "mean_residual_life_gaps": q_mean_residual_life_gaps,
            "lorenz_asymmetry_value": q_lorenz_asymmetry_value,
            "record_breaks_value": q_record_breaks_value,
        }
    )
    oracles.update(
        {
            "mean_residual_life_gaps": MRL_SQL,
            "lorenz_asymmetry_value": LORENZ_ASYM_SQL,
            "record_breaks_value": RECORDS_SQL,
        }
    )
