"""Round-4 batch DR: Spearman footrule distance between source and
global word rankings, the median absolute successive difference (MASD)
robust volatility, and the SPC p-chart out-of-control day count.

Exactness discipline: rankings use exact counts with a word tie-break
(fully integer footrule); MASD selects from the exact |delta| histogram
by integer cross-multiplication; p-chart limits are mirrored doubles
compared against exact per-day integer ratios — every comparison sees
identical operands on both engines. x1e6 snaps on the few ratios.
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

_DAY_US = 86_400_000_000


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
# Spearman footrule distance: source vs global word ranking
# ---------------------------------------------------------------------------


def q_spearman_footrule_sources(sf_dir):
    """Per source: the Spearman footrule distance sum |rank_source(w) -
    rank_global(w)| over the words the source shares with the corpus,
    plus its normalization by the maximum footrule on that support —
    the L1 companion to RBO that weights every rank displacement
    equally (a cheap total-order drift detector between a shard and the
    corpus). Rankings order by exact count descending with a word
    tie-break, then re-rank WITHIN the shared support, so the distance
    is a pure integer; only the normalized form divides, x1e6 snap."""
    docs = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["source", "text"]
    )

    def partial(b: pa.Table) -> pa.Table:
        b = _clean(b, ("source", "text"))
        words = pc.split_pattern(b["text"], pattern=" ")
        lens = pc.list_value_length(words).to_numpy(zero_copy_only=False)
        flat = pc.list_flatten(words)
        src = pa.array(
            np.repeat(b["source"].to_numpy(zero_copy_only=False), lens)
        )
        t = pa.table(
            {
                "source": src,
                "w": flat,
                "c": pa.array(
                    np.ones(int(lens.sum()) if len(lens) else 0, np.int64)
                ),
            }
        )
        return _sum_by(t, ["source", "w"], ["c"])

    wsc = tree_merge(
        docs.map_batches(partial, batch_format="pyarrow", batch_size=None),
        lambda b: _sum_by(b, ["source", "w"], ["c"]),
    ).to_pandas()
    if not len(wsc) or "source" not in wsc.columns:
        return pa.table(
            {
                "source": pa.array([], pa.string()),
                "k_words": pa.array([], pa.int64()),
                "footrule": pa.array([], pa.int64()),
                "norm_x1e6": pa.array([], pa.int64()),
            }
        )
    glob = (
        wsc.groupby("w", as_index=False)["c"].sum()
        .sort_values(["c", "w"], ascending=[False, True], ignore_index=True)
    )
    out = {"source": [], "k_words": [], "footrule": [], "norm_x1e6": []}
    for src, g in wsc.sort_values(["source", "w"]).groupby("source", sort=True):
        sl = g.sort_values(
            ["c", "w"], ascending=[False, True], ignore_index=True
        )["w"].tolist()
        support = set(sl)
        # re-rank both lists WITHIN the shared support (dense 1..k)
        gl = [w for w in glob["w"] if w in support]
        rs = {w: i + 1 for i, w in enumerate(sl)}
        rg = {w: i + 1 for i, w in enumerate(gl)}
        k = len(sl)
        d = sum(abs(rs[w] - rg[w]) for w in sl)
        # max footrule on k items: floor(k^2 / 2)
        mx = (k * k) // 2
        out["source"].append(src)
        out["k_words"].append(k)
        out["footrule"].append(d)
        out["norm_x1e6"].append(
            None
            if mx == 0
            else int(_round_half_away(np.array([float(d) / mx * 1e6]))[0])
        )
    return pa.table(
        {
            "source": pa.array(out["source"], pa.string()),
            "k_words": pa.array(out["k_words"], pa.int64()),
            "footrule": pa.array(out["footrule"], pa.int64()),
            "norm_x1e6": pa.array(out["norm_x1e6"], pa.int64()),
        }
    )


FOOTRULE_SQL = """
WITH w AS (
  SELECT source, unnest(string_split(text, ' ')) AS w
  FROM documents
  WHERE source IS NOT NULL AND text IS NOT NULL
), c AS MATERIALIZED (
  SELECT source, w, CAST(COUNT(*) AS BIGINT) AS c FROM w GROUP BY 1, 2
), gl AS MATERIALIZED (
  SELECT w, CAST(SUM(c) AS BIGINT) AS cg FROM c GROUP BY 1
), rs AS MATERIALIZED (
  SELECT source, w,
         ROW_NUMBER() OVER (PARTITION BY source ORDER BY c DESC, w) AS r
  FROM c
), rg AS MATERIALIZED (
  -- global ranking restricted to each source's support, re-ranked dense
  SELECT c.source, c.w,
         ROW_NUMBER() OVER (PARTITION BY c.source
                            ORDER BY gl.cg DESC, c.w) AS r
  FROM c JOIN gl ON gl.w = c.w
), d AS (
  SELECT rs.source, CAST(COUNT(*) AS BIGINT) AS k_words,
         CAST(SUM(ABS(rs.r - rg.r)) AS BIGINT) AS footrule
  FROM rs JOIN rg ON rg.source = rs.source AND rg.w = rs.w
  GROUP BY 1
)
SELECT source, k_words, footrule,
       CASE WHEN (k_words * k_words) // 2 = 0 THEN NULL
            ELSE CAST(ROUND(CAST(footrule AS DOUBLE)
                   / ((k_words * k_words) // 2) * 1000000, 0) AS BIGINT)
       END AS norm_x1e6
FROM d ORDER BY 1
"""


# ---------------------------------------------------------------------------
# median absolute successive difference (robust volatility)
# ---------------------------------------------------------------------------


def q_masd_value(sf_dir):
    """Per event type: the MEDIAN absolute successive difference of the
    ordered x100 value series — the outlier-proof volatility scale
    (vs the mean-square Allan/rolling measures a single spike can
    dominate); the robust sibling every change-alert threshold should
    be calibrated on. One series-key hash shuffle emits the exact
    |delta| histogram; the median selects by integer cross-
    multiplication — the output is an exact integer in cents."""
    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_type", "ts", "event_id", "value"],
    )
    proj = _project_series(ev, "event_type", "ts", "event_id", "value", 64)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "event_type": pd.Series([], dtype=object),
                "ad": pd.Series([], dtype=np.int64),
                "c": pd.Series([], dtype=np.int64),
            }
        )
        if len(g) == 0:
            return empty
        g, same = _series_segments(g, "event_type", "ts", "event_id")
        x = _round_half_away_x(g["value"].to_numpy(dtype=np.float64), 100.0)
        ad = np.zeros(len(g), dtype=np.int64)
        ad[1:] = np.abs(x[1:] - x[:-1])
        d = pd.DataFrame(
            {"event_type": g["event_type"].to_numpy()[same], "ad": ad[same]}
        )
        if not len(d):
            return empty
        out = d.groupby(["event_type", "ad"], sort=False).size().rename(
            "c"
        ).reset_index()
        return out.astype({"ad": np.int64, "c": np.int64})

    hist = tree_merge(
        proj.groupby(_BUCKET).map_groups(per_bucket, batch_format="pandas"),
        lambda b: _sum_by(b, ["event_type", "ad"], ["c"]),
    ).to_pandas()
    if not len(hist) or "event_type" not in hist.columns:
        return pa.table(
            {
                "event_type": pa.array([], pa.string()),
                "n_diffs": pa.array([], pa.int64()),
                "masd_e2": pa.array([], pa.int64()),
            }
        )
    out = {"event_type": [], "n_diffs": [], "masd_e2": []}
    for et, g in hist.sort_values(["event_type", "ad"]).groupby(
        "event_type", sort=True
    ):
        ads = g["ad"].to_numpy(dtype=np.int64)
        cs = g["c"].to_numpy(dtype=np.int64)
        n = int(cs.sum())
        cum = np.cumsum(cs)
        med = int(ads[int(np.argmax(2 * cum >= n))])
        out["event_type"].append(et)
        out["n_diffs"].append(n)
        out["masd_e2"].append(med)
    return pa.table(
        {
            "event_type": pa.array(out["event_type"], pa.string()),
            "n_diffs": pa.array(out["n_diffs"], pa.int64()),
            "masd_e2": pa.array(out["masd_e2"], pa.int64()),
        }
    )


MASD_SQL = """
WITH v AS (
  SELECT event_type, ts, event_id,
         CAST(ROUND(value * 100, 0) AS BIGINT) AS x
  FROM events
  WHERE event_type IS NOT NULL AND ts IS NOT NULL AND value IS NOT NULL
), d AS (
  SELECT event_type,
         ABS(x - LAG(x) OVER (PARTITION BY event_type
                              ORDER BY ts, event_id)) AS ad
  FROM v
)
SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_diffs,
       CAST(PERCENTILE_DISC(0.5) WITHIN GROUP (ORDER BY ad) AS BIGINT)
         AS masd_e2
FROM d WHERE ad IS NOT NULL GROUP BY 1 ORDER BY 1
"""


# ---------------------------------------------------------------------------
# SPC p-chart: out-of-control purchase-share days
# ---------------------------------------------------------------------------


def q_p_chart_ooc_days(sf_dir):
    """One-row statistical-process-control audit: for each day, the
    purchase share p_d = purchases / events compared against the
    p-chart limits p_bar ± 3 sqrt(p_bar (1 - p_bar) / n_d) (variable
    limits — low-traffic days get wide bands) — out-of-control days
    flag real mix shifts, not volume noise; the SPC discipline behind
    every conversion alert. Day cells fold exact int64; p_bar and the
    limits are mirrored doubles compared against identical per-day
    ratios; counts exact, rate x1e6."""
    ev = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_type", "ts"])

    def partial(b: pa.Table) -> pa.Table:
        b = _clean(b, ("event_type", "ts"))
        us = b["ts"].cast(pa.timestamp("us")).cast(pa.int64()).to_numpy()
        d = (us // _DAY_US).astype(np.int64)
        pur = pc.equal(b["event_type"], "purchase").to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        t = pa.table(
            {
                "d": pa.array(d),
                "n": pa.array(np.ones(len(d), np.int64)),
                "pur": pa.array(pur),
            }
        )
        return _sum_by(t, ["d"], ["n", "pur"])

    cells = tree_merge(
        ev.map_batches(partial, batch_format="pyarrow", batch_size=None),
        lambda b: _sum_by(b, ["d"], ["n", "pur"]),
    ).to_pandas()  # bounded: one row per day
    if not len(cells) or "d" not in cells.columns:
        return pa.table(
            {
                "n_days": pa.array([0], pa.int64()),
                "ooc_days": pa.array([0], pa.int64()),
                "rate_x1e6": pa.array([None], pa.int64()),
            }
        )
    n_tot = int(cells["n"].sum())
    p_tot = int(cells["pur"].sum())
    pbar = float(p_tot) / n_tot
    nd = cells["n"].to_numpy(dtype=np.int64)
    pd_ = cells["pur"].to_numpy(dtype=np.int64).astype(np.float64) / nd
    half = 3.0 * np.sqrt(pbar * (1.0 - pbar) / nd)
    ooc = int(np.sum((pd_ > pbar + half) | (pd_ < pbar - half)))
    k = len(cells)
    return pa.table(
        {
            "n_days": pa.array([k], pa.int64()),
            "ooc_days": pa.array([ooc], pa.int64()),
            "rate_x1e6": pa.array(
                [
                    None
                    if k == 0
                    else int(
                        _round_half_away(np.array([float(ooc) / k * 1e6]))[0]
                    )
                ],
                pa.int64(),
            ),
        }
    )


P_CHART_SQL = """
WITH cell AS MATERIALIZED (
  SELECT CAST(FLOOR(EPOCH_US(ts) / 86400000000) AS BIGINT) AS d,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
              AS BIGINT) AS pur
  FROM events
  WHERE event_type IS NOT NULL AND ts IS NOT NULL
  GROUP BY 1
), t AS MATERIALIZED (
  SELECT CAST(SUM(n) AS BIGINT) AS n_tot, CAST(SUM(pur) AS BIGINT) AS p_tot
  FROM cell
), flags AS (
  SELECT cell.d,
         CASE WHEN CAST(cell.pur AS DOUBLE) / cell.n
                   > CAST(t.p_tot AS DOUBLE) / t.n_tot
                     + 3.0 * SQRT((CAST(t.p_tot AS DOUBLE) / t.n_tot)
                                  * (1.0 - CAST(t.p_tot AS DOUBLE) / t.n_tot)
                                  / cell.n)
                OR CAST(cell.pur AS DOUBLE) / cell.n
                   < CAST(t.p_tot AS DOUBLE) / t.n_tot
                     - 3.0 * SQRT((CAST(t.p_tot AS DOUBLE) / t.n_tot)
                                  * (1.0 - CAST(t.p_tot AS DOUBLE) / t.n_tot)
                                  / cell.n)
              THEN 1 ELSE 0 END AS ooc
  FROM cell, t
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
       CAST(SUM(ooc) AS BIGINT) AS ooc_days,
       CASE WHEN COUNT(*) = 0 THEN NULL
            ELSE CAST(ROUND(CAST(SUM(ooc) AS DOUBLE) / COUNT(*)
                 * 1000000, 0) AS BIGINT) END AS rate_x1e6
FROM flags
"""


def register_r4dr(queries: dict, oracles: dict) -> None:
    queries.update(
        {
            "spearman_footrule_sources": q_spearman_footrule_sources,
            "masd_value": q_masd_value,
            "p_chart_ooc_days": q_p_chart_ooc_days,
        }
    )
    oracles.update(
        {
            "spearman_footrule_sources": FOOTRULE_SQL,
            "masd_value": MASD_SQL,
            "p_chart_ooc_days": P_CHART_SQL,
        }
    )
