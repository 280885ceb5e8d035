"""Round-4 batch CF: timestamp-boundary audit, Heaps'-law vocabulary
growth slope, and day-of-week seasonality strength.

Exactness discipline: the boundary audit is pure integer modulo counts;
Heaps' law snaps per-doc LN(word count) / LN(distinct count) to x1e4
fixed point (identical exact-int inputs both engines) before exact
int64 sufficient statistics and the mirrored slope; seasonality
strength converts each per-dow variance term to x1e3 fixed point BEFORE
summing (the per-term fixed-point discipline of the entropy queries),
so no float accumulation order can differ.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from mimirsbrunn_ray.stages.rollup import tree_merge

_SEC_US = 1_000_000
_MIN_US = 60_000_000


def _round_half_away(x: np.ndarray) -> np.ndarray:
    return np.where(x >= 0, np.floor(x + 0.5), np.ceil(x - 0.5)).astype(
        np.int64
    )


def _clean(b: pa.Table, cols: tuple[str, ...]) -> pa.Table:
    m = None
    for c in cols:
        v = pc.is_valid(b[c])
        m = v if m is None else pc.and_(m, v)
    return b.filter(m)


# ---------------------------------------------------------------------------
# timestamp boundary audit
# ---------------------------------------------------------------------------


def q_ts_boundary_audit(sf_dir):
    """Per event type: how many timestamps land EXACTLY on a second /
    minute boundary — the bot-traffic and synthetic-data fingerprint
    (human-generated event times almost never align to whole minutes;
    schedulers and backfills do). Pure integer epoch-microsecond modulo
    in one combiner-first pass."""
    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "ts"]
    )

    def partial(b: pa.Table) -> pa.Table:
        b = _clean(b, ("event_type", "ts"))
        us = (
            b["ts"].cast(pa.timestamp("us")).cast(pa.int64()).to_numpy(
                zero_copy_only=False
            )
        )
        t = pa.table(
            {
                "event_type": b["event_type"],
                "n": pa.array(np.ones(len(us), dtype=np.int64)),
                "on_second": pa.array(
                    (us % _SEC_US == 0).astype(np.int64)
                ),
                "on_minute": pa.array(
                    (us % _MIN_US == 0).astype(np.int64)
                ),
            }
        )
        g = t.group_by(["event_type"]).aggregate(
            [("n", "sum"), ("on_second", "sum"), ("on_minute", "sum")]
        )
        g = g.select(
            ["event_type", "n_sum", "on_second_sum", "on_minute_sum"]
        )
        return g.rename_columns(
            ["event_type", "n", "on_second", "on_minute"]
        )

    def combine(b: pa.Table) -> pa.Table:
        g = b.group_by(["event_type"]).aggregate(
            [("n", "sum"), ("on_second", "sum"), ("on_minute", "sum")]
        )
        g = g.select(
            ["event_type", "n_sum", "on_second_sum", "on_minute_sum"]
        )
        return g.rename_columns(
            ["event_type", "n", "on_second", "on_minute"]
        )

    return tree_merge(
        ev.map_batches(partial, batch_format="pyarrow", batch_size=None),
        combine,
    )


TS_BOUNDARY_SQL = """
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CASE WHEN epoch_us(ts) % 1000000 = 0 THEN 1 ELSE 0 END)
            AS BIGINT) AS on_second,
       CAST(SUM(CASE WHEN epoch_us(ts) % 60000000 = 0 THEN 1 ELSE 0 END)
            AS BIGINT) AS on_minute
FROM events
WHERE event_type IS NOT NULL AND ts IS NOT NULL
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# Heaps'-law vocabulary growth slope per source
# ---------------------------------------------------------------------------


def q_heaps_law_per_source(sf_dir):
    """Heaps'-law exponent estimate per source: the least-squares slope
    of ln(distinct words) on ln(total words) across documents — how
    fast vocabulary grows with document length (beta near 1 = no
    reuse; low beta = repetitive source). Per-doc counts are exact
    ints, LNs snap to x1e4 from those identical ints, and the slope
    folds exact int64 sufficient statistics through the mirrored
    num/den double."""
    docs = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["source", "text"]
    )

    def partial(b: pa.Table) -> pa.Table:
        b = _clean(b, ("source", "text"))
        words = pc.split_pattern(b["text"], pattern=" ")
        lens = pc.list_value_length(words).to_numpy(zero_copy_only=False)
        flat = pc.list_flatten(words).to_numpy(zero_copy_only=False)
        doc_idx = np.repeat(np.arange(len(lens)), lens)
        t = pd.DataFrame({"d": doc_idx, "w": flat})
        per = t.groupby("d", sort=True).agg(
            nw=("w", "size"), nd=("w", "nunique")
        )
        nw = np.zeros(len(lens), dtype=np.int64)
        nd = np.zeros(len(lens), dtype=np.int64)
        nw[per.index.to_numpy()] = per["nw"].to_numpy()
        nd[per.index.to_numpy()] = per["nd"].to_numpy()
        ok = (nw > 0) & (nd > 0)
        src = b["source"].to_numpy(zero_copy_only=False)[ok]
        x = _round_half_away(np.log(nw[ok].astype(np.float64)) * 1e4)
        y = _round_half_away(np.log(nd[ok].astype(np.float64)) * 1e4)
        t2 = pa.table(
            {
                "source": pa.array(src, pa.string()),
                "n": pa.array(np.ones(len(x), dtype=np.int64)),
                "sx": pa.array(x),
                "sy": pa.array(y),
                "sxx": pa.array(x * x),
                "sxy": pa.array(x * y),
            }
        )
        g = t2.group_by(["source"]).aggregate(
            [("n", "sum"), ("sx", "sum"), ("sy", "sum"),
             ("sxx", "sum"), ("sxy", "sum")]
        )
        g = g.select(
            ["source", "n_sum", "sx_sum", "sy_sum", "sxx_sum", "sxy_sum"]
        )
        return g.rename_columns(["source", "n", "sx", "sy", "sxx", "sxy"])

    def combine(b: pa.Table) -> pa.Table:
        g = b.group_by(["source"]).aggregate(
            [("n", "sum"), ("sx", "sum"), ("sy", "sum"),
             ("sxx", "sum"), ("sxy", "sum")]
        )
        g = g.select(
            ["source", "n_sum", "sx_sum", "sy_sum", "sxx_sum", "sxy_sum"]
        )
        return g.rename_columns(["source", "n", "sx", "sy", "sxx", "sxy"])

    m = tree_merge(
        docs.map_batches(partial, batch_format="pyarrow", batch_size=None),
        combine,
    ).to_pandas()  # bounded: one row per source

    if not len(m) or "source" not in m.columns:
        return pa.table(
            {
                "source": pa.array([], pa.string()),
                "n_docs": pa.array([], pa.int64()),
                "beta_x1e6": pa.array([], pa.int64()),
            }
        )
    m = m.sort_values("source", ignore_index=True)
    n = m["n"].to_numpy(dtype=np.int64)
    sx = m["sx"].to_numpy(dtype=np.int64)
    sy = m["sy"].to_numpy(dtype=np.int64)
    sxx = m["sxx"].to_numpy(dtype=np.int64)
    sxy = m["sxy"].to_numpy(dtype=np.int64)
    num = (n * sxy - sx * sy).astype(np.float64)
    den = (n * sxx - sx * sx).astype(np.float64)
    ok = den > 0
    beta = np.where(
        ok,
        _round_half_away(np.where(ok, num / np.where(ok, den, 1), 0.0) * 1e6),
        0,
    )
    vals = np.where(ok, beta, None)
    return pa.table(
        {
            "source": pa.array(m["source"], pa.string()),
            "n_docs": pa.array(n),
            "beta_x1e6": pa.array(vals.tolist(), pa.int64()),
        }
    )


HEAPS_SQL = """
WITH w AS (
  SELECT source, doc_id, unnest(string_split(text, ' ')) AS word
  FROM documents
  WHERE source IS NOT NULL AND text IS NOT NULL AND doc_id IS NOT NULL
), per AS (
  SELECT source, doc_id,
         CAST(COUNT(*) AS BIGINT) AS nw,
         CAST(COUNT(DISTINCT word) AS BIGINT) AS nd
  FROM w GROUP BY 1, 2
), v AS (
  SELECT source,
         CAST(ROUND(LN(nw) * 10000, 0) AS BIGINT) AS x,
         CAST(ROUND(LN(nd) * 10000, 0) AS BIGINT) AS y
  FROM per WHERE nw > 0 AND nd > 0
), s AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
         CAST(SUM(x * x) AS BIGINT) AS sxx,
         CAST(SUM(x * y) AS BIGINT) AS sxy
  FROM v GROUP BY 1
)
SELECT source, n AS n_docs,
       CASE WHEN n * sxx - sx * sx > 0
            THEN CAST(ROUND(
              CAST(n * sxy - sx * sy AS DOUBLE)
              / CAST(n * sxx - sx * sx AS DOUBLE) * 1000000, 0) AS BIGINT)
            ELSE NULL END AS beta_x1e6
FROM s ORDER BY source
"""


# ---------------------------------------------------------------------------
# day-of-week seasonality strength per type
# ---------------------------------------------------------------------------


def q_dow_seasonality_strength(sf_dir):
    """Per event type: the share of value variance explained by
    day-of-week (between-group sum of squares over total) — the
    seasonality-strength statistic a forecaster checks before adding a
    weekly component. Per-(type, dow) exact int sums; each dow's
    variance term s_d^2/n_d snaps to x1e3 fixed point BEFORE the
    7-term sum (per-term fixed-point, so no float sum-order skew),
    and the final ratio is one mirrored double expression. Weekday is
    integer epoch arithmetic matching DuckDB's dayofweek."""
    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "ts", "value"]
    )
    _DAY_US = 86_400_000_000

    def partial(b: pa.Table) -> pa.Table:
        b = _clean(b, ("event_type", "ts", "value"))
        us = (
            b["ts"].cast(pa.timestamp("us")).cast(pa.int64()).to_numpy(
                zero_copy_only=False
            )
        )
        dow = ((us // _DAY_US) + 4) % 7  # Sunday = 0, DuckDB dayofweek
        x = _round_half_away(
            b["value"].to_numpy(zero_copy_only=False).astype(np.float64)
            * 100.0
        )
        t = pa.table(
            {
                "event_type": b["event_type"],
                "dow": pa.array(dow.astype(np.int64)),
                "n": pa.array(np.ones(len(x), dtype=np.int64)),
                "s": pa.array(x),
                "s2": pa.array(x * x),
            }
        )
        g = t.group_by(["event_type", "dow"]).aggregate(
            [("n", "sum"), ("s", "sum"), ("s2", "sum")]
        )
        g = g.select(["event_type", "dow", "n_sum", "s_sum", "s2_sum"])
        return g.rename_columns(["event_type", "dow", "n", "s", "s2"])

    def combine(b: pa.Table) -> pa.Table:
        g = b.group_by(["event_type", "dow"]).aggregate(
            [("n", "sum"), ("s", "sum"), ("s2", "sum")]
        )
        g = g.select(["event_type", "dow", "n_sum", "s_sum", "s2_sum"])
        return g.rename_columns(["event_type", "dow", "n", "s", "s2"])

    tier = tree_merge(
        ev.map_batches(partial, batch_format="pyarrow", batch_size=None),
        combine,
    ).to_pandas()  # bounded: types x 7

    if not len(tier) or "event_type" not in tier.columns:
        return pa.table(
            {
                "event_type": pa.array([], pa.string()),
                "n": pa.array([], pa.int64()),
                "strength_x1e6": pa.array([], pa.int64()),
            }
        )
    rows = {"event_type": [], "n": [], "strength_x1e6": []}
    for et, g in tier.sort_values(["event_type", "dow"]).groupby(
        "event_type", sort=True
    ):
        nd = g["n"].to_numpy(dtype=np.int64)
        sd = g["s"].to_numpy(dtype=np.int64)
        n = int(nd.sum())
        s = int(sd.sum())
        s2 = int(g["s2"].to_numpy(dtype=np.int64).sum())
        # per-dow term to x1e3 fixed point, THEN integer sum
        terms = _round_half_away(
            sd.astype(np.float64) * sd / nd * 1e3
        )
        between_num = int(terms.sum())
        grand = int(
            _round_half_away(
                np.array([float(s) * s / n * 1e3])
            )[0]
        )
        ss_between = between_num - grand  # x1e3 grain
        ss_total = s2 * 1000 - grand  # x1e3 grain
        if ss_total <= 0:
            strength = None
        else:
            strength = int(
                _round_half_away(
                    np.array([ss_between / ss_total * 1e6])
                )[0]
            )
        rows["event_type"].append(et)
        rows["n"].append(n)
        rows["strength_x1e6"].append(strength)
    return pa.table(
        {
            "event_type": pa.array(rows["event_type"], pa.string()),
            "n": pa.array(rows["n"], pa.int64()),
            "strength_x1e6": pa.array(rows["strength_x1e6"], pa.int64()),
        }
    )


DOW_STRENGTH_SQL = """
WITH v AS (
  SELECT event_type, dayofweek(ts) AS dow,
         CAST(ROUND(value * 100, 0) AS BIGINT) AS x
  FROM events
  WHERE event_type IS NOT NULL AND ts IS NOT NULL AND value IS NOT NULL
), d AS (
  SELECT event_type, dow,
         CAST(COUNT(*) AS BIGINT) AS nd,
         CAST(SUM(x) AS BIGINT) AS sd,
         CAST(SUM(x * x) AS BIGINT) AS s2d
  FROM v GROUP BY 1, 2
), t AS (
  SELECT event_type,
         CAST(SUM(nd) AS BIGINT) AS n,
         CAST(SUM(sd) AS BIGINT) AS s,
         CAST(SUM(s2d) AS BIGINT) AS s2,
         CAST(SUM(CAST(ROUND(CAST(sd AS DOUBLE) * sd / nd * 1000, 0)
                       AS BIGINT)) AS BIGINT) AS between_num
  FROM d GROUP BY 1
), f AS (
  SELECT event_type, n,
         between_num
           - CAST(ROUND(CAST(s AS DOUBLE) * s / n * 1000, 0) AS BIGINT)
           AS ss_between,
         s2 * 1000
           - CAST(ROUND(CAST(s AS DOUBLE) * s / n * 1000, 0) AS BIGINT)
           AS ss_total
  FROM t
)
SELECT event_type, n,
       CASE WHEN ss_total > 0
            THEN CAST(ROUND(CAST(ss_between AS DOUBLE) / ss_total
                            * 1000000, 0) AS BIGINT)
            ELSE NULL END AS strength_x1e6
FROM f
"""


def register_r4cf(queries: dict, oracles: dict) -> None:
    queries.update(
        {
            "ts_boundary_audit": q_ts_boundary_audit,
            "heaps_law_per_source": q_heaps_law_per_source,
            "dow_seasonality_strength": q_dow_seasonality_strength,
        }
    )
    oracles.update(
        {
            "ts_boundary_audit": TS_BOUNDARY_SQL,
            "heaps_law_per_source": HEAPS_SQL,
            "dow_seasonality_strength": DOW_STRENGTH_SQL,
        }
    )
