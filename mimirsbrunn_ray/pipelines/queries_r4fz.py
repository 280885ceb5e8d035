"""Round-4 batch FZ: effect sizes, functional dependencies, and
power-law MLE — the weekend-vs-weekday purchase-rate effect panel
(risk difference, number-needed-to-treat, and Cohen's h on the
arcsine scale where proportion differences are comparable), a g3
functional-dependency violation audit over candidate column rules
on the customer table (the data-profiling primitive behind schema
inference), and the Clauset-style discrete power-law exponent MLE
of word frequencies per source (alpha = 1 + n / sum ln(x / 0.5),
xmin = 1 — the MLE replacement for eyeballing a log-log slope).

Exactness discipline: all proportions and g3 rates are exact
integer count ratios; Cohen's h folds the identical asin/sqrt
expression; the MLE folds one ln per distinct frequency weighted
by exact counts."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from mimirsbrunn_ray.pipelines.queries_r4dd import (
    _word_counts_per_source,
)
from mimirsbrunn_ray.pipelines.queries_r4fk import _round_half_away
from mimirsbrunn_ray.stages.rollup import tree_merge

_DAY_US = 86_400_000_000


def _valid(b: pa.Table, cols) -> pa.Table:
    m = None
    for c in cols:
        v = pc.is_valid(b[c])
        m = v if m is None else pc.and_(m, v)
    return b.filter(m)


_EFF_COLS = ["n_weekend", "n_weekday", "p_we_ppm", "p_wd_ppm",
             "rd_ppm", "nnt_x1e3", "cohens_h_x1e6"]


def q_proportion_effect_panel_weekend(sf_dir):
    """Effect-size panel for 'weekend events convert to purchases
    at a different rate': the two purchase shares, their risk
    difference, the number-needed-to-treat 1/|RD| (how many events
    until one extra purchase), and Cohen's h = 2 asin sqrt(p1) -
    2 asin sqrt(p2) — the variance-stabilized effect size a bare
    p-value never reports.  Day-of-week uses the epoch convention
    (day 0 = Thursday; weekend = Saturday/Sunday).  One distributed
    count pass."""
    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["ts", "event_type"])

    def part(b: pa.Table) -> pa.Table:
        b = _valid(b, ("ts", "event_type"))
        us = b["ts"].cast(pa.timestamp("us")).cast(pa.int64())
        day = pc.divide(us, _DAY_US)
        dow = pc.subtract(
            pc.add(day, pa.scalar(4, pa.int64())),
            pc.multiply(
                pc.divide(pc.add(day, pa.scalar(4, pa.int64())),
                          pa.scalar(7, pa.int64())),
                pa.scalar(7, pa.int64())))
        is_we = pc.cast(pc.greater_equal(dow, 5), pa.int64())
        t = pa.table({
            "is_we": is_we,
            "n": pa.array(np.ones(b.num_rows, np.int64)),
            "p": pc.cast(pc.equal(b["event_type"], "purchase"),
                         pa.int64()),
        })
        g = t.group_by(["is_we"]).aggregate(
            [("n", "sum"), ("p", "sum")])
        return g.rename_columns(["is_we", "n", "p"])

    def comb(b: pa.Table) -> pa.Table:
        g = b.group_by(["is_we"]).aggregate(
            [("n", "sum"), ("p", "sum")])
        return g.rename_columns(["is_we", "n", "p"])

    cc = tree_merge(
        ev.map_batches(part, batch_format="pyarrow",
                       batch_size=None),
        comb,
    ).to_pandas()
    if "is_we" not in cc.columns or len(cc) == 0:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _EFF_COLS})
    d = {int(r["is_we"]): (int(r["n"]), int(r["p"]))
         for _, r in cc.iterrows()}
    if 1 not in d or 0 not in d or d[1][0] == 0 or d[0][0] == 0:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _EFF_COLS})
    n1, p1c = d[1]
    n0, p0c = d[0]
    p1 = p1c / n1
    p0 = p0c / n0
    rd_ = p1 - p0
    h = 2.0 * np.arcsin(np.sqrt(p1)) - 2.0 * np.arcsin(
        np.sqrt(p0))
    nnt = None if rd_ == 0 else 1.0 / abs(rd_)
    return pa.table({
        "n_weekend": pa.array([n1], pa.int64()),
        "n_weekday": pa.array([n0], pa.int64()),
        "p_we_ppm": pa.array(
            [_round_half_away(p1 * 1e6)], pa.int64()),
        "p_wd_ppm": pa.array(
            [_round_half_away(p0 * 1e6)], pa.int64()),
        "rd_ppm": pa.array(
            [_round_half_away(rd_ * 1e6)], pa.int64()),
        "nnt_x1e3": pa.array(
            [None if nnt is None else _round_half_away(nnt * 1e3)],
            pa.int64()),
        "cohens_h_x1e6": pa.array(
            [_round_half_away(h * 1e6)], pa.int64()),
    })


EFFECT_SQL = f"""
WITH e AS MATERIALIZED (
  SELECT CASE WHEN ((EPOCH_US(ts) // {_DAY_US}) + 4) % 7 >= 5
              THEN 1 ELSE 0 END AS is_we,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS p
  FROM events
  WHERE ts IS NOT NULL AND event_type IS NOT NULL
), agg AS MATERIALIZED (
  SELECT is_we, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(p) AS BIGINT) AS pc
  FROM e GROUP BY 1
), wide AS (
  SELECT
    MAX(CASE WHEN is_we = 1 THEN n END) AS n1,
    MAX(CASE WHEN is_we = 1 THEN pc END) AS p1c,
    MAX(CASE WHEN is_we = 0 THEN n END) AS n0,
    MAX(CASE WHEN is_we = 0 THEN pc END) AS p0c
  FROM agg
)
SELECT CAST(n1 AS BIGINT) AS n_weekend,
       CAST(n0 AS BIGINT) AS n_weekday,
       CAST(ROUND(CAST(p1c AS DOUBLE) / n1 * 1000000, 0)
            AS BIGINT) AS p_we_ppm,
       CAST(ROUND(CAST(p0c AS DOUBLE) / n0 * 1000000, 0)
            AS BIGINT) AS p_wd_ppm,
       CAST(ROUND((CAST(p1c AS DOUBLE) / n1
                   - CAST(p0c AS DOUBLE) / n0) * 1000000, 0)
            AS BIGINT) AS rd_ppm,
       CASE WHEN CAST(p1c AS DOUBLE) / n1
                 - CAST(p0c AS DOUBLE) / n0 = 0 THEN NULL
            ELSE CAST(ROUND(1.0
                   / ABS(CAST(p1c AS DOUBLE) / n1
                         - CAST(p0c AS DOUBLE) / n0) * 1000, 0)
                 AS BIGINT) END AS nnt_x1e3,
       CAST(ROUND((2.0 * ASIN(SQRT(CAST(p1c AS DOUBLE) / n1))
                   - 2.0 * ASIN(SQRT(CAST(p0c AS DOUBLE) / n0)))
            * 1000000, 0) AS BIGINT) AS cohens_h_x1e6
FROM wide
WHERE n1 IS NOT NULL AND n0 IS NOT NULL AND n1 > 0 AND n0 > 0
"""

_FD_RULES = [
    ("nation_to_segment", "c_nationkey", "c_mktsegment"),
    ("balsign_to_segment", "balsign", "c_mktsegment"),
    ("custkey_to_name", "c_custkey", "c_name"),
]

_FD_COLS = ["rule", "n_rows", "n_groups", "n_kept",
            "g3_violation_ppm"]


def q_fd_violation_audit(sf_dir):
    """g3 functional-dependency audit on the customer table for
    three candidate rules — nation determines segment (expected to
    FAIL), the account-balance sign determines segment (a decoy
    whose g3 quantifies HOW wrong), and custkey determines
    name (a key, must hold): g3 = (N - sum_A max_B count) / N, the
    minimum fraction of rows to delete for the FD to hold — the
    schema-inference primitive.  Pure integer counts, one
    distributed pass per rule's contingency."""
    cust = rd.read_parquet(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_name", "c_nationkey", "c_acctbal",
                 "c_mktsegment"])

    def part(b: pa.Table) -> pa.Table:
        b = _valid(b, ("c_custkey", "c_name", "c_nationkey",
                       "c_acctbal", "c_mktsegment"))
        balsign = pc.cast(
            pc.sign(b["c_acctbal"].cast(pa.float64())),
            pa.int64()).cast(pa.string())
        rows = []
        for rule, lhs, rhs in _FD_RULES:
            cols = {
                "c_custkey": b["c_custkey"].cast(pa.string()),
                "c_name": b["c_name"],
                "c_nationkey": b["c_nationkey"].cast(pa.string()),
                "balsign": balsign,
                "c_mktsegment": b["c_mktsegment"],
            }
            t = pa.table({
                "rule": pa.array([rule] * b.num_rows, pa.string()),
                "lhs": cols[lhs],
                "rhs": cols[rhs],
            })
            g = t.group_by(["rule", "lhs", "rhs"]).aggregate(
                [([], "count_all")])
            rows.append(g.rename_columns(
                ["rule", "lhs", "rhs", "n"]))
        return pa.concat_tables(rows)

    def comb(b: pa.Table) -> pa.Table:
        g = b.group_by(["rule", "lhs", "rhs"]).aggregate(
            [("n", "sum")])
        return g.rename_columns(["rule", "lhs", "rhs", "n"])

    cc = tree_merge(
        cust.map_batches(part, batch_format="pyarrow",
                         batch_size=None),
        comb,
    ).to_pandas()
    if "rule" not in cc.columns or len(cc) == 0:
        return pa.table({
            "rule": pa.array([], pa.string()),
            **{c: pa.array([], pa.int64()) for c in _FD_COLS[1:]},
        })
    out = {c: [] for c in _FD_COLS}
    for rule, g in cc.groupby("rule", sort=True):
        n_rows = int(g["n"].sum())
        kept = int(g.groupby("lhs")["n"].max().sum())
        n_groups = g["lhs"].nunique()
        if n_rows == 0:
            continue
        out["rule"].append(rule)
        out["n_rows"].append(n_rows)
        out["n_groups"].append(n_groups)
        out["n_kept"].append(kept)
        out["g3_violation_ppm"].append(
            _round_half_away((n_rows - kept) / n_rows * 1e6))
    return pa.table({
        "rule": pa.array(out["rule"], pa.string()),
        **{c: pa.array(out[c], pa.int64()) for c in _FD_COLS[1:]},
    })


FD_SQL = """
WITH base AS MATERIALIZED (
  SELECT CAST(c_custkey AS VARCHAR) AS ck, c_name,
         CAST(c_nationkey AS VARCHAR) AS nk,
         CAST(CAST(SIGN(c_acctbal) AS BIGINT) AS VARCHAR)
           AS balsign, c_mktsegment
  FROM customer
  WHERE c_custkey IS NOT NULL AND c_name IS NOT NULL
    AND c_nationkey IS NOT NULL AND c_acctbal IS NOT NULL
    AND c_mktsegment IS NOT NULL
), pairs AS MATERIALIZED (
  SELECT 'nation_to_segment' AS rule, nk AS lhs,
         c_mktsegment AS rhs FROM base
  UNION ALL
  SELECT 'balsign_to_segment', balsign, c_mktsegment FROM base
  UNION ALL
  SELECT 'custkey_to_name', ck, c_name FROM base
), cnt AS MATERIALIZED (
  SELECT rule, lhs, rhs, CAST(COUNT(*) AS BIGINT) AS n
  FROM pairs GROUP BY 1, 2, 3
), keep AS MATERIALIZED (
  SELECT rule, lhs, CAST(MAX(n) AS BIGINT) AS kept,
         CAST(SUM(n) AS BIGINT) AS total
  FROM cnt GROUP BY 1, 2
)
SELECT rule,
       CAST(SUM(total) AS BIGINT) AS n_rows,
       CAST(COUNT(*) AS BIGINT) AS n_groups,
       CAST(SUM(kept) AS BIGINT) AS n_kept,
       CAST(ROUND(CAST(SUM(total) - SUM(kept) AS DOUBLE)
            / SUM(total) * 1000000, 0) AS BIGINT)
         AS g3_violation_ppm
FROM keep GROUP BY rule
HAVING SUM(total) > 0
ORDER BY rule
"""

_PL_COLS = ["source", "n_tokens", "vocab", "alpha_x1e6"]


def q_powerlaw_alpha_words(sf_dir):
    """Discrete power-law exponent MLE of word frequencies per
    source (Clauset-Shalizi-Newman with xmin = 1): alpha = 1 +
    V / sum_w ln(c_w / 0.5) over the V distinct words — the
    maximum-likelihood replacement for regression on a log-log
    rank plot (which is biased in the tail).  Word counts fold as
    exact int64; one ln per distinct frequency."""
    wsc = _word_counts_per_source(sf_dir)
    if not len(wsc) or "source" not in wsc.columns:
        return pa.table({
            "source": pa.array([], pa.string()),
            **{c: pa.array([], pa.int64()) for c in _PL_COLS[1:]},
        })
    out = {c: [] for c in _PL_COLS}
    for src, g in wsc.groupby("source", sort=True):
        c = g["c"].to_numpy(np.int64).astype(np.float64)
        v = len(c)
        n = int(c.sum())
        s = float(np.log(c / 0.5).sum())
        if v < 2 or s == 0:
            continue
        alpha = 1.0 + v / s
        out["source"].append(src)
        out["n_tokens"].append(n)
        out["vocab"].append(v)
        out["alpha_x1e6"].append(_round_half_away(alpha * 1e6))
    return pa.table({
        "source": pa.array(out["source"], pa.string()),
        **{c: pa.array(out[c], pa.int64()) for c in _PL_COLS[1:]},
    })


POWERLAW_SQL = """
WITH w AS (
  SELECT source, unnest(string_split(text, ' ')) AS w
  FROM documents
  WHERE source IS NOT NULL AND text IS NOT NULL
), c AS MATERIALIZED (
  SELECT source, w, CAST(COUNT(*) AS BIGINT) AS c
  FROM w GROUP BY 1, 2
), a AS (
  SELECT source,
         CAST(SUM(c) AS BIGINT) AS n,
         CAST(COUNT(*) AS BIGINT) AS v,
         SUM(LN(CAST(c AS DOUBLE) / 0.5)) AS s
  FROM c GROUP BY 1
)
SELECT source,
       n AS n_tokens,
       v AS vocab,
       CAST(ROUND((1.0 + v / s) * 1000000, 0) AS BIGINT)
         AS alpha_x1e6
FROM a WHERE v >= 2 AND s <> 0
ORDER BY source
"""


def register_r4fz(queries: dict, oracles: dict) -> None:
    queries.update(
        {
            "proportion_effect_panel_weekend":
                q_proportion_effect_panel_weekend,
            "fd_violation_audit": q_fd_violation_audit,
            "powerlaw_alpha_words": q_powerlaw_alpha_words,
        }
    )
    oracles.update(
        {
            "proportion_effect_panel_weekend": EFFECT_SQL,
            "fd_violation_audit": FD_SQL,
            "powerlaw_alpha_words": POWERLAW_SQL,
        }
    )
