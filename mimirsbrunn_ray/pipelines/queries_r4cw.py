"""Round-4 batch CW: Kish design effect / effective sample size for
length-weighted documents, Chapman capture-recapture population
estimate from two time halves, and the Youden-J optimal value
threshold for separating purchases from errors.

Exactness discipline: weight sums, per-user capture flags (complete
inside their hash bucket), and dollar-grain class contingencies fold
exact int64; argmax selection happens on the SNAPPED x1e6 J statistic
with an integer cut tie-break; final ratios are mirrored doubles, x1e6
snap.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from mimirsbrunn_ray.stages.dedup import _BUCKET, add_bucket
from mimirsbrunn_ray.stages.rollup import tree_merge


def _round_half_away(x: np.ndarray) -> np.ndarray:
    return np.where(x >= 0, np.floor(x + 0.5), np.ceil(x - 0.5)).astype(
        np.int64
    )


def _round_half_away_x(x: np.ndarray, scale: float) -> np.ndarray:
    y = x * scale
    return np.where(y >= 0, np.floor(y + 0.5), np.ceil(y - 0.5)).astype(
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
# Kish design effect of length-weighted document sampling
# ---------------------------------------------------------------------------


def q_kish_neff_doc_weights(sf_dir):
    """Per source: Kish's design effect deff = n * sum(w²) / (sum w)²
    and the effective sample size n_eff = n / deff when documents are
    sampled proportionally to their length (w = n_chars) — the survey
    statistic that says how many EQUAL-WEIGHT documents a
    length-weighted sample is really worth (deff near 1 = homogeneous
    lengths, large deff = a few giants dominate). Weight sums fold
    exact int64 (n_chars <= corpus cap so squares are safe); deff and
    n_eff are mirrored doubles, x1e6 snap."""
    docs = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["source", "n_chars"]
    )

    def partial(b: pa.Table) -> pa.Table:
        b = _clean(b, ("source", "n_chars"))
        w = b["n_chars"].cast(pa.int64()).to_numpy()
        t = pa.table(
            {
                "source": b["source"],
                "n": pa.array(np.ones(len(w), np.int64)),
                "sw": pa.array(w),
                "sw2": pa.array(w * w),
            }
        )
        return _sum_by(t, ["source"], ["n", "sw", "sw2"])

    agg = tree_merge(
        docs.map_batches(partial, batch_format="pyarrow", batch_size=None),
        lambda b: _sum_by(b, ["source"], ["n", "sw", "sw2"]),
    ).to_pandas()

    if not len(agg) or "source" not in agg.columns:
        return pa.table(
            {
                "source": pa.array([], pa.string()),
                "n": pa.array([], pa.int64()),
                "deff_x1e6": pa.array([], pa.int64()),
                "neff_x1e6": pa.array([], pa.int64()),
            }
        )
    agg = agg.sort_values("source", ignore_index=True)
    n = agg["n"].to_numpy(dtype=np.int64)
    sw = agg["sw"].to_numpy(dtype=np.int64)
    sw2 = agg["sw2"].to_numpy(dtype=np.int64)
    deffs, neffs = [], []
    for i in range(len(agg)):
        if sw[i] == 0:
            deffs.append(None)
            neffs.append(None)
            continue
        deff = float(n[i]) * sw2[i] / (float(sw[i]) * sw[i])
        deffs.append(int(_round_half_away(np.array([deff * 1e6]))[0]))
        neffs.append(
            int(_round_half_away(np.array([float(n[i]) / deff * 1e6]))[0])
        )
    return pa.table(
        {
            "source": pa.array(agg["source"].tolist(), pa.string()),
            "n": pa.array(n),
            "deff_x1e6": pa.array(deffs, pa.int64()),
            "neff_x1e6": pa.array(neffs, pa.int64()),
        }
    )


KISH_SQL = """
WITH a AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(n_chars) AS BIGINT) AS sw,
         CAST(SUM(n_chars * n_chars) AS BIGINT) AS sw2
  FROM documents
  WHERE source IS NOT NULL AND n_chars IS NOT NULL
  GROUP BY 1
)
SELECT source, n,
       CASE WHEN sw = 0 THEN NULL
            ELSE CAST(ROUND(CAST(n AS DOUBLE) * sw2
                            / (CAST(sw AS DOUBLE) * sw)
                 * 1000000, 0) AS BIGINT) END AS deff_x1e6,
       CASE WHEN sw = 0 THEN NULL
            ELSE CAST(ROUND(CAST(n AS DOUBLE)
                   / (CAST(n AS DOUBLE) * sw2 / (CAST(sw AS DOUBLE) * sw))
                 * 1000000, 0) AS BIGINT) END AS neff_x1e6
FROM a ORDER BY 1
"""


# ---------------------------------------------------------------------------
# Chapman capture-recapture population estimate from two time halves
# ---------------------------------------------------------------------------


def q_chapman_population_users(sf_dir):
    """One-row capture-recapture estimate: split the event span at its
    integer midpoint, treat the user sets of each half as two capture
    occasions, and apply the Chapman estimator N_hat = (n1 + 1)(n2 + 1)
    / (m + 1) - 1 (m = users seen in BOTH halves) — the coverage
    estimator for "how many users exist that we have never logged".
    The global span folds in one cheap min/max pass; per-user half
    flags are complete inside their hash bucket; all counts exact
    int64; N_hat is one mirrored double, x1e6 snap."""
    ev = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id", "ts"])

    def span_partial(b: pa.Table) -> pa.Table:
        b = _clean(b, ("user_id", "ts"))
        us = b["ts"].cast(pa.timestamp("us")).cast(pa.int64()).to_numpy()
        if len(us) == 0:
            return pa.table(
                {
                    "k": pa.array([], pa.int64()),
                    "lo": pa.array([], pa.int64()),
                    "hi": pa.array([], pa.int64()),
                }
            )
        return pa.table(
            {
                "k": pa.array([0], pa.int64()),
                "lo": pa.array([int(us.min())], pa.int64()),
                "hi": pa.array([int(us.max())], pa.int64()),
            }
        )

    def span_combine(b: pa.Table) -> pa.Table:
        g = b.group_by(["k"]).aggregate([("lo", "min"), ("hi", "max")])
        return g.select(["k", "lo_min", "hi_max"]).rename_columns(
            ["k", "lo", "hi"]
        )

    span = tree_merge(
        ev.map_batches(span_partial, batch_format="pyarrow", batch_size=None),
        span_combine,
    ).to_pandas()
    if not len(span):
        return pa.table(
            {
                "n1": pa.array([0], pa.int64()),
                "n2": pa.array([0], pa.int64()),
                "m": pa.array([0], pa.int64()),
                "nhat_x1e6": pa.array([None], pa.int64()),
            }
        )
    lo = int(span["lo"].iloc[0])
    hi = int(span["hi"].iloc[0])
    mid = lo + (hi - lo) // 2  # exact integer midpoint, mirrored in SQL

    def prep(b: pa.Table) -> pa.Table:
        b = _clean(b, ("user_id", "ts"))
        us = b["ts"].cast(pa.timestamp("us")).cast(pa.int64()).to_numpy()
        h1 = (us <= mid).astype(np.int64)
        t = pa.table(
            {
                "user_id": b["user_id"].cast(pa.int64()),
                "in1": pa.array(h1),
                "in2": pa.array(1 - h1),
            }
        )
        return add_bucket(
            _sum_by(t, ["user_id"], ["in1", "in2"]), "user_id", 64
        )

    bucketed = ev.map_batches(prep, batch_format="pyarrow", batch_size=None)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "n1": pd.Series([], dtype=np.int64),
                "n2": pd.Series([], dtype=np.int64),
                "m": pd.Series([], dtype=np.int64),
            }
        )
        if len(g) == 0:
            return empty
        per = g.groupby("user_id", sort=False)[["in1", "in2"]].sum()
        a = (per["in1"] > 0).to_numpy()
        b_ = (per["in2"] > 0).to_numpy()
        return pd.DataFrame(
            {
                "n1": [int(a.sum())],
                "n2": [int(b_.sum())],
                "m": [int((a & b_).sum())],
            }
        )

    parts = bucketed.groupby(_BUCKET).map_groups(
        per_bucket, batch_format="pandas"
    ).to_pandas()
    if not len(parts) or "n1" not in parts.columns:
        n1 = n2 = m = 0
    else:
        n1 = int(parts["n1"].sum())
        n2 = int(parts["n2"].sum())
        m = int(parts["m"].sum())
    nhat = (
        float(n1 + 1) * (n2 + 1) / (m + 1) - 1.0
    )
    return pa.table(
        {
            "n1": pa.array([n1], pa.int64()),
            "n2": pa.array([n2], pa.int64()),
            "m": pa.array([m], pa.int64()),
            "nhat_x1e6": pa.array(
                [int(_round_half_away(np.array([nhat * 1e6]))[0])], pa.int64()
            ),
        }
    )


CHAPMAN_SQL = """
WITH span AS MATERIALIZED (
  SELECT EPOCH_US(MIN(ts)) AS lo,
         EPOCH_US(MIN(ts))
           + (EPOCH_US(MAX(ts)) - EPOCH_US(MIN(ts))) // 2 AS mid
  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
), per AS MATERIALIZED (
  SELECT user_id,
         MAX(CASE WHEN EPOCH_US(ts) <= span.mid THEN 1 ELSE 0 END) AS a,
         MAX(CASE WHEN EPOCH_US(ts) > span.mid THEN 1 ELSE 0 END) AS b
  FROM events, span
  WHERE user_id IS NOT NULL AND ts IS NOT NULL
  GROUP BY 1
), c AS (
  SELECT CAST(SUM(a) AS BIGINT) AS n1, CAST(SUM(b) AS BIGINT) AS n2,
         CAST(SUM(a * b) AS BIGINT) AS m
  FROM per
)
SELECT n1, n2, m,
       CAST(ROUND((CAST(n1 + 1 AS DOUBLE) * (n2 + 1) / (m + 1) - 1.0)
            * 1000000, 0) AS BIGINT) AS nhat_x1e6
FROM c
"""


# ---------------------------------------------------------------------------
# Youden-J optimal value threshold separating purchases from errors
# ---------------------------------------------------------------------------


def q_youden_j_value_cut(sf_dir):
    """One-row ROC statistic: the dollar-grain value cut maximizing
    Youden's J = TPR - FPR for the rule "value > cut predicts
    purchase" against the error class — the threshold-picking step of
    every scalar-feature classifier audit. The (value, class)
    contingency folds exact int64 (bounded: dollar grain x 2); each
    cut's TPR/FPR are exact-count ratios; the winner is chosen on the
    SNAPPED x1e6 J with a min-cut integer tie-break. Output carries the
    class sizes for the downstream significance check."""
    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "value"]
    )

    def partial(b: pa.Table) -> pa.Table:
        b = _clean(b, ("event_type", "value"))
        m = pc.is_in(
            b["event_type"], value_set=pa.array(["purchase", "error"])
        )
        b = b.filter(m)
        x = _round_half_away_x(
            b["value"].to_numpy(zero_copy_only=False).astype(np.float64), 1.0
        )
        pos = pc.equal(b["event_type"], "purchase").to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        t = pa.table(
            {
                "x": pa.array(x),
                "pos": pa.array(pos),
                "neg": pa.array(1 - pos),
            }
        )
        return _sum_by(t, ["x"], ["pos", "neg"])

    cells = tree_merge(
        ev.map_batches(partial, batch_format="pyarrow", batch_size=None),
        lambda b: _sum_by(b, ["x"], ["pos", "neg"]),
    ).to_pandas()  # bounded: dollar-grain values x 2 classes

    if not len(cells) or "x" not in cells.columns:
        return pa.table(
            {
                "n_pos": pa.array([0], pa.int64()),
                "n_neg": pa.array([0], pa.int64()),
                "cut": pa.array([None], pa.int64()),
                "j_x1e6": pa.array([None], pa.int64()),
            }
        )
    cells = cells.sort_values("x", ignore_index=True)
    pos = cells["pos"].to_numpy(dtype=np.int64)
    neg = cells["neg"].to_numpy(dtype=np.int64)
    xs = cells["x"].to_numpy(dtype=np.int64)
    np_tot, nn_tot = int(pos.sum()), int(neg.sum())
    if np_tot == 0 or nn_tot == 0 or len(xs) < 2:
        return pa.table(
            {
                "n_pos": pa.array([np_tot], pa.int64()),
                "n_neg": pa.array([nn_tot], pa.int64()),
                "cut": pa.array([None], pa.int64()),
                "j_x1e6": pa.array([None], pa.int64()),
            }
        )
    cpos = np.cumsum(pos)[:-1]  # positives at or below each candidate cut
    cneg = np.cumsum(neg)[:-1]
    tpr = (np_tot - cpos).astype(np.float64) / np_tot  # value > cut
    fpr = (nn_tot - cneg).astype(np.float64) / nn_tot
    j = tpr - fpr
    snapped = _round_half_away(j * 1e6)
    best = int(snapped.max())
    cut = int(xs[:-1][snapped == best].min())
    return pa.table(
        {
            "n_pos": pa.array([np_tot], pa.int64()),
            "n_neg": pa.array([nn_tot], pa.int64()),
            "cut": pa.array([cut], pa.int64()),
            "j_x1e6": pa.array([best], pa.int64()),
        }
    )


YOUDEN_SQL = """
WITH v AS (
  SELECT CAST(ROUND(value, 0) AS BIGINT) AS x,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS pos
  FROM events
  WHERE event_type IN ('purchase', 'error')
    AND value IS NOT NULL
), cell AS MATERIALIZED (
  SELECT x, CAST(SUM(pos) AS BIGINT) AS pos,
         CAST(SUM(1 - pos) AS BIGINT) AS neg
  FROM v GROUP BY 1
), tot AS MATERIALIZED (
  SELECT CAST(SUM(pos) AS BIGINT) AS np, CAST(SUM(neg) AS BIGINT) AS nn
  FROM cell
), cum AS (
  SELECT x,
         SUM(pos) OVER (ORDER BY x ROWS UNBOUNDED PRECEDING) AS cpos,
         SUM(neg) OVER (ORDER BY x ROWS UNBOUNDED PRECEDING) AS cneg
  FROM cell
), j AS MATERIALIZED (
  SELECT cum.x AS cut,
         CAST(ROUND((CAST(tot.np - cum.cpos AS DOUBLE) / tot.np
                     - CAST(tot.nn - cum.cneg AS DOUBLE) / tot.nn)
              * 1000000, 0) AS BIGINT) AS j_x1e6
  FROM cum, tot
  WHERE cum.x < (SELECT MAX(x) FROM cell)
)
SELECT tot.np AS n_pos, tot.nn AS n_neg,
       CASE WHEN tot.np = 0 OR tot.nn = 0 THEN NULL
            ELSE (SELECT MIN(cut) FROM j
                  WHERE j_x1e6 = (SELECT MAX(j_x1e6) FROM j)) END AS cut,
       CASE WHEN tot.np = 0 OR tot.nn = 0 THEN NULL
            ELSE (SELECT MAX(j_x1e6) FROM j) END AS j_x1e6
FROM tot
"""


def register_r4cw(queries: dict, oracles: dict) -> None:
    queries.update(
        {
            "kish_neff_doc_weights": q_kish_neff_doc_weights,
            "chapman_population_users": q_chapman_population_users,
            "youden_j_value_cut": q_youden_j_value_cut,
        }
    )
    oracles.update(
        {
            "kish_neff_doc_weights": KISH_SQL,
            "chapman_population_users": CHAPMAN_SQL,
            "youden_j_value_cut": YOUDEN_SQL,
        }
    )
