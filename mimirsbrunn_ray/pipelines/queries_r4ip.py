"""Round-4 batch IP: embedding geometry, calendar explanatory
power, and big-order dependence — the label centroid distance
matrix (how far apart the embedding classes sit — the
separability budget any classifier has to work with), the eta²
of event value by day-of-week (what fraction of value variance
the weekly calendar explains, from exact integer moment sums),
and the big-order dependence by year (the share of each year's
revenue above the GLOBAL all-time p90 order cutoff — is the
business getting more hit-driven?).

Exactness discipline: centroid sums mirror in double at a
coarse snap; eta² builds entirely from exact (n, Σv, Σv²) per
dow; the p90 cutoff is the exact order statistic at integer
rank (9n+9)//10 and the yearly shares are exact cent sums."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from mimirsbrunn_ray.pipelines.queries_r4fk import (
    _DAY_US,
    _round_half_away,
)
from mimirsbrunn_ray.stages.rollup import tree_merge

_DIM = 64


def _valid(b: pa.Table, cols) -> pa.Table:
    m = None
    for c in cols:
        v = pc.is_valid(b[c])
        m = v if m is None else pc.and_(m, v)
    return b.filter(m)


def q_label_centroid_distances(sf_dir):
    """The separability budget: Euclidean distance between every
    pair of label centroids in embedding space — tight pairs are
    the confusion hotspots, far pairs are free accuracy.
    Per-label per-coordinate sums fold vectorized (one matmul
    per batch); the tiny centroid matrix resolves on the
    driver."""
    emb = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                          columns=["label", "embedding"])

    def part(b: pa.Table) -> pa.Table:
        b = _valid(b, ("label", "embedding"))
        if b.num_rows == 0:
            return pa.table({
                "label": pa.array([], pa.int64()),
                "n": pa.array([], pa.int64()),
                **{f"s{i}": pa.array([], pa.float64())
                   for i in range(_DIM)},
            })
        lab = b["label"].cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        mat = np.vstack([np.asarray(v, np.float64)
                         for v in b["embedding"].to_pylist()])
        out_lab, out_n, sums = [], [], []
        for lb in np.unique(lab):
            m = lab == lb
            out_lab.append(int(lb))
            out_n.append(int(m.sum()))
            sums.append(mat[m].sum(axis=0))
        cols = {"label": pa.array(out_lab, pa.int64()),
                "n": pa.array(out_n, pa.int64())}
        sums = np.vstack(sums)
        for i in range(_DIM):
            cols[f"s{i}"] = pa.array(sums[:, i])
        return pa.table(cols)

    def comb(b: pa.Table) -> pa.Table:
        aggs = [("n", "sum")] + [(f"s{i}", "sum")
                                 for i in range(_DIM)]
        g = b.group_by(["label"]).aggregate(aggs)
        return g.rename_columns(
            ["label", "n"] + [f"s{i}" for i in range(_DIM)])

    cc = tree_merge(
        emb.map_batches(part, batch_format="pyarrow",
                        batch_size=None), comb).to_pandas()
    if "label" not in cc.columns or len(cc) < 2:
        return pa.table({
            "label_a": pa.array([], pa.int64()),
            "label_b": pa.array([], pa.int64()),
            "distance_x1e6": pa.array([], pa.int64()),
        })
    cc = cc.sort_values("label")
    labels = cc["label"].to_numpy(np.int64)
    n = cc["n"].to_numpy(np.int64).astype(np.float64)
    sums = cc[[f"s{i}" for i in range(_DIM)]].to_numpy(
        np.float64)
    cents = sums / n[:, None]
    la, lb, dist = [], [], []
    for i in range(len(labels)):
        for j in range(i + 1, len(labels)):
            d = float(np.sqrt(
                ((cents[i] - cents[j]) ** 2).sum()))
            la.append(int(labels[i]))
            lb.append(int(labels[j]))
            dist.append(_round_half_away(d * 1e6))
    return pa.table({
        "label_a": pa.array(la, pa.int64()),
        "label_b": pa.array(lb, pa.int64()),
        "distance_x1e6": pa.array(dist, pa.int64()),
    })


LCD_SQL = f"""
WITH v AS MATERIALIZED (
  SELECT label, r.k AS i,
         CAST(embedding[CAST(r.k AS INTEGER)] AS DOUBLE) AS x
  FROM embeddings CROSS JOIN range(1, {_DIM + 1}) r(k)
  WHERE label IS NOT NULL AND embedding IS NOT NULL
), cent AS MATERIALIZED (
  SELECT label, i, AVG(x) AS c
  FROM v GROUP BY 1, 2
)
SELECT CAST(a.label AS BIGINT) AS label_a,
       CAST(b.label AS BIGINT) AS label_b,
       CAST(ROUND(SQRT(SUM((a.c - b.c) * (a.c - b.c)))
            * 1000000, 0) AS BIGINT) AS distance_x1e6
FROM cent a JOIN cent b ON a.i = b.i AND a.label < b.label
GROUP BY a.label, b.label
ORDER BY a.label, b.label
"""

_ETA_COLS = ["n_events", "eta_sq_ppm", "best_dow",
             "worst_dow"]


def q_eta_squared_value_dow(sf_dir):
    """How much does the weekly calendar explain?  Eta² of event
    value across the 7 days of week — between-group sum of
    squares over total, built ENTIRELY from exact integer
    (n, Σv, Σv²) per dow so both engines agree bit-for-bit on
    the inputs; plus the highest- and lowest-mean days
    (tie-safe, smallest dow wins)."""
    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["ts", "value"])

    def part(b: pa.Table) -> pa.Table:
        b = _valid(b, ("ts", "value"))
        if b.num_rows == 0:
            return pa.table({
                "dow": pa.array([], pa.int64()),
                "n": pa.array([], pa.int64()),
                "s": pa.array([], pa.int64()),
                "ss": pa.array([], pa.int64()),
            })
        us = b["ts"].cast(pa.timestamp("us")).cast(
            pa.int64()).to_numpy(zero_copy_only=False)
        dow = ((us // _DAY_US) % 7).astype(np.int64)
        v = b["value"].cast(pa.float64()).to_numpy(
            zero_copy_only=False)
        mills = np.where(v >= 0, np.floor(v * 1000 + 0.5),
                         np.ceil(v * 1000 - 0.5)).astype(
            np.int64)
        df = pd.DataFrame({"dow": dow, "n": 1, "s": mills,
                           "ss": mills * mills})
        agg = df.groupby("dow").sum().reset_index()
        for c in ["dow", "n", "s", "ss"]:
            agg[c] = agg[c].astype(np.int64)
        return pa.Table.from_pandas(agg, preserve_index=False)

    def comb(b: pa.Table) -> pa.Table:
        g = b.group_by(["dow"]).aggregate(
            [("n", "sum"), ("s", "sum"), ("ss", "sum")])
        return g.rename_columns(["dow", "n", "s", "ss"])

    gg = tree_merge(
        ev.map_batches(part, batch_format="pyarrow",
                       batch_size=None), comb).to_pandas()
    if "dow" not in gg.columns or len(gg) < 2:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _ETA_COLS})
    gg = gg.sort_values("dow")
    n = gg["n"].to_numpy(np.int64).astype(np.float64)
    s = gg["s"].to_numpy(np.int64).astype(np.float64)
    ss = gg["ss"].to_numpy(np.int64).astype(np.float64)
    N = n.sum()
    S = s.sum()
    SS = ss.sum()
    sst = SS - S * S / N
    if sst <= 0:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _ETA_COLS})
    ssb = float((s * s / n).sum()) - S * S / N
    means = s / n
    dows = gg["dow"].to_numpy(np.int64)
    best = int(dows[int(np.argmax(means))])
    worst = int(dows[int(np.argmin(means))])
    return pa.table({
        "n_events": pa.array([int(N)], pa.int64()),
        "eta_sq_ppm": pa.array(
            [_round_half_away(ssb / sst * 1e6)], pa.int64()),
        "best_dow": pa.array([best], pa.int64()),
        "worst_dow": pa.array([worst], pa.int64()),
    })


ETA_SQL = f"""
WITH g AS MATERIALIZED (
  SELECT (EPOCH_US(ts) // {_DAY_US}) % 7 AS dow,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CAST(ROUND(value * 1000, 0) AS BIGINT))
              AS BIGINT) AS s,
         CAST(SUM(CAST(ROUND(value * 1000, 0) AS BIGINT)
                  * CAST(ROUND(value * 1000, 0) AS BIGINT))
              AS BIGINT) AS ss
  FROM events WHERE ts IS NOT NULL AND value IS NOT NULL
  GROUP BY 1
), tot AS MATERIALIZED (
  SELECT CAST(SUM(n) AS BIGINT) AS bn,
         CAST(SUM(s) AS BIGINT) AS bs,
         CAST(SUM(ss) AS BIGINT) AS bss,
         CAST(COUNT(*) AS BIGINT) AS k
  FROM g
), calc AS MATERIALIZED (
  SELECT tot.bn,
         CAST(tot.bss AS DOUBLE)
           - CAST(tot.bs AS DOUBLE) * tot.bs / tot.bn AS sst,
         SUM(CAST(g.s AS DOUBLE) * g.s / g.n)
           - CAST(tot.bs AS DOUBLE) * tot.bs / tot.bn AS ssb
  FROM g CROSS JOIN tot
  GROUP BY tot.bn, tot.bss, tot.bs
), bw AS MATERIALIZED (
  SELECT
    (SELECT dow FROM g
     ORDER BY CAST(s AS DOUBLE) / n DESC, dow ASC LIMIT 1)
      AS best,
    (SELECT dow FROM g
     ORDER BY CAST(s AS DOUBLE) / n ASC, dow ASC LIMIT 1)
      AS worst
)
SELECT calc.bn AS n_events,
       CAST(ROUND(calc.ssb / calc.sst * 1000000, 0) AS BIGINT)
         AS eta_sq_ppm,
       CAST(bw.best AS BIGINT) AS best_dow,
       CAST(bw.worst AS BIGINT) AS worst_dow
FROM calc CROSS JOIN bw
WHERE calc.sst > 0
  AND (SELECT k FROM tot) >= 2
"""

_BOD_COLS = ["year", "n_orders", "n_big", "revenue_share_ppm"]


def q_big_order_dependence_yearly(sf_dir):
    """Is the business getting hit-driven?  The GLOBAL all-time
    p90 order value cutoff (exact order statistic at integer
    rank (9n+9)//10), then per year: how many orders clear it
    and what share of that year's revenue they carry.  The cents
    histogram folds once; the cutoff and yearly shares are exact
    integers."""
    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderdate", "o_totalprice"])

    def part(b: pa.Table) -> pa.Table:
        b = _valid(b, ("o_orderdate", "o_totalprice"))
        if b.num_rows == 0:
            return pa.table({
                "yr": pa.array([], pa.int64()),
                "cents": pa.array([], pa.int64()),
                "n": pa.array([], pa.int64()),
            })
        d = b["o_orderdate"].cast(pa.timestamp("us")).to_pandas()
        yr = d.dt.year.to_numpy(np.int64)
        tp = b["o_totalprice"].cast(pa.float64()).to_numpy(
            zero_copy_only=False)
        cents = np.where(tp >= 0, np.floor(tp * 100 + 0.5),
                         np.ceil(tp * 100 - 0.5)).astype(
            np.int64)
        t = pa.table({
            "yr": pa.array(yr),
            "cents": pa.array(cents),
            "n": pa.array(np.ones(len(yr), np.int64)),
        })
        g = t.group_by(["yr", "cents"]).aggregate([("n", "sum")])
        return g.rename_columns(["yr", "cents", "n"])

    def comb(b: pa.Table) -> pa.Table:
        g = b.group_by(["yr", "cents"]).aggregate([("n", "sum")])
        return g.rename_columns(["yr", "cents", "n"])

    hist = tree_merge(
        orders.map_batches(part, batch_format="pyarrow",
                           batch_size=None),
        comb,
        final_shards=8,
        shard_cols=["cents"],
    ).to_pandas()
    if "yr" not in hist.columns or len(hist) == 0:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _BOD_COLS})
    # global p90 cutoff: value at integer rank (9n+9)//10 of the
    # ascending multiset
    vh = hist.groupby("cents")["n"].sum().sort_index()
    n_tot = int(vh.sum())
    rank = (9 * n_tot + 9) // 10
    cum = vh.cumsum()
    cutoff = int(cum[cum >= rank].index[0])
    rows = []
    for yr, g in hist.groupby("yr"):
        tot_rev = int((g["cents"] * g["n"]).sum())
        if tot_rev == 0:
            continue
        big = g[g["cents"] >= cutoff]
        big_rev = int((big["cents"] * big["n"]).sum())
        rows.append((int(yr), int(g["n"].sum()),
                     int(big["n"].sum()),
                     _round_half_away(big_rev / tot_rev * 1e6)))
    rows.sort()
    return pa.table({
        "year": pa.array([r[0] for r in rows], pa.int64()),
        "n_orders": pa.array([r[1] for r in rows], pa.int64()),
        "n_big": pa.array([r[2] for r in rows], pa.int64()),
        "revenue_share_ppm": pa.array(
            [r[3] for r in rows], pa.int64()),
    })


BOD_SQL = """
WITH oc AS MATERIALIZED (
  SELECT YEAR(o_orderdate) AS yr,
         CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS cents
  FROM orders
  WHERE o_orderdate IS NOT NULL AND o_totalprice IS NOT NULL
), cut AS MATERIALIZED (
  SELECT cents AS cutoff
  FROM (SELECT cents,
               ROW_NUMBER() OVER (ORDER BY cents) AS rk,
               COUNT(*) OVER () AS n
        FROM oc)
  WHERE rk = (9 * n + 9) // 10
)
SELECT CAST(oc.yr AS BIGINT) AS year,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CASE WHEN oc.cents >= cut.cutoff THEN 1
                     ELSE 0 END) AS BIGINT) AS n_big,
       CAST(ROUND(CAST(SUM(CASE WHEN oc.cents >= cut.cutoff
                                THEN oc.cents ELSE 0 END)
                       AS DOUBLE) / SUM(oc.cents)
            * 1000000, 0) AS BIGINT) AS revenue_share_ppm
FROM oc CROSS JOIN cut
GROUP BY oc.yr
HAVING SUM(oc.cents) > 0
ORDER BY oc.yr
"""


def register_r4ip(queries: dict, oracles: dict) -> None:
    queries.update(
        {
            "label_centroid_distances":
                q_label_centroid_distances,
            "eta_squared_value_dow": q_eta_squared_value_dow,
            "big_order_dependence_yearly":
                q_big_order_dependence_yearly,
        }
    )
    oracles.update(
        {
            "label_centroid_distances": LCD_SQL,
            "eta_squared_value_dow": ETA_SQL,
            "big_order_dependence_yearly": BOD_SQL,
        }
    )
