"""Round-4 batch BX: Theil inequality by segment, Kaplan-Meier
repeat-purchase risk table, and supplier-part degree quantiles.

Exactness discipline: Theil folds exact integer (n, sum) plus one
float x*ln(x) partial into the identical closed-form double expression
per segment; the Kaplan-Meier table is ALL integers (risk/event counts
on an exact day grid — the survival product is left to the consumer so
no cross-engine cumprod drift exists); degree quantiles ride the
small-domain histogram rank rule.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from mimirsbrunn_ray.stages.rollup import tree_merge

_DAY_US = 86_400_000_000


def _round_half_away(x: np.ndarray) -> np.ndarray:
    return np.where(
        x >= 0, np.floor(x + 0.5), np.ceil(x - 0.5)
    ).astype(np.int64)


# ---------------------------------------------------------------------------
# Theil T inequality index of order value per market segment
# ---------------------------------------------------------------------------


def q_theil_inequality_by_segment(sf_dir):
    """Theil T index of order totals per customer market segment — the
    decomposable inequality measure (unlike Gini it splits into
    within/between group terms, so segment values are directly
    comparable). Segment attaches by broadcast lookup (no shuffle);
    partials are exact (n, sum-of-cents) int64 plus one x*ln(x) float
    sum, and both engines evaluate the identical double closed form
    T = sxlx/(n*mu) - ln(mu) before one x1e6 rounding."""
    from mimirsbrunn_ray.stages.join import (
        broadcast_join,
        lookup_ref_from_parquet,
    )

    # budget-gated: broadcast arrays under the byte budget, None past it
    # (broadcast_join then runs the distributed left join via dim_spec)
    _dim = (f"{sf_dir}/customer.parquet", "c_custkey", "c_mktsegment")
    lookup = lookup_ref_from_parquet(*_dim)

    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_totalprice"]
    )
    joined = broadcast_join(
        orders, lookup, "o_custkey", "segment", out_type=pa.string(),
        dim_spec=_dim,
    )

    def partial(b: pa.Table) -> pa.Table:
        b = b.filter(
            pc.and_(
                pc.is_valid(b["o_totalprice"]), pc.is_valid(b["segment"])
            )
        )
        cents = _round_half_away(
            b["o_totalprice"].cast(pa.float64()).to_numpy(
                zero_copy_only=False
            )
            * 100.0
        )
        pos = cents > 0
        seg = b["segment"].to_numpy(zero_copy_only=False)[pos]
        c = cents[pos]
        cf = c.astype(np.float64)
        t = pa.table(
            {
                "segment": pa.array(seg),
                "n": pa.array(np.ones(len(c), dtype=np.int64)),
                "s": pa.array(c),
                "sxlx": pa.array(cf * np.log(cf)),
            }
        )
        g = t.group_by(["segment"]).aggregate(
            [("n", "sum"), ("s", "sum"), ("sxlx", "sum")]
        )
        g = g.select(["segment", "n_sum", "s_sum", "sxlx_sum"])
        return g.rename_columns(["segment", "n", "s", "sxlx"])

    def combine(b: pa.Table) -> pa.Table:
        g = b.group_by(["segment"]).aggregate(
            [("n", "sum"), ("s", "sum"), ("sxlx", "sum")]
        )
        return g.rename_columns(["segment", "n", "s", "sxlx"])

    m = tree_merge(
        joined.map_batches(partial, batch_format="pyarrow",
                           batch_size=None),
        combine,
    ).to_pandas()  # bounded: one row per segment

    if not len(m) or "segment" not in m.columns:
        return pa.table(
            {
                "segment": pa.array([], pa.string()),
                "n": pa.array([], pa.int64()),
                "theil_x1e6": pa.array([], pa.int64()),
            }
        )
    m = m.sort_values("segment", ignore_index=True)
    n = m["n"].to_numpy(dtype=np.int64)
    nf = n.astype(np.float64)
    mu = m["s"].to_numpy(dtype=np.int64).astype(np.float64) / nf
    sxlx = m["sxlx"].to_numpy(dtype=np.float64)
    theil = sxlx / (nf * mu) - np.log(mu)
    return pa.table(
        {
            "segment": pa.array(m["segment"], pa.string()),
            "n": pa.array(n),
            "theil_x1e6": pa.array(_round_half_away(theil * 1e6)),
        }
    )


THEIL_SQL = """
WITH j AS (
  SELECT c.c_mktsegment AS segment,
         CAST(ROUND(o.o_totalprice * 100, 0) AS BIGINT) AS cents
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
  WHERE o.o_totalprice IS NOT NULL AND c.c_mktsegment IS NOT NULL
), g AS (
  SELECT segment, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(cents) AS BIGINT) AS s,
         SUM(cents * LN(CAST(cents AS DOUBLE))) AS sxlx
  FROM j WHERE cents > 0 GROUP BY 1
)
SELECT segment, n,
       CAST(ROUND((sxlx / (n * (CAST(s AS DOUBLE) / n))
                   - LN(CAST(s AS DOUBLE) / n)) * 1000000, 0)
            AS BIGINT) AS theil_x1e6
FROM g ORDER BY segment
"""


# ---------------------------------------------------------------------------
# Kaplan-Meier risk/event table for time-to-second-purchase
# ---------------------------------------------------------------------------

_KM_MAX_DAY = 30


def q_km_repeat_purchase(sf_dir):
    """Kaplan-Meier risk/event table for time-to-SECOND-purchase over
    a 30-day grid — repeat-purchase survival with right-censoring at
    the observation window's end (users without a second purchase are
    censored, not dropped — the bias naive repeat-rate metrics have).
    Per-user first/second purchase resolve in user-disjoint hash
    shards; the (day, at-risk, events) table is ALL exact integers, so
    no cross-engine float product exists."""
    from mimirsbrunn_ray.stages.dedup import _BUCKET, add_bucket

    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts", "event_type"]
    )

    # global observation-window end over ALL events (censoring time)
    def ts_max_partial(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_valid(b["ts"]))
        if b.num_rows == 0:
            return pa.table({"tmax": pa.array([], pa.int64())})
        ts_us = b["ts"].cast(pa.timestamp("us")).cast(pa.int64())
        return pa.table(
            {"tmax": pa.array([pc.max(ts_us).as_py()], pa.int64())}
        )

    def ts_max_combine(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"tmax": pa.array([], pa.int64())})
        return pa.table(
            {"tmax": pa.array([pc.max(b["tmax"]).as_py()], pa.int64())}
        )

    tmax_tbl = tree_merge(
        ev.map_batches(ts_max_partial, batch_format="pyarrow",
                       batch_size=None),
        ts_max_combine,
    ).to_pandas()

    empty = pa.table(
        {
            "day": pa.array([], pa.int64()),
            "n_risk": pa.array([], pa.int64()),
            "n_event": pa.array([], pa.int64()),
        }
    )
    if not len(tmax_tbl) or "tmax" not in tmax_tbl.columns:
        return empty
    tmax_us = int(tmax_tbl["tmax"].iloc[0])

    def project(b: pa.Table) -> pa.Table:
        mask = pc.and_(
            pc.and_(pc.is_valid(b["user_id"]), pc.is_valid(b["ts"])),
            pc.equal(b["event_type"], "purchase"),
        )
        b = b.filter(pc.fill_null(mask, False))
        ts_us = b["ts"].cast(pa.timestamp("us")).cast(pa.int64())
        t = pa.table({"user_id": b["user_id"], "ts_us": ts_us})
        return add_bucket(t, "user_id", 64)

    proj = ev.map_batches(project, batch_format="pyarrow",
                          batch_size=None)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        out_empty = pd.DataFrame(
            {
                "tu": pd.Series([], dtype=np.int64),
                "ev": pd.Series([], dtype=np.int64),
                "n": pd.Series([], dtype=np.int64),
            }
        )
        if len(g) == 0:
            return out_empty
        g = g.sort_values(["user_id", "ts_us"], kind="stable")
        uid = g["user_id"].to_numpy()
        ts = g["ts_us"].to_numpy(dtype=np.int64)
        first = np.ones(len(g), dtype=bool)
        first[1:] = uid[1:] != uid[:-1]
        starts = np.flatnonzero(first)
        t0 = ts[starts]
        # second purchase = first ts STRICTLY greater than t0 in the
        # user's sorted run (same-instant ties are still "first")
        ends = np.append(starts[1:], len(g))
        # first STRICTLY-later ts per user run, vectorized: positions
        # of ts > t0 get their index, everything else +inf, then a
        # per-run minimum.reduceat picks the earliest qualifying row
        t0b = np.repeat(t0, ends - starts)
        big = np.int64(len(g))
        idx = np.where(ts > t0b, np.arange(len(g), dtype=np.int64), big)
        first_later = np.minimum.reduceat(idx, starts)
        is_ev = (first_later < big).astype(np.int64)
        t1 = ts[np.minimum(first_later, big - 1)]
        tu = np.where(
            is_ev == 1,
            (t1 - t0) // _DAY_US,
            (tmax_us - t0) // _DAY_US,
        ).astype(np.int64)
        d = pd.DataFrame({"tu": tu, "ev": is_ev})
        h = d.groupby(["tu", "ev"]).size().reset_index(name="n")
        return h.astype(np.int64)

    partials = proj.groupby(_BUCKET).map_groups(
        per_bucket, batch_format="pandas"
    )

    def combine(b: pa.Table) -> pa.Table:
        g = b.group_by(["tu", "ev"]).aggregate([("n", "sum")])
        return g.rename_columns(["tu", "ev", "n"])

    hist = tree_merge(partials, combine).to_pandas()
    if not len(hist) or "tu" not in hist.columns:
        return empty

    tu = hist["tu"].to_numpy(dtype=np.int64)
    evf = hist["ev"].to_numpy(dtype=np.int64)
    n = hist["n"].to_numpy(dtype=np.int64)
    days = np.arange(0, _KM_MAX_DAY + 1, dtype=np.int64)
    n_risk = np.array([int(n[tu >= d].sum()) for d in days])
    n_event = np.array(
        [int(n[(tu == d) & (evf == 1)].sum()) for d in days]
    )
    keep = n_risk > 0
    return pa.table(
        {
            "day": pa.array(days[keep]),
            "n_risk": pa.array(n_risk[keep]),
            "n_event": pa.array(n_event[keep]),
        }
    )


KM_SQL = f"""
WITH p AS MATERIALIZED (
  SELECT user_id, ts FROM events
  WHERE event_type = 'purchase' AND user_id IS NOT NULL
    AND ts IS NOT NULL
), f AS MATERIALIZED (
  SELECT user_id, MIN(ts) AS t0 FROM p GROUP BY 1
), s AS MATERIALIZED (
  SELECT p.user_id, MIN(p.ts) AS t1
  FROM p JOIN f ON p.user_id = f.user_id AND p.ts > f.t0 GROUP BY 1
), m AS MATERIALIZED (
  SELECT MAX(ts) AS tmax FROM events WHERE ts IS NOT NULL
), u AS MATERIALIZED (
  SELECT CASE WHEN s.t1 IS NOT NULL THEN 1 ELSE 0 END AS ev,
         CASE WHEN s.t1 IS NOT NULL
              THEN CAST(FLOOR((epoch(s.t1) - epoch(f.t0)) / 86400)
                        AS BIGINT)
              ELSE CAST(FLOOR((epoch(m.tmax) - epoch(f.t0)) / 86400)
                        AS BIGINT) END AS tu
  FROM f LEFT JOIN s ON f.user_id = s.user_id CROSS JOIN m
), d AS (
  SELECT unnest(generate_series(0, {_KM_MAX_DAY})) AS day
)
SELECT d.day,
       CAST(SUM(CASE WHEN u.tu >= d.day THEN 1 ELSE 0 END)
            AS BIGINT) AS n_risk,
       CAST(SUM(CASE WHEN u.tu = d.day AND u.ev = 1 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_event
FROM d CROSS JOIN u
GROUP BY 1
HAVING SUM(CASE WHEN u.tu >= d.day THEN 1 ELSE 0 END) > 0
ORDER BY 1
"""


# ---------------------------------------------------------------------------
# supplier-part degree quantiles
# ---------------------------------------------------------------------------


def q_supplier_part_degree(sf_dir):
    """Exact p50/p90/p99/max of DISTINCT PARTS PER SUPPLIER observed in
    lineitem — the catalog-breadth skew of the supply side (generalists
    vs single-part specialists). Distinct (supplier, part) pairs dedup
    inside supplier-disjoint hash shards; the per-supplier degree
    histogram rides the exact rank rule."""
    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_suppkey", "l_partkey"]
    )

    def partial(b: pa.Table) -> pa.Table:
        b = b.filter(
            pc.and_(
                pc.is_valid(b["l_suppkey"]), pc.is_valid(b["l_partkey"])
            )
        )
        g = b.group_by(["l_suppkey", "l_partkey"]).aggregate(
            [([], "count_all")]
        )
        return g.select(["l_suppkey", "l_partkey"])

    def dedup(b: pa.Table) -> pa.Table:
        g = b.group_by(["l_suppkey", "l_partkey"]).aggregate(
            [([], "count_all")]
        )
        return g.select(["l_suppkey", "l_partkey"])

    pairs = tree_merge(
        li.map_batches(partial, batch_format="pyarrow", batch_size=None),
        dedup,
        final_shards=8,
        shard_cols=["l_suppkey"],  # a supplier's parts stay in one shard
    )

    def hist_partial(b: pa.Table) -> pa.Table:
        empty = pa.table(
            {"v": pa.array([], pa.int64()), "n": pa.array([], pa.int64())}
        )
        if b.num_rows == 0 or "l_suppkey" not in b.column_names:
            return empty
        g = b.group_by(["l_suppkey"]).aggregate([([], "count_all")])
        g = g.select(["count_all"]).rename_columns(["v"])
        h = g.group_by(["v"]).aggregate([([], "count_all")])
        h = h.select(["v", "count_all"])
        return h.rename_columns(["v", "n"])

    def hist_combine(b: pa.Table) -> pa.Table:
        g = b.group_by(["v"]).aggregate([("n", "sum")])
        return g.rename_columns(["v", "n"])

    hist = tree_merge(
        pairs.map_batches(hist_partial, batch_format="pyarrow",
                          batch_size=None),
        hist_combine,
    ).to_pandas()

    out = {"n_suppliers": [0], "p50": [None], "p90": [None],
           "p99": [None], "max_parts": [None]}
    if len(hist) and "v" in hist.columns:
        hist = hist.sort_values("v")
        v = hist["v"].to_numpy(dtype=np.int64)
        cum = np.cumsum(hist["n"].to_numpy(dtype=np.int64))
        total = int(cum[-1])
        out["n_suppliers"] = [total]
        for q, col in ((0.5, "p50"), (0.9, "p90"), (0.99, "p99")):
            rank = int(np.ceil(q * total - 1e-9))
            out[col] = [int(v[np.searchsorted(cum, rank, "left")])]
        out["max_parts"] = [int(v[-1])]
    return pa.table(
        {
            "n_suppliers": pa.array(out["n_suppliers"], pa.int64()),
            "p50": pa.array(out["p50"], pa.int64()),
            "p90": pa.array(out["p90"], pa.int64()),
            "p99": pa.array(out["p99"], pa.int64()),
            "max_parts": pa.array(out["max_parts"], pa.int64()),
        }
    )


SUPPLIER_DEGREE_SQL = """
WITH p AS (
  SELECT DISTINCT l_suppkey, l_partkey FROM lineitem
  WHERE l_suppkey IS NOT NULL AND l_partkey IS NOT NULL
), u AS (
  SELECT l_suppkey, CAST(COUNT(*) AS BIGINT) AS n FROM p GROUP BY 1
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_suppliers,
       CAST(quantile_disc(n, 0.5) AS BIGINT) AS p50,
       CAST(quantile_disc(n, 0.9) AS BIGINT) AS p90,
       CAST(quantile_disc(n, 0.99) AS BIGINT) AS p99,
       CAST(MAX(n) AS BIGINT) AS max_parts
FROM u
"""


def register_r4bx(queries: dict, oracles: dict) -> None:
    queries.update(
        {
            "theil_inequality_by_segment": q_theil_inequality_by_segment,
            "km_repeat_purchase": q_km_repeat_purchase,
            "supplier_part_degree": q_supplier_part_degree,
        }
    )
    oracles.update(
        {
            "theil_inequality_by_segment": THEIL_SQL,
            "km_repeat_purchase": KM_SQL,
            "supplier_part_degree": SUPPLIER_DEGREE_SQL,
        }
    )
