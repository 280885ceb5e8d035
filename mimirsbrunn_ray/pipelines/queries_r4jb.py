"""Round-4 batch JB: personal ordering habits, value inequality
per stream, and key-space forensics — the personal order-DOW
modality (each customer's favorite ordering day and how
concentrated personal habits are), the value Gini per event type
(inequality of value across events within each stream — which
streams are carried by a few big hits), and the orderkey density
audit (how much of the key range is actually used — the sparse
key fingerprint of sharded generators).

Exactness discipline: modal days break ties on the smallest
dow; Ginis use the exact integer rank formula over sorted
mills; key-range arithmetic is exact."""

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
from mimirsbrunn_ray.stages.dedup import _BUCKET, add_bucket
from mimirsbrunn_ray.stages.rollup import tree_merge


def _valid(b: pa.Table, cols) -> pa.Table:
    m = None
    for c in cols:
        v = pc.is_valid(b[c])
        m = v if m is None else pc.and_(m, v)
    return b.filter(m)


_POD_COLS = ["modal_dow", "n_customers", "share_ppm",
             "mean_modal_share_ppm"]


def q_personal_order_dow_modal(sf_dir):
    """Habit, not coincidence: for customers with 3+ orders,
    their MODAL ordering day of week (ties to the smallest dow),
    the distribution of those personal favorites, and the mean
    share a customer's favorite day takes of their own orders.
    Per-(customer, dow) counts fold exactly in disjoint
    shards."""
    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_orderdate"])

    def part(b: pa.Table) -> pa.Table:
        b = _valid(b, ("o_custkey", "o_orderdate"))
        if b.num_rows == 0:
            return pa.table({
                "ck": pa.array([], pa.int64()),
                "dow": pa.array([], pa.int64()),
                "n": pa.array([], pa.int64()),
            })
        us = b["o_orderdate"].cast(pa.timestamp("us")).cast(
            pa.int64()).to_numpy(zero_copy_only=False)
        dow = ((us // _DAY_US) % 7).astype(np.int64)
        df = pd.DataFrame({
            "ck": b["o_custkey"].cast(pa.int64()).to_numpy(
                zero_copy_only=False),
            "dow": dow, "n": 1,
        })
        agg = df.groupby(["ck", "dow"]).sum().reset_index()
        for c in ["ck", "dow", "n"]:
            agg[c] = agg[c].astype(np.int64)
        return pa.Table.from_pandas(agg, preserve_index=False)

    def comb(b: pa.Table) -> pa.Table:
        g = b.group_by(["ck", "dow"]).aggregate([("n", "sum")])
        return g.rename_columns(["ck", "dow", "n"])

    cd = tree_merge(
        orders.map_batches(part, batch_format="pyarrow",
                           batch_size=None),
        comb,
        final_shards=8,
        shard_cols=["ck"],
    ).to_pandas()
    if "ck" not in cd.columns or len(cd) == 0:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _POD_COLS})
    rows = []
    for ck, g in cd.groupby("ck"):
        tot = int(g["n"].sum())
        if tot < 3:
            continue
        top = g.sort_values(["n", "dow"],
                            ascending=[False, True]).iloc[0]
        rows.append((int(top["dow"]),
                     int(top["n"]) / tot))
    if not rows:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _POD_COLS})
    modal = np.array([r[0] for r in rows], np.int64)
    shares = np.array([r[1] for r in rows], np.float64)
    n_cust = len(rows)
    out = []
    for d in sorted(set(modal)):
        cnt = int((modal == d).sum())
        out.append((d, cnt,
                    _round_half_away(cnt / n_cust * 1e6),
                    _round_half_away(
                        float(shares[modal == d].mean())
                        * 1e6)))
    return pa.table({
        "modal_dow": pa.array([r[0] for r in out], pa.int64()),
        "n_customers": pa.array(
            [r[1] for r in out], pa.int64()),
        "share_ppm": pa.array([r[2] for r in out], pa.int64()),
        "mean_modal_share_ppm": pa.array(
            [r[3] for r in out], pa.int64()),
    })


POD_SQL = f"""
WITH cd AS MATERIALIZED (
  SELECT o_custkey AS ck,
         (EPOCH_US(o_orderdate) // {_DAY_US}) % 7 AS dow,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM orders
  WHERE o_custkey IS NOT NULL AND o_orderdate IS NOT NULL
  GROUP BY 1, 2
), tot AS MATERIALIZED (
  SELECT ck, CAST(SUM(n) AS BIGINT) AS t
  FROM cd GROUP BY 1
  HAVING SUM(n) >= 3
), modal AS MATERIALIZED (
  SELECT cd.ck, cd.dow, cd.n, tot.t
  FROM cd JOIN tot USING (ck)
  QUALIFY ROW_NUMBER() OVER (PARTITION BY cd.ck
                             ORDER BY cd.n DESC,
                                      cd.dow ASC) = 1
), nn AS MATERIALIZED (
  SELECT CAST(COUNT(*) AS BIGINT) AS n FROM modal
)
SELECT CAST(modal.dow AS BIGINT) AS modal_dow,
       CAST(COUNT(*) AS BIGINT) AS n_customers,
       CAST(ROUND(CAST(COUNT(*) AS DOUBLE)
            / ANY_VALUE(nn.n) * 1000000, 0) AS BIGINT)
         AS share_ppm,
       CAST(ROUND(AVG(CAST(modal.n AS DOUBLE) / modal.t)
            * 1000000, 0) AS BIGINT) AS mean_modal_share_ppm
FROM modal CROSS JOIN nn
GROUP BY modal.dow
ORDER BY modal.dow
"""

_VGT_COLS = ["event_type", "n_events", "gini_ppm"]


def q_value_gini_by_type(sf_dir):
    """Which streams are carried by a few big hits?  The Gini
    coefficient of event VALUE within each type (exact integer
    rank formula over sorted mills) — high-Gini streams need
    whale handling, low-Gini streams are honest averages.
    Whole types resolve in hash buckets."""
    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "value"])

    def project(b: pa.Table) -> pa.Table:
        b = _valid(b, ("event_type", "value"))
        if b.num_rows == 0:
            return pa.table({
                "et": pa.array([], pa.string()),
                "m": pa.array([], pa.int64()),
                "_dedup_bucket": pa.array([], pa.int32()),
            })
        v = b["value"].cast(pa.float64()).to_numpy(
            zero_copy_only=False)
        mills = np.where(v >= 0, np.floor(v * 1000 + 0.5),
                         np.ceil(v * 1000 - 0.5)).astype(
            np.int64)
        t = pa.table({
            "et": b["event_type"].cast(pa.string()),
            "m": pa.array(mills),
        })
        return add_bucket(t, "et", 16)

    def ginis(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({
            "event_type": pd.Series([], dtype=object),
            "n_events": pd.Series([], dtype=np.int64),
            "gini_ppm": pd.Series([], dtype=np.int64),
        })
        if len(g) == 0:
            return empty
        rows = []
        for et, sub in g.groupby("et"):
            v = np.sort(sub["m"].to_numpy(np.int64),
                        kind="mergesort").astype(np.float64)
            nd = len(v)
            s = v.sum()
            if nd < 2 or s == 0:
                continue
            i = np.arange(1, nd + 1, dtype=np.float64)
            gini = float(((2 * i - nd - 1) * v).sum()) / (
                nd * s)
            rows.append({
                "event_type": et,
                "n_events": np.int64(nd),
                "gini_ppm": np.int64(
                    _round_half_away(gini * 1e6)),
            })
        return pd.DataFrame(rows)

    out = (
        ev.map_batches(project, batch_format="pyarrow",
                       batch_size=None)
        .groupby(_BUCKET)
        .map_groups(ginis, batch_format="pandas")
        .to_pandas()
    )
    if "event_type" not in out.columns or len(out) == 0:
        return pa.table({
            "event_type": pa.array([], pa.string()),
            "n_events": pa.array([], pa.int64()),
            "gini_ppm": pa.array([], pa.int64()),
        })
    out = out.sort_values("event_type")
    return pa.table({
        "event_type": pa.array(out["event_type"], pa.string()),
        "n_events": pa.array(
            out["n_events"].to_numpy(np.int64), pa.int64()),
        "gini_ppm": pa.array(
            out["gini_ppm"].to_numpy(np.int64), pa.int64()),
    })


VGT_SQL = """
WITH v AS MATERIALIZED (
  SELECT event_type AS et,
         CAST(ROUND(value * 1000, 0) AS BIGINT) AS m
  FROM events
  WHERE event_type IS NOT NULL AND value IS NOT NULL
), rk AS MATERIALIZED (
  SELECT et, m,
         ROW_NUMBER() OVER (PARTITION BY et ORDER BY m) AS i,
         COUNT(*) OVER (PARTITION BY et) AS nd,
         SUM(m) OVER (PARTITION BY et) AS s
  FROM v
)
SELECT et AS event_type,
       CAST(ANY_VALUE(nd) AS BIGINT) AS n_events,
       CAST(ROUND(SUM((2 * i - nd - 1) * m)
            / (ANY_VALUE(nd) * CAST(ANY_VALUE(s) AS DOUBLE))
            * 1000000, 0) AS BIGINT) AS gini_ppm
FROM rk
WHERE nd >= 2 AND s <> 0
GROUP BY et
ORDER BY et
"""

_OKD_COLS = ["n_orders", "min_key", "max_key",
             "density_ppm", "mean_gap_x1e3"]


def q_orderkey_density_audit(sf_dir):
    """Key-space forensics: how much of the [min, max] orderkey
    range is actually populated — sharded or bit-partitioned
    generators leave a sparse, regular key space, and the mean
    gap between consecutive keys tells you the stride.  Min,
    max and counts fold exactly."""
    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey"])

    def part(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_valid(b["o_orderkey"]))
        if b.num_rows == 0:
            return pa.table({
                "n": pa.array([], pa.int64()),
                "mn": pa.array([], pa.int64()),
                "mx": pa.array([], pa.int64()),
            })
        k = b["o_orderkey"].cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        return pa.table({
            "n": pa.array([len(k)], pa.int64()),
            "mn": pa.array([int(k.min())], pa.int64()),
            "mx": pa.array([int(k.max())], pa.int64()),
        })

    def comb(b: pa.Table) -> pa.Table:
        return pa.table({
            "n": pa.array(
                [pc.sum(b["n"]).as_py() or 0], pa.int64()),
            "mn": pa.array(
                [pc.min(b["mn"]).as_py() or 0], pa.int64()),
            "mx": pa.array(
                [pc.max(b["mx"]).as_py() or 0], pa.int64()),
        })

    st = tree_merge(
        orders.map_batches(part, batch_format="pyarrow",
                           batch_size=None), comb).to_pandas()
    if "n" not in st.columns or len(st) == 0:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _OKD_COLS})
    n = int(st["n"].sum())
    if n < 2:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _OKD_COLS})
    mn = int(st["mn"].min())
    mx = int(st["mx"].max())
    span = mx - mn + 1
    return pa.table({
        "n_orders": pa.array([n], pa.int64()),
        "min_key": pa.array([mn], pa.int64()),
        "max_key": pa.array([mx], pa.int64()),
        "density_ppm": pa.array(
            [_round_half_away(n / span * 1e6)], pa.int64()),
        "mean_gap_x1e3": pa.array(
            [_round_half_away((mx - mn) / (n - 1) * 1e3)],
            pa.int64()),
    })


OKD_SQL = """
WITH st AS MATERIALIZED (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(MIN(o_orderkey) AS BIGINT) AS mn,
         CAST(MAX(o_orderkey) AS BIGINT) AS mx
  FROM orders WHERE o_orderkey IS NOT NULL
)
SELECT n AS n_orders, mn AS min_key, mx AS max_key,
       CAST(ROUND(CAST(n AS DOUBLE) / (mx - mn + 1)
            * 1000000, 0) AS BIGINT) AS density_ppm,
       CAST(ROUND(CAST(mx - mn AS DOUBLE) / (n - 1)
            * 1000, 0) AS BIGINT) AS mean_gap_x1e3
FROM st
WHERE n >= 2
"""


def register_r4jb(queries: dict, oracles: dict) -> None:
    queries.update(
        {
            "personal_order_dow_modal":
                q_personal_order_dow_modal,
            "value_gini_by_type": q_value_gini_by_type,
            "orderkey_density_audit": q_orderkey_density_audit,
        }
    )
    oracles.update(
        {
            "personal_order_dow_modal": POD_SQL,
            "value_gini_by_type": VGT_SQL,
            "orderkey_density_audit": OKD_SQL,
        }
    )
