"""Round-4 batch AK: cross-table numeric consistency audit, a
propensity lift table, and dimension densification (zero-filled grid).

Exactness discipline: the price audit reconstructs order totals in
scaled integers (cents x basis-points^2) so the comparison needs no
floats; lift deciles are VALUE-BANDED (quantile_disc boundaries, ties
never split) so tie order can't flip a user's band; the dense grid is
integer day arithmetic.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd
from mimirsbrunn_ray.stages.broadcast import safe_join as _safe_join

from mimirsbrunn_ray.stages.rollup import tree_merge

_DAY_US = 86_400_000_000


def _round_half_away(x: np.ndarray) -> np.ndarray:
    return np.where(
        x >= 0, np.floor(x + 0.5), np.ceil(x - 0.5)
    ).astype(np.int64)


# ---------------------------------------------------------------------------
# order price consistency: header total vs reconstructed lineitem total
# ---------------------------------------------------------------------------

def q_order_price_consistency(sf_dir):
    """Cross-table numeric audit: per order, compare the header
    o_totalprice against the total reconstructed from its lineitems
    (sum of extendedprice*(1-discount)*(1+tax)), entirely in scaled
    integers — lhs = total_x100 * 10^8, rhs = sum of
    px100*(10000-disc_bp)*(10000+tax_bp) — and report how many orders
    agree within one dollar vs drift beyond it, plus both exact global
    sums. One combiner-first lineitem aggregation by orderkey, one
    big-big hash join to the header (J4), bounded counter merge."""
    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_totalprice"]
    )
    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount", "l_tax"],
    )

    def li_partial(b: pa.Table) -> pa.Table:
        b = b.filter(
            pc.and_(
                pc.and_(
                    pc.is_valid(b["l_orderkey"]),
                    pc.is_valid(b["l_extendedprice"]),
                ),
                pc.and_(
                    pc.is_valid(b["l_discount"]), pc.is_valid(b["l_tax"])
                ),
            )
        )
        px = _round_half_away(
            b["l_extendedprice"].cast(pa.float64()).to_numpy(
                zero_copy_only=False
            )
            * 100.0
        )
        d = _round_half_away(
            b["l_discount"].cast(pa.float64()).to_numpy(
                zero_copy_only=False
            )
            * 10_000.0
        )
        t = _round_half_away(
            b["l_tax"].cast(pa.float64()).to_numpy(zero_copy_only=False)
            * 10_000.0
        )
        rhs = px * (10_000 - d) * (10_000 + t)
        tb = pa.table(
            {"l_orderkey": b["l_orderkey"], "rhs": pa.array(rhs)}
        )
        g = tb.group_by(["l_orderkey"]).aggregate([("rhs", "sum")])
        g = g.select(["l_orderkey", "rhs_sum"])
        return g.rename_columns(["o_orderkey", "rhs_x1e8"])

    def li_combine(b: pa.Table) -> pa.Table:
        g = b.group_by(["o_orderkey"]).aggregate([("rhs_x1e8", "sum")])
        return g.rename_columns(["o_orderkey", "rhs_x1e8"])

    recon = tree_merge(
        li.map_batches(li_partial, batch_format="pyarrow",
                       batch_size=None),
        li_combine,
        final_shards=4,
        shard_cols=["o_orderkey"],
    ).repartition(4)

    def header(b: pa.Table) -> pa.Table:
        b = b.filter(
            pc.and_(
                pc.is_valid(b["o_orderkey"]), pc.is_valid(b["o_totalprice"])
            )
        )
        lhs = (
            _round_half_away(
                b["o_totalprice"].cast(pa.float64()).to_numpy(
                    zero_copy_only=False
                )
                * 100.0
            )
            * 100_000_000
        )
        return pa.table(
            {"o_orderkey": b["o_orderkey"], "lhs_x1e8": pa.array(lhs)}
        )

    hdr = orders.map_batches(
        header, batch_format="pyarrow", batch_size=None
    ).repartition(4)
    joined = _safe_join(
        hdr, recon,
        on=("o_orderkey",),
        join_type="inner",
        num_partitions=4,
    )

    tol = 100 * 100_000_000  # one dollar = 100 cents, in the x1e8 scale

    def count_partial(b: pa.Table) -> pa.Table:
        lhs = b["lhs_x1e8"].to_numpy(zero_copy_only=False)
        rhs = b["rhs_x1e8"].to_numpy(zero_copy_only=False)
        diff = np.abs(lhs - rhs)
        return pa.table(
            {
                "n_orders": pa.array([len(lhs)], pa.int64()),
                "n_within_dollar": pa.array(
                    [int((diff <= tol).sum())], pa.int64()
                ),
                "n_drifted": pa.array(
                    [int((diff > tol).sum())], pa.int64()
                ),
                "sum_abs_diff_dollars": pa.array(
                    [int((diff // 10_000_000_000).sum())], pa.int64()
                ),
            }
        )

    def count_combine(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                c: pa.array([pc.sum(b[c]).as_py() or 0], pa.int64())
                for c in b.column_names
            }
        )

    return tree_merge(
        joined.map_batches(count_partial, batch_format="pyarrow",
                           batch_size=None),
        count_combine,
    )


PRICE_AUDIT_SQL = """
WITH r AS (
  SELECT l_orderkey AS o_orderkey,
         CAST(SUM(
           CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)
           * (10000 - CAST(ROUND(l_discount * 10000, 0) AS BIGINT))
           * (10000 + CAST(ROUND(l_tax * 10000, 0) AS BIGINT))
         ) AS BIGINT) AS rhs
  FROM lineitem
  WHERE l_orderkey IS NOT NULL AND l_extendedprice IS NOT NULL
    AND l_discount IS NOT NULL AND l_tax IS NOT NULL
  GROUP BY 1
), j AS (
  SELECT CAST(ROUND(o.o_totalprice * 100, 0) AS BIGINT)
           * 100000000 AS lhs,
         r.rhs
  FROM orders o JOIN r USING (o_orderkey)
  WHERE o.o_totalprice IS NOT NULL
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CASE WHEN ABS(lhs - rhs) <= CAST(100 AS BIGINT) * 100000000
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_within_dollar,
       CAST(SUM(CASE WHEN ABS(lhs - rhs) > CAST(100 AS BIGINT) * 100000000
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_drifted,
       CAST(SUM(ABS(lhs - rhs) // 10000000000) AS BIGINT)
         AS sum_abs_diff_dollars
FROM j
"""


# ---------------------------------------------------------------------------
# purchase-propensity lift by activity decile (value-banded)
# ---------------------------------------------------------------------------


def q_purchase_lift_deciles(sf_dir):
    """The gains/lift table behind propensity evaluation: users banded
    by total activity count into VALUE-BANDED deciles (band d = users
    with count <= the d-th quantile_disc boundary and > the previous
    one; ties share a band, so tie order can never flip a user), then
    per band: user count and how many made a purchase. One user
    hash-bucket shuffle gives exact per-user (count, purchased) pairs;
    the (count, purchased) histogram is bounded by activity levels x 2
    and drives the banding on the driver."""
    from mimirsbrunn_ray.stages.dedup import _BUCKET, add_bucket

    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "event_type"]
    )

    def project(b: pa.Table) -> pa.Table:
        b = b.filter(
            pc.and_(pc.is_valid(b["user_id"]), pc.is_valid(b["event_type"]))
        )
        return add_bucket(b, "user_id", 64)

    proj = ev.map_batches(project, batch_format="pyarrow", batch_size=None)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "x": pd.Series([], dtype=np.int64),
                "p": pd.Series([], dtype=np.int64),
                "c": pd.Series([], dtype=np.int64),
            }
        )
        if len(g) == 0:
            return empty
        gg = g.groupby("user_id", sort=False)
        x = gg.size()
        p = gg["event_type"].agg(lambda s: int((s == "purchase").any()))
        hist = (
            pd.DataFrame({"x": x, "p": p})
            .groupby(["x", "p"])
            .size()
            .reset_index()
        )
        hist.columns = ["x", "p", "c"]
        for c in hist.columns:
            hist[c] = hist[c].astype(np.int64)
        return hist

    partials = proj.groupby(_BUCKET).map_groups(
        per_bucket, batch_format="pandas"
    )

    def combine(b: pa.Table) -> pa.Table:
        g = b.group_by(["x", "p"]).aggregate([("c", "sum")])
        return g.rename_columns(["x", "p", "c"])

    hist = tree_merge(partials, combine).to_pandas()
    # bounded: activity levels x 2

    out = {"decile": [], "hi_count": [], "n_users": [],
           "n_purchasers": []}
    if len(hist):
        hist = hist.sort_values(["x", "p"], ignore_index=True)
        m = hist.groupby("x")[["c"]].sum().sort_index()
        xs = m.index.to_numpy(dtype=np.int64)
        cs = m["c"].to_numpy(dtype=np.int64)
        cum = np.cumsum(cs)
        n = int(cum[-1])
        # quantile_disc boundaries (the repo-wide ceil(q*n) rank rule)
        bounds = []
        for d in range(1, 11):
            rank = int(np.ceil(d / 10 * n - 1e-9))
            bounds.append(int(xs[np.searchsorted(cum, rank, "left")]))
        prev = -(2 ** 62)
        px = hist[hist["p"] == 1].set_index("x")["c"]
        for d, hi in enumerate(bounds, start=1):
            if hi <= prev:  # duplicate boundary: empty band
                band = np.zeros(0, dtype=bool)
                nu = npur = 0
            else:
                band = (xs > prev) & (xs <= hi)
                nu = int(cs[band].sum())
                npur = int(
                    px.reindex(xs[band]).fillna(0).to_numpy().sum()
                )
            out["decile"].append(d)
            out["hi_count"].append(hi)
            out["n_users"].append(nu)
            out["n_purchasers"].append(npur)
            prev = max(prev, hi)
    return pa.table(
        {
            "decile": pa.array(out["decile"], pa.int64()),
            "hi_count": pa.array(out["hi_count"], pa.int64()),
            "n_users": pa.array(out["n_users"], pa.int64()),
            "n_purchasers": pa.array(out["n_purchasers"], pa.int64()),
        }
    )


LIFT_SQL = """
WITH uc AS MATERIALIZED (
  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS x,
         CAST(MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
              AS BIGINT) AS p
  FROM events
  WHERE user_id IS NOT NULL AND event_type IS NOT NULL
  GROUP BY 1
), b AS MATERIALIZED (
  SELECT CAST(t.i AS BIGINT) AS decile,
         CAST(q.q[t.i] AS BIGINT) AS hi
  FROM (SELECT quantile_disc(x, [0.1, 0.2, 0.3, 0.4, 0.5,
                                 0.6, 0.7, 0.8, 0.9, 1.0]) AS q
        FROM uc) q,
       (SELECT unnest(generate_series(1, 10)) AS i) t
), bands AS (
  SELECT decile, hi,
         CASE WHEN decile = 1 THEN -4611686018427387904
              ELSE LAG(hi) OVER (ORDER BY decile) END AS lo
  FROM b
)
SELECT bands.decile, bands.hi AS hi_count,
       CAST(COALESCE(SUM(CASE WHEN uc.x > bands.lo AND uc.x <= bands.hi
                              THEN 1 END), 0) AS BIGINT) AS n_users,
       CAST(COALESCE(SUM(CASE WHEN uc.x > bands.lo AND uc.x <= bands.hi
                              THEN uc.p END), 0) AS BIGINT)
         AS n_purchasers
FROM bands LEFT JOIN uc ON TRUE
GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# dense daily grid: zero-filled (type, day) counts
# ---------------------------------------------------------------------------


def q_dense_daily_grid(sf_dir):
    """Dimension densification: event counts per (type, day) INCLUDING
    explicit zero rows for every day in the corpus span — the dense
    grid a dashboard or forecasting model consumes (absent != zero is
    a classic silent bug). The observed counts are one decomposable
    pass (bounded by types x days); the grid skeleton is integer day
    arithmetic from the global min/max aggregate."""
    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "ts"]
    )

    def partial(b: pa.Table) -> pa.Table:
        b = b.filter(
            pc.and_(pc.is_valid(b["event_type"]), pc.is_valid(b["ts"]))
        )
        ts_us = b["ts"].cast(pa.timestamp("us")).cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        day = np.floor_divide(ts_us, _DAY_US)
        t = pa.table({"event_type": b["event_type"], "day": pa.array(day)})
        g = t.group_by(["event_type", "day"]).aggregate([([], "count_all")])
        g = g.select(["event_type", "day", "count_all"])
        return g.rename_columns(["event_type", "day", "n"])

    def combine(b: pa.Table) -> pa.Table:
        g = b.group_by(["event_type", "day"]).aggregate([("n", "sum")])
        return g.rename_columns(["event_type", "day", "n"])

    obs = tree_merge(
        ev.map_batches(partial, batch_format="pyarrow", batch_size=None),
        combine,
    ).to_pandas()  # bounded: types x days

    if not len(obs):
        return pa.table(
            {
                "event_type": pa.array([], pa.string()),
                "day": pa.array([], pa.int64()),
                "n": pa.array([], pa.int64()),
            }
        )
    types = sorted(obs["event_type"].unique())
    d0 = int(obs["day"].min())
    d1 = int(obs["day"].max())
    days = np.arange(d0, d1 + 1, dtype=np.int64)
    grid = pd.MultiIndex.from_product(
        [types, days], names=["event_type", "day"]
    )
    dense = (
        obs.set_index(["event_type", "day"])["n"]
        .reindex(grid, fill_value=0)
        .reset_index()
    )
    return pa.table(
        {
            "event_type": pa.array(dense["event_type"], pa.string()),
            "day": pa.array(dense["day"].to_numpy(dtype=np.int64)),
            "n": pa.array(dense["n"].to_numpy(dtype=np.int64)),
        }
    )


DENSE_GRID_SQL = """
WITH obs AS MATERIALIZED (
  SELECT event_type,
         CAST(FLOOR(epoch(ts) / 86400) AS BIGINT) AS day,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM events
  WHERE event_type IS NOT NULL AND ts IS NOT NULL
  GROUP BY 1, 2
), span AS (
  SELECT MIN(day) AS d0, MAX(day) AS d1 FROM obs
), grid AS (
  SELECT t.event_type, CAST(g.day AS BIGINT) AS day
  FROM (SELECT DISTINCT event_type FROM obs) t
  CROSS JOIN (
    SELECT unnest(generate_series((SELECT d0 FROM span),
                                  (SELECT d1 FROM span))) AS day
  ) g
)
SELECT grid.event_type, grid.day,
       CAST(COALESCE(obs.n, 0) AS BIGINT) AS n
FROM grid LEFT JOIN obs USING (event_type, day)
"""


def register_r4ak(queries: dict, oracles: dict) -> None:
    queries.update(
        {
            "order_price_consistency": q_order_price_consistency,
            "purchase_lift_deciles": q_purchase_lift_deciles,
            "dense_daily_grid": q_dense_daily_grid,
        }
    )
    oracles.update(
        {
            "order_price_consistency": PRICE_AUDIT_SQL,
            "purchase_lift_deciles": LIFT_SQL,
            "dense_daily_grid": DENSE_GRID_SQL,
        }
    )
