"""Round-4 batch DI: storage-planner audits — zone-map prune rate for a
hot predicate, Bloom-filter false-positive planning from exact key
cardinalities, and modulo-partition load balance.

Engine-planning operators: the zone-map audit says how many day
segments a `value > p90` scan could skip using only per-segment max
statistics; the Bloom planner turns exact distinct-user counts into the
expected FPP of the anti-join filter at its configured geometry; the
partition audit measures the straggler ratio a key-modulo layout would
produce. Exactness: counts / maxima / the p90 selection fold exact
int64 (quantile by integer cross-multiplication); FPP and ratios are
mirrored doubles, x1e6 snap.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from mimirsbrunn_ray.stages.dedup import _BUCKET, add_bucket
from mimirsbrunn_ray.stages.rollup import tree_merge

_DAY_US = 86_400_000_000
_BLOOM_BITS = 1 << 20
_BLOOM_K = 6
_N_PARTS = 32


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
# zone-map prune rate for `value > p90`
# ---------------------------------------------------------------------------


def q_zonemap_prune_rate(sf_dir):
    """Per event type: how many of the type's DAY segments a zone map
    (per-segment max statistic) lets a `value > global p90` scan skip
    entirely — the small-materialized-aggregates payoff every columnar
    engine banks on (prune rate near 0.9 means the predicate touches
    one segment in ten). The p90 threshold is PERCENTILE_DISC selected
    by exact integer cross-multiplication from the x100 histogram;
    per-day maxima fold exact int64; a day prunes iff day_max <= p90.
    Only the final rate divides, x1e6 snap."""
    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "ts", "value"]
    )

    def partial(b: pa.Table) -> pa.Table:
        b = _clean(b, ("event_type", "ts", "value"))
        us = b["ts"].cast(pa.timestamp("us")).cast(pa.int64()).to_numpy()
        d = (us // _DAY_US).astype(np.int64)
        x = _round_half_away_x(
            b["value"].to_numpy(zero_copy_only=False).astype(np.float64), 100.0
        )
        t = pa.table(
            {
                "event_type": b["event_type"],
                "d": pa.array(d),
                "x": pa.array(x),
                "c": pa.array(np.ones(len(x), np.int64)),
            }
        )
        # one pass emits BOTH the histogram rows (d = -1 sentinel) and
        # the per-day max partials
        g1 = t.group_by(["event_type", "x"]).aggregate([("c", "sum")])
        g1 = g1.select(["event_type", "x", "c_sum"]).rename_columns(
            ["event_type", "x", "c"]
        )
        g1 = g1.append_column(
            "d", pa.array(np.full(g1.num_rows, -1, np.int64))
        )
        g2 = t.group_by(["event_type", "d"]).aggregate([("x", "max")])
        g2 = g2.select(["event_type", "d", "x_max"]).rename_columns(
            ["event_type", "d", "x"]
        )
        g2 = g2.append_column(
            "c", pa.array(np.zeros(g2.num_rows, np.int64))
        )
        return pa.concat_tables(
            [g1.select(["event_type", "d", "x", "c"]),
             g2.select(["event_type", "d", "x", "c"])]
        )

    def combine(b: pa.Table) -> pa.Table:
        hist = b.filter(pc.equal(b["d"], -1))
        hg = hist.group_by(["event_type", "x"]).aggregate([("c", "sum")])
        hg = hg.select(["event_type", "x", "c_sum"]).rename_columns(
            ["event_type", "x", "c"]
        )
        hg = hg.append_column("d", pa.array(np.full(hg.num_rows, -1, np.int64)))
        days = b.filter(pc.not_equal(b["d"], -1))
        dg = days.group_by(["event_type", "d"]).aggregate([("x", "max")])
        dg = dg.select(["event_type", "d", "x_max"]).rename_columns(
            ["event_type", "d", "x"]
        )
        dg = dg.append_column("c", pa.array(np.zeros(dg.num_rows, np.int64)))
        return pa.concat_tables(
            [hg.select(["event_type", "d", "x", "c"]),
             dg.select(["event_type", "d", "x", "c"])]
        )

    merged = tree_merge(
        ev.map_batches(partial, batch_format="pyarrow", batch_size=None),
        combine,
    ).to_pandas()
    if not len(merged) or "event_type" not in merged.columns:
        return pa.table(
            {
                "event_type": pa.array([], pa.string()),
                "n_days": pa.array([], pa.int64()),
                "prunable": pa.array([], pa.int64()),
                "rate_x1e6": pa.array([], pa.int64()),
            }
        )
    out = {"event_type": [], "n_days": [], "prunable": [], "rate_x1e6": []}
    for et, g in merged.sort_values(["event_type", "d", "x"]).groupby(
        "event_type", sort=True
    ):
        hist = g[g["d"] == -1].sort_values("x")
        days = g[g["d"] != -1]
        cs = hist["c"].to_numpy(dtype=np.int64)
        xs = hist["x"].to_numpy(dtype=np.int64)
        n = int(cs.sum())
        if n == 0:
            continue
        cum = np.cumsum(cs)
        p90 = int(xs[int(np.argmax(10 * cum >= 9 * n))])
        dmax = days["x"].to_numpy(dtype=np.int64)
        nd = len(dmax)
        prun = int((dmax <= p90).sum())
        out["event_type"].append(et)
        out["n_days"].append(nd)
        out["prunable"].append(prun)
        out["rate_x1e6"].append(
            None
            if nd == 0
            else int(
                _round_half_away(np.array([float(prun) / nd * 1e6]))[0]
            )
        )
    return pa.table(
        {
            "event_type": pa.array(out["event_type"], pa.string()),
            "n_days": pa.array(out["n_days"], pa.int64()),
            "prunable": pa.array(out["prunable"], pa.int64()),
            "rate_x1e6": pa.array(out["rate_x1e6"], pa.int64()),
        }
    )


ZONEMAP_SQL = """
WITH v AS MATERIALIZED (
  SELECT event_type,
         CAST(FLOOR(EPOCH_US(ts) / 86400000000) AS BIGINT) AS d,
         CAST(ROUND(value * 100, 0) AS BIGINT) AS x
  FROM events
  WHERE event_type IS NOT NULL AND ts IS NOT NULL AND value IS NOT NULL
), p90 AS MATERIALIZED (
  SELECT event_type,
         CAST(PERCENTILE_DISC(0.9) WITHIN GROUP (ORDER BY x) AS BIGINT)
           AS p90
  FROM v GROUP BY 1
), dm AS MATERIALIZED (
  SELECT event_type, d, CAST(MAX(x) AS BIGINT) AS dmax
  FROM v GROUP BY 1, 2
)
SELECT dm.event_type, CAST(COUNT(*) AS BIGINT) AS n_days,
       CAST(SUM(CASE WHEN dm.dmax <= p90.p90 THEN 1 ELSE 0 END) AS BIGINT)
         AS prunable,
       CAST(ROUND(CAST(SUM(CASE WHEN dm.dmax <= p90.p90 THEN 1 ELSE 0 END)
                       AS DOUBLE) / COUNT(*) * 1000000, 0) AS BIGINT)
         AS rate_x1e6
FROM dm JOIN p90 ON p90.event_type = dm.event_type
GROUP BY 1 ORDER BY 1
"""


# ---------------------------------------------------------------------------
# Bloom-filter FPP planning from exact key cardinality
# ---------------------------------------------------------------------------


def q_bloom_fpp_plan(sf_dir):
    """Per event type: the expected false-positive probability of the
    anti-join Bloom filter at its configured geometry (2^20 bits, 6
    probes) loaded with the type's EXACT distinct-user count — fpp =
    (1 - (1 - 1/m)^(k n))^k, the capacity-planning check that says when
    the filter needs more bits before its prune rate collapses.
    Distinct users are exact (complete per hash bucket); the fpp
    formula is one mirrored POWER expression over identical integers,
    x1e9 snap (fpp is small)."""
    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "user_id"]
    )

    def prep(b: pa.Table) -> pa.Table:
        b = _clean(b, ("event_type", "user_id"))
        t = pa.table(
            {
                "event_type": b["event_type"],
                "user_id": b["user_id"].cast(pa.int64()),
            }
        )
        # batch-local distinct shrinks the shuffle
        g = t.group_by(["event_type", "user_id"]).aggregate([])
        return add_bucket(g, "user_id", 64)

    bucketed = ev.map_batches(prep, batch_format="pyarrow", batch_size=None)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame(
                {
                    "event_type": pd.Series([], dtype=object),
                    "ndv": pd.Series([], dtype=np.int64),
                }
            )
        d = g.drop_duplicates(["event_type", "user_id"])
        out = d.groupby("event_type", sort=False).size().rename("ndv")
        return out.reset_index().astype({"ndv": np.int64})

    ndv = tree_merge(
        bucketed.groupby(_BUCKET).map_groups(per_bucket, batch_format="pandas"),
        lambda b: _sum_by(b, ["event_type"], ["ndv"]),
    ).to_pandas()
    if not len(ndv) or "event_type" not in ndv.columns:
        return pa.table(
            {
                "event_type": pa.array([], pa.string()),
                "ndv": pa.array([], pa.int64()),
                "fpp_x1e9": pa.array([], pa.int64()),
            }
        )
    ndv = ndv.sort_values("event_type", ignore_index=True)
    fpps = []
    m = float(_BLOOM_BITS)
    for i in range(len(ndv)):
        n = int(ndv["ndv"].iloc[i])
        fpp = (1.0 - (1.0 - 1.0 / m) ** (float(_BLOOM_K) * n)) ** _BLOOM_K
        fpps.append(int(_round_half_away(np.array([fpp * 1e9]))[0]))
    return pa.table(
        {
            "event_type": pa.array(ndv["event_type"].tolist(), pa.string()),
            "ndv": pa.array(ndv["ndv"].to_numpy(dtype=np.int64)),
            "fpp_x1e9": pa.array(fpps, pa.int64()),
        }
    )


BLOOM_FPP_SQL = f"""
WITH a AS (
  SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS ndv
  FROM events
  WHERE event_type IS NOT NULL AND user_id IS NOT NULL
  GROUP BY 1
)
SELECT event_type, ndv,
       CAST(ROUND(
         POWER(1.0 - POWER(1.0 - 1.0 / {float(_BLOOM_BITS)!r},
                           {float(_BLOOM_K)!r} * ndv), {_BLOOM_K})
         * 1000000000, 0) AS BIGINT) AS fpp_x1e9
FROM a ORDER BY 1
"""


# ---------------------------------------------------------------------------
# modulo-partition load balance
# ---------------------------------------------------------------------------


def q_mod_partition_balance(sf_dir):
    """For a user_id % 32 partition layout: each partition's exact row
    load plus the straggler ratio max/mean — the skew audit run before
    committing a partitioning key (ratio near 1 = balanced; >> 1 means
    the job's wall-clock is one hot partition). Loads fold exact int64
    in one combiner-first pass; the ratio is one mirrored double, x1e6
    snap (emitted on every row for the driver's value compare)."""
    ev = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id"])

    def partial(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_valid(b["user_id"]))
        p = (
            b["user_id"].cast(pa.int64()).to_numpy() % _N_PARTS
        ).astype(np.int64)
        t = pa.table(
            {
                "part": pa.array(p),
                "load": pa.array(np.ones(len(p), np.int64)),
            }
        )
        return _sum_by(t, ["part"], ["load"])

    loads = tree_merge(
        ev.map_batches(partial, batch_format="pyarrow", batch_size=None),
        lambda b: _sum_by(b, ["part"], ["load"]),
    ).to_pandas()
    if not len(loads) or "part" not in loads.columns:
        return pa.table(
            {
                "part": pa.array([], pa.int64()),
                "load": pa.array([], pa.int64()),
                "straggler_x1e6": pa.array([], pa.int64()),
            }
        )
    loads = loads.sort_values("part", ignore_index=True)
    l = loads["load"].to_numpy(dtype=np.int64)
    total = int(l.sum())
    k = len(l)
    ratio = (
        None
        if total == 0
        else int(
            _round_half_away(
                np.array(
                    [float(l.max()) / (float(total) / k) * 1e6]
                )
            )[0]
        )
    )
    return pa.table(
        {
            "part": pa.array(loads["part"].to_numpy(dtype=np.int64)),
            "load": pa.array(l),
            "straggler_x1e6": pa.array([ratio] * k, pa.int64()),
        }
    )


MOD_PART_SQL = f"""
WITH l AS MATERIALIZED (
  SELECT user_id % {_N_PARTS} AS part, CAST(COUNT(*) AS BIGINT) AS load
  FROM events WHERE user_id IS NOT NULL GROUP BY 1
), s AS (
  SELECT CAST(SUM(load) AS BIGINT) AS total,
         CAST(MAX(load) AS BIGINT) AS mx,
         CAST(COUNT(*) AS BIGINT) AS k
  FROM l
)
SELECT CAST(l.part AS BIGINT) AS part, l.load,
       CASE WHEN s.total = 0 THEN NULL
            ELSE CAST(ROUND(CAST(s.mx AS DOUBLE)
                   / (CAST(s.total AS DOUBLE) / s.k) * 1000000, 0)
                 AS BIGINT) END AS straggler_x1e6
FROM l, s ORDER BY 1
"""


def register_r4di(queries: dict, oracles: dict) -> None:
    queries.update(
        {
            "zonemap_prune_rate": q_zonemap_prune_rate,
            "bloom_fpp_plan": q_bloom_fpp_plan,
            "mod_partition_balance": q_mod_partition_balance,
        }
    )
    oracles.update(
        {
            "zonemap_prune_rate": ZONEMAP_SQL,
            "bloom_fpp_plan": BLOOM_FPP_SQL,
            "mod_partition_balance": MOD_PART_SQL,
        }
    )
