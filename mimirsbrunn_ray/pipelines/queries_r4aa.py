"""Round-4 batch AA: approximate string matching (Levenshtein nearest
name), multi-source BFS hop distance over the dependency DAG, and
Spearman rank correlation from a joint value histogram.

Exactness discipline: Levenshtein distances and BFS hop counts are
integers; Spearman is computed as a closed-form ratio of exact integer
rank sums (2x-scaled average ranks so ties stay integral), with both
engines evaluating the identical IEEE double expression
num / (sqrt(d1) * sqrt(d2)) before one x1e6 rounding.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from mimirsbrunn_ray.stages.rollup import tree_merge

_HOUR_US = 3_600_000_000


def _round_half_away(x: np.ndarray) -> np.ndarray:
    return np.where(
        x >= 0, np.floor(x + 0.5), np.ceil(x - 0.5)
    ).astype(np.int64)


# ---------------------------------------------------------------------------
# Levenshtein nearest customer name per probe string
# ---------------------------------------------------------------------------

# deliberately misspelled / truncated forms of real c_name values — the
# "did you mean" lookup a fuzzy-matching entity resolver runs
_LEV_PROBES = [
    "Customer#000000042",   # exact hit -> distance 0
    "Custmoer#000000101",   # transposition
    "Customer#00000007",    # one char short
    "customer#000000013",   # case flip on the prefix
]


def _lev_batch(probe: str, names: np.ndarray) -> np.ndarray:
    """Levenshtein distance from one probe to every name in the batch,
    vectorized across the batch: the classic DP, looping only over the
    probe x max-name-length grid (~20x25 scalar steps), each step a
    numpy op over all rows at once. No per-row Python loop."""
    m = len(probe)
    if len(names) == 0:
        return np.zeros(0, dtype=np.int64)
    lens = np.char.str_len(names.astype(str))
    lmax = int(lens.max())
    # byte matrix (rows x lmax), padded with an impossible sentinel
    mat = np.full((len(names), lmax), -1, dtype=np.int32)
    for j, s in enumerate(names):  # build once per batch; cheap vs DP
        b = np.frombuffer(str(s).encode("utf-8"), dtype=np.uint8)
        mat[j, : len(b)] = b
    pb = np.frombuffer(probe.encode("utf-8"), dtype=np.uint8)
    prev = np.tile(np.arange(lmax + 1, dtype=np.int32), (len(names), 1))
    for i in range(1, m + 1):
        curr = np.empty_like(prev)
        curr[:, 0] = i
        sub = prev[:, :-1] + (mat != pb[i - 1])
        for jj in range(1, lmax + 1):
            curr[:, jj] = np.minimum(
                np.minimum(curr[:, jj - 1] + 1, prev[:, jj] + 1),
                sub[:, jj - 1],
            )
        prev = curr
    return prev[np.arange(len(names)), lens].astype(np.int64)


def q_levenshtein_probe_customers(sf_dir):
    """For each probe string, the customer name with the smallest edit
    distance (ties broken by name) — one streaming pass: every batch
    emits its per-probe argmin, tree-merged by the same (dist, name)
    order. The probe list is broadcast-in-closure (bytes-sized)."""
    cust = rd.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_name"]
    )

    def partial(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_valid(b["c_name"]))
        names = b["c_name"].to_numpy(zero_copy_only=False)
        out = {"probe": [], "best_name": [], "dist": []}
        for p in _LEV_PROBES:
            if len(names) == 0:
                continue
            d = _lev_batch(p, names)
            lo = d.min()
            cand = names[d == lo]
            out["probe"].append(p)
            out["best_name"].append(min(cand))
            out["dist"].append(int(lo))
        return pa.table(
            {
                "probe": pa.array(out["probe"], pa.string()),
                "best_name": pa.array(out["best_name"], pa.string()),
                "dist": pa.array(out["dist"], pa.int64()),
            }
        )

    def combine(b: pa.Table) -> pa.Table:
        df = b.to_pandas()
        df = df.sort_values(["probe", "dist", "best_name"]).groupby(
            "probe", sort=True, as_index=False
        ).first()
        return pa.Table.from_pandas(
            df[["probe", "best_name", "dist"]], preserve_index=False
        )

    return tree_merge(
        cust.map_batches(partial, batch_format="pyarrow", batch_size=None),
        combine,
    )


_probes_sql = ", ".join(f"('{p}')" for p in _LEV_PROBES)
LEVENSHTEIN_SQL = f"""
WITH probes(probe) AS (VALUES {_probes_sql}),
d AS (
  SELECT p.probe, c.c_name AS best_name,
         CAST(levenshtein(p.probe, c.c_name) AS BIGINT) AS dist
  FROM probes p CROSS JOIN customer c
  WHERE c.c_name IS NOT NULL
)
SELECT probe, best_name, dist FROM d
QUALIFY ROW_NUMBER() OVER (PARTITION BY probe ORDER BY dist, best_name) = 1
"""


# ---------------------------------------------------------------------------
# BFS hop distance to the dependency root
# ---------------------------------------------------------------------------


def q_part_dep_hops(sf_dir):
    """Minimum hop count from each part to the root (part 1) along the
    k -> k//2 / k -> k//3 dependency edges — the 'how deep is this
    node's supply chain' complement to part_dep_closure's reachability
    set. The edge map is dimension-scale, so the hop table is built
    once by a vectorized sweep in key order (dist[k] = 1 +
    min(dist[k//2], dist[k//3])) and attached to the part rows by one
    broadcast lookup — the CSR-broadcast discipline of
    stages/hierarchy.py:dependency_closure."""
    part = rd.read_parquet(f"{sf_dir}/part.parquet", columns=["p_partkey"])
    _mx_raw = part.max("p_partkey")
    mx = int(_mx_raw) if _mx_raw is not None else 0
    dist = np.full(mx + 1, -1, dtype=np.int64)
    if mx >= 1:
        dist[1] = 0
        ks = np.arange(2, mx + 1)
        # key order guarantees both parents are already final (k//2,
        # k//3 < k); the sweep is O(max key) ints, dimension-scale
        for k in ks:
            best = dist[k // 2]
            if k >= 3 and dist[k // 3] >= 0:
                best = dist[k // 3] if best < 0 else min(best, dist[k // 3])
            dist[k] = best + 1 if best >= 0 else -1
    import ray

    dist_ref = ray.put(dist)

    def attach(b: pa.Table) -> pa.Table:
        d = ray.get(dist_ref)
        keys = b["p_partkey"].cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        ok = (keys >= 1) & (keys <= mx)
        keys = keys[ok]
        hops = d[keys]
        keep = hops >= 0
        return pa.table(
            {
                "node": pa.array(keys[keep], pa.int64()),
                "hops": pa.array(hops[keep], pa.int64()),
            }
        )

    return part.map_batches(
        attach, batch_format="pyarrow", batch_size=None
    ).sort("node")


PART_DEP_HOPS_SQL = """
WITH RECURSIVE edges AS (
  SELECT p_partkey AS src, p_partkey // 2 AS dst
  FROM part WHERE p_partkey >= 2
  UNION ALL
  SELECT p_partkey, p_partkey // 3 FROM part WHERE p_partkey >= 3
),
walk(node, d) AS (
  SELECT CAST(1 AS BIGINT), CAST(0 AS BIGINT)
  UNION
  SELECT e.src, w.d + 1 FROM walk w JOIN edges e ON e.dst = w.node
)
SELECT node, CAST(MIN(d) AS BIGINT) AS hops
FROM walk
WHERE node IN (SELECT p_partkey FROM part)
GROUP BY node ORDER BY node
"""


# ---------------------------------------------------------------------------
# Spearman rank correlation: value vs hour-of-day, per event type
# ---------------------------------------------------------------------------


def q_spearman_value_hour(sf_dir):
    """Per-type Spearman rank correlation between event value (cents)
    and hour-of-day — the monotonic-association twin of the Pearson
    value_hour_corr. Average tied ranks depend only on the joint
    (type, cents, hour) histogram: one decomposable count pass
    tree-merges into a table bounded by types x |cents domain| x 24;
    the driver forms 2x-scaled average ranks from the marginals and the
    exact integer sums (n, Sx, Sy, Sxx, Syy, Sxy) over rank pairs, then
    both engines evaluate the identical closed-form double ratio."""
    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "ts", "value"]
    )

    def partial(b: pa.Table) -> pa.Table:
        b = b.filter(
            pc.and_(
                pc.and_(
                    pc.is_valid(b["event_type"]), pc.is_valid(b["value"])
                ),
                pc.is_valid(b["ts"]),
            )
        )
        ts_us = b["ts"].cast(pa.timestamp("us")).cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        hour = ((ts_us // _HOUR_US) % 24).astype(np.int64)
        x = _round_half_away(
            b["value"].cast(pa.float64()).to_numpy(zero_copy_only=False)
            * 100.0
        )
        t = pa.table(
            {
                "event_type": b["event_type"],
                "x": pa.array(x),
                "h": pa.array(hour),
            }
        )
        g = t.group_by(["event_type", "x", "h"]).aggregate(
            [([], "count_all")]
        )
        g = g.select(["event_type", "x", "h", "count_all"])
        return g.rename_columns(["event_type", "x", "h", "n"])

    def combine(b: pa.Table) -> pa.Table:
        g = b.group_by(["event_type", "x", "h"]).aggregate([("n", "sum")])
        return g.rename_columns(["event_type", "x", "h", "n"])

    hist = tree_merge(
        ev.map_batches(partial, batch_format="pyarrow", batch_size=None),
        combine,
    ).to_pandas()  # bounded: types x cents domain x 24

    rows = {"event_type": [], "n": [], "spearman_x1e6": []}
    if len(hist):
        for et, g in hist.groupby("event_type", sort=True):
            n = int(g["n"].sum())
            # 2x average rank per distinct value, from each marginal
            def ranks2(col):
                m = g.groupby(col)["n"].sum().sort_index()
                c = m.to_numpy(dtype=np.int64)
                cum_before = np.concatenate(([0], np.cumsum(c)[:-1]))
                return pd.Series(
                    2 * cum_before + c + 1, index=m.index, dtype=np.int64
                )
            rx = g["x"].map(ranks2("x")).to_numpy(dtype=np.int64)
            ry = g["h"].map(ranks2("h")).to_numpy(dtype=np.int64)
            c = g["n"].to_numpy(dtype=np.int64)
            sx = int(np.dot(c, rx))
            sy = int(np.dot(c, ry))
            sxx = int(np.dot(c, rx * rx))
            syy = int(np.dot(c, ry * ry))
            sxy = int(np.dot(c, rx * ry))
            num = n * sxy - sx * sy
            d1 = n * sxx - sx * sx
            d2 = n * syy - sy * sy
            rows["event_type"].append(et)
            rows["n"].append(n)
            if d1 > 0 and d2 > 0:
                rho = float(num) / (
                    np.sqrt(np.float64(d1)) * np.sqrt(np.float64(d2))
                )
                rows["spearman_x1e6"].append(
                    int(_round_half_away(np.array([rho * 1e6]))[0])
                )
            else:
                rows["spearman_x1e6"].append(None)
    return pa.table(
        {
            "event_type": pa.array(rows["event_type"], pa.string()),
            "n": pa.array(rows["n"], pa.int64()),
            "spearman_x1e6": pa.array(rows["spearman_x1e6"], pa.int64()),
        }
    )


SPEARMAN_SQL = """
WITH v AS (
  SELECT event_type,
         CAST(ROUND(value * 100, 0) AS BIGINT) AS x,
         CAST(hour(ts) AS BIGINT) AS h
  FROM events
  WHERE event_type IS NOT NULL AND value IS NOT NULL AND ts IS NOT NULL
), r AS (
  SELECT event_type,
         2 * RANK() OVER (PARTITION BY event_type ORDER BY x)
           + COUNT(*) OVER (PARTITION BY event_type, x) - 1 AS rx,
         2 * RANK() OVER (PARTITION BY event_type ORDER BY h)
           + COUNT(*) OVER (PARTITION BY event_type, h) - 1 AS ry
  FROM v
), s AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(rx) AS BIGINT) AS sx, CAST(SUM(ry) AS BIGINT) AS sy,
         CAST(SUM(rx * rx) AS BIGINT) AS sxx,
         CAST(SUM(ry * ry) AS BIGINT) AS syy,
         CAST(SUM(rx * ry) AS BIGINT) AS sxy
  FROM r GROUP BY 1
)
SELECT event_type, n,
       CASE WHEN n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0
            THEN CAST(ROUND(
              CAST(n * sxy - sx * sy AS DOUBLE)
              / (SQRT(CAST(n * sxx - sx * sx AS DOUBLE))
                 * SQRT(CAST(n * syy - sy * sy AS DOUBLE))) * 1000000,
              0) AS BIGINT)
            ELSE NULL END AS spearman_x1e6
FROM s
"""


def register_r4aa(queries: dict, oracles: dict) -> None:
    queries.update(
        {
            "levenshtein_probe_customers": q_levenshtein_probe_customers,
            "part_dep_hops": q_part_dep_hops,
            "spearman_value_hour": q_spearman_value_hour,
        }
    )
    oracles.update(
        {
            "levenshtein_probe_customers": LEVENSHTEIN_SQL,
            "part_dep_hops": PART_DEP_HOPS_SQL,
            "spearman_value_hour": SPEARMAN_SQL,
        }
    )
