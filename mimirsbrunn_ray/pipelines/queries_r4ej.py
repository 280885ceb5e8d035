"""Round-4 batch EJ: graph analytics over the deterministic part
dependency graph (k -> k//2, k -> k//3, the part_dep_closure edge
set) — the rich-club coefficient curve, per-edge neighbor-set Jaccard
similarity, and integer-exact 3-iteration HITS hub/authority scores.

Exactness discipline: all three operate on exact integer degree /
count structures; rich-club and Jaccard close with one snapped ratio
per row, and HITS runs UNNORMALIZED so every score is an exact int64
(the power iteration mirrors bit-for-bit against an unrolled SQL
join chain, the part_pagerank discipline). The graph is
dimension-scale (#parts), so the adjacency broadcasts — the same
documented assumption as part_dep_closure / part_triangles."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd


def _round_half_away(x: float) -> int:
    return int(np.floor(x + 0.5) if x >= 0 else np.ceil(x - 0.5))


def _dep_edges(sf_dir):
    """Directed dependency edges (src, dst) and the node bound mx."""
    part = rd.read_parquet(f"{sf_dir}/part.parquet", columns=["p_partkey"])
    mx_raw = part.max("p_partkey")
    mx = int(mx_raw) if mx_raw is not None else 0  # empty-corpus guard
    ks = np.arange(2, mx + 1, dtype=np.int64)
    src = np.concatenate([ks, ks[ks >= 3]])
    dst = np.concatenate([ks // 2, ks[ks >= 3] // 3])
    return src, dst, mx


def _undirected(src, dst, mx):
    """Dedup'd undirected edge list (u < v), sorted by packed key."""
    keep = src != dst
    u = np.minimum(src, dst)[keep]
    v = np.maximum(src, dst)[keep]
    K = np.int64(mx + 2)
    packed = np.unique(u * K + v)
    return packed // K, packed % K, K


_EDGES_SQL = """
nodes AS (
  SELECT p_partkey AS v FROM part WHERE p_partkey IS NOT NULL
),
raw AS (
  SELECT p_partkey AS src, p_partkey // 2 AS dst
  FROM part WHERE p_partkey >= 2
  UNION ALL
  SELECT p_partkey, p_partkey // 3 FROM part WHERE p_partkey >= 3
),
uedges AS (
  SELECT DISTINCT LEAST(src, dst) AS u, GREATEST(src, dst) AS v
  FROM raw WHERE src <> dst
),
adj AS (
  SELECT u AS a, v AS b FROM uedges
  UNION ALL
  SELECT v AS a, u AS b FROM uedges
),
deg AS (
  SELECT a, CAST(COUNT(*) AS BIGINT) AS deg FROM adj GROUP BY 1
)
"""


# ---------------------------------------------------------------------------
# Rich-club coefficient curve
# ---------------------------------------------------------------------------


def q_rich_club_dependency(sf_dir):
    """Rich-club coefficient phi(k) of the undirected dependency
    graph: among nodes with degree > k, the realized fraction of
    possible edges — rising phi(k) means hubs preferentially link to
    hubs. For every k in 1..max_degree with at least two qualifying
    nodes: n_rich (exact), n_edges among them (exact), and
    phi = 2*E / (R*(R-1)) snapped x1e6. Degree counting and the
    per-k edge filter are pure integer ops over the bounded
    (dimension-scale) edge list."""
    src, dst, mx = _dep_edges(sf_dir)
    eu, ev, _ = _undirected(src, dst, mx)
    deg = np.bincount(
        np.concatenate([eu, ev]), minlength=mx + 2
    ).astype(np.int64)
    cols = ["k", "n_rich", "n_edges", "phi_x1e6"]
    out = {c: [] for c in cols}
    if len(eu):
        du, dv = deg[eu], deg[ev]
        for k in range(1, int(deg.max())):
            r = int(np.sum(deg > k))
            if r < 2:
                continue
            e = int(np.sum((du > k) & (dv > k)))
            phi = 2.0 * float(e) / (float(r) * (float(r) - 1.0)) * 1e6
            out["k"].append(k)
            out["n_rich"].append(r)
            out["n_edges"].append(e)
            out["phi_x1e6"].append(_round_half_away(phi))
    return pa.table({c: pa.array(out[c], pa.int64()) for c in cols})


RICH_CLUB_SQL = (
    "WITH "
    + _EDGES_SQL
    + """
, ks AS (
  SELECT unnest(generate_series(1, (SELECT MAX(deg) - 1 FROM deg))) AS k
), rk AS (
  SELECT k.k, CAST(COUNT(*) AS BIGINT) AS n_rich
  FROM ks k JOIN deg d ON d.deg > k.k
  GROUP BY 1
), ek AS (
  SELECT k.k, CAST(COUNT(*) AS BIGINT) AS n_edges
  FROM ks k
  JOIN uedges e ON TRUE
  JOIN deg du ON du.a = e.u AND du.deg > k.k
  JOIN deg dv ON dv.a = e.v AND dv.deg > k.k
  GROUP BY 1
)
SELECT r.k, r.n_rich, COALESCE(e.n_edges, 0) AS n_edges,
       CAST(ROUND(2.0 * CAST(COALESCE(e.n_edges, 0) AS DOUBLE)
            / (CAST(r.n_rich AS DOUBLE)
               * (CAST(r.n_rich AS DOUBLE) - 1.0)) * 1000000.0, 0)
            AS BIGINT) AS phi_x1e6
FROM rk r LEFT JOIN ek e ON e.k = r.k
WHERE r.n_rich >= 2
ORDER BY 1
"""
)


# ---------------------------------------------------------------------------
# Per-edge neighbor-set Jaccard
# ---------------------------------------------------------------------------


def q_dep_neighbor_jaccard(sf_dir):
    """Per undirected dependency edge (u, v): the Jaccard similarity
    of the two endpoints' neighbor sets — |N(u) & N(v)| /
    |N(u) | N(v)| — the local redundancy / structural-equivalence
    measure (1 means the edge is embedded in a clique, 0 a pure
    bridge). Common-neighbor counting is the triangle membership
    trick: expand N(u) per edge via CSR repeat-offsets, resolve
    (v, w) membership with ONE searchsorted against the packed
    adjacency keys — zero Python loops. Union = deg(u)+deg(v)-common
    (endpoint memberships cancel exactly)."""
    src, dst, mx = _dep_edges(sf_dir)
    eu, ev, K = _undirected(src, dst, mx)
    cols = ["u", "v", "n_common", "n_union", "jacc_x1e6"]
    if not len(eu):
        return pa.table({c: pa.array([], pa.int64()) for c in cols})
    # full (both-direction) adjacency, CSR over a
    a = np.concatenate([eu, ev])
    b = np.concatenate([ev, eu])
    order = np.argsort(a * K + b, kind="stable")
    a, b = a[order], b[order]
    keys = a * K + b  # sorted
    deg = np.bincount(a, minlength=mx + 2).astype(np.int64)
    indptr = np.concatenate(([0], np.cumsum(deg)))
    # expand N(u) per edge
    du = deg[eu]
    row = np.repeat(np.arange(len(eu)), du)
    within = np.arange(len(row)) - np.repeat(np.cumsum(du) - du, du)
    w = b[np.repeat(indptr[eu], du) + within]
    probe = ev[row] * K + w
    pos = np.clip(np.searchsorted(keys, probe), 0, len(keys) - 1)
    hit = keys[pos] == probe
    common = np.bincount(row[hit], minlength=len(eu)).astype(np.int64)
    union = deg[eu] + deg[ev] - common
    jacc = np.array(
        [
            _round_half_away(float(c) / float(un) * 1e6)
            for c, un in zip(common, union)
        ],
        dtype=np.int64,
    )
    return pa.table(
        {
            "u": pa.array(eu),
            "v": pa.array(ev),
            "n_common": pa.array(common),
            "n_union": pa.array(union),
            "jacc_x1e6": pa.array(jacc),
        }
    )


NEIGHBOR_JACCARD_SQL = (
    "WITH "
    + _EDGES_SQL
    + """
, common AS (
  SELECT e.u, e.v, CAST(COUNT(*) AS BIGINT) AS c
  FROM uedges e
  JOIN adj a1 ON a1.a = e.u
  JOIN adj a2 ON a2.a = e.v AND a2.b = a1.b
  GROUP BY 1, 2
)
SELECT e.u, e.v,
       COALESCE(c.c, 0) AS n_common,
       du.deg + dv.deg - COALESCE(c.c, 0) AS n_union,
       CAST(ROUND(CAST(COALESCE(c.c, 0) AS DOUBLE)
            / CAST(du.deg + dv.deg - COALESCE(c.c, 0) AS DOUBLE)
            * 1000000.0, 0) AS BIGINT) AS jacc_x1e6
FROM uedges e
JOIN deg du ON du.a = e.u
JOIN deg dv ON dv.a = e.v
LEFT JOIN common c ON c.u = e.u AND c.v = e.v
ORDER BY 1, 2
"""
)


# ---------------------------------------------------------------------------
# Integer-exact 3-iteration HITS
# ---------------------------------------------------------------------------


def q_part_hits_scores(sf_dir):
    """3-iteration HITS hub/authority scores over the DIRECTED
    dependency DAG (k -> k//2, k -> k//3) — the eigenvector-pair
    companion to part_pagerank. Run UNNORMALIZED so every iterate is
    an exact int64 (h0 = 1; a_t(i) = sum of h_{t-1} over in-neighbors;
    h_t(i) = sum of a_t over out-neighbors), verified bit-for-bit by
    an unrolled SQL join chain — no float normalization to diverge.
    Scores stay tiny (bounded by max_degree^(2*iters))."""
    src, dst, mx = _dep_edges(sf_dir)
    n = mx + 2
    h = np.ones(n, dtype=np.int64)
    a = np.zeros(n, dtype=np.int64)
    for _ in range(3):
        a = np.zeros(n, dtype=np.int64)
        np.add.at(a, dst, h[src])
        h = np.zeros(n, dtype=np.int64)
        np.add.at(h, src, a[dst])
    # the output IS the node-grain score table (one row per part), so
    # pulling the key vector equals pulling the result; gate it anyway
    from mimirsbrunn_ray.stages.broadcast import dim_fits

    if not dim_fits(sf_dir, "part"):  # pragma: no cover - scale path
        raise NotImplementedError(
            "distributed HITS: per-iteration edge-aggregation via "
            "tree_merge (q_part_components' label-propagation shape)")
    _kdf = rd.read_parquet(
        f"{sf_dir}/part.parquet", columns=["p_partkey"]).to_pandas()
    keys = (_kdf["p_partkey"].dropna().to_numpy(dtype=np.int64)
            if "p_partkey" in _kdf.columns
            else np.array([], dtype=np.int64))
    nodes = np.sort(np.unique(keys))
    return pa.table(
        {
            "node": pa.array(nodes),
            "auth3": pa.array(a[nodes]),
            "hub3": pa.array(h[nodes]),
        }
    )


_HITS_ITER = """
a{n} AS (
  SELECT nd.v, COALESCE(SUM(h.h), 0) AS a
  FROM nodes nd
  LEFT JOIN dedges e ON e.dst = nd.v
  LEFT JOIN h{m} h ON h.v = e.src
  GROUP BY nd.v
),
h{n} AS (
  SELECT nd.v, COALESCE(SUM(a.a), 0) AS h
  FROM nodes nd
  LEFT JOIN dedges e ON e.src = nd.v
  LEFT JOIN a{n} a ON a.v = e.dst
  GROUP BY nd.v
)"""

HITS_SQL = (
    """
WITH nodes AS (
  SELECT p_partkey AS v FROM part WHERE p_partkey IS NOT NULL
),
dedges AS (
  SELECT p_partkey AS src, p_partkey // 2 AS dst
  FROM part WHERE p_partkey >= 2
  UNION ALL
  SELECT p_partkey, p_partkey // 3 FROM part WHERE p_partkey >= 3
),
h0 AS (SELECT v, CAST(1 AS BIGINT) AS h FROM nodes),"""
    + _HITS_ITER.format(n=1, m=0)
    + ","
    + _HITS_ITER.format(n=2, m=1)
    + ","
    + _HITS_ITER.format(n=3, m=2)
    + """
SELECT a3.v AS node, CAST(a3.a AS BIGINT) AS auth3,
       CAST(h3.h AS BIGINT) AS hub3
FROM a3 JOIN h3 ON h3.v = a3.v
ORDER BY node
"""
)


def register_r4ej(queries: dict, oracles: dict) -> None:
    queries.update(
        {
            "rich_club_dependency": q_rich_club_dependency,
            "dep_neighbor_jaccard": q_dep_neighbor_jaccard,
            "part_hits_scores": q_part_hits_scores,
        }
    )
    oracles.update(
        {
            "rich_club_dependency": RICH_CLUB_SQL,
            "dep_neighbor_jaccard": NEIGHBOR_JACCARD_SQL,
            "part_hits_scores": HITS_SQL,
        }
    )
