"""J2 graft: parent-chain hierarchy closure.

The reference resolves every zone's full ancestor list by walking
``parent_id`` through an id->zone map built once from the whole stream
(/root/reference/src/bin/cosmogony2mimir.rs:127-145; the geofinder's
hierarchy walk at src/admin_geofinder.rs:171-184 is the same closure).

Ray Data shape: the hierarchy EDGES (id -> parent_id) are a dimension —
small relative to the fact stream — broadcast once; each fact batch
resolves its whole ancestor chain with ITERATED VECTORIZED lookups
(sorted-key searchsorted gather per level, hierarchies are shallow), never
a per-row walk. Output adds:

  * ``chain``: '/'-joined ids from the node up to its root,
  * ``depth``: number of ids in the chain,
  * ``root_id``: the chain's last element.

Partitioning assumption (custom-operator rule, SURVEY.md §2): the edge map
fits in one object-store broadcast (ancestor closures over dimension
hierarchies — source -> family -> org — are KB..MB scale). Cycles are cut
at ``max_depth`` (the reference's data model guarantees acyclic parents).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd


class _EdgeMap:
    """Sorted-array broadcast map id -> parent_id (None for roots)."""

    def __init__(self, ids, parents):
        keys = np.asarray(ids, dtype=object)
        order = np.argsort(keys, kind="stable")
        self.keys = keys[order]
        self.parents = np.asarray(parents, dtype=object)[order]

    def gather(self, queries: np.ndarray) -> np.ndarray:
        """parents[queries]; None for unknown ids / None inputs."""
        out = np.full(len(queries), None, dtype=object)
        mask = np.array([q is not None for q in queries], dtype=bool)
        if not mask.any() or len(self.keys) == 0:
            return out
        q = queries[mask]
        pos = np.searchsorted(self.keys, q)
        pos = np.clip(pos, 0, len(self.keys) - 1)
        hit = self.keys[pos] == q
        vals = np.full(len(q), None, dtype=object)
        vals[hit] = self.parents[pos[hit]]
        out[mask] = vals
        return out


class AncestorChain:
    """Shipped-instance stage appending chain/depth/root_id columns."""

    def __init__(self, edge_map: _EdgeMap, key_col: str, parent_col: str,
                 max_depth: int = 32):
        self.edges = edge_map
        self.key_col = key_col
        self.parent_col = parent_col
        self.max_depth = max_depth

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        keys = np.asarray(batch[self.key_col].to_pylist(), dtype=object)
        levels = [keys]
        cur = np.asarray(batch[self.parent_col].to_pylist(), dtype=object)
        depth_left = self.max_depth
        while depth_left > 0 and any(c is not None for c in cur):
            levels.append(cur.copy())
            cur = self.edges.gather(cur)
            depth_left -= 1
        level_arrays = [pa.array(lv, type=pa.string()) for lv in levels]
        chain = pc.binary_join_element_wise(
            *level_arrays, "/", null_handling="skip"
        )
        depth = np.zeros(n, dtype=np.int64)
        root = np.asarray(keys, dtype=object).copy()
        for lv in levels:
            present = np.array([x is not None for x in lv], dtype=bool)
            depth += present
            root[present] = lv[present]
        out = batch.append_column("chain", chain)
        out = out.append_column("depth", pa.array(depth))
        return out.append_column("root_id", pa.array(root, type=pa.string()))


class DependencyClosure:
    """S4 graft — the GENERIC transitive dependency closure over an
    arbitrary edge set (multi-parent DAGs/graphs), not just parent trees.

    The reference collects each object's full transitive dependency set
    from an id -> deps map built once over the stream
    (``get_objs_and_deps``, /root/reference/src/osm_reader/mod.rs:9-15).
    Ray shape: the edge set (src -> dst, duplicates tolerated) is a
    DIMENSION — broadcast once as a CSR over dense node codes; each fact
    batch expands its frontier level-by-level with vectorized gathers and
    an exact visited filter (packed (row, code) keys, overflow-safe
    chunking), so reconvergent DAG paths never re-expand. Cycles are cut
    by the visited filter itself; ``max_depth`` bounds alien inputs.

    Appends per row: ``n_deps`` (distinct transitive deps) and
    ``dep_sum`` (sum of dep ids — int ids only), both int64. Rows whose
    node has no deps get 0/0.

    Partitioning assumption (SURVEY.md §2 custom-operator rule): the edge
    set fits one object-store broadcast (dimension scale); the FACT side
    streams unbounded.
    """

    def __init__(self, edge_src, edge_dst, node_col: str = "node_id",
                 max_depth: int = 64):
        src = np.asarray(edge_src, dtype=np.int64)
        dst = np.asarray(edge_dst, dtype=np.int64)
        self.keys = np.unique(np.concatenate([src, dst]))
        s_code = np.searchsorted(self.keys, src)
        d_code = np.searchsorted(self.keys, dst)
        order = np.argsort(s_code, kind="stable")
        s_code, d_code = s_code[order], d_code[order]
        # CSR: for code c, deps are csr_dst[csr_off[c] : csr_off[c+1]]
        counts = np.bincount(s_code, minlength=len(self.keys))
        self.csr_off = np.zeros(len(self.keys) + 1, dtype=np.int64)
        np.cumsum(counts, out=self.csr_off[1:])
        self.csr_dst = d_code
        self.node_col = node_col
        self.max_depth = max_depth

    def _expand(self, rows: np.ndarray, codes: np.ndarray):
        """One level: all (row, dep_code) pairs of the frontier."""
        cnt = self.csr_off[codes + 1] - self.csr_off[codes]
        nz = cnt > 0
        if not nz.any():
            return (np.empty(0, np.int64),) * 2
        starts = self.csr_off[codes[nz]]
        c = cnt[nz]
        # gather each frontier entry's dep slice: global positions are
        # start_i + (0..c_i-1), built with one repeat + ramp subtraction
        idx = (
            np.repeat(starts, c)
            + (np.arange(c.sum()) - np.repeat(np.cumsum(c) - c, c))
        )
        return np.repeat(rows[nz], c), self.csr_dst[idx]

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        nodes = batch[self.node_col].cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        n_deps = np.zeros(n, dtype=np.int64)
        dep_sum = np.zeros(n, dtype=np.int64)
        if n and len(self.keys):
            k = np.int64(len(self.keys))
            # overflow-safe packed (row, code) keys: chunk rows so
            # chunk_rows * n_codes stays well under 2^63
            max_rows = max(1, int((np.iinfo(np.int64).max // 2) // k))
            for lo in range(0, n, max_rows):
                hi = min(lo + max_rows, n)
                sub = nodes[lo:hi]
                pos = np.searchsorted(self.keys, sub)
                posc = np.clip(pos, 0, len(self.keys) - 1)
                known = self.keys[posc] == sub
                rows0 = np.flatnonzero(known).astype(np.int64)
                codes0 = posc[known].astype(np.int64)
                f_rows, f_codes = self._expand(rows0, codes0)
                seen = np.unique(f_rows * k + f_codes)
                f_rows, f_codes = seen // k, seen % k  # dedupe the frontier
                depth = self.max_depth
                while len(f_rows) and depth > 0:
                    f_rows, f_codes = self._expand(f_rows, f_codes)
                    if not len(f_rows):
                        break
                    packed = f_rows * k + f_codes
                    fresh = ~np.isin(packed, seen)
                    packed = np.unique(packed[fresh])
                    if not len(packed):
                        break
                    seen = np.union1d(seen, packed)
                    f_rows, f_codes = packed // k, packed % k
                    depth -= 1
                if len(seen):
                    rows_all = (seen // k).astype(np.int64)
                    codes_all = (seen % k).astype(np.int64)
                    n_deps[lo:hi] += np.bincount(rows_all, minlength=hi - lo)
                    # exact int64 scatter-add (float bincount weights would
                    # lose precision past 2^53)
                    np.add.at(dep_sum[lo:hi], rows_all, self.keys[codes_all])
        out = batch.append_column("n_deps", pa.array(n_deps))
        return out.append_column("dep_sum", pa.array(dep_sum))


def dependency_closure(
    ds: "rd.Dataset",
    edge_src,
    edge_dst,
    node_col: str = "node_id",
    max_depth: int = 64,
) -> "rd.Dataset":
    """Append each row's transitive-dependency aggregates (n_deps,
    dep_sum) resolved through the broadcast (edge_src -> edge_dst) set.
    See ``DependencyClosure``."""
    stage = DependencyClosure(edge_src, edge_dst, node_col, max_depth)
    return ds.map_batches(stage, batch_format="pyarrow", batch_size=None)


def ancestor_chain(
    ds: "rd.Dataset",
    edge_ids,
    edge_parents,
    key_col: str = "node_id",
    parent_col: str = "parent_id",
    max_depth: int = 32,
) -> "rd.Dataset":
    """Append each row's full ancestor chain resolved through the broadcast
    (edge_ids -> edge_parents) hierarchy map. ``parent_col`` holds the
    row's IMMEDIATE parent (None for roots); deeper ancestors come from
    the map."""
    stage = AncestorChain(
        _EdgeMap(edge_ids, edge_parents), key_col, parent_col, max_depth
    )
    return ds.map_batches(stage, batch_format="pyarrow", batch_size=None)


def integer_pagerank(
    ds: "rd.Dataset",
    edge_src,
    edge_dst,
    node_col: str = "node_id",
    iters: int = 3,
    init_pr: int = 10**9,
    damp_num: int = 85,
    damp_den: int = 100,
) -> "rd.Dataset":
    """PageRank over a broadcast (src -> dst) edge set in EXACT integer
    arithmetic — the iterative-algorithm shape (power iteration) with a
    cross-engine-reproducible fixed point:

        pr_0(v)     = init_pr
        share_t(u)  = (pr_t(u) * damp_num) // (outdeg(u) * damp_den)
        pr_{t+1}(v) = base + sum_{u -> v} share_t(u),
        base        = (init_pr * (damp_den - damp_num)) // damp_den

    Every operation is int64 floor-division / addition, so the result is
    bit-identical under ANY summation order or partitioning — an
    unrolled-SQL oracle can verify an iterative distributed algorithm
    exactly (the same per-term-quantization discipline the window family
    uses, applied per ITERATION). Dangling nodes keep base only (no
    redistribution), matching the oracle's LEFT JOIN shape.

    Scale shape: the edge set is dimension-scale and ships once
    (ray.put'd CSR by src, same contract as DependencyClosure); each
    iteration is one vectorized map_batches over the pr Dataset
    (searchsorted src-range -> np.repeat share emission) followed by a
    tree-merged integer sum per dst and a union with the per-node base —
    no per-iteration all-to-all beyond the bounded (nodes) aggregate.
    Graph roots/leaves cite the reference's admin hierarchy walk
    (/root/reference/src/admin_geofinder.rs iterative parent climb).

    Output: node_col (int64), pr (int64) — one row per input node.
    """
    import ray

    from mimirsbrunn_ray.stages.rollup import tree_merge

    src = np.asarray(edge_src, dtype=np.int64)
    dst = np.asarray(edge_dst, dtype=np.int64)
    order = np.argsort(src, kind="stable")
    src_sorted, dst_sorted = src[order], dst[order]
    # outdegree per distinct src (CSR row extents)
    uniq_src, counts = np.unique(src_sorted, return_counts=True)
    edges_ref = ray.put((src_sorted, dst_sorted, uniq_src, counts))
    base = (init_pr * (damp_den - damp_num)) // damp_den

    def init_nodes(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_valid(b[node_col]))
        n = b.num_rows
        return pa.table(
            {
                "v": b[node_col].cast(pa.int64()),
                "pr": pa.array(np.full(n, init_pr, dtype=np.int64)),
            }
        )

    pr = ds.map_batches(init_nodes, batch_format="pyarrow", batch_size=None)
    nodes = pr.map_batches(
        lambda b: b.select(["v"]), batch_format="pyarrow", batch_size=None
    ).materialize()

    for _ in range(iters):
        def emit_shares(b: pa.Table, _ref=edges_ref) -> pa.Table:
            s_src, s_dst, u_src, u_cnt = ray.get(_ref)
            v = b["v"].to_numpy()
            p = b["pr"].to_numpy()
            # outdegree of each v (0 if dangling)
            pos = np.searchsorted(u_src, v)
            pos = np.clip(pos, 0, max(len(u_src) - 1, 0))
            has = (len(u_src) > 0) & (u_src[pos] == v) if len(u_src) else np.zeros(len(v), bool)
            deg = np.where(has, u_cnt[pos] if len(u_src) else 0, 0).astype(np.int64)
            keep = deg > 0
            v, p, deg = v[keep], p[keep], deg[keep]
            share = (p * damp_num) // (deg * damp_den)
            lo = np.searchsorted(s_src, v, side="left")
            hi = np.searchsorted(s_src, v, side="right")
            n_each = hi - lo  # == deg
            # gather every out-edge target of every v, vectorized
            idx = np.repeat(lo, n_each) + (
                np.arange(int(n_each.sum())) - np.repeat(np.cumsum(n_each) - n_each, n_each)
            )
            return pa.table(
                {
                    "v": pa.array(s_dst[idx]),
                    "c": pa.array(np.repeat(share, n_each)),
                }
            )

        contribs = pr.map_batches(emit_shares, batch_format="pyarrow", batch_size=None)
        based = nodes.map_batches(
            lambda b: pa.table(
                {
                    "v": b["v"],
                    "c": pa.array(np.full(b.num_rows, base, dtype=np.int64)),
                }
            ),
            batch_format="pyarrow",
            batch_size=None,
        )
        pr = tree_merge(
            contribs.union(based),
            lambda b: b.group_by(["v"]).aggregate([("c", "sum")]).rename_columns(["v", "c"]),
            final_shards=4,
            shard_cols=["v"],
        ).map_batches(
            lambda b: b.rename_columns(["v", "pr"]),
            batch_format="pyarrow",
            batch_size=None,
        ).materialize()

    return pr.map_batches(
        lambda b: b.rename_columns([node_col, "pr"]),
        batch_format="pyarrow",
        batch_size=None,
    )
