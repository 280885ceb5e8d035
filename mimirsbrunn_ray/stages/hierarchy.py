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
