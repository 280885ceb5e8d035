"""Similarity search over an embedding column (list<float>).

Brute-force cosine top-k is the exact baseline: a broadcast query matrix
(ray.put once, resolved once per actor) with one numpy matmul per batch and
a per-batch partial top-k, merged by tree-reduction — the same
partial+final aggregate shape as the rollups. IVF is the scale path: a
deterministic mini-kmeans coarse quantizer fit on a sample; each batch
searches only the ``nprobe`` nearest inverted lists.

(The reference's nearest-neighbor analog is the reverse-geocode top-1
proximity query, /root/reference/libs/mimir/src/rubber.rs:513-547.)
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd


def _to_matrix(col) -> np.ndarray:
    """Densify a FIXED-DIM list<float> column: one list_flatten + reshape
    (no per-row Python). Falls back to the row loop only for ragged /
    null-bearing inputs, which fixed-dim embedding columns never are."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    try:
        flat = pc.list_flatten(arr).to_numpy(zero_copy_only=False)
        return flat.astype(np.float64, copy=False).reshape(len(arr), -1)
    except ValueError:
        return np.stack(
            [np.asarray(v, dtype=np.float64) for v in arr.to_pylist()]
        )


def _unit(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    return m / np.where(n == 0, 1, n)


def knn_bruteforce(
    emb: "rd.Dataset",
    queries: np.ndarray,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    concurrency=None,
) -> pd.DataFrame:
    """Exact cosine top-k for each query row.

    Returns (query_id, vec_id, cosine) with exactly k rows per query,
    deterministic tie-break by vec_id ascending.
    """
    import ray

    from mimirsbrunn_ray.context import pool_size

    q_unit = _unit(np.asarray(queries, dtype=np.float64))
    q_ref = ray.put(q_unit)

    class PartialTopK:
        def __init__(self):
            self.q = ray.get(q_ref)  # once per actor

        def __call__(self, b: pa.Table) -> pa.Table:
            vecs = _unit(_to_matrix(b[vec_col]))
            ids = b[id_col].to_numpy(zero_copy_only=False)
            sims = vecs @ self.q.T  # (n, nq)
            nq = sims.shape[1]
            kk = min(k, sims.shape[0])
            out_q, out_id, out_sim = [], [], []
            for qi in range(nq):
                s = sims[:, qi]
                top = np.argpartition(-s, kk - 1)[:kk]
                out_q.extend([qi] * kk)
                out_id.extend(ids[top])
                out_sim.extend(s[top])
            return pa.table(
                {
                    "query_id": pa.array(np.asarray(out_q, dtype=np.int32)),
                    id_col: pa.array(np.asarray(out_id)),
                    "cosine": pa.array(np.asarray(out_sim, dtype=np.float64)),
                }
            )

    def merge_topk(b: pa.Table) -> pa.Table:
        df = b.to_pandas()
        df = df.sort_values(
            ["query_id", "cosine", id_col], ascending=[True, False, True]
        )
        df = df.groupby("query_id", sort=True).head(k)
        return pa.Table.from_pandas(df, preserve_index=False)

    from mimirsbrunn_ray.stages.rollup import tree_merge

    partials = emb.map_batches(
        PartialTopK,
        batch_format="pyarrow",
        batch_size=None,
        concurrency=concurrency if concurrency is not None else (1, pool_size()),
    )
    merged = tree_merge(partials, merge_topk)
    out = merged.to_pandas()
    if "cosine" not in out.columns:  # empty-corpus schema loss
        out = pd.DataFrame({
            "query_id": pd.Series([], dtype=np.int32),
            id_col: pd.Series([], dtype=np.int64),
            "cosine": pd.Series([], dtype=np.float64),
        })
    out["cosine"] = np.round(out["cosine"], 6)
    return out.reset_index(drop=True)


def fit_ivf_centroids(
    sample: np.ndarray, n_clusters: int = 16, iters: int = 10, seed: int = 5
) -> np.ndarray:
    """Deterministic mini-kmeans (numpy, fixed seed/iters) on unit vectors."""
    rng = np.random.default_rng(seed)
    x = _unit(np.asarray(sample, dtype=np.float64))
    centroids = x[rng.choice(len(x), size=n_clusters, replace=False)]
    for _ in range(iters):
        assign = np.argmax(x @ centroids.T, axis=1)
        for c in range(n_clusters):
            m = x[assign == c]
            if len(m):
                centroids[c] = m.mean(axis=0)
        centroids = _unit(centroids)
    return centroids


def knn_ivf(
    emb: "rd.Dataset",
    queries: np.ndarray,
    centroids: np.ndarray,
    k: int = 10,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> pd.DataFrame:
    """IVF approximate top-k: batches keep only vectors whose nearest
    centroid is among each query's ``nprobe`` closest lists, then run the
    exact kernel on the survivors. Same output shape as knn_bruteforce."""
    import ray

    q_unit = _unit(np.asarray(queries, dtype=np.float64))
    probe = np.argsort(-(q_unit @ centroids.T), axis=1)[:, :nprobe]  # (nq, nprobe)
    allowed = [set(row.tolist()) for row in probe]
    cent_ref = ray.put(centroids)
    q_ref = ray.put(q_unit)
    allowed_ref = ray.put(allowed)

    class IVFPartial:
        def __init__(self):
            self.cent = ray.get(cent_ref)
            self.q = ray.get(q_ref)
            self.allowed = ray.get(allowed_ref)

        def __call__(self, b: pa.Table) -> pa.Table:
            vecs = _unit(_to_matrix(b[vec_col]))
            ids = b[id_col].to_numpy(zero_copy_only=False)
            lists = np.argmax(vecs @ self.cent.T, axis=1)
            sims = vecs @ self.q.T
            out_q, out_id, out_sim = [], [], []
            for qi in range(sims.shape[1]):
                mask = np.isin(lists, list(self.allowed[qi]))
                if not mask.any():
                    continue
                s = sims[mask, qi]
                sel_ids = ids[mask]
                kk = min(k, len(s))
                top = np.argpartition(-s, kk - 1)[:kk]
                out_q.extend([qi] * kk)
                out_id.extend(sel_ids[top])
                out_sim.extend(s[top])
            return pa.table(
                {
                    "query_id": pa.array(np.asarray(out_q, dtype=np.int32)),
                    id_col: pa.array(
                        np.asarray(out_id, dtype=np.int64)
                        if len(out_id)
                        else np.array([], dtype=np.int64)
                    ),
                    "cosine": pa.array(np.asarray(out_sim, dtype=np.float64)),
                }
            )

    def merge_topk(b: pa.Table) -> pa.Table:
        df = b.to_pandas()
        df = df.sort_values(
            ["query_id", "cosine", id_col], ascending=[True, False, True]
        )
        df = df.groupby("query_id", sort=True).head(k)
        return pa.Table.from_pandas(df, preserve_index=False)

    from mimirsbrunn_ray.stages.rollup import tree_merge

    partials = emb.map_batches(
        IVFPartial, batch_format="pyarrow", batch_size=None, concurrency=(1, 8)
    )
    out = tree_merge(partials, merge_topk).to_pandas()
    out["cosine"] = np.round(out["cosine"], 6)
    return out.reset_index(drop=True)


def cosine_pairs(
    emb: "rd.Dataset",
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    concurrency=None,
) -> "rd.Dataset":
    """EXACT embedding near-dup pairs: every (a, b) with cosine >= threshold.

    Shape: the full unit-normalized matrix is broadcast once (ray.put,
    resolved per actor); each batch matmuls its rows against it and keeps
    pairs with id_a < id_b. Work is O(N^2 / batches) per task but streams —
    nothing quadratic materializes. This is the exact arbiter; at 100-TB
    scale the LSH-bucketed variant (stages/neardup.py:embedding_near_dups)
    generates candidates and THIS kernel verifies them bucket-locally.
    """
    import ray

    from mimirsbrunn_ray.context import pool_size

    # reference side built WITHOUT a driver data pull: the driver touches
    # only block refs; each normalization task and each actor resolves
    # blocks from the (node-shared, zero-copy) object store.
    emb_mat = emb.materialize()
    block_refs = [
        ref
        for bundle in emb_mat.iter_internal_ref_bundles()
        for ref in bundle.block_refs
    ]

    @ray.remote(num_cpus=1)
    def _unit_block(block):
        if not isinstance(block, pa.Table):  # pandas-block datasets
            block = pa.Table.from_pandas(block, preserve_index=False)
        if block.num_rows == 0:
            return None  # empty blocks are routine (filters, tiny inputs)
        return (
            block[id_col].to_numpy(zero_copy_only=False),
            _unit(_to_matrix(block[vec_col])),
        )

    part_refs = [_unit_block.remote(r) for r in block_refs]

    class PairsAgainstAll:
        def __init__(self):
            parts = [p for p in ray.get(part_refs) if p is not None]
            if parts:
                self.ids = np.concatenate([p[0] for p in parts])
                self.mat = np.concatenate([p[1] for p in parts])
            else:
                self.ids = np.empty(0, dtype=np.int64)
                self.mat = np.empty((0, 1), dtype=np.float64)

        def __call__(self, b: pa.Table) -> pa.Table:
            if b.num_rows == 0 or len(self.ids) == 0:
                return pa.table(
                    {
                        "vec_a": pa.array([], pa.int64()),
                        "vec_b": pa.array([], pa.int64()),
                        "cosine": pa.array([], pa.float64()),
                    }
                )
            vecs = _unit(_to_matrix(b[vec_col]))
            ids = b[id_col].to_numpy(zero_copy_only=False)
            sims = vecs @ self.mat.T  # (batch, N)
            rr, cc = np.nonzero(
                (sims >= threshold) & (ids[:, None] < self.ids[None, :])
            )
            return pa.table(
                {
                    "vec_a": pa.array(ids[rr]),
                    "vec_b": pa.array(self.ids[cc]),
                    "cosine": pa.array(sims[rr, cc].astype(np.float64)),
                }
            )

    return emb_mat.map_batches(
        PairsAgainstAll,
        batch_format="pyarrow",
        concurrency=concurrency if concurrency is not None else (1, pool_size()),
    )
