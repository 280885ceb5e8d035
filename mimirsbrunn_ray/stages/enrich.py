"""Broadcast dimension enrichment — the AdminGeoFinder graft.

The reference builds an R-tree of all admins once and shares it read-only
across worker threads, enriching every record with its admin hierarchy
(/root/reference/src/admin_geofinder.rs:105-286, used from
src/bin/bano2mimir.rs:82-93); it also normalizes weights by a global max
(src/utils.rs:55-72, src/stops.rs:44-58).

Ray Data shape: the small dimension table is ``ray.put`` ONCE on the driver;
each actor of the ``map_batches`` pool resolves it in ``__init__`` (once per
actor, never per batch) and performs a vectorized dictionary lookup per
Arrow batch — a broadcast hash join with no shuffle.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd


def build_dim_ref(dim_table: pa.Table) -> "ray.ObjectRef":
    """Normalize weights by the global max (A2 graft) and broadcast.

    Returns an ObjectRef to {source: (family, priority, weight_norm)}.
    """
    w = dim_table["weight"].to_numpy(zero_copy_only=False).astype(np.float64)
    wmax = float(w.max()) if len(w) and w.max() > 0 else 1.0
    lookup = {}
    fam = dim_table["family"].to_pylist()
    pri = dim_table["priority"].to_pylist()
    src = dim_table["source"].to_pylist()
    for i, s in enumerate(src):
        lookup[s] = (fam[i], int(pri[i]), min(1.0, max(0.0, w[i] / wmax)))
    return ray.put(lookup)


class SourceDimEnricher:
    """Actor-pool stage: attach (family, priority, weight) per source.

    Unknown sources get family="unknown", priority=-1, weight=0.0 — the
    reference's orphan-admin tolerance (src/admin_geofinder.rs:430-470).
    """

    def __init__(self, dim_ref):
        lookup = ray.get(dim_ref)  # once per actor
        # vectorized lookup: factorize sources against a numpy table
        self.sources = np.asarray(list(lookup.keys()), dtype=object)
        self.family = np.asarray([v[0] for v in lookup.values()] + ["unknown"], dtype=object)
        self.priority = np.asarray([v[1] for v in lookup.values()] + [-1], dtype=np.int32)
        self.weight = np.asarray([v[2] for v in lookup.values()] + [0.0], dtype=np.float64)
        self.index = {s: i for i, s in enumerate(self.sources)}
        self.miss = len(self.sources)

    def __call__(self, batch: pa.Table) -> pa.Table:
        # dictionary-encode the batch's source column, then map the (few)
        # distinct values through the lookup — O(distinct) dict ops per batch
        arr = batch["source"].combine_chunks().dictionary_encode()
        dict_vals = arr.dictionary.to_pylist()
        codes = arr.indices.to_numpy(zero_copy_only=False)
        slot = np.asarray(
            [self.index.get(v, self.miss) for v in dict_vals], dtype=np.int64
        )[codes]
        batch = batch.append_column(
            "family", pa.array(self.family[slot], type=pa.string())
        )
        batch = batch.append_column("priority", pa.array(self.priority[slot]))
        batch = batch.append_column("weight", pa.array(self.weight[slot]))
        return batch


def enriched(
    ds: "rd.Dataset",
    dim_ref,
    batch_size=None,
    concurrency=None,
) -> "rd.Dataset":
    from mimirsbrunn_ray.context import pool_size

    return ds.map_batches(
        SourceDimEnricher,
        fn_constructor_kwargs={"dim_ref": dim_ref},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency if concurrency is not None else (1, pool_size()),
    )
