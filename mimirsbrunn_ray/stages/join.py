"""Broadcast hash join — the reference's small-side lookup pattern.

Every reference join except the OSM way<-node self-join is a broadcast of a
small dimension side into the record stream (admins into addresses J1,
INSEE map J3, NTFS side tables J7 — SURVEY.md §2.5). Ray Data shape:
``ray.put`` the lookup once, resolve it once per actor/task, numpy-gather
per batch. No shuffle.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd


def make_lookup_ref(keys, values) -> "ray.ObjectRef":
    """Broadcast {key -> value} once from the driver."""
    return ray.put(dict(zip(keys, values)))


def make_lookup_ref_arrays(keys: np.ndarray, values: np.ndarray) -> "ray.ObjectRef":
    """Broadcast a (sorted_keys, values) pair built VECTORIZED — no Python
    dict loop over the dimension rows (VERDICT r1 'driver-built broadcast
    sides'). Accepts unsorted arrays; sorts once here."""
    keys = np.asarray(keys)
    values = np.asarray(values, dtype=object)
    order = np.argsort(keys, kind="stable")
    return ray.put((keys[order], values[order]))


class BroadcastJoiner:
    """Actor-pool stage appending ``out_col`` = lookup[batch[key_col]].

    Missing keys get ``default`` (inner-join semantics are applied by a
    following filter when default is None).
    """

    def __init__(self, lookup_ref, key_col: str, out_col: str, default=None,
                 out_type: pa.DataType | None = None):
        lookup = ray.get(lookup_ref)  # once per actor
        if isinstance(lookup, tuple):  # pre-sorted (keys, values) arrays
            self.keys_sorted, self.vals_sorted = lookup
        else:
            keys = np.asarray(list(lookup.keys()))
            order = np.argsort(keys, kind="stable")
            self.keys_sorted = keys[order]
            self.vals_sorted = np.asarray(list(lookup.values()), dtype=object)[order]
        self.key_col = key_col
        self.out_col = out_col
        self.default = default
        self.out_type = out_type

    def __call__(self, batch: pa.Table) -> pa.Table:
        keys = batch[self.key_col].to_numpy(zero_copy_only=False)
        if len(self.keys_sorted) == 0:
            # empty lookup: every row is a miss (np.clip to -1 on a size-0
            # array would raise; routine case, e.g. a near-dup run where
            # no candidate survives verification)
            vals = np.full(len(keys), self.default, dtype=object)
            return batch.append_column(
                self.out_col, pa.array(vals, type=self.out_type)
            )
        pos = np.searchsorted(self.keys_sorted, keys)
        pos = np.clip(pos, 0, len(self.keys_sorted) - 1)
        hit = self.keys_sorted[pos] == keys
        vals = self.vals_sorted[pos]
        if not hit.all():
            vals = vals.copy()
            vals[~hit] = self.default
        return batch.append_column(self.out_col, pa.array(vals, type=self.out_type))


def broadcast_join(
    ds: "rd.Dataset",
    lookup_ref,
    key_col: str,
    out_col: str,
    default=None,
    out_type=None,
    batch_size: int = 32_768,
    concurrency=None,
) -> "rd.Dataset":
    from mimirsbrunn_ray.context import pool_size

    return ds.map_batches(
        BroadcastJoiner,
        fn_constructor_kwargs={
            "lookup_ref": lookup_ref,
            "key_col": key_col,
            "out_col": out_col,
            "default": default,
            "out_type": out_type,
        },
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency if concurrency is not None else (1, pool_size()),
    )


def conditional_override(
    ds: "rd.Dataset",
    lookup_ref,
    key_col: str,
    target_col: str,
    batch_size: int = 32_768,
    concurrency=None,
) -> "rd.Dataset":
    """J3 graft: keyed conditional REPLACE, not just miss-default fill.

    Where ``key_col`` hits the broadcast map, ``target_col`` is replaced by
    the mapped value; rows that miss keep their existing value — the
    reference's INSEE admin override: a matching INSEE code substitutes the
    keyed admin for the geofinder's answer, everything else passes through
    (/root/reference/src/bin/bano2mimir.rs:88-93).
    """
    import pyarrow.compute as pc

    from mimirsbrunn_ray.context import pool_size

    tmp = f"__override_{target_col}"

    class OverrideStage(BroadcastJoiner):
        def __init__(self):
            super().__init__(lookup_ref, key_col, tmp, default=None)

        def __call__(self, batch: pa.Table) -> pa.Table:
            out_type = batch.schema.field(target_col).type
            self.out_type = out_type
            batch = super().__call__(batch)
            merged = pc.coalesce(batch[tmp], batch[target_col])
            idx = batch.schema.get_field_index(target_col)
            return batch.set_column(idx, target_col, merged).drop_columns([tmp])

    return ds.map_batches(
        OverrideStage,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency if concurrency is not None else (1, pool_size()),
    )
