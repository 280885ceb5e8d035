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


def lookup_ref_from_parquet(
    path: str,
    key_col: str,
    val_col: str,
    budget: int | None = None,
):
    """Budget-gated lookup constructor (VERDICT r4 item 3): when the
    dim's raw parquet size fits the broadcast budget, read its two
    columns once on the driver and broadcast sorted arrays (the
    make_lookup_ref_arrays path); past the budget return None — callers
    pass ``dim_spec`` to broadcast_join, which then runs a distributed
    left join with identical miss-default semantics instead of ever
    materializing the dim on the driver."""
    import os

    from mimirsbrunn_ray.stages.broadcast import BROADCAST_BYTE_BUDGET

    try:
        if os.path.getsize(path) > (budget or BROADCAST_BYTE_BUDGET):
            return None
    except OSError:
        pass  # unreadable size: fall through to the driver read attempt
    import pyarrow.compute as pc
    import pyarrow.parquet as _pq

    t = _pq.read_table(path, columns=[key_col, val_col])
    t = t.filter(pc.is_valid(t[key_col]))
    return make_lookup_ref_arrays(
        t[key_col].to_numpy(zero_copy_only=False),
        t[val_col].to_numpy(zero_copy_only=False),
    )


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
    dim_spec: tuple[str, str, str] | None = None,
) -> "rd.Dataset":
    from mimirsbrunn_ray.context import pool_size

    if lookup_ref is None:
        # over-budget dim (lookup_ref_from_parquet gate): distributed
        # left join against the parquet dim with the same miss-default
        # fill — nothing lands on the driver
        assert dim_spec, "lookup_ref=None requires dim_spec"
        import pyarrow.compute as pc

        path, dim_key, dim_val = dim_spec
        n_part = max(8, pool_size())

        def project(b: pa.Table) -> pa.Table:
            b = b.filter(pc.is_valid(b[dim_key]))
            return pa.table({dim_key: b[dim_key], out_col: b[dim_val]})

        dim = rd.read_parquet(path, columns=[dim_key, dim_val]).map_batches(
            project, batch_format="pyarrow", batch_size=None
        )
        joined = ds.repartition(n_part).join(
            dim.repartition(n_part),
            join_type="left_outer",
            num_partitions=n_part,
            on=(key_col,),
            right_on=(dim_key,),
        )

        def fill(b: pa.Table) -> pa.Table:
            col = b[out_col]
            if default is not None:
                col = pc.fill_null(col, default)
            if out_type is not None:
                col = col.cast(out_type)
            return b.set_column(
                b.schema.get_field_index(out_col), out_col, col
            )

        return joined.map_batches(
            fill, batch_format="pyarrow", batch_size=None
        )

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


def bloom_anti_join(
    left: "rd.Dataset",
    right: "rd.Dataset",
    left_key: str,
    right_key: str,
    n_bits: int = 1 << 21,
    num_partitions: int | None = None,
) -> "rd.Dataset":
    """EXACT anti-join (SQL NOT EXISTS): left rows with NO matching right
    key — the packaged form of ``customers_without_events``'s inline
    pipeline (D4 family; see that query's docstring for the shape
    rationale). A bloom has no false negatives, so bloom-absent left rows
    are DEFINITELY unmatched and emit with no shuffle; only maybe-present
    rows pay the exact left_outer + null-marker verify. NULL left keys
    never equality-match (SQL semantics) and are kept."""
    import pyarrow.compute as pc

    from mimirsbrunn_ray.context import pool_size
    from mimirsbrunn_ray.sources.synth import _splitmix64
    from mimirsbrunn_ray.stages.broadcast import schema_dead
    from mimirsbrunn_ray.stages.sketch import (
        bloom_add,
        bloom_contains,
        bloom_new,
        bloom_or_merge,
    )

    # fully-empty-input-file guards (schema-dead datasets crash Acero):
    # dead left -> nothing to keep; dead right -> every left row is
    # unmatched (NOT EXISTS over the empty set)
    if schema_dead(left):
        return rd.from_items([])
    if schema_dead(right):
        return left

    def partial_distinct(b: pa.Table) -> pa.Table:
        u = np.unique(b[right_key].drop_null().to_numpy(zero_copy_only=False))
        words = bloom_new(n_bits)
        bloom_add(words, _splitmix64(u.astype(np.uint64)))
        return pa.table(
            {
                right_key: pa.concat_arrays(
                    [pa.array(u.astype(np.int64)), pa.array([None], type=pa.int64())]
                ),
                "_bits": pa.array(
                    [None] * len(u) + [words.tobytes()], type=pa.binary()
                ),
            }
        )

    distinct_partials = right.map_batches(
        partial_distinct, batch_format="pyarrow", batch_size=None
    ).materialize()

    acc = bloom_or_merge(
        distinct_partials.map_batches(
            lambda b: pa.table(
                {"bits": b.filter(pc.is_valid(b["_bits"]))["_bits"]}
            ),
            batch_format="pyarrow", batch_size=None,
        ),
        n_bits,
    )

    def flag(b: pa.Table) -> pa.Table:
        col = b[left_key]
        valid = ~pc.is_null(col).to_numpy(zero_copy_only=False)
        keys = pc.fill_null(col, 0).to_numpy(zero_copy_only=False)
        maybe = np.zeros(b.num_rows, dtype=bool)
        if valid.any():
            h = _splitmix64(keys[valid].astype(np.uint64))
            maybe[valid] = bloom_contains(acc, h)
        return b.append_column("_maybe", pa.array(maybe))

    flagged = left.map_batches(flag, batch_format="pyarrow", batch_size=None)
    absent = flagged.filter(expr="_maybe == False").map_batches(
        lambda b: b.drop_columns(["_maybe"]),
        batch_format="pyarrow", batch_size=None,
    )

    n_part = num_partitions or max(8, pool_size())
    # left_outer + null-marker needs no global right distinct: duplicated
    # keys only multiply MATCHED rows, which are discarded
    marker = distinct_partials.map_batches(
        lambda b: pa.table(
            {
                right_key: (v := b.filter(pc.is_valid(b[right_key]))[right_key]),
                "_hit": pa.array(np.ones(len(v), np.int8)),
            }
        ),
        batch_format="pyarrow", batch_size=None,
    ).repartition(n_part)
    confirmed = (
        flagged.filter(expr="_maybe == True")
        .map_batches(
            lambda b: b.drop_columns(["_maybe"]),
            batch_format="pyarrow", batch_size=None,
        )
        .repartition(n_part)
        .join(
            marker, join_type="left_outer", num_partitions=n_part,
            on=(left_key,), right_on=(right_key,),
        )
        .map_batches(
            lambda b: b.filter(pc.is_null(b["_hit"])).drop_columns(
                ["_hit"] + ([right_key] if right_key in b.schema.names else [])
            ),
            batch_format="pyarrow", batch_size=None,
        )
    )
    return absent.union(confirmed)


def bloom_semi_join(
    left: "rd.Dataset",
    right: "rd.Dataset",
    left_key: str,
    right_key: str,
    n_bits: int = 1 << 21,
    num_partitions: int | None = None,
) -> "rd.Dataset":
    """EXACT semi-join (SQL EXISTS): left rows with >= 1 matching right
    key, each emitted exactly once — the inverse of the bloom-pruned
    anti-join (``customers_without_events``; D4 family, SURVEY.md §2.5's
    semi/anti-join shapes, /root/reference/src/osm_reader/street.rs:161-175).

    Bloom prune direction flips vs the anti-join: a bloom has no false
    NEGATIVES, so bloom-absent left rows are *definitely unmatched* and
    drop immediately with NO shuffle; only the maybe-present survivors pay
    the exact distributed join that weeds out false positives.

    ONE right-side pass emits per-block DISTINCT keys plus one fixed-size
    partial-bloom row (key NULL marks bloom rows — the fused-scan shape);
    the per-block distinct keys are then made GLOBALLY distinct (bounded
    hash-bucket dedup) because an inner join against a key present in k
    blocks would emit k copies of a matched left row — the semi-join
    contract is exactly-once. int64 keys only (hashed via _splitmix64).

    Null left keys never match (SQL EXISTS equality semantics); null
    right keys are dropped at the scan.
    """
    from mimirsbrunn_ray.stages.broadcast import schema_dead

    # fully-empty-input-file guard: EXISTS over a dead side is empty
    if schema_dead(left) or schema_dead(right):
        return rd.from_items([])
    import pyarrow.compute as pc

    from mimirsbrunn_ray.context import pool_size
    from mimirsbrunn_ray.sources.synth import _splitmix64
    from mimirsbrunn_ray.stages.dedup import dedup_exact
    from mimirsbrunn_ray.stages.sketch import (
        bloom_add,
        bloom_contains,
        bloom_new,
        bloom_or_merge,
    )

    def partial_distinct(b: pa.Table) -> pa.Table:
        u = np.unique(
            b[right_key].drop_null().to_numpy(zero_copy_only=False)
        )
        words = bloom_new(n_bits)
        bloom_add(words, _splitmix64(u.astype(np.uint64)))
        return pa.table(
            {
                right_key: pa.concat_arrays(
                    [pa.array(u.astype(np.int64)),
                     pa.array([None], type=pa.int64())]
                ),
                "_bits": pa.array(
                    [None] * len(u) + [words.tobytes()], type=pa.binary()
                ),
            }
        )

    distinct_partials = right.map_batches(
        partial_distinct, batch_format="pyarrow", batch_size=None
    ).materialize()

    acc = bloom_or_merge(
        distinct_partials.map_batches(
            lambda b: pa.table(
                {"bits": b.filter(pc.is_valid(b["_bits"]))["_bits"]}
            ),
            batch_format="pyarrow", batch_size=None,
        ),
        n_bits,
    )

    # task closure, not an actor pool: the bloom is small fixed immutable
    # state (n_bits/8 bytes) shipped once per task spec
    def flag(b: pa.Table) -> pa.Table:
        col = b[left_key]
        valid = ~pa.compute.is_null(col).to_numpy(zero_copy_only=False)
        # fill nulls BEFORE to_numpy: a nullable int64 column converts to
        # float64, silently rounding keys above 2^53 to the wrong value —
        # a mis-hashed probe can return a false NEGATIVE and drop a
        # matching row from an EXACT semi-join
        keys = pc.fill_null(col, 0).to_numpy(zero_copy_only=False)
        maybe = np.zeros(b.num_rows, dtype=bool)
        if valid.any():
            h = _splitmix64(keys[valid].astype(np.uint64))
            maybe[valid] = bloom_contains(acc, h)
        return b.filter(pa.array(maybe))

    survivors = left.map_batches(flag, batch_format="pyarrow", batch_size=None)

    n_part = num_partitions or max(8, pool_size())
    right_distinct = dedup_exact(
        distinct_partials.map_batches(
            lambda b: b.filter(pc.is_valid(b[right_key])).select([right_key]),
            batch_format="pyarrow", batch_size=None,
        ),
        key=right_key,
    ).repartition(n_part)

    joined = survivors.repartition(n_part).join(
        right_distinct, join_type="inner", num_partitions=n_part,
        on=(left_key,), right_on=(right_key,),
    )
    if right_key != left_key:
        joined = joined.map_batches(
            lambda b: b.drop_columns([right_key])
            if right_key in b.schema.names else b,
            batch_format="pyarrow", batch_size=None,
        )
    return joined
