"""Budget-gated dimension attach for the census/analytics queries.

Round-4 verdict item 3: ~50 queries materialized a fact table
(orders/customer/part/supplier/...) to the driver as a Python dict before
probing it inside ``map_batches`` — unboundable driver memory at 100-TB
scale, and the dict re-ships inside every task closure. This module is
the shared fix, the ``q_tpch_q5_region_revenue`` discipline
(pipelines/queries.py) factored out:

- UNDER ``BROADCAST_BYTE_BUDGET`` (decided from the parquet file size
  BEFORE any read): the dim's needed columns are read once on the driver,
  sorted into numpy arrays keyed for ``searchsorted``, ``ray.put`` ONCE,
  and probed per batch vectorized — no Python dict, no per-closure
  reshipping (the ObjectRef travels in the task spec; workers share the
  plasma copy);
- OVER budget: a distributed hash join — both sides shuffle once on the
  key, nothing lands on the driver.

Inner semantics drop probe misses; left semantics null-fill them. The two
paths produce identical rows up to order (pytest-pinned).

Reference analog: the small-side denormalizing joins of the importers
(/root/reference/src/bin/bano2mimir.rs:235-241 read the published admin
set once, then stream), which never ship the big side anywhere.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd

# small-side cap for broadcast attach (matches pipelines/queries.py)
BROADCAST_BYTE_BUDGET = 256 << 20


def dim_fits(sf_dir: str, table: str, budget: int | None = None) -> bool:
    """File-size gate, checked BEFORE any driver read: the raw parquet
    size bounds the decoded dim columns within a small constant."""
    try:
        return os.path.getsize(f"{sf_dir}/{table}.parquet") <= (
            budget or BROADCAST_BYTE_BUDGET
        )
    except OSError:
        return False


def _as_key_np(arr: "pa.ChunkedArray | pa.Array") -> np.ndarray:
    a = arr.to_numpy(zero_copy_only=False)
    if np.issubdtype(a.dtype, np.integer):
        return a.astype(np.int64)
    return a  # string keys: object dtype, numpy sorts/searches lexically


def lut_refs(
    sf_dir: str,
    table: str,
    key_col: str,
    val_cols: list[str],
    dim_filter=None,
):
    """Driver-side (budget-gated by the caller) build of a sorted-array
    lookup: ONE ``ray.put`` of (sorted keys, value arrays). Null keys and
    null values in any requested column are dropped (probe misses)."""
    import pyarrow.parquet as _pq

    t = _pq.read_table(
        f"{sf_dir}/{table}.parquet", columns=[key_col, *val_cols]
    )
    if dim_filter is not None:
        t = dim_filter(t)
    ok = pc.is_valid(t[key_col])
    for c in val_cols:
        ok = pc.and_(ok, pc.is_valid(t[c]))
    t = t.filter(ok)
    k = _as_key_np(t[key_col])
    order = np.argsort(k, kind="stable")
    vals = {
        c: t[c].to_numpy(zero_copy_only=False)[order] for c in val_cols
    }
    return ray.put((k[order], vals))


def probe(keys: np.ndarray, lk: np.ndarray, lvals: dict):
    """Vectorized searchsorted probe: (hit mask, {col: values}); values at
    miss positions are arbitrary — mask them with ``hit``."""
    if len(lk) == 0:
        return (
            np.zeros(len(keys), dtype=bool),
            {c: np.zeros(len(keys), dtype=v.dtype if v.dtype != object else object)
             for c, v in lvals.items()},
        )
    idx = np.clip(np.searchsorted(lk, keys), 0, len(lk) - 1)
    hit = lk[idx] == keys
    return hit, {c: v[idx] for c, v in lvals.items()}


def attach_table(
    ds: "rd.Dataset",
    on: str,
    dim: "pa.Table",
    dim_key: str,
    val_cols: list[str],
    *,
    how: str = "inner",
    out_names: list[str] | None = None,
) -> "rd.Dataset":
    """Attach columns from a DRIVER-RESIDENT reduced table (a tree-merge
    output: per-key grain, the algorithm's own output size — never a raw
    fact table) to a streaming Dataset: one ``ray.put`` of sorted arrays,
    vectorized searchsorted probe per batch."""
    out_names = list(out_names or val_cols)
    if dim.num_rows == 0 or dim_key not in dim.column_names:
        # reduced dim came back empty/schema-less (empty corpus): an
        # empty lut — every probe misses
        dim = pa.table({dim_key: pa.array([], pa.int64()),
                        **{c: pa.array([], pa.int64()) for c in val_cols}})
    k = _as_key_np(dim[dim_key])
    order = np.argsort(k, kind="stable")
    vals = {c: dim[c].to_numpy(zero_copy_only=False)[order] for c in val_cols}
    ref = ray.put((k[order], vals))

    def attach(b: pa.Table) -> pa.Table:
        lk, lvals = ray.get(ref)
        keys = _as_key_np(b[on])
        hit, v = probe(keys, lk, lvals)
        if how == "inner":
            b = b.filter(pa.array(hit))
            for c, name in zip(val_cols, out_names):
                b = b.append_column(name, pa.array(v[c][hit]))
            return b
        for c, name in zip(val_cols, out_names):
            b = b.append_column(name, pa.array(v[c], mask=~hit))
        return b

    return ds.map_batches(attach, batch_format="pyarrow", batch_size=None)


def schema_dead(ds: "rd.Dataset") -> bool:
    """True when a dataset lost its schema — the fully-empty-input-file
    short-circuit (round-4 learning): Ray skips the map UDFs entirely, so
    blocks carry no columns and Acero joins crash on the missing key."""
    try:
        s = ds.schema(fetch_if_missing=True)
        return s is None or len(s.names) == 0
    except Exception:
        return True


def safe_join(
    a: "rd.Dataset",
    b: "rd.Dataset",
    *,
    on,
    right_on=None,
    join_type: str = "inner",
    num_partitions: int,
) -> "rd.Dataset":
    """``Dataset.join`` that tolerates schema-dead sides (fully-empty
    input files): returns an empty dataset instead of crashing Acero; the
    callers' driver-side zero-column guards then produce their typed
    empties. Both sides are materialized first — Ray's hash-shuffle join
    stages them anyway, so this adds one object-store pin, not a
    recompute — which makes the zero-row check free and rebuilds every
    block with the real schema (a ZERO-ROW side otherwise reaches
    HashShuffleAggregator.finalize as a schema-less table and crashes
    Acero even when the dataset-level schema is known)."""
    if schema_dead(a) or schema_dead(b):
        return rd.from_items([])
    a = a.materialize()
    b = b.materialize()
    if a.count() == 0 or b.count() == 0:
        return rd.from_items([])
    return a.repartition(num_partitions).join(
        b.repartition(num_partitions),
        join_type=join_type,
        num_partitions=num_partitions,
        on=on if isinstance(on, tuple) else (on,),
        right_on=(None if right_on is None
                  else right_on if isinstance(right_on, tuple)
                  else (right_on,)),
    )


def attach_ds(
    ds: "rd.Dataset",
    on: str,
    dim: "rd.Dataset",
    dim_key: str,
    val_cols: list[str],
    *,
    how: str = "inner",
    n_part: int | None = None,
) -> "rd.Dataset":
    """Attach columns from a DERIVED (Dataset) dim by a distributed hash
    join — for fact-grain dims (e.g. orders + a computed column) where a
    driver broadcast would be unbounded. Both sides shuffle once."""
    from mimirsbrunn_ray.context import pool_size

    n_part = n_part or max(8, pool_size())
    dim = dim.map_batches(
        lambda b, _k=dim_key, _v=tuple(val_cols): pa.table(
            {c: b[c] for c in (_k, *_v)}
        ),
        batch_format="pyarrow",
        batch_size=None,
    )
    join_type = "inner" if how == "inner" else "left_outer"
    return safe_join(
        ds, dim, on=on, right_on=dim_key, join_type=join_type,
        num_partitions=n_part,
    ).materialize()


def keyed_counts(
    sf_dir: str,
    table: str,
    key_col: str,
    dim_filter=None,
    final_shards: int = 1,
    extra_cols: list[str] | None = None,
) -> "pa.Table":
    """Distributed per-key row count of a fact table: per-block partial
    group-counts tree-merged in the cluster; the driver receives one row
    per DISTINCT key (post-reduction — never the fact rows). Replaces the
    driver-side ``read_parquet(...).to_pandas().groupby(key).size()``
    pulls the round-4 verdict flagged. ``extra_cols`` are read (pruned)
    solely for ``dim_filter``'s use."""
    from mimirsbrunn_ray.stages.rollup import tree_merge

    ds = rd.read_parquet(
        f"{sf_dir}/{table}.parquet", columns=[key_col, *(extra_cols or [])]
    )

    def part(b: pa.Table) -> pa.Table:
        if dim_filter is not None:
            b = dim_filter(b)
        b = b.filter(pc.is_valid(b[key_col]))
        if b.num_rows == 0:
            return pa.table(
                {key_col: b[key_col], "n": pa.array([], pa.int64())}
            )
        t = pa.table(
            {
                key_col: b[key_col],
                "n": pa.array(np.ones(b.num_rows, np.int64)),
            }
        )
        g = t.group_by([key_col]).aggregate([("n", "sum")])
        return g.rename_columns([key_col, "n"])

    def comb(b: pa.Table) -> pa.Table:
        g = b.group_by([key_col]).aggregate([("n", "sum")])
        return g.rename_columns([key_col, "n"])

    merged = tree_merge(
        ds.map_batches(part, batch_format="pyarrow", batch_size=None),
        comb,
        final_shards=final_shards,
        shard_cols=[key_col] if final_shards > 1 else None,
    )
    out = pa.Table.from_pandas(merged.to_pandas(), preserve_index=False)
    if key_col not in out.column_names:  # empty-corpus schema loss
        out = pa.table({key_col: pa.array([], pa.int64()),
                        "n": pa.array([], pa.int64())})
    return out


def sharded_reduce(
    ds: "rd.Dataset",
    key_cols: list[str],
    fn,
    num_shards: int = 8,
):
    """Hash-shard rows so every key group lands WHOLE in one shard, then
    apply ``fn`` (pandas DataFrame -> partial DataFrame) once per shard.
    The per-key logic (modal rows, per-key ratios, top-1 picks) runs
    distributed; the driver sees only ``num_shards`` partial rows instead
    of the per-key grain — the fix for the census queries that pulled an
    unbounded (key, ...) intermediate with ``to_pandas()``."""
    from mimirsbrunn_ray.stages.rollup import _shard_hash

    cols = list(key_cols)

    def add_shard(b: pa.Table) -> pa.Table:
        return b.append_column(
            "_s", pa.array(_shard_hash(b, cols, num_shards))
        )

    return (
        ds.map_batches(add_shard, batch_format="pyarrow", batch_size=None)
        .groupby("_s")
        .map_groups(
            lambda g: fn(g.drop(columns=["_s"])), batch_format="pandas"
        )
    )


def attach_dim(
    ds: "rd.Dataset",
    on: str,
    sf_dir: str,
    table: str,
    dim_key: str,
    val_cols: list[str],
    *,
    dim_filter=None,
    how: str = "inner",
    out_names: list[str] | None = None,
    budget: int | None = None,
    n_part: int | None = None,
) -> "rd.Dataset":
    """Attach dim value columns to ``ds`` rows by key — broadcast probe
    under the byte budget, distributed hash join past it.

    ``dim_filter(table) -> table`` pre-filters the dim (applied on the
    driver under budget, per batch in the join path). ``how="inner"``
    drops probe misses; ``"left"`` keeps them with null values.
    """
    out_names = list(out_names or val_cols)
    assert len(out_names) == len(val_cols)

    if dim_fits(sf_dir, table, budget):
        lut = lut_refs(sf_dir, table, dim_key, val_cols, dim_filter)

        def attach(b: pa.Table) -> pa.Table:
            lk, lvals = ray.get(lut)
            keys = _as_key_np(b[on])
            hit, vals = probe(keys, lk, lvals)
            if how == "inner":
                b = b.filter(pa.array(hit))
                for c, name in zip(val_cols, out_names):
                    b = b.append_column(name, pa.array(vals[c][hit]))
                return b
            for c, name in zip(val_cols, out_names):
                b = b.append_column(
                    name, pa.array(vals[c], mask=~hit)
                )
            return b

        return ds.map_batches(attach, batch_format="pyarrow", batch_size=None)

    from mimirsbrunn_ray.context import pool_size

    n_part = n_part or max(8, pool_size())

    def project(b: pa.Table) -> pa.Table:
        if dim_filter is not None:
            b = dim_filter(b)
        cols = {dim_key: b[dim_key]}
        for c, name in zip(val_cols, out_names):
            cols[name] = b[c]
        return pa.table(cols)

    dim = rd.read_parquet(
        f"{sf_dir}/{table}.parquet", columns=[dim_key, *val_cols]
    ).map_batches(project, batch_format="pyarrow", batch_size=None)
    join_type = "inner" if how == "inner" else "left_outer"
    return safe_join(
        ds, dim, on=on, right_on=dim_key, join_type=join_type,
        num_partitions=n_part,
    ).materialize()


def read_dim_table(
    sf_dir: str, table: str, columns: list[str],
    budget: int | None = None,
) -> "pa.Table":
    """Budget-gated whole-dim driver read (returns a TYPED table even for
    a zero-row file — the iter_batches/concat_tables idiom it replaces
    returned nothing to concat and crashed). Past the budget the caller
    must go through attach_dim's distributed join instead."""
    import pyarrow.parquet as _pq

    if not dim_fits(sf_dir, table, budget):  # pragma: no cover - scale
        raise NotImplementedError(
            f"dim {table} exceeds the broadcast budget: route through "
            "attach_dim's distributed join (stages/broadcast.py)")
    return _pq.read_table(f"{sf_dir}/{table}.parquet", columns=columns)


def collect_typed(ds: "rd.Dataset", schema: "pa.Schema") -> "pa.Table":
    """Concat a REDUCED dataset (tree-merge / grouped-combine output —
    per-key grain) to the driver with a guaranteed schema: a zero-block
    dataset (empty-corpus short-circuit) yields ``schema.empty_table()``
    instead of an empty-list ``pa.concat_tables`` crash."""
    parts = list(ds.iter_batches(batch_format="pyarrow"))
    if not parts:
        return schema.empty_table()
    return pa.concat_tables(parts).cast(schema)


def ensure_cols(df, cols: list[str]):
    """Driver-side empty-corpus guard: a reduced pull that came back as a
    zero-column frame (schema-loss short-circuit) gains the expected
    columns as empty Series, so the driver finish code runs its normal
    empty path instead of KeyError-ing."""
    import pandas as pd

    if all(c in df.columns for c in cols):
        return df
    return pd.DataFrame({c: pd.Series([], dtype=object) for c in cols})


def scalar0(df, col: str, default=0):
    """First value of a 1-row reduced pull, or ``default`` when the
    empty-corpus short-circuit returned no rows / no columns."""
    if col in df.columns and len(df):
        return df[col][0]
    return default
