"""Ingest: parquet scan -> schema check -> dirty-row drop -> event-time derivation.

Grafts the reference's streaming CSV ingest with its warn-and-skip policy —
deserialization or conversion errors drop the row, never abort the stream
(/root/reference/src/addr_reader.rs:99-110, 39-52) — and its
derive-identity-from-content rule (src/bin/bano2mimir.rs:139-159): here the
event time is a deterministic function of the doc index embedded in
``doc_id`` ("doc-{source}-{index:010d}"), so ``ts = EPOCH0 + index * 7s``.

Everything is a zero-copy-Arrow ``map_batches`` stage; dropped-row counts
stream to a CounterActor for the tier manifest.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from mimirsbrunn_ray.functions.timeutil import trunc_us, ts_array, ts_from_index
from mimirsbrunn_ray.schemas import SEQUENCES_SCHEMA, validate_schema


def read_sequences(paths, columns=None) -> "rd.Dataset":
    """Column-pruned scan of a sequences corpus in any supported format.

    Parquet is the fast path (byte-sized blocks, reader-side projection);
    CSV/CSV.gz/JSONL drops (the reference's raw ingest formats,
    src/addr_reader.rs:115-159) go through ``sources.formats.read_table``
    plus a vectorized type-coercion stage to SEQUENCES_SCHEMA.

    Block count for parquet is sized by bytes (~128 MiB target, floor =
    cluster CPUs): Ray's default heuristic targets ~200 blocks regardless
    of input size, which at small-corpus scale means thousands of tiny
    blocks whose per-task scheduling overhead dwarfs the UDF work
    (measured 2x win).
    """
    from mimirsbrunn_ray.sources.formats import (
        _expand,
        detect_format,
        normalize_sequences_batch,
        read_table,
    )

    files = _expand(paths)
    if files and all(detect_format(f)[0] == "parquet" for f in files):
        return rd.read_parquet(files, columns=columns,
                               override_num_blocks=num_blocks_for(files))
    ds = read_table(files, columns=columns)
    return ds.map_batches(normalize_sequences_batch, batch_format="pyarrow")


def num_blocks_for(paths, target_bytes: int = 128 << 20) -> int:
    import os

    import ray

    if isinstance(paths, str):
        paths = [paths]
    total = 0
    for p in paths:
        try:
            total += os.path.getsize(p)
        except OSError:
            return None  # let Ray decide for non-local paths
    try:
        cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        cpus = 8
    return max(cpus, total // target_bytes + 1)


def order_paths_by_time(paths: list[str], ts_col: str = "ts") -> list[str]:
    """Order parquet files by their footer's min(ts) statistic.

    Each raw-tier file is time-CONTIGUOUS (ingest blocks are contiguous
    slices of the time-ordered input and every stage preserves row order
    within a block), but Ray's uuid-prefixed file names glob back in an
    order that is RANDOM with respect to time. A read that packs several
    files per block then hands the rollup batches spanning scattered time
    ranges, and per-block partials blow up toward sources x ALL buckets
    (the measured 7.1M-partial / ~9 s serial combine wall). Footer-only
    sort — no data read, O(files) like the existing row-count probe —
    restores global time-clustering so a block's partials collapse to
    sources x the few buckets it actually covers. Files without usable
    stats sort last, in name order (deterministic either way).
    """
    import pyarrow.parquet as pq

    return order_and_count_paths(paths, ts_col)[0]


def order_and_count_paths(
    paths: list[str], ts_col: str = "ts"
) -> tuple[list[str], int]:
    """One footer pass per file -> (time-ordered paths, total row count).

    Callers that need both the time ordering AND the tier's row count
    (tiering's raw->1m hop sizes its final combine from the count) share a
    single metadata read per file instead of two."""
    import pyarrow.parquet as pq

    def _stats(path: str):
        try:
            md = pq.read_metadata(path)
        except Exception:
            return None, 0
        lo = None
        for rg in range(md.num_row_groups):
            row_group = md.row_group(rg)
            for ci in range(row_group.num_columns):
                col = row_group.column(ci)
                # leaf path, not arrow field index: list columns flatten
                # to multiple leaves and shift positional indexes
                if col.path_in_schema != ts_col:
                    continue
                st = col.statistics
                if st is not None and st.has_min_max:
                    lo = st.min if lo is None else min(lo, st.min)
        return lo, md.num_rows

    keyed = [(*_stats(p), p) for p in sorted(paths)]
    rows = sum(n for _, n, _ in keyed)
    with_ts = [(t, p) for t, _, p in keyed if t is not None]
    without = [p for t, _, p in keyed if t is None]
    ordered = [
        p for _, p in sorted(with_ts, key=lambda x: (x[0], x[1]))
    ] + without
    return ordered, rows


def parse_doc_index(doc_id: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """Vectorized parse of the trailing index of ``doc-{source}-{i:010d}``.

    The suffix AFTER THE LAST '-' is captured (not a fixed-width slice:
    Python's ``:010d`` grows past 10 digits at i >= 10^10, and a fixed
    ``[-10:]`` slice would silently truncate the high digits into wrong
    timestamps and colliding indices at that scale).

    Returns int64 indices; unparseable ids become -1 (dropped as dirty).
    """
    ext = pc.extract_regex(doc_id, pattern=r"-(?P<idx>[0-9]+)$")
    idx_str = pc.fill_null(pc.struct_field(ext, "idx"), "-1")
    return pc.cast(idx_str, pa.int64()).to_numpy(zero_copy_only=False)


class ValidateAndDerive:
    """Actor-pool stage: validate rows, derive ts + bucket_1m.

    Drops (and counts) rows where:
      * doc_id is null / has no parseable index,
      * n_tok is null,
      * n_tok != len(tokens)  (the per-row token-count invariant).

    ``quarantine_dir``: instead of silently discarding, each actor also
    WRITES its dropped rows (plus a ``reason`` column) as parquet parts
    under the given directory — the reprocessing story warn-and-skip
    pipelines need (the reference only logs the skip,
    /root/reference/src/addr_reader.rs warn path; a 100-TB corpus wants
    the bytes back). Part names are CONTENT-ADDRESSED (sha1 of the
    dropped ids+reasons), so a retried/re-executed batch overwrites its
    own part instead of duplicating rows; the trade is that two batches
    with byte-identical dropped rows coalesce into one part. Counters
    are actor-side increments and can still overcount retried batches —
    reconcile against the quarantine files, not the counter, and scope
    the dir per run_id for resumable jobs.

    Stateful-setup-once / work-per-batch split follows the actor-pool rule
    (SURVEY.md §7.1): the counter handle is resolved in ``__init__``.
    """

    def __init__(self, counters=None, quarantine_dir=None):
        import os

        self.counters = counters
        self.quarantine_dir = quarantine_dir
        if quarantine_dir:
            os.makedirs(quarantine_dir, exist_ok=True)
        self._checked = False

    def __call__(self, batch: pa.Table) -> pa.Table:
        if not self._checked:
            validate_schema(batch.schema, SEQUENCES_SCHEMA, "ingest")
            self._checked = True
        n_in = batch.num_rows
        tok_len = pc.fill_null(
            pc.list_value_length(batch["tokens"]), -1
        ).cast(pa.int32())
        n_tok = pc.fill_null(batch["n_tok"], -2)
        idx = parse_doc_index(batch["doc_id"])
        ok = pc.fill_null(
            pc.and_(pc.equal(tok_len, n_tok), pa.array(idx >= 0)), False
        )
        if self.quarantine_dir and n_in:
            bad_mask = pc.invert(ok)
            n_bad = pc.sum(bad_mask).as_py() or 0
            if n_bad:
                import hashlib
                import os

                import pyarrow.parquet as pq

                bad = batch.filter(bad_mask)
                reason = np.where(
                    idx[bad_mask.to_numpy(zero_copy_only=False)] < 0,
                    "bad_id",
                    "len_mismatch",
                )
                bad = bad.append_column(
                    "reason", pa.array(reason, pa.string())
                )
                # content-addressed name: a retried batch rewrites the
                # SAME part (idempotent), never a duplicate
                digest = hashlib.sha1(
                    ("|".join(map(str, bad["doc_id"].to_pylist()))
                     + "#" + "|".join(reason)).encode()
                ).hexdigest()[:20]
                pq.write_table(
                    bad,
                    os.path.join(
                        self.quarantine_dir, f"q-{digest}.parquet"
                    ),
                )
        batch = batch.filter(ok)
        idx = idx[ok.to_numpy(zero_copy_only=False)]
        ts_us = ts_from_index(idx)
        batch = batch.append_column("ts", ts_array(ts_us))
        batch = batch.append_column("bucket_1m", ts_array(trunc_us(ts_us, "1m")))
        if self.counters is not None:
            self.counters.inc.remote(
                {"rows_in": n_in, "rows_dropped_dirty": n_in - batch.num_rows}
            )
        return batch


def validated(ds: "rd.Dataset", counters=None, batch_size=None,
              concurrency=None, quarantine_dir=None) -> "rd.Dataset":
    """Apply ValidateAndDerive as an actor-pool map_batches stage."""
    from mimirsbrunn_ray.context import pool_size

    # autoscaling pool (min 1): a fixed pool sized to the node can reserve
    # every CPU and starve the read/shuffle/write stages (SURVEY.md §4)
    return ds.map_batches(
        ValidateAndDerive,
        fn_constructor_kwargs={"counters": counters,
                               "quarantine_dir": quarantine_dir},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency if concurrency is not None else (1, pool_size()),
    )
