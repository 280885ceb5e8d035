"""Exact deduplication with a deterministic winner.

Grafts the reference's street dedup — ways with the same (name, city) key
collapse to the smallest OSM id, a deterministic keep-min winner
(/root/reference/src/osm_reader/street.rs:202-234) — and its cross-dataset
stop merge by id (/root/reference/src/stops.rs:151-187).

Scale design: a ``groupby(doc_id).map_groups`` would create one group per
key (millions of tiny pandas groups). Instead rows are bucketed by a
deterministic 64-bit hash of the key into ``num_buckets`` coarse partitions,
shuffled once on the small int bucket column, and deduped VECTORIZED inside
each bucket (np.unique keep-first over key-sorted rows). Duplicate keys are
uniform under the hash, so the hot-source skew never concentrates in one
bucket — this is the explicit salted-partitioning path of SURVEY.md §4.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

_BUCKET = "_dedup_bucket"


def _hash64(values: pa.ChunkedArray) -> np.ndarray:
    """Deterministic (process-independent) 64-bit hash of a string column."""
    s = pd.Series(values.to_pandas())
    return pd.util.hash_pandas_object(s, index=False).to_numpy()


def add_bucket(batch: pa.Table, key: str, num_buckets: int) -> pa.Table:
    h = _hash64(batch[key])
    return batch.append_column(
        _BUCKET, pa.array((h % np.uint64(num_buckets)).astype(np.int32))
    )


def _dedup_bucket(group: pa.Table, key: str, tiebreak: list[str]) -> pa.Table:
    """Vectorized keep-first within one hash bucket.

    Rows are sorted by (key, *tiebreak) so the winner is deterministic
    regardless of block arrival order; np.unique(return_index=True) then
    yields the first occurrence per key.
    """
    if group.num_rows == 0:
        return group.drop_columns([_BUCKET])
    order = group.sort_by([(key, "ascending")] + [(t, "ascending") for t in tiebreak])
    keys = order[key].to_numpy(zero_copy_only=False)
    _, first_idx = np.unique(keys, return_index=True)
    return order.take(np.sort(first_idx)).drop_columns([_BUCKET])


def dedup_exact(
    ds: "rd.Dataset",
    key: str = "doc_id",
    tiebreak: list[str] | None = None,
    num_buckets: int = 64,
    counters=None,
    dup_hashes=None,
) -> "rd.Dataset":
    """Drop all but the deterministic first row per ``key``.

    Full-shuffle variant: rows move once, hashed on ``key``. Use
    ``dedup_exact_sparse`` when duplicates are rare and payloads are wide.

    ``dup_hashes`` (sorted-able int64 key hashes from
    ``scan_duplicate_keys``) prunes the exchange: rows whose key is
    PROVABLY unique stream through untouched — only rows of duplicated
    keys (all of them, so the sorted keep-first winner is unchanged —
    pytest-pinned) pay the shuffle. At a ~1% duplicate rate this removes
    ~99% of the exchange bytes, which is what keeps the untrusted-dedup
    path inside the scaling bar (r5 measurement: 1->4 CPU efficiency
    0.72 -> see BASELINE.md after pruning). Hash collisions are safe:
    a colliding unique key merely rides the shuffle and wins its own
    group."""
    import ray

    tiebreak = tiebreak or []

    def fn(group: pa.Table) -> pa.Table:
        n_in = group.num_rows
        out = _dedup_bucket(group, key, tiebreak)
        if counters is not None and n_in != out.num_rows:
            counters.inc.remote({"rows_deduped": n_in - out.num_rows})
        return out

    if dup_hashes is None:
        bucketed = ds.map_batches(
            lambda b: add_bucket(b, key, num_buckets),
            batch_format="pyarrow", batch_size=None,
        )
        return bucketed.groupby(_BUCKET).map_groups(
            fn, batch_format="pyarrow")

    dup_ref = ray.put(np.sort(np.asarray(dup_hashes, dtype=np.int64)))

    def split(b: pa.Table, want_suspect: bool) -> pa.Table:
        dup = ray.get(dup_ref)
        h = _hash64(b[key]).view(np.int64)
        if len(dup) == 0:
            member = np.zeros(len(h), dtype=bool)
        else:
            idx = np.clip(np.searchsorted(dup, h), 0, len(dup) - 1)
            member = dup[idx] == h
        return b.filter(pa.array(member if want_suspect else ~member))

    clean = ds.map_batches(
        lambda b: split(b, False), batch_format="pyarrow",
        batch_size=None,
    )
    suspects = ds.map_batches(
        lambda b: add_bucket(split(b, True), key, num_buckets),
        batch_format="pyarrow", batch_size=None,
    )
    winners = suspects.groupby(_BUCKET).map_groups(
        fn, batch_format="pyarrow")
    return clean.union(winners)


def scan_duplicate_keys(
    paths, key: str = "doc_id", final_shards: int | None = None
) -> np.ndarray:
    """Column-pruned parquet scan -> sorted int64 hashes of keys seen > once.

    Only the key column leaves storage (the "prune at the read" rule), and
    the shuffle moves 8-byte key HASHES, not strings — an order of magnitude
    cheaper to sort/exchange. Hash collisions are harmless: a colliding
    unique key is merely routed through the claim path, where claims are made
    on REAL keys (each distinct key gets its own grant). At 10^12-row scale
    the returned exact array generalizes to a Bloom filter with the same
    false-positives-are-safe property.

    ``final_shards``: the combine is SHARDED by hash range — each shard
    merges and filters its own slice in parallel; only the duplicate
    hashes (tiny by construction) ever reach the driver. Default (None)
    auto-sizes to the CPU pool: the partial tables hold ~one row per
    distinct key, so a single final combine is a serial wall that grows
    with the corpus (measured ~4 s per 16M keys) while the sharded shape
    scales with workers. Pass 1 explicitly for tiny corpora where the
    shuffle overhead exceeds the combine.
    """
    import ray.data as rd

    from mimirsbrunn_ray.sources.formats import detect_format, _expand, read_table
    from mimirsbrunn_ray.sources.ingest import num_blocks_for

    files = _expand(paths)
    if all(detect_format(f)[0] == "parquet" for f in files):
        # one block per input file: the key column is tiny, but a single
        # coalesced block would make the scan+hash SERIAL (measured 9s of
        # the 4-CPU leg's floor at 16M keys); per-file blocks let the
        # partial hashing ride every core while staying <= n_files
        # (round-4 learning: never split files)
        ds = rd.read_parquet(files, columns=[key],
                             override_num_blocks=len(files))
    else:
        # CSV/JSONL drops: same key-only projection via the format reader
        ds = read_table(files, columns=[key])

    def key_partials(batch: pa.Table) -> pa.Table:
        h = _hash64(batch[key]).view(np.int64)
        uniq, counts = np.unique(h, return_counts=True)
        return pa.table({"h": uniq, "n": counts})

    def combine(b: pa.Table) -> pa.Table:
        g = b.group_by(["h"]).aggregate([("n", "sum")])
        return g.rename_columns(["h", "n"])

    def only_dups(b: pa.Table) -> pa.Table:
        return b.filter(pc.greater(b["n"], 1)).select(["h"])

    from mimirsbrunn_ray.context import pool_size
    from mimirsbrunn_ray.stages.rollup import tree_merge

    if final_shards is None:
        # auto-size by input volume: the combine's cost tracks the distinct
        # key count (~input rows). Small corpora fit one fast tree-merge
        # task; beyond ~4M keys per combine task the sharded shuffle wins.
        # ~170 bytes/row in this corpus shape -> one shard per ~700 MB.
        import os as _os

        total = 0
        for f in files:
            try:
                total += _os.path.getsize(f)
            except OSError:
                total = None
                break
        if total is None:
            final_shards = max(4, pool_size())
        else:
            final_shards = min(
                max(1, total // (700 << 20)), max(4, pool_size())
            )

    partials = ds.map_batches(key_partials, batch_format="pyarrow", batch_size=None)
    if final_shards <= 1:
        counts = tree_merge(partials, combine)
        dups = counts.map_batches(
            only_dups, batch_format="pyarrow", batch_size=None
        )
    else:
        def add_shard(b: pa.Table) -> pa.Table:
            h = b["h"].to_numpy(zero_copy_only=False).view(np.uint64)
            return b.append_column(
                "_s", pa.array((h % np.uint64(final_shards)).astype(np.int32))
            )

        sharded = partials.map_batches(
            add_shard, batch_format="pyarrow", batch_size=None
        )
        dups = sharded.groupby("_s").map_groups(
            lambda g: only_dups(combine(g.drop_columns(["_s"]))),
            batch_format="pyarrow",
        )
    # vectorized driver pull — bounded by the dup count, no per-row dicts
    chunks = [
        b["h"].to_numpy(zero_copy_only=False)
        for b in dups.iter_batches(batch_format="pyarrow")
    ]
    if not chunks:
        return np.empty(0, dtype=np.int64)
    return np.sort(np.concatenate(chunks).astype(np.int64, copy=False))


class ClaimActor:
    """Tiny shared claim table for duplicate keys only — the engine's one
    legitimately-raw-actor piece of state (a shared mutable index, which the
    Dataset API cannot express; SURVEY.md design stance).

    Claims are owned: a retried task re-presents the same deterministic
    owner token (derived from its batch's candidate keys) and re-acquires
    its grants, so task retries never lose rows — the idempotence-on-retry
    requirement the reference gets from ES ``_id`` upserts
    (/root/reference/libs/mimir/src/rubber.rs:690-696)."""

    def __init__(self) -> None:
        self.owners: dict = {}

    def claim(self, keys: list, owner: str) -> list:
        out = []
        owners = self.owners
        for k in keys:
            cur = owners.get(k)
            if cur is None:
                owners[k] = owner
                out.append(True)
            else:
                out.append(cur == owner)
        return out


def dedup_identical_sparse(
    ds: "rd.Dataset",
    dup_hashes: np.ndarray,
    key: str = "doc_id",
    counters=None,
) -> "rd.Dataset":
    """Single-pass dedup for byte-identical duplicate payloads.

    Rows whose key hash is not in ``dup_hashes`` (the vast majority) stream
    through with ZERO shuffle; rows in it consult a claim actor — first
    claim wins, later copies drop. Because duplicate payloads are identical
    (validated upstream; the generator plants them so, FIXTURES.md §2), the
    output CONTENT is deterministic even though which physical copy survives
    is not. For differing payloads with a deterministic-winner rule use
    ``dedup_exact`` (keep-min graft).
    """
    import ray

    dup_arr_ref = ray.put(np.sort(np.asarray(dup_hashes, dtype=np.int64)))
    claimer = ray.remote(num_cpus=0)(ClaimActor).remote()

    from mimirsbrunn_ray.context import pool_size

    return ds.map_batches(
        ClaimFilterStage,
        fn_constructor_kwargs={
            "dup_ref": dup_arr_ref,
            "claimer": claimer,
            "key": key,
            "counters": counters,
        },
        batch_format="pyarrow",
        batch_size=None,
        concurrency=(1, pool_size()),
    )


class ClaimFilterStage:
    """The claim-filter as a reusable actor-pool stage (see
    ``dedup_identical_sparse`` for semantics)."""

    def __init__(self, dup_ref, claimer, key: str, counters=None):
        import ray

        self.dup_hashes = ray.get(dup_ref)  # once per actor
        self.claimer = claimer
        self.key = key
        self.counters = counters

    def __call__(self, batch: pa.Table) -> pa.Table:
        import hashlib

        import ray

        if len(self.dup_hashes) == 0:
            return batch
        key = self.key
        h = _hash64(batch[key]).view(np.int64)
        pos = np.searchsorted(self.dup_hashes, h)
        pos = np.clip(pos, 0, len(self.dup_hashes) - 1)
        in_dup_np = self.dup_hashes[pos] == h
        if not in_dup_np.any():
            return batch
        in_dup = pa.array(in_dup_np)
        cand = pc.filter(batch[key], in_dup).to_pylist()
        # drop in-batch later copies locally; only first occurrences claim
        seen: set = set()
        first = []
        for k in cand:
            if k in seen:
                first.append(False)
            else:
                seen.add(k)
                first.append(True)
        firsts = [k for k, f in zip(cand, first) if f]
        owner = hashlib.sha1("\x00".join(map(str, cand)).encode()).hexdigest()
        granted_first = ray.get(self.claimer.claim.remote(firsts, owner))
        it = iter(granted_first)
        granted = [f and next(it) for f in first]
        keep = np.ones(batch.num_rows, dtype=bool)
        keep[in_dup_np] = granted
        dropped = int(len(granted) - sum(granted))
        if self.counters is not None and dropped:
            self.counters.inc.remote({"rows_deduped": dropped})
        return batch.filter(pa.array(keep))


def exact_distinct_per_group(
    ds: "rd.Dataset",
    group_col,
    distinct_col: str,
    out_col: str = "n_distinct",
    num_buckets: int = 64,
) -> "rd.Dataset":
    """EXACT COUNT(DISTINCT distinct_col) GROUP BY group_col(s) — the
    exact complement of the HLL approximate-distinct sketch
    (stages/sketch.py), built on the same hash-bucket discipline as
    ``dedup_exact``. ``group_col`` is one column name or a list (composite
    keys, e.g. (event_type, hour bucket)).

    Shape (combiner-first, ONE shuffle, nothing corpus-sized anywhere):

      1. per-batch PARTIAL pair distinct inside ``map_batches`` — each
         block collapses to its distinct (group, value) pairs, so the
         shuffle moves per-block distinct pairs, never rows;
      2. ONE hash shuffle bucketing on the VALUE (every occurrence of a
         value lands in exactly one bucket, so a per-bucket distinct is
         globally exact); per bucket: one vectorized pair-dedup + a
         C-level count per group;
      3. the per-bucket (group, n) partial counts are additive across
         buckets (value-disjoint by construction) — tree-merged, no
         second shuffle.

    NULL values are dropped (SQL COUNT(DISTINCT) semantics); NULL group
    keys are dropped too (engine-divergent GROUP BY NULL semantics — the
    oracle filters identically).
    """
    import pyarrow.compute as pc

    from mimirsbrunn_ray.stages.rollup import tree_merge

    group_cols = [group_col] if isinstance(group_col, str) else list(group_col)
    pair_cols = group_cols + [distinct_col]

    def pair_partial(b: pa.Table) -> pa.Table:
        valid = pc.is_valid(b[distinct_col])
        for c in group_cols:
            valid = pc.and_(valid, pc.is_valid(b[c]))
        b = b.filter(valid)
        return b.select(pair_cols).group_by(pair_cols).aggregate([])

    pairs = ds.map_batches(
        pair_partial, batch_format="pyarrow", batch_size=None
    ).map_batches(
        lambda b: add_bucket(b, distinct_col, num_buckets),
        batch_format="pyarrow",
        batch_size=None,
    )

    def per_bucket(group: pa.Table) -> pa.Table:
        t = group.drop_columns([_BUCKET])
        if t.num_rows == 0:
            cols = {
                c: pa.array([], t.schema.field(c).type) for c in group_cols
            }
            cols["_n"] = pa.array([], pa.int64())
            return pa.table(cols)
        # exact pair dedup then per-group count, both C-level
        d = t.group_by(pair_cols).aggregate([])
        c = d.group_by(group_cols).aggregate([([], "count_all")])
        c = c.select(group_cols + ["count_all"])
        return c.rename_columns(group_cols + ["_n"])

    partial_counts = pairs.groupby(_BUCKET).map_groups(
        per_bucket, batch_format="pyarrow"
    )

    def combine(b: pa.Table) -> pa.Table:
        g = b.group_by(group_cols).aggregate([("_n", "sum")])
        g = g.select(group_cols + ["_n_sum"])
        return g.rename_columns(group_cols + ["_n"])

    merged = tree_merge(partial_counts, combine)
    return merged.map_batches(
        lambda b: b.select(group_cols + ["_n"]).rename_columns(
            group_cols + [out_col]
        ),
        batch_format="pyarrow",
        batch_size=None,
    )


def cross_group_duplicate_overlap(
    ds: "rd.Dataset",
    group_col: str = "source",
    text_col: str = "text",
    num_buckets: int = 64,
) -> "pa.Table":
    """Corpus-provenance overlap: for every pair of groups (sources,
    dumps, snapshots), how many DISTINCT payloads appear in both — the
    "which crawls duplicate each other" diagnostic run before choosing
    mixture weights, and the cross-run flavor of exact dedup (D1).

    EXACT: rows shuffle on a hash bucket of the payload, but within a
    bucket, grouping is by the payload VALUE (pandas factorize — hash
    collisions cannot merge distinct texts, unlike the 64-bit-hash
    caveat in simjoin). Pair fan-out per distinct payload is bounded by
    the number of groups, and the final count table by group-pairs, so
    the tree-merged tail is tiny by construction.

    Output (driver pa.Table, bounded by group-pairs):
    (f"{group_col}_a", f"{group_col}_b", n_shared int64) with
    a < b in group order; null payloads/groups are dropped (SQL JOIN
    twin).
    """
    from mimirsbrunn_ray.stages.neardup import _segment_pairs
    from mimirsbrunn_ray.stages.rollup import tree_merge

    def bucketize(b: pa.Table) -> pa.Table:
        b = b.filter(
            pc.and_(pc.is_valid(b[text_col]), pc.is_valid(b[group_col]))
        )
        # the payload hash is ONLY a partitioner (add_bucket's vectorized
        # _hash64) — equality below is on the exact value, so a collision
        # just co-locates two texts
        t = pa.table({"t": b[text_col], "g": b[group_col]})
        return add_bucket(t, "t", num_buckets)

    bucketed = ds.map_batches(
        bucketize, batch_format="pyarrow", batch_size=None
    )

    pair_schema = pa.schema([("a", pa.string()), ("b", pa.string())])

    def pairs_in_bucket(group: pa.Table) -> pa.Table:
        # typed-arrow output (empty object-dtype pandas blocks trip Ray's
        # block-size estimator)
        if group.num_rows == 0:
            return pair_schema.empty_table()
        g = group.to_pandas()
        # exact value grouping: factorize is hash-based C code on the
        # full strings
        g = g.assign(_tc=pd.factorize(g["t"])[0])
        out = _segment_pairs(g, ["_tc"], "g")
        return pa.Table.from_pandas(
            out, schema=pair_schema, preserve_index=False
        )

    pair_rows = bucketed.groupby(_BUCKET).map_groups(
        pairs_in_bucket, batch_format="pyarrow"
    )

    a_col, b_col = f"{group_col}_a", f"{group_col}_b"

    def partial(b: pa.Table) -> pa.Table:
        c = b.group_by(["a", "b"]).aggregate([([], "count_all")])
        c = c.select(["a", "b", "count_all"])
        return c.rename_columns(["a", "b", "n"])

    def combine(b: pa.Table) -> pa.Table:
        c = b.group_by(["a", "b"]).aggregate([("n", "sum")])
        return c.rename_columns(["a", "b", "n"])

    parts = list(
        tree_merge(
            pair_rows.map_batches(
                partial, batch_format="pyarrow", batch_size=None
            ),
            combine,
        ).iter_batches(batch_format="pyarrow")
    )
    out_schema = pa.schema(
        [(a_col, pa.string()), (b_col, pa.string()), ("n_shared", pa.int64())]
    )
    if not parts:
        # typed empty pa.Table — an empty Dataset drops its columns in
        # to_pandas() and would fail the driver's schema compare
        return out_schema.empty_table()
    tbl = pa.concat_tables(parts)
    return tbl.rename_columns([a_col, b_col, "n_shared"]).set_column(
        2, "n_shared", tbl.column(2).cast(pa.int64())
    )
