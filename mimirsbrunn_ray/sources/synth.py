"""Deterministic synthetic `sequences` corpus generator (FIXTURES.md §2).

Mirrors the reference's fixture philosophy — small deterministic inputs with
deliberately planted dirty rows and duplicate keys, asserted by exact golden
counts (/root/reference/tests/bano2mimir_test.rs:42-125: "exactly 35 docs,
malformed line dropped, empty street filtered") — scaled up so the same
corpus also drives the N-vs-4N bench.

All generation is numpy-vectorized and seeded; no wall clock anywhere.
Written as >= n_files parquet files so Ray parallelizes the read.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from mimirsbrunn_ray.functions.timeutil import US_PER_MINUTE, ts_from_index

VOCAB = 50_257

# 8 sources, Zipf-like; "web" is the planted hot source (>= 40% of rows) that
# exercises skew handling — the "China's population" analog of the reference's
# fixed global max (/root/reference/src/utils.rs:55-62).
SOURCES = ["web", "code", "books", "wiki", "news", "forum", "social", "misc"]
SOURCE_P = [0.40, 0.20, 0.12, 0.08, 0.07, 0.05, 0.045, 0.035]
GAP_SOURCES = ("books", "wiki")  # sources with withheld 1m buckets


@dataclass
class GenMeta:
    n_rows_written: int = 0
    n_clean: int = 0
    n_dirty: int = 0
    n_duplicates: int = 0
    n_late: int = 0
    n_gap_dropped: int = 0
    gap_buckets_us: dict = field(default_factory=dict)  # source -> [bucket_us]
    files: list = field(default_factory=list)
    late_files: list = field(default_factory=list)


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 mix — public-domain PRNG finalizer."""
    z = (x.astype(np.uint64) + np.uint64(0x9E3779B97F4A7C15))
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def _make_table(
    idx: np.ndarray,
    src_codes: np.ndarray,
    dirty_mask: np.ndarray,
) -> pa.Table:
    """Build rows whose token payload is a PURE function of the doc index —
    duplicates are byte-identical no matter which shard or pass emits them
    (the determinism-by-construction stance of the reference, SURVEY.md §5).
    """
    n = len(idx)
    h = _splitmix64(idx)
    # length ~ uniform [1, 356] (mean ~178, matching LogNormal(5,0.6)'s mean);
    # 0.1% empty token lists (valid rows: n_tok == 0) for min/max aggregates
    lengths = 1 + (h % np.uint64(356)).astype(np.int64)
    lengths[(h % np.uint64(1000)) == 0] = 0
    total = int(lengths.sum())
    offsets = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(lengths, out=offsets[1:])
    row_of = np.repeat(np.arange(n, dtype=np.int64), lengths)
    pos_in_row = np.arange(total, dtype=np.int64) - np.repeat(offsets[:-1], lengths)
    values = (
        _splitmix64(idx[row_of] * np.int64(2654435761) + pos_in_row)
        % np.uint64(VOCAB)
    ).astype(np.int32)
    tokens = pa.LargeListArray.from_arrays(offsets, values).cast(
        pa.list_(pa.int32())
    )
    n_tok = lengths.astype(np.int32)
    # dirty rows: n_tok deliberately != len(tokens) -> engine must drop + count
    n_tok = np.where(dirty_mask, n_tok + 1, n_tok).astype(np.int32)

    src_arr = np.asarray(SOURCES, dtype=object)[src_codes]
    doc_id = np.char.add(
        np.char.add("doc-", src_arr.astype(str)),
        np.char.add("-", np.char.zfill(idx.astype(str), 10)),
    )
    return pa.table(
        {
            "doc_id": pa.array(doc_id, type=pa.string()),
            "tokens": tokens,
            "n_tok": pa.array(n_tok),
            "source": pa.array(src_arr, type=pa.string()),
        }
    )


def generate_sequences(
    out_dir: str,
    n_rows: int,
    n_files: int = 8,
    seed: int = 42,
    dirty_frac: float = 0.005,
    dup_frac: float = 0.01,
    late_frac: float = 0.002,
    n_gap_buckets: int = 3,
) -> dict:
    """Write a deterministic sequences corpus; return golden metadata.

    Planted edge cases (exact counts recorded so goldens are derivable):
      * ``dup_frac`` rows duplicated with identical payload (exact dedup,
        keep-first — grafting keep-min-id street dedup,
        /root/reference/src/osm_reader/street.rs:202-234);
      * for each source in GAP_SOURCES, all rows in ``n_gap_buckets``
        specific 1m buckets withheld (gap-fill must reconstruct them);
      * ``dirty_frac`` rows with n_tok != len(tokens) -> dropped + counted
        (warn-and-skip policy, /root/reference/src/addr_reader.rs:39-52);
      * ``late_frac`` rows with early event time shipped in separate
        ``late/`` files (late-data / as-of merge path).
    """
    rng = np.random.default_rng(seed)
    meta = GenMeta()
    os.makedirs(out_dir, exist_ok=True)
    late_dir = os.path.join(out_dir, "late")
    os.makedirs(late_dir, exist_ok=True)

    idx_all = np.arange(n_rows, dtype=np.int64)
    src_codes_all = rng.choice(len(SOURCES), size=n_rows, p=SOURCE_P)
    dirty_all = rng.random(n_rows) < dirty_frac

    # --- plant gaps: for each gap source drop every row of n_gap_buckets
    # specific 1m buckets in the middle of the time range ------------------
    ts_all = ts_from_index(idx_all)
    bucket_all = (ts_all // US_PER_MINUTE) * US_PER_MINUTE
    drop = np.zeros(n_rows, dtype=bool)
    lo, hi = bucket_all.min(), bucket_all.max()
    span = max(1, (hi - lo) // US_PER_MINUTE)
    for s in GAP_SOURCES:
        code = SOURCES.index(s)
        picks = []
        for k in range(n_gap_buckets):
            b = lo + ((span * (k + 1)) // (n_gap_buckets + 1)) * US_PER_MINUTE
            picks.append(int(b))
            drop |= (src_codes_all == code) & (bucket_all == b)
        meta.gap_buckets_us[s] = picks
    meta.n_gap_dropped = int(drop.sum())

    keep = ~drop
    idx = idx_all[keep]
    src_codes = src_codes_all[keep]
    dirty = dirty_all[keep]

    # --- late rows: earliest indices delivered out-of-band ----------------
    n_late = int(len(idx) * late_frac)
    late_sel = np.zeros(len(idx), dtype=bool)
    late_sel[:n_late] = True
    meta.n_late = n_late

    # --- duplicates -------------------------------------------------------
    main_idx = idx[~late_sel]
    main_src = src_codes[~late_sel]
    main_dirty = dirty[~late_sel]
    n_dup = int(len(main_idx) * dup_frac)
    dup_pos = rng.choice(len(main_idx), size=n_dup, replace=False)
    meta.n_duplicates = n_dup

    order = np.concatenate([np.arange(len(main_idx)), dup_pos])
    # dirty count is per EMITTED row (a duplicated dirty row counts twice)
    meta.n_dirty = int(main_dirty[order].sum()) + int(dirty[late_sel].sum())
    # deterministic shuffle so duplicates are interleaved, not appended
    perm = rng.permutation(len(order))
    order = order[perm]

    shards = np.array_split(np.arange(len(order)), n_files)
    for i, shard in enumerate(shards):
        sel = order[shard]
        tbl = _make_table(main_idx[sel], main_src[sel], main_dirty[sel])
        path = os.path.join(out_dir, f"part-{i:05d}.parquet")
        pq.write_table(tbl, path)
        meta.files.append(path)
        meta.n_rows_written += len(sel)

    if n_late:
        tbl = _make_table(idx[late_sel], src_codes[late_sel], dirty[late_sel])
        path = os.path.join(late_dir, "part-00000.parquet")
        pq.write_table(tbl, path)
        meta.late_files.append(path)
        meta.n_rows_written += n_late

    meta.n_clean = meta.n_rows_written - meta.n_dirty
    out = meta.__dict__
    with open(os.path.join(out_dir, "_gen_meta.json"), "w") as f:
        json.dump(out, f, indent=1)
    return out
