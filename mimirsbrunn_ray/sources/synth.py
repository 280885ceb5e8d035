"""Deterministic synthetic `sequences` corpus generator (FIXTURES.md §2).

Mirrors the reference's fixture philosophy — small deterministic inputs with
deliberately planted dirty rows and duplicate keys, asserted by exact golden
counts (/root/reference/tests/bano2mimir_test.rs:42-125: "exactly 35 docs,
malformed line dropped, empty street filtered") — scaled up so the same
corpus also drives the N-vs-4N bench.

Every per-row decision (source, token payload, dirty flag, duplication,
gap membership) is a pure function of (seed, row index), so generation is
embarrassingly parallel: shards are written by Ray tasks when a cluster is
up (the driver process is CPU-constrained in this sandbox), else inline.
No wall clock anywhere; same (seed, n_rows, n_files) -> identical bytes.
"""

from __future__ import annotations

import json
import os

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


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 mix — public-domain PRNG finalizer."""
    z = (x.astype(np.uint64) + np.uint64(0x9E3779B97F4A7C15))
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def _row_hash(idx: np.ndarray, seed: int, stream: int) -> np.ndarray:
    mix = (seed * 0x9E3779B97F4A7C15 + stream * 0xC2B2AE3D27D4EB4F) % (1 << 64)
    return _splitmix64(idx.astype(np.uint64) ^ np.uint64(mix))


def _source_codes(idx: np.ndarray, seed: int) -> np.ndarray:
    u = _row_hash(idx, seed, 1).astype(np.float64) / 2.0**64
    cum = np.cumsum(np.asarray(SOURCE_P))
    cum[-1] = 1.0
    return np.searchsorted(cum, u, side="right").clip(0, len(SOURCES) - 1)


def _make_table(idx: np.ndarray, src_codes: np.ndarray, dirty: np.ndarray) -> pa.Table:
    """Rows whose payload is a PURE function of the doc index — duplicates
    are byte-identical no matter which shard or pass emits them."""
    n = len(idx)
    h = _splitmix64(idx)
    # length ~ uniform [1, 356] (mean ~178); 0.1% empty lists (valid, n_tok=0)
    lengths = 1 + (h % np.uint64(356)).astype(np.int64)
    lengths[(h % np.uint64(1000)) == 0] = 0
    total = int(lengths.sum())
    offsets = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(lengths, out=offsets[1:])
    row_of = np.repeat(np.arange(n, dtype=np.int64), lengths)
    pos = np.arange(total, dtype=np.int64) - np.repeat(offsets[:-1], lengths)
    values = (
        _splitmix64(idx[row_of] * np.int64(2654435761) + pos) % np.uint64(VOCAB)
    ).astype(np.int32)
    tokens = pa.LargeListArray.from_arrays(offsets, values).cast(pa.list_(pa.int32()))
    n_tok = lengths.astype(np.int32)
    n_tok = np.where(dirty, n_tok + 1, n_tok).astype(np.int32)
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


def gap_buckets(n_rows: int, n_gap_buckets: int) -> dict:
    """Deterministic withheld 1m buckets per gap source (same for any shard)."""
    ts_lo = int(ts_from_index(np.array([0]))[0])
    ts_hi = int(ts_from_index(np.array([n_rows - 1]))[0])
    lo = (ts_lo // US_PER_MINUTE) * US_PER_MINUTE
    hi = (ts_hi // US_PER_MINUTE) * US_PER_MINUTE
    span = max(1, (hi - lo) // US_PER_MINUTE)
    out = {}
    for s in GAP_SOURCES:
        out[s] = [
            int(lo + ((span * (k + 1)) // (n_gap_buckets + 1)) * US_PER_MINUTE)
            for k in range(n_gap_buckets)
        ]
    return out


def _write_chunked(
    path: str,
    idx: np.ndarray,
    src: np.ndarray,
    dirty: np.ndarray,
    chunk: int = 200_000,
) -> None:
    """Stream a shard to parquet in bounded sub-chunks.

    ``_make_table`` materializes ~6 transient uint64 arrays of
    sum(lengths) elements (mean ~178 tokens/row), so building a whole
    multi-million-row shard at once peaks at GBs per task — 32 concurrent
    gen tasks OOM'd a 128 GiB box at 64M rows. One ParquetWriter row
    group per ``chunk`` rows caps the peak near ~1 GiB regardless of
    shard size; row CONTENT is unchanged (payload is a pure function of
    the row index), only the row-group layout differs.
    """
    writer = None
    try:
        for s in range(0, max(len(idx), 1), chunk):
            tbl = _make_table(idx[s:s + chunk], src[s:s + chunk],
                              dirty[s:s + chunk])
            if writer is None:
                writer = pq.ParquetWriter(path, tbl.schema,
                                          compression="zstd",
                                          compression_level=3)
            writer.write_table(tbl)
    finally:
        if writer is not None:
            writer.close()


def _gen_shard(
    out_dir: str,
    shard_id: int,
    lo: int,
    hi: int,
    n_rows: int,
    seed: int,
    dirty_frac: float,
    dup_frac: float,
    late_frac: float,
    n_gap_buckets: int,
) -> dict:
    """Generate rows for global indices [lo, hi); pure + parallel-safe."""
    idx = np.arange(lo, hi, dtype=np.int64)
    src = _source_codes(idx, seed)

    # gaps: drop rows of gap sources falling in the withheld buckets
    gaps = gap_buckets(n_rows, n_gap_buckets)
    ts = ts_from_index(idx)
    bucket = (ts // US_PER_MINUTE) * US_PER_MINUTE
    drop = np.zeros(len(idx), dtype=bool)
    for s, bs in gaps.items():
        code = SOURCES.index(s)
        for b in bs:
            drop |= (src == code) & (bucket == b)
    n_gap_dropped = int(drop.sum())
    idx, src = idx[~drop], src[~drop]

    # late rows: the first late_frac of the GLOBAL index space ships in late/
    n_late_global = int(n_rows * late_frac)
    late_sel = idx < n_late_global
    late_idx, late_src = idx[late_sel], src[late_sel]
    idx, src = idx[~late_sel], src[~late_sel]

    # duplicates: rows chosen by hash are emitted twice (identical payload)
    dup_sel = (_row_hash(idx, seed, 2).astype(np.float64) / 2.0**64) < dup_frac
    dup_idx, dup_src = idx[dup_sel], src[dup_sel]
    emit_idx = np.concatenate([idx, dup_idx])
    emit_src = np.concatenate([src, dup_src])
    # deterministic interleave so duplicates aren't trailing
    order = np.argsort(_row_hash(np.arange(len(emit_idx)) + lo, seed, 3), kind="stable")
    emit_idx, emit_src = emit_idx[order], emit_src[order]

    dirty = (_row_hash(emit_idx, seed, 4).astype(np.float64) / 2.0**64) < dirty_frac

    meta = {
        "n_rows_written": 0,
        "n_dirty": 0,
        "n_dirty_main": 0,
        "n_dirty_late": 0,
        "n_duplicates": int(dup_sel.sum()),
        "n_late": int(late_sel.sum()),
        "n_gap_dropped": n_gap_dropped,
    }
    _write_chunked(os.path.join(out_dir, f"part-{shard_id:05d}.parquet"),
                   emit_idx, emit_src, dirty)
    meta["n_rows_written"] += len(emit_idx)
    meta["n_dirty_main"] += int(dirty.sum())
    if len(late_idx):
        late_dirty = (
            _row_hash(late_idx, seed, 4).astype(np.float64) / 2.0**64
        ) < dirty_frac
        _write_chunked(
            os.path.join(out_dir, "late", f"part-{shard_id:05d}.parquet"),
            late_idx, late_src, late_dirty,
        )
        meta["n_rows_written"] += len(late_idx)
        meta["n_dirty_late"] += int(late_dirty.sum())
    meta["n_dirty"] = meta["n_dirty_main"] + meta["n_dirty_late"]
    return meta


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

    Planted edge cases (FIXTURES.md §2): identical-payload duplicates
    (exact dedup keep-first, grafting keep-min street dedup,
    /root/reference/src/osm_reader/street.rs:202-234); withheld 1m buckets
    per GAP_SOURCES (gap-fill must reconstruct); dirty rows with
    n_tok != len(tokens) (warn-and-skip, /root/reference/src/addr_reader.rs:39-52);
    late rows in ``late/`` files (as-of / resume path).
    """
    os.makedirs(out_dir, exist_ok=True)
    os.makedirs(os.path.join(out_dir, "late"), exist_ok=True)
    bounds = np.linspace(0, n_rows, n_files + 1, dtype=np.int64)
    args = [
        (out_dir, i, int(bounds[i]), int(bounds[i + 1]), n_rows, seed,
         dirty_frac, dup_frac, late_frac, n_gap_buckets)
        for i in range(n_files)
    ]

    metas = None
    try:
        import ray

        if ray.is_initialized():
            gen = ray.remote(num_cpus=1)(_gen_shard)
            metas = ray.get([gen.remote(*a) for a in args])
    except Exception:
        metas = None
    if metas is None:
        metas = [_gen_shard(*a) for a in args]

    meta = {
        "n_rows_written": 0, "n_dirty": 0, "n_dirty_main": 0,
        "n_dirty_late": 0, "n_duplicates": 0, "n_late": 0, "n_gap_dropped": 0,
    }
    for m in metas:
        for k in meta:
            meta[k] += m[k]
    meta["n_clean"] = meta["n_rows_written"] - meta["n_dirty"]
    meta["gap_buckets_us"] = gap_buckets(n_rows, n_gap_buckets)
    meta["files"] = sorted(
        os.path.join(out_dir, f) for f in os.listdir(out_dir) if f.endswith(".parquet")
    )
    meta["late_files"] = sorted(
        os.path.join(out_dir, "late", f)
        for f in os.listdir(os.path.join(out_dir, "late"))
        if f.endswith(".parquet")
    )
    with open(os.path.join(out_dir, "_gen_meta.json"), "w") as f:
        json.dump(meta, f, indent=1)
    return meta
