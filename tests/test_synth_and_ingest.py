"""Generator determinism + ingest validation (warn-and-skip graft,
/root/reference/src/addr_reader.rs:39-52)."""

import collections

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from mimirsbrunn_ray.functions.timeutil import EPOCH0_US, TS_STEP_US
from mimirsbrunn_ray.sources.ingest import ValidateAndDerive, parse_doc_index


def test_duplicates_have_identical_payload(corpus):
    tables = [pq.read_table(p) for p in corpus["main_paths"]]
    full = pa.concat_tables(tables)
    counts = collections.Counter(full["doc_id"].to_pylist())
    dups = [k for k, v in counts.items() if v > 1]
    assert len(dups) == corpus["n_duplicates"]
    for d in dups[:20]:
        rows = full.filter(pa.compute.equal(full["doc_id"], d))
        payloads = {tuple(x) for x in rows["tokens"].to_pylist()}
        assert len(payloads) == 1


def test_generator_is_deterministic(tmp_path, corpus):
    from mimirsbrunn_ray.sources.synth import generate_sequences

    meta2 = generate_sequences(str(tmp_path / "again"), 12_000, n_files=6)
    t1 = pq.read_table(corpus["main_paths"][0])
    t2 = pq.read_table(str(tmp_path / "again" / "part-00000.parquet"))
    assert t1.equals(t2)
    assert meta2["n_dirty"] == corpus["n_dirty"]
    assert meta2["n_dirty_main"] == corpus["n_dirty_main"]


def test_parse_doc_index():
    ids = pa.chunked_array([["doc-web-0000000042", "doc-misc-0000999999", "garbage"]])
    idx = parse_doc_index(ids)
    assert list(idx) == [42, 999_999, -1]


def test_validate_drops_dirty_and_derives_time():
    from mimirsbrunn_ray.schemas import SEQUENCES_SCHEMA

    t = pa.table(
        {
            "doc_id": ["doc-web-0000000000", "doc-web-0000000001", "doc-web-0000000128", None],
            "tokens": [[1, 2], [3], [], [5]],
            "n_tok": [2, 99, 0, 1],  # row 1 dirty
            "source": ["web"] * 4,
        },
        schema=SEQUENCES_SCHEMA,
    )
    out = ValidateAndDerive()(t)
    assert out.num_rows == 2  # dirty + null doc_id dropped; empty tokens kept
    ts = out["ts"].cast(pa.int64()).to_pylist()
    # index // 64 ticks: idx 0 -> tick 0, idx 128 -> tick 2
    assert ts == [EPOCH0_US, EPOCH0_US + 2 * TS_STEP_US]
    b = out["bucket_1m"].cast(pa.int64()).to_pylist()
    assert all(x % 60_000_000 == 0 for x in b)


def test_quarantine_captures_dropped_rows(tmp_path):
    """quarantine_dir: dropped rows land in parquet with a per-check
    reason column; clean rows never do; counts stay consistent."""
    import glob as _glob

    import pyarrow.parquet as pq

    from mimirsbrunn_ray.schemas import SEQUENCES_SCHEMA

    t = pa.table(
        {
            "doc_id": ["doc-web-0000000000", "doc-web-0000000001",
                       "doc-web-0000000128", None],
            "tokens": [[1, 2], [3], [], [5]],
            "n_tok": [2, 99, 0, 1],  # row 1 len_mismatch, row 3 bad_id
            "source": ["web"] * 4,
        },
        schema=SEQUENCES_SCHEMA,
    )
    qdir = str(tmp_path / "quarantine")
    out = ValidateAndDerive(quarantine_dir=qdir)(t)
    assert out.num_rows == 2
    files = _glob.glob(f"{qdir}/q-*.parquet")
    assert len(files) == 1
    bad = pq.read_table(files[0]).to_pandas()
    assert len(bad) == 2
    got = dict(zip(bad["doc_id"].where(bad["doc_id"].notna(), None),
                   bad["reason"]))
    assert got["doc-web-0000000001"] == "len_mismatch"
    assert got[None] == "bad_id"

    # clean batch: no new quarantine part
    clean = pa.table(
        {
            "doc_id": ["doc-web-0000000002"],
            "tokens": [[7, 8]],
            "n_tok": [2],
            "source": ["web"],
        },
        schema=SEQUENCES_SCHEMA,
    )
    ValidateAndDerive(quarantine_dir=qdir)(clean)
    assert len(_glob.glob(f"{qdir}/q-*.parquet")) == 1
