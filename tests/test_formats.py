"""Multi-format sources (S1–S3/S6–S8 graft): CSV, CSV.gz, JSONL readers
produce the same rows as the parquet fast path, including the typed
sequences ingest (/root/reference/src/addr_reader.rs:115-159)."""

import gzip
import os
import shutil

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from mimirsbrunn_ray.sources.formats import detect_format, read_table

SF = "/root/testdata/sf0.001"
OUT = "/tmp/mimirsbrunn_ray_test_formats"


def test_detect_format():
    assert detect_format("a/b.parquet") == ("parquet", False)
    assert detect_format("x.csv") == ("csv", False)
    assert detect_format("x.CSV.GZ") == ("csv", True)
    assert detect_format("x.tsv") == ("csv", False)
    assert detect_format("x.jsonl") == ("json", False)
    assert detect_format("x.ndjson.gz") == ("json", True)
    with pytest.raises(ValueError):
        detect_format("x.xml")


@pytest.fixture(scope="module")
def format_dir():
    shutil.rmtree(OUT, ignore_errors=True)
    os.makedirs(OUT)
    docs = pq.read_table(f"{SF}/documents.parquet").to_pandas()
    docs.to_csv(f"{OUT}/documents.csv", index=False)
    with open(f"{OUT}/documents.csv", "rb") as f:
        with gzip.open(f"{OUT}/documents.csv.gz", "wb") as g:
            g.write(f.read())
    docs.to_json(f"{OUT}/documents.jsonl", orient="records", lines=True)
    return docs


def _roundtrip(ray_session, path, docs, **kw):
    out = (
        read_table(path, **kw)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    want = docs.sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        out[sorted(out.columns)], want[sorted(want.columns)], check_dtype=False
    )


def test_read_csv_matches_parquet(ray_session, format_dir):
    _roundtrip(ray_session, f"{OUT}/documents.csv", format_dir)


def test_read_csv_gz_matches_parquet(ray_session, format_dir):
    _roundtrip(ray_session, f"{OUT}/documents.csv.gz", format_dir)


def test_read_jsonl_matches_parquet(ray_session, format_dir):
    _roundtrip(ray_session, f"{OUT}/documents.jsonl", format_dir)


def test_read_csv_column_pruning(ray_session, format_dir):
    out = read_table(
        f"{OUT}/documents.csv", columns=["doc_id", "lang"]
    ).to_pandas()
    assert sorted(out.columns) == ["doc_id", "lang"]
    assert len(out) == len(format_dir)


def test_mixed_formats_rejected(ray_session, format_dir):
    with pytest.raises(ValueError, match="mixed input formats"):
        read_table([f"{OUT}/documents.csv", f"{OUT}/documents.jsonl"])


def test_sequences_ingest_from_csv_and_jsonl(ray_session, corpus):
    """The full typed ingest (string tokens -> list<int32>, validation,
    ts derivation) gives identical rows from a CSV or JSONL drop as from
    the parquet original."""
    from mimirsbrunn_ray.sources.ingest import read_sequences, validated

    src = corpus["main_paths"][0]
    seq = pq.read_table(src).to_pandas()
    csv_df = seq.copy()
    csv_df["tokens"] = [" ".join(map(str, t)) for t in csv_df["tokens"]]
    csv_path = f"{OUT}/seq.csv"
    jsonl_path = f"{OUT}/seq.jsonl"
    os.makedirs(OUT, exist_ok=True)
    csv_df.to_csv(csv_path, index=False)
    seq_json = seq.copy()
    seq_json["tokens"] = [list(map(int, t)) for t in seq_json["tokens"]]
    seq_json.to_json(jsonl_path, orient="records", lines=True)

    def run(path):
        df = validated(read_sequences(path)).to_pandas()
        df["tokens"] = df["tokens"].apply(lambda t: list(map(int, t)))
        return df.sort_values("doc_id").reset_index(drop=True)

    want = run(src)
    for alt in (csv_path, jsonl_path):
        got = run(alt)
        pd.testing.assert_frame_equal(got, want, check_dtype=False)
    assert len(want) > 0


def test_sequences_csv_empty_tokens(ray_session):
    """Empty/whitespace tokens fields coerce to [] and survive or drop by
    the n_tok invariant, not by a parse crash."""
    import ray.data as rd

    from mimirsbrunn_ray.sources.formats import normalize_sequences_batch

    tbl = pa.table(
        {
            "doc_id": ["doc-web-0000000001", "doc-web-0000000002"],
            "tokens": ["", "7 8"],
            "n_tok": [0, 2],
            "source": ["web", "web"],
        }
    )
    out = rd.from_arrow(tbl).map_batches(
        normalize_sequences_batch, batch_format="pyarrow"
    ).to_pandas()
    assert list(out["tokens"].apply(len)) == [0, 2]
    assert out["n_tok"].tolist() == [0, 2]


def test_mixed_plain_and_gz_same_format(ray_session, format_dir):
    """One gzipped file must not switch its plain siblings to gzip
    decompression (per-file grouping)."""
    out = (
        read_table([f"{OUT}/documents.csv", f"{OUT}/documents.csv.gz"])
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    # both files hold the same table -> union has exactly 2x the rows
    assert len(out) == 2 * len(format_dir)


def test_mixed_csv_and_tsv_delimiters(ray_session, format_dir):
    """A .tsv sibling keeps its tab delimiter while .csv stays comma."""
    docs = format_dir
    docs.to_csv(f"{OUT}/documents.tsv", index=False, sep="\t")
    out = (
        read_table([f"{OUT}/documents.csv", f"{OUT}/documents.tsv"])
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert len(out) == 2 * len(docs)
    assert sorted(out.columns) == sorted(docs.columns)


def test_read_feather_and_stream_ipc(ray_session, tmp_path):
    """Feather v2 (compressed + uncompressed), raw IPC stream, and a
    gzipped feather shard all round-trip through read_table, with
    column projection."""
    import gzip as _gzip

    from pyarrow import feather as pafeather

    src = pq.read_table(f"{SF}/nation.parquet")
    d = str(tmp_path)
    pafeather.write_feather(
        src.slice(0, 10), f"{d}/a.feather", compression="zstd"
    )
    pafeather.write_feather(
        src.slice(10, 10), f"{d}/b.arrow", compression="uncompressed"
    )
    sink = pa.BufferOutputStream()
    with pa.ipc.new_stream(sink, src.schema) as w:
        w.write_table(src.slice(20))
    with open(f"{d}/c.ipc", "wb") as f:
        f.write(sink.getvalue().to_pybytes())
    with open(f"{d}/a.feather", "rb") as f:
        gz_payload = _gzip.compress(f.read())
    with open(f"{d}/d.feather.gz", "wb") as f:
        f.write(gz_payload)

    assert detect_format("x.feather") == ("ipc", False)
    assert detect_format("x.ARROW.gz") == ("ipc", True)

    got = (
        read_table([f"{d}/a.feather", f"{d}/b.arrow", f"{d}/c.ipc"])
        .to_pandas()
        .sort_values("n_nationkey", ignore_index=True)
    )
    want = src.to_pandas().sort_values("n_nationkey", ignore_index=True)
    pd.testing.assert_frame_equal(got, want)

    # gzipped shard + column projection
    two = read_table(
        f"{d}/d.feather.gz", columns=["n_nationkey", "n_name"]
    ).to_pandas()
    assert list(two.columns) == ["n_nationkey", "n_name"]
    assert len(two) == 10


def test_read_orc(ray_session, tmp_path):
    from pyarrow import orc as paorc

    src = pq.read_table(f"{SF}/nation.parquet")
    d = str(tmp_path)
    paorc.write_table(src.slice(0, 12), f"{d}/a.orc")
    paorc.write_table(src.slice(12), f"{d}/b.orc")
    assert detect_format("x.ORC") == ("orc", False)
    got = (
        read_table([f"{d}/a.orc", f"{d}/b.orc"])
        .to_pandas()
        .sort_values("n_nationkey", ignore_index=True)
    )
    want = src.to_pandas().sort_values("n_nationkey", ignore_index=True)
    pd.testing.assert_frame_equal(got, want)
    two = read_table(f"{d}/a.orc", columns=["n_name"]).to_pandas()
    assert list(two.columns) == ["n_name"] and len(two) == 12


def test_random_table_roundtrips_all_formats(ray_session, tmp_path):
    """One random typed table (ints, floats, strings, nulls) written to
    parquet, CSV, JSONL, Feather, and ORC must read back identically
    through read_table (CSV/JSON carry values as text: compare after a
    common cast)."""
    import numpy as np
    import pyarrow.orc as paorc
    from pyarrow import feather as pafeather

    rng = np.random.default_rng(13)
    n = 200
    ints = rng.integers(-1000, 1000, size=n).astype("float64")
    ints[rng.random(n) < 0.1] = np.nan
    strs = rng.choice(["alpha", "beta", "gamma delta", ""], size=n)
    src = pa.table(
        {
            "k": pa.array(np.arange(n), pa.int64()),
            "i": pa.array(pd.array(ints, dtype="Int64"), pa.int64()),
            "s": pa.array(strs, pa.string()),
        }
    )
    d = str(tmp_path)
    pq.write_table(src, f"{d}/t.parquet")
    pafeather.write_feather(src, f"{d}/t.feather")
    paorc.write_table(src, f"{d}/t.orc")
    src.to_pandas().to_csv(f"{d}/t.csv", index=False)
    src.to_pandas().to_json(f"{d}/t.jsonl", orient="records", lines=True)

    want = src.to_pandas().sort_values("k", ignore_index=True)
    for path in ["t.parquet", "t.feather", "t.orc", "t.csv", "t.jsonl"]:
        got = (
            read_table(f"{d}/{path}")
            .to_pandas()
            .sort_values("k", ignore_index=True)
        )
        # text formats lose the Int64 nullability shade / empty-vs-null
        # string distinction; normalize both sides the same way
        for c in ["k", "i"]:
            got[c] = pd.array(got[c], dtype="Int64")
        cmp_want = want.copy()
        for c in ["k", "i"]:
            cmp_want[c] = pd.array(cmp_want[c], dtype="Int64")
        got["s"] = got["s"].fillna("")
        cmp_want["s"] = cmp_want["s"].fillna("")
        pd.testing.assert_frame_equal(
            got[["k", "i", "s"]], cmp_want[["k", "i", "s"]],
            check_dtype=False, obj=path,
        )
