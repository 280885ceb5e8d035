"""Golden end-to-end assertions for the tier chain vs the pure-pandas oracle
(FIXTURES.md §4 assertions 1-3) plus the per-row token-equality invariant."""

import glob
import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from tests import oracle


def _tier_df(tier_root: str, tier: str) -> pd.DataFrame:
    files = sorted(
        glob.glob(os.path.join(tier_root, tier, "run=test-run", "**", "*.parquet"),
                  recursive=True)
    )
    return pa.concat_tables([pq.read_table(f) for f in files]).to_pandas()


@pytest.fixture(scope="module")
def clean(corpus):
    return oracle.load_clean(corpus["main_paths"])


def test_raw_tier_row_count_and_manifest(tier_root, corpus, clean):
    raw = _tier_df(tier_root, "raw")
    assert len(raw) == len(clean)  # dirty dropped + dups removed, exactly
    man = json.load(open(os.path.join(tier_root, "raw", "run=test-run", "_manifest.json")))
    assert man["committed"] is True
    assert man["rows_out"] == len(clean)
    # FIXTURES assertion 3: manifest counters equal oracle counts.
    # A duplicated row whose payload is dirty is dropped at validation
    # (both copies), so rows_deduped <= planted duplicates; the exact
    # identity is rows_in - dirty - deduped == clean rows.
    c = man["counters"]
    assert c["rows_dropped_dirty"] == corpus["n_dirty_main"]
    assert c["rows_in"] == len(clean) + corpus["n_dirty_main"] + c["rows_deduped"]
    assert 0 < c["rows_deduped"] <= corpus["n_duplicates"]


def test_raw_tier_token_array_equality(tier_root, corpus):
    """BASELINE.json per-row invariant: pass-through token arrays byte-equal."""
    inp = pa.concat_tables([pq.read_table(p) for p in corpus["main_paths"]])
    inp_tokens = dict(zip(inp["doc_id"].to_pylist(), inp["tokens"].to_pylist()))
    out = pa.concat_tables(
        [pq.read_table(f) for f in sorted(
            glob.glob(os.path.join(tier_root, "raw", "run=test-run", "*.parquet")))]
    )
    out_ids = out["doc_id"].to_pylist()
    out_tokens = out["tokens"].to_pylist()
    assert len(out_ids) == len(set(out_ids))  # no duplicate survived
    for i in range(len(out_ids)):
        assert out_tokens[i] == inp_tokens[out_ids[i]]


@pytest.mark.parametrize("gran", ["1m", "1h", "1d"])
def test_rollup_tiers_match_oracle(tier_root, clean, gran):
    got = _tier_df(tier_root, gran)
    real = got[~got["filled"]].copy()
    real["bucket_us"] = real["bucket"].astype("datetime64[us]").astype(np.int64)
    real = real.sort_values(["source", "bucket_us"]).reset_index(drop=True)
    exp = oracle.rollup(clean, gran)
    assert len(real) == len(exp)
    for c in ("n_rows", "sum_tok", "min_tok", "max_tok"):
        assert np.array_equal(
            real[c].to_numpy().astype(np.int64), exp[c].to_numpy().astype(np.int64)
        ), f"{gran}/{c}"
    assert np.allclose(real["mean_tok"], exp["mean_tok"], rtol=0, atol=0)
    assert np.array_equal(real["bucket_us"].to_numpy(), exp["bucket_us"].to_numpy())
    assert list(real["source"]) == list(exp["source"])


def test_gapfill_locf_matches_oracle(tier_root, clean, corpus):
    got = _tier_df(tier_root, "1m")
    got["bucket_us"] = got["bucket"].astype("datetime64[us]").astype(np.int64)
    got = got.sort_values(["source", "bucket_us"]).reset_index(drop=True)
    exp = oracle.gapfill_locf(oracle.rollup(clean, "1m"), "1m")
    assert len(got) == len(exp)
    assert np.array_equal(got["filled"].to_numpy(), exp["filled"].to_numpy())
    assert np.array_equal(
        got["sum_tok"].to_numpy(), exp["sum_tok"].to_numpy().astype(np.int64)
    )
    # planted gap buckets are filled with LOCF and flagged
    for src, buckets in corpus["gap_buckets_us"].items():
        for b in buckets:
            row = got[(got["source"] == src) & (got["bucket_us"] == b)]
            if len(row):  # bucket inside the source's observed range
                assert bool(row["filled"].iloc[0])
                assert row["fill_kind"].iloc[0] == "locf"
                assert int(row["n_rows"].iloc[0]) == 0


def test_compressed_blocks_roundtrip(tier_root):
    """FIXTURES assertion 4: decode(ts_dod, val_gorilla) == plain columns."""
    from mimirsbrunn_ray.stages.compress import decompress_block

    blocks = _tier_df(tier_root, "compressed")
    t1m = _tier_df(tier_root, "1m")
    t1m["bucket_us"] = t1m["bucket"].astype("datetime64[us]").astype(np.int64)
    assert len(blocks) > 0
    for _, blk in blocks.iterrows():
        ts, vals = decompress_block(blk["ts_dod"], blk["val_gorilla"])
        assert len(ts) == blk["n_points"]
        day_us = np.datetime64(blk["bucket"], "us").astype(np.int64)
        ref = t1m[
            (t1m["source"] == blk["source"])
            & (t1m["bucket_us"] >= day_us)
            & (t1m["bucket_us"] < day_us + 86_400_000_000)
        ].sort_values("bucket_us")
        assert np.array_equal(ts, ref["bucket_us"].to_numpy())
        assert np.array_equal(vals, ref["sum_tok"].to_numpy().astype(np.float64))
