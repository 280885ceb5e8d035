"""The unbounded-scale escape hatches produce byte-identical results to the
bounded fast paths (VERDICT r1 item 6: 'wire the unbounded paths')."""

import glob
import os

import numpy as np
import pandas as pd
import pyarrow.parquet as pq


def _tier_df(root: str, tier: str) -> pd.DataFrame:
    files = sorted(glob.glob(os.path.join(root, tier, "run=*", "*.parquet")))
    df = pd.concat((pq.read_table(f).to_pandas() for f in files),
                   ignore_index=True)
    return df.sort_values(list(df.columns[:2]), ignore_index=True)


def test_multi_partition_tier_chain_matches_single(ray_session, corpus, tmp_path):
    from mimirsbrunn_ray.pipelines.tiering import run_tiering_job

    root_a = str(tmp_path / "single")
    root_b = str(tmp_path / "multi")
    run_tiering_job(corpus["main_paths"], root_a, "rA",
                    single_partition=True)
    run_tiering_job(corpus["main_paths"], root_b, "rB",
                    single_partition=False, dedup_scan_shards=4)

    for tier in ("1m", "1h", "1d"):
        a, b = _tier_df(root_a, tier), _tier_df(root_b, tier)
        assert len(a) == len(b), tier
        for c in ("source", "bucket", "n_rows", "sum_tok", "min_tok",
                  "max_tok", "filled"):
            assert np.array_equal(a[c].to_numpy(), b[c].to_numpy()), (tier, c)

    # compressed blocks: same (source, day) keys and identical decoded data
    a, b = _tier_df(root_a, "compressed"), _tier_df(root_b, "compressed")
    assert len(a) == len(b)
    from mimirsbrunn_ray.stages.compress import decompress_block

    for (_, ra), (_, rb) in zip(a.iterrows(), b.iterrows()):
        assert ra["source"] == rb["source"] and ra["bucket"] == rb["bucket"]
        ts_a, va = decompress_block(ra["ts_dod"], ra["val_gorilla"])
        ts_b, vb = decompress_block(rb["ts_dod"], rb["val_gorilla"])
        assert np.array_equal(ts_a, ts_b) and np.array_equal(va, vb)


def test_sharded_dup_scan_matches_unsharded(ray_session, corpus):
    from mimirsbrunn_ray.stages.dedup import scan_duplicate_keys

    one = scan_duplicate_keys(corpus["main_paths"], final_shards=1)
    sharded = scan_duplicate_keys(corpus["main_paths"], final_shards=4)
    assert np.array_equal(one, sharded)
    assert len(one) > 0  # generator plants duplicates
