"""Generic tier chain over the `events` table: full-chain counts match a
pandas oracle; compressed blocks decode exactly; resume works."""

import glob
import os

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def generic_root(ray_session, tmp_path_factory):
    from mimirsbrunn_ray.pipelines.generic_tiering import run_generic_tiering_job

    root = str(tmp_path_factory.mktemp("generic_tiers"))
    run_generic_tiering_job(
        [f"{SF}/events.parquet"], root, "ev1",
        key_col="event_type", ts_col="ts", value_col="value",
    )
    return root


def _tier(root, tier):
    return pd.concat(
        pq.read_table(f).to_pandas()
        for f in glob.glob(os.path.join(root, tier, "run=ev1", "**", "*.parquet"),
                           recursive=True)
    )


def test_generic_1h_matches_pandas_oracle(generic_root):
    ev = pq.read_table(f"{SF}/events.parquet").to_pandas()
    exp = (
        ev.assign(bucket=ev["ts"].dt.floor("h"))
        .groupby(["event_type", "bucket"], as_index=False)
        .agg(n_rows=("value", "size"), sum_val=("value", "sum"),
             min_val=("value", "min"), max_val=("value", "max"))
        .sort_values(["event_type", "bucket"], ignore_index=True)
    )
    got = _tier(generic_root, "1h")
    got = got[~got["filled"]].sort_values(["event_type", "bucket"],
                                          ignore_index=True)
    assert len(got) == len(exp)
    assert np.array_equal(got["n_rows"].to_numpy(), exp["n_rows"].to_numpy())
    assert np.allclose(got["sum_val"], exp["sum_val"], rtol=1e-12)
    assert np.allclose(got["min_val"], exp["min_val"], rtol=0)
    assert np.allclose(got["max_val"], exp["max_val"], rtol=0)


def test_generic_compressed_roundtrip(generic_root):
    from mimirsbrunn_ray.stages.compress import decompress_block

    blocks = _tier(generic_root, "compressed")
    t1m = _tier(generic_root, "1m")
    t1m["bucket_us"] = t1m["bucket"].astype("datetime64[us]").astype(np.int64)
    assert len(blocks) > 0
    total = 0
    for _, blk in blocks.iterrows():
        ts, vals = decompress_block(blk["ts_dod"], blk["val_gorilla"])
        total += len(ts)
        ref = t1m[t1m["event_type"] == blk["source"]]
        day_us = np.datetime64(blk["bucket"], "us").astype(np.int64)
        ref = ref[(ref["bucket_us"] >= day_us)
                  & (ref["bucket_us"] < day_us + 86_400_000_000)].sort_values(
            "bucket_us"
        )
        assert np.array_equal(ts, ref["bucket_us"].to_numpy())
        assert np.array_equal(
            vals.view(np.uint64),
            ref["sum_val"].to_numpy(dtype=np.float64).view(np.uint64),
        )
    assert total == len(t1m)


def test_generic_resume(generic_root, ray_session):
    from mimirsbrunn_ray.pipelines.generic_tiering import run_generic_tiering_job

    summary = run_generic_tiering_job(
        [f"{SF}/events.parquet"], generic_root, "ev1",
        key_col="event_type", ts_col="ts", value_col="value",
    )
    assert all(v == {"skipped": "already committed"}
               for v in summary["tiers"].values())
