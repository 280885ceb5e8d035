"""HyperLogLog: accuracy vs exact distinct counts; merge associativity."""

import numpy as np
import pytest

from mimirsbrunn_ray.stages.sketch import (
    hll_add_hashes,
    hll_estimate,
    hll_merge,
    hll_new,
)


@pytest.mark.parametrize("n", [100, 5_000, 200_000])
def test_hll_accuracy(n):
    rng = np.random.default_rng(n)
    hashes = rng.integers(0, 2**64, size=n, dtype=np.uint64)
    hashes = np.unique(hashes)
    regs = hll_new(p=12)
    hll_add_hashes(regs, hashes)
    est = hll_estimate(regs)
    rel_err = abs(est - len(hashes)) / len(hashes)
    assert rel_err < 0.05  # p=12 -> ~1.6% stderr; 5% is a safe bound


def test_hll_merge_equals_union():
    rng = np.random.default_rng(1)
    a = rng.integers(0, 2**64, size=10_000, dtype=np.uint64)
    b = rng.integers(0, 2**64, size=10_000, dtype=np.uint64)
    ra, rb, rall = hll_new(), hll_new(), hll_new()
    hll_add_hashes(ra, a)
    hll_add_hashes(rb, b)
    hll_add_hashes(rall, np.concatenate([a, b]))
    assert np.array_equal(hll_merge(ra, rb), rall)  # merge == union, exactly


def test_approx_distinct_tokens_per_source(ray_session):
    from mimirsbrunn_ray.sources.documents_adapter import sequences_from_documents
    from mimirsbrunn_ray.stages.sketch import approx_distinct_per_key, token_values_fn

    seq = sequences_from_documents("/root/testdata/sf0.001", with_tokens=True)
    got = approx_distinct_per_key(seq, "source", token_values_fn, p=12)

    # exact baseline, computed driver-side on the small fixture
    exact = {}
    for b in seq.iter_batches(batch_format="pyarrow", batch_size=None):
        src, hashes = token_values_fn(b)
        for s in np.unique(src):
            vals = set(hashes[src == s].tolist())
            exact[s] = exact.get(s, set()) | vals
    for _, row in got.iterrows():
        true = len(exact[row["source"]])
        assert abs(row["approx_distinct"] - true) / true < 0.05, row["source"]
