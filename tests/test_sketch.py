"""HyperLogLog: accuracy vs exact distinct counts; merge associativity."""

import numpy as np
import pyarrow as pa
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


def test_exact_heavy_hitters_adversarial(ray_session):
    """Items just above the threshold survive the MG pruning; counts are
    EXACT; items below threshold never appear — on a skewed corpus with a
    long noise tail spread across many batches."""
    import pyarrow as pa
    import ray.data as rd

    from mimirsbrunn_ray.stages.sketch import exact_heavy_hitters

    rng = np.random.default_rng(13)
    frac = 0.02
    n_total = 50_000
    # planted: one item exactly AT the threshold, one just below, one huge
    at = int(frac * n_total)          # exactly qualifies (>=)
    below = at - 1                    # must NOT appear
    words = (
        ["hot"] * (n_total // 5)
        + ["edge"] * at
        + ["near"] * below
        + [f"noise{i}" for i in rng.integers(0, 200_000, size=n_total - n_total // 5 - at - below)]
    )
    rng.shuffle(words)
    docs = pa.table({"text": [" ".join(words[i::64]) for i in range(64)]})

    def words_of(b):
        import pyarrow.compute as pc

        flat = pc.split_pattern(b["text"], " ")
        flat = flat.combine_chunks() if isinstance(flat, pa.ChunkedArray) else flat
        return flat.values

    out = exact_heavy_hitters(
        rd.from_arrow(docs).repartition(8), words_of, frac=frac
    ).to_pandas()
    got = dict(zip(out["item"], out["n_occurrences"]))
    assert got["hot"] == n_total // 5
    assert got["edge"] == at
    assert "near" not in got
    assert all(v >= frac * n_total for v in got.values())


def test_exact_quantiles_small_domain(ray_session):
    """Histogram quantiles follow SQL PERCENTILE_DISC (smallest v with
    cumulative count >= ceil(q*n)) — checked on 1..10 where the ranks are
    hand-computable, split across multiple batches."""
    import pyarrow as pa
    import ray.data as rd

    from mimirsbrunn_ray.stages.rollup import exact_quantiles_small_domain

    vals = list(range(1, 11)) * 3  # three copies, shuffled across blocks
    tbl = pa.table(
        {"k": pa.array(["a"] * 30), "v": pa.array(vals, pa.int64())}
    )
    out = exact_quantiles_small_domain(
        rd.from_arrow(tbl).repartition(4),
        key="k",
        val_fn=lambda b: b["v"],
        qs=(0.25, 0.9, 0.99),
        q_names=("q25", "q90", "q99"),
    ).to_pandas()
    # n=30: ceil(.25*30)=8 -> value 3; ceil(.9*30)=27 -> 9; ceil(.99*30)=30 -> 10
    assert out.iloc[0].to_dict() == {"k": "a", "q25": 3, "q90": 9, "q99": 10}


def test_exact_heavy_hitters_null_values(ray_session):
    """Null items are excluded from BOTH the candidate set and the total —
    a null-heavy corpus must not inflate the threshold denominator
    (ADVICE r2: the superset guarantee on the non-null items)."""
    import pyarrow as pa
    import ray.data as rd

    from mimirsbrunn_ray.stages.sketch import exact_heavy_hitters

    # 100 non-null values: "a" x 60, "b" x 40, plus 900 nulls.
    # With nulls-in-total, frac=0.3 of 1000 = 300 -> nothing qualifies;
    # with the pinned null-is-not-an-item rule, total = 100 -> both do.
    vals = ["a"] * 60 + ["b"] * 40 + [None] * 900
    tbl = pa.table({"w": pa.array(vals, pa.string())})
    out = exact_heavy_hitters(
        rd.from_arrow(tbl).repartition(4), lambda b: b["w"].combine_chunks(),
        frac=0.3,
    ).to_pandas()
    got = dict(zip(out["item"], out["n_occurrences"]))
    assert got == {"a": 60, "b": 40}


# ---------------------------------------------------------------------------
# t-digest quantiles (continuous domains)
# ---------------------------------------------------------------------------


def _rank_of(values: np.ndarray, est: float) -> float:
    return float(np.searchsorted(np.sort(values), est) / len(values))


def test_tdigest_rank_error_lognormal():
    """Single-pass compress: each quantile estimate's true rank is within
    0.02 of the requested q on a heavy-tailed continuous distribution."""
    from mimirsbrunn_ray.stages.sketch import _tdigest_compress, _tdigest_quantile

    rng = np.random.default_rng(7)
    vals = rng.lognormal(mean=1.0, sigma=0.8, size=100_000)
    m, w = _tdigest_compress(vals, np.ones(len(vals)), delta=200)
    for q in (0.01, 0.1, 0.5, 0.9, 0.99):
        est = _tdigest_quantile(m, w, [q])[0]
        assert abs(_rank_of(vals, est) - q) < 0.02, q


def test_tdigest_merge_preserves_accuracy():
    """Compress 32 chunks independently, concatenate summaries, recompress
    (the partial + tree_merge shape) — accuracy survives the merge."""
    from mimirsbrunn_ray.stages.sketch import _tdigest_compress, _tdigest_quantile

    rng = np.random.default_rng(11)
    vals = rng.normal(50.0, 12.0, size=64_000)
    ms, ws = [], []
    for chunk in np.array_split(vals, 32):
        m, w = _tdigest_compress(chunk, np.ones(len(chunk)), delta=200)
        ms.append(m)
        ws.append(w)
    m, w = _tdigest_compress(
        np.concatenate(ms), np.concatenate(ws), delta=200
    )
    assert len(m) < 2 * 200  # stays bounded after merge
    for q in (0.05, 0.5, 0.95):
        est = _tdigest_quantile(m, w, [q])[0]
        assert abs(_rank_of(vals, est) - q) < 0.02, q


def test_tdigest_per_key_e2e(ray_session):
    """Distributed per-key t-digest over many small blocks matches exact
    per-key quantiles within rank error 0.02; output is deterministic."""
    import ray.data as rd

    from mimirsbrunn_ray.stages.sketch import tdigest_quantiles_per_key

    rng = np.random.default_rng(3)
    n = 40_000
    keys = np.where(rng.random(n) < 0.7, "a", "b")
    vals = np.where(
        keys == "a",
        rng.lognormal(0.5, 0.6, size=n),
        rng.normal(20.0, 4.0, size=n),
    )
    tbl = pa.table({"k": pa.array(keys), "v": pa.array(vals)})
    ds = rd.from_arrow(tbl).repartition(16)

    def vf(b: pa.Table):
        return (
            b["k"].to_numpy(zero_copy_only=False),
            b["v"].to_numpy(zero_copy_only=False),
        )

    got = tdigest_quantiles_per_key(ds, "k", vf, qs=(0.5, 0.9, 0.99),
                                    q_names=("p50", "p90", "p99"))
    got2 = tdigest_quantiles_per_key(ds, "k", vf, qs=(0.5, 0.9, 0.99),
                                     q_names=("p50", "p90", "p99"))
    assert got.equals(got2)  # deterministic across runs
    assert list(got["k"]) == ["a", "b"]
    for _, row in got.iterrows():
        kv = vals[keys == row["k"]]
        for col, q in (("p50", 0.5), ("p90", 0.9), ("p99", 0.99)):
            assert abs(_rank_of(kv, row[col]) - q) < 0.02, (row["k"], col)


def test_tdigest_driver_query_vs_exact(ray_session):
    """q_tdigest_chars_per_word on the sf0.001 fixture: every estimate
    within 2% relative error of the exact continuous quantile."""
    import duckdb

    from mimirsbrunn_ray.pipelines.queries import QUERIES

    got = QUERIES["tdigest_chars_per_word"]("/root/testdata/sf0.001")
    exact = duckdb.sql(
        """
        SELECT source,
               quantile_cont(cpw, 0.5) AS p50,
               quantile_cont(cpw, 0.9) AS p90,
               quantile_cont(cpw, 0.99) AS p99
        FROM (
          SELECT source,
                 n_chars::DOUBLE
                   / (len(text) - len(replace(text, ' ', '')) + 1) AS cpw
          FROM read_parquet('/root/testdata/sf0.001/documents.parquet')
        ) GROUP BY source ORDER BY source
        """
    ).df()
    assert list(got["source"]) == list(exact["source"])
    for col in ("p50", "p90", "p99"):
        rel = np.abs(got[col].to_numpy() - exact[col].to_numpy()) / np.abs(
            exact[col].to_numpy()
        )
        assert (rel < 0.02).all(), (col, rel)


def test_bloom_no_false_negatives_and_low_fpr(ray_session):
    """Bloom invariants: every inserted key reports maybe-present (NO false
    negatives — the exactness the anti-join prune depends on), absent-key
    FPR stays well under the theoretical bound, and the DISTRIBUTED
    OR-merged build is bit-identical to a single-pass local build."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from mimirsbrunn_ray.sources.synth import _splitmix64
    from mimirsbrunn_ray.stages.sketch import (
        bloom_add,
        bloom_contains,
        bloom_from_dataset,
        bloom_new,
    )

    rng = np.random.default_rng(11)
    present = np.unique(rng.integers(0, 2**62, 20_000).astype(np.uint64))
    absent = np.setdiff1d(
        rng.integers(0, 2**62, 200_000).astype(np.uint64), present
    )

    local = bloom_new(1 << 19)
    bloom_add(local, _splitmix64(present))
    assert bloom_contains(local, _splitmix64(present)).all()
    fpr = bloom_contains(local, _splitmix64(absent)).mean()
    # m/n ~ 26 bits/key, k=6 -> theoretical fpr ~ 2e-4; assert an order above
    assert fpr < 2e-3, fpr

    ds = rd.from_arrow(
        pa.table({"k": present.astype(np.int64)})
    ).repartition(7)
    dist = bloom_from_dataset(
        ds,
        lambda b: _splitmix64(
            b["k"].to_numpy(zero_copy_only=False).astype(np.uint64)
        ),
        n_bits=1 << 19,
    )
    assert np.array_equal(dist, local)
