"""ANN recall vs brute force; near-dup operators find planted duplicates."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb_ds(ray_session):
    import ray.data as rd

    return rd.read_parquet(f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"])


def test_knn_ivf_recall_vs_bruteforce(ray_session, emb_ds):
    from mimirsbrunn_ray.pipelines.queries import _query_vectors
    from mimirsbrunn_ray.stages.similarity import (
        fit_ivf_centroids,
        knn_bruteforce,
        knn_ivf,
    )

    q = _query_vectors(SF)
    exact = knn_bruteforce(emb_ds, q, k=10)
    import pyarrow.parquet as pq

    sample = np.stack(
        [np.asarray(v, dtype=np.float64)
         for v in pq.read_table(f"{SF}/embeddings.parquet")["embedding"].to_pylist()]
    )
    cents = fit_ivf_centroids(sample, n_clusters=8)
    approx = knn_ivf(emb_ds, q, cents, k=10, nprobe=3)
    recalls = []
    for qi in exact["query_id"].unique():
        e = set(exact[exact["query_id"] == qi]["vec_id"])
        a = set(approx[approx["query_id"] == qi]["vec_id"])
        recalls.append(len(e & a) / len(e))
    assert np.mean(recalls) >= 0.5  # nprobe=3/8 lists — coarse but useful


def test_minhash_finds_planted_near_dup(ray_session):
    import ray.data as rd

    from mimirsbrunn_ray.stages.neardup import minhash_lsh_dedup

    base = (
        "the quick brown fox jumps over the lazy dog while the band plays on "
        "and the crowd cheers loudly for more songs about data pipelines"
    )
    rows = [
        {"doc_id": 1, "text": base},
        {"doc_id": 2, "text": base + " extra"},  # near-dup of 1
        {"doc_id": 3, "text": "completely different content about gorillas"},
        {"doc_id": 4, "text": base},  # exact dup of 1
    ]
    ds = rd.from_arrow(pa.Table.from_pylist(rows))
    out = minhash_lsh_dedup(ds, threshold=0.7).to_pandas()
    clusters = dict(zip(out["doc_id"], out["cluster"]))
    assert clusters[1] == clusters[2] == clusters[4] == 1
    assert clusters[3] == 3


def test_simhash_golden_signatures():
    """Vectorized SimHash must stay bit-identical to the per-word
    formulation (golden values captured from the round-1 implementation)."""
    from mimirsbrunn_ray.stages.neardup import SimHasher

    sh = SimHasher()
    golden = {
        "the quick brown fox jumps over the lazy dog": 5410956323903597908,
        "Hello, World! 123 foo_bar baz": 8111060728872444370,
        "": 0,
        "a": 16769080936413773379,
        "一些中文 words mixed 42": 4545559306898054272,
        "repeat repeat repeat repeat": 8911304363106350016,
    }
    for text, want in golden.items():
        assert sh.simhash64(text) == want
    # batch path == scalar path, including interleaved empty docs
    texts = list(golden) + ["", "x y z"]
    for text, sig in zip(texts, sh._sig_batch(texts)):
        assert int(sig) == sh.simhash64(text)


def test_minhash_driver_state_is_bounded_by_dup_count(ray_session):
    """~5% planted near-dups in a 2k-doc corpus: every driver-side
    materialization inside minhash_lsh_dedup must be O(dups), never
    O(corpus) — the distributed-verification requirement (VERDICT r1 #1)."""
    import ray.data as rd

    from mimirsbrunn_ray.stages import neardup

    rng = np.random.default_rng(5)
    words = [f"w{i:03d}" for i in range(400)]
    rows = []
    n_base, n_dup = 1900, 100
    for i in range(n_base):
        text = " ".join(rng.choice(words, size=40))
        rows.append({"doc_id": i, "text": text})
    for j in range(n_dup):  # near-dup of doc j
        rows.append({"doc_id": n_base + j, "text": rows[j]["text"] + " tail"})
    ds = rd.from_arrow(pa.Table.from_pylist(rows))

    pulls = []
    orig_to_pandas = rd.Dataset.to_pandas
    orig_take_all = rd.Dataset.take_all

    def spy_to_pandas(self, *a, **kw):
        out = orig_to_pandas(self, *a, **kw)
        pulls.append(len(out))
        return out

    def spy_take_all(self, *a, **kw):
        out = orig_take_all(self, *a, **kw)
        pulls.append(len(out))
        return out

    orig_iter_batches = rd.Dataset.iter_batches

    def guard_iter_batches(self, *a, **kw):
        # Ray internals (to_pandas, map_groups) use iter_batches legally;
        # only a DIRECT call from the dedup operator is the anti-pattern.
        import sys

        caller = sys._getframe(1).f_code.co_filename
        assert "neardup" not in caller, "driver-side iter_batches in neardup"
        return orig_iter_batches(self, *a, **kw)

    rd.Dataset.to_pandas = spy_to_pandas
    rd.Dataset.take_all = spy_take_all
    rd.Dataset.iter_batches = guard_iter_batches
    try:
        labeled = neardup.minhash_lsh_dedup(ds, threshold=0.7)
    finally:
        rd.Dataset.to_pandas = orig_to_pandas
        rd.Dataset.take_all = orig_take_all
        rd.Dataset.iter_batches = orig_iter_batches
    # candidate pairs / candidate shingles / verified pairs: all O(dups)
    assert pulls, "expected bounded driver pulls for pair clustering"
    assert max(pulls) <= 20 * n_dup, pulls
    out = labeled.to_pandas()
    assert len(out) == n_base + n_dup
    clusters = dict(zip(out["doc_id"], out["cluster"]))
    hits = sum(1 for j in range(n_dup) if clusters[n_base + j] == clusters[j])
    assert hits >= int(0.9 * n_dup), f"only {hits}/{n_dup} planted dups found"


def test_simhash_near_pairs(ray_session):
    import ray.data as rd

    from mimirsbrunn_ray.stages.neardup import simhash_near_pairs, simhash_signatures

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 5
    rows = [
        {"doc_id": 1, "text": base},
        {"doc_id": 2, "text": base + " lambda"},
        {"doc_id": 3, "text": "unrelated words entirely different topic matter"},
    ]
    ds = rd.from_arrow(pa.Table.from_pylist(rows))
    sigs = simhash_signatures(ds)
    pairs = simhash_near_pairs(sigs, max_hamming=10)
    got = {tuple(sorted((a, b))) for a, b in zip(pairs["a"], pairs["b"])}
    assert (1, 2) in got
    assert (1, 3) not in got and (2, 3) not in got


def test_jaccard_exact():
    from mimirsbrunn_ray.stages.neardup import jaccard

    assert jaccard("abcdef", "abcdef") == 1.0
    assert jaccard("abcdefgh", "zzzzzzzz") == 0.0
    assert 0.0 < jaccard("abcdefghij", "abcdefghiX") < 1.0


def test_embedding_near_dups_finds_planted(ray_session):
    import ray.data as rd

    from mimirsbrunn_ray.stages.neardup import embedding_near_dups

    rng = np.random.default_rng(3)
    base = rng.standard_normal(16)
    rows = [
        {"vec_id": 0, "embedding": base.tolist()},
        {"vec_id": 1, "embedding": (base + 0.01 * rng.standard_normal(16)).tolist()},
        {"vec_id": 2, "embedding": rng.standard_normal(16).tolist()},
    ]
    ds = rd.from_arrow(pa.Table.from_pylist(rows))
    pairs = embedding_near_dups(ds, dim=16, threshold=0.95)
    got = {tuple(sorted((a, b))) for a, b in zip(pairs["a"], pairs["b"])}
    assert (0, 1) in got


def test_semantic_dedup_planted(ray_session):
    """SemDeDup: planted tight near-copies label back to their originals
    (keep-min winner); unrelated vectors keep identity labels; the
    propagate clusterer (forced via max_driver_pairs=0) agrees with the
    driver path."""
    import pyarrow as pa
    import ray.data as rd

    from mimirsbrunn_ray.stages.neardup import semantic_dedup

    rng = np.random.default_rng(17)
    base = rng.standard_normal((120, 16))
    copies = base[::10] + rng.normal(0, 1e-4, size=(12, 16))
    mat = np.vstack([base, copies])
    ids = np.arange(len(mat), dtype=np.int64)
    tbl = pa.table({
        "vec_id": pa.array(ids),
        "embedding": pa.array([r.astype(np.float32) for r in mat],
                              pa.list_(pa.float32())),
    })
    ds = rd.from_arrow(tbl)
    out = (
        semantic_dedup(ds, threshold=0.99, n_clusters=8)
        .to_pandas().sort_values("vec_id", ignore_index=True)
    )
    lab = dict(zip(out["vec_id"], out["cluster"]))
    for j in range(12):
        assert lab[120 + j] == j * 10, (j, lab[120 + j])  # copy -> original
    # random gaussians at 0.99 cosine: no false merges among originals
    originals = out[out["vec_id"] < 120]
    assert (originals["vec_id"] == originals["cluster"]).all()
    # forced distributed clustering agrees
    out2 = (
        semantic_dedup(ds, threshold=0.99, n_clusters=8, max_driver_pairs=0)
        .to_pandas().sort_values("vec_id", ignore_index=True)
    )
    pd.testing.assert_frame_equal(out, out2.astype(out.dtypes.to_dict()))
