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
    out = minhash_lsh_dedup(ds, threshold=0.7)
    clusters = dict(zip(out["doc_id"], out["cluster"]))
    assert clusters[1] == clusters[2] == clusters[4] == 1
    assert clusters[3] == 3


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
