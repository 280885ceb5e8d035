"""Exact similarity joins: prefix-filter n-gram Jaccard (stages/simjoin)
and all-pairs cosine (stages/similarity.cosine_pairs) against brute force."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _brute_jaccard_pairs(texts, ids, t, n=3):
    def grams(s):
        ws = s.lower().split(" ")
        return set(
            " ".join(ws[i : i + n]) for i in range(len(ws) - n + 1)
        ) if len(ws) >= n else set()

    gs = [grams(s) for s in texts]
    out = {}
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            inter = len(gs[i] & gs[j])
            uni = len(gs[i] | gs[j])
            if uni and inter / uni >= t:
                a, b = sorted((ids[i], ids[j]))
                out[(a, b)] = inter / uni
    return out


@pytest.fixture(scope="module")
def planted_docs():
    rng = np.random.default_rng(11)
    vocab = [f"w{i}" for i in range(300)]
    texts, ids = [], []
    for i in range(150):
        words = list(rng.choice(vocab, size=int(rng.integers(10, 40))))
        texts.append(" ".join(words))
        ids.append(i)
    # plant near-dups: copy with a few word edits
    for i in range(20):
        src = texts[i].split(" ")
        pos = int(rng.integers(0, len(src)))
        src[pos] = str(rng.choice(vocab))
        texts.append(" ".join(src))
        ids.append(1000 + i)
    # plant exact dups and degenerate docs
    texts += [texts[0], "one two", "", "a b c"]
    ids += [2000, 2001, 2002, 2003]
    return ids, texts


def test_ngram_jaccard_join_is_exact(ray_session, planted_docs):
    import ray.data as rd

    from mimirsbrunn_ray.stages.simjoin import ngram_jaccard_join

    ids, texts = planted_docs
    t = 0.5
    want = _brute_jaccard_pairs(texts, ids, t)
    assert len(want) >= 20  # the planted dups are above threshold

    ds = rd.from_arrow(
        pa.table({"doc_id": pa.array(ids, pa.int64()), "text": texts})
    )
    out = ngram_jaccard_join(ds, threshold=t, n=3).to_pandas()
    got = {
        (a, b): j
        for a, b, j in zip(out["doc_a"], out["doc_b"], out["jaccard"])
    }
    assert set(got) == set(want)
    for k in want:
        assert got[k] == pytest.approx(want[k], abs=1e-12)


def test_word_ngram_hashes_edges(ray_session):
    from mimirsbrunn_ray.stages.simjoin import word_ngram_hashes

    g, d = word_ngram_hashes(pa.array(["one two", "", None, "a b c d"]))
    # only the 4-word doc produces grams: two windows
    assert list(d) == [3, 3]
    assert len(set(g)) == 2
    # identical texts hash identically across calls
    g2, _ = word_ngram_hashes(pa.array(["a b c d"]))
    assert set(g2) == set(g)


def test_cosine_pairs_is_exact(ray_session):
    import ray.data as rd

    from mimirsbrunn_ray.stages.similarity import cosine_pairs

    rng = np.random.default_rng(3)
    vecs = rng.normal(size=(80, 16))
    # plant 5 near-identical pairs
    for i in range(5):
        vecs[40 + i] = vecs[i] + rng.normal(scale=0.01, size=16)
    ids = np.arange(80, dtype=np.int64)
    unit = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    sims = unit @ unit.T
    t = 0.95
    ii, jj = np.nonzero(np.triu(sims >= t, 1))
    want = {(int(a), int(b)): sims[a, b] for a, b in zip(ii, jj)}
    assert len(want) >= 5

    ds = rd.from_arrow(
        pa.table(
            {
                "vec_id": ids,
                "embedding": pa.array(
                    [list(map(float, v)) for v in vecs],
                    type=pa.list_(pa.float32()),
                ),
            }
        )
    )
    out = cosine_pairs(ds, threshold=t).to_pandas()
    got = {
        (int(a), int(b)): c
        for a, b, c in zip(out["vec_a"], out["vec_b"], out["cosine"])
    }
    assert set(got) == set(want)
    for k in want:
        assert got[k] == pytest.approx(want[k], abs=1e-5)  # f32 storage


def test_ngram_jaccard_join_string_ids(ray_session):
    """String doc_ids: pair-less bucket groups and empty-result tables must
    carry the STRING id dtype so block schemas unify (ADVICE r2 pinned
    this; int64-hardcoded empties used to break the concat)."""
    import ray.data as rd

    from mimirsbrunn_ray.stages.simjoin import ngram_jaccard_join

    texts = [
        "alpha beta gamma delta epsilon",
        "alpha beta gamma delta zeta",     # near-dup of the first
        "one two three four five six",
        "seven eight nine ten eleven",
    ]
    ids = [f"doc-{i}" for i in range(len(texts))]
    want = _brute_jaccard_pairs(texts, ids, 0.5)
    assert len(want) == 1

    ds = rd.from_arrow(pa.table({"doc_id": pa.array(ids), "text": texts}))
    # many buckets guarantee pair-less groups alongside the pair-bearing one
    out = ngram_jaccard_join(ds, threshold=0.5, n=3, num_buckets=16).to_pandas()
    got = {
        (a, b): j for a, b, j in zip(out["doc_a"], out["doc_b"], out["jaccard"])
    }
    assert set(got) == set(want)
    for k in want:
        assert got[k] == pytest.approx(want[k], abs=1e-12)
