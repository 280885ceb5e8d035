"""Winnowing fingerprint tests: the coverage theorem, density, boundary
isolation, partition independence, and the per-doc signature contract."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd


def _ds(texts, ids=None):
    n = len(texts)
    return rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(ids or list(range(n)), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )
    )


K, W = 5, 4


def test_winnow_coverage_theorem(ray_session):
    """Any shared substring of length >= w + k - 1 must share >= 1
    fingerprint VALUE between the two documents."""
    from mimirsbrunn_ray.stages.neardup import winnow_fingerprints

    shared = "xqzvbnmklp"  # length 10 >= W + K - 1 = 8
    a = "aaaa " + shared + " bbbb cccc dddd"
    b = "eeee ffff " + shared + " gggg"
    out = winnow_fingerprints(_ds([a, b]), k=K, w=W).to_pandas()
    fps_a = set(out[out.doc_id == 0]["fp"])
    fps_b = set(out[out.doc_id == 1]["fp"])
    assert fps_a & fps_b, "coverage guarantee violated"


def test_winnow_no_cross_doc_windows(ray_session):
    """Fingerprints of ['ab', 'cd'] in one batch must equal the union of
    fingerprinting each doc alone — nothing may hash across the
    concatenation boundary."""
    from mimirsbrunn_ray.stages.neardup import winnow_fingerprints

    t1 = "the quick brown fox jumps"
    t2 = "pack my box with five dozen"
    both = winnow_fingerprints(_ds([t1, t2]), k=K, w=W).to_pandas()
    solo1 = winnow_fingerprints(_ds([t1]), k=K, w=W).to_pandas()
    solo2 = winnow_fingerprints(_ds([t2], ids=[1]), k=K, w=W).to_pandas()

    def key(df):
        return set(zip(df.doc_id, df.fp, df.pos))

    assert key(both) == key(solo1) | key(solo2)


def test_winnow_partition_independent(ray_session):
    from mimirsbrunn_ray.stages.neardup import winnow_fingerprints

    texts = [f"document number {i} talks about topic {i * 7 % 13} at length"
             for i in range(40)]
    one = winnow_fingerprints(_ds(texts), k=K, w=W).to_pandas()
    many = winnow_fingerprints(
        _ds(texts).repartition(8), k=K, w=W
    ).to_pandas()

    def key(df):
        return set(zip(df.doc_id, df.fp, df.pos))

    assert key(one) == key(many)


def test_winnow_short_doc_and_signature_cover(ray_session):
    from mimirsbrunn_ray.stages.neardup import (
        winnow_fingerprints,
        winnow_signatures,
    )

    texts = ["ab", "a longer document that fits several windows"]
    fp = winnow_fingerprints(_ds(texts), k=K, w=W).to_pandas()
    assert (fp.doc_id == 0).sum() == 0  # too short: no window fits
    sig = (
        winnow_signatures(_ds(texts), k=K, w=W)
        .to_pandas()
        .sort_values("doc_id", ignore_index=True)
    )
    assert len(sig) == 2  # short docs still covered
    assert sig.loc[0, "n_fp"] == 0 and sig.loc[0, "fp_xor"] == 0
    assert sig.loc[1, "n_fp"] > 0
    # signature agrees with the row form
    rows = fp[fp.doc_id == 1]
    assert sig.loc[1, "n_fp"] == len(rows)
    assert np.uint64(sig.loc[1, "fp_xor"]) == np.bitwise_xor.reduce(
        rows["fp"].to_numpy().view(np.uint64)
    )


def test_winnow_density(ray_session):
    """Expected density is 2/(w+1); assert a generous band around it."""
    from mimirsbrunn_ray.stages.neardup import winnow_fingerprints

    rng = np.random.default_rng(7)
    text = "".join(rng.choice(list("abcdefghijklmnopqrstuvwxyz "), 5000))
    out = winnow_fingerprints(_ds([text]), k=K, w=W).to_pandas()
    n_grams = len(text.encode()) - K + 1
    density = len(out) / n_grams
    assert 1.0 / W <= density <= 3.0 / (W + 1)


def test_winnow_copy_candidates_matches_bruteforce(ray_session):
    """Distributed pair pipeline == brute-force recount over the same
    fingerprint table (df cap and min_shared applied identically)."""
    import itertools
    from collections import defaultdict

    from mimirsbrunn_ray.stages.neardup import (
        winnow_copy_candidates,
        winnow_fingerprints,
    )

    base = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
            "lambda mu nu xi omicron pi rho sigma tau upsilon")
    texts = []
    for i in range(30):
        # every third doc embeds a long shared passage -> partial copies
        extra = base if i % 3 == 0 else f"unique tail {i} " * 4
        texts.append(f"doc {i} prefix {i * i} " + extra)
    ds = _ds(texts)
    K2, W2, MIN_S, MAX_DF = 8, 4, 3, 10

    got = (
        winnow_copy_candidates(
            ds, k=K2, w=W2, min_shared=MIN_S, max_df=MAX_DF
        )
        .to_pandas()
        .sort_values(["doc_a", "doc_b"], ignore_index=True)
    )

    fps = winnow_fingerprints(ds, k=K2, w=W2).to_pandas()
    by_fp = defaultdict(set)
    for doc, fp in zip(fps.doc_id, fps.fp):
        by_fp[fp].add(doc)
    counts = defaultdict(int)
    for fp, docs in by_fp.items():
        if 2 <= len(docs) <= MAX_DF:
            for a, b in itertools.combinations(sorted(docs), 2):
                counts[(a, b)] += 1
    want = sorted((a, b, n) for (a, b), n in counts.items() if n >= MIN_S)
    assert list(map(tuple, got.to_numpy())) == want
    # the planted partial copies are found
    copies = {(a, b) for a, b, _ in want}
    assert (0, 3) in copies or (0, 6) in copies


def test_winnow_copy_clusters_match_unionfind(ray_session):
    """minlabel_propagation over the winnow pair list == a driver
    union-find over the same pairs (min-id labels)."""
    from mimirsbrunn_ray.stages.neardup import (
        minlabel_propagation,
        winnow_copy_candidates,
    )

    base = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
            "lambda mu nu xi omicron pi rho sigma tau upsilon")
    texts = []
    for i in range(30):
        extra = base if i % 3 == 0 else f"unique tail {i} " * 4
        texts.append(f"doc {i} prefix {i * i} " + extra)
    ds = _ds(texts)
    pairs_ds = winnow_copy_candidates(
        ds, k=8, w=4, min_shared=3, max_df=10
    )
    pairs = pairs_ds.to_pandas()
    got = (
        minlabel_propagation(pairs_ds, a_col="doc_a", b_col="doc_b")
        .to_pandas()
        .sort_values("doc_id", ignore_index=True)
    )

    parent = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in zip(pairs.doc_a, pairs.doc_b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {n: find(n) for n in parent}
    assert dict(zip(got.doc_id, got.cluster)) == want
    assert len(want) > 0  # the planted copies form at least one family


def test_winnow_cluster_labels_auto_switch(ray_session):
    """winnow_cluster_labels: driver mode within budget, propagate past it
    (forced with max_driver_pairs=0) — identical labels either way, and the
    switch is reported via the `distributed` flag (VERDICT r3 item 2)."""
    from mimirsbrunn_ray.stages.neardup import (
        winnow_cluster_labels,
        winnow_copy_candidates,
    )

    base = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
            "lambda mu nu xi omicron pi rho sigma tau upsilon")
    texts = []
    for i in range(30):
        extra = base if i % 3 == 0 else f"unique tail {i} " * 4
        texts.append(f"doc {i} prefix {i * i} " + extra)
    pairs = winnow_copy_candidates(
        _ds(texts), k=8, w=4, min_shared=3, max_df=10
    )
    drv, dist_a = winnow_cluster_labels(pairs, max_driver_pairs=10**9)
    assert dist_a is False
    import pyarrow as pa

    assert isinstance(drv, pa.Table)
    prop, dist_b = winnow_cluster_labels(pairs, max_driver_pairs=0)
    assert dist_b is True
    a = drv.to_pandas().sort_values("doc_id", ignore_index=True)
    b = prop.to_pandas().sort_values("doc_id", ignore_index=True)
    pd.testing.assert_frame_equal(a, b.astype(a.dtypes.to_dict()))
    assert len(a) > 0


def test_winnow_copy_clusters_query_endtoend(ray_session):
    """The driver query itself (node collection, int-key label mapping,
    representative-labels-itself contract) — not just the underlying
    operators."""
    from mimirsbrunn_ray.pipelines.queries import q_winnow_copy_clusters
    from mimirsbrunn_ray.stages.neardup import winnow_copy_candidates

    import ray.data as rd

    sf = "/root/testdata/sf0.001"
    out = q_winnow_copy_clusters(sf)
    df = out.to_pandas() if not hasattr(out, "to_pydict") else out.to_pandas()
    docs = rd.read_parquet(f"{sf}/documents.parquet",
                           columns=["doc_id", "text"])
    pairs = winnow_copy_candidates(
        docs, k=12, w=4, min_shared=4, max_df=8
    ).to_pandas()

    parent = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in zip(pairs.doc_a, pairs.doc_b):
        ra, rb = find(int(a)), find(int(b))
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {n: find(n) for n in parent}
    assert dict(zip(df.doc_id, df.cluster)) == want
    # representatives label themselves and appear in the output
    reps = set(want.values())
    got = dict(zip(df.doc_id, df.cluster))
    assert all(got[r] == r for r in reps)
