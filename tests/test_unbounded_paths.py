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
                    single_partition=False, dedup_scan_shards=4,
                    rollup_shards=3)

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


def test_ngram_jaccard_unbounded_matches_bounded(ray_session):
    """mode="unbounded" (hash-order prefixes, Dataset.join verify — no
    driver-held gram map or candidate set) returns byte-identical pairs to
    the bounded broadcast fast path (VERDICT r2 next-round item 1)."""
    import pyarrow as pa
    import ray.data as rd

    from mimirsbrunn_ray.stages.simjoin import ngram_jaccard_join

    rng = np.random.default_rng(19)
    vocab = [f"w{i}" for i in range(150)]
    texts, ids = [], []
    for i in range(120):
        words = list(rng.choice(vocab, size=int(rng.integers(8, 30))))
        texts.append(" ".join(words))
        ids.append(i)
    for i in range(15):  # planted near-dups
        src = texts[i].split(" ")
        src[int(rng.integers(0, len(src)))] = str(rng.choice(vocab))
        texts.append(" ".join(src))
        ids.append(1000 + i)
    texts += [texts[0], "one two", ""]
    ids += [2000, 2001, 2002]

    ds = rd.from_arrow(
        pa.table({"doc_id": pa.array(ids, pa.int64()), "text": texts})
    )

    def run(**kw):
        return (
            ngram_jaccard_join(ds, threshold=0.5, n=3, **kw)
            .to_pandas()
            .sort_values(["doc_a", "doc_b"])
            .reset_index(drop=True)
        )

    bounded = run(mode="bounded")
    unbounded = run(mode="unbounded")
    assert len(bounded) >= 15
    pd.testing.assert_frame_equal(bounded, unbounded)

    # auto with a zero byte budget must also fall back to the join path
    forced = run(mode="auto", broadcast_byte_budget=0)
    pd.testing.assert_frame_equal(bounded, forced)
    # auto with a zero pair cap: bounded prefixes, join verify
    forced2 = run(mode="auto", max_broadcast_pairs=0)
    pd.testing.assert_frame_equal(bounded, forced2)


def test_minhash_cluster_modes_identical(ray_session):
    """cluster_mode="propagate" (iterated min-label propagation over a pair
    Dataset + distributed left-outer labeling — zero driver pair state)
    returns exactly the driver union-find's clustering."""
    import pyarrow as pa
    import ray.data as rd

    from mimirsbrunn_ray.stages.neardup import minhash_lsh_dedup

    rng = np.random.default_rng(23)
    texts, ids = [], []
    for i in range(80):
        texts.append(
            " ".join(f"tok{int(t)}" for t in rng.integers(0, 400, 25))
        )
        ids.append(f"d{i:04d}")
    # plant a CHAIN of near-dups (d0 ~ copy1 ~ copy2) to force multi-hop
    # label propagation, plus simple duplicate pairs
    texts += [texts[0], texts[0] + " tailword", texts[5], texts[9]]
    ids += ["d9000", "d9001", "d9005", "d9009"]

    ds = rd.from_arrow(pa.table({"doc_id": ids, "text": texts}))

    def run(mode):
        return (
            minhash_lsh_dedup(ds, threshold=0.7, cluster_mode=mode)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )

    a = run("driver")
    b = run("propagate")
    pd.testing.assert_frame_equal(a, b)
    # auto with a zero pair budget must take the propagate path and still
    # match (the simjoin-style auto switch, VERDICT r3 item 2)
    c = (
        minhash_lsh_dedup(
            ds, threshold=0.7, cluster_mode="auto", max_driver_pairs=0
        )
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, c)
    # the planted dups actually clustered (nontrivial test)
    clustered = a[a["doc_id"] != a["cluster"]]
    assert len(clustered) >= 3
    assert a.set_index("doc_id").loc["d9000", "cluster"] == "d0000"


def test_q5_and_argmin_broadcast_budget_fallback(ray_session, monkeypatch):
    """The Q5 customer/supplier maps and the argmin part-name lookup obey
    the broadcast byte budget: forcing BROADCAST_BYTE_BUDGET=0 routes both
    queries through distributed Dataset.join paths with identical output."""
    import mimirsbrunn_ray.pipelines.queries as Q

    sf = "/root/testdata/sf0.001"

    def run(name):
        df = Q.QUERIES[name](sf).to_pandas()
        cols = sorted(df.columns)
        return df[cols].sort_values(cols, ignore_index=True)

    base_q5 = run("tpch_q5_region_revenue")
    base_argmin = run("cheapest_lineitem_per_part")
    monkeypatch.setattr(Q, "BROADCAST_BYTE_BUDGET", 0)
    pd.testing.assert_frame_equal(base_q5, run("tpch_q5_region_revenue"))
    pd.testing.assert_frame_equal(
        base_argmin, run("cheapest_lineitem_per_part")
    )
    assert len(base_q5) > 0 and len(base_argmin) > 0
