"""Path-parity pins for the round-5 budget-gated attach helpers
(stages/broadcast.py, stages/exactrank.py, stages/join.py fallback):
the broadcast probe and the distributed-join fallback must produce the
same rows, and the exact-rank helpers must match their numpy oracles."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd


@pytest.fixture(scope="module")
def dim_parquet(tmp_path_factory):
    import pyarrow.parquet as pq

    d = tmp_path_factory.mktemp("bcast")
    rng = np.random.default_rng(7)
    keys = np.arange(100, dtype=np.int64)
    pq.write_table(
        pa.table({
            "k": pa.array(keys),
            "v": pa.array(rng.integers(0, 10, 100).astype(np.int64)),
            "s": pa.array([f"s{i % 5}" for i in keys]),
        }),
        str(d / "dim.parquet"),
    )
    return str(d)


def _fact(rng):
    keys = rng.integers(-5, 110, 500).astype(np.int64)  # misses included
    return rd.from_arrow(pa.table({
        "fk": pa.array(keys),
        "x": pa.array(rng.integers(0, 100, 500).astype(np.int64)),
    }))


def _canon(df):
    return df[sorted(df.columns)].sort_values(
        list(sorted(df.columns)), ignore_index=True)


def test_attach_dim_broadcast_vs_join_parity(ray_session, dim_parquet):
    from mimirsbrunn_ray.stages.broadcast import attach_dim

    for how in ("inner", "left"):
        a = attach_dim(_fact(np.random.default_rng(3)), "fk",
                       dim_parquet, "dim", "k",
                       ["v", "s"], how=how).to_pandas()
        b = attach_dim(_fact(np.random.default_rng(3)), "fk",
                       dim_parquet, "dim", "k",
                       ["v", "s"], how=how, budget=1).to_pandas()
        # join path may carry the dim key column: align to probe columns
        b = b[[c for c in a.columns]]
        pd.testing.assert_frame_equal(_canon(a), _canon(b))


def test_broadcast_join_fallback_parity(ray_session, dim_parquet):
    from mimirsbrunn_ray.stages.join import (
        broadcast_join, lookup_ref_from_parquet)

    path = f"{dim_parquet}/dim.parquet"
    lookup = lookup_ref_from_parquet(path, "k", "s")
    assert lookup is not None
    a = broadcast_join(_fact(np.random.default_rng(5)), lookup,
                       "fk", "seg",
                       out_type=pa.string()).to_pandas()
    gated = lookup_ref_from_parquet(path, "k", "s", budget=1)
    assert gated is None
    b = broadcast_join(_fact(np.random.default_rng(5)), gated,
                       "fk", "seg",
                       out_type=pa.string(),
                       dim_spec=(path, "k", "s")).to_pandas()
    b = b[[c for c in a.columns]]
    pd.testing.assert_frame_equal(_canon(a), _canon(b))


def test_keyed_counts_matches_pandas(ray_session, dim_parquet):
    from mimirsbrunn_ray.stages.broadcast import keyed_counts

    got = keyed_counts(dim_parquet, "dim", "s").to_pandas()
    import pyarrow.parquet as pq

    exp = pq.read_table(f"{dim_parquet}/dim.parquet").to_pandas()
    exp = exp.groupby("s").size()
    got = got.set_index("s")["n"]
    for k, v in exp.items():
        assert int(got[k]) == int(v)


def test_rank_band_lut_matches_lexsort(ray_session):
    from mimirsbrunn_ray.stages.exactrank import band_of, rank_band_lut

    rng = np.random.default_rng(11)
    vals = rng.integers(0, 40, 1000).astype(np.int64)  # heavy ties
    ties = rng.permutation(1000).astype(np.int64)
    ds = rd.from_arrow(pa.table({"v": pa.array(vals),
                                 "t": pa.array(ties)}))
    for k in (3, 4, 10):
        ref, n = rank_band_lut(ds, "v", "t", k)
        assert n == 1000
        got = band_of(vals, ties, ref)
        order = np.lexsort((ties, vals))
        exp = np.empty(1000, np.int64)
        exp[order] = np.arange(1000, dtype=np.int64) * k // 1000
        assert (got == exp).all()


def test_topk_threshold_matches_lexsort(ray_session):
    from mimirsbrunn_ray.stages.exactrank import (
        member_mask, topk_threshold)

    rng = np.random.default_rng(13)
    vals = rng.integers(0, 30, 500).astype(np.int64)
    ties = rng.permutation(500).astype(np.int64)
    ds = rd.from_arrow(pa.table({"v": pa.array(vals),
                                 "t": pa.array(ties)}))
    for k in (1, 50, 499):
        thr = topk_threshold(ds, "v", "t", k)
        got = member_mask(vals, ties, thr)
        top = np.lexsort((ties, -vals))[:k]
        exp = np.zeros(500, dtype=bool)
        exp[top] = True
        assert (got == exp).all(), k
    assert topk_threshold(ds, "v", "t", 0) is None
    assert topk_threshold(ds, "v", "t", 501) is None


def test_quantile_float_matches_percentile(ray_session):
    from mimirsbrunn_ray.stages.exactrank import quantile_float

    rng = np.random.default_rng(17)
    x = np.round(rng.normal(0, 10, 2000), 2)  # ties via rounding
    ds = rd.from_arrow(pa.table({"x": pa.array(x)})).repartition(7)
    for q in (1, 50, 99):
        got = quantile_float(ds, "x", q)
        assert got == pytest.approx(float(np.percentile(x, q)),
                                    rel=0, abs=1e-12)


def test_sharded_reduce_keeps_groups_whole(ray_session):
    from mimirsbrunn_ray.stages.broadcast import sharded_reduce

    rng = np.random.default_rng(19)
    keys = rng.integers(0, 50, 2000).astype(np.int64)
    ds = rd.from_arrow(pa.table({
        "k": pa.array(keys),
        "x": pa.array(np.ones(2000, np.int64)),
    })).repartition(9)

    def per_shard(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("k")["x"].sum()
        return pd.DataFrame({"k": g.index.to_numpy(np.int64),
                             "n": g.to_numpy(np.int64)})

    out = sharded_reduce(ds, ["k"], per_shard, num_shards=8).to_pandas()
    # every key appears exactly once (groups never split across shards)
    assert out["k"].is_unique
    exp = pd.Series(keys).value_counts()
    for k, v in exp.items():
        assert int(out.set_index("k")["n"][k]) == int(v)


def test_dedup_exact_pruned_matches_full_shuffle(ray_session):
    """dup-scan pruning must not change dedup_exact's winners."""
    import pyarrow.parquet as pq

    from mimirsbrunn_ray.stages.dedup import _hash64, dedup_exact

    rng = np.random.default_rng(23)
    keys = [f"d{int(k)}" for k in rng.integers(0, 300, 1000)]
    tbl = pa.table({
        "doc_id": pa.array(keys),
        "payload": pa.array(rng.integers(0, 1 << 30, 1000).astype(np.int64)),
    })
    ds = rd.from_arrow(tbl).repartition(6)
    full = dedup_exact(ds, key="doc_id",
                       tiebreak=["payload"]).to_pandas()
    h = _hash64(tbl["doc_id"]).view(np.int64)
    uniq, counts = np.unique(h, return_counts=True)
    dup_hashes = uniq[counts > 1]
    pruned = dedup_exact(ds, key="doc_id", tiebreak=["payload"],
                         dup_hashes=dup_hashes).to_pandas()
    a = full.sort_values(["doc_id", "payload"], ignore_index=True)
    b = pruned.sort_values(["doc_id", "payload"], ignore_index=True)
    pd.testing.assert_frame_equal(a, b)
