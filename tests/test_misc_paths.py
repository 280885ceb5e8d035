"""Coverage for alternate operator paths: shuffle-based gapfill/compress,
broadcast-join misses, validate-schema drift, claim-actor retry semantics."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def test_gapfill_shuffle_path_matches_single_partition(ray_session, corpus):
    import ray.data as rd

    from mimirsbrunn_ray.sources.ingest import validated
    from mimirsbrunn_ray.stages.gapfill import gapfill
    from mimirsbrunn_ray.stages.rollup import rollup

    ds = validated(rd.read_parquet(corpus["main_paths"][:2]))
    t = rollup(ds, "1m", from_tier="raw")
    a = gapfill(t, "1m", single_partition=True).to_pandas()
    b = gapfill(t, "1m", single_partition=False).to_pandas()
    key = ["source", "bucket"]
    a = a.sort_values(key, ignore_index=True)
    b = b.sort_values(key, ignore_index=True)
    assert len(a) == len(b)
    for c in ("n_rows", "sum_tok", "filled"):
        assert np.array_equal(a[c].to_numpy(), b[c].to_numpy()), c


def test_compress_shuffle_path_matches_single_partition(ray_session, corpus):
    import ray.data as rd

    from mimirsbrunn_ray.sources.ingest import validated
    from mimirsbrunn_ray.stages.compress import compress_tier
    from mimirsbrunn_ray.stages.rollup import rollup

    ds = validated(rd.read_parquet(corpus["main_paths"][:2]))
    t = rollup(ds, "1m", from_tier="raw").materialize()
    a = compress_tier(t, single_partition=True).to_pandas()
    b = compress_tier(t, single_partition=False).to_pandas()
    key = ["source", "bucket"]
    a = a.sort_values(key, ignore_index=True)
    b = b.sort_values(key, ignore_index=True)
    assert len(a) == len(b)
    assert (a["ts_dod"] == b["ts_dod"]).all()
    assert (a["val_gorilla"] == b["val_gorilla"]).all()


def test_broadcast_join_miss_gets_default(ray_session):
    import ray.data as rd

    from mimirsbrunn_ray.stages.join import broadcast_join, make_lookup_ref

    lookup = make_lookup_ref([1, 2], ["a", "b"])
    ds = rd.from_arrow(pa.table({"k": [1, 2, 3]}))
    out = broadcast_join(ds, lookup, key_col="k", out_col="v",
                         default="miss", out_type=pa.string()).to_pandas()
    assert dict(zip(out["k"], out["v"])) == {1: "a", 2: "b", 3: "miss"}


def test_validate_schema_drift_raises():
    from mimirsbrunn_ray.schemas import SEQUENCES_SCHEMA, validate_schema

    drifted = pa.schema(
        [("doc_id", pa.string()), ("tokens", pa.list_(pa.int64())),
         ("n_tok", pa.int32()), ("source", pa.string())]
    )
    with pytest.raises(ValueError, match="mistyped"):
        validate_schema(drifted, SEQUENCES_SCHEMA, "test")
    missing = pa.schema([("doc_id", pa.string())])
    with pytest.raises(ValueError, match="missing"):
        validate_schema(missing, SEQUENCES_SCHEMA, "test")


def test_claim_actor_retry_reacquires_grants():
    from mimirsbrunn_ray.stages.dedup import ClaimActor

    c = ClaimActor()
    assert c.claim(["a", "b"], owner="task1") == [True, True]
    # a different task loses the race
    assert c.claim(["a", "c"], owner="task2") == [False, True]
    # the SAME task retrying re-acquires its grants (no row loss on retry)
    assert c.claim(["a", "b"], owner="task1") == [True, True]


def test_classifier_validation():
    from mimirsbrunn_ray.stages.classify import validate_rules

    with pytest.raises(ValueError, match="duplicate"):
        validate_rules(
            [{"category": "x", "all": [{"col": "a", "op": "==", "value": 1}]},
             {"category": "x", "all": [{"col": "a", "op": "==", "value": 2}]}],
            "other",
        )
    with pytest.raises(ValueError, match="unknown op"):
        validate_rules(
            [{"category": "x", "all": [{"col": "a", "op": "~=", "value": 1}]}],
            "other",
        )
    with pytest.raises(ValueError, match="collides"):
        validate_rules(
            [{"category": "x", "all": [{"col": "a", "op": "==", "value": 1}]}], "x"
        )


def test_error_budget_in_tiering(ray_session, corpus, tmp_path):
    from mimirsbrunn_ray.pipelines.tiering import run_tiering_job
    from mimirsbrunn_ray.state.metrics import ErrorBudgetExceeded

    with pytest.raises(ErrorBudgetExceeded):
        run_tiering_job(corpus["main_paths"], str(tmp_path / "t"), "rX",
                        max_dropped=0)  # corpus plants dirty rows -> abort


def test_bpeish_token_counter(ray_session):
    import ray.data as rd

    from mimirsbrunn_ray.stages.text import BpeishTokenCounter

    t = pa.table(
        {
            "doc_id": [1, 2, 3],
            "text": ["it's a test-case with 42 tokens", "", "hello   world"],
        }
    )
    out = BpeishTokenCounter()(t)
    ws = out["n_ws_tokens"].to_pylist()
    bpe = out["n_bpe_tokens"].to_pylist()
    assert ws == [6, 0, 2]
    assert bpe[0] > ws[0]  # pretokenizer splits contraction + hyphen
    assert bpe[1] == 0
