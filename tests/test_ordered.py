"""Edge-case semantics of the window-function family (stages/ordered.py,
stages/dedup.exact_distinct_per_group, stages/join.bloom_semi_join):
null timestamps, ts ties, window gaps, argmax tiebreaks, duplicate right
keys. The cross-engine value parity is covered by test_oracle_parity."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd


def _ts(*minutes):
    base = np.datetime64("2026-01-01T00:00:00", "us")
    return [
        None if m is None else base + np.timedelta64(int(m * 60_000_000), "us")
        for m in minutes
    ]


def test_interarrival_null_ts_and_singletons(ray_session):
    from mimirsbrunn_ray.stages.ordered import interarrival_stats

    t = pa.table(
        {
            "user_id": [1, 1, 1, 2, 3, 3],
            # user 1: gaps 1m and 3m; user 2: singleton (omitted);
            # user 3: one null ts -> effectively a singleton (omitted)
            "ts": pa.array(_ts(0, 1, 4, 0, None, 7), pa.timestamp("us")),
        }
    )
    out = (
        interarrival_stats(rd.from_arrow(t), num_buckets=4)
        .to_pandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    assert out["user_id"].tolist() == [1]
    assert out["n_events"].tolist() == [3]
    assert out["mean_gap_s"].tolist() == [120.0]
    assert out["max_gap_s"].tolist() == [180.0]


def test_interarrival_ties_are_zero_gaps(ray_session):
    from mimirsbrunn_ray.stages.ordered import interarrival_stats

    t = pa.table(
        {
            "user_id": [7, 7, 7],
            "ts": pa.array(_ts(5, 5, 8), pa.timestamp("us")),
        }
    )
    out = interarrival_stats(rd.from_arrow(t), num_buckets=2).to_pandas()
    assert out["mean_gap_s"].tolist() == [90.0]  # (0 + 180) / 2
    assert out["max_gap_s"].tolist() == [180.0]


def test_rolling_window_respects_gaps(ray_session):
    from mimirsbrunn_ray.stages.ordered import rolling_bucket_agg

    # minutes 0,1,2 then a jump to 10: the window at 10 must NOT reach
    # back across the gap (RANGE frame, not ROWS frame)
    t = pa.table(
        {
            "k": ["a"] * 4,
            "ts": pa.array(_ts(0, 1, 2, 10), pa.timestamp("us")),
            "v": pa.array([1.0, 2.0, 3.0, 4.0]),
        }
    )
    out = (
        rolling_bucket_agg(
            rd.from_arrow(t), key="k", ts_col="ts", value_col="v",
            bucket="1m", window_buckets=5,
        )
        .to_pandas()
        .sort_values("bucket")
        .reset_index(drop=True)
    )
    assert out["roll_n"].tolist() == [1, 2, 3, 1]
    assert out["roll_sum"].tolist() == [100, 300, 600, 400]
    assert out["roll_mean"].tolist() == [100, 150, 200, 400]


def test_rolling_window_trailing_partial(ray_session):
    from mimirsbrunn_ray.stages.ordered import rolling_bucket_agg

    # bucket at minute 4 sees minutes 0..4 (5 buckets); minute 5 drops 0
    t = pa.table(
        {
            "k": ["a"] * 6,
            "ts": pa.array(_ts(0, 1, 2, 3, 4, 5), pa.timestamp("us")),
            "v": pa.array([1.0] * 6),
        }
    )
    out = (
        rolling_bucket_agg(
            rd.from_arrow(t), key="k", ts_col="ts", value_col="v",
            bucket="1m", window_buckets=5,
        )
        .to_pandas()
        .sort_values("bucket")
        .reset_index(drop=True)
    )
    assert out["roll_n"].tolist() == [1, 2, 3, 4, 5, 5]


def test_cumulative_resets_per_key(ray_session):
    from mimirsbrunn_ray.stages.ordered import cumulative_bucket_agg

    t = pa.table(
        {
            "k": ["a", "a", "b"],
            "ts": pa.array(
                [np.datetime64("2026-01-01", "us"),
                 np.datetime64("2026-01-03", "us"),
                 np.datetime64("2026-01-02", "us")],
                pa.timestamp("us"),
            ),
            "v": pa.array([1.5, 2.5, 10.0]),
        }
    )
    out = (
        cumulative_bucket_agg(
            rd.from_arrow(t), key="k", ts_col="ts", value_col="v", bucket="1d"
        )
        .to_pandas()
        .sort_values(["k", "bucket"])
        .reset_index(drop=True)
    )
    assert out["cum_n"].tolist() == [1, 2, 1]
    assert out["cum_sum"].tolist() == [150, 400, 1000]  # b resets, not 1400


def test_mode_per_key_tiebreak_ascending(ray_session):
    from mimirsbrunn_ray.stages.ordered import mode_per_key

    t = pa.table(
        {
            "k": [1, 1, 1, 1, 2, 2],
            # key 1: b x2, a x2 -> tie broken to 'a'; key 2: unanimous 'z'
            "v": ["b", "a", "b", "a", "z", "z"],
        }
    )
    out = (
        mode_per_key(rd.from_arrow(t), key="k", value_col="v")
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    assert out["top_value"].tolist() == ["a", "z"]
    assert out["n_events"].tolist() == [2, 2]


def test_exact_distinct_counts_across_blocks(ray_session):
    from mimirsbrunn_ray.stages.dedup import exact_distinct_per_group

    # the same (group, value) pair split across input blocks must count once
    t1 = pa.table({"g": ["x", "x", "y"], "u": [1, 2, 1]})
    t2 = pa.table({"g": ["x", "y", "y"], "u": [2, 1, None]})
    ds = rd.from_arrow(t1).union(rd.from_arrow(t2))
    out = (
        exact_distinct_per_group(ds, "g", "u", out_col="n_users", num_buckets=4)
        .to_pandas()
        .sort_values("g")
        .reset_index(drop=True)
    )
    assert out["g"].tolist() == ["x", "y"]
    assert out["n_users"].tolist() == [2, 1]


def test_bloom_semi_join_exactly_once_with_dup_right_keys(ray_session):
    from mimirsbrunn_ray.stages.join import bloom_semi_join

    left = rd.from_arrow(
        pa.table({"k": [1, 2, 3, 4], "name": ["a", "b", "c", "d"]})
    )
    # key 2 appears in TWO right blocks — the semi-join must still emit
    # left row 2 exactly once
    right = rd.from_arrow(pa.table({"rk": [2, 2, 3]})).union(
        rd.from_arrow(pa.table({"rk": [2]}))
    )
    out = (
        bloom_semi_join(left, right, left_key="k", right_key="rk")
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    assert out["k"].tolist() == [2, 3]
    assert out["name"].tolist() == ["b", "c"]


def test_extract_int_key_edge_cases():
    import pyarrow as pa

    from mimirsbrunn_ray.functions.jsonx import extract_int_key

    arr = pa.array(
        ['{"k": 69}', '{"k": -3}', None, "oops", '{"other": 1}',
         '{"k":0}', '{ "k" : 42 }']
    )
    out = extract_int_key(arr, "k").to_pylist()
    assert out == [69, -3, None, None, None, 0, 42]


def test_repetition_scores_counts(ray_session):
    import pyarrow as pa

    from mimirsbrunn_ray.stages.text import repetition_scores

    t = pa.table(
        {
            "doc_id": [1, 2, 3],
            # doc 1: bigrams (a b) x2, (b a) x1 -> top 2/3
            # doc 2: single word -> no bigrams -> omitted
            # doc 3: all distinct bigrams -> top 1/3
            "text": ["a b a b", "solo", "w x y z"],
        }
    )
    out = (
        repetition_scores(rd.from_arrow(t), n=2)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert out["doc_id"].tolist() == [1, 3]
    assert out["n_grams"].tolist() == [3, 3]
    assert out["top_gram_n"].tolist() == [2, 1]
    assert out["top_frac_x1e6"].tolist() == [666667, 333333]


def test_exact_distinct_composite_group(ray_session):
    from mimirsbrunn_ray.stages.dedup import exact_distinct_per_group

    t = pa.table(
        {
            "g1": ["x", "x", "x", "y"],
            "g2": [1, 1, 2, 1],
            "u": [10, 10, 10, 10],
        }
    )
    out = (
        exact_distinct_per_group(
            rd.from_arrow(t), ["g1", "g2"], "u", out_col="n", num_buckets=4
        )
        .to_pandas()
        .sort_values(["g1", "g2"])
        .reset_index(drop=True)
    )
    assert out["g1"].tolist() == ["x", "x", "y"]
    assert out["g2"].tolist() == [1, 2, 1]
    assert out["n"].tolist() == [1, 1, 1]


def test_rolling_and_cumulative_null_values_and_keys(ray_session):
    """Null VALUES sum as 0 (never NaN-poison the window); null KEYS drop
    (SQL-parity rule pinned in _bucket_grain_partials)."""
    from mimirsbrunn_ray.stages.ordered import (
        cumulative_bucket_agg,
        rolling_bucket_agg,
    )

    t = pa.table(
        {
            "k": ["a", "a", None, "a"],
            "ts": pa.array(_ts(0, 1, 1, 2), pa.timestamp("us")),
            "v": pa.array([1.0, None, 5.0, 2.0]),  # bucket 1 is all-null
        }
    )
    roll = (
        rolling_bucket_agg(
            rd.from_arrow(t), key="k", ts_col="ts", value_col="v",
            bucket="1m", window_buckets=5,
        )
        .to_pandas()
        .sort_values("bucket")
        .reset_index(drop=True)
    )
    assert roll["k"].tolist() == ["a", "a", "a"]  # null key dropped
    assert roll["roll_n"].tolist() == [1, 2, 3]
    assert roll["roll_sum"].tolist() == [100, 100, 300]  # no NaN garbage
    cum = (
        cumulative_bucket_agg(
            rd.from_arrow(t), key="k", ts_col="ts", value_col="v", bucket="1m"
        )
        .to_pandas()
        .sort_values("bucket")
        .reset_index(drop=True)
    )
    assert cum["cum_n"].tolist() == [1, 2, 3]
    assert cum["cum_sum"].tolist() == [100, 100, 300]


def test_interarrival_drops_null_keys(ray_session):
    from mimirsbrunn_ray.stages.ordered import interarrival_stats

    t = pa.table(
        {
            "user_id": pa.array([None, None, 4, 4], pa.int64()),
            "ts": pa.array(_ts(0, 5, 0, 2), pa.timestamp("us")),
        }
    )
    out = interarrival_stats(rd.from_arrow(t), num_buckets=2).to_pandas()
    assert out["user_id"].tolist() == [4]


def test_extract_int_key_rejects_float_values():
    from mimirsbrunn_ray.functions.jsonx import extract_int_key

    arr = pa.array(['{"k": 3.5}', '{"k": 7}', '{"k": 2, "j": 1}'])
    assert extract_int_key(arr, "k").to_pylist() == [None, 7, 2]


def test_keys_with_all_categories_dedups_required(ray_session):
    from mimirsbrunn_ray.stages.classify import keys_with_all_categories

    t = pa.table(
        {"u": [1, 1, 2], "c": ["click", "purchase", "click"]}
    )
    out = (
        keys_with_all_categories(
            rd.from_arrow(t), "u", "c",
            required=["click", "click", "purchase"], num_buckets=2,
        )
        .to_pandas()
    )
    assert out["u"].tolist() == [1]


def test_contaminated_doc_ids_counts(ray_session):
    from mimirsbrunn_ray.stages.text import contaminated_doc_ids

    bench = rd.from_arrow(
        pa.table({"doc_id": [0], "text": ["the quick brown fox jumps"]})
    )
    corpus = rd.from_arrow(
        pa.table(
            {
                "doc_id": [1, 2, 3],
                "text": [
                    # shares "the quick", "quick brown", "brown fox" = 3
                    "the quick brown fox sleeps",
                    "a quick brown cat",            # shares "quick brown" = 1
                    "nothing in common here",       # shares 0
                ],
            }
        )
    )
    out = (
        contaminated_doc_ids(corpus, bench, n=2, min_hits=2)
        .to_pandas()
        .sort_values("doc_id", ignore_index=True)
    )
    assert out["doc_id"].tolist() == [1]
    assert out["n_hits"].tolist() == [3]
    # min_hits=1 also catches doc 2
    out1 = (
        contaminated_doc_ids(corpus, bench, n=2, min_hits=1)
        .to_pandas()
        .sort_values("doc_id", ignore_index=True)
    )
    assert out1["doc_id"].tolist() == [1, 2]
    assert out1["n_hits"].tolist() == [3, 1]


def test_last_touch_attribution_edges(ray_session):
    """Strictly-preceding frame, same-ts ordering by id, null key/ts rows
    dropped, trigger with no preceding touch -> null."""
    import pyarrow as pa
    import ray.data as rd

    from mimirsbrunn_ray.stages.ordered import last_touch_attribution

    us = lambda s: np.datetime64(s, "us")  # noqa: E731
    tbl = pa.table({
        "event_id": pa.array([1, 2, 3, 4, 5, 6, 7, 8], pa.int64()),
        "user_id": pa.array([10, 10, 10, 10, 20, 20, None, 30], pa.int64()),
        "ts": pa.array([
            us("2026-01-01 00:00:00"), us("2026-01-01 00:01:00"),
            us("2026-01-01 00:01:00"), us("2026-01-01 00:02:00"),
            us("2026-01-01 00:00:30"), None,
            us("2026-01-01 00:00:10"), us("2026-01-01 00:00:40"),
        ], pa.timestamp("us")),
        "event_type": pa.array([
            "click", "click", "purchase", "purchase",
            "purchase", "click", "purchase", "view",
        ]),
    })
    out = (
        last_touch_attribution(
            rd.from_arrow(tbl), key="user_id", ts_col="ts",
            type_col="event_type", trigger="purchase", touch="click",
            id_col="event_id",
        )
        .to_pandas().sort_values("event_id", ignore_index=True)
    )
    # user 10: purchase id=3 at 00:01 — click id=2 shares its ts but has a
    # SMALLER id, so it's a preceding row (ORDER BY ts, id)
    got = dict(zip(out["event_id"], out["last_touch_ts"]))
    assert got[3] == pd.Timestamp("2026-01-01 00:01:00")
    assert got[4] == pd.Timestamp("2026-01-01 00:01:00")
    assert pd.isna(got[5])        # user 20: no preceding click (null-ts dropped)
    assert 7 not in got           # null user dropped
    assert set(out["event_id"]) == {3, 4, 5}  # user 30 has no purchase
