"""Edge-case tests for batch H: RANGE-frame peer inclusion in the rate
limiter, hand-computed RLE runs, constant-value Tukey grain, and
single-event users in the Markov matrix."""

import numpy as np
import pandas as pd
import pytest


def _write_events(tmp_path, df):
    df = df.copy()
    df["ts"] = pd.to_datetime(df["ts"]).astype("datetime64[us]")
    df.to_parquet(tmp_path / "events.parquet", index=False)
    return str(tmp_path)


def test_value_run_lengths_hand_computed(ray_session, tmp_path):
    from mimirsbrunn_ray.pipelines.queries_r4h import q_value_run_lengths

    base = np.datetime64("2024-01-01T00:00:00", "us")
    # type "a": 1 1 2 2 2 1  -> runs [2,3,1] -> 3 runs, max 3
    # type "b": 5            -> 1 run of 1
    df = pd.DataFrame(
        {
            "event_type": ["a"] * 6 + ["b"],
            "ts": [base + np.timedelta64(m, "m") for m in range(6)] + [base],
            "event_id": list(range(7)),
            "value": [1.0, 1.0, 2.0, 2.0, 2.0, 1.0, 5.0],
            "user_id": [1] * 7,
        }
    )
    out = (
        q_value_run_lengths(_write_events(tmp_path, df))
        .to_pandas()
        .set_index("event_type")
    )
    assert out.loc["a", "n_runs"] == 3
    assert out.loc["a", "max_run"] == 3
    assert out.loc["a", "n_samples"] == 6
    assert out.loc["a", "runs_ppm"] == 3 * 1_000_000 // 6
    assert out.loc["b", "n_runs"] == 1 and out.loc["b", "max_run"] == 1


def test_rate_limit_range_frame_peers_and_boundary(ray_session, tmp_path):
    from mimirsbrunn_ray.pipelines.queries_r4h import q_rate_limit_rejections

    base = np.datetime64("2024-01-01T12:00:00", "us")
    # user 1: 6 events at the SAME ts -> RANGE frame counts all peers ->
    # every one of them sees cnt=6 > 5 -> all 6 rejected.
    # user 2: 6 events exactly 1h apart pairwise inside window? events at
    # 0m and exactly 60m: the 60m event's window [t-1h, t] INCLUDES the 0m
    # event (inclusive lower bound) -> cnt=2, not rejected.
    df = pd.DataFrame(
        {
            "event_type": ["x"] * 8,
            "ts": [base] * 6 + [base, base + np.timedelta64(60, "m")],
            "event_id": list(range(8)),
            "value": [1.0] * 8,
            "user_id": [1] * 6 + [2, 2],
        }
    )
    out = q_rate_limit_rejections(_write_events(tmp_path, df)).to_pandas()
    assert out.iloc[0]["n_total"] == 8
    assert out.iloc[0]["n_rejected"] == 6


def test_tukey_constant_grain_no_outliers(ray_session, tmp_path):
    from mimirsbrunn_ray.pipelines.queries_r4h import q_tukey_outliers_hourly

    base = np.datetime64("2024-01-01T07:30:00", "us")
    df = pd.DataFrame(
        {
            "event_type": ["c"] * 10,
            "ts": [base + np.timedelta64(s, "s") for s in range(10)],
            "event_id": list(range(10)),
            "value": [42.0] * 10,
            "user_id": [1] * 10,
        }
    )
    out = q_tukey_outliers_hourly(_write_events(tmp_path, df)).to_pandas()
    assert len(out) == 1
    r = out.iloc[0]
    assert r["hod"] == 7
    assert r["q1_x100"] == 4200 and r["q3_x100"] == 4200
    assert r["n_outliers"] == 0


def test_markov_single_event_users_dropped(ray_session, tmp_path):
    from mimirsbrunn_ray.pipelines.queries_r4h import q_event_type_markov

    base = np.datetime64("2024-01-01T00:00:00", "us")
    # user 1: a -> b -> b ; users 2..4: one event each (no transitions)
    df = pd.DataFrame(
        {
            "event_type": ["a", "b", "b", "a", "b", "c"],
            "ts": [base + np.timedelta64(m, "m") for m in range(3)] + [base] * 3,
            "event_id": list(range(6)),
            "value": [1.0] * 6,
            "user_id": [1, 1, 1, 2, 3, 4],
        }
    )
    out = q_event_type_markov(_write_events(tmp_path, df)).to_pandas()
    out = out.set_index(["from_type", "to_type"])
    assert len(out) == 2
    assert out.loc[("a", "b"), "n"] == 1
    assert out.loc[("b", "b"), "n"] == 1
    assert out.loc[("a", "b"), "p_ppm"] == 1_000_000
    assert out.loc[("b", "b"), "p_ppm"] == 1_000_000
