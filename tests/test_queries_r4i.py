"""Edge-case tests for batch I: LID argmax tie-break and und fallback,
strictness of monotone streaks (plateaus break runs), Benford digit
extraction, and dominant-period variance skipping."""

import numpy as np
import pandas as pd
import pytest


def _write_events(tmp_path, df):
    df = df.copy()
    df["ts"] = pd.to_datetime(df["ts"]).astype("datetime64[us]")
    df.to_parquet(tmp_path / "events.parquet", index=False)
    return str(tmp_path)


def test_lang_id_tiebreak_and_und(ray_session, tmp_path):
    from mimirsbrunn_ray.pipelines.queries_r4i import q_lang_id_docs

    df = pd.DataFrame(
        {
            "doc_id": ["d1", "d2", "d3", "d4"],
            "text": [
                "the und cat",        # en=1 (the), de=1 (und) -> tie -> de
                "le le la xyz",       # fr=3
                "zzz qqq",            # no hits -> und
                None,                 # null text -> und
            ],
        }
    )
    df.to_parquet(tmp_path / "documents.parquet", index=False)
    out = (
        q_lang_id_docs(str(tmp_path)).to_pandas().set_index("doc_id")
    )
    assert out.loc["d1", "pred_lang"] == "de" and out.loc["d1", "n_hits"] == 1
    assert out.loc["d2", "pred_lang"] == "fr" and out.loc["d2", "n_hits"] == 3
    assert out.loc["d3", "pred_lang"] == "und" and out.loc["d3", "n_hits"] == 0
    assert out.loc["d4", "pred_lang"] == "und"


def test_monotone_streaks_plateau_breaks(ray_session, tmp_path):
    from mimirsbrunn_ray.pipelines.queries_r4i import q_monotone_streaks

    base = np.datetime64("2024-01-01T00:00:00", "us")
    # 1 2 3 3 4 5 6 2 -> strictly-increasing islands: [1,2,3] [3,4,5,6] [2]
    df = pd.DataFrame(
        {
            "event_type": ["a"] * 8,
            "ts": [base + np.timedelta64(m, "m") for m in range(8)],
            "event_id": list(range(8)),
            "value": [1.0, 2.0, 3.0, 3.0, 4.0, 5.0, 6.0, 2.0],
            "user_id": [1] * 8,
        }
    )
    out = q_monotone_streaks(_write_events(tmp_path, df)).to_pandas()
    r = out.iloc[0]
    assert r["longest_streak"] == 4
    assert r["n_streaks_ge3"] == 2
    assert r["n_samples"] == 8


def test_benford_digits_multi_magnitude(ray_session, tmp_path):
    from mimirsbrunn_ray.pipelines.queries_r4i import q_benford_first_digit

    base = np.datetime64("2024-01-01T00:00:00", "us")
    # x100 values: 150 (->1), 9900 (->9), 12 (->1), 305 (->3)
    df = pd.DataFrame(
        {
            "event_type": ["a"] * 4,
            "ts": [base] * 4,
            "event_id": list(range(4)),
            "value": [1.5, 99.0, 0.12, 3.05],
            "user_id": [1] * 4,
        }
    )
    out = q_benford_first_digit(_write_events(tmp_path, df)).to_pandas()
    obs = out.set_index("digit")["n_obs"]
    assert obs.loc[1] == 2 and obs.loc[3] == 1 and obs.loc[9] == 1
    assert obs.sum() == 4
    assert out["chi2_x1e6"].nunique() == 1  # replicated per type


def test_dominant_period_planted_cycle(ray_session, tmp_path):
    from mimirsbrunn_ray.pipelines.queries_r4i import q_dominant_period

    base = np.datetime64("2024-01-01T00:00:00", "us")
    # period-6 sawtooth over 48 hourly points -> perfect lag-6 correlation
    vals = [float(1 + (h % 6)) for h in range(48)]
    df = pd.DataFrame(
        {
            "event_type": ["a"] * 48,
            "ts": [base + np.timedelta64(h, "h") for h in range(48)],
            "event_id": list(range(48)),
            "value": vals,
            "user_id": [1] * 48,
        }
    )
    out = q_dominant_period(_write_events(tmp_path, df)).to_pandas()
    r = out.iloc[0]
    assert r["best_lag"] == 6
    assert r["corr_x1e6"] == 1_000_000

    # constant series: zero variance at every lag -> type dropped
    df2 = df.copy()
    df2["value"] = 5.0
    out2 = q_dominant_period(_write_events(tmp_path, df2)).to_pandas()
    assert len(out2) == 0


def test_kmeans_1d_planted_clusters(ray_session, tmp_path):
    from mimirsbrunn_ray.pipelines.queries_r4j import q_kmeans_1d_value

    base = np.datetime64("2024-01-01T00:00:00", "us")
    # two tight value clouds around 10.00 and 500.00 (and two sparse
    # seeds in between that empty out) -> the two big clusters' final
    # centroids must sit inside their clouds with zero cross-assignment
    vals = [10.0 + i * 0.01 for i in range(50)] + [
        500.0 + i * 0.01 for i in range(50)
    ]
    df = pd.DataFrame(
        {
            "event_type": ["a"] * 100,
            "ts": [base + np.timedelta64(m, "m") for m in range(100)],
            "event_id": list(range(100)),
            "value": vals,
            "user_id": [1] * 100,
        }
    )
    out = q_kmeans_1d_value(_write_events(tmp_path, df)).to_pandas()
    assert len(out) == 4
    assert out["n"].sum() == 100
    big = out[out["n"] >= 25].sort_values("centroid_x100")
    assert len(big) >= 2
    assert 900 <= big.iloc[0]["centroid_x100"] <= 1100
    assert 49_000 <= big.iloc[-1]["centroid_x100"] <= 51_000
