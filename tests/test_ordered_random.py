"""Seeded randomized cross-checks of the window-function family against
brute-force pandas references — the property-test discipline of
tests/test_property.py applied to operators that need a Ray execution per
example (few deterministic seeds instead of hypothesis's hundreds)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

SEEDS = [3, 17, 91]


def _random_events(seed: int, n: int = 400):
    rng = np.random.RandomState(seed)
    ts = (
        np.datetime64("2026-01-01", "us")
        + rng.randint(0, 3 * 86400, n) * np.timedelta64(1_000_000, "us")
    )
    return pd.DataFrame(
        {
            "k": rng.choice(["a", "b", "c"], n),
            "ts": ts,
            "v": np.round(rng.uniform(-50, 150, n), 3),
            "u": rng.randint(0, 25, n).astype(np.int64),
        }
    )


@pytest.mark.parametrize("seed", SEEDS)
def test_rolling_matches_bruteforce(ray_session, seed):
    from mimirsbrunn_ray.stages.ordered import rolling_bucket_agg

    df = _random_events(seed)
    out = (
        rolling_bucket_agg(
            rd.from_pandas(df), key="k", ts_col="ts", value_col="v",
            bucket="1m", window_buckets=5,
        )
        .to_pandas()
        .sort_values(["k", "bucket"], ignore_index=True)
    )
    # brute force: per (key, minute-bucket) grain, sum over the trailing
    # 5-minute RANGE window by explicit mask
    g = df.copy()
    g["bucket"] = g["ts"].dt.floor("1min")
    grain = g.groupby(["k", "bucket"], as_index=False).agg(
        n=("v", "size"), s=("v", "sum")
    )
    rows = []
    for k, sub in grain.groupby("k"):
        sub = sub.sort_values("bucket")
        for _, r in sub.iterrows():
            w = sub[
                (sub["bucket"] > r["bucket"] - pd.Timedelta(minutes=5))
                & (sub["bucket"] <= r["bucket"])
            ]
            snapped = int(np.trunc(w["s"].sum() * 100 + np.copysign(0.5, w["s"].sum())))
            rows.append(
                {
                    "k": k, "bucket": r["bucket"],
                    "roll_n": int(w["n"].sum()),
                    "roll_sum": snapped,
                    "roll_mean": int(np.trunc(snapped / w["n"].sum() + np.copysign(0.5, snapped))),
                }
            )
    ref = pd.DataFrame(rows).sort_values(["k", "bucket"], ignore_index=True)
    assert out["roll_n"].tolist() == ref["roll_n"].tolist()
    assert out["roll_sum"].tolist() == ref["roll_sum"].tolist()
    assert out["roll_mean"].tolist() == ref["roll_mean"].tolist()


@pytest.mark.parametrize("seed", SEEDS)
def test_interarrival_and_mode_match_bruteforce(ray_session, seed):
    from mimirsbrunn_ray.stages.ordered import interarrival_stats, mode_per_key

    df = _random_events(seed)
    out = (
        interarrival_stats(
            rd.from_pandas(df[["u", "ts"]]), key="u", ts_col="ts",
            num_buckets=8,
        )
        .to_pandas()
        .sort_values("u", ignore_index=True)
    )
    rows = []
    for u, sub in df.groupby("u"):
        t = np.sort(sub["ts"].to_numpy().astype("datetime64[us]").astype(np.int64))
        if len(t) < 2:
            continue
        d = np.diff(t)
        rows.append(
            {"u": u, "n_events": len(t),
             "mean_gap_s": (d.sum() / len(d)) / 1e6,
             "max_gap_s": d.max() / 1e6}
        )
    ref = pd.DataFrame(rows).sort_values("u", ignore_index=True)
    assert out["u"].tolist() == ref["u"].tolist()
    assert out["n_events"].tolist() == ref["n_events"].tolist()
    assert np.allclose(out["mean_gap_s"], ref["mean_gap_s"], rtol=0, atol=0)
    assert np.allclose(out["max_gap_s"], ref["max_gap_s"], rtol=0, atol=0)

    mode = (
        mode_per_key(rd.from_pandas(df[["u", "k"]]), key="u", value_col="k")
        .to_pandas()
        .sort_values("u", ignore_index=True)
    )
    ref_rows = []
    for u, sub in df.groupby("u"):
        c = sub["k"].value_counts()
        top = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        ref_rows.append({"u": u, "top_value": top[0], "n_events": top[1]})
    refm = pd.DataFrame(ref_rows).sort_values("u", ignore_index=True)
    assert mode["top_value"].tolist() == refm["top_value"].tolist()
    assert mode["n_events"].tolist() == refm["n_events"].tolist()


@pytest.mark.parametrize("seed", SEEDS)
def test_distinct_and_cumulative_match_bruteforce(ray_session, seed):
    from mimirsbrunn_ray.stages.dedup import exact_distinct_per_group
    from mimirsbrunn_ray.stages.ordered import cumulative_bucket_agg

    df = _random_events(seed)
    out = (
        exact_distinct_per_group(
            rd.from_pandas(df[["k", "u"]]), "k", "u", out_col="n", num_buckets=8
        )
        .to_pandas()
        .sort_values("k", ignore_index=True)
    )
    ref = (
        df.groupby("k")["u"].nunique().rename("n").reset_index()
        .sort_values("k", ignore_index=True)
    )
    assert out["k"].tolist() == ref["k"].tolist()
    assert out["n"].tolist() == ref["n"].tolist()

    cum = (
        cumulative_bucket_agg(
            rd.from_pandas(df), key="k", ts_col="ts", value_col="v", bucket="1d"
        )
        .to_pandas()
        .sort_values(["k", "bucket"], ignore_index=True)
    )
    g = df.copy()
    g["bucket"] = g["ts"].dt.floor("1D")
    grain = (
        g.groupby(["k", "bucket"], as_index=False)
        .agg(day_n=("v", "size"), s=("v", "sum"))
        .sort_values(["k", "bucket"], ignore_index=True)
    )
    grain["cum_n"] = grain.groupby("k")["day_n"].cumsum()
    assert cum["day_n"].tolist() == grain["day_n"].tolist()
    assert cum["cum_n"].tolist() == grain["cum_n"].tolist()
