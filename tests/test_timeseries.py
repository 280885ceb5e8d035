"""Edge-case unit tests for stages/timeseries.py and pareto_front_2d —
the adversarial layouts the sf-corpus oracle parity sweep can't force:
counter resets, cross-batch OHLC partial merges, EWMA window truncation,
duplicate Pareto points, and window fan-out boundaries."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from mimirsbrunn_ray.stages.ordered import pareto_front_2d
from mimirsbrunn_ray.stages.timeseries import (
    counter_increase,
    day_over_day,
    ohlc_bars,
    sliding_distinct,
    trailing_ewma,
)


def _ts(*mins):
    base = np.datetime64("2024-01-01T00:00:00", "us")
    return [base + np.timedelta64(m, "m") for m in mins]


def test_counter_increase_reset_semantics(ray_session):
    # one series: 1 -> 5 (+4), 5 -> 2 (reset: +2), 2 -> 2 (+0)
    df = pd.DataFrame(
        {
            "user_id": [7, 7, 7, 7],
            "ts": _ts(0, 1, 2, 3),
            "event_id": [1, 2, 3, 4],
            "value": [1.0, 5.0, 2.0, 2.0],
        }
    )
    out = (
        counter_increase(rd.from_pandas(df), key="user_id", freq="h")
        .to_pandas()
    )
    assert len(out) == 1
    assert out.iloc[0]["increase_x100"] == 600  # (4 + 2 + 0) * 100
    assert out.iloc[0]["n_samples"] == 3  # first sample has no delta


def test_counter_increase_ts_tie_broken_by_id(ray_session):
    # identical ts: order by event_id -> deltas 10->30 (+20), 30->20 (reset +20)
    df = pd.DataFrame(
        {
            "user_id": [1, 1, 1],
            "ts": _ts(0, 0, 0),
            "event_id": [3, 1, 2],  # sorted: 1(10), 2(30), 3(20)
            "value": [20.0, 10.0, 30.0],
        }
    )
    out = counter_increase(rd.from_pandas(df), key="user_id").to_pandas()
    assert out.iloc[0]["increase_x100"] == 4000


def test_ohlc_partial_merge_across_blocks(ray_session):
    # force 4 blocks so the groupby.combine path merges real partials;
    # open/close must follow (ts, id) order, not block order
    df = pd.DataFrame(
        {
            "event_type": ["a"] * 8,
            "ts": _ts(7, 3, 1, 5, 2, 6, 0, 4),
            "event_id": [70, 30, 10, 50, 20, 60, 1, 40],
            "value": [7.0, 3.0, 1.0, 5.0, 2.0, 6.0, 0.5, 4.0],
        }
    )
    out = (
        ohlc_bars(rd.from_pandas(df).repartition(4), key="event_type", freq="h")
        .to_pandas()
    )
    assert len(out) == 1
    row = out.iloc[0]
    assert row["open"] == 0.5 and row["close"] == 7.0
    assert row["high"] == 7.0 and row["low"] == 0.5
    assert row["n_samples"] == 8
    assert row["volume_x100"] == 2850


def test_trailing_ewma_exact_weights(ray_session):
    # 3 samples, window 4: newest weight 2^3, then 2^2, 2^1
    df = pd.DataFrame(
        {
            "event_type": ["k"] * 3,
            "ts": _ts(0, 1, 2),
            "event_id": [1, 2, 3],
            "value": [1.0, 2.0, 3.0],  # newest = 3.0
        }
    )
    out = trailing_ewma(rd.from_pandas(df), key="event_type", window=4).to_pandas()
    row = out.iloc[0]
    assert row["n_used"] == 3
    assert row["ewma_num"] == 300 * 8 + 200 * 4 + 100 * 2
    assert row["ewma_den"] == 8 + 4 + 2
    assert row["ewma_x100"] == row["ewma_num"] / row["ewma_den"]


def test_trailing_ewma_window_truncates(ray_session):
    df = pd.DataFrame(
        {
            "event_type": ["k"] * 5,
            "ts": _ts(0, 1, 2, 3, 4),
            "event_id": [1, 2, 3, 4, 5],
            "value": [100.0, 100.0, 1.0, 2.0, 3.0],
        }
    )
    out = trailing_ewma(rd.from_pandas(df), key="event_type", window=2).to_pandas()
    row = out.iloc[0]
    # only the newest two samples (3.0, 2.0) participate
    assert row["n_used"] == 2
    assert row["ewma_num"] == 300 * 2 + 200 * 1
    assert row["ewma_den"] == 3


def test_sliding_distinct_window_labels(ray_session):
    # u1 in hour 0; u2 in hour 1 -> window labels: h0:{u1}, h1:{u1,u2}, h2:{u2}
    base = np.datetime64("2024-01-01T00:30:00", "us")
    df = pd.DataFrame(
        {
            "user_id": [1, 2],
            "ts": [base, base + np.timedelta64(1, "h")],
        }
    )
    out = (
        sliding_distinct(rd.from_pandas(df), entity="user_id", freq="h", window_buckets=2)
        .to_pandas()
        .sort_values("win", ignore_index=True)
    )
    assert out["n_entities"].tolist() == [1, 2, 1]


def test_day_over_day_inner_lag(ray_session):
    df = pd.DataFrame(
        {
            "event_type": ["a", "a", "a", "b"],
            "ts": [
                np.datetime64("2024-01-01T05:00:00", "us"),
                np.datetime64("2024-01-02T06:00:00", "us"),
                np.datetime64("2024-01-04T07:00:00", "us"),  # gap day skipped
                np.datetime64("2024-01-01T00:00:00", "us"),  # single day -> dropped
            ],
            "value": [1.0, 3.5, 2.0, 9.0],
        }
    )
    out = day_over_day(rd.from_pandas(df), key="event_type").to_pandas()
    out = out.sort_values("day", ignore_index=True)
    # LAG is over the ordered distinct days present (SQL LAG over the
    # aggregated series), not calendar-adjacent days
    assert out["event_type"].tolist() == ["a", "a"]
    assert out["delta_x100"].tolist() == [250, -150]


def test_pareto_front_ties_and_duplicates(ray_session):
    # (price, size): dominated rows dropped; exact duplicates BOTH kept;
    # equal-price smaller-size dropped; equal-size higher-price dropped
    df = pd.DataFrame(
        {
            "p_partkey": [1, 2, 3, 4, 5, 6],
            "p_retailprice": [10.0, 10.0, 10.0, 20.0, 5.0, 30.0],
            "p_size": [8, 8, 3, 8, 1, 9],
        }
    )
    out = (
        pareto_front_2d(
            rd.from_pandas(df).repartition(3),
            minimize_col="p_retailprice",
            maximize_col="p_size",
            id_col="p_partkey",
        )
        .to_pandas()
        .sort_values("p_partkey", ignore_index=True)
    )
    # brute-force oracle
    rows = df.to_records(index=False)
    keep = []
    for p in rows:
        dominated = any(
            q[1] <= p[1] and q[2] >= p[2] and (q[1] < p[1] or q[2] > p[2])
            for q in rows
        )
        if not dominated:
            keep.append(p[0])
    assert out["p_partkey"].tolist() == sorted(keep)
    assert set(out["p_partkey"]) == {1, 2, 5, 6}


def test_pareto_front_random_matches_bruteforce(ray_session):
    rng = np.random.default_rng(42)
    n = 400
    df = pd.DataFrame(
        {
            "p_partkey": np.arange(n, dtype=np.int64),
            "p_retailprice": rng.integers(0, 40, n).astype(np.float64),
            "p_size": rng.integers(0, 40, n),
        }
    )
    out = (
        pareto_front_2d(
            rd.from_pandas(df).repartition(7),
            minimize_col="p_retailprice",
            maximize_col="p_size",
            id_col="p_partkey",
        )
        .to_pandas()
    )
    price = df["p_retailprice"].to_numpy()
    size = df["p_size"].to_numpy()
    keep = []
    for i in range(n):
        dominated = np.any(
            (price <= price[i])
            & (size >= size[i])
            & ((price < price[i]) | (size > size[i]))
        )
        if not dominated:
            keep.append(i)
    assert sorted(out["p_partkey"].tolist()) == keep


def test_session_durations_gap_split(ray_session):
    from mimirsbrunn_ray.stages.timeseries import session_durations

    base = np.datetime64("2024-01-01T00:00:00", "us")
    df = pd.DataFrame(
        {
            "user_id": [1, 1, 1, 2],
            "ts": [
                base,
                base + np.timedelta64(10, "m"),   # same session (gap 10m)
                base + np.timedelta64(60, "m"),   # 50m gap > 30m -> new session
                base + np.timedelta64(5, "m"),    # user 2: single event
            ],
        }
    )
    out = (
        session_durations(rd.from_pandas(df), key="user_id", gap_minutes=30)
        .to_pandas()
        .sort_values(["user_id", "session_id"], ignore_index=True)
    )
    assert len(out) == 3
    u1 = out[out["user_id"] == 1]["dur_us"].tolist()
    assert sorted(u1) == [0, 600_000_000]  # 10 min session + singleton
    assert out[out["user_id"] == 2]["dur_us"].tolist() == [0]


def test_bollinger_window_and_constant_series(ray_session):
    from mimirsbrunn_ray.stages.timeseries import bollinger_bands

    base = np.datetime64("2024-01-01T00:00:00", "us")
    # key 'c': constant value -> std exactly 0, upper == lower == mean
    # key 'v': hours 0..3 values 1,3,5,7 with window 2
    df = pd.DataFrame(
        {
            "event_type": ["c"] * 4 + ["v"] * 4,
            "ts": [base + np.timedelta64(h, "h") for h in range(4)] * 2,
            "value": [5.0] * 4 + [1.0, 3.0, 5.0, 7.0],
        }
    )
    out = (
        bollinger_bands(
            rd.from_pandas(df).repartition(3),
            key="event_type",
            freq="h",
            window_buckets=2,
        )
        .to_pandas()
        .sort_values(["event_type", "bucket"], ignore_index=True)
    )
    c = out[out["event_type"] == "c"]
    assert (c["std_x100"] == 0.0).all()
    assert (c["upper_x100"] == c["mean_x100"]).all()
    v = out[out["event_type"] == "v"]
    # hour 0: window {1} -> mean 100; hour 1: {1,3} -> mean 200, std 100
    assert v.iloc[0]["mean_x100"] == 100.0 and v.iloc[0]["roll_n"] == 1
    assert v.iloc[1]["mean_x100"] == 200.0 and v.iloc[1]["std_x100"] == 100.0
    assert v.iloc[1]["upper_x100"] == 400.0 and v.iloc[1]["lower_x100"] == 0.0
    # hour 3: trailing 2h window = {5,7}
    assert v.iloc[3]["mean_x100"] == 600.0 and v.iloc[3]["roll_n"] == 2


def test_integer_pagerank_hand_computed(ray_session):
    from mimirsbrunn_ray.stages.hierarchy import integer_pagerank

    nodes = pd.DataFrame({"node_id": [1, 2, 3]})
    # edges: 2->1, 3->1, 3->2 (node 1 dangling)
    src = np.array([2, 3, 3], dtype=np.int64)
    dst = np.array([1, 1, 2], dtype=np.int64)
    out = (
        integer_pagerank(
            rd.from_pandas(nodes).repartition(2), src, dst,
            node_col="node_id", iters=2,
        )
        .to_pandas()
        .sort_values("node_id", ignore_index=True)
    )
    # it1: share(2)=850000000, share(3)=425000000
    #   pr1 = [1425000000, 575000000, 150000000]
    # it2: share(2)=(575000000*85)//100=488750000, share(3)=(150000000*85)//200=63750000
    assert out["pr"].tolist() == [
        150_000_000 + 488_750_000 + 63_750_000,
        150_000_000 + 63_750_000,
        150_000_000,
    ]


def test_lttb_invariants_and_spike(ray_session):
    from mimirsbrunn_ray.stages.timeseries import lttb_downsample

    base = np.datetime64("2024-01-01T00:00:00", "us")
    n = 200
    rng = np.random.default_rng(3)
    vals = rng.normal(10.0, 0.5, n)
    vals[117] = 500.0  # a spike LTTB must keep
    df = pd.DataFrame(
        {
            "event_type": ["a"] * n,
            "ts": [base + np.timedelta64(h, "h") for h in range(n)],
            "value": vals,
        }
    )
    out = (
        lttb_downsample(
            rd.from_pandas(df).repartition(4),
            key="event_type",
            freq="h",
            target_points=20,
        )
        .to_pandas()
        .sort_values("bucket", ignore_index=True)
    )
    assert len(out) == 20
    # endpoints kept
    assert out.iloc[0]["bucket"] == pd.Timestamp(base)
    assert out.iloc[-1]["bucket"] == pd.Timestamp(base + np.timedelta64(n - 1, "h"))
    # spike kept
    assert (out["mean_x100"] == 50000.0).any()
    # every selected point is an element of the hourly series
    hourly = dict(zip(df["ts"], np.round(df["value"] * 100)))
    for _, r in out.iterrows():
        assert abs(hourly[r["bucket"]] - r["mean_x100"]) < 1e-9
    # series shorter than the budget passes through whole
    short = df.iloc[:7]
    out2 = lttb_downsample(
        rd.from_pandas(short), key="event_type", freq="h", target_points=20
    ).to_pandas()
    assert len(out2) == 7


def test_time_weighted_avg_hand_computed(ray_session):
    from mimirsbrunn_ray.stages.timeseries import time_weighted_avg

    # user 7: values 2.0 for 60s, then 4.0 for 120s  -> num = 200*60e6 + 400*120e6
    # user 8: single sample -> no segments -> dropped
    base = np.datetime64("2024-01-01T00:00:00", "us")
    df = pd.DataFrame(
        {
            "user_id": [7, 7, 7, 8],
            "ts": [base, base + np.timedelta64(60, "s"),
                   base + np.timedelta64(180, "s"), base],
            "event_id": [1, 2, 3, 4],
            "value": [2.0, 4.0, 9.0, 5.0],
        }
    )
    out = time_weighted_avg(rd.from_pandas(df), key="user_id").to_pandas()
    assert len(out) == 1
    r = out.iloc[0]
    assert r["user_id"] == 7
    assert r["n_segments"] == 2
    assert r["span_us"] == 180_000_000
    assert r["twa_num_x100"] == 200 * 60_000_000 + 400 * 120_000_000


def test_acf_constant_series_dropped_and_perfect_trend(ray_session):
    from mimirsbrunn_ray.stages.timeseries import acf_lags

    # type "c": constant -> zero variance -> dropped at every lag.
    # type "r": strictly linear ramp -> lag-1 ACF of 1.0 exactly.
    df = pd.DataFrame(
        {
            "event_type": ["c"] * 4 + ["r"] * 5,
            "ts": _ts(0, 1, 2, 3, 0, 1, 2, 3, 4),
            "event_id": list(range(9)),
            "value": [5.0] * 4 + [1.0, 2.0, 3.0, 4.0, 5.0],
        }
    )
    out = acf_lags(rd.from_pandas(df), key="event_type", lags=(1,)).to_pandas()
    assert set(out["event_type"]) == {"r"}
    r = out.iloc[0]
    assert r["n_pairs"] == 4
    assert r["acf_x1e6"] == 1_000_000  # perfect linear autocorrelation


def test_cumdev_single_point_and_spike(ray_session):
    from mimirsbrunn_ray.stages.timeseries import cumdev_anomalies

    # single-point series: d = |1*S_1 - 1*S_1| = 0, p95 = 0, no anomaly.
    df = pd.DataFrame(
        {
            "event_type": ["solo"] + ["s"] * 10,
            "ts": _ts(*range(11)),
            "event_id": list(range(11)),
            "value": [3.0] + [1.0] * 9 + [100.0],
        }
    )
    out = cumdev_anomalies(rd.from_pandas(df), key="event_type").to_pandas()
    solo = out[out["event_type"] == "solo"].iloc[0]
    assert solo["n_points"] == 1 and solo["n_anomalies"] == 0
    spiky = out[out["event_type"] == "s"].iloc[0]
    assert spiky["n_points"] == 10
    # deviations strictly above the exact P95 are the anomalies
    x = np.array([100] * 9 + [10000], dtype=np.int64)
    cs, n = np.cumsum(x), 10
    d = np.abs(n * cs - np.arange(1, 11) * cs[-1])
    p95 = np.sort(d)[int(np.ceil(0.95 * n)) - 1]
    assert spiky["n_anomalies"] == int((d > p95).sum())
    assert spiky["max_absdev"] == int(d.max())


def test_coverage_sla_staleness_cap(ray_session):
    from mimirsbrunn_ray.stages.timeseries import coverage_sla

    # gaps: 10 min (covered fully), 60 min (capped at 30) -> 40/70 uptime
    df = pd.DataFrame(
        {
            "user_id": [1, 1, 1],
            "ts": _ts(0, 10, 70),
            "event_id": [1, 2, 3],
            "value": [0.0, 0.0, 0.0],
        }
    )
    out = coverage_sla(
        rd.from_pandas(df), key="user_id",
        staleness_us=30 * 60_000_000,
    ).to_pandas()
    r = out.iloc[0]
    assert r["n_gaps"] == 2
    assert r["span_us"] == 70 * 60_000_000
    assert r["covered_us"] == 40 * 60_000_000
    assert r["uptime_ppm"] == (40 * 60_000_000 * 1_000_000) // (70 * 60_000_000)


def test_alert_transitions_hysteresis_dead_band(ray_session):
    from mimirsbrunn_ray.stages.timeseries import alert_transitions

    # type "a": OFF -> 160 (rise) -> 100 dead band (stays ON) -> 70 (fall)
    #           -> 120 dead band (stays OFF) -> 151 (rise again)
    # type "b": starts ABOVE hi on its very first sample -> one rising
    #           transition from the implicit initial OFF state.
    df = pd.DataFrame(
        {
            "event_type": ["a"] * 5 + ["b"] * 2,
            "ts": _ts(0, 1, 3, 4, 5, 0, 2),
            "event_id": list(range(7)),
            "value": [160.0, 100.0, 70.0, 120.0, 151.0, 200.0, 80.0],
        }
    )
    out = (
        alert_transitions(rd.from_pandas(df), key="event_type")
        .to_pandas()
        .set_index("event_type")
    )
    a = out.loc["a"]
    assert a["n_rising"] == 2 and a["n_falling"] == 1
    # in alert from t=0 to t=3 (rise at 0, fall at minute 3): 1m + 2m
    assert a["alert_us"] == 3 * 60_000_000
    b = out.loc["b"]
    assert b["n_rising"] == 1 and b["n_falling"] == 0
    # 200 at t=0, 80 (dead band, stays ON) at t=2 -> 2 minutes in alert
    assert b["alert_us"] == 2 * 60_000_000


def test_watermark_late_carry_across_ranges(ray_session):
    from mimirsbrunn_ray.stages.timeseries import (
        _ARRIVAL_MOD,
        _ARRIVAL_MULT,
        watermark_late,
    )

    # Arrival order is the multiplicative permutation of event_id; with
    # num_ranges=4 the carry-in must cross range boundaries. Build events
    # whose ts DECREASES along arrival order so every arrival after the
    # first is late (watermark = first arrival's ts).
    ids = np.arange(1, 41, dtype=np.int64)
    ak = (ids * _ARRIVAL_MULT) % _ARRIVAL_MOD
    arrival_rank = np.argsort(np.argsort(ak))
    base = np.datetime64("2024-01-01T00:00:00", "us")
    ts = [base - np.timedelta64(int(r), "h") for r in arrival_rank]
    df = pd.DataFrame(
        {"event_type": ["x"] * 40, "ts": ts, "event_id": ids}
    )
    out = watermark_late(
        rd.from_pandas(df), key="event_type", lateness_us=0, num_ranges=4
    ).to_pandas()
    assert len(out) == 1
    r = out.iloc[0]
    assert r["n_total"] == 40
    assert r["n_late"] == 39  # everyone but the first arrival
    assert r["max_late_us"] == 39 * 3_600_000_000  # last arrival, 39h behind

    # and with lateness above the max skew, nothing is late
    out2 = watermark_late(
        rd.from_pandas(df),
        key="event_type",
        lateness_us=40 * 3_600_000_000,
        num_ranges=4,
    ).to_pandas()
    assert out2.iloc[0]["n_late"] == 0 and out2.iloc[0]["max_late_us"] == 0
