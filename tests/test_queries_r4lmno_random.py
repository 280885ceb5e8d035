"""Seeded randomized differential tests for the round-4 K-O ordered /
tie-heavy queries vs DuckDB on adversarial random events tables:
duplicate timestamps (ordering falls to event_id), a constant-value
event type (zero variance, maximal value ties), null keys/timestamps/
values, a single-event user, and values rounded to one decimal so rank
ties are dense."""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from tests.test_queries_ext_random import _compare, _con


def _write_events(tmp: str, seed: int) -> str:
    rng = np.random.default_rng(seed)
    n = 700
    # coarse second-grain offsets -> many exact-duplicate timestamps.
    # seed 11 packs everything into ONE hour (burst islands all-empty:
    # no hour is strictly above the mean; retention D1/D7 all zero),
    # seed 47 spans 10 days so hour islands, 1h conversion windows and
    # D1/D7 probes are all non-trivial.
    span_s = 900 if seed == 11 else 864_000
    ts = np.datetime64("2024-03-01", "us") + (
        rng.integers(0, span_s, size=n) * 1_000_000
    ).astype("timedelta64[us]")
    etype = rng.choice(
        ["click", "view", "purchase", "err", None], size=n,
        p=[0.4, 0.3, 0.15, 0.1, 0.05],
    )
    user = rng.integers(1, 30, size=n).astype(object)
    user[rng.random(n) < 0.03] = None
    user[0] = 999  # single-event user (no gaps, no streak > 1)
    value = np.round(rng.exponential(10.0, size=n), 1).astype(object)
    value[rng.random(n) < 0.05] = None
    value[etype == "err"] = 5.0  # constant type: every row ties
    tso = ts.astype(object)
    tso[rng.random(n) < 0.02] = None
    t = pa.table(
        {
            "event_id": pa.array(np.arange(n), pa.int64()),
            "ts": pa.array(tso, pa.timestamp("us")),
            "user_id": pa.array(user, pa.int64()),
            "event_type": pa.array(etype, pa.string()),
            "value": pa.array(value, pa.float64()),
            "props": pa.array(["{}"] * n, pa.string()),
        }
    )
    pq.write_table(t, os.path.join(tmp, "events.parquet"))
    return tmp


@pytest.mark.parametrize("seed", [11, 47])
def test_random_ordered_series_queries(ray_session, tmp_path, seed):
    from mimirsbrunn_ray.pipelines.queries_r4l import (
        CROSSINGS_SQL,
        DRAWDOWN_SQL,
        ORDINAL_SQL,
        TIER_PARITY_SQL,
        q_max_drawdown_per_type,
        q_mean_crossings_per_type,
        q_ordinal_patterns_per_type,
        q_tier_parity_1h,
    )

    sf = _write_events(str(tmp_path), seed)
    con = _con(sf, ["events"])
    _compare(
        "tier_parity", q_tier_parity_1h(sf), con.sql(TIER_PARITY_SQL).df()
    )
    _compare(
        "drawdown", q_max_drawdown_per_type(sf), con.sql(DRAWDOWN_SQL).df()
    )
    _compare(
        "crossings", q_mean_crossings_per_type(sf),
        con.sql(CROSSINGS_SQL).df(),
    )
    _compare(
        "ordinal", q_ordinal_patterns_per_type(sf), con.sql(ORDINAL_SQL).df()
    )


@pytest.mark.parametrize("seed", [11, 47])
def test_random_rank_streak_queries(ray_session, tmp_path, seed):
    from mimirsbrunn_ray.pipelines.queries_r4m import (
        STREAK_DAYS_SQL,
        VALUE_RANKS_SQL,
        q_active_day_streaks,
        q_value_ranks_events,
    )

    sf = _write_events(str(tmp_path), seed)
    con = _con(sf, ["events"])
    _compare(
        "streaks", q_active_day_streaks(sf), con.sql(STREAK_DAYS_SQL).df()
    )
    _compare(
        "ranks", q_value_ranks_events(sf), con.sql(VALUE_RANKS_SQL).df()
    )


@pytest.mark.parametrize("seed", [11, 47])
def test_random_burst_mad_queries(ray_session, tmp_path, seed):
    from mimirsbrunn_ray.pipelines.queries_r4o import (
        BURST_SQL,
        MAD_GAP_SQL,
        q_burst_hours_per_type,
        q_mad_interarrival_per_type,
    )

    sf = _write_events(str(tmp_path), seed)
    con = _con(sf, ["events"])
    _compare(
        "mad_gap", q_mad_interarrival_per_type(sf),
        con.sql(MAD_GAP_SQL).df(),
    )
    _compare(
        "burst", q_burst_hours_per_type(sf), con.sql(BURST_SQL).df()
    )


@pytest.mark.parametrize("seed", [11, 47])
def test_random_funnel_retention_queries(ray_session, tmp_path, seed):
    from mimirsbrunn_ray.pipelines.queries_r4t import (
        CONVERSION_SQL,
        INVERSIONS_SQL,
        RETENTION_D_SQL,
        q_cohort_d1_d7_retention,
        q_conversion_within_1h,
        q_id_ts_inversions,
    )

    sf = _write_events(str(tmp_path), seed)
    con = _con(sf, ["events"])
    _compare(
        "conversion", q_conversion_within_1h(sf),
        con.sql(CONVERSION_SQL).df(),
    )
    _compare(
        "inversions", q_id_ts_inversions(sf), con.sql(INVERSIONS_SQL).df()
    )
    _compare(
        "retention", q_cohort_d1_d7_retention(sf),
        con.sql(RETENTION_D_SQL).df(),
    )
