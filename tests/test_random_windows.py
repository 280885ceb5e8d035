"""Seeded randomized differential tests for the gaps-and-islands family:
interval_union, session_funnel, hourly_retention, and lead_pairs run over
RANDOM event tables (nulls and exact-timestamp ties included) and must
match DuckDB running the paired oracle SQL on the same rows.

The fixed driver testdata can't produce every tie/null layout; these
tables are adversarial by construction (few users, coarse timestamp
grid -> many exact ties; explicit null injection). Seeds are fixed, so
failures reproduce."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from mimirsbrunn_ray.pipelines.queries import (
    COVERAGE_SQL,
    FUNNEL_SQL,
    LEAD_SQL,
    RETENTION_SQL,
)


def _random_events(seed: int, n: int = 400) -> pa.Table:
    rng = np.random.default_rng(seed)
    base = pd.Timestamp("2026-01-01").value // 1000  # us
    # coarse 7-minute grid over ~6 hours -> dense exact ties
    ts_us = base + rng.integers(0, 50, size=n) * 7 * 60_000_000
    users = rng.integers(1, 8, size=n).astype("float64")
    users[rng.random(n) < 0.05] = np.nan  # null keys
    ts = ts_us.astype("datetime64[us]").astype(object)
    ts_col = pd.Series(ts, dtype="datetime64[us]")
    ts_col[rng.random(n) < 0.05] = pd.NaT  # null timestamps
    types = rng.choice(
        ["click", "view", "purchase", "error"], size=n,
        p=[0.35, 0.35, 0.15, 0.15],
    )
    return pa.table(
        {
            "event_id": pa.array(np.arange(n), pa.int64()),
            "user_id": pa.array(
                pd.array(users, dtype="Int64"), pa.int64()
            ),
            "ts": pa.array(ts_col, pa.timestamp("us")),
            "event_type": pa.array(types, pa.string()),
        }
    )


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object or str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns), ignore_index=True)


def _compare(name, ray_df, sql_df):
    a, b = _canon(ray_df), _canon(sql_df)
    assert list(a.columns) == list(b.columns), f"{name}: columns differ"
    assert len(a) == len(b), f"{name}: {len(a)} vs {len(b)} rows"
    for c in a.columns:
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        assert np.array_equal(av, bv), (
            f"{name}: column {c} differs: {av[:5]} vs {bv[:5]}"
        )


@pytest.mark.parametrize("seed", [3, 17, 99])
def test_random_session_funnel_matches_sql(ray_session, seed):
    from mimirsbrunn_ray.stages.window import session_funnel

    tbl = _random_events(seed)
    con = duckdb.connect()
    con.register("events", tbl)
    got = session_funnel(rd.from_arrow(tbl)).to_pandas()
    want = con.sql(FUNNEL_SQL).df()
    _compare("session_funnel", got, want)


@pytest.mark.parametrize("seed", [3, 17, 99])
def test_random_interval_union_matches_sql(ray_session, seed):
    from mimirsbrunn_ray.stages.window import interval_union

    tbl = _random_events(seed)
    con = duckdb.connect()
    con.register("events", tbl)

    import pyarrow.compute as pc

    def windows(b: pa.Table) -> pa.Table:
        b = b.filter(pc.equal(b["event_type"], "error"))
        return pa.table(
            {
                "user_id": b["user_id"],
                "s": b["ts"],
                "e": pc.add(
                    b["ts"], pa.scalar(300_000_000, pa.duration("us"))
                ),
            }
        )

    win = rd.from_arrow(tbl).map_batches(
        windows, batch_format="pyarrow", batch_size=None
    )
    got = interval_union(win, key="user_id", s_col="s", e_col="e").to_pandas()
    want = con.sql(COVERAGE_SQL).df()
    _compare("interval_union", got, want)


@pytest.mark.parametrize("seed", [3, 17, 99])
def test_random_hourly_retention_matches_sql(ray_session, seed):
    from mimirsbrunn_ray.stages.ordered import hourly_retention

    tbl = _random_events(seed)
    con = duckdb.connect()
    con.register("events", tbl)
    got = hourly_retention(rd.from_arrow(tbl)).to_pandas()
    want = con.sql(RETENTION_SQL).df()
    _compare("hourly_retention", got, want)


@pytest.mark.parametrize("seed", [3, 17, 99])
def test_random_lead_pairs_matches_sql(ray_session, seed):
    from mimirsbrunn_ray.stages.ordered import lead_pairs

    tbl = _random_events(seed)
    con = duckdb.connect()
    con.register("events", tbl)
    got = lead_pairs(rd.from_arrow(tbl), start_type="click").to_pandas()
    want = con.sql(LEAD_SQL).df()
    # DuckDB returns nullable next_event_id as float64 when NULLs were
    # in play upstream; the inner filter removes them — align dtypes
    want["next_event_id"] = want["next_event_id"].astype(np.int64)
    _compare("lead_pairs", got, want)


@pytest.mark.parametrize("seed", [3, 17, 99])
def test_random_asof_join_matches_sql(ray_session, seed):
    """Bucketed as-of join vs DuckDB ASOF JOIN on random tables with
    dense timestamp ties — a click exactly AT an error's ts must match
    it (e.ts <= c.ts), and multiple same-ts errors must resolve
    deterministically."""
    import pyarrow.compute as pc

    from mimirsbrunn_ray.stages.window import asof_join_bucketed

    tbl = _random_events(seed)
    con = duckdb.connect()
    con.register("events", tbl)

    ds = rd.from_arrow(tbl)
    clicks = ds.map_batches(
        lambda b: b.filter(
            pc.and_(
                pc.equal(pc.fill_null(b["event_type"], ""), "click"),
                pc.and_(pc.is_valid(b["user_id"]), pc.is_valid(b["ts"])),
            )
        ).select(["event_id", "user_id", "ts"]),
        batch_format="pyarrow", batch_size=None,
    )
    errors = ds.map_batches(
        lambda b: b.filter(
            pc.and_(
                pc.equal(pc.fill_null(b["event_type"], ""), "error"),
                pc.and_(pc.is_valid(b["user_id"]), pc.is_valid(b["ts"])),
            )
        ).select(["user_id", "ts"]),
        batch_format="pyarrow", batch_size=None,
    )
    got = asof_join_bucketed(
        clicks, errors, key="user_id", ts_col="ts", right_ts_col="ts",
        out_col="last_error_ts", inner=True,
    ).to_pandas()
    want = con.sql(
        """
        SELECT c.event_id, c.user_id, c.ts, e.ts AS last_error_ts
        FROM (SELECT event_id, user_id, ts FROM events
              WHERE event_type = 'click'
                AND user_id IS NOT NULL AND ts IS NOT NULL) c
        ASOF JOIN (SELECT user_id, ts FROM events
                   WHERE event_type = 'error'
                     AND user_id IS NOT NULL AND ts IS NOT NULL) e
          ON c.user_id = e.user_id AND e.ts <= c.ts
        """
    ).df()
    _compare("asof_bucketed", got, want)


@pytest.mark.parametrize("seed", [3, 17, 99])
def test_random_range_join_matches_sql(ray_session, seed):
    """point_in_window_join vs the SQL range-join count on tie-dense
    random tables. Regression: unfiltered NaT timestamps wrapped to
    INT64_MIN in the composite-key arithmetic and fabricated pairs."""
    import pyarrow.compute as pc

    from mimirsbrunn_ray.stages.window import point_in_window_join

    tbl = _random_events(seed)
    con = duckdb.connect()
    con.register("events", tbl)
    ev = rd.from_arrow(tbl)

    def pick(kind):
        return lambda b: b.filter(
            pc.equal(pc.fill_null(b["event_type"], ""), kind)
        ).select(["user_id", "ts"])

    got = point_in_window_join(
        ev.map_batches(pick("click"), batch_format="pyarrow",
                       batch_size=None),
        ev.map_batches(pick("error"), batch_format="pyarrow",
                       batch_size=None),
        key="user_id", ts_col="ts", window=pd.Timedelta(hours=4),
    ).to_pandas()
    want = con.sql(
        """
        WITH pairs AS (
          SELECT c.user_id, c.event_id AS cid
          FROM events c JOIN events e
            ON e.user_id = c.user_id
           AND c.event_type = 'click' AND e.event_type = 'error'
           AND e.ts <= c.ts AND c.ts < e.ts + INTERVAL 4 HOUR
        )
        SELECT user_id,
               CAST(COUNT(*) AS BIGINT) AS n_pairs,
               CAST(COUNT(DISTINCT cid) AS BIGINT) AS n_matched_points
        FROM pairs GROUP BY user_id
        """
    ).df()
    _compare("range_join", got, want)


@pytest.mark.parametrize("seed", [2, 29, 61])
def test_random_attribution_matches_sql(ray_session, seed):
    """last_touch_attribution vs the DuckDB conditional-running-max window
    on random events: dense ts ties (ORDER BY ts, id), null keys/ts,
    triggers with no preceding touch."""
    from mimirsbrunn_ray.stages.ordered import last_touch_attribution

    tbl = _random_events(seed)
    con = duckdb.connect()
    con.register("events", tbl)
    got = last_touch_attribution(
        rd.from_arrow(tbl).repartition(5), key="user_id", ts_col="ts",
        type_col="event_type", trigger="purchase", touch="click",
        id_col="event_id",
    ).to_pandas()
    want = con.sql(
        """
        WITH e AS (
          SELECT event_id, user_id, ts, event_type
          FROM events
          WHERE user_id IS NOT NULL AND ts IS NOT NULL
            AND event_type IN ('purchase', 'click')
        ),
        w AS (
          SELECT event_id, user_id, ts, event_type,
                 MAX(CASE WHEN event_type = 'click' THEN ts END)
                   OVER (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                   AS last_touch_ts
          FROM e
        )
        SELECT event_id, CAST(user_id AS BIGINT) AS user_id, ts,
               last_touch_ts
        FROM w WHERE event_type = 'purchase'
        """
    ).df()
    _compare("attribution", got, want)


@pytest.mark.parametrize("seed", [4, 37])
def test_random_rolling_median_matches_sql(ray_session, seed):
    """rolling_bucket_median vs DuckDB median() OVER RANGE on random
    events with value nulls and dense bucket ties."""
    from mimirsbrunn_ray.stages.ordered import rolling_bucket_median

    rng = np.random.default_rng(seed)
    tbl = _random_events(seed)
    vals = np.round(rng.lognormal(1.0, 1.0, size=tbl.num_rows), 3)
    vals[rng.random(tbl.num_rows) < 0.06] = np.nan
    tbl = tbl.append_column(
        "value",
        pa.array(pd.array(vals), pa.float64()),
    )
    con = duckdb.connect()
    con.register("events", tbl)
    got = rolling_bucket_median(
        rd.from_arrow(tbl).repartition(4), key="event_type", ts_col="ts",
        value_col="value", bucket="1m", window_buckets=5,
    ).to_pandas()
    want = con.sql(
        """
        WITH b AS (
          SELECT event_type, date_trunc('minute', ts) AS bucket, value
          FROM events
          WHERE event_type IS NOT NULL AND ts IS NOT NULL
            AND value IS NOT NULL AND NOT isnan(value)
        )
        SELECT DISTINCT event_type, bucket,
               CAST(COUNT(*) OVER w AS BIGINT) AS roll_n,
               CAST(ROUND(median(value) OVER w * 1000000, 0) AS BIGINT)
                   AS roll_median_snapped
        FROM b
        WINDOW w AS (
          PARTITION BY event_type ORDER BY bucket
          RANGE BETWEEN INTERVAL 4 MINUTE PRECEDING AND CURRENT ROW
        )
        """
    ).df()
    _compare("rolling_median", got, want)
