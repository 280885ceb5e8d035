"""Unit tests for individual stages: dedup winner determinism, enrichment
lookup + weight normalization, gap-fill policies."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from mimirsbrunn_ray.functions.timeutil import US_PER_MINUTE
from mimirsbrunn_ray.stages.dedup import _dedup_bucket, add_bucket
from mimirsbrunn_ray.stages.enrich import SourceDimEnricher, build_dim_ref
from mimirsbrunn_ray.stages.gapfill import _fill_series


def test_dedup_bucket_keeps_deterministic_winner():
    t = pa.table(
        {
            "doc_id": ["b", "a", "b", "a", "c"],
            "v": [1, 2, 3, 4, 5],
        }
    )
    t = add_bucket(t, "doc_id", 4)
    # winner = first row after (key, tiebreak) sort -> smallest v per key
    out = _dedup_bucket(t, "doc_id", ["v"])
    got = dict(zip(out["doc_id"].to_pylist(), out["v"].to_pylist()))
    assert got == {"a": 2, "b": 1, "c": 5}


def test_dedup_hash_is_process_independent():
    t = pa.table({"doc_id": ["x", "y", "z"]})
    b1 = add_bucket(t, "doc_id", 64)["_dedup_bucket"].to_pylist()
    b2 = add_bucket(t, "doc_id", 64)["_dedup_bucket"].to_pylist()
    assert b1 == b2


def test_enricher_lookup_and_normalization(ray_session, dim_table):
    ref = build_dim_ref(dim_table)
    enr = SourceDimEnricher(ref)
    batch = pa.table({"source": ["web", "misc", "unknown-src", "web"]})
    out = enr(batch)
    assert out["family"].to_pylist() == ["crawl", "misc", "unknown", "crawl"]
    assert out["weight"].to_pylist()[0] == 1.0  # max weight normalizes to 1
    assert out["weight"].to_pylist()[1] == pytest.approx(0.2 / 8.0)
    assert out["weight"].to_pylist()[2] == 0.0
    assert out["priority"].to_pylist()[2] == -1


def _series(buckets, sums):
    n = len(buckets)
    return pd.DataFrame(
        {
            "source": ["s"] * n,
            "bucket": pd.to_datetime(np.asarray(buckets, dtype=np.int64), unit="us"),
            "n_rows": np.ones(n, dtype=np.int64),
            "sum_tok": np.asarray(sums, dtype=np.int64),
            "min_tok": np.asarray(sums, dtype=np.int32),
            "max_tok": np.asarray(sums, dtype=np.int32),
            "mean_tok": np.asarray(sums, dtype=np.float64),
            "filled": [False] * n,
            "fill_kind": ["none"] * n,
        }
    )


def test_gapfill_locf():
    b = [0, US_PER_MINUTE, 4 * US_PER_MINUTE]
    out = _fill_series(_series(b, [10, 20, 50]), US_PER_MINUTE, "locf")
    assert len(out) == 5
    assert out["sum_tok"].tolist() == [10, 20, 20, 20, 50]
    assert out["filled"].tolist() == [False, False, True, True, False]
    assert out["fill_kind"].tolist() == ["none", "none", "locf", "locf", "none"]
    assert out["n_rows"].tolist() == [1, 1, 0, 0, 1]


def test_gapfill_linear():
    b = [0, 3 * US_PER_MINUTE]
    out = _fill_series(_series(b, [10, 40]), US_PER_MINUTE, "linear")
    assert out["sum_tok"].tolist() == [10, 20, 30, 40]
    assert out["fill_kind"].tolist() == ["none", "linear", "linear", "none"]


def test_gapfill_no_gaps_is_identity():
    b = [0, US_PER_MINUTE]
    src = _series(b, [1, 2])
    out = _fill_series(src.copy(), US_PER_MINUTE, "locf")
    pd.testing.assert_frame_equal(
        out.reset_index(drop=True), src, check_dtype=False
    )


def test_fill_continuation_bridges_window_gap():
    """A new window starting 3 buckets after the previous window's boundary
    gets the bridge buckets LOCF-filled from boundary_last_value, without
    touching the published tier."""
    from mimirsbrunn_ray.functions.timeutil import US_PER_MINUTE
    from mimirsbrunn_ray.stages.gapfill import fill_continuation

    boundaries = {"s": {"bucket_us": 0, "boundary_last_value": 99}}
    new = _series([4 * US_PER_MINUTE, 5 * US_PER_MINUTE], [10, 20])
    out = fill_continuation(boundaries, new, "1m", policy="locf")
    # buckets 1..3 bridged with the boundary value, 4..5 are the new rows
    assert len(out) == 5
    assert out["sum_tok"].tolist() == [99, 99, 99, 10, 20]
    assert out["filled"].tolist() == [True, True, True, False, False]
    assert (out["n_rows"].tolist() == [0, 0, 0, 1, 1])
    # no boundary for an unseen key -> plain fill
    out2 = fill_continuation({}, new, "1m")
    assert len(out2) == 2


def test_merge_list_union_cross_run(ray_session):
    """D3 graft (/root/reference/src/stops.rs:151-187): rows sharing a key
    merge to one row — list fields set-unioned and SORTED (BTreeSet
    determinism), scalars first-seen-wins under the tiebreak sort."""
    import ray.data as rd

    from mimirsbrunn_ray.stages.merge import merge_list_union

    # two "runs" of stops with overlapping ids and list-valued codes
    run_a = pd.DataFrame(
        {
            "stop_id": ["s1", "s2", "s3"],
            "codes": [["nav:1", "osm:9"], ["nav:2"], []],
            "name": ["Alpha", "Beta", "Gamma"],
            "run": [0, 0, 0],
        }
    )
    run_b = pd.DataFrame(
        {
            "stop_id": ["s2", "s1", "s4"],
            "codes": [["gtfs:7", "nav:2"], ["nav:1", "gtfs:5"], None],
            "name": ["Beta-late", "Alpha-late", "Delta"],
            "run": [1, 1, 1],
        }
    )
    ds = rd.from_pandas(pd.concat([run_a, run_b], ignore_index=True))
    out = (
        merge_list_union(
            ds,
            key="stop_id",
            list_cols=["codes"],
            scalar_cols=["name"],
            tiebreak=["run"],
            num_buckets=4,
        )
        .to_pandas()
        .sort_values("stop_id")
        .reset_index(drop=True)
    )
    assert list(out["stop_id"]) == ["s1", "s2", "s3", "s4"]
    # first-seen scalar: run 0 wins where present
    assert list(out["name"]) == ["Alpha", "Beta", "Gamma", "Delta"]
    # sorted set-union of list values; empty/None -> []
    assert list(out["codes"]) == [
        ["gtfs:5", "nav:1", "osm:9"],
        ["gtfs:7", "nav:2"],
        [],
        [],
    ]


def test_selectors_unit():
    """M14/M15 grafts: deepest-with-value, range label branches, code-list
    parse (split/trim/drop-empty/sort)."""
    from mimirsbrunn_ray.functions.selectors import (
        deepest_with_value,
        parse_code_list,
        range_label,
    )

    deep = pa.array(["75001", None, "", None])
    mid = pa.array([None, "69000", "31000", None])
    shallow = pa.array(["FR", "FR", "FR", None])
    assert deepest_with_value(deep, mid, shallow).to_pylist() == [
        "75001", "69000", "31000", None,
    ]

    names = pa.array(["Paris", "Lyon", "Nowhere"])
    lo = pa.array([75000, 69000, 0])
    hi = pa.array([75116, 69000, 0])
    cnt = pa.array([5, 1, 0])
    assert range_label(names, lo, hi, cnt).to_pylist() == [
        "Paris (75000-75116)", "Lyon (69000)", "Nowhere",
    ]

    parsed = parse_code_list(pa.array(["75116; 75000 ;;75008", "", None, "x"]))
    assert parsed.to_pylist() == [["75000", "75008", "75116"], [], [], ["x"]]


def test_conditional_override(ray_session):
    """J3 graft: matched keys REPLACE the column; misses keep their value."""
    import ray.data as rd

    from mimirsbrunn_ray.stages.join import (
        conditional_override,
        make_lookup_ref_arrays,
    )

    ds = rd.from_pandas(
        pd.DataFrame(
            {"insee": [10, 20, 30, 40], "admin": ["a", "b", "c", "d"]}
        )
    )
    ref = make_lookup_ref_arrays(
        np.array([20, 40]), np.array(["B!", "D!"], dtype=object)
    )
    out = (
        conditional_override(ds, ref, key_col="insee", target_col="admin")
        .to_pandas()
        .sort_values("insee")
    )
    assert list(out["admin"]) == ["a", "B!", "c", "D!"]


def test_hopping_window_rollup(ray_session):
    """Overlapping 3m windows hopping 1m: each event lands in exactly 3
    windows; counts/sums hand-checked on a tiny stream."""
    import ray.data as rd

    from mimirsbrunn_ray.stages.window import hopping_window_rollup

    base = 1_700_000_040_000_000  # minute-aligned us
    rows = pd.DataFrame(
        {
            "k": ["a", "a", "a", "b"],
            "ts": pd.to_datetime(
                [base, base + 60_000_000, base + 150_000_000, base],
                unit="us",
            ),
            "v": [1.0, 2.0, 4.0, 10.0],
        }
    )
    out = (
        hopping_window_rollup(
            rd.from_pandas(rows), "k", "ts", "v", window="3m", hop="1m"
        )
        .to_pandas()
        .sort_values(["k", "bucket"])
        .reset_index(drop=True)
    )
    a = out[out["k"] == "a"]
    # event at t0 covers windows t0-2m..t0; event t0+1m covers t0-1m..t0+1m;
    # event t0+2.5m (bucket t0+2m) covers t0..t0+2m
    buck_us = a["bucket"].to_numpy().astype("datetime64[us]").astype("int64")
    got = set(zip(buck_us, a["n_rows"], a["sum_val"]))
    m = 60_000_000
    want = {
        (base - 2 * m, 1, 1.0),
        (base - 1 * m, 2, 3.0),
        (base, 3, 7.0),
        (base + 1 * m, 2, 6.0),
        (base + 2 * m, 1, 4.0),
    }
    assert got == want
    b = out[out["k"] == "b"]
    assert len(b) == 3 and set(b["n_rows"]) == {1} and set(b["sum_val"]) == {10.0}


def test_point_in_window_join(ray_session):
    """Range join: every anchor within the trailing window matches (1:N),
    boundary semantics inclusive-start exclusive-end, tied timestamps and
    multiple keys hand-checked."""
    import ray.data as rd

    from mimirsbrunn_ray.stages.window import point_in_window_join

    t0 = pd.Timestamp("2026-01-01 00:00:00")
    m = pd.Timedelta(minutes=1)
    points = pd.DataFrame(
        {
            "user_id": [1, 1, 1, 2, 3],
            "ts": [t0 + 5 * m, t0 + 5 * m, t0 + 20 * m, t0 + 5 * m, t0],
        }
    )
    anchors = pd.DataFrame(
        {
            "user_id": [1, 1, 1, 2, 3],
            # u1: two anchors inside the 10m window of t0+5m (one AT the
            # point ts), one stale; u2: boundary exactly window before
            # (exclusive end -> no match); u3: anchor == point ts (match)
            "ts": [t0, t0 + 5 * m, t0 - 20 * m, t0 - 5 * m, t0],
        }
    )
    out = (
        point_in_window_join(
            rd.from_pandas(points),
            rd.from_pandas(anchors),
            key="user_id",
            ts_col="ts",
            window=pd.Timedelta(minutes=10),
        )
        .to_pandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    # u1: both t0+5m points match anchors {t0, t0+5m} -> 4 pairs, 2 points;
    # the t0+20m point matches none; u2's anchor at exactly -10m is OUT
    # (c.ts < a.ts + window is strict); u3 matches its own-ts anchor
    assert out.to_dict("records") == [
        {"user_id": 1, "n_pairs": 4, "n_matched_points": 2},
        {"user_id": 3, "n_pairs": 1, "n_matched_points": 1},
    ]


def test_stratified_sample_deterministic_and_monotone(ray_session):
    """Deterministic stratified sampling: same input -> same sample;
    larger fraction -> superset (threshold of one fixed score); per-
    stratum rates land near their targets."""
    import pyarrow as pa
    import ray.data as rd

    from mimirsbrunn_ray.stages.text import deterministic_stratified_sample

    n = 4000
    tbl = pa.table(
        {
            "doc_id": pa.array(np.arange(n), pa.int64()),
            "source": pa.array(
                ["web" if i % 2 == 0 else "code" for i in range(n)]
            ),
        }
    )

    def sample(fracs):
        return set(
            deterministic_stratified_sample(
                rd.from_arrow(tbl), "source", "doc_id", fracs,
                default_frac=0.0,
            )
            .to_pandas()["doc_id"]
        )

    s1 = sample({"web": 0.2, "code": 0.5})
    assert s1 == sample({"web": 0.2, "code": 0.5})  # deterministic
    s2 = sample({"web": 0.4, "code": 0.8})
    assert s1 <= s2  # monotone: bigger fractions are supersets
    web = {d for d in s1 if d % 2 == 0}
    code = s1 - web
    assert abs(len(web) / (n / 2) - 0.2) < 0.04
    assert abs(len(code) / (n / 2) - 0.5) < 0.04


def test_sessionize_null_ts_starts_new_session(ray_session):
    """Null-ts events sort last within their key and EACH starts a new
    session (the pre-r3 per-group `diff().isna()` semantics, pinned per
    ADVICE r2: a bare `diff > gap` evaluates NaT comparisons as False and
    would silently merge null-ts events into the previous session)."""
    import ray.data as rd

    from mimirsbrunn_ray.stages.window import sessionize

    base = pd.Timestamp("2026-01-01")
    df = pd.DataFrame(
        {
            "user_id": ["u1"] * 5 + ["u2"] * 2,
            "ts": [
                base,
                base + pd.Timedelta(minutes=1),   # same session
                pd.NaT,                            # own session (sorts last)
                base + pd.Timedelta(minutes=2),    # same session as minute 1
                pd.NaT,                            # second own session
                base,
                base + pd.Timedelta(hours=2),      # gap > 30m: new session
            ],
        }
    )
    out = (
        sessionize(rd.from_pandas(df), key="user_id", num_buckets=4)
        .to_pandas()
        .set_index("user_id")
    )
    assert out.loc["u1", "n_sessions"] == 3  # timed chain + 2 NaT sessions
    assert out.loc["u1", "n_events"] == 5
    assert out.loc["u2", "n_sessions"] == 2


def test_asof_join_bucketed_matches_broadcast(ray_session):
    """The distributed (hash-bucketed) as-of join returns exactly what the
    broadcast small-right path and a plain pandas merge_asof return —
    inner and outer — on keys spread across many buckets."""
    import ray.data as rd

    from mimirsbrunn_ray.stages.window import asof_join, asof_join_bucketed

    rng = np.random.default_rng(5)
    base = pd.Timestamp("2026-02-01").value // 1000  # us
    n_l, n_r = 400, 150
    left = pd.DataFrame(
        {
            "event_id": np.arange(n_l, dtype=np.int64),
            "user_id": [f"u{int(i)}" for i in rng.integers(0, 40, n_l)],
            "ts": pd.to_datetime(
                base + rng.integers(0, 10_000_000, n_l), unit="us"
            ),
        }
    )
    right = pd.DataFrame(
        {
            "user_id": [f"u{int(i)}" for i in rng.integers(0, 25, n_r)],
            "ts": pd.to_datetime(
                base + rng.integers(0, 10_000_000, n_r), unit="us"
            ),
        }
    )

    want = pd.merge_asof(
        left.sort_values("ts"),
        right.sort_values("ts").rename(columns={"ts": "m"}),
        left_on="ts", right_on="m", by="user_id", direction="backward",
    ).dropna(subset=["m"])

    for inner in (True, False):
        got_b = asof_join_bucketed(
            rd.from_pandas(left), rd.from_pandas(right),
            key="user_id", ts_col="ts", right_ts_col="ts",
            out_col="m", inner=inner, num_buckets=16,
        ).to_pandas()
        got_s = asof_join(
            rd.from_pandas(left), right,
            key="user_id", ts_col="ts", right_ts_col="ts",
            out_col="m", inner=inner,
        ).to_pandas()
        def norm(df):
            df = df.sort_values(["event_id"]).reset_index(drop=True)
            df = df[["event_id", "user_id", "ts", "m"]].copy()
            # the bucketed path emits us-precision matches; unify for compare
            df["ts"] = df["ts"].astype("datetime64[ns]")
            df["m"] = df["m"].astype("datetime64[ns]")
            return df
        pd.testing.assert_frame_equal(norm(got_b), norm(got_s))
        if inner:
            pd.testing.assert_frame_equal(norm(got_b), norm(want))
            assert len(got_b) > 0


def test_order_paths_by_time(tmp_path):
    """Footer-stat time sort: name order is adversarially reversed vs time
    order; a list column is present (leaf-column indexing must match the
    ts path, not the arrow field position); a stats-less file sorts last."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from mimirsbrunn_ray.sources.ingest import order_paths_by_time

    def write(name, ts_lo, stats=True):
        t = pa.table({
            "tokens": pa.array([[1, 2], [3]], type=pa.list_(pa.int32())),
            "ts": pa.array([ts_lo, ts_lo + 10], type=pa.timestamp("us")),
        })
        p = str(tmp_path / name)
        pq.write_table(t, p, write_statistics=stats)
        return p

    # names z,y,x,w -> glob order REVERSES time order
    a = write("z.parquet", 100)
    b = write("y.parquet", 200)
    c = write("x.parquet", 300)
    d = write("w.parquet", 400, stats=False)
    got = order_paths_by_time([c, a, d, b])
    assert got == [a, b, c, d]  # time order, stats-less last


def test_pack_sequences_invariants(ray_session):
    """Greedy packing: cap respected except singleton oversized packs,
    every doc packed exactly once, greedy tightness (the next pack's first
    doc would not have fit), and block-layout independence."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from mimirsbrunn_ray.stages.text import pack_sequences

    rng = np.random.default_rng(3)
    n = 400
    df = pd.DataFrame(
        {
            "doc_id": np.arange(n, dtype=np.int64),
            "source": rng.choice(["a", "b", "c"], n),
            # a few oversized docs to force singleton packs
            "text": [
                " ".join(["w"] * int(t))
                for t in rng.integers(1, 120, n) + (np.arange(n) % 97 == 0) * 400
            ],
        }
    )
    cap = 256
    out1 = (
        pack_sequences(rd.from_pandas(df).repartition(1), "source", cap=cap)
        .to_pandas().sort_values(["source", "pack_id"]).reset_index(drop=True)
    )
    out8 = (
        pack_sequences(rd.from_pandas(df).repartition(8), "source", cap=cap)
        .to_pandas().sort_values(["source", "pack_id"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(out1, out8)  # block-layout independent

    tok = df.assign(n_tok=df.text.str.split(" ").str.len())
    assert out1.n_docs.sum() == n  # every doc packed exactly once
    over = out1[out1.pack_tokens > cap]
    assert (over.n_docs == 1).all()  # only oversized singletons exceed cap
    for src, g in out1.groupby("source"):
        g = g.sort_values("pack_id")
        toks = tok[tok.source == src].sort_values("doc_id")
        # greedy tightness: pack i could not absorb pack i+1's first doc
        firsts = g.first_doc_id.to_numpy()
        for i in range(len(g) - 1):
            nxt = toks[toks.doc_id == firsts[i + 1]].n_tok.iat[0]
            assert g.pack_tokens.iat[i] + nxt > cap


def test_tfidf_top_terms_modes_and_edges(ray_session):
    """Bounded (broadcast vocab) and unbounded (Dataset.join) TF-IDF are
    byte-identical; null/empty/multi-space texts neither crash nor emit
    empty-token rows; ties break token-ascending."""
    import ray.data as rd
    from mimirsbrunn_ray.stages.text import tfidf_top_terms

    df = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4, 5],
            "text": [
                "alpha beta  beta gamma",   # double space -> empty token
                "alpha alpha delta",
                None,                        # null text -> no rows
                "",                          # empty text -> no rows
                "beta gamma gamma zeta zeta",  # tf tie zeta/gamma
            ],
        }
    )
    ds = rd.from_pandas(df).repartition(3)
    out_b = (
        tfidf_top_terms(ds, k=2, mode="bounded")
        .to_pandas().sort_values(["doc_id", "token"]).reset_index(drop=True)
    )
    out_u = (
        tfidf_top_terms(ds, k=2, mode="unbounded")
        .to_pandas()[out_b.columns]
        .sort_values(["doc_id", "token"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(out_b, out_u)

    assert (out_b.token != "").all()
    assert not out_b.doc_id.isin([3, 4]).any()
    assert (out_b.groupby("doc_id").size() <= 2).all()
    # doc 5: gamma and zeta share tf=2 and df, score ties -> gamma first
    d5 = out_b[out_b.doc_id == 5].sort_values(
        ["score_x1e6", "token"], ascending=[False, True]
    )
    assert list(d5.token)[:2] == ["gamma", "zeta"] or "gamma" in set(d5.token)
