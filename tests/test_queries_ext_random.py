"""Seeded randomized differential tests for the queries_ext family
(NTILE tiles, Gini, median/MAD outliers, JS divergence, regex mention
counts, journey paths, TPC-H Q18/Q14) over RANDOM tables — tiny sources
(empty NTILE tiles), constant columns (MAD = 0), nulls in every key, and
thresholds that sometimes select nothing — vs DuckDB running the paired
oracle SQL on the same parquet files."""

import os

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object or np.issubdtype(df[c].dtype, np.datetime64):
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns), ignore_index=True)


def _compare(name, ray_res, sql_df):
    ray_df = ray_res.to_pandas() if hasattr(ray_res, "to_pandas") else ray_res
    a, b = _canon(ray_df), _canon(sql_df)
    assert list(a.columns) == list(b.columns), f"{name}: columns differ"
    assert len(a) == len(b), f"{name}: {len(a)} vs {len(b)} rows"
    for c in a.columns:
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        if np.issubdtype(av.dtype, np.floating) or np.issubdtype(
            bv.dtype, np.floating
        ):
            ok = np.allclose(
                av.astype(float), bv.astype(float),
                rtol=0, atol=0, equal_nan=True,
            )
        else:
            ok = np.array_equal(av, bv)
        assert ok, f"{name}: column {c} differs: {av[:5]} vs {bv[:5]}"


def _write_corpus(tmp: str, seed: int) -> str:
    rng = np.random.default_rng(seed)
    n = 400
    # skewed source sizes, including singleton/duo sources (NTILE n < k)
    sources = np.concatenate(
        [
            np.repeat("big", 250),
            np.repeat("mid", 120),
            np.repeat("tiny", 3),
            np.repeat("solo", 1),
            np.repeat("const", 26),
        ]
    ).astype(object)
    sources[rng.random(n) < 0.03] = None
    words = ["alpha", "beta", "7", "gamma", "x9y", "", "42", "delta"]
    texts = np.array(
        [
            " ".join(rng.choice(words, size=rng.integers(0, 9)))
            for _ in range(n)
        ],
        object,
    )
    texts[rng.random(n) < 0.04] = None
    n_chars = rng.integers(1, 15, size=n).astype(object)  # heavy ties
    n_chars[sources == "const"] = 7  # zero-variance source
    mask = rng.random(n) < 0.04
    n_chars[mask] = None
    t = pa.table(
        {
            "doc_id": pa.array([f"d{i}" for i in range(n)], pa.string()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(["en"] * n, pa.string()),
            "source": pa.array(sources, pa.string()),
            "n_chars": pa.array(n_chars, pa.int64()),
        }
    )
    pq.write_table(t, os.path.join(tmp, "documents.parquet"))
    return tmp


def _write_events(tmp: str, seed: int) -> str:
    rng = np.random.default_rng(seed + 1)
    n = 600
    ts = np.datetime64("2024-01-01", "us") + rng.integers(
        0, 3_600_000_000, size=n
    ).astype("timedelta64[us]")
    etype = rng.choice(
        ["click", "view", "buy", "err", None], size=n,
        p=[0.4, 0.3, 0.15, 0.1, 0.05],
    )
    user = rng.integers(1, 40, size=n).astype(object)
    user[rng.random(n) < 0.03] = None
    value = np.round(rng.exponential(10.0, size=n), 2).astype(object)
    value[rng.random(n) < 0.05] = None
    value[etype == "err"] = 5.0  # constant-value type: MAD == 0
    t = pa.table(
        {
            "event_id": pa.array(np.arange(n), pa.int64()),
            "ts": pa.array(ts, pa.timestamp("us")),
            "user_id": pa.array(user, pa.int64()),
            "event_type": pa.array(etype, pa.string()),
            "value": pa.array(value, pa.float64()),
            "props": pa.array(["{}"] * n, pa.string()),
        }
    )
    pq.write_table(t, os.path.join(tmp, "events.parquet"))
    return tmp


def _write_tpch(tmp: str, seed: int, sparse: bool) -> str:
    rng = np.random.default_rng(seed + 2)
    n_ord, n_li, n_part, n_cust = 80, 300, 25, 12
    pq.write_table(
        pa.table(
            {
                "p_partkey": pa.array(np.arange(1, n_part + 1), pa.int64()),
                "p_name": pa.array(
                    [f"part{i}" for i in range(n_part)], pa.string()
                ),
                "p_brand": pa.array(["b"] * n_part, pa.string()),
                "p_type": pa.array(
                    rng.choice(["PROMO", "SMALL", "LARGE"], n_part),
                    pa.string(),
                ),
                "p_size": pa.array([1] * n_part, pa.int64()),
                "p_retailprice": pa.array([1.0] * n_part, pa.float64()),
            }
        ),
        os.path.join(tmp, "part.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "c_custkey": pa.array(np.arange(1, n_cust + 1), pa.int64()),
                "c_name": pa.array(
                    [f"cust{i}" for i in range(n_cust)], pa.string()
                ),
                "c_nationkey": pa.array([0] * n_cust, pa.int64()),
                "c_acctbal": pa.array([0.0] * n_cust, pa.float64()),
                "c_mktsegment": pa.array(["s"] * n_cust, pa.string()),
            }
        ),
        os.path.join(tmp, "customer.parquet"),
    )
    odate = np.datetime64("1998-02-15", "us") + rng.integers(
        0, 60, size=n_ord
    ).astype("timedelta64[D]").astype("timedelta64[us]")
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array(np.arange(1, n_ord + 1), pa.int64()),
                "o_custkey": pa.array(
                    rng.integers(1, n_cust + 1, n_ord), pa.int64()
                ),
                "o_orderstatus": pa.array(["O"] * n_ord, pa.string()),
                "o_totalprice": pa.array(
                    np.round(rng.uniform(10, 500, n_ord), 2), pa.float64()
                ),
                "o_orderdate": pa.array(odate, pa.timestamp("us")),
                "o_orderpriority": pa.array(["1"] * n_ord, pa.string()),
            }
        ),
        os.path.join(tmp, "orders.parquet"),
    )
    # sparse=True: small quantities so NO order clears the Q18 threshold
    qty_hi = 8 if sparse else 120
    sdate = np.datetime64("1998-02-20", "us") + rng.integers(
        0, 50, size=n_li
    ).astype("timedelta64[D]").astype("timedelta64[us]")
    pq.write_table(
        pa.table(
            {
                "l_orderkey": pa.array(
                    rng.integers(1, n_ord + 1, n_li), pa.int64()
                ),
                "l_partkey": pa.array(
                    rng.integers(1, n_part + 1, n_li), pa.int64()
                ),
                "l_suppkey": pa.array([1] * n_li, pa.int64()),
                "l_linenumber": pa.array(np.arange(n_li), pa.int64()),
                "l_quantity": pa.array(
                    rng.integers(1, qty_hi, n_li).astype(float), pa.float64()
                ),
                "l_extendedprice": pa.array(
                    np.round(rng.uniform(1, 2000, n_li), 2), pa.float64()
                ),
                "l_discount": pa.array(
                    np.round(rng.integers(0, 11, n_li) / 100.0, 2),
                    pa.float64(),
                ),
                "l_tax": pa.array([0.0] * n_li, pa.float64()),
                "l_returnflag": pa.array(["N"] * n_li, pa.string()),
                "l_linestatus": pa.array(["O"] * n_li, pa.string()),
                "l_shipdate": pa.array(sdate, pa.timestamp("us")),
            }
        ),
        os.path.join(tmp, "lineitem.parquet"),
    )
    return tmp


def _con(sf_dir: str, tables):
    con = duckdb.connect()
    for t in tables:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


@pytest.mark.parametrize("seed", [7, 91])
def test_random_doc_distribution_queries(ray_session, tmp_path, seed):
    from mimirsbrunn_ray.pipelines.queries_ext import (
        GINI_SQL,
        JS_SQL,
        NTILE_SQL,
        NUMERIC_SQL,
        q_gini_doc_lengths,
        q_js_divergence_sources,
        q_ntile_doc_lengths,
        q_numeric_mentions,
    )

    sf = _write_corpus(str(tmp_path), seed)
    con = _con(sf, ["documents"])
    _compare("ntile", q_ntile_doc_lengths(sf), con.sql(NTILE_SQL).df())
    _compare("gini", q_gini_doc_lengths(sf), con.sql(GINI_SQL).df())
    _compare("js", q_js_divergence_sources(sf), con.sql(JS_SQL).df())
    _compare("numeric", q_numeric_mentions(sf), con.sql(NUMERIC_SQL).df())


@pytest.mark.parametrize("seed", [7, 91])
def test_random_event_queries(ray_session, tmp_path, seed):
    from mimirsbrunn_ray.pipelines.queries_ext import (
        MAD_SQL,
        PATHS_SQL,
        q_mad_outlier_events,
        q_user_event_paths,
    )

    sf = _write_events(str(tmp_path), seed)
    con = _con(sf, ["events"])
    _compare("mad", q_mad_outlier_events(sf), con.sql(MAD_SQL).df())
    _compare("paths", q_user_event_paths(sf), con.sql(PATHS_SQL).df())


@pytest.mark.parametrize("seed", [7, 91])
@pytest.mark.parametrize("sparse", [False, True])
def test_random_tpch_shapes(ray_session, tmp_path, seed, sparse):
    from mimirsbrunn_ray.pipelines.queries_ext import (
        Q14_SQL,
        Q18_SQL,
        q_tpch_q14_promo_share,
        q_tpch_q18_large_orders,
    )

    sf = _write_tpch(str(tmp_path), seed, sparse)
    con = _con(sf, ["lineitem", "orders", "customer", "part"])
    got18 = q_tpch_q18_large_orders(sf)
    want18 = con.sql(Q18_SQL).df()
    if sparse:
        assert len(want18) == 0
    _compare("q18", got18, want18)
    _compare("q14", q_tpch_q14_promo_share(sf), con.sql(Q14_SQL).df())
