"""Seeded randomized differential tests for the histogram/threshold
statistics family: CUME_DIST, budget prefix selection, exact continuous
quantiles, per-group z-scores, and cross-group duplicate overlap over
RANDOM tables (dense ties, nulls, zero-variance groups) vs DuckDB
running the paired SQL on the same rows."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns), ignore_index=True)


def _compare(name, ray_df, sql_df):
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


def _random_docs(seed: int, n: int = 300) -> pa.Table:
    rng = np.random.default_rng(seed)
    langs = rng.choice(["en", "de", "fr", None], size=n, p=[0.5, 0.25, 0.2, 0.05])
    # tiny value domain -> heavy ties (the CUME_DIST/quantile stressor)
    n_chars = rng.integers(1, 12, size=n).astype("float64")
    n_chars[rng.random(n) < 0.05] = np.nan
    return pa.table(
        {
            "doc_id": pa.array(np.arange(n), pa.int64()),
            "lang": pa.array(langs, pa.string()),
            "n_chars": pa.array(pd.array(n_chars, dtype="Int64"), pa.int64()),
        }
    )


@pytest.mark.parametrize("seed", [5, 41])
def test_random_cume_dist_matches_sql(ray_session, seed):
    from mimirsbrunn_ray.stages.ordered import group_cume_dist

    tbl = _random_docs(seed)
    con = duckdb.connect()
    con.register("documents", tbl)
    got = group_cume_dist(
        rd.from_arrow(tbl), key="lang", val_col="n_chars",
        id_cols=["doc_id"],
    ).to_pandas()
    want = con.sql(
        """
        SELECT doc_id, lang, n_chars,
               CAST(ROUND(CUME_DIST() OVER (
                      PARTITION BY lang ORDER BY n_chars
                    ) * 1000000, 0) AS BIGINT) AS cd_x1000000
        FROM documents WHERE lang IS NOT NULL AND n_chars IS NOT NULL
        """
    ).df()
    _compare("cume_dist", got, want)


@pytest.mark.parametrize("seed", [5, 41])
@pytest.mark.parametrize("budget", [37, 500, 100000])
def test_random_budget_prefix_matches_sql(ray_session, seed, budget):
    from mimirsbrunn_ray.stages.ordered import budget_prefix_select

    tbl = _random_docs(seed)
    con = duckdb.connect()
    con.register("documents", tbl)
    got = budget_prefix_select(
        rd.from_arrow(tbl), weight_col="n_chars", id_col="doc_id",
        budget=budget,
    ).to_pandas()
    want = con.sql(
        f"""
        SELECT doc_id, n_chars FROM (
          SELECT doc_id, n_chars,
                 SUM(n_chars) OVER (
                   ORDER BY n_chars, doc_id ROWS UNBOUNDED PRECEDING
                 ) AS run
          FROM documents
          WHERE n_chars IS NOT NULL AND doc_id IS NOT NULL
        ) WHERE run <= {budget}
        """
    ).df()
    _compare(f"budget_{budget}", got, want)


@pytest.mark.parametrize("seed", [5, 41])
def test_random_continuous_quantile_matches_sql(ray_session, seed):
    from mimirsbrunn_ray.stages.rollup import exact_continuous_quantile

    rng = np.random.default_rng(seed)
    n = 500
    # lognormal with heavy duplicates (quantized to 2 decimals)
    v = np.round(rng.lognormal(3.0, 1.0, size=n), 2)
    v[rng.random(n) < 0.05] = np.nan
    tbl = pa.table({"value": pa.array(v, pa.float64())})
    con = duckdb.connect()
    con.register("t", tbl)
    got = exact_continuous_quantile(
        rd.from_arrow(tbl), val_fn=lambda b: b["value"],
        qs=(0.1, 0.5, 0.9, 0.99),
    )
    # NB: DuckDB's NaN = NaN is TRUE (so `value = value` keeps NaN, and
    # its quantile sorts NaN first) — filter with isnan explicitly
    want = con.sql(
        """
        SELECT quantile_disc(value, 0.1), quantile_disc(value, 0.5),
               quantile_disc(value, 0.9), quantile_disc(value, 0.99)
        FROM t WHERE NOT isnan(value)
        """
    ).fetchone()
    assert got == list(want)


@pytest.mark.parametrize("seed", [5, 41])
def test_random_zscore_matches_sql(ray_session, seed):
    from mimirsbrunn_ray.stages.rollup import group_standardize

    rng = np.random.default_rng(seed)
    n = 400
    types = rng.choice(["a", "b", "c", "const", None], size=n)
    vals = np.round(rng.normal(50, 20, size=n), 3)
    vals[types == "const"] = 7.0  # zero-variance group -> NULL z
    v = vals.copy()
    v[rng.random(n) < 0.05] = np.nan
    tbl = pa.table(
        {
            "event_id": pa.array(np.arange(n), pa.int64()),
            "event_type": pa.array(types, pa.string()),
            "value": pa.array(v, pa.float64()),
        }
    )
    con = duckdb.connect()
    con.register("events", tbl)
    got = group_standardize(
        rd.from_arrow(tbl), key="event_type", val_col="value",
        id_cols=["event_id"],
    ).to_pandas()
    want = con.sql(
        """
        SELECT event_id, event_type,
               CAST(ROUND((value - AVG(value) OVER w)
                          / NULLIF(STDDEV_POP(value) OVER w, 0)
                          * 100, 0) AS BIGINT) AS z_x100
        FROM events
        WHERE event_type IS NOT NULL AND value IS NOT NULL
              AND NOT isnan(value)
        WINDOW w AS (PARTITION BY event_type)
        """
    ).df()
    # the engine drops NaN values itself (missing-data contract) — no
    # manual alignment needed
    _compare("zscore", got, want)


@pytest.mark.parametrize("seed", [5, 41])
def test_random_source_overlap_matches_sql(ray_session, seed):
    from mimirsbrunn_ray.stages.dedup import cross_group_duplicate_overlap

    rng = np.random.default_rng(seed)
    n = 300
    texts = rng.choice(
        [f"payload {i}" for i in range(40)] + [None], size=n
    )
    sources = rng.choice(["s1", "s2", "s3", "s4", None], size=n)
    tbl = pa.table(
        {
            "text": pa.array(texts, pa.string()),
            "source": pa.array(sources, pa.string()),
        }
    )
    con = duckdb.connect()
    con.register("documents", tbl)
    got = cross_group_duplicate_overlap(rd.from_arrow(tbl)).to_pandas()
    want = con.sql(
        """
        WITH h AS (
          SELECT DISTINCT text, source FROM documents
          WHERE text IS NOT NULL AND source IS NOT NULL
        )
        SELECT a.source AS source_a, b.source AS source_b,
               CAST(COUNT(*) AS BIGINT) AS n_shared
        FROM h a JOIN h b ON a.text = b.text AND a.source < b.source
        GROUP BY 1, 2
        """
    ).df()
    _compare("source_overlap", got, want)


@pytest.mark.parametrize("seed,budget", [(9, 10**9), (77, 25)])
def test_random_percentile_cont_matches_sql(ray_session, seed, budget):
    """interpolation="cont" == DuckDB quantile_cont, including with the
    recursive-refinement path forced (tiny bin_row_budget)."""
    from mimirsbrunn_ray.stages.rollup import exact_continuous_quantile

    rng = np.random.default_rng(seed)
    n = 400
    v = np.round(rng.lognormal(2.0, 1.2, size=n), 2)
    v[rng.random(n) < 0.04] = np.nan
    tbl = pa.table({"value": pa.array(v, pa.float64())})
    con = duckdb.connect()
    con.register("t", tbl)
    got = exact_continuous_quantile(
        rd.from_arrow(tbl), val_fn=lambda b: b["value"],
        qs=(0.25, 0.5, 0.9), interpolation="cont", bin_row_budget=budget,
    )
    want = con.sql(
        """
        SELECT quantile_cont(value, 0.25), quantile_cont(value, 0.5),
               quantile_cont(value, 0.9)
        FROM t WHERE NOT isnan(value)
        """
    ).fetchone()
    assert [round(g, 9) for g in got] == [round(w, 9) for w in want], (
        got, want,
    )


@pytest.mark.parametrize("seed", [3, 19])
def test_levenshtein_matches_duckdb(seed):
    """The vectorized batch DP == DuckDB's levenshtein on random short
    strings (including empty, repeats, unicode)."""
    from mimirsbrunn_ray.stages.text import (
        best_lexicon_match,
        levenshtein_matrix,
    )

    rng = np.random.default_rng(seed)
    alpha = list("abcde")
    words = ["".join(rng.choice(alpha, size=rng.integers(0, 9)))
             for _ in range(200)]
    term = "abeca"
    got = levenshtein_matrix(words, term)
    con = duckdb.connect()
    want = [
        con.sql("SELECT levenshtein(?, ?)", params=[w, term]).fetchone()[0]
        for w in words
    ]
    assert got.tolist() == want
    # codepoint (not byte) semantics: one multi-byte substitution = 1
    assert levenshtein_matrix(["éx"], "ex").tolist() == [1]
    # tiebreak: smallest term wins at equal distance
    bt, bd = best_lexicon_match(["ax"], ["ab", "aa"])
    assert bt[0] == "aa" and bd[0] == 1
