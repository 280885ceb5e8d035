"""Unit tests for the corpus-hygiene family: regex redaction, unigram-LM
quality scoring, and the percentile-threshold filter query.

The full SQL-parity check runs in test_oracle_parity.py (these queries are
all oracled); the tests here pin the semantics the oracle can't see —
null handling, fixed-point conventions, and conservation invariants.
"""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd


def _docs_ds(rows):
    return rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(
                    list(range(len(rows))), pa.int64()
                ),
                "text": pa.array(rows, pa.string()),
            }
        )
    )


def test_redact_terms_counts_and_replaces(ray_session):
    from mimirsbrunn_ray.stages.text import redact_terms

    ds = _docs_ds(["the cat the dog", "no match here", None, "the"])
    out = (
        redact_terms(ds, pattern=r"\bthe\b", replacement="<X>")
        .to_pandas()
        .sort_values("doc_id", ignore_index=True)
    )
    assert out["text_redacted"].tolist()[:2] == [
        "<X> cat <X> dog",
        "no match here",
    ]
    # null text stays null with a null count (SQL regexp_replace semantics)
    assert out["text_redacted"].isna()[2]
    assert np.isnan(out["n_redacted"][2])
    assert out["n_redacted"].tolist()[:2] == [2, 0]
    assert out["text_redacted"][3] == "<X>"


def test_redact_terms_word_boundary_not_substring(ray_session):
    from mimirsbrunn_ray.stages.text import redact_terms

    ds = _docs_ds(["theory of the theme"])
    out = redact_terms(ds, pattern=r"\bthe\b").to_pandas()
    assert out["text_redacted"][0] == "theory of <REDACTED> theme"
    assert out["n_redacted"][0] == 1


def test_unigram_logprob_conservation_and_ordering(ray_session):
    """Two invariants: (1) the corpus-wide score mass equals
    sum(count * lp) over the vocabulary — nothing dropped or double
    counted; (2) a doc made of rarer words scores strictly higher than
    an equal-length doc of the most common word."""
    from mimirsbrunn_ray.stages.text import unigram_logprob_scores

    texts = ["a a a a", "a b b c", "c d a b", "a a b a"]
    ds = _docs_ds(texts)
    out = (
        unigram_logprob_scores(ds)
        .to_pandas()
        .sort_values("doc_id", ignore_index=True)
    )
    assert out["n_tokens"].tolist() == [4, 4, 4, 4]

    words = " ".join(texts).split(" ")
    vocab, counts = np.unique(words, return_counts=True)
    lp = np.floor(
        -np.log(counts / counts.sum()) * 1e6 + 0.5
    ).astype(np.int64)
    assert out["sum_neglogp_x1e6"].sum() == int((counts * lp).sum())
    # doc 0 is pure most-common-word; every other doc is strictly rarer
    assert (out["sum_neglogp_x1e6"][1:] > out["sum_neglogp_x1e6"][0]).all()


def test_unigram_logprob_null_text_omitted(ray_session):
    from mimirsbrunn_ray.stages.text import unigram_logprob_scores

    ds = _docs_ds(["x y", None, "y z"])
    out = unigram_logprob_scores(ds).to_pandas()
    assert sorted(out["doc_id"].tolist()) == [0, 2]


def test_p90_filter_is_strictly_greater(ray_session):
    """The threshold row itself (n_chars == p90) must NOT pass the filter."""
    from mimirsbrunn_ray.stages.rollup import exact_quantiles_small_domain

    tbl = pa.table(
        {
            "doc_id": pa.array(list(range(10)), pa.int64()),
            "lang": pa.array(["en"] * 10, pa.string()),
            "n_chars": pa.array(list(range(1, 11)), pa.int64()),
        }
    )
    ds = rd.from_arrow(tbl)
    qt = exact_quantiles_small_domain(
        ds, key="lang", val_fn=lambda b: b["n_chars"],
        qs=(0.9,), q_names=("p90",),
    )
    # PERCENTILE_DISC rank: smallest v with cum >= ceil(0.9 * 10) -> 9
    assert qt["p90"].to_pylist() == [9]


def test_group_standardize_zero_variance_yields_null(ray_session):
    from mimirsbrunn_ray.stages.rollup import group_standardize

    tbl = pa.table(
        {
            "event_id": pa.array([1, 2, 3, 4], pa.int64()),
            "event_type": pa.array(["a", "a", "b", "b"], pa.string()),
            "value": pa.array([5.0, 5.0, 1.0, 3.0], pa.float64()),
        }
    )
    out = (
        group_standardize(
            rd.from_arrow(tbl), key="event_type", val_col="value",
            id_cols=["event_id"],
        )
        .to_pandas()
        .sort_values("event_id", ignore_index=True)
    )
    # group a: sd == 0 -> NULL z (SQL NULLIF semantics)
    assert out["z_x100"][:2].isna().all()
    # group b: mean 2, sd 1 -> z = -100, +100
    assert out["z_x100"][2:].tolist() == [-100.0, 100.0]


def test_session_funnel_strictly_after_semantics(ray_session):
    """purchase at the SAME ts as the first click, or before it, does not
    convert; a later purchase in the same session does."""
    import pandas as pd
    from mimirsbrunn_ray.stages.window import session_funnel

    t0 = pd.Timestamp("2026-01-01 00:00:00")
    m = pd.Timedelta(minutes=1)
    rows = [
        # user 1, one session: click then purchase -> converts
        (1, t0, "click"), (1, t0 + m, "purchase"),
        # user 2, one session: purchase at the same ts as click -> no
        (2, t0, "click"), (2, t0, "purchase"),
        # user 3, one session: purchase BEFORE the click -> no
        (3, t0, "purchase"), (3, t0 + m, "click"),
        # user 4: click, then a >30min gap, purchase in a NEW session -> no
        (4, t0, "click"), (4, t0 + pd.Timedelta(minutes=45), "purchase"),
    ]
    tbl = pa.table(
        {
            "user_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "event_type": pa.array([r[2] for r in rows], pa.string()),
        }
    )
    out = (
        session_funnel(rd.from_arrow(tbl))
        .to_pandas()
        .sort_values("user_id", ignore_index=True)
    )
    assert out["n_sessions"].tolist() == [1, 1, 1, 2]
    assert out["n_click_sessions"].tolist() == [1, 1, 1, 1]
    assert out["n_converted"].tolist() == [1, 0, 0, 0]


def test_interval_union_touch_contain_overlap(ray_session):
    """Touching intervals merge; contained intervals fold in; disjoint
    ones stay separate — covered time is exact integer microseconds."""
    import pandas as pd
    from mimirsbrunn_ray.stages.window import interval_union

    t0 = pd.Timestamp("2026-01-01")
    m = pd.Timedelta(minutes=1)
    rows = [
        # user 1: [0,10) + [10,20) touch -> one island of 20m
        (1, t0, t0 + 10 * m), (1, t0 + 10 * m, t0 + 20 * m),
        # user 2: [0,10) contains [2,5); plus disjoint [30,31)
        (2, t0, t0 + 10 * m), (2, t0 + 2 * m, t0 + 5 * m),
        (2, t0 + 30 * m, t0 + 31 * m),
        # user 3: exact duplicate intervals -> one island
        (3, t0, t0 + m), (3, t0, t0 + m),
    ]
    tbl = pa.table(
        {
            "u": pa.array([r[0] for r in rows], pa.int64()),
            "s": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "e": pa.array([r[2] for r in rows], pa.timestamp("us")),
        }
    )
    out = (
        interval_union(rd.from_arrow(tbl), key="u", s_col="s", e_col="e")
        .to_pandas()
        .sort_values("u", ignore_index=True)
    )
    assert out["n_intervals"].tolist() == [1, 2, 1]
    assert out["covered_us"].tolist() == [
        20 * 60_000_000, 11 * 60_000_000, 60_000_000,
    ]


def test_cross_group_overlap_exact_and_typed_empty(ray_session):
    import pyarrow as pa

    from mimirsbrunn_ray.stages.dedup import cross_group_duplicate_overlap

    tbl = pa.table(
        {
            "text": pa.array(
                ["dup one", "dup one", "dup one", "solo", "dup two",
                 "dup two", None],
                pa.string(),
            ),
            "source": pa.array(
                ["s1", "s2", "s3", "s1", "s2", "s3", "s1"], pa.string()
            ),
        }
    )
    out = cross_group_duplicate_overlap(rd.from_arrow(tbl)).to_pandas()
    got = {
        (r.source_a, r.source_b): r.n_shared for r in out.itertuples()
    }
    assert got == {("s1", "s2"): 1, ("s1", "s3"): 1, ("s2", "s3"): 2}

    # no cross-group duplicates -> typed empty table, schema intact
    solo = pa.table(
        {
            "text": pa.array(["a", "b"], pa.string()),
            "source": pa.array(["s1", "s2"], pa.string()),
        }
    )
    empty = cross_group_duplicate_overlap(rd.from_arrow(solo))
    assert empty.num_rows == 0
    assert empty.schema.names == ["source_a", "source_b", "n_shared"]


def test_profile_columns_families_and_empty(ray_session):
    import pyarrow as pa

    from mimirsbrunn_ray.stages.profile import profile_columns

    tbl = pa.table(
        {
            "i": pa.array([3, None, 1], pa.int64()),
            "s": pa.array(["b", "a", None], pa.string()),
            "f": pa.array([1.5, 2.5, None], pa.float64()),
        }
    )
    out = profile_columns(rd.from_arrow(tbl), ["i", "s", "f"]).to_pandas()
    out = out.set_index("column")
    assert out.loc["i", "n_rows"] == 3 and out.loc["i", "n_null"] == 1
    assert out.loc["i", "min_int"] == 1 and out.loc["i", "max_int"] == 3
    assert out.loc["s", "min_str"] == "a" and out.loc["s", "max_str"] == "b"
    # float family: counts only
    assert out.loc["f", "n_null"] == 1
    assert pd_isna(out.loc["f", "min_int"]) and pd_isna(out.loc["f", "min_str"])

    # empty input: typed table, one all-zero row per column
    empty = profile_columns(
        rd.from_arrow(tbl.slice(0, 0)), ["i", "s"]
    ).to_pandas()
    assert list(empty["column"]) == ["i", "s"]
    assert (empty["n_rows"] == 0).all()


def pd_isna(x):
    import pandas as pd

    return pd.isna(x)


def test_budget_prefix_boundary_ties(ray_session):
    """Boundary bin resolves by ascending id; the first non-fitting row
    at the boundary weight is excluded exactly."""
    import pyarrow as pa

    from mimirsbrunn_ray.stages.ordered import budget_prefix_select

    tbl = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4, 5, 6], pa.int64()),
            "w": pa.array([10, 10, 5, 20, 10, 30], pa.int64()),
        }
    )
    # sorted (w, id): (5,3) (10,1) (10,2) (10,5) (20,4) (30,6)
    # budget 27 -> 5 fits (5), bin 10: residual 22 -> ids 1, 2 fit (25)
    out = (
        budget_prefix_select(
            rd.from_arrow(tbl), weight_col="w", id_col="doc_id", budget=27
        )
        .to_pandas()
        .sort_values("doc_id", ignore_index=True)
    )
    assert out["doc_id"].tolist() == [1, 2, 3]
    # budget below the smallest weight -> nothing selected
    none = budget_prefix_select(
        rd.from_arrow(tbl), weight_col="w", id_col="doc_id", budget=4
    ).to_pandas()
    assert len(none) == 0


def test_continuous_quantile_ignores_nan_and_null(ray_session):
    """Review regression: NaN values must be excluded from BOTH the
    pass-1 total and the pass-2 histogram, or the rank walk runs off
    the end (q=0.99 formerly raised IndexError)."""
    import pyarrow as pa

    from mimirsbrunn_ray.stages.rollup import exact_continuous_quantile

    tbl = pa.table(
        {"v": pa.array([1.0, 2.0, float("nan"), 5.0, None], pa.float64())}
    )
    out = exact_continuous_quantile(
        rd.from_arrow(tbl), val_fn=lambda b: b["v"], qs=(0.5, 0.99)
    )
    assert out == [2.0, 5.0]


def test_continuous_quantile_adversarial_one_bin(ray_session):
    """Recursive bin refinement (VERDICT r3 item 4): a distribution whose
    mass concentrates in ONE coarse bin (heavy ties + a huge outlier that
    stretches the histogram range) must still resolve exactly with a
    bounded driver pull — forced here with bin_row_budget smaller than
    the dense bin."""
    import pyarrow as pa

    from mimirsbrunn_ray.stages.rollup import exact_continuous_quantile

    # 2000 values in [0, 1) plus one at 1e12: coarse bin 0 holds 2000 rows
    rng = np.random.default_rng(5)
    vals = np.concatenate([rng.random(2000), [1e12]])
    tbl = pa.table({"v": pa.array(vals, pa.float64())})
    qs = (0.1, 0.5, 0.9)
    got = exact_continuous_quantile(
        rd.from_arrow(tbl), val_fn=lambda b: b["v"], qs=qs,
        bin_row_budget=50,
    )
    s = np.sort(vals)
    want = [float(s[int(np.ceil(q * len(vals) - 1e-9)) - 1]) for q in qs]
    assert got == want
    # constant column: refinement's min==max short-circuit
    const = pa.table({"v": pa.array([7.0] * 1000, pa.float64())})
    got_c = exact_continuous_quantile(
        rd.from_arrow(const), val_fn=lambda b: b["v"], qs=(0.5,),
        bin_row_budget=10,
    )
    assert got_c == [7.0]


def test_budget_prefix_adversarial_one_bin(ray_session):
    """Constant weight column = the whole corpus in one histogram bin:
    the boundary resolves via the distributed sort+limit path (forced
    with boundary_row_budget=0), byte-identical to the driver path."""
    import pyarrow as pa

    from mimirsbrunn_ray.stages.ordered import budget_prefix_select

    n = 500
    tbl = pa.table(
        {
            "doc_id": pa.array(np.arange(n)[::-1].copy(), pa.int64()),
            "w": pa.array([3] * n, pa.int64()),
        }
    )
    # budget 100 -> 33 rows of weight 3, smallest ids first (0..32)
    for budget_rows in (10**9, 0):
        out = (
            budget_prefix_select(
                rd.from_arrow(tbl), weight_col="w", id_col="doc_id",
                budget=100, boundary_row_budget=budget_rows,
            )
            .to_pandas()
            .sort_values("doc_id", ignore_index=True)
        )
        assert out["doc_id"].tolist() == list(range(33)), budget_rows


def test_weighted_sample_exact_and_proportional(ray_session):
    """A-ExpJ weighted sample: (1) the distributed selection equals the
    brute-force recomputation of the same seeded keys; (2) inclusion
    frequency across seeds tracks weight (heavy item ~w ratio more often);
    (3) determinism across block layouts."""
    import pyarrow as pa

    from mimirsbrunn_ray.stages.dedup import _hash64
    from mimirsbrunn_ray.stages.text import weighted_sample

    n = 400
    rng = np.random.default_rng(3)
    ids = np.arange(n, dtype=np.int64)
    w = rng.integers(1, 100, n).astype(np.int64)
    w[7] = 5000  # heavy item
    tbl = pa.table({"doc_id": pa.array(ids), "n_chars": pa.array(w)})

    def brute(seed, k):
        mix = np.uint64(0x9E3779B97F4A7C15) * np.uint64(2 * seed + 1)
        h = _hash64(pa.chunked_array([tbl["doc_id"]])) * mix
        h ^= h >> np.uint64(33)
        u = ((h >> np.uint64(11)).astype(np.float64) + 1.0) / float(1 << 53)
        key = np.log(u) / w
        order = np.lexsort((ids, -key))
        return set(ids[order[:k]].tolist())

    for blocks in (1, 7):
        ds = rd.from_arrow(tbl).repartition(blocks)
        got = weighted_sample(
            ds, k=25, weight_col="n_chars", id_col="doc_id", seed=11
        ).to_pandas()
        assert set(got["doc_id"]) == brute(11, 25), blocks
        assert len(got) == 25 and got["doc_id"].is_unique

    # proportional inclusion: the 5000-weight item appears in nearly every
    # seed's sample; a weight-1 item almost never (k/n base rate ~6%)
    light = int(np.flatnonzero(w == w.min())[0])
    ds = rd.from_arrow(tbl)
    heavy_hits = light_hits = 0
    for seed in range(30):
        s = set(
            weighted_sample(
                ds, k=25, weight_col="n_chars", id_col="doc_id", seed=seed
            ).to_pandas()["doc_id"]
        )
        heavy_hits += 7 in s
        light_hits += light in s
    assert heavy_hits >= 28
    assert light_hits <= 5
