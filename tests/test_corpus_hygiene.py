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
