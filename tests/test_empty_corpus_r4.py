"""Empty-corpus probes for the round-4 event-series queries: a
zero-row events.parquet with the right schema must yield a TYPED empty
(or well-formed constant) result — never a schema-less empty Dataset
(which fails the driver's schema compare) and never a crash in the
early-return paths."""

import numpy as np
import pandas as pd
import pytest


@pytest.fixture(scope="module")
def empty_sf(tmp_path_factory):
    d = tmp_path_factory.mktemp("empty_sf")
    ev = pd.DataFrame(
        {
            "event_id": pd.Series([], dtype=np.int64),
            "ts": pd.Series([], dtype="datetime64[us]"),
            "user_id": pd.Series([], dtype=np.int64),
            "event_type": pd.Series([], dtype=object),
            "value": pd.Series([], dtype=np.float64),
            "props": pd.Series([], dtype=object),
        }
    )
    ev.to_parquet(d / "events.parquet", index=False)
    docs = pd.DataFrame(
        {
            "doc_id": pd.Series([], dtype=object),
            "text": pd.Series([], dtype=object),
            "lang": pd.Series([], dtype=object),
            "source": pd.Series([], dtype=object),
            "n_chars": pd.Series([], dtype=np.int64),
        }
    )
    docs.to_parquet(d / "documents.parquet", index=False)
    return str(d)


_EVENT_QUERIES = [
    "rolling_median_value",
    "log2_histogram_value",
    "value_band_pairs",
    "alert_transitions",
    "late_events_watermark",
    "psi_value_drift",
    "theilsen_trend_per_type",
    "value_run_lengths",
    "rate_limit_rejections",
    "tukey_outliers_hourly",
    "event_type_markov",
    "monotone_streaks",
    "dominant_period",
    "benford_first_digit",
    "kmeans_1d_value",
    "irate_last_two",
    "trimmed_value_sums",
    "xcorr_click_error",
    "tier_parity_1h",
    "max_drawdown_per_type",
    "mean_crossings_per_type",
    "type_cooccurrence_daily",
    "ordinal_patterns_per_type",
    "downsample_error_1m",
    "fano_factor_1m",
    "weekday_weekend_contrast",
    "active_day_streaks",
    "value_ranks_events",
    "new_users_hourly",
    "peak_minutes_per_type",
    "type_user_jaccard",
    "value_entropy_per_type",
    "mad_interarrival_per_type",
    "burst_hours_per_type",
    "time_to_first_error",
    "new_prop_values_daily",
    "user_cumulative_adoption",
    "mase_stats_per_type",
    "user_concentration_top10",
    "hourweek_error_rates",
    "session_size_hist",
    "conversion_within_1h",
    "id_ts_inversions",
    "cohort_d1_d7_retention",
    "equidepth_boundaries_per_type",
    "session_entry_exit_matrix",
    "hod_variance_stats",
    "top_user_type_pairs",
    "type_switches_per_user",
    "single_mode_users",
    "markov_removal_attribution",
    "first_session_conversion_lift",
    "channel_position_bias",
]

_DOC_QUERIES = [
    "lexical_stats_per_source",
    "lang_id_docs",
    "oov_counts_docs",
    "shared_trigram_coverage",
    "dedup_cluster_sizes",
    "char_class_profile",
    "dup_share_per_source",
    "word_bigram_top_per_source",
    "doc_len_quantiles_per_lang",
    "langid_confusion",
    "email_url_mentions",
    "small_group_docs",
    "dominant_lang_per_source",
    "blocking_key_stats",
    "doc_vocab_stats",
]


# Platform note: a FULLY-empty input file short-circuits Ray's read, so
# map UDFs (and their typed-empty guards) never run and most pipelines
# yield a zero-column empty — acceptable (the driver never feeds empty
# corpora; the guarded case is filtered-to-empty on non-empty input,
# covered by the per-stage typed-empty frames). The contract this test
# enforces is: NO crash, zero rows. Queries with driver-side result
# assembly must additionally keep their schema.
_TYPED_ON_EMPTY = {"late_events_watermark", "psi_value_drift",
                   "kmeans_1d_value", "weekday_weekend_contrast",
                   "type_user_jaccard", "burst_hours_per_type"}

# Queries whose SQL-correct answer on an empty corpus is a fixed number of
# constant rows (e.g. one row per lag with score 0), not zero rows.
_CONST_ROWS_ON_EMPTY = {"xcorr_click_error": 7,
                        "user_concentration_top10": 1,
                        "conversion_within_1h": 1,
                        "blocking_key_stats": 1,
                        # global SUM with no GROUP BY -> one (NULL-ish) row
                        "first_session_conversion_lift": 1}


@pytest.mark.parametrize("name", _EVENT_QUERIES + _DOC_QUERIES)
def test_empty_corpus_returns_typed_empty(ray_session, empty_sf, name):
    from mimirsbrunn_ray.pipelines.queries import QUERIES

    res = QUERIES[name](empty_sf)
    df = res if isinstance(res, pd.DataFrame) else (
        res.to_pandas() if hasattr(res, "to_pandas") else pd.DataFrame(res)
    )
    assert len(df) == _CONST_ROWS_ON_EMPTY.get(name, 0)
    if name in _TYPED_ON_EMPTY or name in _CONST_ROWS_ON_EMPTY:
        assert len(df.columns) > 0, f"{name}: schema lost on empty input"
