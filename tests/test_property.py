"""Property-based tests (hypothesis): codec round-trips over arbitrary
inputs, bucket-math laws, gap-fill invariants, classifier first-match law."""

import numpy as np
import pandas as pd
from hypothesis import given, settings

settings.register_profile("ci", derandomize=True, deadline=None)
settings.load_profile("ci")
from hypothesis import strategies as st

from mimirsbrunn_ray.functions.codecs import (
    decode_dod,
    decode_gorilla,
    encode_dod,
    encode_gorilla,
)
from mimirsbrunn_ray.functions.timeutil import BUCKET_US, trunc_us

I64 = st.integers(min_value=-(2**62), max_value=2**62)


@settings(max_examples=200, deadline=None)
@given(st.lists(I64, max_size=200))
def test_dod_roundtrip_any_int64(xs):
    ts = np.asarray(xs, dtype=np.int64)
    assert np.array_equal(decode_dod(encode_dod(ts)), ts)


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.floats(allow_nan=True, allow_infinity=True, width=64), max_size=200
    )
)
def test_gorilla_roundtrip_any_float64(xs):
    vals = np.asarray(xs, dtype=np.float64)
    out = decode_gorilla(encode_gorilla(vals))
    assert np.array_equal(out.view(np.uint64), vals.view(np.uint64))


@settings(max_examples=200, deadline=None)
@given(st.integers(min_value=0, max_value=2**62), st.sampled_from(["1m", "1h", "1d"]))
def test_trunc_is_idempotent_and_aligned(ts, gran):
    t = np.array([ts], dtype=np.int64)
    b = trunc_us(t, gran)
    assert (b % BUCKET_US[gran] == 0).all()
    assert np.array_equal(trunc_us(b, gran), b)  # idempotent
    assert (b <= t).all() and (t - b < BUCKET_US[gran]).all()


@settings(max_examples=50, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 500), st.integers(0, 10_000)),
        min_size=1, max_size=60, unique_by=lambda t: t[0],
    ),
    st.sampled_from(["locf", "linear"]),
)
def test_gapfill_invariants(points, policy):
    """Filled output: dense bucket grid, original rows unchanged, filled
    rows flagged with n_rows == 0."""
    from mimirsbrunn_ray.functions.timeutil import US_PER_MINUTE
    from mimirsbrunn_ray.stages.gapfill import _fill_series

    points = sorted(points)
    buckets = np.array([p[0] for p in points], dtype=np.int64) * US_PER_MINUTE
    vals = np.array([p[1] for p in points], dtype=np.int64)
    g = pd.DataFrame(
        {
            "source": "s",
            "bucket": pd.to_datetime(buckets, unit="us"),
            "n_rows": np.ones(len(points), dtype=np.int64),
            "sum_tok": vals,
            "min_tok": vals.astype(np.int32),
            "max_tok": vals.astype(np.int32),
            "mean_tok": vals.astype(np.float64),
            "filled": False,
            "fill_kind": "none",
        }
    )
    out = _fill_series(g.copy(), US_PER_MINUTE, policy)
    b_us = out["bucket"].astype("datetime64[us]").astype(np.int64).to_numpy()
    assert np.array_equal(np.diff(b_us), np.full(len(out) - 1, US_PER_MINUTE))
    orig = out[~out["filled"]]
    assert len(orig) == len(g)
    assert np.array_equal(np.sort(orig["sum_tok"].to_numpy()), np.sort(vals))
    assert (out[out["filled"]]["n_rows"] == 0).all()
    if policy == "locf" and out["filled"].any():
        # every filled value equals the nearest preceding real value
        merged = out.reset_index(drop=True)
        last = None
        for _, row in merged.iterrows():
            if not row["filled"]:
                last = row["sum_tok"]
            else:
                assert row["sum_tok"] == last


@settings(max_examples=100, deadline=None)
@given(st.text(max_size=80), st.text(max_size=80))
def test_jaccard_bounds_and_symmetry(a, b):
    from mimirsbrunn_ray.stages.neardup import jaccard

    j = jaccard(a, b)
    assert 0.0 <= j <= 1.0
    assert j == jaccard(b, a)
    assert jaccard(a, a) == 1.0


@settings(max_examples=40, deadline=None)
@given(
    w=st.integers(1, 40),
    h=st.integers(1, 40),
    seed=st.integers(0, 2**31 - 1),
)
def test_bmp_roundtrip_any_shape(w, h, seed):
    """24-bit BMP encode/decode is byte-exact for any geometry (row
    padding, 1-pixel edges included)."""
    from mimirsbrunn_ray.stages.multimodal import decode_bmp, encode_bmp

    img = np.random.default_rng(seed).integers(
        0, 256, size=(h, w, 3), dtype=np.uint8
    )
    assert np.array_equal(decode_bmp(encode_bmp(img)), img)


@settings(max_examples=40, deadline=None)
@given(
    n=st.integers(0, 2000),
    rate=st.sampled_from([8000, 16000, 44100]),
    seed=st.integers(0, 2**31 - 1),
)
def test_wav_roundtrip_any_length(n, rate, seed):
    from mimirsbrunn_ray.stages.multimodal import decode_wav, encode_wav

    samples = np.random.default_rng(seed).integers(
        -32768, 32768, size=n, dtype=np.int16
    )
    got_rate, back = decode_wav(encode_wav(samples, rate=rate))
    assert got_rate == rate
    assert np.array_equal(back, samples)


@settings(max_examples=30, deadline=None)
@given(
    texts=st.lists(
        st.text(
            alphabet=st.sampled_from("ab 东\t"), min_size=0, max_size=30
        ),
        min_size=0,
        max_size=12,
    )
)
def test_word_ngram_hashes_match_python_reference(texts):
    """The vectorized word-3-gram kernel produces exactly the gram
    multiset a naive Python implementation does (as hashed sets)."""
    import pyarrow as pa

    from mimirsbrunn_ray.stages.simjoin import word_ngram_hashes

    g, d = word_ngram_hashes(pa.array(texts, pa.string()))
    got_counts = {i: 0 for i in range(len(texts))}
    for di in d:
        got_counts[int(di)] += 1
    for i, t in enumerate(texts):
        ws = t.lower().split(" ")
        want = max(len(ws) - 2, 0) if len(ws) >= 3 else 0
        assert got_counts[i] == want, (i, t, got_counts[i], want)
    # identical texts at different positions -> identical gram hash sets
    if len(texts) >= 2 and texts[0] == texts[1]:
        s0 = {int(x) for x, di in zip(g, d) if di == 0}
        s1 = {int(x) for x, di in zip(g, d) if di == 1}
        assert s0 == s1
