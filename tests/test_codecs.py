"""Round-trip exactness of the DoD / Gorilla codecs (FIXTURES.md assertion 4)."""

import numpy as np
import pytest

from mimirsbrunn_ray.functions.codecs import (
    decode_dod,
    decode_gorilla,
    encode_dod,
    encode_gorilla,
)


@pytest.mark.parametrize("n", [0, 1, 2, 3, 100, 1440])
def test_dod_roundtrip_regular(n):
    ts = np.arange(n, dtype=np.int64) * 60_000_000 + 1_767_225_600_000_000
    assert np.array_equal(decode_dod(encode_dod(ts)), ts)


def test_dod_roundtrip_irregular():
    rng = np.random.default_rng(7)
    deltas = rng.choice([60, 61, 59, 120, 7, 100_000, 1, 10**9], size=999)
    ts = np.concatenate([[123456789], 123456789 + np.cumsum(deltas)]).astype(np.int64)
    assert np.array_equal(decode_dod(encode_dod(ts)), ts)


def test_dod_negative_and_decreasing():
    ts = np.array([-50, -10, -10, 40, 20, 10**12, -(10**12)], dtype=np.int64)
    assert np.array_equal(decode_dod(encode_dod(ts)), ts)


def test_dod_compression_ratio():
    ts = np.arange(1440, dtype=np.int64) * 60_000_000
    assert len(encode_dod(ts)) < 1440  # far below 8 B/point on regular data


@pytest.mark.parametrize("n", [0, 1, 2, 500])
def test_gorilla_roundtrip(n):
    rng = np.random.default_rng(n)
    vals = np.round(np.cumsum(rng.normal(0, 3, n)) + 5000.0, 2)
    out = decode_gorilla(encode_gorilla(vals))
    assert np.array_equal(out.view(np.uint64), vals.view(np.uint64))


def test_gorilla_special_values():
    vals = np.array([0.0, -0.0, 1.5, 1.5, np.inf, -np.inf, 3.0, np.nan, 3.0])
    out = decode_gorilla(encode_gorilla(vals))
    assert np.array_equal(out.view(np.uint64), vals.view(np.uint64))  # nan-safe


def test_gorilla_constant_stream_is_tiny():
    vals = np.full(1000, 42.0)
    assert len(encode_gorilla(vals)) < 150  # 1 bit/point after the first
