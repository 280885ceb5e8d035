"""Differential tests for the vectorized Jaro-Winkler kernel against
DuckDB's jaro_winkler_similarity — the kernel must agree bit-for-bit
(not just after rounding), since the ER query thresholds on the
x1e4-snapped value."""

import random

import duckdb
import numpy as np
import pytest

from mimirsbrunn_ray.stages.text import jaro_winkler_vector


def _duck(pairs):
    con = duckdb.connect()
    con.execute("CREATE TABLE t(i INT, a VARCHAR, b VARCHAR)")
    con.executemany(
        "INSERT INTO t VALUES (?,?,?)",
        [(i, a, b) for i, (a, b) in enumerate(pairs)],
    )
    return (
        con.execute(
            "SELECT jaro_winkler_similarity(a,b) FROM t ORDER BY i"
        )
        .df()
        .iloc[:, 0]
        .to_numpy()
    )


def test_known_values():
    out = jaro_winkler_vector(
        ["martha", "abcxyz", "aXXXXX", "abc", "abcdef"],
        ["marhta", "bcaxyz", "aYYYYY", "abc", "badcfe"],
    )
    # martha/marhta: the canonical Winkler example
    assert abs(out[0] - 0.9611111111111111) < 1e-15
    # odd half-transposition count floors (t = 1, not 1.5)
    assert abs(out[1] - 0.9444444444444444) < 1e-14 * 10
    # below the 0.7 boost threshold the prefix bonus must NOT apply
    assert abs(out[2] - 0.4444444444444444) < 1e-15
    assert out[3] == 1.0


def test_randomized_differential_vs_duckdb():
    rng = random.Random(1234)
    pairs = []
    for _ in range(5000):
        l1 = rng.randint(0, 12)
        l2 = rng.randint(0, 12)
        a = "".join(rng.choice("abcdxy") for _ in range(l1))
        b = "".join(rng.choice("abcdxy") for _ in range(l2))
        pairs.append((a, b))
    mine = jaro_winkler_vector([p[0] for p in pairs], [p[1] for p in pairs])
    ref = _duck(pairs)
    assert float(np.abs(mine - ref).max()) == 0.0


def test_adversarial_shapes():
    pairs = [
        ("", ""),
        ("", "abc"),
        ("abc", ""),
        ("a", "a"),
        ("aaaa", "aaaa"),
        ("aabb", "abab"),
        ("Supplier#000000001", "Supplier#000000010"),
        ("Supplier#000000001", "Supplier#000000001"),
    ]
    mine = jaro_winkler_vector([p[0] for p in pairs], [p[1] for p in pairs])
    ref = _duck(pairs)
    assert float(np.abs(mine - ref).max()) == 0.0
