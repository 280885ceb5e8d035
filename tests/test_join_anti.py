"""bloom_anti_join (stages/join.py) vs a DuckDB NOT EXISTS, including the
null-key semantics no registry query exercises: NULL left keys never
equality-match, so NOT EXISTS keeps them; NULL right keys match nothing."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


@pytest.mark.parametrize("seed", [7, 99])
def test_bloom_anti_join_matches_not_exists(ray_session, seed):
    import ray.data as rd

    from mimirsbrunn_ray.stages.join import bloom_anti_join

    rng = np.random.default_rng(seed)
    n_left, n_right = 5000, 3000
    lk = rng.integers(0, 2000, n_left).astype("float64")
    lk[rng.random(n_left) < 0.02] = np.nan  # ~2% null left keys
    rk = rng.integers(1500, 3500, n_right).astype("float64")
    rk[rng.random(n_right) < 0.02] = np.nan

    left = pa.table(
        {
            "k": pa.array(pd.array(lk).astype("Int64")),
            "payload": pa.array(np.arange(n_left, dtype=np.int64)),
        }
    )
    right = pa.table({"rk": pa.array(pd.array(rk).astype("Int64"))})

    out = (
        bloom_anti_join(
            rd.from_arrow(left).repartition(6),
            rd.from_arrow(right).repartition(6),
            "k",
            "rk",
            n_bits=1 << 12,  # tiny bloom: force plenty of maybe-survivors
        )
        .to_pandas()
        .sort_values("payload", ignore_index=True)
    )

    con = duckdb.connect()
    con.register("l", left.to_pandas())
    con.register("r", right.to_pandas())
    exp = con.sql(
        """
        SELECT k, payload FROM l
        WHERE NOT EXISTS (SELECT 1 FROM r WHERE r.rk = l.k)
        ORDER BY payload
        """
    ).df()

    assert len(out) == len(exp)
    assert out["payload"].tolist() == exp["payload"].tolist()
    # null left keys are all kept
    n_null = int(pd.isna(pd.array(lk)).sum())
    assert int(out["k"].isna().sum()) == n_null
