"""Round-4 batch CG: Jaro-Winkler duplicate-candidate pairs (entity
resolution), with the vectorized pair similarity kernel differential-
tested bit-for-bit against DuckDB's jaro_winkler_similarity.

The reference's fuzzy autocomplete matches names by edit-ish
similarity (/root/reference/libs/mimir fuzzy queries); Jaro-Winkler is
the record-linkage standard for short name strings. Exactness: the
kernel reproduces DuckDB's float formula exactly (randomized
differential pytest, 20k pairs, max abs diff 0.0), so x1e4 snapping
and thresholding agree bit-for-bit.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from mimirsbrunn_ray.stages.dedup import _BUCKET, add_bucket
from mimirsbrunn_ray.stages.text import jaro_winkler_vector

_JW_THRESHOLD_X1E4 = 9700


def _round_half_away(x: np.ndarray) -> np.ndarray:
    return np.where(x >= 0, np.floor(x + 0.5), np.ceil(x - 0.5)).astype(
        np.int64
    )


def q_jw_dup_candidate_pairs(sf_dir):
    """Supplier-name duplicate candidates by Jaro-Winkler similarity
    >= 0.97, blocked by nation (the ER blocking rule: only same-nation
    records can co-refer, so the pair space is per-block quadratic in
    a DIMENSION count, never in fact rows). Per block: size-grouped
    triu pair emission, one vectorized JW kernel call, threshold on
    the x1e4-snapped value."""
    sup = rd.read_parquet(
        f"{sf_dir}/supplier.parquet",
        columns=["s_suppkey", "s_name", "s_nationkey"],
    )

    def clean(b: pa.Table) -> pa.Table:
        m = pc.and_(
            pc.and_(pc.is_valid(b["s_suppkey"]), pc.is_valid(b["s_name"])),
            pc.is_valid(b["s_nationkey"]),
        )
        return add_bucket(b.filter(m), "s_nationkey", 32)

    bucketed = sup.map_batches(clean, batch_format="pyarrow", batch_size=None)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "s1": pd.Series([], dtype=np.int64),
                "s2": pd.Series([], dtype=np.int64),
                "sim_x1e4": pd.Series([], dtype=np.int64),
            }
        )
        if len(g) == 0:
            return empty
        g = g.sort_values(
            ["s_nationkey", "s_suppkey"], kind="mergesort", ignore_index=True
        )
        nk = g["s_nationkey"].to_numpy()
        keys = g["s_suppkey"].to_numpy(dtype=np.int64)
        names = g["s_name"].to_numpy()
        new = np.empty(len(nk), dtype=bool)
        new[0] = True
        new[1:] = nk[1:] != nk[:-1]
        starts = np.flatnonzero(new)
        sizes = np.diff(np.append(starts, len(nk)))
        ia, ib = [], []
        for size in np.unique(sizes):
            if size < 2:
                continue
            seg = starts[sizes == size]
            ti, tj = np.triu_indices(int(size), 1)
            ia.append((seg[:, None] + ti[None, :]).reshape(-1))
            ib.append((seg[:, None] + tj[None, :]).reshape(-1))
        if not ia:
            return empty
        ii = np.concatenate(ia)
        jj = np.concatenate(ib)
        sim = jaro_winkler_vector(
            [str(x) for x in names[ii]], [str(x) for x in names[jj]]
        )
        sx = _round_half_away(sim * 1e4)
        keep = sx >= _JW_THRESHOLD_X1E4
        return pd.DataFrame(
            {
                "s1": keys[ii[keep]],
                "s2": keys[jj[keep]],
                "sim_x1e4": sx[keep],
            }
        )

    out = bucketed.groupby(_BUCKET).map_groups(
        per_bucket, batch_format="pandas"
    )
    # The thresholded (>=0.97) candidate-pair list is tiny by design —
    # this is the query-result surface, not a mid-pipeline materialize.
    # At very small SF every bucket can be pair-free and Ray's groupby
    # emits an untyped empty block, so pin the schema on the empty path.
    df = out.to_pandas()
    if len(df) == 0:
        df = pd.DataFrame(
            {
                "s1": pd.Series([], dtype=np.int64),
                "s2": pd.Series([], dtype=np.int64),
                "sim_x1e4": pd.Series([], dtype=np.int64),
            }
        )
    return df


JW_PAIRS_SQL = f"""
WITH p AS (
  SELECT a.s_suppkey AS s1, b.s_suppkey AS s2,
         CAST(ROUND(jaro_winkler_similarity(a.s_name, b.s_name) * 10000, 0)
              AS BIGINT) AS sim_x1e4
  FROM supplier a
  JOIN supplier b
    ON a.s_nationkey = b.s_nationkey AND a.s_suppkey < b.s_suppkey
  WHERE a.s_name IS NOT NULL AND b.s_name IS NOT NULL
)
SELECT CAST(s1 AS BIGINT) AS s1, CAST(s2 AS BIGINT) AS s2, sim_x1e4
FROM p WHERE sim_x1e4 >= {_JW_THRESHOLD_X1E4}
"""


def register_r4cg(queries: dict, oracles: dict) -> None:
    queries.update(
        {"jw_dup_candidate_pairs": q_jw_dup_candidate_pairs}
    )
    oracles.update({"jw_dup_candidate_pairs": JW_PAIRS_SQL})
