"""Mergeable sketches: HyperLogLog approximate distinct counting.

The reference has no approximate aggregates (SURVEY.md §2.6); at
10^12-sequence scale exact distinct counts of token values per source would
shuffle terabytes, while an HLL sketch is a fixed 2^p bytes per group and
MERGES BY ELEMENTWISE MAX — the ideal partial+tree-merge aggregate (the
sketch pattern from the Ray guide). Algorithm: Flajolet, Fusy, Gandouet,
Meunier, "HyperLogLog: the analysis of a near-optimal cardinality
estimation algorithm" (AofA 2007), with the standard small-range linear
counting correction.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from mimirsbrunn_ray.sources.synth import _splitmix64


def hll_new(p: int = 12) -> np.ndarray:
    return np.zeros(1 << p, dtype=np.uint8)


def hll_add_hashes(registers: np.ndarray, hashes: np.ndarray) -> None:
    """Vectorized register update from 64-bit hashes."""
    p = int(np.log2(len(registers)))
    idx = (hashes >> np.uint64(64 - p)).astype(np.int64)
    rest = hashes << np.uint64(p)  # top bits consumed by the index
    # rank = leading zeros of the remaining 64-p bits + 1
    lz = np.full(len(hashes), 64 - p, dtype=np.uint8)
    mask = rest != 0
    if mask.any():
        r = rest[mask]
        # bit_length via float log2 is unsafe near 2^53; use a loop-free
        # approach: 64 - floor(log2(r)) computed with successive shifts
        nbits = np.zeros(len(r), dtype=np.uint8)
        v = r.copy()
        for shift in (32, 16, 8, 4, 2, 1):
            has = v >= (np.uint64(1) << np.uint64(shift))
            nbits[has] += shift
            v[has] >>= np.uint64(shift)
        lz[mask] = (63 - nbits).astype(np.uint8)
    rank = np.minimum(lz + 1, 64 - p + 1).astype(np.uint8)
    np.maximum.at(registers, idx, rank)


def hll_merge(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    return np.maximum(a, b)


def hll_estimate(registers: np.ndarray) -> float:
    m = len(registers)
    alpha = 0.7213 / (1 + 1.079 / m)
    est = alpha * m * m / np.sum(2.0 ** (-registers.astype(np.float64)))
    zeros = int((registers == 0).sum())
    if est <= 2.5 * m and zeros:
        est = m * np.log(m / zeros)  # linear counting for small ranges
    return float(est)


def approx_distinct_per_key(
    ds: "rd.Dataset",
    key_col: str,
    values_fn,
    p: int = 12,
) -> pd.DataFrame:
    """Approximate distinct count of values per key.

    ``values_fn(batch) -> (keys_per_value, uint64 value hashes)`` adapts an
    arbitrary column (scalar or list-typed) to the sketch. One sketch row
    per key per batch; tree-merged by elementwise max; estimated at the end.
    Output: (key, approx_distinct: int64).
    """
    from mimirsbrunn_ray.stages.rollup import tree_merge

    def partial(batch: pa.Table) -> pa.Table:
        keys, hashes = values_fn(batch)
        out_keys, out_regs = [], []
        order = np.argsort(keys, kind="stable")
        keys_s, hashes_s = keys[order], hashes[order]
        bounds = np.flatnonzero(
            np.concatenate([[True], keys_s[1:] != keys_s[:-1]])
        )
        for i, start in enumerate(bounds):
            end = bounds[i + 1] if i + 1 < len(bounds) else len(keys_s)
            regs = hll_new(p)
            hll_add_hashes(regs, hashes_s[start:end])
            out_keys.append(keys_s[start])
            out_regs.append(regs.tobytes())
        return pa.table(
            {
                key_col: pa.array(out_keys, type=pa.string()),
                "hll": pa.array(out_regs, type=pa.binary()),
            }
        )

    def combine(batch: pa.Table) -> pa.Table:
        keys = batch[key_col].to_pylist()
        regs = batch["hll"].to_pylist()
        merged: dict = {}
        for k, r in zip(keys, regs):
            arr = np.frombuffer(r, dtype=np.uint8)
            merged[k] = hll_merge(merged[k], arr) if k in merged else arr
        ks = sorted(merged)
        return pa.table(
            {
                key_col: pa.array(ks, type=pa.string()),
                "hll": pa.array([merged[k].tobytes() for k in ks],
                                type=pa.binary()),
            }
        )

    partials = ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
    final = tree_merge(partials, combine).to_pandas()
    final["approx_distinct"] = [
        np.int64(round(hll_estimate(np.frombuffer(r, dtype=np.uint8))))
        for r in final["hll"]
    ]
    return final[[key_col, "approx_distinct"]]


def token_values_fn(batch: pa.Table):
    """Adapter: sequences batch -> per-token (source, hash) pairs."""
    import pyarrow.compute as pc

    lengths = pc.list_value_length(batch["tokens"]).to_numpy(zero_copy_only=False)
    src = np.repeat(
        batch["source"].to_numpy(zero_copy_only=False), lengths
    )
    flat = pc.list_flatten(batch["tokens"]).to_numpy(zero_copy_only=False)
    hashes = _splitmix64(flat.astype(np.int64))
    return src.astype(str), hashes
