"""Mergeable sketches: HyperLogLog approximate distinct counting,
Misra-Gries heavy hitters, t-digest quantiles, Bloom membership filters.

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


# ---------------------------------------------------------------------------
# EXACT heavy hitters via a mergeable Misra-Gries candidate sketch
# (Misra & Gries 1982; mergeability per Agarwal et al., "Mergeable
# Summaries", PODS'12 — public algorithms). Two passes:
#   1. per-batch MG summaries of size k, tree-merged (merge = sum shared
#      counters, then subtract the (k+1)-th largest count and drop <= 0).
#      Guarantee: every item with true frequency > N/(k+1) SURVIVES, so
#      with k >= 2/frac the candidate set is a superset of all items with
#      freq >= frac * N. Summary size is fixed (k rows) per merge — no
#      full-vocabulary groupby ever happens.
#   2. broadcast the (bounded, <= k) candidates; one filtered counting
#      pass gives their EXACT frequencies; threshold on exact N.
# Output is exact — the sketch only prunes the candidate space.
# ---------------------------------------------------------------------------


def _mg_trim(items: np.ndarray, counts: np.ndarray, k: int):
    """Misra-Gries decrement of ALREADY-UNIQUE (item, count) pairs to
    <= k entries (subtract the (k+1)-th largest, drop non-positive)."""
    if len(items) > k:
        kth = np.partition(counts, len(counts) - k - 1)[len(counts) - k - 1]
        counts = counts - kth
        keep = counts > 0
        items, counts = items[keep], counts[keep]
    return items, counts


def _mg_reduce(items: np.ndarray, counts: np.ndarray, k: int):
    """Sum duplicate items (merge arity > 1), then MG-decrement."""
    import pandas as pd

    s = pd.Series(counts).groupby(pd.Series(items)).sum()
    return _mg_trim(
        s.index.to_numpy(dtype=object), s.to_numpy(dtype=np.int64), k
    )


def _summary_table(items, counts, total: int) -> pa.Table:
    return pa.table(
        {
            "item": pa.array(list(items) + [None], type=pa.string()),
            "cnt": pa.array(
                np.concatenate([counts, [total]]).astype(np.int64)
            ),
            "is_total": pa.array([False] * len(items) + [True]),
        }
    )


def exact_heavy_hitters(
    ds: "rd.Dataset",
    values_fn,
    frac: float = 0.01,
    k: int | None = None,
) -> "pa.Table":
    """Items of ``values_fn(batch)`` (flat string array per batch) with
    exact frequency >= ``frac`` of the total — (item, n_occurrences),
    exact counts, candidates pruned by the MG sketch."""
    import pyarrow.compute as pc

    from mimirsbrunn_ray.stages.rollup import tree_merge

    if k is None:
        k = max(8, int(np.ceil(2.0 / frac)))

    def partial(b: pa.Table) -> pa.Table:
        # Nulls are excluded from BOTH the candidate set and the total: the
        # downstream _mg_reduce pandas groupby drops null keys, so counting
        # them in the total would inflate the threshold denominator while
        # the null item could never surface — breaking the exact-superset
        # guarantee (ADVICE r2). One consistent rule: null is not an item.
        vals = pc.drop_null(values_fn(b))
        # native Arrow hash count (one pass, no per-token Python objects)
        vc = pc.value_counts(vals)
        items = vc.field("values").to_numpy(zero_copy_only=False)
        cnt = vc.field("counts").to_numpy(zero_copy_only=False).astype(np.int64)
        items, counts = _mg_trim(items, cnt, k)
        return _summary_table(items, counts, len(vals))

    def combine(b: pa.Table) -> pa.Table:
        tot_mask = b["is_total"].to_numpy(zero_copy_only=False)
        total = int(
            pc.sum(b.filter(pa.array(tot_mask))["cnt"]).as_py() or 0
        )
        rest = b.filter(pa.array(~tot_mask))
        items, counts = _mg_reduce(
            rest["item"].to_numpy(zero_copy_only=False),
            rest["cnt"].to_numpy(zero_copy_only=False).astype(np.int64),
            k,
        )
        return _summary_table(items, counts, total)

    _empty = pa.table(
        {"item": pa.array([], pa.string()),
         "cnt": pa.array([], pa.int64()),
         "is_total": pa.array([], pa.bool_())}
    )
    summary_parts = list(
        tree_merge(
            ds.map_batches(partial, batch_format="pyarrow", batch_size=None),
            combine,
        ).iter_batches(batch_format="pyarrow")
    )
    summary = pa.concat_tables(summary_parts or [_empty])
    tot_mask = summary["is_total"].to_numpy(zero_copy_only=False)
    totals = summary.filter(pa.array(tot_mask))["cnt"]
    total = int(totals[0].as_py()) if len(totals) else 0
    cand = summary.filter(pa.array(~tot_mask))["item"]
    if len(cand) == 0 or total == 0:
        return pa.table(
            {"item": pa.array([], pa.string()),
             "n_occurrences": pa.array([], pa.int64())}
        )

    # pass 2: exact counts of the bounded candidate set
    def count_cands(b: pa.Table) -> pa.Table:
        vals = values_fn(b)
        keep = pc.fill_null(pc.is_in(vals, value_set=cand), False)
        vc = pc.value_counts(vals.filter(keep))
        return pa.table(
            {"item": vc.field("values").cast(pa.string()),
             "n": vc.field("counts").cast(pa.int64())}
        )

    def sum_counts(b: pa.Table) -> pa.Table:
        g = b.group_by(["item"]).aggregate([("n", "sum")])
        return g.rename_columns(["item", "n"])

    exact_parts = list(
        tree_merge(
            ds.map_batches(count_cands, batch_format="pyarrow",
                           batch_size=None),
            sum_counts,
        ).iter_batches(batch_format="pyarrow")
    )
    exact = pa.concat_tables(
        exact_parts
        or [pa.table({"item": pa.array([], pa.string()),
                      "n": pa.array([], pa.int64())})]
    )
    n = exact["n"].to_numpy(zero_copy_only=False)
    keep = n >= frac * total
    out = exact.filter(pa.array(keep))
    return pa.table(
        {
            "item": out["item"],
            "n_occurrences": out["n"].cast(pa.int64()),
        }
    ).sort_by("item")


# ---------------------------------------------------------------------------
# t-digest per-key quantiles for CONTINUOUS / unbounded domains — the
# documented fallback of rollup.exact_quantiles_small_domain (whose histogram
# trick needs a bounded integer domain). Mergeable centroid summary per
# Dunning & Ertl, "Computing extremely accurate quantiles using t-digests"
# (arXiv:1902.04023 — public algorithm): weighted points are sorted and
# clustered by the k1 (arcsine) scale function, which keeps clusters small
# near q=0/q=1 and coarse in the middle, giving relative rank error
# O(q(1-q)/delta). The summary is a flat (key, mean, weight) table bounded
# by keys x ~delta rows, merged by concatenate-sort-recluster — the same
# partial + tree_merge shape as the HLL and Misra-Gries sketches above.
# ---------------------------------------------------------------------------


def _tdigest_compress(means: np.ndarray, weights: np.ndarray, delta: int):
    """Re-cluster weighted points into <= ~delta centroids (k1 scale fn).

    Fully vectorized: sort by mean, midpoint ranks -> q, cluster id =
    floor(delta * (asin(2q-1)/pi + 1/2)), weighted-mean reduceat per
    cluster. Deterministic for a given input multiset.
    """
    order = np.argsort(means, kind="stable")
    m, w = means[order], weights[order]
    cum = np.cumsum(w)
    total = cum[-1]
    q = (cum - w / 2.0) / total  # midpoint rank of each point, in (0, 1)
    k = np.floor(delta * (np.arcsin(2.0 * q - 1.0) / np.pi + 0.5))
    starts = np.flatnonzero(np.concatenate([[True], k[1:] != k[:-1]]))
    wsum = np.add.reduceat(w, starts)
    msum = np.add.reduceat(m * w, starts)
    return msum / wsum, wsum


def _tdigest_quantile(
    means: np.ndarray, weights: np.ndarray, qs
) -> np.ndarray:
    """Quantile estimates from a SORTED centroid summary: linear
    interpolation of centroid means over cumulative midpoint weights."""
    cum = np.cumsum(weights)
    mid = cum - weights / 2.0
    return np.interp(np.asarray(qs, dtype=np.float64) * cum[-1], mid, means)


def _per_key_segments(keys: np.ndarray):
    """(sorted_order, segment_starts) for a key array."""
    order = np.argsort(keys, kind="stable")
    ks = keys[order]
    starts = np.flatnonzero(np.concatenate([[True], ks[1:] != ks[:-1]]))
    return order, ks, starts


def tdigest_quantiles_per_key(
    ds: "rd.Dataset",
    key_col: str,
    val_fn,
    qs=(0.5, 0.9, 0.99),
    q_names=("p50", "p90", "p99"),
    delta: int = 200,
) -> pd.DataFrame:
    """Approximate per-key quantiles of a continuous metric.

    ``val_fn(batch) -> (keys: np str array, values: float64 array)``; null
    or NaN values must be dropped by the adapter (a NaN would poison its
    cluster's mean). Output: (key, *q_names) float64 — rank error
    ~O(q(1-q)/delta), NOT exact: pair with a pytest accuracy bound, not a
    SQL hash oracle (same contract as approx_distinct_per_key)."""
    from mimirsbrunn_ray.stages.rollup import tree_merge

    empty = pa.table(
        {key_col: pa.array([], pa.string()),
         "mean": pa.array([], pa.float64()),
         "weight": pa.array([], pa.float64())}
    )

    def _summarize(keys: np.ndarray, vals: np.ndarray, wts: np.ndarray):
        if len(keys) == 0:
            return empty
        order, ks, starts = _per_key_segments(keys)
        v, w = vals[order], wts[order]
        out_k, out_m, out_w = [], [], []
        for i, s in enumerate(starts):
            e = starts[i + 1] if i + 1 < len(starts) else len(ks)
            cm, cw = _tdigest_compress(v[s:e], w[s:e], delta)
            out_k.append(np.repeat(ks[s], len(cm)))
            out_m.append(cm)
            out_w.append(cw)
        return pa.table(
            {
                key_col: pa.array(np.concatenate(out_k).astype(str),
                                  type=pa.string()),
                "mean": pa.array(np.concatenate(out_m).astype(np.float64)),
                "weight": pa.array(np.concatenate(out_w).astype(np.float64)),
            }
        )

    def partial(b: pa.Table) -> pa.Table:
        keys, vals = val_fn(b)
        keys = np.asarray(keys)
        vals = np.asarray(vals, dtype=np.float64)
        # defensive: one NaN/inf would poison its cluster's weighted mean
        # and every later merge — drop here regardless of the adapter
        ok = np.isfinite(vals)
        if not ok.all():
            keys, vals = keys[ok], vals[ok]
        return _summarize(
            keys, vals, np.ones(len(vals), dtype=np.float64)
        )

    def combine(b: pa.Table) -> pa.Table:
        return _summarize(
            b[key_col].to_numpy(zero_copy_only=False),
            b["mean"].to_numpy(zero_copy_only=False),
            b["weight"].to_numpy(zero_copy_only=False),
        )

    partials = ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
    final = tree_merge(partials, combine).to_pandas()
    rows = []
    for k, g in final.groupby(key_col, sort=True):
        g = g.sort_values("mean")
        est = _tdigest_quantile(
            g["mean"].to_numpy(), g["weight"].to_numpy(), qs
        )
        rows.append({key_col: k, **dict(zip(q_names, est))})
    cols = [key_col, *q_names]
    return pd.DataFrame(rows, columns=cols)


# ---------------------------------------------------------------------------
# Bloom filter — EXACT-result pruning at broadcast cost (Bloom, CACM 1970).
#
# The 100-TB dedup use-case: "drop everything already in the seen set"
# without shuffling the corpus. A fixed-size bit array built from the seen
# keys is broadcast once per actor; rows the filter calls DEFINITELY ABSENT
# skip the join entirely (no false negatives), and only the maybe-present
# survivors go through an exact distributed anti-join — so the final result
# is exact while the all-to-all exchange sees a fraction of the rows.
# Partial blooms are fixed n_bits/8-byte rows merged by bitwise OR — the
# same associative partial + tree_merge shape as the HLL above.

_BLOOM_SEED = np.uint64(0x9E3779B97F4A7C15)


def bloom_new(n_bits: int) -> np.ndarray:
    assert n_bits & (n_bits - 1) == 0, "n_bits must be a power of two"
    return np.zeros(n_bits >> 6, dtype=np.uint64)


def _bloom_positions(hashes: np.ndarray, n_bits: int, n_probes: int):
    """Double hashing (Kirsch-Mitzenmacher): pos_i = h1 + i*h2 mod n_bits."""
    h1 = hashes.astype(np.uint64)
    h2 = _splitmix64(h1 ^ _BLOOM_SEED) | np.uint64(1)
    mask = np.uint64(n_bits - 1)
    for i in range(n_probes):
        yield (h1 + np.uint64(i) * h2) & mask


def bloom_add(words: np.ndarray, hashes: np.ndarray, n_probes: int = 6):
    n_bits = len(words) << 6
    for pos in _bloom_positions(hashes, n_bits, n_probes):
        np.bitwise_or.at(
            words, (pos >> np.uint64(6)).astype(np.int64),
            np.uint64(1) << (pos & np.uint64(63)),
        )


def bloom_contains(
    words: np.ndarray, hashes: np.ndarray, n_probes: int = 6
) -> np.ndarray:
    """Vectorized membership: True = maybe present, False = DEFINITELY absent."""
    n_bits = len(words) << 6
    hit = np.ones(len(hashes), dtype=bool)
    for pos in _bloom_positions(hashes, n_bits, n_probes):
        bit = words[(pos >> np.uint64(6)).astype(np.int64)] & (
            np.uint64(1) << (pos & np.uint64(63))
        )
        hit &= bit != 0
    return hit


def bloom_or_merge(bits_ds: "rd.Dataset", n_bits: int) -> np.ndarray:
    """OR-merge a dataset of partial-bloom rows (binary ``bits`` column,
    null rows ignored) by tree reduction; the driver holds only the final
    n_bits/8 bytes. The tree merge keeps this scale-robust when the
    partial-row count itself is huge."""
    from mimirsbrunn_ray.stages.rollup import tree_merge

    def combine(b: pa.Table) -> pa.Table:
        acc = bloom_new(n_bits)
        for buf in b["bits"].drop_null().to_pylist():
            acc |= np.frombuffer(buf, dtype=np.uint64)
        return pa.table({"bits": pa.array([acc.tobytes()], pa.binary())})

    merged = tree_merge(bits_ds, combine)
    for bt in merged.iter_batches(batch_format="pyarrow"):
        if bt.num_rows:
            return np.frombuffer(
                bt["bits"][0].as_py(), dtype=np.uint64
            ).copy()
    return bloom_new(n_bits)


def bloom_from_dataset(
    ds: "rd.Dataset",
    hashes_fn,
    n_bits: int = 1 << 21,
    n_probes: int = 6,
) -> np.ndarray:
    """Distributed build: one fixed-size partial bloom per block, OR-merged
    by ``bloom_or_merge``. ``hashes_fn(batch) -> uint64 ndarray`` supplies
    the key hashes."""

    def partial(b: pa.Table) -> pa.Table:
        words = bloom_new(n_bits)
        h = hashes_fn(b)
        if len(h):
            bloom_add(words, h, n_probes)
        return pa.table({"bits": pa.array([words.tobytes()], pa.binary())})

    partials = ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
    return bloom_or_merge(partials, n_bits)
