"""Exact rank selections (top-k membership, ntile cuts) without a global
sort shuffle OR a whole-table driver pull.

Round-4 verdict item 3: several census queries pulled a fact table to the
driver to take an exact top-quartile / tercile by (value, tie-key). The
decomposable form: a distributed VALUE-GRAIN histogram (a reduction — one
row per distinct value) locates the cut value, and only the single tie
group that STRADDLES the cut is re-read (filtered, bounded by the tie
multiplicity) to resolve the tie-key threshold exactly. Membership is
then a pure per-row predicate, evaluable inside any map_batches.

Same discipline as q_ntile_doc_lengths (pipelines/queries_ext.py): rank
arithmetic over a decomposable histogram, never a sorted materialization.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd


def value_counts(ds: "rd.Dataset", col: str) -> pd.Series:
    """Distributed histogram of ``col``: index = distinct values (sorted
    ascending), values = int64 counts. Value-grain reduction — the driver
    holds one row per distinct value, not per input row."""
    from mimirsbrunn_ray.stages.rollup import tree_merge

    cnt = "_vc_n"  # distinct from any data column (col may be named "n")

    def part(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({col: b[col], cnt: pa.array([], pa.int64())})
        t = pa.table(
            {col: b[col], cnt: pa.array(np.ones(b.num_rows, np.int64))}
        )
        g = t.group_by([col]).aggregate([(cnt, "sum")])
        return g.rename_columns([col, cnt])

    def comb(b: pa.Table) -> pa.Table:
        g = b.group_by([col]).aggregate([(cnt, "sum")])
        return g.rename_columns([col, cnt])

    h = tree_merge(
        ds.map_batches(part, batch_format="pyarrow", batch_size=None), comb
    ).to_pandas()
    if col not in h.columns or len(h) == 0:
        return pd.Series([], dtype=np.int64)
    return h.set_index(col)[cnt].astype(np.int64).sort_index()


def topk_threshold(
    ds: "rd.Dataset", value_col: str, tie_col: str, k: int
) -> tuple[int, int] | None:
    """Exact top-k cut for ordering (value DESC, tie ASC) over int64
    columns: returns ``(v_star, t_star)`` such that a row is a top-k
    member iff ``value > v_star or (value == v_star and tie <= t_star)``.
    ``t_star`` may be +inf's stand-in (np.iinfo.max) when the tie group
    is taken whole. Returns None when the dataset has fewer than k rows
    or k <= 0."""
    if k <= 0:
        return None
    hist = value_counts(ds, value_col)
    if len(hist) == 0:
        return None
    vals = hist.index.to_numpy()
    cnts = hist.to_numpy(np.int64)
    n = int(cnts.sum())
    if n < k:
        return None
    # walk values descending until cumulative >= k
    cum = np.cumsum(cnts[::-1])
    j = int(np.searchsorted(cum, k, side="left"))  # index from the top
    v_star = int(vals[len(vals) - 1 - j])
    taken_above = int(cum[j - 1]) if j > 0 else 0
    t = k - taken_above  # rows still needed from the v_star tie group
    group_size = int(cnts[len(vals) - 1 - j])
    if t >= group_size:
        return v_star, int(np.iinfo(np.int64).max)
    # resolve the straddling tie group: pull ONLY its tie keys (bounded
    # by the value's multiplicity), take the t smallest
    import pyarrow.compute as pc

    def pull(b: pa.Table) -> pa.Table:
        keep = pc.equal(b[value_col], pa.scalar(v_star, pa.int64()))
        return pa.table(
            {tie_col: b[tie_col].filter(pc.fill_null(keep, False))}
        )

    ties = ds.map_batches(
        pull, batch_format="pyarrow", batch_size=None
    ).to_pandas()
    tv = np.sort(ties[tie_col].to_numpy(np.int64), kind="stable")
    return v_star, int(tv[t - 1])


def member_mask(
    values: np.ndarray, ties: np.ndarray, thr: tuple[int, int] | None
) -> np.ndarray:
    """Vectorized top-k membership predicate for ``topk_threshold``."""
    if thr is None:
        return np.zeros(len(values), dtype=bool)
    v_star, t_star = thr
    return (values > v_star) | ((values == v_star) & (ties <= t_star))


def percentile_from_counts(
    values: np.ndarray, counts: np.ndarray, q: float
) -> float:
    """np.percentile(expanded, q) (linear interpolation) computed from a
    (sorted distinct values, counts) histogram — the value-grain form the
    distributed histograms reduce to."""
    cum = np.cumsum(counts)
    n = int(cum[-1])
    pos = (n - 1) * (q / 100.0)
    i0, i1 = int(np.floor(pos)), int(np.ceil(pos))
    lo = float(values[np.searchsorted(cum, i0 + 1, side="left")])
    hi = float(values[np.searchsorted(cum, i1 + 1, side="left")])
    return lo + (hi - lo) * (pos - i0)


def rank_band_lut(ds: "rd.Dataset", value_col: str, tie_col: str,
                  n_bands: int):
    """Exact n-band rank cut (band = rank * n_bands // n over
    (value, tie) order) as a broadcastable lookup: a distributed value
    histogram assigns whole groups their band; only groups STRADDLING a
    band boundary pull their tie keys (bounded by tie multiplicity) to
    split exactly. Returns ``(ref, n)`` where ``ref`` is a ``ray.put`` of
    (values, band_or_minus1, straddle_keys_sorted, straddle_bands) and
    ``n`` the total row count — resolve rows with ``band_of``."""
    import ray

    hist = value_counts(ds, value_col)
    if len(hist) == 0:
        return None, 0
    vals = hist.index.to_numpy(np.int64)
    cnts = hist.to_numpy(np.int64)
    n = int(cnts.sum())
    ends = np.cumsum(cnts)
    starts = ends - cnts
    b_lo = starts * n_bands // n
    b_hi = (ends - 1) * n_bands // n
    uniform = b_lo == b_hi
    vband = np.where(uniform, b_lo, -1).astype(np.int64)
    import pyarrow.compute as pc

    strad_k, strad_b = [], []
    for v, s0 in zip(vals[~uniform], starts[~uniform]):
        def pull(b: pa.Table, _v=int(v)) -> pa.Table:
            keep = pc.equal(b[value_col], pa.scalar(_v, pa.int64()))
            return pa.table(
                {tie_col: b[tie_col].filter(pc.fill_null(keep, False))}
            )

        grp = ds.map_batches(
            pull, batch_format="pyarrow", batch_size=None
        ).to_pandas()
        ks = np.sort(grp[tie_col].to_numpy(np.int64), kind="stable")
        ranks = int(s0) + np.arange(len(ks), dtype=np.int64)
        strad_k.append(ks)
        strad_b.append(ranks * n_bands // n)
    sk = np.concatenate(strad_k) if strad_k else np.array([], np.int64)
    sb = np.concatenate(strad_b) if strad_b else np.array([], np.int64)
    order = np.argsort(sk, kind="stable")
    return ray.put((vals, vband, sk[order], sb[order])), n


def band_of(values: np.ndarray, ties: np.ndarray, ref) -> np.ndarray:
    """Resolve each row's band from a ``rank_band_lut`` ref; -1 for rows
    whose value is not in the histogram (should not happen for rows the
    lut was built from)."""
    import ray

    v_arr, v_band, s_k, s_b = ray.get(ref)
    idx = np.clip(np.searchsorted(v_arr, values), 0, max(len(v_arr) - 1, 0))
    if len(v_arr) == 0:
        return np.full(len(values), -1, np.int64)
    hit = v_arr[idx] == values
    band = np.where(hit, v_band[idx], np.int64(-1))
    need = band == -1
    if need.any() and len(s_k):
        j = np.clip(np.searchsorted(s_k, ties[need]), 0, len(s_k) - 1)
        h2 = s_k[j] == ties[need]
        bb = band[need]
        bb[h2] = s_b[j][h2]
        band[need] = bb
    return band


def quantile_float(ds: "rd.Dataset", col: str, q: float) -> float | None:
    """Exact interpolated quantile of a float column without pulling the
    column: distributed sort -> per-block (count, min, max) summaries ->
    the driver locates the block span covering the target ranks -> ONE
    range-filtered pull bounded by block size (+ ties). Returns None on
    an empty dataset."""
    import pyarrow.compute as pc

    s = ds.sort(key=col)

    def summ(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"cnt": pa.array([], pa.int64()),
                             "lo": pa.array([], pa.float64()),
                             "hi": pa.array([], pa.float64())})
        v = b[col].to_numpy(zero_copy_only=False)
        return pa.table({"cnt": pa.array([np.int64(len(v))]),
                         "lo": pa.array([float(v.min())]),
                         "hi": pa.array([float(v.max())])})

    sm = s.map_batches(
        summ, batch_format="pyarrow", batch_size=None
    ).to_pandas()
    if "cnt" not in sm.columns or len(sm) == 0 or sm["cnt"].sum() == 0:
        return None
    sm = sm.sort_values(["lo", "hi"], ignore_index=True)
    n = int(sm["cnt"].sum())
    pos = (n - 1) * (q / 100.0)
    i0, i1 = int(np.floor(pos)), int(np.ceil(pos))
    cum = np.cumsum(sm["cnt"].to_numpy(np.int64))
    b0 = int(np.searchsorted(cum, i0 + 1, side="left"))
    b1 = int(np.searchsorted(cum, i1 + 1, side="left"))
    lo = float(sm["lo"].iloc[b0])
    hi = float(sm["hi"].iloc[b1])
    below = int(cum[b0 - 1]) if b0 > 0 else 0
    # ties equal to `lo` may sit in earlier blocks: include them in the
    # pull and recompute the offset from the strictly-smaller count
    def pull(b: pa.Table) -> pa.Table:
        keep = pc.and_(
            pc.greater_equal(b[col], pa.scalar(lo, pa.float64())),
            pc.less_equal(b[col], pa.scalar(hi, pa.float64())),
        )
        return pa.table({col: b[col].filter(pc.fill_null(keep, False))})

    def count_below(b: pa.Table) -> pa.Table:
        keep = pc.less(b[col], pa.scalar(lo, pa.float64()))
        return pa.table({"c": pa.array(
            [np.int64(pc.sum(keep).as_py() or 0)])})

    nb = ds.map_batches(
        count_below, batch_format="pyarrow", batch_size=None
    ).to_pandas()
    below = int(nb["c"].sum()) if "c" in nb.columns else 0
    vals = np.sort(
        ds.map_batches(pull, batch_format="pyarrow", batch_size=None)
        .to_pandas()[col].to_numpy(np.float64), kind="stable")
    v0 = float(vals[i0 - below])
    v1 = float(vals[i1 - below])
    return v0 + (v1 - v0) * (pos - i0)
