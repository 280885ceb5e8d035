"""Gap-fill for rollup tiers: LOCF or linear interpolation of missing buckets.

The reference has no windowed semantics (its streams are plain lazy
iterators, /root/reference/src/addr_reader.rs:35-65); SURVEY.md §2.11 maps
the target's windowed behavior to explicit grouped computation: gap-fill runs
inside ``groupby("source").map_groups`` over bucket-sorted groups.

Partitioning assumption (documented per SURVEY.md custom-operator rule):
one group = one source's full bucket series for the tier being filled. At
1m granularity that is ~526k rows per source-year — comfortably one pandas
group. For multi-year 100 TB runs, chain per-(source, year) groups and carry
each partition's boundary row through the manifest
(``boundary_last_value``, FIXTURES.md §5) exactly like the reference carries
state across import phases via its published index reads
(libs/mimir/src/rubber.rs:801-835).

Filled rows get n_rows = 0, filled = True, fill_kind = policy; downstream
hierarchical rollups exclude them (stages/rollup.py filters ``filled``).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data as rd

from mimirsbrunn_ray.functions.timeutil import BUCKET_US

VALUE_COLS = ["sum_tok", "min_tok", "max_tok", "mean_tok"]


# (value_cols, int64 casts, int32 casts) for the two tier layouts
SEQ_SPEC = (["sum_tok", "min_tok", "max_tok", "mean_tok"],
            ("sum_tok",), ("min_tok", "max_tok"))
GENERIC_SPEC = (["sum_val", "min_val", "max_val", "mean_val"], (), ())


def _fill_series(
    g: pd.DataFrame,
    width_us: int,
    policy: str,
    key_col: str = "source",
    spec=SEQ_SPEC,
) -> pd.DataFrame:
    value_cols, int64_cols, int32_cols = spec
    if "filled" not in g.columns or "fill_kind" not in g.columns:
        raise ValueError(
            "gap-fill input must carry filled/fill_kind columns "
            "(they define the output schema; add them before filling)"
        )
    g = g.sort_values("bucket").reset_index(drop=True)
    if len(g) <= 1:
        return g
    b = g["bucket"].astype("datetime64[us]")
    b_us = b.astype(np.int64)
    full = np.arange(b_us.iloc[0], b_us.iloc[-1] + width_us, width_us)
    if len(full) == len(g):
        return g
    out = pd.DataFrame({"bucket": full.astype("datetime64[us]")})
    out[key_col] = g[key_col].iloc[0]
    merged = out.merge(g, on=["bucket", key_col], how="left")
    missing = merged["n_rows"].isna()
    merged["n_rows"] = merged["n_rows"].fillna(0).astype(np.int64)
    if policy == "locf":
        for c in value_cols:
            merged[c] = merged[c].ffill()
    elif policy == "linear":
        present_us = b_us.to_numpy()
        miss_us = full[missing.to_numpy()]
        for c in value_cols:
            vals = g[c].to_numpy(dtype=np.float64)
            interp = np.interp(miss_us, present_us, vals)
            col = merged[c].to_numpy(dtype=np.float64)
            col[missing.to_numpy()] = interp
            merged[c] = col
        # integer value columns round to nearest int after interpolation
        for c in (*int64_cols, *int32_cols):
            merged[c] = np.rint(merged[c]).astype(np.int64)
    else:
        raise ValueError(f"unknown gap-fill policy {policy!r}")
    for c in int64_cols:
        merged[c] = merged[c].astype(np.int64)
    for c in int32_cols:
        merged[c] = merged[c].astype(np.int32)
    merged["filled"] = missing.to_numpy()
    merged["fill_kind"] = np.where(missing, policy, "none")
    return merged[g.columns]


def gapfill(
    ds: "rd.Dataset",
    granularity: str,
    policy: str = "locf",
    counters=None,
    single_partition: bool | None = None,
    key_col: str = "source",
    spec=None,
    n_rows: int | None = None,
) -> "rd.Dataset":
    """Fill missing buckets per source between its first and last bucket.

    ``single_partition=None`` (default) auto-switches: when the tier is
    known to be small (``n_rows`` hint from the caller, at most
    ``SINGLE_PARTITION_ROW_BUDGET``), it coalesces into one block and
    fills every source with a pandas groupby-apply in a single task,
    skipping Ray's sort-based map_groups machinery; otherwise — including
    when the size is unknown — it takes the scale-safe distributed path:
    ``groupby(key).map_groups`` shuffles by source (with the
    per-(source, year) chaining + manifest boundary carry described
    above). Both paths produce identical output (pytest-pinned). Pass an
    explicit bool to force either path.
    """
    spec = spec or SEQ_SPEC
    width = BUCKET_US[granularity]
    if single_partition is None:
        from mimirsbrunn_ray.context import SINGLE_PARTITION_ROW_BUDGET

        single_partition = (
            n_rows is not None and n_rows <= SINGLE_PARTITION_ROW_BUDGET
        )

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        out = _fill_series(g, width, policy, key_col=key_col, spec=spec)
        if counters is not None and len(out) != len(g):
            counters.inc.remote({"rows_gap_filled": int(len(out) - len(g))})
        return out

    if not single_partition:
        return ds.groupby(key_col).map_groups(fn, batch_format="pandas")

    def fill_all(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return df
        parts = [fn(g) for _, g in df.groupby(key_col, sort=True)]
        return pd.concat(parts, ignore_index=True)

    return ds.repartition(1).map_batches(
        fill_all, batch_format="pandas", batch_size=None
    )


def fill_continuation(
    boundaries: dict,
    new_rollup: pd.DataFrame,
    granularity: str,
    policy: str = "locf",
    key_col: str = "source",
    spec=None,
) -> pd.DataFrame:
    """Window-chained gap-fill: seed each key's series with the PREVIOUS
    window's boundary row (``boundaries`` = the ``boundaries`` dict a tier
    manifest records: key -> {bucket_us, boundary_last_value}), so the gap
    between the old window's last bucket and the new window's first bucket
    is filled without re-reading the published tier — the cross-partition
    LOCF carry of SURVEY.md §7.6 / FIXTURES.md §5.

    Returns only NEW rows (the seed row is dropped after filling).
    """
    spec = spec or SEQ_SPEC
    width = BUCKET_US[granularity]
    out = []
    for key, grp in new_rollup.groupby(key_col, sort=True):
        b = boundaries.get(key)
        if b is not None:
            seed = grp.iloc[0:1].copy()
            seed["bucket"] = pd.to_datetime(int(b["bucket_us"]), unit="us")
            seed["n_rows"] = np.int64(0)
            for c in spec[0]:
                seed[c] = b["boundary_last_value"]
            for c in spec[1]:
                seed[c] = np.int64(b["boundary_last_value"])
            for c in spec[2]:
                seed[c] = np.int32(b["boundary_last_value"])
            seed["filled"] = False
            seed["fill_kind"] = "none"
            grp = pd.concat([seed, grp], ignore_index=True)
        filled = _fill_series(grp, width, policy, key_col=key_col, spec=spec)
        if b is not None:
            b_ts = pd.to_datetime(int(b["bucket_us"]), unit="us")
            filled = filled[filled["bucket"] > b_ts]
        out.append(filled)
    return pd.concat(out, ignore_index=True) if out else new_rollup
