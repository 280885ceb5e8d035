"""Trusted single-process oracle for the golden rollup fixtures.

Pure pandas/numpy — no Ray — recomputing what the engine should produce
(FIXTURES.md §4). Mirrors the reference's golden-assertion style
(/root/reference/tests/bano2mimir_test.rs:106-109: "exactly 35 docs").
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

from mimirsbrunn_ray.functions.timeutil import BUCKET_US, ts_from_index


def load_clean(paths) -> pd.DataFrame:
    """Read inputs; drop dirty rows; derive ts; dedup doc_id keep-first."""
    frames = []
    for p in paths:
        t = pq.read_table(p)
        df = pd.DataFrame(
            {
                "doc_id": t["doc_id"].to_pylist(),
                "n_tok": t["n_tok"].to_numpy(zero_copy_only=False),
                "true_len": [len(x) for x in t["tokens"].to_pylist()],
                "source": t["source"].to_pylist(),
            }
        )
        frames.append(df)
    df = pd.concat(frames, ignore_index=True)
    df = df[df["n_tok"] == df["true_len"]].copy()
    # suffix after the last '-' (NOT a fixed-width slice: {i:010d} grows
    # past 10 digits at i >= 10^10 — same rule as sources/ingest.py)
    idx = df["doc_id"].str.rsplit("-", n=1).str[-1].astype(np.int64)
    df["ts_us"] = ts_from_index(idx.to_numpy())
    df = df.drop_duplicates("doc_id", keep="first")
    return df


def rollup(df: pd.DataFrame, granularity: str) -> pd.DataFrame:
    width = BUCKET_US[granularity]
    b = (df["ts_us"] // width) * width
    g = (
        df.assign(bucket_us=b)
        .groupby(["source", "bucket_us"], as_index=False)
        .agg(
            n_rows=("n_tok", "size"),
            sum_tok=("n_tok", "sum"),
            min_tok=("n_tok", "min"),
            max_tok=("n_tok", "max"),
        )
    )
    g["mean_tok"] = g["sum_tok"] / g["n_rows"]
    return g.sort_values(["source", "bucket_us"]).reset_index(drop=True)


def gapfill_locf(g: pd.DataFrame, granularity: str) -> pd.DataFrame:
    """Independent LOCF reimplementation (per-source reindex + ffill)."""
    width = BUCKET_US[granularity]
    out = []
    for s, grp in g.groupby("source"):
        grp = grp.sort_values("bucket_us").set_index("bucket_us")
        full = np.arange(grp.index[0], grp.index[-1] + width, width)
        re = grp.reindex(full)
        re["source"] = s
        re["filled"] = re["n_rows"].isna()
        re["n_rows"] = re["n_rows"].fillna(0).astype(np.int64)
        for c in ("sum_tok", "min_tok", "max_tok", "mean_tok"):
            re[c] = re[c].ffill()
        out.append(re.rename_axis("bucket_us").reset_index())
    return (
        pd.concat(out, ignore_index=True)
        .sort_values(["source", "bucket_us"])
        .reset_index(drop=True)
    )
