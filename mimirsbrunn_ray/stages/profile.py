"""Column profiling — the data-quality summary pass (Deequ/Great-
Expectations family) a pipeline runs before trusting a new drop: per
column, row/null counts and min/max, in ONE streaming pass over the
table regardless of how many columns are profiled.

The reference's analog is its per-import counter report (ok/skipped
counts per source, /root/reference/src/utils.rs admin counters +
A4/A6 in SURVEY.md §2.7) — this generalizes the idea to per-COLUMN
statistics with the engine's decomposable-partial discipline:

  per batch  -> one row per column: (n, n_null, min, max) via Arrow's
                C++ min_max/null_count kernels — a Python loop over the
                COLUMN LIST (bounded, ~10s), never over rows;
  tree-merge -> group by column: sum counts, min of mins, max of maxs
                (combine bounded by the column count, not rows);
  driver     -> a pa.Table of #columns rows (typed even when input is
                empty — the possibly-empty-Dataset schema rule).

Min/max are kept in TYPE FAMILIES so cross-partial comparison stays in
the native order (a VARCHAR min would sort "10" < "9"):
  * int family  — integer types and timestamps (as epoch microseconds);
  * str family  — strings;
  * other types (float, list, binary) profile counts only — a float
    min/max would need engine-identical float->text formatting in the
    SQL twin, which no two engines promise.

Output columns: column string, n_rows int64, n_null int64,
min_int/max_int int64 (null for non-int families), min_str/max_str
string (null for non-string families).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd


def _family(t: pa.DataType) -> str:
    if pa.types.is_integer(t) or pa.types.is_timestamp(t):
        return "int"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "str"
    return "other"


def profile_columns(ds: "rd.Dataset", cols: list[str]) -> "pa.Table":
    """One-pass per-column profile of ``cols``; see module docstring."""
    from mimirsbrunn_ray.stages.rollup import tree_merge

    def partial(b: pa.Table) -> pa.Table:
        names, ns, nulls = [], [], []
        min_i, max_i, min_s, max_s = [], [], [], []
        for c in cols:
            arr = b[c]
            names.append(c)
            ns.append(b.num_rows)
            nulls.append(arr.null_count)
            fam = _family(arr.type)
            if fam == "int" and b.num_rows > arr.null_count:
                a64 = (
                    arr.cast(pa.timestamp("us")).cast(pa.int64())
                    if pa.types.is_timestamp(arr.type)
                    else arr.cast(pa.int64())
                )
                mm = pc.min_max(a64)
                min_i.append(mm["min"].as_py())
                max_i.append(mm["max"].as_py())
                min_s.append(None)
                max_s.append(None)
            elif fam == "str" and b.num_rows > arr.null_count:
                mm = pc.min_max(arr)
                min_i.append(None)
                max_i.append(None)
                min_s.append(mm["min"].as_py())
                max_s.append(mm["max"].as_py())
            else:
                min_i.append(None)
                max_i.append(None)
                min_s.append(None)
                max_s.append(None)
        return pa.table(
            {
                "column": pa.array(names, pa.string()),
                "n_rows": pa.array(ns, pa.int64()),
                "n_null": pa.array(nulls, pa.int64()),
                "min_int": pa.array(min_i, pa.int64()),
                "max_int": pa.array(max_i, pa.int64()),
                "min_str": pa.array(min_s, pa.string()),
                "max_str": pa.array(max_s, pa.string()),
            }
        )

    def combine(b: pa.Table) -> pa.Table:
        g = b.group_by(["column"]).aggregate(
            [
                ("n_rows", "sum"),
                ("n_null", "sum"),
                ("min_int", "min"),
                ("max_int", "max"),
                ("min_str", "min"),
                ("max_str", "max"),
            ]
        )
        g = g.select(
            [
                "column", "n_rows_sum", "n_null_sum",
                "min_int_min", "max_int_max", "min_str_min", "max_str_max",
            ]
        )
        return g.rename_columns(
            [
                "column", "n_rows", "n_null",
                "min_int", "max_int", "min_str", "max_str",
            ]
        )

    parts = list(
        tree_merge(
            ds.map_batches(partial, batch_format="pyarrow", batch_size=None),
            combine,
        ).iter_batches(batch_format="pyarrow")
    )
    schema = pa.schema(
        [
            ("column", pa.string()),
            ("n_rows", pa.int64()),
            ("n_null", pa.int64()),
            ("min_int", pa.int64()),
            ("max_int", pa.int64()),
            ("min_str", pa.string()),
            ("max_str", pa.string()),
        ]
    )
    if not parts:
        # empty input: still one row per profiled column, all-zero counts
        return pa.table(
            {
                "column": pa.array(cols, pa.string()),
                "n_rows": pa.array([0] * len(cols), pa.int64()),
                "n_null": pa.array([0] * len(cols), pa.int64()),
                "min_int": pa.array([None] * len(cols), pa.int64()),
                "max_int": pa.array([None] * len(cols), pa.int64()),
                "min_str": pa.array([None] * len(cols), pa.string()),
                "max_str": pa.array([None] * len(cols), pa.string()),
            }
        )
    # one defensive driver-side combine: tree_merge converges to a single
    # block, but the invariant is cheap to enforce at #columns rows
    out = combine(pa.concat_tables([p.cast(schema) for p in parts]))
    return out.cast(schema).sort_by("column")
