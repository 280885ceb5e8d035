#!/usr/bin/env python
"""Full registry sweep: run EVERY queries() entry and, where an oracle
exists, compare rows + columns + values against DuckDB — the same compare
as the driver's correctness gate, over the WHOLE registry instead of its
first 50 slots. No-oracle entries are run and row-counted.

Usage: python tools/sweep.py [sf_dir] [only=name1,name2,...] [--per-family=N]
       (sf_dir default /root/testdata/sf0.01; only= restricts to listed
       queries; --per-family=N samples N queries per registry family —
       family = the callable's defining module — so a bounded sweep still
       touches every operator family instead of walking all ~960 entries)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pandas as pd

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if isinstance(df[c].dtype, pd.api.extensions.ExtensionDtype):
            # nullable Int64/boolean etc: align with the float64/NaN form
            # the DuckDB .df() side produces
            df[c] = df[c].astype("float64")
        elif df[c].dtype == object or np.issubdtype(
            df[c].dtype, np.datetime64
        ):
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns), ignore_index=True)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = None
    per_family = None
    for a in sys.argv[1:]:
        if a.startswith("only="):
            only = set(a[5:].split(","))
        elif a.startswith("--per-family="):
            per_family = int(a.split("=", 1)[1])
    import duckdb
    import ray

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False)
    from mimirsbrunn_ray.context import quiet_data_context

    quiet_data_context()
    import __ray_entry__ as e

    queries, oracles = e.queries(), e.oracle_sql()
    if per_family is not None:
        # family = defining module; deterministic spread: sort each
        # family's names by a stable hash so repeated runs sample the
        # same set but no family's "first alphabetical" bias survives
        import hashlib
        import itertools

        fams: dict = {}
        for name, fn in queries.items():
            fams.setdefault(getattr(fn, "__module__", "?"), []).append(name)
        chosen = set(
            itertools.chain.from_iterable(
                sorted(ns, key=lambda n: hashlib.sha1(
                    n.encode()).hexdigest())[:per_family]
                for ns in fams.values()
            )
        )
        only = chosen if only is None else (only & chosen)
        print(f"per-family={per_family}: {len(fams)} families, "
              f"{len(chosen)} queries sampled")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    n_pass = n_fail = n_rows_only = 0
    for name, fn in queries.items():
        if only is not None and name not in only:
            continue
        t0 = time.perf_counter()
        try:
            res = fn(sf_dir)
            df = (
                res
                if isinstance(res, pd.DataFrame)
                else res.to_pandas()
                if hasattr(res, "to_pandas")
                else pd.DataFrame(res)
            )
        except Exception as ex:  # noqa: BLE001 — report, keep sweeping
            print(f"ERROR {name}: {ex}")
            n_fail += 1
            continue
        dt = time.perf_counter() - t0
        if name not in oracles:
            print(f"rows_only {name}: {len(df)} rows ({dt:.1f}s)")
            n_rows_only += 1
            continue
        sql_df = con.sql(oracles[name]).df()
        ok = len(df) == len(sql_df) and sorted(df.columns) == sorted(
            sql_df.columns
        )
        if ok:
            a, b = canon(df), canon(sql_df)
            for c in a.columns:
                av, bv = a[c].to_numpy(), b[c].to_numpy()
                if np.issubdtype(av.dtype, np.floating) or np.issubdtype(
                    bv.dtype, np.floating
                ):
                    ok &= bool(
                        np.allclose(
                            av.astype(float), bv.astype(float),
                            rtol=0, atol=0, equal_nan=True,
                        )
                    )
                else:
                    ok &= bool(np.array_equal(av, bv))
                if not ok:
                    print(f"  {name}: column {c} differs")
                    break
        status = "PASS" if ok else "FAIL"
        print(f"{status} {name}: {len(df)} rows ({dt:.1f}s)")
        n_pass += ok
        n_fail += not ok
    print(
        f"\n{n_pass} pass, {n_fail} fail, {n_rows_only} rows-only "
        f"of {len(queries)} at {sf_dir}"
    )
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
