"""Round-4 batch DM: catalog-wide data-quality profiling — the
foreign-key orphan audit over every FK edge in the star schema, the
null-rate matrix across all tables and columns, and the string-length
profile of every text column.

These are the catalog-level operators a warehouse runs nightly (the
reference's per-source validation counters generalized to the whole
schema). Scale shapes: small-parent FK edges check via broadcast key
sets; the two corpus-sized parents (orders <- lineitem,
customer <- orders) go through the bloom-pruned EXACT anti-join so no
parent key set ever materializes on the driver. Everything is exact
int64 counts; rates snap x1e6.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from mimirsbrunn_ray.stages.join import bloom_anti_join
from mimirsbrunn_ray.stages.rollup import tree_merge


def _round_half_away(x: np.ndarray) -> np.ndarray:
    return np.where(x >= 0, np.floor(x + 0.5), np.ceil(x - 0.5)).astype(
        np.int64
    )


def _sum_by(t: pa.Table, keys: list[str], vals: list[str]) -> pa.Table:
    g = t.group_by(keys).aggregate([(v, "sum") for v in vals])
    g = g.select(keys + [f"{v}_sum" for v in vals])
    return g.rename_columns(keys + vals)


# ---------------------------------------------------------------------------
# foreign-key orphan audit over every schema edge
# ---------------------------------------------------------------------------

# (edge label, child table, child key, parent table, parent key, parent
# is dimension-sized -> broadcast; else bloom anti-join)
_FK_EDGES = (
    ("lineitem->orders", "lineitem", "l_orderkey", "orders", "o_orderkey", False),
    ("lineitem->part", "lineitem", "l_partkey", "part", "p_partkey", True),
    ("lineitem->supplier", "lineitem", "l_suppkey", "supplier", "s_suppkey", True),
    ("orders->customer", "orders", "o_custkey", "customer", "c_custkey", False),
    ("customer->nation", "customer", "c_nationkey", "nation", "n_nationkey", True),
    ("supplier->nation", "supplier", "s_nationkey", "nation", "n_nationkey", True),
    ("nation->region", "nation", "n_regionkey", "region", "r_regionkey", True),
)


def q_fk_orphan_audit(sf_dir):
    """Per foreign-key edge of the star schema: child row count and the
    number of ORPHANS (child keys with no parent row) — the referential
    integrity sweep that decides whether a snapshot is joinable at all.
    Dimension-sized parents check via a broadcast sorted key set inside
    one child scan; the two corpus-sized parents (orders, customer) go
    through the bloom-pruned EXACT anti-join (D4 family) so no parent
    key set is ever driver-materialized. Counts exact; orphan rate
    x1e6."""
    import pyarrow.parquet as pq

    rows = {"edge": [], "n_child": [], "orphans": [], "rate_x1e6": []}
    for edge, child, ck, parent, pk, is_dim in _FK_EDGES:
        child_ds = rd.read_parquet(
            f"{sf_dir}/{child}.parquet", columns=[ck]
        ).map_batches(
            lambda b, ck=ck: b.filter(pc.is_valid(b[ck])),
            batch_format="pyarrow",
            batch_size=None,
        )
        if is_dim:
            keys = np.sort(
                pq.read_table(f"{sf_dir}/{parent}.parquet", columns=[pk])[pk]
                .to_numpy(zero_copy_only=False)
                .astype(np.int64)
            )
            import ray as _ray

            keys_ref = _ray.put(keys)

            def count_partial(b: pa.Table, ck=ck, keys_ref=keys_ref) -> pa.Table:
                import ray as _r

                kk = _r.get(keys_ref)
                v = b[ck].cast(pa.int64()).to_numpy()
                pos = np.searchsorted(kk, v)
                ok = (pos < len(kk)) & (kk[np.minimum(pos, len(kk) - 1)] == v)
                return pa.table(
                    {
                        "k": pa.array([0], pa.int64()),
                        "n": pa.array([len(v)], pa.int64()),
                        "orph": pa.array([int((~ok).sum())], pa.int64()),
                    }
                )

            agg = tree_merge(
                child_ds.map_batches(
                    count_partial, batch_format="pyarrow", batch_size=None
                ),
                lambda b: _sum_by(b, ["k"], ["n", "orph"]),
            ).to_pandas()
            n_child = int(agg["n"].sum()) if len(agg) else 0
            orph = int(agg["orph"].sum()) if len(agg) else 0
        else:
            parent_ds = rd.read_parquet(
                f"{sf_dir}/{parent}.parquet", columns=[pk]
            )
            orphans_ds = bloom_anti_join(child_ds, parent_ds, ck, pk)
            n_child = child_ds.count()
            orph = orphans_ds.count()
        rows["edge"].append(edge)
        rows["n_child"].append(n_child)
        rows["orphans"].append(orph)
        rows["rate_x1e6"].append(
            None
            if n_child == 0
            else int(
                _round_half_away(np.array([float(orph) / n_child * 1e6]))[0]
            )
        )
    return pa.table(
        {
            "edge": pa.array(rows["edge"], pa.string()),
            "n_child": pa.array(rows["n_child"], pa.int64()),
            "orphans": pa.array(rows["orphans"], pa.int64()),
            "rate_x1e6": pa.array(rows["rate_x1e6"], pa.int64()),
        }
    )


_FK_SQL_ONE = """
SELECT '{edge}' AS edge,
       CAST(COUNT(*) AS BIGINT) AS n_child,
       CAST(SUM(CASE WHEN NOT EXISTS
             (SELECT 1 FROM {parent} p WHERE p.{pk} = c.{ck})
            THEN 1 ELSE 0 END) AS BIGINT) AS orphans,
       CASE WHEN COUNT(*) = 0 THEN NULL
            ELSE CAST(ROUND(CAST(SUM(CASE WHEN NOT EXISTS
                   (SELECT 1 FROM {parent} p WHERE p.{pk} = c.{ck})
                  THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*) * 1000000, 0)
                 AS BIGINT) END AS rate_x1e6
FROM {child} c WHERE c.{ck} IS NOT NULL
"""

FK_ORPHAN_SQL = "\nUNION ALL\n".join(
    _FK_SQL_ONE.format(edge=e, child=c, ck=ck, parent=p, pk=pk)
    for e, c, ck, p, pk, _ in _FK_EDGES
) + "\nORDER BY 1"


# ---------------------------------------------------------------------------
# null-rate matrix over every table and column
# ---------------------------------------------------------------------------

_CATALOG = {
    "region": ["r_regionkey", "r_name"],
    "nation": ["n_nationkey", "n_name", "n_regionkey"],
    "customer": ["c_custkey", "c_name", "c_nationkey", "c_acctbal",
                 "c_mktsegment"],
    "supplier": ["s_suppkey", "s_name", "s_nationkey", "s_acctbal"],
    "part": ["p_partkey", "p_name", "p_brand", "p_type", "p_size",
             "p_retailprice"],
    "orders": ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
               "o_orderdate", "o_orderpriority"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
                 "l_quantity", "l_extendedprice", "l_discount", "l_tax",
                 "l_returnflag", "l_linestatus", "l_shipdate"],
    "events": ["event_id", "ts", "user_id", "event_type", "value", "props"],
    "documents": ["doc_id", "text", "lang", "source", "n_chars"],
    "embeddings": ["vec_id", "embedding", "label"],
}


def q_null_rate_catalog(sf_dir):
    """Per (table, column) across the WHOLE catalog: row count, null
    count and null rate — the completeness matrix every ingestion
    contract checks against (a column whose null rate moved is a
    breaking upstream change even when the schema still matches). One
    columnar scan per table folds all its columns' null counts in a
    single combiner pass; exact int64; rates x1e6."""
    frames = []
    for tbl, cols in _CATALOG.items():
        ds = rd.read_parquet(f"{sf_dir}/{tbl}.parquet", columns=cols)

        def partial(b: pa.Table, cols=cols) -> pa.Table:
            data = {"k": pa.array([0], pa.int64()),
                    "rows": pa.array([b.num_rows], pa.int64())}
            for c in cols:
                data[f"n_{c}"] = pa.array(
                    [int(pc.sum(pc.is_null(b[c]).cast(pa.int64())).as_py()
                         or 0)],
                    pa.int64(),
                )
            return pa.table(data)

        agg = tree_merge(
            ds.map_batches(partial, batch_format="pyarrow", batch_size=None),
            lambda b, cols=cols: _sum_by(
                b, ["k"], ["rows"] + [f"n_{c}" for c in cols]
            ),
        ).to_pandas()
        rows = int(agg["rows"].sum()) if len(agg) else 0
        for c in cols:
            nulls = int(agg[f"n_{c}"].sum()) if len(agg) else 0
            frames.append((tbl, c, rows, nulls))
    out = pd.DataFrame(
        frames, columns=["tbl", "col", "n_rows", "n_nulls"]
    ).sort_values(["tbl", "col"], ignore_index=True)
    return pa.table(
        {
            "tbl": pa.array(out["tbl"].tolist(), pa.string()),
            "col": pa.array(out["col"].tolist(), pa.string()),
            "n_rows": pa.array(out["n_rows"].to_numpy(dtype=np.int64)),
            "n_nulls": pa.array(out["n_nulls"].to_numpy(dtype=np.int64)),
            "rate_x1e6": pa.array(
                [
                    None
                    if r == 0
                    else int(
                        _round_half_away(np.array([float(nu) / r * 1e6]))[0]
                    )
                    for r, nu in zip(out["n_rows"], out["n_nulls"])
                ],
                pa.int64(),
            ),
        }
    )


_NULL_SQL_ONE = """
SELECT '{tbl}' AS tbl, '{col}' AS col,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CASE WHEN {col} IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_nulls,
       CASE WHEN COUNT(*) = 0 THEN NULL
            ELSE CAST(ROUND(CAST(SUM(CASE WHEN {col} IS NULL THEN 1
                                          ELSE 0 END) AS DOUBLE)
                   / COUNT(*) * 1000000, 0) AS BIGINT) END AS rate_x1e6
FROM {tbl}
"""

NULL_RATE_SQL = "\nUNION ALL\n".join(
    _NULL_SQL_ONE.format(tbl=t, col=c)
    for t, cols in _CATALOG.items()
    for c in cols
) + "\nORDER BY 1, 2"


# ---------------------------------------------------------------------------
# string-length profile of every text column
# ---------------------------------------------------------------------------

_STRING_COLS = (
    ("region", "r_name"),
    ("nation", "n_name"),
    ("customer", "c_name"),
    ("customer", "c_mktsegment"),
    ("supplier", "s_name"),
    ("part", "p_name"),
    ("part", "p_brand"),
    ("part", "p_type"),
    ("orders", "o_orderstatus"),
    ("orders", "o_orderpriority"),
    ("lineitem", "l_returnflag"),
    ("lineitem", "l_linestatus"),
    ("events", "event_type"),
    ("events", "props"),
    ("documents", "text"),
    ("documents", "lang"),
    ("documents", "source"),
)


def q_string_length_catalog(sf_dir):
    """Per string column across the catalog: min / max / mean character
    length plus the empty-string count — the payload-shape profile that
    catches truncation (max collapses), padding regressions (min
    inflates) and the silent ''-instead-of-NULL contract break. Length
    sums and extrema fold exact int64 in one pass per table; the mean
    is the only double, x1e6 snap."""
    rows = {
        "tbl": [], "col": [], "n": [], "min_len": [], "max_len": [],
        "mean_len_x1e6": [], "n_empty": [],
    }
    by_table: dict = {}
    for tbl, col in _STRING_COLS:
        by_table.setdefault(tbl, []).append(col)
    for tbl, cols in by_table.items():
        ds = rd.read_parquet(f"{sf_dir}/{tbl}.parquet", columns=cols)

        def partial(b: pa.Table, cols=cols) -> pa.Table:
            data = {"k": pa.array([0], pa.int64())}
            for c in cols:
                v = b[c].drop_null()
                lens = pc.utf8_length(v).to_numpy(zero_copy_only=False)
                has = len(lens) > 0
                data[f"n_{c}"] = pa.array([len(lens)], pa.int64())
                data[f"s_{c}"] = pa.array(
                    [int(lens.sum()) if has else 0], pa.int64()
                )
                data[f"mn_{c}"] = pa.array(
                    [int(lens.min()) if has else (1 << 62)], pa.int64()
                )
                data[f"mx_{c}"] = pa.array(
                    [int(lens.max()) if has else -1], pa.int64()
                )
                data[f"e_{c}"] = pa.array(
                    [int((lens == 0).sum()) if has else 0], pa.int64()
                )
            return pa.table(data)

        def combine(b: pa.Table, cols=cols) -> pa.Table:
            aggs = []
            for c in cols:
                aggs += [
                    (f"n_{c}", "sum"), (f"s_{c}", "sum"),
                    (f"mn_{c}", "min"), (f"mx_{c}", "max"),
                    (f"e_{c}", "sum"),
                ]
            g = b.group_by(["k"]).aggregate(aggs)
            names = ["k"]
            for c in cols:
                names += [f"n_{c}", f"s_{c}", f"mn_{c}", f"mx_{c}", f"e_{c}"]
            got = ["k"]
            for c in cols:
                got += [
                    f"n_{c}_sum", f"s_{c}_sum", f"mn_{c}_min",
                    f"mx_{c}_max", f"e_{c}_sum",
                ]
            return g.select(got).rename_columns(names)

        agg = tree_merge(
            ds.map_batches(partial, batch_format="pyarrow", batch_size=None),
            combine,
        ).to_pandas()
        for c in cols:
            n = int(agg[f"n_{c}"].iloc[0]) if len(agg) else 0
            rows["tbl"].append(tbl)
            rows["col"].append(c)
            rows["n"].append(n)
            if n == 0:
                rows["min_len"].append(None)
                rows["max_len"].append(None)
                rows["mean_len_x1e6"].append(None)
                rows["n_empty"].append(0)
                continue
            s = int(agg[f"s_{c}"].iloc[0])
            rows["min_len"].append(int(agg[f"mn_{c}"].iloc[0]))
            rows["max_len"].append(int(agg[f"mx_{c}"].iloc[0]))
            rows["mean_len_x1e6"].append(
                int(_round_half_away(np.array([float(s) / n * 1e6]))[0])
            )
            rows["n_empty"].append(int(agg[f"e_{c}"].iloc[0]))
    order = np.lexsort(
        (np.array(rows["col"], dtype=object), np.array(rows["tbl"], dtype=object))
    )
    return pa.table(
        {
            "tbl": pa.array([rows["tbl"][i] for i in order], pa.string()),
            "col": pa.array([rows["col"][i] for i in order], pa.string()),
            "n": pa.array([rows["n"][i] for i in order], pa.int64()),
            "min_len": pa.array(
                [rows["min_len"][i] for i in order], pa.int64()
            ),
            "max_len": pa.array(
                [rows["max_len"][i] for i in order], pa.int64()
            ),
            "mean_len_x1e6": pa.array(
                [rows["mean_len_x1e6"][i] for i in order], pa.int64()
            ),
            "n_empty": pa.array(
                [rows["n_empty"][i] for i in order], pa.int64()
            ),
        }
    )


_STRLEN_SQL_ONE = """
SELECT '{tbl}' AS tbl, '{col}' AS col,
       CAST(COUNT({col}) AS BIGINT) AS n,
       CAST(MIN(length({col})) AS BIGINT) AS min_len,
       CAST(MAX(length({col})) AS BIGINT) AS max_len,
       CASE WHEN COUNT({col}) = 0 THEN NULL
            ELSE CAST(ROUND(CAST(SUM(length({col})) AS DOUBLE)
                   / COUNT({col}) * 1000000, 0) AS BIGINT) END
         AS mean_len_x1e6,
       CAST(SUM(CASE WHEN length({col}) = 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_empty
FROM {tbl}
"""

STRLEN_SQL = "\nUNION ALL\n".join(
    _STRLEN_SQL_ONE.format(tbl=t, col=c) for t, c in _STRING_COLS
) + "\nORDER BY 1, 2"


def register_r4dm(queries: dict, oracles: dict) -> None:
    queries.update(
        {
            "fk_orphan_audit": q_fk_orphan_audit,
            "null_rate_catalog": q_null_rate_catalog,
            "string_length_catalog": q_string_length_catalog,
        }
    )
    oracles.update(
        {
            "fk_orphan_audit": FK_ORPHAN_SQL,
            "null_rate_catalog": NULL_RATE_SQL,
            "string_length_catalog": STRLEN_SQL,
        }
    )
