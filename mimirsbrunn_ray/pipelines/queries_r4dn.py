"""Round-4 batch DN: privacy-engineering audits — k-anonymity and
l-diversity of the customer quasi-identifier, and the differential-
privacy noise/error model for released per-type counts.

The pre-release checklist for sharing derived tables: k-anonymity says
how re-identifiable the quasi-identifier (nation, segment) leaves each
row; l-diversity says whether a re-identified class still hides the
sensitive attribute (balance band); the DP model prices the epsilon=1
Laplace noise against each released count. Exactness: equivalence
classes fold exact int64; shares and expected errors are mirrored
doubles, x1e6/x1e9 snaps.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from mimirsbrunn_ray.stages.rollup import tree_merge

_K_THRESHOLD = 5
_L_THRESHOLD = 3
_DP_EPS = 1.0


def _round_half_away(x: np.ndarray) -> np.ndarray:
    return np.where(x >= 0, np.floor(x + 0.5), np.ceil(x - 0.5)).astype(
        np.int64
    )


def _round_half_away_x(x: np.ndarray, scale: float) -> np.ndarray:
    y = x * scale
    return np.where(y >= 0, np.floor(y + 0.5), np.ceil(y - 0.5)).astype(
        np.int64
    )


def _sum_by(t: pa.Table, keys: list[str], vals: list[str]) -> pa.Table:
    g = t.group_by(keys).aggregate([(v, "sum") for v in vals])
    g = g.select(keys + [f"{v}_sum" for v in vals])
    return g.rename_columns(keys + vals)


def _clean(b: pa.Table, cols) -> pa.Table:
    m = None
    for c in cols:
        v = pc.is_valid(b[c])
        m = v if m is None else pc.and_(m, v)
    return b.filter(m)


def _qi_classes(sf_dir) -> pd.DataFrame:
    """Exact equivalence classes of the (nationkey, mktsegment) quasi-
    identifier with per-class row counts — bounded: 25 x 5 classes."""
    cust = rd.read_parquet(
        f"{sf_dir}/customer.parquet",
        columns=["c_nationkey", "c_mktsegment"],
    )

    def partial(b: pa.Table) -> pa.Table:
        b = _clean(b, ("c_nationkey", "c_mktsegment"))
        t = pa.table(
            {
                "nk": b["c_nationkey"].cast(pa.int64()),
                "seg": b["c_mktsegment"],
                "c": pa.array(np.ones(b.num_rows, np.int64)),
            }
        )
        return _sum_by(t, ["nk", "seg"], ["c"])

    return tree_merge(
        cust.map_batches(partial, batch_format="pyarrow", batch_size=None),
        lambda b: _sum_by(b, ["nk", "seg"], ["c"]),
    ).to_pandas()


# ---------------------------------------------------------------------------
# k-anonymity audit
# ---------------------------------------------------------------------------


def q_k_anonymity_customer(sf_dir):
    """One-row k-anonymity audit of the customer table under the
    quasi-identifier (nationkey, mktsegment): the number of equivalence
    classes, the minimum class size k (every row is hidden among at
    least k look-alikes), and the count/share of ROWS whose class falls
    below k = 5 — the release gate before sharing any customer-derived
    extract. Classes fold exact int64; the share is one mirrored
    double, x1e6 snap."""
    cls = _qi_classes(sf_dir)
    if not len(cls) or "c" not in cls.columns:
        return pa.table(
            {
                "n_rows": pa.array([0], pa.int64()),
                "n_classes": pa.array([0], pa.int64()),
                "min_k": pa.array([None], pa.int64()),
                "rows_below_k": pa.array([0], pa.int64()),
                "share_x1e6": pa.array([None], pa.int64()),
            }
        )
    c = cls["c"].to_numpy(dtype=np.int64)
    n = int(c.sum())
    below = int(c[c < _K_THRESHOLD].sum())
    return pa.table(
        {
            "n_rows": pa.array([n], pa.int64()),
            "n_classes": pa.array([len(c)], pa.int64()),
            "min_k": pa.array([int(c.min())], pa.int64()),
            "rows_below_k": pa.array([below], pa.int64()),
            "share_x1e6": pa.array(
                [
                    None
                    if n == 0
                    else int(
                        _round_half_away(np.array([float(below) / n * 1e6]))[0]
                    )
                ],
                pa.int64(),
            ),
        }
    )


K_ANON_SQL = f"""
WITH cls AS MATERIALIZED (
  SELECT c_nationkey AS nk, c_mktsegment AS seg,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM customer
  WHERE c_nationkey IS NOT NULL AND c_mktsegment IS NOT NULL
  GROUP BY 1, 2
)
SELECT CAST(SUM(c) AS BIGINT) AS n_rows,
       CAST(COUNT(*) AS BIGINT) AS n_classes,
       CAST(MIN(c) AS BIGINT) AS min_k,
       CAST(SUM(CASE WHEN c < {_K_THRESHOLD} THEN c ELSE 0 END) AS BIGINT)
         AS rows_below_k,
       CASE WHEN SUM(c) = 0 THEN NULL
            ELSE CAST(ROUND(CAST(SUM(CASE WHEN c < {_K_THRESHOLD}
                                          THEN c ELSE 0 END) AS DOUBLE)
                   / SUM(c) * 1000000, 0) AS BIGINT) END AS share_x1e6
FROM cls
"""


# ---------------------------------------------------------------------------
# l-diversity audit
# ---------------------------------------------------------------------------


def q_l_diversity_customer(sf_dir):
    """One-row l-diversity audit: within each (nationkey, mktsegment)
    quasi-identifier class, how many DISTINCT sensitive values (account
    balance banded to $1000) the class exposes — min l over classes and
    the count of classes below l = 3 (a k-anonymous class with one
    balance band still leaks the balance; l-diversity closes that
    hole). Distinct (class, band) pairs fold exactly via the grouped
    contingency; all integers except the one mirrored share, x1e6."""
    cust = rd.read_parquet(
        f"{sf_dir}/customer.parquet",
        columns=["c_nationkey", "c_mktsegment", "c_acctbal"],
    )

    def partial(b: pa.Table) -> pa.Table:
        b = _clean(b, ("c_nationkey", "c_mktsegment", "c_acctbal"))
        cents = _round_half_away_x(
            b["c_acctbal"].to_numpy(zero_copy_only=False).astype(np.float64),
            100.0,
        )
        # $1000 bands of cents, TRUNCATED toward zero (DuckDB // mirror)
        band = np.sign(cents) * (np.abs(cents) // 100_000)
        t = pa.table(
            {
                "nk": b["c_nationkey"].cast(pa.int64()),
                "seg": b["c_mktsegment"],
                "band": pa.array(band.astype(np.int64)),
                "c": pa.array(np.ones(b.num_rows, np.int64)),
            }
        )
        return _sum_by(t, ["nk", "seg", "band"], ["c"])

    cells = tree_merge(
        cust.map_batches(partial, batch_format="pyarrow", batch_size=None),
        lambda b: _sum_by(b, ["nk", "seg", "band"], ["c"]),
    ).to_pandas()  # bounded: classes x bands
    if not len(cells) or "nk" not in cells.columns:
        return pa.table(
            {
                "n_classes": pa.array([0], pa.int64()),
                "min_l": pa.array([None], pa.int64()),
                "classes_below_l": pa.array([0], pa.int64()),
                "share_x1e6": pa.array([None], pa.int64()),
            }
        )
    per_class = cells.groupby(["nk", "seg"]).size()
    k = len(per_class)
    below = int((per_class < _L_THRESHOLD).sum())
    return pa.table(
        {
            "n_classes": pa.array([k], pa.int64()),
            "min_l": pa.array([int(per_class.min())], pa.int64()),
            "classes_below_l": pa.array([below], pa.int64()),
            "share_x1e6": pa.array(
                [
                    None
                    if k == 0
                    else int(
                        _round_half_away(np.array([float(below) / k * 1e6]))[0]
                    )
                ],
                pa.int64(),
            ),
        }
    )


L_DIV_SQL = f"""
WITH cells AS MATERIALIZED (
  SELECT c_nationkey AS nk, c_mktsegment AS seg,
         CAST(ROUND(c_acctbal * 100, 0) AS BIGINT) // 100000 AS band
  FROM customer
  WHERE c_nationkey IS NOT NULL AND c_mktsegment IS NOT NULL
    AND c_acctbal IS NOT NULL
  GROUP BY 1, 2, 3
), per AS MATERIALIZED (
  SELECT nk, seg, CAST(COUNT(*) AS BIGINT) AS l FROM cells GROUP BY 1, 2
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_classes,
       CAST(MIN(l) AS BIGINT) AS min_l,
       CAST(SUM(CASE WHEN l < {_L_THRESHOLD} THEN 1 ELSE 0 END) AS BIGINT)
         AS classes_below_l,
       CASE WHEN COUNT(*) = 0 THEN NULL
            ELSE CAST(ROUND(CAST(SUM(CASE WHEN l < {_L_THRESHOLD}
                                          THEN 1 ELSE 0 END) AS DOUBLE)
                   / COUNT(*) * 1000000, 0) AS BIGINT) END AS share_x1e6
FROM per
"""


# ---------------------------------------------------------------------------
# differential-privacy count error model
# ---------------------------------------------------------------------------


def q_dp_count_error_model(sf_dir):
    """Per event type: the epsilon = 1 Laplace mechanism's error model
    for releasing the type's event count — expected absolute noise
    E|Lap(1/eps)| = 1/eps and the RELATIVE error it inflicts on this
    count (x1e9; the release-utility check: counts whose relative error
    crosses ~1e-3 need aggregation before release). Counts exact; the
    relative error is one mirrored double per type."""
    ev = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_type"])

    def partial(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_valid(b["event_type"]))
        t = pa.table(
            {
                "event_type": b["event_type"],
                "c": pa.array(np.ones(b.num_rows, np.int64)),
            }
        )
        return _sum_by(t, ["event_type"], ["c"])

    agg = tree_merge(
        ev.map_batches(partial, batch_format="pyarrow", batch_size=None),
        lambda b: _sum_by(b, ["event_type"], ["c"]),
    ).to_pandas()
    if not len(agg) or "event_type" not in agg.columns:
        return pa.table(
            {
                "event_type": pa.array([], pa.string()),
                "n": pa.array([], pa.int64()),
                "rel_err_x1e9": pa.array([], pa.int64()),
            }
        )
    agg = agg.sort_values("event_type", ignore_index=True)
    n = agg["c"].to_numpy(dtype=np.int64)
    rel = [
        None
        if v == 0
        else int(
            _round_half_away(np.array([(1.0 / _DP_EPS) / v * 1e9]))[0]
        )
        for v in n
    ]
    return pa.table(
        {
            "event_type": pa.array(agg["event_type"].tolist(), pa.string()),
            "n": pa.array(n),
            "rel_err_x1e9": pa.array(rel, pa.int64()),
        }
    )


DP_ERR_SQL = f"""
SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
       CASE WHEN COUNT(*) = 0 THEN NULL
            ELSE CAST(ROUND((1.0 / {_DP_EPS!r}) / COUNT(*)
                 * 1000000000, 0) AS BIGINT) END AS rel_err_x1e9
FROM events WHERE event_type IS NOT NULL
GROUP BY 1 ORDER BY 1
"""


def register_r4dn(queries: dict, oracles: dict) -> None:
    queries.update(
        {
            "k_anonymity_customer": q_k_anonymity_customer,
            "l_diversity_customer": q_l_diversity_customer,
            "dp_count_error_model": q_dp_count_error_model,
        }
    )
    oracles.update(
        {
            "k_anonymity_customer": K_ANON_SQL,
            "l_diversity_customer": L_DIV_SQL,
            "dp_count_error_model": DP_ERR_SQL,
        }
    )
