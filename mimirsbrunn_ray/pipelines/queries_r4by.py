"""Round-4 batch BY: n_chars consistency audit, intra-order value
concentration, and per-brand size-price Pearson correlation.

Exactness discipline: the audit is pure integer counts; per-order HHI
snaps to x1e6 fixed point through the identical double ratio before
an integer histogram rank rule; Pearson folds exact int64 sufficient
statistics into the same closed-form double expression both engines
evaluate (the spearman_value_hour discipline).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from mimirsbrunn_ray.stages.rollup import tree_merge


def _round_half_away(x: np.ndarray) -> np.ndarray:
    return np.where(
        x >= 0, np.floor(x + 0.5), np.ceil(x - 0.5)
    ).astype(np.int64)


# ---------------------------------------------------------------------------
# n_chars vs text-length consistency audit
# ---------------------------------------------------------------------------


def q_nchars_consistency_audit(sf_dir):
    """Per source: rows whose stored n_chars DISAGREES with the actual
    character length of text — the derived-column drift audit an
    ingest pipeline runs before trusting precomputed lengths (the
    reference validates derived fields at parse time the same way).
    One streaming pass; pure integer counts."""
    docs = rd.read_parquet(
        f"{sf_dir}/documents.parquet",
        columns=["source", "text", "n_chars"],
    )

    def partial(b: pa.Table) -> pa.Table:
        b = b.filter(
            pc.and_(
                pc.and_(
                    pc.is_valid(b["source"]), pc.is_valid(b["text"])
                ),
                pc.is_valid(b["n_chars"]),
            )
        )
        actual = pc.utf8_length(b["text"]).cast(pa.int64())
        stored = b["n_chars"].cast(pa.int64())
        bad = pc.not_equal(actual, stored)
        t = pa.table(
            {
                "source": b["source"],
                "one": pa.array(np.ones(b.num_rows, dtype=np.int64)),
                "bad": bad.cast(pa.int64()),
            }
        )
        g = t.group_by(["source"]).aggregate(
            [("one", "sum"), ("bad", "sum")]
        )
        g = g.select(["source", "one_sum", "bad_sum"])
        return g.rename_columns(["source", "n_rows", "n_mismatch"])

    def combine(b: pa.Table) -> pa.Table:
        g = b.group_by(["source"]).aggregate(
            [("n_rows", "sum"), ("n_mismatch", "sum")]
        )
        return g.rename_columns(["source", "n_rows", "n_mismatch"])

    m = tree_merge(
        docs.map_batches(partial, batch_format="pyarrow",
                         batch_size=None),
        combine,
    ).to_pandas()

    if not len(m) or "source" not in m.columns:
        return pa.table(
            {
                "source": pa.array([], pa.string()),
                "n_rows": pa.array([], pa.int64()),
                "n_mismatch": pa.array([], pa.int64()),
            }
        )
    m = m.sort_values("source", ignore_index=True)
    return pa.table(
        {
            "source": pa.array(m["source"], pa.string()),
            "n_rows": pa.array(m["n_rows"].to_numpy(dtype=np.int64)),
            "n_mismatch": pa.array(
                m["n_mismatch"].to_numpy(dtype=np.int64)
            ),
        }
    )


NCHARS_SQL = """
SELECT source, CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CASE WHEN LENGTH(text) <> n_chars THEN 1 ELSE 0 END)
            AS BIGINT) AS n_mismatch
FROM documents
WHERE source IS NOT NULL AND text IS NOT NULL AND n_chars IS NOT NULL
GROUP BY 1 ORDER BY 1
"""


# ---------------------------------------------------------------------------
# intra-order line-value concentration (HHI) quantiles
# ---------------------------------------------------------------------------


def q_order_line_hhi(sf_dir):
    """Exact p25/p50/p75/p90 of the intra-order Herfindahl index of
    line VALUES — is an order one big line plus noise (HHI near 1e6)
    or evenly split across lines? Per-order sums resolve via
    sorted-run reduceat inside order-disjoint hash shards; each
    order's HHI snaps to x1e6 through the identical double ratio, and
    quantiles ride the bounded-domain integer rank rule."""
    from mimirsbrunn_ray.stages.dedup import _BUCKET, add_bucket

    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice"],
    )

    def project(b: pa.Table) -> pa.Table:
        b = b.filter(
            pc.and_(
                pc.is_valid(b["l_orderkey"]),
                pc.is_valid(b["l_extendedprice"]),
            )
        )
        cents = _round_half_away(
            b["l_extendedprice"].cast(pa.float64()).to_numpy(
                zero_copy_only=False
            )
            * 100.0
        )
        t = pa.table(
            {"l_orderkey": b["l_orderkey"], "v": pa.array(cents)}
        )
        return add_bucket(t, "l_orderkey", 64)

    proj = li.map_batches(project, batch_format="pyarrow",
                          batch_size=None)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "h": pd.Series([], dtype=np.int64),
                "n": pd.Series([], dtype=np.int64),
            }
        )
        if len(g) == 0:
            return empty
        g = g.sort_values("l_orderkey", kind="stable")
        key = g["l_orderkey"].to_numpy()
        v = g["v"].to_numpy(dtype=np.int64)
        first = np.ones(len(g), dtype=bool)
        first[1:] = key[1:] != key[:-1]
        starts = np.flatnonzero(first)
        tot = np.add.reduceat(v, starts)
        sq = np.add.reduceat(v * v, starts)
        ok = tot > 0
        tf = tot[ok].astype(np.float64)
        hhi = _round_half_away(
            sq[ok].astype(np.float64) / (tf * tf) * 1000000.0
        )
        d = pd.DataFrame({"h": hhi})
        out = d.groupby("h").size().reset_index(name="n")
        return out.astype(np.int64)

    partials = proj.groupby(_BUCKET).map_groups(
        per_bucket, batch_format="pandas"
    )

    def combine(b: pa.Table) -> pa.Table:
        g = b.group_by(["h"]).aggregate([("n", "sum")])
        return g.rename_columns(["h", "n"])

    hist = tree_merge(partials, combine).to_pandas()

    out = {"n_orders": [0], "p25": [None], "p50": [None],
           "p75": [None], "p90": [None]}
    if len(hist) and "h" in hist.columns and len(hist["h"]):
        hist = hist.sort_values("h")
        v = hist["h"].to_numpy(dtype=np.int64)
        cum = np.cumsum(hist["n"].to_numpy(dtype=np.int64))
        total = int(cum[-1])
        out["n_orders"] = [total]
        for q, col in ((0.25, "p25"), (0.5, "p50"), (0.75, "p75"),
                       (0.9, "p90")):
            rank = int(np.ceil(q * total - 1e-9))
            out[col] = [int(v[np.searchsorted(cum, rank, "left")])]
    return pa.table(
        {
            "n_orders": pa.array(out["n_orders"], pa.int64()),
            "p25": pa.array(out["p25"], pa.int64()),
            "p50": pa.array(out["p50"], pa.int64()),
            "p75": pa.array(out["p75"], pa.int64()),
            "p90": pa.array(out["p90"], pa.int64()),
        }
    )


ORDER_HHI_SQL = """
WITH v AS (
  SELECT l_orderkey,
         CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT) AS v
  FROM lineitem
  WHERE l_orderkey IS NOT NULL AND l_extendedprice IS NOT NULL
), o AS (
  SELECT l_orderkey, CAST(SUM(v) AS BIGINT) AS tot,
         CAST(SUM(v * v) AS BIGINT) AS sq
  FROM v GROUP BY 1
), h AS (
  SELECT CAST(ROUND(CAST(sq AS DOUBLE)
                    / (CAST(tot AS DOUBLE) * CAST(tot AS DOUBLE))
                    * 1000000, 0) AS BIGINT) AS h
  FROM o WHERE tot > 0
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(quantile_disc(h, 0.25) AS BIGINT) AS p25,
       CAST(quantile_disc(h, 0.5) AS BIGINT) AS p50,
       CAST(quantile_disc(h, 0.75) AS BIGINT) AS p75,
       CAST(quantile_disc(h, 0.9) AS BIGINT) AS p90
FROM h
"""


# ---------------------------------------------------------------------------
# per-brand size-price Pearson correlation
# ---------------------------------------------------------------------------


def q_size_price_corr_by_brand(sf_dir):
    """Per-brand Pearson correlation between part size and retail
    price in cents — does the brand price a size ladder or flat-price
    its range? Exact int64 sufficient statistics (n, Sx, Sy, Sxx,
    Syy, Sxy) tree-merge; both engines evaluate the identical
    num / (sqrt(d1) * sqrt(d2)) double before one x1e6 rounding."""
    part = rd.read_parquet(
        f"{sf_dir}/part.parquet",
        columns=["p_brand", "p_size", "p_retailprice"],
    )

    def partial(b: pa.Table) -> pa.Table:
        b = b.filter(
            pc.and_(
                pc.and_(
                    pc.is_valid(b["p_brand"]), pc.is_valid(b["p_size"])
                ),
                pc.is_valid(b["p_retailprice"]),
            )
        )
        x = b["p_size"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        y = _round_half_away(
            b["p_retailprice"].cast(pa.float64()).to_numpy(
                zero_copy_only=False
            )
            * 100.0
        )
        t = pa.table(
            {
                "brand": b["p_brand"],
                "n": pa.array(np.ones(len(x), dtype=np.int64)),
                "sx": pa.array(x),
                "sy": pa.array(y),
                "sxx": pa.array(x * x),
                "syy": pa.array(y * y),
                "sxy": pa.array(x * y),
            }
        )
        g = t.group_by(["brand"]).aggregate(
            [("n", "sum"), ("sx", "sum"), ("sy", "sum"),
             ("sxx", "sum"), ("syy", "sum"), ("sxy", "sum")]
        )
        g = g.select(
            ["brand", "n_sum", "sx_sum", "sy_sum", "sxx_sum",
             "syy_sum", "sxy_sum"]
        )
        return g.rename_columns(
            ["brand", "n", "sx", "sy", "sxx", "syy", "sxy"]
        )

    def combine(b: pa.Table) -> pa.Table:
        g = b.group_by(["brand"]).aggregate(
            [("n", "sum"), ("sx", "sum"), ("sy", "sum"),
             ("sxx", "sum"), ("syy", "sum"), ("sxy", "sum")]
        )
        return g.rename_columns(
            ["brand", "n", "sx", "sy", "sxx", "syy", "sxy"]
        )

    m = tree_merge(
        part.map_batches(partial, batch_format="pyarrow",
                         batch_size=None),
        combine,
    ).to_pandas()  # bounded: one row per brand

    if not len(m) or "brand" not in m.columns:
        return pa.table(
            {
                "brand": pa.array([], pa.string()),
                "n": pa.array([], pa.int64()),
                "pearson_x1e6": pa.array([], pa.int64()),
            }
        )
    m = m.sort_values("brand", ignore_index=True)
    n = m["n"].to_numpy(dtype=np.int64)
    sx = m["sx"].to_numpy(dtype=np.int64)
    sy = m["sy"].to_numpy(dtype=np.int64)
    sxx = m["sxx"].to_numpy(dtype=np.int64)
    syy = m["syy"].to_numpy(dtype=np.int64)
    sxy = m["sxy"].to_numpy(dtype=np.int64)
    num = n * sxy - sx * sy
    d1 = n * sxx - sx * sx
    d2 = n * syy - sy * sy
    ok = (d1 > 0) & (d2 > 0)
    r = np.where(
        ok,
        num.astype(np.float64)
        / (np.sqrt(np.where(ok, d1, 1).astype(np.float64))
           * np.sqrt(np.where(ok, d2, 1).astype(np.float64))),
        np.nan,
    )
    vals = np.where(
        np.isnan(r), None, _round_half_away(np.nan_to_num(r) * 1e6)
    )
    return pa.table(
        {
            "brand": pa.array(m["brand"], pa.string()),
            "n": pa.array(n),
            "pearson_x1e6": pa.array(vals.tolist(), pa.int64()),
        }
    )


SIZE_PRICE_SQL = """
WITH v AS (
  SELECT p_brand AS brand, CAST(p_size AS BIGINT) AS x,
         CAST(ROUND(p_retailprice * 100, 0) AS BIGINT) AS y
  FROM part
  WHERE p_brand IS NOT NULL AND p_size IS NOT NULL
    AND p_retailprice IS NOT NULL
), s AS (
  SELECT brand, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
         CAST(SUM(x * x) AS BIGINT) AS sxx,
         CAST(SUM(y * y) AS BIGINT) AS syy,
         CAST(SUM(x * y) AS BIGINT) AS sxy
  FROM v GROUP BY 1
)
SELECT brand, n,
       CASE WHEN n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0
            THEN CAST(ROUND(
              CAST(n * sxy - sx * sy AS DOUBLE)
              / (SQRT(CAST(n * sxx - sx * sx AS DOUBLE))
                 * SQRT(CAST(n * syy - sy * sy AS DOUBLE))) * 1000000,
              0) AS BIGINT)
            ELSE NULL END AS pearson_x1e6
FROM s ORDER BY brand
"""


def register_r4by(queries: dict, oracles: dict) -> None:
    queries.update(
        {
            "nchars_consistency_audit": q_nchars_consistency_audit,
            "order_line_hhi": q_order_line_hhi,
            "size_price_corr_by_brand": q_size_price_corr_by_brand,
        }
    )
    oracles.update(
        {
            "nchars_consistency_audit": NCHARS_SQL,
            "order_line_hhi": ORDER_HHI_SQL,
            "size_price_corr_by_brand": SIZE_PRICE_SQL,
        }
    )
