"""Round-4 batch IR: tail spikiness, wealth × segment
independence, and lexical extremes — the value spike factor per
event type (p99 over p50: how many medians tall is the
99th-percentile event — the alert-threshold calibration number),
the segment × balance-quartile chi-square (does market segment
carry any wealth signal at all?), and the longest-word census
per source (mean and max of each doc's longest token — URL and
hash contamination shows up as absurd maxima).

Exactness discipline: quantiles are interpolated identically on
both sides over exact mills; quartile bands use integer ranks
with deterministic tie-break; word lengths are exact integers."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from mimirsbrunn_ray.pipelines.queries_r4fk import (
    _round_half_away,
)
from mimirsbrunn_ray.stages.dedup import _BUCKET, add_bucket
from mimirsbrunn_ray.stages.rollup import tree_merge


def _valid(b: pa.Table, cols) -> pa.Table:
    m = None
    for c in cols:
        v = pc.is_valid(b[c])
        m = v if m is None else pc.and_(m, v)
    return b.filter(m)


_SPF_COLS = ["event_type", "n_events", "p50_x1e3", "p99_x1e3",
             "spike_factor_x1e3"]


def q_value_p99_p50_by_type(sf_dir):
    """Alert-threshold calibration: per event type, the median
    and 99th percentile of value and their ratio — a spike
    factor of 3 needs very different alerting than one of 300.
    Whole types resolve in hash buckets with interpolated
    percentiles mirrored."""
    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "value"])

    def project(b: pa.Table) -> pa.Table:
        b = _valid(b, ("event_type", "value"))
        if b.num_rows == 0:
            return pa.table({
                "et": pa.array([], pa.string()),
                "m": pa.array([], pa.int64()),
                "_dedup_bucket": pa.array([], pa.int32()),
            })
        v = b["value"].cast(pa.float64()).to_numpy(
            zero_copy_only=False)
        mills = np.where(v >= 0, np.floor(v * 1000 + 0.5),
                         np.ceil(v * 1000 - 0.5)).astype(
            np.int64)
        t = pa.table({
            "et": b["event_type"].cast(pa.string()),
            "m": pa.array(mills),
        })
        return add_bucket(t, "et", 16)

    def stats(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({
            "event_type": pd.Series([], dtype=object),
            "n_events": pd.Series([], dtype=np.int64),
            "p50_x1e3": pd.Series([], dtype=np.int64),
            "p99_x1e3": pd.Series([], dtype=np.int64),
            "spike_factor_x1e3": pd.Series([], dtype=np.int64),
        })
        if len(g) == 0:
            return empty
        rows = []
        for et, sub in g.groupby("et"):
            v = sub["m"].to_numpy(np.int64).astype(np.float64)
            p50 = float(np.percentile(v, 50))
            p99 = float(np.percentile(v, 99))
            if p50 == 0:
                continue
            rows.append({
                "event_type": et,
                "n_events": np.int64(len(v)),
                "p50_x1e3": np.int64(_round_half_away(p50)),
                "p99_x1e3": np.int64(_round_half_away(p99)),
                "spike_factor_x1e3": np.int64(
                    _round_half_away(p99 / p50 * 1e3)),
            })
        return pd.DataFrame(rows)

    out = (
        ev.map_batches(project, batch_format="pyarrow",
                       batch_size=None)
        .groupby(_BUCKET)
        .map_groups(stats, batch_format="pandas")
        .to_pandas()
    )
    if "event_type" not in out.columns or len(out) == 0:
        return pa.table({
            "event_type": pa.array([], pa.string()),
            "n_events": pa.array([], pa.int64()),
            "p50_x1e3": pa.array([], pa.int64()),
            "p99_x1e3": pa.array([], pa.int64()),
            "spike_factor_x1e3": pa.array([], pa.int64()),
        })
    out = out.sort_values("event_type")
    return pa.table({
        "event_type": pa.array(out["event_type"], pa.string()),
        "n_events": pa.array(
            out["n_events"].to_numpy(np.int64), pa.int64()),
        "p50_x1e3": pa.array(
            out["p50_x1e3"].to_numpy(np.int64), pa.int64()),
        "p99_x1e3": pa.array(
            out["p99_x1e3"].to_numpy(np.int64), pa.int64()),
        "spike_factor_x1e3": pa.array(
            out["spike_factor_x1e3"].to_numpy(np.int64),
            pa.int64()),
    })


SPF_SQL = """
WITH v AS MATERIALIZED (
  SELECT event_type AS et,
         CAST(ROUND(value * 1000, 0) AS BIGINT) AS m
  FROM events
  WHERE event_type IS NOT NULL AND value IS NOT NULL
), q AS MATERIALIZED (
  SELECT et, CAST(COUNT(*) AS BIGINT) AS n,
         QUANTILE_CONT(m, 0.50) AS p50,
         QUANTILE_CONT(m, 0.99) AS p99
  FROM v GROUP BY 1
)
SELECT et AS event_type, n AS n_events,
       CAST(ROUND(p50, 0) AS BIGINT) AS p50_x1e3,
       CAST(ROUND(p99, 0) AS BIGINT) AS p99_x1e3,
       CAST(ROUND(p99 / p50 * 1000, 0) AS BIGINT)
         AS spike_factor_x1e3
FROM q
WHERE p50 <> 0
ORDER BY et
"""

_SBC_COLS = ["n_customers", "n_segments", "chi2_x1e3",
             "cramers_v_ppm"]


def q_segment_balance_chisq(sf_dir):
    """Does market segment carry wealth signal?  Chi-square (and
    Cramér's V) between mktsegment and the customer's
    balance-quartile band (integer ranks, ties broken by
    custkey) — independence means segment targeting says nothing
    about ability to pay.  The 4×k contingency builds from exact
    counts."""
    # scale shape: the quartile cut resolves via a distributed balance
    # histogram + bounded straddle pulls (stages/exactrank.py); the 4xk
    # contingency folds as per-batch partials — customer never lands
    # whole on the driver.
    from mimirsbrunn_ray.stages.exactrank import band_of, rank_band_lut

    def cust_proj(b: pa.Table) -> pa.Table:
        m = pc.and_(pc.and_(pc.is_valid(b["c_custkey"]),
                            pc.is_valid(b["c_acctbal"])),
                    pc.is_valid(b["c_mktsegment"]))
        b = b.filter(m)
        bal = b["c_acctbal"].to_numpy(zero_copy_only=False).astype(
            np.float64)
        cents = np.where(bal >= 0, np.floor(bal * 100 + 0.5),
                         np.ceil(bal * 100 - 0.5)).astype(np.int64)
        return pa.table({
            "ck": b["c_custkey"].cast(pa.int64()),
            "cents": pa.array(cents),
            "seg": b["c_mktsegment"],
        })

    cust_ds = rd.read_parquet(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_acctbal", "c_mktsegment"],
    ).map_batches(cust_proj, batch_format="pyarrow",
                  batch_size=None).materialize()
    lut, n = rank_band_lut(cust_ds, "cents", "ck", 4)
    if lut is None:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _SBC_COLS})

    def cell_part(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"band": pa.array([], pa.int64()),
                             "seg": pa.array([], pa.string()),
                             "cnt": pa.array([], pa.int64())})
        band = band_of(b["cents"].to_numpy(zero_copy_only=False),
                       b["ck"].to_numpy(zero_copy_only=False), lut)
        t = pa.table({"band": pa.array(band), "seg": b["seg"],
                      "cnt": pa.array(np.ones(len(band), np.int64))})
        g = t.group_by(["band", "seg"]).aggregate([("cnt", "sum")])
        return g.rename_columns(["band", "seg", "cnt"])

    cells = cust_ds.map_batches(
        cell_part, batch_format="pyarrow", batch_size=None).to_pandas()
    cells = cells.groupby(["band", "seg"], as_index=False)["cnt"].sum()
    piv = cells.pivot_table(index="band", columns="seg", values="cnt",
                            fill_value=0, aggfunc="sum")
    m = piv.to_numpy(np.float64)
    r, c = m.shape
    if r < 2 or c < 2:
        return pa.table(
            {c2: pa.array([], pa.int64()) for c2 in _SBC_COLS})
    row = m.sum(axis=1)
    col = m.sum(axis=0)
    exp = np.outer(row, col) / n
    chi2 = float(((m - exp) ** 2 / exp).sum())
    v = float(np.sqrt(chi2 / (n * min(r - 1, c - 1))))
    return pa.table({
        "n_customers": pa.array([n], pa.int64()),
        "n_segments": pa.array([c], pa.int64()),
        "chi2_x1e3": pa.array(
            [_round_half_away(chi2 * 1e3)], pa.int64()),
        "cramers_v_ppm": pa.array(
            [_round_half_away(v * 1e6)], pa.int64()),
    })


SBC_SQL = """
WITH cb AS MATERIALIZED (
  SELECT c_custkey AS ck, c_mktsegment AS seg,
         CAST(ROUND(c_acctbal * 100, 0) AS BIGINT) AS cents
  FROM customer
  WHERE c_custkey IS NOT NULL AND c_acctbal IS NOT NULL
    AND c_mktsegment IS NOT NULL
), rk AS MATERIALIZED (
  SELECT seg,
         (4 * (ROW_NUMBER() OVER (ORDER BY cents, ck) - 1))
           // (SELECT COUNT(*) FROM cb) AS band
  FROM cb
), cell AS MATERIALIZED (
  SELECT band, seg, CAST(COUNT(*) AS BIGINT) AS n
  FROM rk GROUP BY 1, 2
), rows_ AS MATERIALIZED (
  SELECT band, CAST(SUM(n) AS BIGINT) AS rn
  FROM cell GROUP BY 1
), cols_ AS MATERIALIZED (
  SELECT seg, CAST(SUM(n) AS BIGINT) AS cn
  FROM cell GROUP BY 1
), tot AS MATERIALIZED (
  SELECT CAST(SUM(n) AS BIGINT) AS n,
         (SELECT COUNT(*) FROM rows_) AS r,
         (SELECT COUNT(*) FROM cols_) AS c
  FROM cell
), grid AS MATERIALIZED (
  SELECT rows_.band, cols_.seg,
         COALESCE(cell.n, 0) AS o,
         CAST(rows_.rn AS DOUBLE) * cols_.cn / tot.n AS e
  FROM rows_ CROSS JOIN cols_ CROSS JOIN tot
  LEFT JOIN cell ON cell.band = rows_.band
                AND cell.seg = cols_.seg
), chi AS MATERIALIZED (
  SELECT SUM((o - e) * (o - e) / e) AS chi2
  FROM grid WHERE e > 0
)
SELECT tot.n AS n_customers,
       CAST(tot.c AS BIGINT) AS n_segments,
       CAST(ROUND(chi.chi2 * 1000, 0) AS BIGINT) AS chi2_x1e3,
       CAST(ROUND(SQRT(chi.chi2 / (tot.n *
            LEAST(tot.r - 1, tot.c - 1))) * 1000000, 0)
            AS BIGINT) AS cramers_v_ppm
FROM tot CROSS JOIN chi
WHERE tot.n > 0 AND tot.r >= 2 AND tot.c >= 2
"""

_LWS_COLS = ["source", "n_docs", "mean_longest_x1e3",
             "max_longest"]


def q_longest_word_by_source(sf_dir):
    """URL and hash contamination: per source, the mean and max
    of each document's LONGEST whitespace token — prose tops out
    near 20 chars, so an absurd max is a leaked URL, hash or
    base64 blob.  Per-doc maxima are exact integers; sums fold
    exactly."""
    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["source", "text"])

    def part(b: pa.Table) -> pa.Table:
        b = _valid(b, ("source", "text"))
        if b.num_rows == 0:
            return pa.table({
                "source": pa.array([], pa.string()),
                "n": pa.array([], pa.int64()),
                "s": pa.array([], pa.int64()),
                "mx": pa.array([], pa.int64()),
            })
        words = pc.split_pattern(b["text"], " ")
        wl = words.to_pylist()
        longest = np.array(
            [max((len(w) for w in lst), default=0)
             for lst in wl], np.int64)
        df = pd.DataFrame({
            "source": np.asarray(
                b["source"].to_numpy(zero_copy_only=False)),
            "n": 1, "s": longest, "mx": longest,
        })
        agg = df.groupby("source").agg(
            n=("n", "sum"), s=("s", "sum"),
            mx=("mx", "max")).reset_index()
        for c in ["n", "s", "mx"]:
            agg[c] = agg[c].astype(np.int64)
        return pa.Table.from_pandas(agg, preserve_index=False)

    def comb(b: pa.Table) -> pa.Table:
        g = b.group_by(["source"]).aggregate(
            [("n", "sum"), ("s", "sum"), ("mx", "max")])
        return g.rename_columns(["source", "n", "s", "mx"])

    cc = tree_merge(
        docs.map_batches(part, batch_format="pyarrow",
                         batch_size=None), comb).to_pandas()
    if "source" not in cc.columns or len(cc) == 0:
        return pa.table({
            "source": pa.array([], pa.string()),
            "n_docs": pa.array([], pa.int64()),
            "mean_longest_x1e3": pa.array([], pa.int64()),
            "max_longest": pa.array([], pa.int64()),
        })
    cc = cc.sort_values("source")
    return pa.table({
        "source": pa.array(cc["source"], pa.string()),
        "n_docs": pa.array(
            cc["n"].to_numpy(np.int64), pa.int64()),
        "mean_longest_x1e3": pa.array(
            [_round_half_away(s / n * 1e3)
             for s, n in zip(cc["s"], cc["n"])], pa.int64()),
        "max_longest": pa.array(
            cc["mx"].to_numpy(np.int64), pa.int64()),
    })


LWS_SQL = """
WITH lw AS MATERIALIZED (
  SELECT source,
         COALESCE(LIST_MAX(LIST_TRANSFORM(
             STRING_SPLIT(text, ' '), x -> LENGTH(x))), 0)
           AS longest
  FROM documents
  WHERE source IS NOT NULL AND text IS NOT NULL
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(ROUND(CAST(SUM(longest) AS DOUBLE) / COUNT(*)
            * 1000, 0) AS BIGINT) AS mean_longest_x1e3,
       CAST(MAX(longest) AS BIGINT) AS max_longest
FROM lw
GROUP BY source
ORDER BY source
"""


def register_r4ir(queries: dict, oracles: dict) -> None:
    queries.update(
        {
            "value_p99_p50_by_type": q_value_p99_p50_by_type,
            "segment_balance_chisq": q_segment_balance_chisq,
            "longest_word_by_source": q_longest_word_by_source,
        }
    )
    oracles.update(
        {
            "value_p99_p50_by_type": SPF_SQL,
            "segment_balance_chisq": SBC_SQL,
            "longest_word_by_source": LWS_SQL,
        }
    )
