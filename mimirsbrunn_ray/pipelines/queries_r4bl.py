"""Round-4 batch BL: median absolute deviation of value, search
hit-rate probes, and a negative-balance audit.

Exactness discipline: MAD uses the exact histogram median then exact
integer absolute deviations; hit rates are exact match counts; the
balance audit is pure cents arithmetic.
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
# MAD of value around the median, per type
# ---------------------------------------------------------------------------


def q_value_mad_per_type(sf_dir):
    """Per event type: the exact sum of absolute cents deviations from
    the type's PERCENTILE_DISC median (MAD numerator; MAD = num/n) —
    the robust spread metric immune to the tails that inflate
    variance. Two streaming passes: the bounded cents histogram gives
    the exact median; the deviation pass sums |x - med| as integers."""
    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "value"]
    )

    def hist_partial(b: pa.Table) -> pa.Table:
        b = b.filter(
            pc.and_(pc.is_valid(b["event_type"]), pc.is_valid(b["value"]))
        )
        x = _round_half_away(
            b["value"].cast(pa.float64()).to_numpy(zero_copy_only=False)
            * 100.0
        )
        t = pa.table({"event_type": b["event_type"], "v": pa.array(x)})
        g = t.group_by(["event_type", "v"]).aggregate([([], "count_all")])
        g = g.select(["event_type", "v", "count_all"])
        return g.rename_columns(["event_type", "v", "n"])

    def hist_combine(b: pa.Table) -> pa.Table:
        g = b.group_by(["event_type", "v"]).aggregate([("n", "sum")])
        return g.rename_columns(["event_type", "v", "n"])

    hist = tree_merge(
        ev.map_batches(hist_partial, batch_format="pyarrow",
                       batch_size=None),
        hist_combine,
    ).to_pandas()

    med: dict[str, int] = {}
    if len(hist):
        for et, g in hist.groupby("event_type"):
            g = g.sort_values("v")
            v = g["v"].to_numpy(dtype=np.int64)
            cum = np.cumsum(g["n"].to_numpy(dtype=np.int64))
            rank = int(np.ceil(0.5 * int(cum[-1]) - 1e-9))
            med[et] = int(v[np.searchsorted(cum, rank, "left")])
    import ray

    med_ref = ray.put(med)

    def dev_partial(b: pa.Table) -> pa.Table:
        m = ray.get(med_ref)
        b = b.filter(
            pc.and_(pc.is_valid(b["event_type"]), pc.is_valid(b["value"]))
        )
        empty = pa.table(
            {
                "event_type": pa.array([], pa.string()),
                "n": pa.array([], pa.int64()),
                "median_x100": pa.array([], pa.int64()),
                "mad_num_x100": pa.array([], pa.int64()),
            }
        )
        if b.num_rows == 0:
            return empty
        et = b["event_type"].to_numpy(zero_copy_only=False)
        x = _round_half_away(
            b["value"].cast(pa.float64()).to_numpy(zero_copy_only=False)
            * 100.0
        )
        mm = np.empty(len(x), dtype=np.int64)
        for s in pd.unique(et):
            mm[et == s] = m[s]
        t = pa.table(
            {
                "event_type": b["event_type"],
                "one": pa.array(np.ones(len(x), np.int64)),
                "med": pa.array(mm),
                "dev": pa.array(np.abs(x - mm)),
            }
        )
        g = t.group_by(["event_type"]).aggregate(
            [("one", "sum"), ("med", "min"), ("dev", "sum")]
        )
        g = g.select(["event_type", "one_sum", "med_min", "dev_sum"])
        return g.rename_columns(
            ["event_type", "n", "median_x100", "mad_num_x100"]
        )

    def dev_combine(b: pa.Table) -> pa.Table:
        g = b.group_by(["event_type"]).aggregate(
            [("n", "sum"), ("median_x100", "min"),
             ("mad_num_x100", "sum")]
        )
        return g.rename_columns(
            ["event_type", "n", "median_x100", "mad_num_x100"]
        )

    return tree_merge(
        ev.map_batches(dev_partial, batch_format="pyarrow",
                       batch_size=None),
        dev_combine,
    )


MAD_SQL = """
WITH v AS MATERIALIZED (
  SELECT event_type, CAST(ROUND(value * 100, 0) AS BIGINT) AS x
  FROM events
  WHERE event_type IS NOT NULL AND value IS NOT NULL
), m AS (
  SELECT event_type, CAST(quantile_disc(x, 0.5) AS BIGINT) AS med
  FROM v GROUP BY 1
)
SELECT v.event_type, CAST(COUNT(*) AS BIGINT) AS n,
       m.med AS median_x100,
       CAST(SUM(ABS(v.x - m.med)) AS BIGINT) AS mad_num_x100
FROM v JOIN m USING (event_type)
GROUP BY v.event_type, m.med
"""


# ---------------------------------------------------------------------------
# search hit-rate probes
# ---------------------------------------------------------------------------

_HIT_PROBES = ("the ", "data ", "spark ", "vector ", "zzzz ")


def q_search_hit_rates(sf_dir):
    """Zero-result monitoring for the search layer: for each probe
    query, how many documents the exact-prefix pass would match — the
    hit-rate panel that catches analyzer or ingest regressions (a probe
    suddenly reading 0 means the corpus or the normalizer broke). One
    streaming pass; all probes share the batch scan."""
    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])
    probes = list(_HIT_PROBES)

    def partial(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_valid(b["text"]))
        cols = {"probe": [], "n_hits": []}
        for p in probes:
            hit = pc.starts_with(b["text"], pattern=p)
            cols["probe"].append(p)
            cols["n_hits"].append(
                int(pc.sum(pc.cast(hit, pa.int64())).as_py() or 0)
            )
        return pa.table(
            {
                "probe": pa.array(cols["probe"], pa.string()),
                "n_hits": pa.array(cols["n_hits"], pa.int64()),
            }
        )

    def combine(b: pa.Table) -> pa.Table:
        g = b.group_by(["probe"]).aggregate([("n_hits", "sum")])
        return g.rename_columns(["probe", "n_hits"])

    return tree_merge(
        docs.map_batches(partial, batch_format="pyarrow", batch_size=None),
        combine,
    )


_probe_rows = "\nUNION ALL\n".join(
    f"SELECT '{p}' AS probe, CAST(SUM(CASE WHEN starts_with(text, '{p}')"
    f" THEN 1 ELSE 0 END) AS BIGINT) AS n_hits"
    " FROM documents WHERE text IS NOT NULL"
    for p in _HIT_PROBES
)
HIT_RATES_SQL = _probe_rows


# ---------------------------------------------------------------------------
# negative balance audit by market segment
# ---------------------------------------------------------------------------


def q_negative_balance_by_segment(sf_dir):
    """Per market segment: customers in arrears (negative account
    balance), with the exact cents they owe — the receivables-risk cut.
    One decomposable pass over the customer dimension."""
    cust = rd.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_mktsegment", "c_acctbal"]
    )

    def partial(b: pa.Table) -> pa.Table:
        b = b.filter(
            pc.and_(
                pc.is_valid(b["c_mktsegment"]), pc.is_valid(b["c_acctbal"])
            )
        )
        x = _round_half_away(
            b["c_acctbal"].cast(pa.float64()).to_numpy(
                zero_copy_only=False
            )
            * 100.0
        )
        neg = (x < 0).astype(np.int64)
        t = pa.table(
            {
                "c_mktsegment": b["c_mktsegment"],
                "one": pa.array(np.ones(len(x), np.int64)),
                "neg": pa.array(neg),
                "owed": pa.array(np.where(x < 0, -x, 0)),
            }
        )
        g = t.group_by(["c_mktsegment"]).aggregate(
            [("one", "sum"), ("neg", "sum"), ("owed", "sum")]
        )
        g = g.select(["c_mktsegment", "one_sum", "neg_sum", "owed_sum"])
        return g.rename_columns(
            ["c_mktsegment", "n_customers", "n_negative", "owed_x100"]
        )

    def combine(b: pa.Table) -> pa.Table:
        g = b.group_by(["c_mktsegment"]).aggregate(
            [("n_customers", "sum"), ("n_negative", "sum"),
             ("owed_x100", "sum")]
        )
        return g.rename_columns(
            ["c_mktsegment", "n_customers", "n_negative", "owed_x100"]
        )

    return tree_merge(
        cust.map_batches(partial, batch_format="pyarrow", batch_size=None),
        combine,
    )


NEGATIVE_BAL_SQL = """
WITH v AS (
  SELECT c_mktsegment,
         CAST(ROUND(c_acctbal * 100, 0) AS BIGINT) AS x
  FROM customer
  WHERE c_mktsegment IS NOT NULL AND c_acctbal IS NOT NULL
)
SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n_customers,
       CAST(SUM(CASE WHEN x < 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_negative,
       CAST(SUM(CASE WHEN x < 0 THEN -x ELSE 0 END) AS BIGINT)
         AS owed_x100
FROM v GROUP BY 1
"""


def register_r4bl(queries: dict, oracles: dict) -> None:
    queries.update(
        {
            "value_mad_per_type": q_value_mad_per_type,
            "search_hit_rates": q_search_hit_rates,
            "negative_balance_by_segment": q_negative_balance_by_segment,
        }
    )
    oracles.update(
        {
            "value_mad_per_type": MAD_SQL,
            "search_hit_rates": HIT_RATES_SQL,
            "negative_balance_by_segment": NEGATIVE_BAL_SQL,
        }
    )
