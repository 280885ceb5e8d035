"""Round-4 batch HG: status-field physics, fulfillment fan-out,
and cross-language vocabulary — the linestatus/ship-date
consistency audit (TPC-H's F/O statuses encode a date cutover; the
crosstab against the empirical boundary catches any loader that
shuffled the columns), the suppliers-per-order fan-out histogram
(how many suppliers a single order touches — every extra supplier
is another partial-shipment failure mode), and pairwise language
vocabulary overlap (Jaccard of word sets between langs — shared
tokens are where language-ID models hedge).

Exactness discipline: all three are pure integer set/count math;
only final shares divide once."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from mimirsbrunn_ray.pipelines.queries_r4fk import _round_half_away
from mimirsbrunn_ray.stages.rollup import tree_merge


def _valid(b: pa.Table, cols) -> pa.Table:
    m = None
    for c in cols:
        v = pc.is_valid(b[c])
        m = v if m is None else pc.and_(m, v)
    return b.filter(m)


_LSC_COLS = ["linestatus", "n_lines", "min_ship_day",
             "max_ship_day", "overlap_days"]


def q_linestatus_date_consistency(sf_dir):
    """Status-field physics: per linestatus the ship-date range
    (epoch days) and the size of the OVERLAP between the two
    statuses' ranges — in clean TPC-H data 'F' and 'O' split at a
    date cutover with near-zero overlap, so a large overlap means
    the loader or a join mixed rows across the boundary.  Min/max
    fold exactly; the overlap is integer interval math."""
    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_linestatus", "l_shipdate"])

    def part(b: pa.Table) -> pa.Table:
        b = _valid(b, ("l_linestatus", "l_shipdate"))
        if b.num_rows == 0:
            return pa.table({
                "ls": pa.array([], pa.string()),
                "mn": pa.array([], pa.int64()),
                "mx": pa.array([], pa.int64()),
                "n": pa.array([], pa.int64()),
            })
        day = pc.divide(
            b["l_shipdate"].cast(pa.timestamp("us")).cast(
                pa.int64()),
            86_400_000_000)
        t = pa.table({
            "ls": b["l_linestatus"],
            "mn": day, "mx": day,
            "n": pa.array(np.ones(b.num_rows, np.int64)),
        })
        g = t.group_by(["ls"]).aggregate(
            [("mn", "min"), ("mx", "max"), ("n", "sum")])
        return g.rename_columns(["ls", "mn", "mx", "n"])

    def comb(b: pa.Table) -> pa.Table:
        g = b.group_by(["ls"]).aggregate(
            [("mn", "min"), ("mx", "max"), ("n", "sum")])
        return g.rename_columns(["ls", "mn", "mx", "n"])

    cc = tree_merge(
        li.map_batches(part, batch_format="pyarrow",
                       batch_size=None),
        comb,
    ).to_pandas()
    if "ls" not in cc.columns or len(cc) == 0:
        return pa.table({
            "linestatus": pa.array([], pa.string()),
            **{c: pa.array([], pa.int64()) for c in _LSC_COLS[1:]},
        })
    cc = cc.sort_values("ls", ignore_index=True)
    # pairwise overlap vs the OTHER statuses' combined range
    rows = {c: [] for c in _LSC_COLS}
    for i, r in cc.iterrows():
        others = cc.drop(index=i)
        if len(others):
            omn = int(others["mn"].min())
            omx = int(others["mx"].max())
            ov = max(0, min(int(r["mx"]), omx)
                     - max(int(r["mn"]), omn) + 1)
        else:
            ov = 0
        rows["linestatus"].append(r["ls"])
        rows["n_lines"].append(int(r["n"]))
        rows["min_ship_day"].append(int(r["mn"]))
        rows["max_ship_day"].append(int(r["mx"]))
        rows["overlap_days"].append(ov)
    return pa.table({
        "linestatus": pa.array(rows["linestatus"], pa.string()),
        **{c: pa.array(rows[c], pa.int64())
           for c in _LSC_COLS[1:]},
    })


LSC_SQL = """
WITH st AS MATERIALIZED (
  SELECT l_linestatus AS ls,
         MIN(EPOCH_US(l_shipdate) // 86400000000) AS mn,
         MAX(EPOCH_US(l_shipdate) // 86400000000) AS mx,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM lineitem
  WHERE l_linestatus IS NOT NULL AND l_shipdate IS NOT NULL
  GROUP BY 1
), ov AS (
  SELECT a.ls, a.n, a.mn, a.mx,
         COALESCE(GREATEST(0,
           LEAST(a.mx, MAX(b.mx)) - GREATEST(a.mn, MIN(b.mn))
           + 1), 0) AS overlap
  FROM st a LEFT JOIN st b ON b.ls <> a.ls
  GROUP BY a.ls, a.n, a.mn, a.mx
)
SELECT ls AS linestatus,
       n AS n_lines,
       CAST(mn AS BIGINT) AS min_ship_day,
       CAST(mx AS BIGINT) AS max_ship_day,
       CAST(overlap AS BIGINT) AS overlap_days
FROM ov ORDER BY linestatus
"""

_SPO_COLS = ["n_suppliers_in_order", "n_orders", "share_ppm"]


def q_suppliers_per_order_hist(sf_dir):
    """Fulfillment fan-out histogram: distinct suppliers touched
    per order — each extra supplier multiplies partial-shipment,
    coordination and latency-tail risk, and the histogram is the
    exposure profile.  Distinct (order, supplier) pairs fold
    exactly; the histogram is pure integers."""
    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey", "l_suppkey"])

    def part(b: pa.Table) -> pa.Table:
        b = _valid(b, ("l_orderkey", "l_suppkey"))
        return b.select(["l_orderkey", "l_suppkey"]).group_by(
            ["l_orderkey", "l_suppkey"]).aggregate([])

    def distinct(b: pa.Table) -> pa.Table:
        return b.select(["l_orderkey", "l_suppkey"]).group_by(
            ["l_orderkey", "l_suppkey"]).aggregate([])

    os_ = tree_merge(
        li.map_batches(part, batch_format="pyarrow",
                       batch_size=None),
        distinct,
        final_shards=8,
        shard_cols=["l_orderkey"],
    ).to_pandas()
    if "l_orderkey" not in os_.columns or len(os_) == 0:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _SPO_COLS})
    per_order = os_.groupby("l_orderkey").size()
    hist = per_order.value_counts().sort_index()
    total = int(hist.sum())
    return pa.table({
        "n_suppliers_in_order": pa.array(
            hist.index.to_numpy(np.int64)),
        "n_orders": pa.array(hist.to_numpy(np.int64)),
        "share_ppm": pa.array(
            [_round_half_away(v / total * 1e6)
             for v in hist.to_numpy(np.int64)], pa.int64()),
    })


SPO_SQL = """
WITH os_ AS MATERIALIZED (
  SELECT l_orderkey,
         CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS k
  FROM lineitem
  WHERE l_orderkey IS NOT NULL AND l_suppkey IS NOT NULL
  GROUP BY 1
), h AS MATERIALIZED (
  SELECT k, CAST(COUNT(*) AS BIGINT) AS n FROM os_ GROUP BY 1
), tot AS MATERIALIZED (
  SELECT CAST(SUM(n) AS BIGINT) AS t FROM h
)
SELECT CAST(h.k AS BIGINT) AS n_suppliers_in_order,
       h.n AS n_orders,
       CAST(ROUND(CAST(h.n AS DOUBLE) / tot.t * 1000000, 0)
            AS BIGINT) AS share_ppm
FROM h CROSS JOIN tot
ORDER BY n_suppliers_in_order
"""

_LVO_COLS = ["lang_a", "lang_b", "vocab_a", "vocab_b",
             "jaccard_ppm"]


def q_lang_vocab_overlap(sf_dir):
    """Cross-language vocabulary overlap: Jaccard of the word sets
    of every language pair — the shared-token mass is exactly
    where n-gram language-ID hedges and mislabels, so a high-
    overlap pair predicts that pair's confusion rate.  Distinct
    (lang, word) incidences fold exactly; pair overlaps are
    integer set math on the bounded vocab table."""
    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["lang", "text"])

    def part(b: pa.Table) -> pa.Table:
        b = _valid(b, ("lang", "text"))
        if b.num_rows == 0:
            return pa.table({
                "lang": pa.array([], pa.string()),
                "w": pa.array([], pa.string()),
            })
        lang = b["lang"].to_numpy(zero_copy_only=False)
        words = pc.split_pattern(b["text"], pattern=" ")
        lens = pc.list_value_length(words).to_numpy(
            zero_copy_only=False)
        flat = pc.list_flatten(words)
        t = pa.table({
            "lang": pa.array(np.repeat(lang, lens)),
            "w": flat,
        })
        return t.group_by(["lang", "w"]).aggregate([])

    def distinct(b: pa.Table) -> pa.Table:
        return b.select(["lang", "w"]).group_by(
            ["lang", "w"]).aggregate([])

    lw = tree_merge(
        docs.map_batches(part, batch_format="pyarrow",
                         batch_size=None),
        distinct,
        final_shards=8,
        shard_cols=["w"],
    ).to_pandas()
    if "lang" not in lw.columns or len(lw) == 0:
        return pa.table({
            "lang_a": pa.array([], pa.string()),
            "lang_b": pa.array([], pa.string()),
            **{c: pa.array([], pa.int64()) for c in _LVO_COLS[2:]},
        })
    vocab = {l: set(g["w"]) for l, g in lw.groupby("lang")}
    langs = sorted(vocab)
    out = {c: [] for c in _LVO_COLS}
    for i in range(len(langs)):
        for j in range(i + 1, len(langs)):
            a, b = vocab[langs[i]], vocab[langs[j]]
            inter = len(a & b)
            union = len(a | b)
            if union == 0:
                continue
            out["lang_a"].append(langs[i])
            out["lang_b"].append(langs[j])
            out["vocab_a"].append(len(a))
            out["vocab_b"].append(len(b))
            out["jaccard_ppm"].append(
                _round_half_away(inter / union * 1e6))
    return pa.table({
        "lang_a": pa.array(out["lang_a"], pa.string()),
        "lang_b": pa.array(out["lang_b"], pa.string()),
        **{c: pa.array(out[c], pa.int64()) for c in _LVO_COLS[2:]},
    })


LVO_SQL = """
WITH lw AS MATERIALIZED (
  SELECT DISTINCT lang, unnest(string_split(text, ' ')) AS w
  FROM documents
  WHERE lang IS NOT NULL AND text IS NOT NULL
), vs AS MATERIALIZED (
  SELECT lang, CAST(COUNT(*) AS BIGINT) AS v
  FROM lw GROUP BY 1
), inter AS MATERIALIZED (
  SELECT a.lang AS la, b.lang AS lb,
         CAST(COUNT(*) AS BIGINT) AS i
  FROM lw a JOIN lw b ON a.w = b.w AND a.lang < b.lang
  GROUP BY 1, 2
)
SELECT va.lang AS lang_a,
       vb.lang AS lang_b,
       va.v AS vocab_a,
       vb.v AS vocab_b,
       CAST(ROUND(CAST(COALESCE(inter.i, 0) AS DOUBLE)
            / (va.v + vb.v - COALESCE(inter.i, 0)) * 1000000, 0)
            AS BIGINT) AS jaccard_ppm
FROM vs va
JOIN vs vb ON va.lang < vb.lang
LEFT JOIN inter ON inter.la = va.lang AND inter.lb = vb.lang
WHERE va.v + vb.v - COALESCE(inter.i, 0) > 0
ORDER BY lang_a, lang_b
"""


def register_r4hg(queries: dict, oracles: dict) -> None:
    queries.update(
        {
            "linestatus_date_consistency":
                q_linestatus_date_consistency,
            "suppliers_per_order_hist": q_suppliers_per_order_hist,
            "lang_vocab_overlap": q_lang_vocab_overlap,
        }
    )
    oracles.update(
        {
            "linestatus_date_consistency": LSC_SQL,
            "suppliers_per_order_hist": SPO_SQL,
            "lang_vocab_overlap": LVO_SQL,
        }
    )
