"""Round-4 batch S: degree histogram of the dependency edge set,
language-ID confusion matrix, and the daily order-backlog curve.

Exactness discipline: pure integer counts throughout — edges and
degrees are exact set cardinalities, the confusion matrix recomputes
the SAME deterministic stopword-profile argmax on both engines, and
backlog curves are prefix sums over bounded day tables.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from mimirsbrunn_ray.stages.dedup import _BUCKET, add_bucket
from mimirsbrunn_ray.stages.rollup import tree_merge
from mimirsbrunn_ray.functions.timeutil import trunc_us, ts_array

_DAY_US = 86_400_000_000


def _not_null(b: pa.Table, cols) -> pa.Table:
    m = None
    for c in cols:
        v = pc.is_valid(b[c])
        m = v if m is None else pc.and_(m, v)
    return b.filter(m)


# ---------------------------------------------------------------------------
# degree histogram over the deterministic dependency edge set
# ---------------------------------------------------------------------------


def q_dependency_degree_hist(sf_dir):
    """Degree distribution of the k//2 / k//3 dependency DAG (the same
    deterministic edge set the k-core and triangle queries use): for
    each degree d, how many nodes have exactly d distinct neighbors —
    the first plot of any graph audit. Scale shape: edges generate
    vectorized per batch, dedupe inside ONE u-hash bucket shuffle (both
    generators of an edge share u = min endpoint), endpoint partials
    tree-merge node-sharded into exact degrees, and the degree
    histogram is a final bounded merge."""
    part = rd.read_parquet(f"{sf_dir}/part.parquet", columns=["p_partkey"])

    def edges(b: pa.Table) -> pa.Table:
        k = b["p_partkey"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        k = k[k >= 2]
        a = np.concatenate([k, k[k >= 3]])
        v = np.concatenate([k // 2, k[k >= 3] // 3])
        keep = a != v
        a, v = a[keep], v[keep]
        u = np.minimum(a, v)
        w = np.maximum(a, v)
        keep = u >= 1
        t = pa.table({"u": pa.array(u[keep]), "v": pa.array(w[keep])})
        g = t.group_by(["u", "v"]).aggregate([])  # batch-local dedupe
        return add_bucket(g, "u", 64)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "node": pd.Series([], dtype=np.int64),
                "deg": pd.Series([], dtype=np.int64),
            }
        )
        if len(g) == 0:
            return empty
        e = g.drop_duplicates(["u", "v"])  # exact edge set in this bucket
        ends = pd.concat(
            [e["u"].rename("node"), e["v"].rename("node")],
            ignore_index=True,
        )
        d = ends.value_counts().rename_axis("node").reset_index(name="deg")
        d["node"] = d["node"].astype(np.int64)
        d["deg"] = d["deg"].astype(np.int64)
        return d

    def combine_deg(b: pa.Table) -> pa.Table:
        g = b.group_by(["node"]).aggregate([("deg", "sum")])
        return g.select(["node", "deg_sum"]).rename_columns(["node", "deg"])

    degrees = tree_merge(
        part.map_batches(edges, batch_format="pyarrow", batch_size=None)
        .groupby(_BUCKET)
        .map_groups(per_bucket, batch_format="pandas"),
        combine_deg,
        final_shards=8,
        shard_cols=["node"],
    )

    def hist(b: pa.Table) -> pa.Table:
        g = b.group_by(["deg"]).aggregate([([], "count_all")])
        return g.select(["deg", "count_all"]).rename_columns(
            ["deg", "n_nodes"]
        )

    def combine_h(b: pa.Table) -> pa.Table:
        g = b.group_by(["deg"]).aggregate([("n_nodes", "sum")])
        return g.select(["deg", "n_nodes_sum"]).rename_columns(
            ["deg", "n_nodes"]
        )

    out = tree_merge(
        degrees.map_batches(hist, batch_format="pyarrow", batch_size=None),
        combine_h,
    )

    def finish(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "deg": b["deg"].cast(pa.int64()),
                "n_nodes": b["n_nodes"].cast(pa.int64()),
            }
        )

    return out.map_batches(finish, batch_format="pyarrow", batch_size=None)


DEGREE_HIST_SQL = """
WITH ks AS (
  SELECT CAST(p_partkey AS BIGINT) AS k FROM part WHERE p_partkey >= 2
),
edges0 AS (
  SELECT k AS a, k // 2 AS b FROM ks
  UNION
  SELECT k, k // 3 FROM ks WHERE k >= 3
),
e AS (
  SELECT DISTINCT LEAST(a, b) AS u, GREATEST(a, b) AS v
  FROM edges0 WHERE a <> b AND LEAST(a, b) >= 1
),
d AS (
  SELECT node, CAST(COUNT(*) AS BIGINT) AS deg
  FROM (SELECT u AS node FROM e UNION ALL SELECT v AS node FROM e)
  GROUP BY 1
)
SELECT CAST(deg AS BIGINT) AS deg, CAST(COUNT(*) AS BIGINT) AS n_nodes
FROM d GROUP BY 1
"""


# ---------------------------------------------------------------------------
# language-ID confusion matrix (labeled lang vs stopword-profile pred)
# ---------------------------------------------------------------------------


def q_langid_confusion(sf_dir):
    """Confusion matrix of the deterministic stopword-profile language
    ID (queries_r4i.q_lang_id_docs) against the labeled ``lang``
    column: per (lang, pred_lang), the document count — the evaluation
    table a classifier audit reads (precision/recall derive from it).
    Zero shuffles beyond the types-bounded count merge: prediction is
    batch-local with broadcast marker sets."""
    from mimirsbrunn_ray.pipelines.queries_r4i import _LID_PROFILES

    docs = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "lang", "text"]
    )
    langs = [l for l, _ in _LID_PROFILES]
    sets = [pa.array(list(words)) for _, words in _LID_PROFILES]

    def partial(b: pa.Table) -> pa.Table:
        b = _not_null(b, ("doc_id", "lang"))
        empty = pa.table(
            {
                "lang": pa.array([], pa.string()),
                "pred_lang": pa.array([], pa.string()),
                "n": pa.array([], pa.int64()),
            }
        )
        if b.num_rows == 0:
            return empty
        text = pc.if_else(
            pc.is_valid(b["text"]), b["text"], pa.scalar("", pa.string())
        )
        words = pc.split_pattern(pc.utf8_lower(text), " ")
        n_per = pc.list_value_length(words).to_numpy(zero_copy_only=False)
        flat = pc.list_flatten(words)
        seg = np.repeat(np.arange(len(b)), n_per)
        hits = np.zeros((len(b), len(langs)), dtype=np.int64)
        for j, s in enumerate(sets):
            m = pc.is_in(flat, value_set=s).to_numpy(zero_copy_only=False)
            if m.any():
                np.add.at(hits[:, j], seg[m], 1)
        best = np.argmax(hits, axis=1)  # first max = alphabetical tie-break
        n_hits = hits[np.arange(len(b)), best]
        pred = np.where(
            n_hits == 0, "und", np.array(langs, dtype=object)[best]
        )
        t = pa.table(
            {
                "lang": b["lang"],
                "pred_lang": pa.array(pred.astype(object)),
                "one": pa.array(np.ones(len(b), dtype=np.int64)),
            }
        )
        g = t.group_by(["lang", "pred_lang"]).aggregate([("one", "sum")])
        return g.select(["lang", "pred_lang", "one_sum"]).rename_columns(
            ["lang", "pred_lang", "n"]
        )

    def combine(b: pa.Table) -> pa.Table:
        g = b.group_by(["lang", "pred_lang"]).aggregate([("n", "sum")])
        return g.select(["lang", "pred_lang", "n_sum"]).rename_columns(
            ["lang", "pred_lang", "n"]
        )

    out = tree_merge(
        docs.map_batches(partial, batch_format="pyarrow", batch_size=None),
        combine,
    )

    def finish(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "lang": b["lang"],
                "pred_lang": b["pred_lang"],
                "n_docs": b["n"].cast(pa.int64()),
            }
        )

    return out.map_batches(finish, batch_format="pyarrow", batch_size=None)


def _in_list(words) -> str:
    return ", ".join(f"'{w}'" for w in words)


def _langid_confusion_sql() -> str:
    from mimirsbrunn_ray.pipelines.queries_r4i import _LID_PROFILES

    cases = []
    for lang, words in _LID_PROFILES:
        cases.append(
            f"COALESCE(SUM(CASE WHEN w.word IN ({_in_list(words)}) "
            f"THEN 1 ELSE 0 END), 0) AS {lang}"
        )
    return f"""
WITH w AS (
  SELECT doc_id, unnest(string_split(lower(coalesce(text, '')), ' ')) AS word
  FROM documents WHERE doc_id IS NOT NULL AND lang IS NOT NULL
), h AS (
  SELECT d.doc_id, d.lang, {', '.join(cases)}
  FROM (SELECT doc_id, lang FROM documents
        WHERE doc_id IS NOT NULL AND lang IS NOT NULL) d
  LEFT JOIN w ON w.doc_id = d.doc_id
  GROUP BY d.doc_id, d.lang
), p AS (
  SELECT lang,
         CASE WHEN de + en + es + fr = 0 THEN 'und'
              WHEN de >= en AND de >= es AND de >= fr THEN 'de'
              WHEN en >= es AND en >= fr THEN 'en'
              WHEN es >= fr THEN 'es'
              ELSE 'fr' END AS pred_lang
  FROM h
)
SELECT lang, pred_lang, CAST(COUNT(*) AS BIGINT) AS n_docs
FROM p GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# daily order backlog (placed vs fully shipped, cumulative)
# ---------------------------------------------------------------------------


def q_order_backlog_daily(sf_dir):
    """Daily backlog curve: for every day that saw an order placed or
    an order fully shipped (all its lineitems out, day of the LAST
    ship), the cumulative placed count, cumulative fully-shipped count,
    and the open backlog — the operations chart behind fulfillment SLA
    review. Scale shape: per-order MAX(shipdate) is a combiner-first
    order-sharded merge; both day tables are bounded, so the prefix
    sums run on the tiny final block."""
    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderdate"]
    )

    def opartial(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_valid(b["o_orderdate"]))
        us = (
            b["o_orderdate"].cast(pa.timestamp("us")).cast(pa.int64())
            .to_numpy(zero_copy_only=False)
        )
        t = pa.table({"d": pa.array(trunc_us(us, "1d"))})
        g = t.group_by(["d"]).aggregate([([], "count_all")])
        return g.select(["d", "count_all"]).rename_columns(["d", "n"])

    def combine_day(b: pa.Table) -> pa.Table:
        g = b.group_by(["d"]).aggregate([("n", "sum")])
        return g.select(["d", "n_sum"]).rename_columns(["d", "n"])

    placed = tree_merge(
        orders.map_batches(opartial, batch_format="pyarrow", batch_size=None),
        combine_day,
    ).to_pandas()

    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_shipdate"]
    )

    def lpartial(b: pa.Table) -> pa.Table:
        b = _not_null(b, ("l_orderkey", "l_shipdate"))
        us = b["l_shipdate"].cast(pa.timestamp("us")).cast(pa.int64())
        t = pa.table({"l_orderkey": b["l_orderkey"], "s": us})
        g = t.group_by(["l_orderkey"]).aggregate([("s", "max")])
        return g.select(["l_orderkey", "s_max"]).rename_columns(
            ["l_orderkey", "s"]
        )

    def lcombine(b: pa.Table) -> pa.Table:
        g = b.group_by(["l_orderkey"]).aggregate([("s", "max")])
        return g.select(["l_orderkey", "s_max"]).rename_columns(
            ["l_orderkey", "s"]
        )

    last_ship = tree_merge(
        li.map_batches(lpartial, batch_format="pyarrow", batch_size=None),
        lcombine,
        final_shards=8,
        shard_cols=["l_orderkey"],
    )

    def spartial(b: pa.Table) -> pa.Table:
        us = b["s"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        t = pa.table({"d": pa.array(trunc_us(us.astype(np.int64), "1d"))})
        g = t.group_by(["d"]).aggregate([([], "count_all")])
        return g.select(["d", "count_all"]).rename_columns(["d", "n"])

    shipped = tree_merge(
        last_ship.map_batches(
            spartial, batch_format="pyarrow", batch_size=None
        ),
        combine_day,
    ).to_pandas()

    for df in (placed, shipped):
        if "d" not in df.columns:  # fully-empty input short-circuit
            df["d"] = pd.Series([], dtype=np.int64)
            df["n"] = pd.Series([], dtype=np.int64)
    days = np.union1d(
        placed["d"].to_numpy(dtype=np.int64),
        shipped["d"].to_numpy(dtype=np.int64),
    )
    p_map = dict(zip(placed["d"].astype(np.int64), placed["n"].astype(
        np.int64)))
    s_map = dict(zip(shipped["d"].astype(np.int64), shipped["n"].astype(
        np.int64)))
    np_ = np.array([p_map.get(int(d), 0) for d in days], dtype=np.int64)
    ns_ = np.array([s_map.get(int(d), 0) for d in days], dtype=np.int64)
    cp, cs = np.cumsum(np_), np.cumsum(ns_)
    return pa.table(
        {
            "bucket": ts_array(days),
            "n_placed_cum": pa.array(cp.astype(np.int64)),
            "n_shipped_cum": pa.array(cs.astype(np.int64)),
            "backlog": pa.array((cp - cs).astype(np.int64)),
        }
    )


BACKLOG_SQL = """
WITH p AS (
  SELECT date_trunc('day', o_orderdate) AS d, CAST(COUNT(*) AS BIGINT) AS n
  FROM orders WHERE o_orderdate IS NOT NULL GROUP BY 1
), fs AS (
  SELECT l_orderkey, MAX(l_shipdate) AS ms
  FROM lineitem
  WHERE l_orderkey IS NOT NULL AND l_shipdate IS NOT NULL
  GROUP BY 1
), s AS (
  SELECT date_trunc('day', ms) AS d, CAST(COUNT(*) AS BIGINT) AS n
  FROM fs GROUP BY 1
), u AS (
  SELECT d,
         SUM(CASE WHEN src = 'p' THEN n ELSE 0 END) AS np,
         SUM(CASE WHEN src = 's' THEN n ELSE 0 END) AS ns
  FROM (
    SELECT d, n, 'p' AS src FROM p
    UNION ALL
    SELECT d, n, 's' AS src FROM s
  ) GROUP BY 1
)
SELECT d AS bucket,
       CAST(SUM(np) OVER w AS BIGINT) AS n_placed_cum,
       CAST(SUM(ns) OVER w AS BIGINT) AS n_shipped_cum,
       CAST(SUM(np) OVER w - SUM(ns) OVER w AS BIGINT) AS backlog
FROM u
WINDOW w AS (ORDER BY d ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
"""


def register_r4s(queries: dict, oracles: dict) -> None:
    queries.update(
        {
            "dependency_degree_hist": q_dependency_degree_hist,
            "langid_confusion": q_langid_confusion,
            "order_backlog_daily": q_order_backlog_daily,
        }
    )
    oracles.update(
        {
            "dependency_degree_hist": DEGREE_HIST_SQL,
            "langid_confusion": _langid_confusion_sql(),
            "order_backlog_daily": BACKLOG_SQL,
        }
    )
