"""Round-4 batch JD: audience Pareto, fulfilment-state money,
and corpus language breadth — the events Pareto-80 user count
(the smallest set of users, heaviest first, that carries 80% of
all events), the status revenue mix (how much money sits in each
fulfilment state right now), and the langs-per-source census
(how many languages each source emits — monolingual feeds route
cheaply, polyglot ones need per-doc language ID).

Exactness discipline: the Pareto cut walks exact cumulative
integer counts to the exact 80% threshold (5·cum ≥ 4·total);
revenue cents and language counts are exact integers."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from mimirsbrunn_ray.pipelines.queries_r4fk import (
    _round_half_away,
)
from mimirsbrunn_ray.stages.rollup import tree_merge


def _valid(b: pa.Table, cols) -> pa.Table:
    m = None
    for c in cols:
        v = pc.is_valid(b[c])
        m = v if m is None else pc.and_(m, v)
    return b.filter(m)


_PKU_COLS = ["n_users", "k80", "k80_share_ppm",
             "top_user_events"]


def q_events_pareto_k80_users(sf_dir):
    """Who actually generates the load?  Users sorted by event
    count (heaviest first, ties by user id), the smallest prefix
    whose cumulative count reaches 80% of all events (exact
    integer test 5·cum ≥ 4·total), and that prefix's share of
    the user base.  Per-user counts fold exactly."""
    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id"])

    def part(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_valid(b["user_id"]))
        t = pa.table({
            "u": b["user_id"].cast(pa.int64()),
            "n": pa.array(np.ones(b.num_rows, np.int64)),
        })
        g = t.group_by(["u"]).aggregate([("n", "sum")])
        return g.rename_columns(["u", "n"])

    def comb(b: pa.Table) -> pa.Table:
        g = b.group_by(["u"]).aggregate([("n", "sum")])
        return g.rename_columns(["u", "n"])

    uc = tree_merge(
        ev.map_batches(part, batch_format="pyarrow",
                       batch_size=None), comb).to_pandas()
    if "u" not in uc.columns or len(uc) == 0:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _PKU_COLS})
    u = uc["u"].to_numpy(np.int64)
    n = uc["n"].to_numpy(np.int64)
    order = np.lexsort((u, -n))
    sorted_n = n[order]
    tot = int(sorted_n.sum())
    if tot == 0:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _PKU_COLS})
    cum = np.cumsum(sorted_n)
    k80 = int(np.argmax(5 * cum >= 4 * tot)) + 1
    n_users = len(u)
    return pa.table({
        "n_users": pa.array([n_users], pa.int64()),
        "k80": pa.array([k80], pa.int64()),
        "k80_share_ppm": pa.array(
            [_round_half_away(k80 / n_users * 1e6)],
            pa.int64()),
        "top_user_events": pa.array(
            [int(sorted_n[0])], pa.int64()),
    })


PKU_SQL = """
WITH uc AS MATERIALIZED (
  SELECT user_id AS u, CAST(COUNT(*) AS BIGINT) AS n
  FROM events WHERE user_id IS NOT NULL
  GROUP BY 1
), tot AS MATERIALIZED (
  SELECT CAST(SUM(n) AS BIGINT) AS t,
         CAST(COUNT(*) AS BIGINT) AS nu,
         CAST(MAX(n) AS BIGINT) AS topn
  FROM uc
), rk AS MATERIALIZED (
  SELECT n,
         SUM(n) OVER (ORDER BY n DESC, u ASC
                      ROWS UNBOUNDED PRECEDING) AS cum,
         ROW_NUMBER() OVER (ORDER BY n DESC, u ASC) AS r
  FROM uc
), k80 AS MATERIALIZED (
  SELECT CAST(MIN(r) AS BIGINT) AS k
  FROM rk CROSS JOIN tot
  WHERE 5 * cum >= 4 * tot.t
)
SELECT tot.nu AS n_users, k80.k AS k80,
       CAST(ROUND(CAST(k80.k AS DOUBLE) / tot.nu
            * 1000000, 0) AS BIGINT) AS k80_share_ppm,
       tot.topn AS top_user_events
FROM tot CROSS JOIN k80
WHERE tot.t > 0
"""

_SRM_COLS = ["o_orderstatus", "n_orders", "revenue_cents",
             "revenue_share_ppm"]


def q_status_revenue_mix(sf_dir):
    """Where does the money sit right now?  Revenue by
    fulfilment status — money stuck in open orders is working
    capital someone is lending the customer for free.  Cents
    fold exactly per status."""
    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderstatus", "o_totalprice"])

    def part(b: pa.Table) -> pa.Table:
        b = _valid(b, ("o_orderstatus", "o_totalprice"))
        if b.num_rows == 0:
            return pa.table({
                "st": pa.array([], pa.string()),
                "n": pa.array([], pa.int64()),
                "cents": pa.array([], pa.int64()),
            })
        tp = b["o_totalprice"].cast(pa.float64()).to_numpy(
            zero_copy_only=False)
        cents = np.where(tp >= 0, np.floor(tp * 100 + 0.5),
                         np.ceil(tp * 100 - 0.5)).astype(
            np.int64)
        df = pd.DataFrame({
            "st": np.asarray(
                b["o_orderstatus"].to_numpy(
                    zero_copy_only=False)),
            "n": 1, "cents": cents,
        })
        agg = df.groupby("st").sum().reset_index()
        for c in ["n", "cents"]:
            agg[c] = agg[c].astype(np.int64)
        return pa.Table.from_pandas(agg, preserve_index=False)

    def comb(b: pa.Table) -> pa.Table:
        g = b.group_by(["st"]).aggregate(
            [("n", "sum"), ("cents", "sum")])
        return g.rename_columns(["st", "n", "cents"])

    cc = tree_merge(
        orders.map_batches(part, batch_format="pyarrow",
                           batch_size=None), comb).to_pandas()
    if "st" not in cc.columns or len(cc) == 0:
        return pa.table({
            "o_orderstatus": pa.array([], pa.string()),
            "n_orders": pa.array([], pa.int64()),
            "revenue_cents": pa.array([], pa.int64()),
            "revenue_share_ppm": pa.array([], pa.int64()),
        })
    tot = int(cc["cents"].sum())
    if tot == 0:
        return pa.table({
            "o_orderstatus": pa.array([], pa.string()),
            "n_orders": pa.array([], pa.int64()),
            "revenue_cents": pa.array([], pa.int64()),
            "revenue_share_ppm": pa.array([], pa.int64()),
        })
    cc = cc.sort_values("st")
    return pa.table({
        "o_orderstatus": pa.array(cc["st"], pa.string()),
        "n_orders": pa.array(
            cc["n"].to_numpy(np.int64), pa.int64()),
        "revenue_cents": pa.array(
            cc["cents"].to_numpy(np.int64), pa.int64()),
        "revenue_share_ppm": pa.array(
            [_round_half_away(c / tot * 1e6)
             for c in cc["cents"]], pa.int64()),
    })


SRM_SQL = """
WITH sc AS MATERIALIZED (
  SELECT o_orderstatus AS st,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT))
              AS BIGINT) AS cents
  FROM orders
  WHERE o_orderstatus IS NOT NULL AND o_totalprice IS NOT NULL
  GROUP BY 1
), tot AS MATERIALIZED (
  SELECT CAST(SUM(cents) AS BIGINT) AS t FROM sc
)
SELECT sc.st AS o_orderstatus, sc.n AS n_orders,
       sc.cents AS revenue_cents,
       CAST(ROUND(CAST(sc.cents AS DOUBLE) / tot.t
            * 1000000, 0) AS BIGINT) AS revenue_share_ppm
FROM sc CROSS JOIN tot
WHERE tot.t > 0
ORDER BY sc.st
"""

_LPS_COLS = ["n_langs", "n_sources", "share_ppm"]


def q_langs_per_source_census(sf_dir):
    """Monolingual feed or polyglot firehose?  Sources bucketed
    by how many DISTINCT languages they emit — the count of
    sources at each language-breadth rung decides how much
    per-document language ID the pipeline actually needs.
    Distinct (source, lang) pairs fold exactly."""
    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["source", "lang"])

    def part(b: pa.Table) -> pa.Table:
        b = _valid(b, ("source", "lang"))
        t = pa.table({
            "src": b["source"].cast(pa.string()),
            "lang": b["lang"].cast(pa.string()),
        })
        return t.group_by(["src", "lang"]).aggregate([])

    def distinct(b: pa.Table) -> pa.Table:
        return b.select(["src", "lang"]).group_by(
            ["src", "lang"]).aggregate([])

    sl = tree_merge(
        docs.map_batches(part, batch_format="pyarrow",
                         batch_size=None), distinct).to_pandas()
    if "src" not in sl.columns or len(sl) == 0:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _LPS_COLS})
    breadth = sl.groupby("src").size()
    hist = breadth.value_counts().sort_index()
    tot = int(hist.sum())
    return pa.table({
        "n_langs": pa.array(
            [int(k) for k in hist.index], pa.int64()),
        "n_sources": pa.array(
            [int(v) for v in hist.values], pa.int64()),
        "share_ppm": pa.array(
            [_round_half_away(int(v) / tot * 1e6)
             for v in hist.values], pa.int64()),
    })


LPS_SQL = """
WITH sl AS MATERIALIZED (
  SELECT DISTINCT source AS src, lang
  FROM documents
  WHERE source IS NOT NULL AND lang IS NOT NULL
), br AS MATERIALIZED (
  SELECT src, CAST(COUNT(*) AS BIGINT) AS n_langs
  FROM sl GROUP BY 1
), hist AS MATERIALIZED (
  SELECT n_langs, CAST(COUNT(*) AS BIGINT) AS n
  FROM br GROUP BY 1
), tot AS MATERIALIZED (
  SELECT CAST(SUM(n) AS BIGINT) AS t FROM hist
)
SELECT h.n_langs, h.n AS n_sources,
       CAST(ROUND(CAST(h.n AS DOUBLE) / tot.t * 1000000, 0)
            AS BIGINT) AS share_ppm
FROM hist h CROSS JOIN tot
ORDER BY h.n_langs
"""


def register_r4jd(queries: dict, oracles: dict) -> None:
    queries.update(
        {
            "events_pareto_k80_users":
                q_events_pareto_k80_users,
            "status_revenue_mix": q_status_revenue_mix,
            "langs_per_source_census":
                q_langs_per_source_census,
        }
    )
    oracles.update(
        {
            "events_pareto_k80_users": PKU_SQL,
            "status_revenue_mix": SRM_SQL,
            "langs_per_source_census": LPS_SQL,
        }
    )
