"""Round-4 batch IB: trade geography, engagement geometry, and
intra-document redundancy — the home-bias revenue share (what
fraction of revenue flows between customers and suppliers of the
SAME nation, against the share independence would predict — the
gravity-model residual of the trade network), the lifespan ×
intensity correlation (do long-lived users burn hotter or cooler
per active day?), and the document repeat-ratio census (per
source, how much of each doc is repeated words — boilerplate
density by corpus).

Exactness discipline: revenue folds as exact cents through a
hash join plus broadcast nation maps; the Pearson correlation
uses the centered two-pass formula mirrored operand-for-operand;
repeat ratios are exact rational counts with interpolated
quantiles on both sides."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd
from mimirsbrunn_ray.stages.broadcast import safe_join as _safe_join

from mimirsbrunn_ray.pipelines.queries_r4fk import (
    _DAY_US,
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


_HBR_COLS = ["n_lines", "home_cents", "total_cents",
             "home_share_ppm", "expected_ppm", "bias_x1e3"]


def q_home_bias_revenue_share(sf_dir):
    """The gravity-model residual: revenue where the customer's
    nation equals the supplier's nation, as a share of all
    revenue, against the expected share under independence
    (Σ_n cust-side-share × supp-side-share) — bias > 1 means
    nations trade with themselves more than the mix predicts.
    Lineitem joins orders on the order key (hash join, both sides
    repartitioned); the tiny customer → nation and supplier →
    nation maps broadcast."""
    # both nation hops attach via budget-gated broadcast / join
    # (stages/broadcast.py) — neither dim lands whole on the driver
    from mimirsbrunn_ray.stages.broadcast import attach_dim

    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_suppkey", "l_extendedprice",
                 "l_discount"])
    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey"])
    li = li.materialize()
    orders = orders.materialize()
    if li.count() == 0 or orders.count() == 0:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _HBR_COLS})
    joined = _safe_join(
        li, orders,
        on=("l_orderkey",),
        right_on=("o_orderkey",),
        join_type="inner",
        num_partitions=16,
    )
    joined = joined.map_batches(
        lambda b: _valid(b, ("l_suppkey", "o_custkey",
                             "l_extendedprice", "l_discount")),
        batch_format="pyarrow", batch_size=None)
    joined = attach_dim(joined, "o_custkey", sf_dir, "customer",
                        "c_custkey", ["c_nationkey"], how="inner")
    joined = attach_dim(joined, "l_suppkey", sf_dir, "supplier",
                        "s_suppkey", ["s_nationkey"], how="inner")

    def part(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({
                "cn": pa.array([], pa.int64()),
                "sn": pa.array([], pa.int64()),
                "cents": pa.array([], pa.int64()),
                "n": pa.array([], pa.int64()),
            })
        cn = b["c_nationkey"].to_numpy(
            zero_copy_only=False).astype(np.int64)
        sn = b["s_nationkey"].to_numpy(
            zero_copy_only=False).astype(np.int64)
        rev = (b["l_extendedprice"].cast(pa.float64()).to_numpy(
            zero_copy_only=False)
            * (1.0 - b["l_discount"].cast(
                pa.float64()).to_numpy(zero_copy_only=False)))
        cents = np.where(
            rev >= 0, np.floor(rev * 100.0 + 0.5),
            np.ceil(rev * 100.0 - 0.5)).astype(np.int64)
        df = pd.DataFrame({"cn": cn, "sn": sn, "cents": cents})
        agg = df.groupby(["cn", "sn"])["cents"].agg(
            ["sum", "count"]).reset_index()
        return pa.table({
            "cn": pa.array(agg["cn"].to_numpy(np.int64)),
            "sn": pa.array(agg["sn"].to_numpy(np.int64)),
            "cents": pa.array(agg["sum"].to_numpy(np.int64)),
            "n": pa.array(agg["count"].to_numpy(np.int64)),
        })

    def comb(b: pa.Table) -> pa.Table:
        g = b.group_by(["cn", "sn"]).aggregate(
            [("cents", "sum"), ("n", "sum")])
        return g.rename_columns(["cn", "sn", "cents", "n"])

    cs = tree_merge(
        joined.map_batches(part, batch_format="pyarrow",
                           batch_size=None),
        comb,
    ).to_pandas()
    if "cn" not in cs.columns or len(cs) == 0:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _HBR_COLS})
    total = int(cs["cents"].sum())
    n_lines = int(cs["n"].sum())
    if total == 0:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _HBR_COLS})
    home = int(cs.loc[cs["cn"] == cs["sn"], "cents"].sum())
    cside = cs.groupby("cn")["cents"].sum()
    sside = cs.groupby("sn")["cents"].sum()
    nations = sorted(set(cside.index) | set(sside.index))
    exp = sum(
        (float(cside.get(na, 0)) / total)
        * (float(sside.get(na, 0)) / total)
        for na in nations)
    share = home / total
    if exp == 0:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _HBR_COLS})
    return pa.table({
        "n_lines": pa.array([n_lines], pa.int64()),
        "home_cents": pa.array([home], pa.int64()),
        "total_cents": pa.array([total], pa.int64()),
        "home_share_ppm": pa.array(
            [_round_half_away(share * 1e6)], pa.int64()),
        "expected_ppm": pa.array(
            [_round_half_away(exp * 1e6)], pa.int64()),
        "bias_x1e3": pa.array(
            [_round_half_away(share / exp * 1e3)], pa.int64()),
    })


HBR_SQL = """
WITH flow AS MATERIALIZED (
  SELECT c.c_nationkey AS cn, s.s_nationkey AS sn,
         CAST(SUM(CAST(ROUND(l.l_extendedprice
                             * (1 - l.l_discount) * 100, 0)
                       AS BIGINT)) AS BIGINT) AS cents,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM lineitem l
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  WHERE l.l_extendedprice IS NOT NULL
    AND l.l_discount IS NOT NULL
  GROUP BY 1, 2
), tot AS MATERIALIZED (
  SELECT CAST(SUM(cents) AS BIGINT) AS total,
         CAST(SUM(n) AS BIGINT) AS n_lines,
         CAST(SUM(CASE WHEN cn = sn THEN cents ELSE 0 END)
              AS BIGINT) AS home
  FROM flow
), cside AS MATERIALIZED (
  SELECT cn AS na, CAST(SUM(cents) AS BIGINT) AS c
  FROM flow GROUP BY 1
), sside AS MATERIALIZED (
  SELECT sn AS na, CAST(SUM(cents) AS BIGINT) AS c
  FROM flow GROUP BY 1
), nations AS MATERIALIZED (
  SELECT na FROM cside UNION SELECT na FROM sside
), expd AS MATERIALIZED (
  SELECT SUM((CAST(COALESCE(cside.c, 0) AS DOUBLE) / tot.total)
             * (CAST(COALESCE(sside.c, 0) AS DOUBLE)
                / tot.total)) AS e
  FROM nations
  LEFT JOIN cside USING (na)
  LEFT JOIN sside USING (na)
  CROSS JOIN tot
)
SELECT tot.n_lines, tot.home AS home_cents,
       tot.total AS total_cents,
       CAST(ROUND(CAST(tot.home AS DOUBLE) / tot.total
            * 1000000, 0) AS BIGINT) AS home_share_ppm,
       CAST(ROUND(expd.e * 1000000, 0) AS BIGINT)
         AS expected_ppm,
       CAST(ROUND((CAST(tot.home AS DOUBLE) / tot.total)
            / expd.e * 1000, 0) AS BIGINT) AS bias_x1e3
FROM tot CROSS JOIN expd
WHERE tot.total > 0 AND expd.e > 0
"""

_LIC_COLS = ["n_users", "corr_ppm", "mean_lifespan_x1e3",
             "mean_intensity_x1e3"]


def q_lifespan_intensity_corr(sf_dir):
    """Do long-lived users burn hotter per active day?  Per user
    with 2+ events: lifespan (last − first day + 1) and intensity
    (events per ACTIVE day); the centered Pearson correlation
    across users — negative means tourists binge and lifers
    sip.  Per-user aggregates fold exactly in disjoint shards."""
    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts"])

    def part(b: pa.Table) -> pa.Table:
        b = _valid(b, ("user_id", "ts"))
        us = b["ts"].cast(pa.timestamp("us")).cast(pa.int64())
        t = pa.table({
            "u": b["user_id"].cast(pa.int64()),
            "day": pc.divide(us, _DAY_US),
            "n": pa.array(np.ones(b.num_rows, np.int64)),
        })
        g = t.group_by(["u", "day"]).aggregate([("n", "sum")])
        return g.rename_columns(["u", "day", "n"])

    def comb(b: pa.Table) -> pa.Table:
        g = b.group_by(["u", "day"]).aggregate([("n", "sum")])
        return g.rename_columns(["u", "day", "n"])

    ud = tree_merge(
        ev.map_batches(part, batch_format="pyarrow",
                       batch_size=None),
        comb,
        final_shards=8,
        shard_cols=["u"],
    ).to_pandas()
    if "u" not in ud.columns or len(ud) == 0:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _LIC_COLS})
    agg = ud.groupby("u").agg(
        d0=("day", "min"), d1=("day", "max"),
        active=("day", "count"), n=("n", "sum")).reset_index()
    agg = agg[agg["n"] >= 2]
    if len(agg) < 3:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _LIC_COLS})
    life = (agg["d1"] - agg["d0"] + 1).to_numpy(
        np.int64).astype(np.float64)
    inten = (agg["n"].to_numpy(np.int64).astype(np.float64)
             / agg["active"].to_numpy(np.int64))
    mx, my = life.mean(), inten.mean()
    dx, dy = life - mx, inten - my
    den = np.sqrt((dx * dx).sum() * (dy * dy).sum())
    if den == 0:
        return pa.table(
            {c: pa.array([], pa.int64()) for c in _LIC_COLS})
    corr = float((dx * dy).sum()) / float(den)
    return pa.table({
        "n_users": pa.array([len(agg)], pa.int64()),
        "corr_ppm": pa.array(
            [_round_half_away(corr * 1e6)], pa.int64()),
        "mean_lifespan_x1e3": pa.array(
            [_round_half_away(mx * 1e3)], pa.int64()),
        "mean_intensity_x1e3": pa.array(
            [_round_half_away(my * 1e3)], pa.int64()),
    })


LIC_SQL = f"""
WITH ud AS MATERIALIZED (
  SELECT user_id AS u, EPOCH_US(ts) // {_DAY_US} AS day,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM events
  WHERE user_id IS NOT NULL AND ts IS NOT NULL
  GROUP BY 1, 2
), pu AS MATERIALIZED (
  SELECT u,
         CAST(MAX(day) - MIN(day) + 1 AS DOUBLE) AS life,
         CAST(SUM(n) AS DOUBLE) / COUNT(*) AS inten
  FROM ud GROUP BY 1
  HAVING SUM(n) >= 2
), mu AS MATERIALIZED (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         AVG(life) AS mx, AVG(inten) AS my
  FROM pu
), ce AS MATERIALIZED (
  SELECT SUM((pu.life - mu.mx) * (pu.inten - mu.my)) AS sxy,
         SUM((pu.life - mu.mx) * (pu.life - mu.mx)) AS sxx,
         SUM((pu.inten - mu.my) * (pu.inten - mu.my)) AS syy
  FROM pu CROSS JOIN mu
)
SELECT mu.n AS n_users,
       CAST(ROUND(ce.sxy / SQRT(ce.sxx * ce.syy) * 1000000, 0)
            AS BIGINT) AS corr_ppm,
       CAST(ROUND(mu.mx * 1000, 0) AS BIGINT)
         AS mean_lifespan_x1e3,
       CAST(ROUND(mu.my * 1000, 0) AS BIGINT)
         AS mean_intensity_x1e3
FROM mu CROSS JOIN ce
WHERE mu.n >= 3 AND ce.sxx * ce.syy > 0
"""

_DRR_COLS = ["source", "n_docs", "mean_repeat_ppm",
             "p90_repeat_ppm"]


def q_doc_repeat_ratio_by_source(sf_dir):
    """Boilerplate density by corpus: per source, the mean and
    p90 of each document's repeat ratio 1 − distinct words /
    total words (whitespace tokens) — the share of a doc that is
    words it already used.  Per-doc ratios are exact rationals;
    sources resolve whole in hash buckets with interpolated
    quantiles."""
    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["source", "text"])

    def project(b: pa.Table) -> pa.Table:
        b = _valid(b, ("source", "text"))
        if b.num_rows == 0:
            return pa.table({
                "source": pa.array([], pa.string()),
                "ratio": pa.array([], pa.float64()),
                "_dedup_bucket": pa.array([], pa.int32()),
            })
        words = pc.split_pattern(b["text"], " ")
        total = pc.list_value_length(words).to_numpy(
            zero_copy_only=False).astype(np.int64)
        ratios = np.zeros(b.num_rows, np.float64)
        wl = words.to_pylist()
        for i, lst in enumerate(wl):
            if total[i] > 0:
                ratios[i] = 1.0 - len(set(lst)) / total[i]
        keep = total > 0
        src = np.asarray(
            b["source"].to_numpy(zero_copy_only=False))
        t = pa.table({
            "source": pa.array(src[keep], pa.string()),
            "ratio": pa.array(ratios[keep]),
        })
        return add_bucket(t, "source", 16)

    def stats(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({
            "source": pd.Series([], dtype=object),
            "n_docs": pd.Series([], dtype=np.int64),
            "mean_repeat_ppm": pd.Series([], dtype=np.int64),
            "p90_repeat_ppm": pd.Series([], dtype=np.int64),
        })
        if len(g) == 0:
            return empty
        rows = []
        for src, sub in g.groupby("source"):
            v = sub["ratio"].to_numpy(np.float64)
            rows.append({
                "source": src,
                "n_docs": np.int64(len(v)),
                "mean_repeat_ppm": np.int64(_round_half_away(
                    float(v.mean()) * 1e6)),
                "p90_repeat_ppm": np.int64(_round_half_away(
                    float(np.percentile(v, 90)) * 1e6)),
            })
        return pd.DataFrame(rows)

    out = (
        docs.map_batches(project, batch_format="pyarrow",
                         batch_size=None)
        .groupby(_BUCKET)
        .map_groups(stats, batch_format="pandas")
        .to_pandas()
    )
    if "source" not in out.columns or len(out) == 0:
        return pa.table({
            "source": pa.array([], pa.string()),
            "n_docs": pa.array([], pa.int64()),
            "mean_repeat_ppm": pa.array([], pa.int64()),
            "p90_repeat_ppm": pa.array([], pa.int64()),
        })
    out = out.sort_values("source")
    return pa.table({
        "source": pa.array(out["source"], pa.string()),
        "n_docs": pa.array(out["n_docs"], pa.int64()),
        "mean_repeat_ppm": pa.array(
            out["mean_repeat_ppm"], pa.int64()),
        "p90_repeat_ppm": pa.array(
            out["p90_repeat_ppm"], pa.int64()),
    })


DRR_SQL = """
WITH dr AS MATERIALIZED (
  SELECT source,
         1.0 - CAST(LEN(LIST_DISTINCT(
                 STRING_SPLIT(text, ' '))) AS DOUBLE)
             / LEN(STRING_SPLIT(text, ' ')) AS ratio
  FROM documents
  WHERE source IS NOT NULL AND text IS NOT NULL
    AND LEN(STRING_SPLIT(text, ' ')) > 0
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(ROUND(AVG(ratio) * 1000000, 0) AS BIGINT)
         AS mean_repeat_ppm,
       CAST(ROUND(QUANTILE_CONT(ratio, 0.9) * 1000000, 0)
            AS BIGINT) AS p90_repeat_ppm
FROM dr
GROUP BY source
ORDER BY source
"""


def register_r4ib(queries: dict, oracles: dict) -> None:
    queries.update(
        {
            "home_bias_revenue_share": q_home_bias_revenue_share,
            "lifespan_intensity_corr": q_lifespan_intensity_corr,
            "doc_repeat_ratio_by_source":
                q_doc_repeat_ratio_by_source,
        }
    )
    oracles.update(
        {
            "home_bias_revenue_share": HBR_SQL,
            "lifespan_intensity_corr": LIC_SQL,
            "doc_repeat_ratio_by_source": DRR_SQL,
        }
    )
