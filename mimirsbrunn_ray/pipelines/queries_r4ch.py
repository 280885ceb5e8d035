"""Round-4 batch CH: Kendall tau-b concordance, market-basket part-pair
lift, and Cohen's-kappa labeler agreement.

Exactness discipline: every statistic folds to exact int64 sufficient
statistics (contingency cells, pair/marginal counts) via combiner-first
partials + tree_merge, and the single final float expression is
MIRRORED token-for-token between the Ray side and the DuckDB oracle
(identical operand order, explicit DOUBLE casts before any product that
could overflow int64), then snapped to fixed point.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from mimirsbrunn_ray.stages.dedup import _BUCKET, add_bucket
from mimirsbrunn_ray.stages.rollup import tree_merge

_HOUR_US = 3_600_000_000


def _round_half_away(x: np.ndarray) -> np.ndarray:
    return np.where(x >= 0, np.floor(x + 0.5), np.ceil(x - 0.5)).astype(
        np.int64
    )


def _clean(b: pa.Table, cols: tuple[str, ...]) -> pa.Table:
    m = None
    for c in cols:
        v = pc.is_valid(b[c])
        m = v if m is None else pc.and_(m, v)
    return b.filter(m)


def _sum_by(t: pa.Table, keys: list[str], vals: list[str]) -> pa.Table:
    g = t.group_by(keys).aggregate([(v, "sum") for v in vals])
    g = g.select(keys + [f"{v}_sum" for v in vals])
    return g.rename_columns(keys + vals)


# ---------------------------------------------------------------------------
# Kendall tau-b: hour-of-day vs integer value band, per event type
# ---------------------------------------------------------------------------


def q_kendall_tau_value_hour(sf_dir):
    """Per event type: Kendall tau-b rank concordance between hour-of-day
    and FLOOR(value) — the tie-robust companion to the Spearman/Pearson
    queries (concordant-vs-discordant PAIRS, not ranks, so heavy ties in
    the 24-level hour axis are handled by the tau-b denominator). The
    joint (hour, band) contingency is exact int64 counts from one
    combiner-first pass; P/Q/tie terms are integer folds over that
    bounded table (types x 24 x bands) on the driver, and only the final
    tau divides — mirrored double, x1e6 snap."""
    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "ts", "value"]
    )

    def partial(b: pa.Table) -> pa.Table:
        b = _clean(b, ("event_type", "ts", "value"))
        us = (
            b["ts"].cast(pa.timestamp("us")).cast(pa.int64()).to_numpy(
                zero_copy_only=False
            )
        )
        h = (us // _HOUR_US) % 24
        vb = np.floor(
            b["value"].to_numpy(zero_copy_only=False).astype(np.float64)
        ).astype(np.int64)
        t = pa.table(
            {
                "event_type": b["event_type"],
                "h": pa.array(h.astype(np.int64)),
                "vb": pa.array(vb),
                "n": pa.array(np.ones(len(h), dtype=np.int64)),
            }
        )
        return _sum_by(t, ["event_type", "h", "vb"], ["n"])

    def combine(b: pa.Table) -> pa.Table:
        return _sum_by(b, ["event_type", "h", "vb"], ["n"])

    cont = tree_merge(
        ev.map_batches(partial, batch_format="pyarrow", batch_size=None),
        combine,
    ).to_pandas()  # bounded: types x 24 x value bands

    if not len(cont) or "event_type" not in cont.columns:
        return pa.table(
            {
                "event_type": pa.array([], pa.string()),
                "n": pa.array([], pa.int64()),
                "tau_x1e6": pa.array([], pa.int64()),
            }
        )
    out = {"event_type": [], "n": [], "tau_x1e6": []}
    for et, g in cont.sort_values(["event_type", "h", "vb"]).groupby(
        "event_type", sort=True
    ):
        h = g["h"].to_numpy(dtype=np.int64)
        vb = g["vb"].to_numpy(dtype=np.int64)
        c = g["n"].to_numpy(dtype=np.int64)
        n = int(c.sum())
        # P/Q via 2-D exclusive suffix/prefix cumsums over the DENSE
        # contingency matrix — O(cells), never the O(cells^2) pair fold
        # (14k cells at sf0.1 would make that a multi-GB allocation).
        # Each unordered observation pair is counted once under h' > h;
        # within a cell every pair ties on both axes.
        hu, hi = np.unique(h, return_inverse=True)
        vu, vi = np.unique(vb, return_inverse=True)
        M = np.zeros((len(hu), len(vu)), dtype=np.int64)
        np.add.at(M, (hi, vi), c)
        suf_h = np.zeros_like(M)
        suf_h[:-1, :] = M[::-1, :].cumsum(0)[::-1, :][1:, :]
        gg = np.zeros_like(M)
        gg[:, :-1] = suf_h[:, ::-1].cumsum(1)[:, ::-1][:, 1:]
        gl = np.zeros_like(M)
        gl[:, 1:] = suf_h.cumsum(1)[:, :-1]
        P = int((M * gg).sum())
        Q = int((M * gl).sum())
        n0 = n * (n - 1) // 2
        mh = M.sum(1)
        mv = M.sum(0)
        tx = int((mh * (mh - 1) // 2).sum())
        ty = int((mv * (mv - 1) // 2).sum())
        den = np.sqrt(float(n0 - tx) * float(n0 - ty))
        tau = (
            None
            if den == 0.0
            else int(_round_half_away(np.array([(P - Q) / den * 1e6]))[0])
        )
        out["event_type"].append(et)
        out["n"].append(n)
        out["tau_x1e6"].append(tau)
    return pa.table(
        {
            "event_type": pa.array(out["event_type"], pa.string()),
            "n": pa.array(out["n"], pa.int64()),
            "tau_x1e6": pa.array(out["tau_x1e6"], pa.int64()),
        }
    )


KENDALL_SQL = """
WITH c AS MATERIALIZED (
  SELECT event_type, hour(ts) AS h, CAST(FLOOR(value) AS BIGINT) AS vb,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM events
  WHERE event_type IS NOT NULL AND ts IS NOT NULL AND value IS NOT NULL
  GROUP BY 1, 2, 3
), pq AS (
  SELECT a.event_type,
         CAST(SUM(a.n * b.n * CASE WHEN a.h < b.h AND a.vb < b.vb
                                   THEN 1 ELSE 0 END) AS BIGINT) AS p,
         CAST(SUM(a.n * b.n * CASE WHEN a.h < b.h AND a.vb > b.vb
                                   THEN 1 ELSE 0 END) AS BIGINT) AS q
  FROM c a JOIN c b ON a.event_type = b.event_type
  GROUP BY 1
), mh AS (
  SELECT event_type, CAST(SUM(nh * (nh - 1) / 2) AS BIGINT) AS tx,
         CAST(SUM(nh) AS BIGINT) AS n
  FROM (SELECT event_type, h, SUM(n) AS nh FROM c GROUP BY 1, 2)
  GROUP BY 1
), mv AS (
  SELECT event_type, CAST(SUM(nv * (nv - 1) / 2) AS BIGINT) AS ty
  FROM (SELECT event_type, vb, SUM(n) AS nv FROM c GROUP BY 1, 2)
  GROUP BY 1
)
SELECT pq.event_type, mh.n,
       CASE WHEN SQRT(CAST(mh.n * (mh.n - 1) / 2 - mh.tx AS DOUBLE)
                      * CAST(mh.n * (mh.n - 1) / 2 - mv.ty AS DOUBLE)) = 0
            THEN NULL
            ELSE CAST(ROUND(
              (pq.p - pq.q)
              / SQRT(CAST(mh.n * (mh.n - 1) / 2 - mh.tx AS DOUBLE)
                     * CAST(mh.n * (mh.n - 1) / 2 - mv.ty AS DOUBLE))
              * 1000000, 0) AS BIGINT) END AS tau_x1e6
FROM pq
JOIN mh ON pq.event_type = mh.event_type
JOIN mv ON pq.event_type = mv.event_type
"""


# ---------------------------------------------------------------------------
# market-basket part-pair lift over lineitem
# ---------------------------------------------------------------------------


def q_part_pair_lift(sf_dir):
    """Association rules over order baskets: part pairs co-ordered in at
    least 2 distinct orders, with support count and lift (the
    market-basket statistic: lift > 1 = the parts co-occur more often
    than independence predicts). Baskets are tiny (<= 7 lines/order) so
    pair emission is LINEAR in lineitems: hash-bucket by order key, one
    size-grouped triu per bucket — never a quadratic join. Counts are
    exact int64; lift is one mirrored double, x1e4 snap."""
    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_partkey"]
    )

    def clean(b: pa.Table) -> pa.Table:
        b = _clean(b, ("l_orderkey", "l_partkey"))
        return add_bucket(b, "l_orderkey", 64)

    bucketed = li.map_batches(clean, batch_format="pyarrow", batch_size=None)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "p1": pd.Series([], dtype=np.int64),
                "p2": pd.Series([], dtype=np.int64),
                "c12": pd.Series([], dtype=np.int64),
            }
        )
        if len(g) == 0:
            return empty
        g = g.drop_duplicates(["l_orderkey", "l_partkey"]).sort_values(
            ["l_orderkey", "l_partkey"], kind="mergesort", ignore_index=True
        )
        ok = g["l_orderkey"].to_numpy(dtype=np.int64)
        pk = g["l_partkey"].to_numpy(dtype=np.int64)
        new = np.empty(len(ok), dtype=bool)
        new[0] = True
        new[1:] = ok[1:] != ok[:-1]
        starts = np.flatnonzero(new)
        sizes = np.diff(np.append(starts, len(ok)))
        ia, ib = [], []
        for size in np.unique(sizes):
            if size < 2:
                continue
            seg = starts[sizes == size]
            ti, tj = np.triu_indices(int(size), 1)
            ia.append((seg[:, None] + ti[None, :]).reshape(-1))
            ib.append((seg[:, None] + tj[None, :]).reshape(-1))
        if not ia:
            return empty
        ii = np.concatenate(ia)
        jj = np.concatenate(ib)
        pairs = pd.DataFrame({"p1": pk[ii], "p2": pk[jj]})
        # bucket-local combiner: per-order pairs are distinct already, so
        # this counts distinct orders per pair within the bucket
        return (
            pairs.groupby(["p1", "p2"], sort=False)
            .size()
            .rename("c12")
            .reset_index()
        )

    pair_partials = bucketed.groupby(_BUCKET).map_groups(
        per_bucket, batch_format="pandas"
    )

    def combine_pairs(b: pa.Table) -> pa.Table:
        return _sum_by(b, ["p1", "p2"], ["c12"])

    pair_counts = tree_merge(pair_partials, combine_pairs).to_pandas()
    # bounded after the support filter: only pairs co-ordered >= 2 times
    if not len(pair_counts) or "p1" not in pair_counts.columns:
        pair_counts = pd.DataFrame(
            {
                "p1": pd.Series([], dtype=np.int64),
                "p2": pd.Series([], dtype=np.int64),
                "c12": pd.Series([], dtype=np.int64),
            }
        )
    pair_counts = pair_counts[pair_counts["c12"] >= 2].reset_index(drop=True)

    # per-part distinct-order counts + total order count, one more pass
    def part_partial(b: pa.Table) -> pa.Table:
        b = _clean(b, ("l_orderkey", "l_partkey"))
        df = pd.DataFrame(
            {
                "o": b["l_orderkey"].to_numpy(zero_copy_only=False),
                "p": b["l_partkey"].to_numpy(zero_copy_only=False),
            }
        ).drop_duplicates()
        per = df.groupby("p", sort=False).size().rename("c").reset_index()
        return pa.table(
            {
                "p": pa.array(per["p"].to_numpy(dtype=np.int64)),
                "c": pa.array(per["c"].to_numpy(dtype=np.int64)),
            }
        )

    # (order, part) is unique per lineitem FILE-block only after the pair
    # bucketing above; for the marginals, dedupe globally first (same
    # bucket shuffle, distinct within bucket), then count per part.
    def per_bucket_marginal(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame(
                {
                    "p": pd.Series([], dtype=np.int64),
                    "c": pd.Series([], dtype=np.int64),
                    "orders": pd.Series([], dtype=np.int64),
                }
            )
        d = g.drop_duplicates(["l_orderkey", "l_partkey"])
        per = d.groupby("l_partkey", sort=False).size().rename("c").reset_index()
        return pd.DataFrame(
            {
                "p": per["l_partkey"].to_numpy(dtype=np.int64),
                "c": per["c"].to_numpy(dtype=np.int64),
                "orders": np.where(
                    np.arange(len(per)) == 0,
                    g["l_orderkey"].nunique(),
                    0,
                ).astype(np.int64),
            }
        )

    marg = tree_merge(
        bucketed.groupby(_BUCKET).map_groups(
            per_bucket_marginal, batch_format="pandas"
        ),
        lambda b: _sum_by(b, ["p"], ["c", "orders"]),
    ).to_pandas()

    if not len(pair_counts):
        return pa.table(
            {
                "p1": pa.array([], pa.int64()),
                "p2": pa.array([], pa.int64()),
                "c12": pa.array([], pa.int64()),
                "lift_x1e4": pa.array([], pa.int64()),
            }
        )
    n_orders = int(marg["orders"].sum())
    cmap = dict(zip(marg["p"].to_numpy(), marg["c"].to_numpy()))
    c1 = pair_counts["p1"].map(cmap).to_numpy(dtype=np.int64)
    c2 = pair_counts["p2"].map(cmap).to_numpy(dtype=np.int64)
    c12 = pair_counts["c12"].to_numpy(dtype=np.int64)
    lift = _round_half_away(
        (n_orders * c12).astype(np.float64) / (c1 * c2) * 1e4
    )
    out = pair_counts.assign(lift_x1e4=lift).sort_values(
        ["p1", "p2"], ignore_index=True
    )
    return pa.table(
        {
            "p1": pa.array(out["p1"].to_numpy(dtype=np.int64)),
            "p2": pa.array(out["p2"].to_numpy(dtype=np.int64)),
            "c12": pa.array(out["c12"].to_numpy(dtype=np.int64)),
            "lift_x1e4": pa.array(out["lift_x1e4"].to_numpy(dtype=np.int64)),
        }
    )


PART_PAIR_LIFT_SQL = """
WITH d AS MATERIALIZED (
  SELECT DISTINCT l_orderkey AS o, l_partkey AS p
  FROM lineitem
  WHERE l_orderkey IS NOT NULL AND l_partkey IS NOT NULL
), pairs AS (
  SELECT a.p AS p1, b.p AS p2, CAST(COUNT(*) AS BIGINT) AS c12
  FROM d a JOIN d b ON a.o = b.o AND a.p < b.p
  GROUP BY 1, 2
  HAVING COUNT(*) >= 2
), marg AS (
  SELECT p, CAST(COUNT(*) AS BIGINT) AS c FROM d GROUP BY 1
), tot AS (
  SELECT CAST(COUNT(DISTINCT o) AS BIGINT) AS n FROM d
)
SELECT pairs.p1, pairs.p2, pairs.c12,
       CAST(ROUND(CAST(tot.n * pairs.c12 AS DOUBLE)
                  / (m1.c * m2.c) * 10000, 0) AS BIGINT) AS lift_x1e4
FROM pairs, tot
JOIN marg m1 ON pairs.p1 = m1.p
JOIN marg m2 ON pairs.p2 = m2.p
"""


# ---------------------------------------------------------------------------
# Cohen's kappa between two deterministic rule labelers
# ---------------------------------------------------------------------------


def q_labeler_kappa_docs(sf_dir):
    """Per source: Cohen's kappa agreement between two deterministic
    document labelers — A = "long doc" (word count > 50), B = "high
    lexical diversity" (2 * distinct words >= words, an integer-exact
    ratio test). The annotator-agreement audit every labeling pipeline
    runs before trusting silver labels; kappa corrects raw agreement for
    chance. Contingency cells are exact int64 from one combiner-first
    pass; kappa = (po - pe) / (1 - pe) is one mirrored double per
    source, x1e6 snap, NULL at pe = 1 (degenerate marginals)."""
    docs = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["source", "text"]
    )

    def partial(b: pa.Table) -> pa.Table:
        b = _clean(b, ("source", "text"))
        words = pc.split_pattern(b["text"], pattern=" ")
        lens = pc.list_value_length(words).to_numpy(zero_copy_only=False)
        flat = pc.list_flatten(words).to_numpy(zero_copy_only=False)
        doc_idx = np.repeat(np.arange(len(lens)), lens)
        per = (
            pd.DataFrame({"d": doc_idx, "w": flat})
            .groupby("d", sort=True)
            .agg(nw=("w", "size"), nd=("w", "nunique"))
        )
        nw = np.zeros(len(lens), dtype=np.int64)
        nd = np.zeros(len(lens), dtype=np.int64)
        nw[per.index.to_numpy()] = per["nw"].to_numpy()
        nd[per.index.to_numpy()] = per["nd"].to_numpy()
        a = (nw > 50).astype(np.int64)
        bb = (2 * nd >= nw).astype(np.int64)
        t = pa.table(
            {
                "source": b["source"],
                "n11": pa.array(a * bb),
                "n10": pa.array(a * (1 - bb)),
                "n01": pa.array((1 - a) * bb),
                "n00": pa.array((1 - a) * (1 - bb)),
            }
        )
        return _sum_by(t, ["source"], ["n11", "n10", "n01", "n00"])

    def combine(b: pa.Table) -> pa.Table:
        return _sum_by(b, ["source"], ["n11", "n10", "n01", "n00"])

    m = tree_merge(
        docs.map_batches(partial, batch_format="pyarrow", batch_size=None),
        combine,
    ).to_pandas()  # bounded: one row per source

    if not len(m) or "source" not in m.columns:
        return pa.table(
            {
                "source": pa.array([], pa.string()),
                "n": pa.array([], pa.int64()),
                "kappa_x1e6": pa.array([], pa.int64()),
            }
        )
    m = m.sort_values("source", ignore_index=True)
    n11 = m["n11"].to_numpy(dtype=np.int64)
    n10 = m["n10"].to_numpy(dtype=np.int64)
    n01 = m["n01"].to_numpy(dtype=np.int64)
    n00 = m["n00"].to_numpy(dtype=np.int64)
    n = n11 + n10 + n01 + n00
    po = (n11 + n00).astype(np.float64) / n
    pe = (
        ((n11 + n10) * (n11 + n01) + (n01 + n00) * (n10 + n00)).astype(
            np.float64
        )
        / n
        / n
    )
    ok = pe != 1.0
    kappa = np.where(
        ok,
        _round_half_away(
            np.where(ok, (po - pe) / np.where(ok, 1.0 - pe, 1.0), 0.0) * 1e6
        ),
        0,
    )
    vals = np.where(ok, kappa, None)
    return pa.table(
        {
            "source": pa.array(m["source"], pa.string()),
            "n": pa.array(n),
            "kappa_x1e6": pa.array(vals.tolist(), pa.int64()),
        }
    )


KAPPA_SQL = """
WITH w AS (
  SELECT source, doc_id, unnest(string_split(text, ' ')) AS word
  FROM documents
  WHERE source IS NOT NULL AND text IS NOT NULL AND doc_id IS NOT NULL
), per AS (
  SELECT source, doc_id,
         CAST(COUNT(*) AS BIGINT) AS nw,
         CAST(COUNT(DISTINCT word) AS BIGINT) AS nd
  FROM w GROUP BY 1, 2
), lab AS (
  SELECT source,
         CASE WHEN nw > 50 THEN 1 ELSE 0 END AS a,
         CASE WHEN 2 * nd >= nw THEN 1 ELSE 0 END AS b
  FROM per
), c AS (
  SELECT source,
         CAST(SUM(a * b) AS BIGINT) AS n11,
         CAST(SUM(a * (1 - b)) AS BIGINT) AS n10,
         CAST(SUM((1 - a) * b) AS BIGINT) AS n01,
         CAST(SUM((1 - a) * (1 - b)) AS BIGINT) AS n00
  FROM lab GROUP BY 1
)
SELECT source, n11 + n10 + n01 + n00 AS n,
       CASE WHEN CAST((n11 + n10) * (n11 + n01)
                      + (n01 + n00) * (n10 + n00) AS DOUBLE)
                 / (n11 + n10 + n01 + n00) / (n11 + n10 + n01 + n00) = 1.0
            THEN NULL
            ELSE CAST(ROUND(
              (CAST(n11 + n00 AS DOUBLE) / (n11 + n10 + n01 + n00)
               - CAST((n11 + n10) * (n11 + n01)
                      + (n01 + n00) * (n10 + n00) AS DOUBLE)
                 / (n11 + n10 + n01 + n00) / (n11 + n10 + n01 + n00))
              / (1.0 - CAST((n11 + n10) * (n11 + n01)
                            + (n01 + n00) * (n10 + n00) AS DOUBLE)
                   / (n11 + n10 + n01 + n00) / (n11 + n10 + n01 + n00))
              * 1000000, 0) AS BIGINT) END AS kappa_x1e6
FROM c ORDER BY source
"""


def register_r4ch(queries: dict, oracles: dict) -> None:
    queries.update(
        {
            "kendall_tau_value_hour": q_kendall_tau_value_hour,
            "part_pair_lift": q_part_pair_lift,
            "labeler_kappa_docs": q_labeler_kappa_docs,
        }
    )
    oracles.update(
        {
            "kendall_tau_value_hour": KENDALL_SQL,
            "part_pair_lift": PART_PAIR_LIFT_SQL,
            "labeler_kappa_docs": KAPPA_SQL,
        }
    )
