"""Round-4 batch AU: QQ decile table, word-pair PMI, and per-customer
spend trend signs.

Exactness discipline: QQ points are exact PERCENTILE_DISC cents under
the repo-wide ceil(q*n) rank rule; PMI rides ln parity over exact
doc-frequency integers; trend signs are the sign of the exact integer
n*Sxy - Sx*Sy (no division, no floats)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from mimirsbrunn_ray.stages.rollup import tree_merge

_DAY_US = 86_400_000_000


def _round_half_away(x: np.ndarray) -> np.ndarray:
    return np.where(
        x >= 0, np.floor(x + 0.5), np.ceil(x - 0.5)
    ).astype(np.int64)


# ---------------------------------------------------------------------------
# QQ decile table: weekday vs weekend value quantiles per type
# ---------------------------------------------------------------------------


def q_qq_weekpart_value(sf_dir):
    """The QQ table comparing weekday vs weekend value distributions per
    type: at each decile, the exact PERCENTILE_DISC cents value of both
    populations — the plot a distribution-shift review reads (points on
    the diagonal = same shape). One decomposable (type, weekpart,
    cents) histogram; both quantile columns come from the bounded
    cumulative walk with the repo-wide ceil(q*n) rank rule."""
    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "ts", "value"]
    )

    def partial(b: pa.Table) -> pa.Table:
        b = b.filter(
            pc.and_(
                pc.and_(
                    pc.is_valid(b["event_type"]), pc.is_valid(b["value"])
                ),
                pc.is_valid(b["ts"]),
            )
        )
        ts_us = b["ts"].cast(pa.timestamp("us")).cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        dow = (np.floor_divide(ts_us, _DAY_US) + 4) % 7
        we = ((dow == 0) | (dow == 6)).astype(np.int64)
        x = _round_half_away(
            b["value"].cast(pa.float64()).to_numpy(zero_copy_only=False)
            * 100.0
        )
        t = pa.table(
            {
                "event_type": b["event_type"],
                "we": pa.array(we),
                "v": pa.array(x),
            }
        )
        g = t.group_by(["event_type", "we", "v"]).aggregate(
            [([], "count_all")]
        )
        g = g.select(["event_type", "we", "v", "count_all"])
        return g.rename_columns(["event_type", "we", "v", "n"])

    def combine(b: pa.Table) -> pa.Table:
        g = b.group_by(["event_type", "we", "v"]).aggregate([("n", "sum")])
        return g.rename_columns(["event_type", "we", "v", "n"])

    hist = tree_merge(
        ev.map_batches(partial, batch_format="pyarrow", batch_size=None),
        combine,
    ).to_pandas()  # bounded: types x 2 x cents domain

    rows = {"event_type": [], "decile": [], "q_weekday_x100": [],
            "q_weekend_x100": []}

    def disc(g: pd.DataFrame, q: float):
        g = g.sort_values("v")
        v = g["v"].to_numpy(dtype=np.int64)
        cum = np.cumsum(g["n"].to_numpy(dtype=np.int64))
        total = int(cum[-1])
        rank = int(np.ceil(q * total - 1e-9))
        return int(v[np.searchsorted(cum, rank, "left")])

    if len(hist):
        for et, g in hist.groupby("event_type", sort=True):
            wd = g[g["we"] == 0]
            we = g[g["we"] == 1]
            if not len(wd) or not len(we):
                continue
            for d in range(1, 10):
                rows["event_type"].append(et)
                rows["decile"].append(d)
                rows["q_weekday_x100"].append(disc(wd, d / 10))
                rows["q_weekend_x100"].append(disc(we, d / 10))
    return pa.table(
        {
            "event_type": pa.array(rows["event_type"], pa.string()),
            "decile": pa.array(rows["decile"], pa.int64()),
            "q_weekday_x100": pa.array(
                rows["q_weekday_x100"], pa.int64()
            ),
            "q_weekend_x100": pa.array(
                rows["q_weekend_x100"], pa.int64()
            ),
        }
    )


QQ_SQL = """
WITH v AS MATERIALIZED (
  SELECT event_type,
         CASE WHEN dayofweek(ts) IN (0, 6) THEN 1 ELSE 0 END AS we,
         CAST(ROUND(value * 100, 0) AS BIGINT) AS x
  FROM events
  WHERE event_type IS NOT NULL AND ts IS NOT NULL AND value IS NOT NULL
), qs AS (
  SELECT event_type, we,
         quantile_disc(x, [0.1, 0.2, 0.3, 0.4, 0.5,
                           0.6, 0.7, 0.8, 0.9]) AS q
  FROM v GROUP BY 1, 2
), d(decile) AS (SELECT unnest(generate_series(1, 9)))
SELECT a.event_type, CAST(d.decile AS BIGINT) AS decile,
       CAST(a.q[d.decile] AS BIGINT) AS q_weekday_x100,
       CAST(b.q[d.decile] AS BIGINT) AS q_weekend_x100
FROM qs a JOIN qs b ON a.event_type = b.event_type
       AND a.we = 0 AND b.we = 1
CROSS JOIN d
"""


# ---------------------------------------------------------------------------
# PMI of top word pairs (document co-occurrence)
# ---------------------------------------------------------------------------

_PMI_TOP_WORDS = 12
_PMI_TOP_PAIRS = 15


def q_top_word_pair_pmi(sf_dir):
    """Pointwise mutual information of word PAIRS co-occurring in the
    same document, restricted to the corpus's `_PMI_TOP_WORDS` most
    document-frequent words (the bounded-candidate discipline: pair
    space is top^2, never vocab^2): pmi = ln(df_ab * N / (df_a *
    df_b)), the collocation signal beyond adjacent bigrams. Two passes:
    a df pass picks the candidate words; a membership pass counts pair
    co-occurrence vectorized (one isin mask per candidate). Top
    `_PMI_TOP_PAIRS` pairs by x1e6 PMI (ties by words)."""
    docs = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )

    def df_partial(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_valid(b["text"]))
        words = pc.split_pattern(pc.utf8_lower(b["text"]), " ")
        n_per = pc.list_value_length(words).to_numpy(zero_copy_only=False)
        flat = pc.list_flatten(words).to_numpy(zero_copy_only=False)
        seg = np.repeat(np.arange(len(b)), n_per)
        dd = pd.DataFrame({"seg": seg, "w": flat}).drop_duplicates()
        agg = dd.groupby("w", sort=False).size()
        # n_docs rides the first row only, so summing the column after
        # any merge yields the total document count
        nd = np.zeros(len(agg), dtype=np.int64)
        if len(nd):
            nd[0] = len(b)
        return pa.table(
            {
                "w": pa.array(agg.index.to_numpy()),
                "df": pa.array(agg.to_numpy(dtype=np.int64)),
                "n_docs": pa.array(nd),
            }
        )

    def df_combine(b: pa.Table) -> pa.Table:
        g = b.group_by(["w"]).aggregate(
            [("df", "sum"), ("n_docs", "sum")]
        )
        return g.rename_columns(["w", "df", "n_docs"])

    dfs = tree_merge(
        docs.map_batches(df_partial, batch_format="pyarrow",
                         batch_size=None),
        df_combine,
    ).to_pandas()  # bounded: vocabulary (min-df caveat for open vocabs)
    if not len(dfs):
        return pa.table(
            {
                "word_a": pa.array([], pa.string()),
                "word_b": pa.array([], pa.string()),
                "df_a": pa.array([], pa.int64()),
                "df_b": pa.array([], pa.int64()),
                "df_ab": pa.array([], pa.int64()),
                "pmi_x1e6": pa.array([], pa.int64()),
            }
        )
    n_docs = int(dfs["n_docs"].sum())
    top = dfs.sort_values(
        ["df", "w"], ascending=[False, True], ignore_index=True
    ).head(_PMI_TOP_WORDS)
    cand = top["w"].tolist()
    df_map = dict(zip(top["w"], top["df"].astype(np.int64)))

    def pair_partial(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_valid(b["text"]))
        empty = pa.table(
            {
                "i": pa.array([], pa.int64()),
                "j": pa.array([], pa.int64()),
                "c": pa.array([], pa.int64()),
            }
        )
        if b.num_rows == 0:
            return empty
        words = pc.split_pattern(pc.utf8_lower(b["text"]), " ")
        n_per = pc.list_value_length(words).to_numpy(zero_copy_only=False)
        flat = pc.list_flatten(words).to_numpy(zero_copy_only=False)
        seg = np.repeat(np.arange(len(b)), n_per)
        # membership matrix rows x candidates
        mem = np.zeros((len(b), len(cand)), dtype=bool)
        for ci, w in enumerate(cand):
            mem[np.unique(seg[flat == w]), ci] = True
        co = mem.T.astype(np.int64) @ mem.astype(np.int64)
        iu, ju = np.triu_indices(len(cand), k=1)
        c = co[iu, ju]
        keep = c > 0
        return pa.table(
            {
                "i": pa.array(iu[keep].astype(np.int64)),
                "j": pa.array(ju[keep].astype(np.int64)),
                "c": pa.array(c[keep]),
            }
        )

    def pair_combine(b: pa.Table) -> pa.Table:
        g = b.group_by(["i", "j"]).aggregate([("c", "sum")])
        return g.rename_columns(["i", "j", "c"])

    pairs = tree_merge(
        docs.map_batches(pair_partial, batch_format="pyarrow",
                         batch_size=None),
        pair_combine,
    ).to_pandas()  # bounded: top^2 pairs

    rows = []
    for _, r in pairs.iterrows():
        wa, wb = cand[int(r["i"])], cand[int(r["j"])]
        if wa > wb:
            wa, wb = wb, wa
        dfa, dfb = int(df_map[wa]), int(df_map[wb])
        dab = int(r["c"])
        pmi = float(np.log(dab * np.float64(n_docs) / (np.float64(dfa)
                                                       * dfb)))
        rows.append(
            (wa, wb, dfa, dfb, dab,
             int(_round_half_away(np.array([pmi * 1e6]))[0]))
        )
    rows.sort(key=lambda t: (-t[5], t[0], t[1]))
    rows = rows[:_PMI_TOP_PAIRS]
    return pa.table(
        {
            "word_a": pa.array([r[0] for r in rows], pa.string()),
            "word_b": pa.array([r[1] for r in rows], pa.string()),
            "df_a": pa.array([r[2] for r in rows], pa.int64()),
            "df_b": pa.array([r[3] for r in rows], pa.int64()),
            "df_ab": pa.array([r[4] for r in rows], pa.int64()),
            "pmi_x1e6": pa.array([r[5] for r in rows], pa.int64()),
        }
    )


PMI_PAIRS_SQL = f"""
WITH d AS MATERIALIZED (
  SELECT doc_id, list_distinct(string_split(lower(text), ' ')) AS ws
  FROM documents WHERE text IS NOT NULL
), n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM d),
w AS (
  SELECT unnest(ws) AS w, doc_id FROM d
), df AS (
  SELECT w, CAST(COUNT(*) AS BIGINT) AS df FROM w GROUP BY 1
), top AS (
  SELECT w, df FROM df
  ORDER BY df DESC, w LIMIT {_PMI_TOP_WORDS}
), hits AS (
  SELECT w.doc_id, w.w FROM w JOIN top USING (w)
), co AS (
  SELECT a.w AS word_a, b.w AS word_b, CAST(COUNT(*) AS BIGINT) AS df_ab
  FROM hits a JOIN hits b
    ON a.doc_id = b.doc_id AND a.w < b.w
  GROUP BY 1, 2
)
SELECT co.word_a, co.word_b,
       ta.df AS df_a, tb.df AS df_b, co.df_ab,
       CAST(ROUND(LN(co.df_ab * 1.0 * n.n_docs
                     / (ta.df * 1.0 * tb.df)) * 1000000, 0) AS BIGINT)
         AS pmi_x1e6
FROM co
JOIN top ta ON ta.w = co.word_a
JOIN top tb ON tb.w = co.word_b
CROSS JOIN n
ORDER BY pmi_x1e6 DESC, word_a, word_b
LIMIT {_PMI_TOP_PAIRS}
"""


# ---------------------------------------------------------------------------
# per-customer spend trend: exact slope signs
# ---------------------------------------------------------------------------


def q_customer_spend_trend_counts(sf_dir):
    """How many customers trend UP vs FLAT vs DOWN in order spend: the
    OLS slope of (order index, cents price) per customer, reduced to
    its EXACT sign — sign(n*Sxy - Sx*Sy) needs no division and no
    floats, so the classification is engine-independent. Customers with
    fewer than 2 orders are excluded. One customer hash-bucket shuffle;
    per-customer integer moments; bounded sign counts."""
    from mimirsbrunn_ray.stages.dedup import _BUCKET, add_bucket

    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_orderkey", "o_orderdate", "o_totalprice"],
    )

    def project(b: pa.Table) -> pa.Table:
        b = b.filter(
            pc.and_(
                pc.and_(
                    pc.is_valid(b["o_custkey"]),
                    pc.is_valid(b["o_orderdate"]),
                ),
                pc.is_valid(b["o_totalprice"]),
            )
        )
        return add_bucket(b, "o_custkey", 64)

    proj = orders.map_batches(project, batch_format="pyarrow",
                              batch_size=None)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "trend": pd.Series([], dtype=np.int64),
                "n_customers": pd.Series([], dtype=np.int64),
            }
        )
        if len(g) == 0:
            return empty
        g = g.sort_values(
            ["o_custkey", "o_orderdate", "o_orderkey"],
            kind="mergesort", ignore_index=True,
        )
        y = _round_half_away(
            g["o_totalprice"].to_numpy(dtype=np.float64) * 100.0
        )
        ck = g["o_custkey"].to_numpy(dtype=np.int64)
        # order index within customer (0-based)
        x = (
            pd.Series(np.ones(len(g), dtype=np.int64))
            .groupby(ck).cumsum().to_numpy() - 1
        )
        df = pd.DataFrame(
            {"ck": ck, "n": 1, "sx": x, "sy": y, "sxy": x * y}
        )
        m = df.groupby("ck", sort=False).sum()
        m = m[m["n"] >= 2]
        sgn = np.sign(
            m["n"].to_numpy(dtype=np.int64)
            * m["sxy"].to_numpy(dtype=np.int64)
            - m["sx"].to_numpy(dtype=np.int64)
            * m["sy"].to_numpy(dtype=np.int64)
        ).astype(np.int64)
        lvl, c = np.unique(sgn, return_counts=True)
        return pd.DataFrame(
            {
                "trend": lvl.astype(np.int64),
                "n_customers": c.astype(np.int64),
            }
        )

    partials = proj.groupby(_BUCKET).map_groups(
        per_bucket, batch_format="pandas"
    )

    def combine(b: pa.Table) -> pa.Table:
        g = b.group_by(["trend"]).aggregate([("n_customers", "sum")])
        return g.rename_columns(["trend", "n_customers"])

    return tree_merge(partials, combine)


SPEND_TREND_SQL = """
WITH o AS (
  SELECT o_custkey,
         CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey
              ORDER BY o_orderdate, o_orderkey) - 1 AS BIGINT) AS x,
         CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS y
  FROM orders
  WHERE o_custkey IS NOT NULL AND o_orderdate IS NOT NULL
    AND o_totalprice IS NOT NULL
), m AS (
  SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
         CAST(SUM(x * y) AS BIGINT) AS sxy
  FROM o GROUP BY 1
  HAVING COUNT(*) >= 2
)
SELECT CAST(SIGN(n * sxy - sx * sy) AS BIGINT) AS trend,
       CAST(COUNT(*) AS BIGINT) AS n_customers
FROM m GROUP BY 1
"""


def register_r4au(queries: dict, oracles: dict) -> None:
    queries.update(
        {
            "qq_weekpart_value": q_qq_weekpart_value,
            "top_word_pair_pmi": q_top_word_pair_pmi,
            "customer_spend_trend_counts": q_customer_spend_trend_counts,
        }
    )
    oracles.update(
        {
            "qq_weekpart_value": QQ_SQL,
            "top_word_pair_pmi": PMI_PAIRS_SQL,
            "customer_spend_trend_counts": SPEND_TREND_SQL,
        }
    )
