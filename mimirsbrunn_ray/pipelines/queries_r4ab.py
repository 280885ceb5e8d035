"""Round-4 batch AB: change-point detection over the hourly series,
reciprocal-rank fusion of the two search passes, and cross-source
quantile normalization of document lengths.

Exactness discipline: the change-point argmax is over f(t) =
S_l^2/n_l + S_r^2/n_r with S as exact BIGINT prefix sums and the ratio
evaluated as the identical IEEE double expression in both engines (the
emitted columns are the integer split descriptors, not f); RRF ranks
are integers and the fused score is a sum of two exact reciprocals
rounded once; quantile normalization is a pure integer-rank
cross-compare (cum_pool(v) * n_src >= k * N_pool), no doubles at all.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from mimirsbrunn_ray.stages.rollup import tree_merge

_HOUR_US = 3_600_000_000


def _round_half_away(x: np.ndarray) -> np.ndarray:
    return np.where(
        x >= 0, np.floor(x + 0.5), np.ceil(x - 0.5)
    ).astype(np.int64)


# ---------------------------------------------------------------------------
# binary-segmentation change point over the hourly value series
# ---------------------------------------------------------------------------


def q_changepoint_hourly(sf_dir):
    """Per event type, the single best change point in the hourly
    value-sum series by binary segmentation: the split t (1 <= t < N,
    in observed-bucket order) maximizing the between-segment objective
    f(t) = S_l^2/n_l + S_r^2/n_r (equivalently minimizing total SSE,
    since sum(x^2) is constant in t). Ties break on the earliest t.

    Scale shape: the heavy pass is the decomposable hourly rollup
    (bounded by types x hours); the argmax scan runs over that bounded
    series. Prefix sums are exact BIGINT cents; f is evaluated as the
    same double expression the SQL twin uses, and the emitted columns
    (split index, split hour, left/right counts and exact sums) are
    pure integers.
    """
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
        hr = np.floor_divide(ts_us, _HOUR_US)
        x = _round_half_away(
            b["value"].cast(pa.float64()).to_numpy(zero_copy_only=False)
            * 100.0
        )
        t = pa.table(
            {
                "event_type": b["event_type"],
                "hr": pa.array(hr),
                "x": pa.array(x),
            }
        )
        g = t.group_by(["event_type", "hr"]).aggregate([("x", "sum")])
        g = g.select(["event_type", "hr", "x_sum"])
        return g.rename_columns(["event_type", "hr", "y"])

    def combine(b: pa.Table) -> pa.Table:
        g = b.group_by(["event_type", "hr"]).aggregate([("y", "sum")])
        return g.rename_columns(["event_type", "hr", "y"])

    series = tree_merge(
        ev.map_batches(partial, batch_format="pyarrow", batch_size=None),
        combine,
    ).to_pandas()  # bounded: types x hour buckets

    rows = {"event_type": [], "n_buckets": [], "split_i": [],
            "split_hr": [], "n_left": [], "sum_left_x100": [],
            "n_right": [], "sum_right_x100": []}
    if len(series):
        for et, g in series.groupby("event_type", sort=True):
            g = g.sort_values("hr")
            y = g["y"].to_numpy(dtype=np.int64)
            hrs = g["hr"].to_numpy(dtype=np.int64)
            n = len(y)
            if n < 2:
                continue
            cs = np.cumsum(y)  # exact BIGINT prefix sums
            total = int(cs[-1])
            t = np.arange(1, n, dtype=np.int64)  # left length
            s_l = cs[:-1].astype(np.float64)
            s_r = (total - cs[:-1]).astype(np.float64)
            f = s_l * s_l / t + s_r * s_r / (n - t)
            best = int(np.argmax(f))  # first max: the earliest-t tie rule
            ti = best + 1
            rows["event_type"].append(et)
            rows["n_buckets"].append(n)
            rows["split_i"].append(ti)
            rows["split_hr"].append(int(hrs[ti]))  # first right bucket
            rows["n_left"].append(ti)
            rows["sum_left_x100"].append(int(cs[best]))
            rows["n_right"].append(n - ti)
            rows["sum_right_x100"].append(total - int(cs[best]))
    return pa.table(
        {
            "event_type": pa.array(rows["event_type"], pa.string()),
            "n_buckets": pa.array(rows["n_buckets"], pa.int64()),
            "split_i": pa.array(rows["split_i"], pa.int64()),
            "split_hr": pa.array(rows["split_hr"], pa.int64()),
            "n_left": pa.array(rows["n_left"], pa.int64()),
            "sum_left_x100": pa.array(rows["sum_left_x100"], pa.int64()),
            "n_right": pa.array(rows["n_right"], pa.int64()),
            "sum_right_x100": pa.array(rows["sum_right_x100"], pa.int64()),
        }
    )


CHANGEPOINT_SQL = """
WITH hourly AS MATERIALIZED (
  SELECT event_type,
         CAST(FLOOR(epoch(ts) / 3600) AS BIGINT) AS hr,
         CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT) AS y
  FROM events
  WHERE event_type IS NOT NULL AND ts IS NOT NULL AND value IS NOT NULL
  GROUP BY 1, 2
), s AS (
  SELECT event_type, hr,
         CAST(ROW_NUMBER()
              OVER (PARTITION BY event_type ORDER BY hr) AS BIGINT) AS i,
         CAST(SUM(y) OVER (PARTITION BY event_type ORDER BY hr)
              AS BIGINT) AS cs,
         CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT) AS n,
         CAST(SUM(y) OVER (PARTITION BY event_type) AS BIGINT) AS tot,
         LEAD(hr) OVER (PARTITION BY event_type ORDER BY hr) AS next_hr
  FROM hourly
), f AS (
  SELECT event_type, n, i AS split_i, next_hr AS split_hr,
         i AS n_left, cs AS sum_left_x100,
         n - i AS n_right, tot - cs AS sum_right_x100,
         CAST(cs AS DOUBLE) * CAST(cs AS DOUBLE) / CAST(i AS DOUBLE)
           + CAST(tot - cs AS DOUBLE) * CAST(tot - cs AS DOUBLE)
             / CAST(n - i AS DOUBLE) AS fval
  FROM s WHERE i < n
)
SELECT event_type, n AS n_buckets, split_i, split_hr,
       n_left, sum_left_x100, n_right, sum_right_x100
FROM f
QUALIFY ROW_NUMBER()
  OVER (PARTITION BY event_type ORDER BY fval DESC, split_i) = 1
"""


# ---------------------------------------------------------------------------
# reciprocal-rank fusion of the prefix and fuzzy search passes
# ---------------------------------------------------------------------------

_RRF_QUERY = "the "
_RRF_K = 10
_RRF_POOL = 20  # depth of each input list
_RRF_C = 60     # the standard RRF constant


def _trigram_overlap_topk(docs, query: str, pool: int):
    """Top-`pool` docs by char-trigram overlap with the query, ranked by
    the integer key (inter DESC, n_tri ASC, doc_id ASC) — one streaming
    pass of vectorized shingle hashing + per-block prune, tree-merged
    with the same order."""
    from mimirsbrunn_ray.stages.neardup import _batch_shingle_hashes
    from mimirsbrunn_ray.stages.rollup import tree_merge

    q_vals = np.unique(
        _batch_shingle_hashes([query.lower()], k=3)[0]
    )
    order = [("inter", "descending"), ("n_tri", "ascending"),
             ("doc_id", "ascending")]

    def score(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_valid(b["doc_id"]))
        empty = pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "inter": pa.array([], pa.int64()),
                "n_tri": pa.array([], pa.int64()),
            }
        )
        if b.num_rows == 0:
            return empty
        texts = [
            (t or "").lower()
            for t in b["text"].to_pylist()
        ]
        vals, offs = _batch_shingle_hashes(texts, k=3)
        counts = np.diff(np.concatenate((offs, [len(vals)])))
        seg = np.repeat(np.arange(len(texts)), counts)
        # distinct (row, hash) pairs via one lexsort + adjacent dedup
        o = np.lexsort((vals, seg))
        sv, ss = vals[o], seg[o]
        keep = np.concatenate(
            ([True], (sv[1:] != sv[:-1]) | (ss[1:] != ss[:-1]))
        )
        sv, ss = sv[keep], ss[keep]
        n_tri = np.bincount(ss, minlength=len(texts)).astype(np.int64)
        hit = np.isin(sv, q_vals)
        inter = np.bincount(
            ss[hit], minlength=len(texts)
        ).astype(np.int64)
        m = inter > 0
        t = pa.table(
            {
                "doc_id": b["doc_id"].cast(pa.int64()).filter(
                    pa.array(m)
                ),
                "inter": pa.array(inter[m]),
                "n_tri": pa.array(n_tri[m]),
            }
        )
        return t.sort_by(order).slice(0, pool)

    def combine(b: pa.Table) -> pa.Table:
        return b.sort_by(order).slice(0, pool)

    return tree_merge(
        docs.map_batches(score, batch_format="pyarrow", batch_size=None),
        combine,
    )


def q_rrf_search_docs(sf_dir):
    """Reciprocal-rank fusion of two lexical passes — the exact-prefix
    list and a trigram-OVERLAP list for the same query, fused as
    rrf = sum over lists of 1/(60 + rank). The classic way a search
    layer combines passes without score calibration. The overlap list
    ranks by the pure-integer key (inter DESC, n_tri ASC, doc_id) so
    both engines order identically by construction (the float-blend
    fuzzy score is engine-specific in its last ulp, which would make
    near-tie ranks nondeterministic across engines). Both input lists
    are driver-bounded (top `_RRF_POOL` each, the same paging bound the
    reference's autocomplete uses), so the fusion is a bytes-sized
    driver finish."""
    from mimirsbrunn_ray.stages.search import prefix_search

    docs = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "n_chars"]
    )
    pref = prefix_search(docs, _RRF_QUERY, k=_RRF_POOL).to_pandas()
    fuzz = _trigram_overlap_topk(docs, _RRF_QUERY, _RRF_POOL).to_pandas()
    ranks: dict[int, list] = {}
    for li, df in enumerate((pref, fuzz)):
        # an all-miss pass materializes to a schema-less empty frame
        ids = df["doc_id"].tolist() if "doc_id" in df.columns else []
        for r, doc_id in enumerate(ids, start=1):
            ranks.setdefault(int(doc_id), [None, None])[li] = r
    out = {"doc_id": [], "rank_prefix": [], "rank_fuzzy": [],
           "rrf_x1e9": []}
    fused = []
    for doc_id, (rp, rf) in ranks.items():
        score = 0.0
        if rp is not None:
            score += 1.0 / (_RRF_C + rp)
        if rf is not None:
            score += 1.0 / (_RRF_C + rf)
        fused.append((doc_id, rp, rf, score))
    fused.sort(key=lambda x: (-x[3], x[0]))
    for doc_id, rp, rf, score in fused[:_RRF_K]:
        out["doc_id"].append(doc_id)
        out["rank_prefix"].append(rp)
        out["rank_fuzzy"].append(rf)
        out["rrf_x1e9"].append(
            int(_round_half_away(np.array([score * 1e9]))[0])
        )
    return pa.table(
        {
            "doc_id": pa.array(out["doc_id"], pa.int64()),
            "rank_prefix": pa.array(out["rank_prefix"], pa.int64()),
            "rank_fuzzy": pa.array(out["rank_fuzzy"], pa.int64()),
            "rrf_x1e9": pa.array(out["rrf_x1e9"], pa.int64()),
        }
    )


def _rrf_sql(query: str, k: int, pool: int, c: int,
             weight_scale: float = 500.0) -> str:
    q = query.lower()
    q_tris = sorted({q[i:i + 3] for i in range(len(q) - 2)})
    values = ", ".join("('" + t.replace("'", "''") + "')" for t in q_tris)
    nq = len(q_tris)
    esc = query.replace("'", "''")
    return f"""
WITH d AS MATERIALIZED (
  SELECT doc_id, text, lower(text) AS t, n_chars FROM documents
),
pref AS (
  SELECT doc_id,
         CAST(ROW_NUMBER()
              OVER (ORDER BY n_chars DESC, doc_id) AS BIGINT) AS rp
  FROM d WHERE starts_with(text, '{esc}')
  ORDER BY rp LIMIT {pool}
),
qt(tri) AS (VALUES {values}),
tris AS (
  SELECT DISTINCT doc_id, substr(t, i, 3) AS tri
  FROM (
    SELECT doc_id, t,
           unnest(generate_series(1, greatest(length(t) - 2, 0))) AS i
    FROM d
  )
),
stats AS (
  SELECT doc_id,
         COUNT(*) AS n_tri,
         SUM(CASE WHEN tri IN (SELECT tri FROM qt) THEN 1 ELSE 0 END)
           AS inter
  FROM tris GROUP BY doc_id
),
fuzz AS (
  SELECT doc_id,
         CAST(ROW_NUMBER()
              OVER (ORDER BY inter DESC, n_tri, doc_id) AS BIGINT) AS rf
  FROM stats WHERE inter > 0
  ORDER BY rf LIMIT {pool}
),
fused AS (
  SELECT COALESCE(p.doc_id, f.doc_id) AS doc_id, p.rp, f.rf,
         COALESCE(1.0 / ({c} + p.rp), 0.0)
           + COALESCE(1.0 / ({c} + f.rf), 0.0) AS score
  FROM pref p FULL OUTER JOIN fuzz f ON p.doc_id = f.doc_id
)
SELECT doc_id, rp AS rank_prefix, rf AS rank_fuzzy,
       CAST(ROUND(score * 1000000000, 0) AS BIGINT) AS rrf_x1e9
FROM fused
ORDER BY score DESC, doc_id LIMIT {k}
"""


# ---------------------------------------------------------------------------
# cross-source quantile normalization of document lengths
# ---------------------------------------------------------------------------


def q_quantile_normalize_doc_len(sf_dir):
    """Quantile normalization: map every document's length onto the
    POOLED length distribution at the same within-source rank fraction
    — the standard cross-source distribution alignment (each source's
    length profile becomes comparable before mixing). qnorm(v) is the
    smallest pooled value whose cumulative count satisfies
    cum_pool(v') * n_src >= k * N_pool, with k the doc's within-source
    cumulative count (ties included) — a pure integer cross-compare, so
    both engines agree exactly.

    Scale shape: both lookup tables are value HISTOGRAMS (bounded by
    sources x |length domain|), tree-merged once and broadcast; the
    assignment pass is one vectorized searchsorted per batch. Zero sort
    shuffles, zero driver row pulls.
    """
    docs = rd.read_parquet(
        f"{sf_dir}/documents.parquet",
        columns=["doc_id", "source", "n_chars"],
    )

    def partial(b: pa.Table) -> pa.Table:
        b = b.filter(
            pc.and_(pc.is_valid(b["source"]), pc.is_valid(b["n_chars"]))
        )
        g = b.group_by(["source", "n_chars"]).aggregate([([], "count_all")])
        g = g.select(["source", "n_chars", "count_all"])
        return g.rename_columns(["source", "v", "n"])

    def combine(b: pa.Table) -> pa.Table:
        g = b.group_by(["source", "v"]).aggregate([("n", "sum")])
        return g.rename_columns(["source", "v", "n"])

    hist = tree_merge(
        docs.map_batches(partial, batch_format="pyarrow", batch_size=None),
        combine,
    ).to_pandas()  # bounded: sources x distinct lengths

    # per-source cumulative tables + the pooled cumulative table
    src_tab: dict[str, tuple[np.ndarray, np.ndarray, int]] = {}
    pool_v = np.zeros(0, dtype=np.int64)
    pool_cum = np.zeros(0, dtype=np.int64)
    n_pool = 0
    if len(hist):
        for s, g in hist.groupby("source"):
            g = g.sort_values("v")
            v = g["v"].to_numpy(dtype=np.int64)
            c = np.cumsum(g["n"].to_numpy(dtype=np.int64))
            src_tab[s] = (v, c, int(c[-1]))
        p = hist.groupby("v")["n"].sum().sort_index()
        pool_v = p.index.to_numpy(dtype=np.int64)
        pool_cum = np.cumsum(p.to_numpy(dtype=np.int64))
        n_pool = int(pool_cum[-1])
    import ray

    tab_ref = ray.put((src_tab, pool_v, pool_cum, n_pool))

    def assign(b: pa.Table) -> pa.Table:
        src_t, pv, pcum, npool = ray.get(tab_ref)
        b = b.filter(
            pc.and_(pc.is_valid(b["source"]), pc.is_valid(b["n_chars"]))
        )
        if b.num_rows == 0 or npool == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "source": pa.array([], pa.string()),
                    "n_chars": pa.array([], pa.int64()),
                    "qnorm_len": pa.array([], pa.int64()),
                }
            )
        srcs = b["source"].to_numpy(zero_copy_only=False)
        vals = b["n_chars"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        qn = np.zeros(len(vals), dtype=np.int64)
        # vectorized per source PRESENT IN THE BATCH (bounded by source
        # cardinality, not rows) — the group_cume_dist discipline
        for s in pd.unique(srcs):
            m = srcs == s
            sv, sc, ns = src_t[s]
            k = sc[np.searchsorted(sv, vals[m], side="right") - 1]
            # smallest pooled v with pcum * ns >= k * npool
            idx = np.searchsorted(pcum * ns, k * npool, side="left")
            qn[m] = pv[idx]
        return pa.table(
            {
                "doc_id": b["doc_id"].cast(pa.int64()),
                "source": b["source"],
                "n_chars": pa.array(vals),
                "qnorm_len": pa.array(qn),
            }
        )

    return docs.map_batches(assign, batch_format="pyarrow", batch_size=None)


QNORM_SQL = """
WITH d AS MATERIALIZED (
  SELECT doc_id, source, CAST(n_chars AS BIGINT) AS n_chars
  FROM documents WHERE source IS NOT NULL AND n_chars IS NOT NULL
), r AS (
  SELECT doc_id, source, n_chars,
         CAST(COUNT(*) OVER (PARTITION BY source ORDER BY n_chars
              RANGE UNBOUNDED PRECEDING) AS BIGINT) AS k,
         CAST(COUNT(*) OVER (PARTITION BY source) AS BIGINT) AS ns
  FROM d
), pool AS MATERIALIZED (
  SELECT n_chars AS v,
         CAST(COUNT(*) OVER (ORDER BY n_chars
              RANGE UNBOUNDED PRECEDING) AS BIGINT) AS cum,
         CAST(COUNT(*) OVER () AS BIGINT) AS npool
  FROM d QUALIFY ROW_NUMBER() OVER (PARTITION BY n_chars
                                    ORDER BY n_chars) = 1
)
SELECT r.doc_id, r.source, r.n_chars,
       (SELECT MIN(p.v) FROM pool p
        WHERE p.cum * r.ns >= r.k * p.npool) AS qnorm_len
FROM r
"""


def register_r4ab(queries: dict, oracles: dict) -> None:
    queries.update(
        {
            "changepoint_hourly": q_changepoint_hourly,
            "rrf_search_docs": q_rrf_search_docs,
            "quantile_normalize_doc_len": q_quantile_normalize_doc_len,
        }
    )
    oracles.update(
        {
            "changepoint_hourly": CHANGEPOINT_SQL,
            "rrf_search_docs": _rrf_sql(_RRF_QUERY, _RRF_K, _RRF_POOL,
                                        _RRF_C),
            "quantile_normalize_doc_len": QNORM_SQL,
        }
    )
