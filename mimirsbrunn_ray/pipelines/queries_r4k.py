"""Round-4 batch K: last-two-sample instantaneous rate (the PromQL
``irate`` shape), exact two-sided trimmed means from bounded value
histograms, a cross-correlation lag scan between two event streams,
OOV rate against a corpus-learned top-100 vocabulary, shared-trigram
cross-document coverage (the duplicate-n-gram statistic of
"Deduplicating Training Data Makes Language Models Better", Lee et al.
2022), and k-core peeling with a fixed unrolled round count (the
PageRank-style iterative-algorithm oracle discipline).

Exactness discipline: every output column is an exact int64 (counts,
x100 fixed-point sums, microsecond gaps) — no engine-divergent float
division anywhere; DuckDB's ``//`` truncates toward zero while numpy
floors, so divisions appear only on provably non-negative operands
(``n // 10``).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

# ---------------------------------------------------------------------------
# irate: per-key instantaneous rate from the LAST TWO samples
# ---------------------------------------------------------------------------

_TOP2_SCHEMA = pa.schema(
    [
        ("event_type", pa.string()),
        ("ts_us", pa.int64()),
        ("event_id", pa.int64()),
        ("v_x100", pa.int64()),
    ]
)


def _keep_top2(t: pa.Table) -> pa.Table:
    """Per event_type, keep the 2 most recent rows by (ts desc, id desc).

    Associative: applying it to a concat of already-pruned partials gives
    the same winners, so it is both the per-batch combiner and the
    tree-merge combine — the grouped-top-k analog of keep-min dedup."""
    if t.num_rows == 0:
        return t
    idx = pc.sort_indices(
        t,
        sort_keys=[
            ("event_type", "ascending"),
            ("ts_us", "descending"),
            ("event_id", "descending"),
        ],
    )
    t = t.take(idx).combine_chunks()
    et = np.asarray(t["event_type"].to_numpy(zero_copy_only=False), dtype=object)
    starts = np.flatnonzero(np.r_[True, et[1:] != et[:-1]])
    sizes = np.diff(np.r_[starts, len(et)])
    pos = np.arange(len(et)) - np.repeat(starts, sizes)
    return t.filter(pa.array(pos < 2))


def q_irate_last_two(sf_dir):
    """PromQL ``irate()`` shape over the event stream: per event_type,
    the gap (microseconds) and x100 value delta between the two MOST
    RECENT samples, ordered by (ts, event_id) with the id tie-break.
    Keys with fewer than two valid samples are omitted.

    Scale shape: grouped top-2 is associative, so each batch prunes to
    <= 2 rows per key locally and a tree merge combines the winners —
    the shuffle moves 2 rows per (key, batch), never the stream; no
    sort shuffle, no window exchange."""
    from mimirsbrunn_ray.stages.rollup import tree_merge
    from mimirsbrunn_ray.stages.timeseries import _round_half_away_x

    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "event_type", "value"],
    )

    def partial(b: pa.Table) -> pa.Table:
        b = b.filter(
            pc.and_(
                pc.and_(pc.is_valid(b["event_type"]), pc.is_valid(b["ts"])),
                pc.is_valid(b["value"]),
            )
        )
        v = _round_half_away_x(
            b["value"].to_numpy(zero_copy_only=False).astype(np.float64), 100.0
        )
        t = pa.table(
            {
                "event_type": b["event_type"],
                "ts_us": b["ts"].cast(pa.int64()),
                "event_id": b["event_id"].cast(pa.int64()),
                "v_x100": pa.array(v),
            }
        )
        return _keep_top2(t)

    merged = tree_merge(
        ev.map_batches(partial, batch_format="pyarrow", batch_size=None),
        _keep_top2,
    )

    def finish(t: pa.Table) -> pa.Table:
        t = _keep_top2(t)
        if t.num_rows == 0:
            return pa.table(
                {
                    "event_type": pa.array([], pa.string()),
                    "ts_last": pa.array([], pa.timestamp("us")),
                    "gap_us": pa.array([], pa.int64()),
                    "dv_x100": pa.array([], pa.int64()),
                }
            )
        et = np.asarray(
            t["event_type"].to_numpy(zero_copy_only=False), dtype=object
        )
        starts = np.flatnonzero(np.r_[True, et[1:] != et[:-1]])
        sizes = np.diff(np.r_[starts, len(et)])
        two = starts[sizes >= 2]
        ts = t["ts_us"].to_numpy()
        v = t["v_x100"].to_numpy()
        return pa.table(
            {
                "event_type": pa.array(et[two]),
                "ts_last": pa.array(ts[two]).cast(pa.timestamp("us")),
                "gap_us": pa.array(ts[two] - ts[two + 1]),
                "dv_x100": pa.array(v[two] - v[two + 1]),
            }
        )

    return merged.map_batches(finish, batch_format="pyarrow", batch_size=None)


IRATE_SQL = """
WITH s AS (
  SELECT event_type, ts, event_id,
         CAST(ROUND(value * 100, 0) AS BIGINT) AS v,
         ROW_NUMBER() OVER (
           PARTITION BY event_type ORDER BY ts DESC, event_id DESC
         ) AS rn
  FROM events
  WHERE event_type IS NOT NULL AND ts IS NOT NULL AND value IS NOT NULL
)
SELECT a.event_type,
       a.ts AS ts_last,
       CAST(epoch_us(a.ts) - epoch_us(b.ts) AS BIGINT) AS gap_us,
       a.v - b.v AS dv_x100
FROM s a
JOIN s b ON a.event_type = b.event_type AND b.rn = 2
WHERE a.rn = 1
"""


# ---------------------------------------------------------------------------
# exact two-sided trimmed mean from the bounded value histogram
# ---------------------------------------------------------------------------


def q_trimmed_value_sums(sf_dir):
    """Per event_type, the EXACT 10%-trimmed sum of x100 values: drop the
    n//10 lowest and n//10 highest ranked samples and sum the rest —
    the robust-mean building block (the trimmed mean is
    trimmed_sum_x100 / kept_n, left undivided to stay integer-exact).

    Scale shape: rank trimming only depends on the per-key VALUE
    HISTOGRAM, so one decomposable (key, x100, count) pass tree-merges
    to a table bounded by keys x |value domain| (never rows), and the
    boundary bins contribute partially via cumulative-count clipping —
    the exact_quantiles_small_domain discipline; no sort shuffle."""
    from mimirsbrunn_ray.stages.rollup import tree_merge
    from mimirsbrunn_ray.stages.timeseries import _round_half_away_x

    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "value"]
    )

    def partial(b: pa.Table) -> pa.Table:
        b = b.filter(
            pc.and_(pc.is_valid(b["event_type"]), pc.is_valid(b["value"]))
        )
        x = _round_half_away_x(
            b["value"].to_numpy(zero_copy_only=False).astype(np.float64), 100.0
        )
        t = pa.table({"event_type": b["event_type"], "x": pa.array(x)})
        g = t.group_by(["event_type", "x"]).aggregate([([], "count_all")])
        return g.select(["event_type", "x", "count_all"]).rename_columns(
            ["event_type", "x", "c"]
        )

    def combine(b: pa.Table) -> pa.Table:
        g = b.group_by(["event_type", "x"]).aggregate([("c", "sum")])
        return g.select(["event_type", "x", "c_sum"]).rename_columns(
            ["event_type", "x", "c"]
        )

    merged = tree_merge(
        ev.map_batches(partial, batch_format="pyarrow", batch_size=None),
        combine,
    )

    def finish(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "event_type": pa.array([], pa.string()),
                    "n": pa.array([], pa.int64()),
                    "kept_n": pa.array([], pa.int64()),
                    "trimmed_sum_x100": pa.array([], pa.int64()),
                }
            )
        idx = pc.sort_indices(
            t, sort_keys=[("event_type", "ascending"), ("x", "ascending")]
        )
        t = t.take(idx).combine_chunks()
        et = np.asarray(
            t["event_type"].to_numpy(zero_copy_only=False), dtype=object
        )
        x = t["x"].to_numpy()
        c = t["c"].to_numpy().astype(np.int64)
        starts = np.flatnonzero(np.r_[True, et[1:] != et[:-1]])
        sizes = np.diff(np.r_[starts, len(et)])
        n_key = np.add.reduceat(c, starts)
        gcum = np.cumsum(c)
        base = np.repeat(gcum[starts] - c[starts], sizes)
        cum = gcum - base  # within-key inclusive cumulative count
        n = np.repeat(n_key, sizes)
        lo = n // 10
        hi = n - lo
        contrib = np.clip(np.minimum(cum, hi) - np.maximum(cum - c, lo), 0, None)
        tsum = np.add.reduceat(x * contrib, starts)
        # reduceat on an all-zero-contribution key still yields 0 — fine
        return pa.table(
            {
                "event_type": pa.array(et[starts]),
                "n": pa.array(n_key),
                "kept_n": pa.array(n_key - 2 * (n_key // 10)),
                "trimmed_sum_x100": pa.array(tsum),
            }
        )

    return merged.map_batches(finish, batch_format="pyarrow", batch_size=None)


TRIMMED_SQL = """
WITH h AS (
  SELECT event_type, CAST(ROUND(value * 100, 0) AS BIGINT) AS x,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM events
  WHERE event_type IS NOT NULL AND value IS NOT NULL
  GROUP BY 1, 2
),
t AS (SELECT event_type, SUM(c) AS n FROM h GROUP BY 1),
w AS (
  SELECT h.event_type, h.x, h.c, t.n,
         SUM(h.c) OVER (
           PARTITION BY h.event_type ORDER BY h.x
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS cum
  FROM h JOIN t USING (event_type)
)
SELECT event_type,
       CAST(MAX(n) AS BIGINT) AS n,
       CAST(MAX(n) - 2 * (MAX(n) // 10) AS BIGINT) AS kept_n,
       CAST(SUM(x * GREATEST(
         LEAST(cum, n - n // 10) - GREATEST(cum - c, n // 10), 0
       )) AS BIGINT) AS trimmed_sum_x100
FROM w GROUP BY 1
"""


# ---------------------------------------------------------------------------
# cross-correlation lag scan between the click and error hourly series
# ---------------------------------------------------------------------------

_XCORR_LAGS = np.arange(-3, 4, dtype=np.int64)
_HOUR_US = 3_600_000_000


def q_xcorr_click_error(sf_dir):
    """Raw cross-correlation score between the hourly 'click' and
    'error' count series at lags -3..+3 hours:
    score(lag) = sum_h clicks(h) * errors(h + lag) — the lag-estimation
    primitive behind "errors follow clicks by ~2h" alerting. Always
    emits all 7 lags (0 when a series is empty).

    Scale shape: the stream collapses to per-(type, hour) int64 counts
    via combiner-first partials + tree merge (bounded by 2 x hours in
    the ingest window, the chi2/correlation-matrix completion rule);
    all 7 lag scores then come from searchsorted alignments of two
    hour-grain arrays — no self-join of the event stream."""
    from mimirsbrunn_ray.stages.rollup import tree_merge

    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["ts", "event_type"]
    )
    pair = pa.array(["click", "error"])

    def partial(b: pa.Table) -> pa.Table:
        b = b.filter(
            pc.and_(pc.is_valid(b["ts"]), pc.is_valid(b["event_type"]))
        )
        b = b.filter(pc.is_in(b["event_type"], value_set=pair))
        t = pa.table(
            {
                "event_type": b["event_type"],
                "h": pc.floor_temporal(b["ts"], unit="hour").cast(pa.int64()),
            }
        )
        g = t.group_by(["event_type", "h"]).aggregate([([], "count_all")])
        return g.select(["event_type", "h", "count_all"]).rename_columns(
            ["event_type", "h", "n"]
        )

    def combine(b: pa.Table) -> pa.Table:
        g = b.group_by(["event_type", "h"]).aggregate([("n", "sum")])
        return g.select(["event_type", "h", "n_sum"]).rename_columns(
            ["event_type", "h", "n"]
        )

    hist = tree_merge(
        ev.map_batches(partial, batch_format="pyarrow", batch_size=None),
        combine,
    ).to_pandas()  # bounded: 2 types x hours in window
    if "event_type" not in hist.columns:  # fully-empty input short-circuit
        hist = pd.DataFrame({"event_type": [], "h": [], "n": []})
    ck = hist[hist["event_type"] == "click"].sort_values("h")
    er = hist[hist["event_type"] == "error"].sort_values("h")
    ch = ck["h"].to_numpy(dtype=np.int64)
    cn = ck["n"].to_numpy(dtype=np.int64)
    eh = er["h"].to_numpy(dtype=np.int64)
    en = er["n"].to_numpy(dtype=np.int64)
    scores = np.zeros(len(_XCORR_LAGS), dtype=np.int64)
    for i, lag in enumerate(_XCORR_LAGS):
        if len(ch) == 0 or len(eh) == 0:
            continue
        probe = ch + lag * _HOUR_US
        pos = np.clip(np.searchsorted(eh, probe), 0, len(eh) - 1)
        hit = eh[pos] == probe
        scores[i] = int(np.sum(cn[hit] * en[pos[hit]]))
    return pa.table(
        {"lag": pa.array(_XCORR_LAGS), "score": pa.array(scores)}
    )


XCORR_SQL = """
WITH c AS (
  SELECT date_trunc('hour', ts) AS h, CAST(COUNT(*) AS BIGINT) AS n
  FROM events
  WHERE event_type = 'click' AND ts IS NOT NULL GROUP BY 1
),
e AS (
  SELECT date_trunc('hour', ts) AS h, CAST(COUNT(*) AS BIGINT) AS n
  FROM events
  WHERE event_type = 'error' AND ts IS NOT NULL GROUP BY 1
),
lags(lag) AS (
  SELECT * FROM (VALUES (-3), (-2), (-1), (0), (1), (2), (3)) v(lag)
)
SELECT CAST(lags.lag AS BIGINT) AS lag,
       CAST(COALESCE(SUM(c.n * e.n), 0) AS BIGINT) AS score
FROM lags
LEFT JOIN c ON TRUE
LEFT JOIN e ON e.h = c.h + INTERVAL 1 HOUR * lags.lag
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# OOV rate against a corpus-learned top-100 vocabulary
# ---------------------------------------------------------------------------

_VOCAB_K = 100


def q_oov_counts_docs(sf_dir):
    """Per document, the token count and how many tokens fall OUTSIDE
    the corpus's own top-100 vocabulary (count desc, word asc
    tie-break) — the out-of-vocabulary-rate signal a tokenizer-coverage
    audit computes before training.

    Scale shape: pass 1 builds word counts combiner-first and
    tree-merges into word-disjoint SHARDS (the vocabulary never sits in
    one block), each shard prunes to its local top-100, and only the
    shards x 100 candidates reach the final merge; pass 2 broadcasts
    the 100-word set into one stateless map_batches with a single
    ``is_in`` kernel per batch. Two passes, zero sort shuffles."""
    from mimirsbrunn_ray.stages.rollup import tree_merge

    docs = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )

    def wpartial(b: pa.Table) -> pa.Table:
        w = pc.list_flatten(
            pc.split_pattern(
                pc.utf8_lower(pc.fill_null(b["text"], "")), " "
            )
        )
        g = pa.table({"word": w}).group_by(["word"]).aggregate(
            [([], "count_all")]
        )
        return g.select(["word", "count_all"]).rename_columns(["word", "n"])

    def wcombine(b: pa.Table) -> pa.Table:
        g = b.group_by(["word"]).aggregate([("n", "sum")])
        return g.select(["word", "n_sum"]).rename_columns(["word", "n"])

    def shard_top(b: pa.Table) -> pa.Table:
        return b.sort_by(
            [("n", "descending"), ("word", "ascending")]
        ).slice(0, _VOCAB_K)

    wc = tree_merge(
        docs.map_batches(wpartial, batch_format="pyarrow", batch_size=None),
        wcombine,
        final_shards=8,
        shard_cols=["word"],
    )
    top = (
        wc.map_batches(shard_top, batch_format="pyarrow", batch_size=None)
        .repartition(1)
        .map_batches(shard_top, batch_format="pyarrow", batch_size=None)
    )
    top_df = top.to_pandas()
    vocab = pa.array(
        top_df["word"].tolist() if "word" in top_df.columns else [],
        pa.string(),
    )

    def batch(b: pa.Table) -> pa.Table:
        words = pc.split_pattern(
            pc.utf8_lower(pc.fill_null(b["text"], "")), " "
        )
        n_per = pc.list_value_length(words).to_numpy(zero_copy_only=False)
        n_per = n_per.astype(np.int64)
        flat = pc.list_flatten(words)
        hit = pc.is_in(flat, value_set=vocab).to_numpy(zero_copy_only=False)
        seg = np.repeat(np.arange(len(b)), n_per)
        oov = np.zeros(len(b), dtype=np.int64)
        miss = ~hit
        if miss.any():
            np.add.at(oov, seg[miss], 1)
        return pa.table(
            {
                "doc_id": b["doc_id"],
                "n_words": pa.array(n_per),
                "oov_cnt": pa.array(oov),
            }
        )

    return docs.map_batches(batch, batch_format="pyarrow", batch_size=None)


OOV_SQL = f"""
WITH w AS (
  SELECT doc_id,
         unnest(string_split(COALESCE(lower(text), ''), ' ')) AS word
  FROM documents
),
vc AS (SELECT word, COUNT(*) AS n FROM w GROUP BY 1),
vocab AS (SELECT word FROM vc ORDER BY n DESC, word ASC LIMIT {_VOCAB_K})
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_words,
       CAST(SUM(CASE WHEN w.word IN (SELECT word FROM vocab)
                THEN 0 ELSE 1 END) AS BIGINT) AS oov_cnt
FROM w GROUP BY 1
"""


# ---------------------------------------------------------------------------
# shared-trigram coverage: the cross-document duplicate n-gram statistic
# ---------------------------------------------------------------------------


def q_shared_trigram_coverage(sf_dir):
    """Per source: how many distinct (document, word-trigram) pairs it
    contributes, and how many of those involve a trigram found in MORE
    THAN ONE document corpus-wide — the duplicate-n-gram coverage
    statistic of Lee et al. 2022 (arXiv:2107.06499) that motivates
    training-set dedup.

    Scale shape: trigrams materialize per batch with zero Python loops
    (flat CSR gather over the split-word values + one
    binary_join_element_wise), collapse batch-locally to distinct
    (doc, source, gram) then PARTIAL (source, gram) counts; ONE coarse
    hash-bucket shuffle on the gram co-locates all counts of a gram, so
    each bucket resolves gram document-frequencies and per-source
    contributions locally; per-source partials tree-merge. The corpus
    never moves — only distinct gram counts do."""
    from mimirsbrunn_ray.stages.dedup import _BUCKET, add_bucket
    from mimirsbrunn_ray.stages.rollup import tree_merge

    docs = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "source", "text"]
    )

    def gram_partial(b: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "source": pa.array([], pa.string()),
                "gram": pa.array([], pa.string()),
                "c": pa.array([], pa.int64()),
            }
        )
        b = b.filter(
            pc.and_(pc.is_valid(b["doc_id"]), pc.is_valid(b["source"]))
        )
        if b.num_rows == 0:
            return empty
        words = pc.split_pattern(
            pc.utf8_lower(pc.fill_null(b["text"], "")), " "
        )
        n_per = pc.list_value_length(words).to_numpy(zero_copy_only=False)
        n_per = n_per.astype(np.int64)
        flat = pc.list_flatten(words).combine_chunks()
        n_g = np.maximum(n_per - 2, 0)
        total = int(n_g.sum())
        if total == 0:
            return empty
        doc_idx = np.repeat(np.arange(len(n_per)), n_g)
        word_base = np.repeat(np.cumsum(n_per) - n_per, n_g)
        within = np.arange(total) - np.repeat(np.cumsum(n_g) - n_g, n_g)
        i0 = word_base + within
        gram = pc.binary_join_element_wise(
            flat.take(pa.array(i0)),
            flat.take(pa.array(i0 + 1)),
            flat.take(pa.array(i0 + 2)),
            " ",
        )
        t = pa.table(
            {
                "doc": pa.array(
                    b["doc_id"].to_numpy(zero_copy_only=False)[doc_idx]
                ),
                "source": pa.array(
                    np.asarray(
                        b["source"].to_numpy(zero_copy_only=False),
                        dtype=object,
                    )[doc_idx],
                    pa.string(),
                ),
                "gram": gram,
            }
        )
        # distinct per doc is exact batch-locally: a document is one row
        d = t.group_by(["doc", "source", "gram"]).aggregate([])
        g = d.group_by(["source", "gram"]).aggregate([([], "count_all")])
        return g.select(["source", "gram", "count_all"]).rename_columns(
            ["source", "gram", "c"]
        )

    partials = docs.map_batches(
        gram_partial, batch_format="pyarrow", batch_size=None
    )
    bucketed = partials.map_batches(
        lambda b: add_bucket(b, "gram", 64),
        batch_format="pyarrow",
        batch_size=None,
    )

    def bucket_fn(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame(
                {
                    "source": pd.Series([], dtype=object),
                    "n_doc_grams": pd.Series([], dtype=np.int64),
                    "n_shared": pd.Series([], dtype=np.int64),
                }
            )
        sg = g.groupby(["source", "gram"], sort=False, as_index=False)[
            "c"
        ].sum()
        cg = sg.groupby("gram", sort=False)["c"].transform("sum")
        sg["shared"] = np.where(cg >= 2, sg["c"], 0)
        r = sg.groupby("source", sort=False, as_index=False).agg(
            n_doc_grams=("c", "sum"), n_shared=("shared", "sum")
        )
        r["n_doc_grams"] = r["n_doc_grams"].astype(np.int64)
        r["n_shared"] = r["n_shared"].astype(np.int64)
        return r

    per_bucket = bucketed.groupby(_BUCKET).map_groups(
        lambda g: bucket_fn(g.drop(columns=[_BUCKET])),
        batch_format="pandas",
    )

    def combine(b: pa.Table) -> pa.Table:
        g = b.group_by(["source"]).aggregate(
            [("n_doc_grams", "sum"), ("n_shared", "sum")]
        )
        return g.select(
            ["source", "n_doc_grams_sum", "n_shared_sum"]
        ).rename_columns(["source", "n_doc_grams", "n_shared"])

    return tree_merge(per_bucket, combine)


SHARED_TRIGRAM_SQL = """
WITH t AS (
  SELECT doc_id, source,
         string_split(COALESCE(lower(text), ''), ' ') AS w
  FROM documents
  WHERE doc_id IS NOT NULL AND source IS NOT NULL
),
g0 AS (
  SELECT doc_id, source,
         w[i] || ' ' || w[i + 1] || ' ' || w[i + 2] AS gram
  FROM t, UNNEST(range(1, len(w) - 1)) AS r(i)
),
g AS (SELECT DISTINCT doc_id, source, gram FROM g0),
sg AS (SELECT source, gram, COUNT(*) AS c FROM g GROUP BY 1, 2),
gg AS (SELECT gram, SUM(c) AS cg FROM sg GROUP BY 1)
SELECT sg.source,
       CAST(SUM(sg.c) AS BIGINT) AS n_doc_grams,
       CAST(SUM(CASE WHEN gg.cg >= 2 THEN sg.c ELSE 0 END) AS BIGINT)
         AS n_shared
FROM sg JOIN gg USING (gram)
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# k-core peeling over the dependency edge set, fixed unrolled rounds
# ---------------------------------------------------------------------------

_KCORE_K = 3
_KCORE_ROUNDS = 4


def q_kcore_dependency(sf_dir):
    """Four rounds of k-core peeling (k=3) over the same deterministic
    dependency edge set as part_dep_closure / part_triangles
    (k -> k//2, k -> k//3, undirected): each round removes every node
    whose degree in the SURVIVING subgraph is < 3, and the output is
    each surviving node's degree after round 4 — the fixed-round
    iterative-peel, oracled by an UNROLLED SQL round chain exactly like
    PageRank / k-means.

    Scale shape: the edge set derives from the part DIMENSION on the
    driver (the documented dependency_closure dimension-scale
    assumption); peel state is one boolean array over |V| and degrees
    come from np.add.at over |E| — both dimension-bounded. At corpus
    scale the same rounds run as repeated degree-groupby + semi-join
    passes; the round count, not the data, bounds the iteration."""
    part = rd.read_parquet(f"{sf_dir}/part.parquet", columns=["p_partkey"])
    empty = pa.table(
        {"node": pa.array([], pa.int64()), "deg": pa.array([], pa.int64())}
    )
    if part.count() == 0:
        return empty
    _mx_raw = part.max("p_partkey")
    mx = int(_mx_raw) if _mx_raw is not None else 0
    ks = np.arange(2, mx + 1, dtype=np.int64)
    src = np.concatenate([ks, ks[ks >= 3]])
    dst = np.concatenate([ks // 2, ks[ks >= 3] // 3])
    keep = (src != dst) & (np.minimum(src, dst) >= 1)
    u = np.minimum(src, dst)[keep]
    v = np.maximum(src, dst)[keep]
    K = np.int64(mx + 2)
    packed = np.unique(u * K + v)
    eu, ev = packed // K, packed % K
    a = np.concatenate([eu, ev])  # both directions: count = degree
    b = np.concatenate([ev, eu])
    alive = np.ones(int(K) + 1, dtype=bool)
    for _ in range(_KCORE_ROUNDS):
        m = alive[a] & alive[b]
        deg = np.zeros(int(K) + 1, dtype=np.int64)
        np.add.at(deg, a[m], 1)
        alive = alive & (deg >= _KCORE_K)
    m = alive[a] & alive[b]
    if not m.any():
        return empty
    deg = np.zeros(int(K) + 1, dtype=np.int64)
    np.add.at(deg, a[m], 1)
    nodes = np.unique(a[m])
    return pa.table(
        {"node": pa.array(nodes), "deg": pa.array(deg[nodes])}
    )


_KCORE_EDGES = """
ks AS (
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
u1 AS (SELECT u AS a, v AS b FROM e UNION ALL SELECT v, u FROM e)
"""


def _kcore_round(prev: str, cur: str) -> str:
    return f"""
d{cur} AS (SELECT a, COUNT(*) AS deg FROM u{prev} GROUP BY 1),
k{cur} AS (SELECT a FROM d{cur} WHERE deg >= {_KCORE_K}),
u{cur} AS (
  SELECT u{prev}.a, u{prev}.b FROM u{prev}
  WHERE u{prev}.a IN (SELECT a FROM k{cur})
    AND u{prev}.b IN (SELECT a FROM k{cur})
)
"""


KCORE_SQL = (
    "WITH "
    + _KCORE_EDGES
    + ","
    + ",".join(_kcore_round(str(i), str(i + 1)) for i in range(1, 5))
    + """
SELECT a AS node, CAST(COUNT(*) AS BIGINT) AS deg FROM u5 GROUP BY 1
"""
)


def register_r4k(queries: dict, oracles: dict) -> None:
    queries.update(
        {
            "irate_last_two": q_irate_last_two,
            "trimmed_value_sums": q_trimmed_value_sums,
            "xcorr_click_error": q_xcorr_click_error,
            "oov_counts_docs": q_oov_counts_docs,
            "shared_trigram_coverage": q_shared_trigram_coverage,
            "kcore_dependency": q_kcore_dependency,
        }
    )
    oracles.update(
        {
            "irate_last_two": IRATE_SQL,
            "trimmed_value_sums": TRIMMED_SQL,
            "xcorr_click_error": XCORR_SQL,
            "oov_counts_docs": OOV_SQL,
            "shared_trigram_coverage": SHARED_TRIGRAM_SQL,
            "kcore_dependency": KCORE_SQL,
        }
    )
