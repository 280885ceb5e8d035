"""Round-4 batch CA: padding-waste audit for length-bucketed batching,
tokenizer fertility per language, and sqrt-temperature mixture weights.

Exactness discipline: the bucket ladder is a pure integer CASE (no
log2 floats at boundaries); fertility folds exact int64 sums into one
double division + ROUND both engines evaluate identically; temperature
weights use INTEGER floor-sqrt masses (FLOOR(SQRT(n)) is exact for
n < 2^52) so the largest-remainder allocation never sums doubles.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from mimirsbrunn_ray.stages.rollup import tree_merge

_BUCKETS = np.array([32, 64, 128, 256, 512, 1024, 2048], dtype=np.int64)


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


# ---------------------------------------------------------------------------
# padding waste by length bucket
# ---------------------------------------------------------------------------


def q_padding_waste_by_bucket(sf_dir):
    """Length-bucketed batching efficiency: assign every document to the
    smallest power-of-two length bucket >= its word count (ladder
    32..2048) and report per bucket the document count, the summed word
    count, and the summed PADDING WASTE (bucket_len - n_words; documents
    beyond the 2048 cap are truncated, waste 0) — the first audit a
    training-data team runs before fixing batch shapes, since waste is
    compute burned on pad tokens. One combiner-first pass; bucket
    assignment is a searchsorted over a 7-entry ladder."""
    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])

    def partial(b: pa.Table) -> pa.Table:
        b = _clean(b, ("text",))
        nw = pc.list_value_length(
            pc.split_pattern(b["text"], pattern=" ")
        ).cast(pa.int64()).to_numpy(zero_copy_only=False)
        bi = np.searchsorted(_BUCKETS, nw, side="left")
        over = bi >= len(_BUCKETS)
        blen = _BUCKETS[np.minimum(bi, len(_BUCKETS) - 1)]
        waste = np.where(over, 0, blen - nw)
        t = pa.table(
            {
                "bucket_len": pa.array(blen),
                "n_docs": pa.array(np.ones(len(nw), dtype=np.int64)),
                "sum_words": pa.array(nw),
                "sum_waste": pa.array(waste.astype(np.int64)),
            }
        )
        g = t.group_by(["bucket_len"]).aggregate(
            [("n_docs", "sum"), ("sum_words", "sum"), ("sum_waste", "sum")]
        )
        g = g.select(
            ["bucket_len", "n_docs_sum", "sum_words_sum", "sum_waste_sum"]
        )
        return g.rename_columns(
            ["bucket_len", "n_docs", "sum_words", "sum_waste"]
        )

    def combine(b: pa.Table) -> pa.Table:
        g = b.group_by(["bucket_len"]).aggregate(
            [("n_docs", "sum"), ("sum_words", "sum"), ("sum_waste", "sum")]
        )
        g = g.select(
            ["bucket_len", "n_docs_sum", "sum_words_sum", "sum_waste_sum"]
        )
        return g.rename_columns(
            ["bucket_len", "n_docs", "sum_words", "sum_waste"]
        )

    return tree_merge(
        docs.map_batches(partial, batch_format="pyarrow", batch_size=None),
        combine,
    )


PADDING_SQL = """
WITH v AS (
  SELECT CAST(len(string_split(text, ' ')) AS BIGINT) AS nw
  FROM documents WHERE text IS NOT NULL
), b AS (
  SELECT nw,
         CASE WHEN nw <= 32 THEN 32 WHEN nw <= 64 THEN 64
              WHEN nw <= 128 THEN 128 WHEN nw <= 256 THEN 256
              WHEN nw <= 512 THEN 512 WHEN nw <= 1024 THEN 1024
              ELSE 2048 END AS bucket_len,
         CASE WHEN nw > 2048 THEN 0
              ELSE CASE WHEN nw <= 32 THEN 32 WHEN nw <= 64 THEN 64
                        WHEN nw <= 128 THEN 128 WHEN nw <= 256 THEN 256
                        WHEN nw <= 512 THEN 512 WHEN nw <= 1024 THEN 1024
                        ELSE 2048 END - nw END AS waste
  FROM v
)
SELECT CAST(bucket_len AS BIGINT) AS bucket_len,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(nw) AS BIGINT) AS sum_words,
       CAST(SUM(waste) AS BIGINT) AS sum_waste
FROM b GROUP BY 1
"""


# ---------------------------------------------------------------------------
# tokenizer fertility per language
# ---------------------------------------------------------------------------


def q_tokenizer_fertility_per_lang(sf_dir):
    """Per language: exact word and character totals plus the fertility
    ratio words-per-1M-chars (tokenizer planning reads this to size
    vocab and predict token budgets per language — CJK-heavy corpora
    have radically different fertility than whitespace languages). Exact
    int64 sums; ONE double division + ROUND at the end, identical both
    engines."""
    docs = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["lang", "text"]
    )

    def partial(b: pa.Table) -> pa.Table:
        b = _clean(b, ("lang", "text"))
        nw = pc.list_value_length(
            pc.split_pattern(b["text"], pattern=" ")
        ).cast(pa.int64())
        nc = pc.utf8_length(b["text"]).cast(pa.int64())
        t = pa.table(
            {
                "lang": b["lang"],
                "n_docs": pa.array(np.ones(b.num_rows, dtype=np.int64)),
                "sum_words": nw,
                "sum_chars": nc,
            }
        )
        g = t.group_by(["lang"]).aggregate(
            [("n_docs", "sum"), ("sum_words", "sum"), ("sum_chars", "sum")]
        )
        g = g.select(
            ["lang", "n_docs_sum", "sum_words_sum", "sum_chars_sum"]
        )
        return g.rename_columns(["lang", "n_docs", "sum_words", "sum_chars"])

    def combine(b: pa.Table) -> pa.Table:
        g = b.group_by(["lang"]).aggregate(
            [("n_docs", "sum"), ("sum_words", "sum"), ("sum_chars", "sum")]
        )
        g = g.select(
            ["lang", "n_docs_sum", "sum_words_sum", "sum_chars_sum"]
        )
        return g.rename_columns(["lang", "n_docs", "sum_words", "sum_chars"])

    m = tree_merge(
        docs.map_batches(partial, batch_format="pyarrow", batch_size=None),
        combine,
    ).to_pandas()  # bounded: one row per language

    if not len(m) or "lang" not in m.columns:
        return pa.table(
            {
                "lang": pa.array([], pa.string()),
                "n_docs": pa.array([], pa.int64()),
                "sum_words": pa.array([], pa.int64()),
                "sum_chars": pa.array([], pa.int64()),
                "fertility_x1e6": pa.array([], pa.int64()),
            }
        )
    m = m.sort_values("lang", ignore_index=True)
    sw = m["sum_words"].to_numpy(dtype=np.int64)
    sc = m["sum_chars"].to_numpy(dtype=np.int64)
    fert = np.where(
        sc > 0,
        _round_half_away(
            sw.astype(np.float64) / np.where(sc > 0, sc, 1) * 1e6
        ),
        0,
    ).astype(np.int64)
    return pa.table(
        {
            "lang": pa.array(m["lang"], pa.string()),
            "n_docs": pa.array(m["n_docs"].to_numpy(dtype=np.int64)),
            "sum_words": pa.array(sw),
            "sum_chars": pa.array(sc),
            "fertility_x1e6": pa.array(fert),
        }
    )


FERTILITY_SQL = """
WITH s AS (
  SELECT lang,
         CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS sum_words,
         CAST(SUM(length(text)) AS BIGINT) AS sum_chars
  FROM documents
  WHERE lang IS NOT NULL AND text IS NOT NULL
  GROUP BY 1
)
SELECT lang, n_docs, sum_words, sum_chars,
       CASE WHEN sum_chars > 0
            THEN CAST(ROUND(CAST(sum_words AS DOUBLE) / sum_chars * 1000000,
                            0) AS BIGINT)
            ELSE 0 END AS fertility_x1e6
FROM s
"""


# ---------------------------------------------------------------------------
# sqrt-temperature mixture weights (integer floor-sqrt masses)
# ---------------------------------------------------------------------------


def q_temperature_mixture_weights(sf_dir):
    """Temperature-scaled sampling weights per source (alpha = 0.5, the
    multilingual-training upsampling rule: weight proportional to
    n^alpha flattens the source distribution toward uniform). Masses are
    INTEGER floor-sqrts of the per-source counts, so quota arithmetic is
    one exact-int ratio -> double -> floor, and the 1e6-grain allocation
    closes exactly by largest remainder (frac DESC, source ASC
    tie-break) — the mixture_allocation discipline at a different
    target mass."""
    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["source"])

    def partial(b: pa.Table) -> pa.Table:
        b = _clean(b, ("source",))
        t = pa.table(
            {
                "source": b["source"],
                "n": pa.array(np.ones(b.num_rows, dtype=np.int64)),
            }
        )
        g = t.group_by(["source"]).aggregate([("n", "sum")])
        return g.select(["source", "n_sum"]).rename_columns(["source", "n"])

    def combine(b: pa.Table) -> pa.Table:
        g = b.group_by(["source"]).aggregate([("n", "sum")])
        return g.select(["source", "n_sum"]).rename_columns(["source", "n"])

    m = tree_merge(
        docs.map_batches(partial, batch_format="pyarrow", batch_size=None),
        combine,
    ).to_pandas()  # bounded: one row per source

    if not len(m) or "source" not in m.columns:
        return pa.table(
            {
                "source": pa.array([], pa.string()),
                "n_docs": pa.array([], pa.int64()),
                "alloc_ppm": pa.array([], pa.int64()),
            }
        )
    m = m.sort_values("source", ignore_index=True)
    n = m["n"].to_numpy(dtype=np.int64)
    mass = np.floor(np.sqrt(n.astype(np.float64))).astype(np.int64)
    total = int(mass.sum())
    if total == 0:
        alloc = np.zeros(len(n), dtype=np.int64)
    else:
        quota = mass.astype(np.float64) * 1_000_000 / total
        fl = np.floor(quota).astype(np.int64)
        frac = quota - fl
        rem = 1_000_000 - int(fl.sum())
        # largest remainder, ties by source ascending (m is source-sorted,
        # so a stable argsort on -frac preserves that tie-break)
        order = np.argsort(-frac, kind="stable")
        bump = np.zeros(len(n), dtype=np.int64)
        bump[order[:rem]] = 1
        alloc = fl + bump
    return pa.table(
        {
            "source": pa.array(m["source"], pa.string()),
            "n_docs": pa.array(n),
            "alloc_ppm": pa.array(alloc),
        }
    )


TEMPERATURE_SQL = """
WITH c AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS n
  FROM documents WHERE source IS NOT NULL GROUP BY 1
), mcte AS (
  SELECT source, n, CAST(FLOOR(SQRT(CAST(n AS DOUBLE))) AS BIGINT) AS mass
  FROM c
), q AS (
  SELECT source, n, mass,
         CAST(mass AS DOUBLE) * 1000000
           / (SELECT SUM(mass) FROM mcte) AS quota
  FROM mcte
), r AS (
  SELECT source, n, FLOOR(quota) AS fl, quota - FLOOR(quota) AS frac
  FROM q
), k AS (
  SELECT source, n, fl,
         ROW_NUMBER() OVER (ORDER BY frac DESC, source) AS rk,
         (SELECT 1000000 - SUM(fl) FROM r) AS rem
  FROM r
)
SELECT source, n AS n_docs,
       CAST(fl + CASE WHEN rk <= rem THEN 1 ELSE 0 END AS BIGINT)
         AS alloc_ppm
FROM k
"""


def register_r4ca(queries: dict, oracles: dict) -> None:
    queries.update(
        {
            "padding_waste_by_bucket": q_padding_waste_by_bucket,
            "tokenizer_fertility_per_lang": q_tokenizer_fertility_per_lang,
            "temperature_mixture_weights": q_temperature_mixture_weights,
        }
    )
    oracles.update(
        {
            "padding_waste_by_bucket": PADDING_SQL,
            "tokenizer_fertility_per_lang": FERTILITY_SQL,
            "temperature_mixture_weights": TEMPERATURE_SQL,
        }
    )
