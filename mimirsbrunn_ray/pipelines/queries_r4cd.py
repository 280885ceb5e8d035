"""Round-4 batch CD: syllable-proxy readability ratios, stopword
density, and the customer spend-decile migration matrix.

Exactness discipline: readability and density are exact int64 token /
match counts folded through ONE double division + ROUND; the migration
matrix reproduces SQL NTILE semantics bit-for-bit (first n%10 tiles one
element larger, (spend, custkey) total order) over the bounded
per-customer spend tier, so both engines assign identical deciles.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from mimirsbrunn_ray.stages.rollup import tree_merge

_SPLIT_US = np.datetime64("1998-01-01", "us").astype(np.int64)


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
# syllable-proxy readability per source
# ---------------------------------------------------------------------------


def q_readability_per_source(sf_dir):
    """Flesch-style readability inputs per source: exact word and
    vowel-group counts (a vowel RUN approximates one syllable — the
    classic readability proxy) and syllables-per-1M-words. Vowel groups
    are non-overlapping regex matches, identical semantics in Arrow's
    count_substring_regex and DuckDB's regexp_extract_all length; one
    combiner-first pass."""
    docs = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["source", "text"]
    )

    def partial(b: pa.Table) -> pa.Table:
        b = _clean(b, ("source", "text"))
        nw = pc.list_value_length(
            pc.split_pattern(b["text"], pattern=" ")
        ).cast(pa.int64())
        ns = pc.count_substring_regex(b["text"], pattern="[aeiou]+").cast(
            pa.int64()
        )
        t = pa.table(
            {
                "source": b["source"],
                "n_docs": pa.array(np.ones(b.num_rows, dtype=np.int64)),
                "sum_words": nw,
                "sum_syllables": ns,
            }
        )
        g = t.group_by(["source"]).aggregate(
            [("n_docs", "sum"), ("sum_words", "sum"), ("sum_syllables", "sum")]
        )
        g = g.select(
            ["source", "n_docs_sum", "sum_words_sum", "sum_syllables_sum"]
        )
        return g.rename_columns(
            ["source", "n_docs", "sum_words", "sum_syllables"]
        )

    def combine(b: pa.Table) -> pa.Table:
        g = b.group_by(["source"]).aggregate(
            [("n_docs", "sum"), ("sum_words", "sum"), ("sum_syllables", "sum")]
        )
        g = g.select(
            ["source", "n_docs_sum", "sum_words_sum", "sum_syllables_sum"]
        )
        return g.rename_columns(
            ["source", "n_docs", "sum_words", "sum_syllables"]
        )

    m = tree_merge(
        docs.map_batches(partial, batch_format="pyarrow", batch_size=None),
        combine,
    ).to_pandas()  # bounded: one row per source

    if not len(m) or "source" not in m.columns:
        return pa.table(
            {
                "source": pa.array([], pa.string()),
                "n_docs": pa.array([], pa.int64()),
                "sum_words": pa.array([], pa.int64()),
                "sum_syllables": pa.array([], pa.int64()),
                "syl_per_word_x1e6": pa.array([], pa.int64()),
            }
        )
    m = m.sort_values("source", ignore_index=True)
    sw = m["sum_words"].to_numpy(dtype=np.int64)
    ss = m["sum_syllables"].to_numpy(dtype=np.int64)
    ratio = np.where(
        sw > 0,
        _round_half_away(ss.astype(np.float64) / np.where(sw > 0, sw, 1) * 1e6),
        0,
    ).astype(np.int64)
    return pa.table(
        {
            "source": pa.array(m["source"], pa.string()),
            "n_docs": pa.array(m["n_docs"].to_numpy(dtype=np.int64)),
            "sum_words": pa.array(sw),
            "sum_syllables": pa.array(ss),
            "syl_per_word_x1e6": pa.array(ratio),
        }
    )


READABILITY_SQL = """
WITH s AS (
  SELECT source,
         CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS sum_words,
         CAST(SUM(len(regexp_extract_all(text, '[aeiou]+'))) AS BIGINT)
           AS sum_syllables
  FROM documents
  WHERE source IS NOT NULL AND text IS NOT NULL
  GROUP BY 1
)
SELECT source, n_docs, sum_words, sum_syllables,
       CASE WHEN sum_words > 0
            THEN CAST(ROUND(CAST(sum_syllables AS DOUBLE) / sum_words
                            * 1000000, 0) AS BIGINT)
            ELSE 0 END AS syl_per_word_x1e6
FROM s
"""


# ---------------------------------------------------------------------------
# stopword density per source
# ---------------------------------------------------------------------------

_STOPWORDS = ["a", "the", "of", "and", "in", "to"]


def q_stopword_density_per_source(sf_dir):
    """Stopword density per source — the function-word share that
    quality classifiers (C4, Gopher rules) threshold on: exact token
    and stopword-hit counts plus density per 1M tokens. The stopword
    test is a vectorized is_in against a broadcast-in-closure list;
    one combiner-first pass."""
    docs = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["source", "text"]
    )
    stopset = pa.array(_STOPWORDS, pa.string())

    def partial(b: pa.Table) -> pa.Table:
        b = _clean(b, ("source", "text"))
        words = pc.split_pattern(b["text"], pattern=" ")
        lens = pc.list_value_length(words).cast(pa.int64())
        flat = pc.list_flatten(words)
        hit = pc.is_in(flat, value_set=stopset).cast(pa.int64())
        # per-doc stop counts: segment-sum the flat hit vector
        ln = lens.to_numpy(zero_copy_only=False)
        hits = hit.to_numpy(zero_copy_only=False)
        ends = np.cumsum(ln)
        starts = ends - ln
        csum = np.concatenate([[0], np.cumsum(hits)])
        per_doc = csum[ends] - csum[starts]
        t = pa.table(
            {
                "source": b["source"],
                "n_tokens": lens,
                "n_stop": pa.array(per_doc.astype(np.int64)),
            }
        )
        g = t.group_by(["source"]).aggregate(
            [("n_tokens", "sum"), ("n_stop", "sum")]
        )
        g = g.select(["source", "n_tokens_sum", "n_stop_sum"])
        return g.rename_columns(["source", "n_tokens", "n_stop"])

    def combine(b: pa.Table) -> pa.Table:
        g = b.group_by(["source"]).aggregate(
            [("n_tokens", "sum"), ("n_stop", "sum")]
        )
        g = g.select(["source", "n_tokens_sum", "n_stop_sum"])
        return g.rename_columns(["source", "n_tokens", "n_stop"])

    m = tree_merge(
        docs.map_batches(partial, batch_format="pyarrow", batch_size=None),
        combine,
    ).to_pandas()  # bounded: one row per source

    if not len(m) or "source" not in m.columns:
        return pa.table(
            {
                "source": pa.array([], pa.string()),
                "n_tokens": pa.array([], pa.int64()),
                "n_stop": pa.array([], pa.int64()),
                "density_x1e6": pa.array([], pa.int64()),
            }
        )
    m = m.sort_values("source", ignore_index=True)
    nt = m["n_tokens"].to_numpy(dtype=np.int64)
    ns = m["n_stop"].to_numpy(dtype=np.int64)
    dens = np.where(
        nt > 0,
        _round_half_away(ns.astype(np.float64) / np.where(nt > 0, nt, 1) * 1e6),
        0,
    ).astype(np.int64)
    return pa.table(
        {
            "source": pa.array(m["source"], pa.string()),
            "n_tokens": pa.array(nt),
            "n_stop": pa.array(ns),
            "density_x1e6": pa.array(dens),
        }
    )


_stop_sql = ", ".join(f"'{w}'" for w in _STOPWORDS)
STOPWORD_SQL = f"""
WITH w AS (
  SELECT source, unnest(string_split(text, ' ')) AS word
  FROM documents WHERE source IS NOT NULL AND text IS NOT NULL
), s AS (
  SELECT source,
         CAST(COUNT(*) AS BIGINT) AS n_tokens,
         CAST(SUM(CASE WHEN word IN ({_stop_sql}) THEN 1 ELSE 0 END)
              AS BIGINT) AS n_stop
  FROM w GROUP BY 1
)
SELECT source, n_tokens, n_stop,
       CASE WHEN n_tokens > 0
            THEN CAST(ROUND(CAST(n_stop AS DOUBLE) / n_tokens * 1000000, 0)
                      AS BIGINT)
            ELSE 0 END AS density_x1e6
FROM s
"""


# ---------------------------------------------------------------------------
# customer spend-decile migration matrix
# ---------------------------------------------------------------------------


def _ntile10(sorted_n: int) -> np.ndarray:
    """SQL NTILE(10) tile sizes for a partition of sorted_n rows: the
    first n % 10 tiles get one extra element."""
    base = sorted_n // 10
    extra = sorted_n % 10
    sizes = np.full(10, base, dtype=np.int64)
    sizes[:extra] += 1
    return np.repeat(np.arange(1, 11, dtype=np.int64), sizes)


def q_decile_migration_matrix(sf_dir):
    """Customer spend-decile migration: NTILE(10) of per-customer order
    spend (exact cents) in the early half (orders before 1998-01-01)
    vs the late half, counted as a transition matrix over customers
    active in BOTH halves — the churn-risk mobility table. The spend
    tier is one combiner-first pass (bounded: customers x 2, the
    dimension-scale rule); NTILE is reproduced exactly — (spend,
    custkey) total order, first n%%10 tiles one larger."""
    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_orderdate", "o_totalprice"],
    )

    def partial(b: pa.Table) -> pa.Table:
        b = _clean(b, ("o_custkey", "o_orderdate", "o_totalprice"))
        ts = (
            b["o_orderdate"].cast(pa.timestamp("us")).cast(pa.int64())
            .to_numpy(zero_copy_only=False)
        )
        cents = _round_half_away(
            b["o_totalprice"].cast(pa.float64()).to_numpy(
                zero_copy_only=False
            )
            * 100.0
        )
        t = pa.table(
            {
                "c": b["o_custkey"].cast(pa.int64()),
                "half": pa.array((ts >= _SPLIT_US).astype(np.int64)),
                "cents": pa.array(cents),
            }
        )
        g = t.group_by(["c", "half"]).aggregate([("cents", "sum")])
        return g.select(["c", "half", "cents_sum"]).rename_columns(
            ["c", "half", "cents"]
        )

    def combine(b: pa.Table) -> pa.Table:
        g = b.group_by(["c", "half"]).aggregate([("cents", "sum")])
        return g.select(["c", "half", "cents_sum"]).rename_columns(
            ["c", "half", "cents"]
        )

    tier = tree_merge(
        orders.map_batches(partial, batch_format="pyarrow", batch_size=None),
        combine,
        final_shards=8,
        shard_cols=["c"],
    ).to_pandas()  # bounded: customers x 2 (dimension-scale)

    if not len(tier) or "c" not in tier.columns:
        return pa.table(
            {
                "d_early": pa.array([], pa.int64()),
                "d_late": pa.array([], pa.int64()),
                "n_customers": pa.array([], pa.int64()),
            }
        )
    deciles = {}
    for half in (0, 1):
        g = tier[tier["half"] == half].sort_values(
            ["cents", "c"], ignore_index=True
        )
        deciles[half] = pd.DataFrame(
            {"c": g["c"].to_numpy(), f"d{half}": _ntile10(len(g))}
        )
    both = deciles[0].merge(deciles[1], on="c", how="inner")
    out = both.groupby(["d0", "d1"], as_index=False).size()
    return pa.table(
        {
            "d_early": pa.array(out["d0"].to_numpy(dtype=np.int64)),
            "d_late": pa.array(out["d1"].to_numpy(dtype=np.int64)),
            "n_customers": pa.array(out["size"].to_numpy(dtype=np.int64)),
        }
    )


MIGRATION_SQL = """
WITH s AS (
  SELECT o_custkey AS c,
         CASE WHEN o_orderdate < TIMESTAMP '1998-01-01' THEN 0 ELSE 1 END
           AS half,
         CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
           AS cents
  FROM orders
  WHERE o_custkey IS NOT NULL AND o_orderdate IS NOT NULL
    AND o_totalprice IS NOT NULL
  GROUP BY 1, 2
), t AS (
  SELECT c, half,
         NTILE(10) OVER (PARTITION BY half ORDER BY cents, c) AS d
  FROM s
)
SELECT CAST(a.d AS BIGINT) AS d_early, CAST(b.d AS BIGINT) AS d_late,
       CAST(COUNT(*) AS BIGINT) AS n_customers
FROM t a JOIN t b ON a.c = b.c
WHERE a.half = 0 AND b.half = 1
GROUP BY 1, 2
"""


def register_r4cd(queries: dict, oracles: dict) -> None:
    queries.update(
        {
            "readability_per_source": q_readability_per_source,
            "stopword_density_per_source": q_stopword_density_per_source,
            "decile_migration_matrix": q_decile_migration_matrix,
        }
    )
    oracles.update(
        {
            "readability_per_source": READABILITY_SQL,
            "stopword_density_per_source": STOPWORD_SQL,
            "decile_migration_matrix": MIGRATION_SQL,
        }
    )
