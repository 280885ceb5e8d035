"""Round-4 batch CB: ES-style faceted search, exact phrase search, and
did-you-mean spell-correct suggestions over the corpus vocabulary.

Query-layer parity batch: the reference's search tier returns facet
aggregations alongside hits and suggests corrections from indexed terms
(/root/reference/libs/bragi exposes the ES aggregation + suggest
surface); here each is a streaming Ray reduction with a DuckDB oracle.
Exactness: hit predicates are byte-literal (LIKE-equivalent substring /
prefix tests on ASCII anchors), counts are int64, and the suggestion
rank is the engine-independent (dist ASC, count DESC, word ASC) order.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from mimirsbrunn_ray.stages.rollup import tree_merge
from mimirsbrunn_ray.stages.text import levenshtein_matrix


def _clean(b: pa.Table, cols: tuple[str, ...]) -> pa.Table:
    m = None
    for c in cols:
        v = pc.is_valid(b[c])
        m = v if m is None else pc.and_(m, v)
    return b.filter(m)


# ---------------------------------------------------------------------------
# faceted search: hit counts per (lang, source) alongside the match
# ---------------------------------------------------------------------------


def q_faceted_search_docs(sf_dir):
    """The ES aggregations-alongside-hits shape: for documents matching
    the prefix query (text LIKE 'the %', the prefix_search_docs
    predicate), the per-(lang, source) facet counts a search UI renders
    next to the result list. One streaming pass: the filter and the
    facet partial aggregate fuse into the same map_batches; facet rows
    are bounded by langs x sources."""
    docs = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["text", "lang", "source"]
    )

    def partial(b: pa.Table) -> pa.Table:
        b = _clean(b, ("text", "lang", "source"))
        b = b.filter(pc.starts_with(b["text"], "the "))
        t = pa.table(
            {
                "lang": b["lang"],
                "source": b["source"],
                "n_hits": pa.array(np.ones(b.num_rows, dtype=np.int64)),
            }
        )
        g = t.group_by(["lang", "source"]).aggregate([("n_hits", "sum")])
        return g.select(["lang", "source", "n_hits_sum"]).rename_columns(
            ["lang", "source", "n_hits"]
        )

    def combine(b: pa.Table) -> pa.Table:
        g = b.group_by(["lang", "source"]).aggregate([("n_hits", "sum")])
        return g.select(["lang", "source", "n_hits_sum"]).rename_columns(
            ["lang", "source", "n_hits"]
        )

    return tree_merge(
        docs.map_batches(partial, batch_format="pyarrow", batch_size=None),
        combine,
    )


FACETED_SQL = """
SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS n_hits
FROM documents
WHERE text IS NOT NULL AND lang IS NOT NULL AND source IS NOT NULL
  AND text LIKE 'the %'
GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# exact phrase search (whitespace-delimited bigram)
# ---------------------------------------------------------------------------


def q_phrase_search_docs(sf_dir):
    """Exact-phrase search: top-10 documents (by n_chars DESC, doc_id
    ASC — the deterministic prefix_search ranking) containing the
    whitespace-delimited phrase "stream column". The match is a byte-literal
    substring test on the space-padded text, so a doc ending in the
    phrase or starting with it still matches while "stream columns" would not —
    the posting-adjacency semantics of a positional index, evaluated as
    one vectorized scan + distributed top-k prune."""
    docs = rd.read_parquet(
        f"{sf_dir}/documents.parquet",
        columns=["doc_id", "text", "n_chars"],
    )

    def partial(b: pa.Table) -> pa.Table:
        b = _clean(b, ("doc_id", "text", "n_chars"))
        padded = pc.binary_join_element_wise(
            pa.scalar(" "), b["text"], pa.scalar(" "), ""
        )
        b = b.filter(pc.match_substring(padded, " stream column "))
        t = pa.table(
            {
                "doc_id": b["doc_id"].cast(pa.int64()),
                "score": b["n_chars"].cast(pa.int64()),
            }
        )
        # local prune: only a block's own top-10 can reach the global top
        df = t.to_pandas().sort_values(
            ["score", "doc_id"], ascending=[False, True]
        ).head(10)
        return pa.Table.from_pandas(df, preserve_index=False)

    def combine(b: pa.Table) -> pa.Table:
        df = b.to_pandas().sort_values(
            ["score", "doc_id"], ascending=[False, True]
        ).head(10)
        return pa.Table.from_pandas(df, preserve_index=False)

    return tree_merge(
        docs.map_batches(partial, batch_format="pyarrow", batch_size=None),
        combine,
    )


PHRASE_SQL = """
SELECT doc_id, CAST(n_chars AS BIGINT) AS score
FROM documents
WHERE text IS NOT NULL AND n_chars IS NOT NULL
  AND (' ' || text || ' ') LIKE '% stream column %'
ORDER BY score DESC, doc_id
LIMIT 10
"""


# ---------------------------------------------------------------------------
# did-you-mean: most frequent vocab word within edit distance 2
# ---------------------------------------------------------------------------

_SPELL_PROBES = ["teh", "documant", "langage", "sourc"]


def q_spell_correct_suggestions(sf_dir):
    """Did-you-mean suggestions from the corpus's own vocabulary: for
    each probe, the word within Levenshtein distance <= 2 ranked by
    (dist ASC, corpus frequency DESC, word ASC) — the suggest surface a
    search tier builds from its indexed terms. Two bounded reductions:
    a combiner-first distinct-word count (the vocab tier), then a
    per-block probe argmin over that tier tree-merged by the same
    order; probes with no candidate within 2 drop out (SQL-WHERE
    semantics). Probes are ASCII so the codepoint DP and DuckDB's
    byte-based levenshtein agree."""
    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])

    def wpartial(b: pa.Table) -> pa.Table:
        b = _clean(b, ("text",))
        words = pc.list_flatten(pc.split_pattern(b["text"], pattern=" "))
        t = pa.table(
            {
                "word": words,
                "cnt": pa.array(
                    np.ones(len(words), dtype=np.int64)
                ),
            }
        )
        g = t.group_by(["word"]).aggregate([("cnt", "sum")])
        return g.select(["word", "cnt_sum"]).rename_columns(["word", "cnt"])

    def wcombine(b: pa.Table) -> pa.Table:
        g = b.group_by(["word"]).aggregate([("cnt", "sum")])
        return g.select(["word", "cnt_sum"]).rename_columns(["word", "cnt"])

    vocab = tree_merge(
        docs.map_batches(wpartial, batch_format="pyarrow", batch_size=None),
        wcombine,
        final_shards=8,
        shard_cols=["word"],
    )

    def probe_partial(b: pa.Table) -> pa.Table:
        words = b["word"].to_numpy(zero_copy_only=False)
        cnt = b["cnt"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        out = {"probe": [], "suggestion": [], "dist": [], "cnt": []}
        if len(words):
            wl = [str(w) for w in words]
            for p in _SPELL_PROBES:
                d = levenshtein_matrix(wl, p)
                ok = d <= 2
                if not ok.any():
                    continue
                # rank (dist ASC, cnt DESC, word ASC) without a full sort
                sub = np.flatnonzero(ok)
                key = list(
                    zip(d[sub], -cnt[sub], np.array(wl, object)[sub])
                )
                best = sub[min(range(len(sub)), key=lambda i: key[i])]
                out["probe"].append(p)
                out["suggestion"].append(wl[best])
                out["dist"].append(int(d[best]))
                out["cnt"].append(int(cnt[best]))
        return pa.table(
            {
                "probe": pa.array(out["probe"], pa.string()),
                "suggestion": pa.array(out["suggestion"], pa.string()),
                "dist": pa.array(out["dist"], pa.int64()),
                "cnt": pa.array(out["cnt"], pa.int64()),
            }
        )

    def probe_combine(b: pa.Table) -> pa.Table:
        df = b.to_pandas()
        if not len(df):
            return b
        df["_negc"] = -df["cnt"]
        df = df.sort_values(
            ["probe", "dist", "_negc", "suggestion"]
        ).groupby("probe", sort=True, as_index=False).first()
        return pa.Table.from_pandas(
            df[["probe", "suggestion", "dist", "cnt"]], preserve_index=False
        )

    return tree_merge(
        vocab.map_batches(
            probe_partial, batch_format="pyarrow", batch_size=None
        ),
        probe_combine,
    )


_spell_probes_sql = ", ".join(f"('{p}')" for p in _SPELL_PROBES)
SPELL_SQL = f"""
WITH v AS (
  SELECT unnest(string_split(text, ' ')) AS word
  FROM documents WHERE text IS NOT NULL
), c AS (
  SELECT word, CAST(COUNT(*) AS BIGINT) AS cnt FROM v GROUP BY 1
), probes(probe) AS (VALUES {_spell_probes_sql}),
d AS (
  SELECT p.probe, c.word AS suggestion,
         CAST(levenshtein(p.probe, c.word) AS BIGINT) AS dist, c.cnt
  FROM probes p CROSS JOIN c
  WHERE levenshtein(p.probe, c.word) <= 2
)
SELECT probe, suggestion, dist, cnt FROM d
QUALIFY ROW_NUMBER() OVER (
  PARTITION BY probe ORDER BY dist, cnt DESC, suggestion
) = 1
"""


def register_r4cb(queries: dict, oracles: dict) -> None:
    queries.update(
        {
            "faceted_search_docs": q_faceted_search_docs,
            "phrase_search_docs": q_phrase_search_docs,
            "spell_correct_suggestions": q_spell_correct_suggestions,
        }
    )
    oracles.update(
        {
            "faceted_search_docs": FACETED_SQL,
            "phrase_search_docs": PHRASE_SQL,
            "spell_correct_suggestions": SPELL_SQL,
        }
    )
