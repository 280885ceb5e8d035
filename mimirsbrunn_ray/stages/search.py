"""Prefix / fuzzy text search — the bragi autocomplete graft.

Two-pass orchestration exactly like the reference
(/root/reference/libs/bragi/src/query.rs:667-714): an exact PREFIX pass
first; iff it returns ZERO hits, a trigram-fuzzy fallback (the edge-ngram /
3-gram analyzers of config/addr_settings.json re-expressed as character
trigram Jaccard), with importance-blended scoring via
``functions/scoring.blend_weight``. Paging via ``k``/``offset`` grafts
bragi's from/size (libs/bragi/src/routes/autocomplete.rs:56-73).

Scale shape: both passes are map_batches with per-batch PARTIAL top-(k+offset)
followed by a tree merge — no global sort shuffle; the fuzzy pass computes
trigram Jaccard fully vectorized (joint (doc, trigram) unique + bincounts),
never a per-row loop.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from mimirsbrunn_ray.stages.neardup import _batch_shingle_hashes


def _partial_topk(score_cols, k: int):
    """A combine fn keeping the best k rows per block (desc score, asc id)."""

    def combine(b: pa.Table) -> pa.Table:
        return b.sort_by(score_cols).slice(0, k)

    return combine


def expand_query(
    query: str, synonyms: dict | None, cap: int = 64
) -> list[str]:
    """Token-wise synonym expansion of a query — the analyzer-baked
    synonym list the reference applies to every autocomplete query
    (/root/reference/libs/mimir/src/rubber.rs:49-67, e.g. "bd" ->
    "boulevard"). Each token maps to itself plus its configured variants;
    the cartesian product (capped at ``cap`` — synonym lists are
    config-sized) preserves leading/trailing whitespace so prefix
    semantics survive ("tbl " -> ["tbl ", "table "])."""
    if not synonyms:
        return [query]
    lead = query[: len(query) - len(query.lstrip())]
    trail = query[len(query.rstrip()):]
    toks = query.split()
    if not toks:
        return [query]
    out = [""]
    for t in toks:
        variants = [t] + [v for v in synonyms.get(t, ()) if v != t]
        out = [
            (p + " " + v) if p else v for p in out for v in variants
        ][:cap]
    rebuilt = [lead + o + trail for o in out]
    # the identity variant (always first: each token list starts with the
    # token itself) must be the ORIGINAL string — single-space rejoining
    # would silently break prefixes containing runs of whitespace
    rebuilt[0] = query
    return rebuilt


def prefix_search(
    docs: "rd.Dataset",
    query: str,
    k: int = 10,
    offset: int = 0,
    text_col: str = "text",
    id_col: str = "doc_id",
    weight_col: str = "n_chars",
    synonyms: dict | None = None,
) -> "rd.Dataset":
    """Exact-prefix pass: rows whose text starts with ``query`` — or, with
    a ``synonyms`` table, with ANY of its expanded variants (OR of
    vectorized starts_with masks; variant count is config-sized) — scored
    by importance (``weight_col``), top-k with paging offset."""
    need = k + offset
    variants = expand_query(query, synonyms)

    def match(b: pa.Table) -> pa.Table:
        hit = pc.fill_null(
            pc.starts_with(b[text_col], pattern=variants[0]), False
        )
        for v in variants[1:]:
            hit = pc.or_(
                hit,
                pc.fill_null(pc.starts_with(b[text_col], pattern=v), False),
            )
        b = b.filter(hit)
        return pa.table(
            {
                id_col: b[id_col],
                "score": b[weight_col].cast(pa.int64()),
            }
        )

    from mimirsbrunn_ray.stages.rollup import tree_merge

    score_cols = [("score", "descending"), (id_col, "ascending")]
    partials = docs.map_batches(match, batch_format="pyarrow", batch_size=None)
    merged = tree_merge(partials, _partial_topk(score_cols, need))

    def page(b: pa.Table) -> pa.Table:
        return b.sort_by(score_cols).slice(offset, k)

    return merged.map_batches(page, batch_format="pyarrow", batch_size=None)


class _TrigramScorer:
    """Shipped-instance stage: trigram Jaccard(text, query) blended with
    the doc's importance weight; emits per-batch rows with score > 0.

    With a synonym-expanded query, Jaccard is the MAX over the variants
    (each variant's trigram set is precompiled once per task spec).
    ``debug=True`` adds the per-result score-component breakdown the
    reference exposes via its ES explain tree
    (/root/reference/libs/mimir/src/objects.rs:958-976): the raw trigram
    jaccard and the importance blend factor alongside the final score."""

    def __init__(self, query: str, text_col: str, id_col: str,
                 weight_col: str, weight_scale: float,
                 synonyms: dict | None = None, debug: bool = False):
        self.q_tris = []
        for v in expand_query(query, synonyms):
            q_vals, _ = _batch_shingle_hashes([v.lower()], k=3)
            self.q_tris.append(np.unique(q_vals))
        self.text_col = text_col
        self.id_col = id_col
        self.weight_col = weight_col
        self.weight_scale = weight_scale
        self.debug = debug

    def __call__(self, b: pa.Table) -> pa.Table:
        from mimirsbrunn_ray.functions.scoring import blend_weight

        n = b.num_rows
        if n == 0:
            cols = {self.id_col: b[self.id_col],
                    "score": pa.array([], type=pa.float64())}
            if self.debug:
                cols["jaccard"] = pa.array([], type=pa.float64())
                cols["importance"] = pa.array([], type=pa.float64())
            return pa.table(cols)
        texts = [t.lower() if t else "" for t in b[self.text_col].to_pylist()]
        vals, offsets = _batch_shingle_hashes(texts, k=3)
        counts = np.diff(np.append(offsets, len(vals)))
        doc_idx = np.repeat(np.arange(n, dtype=np.int64), counts)
        # joint unique over (doc, trigram): vectorized per-doc set semantics
        pair = np.unique(np.stack([doc_idx, vals.view(np.int64)]), axis=1)
        u_idx, u_vals = pair[0], pair[1].view(np.uint64)
        n_tri = np.bincount(u_idx, minlength=n)
        jac = np.zeros(n, np.float64)
        for q_tri in self.q_tris:  # max over synonym variants (config-sized)
            inter = np.bincount(
                u_idx[np.isin(u_vals, q_tri)], minlength=n
            )
            union = n_tri + len(q_tri) - inter
            jac = np.maximum(jac, inter / np.maximum(union, 1))
        w = b[self.weight_col].cast(pa.float64()).to_numpy(
            zero_copy_only=False
        ) / self.weight_scale
        importance = 0.5 + 0.5 * blend_weight(w, w)
        score = jac * importance
        keep = score > 0
        cols = {
            self.id_col: b[self.id_col].filter(pa.array(keep)),
            "score": pa.array(np.round(score[keep], 6)),
        }
        if self.debug:
            cols["jaccard"] = pa.array(np.round(jac[keep], 6))
            cols["importance"] = pa.array(np.round(importance[keep], 6))
        return pa.table(cols)


def fuzzy_search(
    docs: "rd.Dataset",
    query: str,
    k: int = 10,
    offset: int = 0,
    text_col: str = "text",
    id_col: str = "doc_id",
    weight_col: str = "n_chars",
    weight_scale: float = 500.0,
    synonyms: dict | None = None,
    debug: bool = False,
) -> "rd.Dataset":
    """Trigram-fuzzy pass: character-3-gram Jaccard x importance blend.
    ``debug=True`` carries the (jaccard, importance) component columns
    through to the result — the explain-tree graft."""
    from mimirsbrunn_ray.stages.rollup import tree_merge

    need = k + offset
    scored = docs.map_batches(
        _TrigramScorer(query, text_col, id_col, weight_col, weight_scale,
                       synonyms=synonyms, debug=debug),
        batch_format="pyarrow",
        batch_size=None,
    )
    score_cols = [("score", "descending"), (id_col, "ascending")]
    merged = tree_merge(scored, _partial_topk(score_cols, need))

    def page(b: pa.Table) -> pa.Table:
        return b.sort_by(score_cols).slice(offset, k)

    return merged.map_batches(page, batch_format="pyarrow", batch_size=None)


def autocomplete(
    docs: "rd.Dataset",
    query: str,
    k: int = 10,
    offset: int = 0,
    synonyms: dict | None = None,
    debug: bool = False,
    **kwargs,
):
    """The two-pass orchestration: exact prefix first; trigram-fuzzy
    fallback IFF the prefix pass returns zero rows (query.rs:667-714).
    Synonym expansion applies to BOTH passes (the reference bakes the
    synonym list into every analyzer)."""
    first = prefix_search(
        docs, query, k=k, offset=offset, synonyms=synonyms, **kwargs
    ).materialize()
    if first.count() > 0:
        return first
    return fuzzy_search(
        docs, query, k=k, offset=offset, synonyms=synonyms, debug=debug,
        **kwargs,
    )


def _group_rank_prune(group_cols, sort_cols, k: int):
    """Vectorized per-block prune: keep the best ``k`` rows of every group
    PRESENT IN THE BLOCK. Sort once, then a numpy segment-rank (no per-group
    loop) — the same segment arithmetic as simjoin's prefix ranking."""

    def prune(b: pa.Table) -> pa.Table:
        if b.num_rows <= 1:
            return b
        b = b.sort_by(sort_cols)
        new_seg = np.zeros(b.num_rows, dtype=bool)
        new_seg[0] = True
        for c in group_cols:
            v = b[c].to_numpy(zero_copy_only=False)
            neq = v[1:] != v[:-1]
            if np.issubdtype(v.dtype, np.floating):
                # NaN != NaN is True elementwise, which would rank every
                # null/NaN-keyed row 0 and emit them all; sort_by groups
                # them together, so treat adjacent NaNs as one segment
                nan = np.isnan(v)
                neq &= ~(nan[1:] & nan[:-1])
            new_seg[1:] |= neq
        seg_starts = np.flatnonzero(new_seg)
        seg_sizes = np.diff(np.append(seg_starts, b.num_rows))
        rank = np.arange(b.num_rows) - np.repeat(seg_starts, seg_sizes)
        return b.filter(pa.array(rank < k))

    return prune


def _coarse_grouped_apply(partial: "rd.Dataset", group_cols, fn,
                          num_buckets: int | None):
    """Apply a multi-group-safe block function after ONE group shuffle.

    ``num_buckets=None`` groups directly (right for low-cardinality keys);
    an int hash-buckets the group key into that many coarse partitions so
    HIGH-cardinality keys don't degrade into one pandas/pyarrow group per
    key (the tiny-groups anti-pattern) — the block functions segment by
    the real group columns internally, so bucketing never changes output.
    """
    if num_buckets is None:
        return partial.groupby(group_cols).map_groups(
            fn, batch_format="pyarrow"
        )
    from mimirsbrunn_ray.stages.dedup import _hash64

    def bucketize(b: pa.Table) -> pa.Table:
        h = np.zeros(b.num_rows, np.uint64)
        for c in group_cols:
            h = h * np.uint64(1099511628211) ^ _hash64(b[c])
        return b.append_column(
            "_gb", pa.array((h % np.uint64(num_buckets)).astype(np.int32))
        )

    bucketed = partial.map_batches(
        bucketize, batch_format="pyarrow", batch_size=None
    )
    return bucketed.groupby("_gb").map_groups(
        lambda g: fn(g.drop_columns(["_gb"])), batch_format="pyarrow"
    )


def grouped_top_k(
    ds: "rd.Dataset",
    group_cols,
    order_col: str,
    k: int,
    descending: bool = True,
    tiebreak_cols=(),
    num_buckets: int | None = None,
) -> "rd.Dataset":
    """Per-group top-k — the windowed `ROW_NUMBER() OVER (PARTITION BY g
    ORDER BY v) <= k` analog of bragi's global top-k paging (O4 family,
    /root/reference/libs/bragi/src/routes/autocomplete.rs:56-73 applied
    per partition key).

    Scale shape: a per-batch PARTIAL prune first (each batch keeps at most
    k rows per group it sees, so the shuffle moves <= k x groups-per-batch
    rows, never the corpus) -> ONE hash shuffle on the group key ->
    the same vectorized rank-filter as the final per-group top-k. No
    global sort; ``tiebreak_cols`` make the result deterministic under
    ties (always pass them when ``order_col`` has duplicates).
    ``num_buckets`` coarsens the shuffle for HIGH-cardinality group keys
    (see _coarse_grouped_apply).
    """
    group_cols = list(group_cols)
    sort_cols = (
        [(c, "ascending") for c in group_cols]
        + [(order_col, "descending" if descending else "ascending")]
        + [(c, "ascending") for c in tiebreak_cols]
    )
    prune = _group_rank_prune(group_cols, sort_cols, k)
    partial = ds.map_batches(prune, batch_format="pyarrow", batch_size=None)
    return _coarse_grouped_apply(partial, group_cols, prune, num_buckets)


def _rank_filter(group_cols, sort_cols, order_col, k: int, method: str,
                 emit_rank: str | None = None):
    """Vectorized per-block RANK/DENSE_RANK filter: keep rows whose
    within-group rank (ties SHARE a rank) is <= k. Batch-local rank is a
    lower bound on global rank, so using this as a pre-shuffle prune keeps
    a SUPERSET of the survivors — exactness comes from re-running it after
    the group shuffle. ``emit_rank`` names an output rank column (final
    stage only)."""

    def fil(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            if emit_rank:
                return b.append_column(emit_rank, pa.array([], pa.int64()))
            return b
        b = b.sort_by(sort_cols)
        n = b.num_rows
        new_seg = np.zeros(n, dtype=bool)
        new_seg[0] = True
        for c in group_cols:
            v = b[c].to_numpy(zero_copy_only=False)
            neq = v[1:] != v[:-1]
            if np.issubdtype(v.dtype, np.floating):
                nan = np.isnan(v)
                neq &= ~(nan[1:] & nan[:-1])
            new_seg[1:] |= neq
        ov = b[order_col].to_numpy(zero_copy_only=False)
        new_run = new_seg.copy()
        neq_v = ov[1:] != ov[:-1]
        if np.issubdtype(ov.dtype, np.floating):
            nan = np.isnan(ov)
            neq_v &= ~(nan[1:] & nan[:-1])
        new_run[1:] |= neq_v
        idx = np.arange(n)
        seg_start = np.maximum.accumulate(np.where(new_seg, idx, -1))
        if method == "rank":
            run_start = np.maximum.accumulate(np.where(new_run, idx, -1))
            rank = run_start - seg_start + 1
        else:  # dense
            run_id = np.cumsum(new_run)
            rank = run_id - run_id[seg_start] + 1
        keep = rank <= k
        out = b.filter(pa.array(keep))
        if emit_rank:
            out = out.append_column(
                emit_rank, pa.array(rank[keep].astype(np.int64))
            )
        return out

    return fil


def grouped_rank_topk(
    ds: "rd.Dataset",
    group_cols,
    order_col: str,
    k: int,
    descending: bool = True,
    method: str = "rank",
    rank_col: str = "rnk",
    num_buckets: int | None = None,
) -> "rd.Dataset":
    """Per-group `RANK() <= k` (or DENSE_RANK) WITH TIES — the
    ties-inclusive sibling of ``grouped_top_k``'s ROW_NUMBER semantics.
    No tiebreak columns needed: tied rows all survive, exactly like SQL.

    Scale shape mirrors grouped_top_k: a per-batch partial RANK prune
    first (batch-local rank lower-bounds global rank, so the prune keeps
    a superset; <= k distinct order values per group leave any batch) ->
    ONE hash shuffle -> the same filter exactly, emitting the rank.
    """
    if method not in ("rank", "dense"):
        raise ValueError(f"unknown method {method!r}")
    group_cols = list(group_cols)
    sort_cols = [(c, "ascending") for c in group_cols] + [
        (order_col, "descending" if descending else "ascending")
    ]
    prune = _rank_filter(group_cols, sort_cols, order_col, k, method)
    final = _rank_filter(group_cols, sort_cols, order_col, k, method,
                         emit_rank=rank_col)
    partial = ds.map_batches(prune, batch_format="pyarrow", batch_size=None)
    return _coarse_grouped_apply(partial, group_cols, final, num_buckets)
