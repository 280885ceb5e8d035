"""Exact n-gram Jaccard similarity self-join via prefix filtering.

The AllPairs/PPJoin family (Bayardo et al., WWW'07; Xiao et al., WWW'08 —
public algorithms) makes an exact threshold similarity join scale without
comparing every pair: under ANY consistent total order on tokens, two sets
with Jaccard >= t must share at least one token among each set's first
``m - ceil(t*m) + 1`` tokens (the prefix). Only pairs sharing a prefix
token are candidates; everything else is provably below threshold.

Distributed shape (tokenize ONCE; nothing corpus-sized on the driver in
unbounded mode):
  0. gram table: one corpus pass materializes (doc_id, sorted-distinct
     gram hashes, size) — every later stage derives from it with offset
     arithmetic instead of re-tokenizing (profiled: the old 3-pass shape
     spent most of its wall re-tokenizing + tree-merging).
  1. shared-gram scan (bounded mode only): per-block distinct-gram df
     partials pulled to the driver under a byte budget and merged with
     one ``np.unique`` — filtered to df >= 2; a df == 1 gram can never
     witness a pair, so the BROADCAST is bounded by the SHARED-gram count
     (near-dup scale). The pull itself is vocabulary x blocks scale,
     which the budget guards; past it the join falls back to unbounded.
  2. prefix stage (``map_batches`` over the gram table): grams ordered
     df-ASCENDING by the broadcast shared-gram rank (rare first — the
     classic AllPairs candidate minimizer; any consistent total order
     keeps the filter exact), emit (gram, doc_id, size, pos) rows for the
     PREFIX grams only — in unbounded (hash-order) mode the stored order
     IS the global order and the prefix is a pure offset slice.
  3. candidate stage: hash-bucket by gram, within-bucket group by gram,
     emit id pairs passing the LENGTH filter (min >= t * max; J <= min/max)
     and PPJoin's POSITIONAL filter (suffix length from the witness
     position must reach the minimum overlap ceil(t/(1+t)*(sx+sy)); the
     smallest common gram of a true pair always passes). PPJoin+'s SUFFIX
     filter is deliberately NOT implemented: it needs each candidate's
     gram array in the bucket (a much heavier shuffle payload than the
     (size, pos) scalars shipped today) to cut pairs whose verification
     cost is already sub-second behind the length+positional filters —
     the measured wall here is per-execution fixed cost, not verify work.
  4. verify: batch-local pair dedup (duplicate witnesses tolerated — no
     pair shuffle), exact Jaccard either against a gram-set map built by
     a candidate-filtered gram-table pass (the bounded-broadcast pattern
     of stages/neardup.py) or — past the broadcast budgets — via two
     ``Dataset.join``s of the pair list against the binary-encoded
     (doc_id, grams) table (``mode`` on ``ngram_jaccard_join``), then one
     coalesced collapse of the TINY verified set.

Reference analog: the deterministic in-pipeline dedup of
/root/reference/src/osm_reader/street.rs:202-246 generalized from exact
keys to a similarity predicate.

EXACTNESS CAVEAT (hash collisions): grams are compared as 64-bit hashes
(word hashes folded + _mix64), not strings. Two distinct grams colliding
merges them in both the intersection and the union, so the reported
Jaccard can only be inflated — never deflated: the join stays a SUPERSET
of the true >= t pairs, and a birthday bound of ~d^2 / 2^65 collision
probability over d distinct grams keeps the inflation negligible below
~10^8 distinct grams PER DOCUMENT PAIR (per-pair sets are what intersect;
the corpus-wide gram count does not enter the per-pair error). Callers
needing certificate-grade exactness at adversarial scale should re-verify
the tiny surviving pair set against the raw gram strings.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from mimirsbrunn_ray.stages.neardup import _mix64  # shared avalanche hash

_B1 = np.uint64(0x9E3779B97F4A7C15)
_B2 = np.uint64(0xC2B2AE3D27D4EB4F)

# below this many candidate pairs, verification runs on the driver (the
# fixed cost of one more Ray execution exceeds the serial intersect work);
# above it, the same broadcast gram map is verified by a distributed
# map_batches so the driver never serializes a large pair list
_DRIVER_VERIFY_PAIRS = 50_000


def word_ngram_hashes(texts: pa.Array, n: int = 3):
    """Vectorized word-n-gram hashing for a whole batch.

    Matches the oracle's gram construction: lowercase, split on single
    spaces, windows of ``n`` consecutive words. Docs with < n words get no
    grams. Returns (gram uint64[], doc_index int64[]) — NOT deduplicated.
    """
    lowered = pc.utf8_lower(texts)
    words = pc.split_pattern(pc.fill_null(lowered, ""), " ")
    flat = words.combine_chunks() if isinstance(words, pa.ChunkedArray) else words
    offsets = flat.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    wvals = flat.values
    # deterministic 64-bit word hashes, vectorized over the flat word array
    wh = pd.util.hash_pandas_object(
        pd.Series(wvals.to_pandas()), index=False
    ).to_numpy()
    counts = np.diff(offsets)
    n_docs = len(counts)
    if len(wh) < n:
        return np.empty(0, np.uint64), np.empty(0, np.int64)
    # gram over every window of the flat array, then mask windows that
    # cross document boundaries
    g = wh[: len(wh) - n + 1].copy()
    for j in range(1, n):
        g = g * _B1 + wh[j : len(wh) - n + 1 + j] * _B2
    g = _mix64(g)
    starts = offsets[:-1]
    gram_counts = np.maximum(counts - (n - 1), 0)
    delta = np.zeros(len(g) + 1, dtype=np.int64)
    valid_starts = starts[gram_counts > 0]
    valid_counts = gram_counts[gram_counts > 0]
    np.add.at(delta, valid_starts, 1)
    np.add.at(delta, valid_starts + valid_counts, -1)
    mask = np.cumsum(delta[:-1]) > 0
    doc_idx = np.repeat(np.arange(n_docs, dtype=np.int64), gram_counts)
    return g[mask], doc_idx


def _distinct_sorted_per_doc(grams: np.ndarray, doc_idx: np.ndarray):
    """One lexsort: per-doc distinct grams in ascending hash order.
    Returns (grams, doc_idx, seg_rank, seg_size) over the deduped rows."""
    order = np.lexsort((grams, doc_idx))
    g, d = grams[order], doc_idx[order]
    keep = np.ones(len(g), dtype=bool)
    keep[1:] = (g[1:] != g[:-1]) | (d[1:] != d[:-1])
    g, d = g[keep], d[keep]
    # per-doc segment rank and size
    new_seg = np.ones(len(d), dtype=bool)
    new_seg[1:] = d[1:] != d[:-1]
    seg_starts = np.flatnonzero(new_seg)
    seg_sizes = np.diff(np.append(seg_starts, len(d)))
    rank = np.arange(len(d)) - np.repeat(seg_starts, seg_sizes)
    size = np.repeat(seg_sizes, seg_sizes)
    return g, d, rank, size


class _GramTable:
    """map_batches stage: (doc_id, text) -> (doc_id, grams list<int64>,
    size int32) — each doc's DISTINCT grams in ascending hash order.

    The join's tokenize-once backbone: this table is materialized a single
    time and every later stage (df scan, prefix, verification gram sets)
    derives from it with pure offset arithmetic — the profile showed the
    old shape re-tokenizing the corpus in three separate executions, with
    the wall dominated by that repeated work plus the df tree-merge.
    Corpus-sized but object-store-resident (Ray spills it like any other
    materialized Dataset); zero-gram docs keep an empty-list row so the
    table stays a total map of the corpus.
    """

    def __init__(self, n: int):
        self.n = n

    def __call__(self, b: pa.Table) -> pa.Table:
        grams, doc_idx = word_ngram_hashes(b["text"], self.n)
        ids = b["doc_id"].combine_chunks() if isinstance(
            b["doc_id"], pa.ChunkedArray
        ) else b["doc_id"]
        n_docs = b.num_rows
        if len(grams) == 0:
            offsets = np.zeros(n_docs + 1, dtype=np.int32)
            values = pa.array([], pa.int64())
        else:
            g, d, _rank, _size = _distinct_sorted_per_doc(grams, doc_idx)
            counts = np.bincount(d, minlength=n_docs)
            offsets = np.concatenate(
                ([0], np.cumsum(counts))
            ).astype(np.int32)
            values = pa.array(g.view(np.int64))
        lists = pa.ListArray.from_arrays(pa.array(offsets, pa.int32()), values)
        sizes = np.diff(offsets).astype(np.int32)
        return pa.table(
            {"doc_id": ids, "grams": lists, "size": pa.array(sizes)}
        )


def _flatten_grams(b: pa.Table):
    """(values int64[], offsets int64[]) of a gram-table batch, with a
    NORMALIZED contract: offsets[0] == 0 and len(values) == offsets[-1]
    == sum(row lengths). ``pc.list_flatten`` + ``pc.list_value_length``
    honor array slicing — raw ``.values``/``.offsets`` buffers on a
    sliced ListArray chunk keep the parent's absolute offsets and would
    misalign every consumer doing ``arange - repeat(offsets)`` rank math.
    """
    col = b["grams"].combine_chunks() if isinstance(
        b["grams"], pa.ChunkedArray
    ) else b["grams"]
    values = pc.list_flatten(col).to_numpy(zero_copy_only=False)
    counts = pc.list_value_length(col).to_numpy(zero_copy_only=False)
    offsets = np.concatenate(([0], np.cumsum(counts, dtype=np.int64)))
    return values, offsets


def _shared_grams(
    gram_tbl: "rd.Dataset",
    byte_budget: int | None = None,
    distributed: bool = False,
):
    """Sorted uint64 array of grams with document frequency >= 2, or None
    when the pull would exceed ``byte_budget`` (the caller then switches
    to the unbounded hash-order path — see ``ngram_jaccard_join``).

    The classic AllPairs df-ascending optimization needs each gram's df;
    a gram with df == 1 can NEVER witness a candidate pair, so the
    BROADCAST side is bounded by the SHARED-gram count (near-dup scale).
    Two merge shapes:

    * ``distributed=False`` (the auto-mode fast path): each block's
      distinct-gram df partials are pulled to the driver and merged with
      one np.unique — the pull is vocabulary x blocks scale, which the
      byte budget guards (in natural-language corpora shared grams scale
      with vocabulary, ADVICE r2). Saves the tree-merge execution.
    * ``distributed=True`` (explicit bounded mode, where no budget trips
      and nothing may fall back): the df merge runs as a distributed
      tree-merge and ONLY the globally-merged df >= 2 survivors reach
      the driver — driver memory stays near-dup scale even on a
      low-duplication corpus, at the cost of one more execution.

    Returns the shared grams sorted by (df ascending, gram) — their RANK
    in this array is the global prefix order.
    """

    def partial(b: pa.Table) -> pa.Table:
        values, _ = _flatten_grams(b)
        if len(values) == 0:
            return pa.table(
                {"gram": pa.array([], pa.int64()),
                 "n": pa.array([], pa.int64())}
            )
        uniq, counts = np.unique(values, return_counts=True)
        return pa.table(
            {"gram": pa.array(uniq), "n": pa.array(counts.astype(np.int64))}
        )

    partials = gram_tbl.map_batches(
        partial, batch_format="pyarrow", batch_size=None
    )

    if distributed:
        from mimirsbrunn_ray.stages.rollup import tree_merge

        def combine(b: pa.Table) -> pa.Table:
            g = b.group_by(["gram"]).aggregate([("n", "sum")])
            return g.rename_columns(["gram", "n"])

        partials = tree_merge(partials, combine).map_batches(
            lambda b: b.filter(pc.greater(b["n"], 1)),
            batch_format="pyarrow", batch_size=None,
        )

    chunks_g, chunks_n = [], []
    total_bytes = 0
    for bt in partials.iter_batches(batch_format="pyarrow"):
        arr = bt["gram"].to_numpy(zero_copy_only=False)
        total_bytes += len(arr) * (24 if distributed else 16)
        if byte_budget is not None and total_bytes > byte_budget:
            return None
        chunks_g.append(arr)
        chunks_n.append(bt["n"].to_numpy(zero_copy_only=False))
    if not chunks_g:
        return np.empty(0, np.uint64)
    g_all = np.concatenate(chunks_g)
    n_all = np.concatenate(chunks_n)
    uniq, inv = np.unique(g_all, return_inverse=True)
    df = np.bincount(inv, weights=n_all).astype(np.int64)
    shared = uniq[df >= 2].view(np.uint64)
    df = df[df >= 2]
    # the broadcast ships three same-length arrays (shared, val_sorted,
    # val_rank) per task spec — budget 24 bytes per shared gram
    if byte_budget is not None and len(shared) * 24 > byte_budget:
        return None
    order = np.lexsort((shared, df))  # df ascending, gram tiebreak
    return shared[order]


class _PrefixGrams:
    """map_batches stage over the GRAM TABLE: (doc_id, grams, size) ->
    prefix rows (gram, doc_id, size, pos).

    Gram order is df-ASCENDING over the broadcast shared-gram rank (grams
    absent from it have df == 1 and sort AFTER every shared gram, mutually
    ordered by hash) — any consistent total order keeps the prefix filter
    exact; rare-first minimizes candidates (Bayardo et al.). Prefix
    entries whose gram is unshared are dropped outright: df == 1 grams
    cannot witness a pair.

    ``shared=None`` is the UNBOUNDED mode: no broadcast at all, grams
    ordered by their (avalanched) hash value — still a consistent global
    total order, so the prefix filter stays exact; df == 1 grams are kept
    and die later as singleton gram groups in the candidate shuffle. In
    this mode the gram table's per-doc lists are ALREADY in order, so the
    prefix is a pure offset slice — no sort at all.
    """

    def __init__(self, threshold: float, shared=None):
        self.t = threshold
        self.prune = shared is not None
        # sorted-by-(df,gram) shared grams (plain array: the instance is
        # SHIPPED with the task spec — tiny immutable state, so paying
        # actor-pool startup would cost more than it saves)
        self.shared = (
            shared if shared is not None else np.empty(0, np.uint64)
        )
        # searchsorted needs a sorted-BY-VALUE copy + each value's df-rank
        order = np.argsort(self.shared, kind="stable")
        self.val_sorted = self.shared[order]
        self.val_rank = np.argsort(order)

    def _order_key(self, grams: np.ndarray) -> np.ndarray:
        """Global order key: shared grams get their df-rank (< 2^32);
        unshared grams get 2^32 + hash-derived offset (after all shared)."""
        pos = np.searchsorted(self.val_sorted, grams)
        pos_c = np.clip(pos, 0, max(len(self.val_sorted) - 1, 0))
        if len(self.val_sorted):
            hit = self.val_sorted[pos_c] == grams
            key = np.where(
                hit,
                self.val_rank[pos_c].astype(np.uint64),
                (np.uint64(1) << np.uint64(32)) + (grams >> np.uint64(32)),
            )
        else:
            key = (np.uint64(1) << np.uint64(32)) + (grams >> np.uint64(32))
        return key

    def __call__(self, b: pa.Table) -> pa.Table:
        ids = b["doc_id"].combine_chunks() if isinstance(
            b["doc_id"], pa.ChunkedArray
        ) else b["doc_id"]
        values, offsets = _flatten_grams(b)
        if len(values) == 0:
            return pa.table(
                {
                    "gram": pa.array([], pa.int64()),
                    "doc_id": pa.array([], ids.type),
                    "size": pa.array([], pa.int32()),
                    "pos": pa.array([], pa.int32()),
                }
            )
        g = values.view(np.uint64)
        counts = np.diff(offsets)
        d = np.repeat(np.arange(b.num_rows, dtype=np.int64), counts)
        size = np.repeat(counts, counts)
        if self.prune:
            # re-rank each doc's grams in the df-ascending global order;
            # the sort keeps rows grouped per doc (d is the primary key),
            # so offsets stay valid as segment starts
            key = self._order_key(g)
            order = np.lexsort((key, d))
            g, d, size, key = g[order], d[order], size[order], key[order]
        else:
            # hash order == stored order: no sort at all
            key = g
        rank = np.arange(len(d)) - np.repeat(offsets[:-1], counts)
        # prefix filter: first m - ceil(t*m) + 1 grams of each doc; in
        # bounded mode also drop unshared grams (df == 1 -> pair-free)
        p = size - np.ceil(self.t * size).astype(np.int64) + 1
        keep = rank < p
        if self.prune:
            keep &= key < (np.uint64(1) << np.uint64(32))
        return pa.table(
            {
                "gram": pa.array(g[keep].view(np.int64)),
                "doc_id": ids.take(pa.array(d[keep])),
                "size": pa.array(size[keep].astype(np.int32)),
                "pos": pa.array(rank[keep].astype(np.int32)),
            }
        )


def _pairs_in_bucket(threshold: float):
    """Per-gram candidate pairs with the PPJoin filters (Xiao et al.):

    * length filter — J <= min/max, so require min >= t * max;
    * positional filter — for witness gram at 0-based prefix position
      p in a doc of set size s, the overlap via this witness is at most
      min(s_x - p_x, s_y - p_y); require that to reach the minimum
      overlap ceil(t/(1+t) * (s_x+s_y)). A true pair's SMALLEST common
      gram always satisfies the bound, so dropping other witnesses is
      safe (the pair is emitted at least once; duplicates are fine —
      verification dedups).
    """

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        out = []
        for _, grp in g.groupby("gram", sort=False):
            if len(grp) < 2:
                continue
            ids = grp["doc_id"].to_numpy()
            sizes = grp["size"].to_numpy()
            poss = grp["pos"].to_numpy()
            u, first = np.unique(ids, return_index=True)
            if len(u) < 2:
                continue
            sz = sizes[first].astype(np.float64)
            ps = poss[first].astype(np.float64)
            ii, jj = np.triu_indices(len(u), 1)
            lo = np.minimum(sz[ii], sz[jj])
            hi = np.maximum(sz[ii], sz[jj])
            ok = lo >= threshold * hi
            # positional filter
            need = threshold / (1.0 + threshold) * (sz[ii] + sz[jj])
            ub = np.minimum(sz[ii] - ps[ii], sz[jj] - ps[jj])
            ok &= ub >= np.ceil(need - 1e-9)
            if ok.any():
                out.append(
                    pd.DataFrame({"a": u[ii[ok]], "b": u[jj[ok]]})
                )
        if not out:
            # derive the empty frame's dtype from the incoming ids: a
            # hardcoded int64 here would make pair-less bucket groups emit
            # int64 blocks while pair-bearing groups emit string blocks for
            # string doc_ids, and the block schema unification would raise
            id_dtype = g["doc_id"].dtype if "doc_id" in g else "int64"
            return pd.DataFrame(
                {"a": pd.Series([], dtype=id_dtype),
                 "b": pd.Series([], dtype=id_dtype)}
            )
        return pd.concat(out, ignore_index=True)

    return fn


class _GramSets:
    """Gram-table pass -> (doc_id, gram set) rows; ``cand`` filters to the
    candidate docs (bounded-broadcast mode), ``cand=None`` emits every doc
    (the unbounded shuffle-join mode).

    Gram sets are encoded as BINARY (sorted int64 little-endian bytes),
    not list<int64>: Acero hash joins reject list payload columns, and the
    unbounded verify path ships these rows through two ``Dataset.join``s.
    The per-row ``tobytes`` is an O(rows) encode over already-sorted
    slices — no tokenization, no per-row set building.
    """

    def __init__(self, cand):
        self.cand = cand

    def __call__(self, b: pa.Table) -> pa.Table:
        if self.cand is not None:
            keep = pc.fill_null(
                pc.is_in(b["doc_id"], value_set=self.cand), False
            )
            b = b.filter(keep)
        values, offsets = _flatten_grams(b)
        sets = [
            values[offsets[i]:offsets[i + 1]].tobytes()
            for i in range(b.num_rows)
        ]
        return pa.table(
            {
                "doc_id": b["doc_id"],
                "grams": pa.array(sets, type=pa.binary()),
            }
        )


def _exact_jaccard_sorted(sa: np.ndarray, sb: np.ndarray) -> float:
    inter = len(np.intersect1d(sa, sb, assume_unique=True))
    uni = len(sa) + len(sb) - inter
    return inter / uni if uni else 0.0


class _VerifyJaccard:
    """Broadcast-map verify: gram sets resolved from a driver-built dict
    (bounded by the candidate count)."""

    def __init__(self, gram_map: dict, threshold: float):
        self.gram_map = gram_map
        self.t = threshold

    def __call__(self, b: pa.Table) -> pa.Table:
        a_ids = b["a"].to_pylist()
        b_ids = b["b"].to_pylist()
        empty = np.empty(0, np.int64)
        jac = np.zeros(len(a_ids))
        for i, (x, y) in enumerate(zip(a_ids, b_ids)):
            jac[i] = _exact_jaccard_sorted(
                self.gram_map.get(x, empty), self.gram_map.get(y, empty)
            )
        keep = jac >= self.t
        return pa.table(
            {
                "doc_a": b["a"].filter(pa.array(keep)),
                "doc_b": b["b"].filter(pa.array(keep)),
                "jaccard": pa.array(jac[keep]),
            }
        )


class _VerifyJoined:
    """Shuffle-join verify: each pair row arrives with BOTH gram sets
    attached (binary-encoded) after two Dataset.joins — no driver state
    of any size. The per-pair intersect matches _VerifyJaccard exactly."""

    def __init__(self, threshold: float):
        self.t = threshold

    def __call__(self, b: pa.Table) -> pa.Table:
        ga = b["grams_a"].to_pylist()
        gb = b["grams_b"].to_pylist()
        jac = np.zeros(b.num_rows)
        for i, (x, y) in enumerate(zip(ga, gb)):
            jac[i] = _exact_jaccard_sorted(
                np.frombuffer(x or b"", dtype=np.int64),
                np.frombuffer(y or b"", dtype=np.int64),
            )
        keep = jac >= self.t
        return pa.table(
            {
                "doc_a": b["a"].filter(pa.array(keep)),
                "doc_b": b["b"].filter(pa.array(keep)),
                "jaccard": pa.array(jac[keep]),
            }
        )


def _unique_pair_rows(b: pa.Table, ca: str = "a", cb: str = "b") -> np.ndarray:
    """Row indices of the first occurrence of each (a, b) pair — exact
    (lexsort over the real ids), no hash packing."""
    a = b[ca].to_numpy(zero_copy_only=False)
    bb = b[cb].to_numpy(zero_copy_only=False)
    order = np.lexsort((bb, a))
    sa, sb = a[order], bb[order]
    first = np.ones(len(order), dtype=bool)
    first[1:] = (sa[1:] != sa[:-1]) | (sb[1:] != sb[:-1])
    return np.sort(order[first])


def ngram_jaccard_join(
    docs: "rd.Dataset",
    threshold: float = 0.6,
    n: int = 3,
    num_buckets: int = 32,
    concurrency=None,
    mode: str = "auto",
    broadcast_byte_budget: int = 256 << 20,
    max_broadcast_pairs: int = 1_000_000,
) -> "rd.Dataset":
    """EXACT all-pairs word-n-gram Jaccard join: every pair with
    J >= threshold, with its exact Jaccard value. See module docstring.

    ``mode`` picks the scale shape (both produce IDENTICAL output —
    asserted by tests/test_unbounded_paths.py):

    * ``"bounded"`` — the broadcast fast path: df-ascending shared-gram
      order (one small broadcast) and a driver-built candidate gram map
      for verification. Right when shared grams and candidates are
      near-dup-scale (deduped corpora, synthetic data).
    * ``"unbounded"`` — NOTHING driver-sized: hash-order prefixes (no
      shared-gram broadcast at all) and verification via two
      ``Dataset.join``s of the pair list against the streaming
      (doc_id, grams) table. Right for natural-language corpora where
      shared grams scale with vocabulary (ADVICE r2) — the engine's
      equivalent of the reference's big-big J4 join
      (/root/reference/src/osm_reader/street.rs:182-195).
    * ``"auto"`` (default) — bounded until a budget trips: the shared-gram
      broadcast is abandoned past ``broadcast_byte_budget`` and the
      candidate map past ``max_broadcast_pairs``; each independently
      falls back to its unbounded counterpart.

    ``concurrency`` caps the task parallelism of every map stage (and the
    shared-gram scan); default lets each stage scale with the upstream
    read."""
    from mimirsbrunn_ray.context import pool_size

    if mode not in ("auto", "bounded", "unbounded"):
        raise ValueError(f"unknown mode {mode!r}")
    mb_kwargs = {"concurrency": concurrency} if concurrency is not None else {}
    # thread the real id type into every empty-result table so string ids
    # unify with pair-bearing blocks (ADVICE r2)
    _schema = docs.schema()
    id_type = getattr(_schema, "base_schema", _schema).field("doc_id").type

    def _empty_result() -> pa.Table:
        return pa.table(
            {
                "doc_a": pa.array([], id_type),
                "doc_b": pa.array([], id_type),
                "jaccard": pa.array([], pa.float64()),
            }
        )
    # shipped-instance stages throughout (the MinHasher trade): every
    # stage's state is small and immutable, so task pools that scale with
    # the read beat fixed actor pools plus their startup cost.
    # Tokenize ONCE: the gram table is the single corpus-derived
    # intermediate; df scan, prefix emission, and verification gram sets
    # are all offset arithmetic over it (profiled 8.1 s -> the fused shape
    # at sf0.1; the old shape re-tokenized in three executions).
    gram_tbl = docs.map_batches(
        _GramTable(n), batch_format="pyarrow", batch_size=None, **mb_kwargs,
    ).materialize()
    if mode == "unbounded":
        shared = None
    else:
        # explicit bounded mode can't fall back, so its df merge must stay
        # distributed (driver sees only df >= 2 survivors); auto mode uses
        # the budgeted driver-pull fast path and falls back on a trip
        shared = _shared_grams(
            gram_tbl,
            byte_budget=None if mode == "bounded" else broadcast_byte_budget,
            distributed=(mode == "bounded"),
        )
    prefix = gram_tbl.map_batches(
        _PrefixGrams(threshold, shared),
        batch_format="pyarrow",
        batch_size=None,
        **mb_kwargs,
    )

    def bucketize(b: pa.Table) -> pa.Table:
        h = b["gram"].to_numpy(zero_copy_only=False).view(np.uint64)
        return b.append_column(
            "_b", pa.array((h % np.uint64(num_buckets)).astype(np.int32))
        )

    cand_pairs = (
        prefix.map_batches(bucketize, batch_format="pyarrow", batch_size=None)
        .groupby("_b")
        .map_groups(_pairs_in_bucket(threshold), batch_format="pandas")
    )

    def pair_dedup(b: pa.Table) -> pa.Table:
        # batch-local dedup only — a pair can be emitted by several
        # witness grams; cross-batch duplicates are verified redundantly
        # (cheap) and collapsed AFTER verification, when the set is tiny.
        # This trades a full pair shuffle for a little repeated work.
        # LOSSLESS dedup (lexsort on the actual ids, not a 64-bit pack —
        # a pack collision would silently drop a pair from an EXACT join).
        return b.take(pa.array(_unique_pair_rows(b)))

    pairs = cand_pairs.map_batches(
        pair_dedup, batch_format="pyarrow", batch_size=None
    ).materialize()
    n_pairs = pairs.count()
    if n_pairs == 0:
        return rd.from_arrow(_empty_result())

    use_join = (
        mode == "unbounded"
        or shared is None  # the budget already tripped once: stay unbounded
        or (mode == "auto" and n_pairs > max_broadcast_pairs)
    )
    if use_join:
        # UNBOUNDED verify: ship each pair through two hash-shuffle joins
        # against the binary-encoded (doc_id, grams) table — no driver-held
        # candidate set or gram map of any size
        gram_bin = gram_tbl.map_batches(
            _GramSets(None), batch_format="pyarrow", batch_size=None,
            **mb_kwargs,
        ).materialize()  # consumed by BOTH joins — don't recompute
        n_part = max(8, pool_size())
        # repartition squashes the schema-less empty blocks that bucketed
        # map_groups emits — one reaching a join partition crashes Acero
        # (the pipelines/late.py lesson)
        pairs_r = pairs.repartition(n_part)
        j1 = pairs_r.join(
            gram_bin, join_type="inner", num_partitions=n_part,
            on=("a",), right_on=("doc_id",),
        ).map_batches(
            lambda b: pa.table(
                {"a": b["a"], "b": b["b"], "grams_a": b["grams"]}
            ),
            batch_format="pyarrow", batch_size=None,
        ).repartition(n_part)  # squash the join's own schema-less empties
        j2 = j1.join(
            gram_bin, join_type="inner", num_partitions=n_part,
            on=("b",), right_on=("doc_id",),
        ).map_batches(
            lambda b: pa.table(
                {"a": b["a"], "b": b["b"], "grams_a": b["grams_a"],
                 "grams_b": b["grams"]}
            ),
            batch_format="pyarrow", batch_size=None,
        )
        verified = j2.map_batches(
            _VerifyJoined(threshold),
            batch_format="pyarrow", batch_size=None, **mb_kwargs,
        )
    else:
        # BOUNDED verify: candidate ids + gram map on the driver, bounded
        # by the candidate-pair count (near-dup scale, not corpus scale) —
        # same bounded-broadcast rule as stages/neardup.py
        cand_tbl = pa.concat_tables(
            list(pairs.iter_batches(batch_format="pyarrow"))
        )
        cand_ids = pa.compute.unique(
            pa.concat_arrays(
                [cand_tbl["a"].combine_chunks(), cand_tbl["b"].combine_chunks()]
            )
        )
        gram_rows = gram_tbl.map_batches(
            _GramSets(cand_ids), batch_format="pyarrow", batch_size=None,
            **mb_kwargs,
        )
        gram_map = {}
        for bt in gram_rows.iter_batches(batch_format="pyarrow"):
            ids = bt["doc_id"].to_numpy(zero_copy_only=False)
            for did, buf in zip(ids, bt["grams"].to_pylist()):
                gram_map[did] = np.frombuffer(buf or b"", dtype=np.int64)

        if n_pairs <= _DRIVER_VERIFY_PAIRS:
            # driver-local verify + dedup: the pair list AND the gram map
            # are already driver-held (both bounded by the candidate
            # count), so for SMALL candidate sets verifying here saves a
            # whole Ray execution's fixed cost — the same trade
            # stages/neardup.py makes in its driver cluster mode
            vt = _VerifyJaccard(gram_map, threshold)(cand_tbl)
            if vt.num_rows == 0:
                return rd.from_arrow(_empty_result())
            return rd.from_arrow(
                vt.take(pa.array(_unique_pair_rows(vt, "doc_a", "doc_b")))
            )
        # larger (but still broadcast-bounded) candidate sets: the
        # per-pair intersect work dominates the execution's fixed cost,
        # so spread it across the pool instead of serializing the driver
        verified = pairs.map_batches(
            _VerifyJaccard(gram_map, threshold),
            batch_format="pyarrow",
            batch_size=None,
            **mb_kwargs,
        )

    def final_dedup(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "doc_a" not in b.schema.names:
            return _empty_result()
        return b.take(pa.array(_unique_pair_rows(b, "doc_a", "doc_b")))

    # the verified set is the TRUE near-dup set (tiny); one coalesced
    # block collapses cross-batch duplicate witnesses
    return verified.repartition(1).map_batches(
        final_dedup, batch_format="pyarrow", batch_size=None
    )
