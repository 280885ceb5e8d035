"""Text analysis for training-data pipelines: token counting, quality
features, language-ID, document fingerprinting.

These are the target-side generalization of the reference's per-record
normalizers and label formatters (pure scalar functions in the map path,
/root/reference/src/labels.rs, src/utils.rs:37-53) — every operator is a
vectorized ``map_batches`` stage; the language-ID stage is an actor pool
(compiled regexes + stopword tables built once per actor, the ST1 pattern).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

# Minimal public stopword lists (top function words) per language.
STOPWORDS = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "it", "you", "that"},
    "de": {"der", "die", "und", "das", "ist", "du", "ich", "nicht", "ein", "zu"},
    "fr": {"le", "la", "et", "les", "des", "est", "un", "une", "que", "pas"},
    "es": {"el", "la", "de", "que", "y", "en", "un", "una", "es", "no"},
}


def token_stats(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Vectorized word/char/punct counts.

    Kept in lockstep with the SQL oracle: words = split on a single space
    (DuckDB string_split(text, ' ')), punct = chars in [.!,;:?].
    """
    text = batch[text_col]
    n_words = pc.list_value_length(pc.split_pattern(text, pattern=" ")).cast(
        pa.int64()
    )
    n_chars = pc.utf8_length(text).cast(pa.int64())
    n_punct = pc.count_substring_regex(text, pattern=r"[.!,;:?]").cast(pa.int64())
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "n_words": n_words,
            "n_chars": n_chars,
            "n_punct": n_punct,
        }
    )


class LangIdQuality:
    """Actor-pool stage: n-gram/stopword language ID + quality score +
    64-bit rolling-hash fingerprint per document.

    Setup (stopword lookup, compiled regex) happens once per actor.
    Heuristic (deterministic): CJK codepoints -> "zh"; else argmax stopword
    hit-ratio over the tables above; ties/no-hits -> "und".
    Quality score in [0,1]: blend of word count, mean word length sanity,
    punct ratio and stopword ratio (the weight-blend idiom of
    /root/reference/src/stops.rs:72-88).
    """

    def __init__(self):
        import re

        self.word_re = re.compile(r"[a-zA-Z']+")
        self.cjk_re = re.compile(r"[一-鿿]")
        self.tables = {lang: frozenset(ws) for lang, ws in STOPWORDS.items()}

    def _fingerprint(self, words: list) -> int:
        # polynomial rolling hash (Rabin-Karp) over words, 64-bit.
        # zlib.crc32 is process-independent (Python's hash() is salted).
        import zlib

        h = 1469598103934665603
        for w in words:
            h = (h * 1099511628211) & ((1 << 64) - 1)
            h ^= zlib.crc32(w.encode("utf-8"))
        return h & ((1 << 63) - 1)

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        langs, scores, fps = [], [], []
        for t in texts:
            t = t or ""
            if self.cjk_re.search(t):
                langs.append("zh")
                words = self.word_re.findall(t.lower())
            else:
                words = self.word_re.findall(t.lower())
                best, best_ratio = "und", 0.0
                for lang, table in self.tables.items():
                    hits = sum(1 for w in words if w in table)
                    ratio = hits / max(1, len(words))
                    if ratio > best_ratio:
                        best, best_ratio = lang, ratio
                langs.append(best if best_ratio > 0.02 else "und")
            n = len(words)
            mean_len = (sum(map(len, words)) / n) if n else 0.0
            punct = sum(t.count(c) for c in ".!,;:?")
            stop = sum(1 for w in words if w in self.tables["en"])
            q = (
                min(1.0, n / 50.0) * 0.4
                + (1.0 if 2.0 <= mean_len <= 12.0 else 0.3) * 0.3
                + min(1.0, 4.0 * punct / max(1, n)) * 0.1
                + min(1.0, 4.0 * stop / max(1, n)) * 0.2
            )
            scores.append(q)
            fps.append(self._fingerprint(words))
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "lang_pred": pa.array(langs, type=pa.string()),
                "quality": pa.array(np.round(scores, 6)),
                "fingerprint": pa.array(fps, type=pa.int64()),
            }
        )


class BpeishTokenCounter:
    """Actor-pool stage: token counts under a GPT-2-style pretokenizer.

    The public GPT-2 pretokenizer splits on contractions, letter runs,
    digit runs, punctuation runs, and whitespace; this is the ASCII-class
    approximation (Python ``re`` lacks \\p{L}), compiled once per actor.
    Output: doc_id, n_ws_tokens (plain whitespace), n_bpe_tokens.
    """

    def __init__(self):
        import re

        self.pat = re.compile(
            r"'(?:[sdmt]|ll|ve|re)| ?[A-Za-z]+| ?[0-9]+"
            r"| ?[^\sA-Za-z0-9]+|\s+(?!\S)|\s+"
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        ws = np.array([len((t or "").split()) for t in texts], dtype=np.int64)
        bpe = np.array(
            [len(self.pat.findall(t or "")) for t in texts], dtype=np.int64
        )
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_ws_tokens": pa.array(ws),
                "n_bpe_tokens": pa.array(bpe),
            }
        )


def bpeish_token_counts(ds: "rd.Dataset", concurrency=None) -> "rd.Dataset":
    # shipped-instance task pool: the stage state is ONE compiled regex —
    # actor-pool startup costs more than the state build saves (see
    # stages/neardup.py for the same trade); the task pool also scales
    # elastically with the upstream read instead of a fixed actor count
    kwargs = {"concurrency": concurrency} if concurrency is not None else {}
    return ds.map_batches(
        BpeishTokenCounter(),
        batch_format="pyarrow",
        batch_size=None,
        **kwargs,
    )


def text_features(ds: "rd.Dataset", concurrency=None) -> "rd.Dataset":
    kwargs = {"concurrency": concurrency} if concurrency is not None else {}
    return ds.map_batches(
        LangIdQuality(),
        batch_format="pyarrow",
        batch_size=None,
        **kwargs,
    )


def deterministic_stratified_sample(
    ds: "rd.Dataset",
    key_col: str,
    id_col: str,
    fractions: dict,
    default_frac: float = 0.0,
    modulus: int = 10_000,
) -> "rd.Dataset":
    """Per-stratum deterministic sampling — the training-mixture operator:
    keep each row iff
    ``((abs(id) % 2^31) * KNUTH) % modulus < frac(stratum) * modulus``.

    Pure arithmetic on the row id (Knuth multiplicative hash; the id is
    first folded into [0, 2^31) so the product stays inside int64 for ANY
    id and any SQL engine reproduces it bit-exactly — no wraparound, no
    engine-specific modulo sign), so the sample is
    stable across runs, engines, partitionings, and cluster sizes — no
    RNG state, no coordination, embarrassingly parallel. Resampling with
    a larger fraction is a SUPERSET of the smaller sample (thresholding
    one fixed score), the property training-data curricula rely on.
    """
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    knuth = 2_654_435_761
    cut = {k: int(round(f * modulus)) for k, f in fractions.items()}
    default_cut = int(round(default_frac * modulus))

    def fn(b: pa.Table) -> pa.Table:
        id_arr = b[id_col].cast(pa.int64())
        ids = pc.fill_null(id_arr, -1).to_numpy(zero_copy_only=False)
        folded = np.abs(ids) % np.int64(2**31)
        score = (folded * knuth) % modulus
        # vectorized per-stratum threshold via dictionary encoding; null
        # keys get the default fraction (fill_null keeps indices integer)
        arr = b[key_col].combine_chunks().dictionary_encode()
        thr_by_code = np.concatenate(
            [
                np.asarray(
                    [cut.get(v, default_cut)
                     for v in arr.dictionary.to_pylist()],
                    dtype=np.int64,
                ),
                [default_cut],  # slot for null keys
            ]
        )
        idx = pc.fill_null(arr.indices, len(thr_by_code) - 1).to_numpy(
            zero_copy_only=False
        )
        thr = thr_by_code[idx]
        keep = (score < thr) & ~pc.is_null(id_arr).to_numpy(
            zero_copy_only=False
        )
        return b.filter(pa.array(keep))

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=None)


def chunk_documents(
    ds: "rd.Dataset", cap: int = 512, text_col: str = "text"
) -> "rd.Dataset":
    """Context-window chunking: split each document's token span into
    fixed-size chunks of <= ``cap`` tokens, emitting one row per chunk
    (doc_id, chunk_id, chunk_len) — the flat-map expansion an embedding /
    RAG pipeline runs before batched inference. Tokens follow the
    token_stats convention (split on single space) so the SQL oracle
    (LATERAL generate_series) states the identical arithmetic.

    Fully vectorized expansion: np.repeat for the doc index, offset
    arithmetic for per-chunk ids — no per-row loop, rows-in to rows-out
    ratio bounded by max_doc_tokens/cap."""

    def fn(b: pa.Table) -> pa.Table:
        n_tok = (
            pc.list_value_length(pc.split_pattern(b[text_col], pattern=" "))
            .cast(pa.int64())
            .to_numpy(zero_copy_only=False)
        )
        n_chunks = np.maximum(1, -(-n_tok // cap))  # ceil, min one chunk
        total = int(n_chunks.sum())
        doc_idx = np.repeat(np.arange(len(n_tok)), n_chunks)
        starts = np.concatenate(([0], np.cumsum(n_chunks)[:-1]))
        chunk_id = np.arange(total) - np.repeat(starts, n_chunks)
        last = chunk_id == np.repeat(n_chunks - 1, n_chunks)
        lens = np.where(
            last,
            np.repeat(n_tok - (n_chunks - 1) * cap, n_chunks),
            cap,
        )
        ids = b["doc_id"].combine_chunks() if isinstance(
            b["doc_id"], pa.ChunkedArray
        ) else b["doc_id"]
        return pa.table(
            {
                "doc_id": ids.take(pa.array(doc_idx)),
                "chunk_id": pa.array(chunk_id.astype(np.int64)),
                "chunk_len": pa.array(lens.astype(np.int64)),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=None)


def pack_sequences(
    ds: "rd.Dataset",
    group_col: str,
    cap: int = 2048,
    text_col: str = "text",
) -> "rd.Dataset":
    """Greedy sequence packing — concatenate documents (in doc_id order,
    independently per ``group_col`` corpus) into training sequences of
    <= ``cap`` tokens; a document larger than ``cap`` gets a pack of its
    own. The per-group determinism makes the output independent of block
    boundaries (same packing whatever the read parallelism).

    Emits one row per pack: (group, pack_id, n_docs, pack_tokens,
    first_doc_id). The in-group scan loops over PACKS, not rows: each
    pack boundary is one np.searchsorted on the token cumsum
    (O(n_packs * log n_docs) per group)."""

    def pack_group(g: "pd.DataFrame") -> "pd.DataFrame":
        g = g.sort_values("doc_id", kind="mergesort")
        tok = g["n_tok"].to_numpy()
        ids = g["doc_id"].to_numpy()
        cs = np.cumsum(tok)
        rows = []
        start, base, pack_id = 0, 0, 0
        n = len(tok)
        while start < n:
            j = int(np.searchsorted(cs, base + cap, side="right"))
            if j <= start:  # single doc exceeds cap: it packs alone
                j = start + 1
            rows.append(
                (
                    g[group_col].iat[0],
                    pack_id,
                    j - start,
                    int(cs[j - 1] - base),
                    ids[start],
                )
            )
            base = int(cs[j - 1])
            start = j
            pack_id += 1
        return pd.DataFrame(
            rows,
            columns=[group_col, "pack_id", "n_docs", "pack_tokens",
                     "first_doc_id"],
        )

    def with_tok(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": b["doc_id"],
                group_col: b[group_col],
                "n_tok": pc.list_value_length(
                    pc.split_pattern(b[text_col], pattern=" ")
                ).cast(pa.int64()),
            }
        )

    return (
        ds.map_batches(with_tok, batch_format="pyarrow", batch_size=None)
        .groupby(group_col)
        .map_groups(pack_group, batch_format="pandas")
    )


# ---------------------------------------------------------------------------
# TF-IDF top terms — the corpus-statistic weighting every retrieval /
# quality-filtering pipeline computes (the A1 join-then-project-weight
# family of the reference, /root/reference/src/admin.rs weight derivation,
# generalized from a broadcast dimension to a corpus-derived statistic).


def _doc_token_codes(texts, text_col_hint: str = "text"):
    """Batch tokenizer shared by the tf and df stages: lowercase, split on
    single spaces (the token_stats / oracle convention), drop empty tokens
    (consecutive spaces, null text). Returns (codes int64[], vocab
    StringArray, doc_idx int64[]) where ``codes`` index into ``vocab`` —
    dictionary-encoded so the per-doc counting is pure integer work."""
    lowered = pc.utf8_lower(pc.fill_null(texts, ""))
    words = pc.split_pattern(lowered, " ")
    flat = words.combine_chunks() if isinstance(words, pa.ChunkedArray) else words
    offsets = flat.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    counts = np.diff(offsets)
    doc_idx = np.repeat(np.arange(len(counts), dtype=np.int64), counts)
    enc = pc.dictionary_encode(flat.values)
    codes = np.asarray(enc.indices.to_numpy(zero_copy_only=False), dtype=np.int64)
    vocab = enc.dictionary
    nonempty = pc.not_equal(vocab, "").to_numpy(zero_copy_only=False)
    keep = nonempty[codes] if len(codes) else np.empty(0, bool)
    return codes[keep], vocab, doc_idx[keep]


def _distinct_doc_token(codes: np.ndarray, doc_idx: np.ndarray, n_vocab: int):
    """Distinct (doc, token) pairs with occurrence counts — one np.unique
    over a packed int64 key (doc * |vocab| + code; both batch-local)."""
    key = doc_idx * np.int64(max(n_vocab, 1)) + codes
    uk, cnt = np.unique(key, return_counts=True)
    return uk // np.int64(max(n_vocab, 1)), uk % np.int64(max(n_vocab, 1)), cnt


class _TfRows:
    """map_batches stage: (doc_id, text) -> (doc_id, token, tf) rows."""

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col

    def __call__(self, b: pa.Table) -> pa.Table:
        ids = b["doc_id"].combine_chunks() if isinstance(
            b["doc_id"], pa.ChunkedArray
        ) else b["doc_id"]
        codes, vocab, doc_idx = _doc_token_codes(b[self.text_col])
        if len(codes) == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], ids.type),
                    "token": pa.array([], pa.string()),
                    "tf": pa.array([], pa.int64()),
                }
            )
        d_i, c_i, tf = _distinct_doc_token(codes, doc_idx, len(vocab))
        return pa.table(
            {
                "doc_id": ids.take(pa.array(d_i)),
                "token": vocab.take(pa.array(c_i)),
                "tf": pa.array(tf.astype(np.int64)),
            }
        )


class _TokenDfPartial:
    """map_batches stage: per-batch PARTIAL document frequencies —
    one (token, n) row per distinct token per batch (associatively
    summable; a doc never spans batches so partials never double-count)."""

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col

    def __call__(self, b: pa.Table) -> pa.Table:
        codes, vocab, doc_idx = _doc_token_codes(b[self.text_col])
        if len(codes) == 0:
            return pa.table(
                {"token": pa.array([], pa.string()),
                 "n": pa.array([], pa.int64())}
            )
        _d, c_i, _cnt = _distinct_doc_token(codes, doc_idx, len(vocab))
        uc, n = np.unique(c_i, return_counts=True)
        return pa.table(
            {"token": vocab.take(pa.array(uc)),
             "n": pa.array(n.astype(np.int64))}
        )


def _idf_x1e6(n_docs: int, df: np.ndarray) -> np.ndarray:
    """Fixed-point idf shared by both modes and stated verbatim in the SQL
    oracle: FLOOR(ln(N/df) * 1e6 + 0.5) — half-up rounding (np.round's
    half-to-even would diverge from SQL ROUND semantics)."""
    return np.floor(
        np.log(float(n_docs) / df.astype(np.float64)) * 1e6 + 0.5
    ).astype(np.int64)


class _ScoreBounded:
    """Fused tf+score stage (bounded mode): tokenize, count tf, resolve
    each token's idf from the broadcast vocabulary via a hash-based
    get_indexer — one stage, no tf-rows materialization."""

    def __init__(self, vocab_idx, idf: np.ndarray, text_col: str):
        self.vocab_idx = vocab_idx  # pd.Index over every corpus token
        self.idf = idf
        self.tf = _TfRows(text_col)

    def __call__(self, b: pa.Table) -> pa.Table:
        t = self.tf(b)
        if t.num_rows == 0:
            return pa.table(
                {
                    "doc_id": t["doc_id"],
                    "token": t["token"],
                    "score_x1e6": pa.array([], pa.int64()),
                }
            )
        pos = self.vocab_idx.get_indexer(t["token"].to_pandas())
        # every token comes from the same corpus the df scan covered
        assert (pos >= 0).all(), "token missing from df vocabulary"
        score = t["tf"].to_numpy() * self.idf[pos]
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "token": t["token"],
                "score_x1e6": pa.array(score.astype(np.int64)),
            }
        )


def tfidf_top_terms(
    ds: "rd.Dataset",
    k: int = 3,
    text_col: str = "text",
    mode: str = "auto",
    broadcast_byte_budget: int = 256 << 20,
    concurrency=None,
) -> "rd.Dataset":
    """Per-document top-``k`` TF-IDF terms: score = tf * idf_x1e6 with
    idf_x1e6 = FLOOR(ln(N/df)*1e6 + 0.5) (fixed-point so the SQL oracle
    hashes identically), ties broken by token ascending.

    ``mode`` picks the scale shape (IDENTICAL output, pytest-asserted):

    * ``"bounded"`` — df partials tree-merged and broadcast as a driver
      vocabulary (pd.Index + idf array); one fused tokenize+tf+score pass,
      then the grouped_top_k prune+shuffle. Two tokenize passes, two
      executions — right while the vocabulary fits the byte budget.
    * ``"unbounded"`` — NOTHING vocabulary-sized on the driver: tf rows
      joined against a shuffled df table (``Dataset.join`` on token), the
      engine's big-big join discipline (stages/simjoin.py unbounded path).
    * ``"auto"`` — bounded until the drained vocabulary exceeds
      ``broadcast_byte_budget``, then the join path.
    """
    from mimirsbrunn_ray.context import pool_size
    from mimirsbrunn_ray.stages.rollup import tree_merge
    from mimirsbrunn_ray.stages.search import grouped_top_k

    if mode not in ("auto", "bounded", "unbounded"):
        raise ValueError(f"unknown mode {mode!r}")
    mb_kwargs = {"concurrency": concurrency} if concurrency is not None else {}
    n_docs = ds.count()  # parquet metadata fast path on read datasets

    def combine(b: pa.Table) -> pa.Table:
        g = b.group_by(["token"]).aggregate([("n", "sum")])
        return g.rename_columns(["token", "n"])

    vocab_idx = None
    if mode != "unbounded":
        partials = ds.map_batches(
            _TokenDfPartial(text_col), batch_format="pyarrow",
            batch_size=None, **mb_kwargs,
        )
        merged = tree_merge(partials, combine)
        toks, dfs, total = [], [], 0
        for bt in merged.iter_batches(batch_format="pyarrow"):
            total += bt.nbytes
            if mode == "auto" and total > broadcast_byte_budget:
                toks = None  # budget tripped: fall back to the join path
                break
            toks.append(bt["token"].to_pandas())
            dfs.append(bt["n"].to_numpy(zero_copy_only=False))
        if toks is not None:
            vocab = (
                pd.concat(toks, ignore_index=True)
                if toks else pd.Series([], dtype=object)
            )
            vocab_idx = pd.Index(vocab)
            idf = _idf_x1e6(
                n_docs,
                np.concatenate(dfs) if dfs else np.empty(0, np.int64),
            )

    if vocab_idx is not None:
        scored = ds.map_batches(
            _ScoreBounded(vocab_idx, idf, text_col),
            batch_format="pyarrow", batch_size=None, **mb_kwargs,
        )
    else:
        # unbounded: tf rows x df table via a hash-shuffle join on token
        n_part = max(8, pool_size())
        tf_rows = ds.map_batches(
            _TfRows(text_col), batch_format="pyarrow", batch_size=None,
            **mb_kwargs,
        ).repartition(n_part)  # squash empty blocks before Acero (late.py lesson)
        df_tbl = tree_merge(
            ds.map_batches(
                _TokenDfPartial(text_col), batch_format="pyarrow",
                batch_size=None, **mb_kwargs,
            ),
            combine,
            final_shards=n_part,
            shard_cols=["token"],
        ).repartition(n_part)
        joined = tf_rows.join(
            df_tbl, join_type="inner", num_partitions=n_part,
            on=("token",),
        )

        def score(b: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "doc_id": b["doc_id"],
                    "token": b["token"],
                    "score_x1e6": pa.array(
                        b["tf"].to_numpy()
                        * _idf_x1e6(
                            n_docs, b["n"].to_numpy(zero_copy_only=False)
                        )
                    ),
                }
            )

        scored = joined.map_batches(
            score, batch_format="pyarrow", batch_size=None
        )

    return grouped_top_k(
        scored, ["doc_id"], "score_x1e6", k=k, descending=True,
        tiebreak_cols=["token"], num_buckets=64,
    )


def repetition_scores(ds: "rd.Dataset", n: int = 2) -> "rd.Dataset":
    """Gopher-style repetition quality signal: per document, the fraction
    of word-n-gram occurrences taken by the single most frequent n-gram
    (Rae et al. 2021's "top n-gram fraction" family — high values flag
    boilerplate/spam for training-data filtering).

    Output: doc_id, n_grams int64 (total n-gram occurrences), top_gram_n
    int64 (count of the most frequent one), top_frac_x1e6 int64
    (ROUND(top * 1e6 / total) — the engine's fixed-point float
    convention). Documents with fewer than ``n`` words emit nothing (no
    n-grams exist; the oracle's len(w) >= n filter matches).

    Purely per-batch (embarrassingly parallel, no shuffle): one lexsort
    per batch over the NON-deduplicated gram stream, run-length counts,
    and two ``reduceat`` reductions per doc segment. Grams are compared
    as 64-bit hashes (simjoin's collision-bound caveat applies: a
    cross-gram collision within one doc merges two counts — probability
    ~g^2/2^65 per doc, negligible below ~10^8 grams per doc).
    """
    from mimirsbrunn_ray.stages.simjoin import word_ngram_hashes

    def fn(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].combine_chunks() if isinstance(
            b["doc_id"], pa.ChunkedArray
        ) else b["doc_id"]
        g, d = word_ngram_hashes(b["text"], n)
        if len(g) == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], ids.type),
                    "n_grams": pa.array([], pa.int64()),
                    "top_gram_n": pa.array([], pa.int64()),
                    "top_frac_x1e6": pa.array([], pa.int64()),
                }
            )
        order = np.lexsort((g, d))
        gs, ds_ = g[order], d[order]
        new_run = np.ones(len(gs), dtype=bool)
        new_run[1:] = (gs[1:] != gs[:-1]) | (ds_[1:] != ds_[:-1])
        run_starts = np.flatnonzero(new_run)
        run_counts = np.diff(np.append(run_starts, len(gs)))
        run_docs = ds_[run_starts]
        doc_start = np.ones(len(run_docs), dtype=bool)
        doc_start[1:] = run_docs[1:] != run_docs[:-1]
        seg_starts = np.flatnonzero(doc_start)
        tops = np.maximum.reduceat(run_counts, seg_starts)
        totals = np.add.reduceat(run_counts, seg_starts)
        # SQL ROUND is half away from zero; values here are positive
        frac = np.floor(
            tops.astype(np.float64) * 1e6 / totals + 0.5
        ).astype(np.int64)
        return pa.table(
            {
                "doc_id": ids.take(pa.array(run_docs[seg_starts])),
                "n_grams": pa.array(totals.astype(np.int64)),
                "top_gram_n": pa.array(tops.astype(np.int64)),
                "top_frac_x1e6": pa.array(frac),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=None)


def contaminated_doc_ids(
    docs: "rd.Dataset",
    benchmark: "rd.Dataset",
    n: int = 2,
    min_hits: int = 3,
) -> "rd.Dataset":
    """Benchmark decontamination scan: corpus documents sharing at least
    ``min_hits`` distinct word-n-grams with the benchmark set — the
    n-gram-overlap rule large training pipelines use to drop eval
    contamination before training. Output: (doc_id, n_hits int64).

    Shape: the benchmark side is SMALL BY DEFINITION (an eval suite), so
    its distinct gram hashes are collected once and shipped sorted in the
    task spec (the broadcast small-side rule, J1); the corpus pass is one
    ``map_batches`` doing a vectorized ``searchsorted`` membership test
    per distinct gram and a per-doc segment count — no shuffle, no
    per-row loop. Grams are 64-bit hashes (the simjoin collision-bound
    caveat: collisions can only ADD phantom hits, never hide real
    overlap, so the scan stays a superset of true contamination).
    """
    from mimirsbrunn_ray.stages.simjoin import (
        _distinct_sorted_per_doc,
        word_ngram_hashes,
    )

    bench_chunks = []
    for bt in benchmark.map_batches(
        lambda b: pa.table(
            {
                "gram": pa.array(
                    np.unique(word_ngram_hashes(b["text"], n)[0]).view(np.int64)
                )
            }
        ),
        batch_format="pyarrow",
        batch_size=None,
    ).iter_batches(batch_format="pyarrow"):
        bench_chunks.append(bt["gram"].to_numpy(zero_copy_only=False))
    # view as uint64 BEFORE unique: sorting the int64 view puts negative
    # reinterpretations first, leaving the uint64 view UNSORTED and every
    # searchsorted probe below wrong
    bench = (
        np.unique(np.concatenate(bench_chunks).view(np.uint64))
        if bench_chunks
        else np.empty(0, np.uint64)
    )

    def scan(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].combine_chunks() if isinstance(
            b["doc_id"], pa.ChunkedArray
        ) else b["doc_id"]
        grams, doc_idx = word_ngram_hashes(b["text"], n)
        if len(grams) == 0 or len(bench) == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], ids.type),
                    "n_hits": pa.array([], pa.int64()),
                }
            )
        g, d, _rank, _size = _distinct_sorted_per_doc(grams, doc_idx)
        pos = np.searchsorted(bench, g)
        posc = np.clip(pos, 0, len(bench) - 1)
        hit = (bench[posc] == g).astype(np.int64)
        hits = np.bincount(d, weights=hit, minlength=b.num_rows).astype(
            np.int64
        )
        keep = hits >= min_hits
        return pa.table(
            {
                "doc_id": ids.filter(pa.array(keep)),
                "n_hits": pa.array(hits[keep]),
            }
        )

    return docs.map_batches(scan, batch_format="pyarrow", batch_size=None)


def redact_terms(
    ds: "rd.Dataset",
    pattern: str,
    replacement: str = "<REDACTED>",
    text_col: str = "text",
    id_col: str = "doc_id",
    keep_cols: list | None = None,
) -> "rd.Dataset":
    """PII / policy-term scrubbing: replace every regex match in the text
    column and count the replacements per document — the redaction pass
    (emails, phone numbers, license-plate strings, banned terms) every
    training-data pipeline runs before publishing a corpus. The scalar-fn
    inventory analog of the reference's per-record normalizers
    (/root/reference/src/utils.rs:37-53) applied to content, not labels.

    Fully vectorized RE2 over Arrow buffers (pc.replace_substring_regex /
    pc.count_substring_regex — one compiled automaton per batch, zero
    Python-level row loops) and embarrassingly parallel: no shuffle, no
    state, so it streams at any corpus size. Null text stays null with a
    null count (SQL regexp_replace semantics).

    Output: (id_col, *keep_cols, text_redacted string, n_redacted int64).
    """

    def fn(b: pa.Table) -> pa.Table:
        text = b[text_col]
        n = pc.count_substring_regex(text, pattern=pattern).cast(pa.int64())
        red = pc.replace_substring_regex(
            text, pattern=pattern, replacement=replacement
        )
        out = {id_col: b[id_col]}
        for c in keep_cols or []:
            out[c] = b[c]
        out["text_redacted"] = red
        out["n_redacted"] = n
        return pa.table(out)

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=None)


def unigram_logprob_scores(
    docs: "rd.Dataset",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> "rd.Dataset":
    """CCNet-style unigram language-model scoring: fit a unigram LM on the
    corpus itself (one distributed count pass), then score every document
    by its total negative log-likelihood — the perplexity-bucket quality
    signal Wenzek et al. 2020 (CCNet) use to keep/drop web text before
    LLM training.

    Two passes, both shuffle-free on the document side:
      1. per-batch word counts -> tree-merged (key space = VOCABULARY,
         not rows; for open web-scale vocabularies prune with a min-df
         cut or a Misra-Gries candidate pass first, stages/sketch.py) ->
         a driver-held (word -> count) table;
      2. the log-prob table ships sorted in the task spec (broadcast
         small-side rule, J1) and each batch scores via one searchsorted
         per word occurrence — vectorized, partition-independent.

    Per-word scores are FIXED-POINT int64 micro-nats
    (round(-ln(count/total) * 1e6), half away from zero) so the per-doc
    sum is integer arithmetic — order-independent, bit-reproducible on
    any engine, cluster size, or partitioning (the engine's float-parity
    convention). Docs with null text are omitted (SQL UNNEST(NULL)
    semantics); empty-string tokens count like any token.

    Output: (id_col, n_tokens int64, sum_neglogp_x1e6 int64).
    """
    from mimirsbrunn_ray.stages.rollup import tree_merge

    def count_partial(b: pa.Table) -> pa.Table:
        words = pc.split_pattern(b[text_col], pattern=" ")
        flat = pc.list_flatten(words)
        t = pa.table({"w": flat})
        g = t.group_by(["w"]).aggregate([([], "count_all")])
        return g.rename_columns(["w", "c"])

    def combine(b: pa.Table) -> pa.Table:
        g = b.group_by(["w"]).aggregate([("c", "sum")])
        return g.rename_columns(["w", "c"])

    parts = list(
        tree_merge(
            docs.map_batches(
                count_partial, batch_format="pyarrow", batch_size=None
            ),
            combine,
        ).iter_batches(batch_format="pyarrow")
    )
    empty = pa.table(
        {
            id_col: pa.array([], pa.int64()),
            "n_tokens": pa.array([], pa.int64()),
            "sum_neglogp_x1e6": pa.array([], pa.int64()),
        }
    )
    if not parts:
        return rd.from_arrow(empty)
    freq = pa.concat_tables(parts)
    vocab_arr = freq["w"].combine_chunks()
    counts = freq["c"].to_numpy(zero_copy_only=False).astype(np.float64)
    total = counts.sum()
    # half-away rounding (SQL ROUND); -ln(c/n) >= 0 so +0.5-floor suffices
    lp = np.floor(-np.log(counts / total) * 1e6 + 0.5).astype(np.int64)

    def score(b: pa.Table) -> pa.Table:
        text = b[text_col]
        valid = pc.is_valid(text).to_numpy(zero_copy_only=False)
        if not valid.any():
            return empty.cast(
                pa.schema(
                    [
                        (id_col, b[id_col].type),
                        ("n_tokens", pa.int64()),
                        ("sum_neglogp_x1e6", pa.int64()),
                    ]
                )
            )
        kept = b.filter(pa.array(valid))
        words = pc.split_pattern(kept[text_col], pattern=" ")
        lens = pc.list_value_length(words).to_numpy(zero_copy_only=False)
        offsets = np.concatenate(([0], np.cumsum(lens)))
        flat = pc.list_flatten(words)
        # vectorized C-level hash lookup against the broadcast vocabulary
        # (corpus-fit: every token is present by construction; an
        # external-LM variant would map index_in nulls to -ln(1/total))
        pos = pc.index_in(flat, value_set=vocab_arr).to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        w_lp = lp[pos]
        sums = (
            np.add.reduceat(np.append(w_lp, 0), offsets[:-1])
            if len(w_lp)
            else np.zeros(len(kept), np.int64)
        )
        # split always yields >= 1 token, so no empty reduceat segments
        n_tok = np.diff(offsets)
        return pa.table(
            {
                id_col: kept[id_col],
                "n_tokens": pa.array(n_tok.astype(np.int64)),
                "sum_neglogp_x1e6": pa.array(sums.astype(np.int64)),
            }
        )

    return docs.map_batches(score, batch_format="pyarrow", batch_size=None)


def normalize_text(
    ds: "rd.Dataset",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> "rd.Dataset":
    """Canonical text normalization — the pass every dedup/fingerprint
    stage should see first, so byte-different renderings of the same
    content collapse: Unicode NFC -> lowercase -> whitespace runs to one
    space -> trim. All four steps are single Arrow C++ kernels over the
    batch (utf8_normalize / utf8_lower / replace_substring_regex /
    utf8_trim_whitespace); no shuffle, no Python rows; nulls stay null.

    Output: (id_col, text_norm string, changed bool — whether
    normalization altered the value; the "how dirty is this corpus"
    counter aggregates it).
    """

    def fn(b: pa.Table) -> pa.Table:
        t = b[text_col]
        norm = pc.utf8_trim_whitespace(
            pc.replace_substring_regex(
                pc.utf8_lower(pc.utf8_normalize(t, form="NFC")),
                pattern=r"\s+",
                replacement=" ",
            )
        )
        return pa.table(
            {
                id_col: b[id_col],
                "text_norm": norm,
                "changed": pc.not_equal(norm, t),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=None)


def levenshtein_matrix(words: list[str], term: str) -> np.ndarray:
    """Exact Levenshtein distance of every word to ``term``, vectorized
    ACROSS the word batch: the classic DP iterates term-chars x word-cols
    (a few dozen scalar steps), each step an O(n_words) vector op — no
    per-word Python loop. Unicode-safe via codepoint arrays."""
    n = len(words)
    if n == 0:
        return np.zeros(0, np.int64)
    cps = [np.array([ord(c) for c in w], dtype=np.int64) for w in words]
    lens = np.array([len(c) for c in cps], dtype=np.int64)
    maxlen = int(lens.max()) if n else 0
    wmat = np.full((n, maxlen), -1, np.int64)
    for i, c in enumerate(cps):  # batch-build of the padded matrix
        wmat[i, : len(c)] = c
    t = np.array([ord(c) for c in term], dtype=np.int64)
    m = len(t)
    prev = np.tile(np.arange(maxlen + 1, dtype=np.int64), (n, 1))
    cur = np.empty_like(prev)
    for i in range(1, m + 1):
        cur[:, 0] = i
        for j in range(1, maxlen + 1):
            sub = prev[:, j - 1] + (wmat[:, j - 1] != t[i - 1])
            cur[:, j] = np.minimum(
                np.minimum(prev[:, j] + 1, cur[:, j - 1] + 1), sub
            )
        prev, cur = cur, prev
    return prev[np.arange(n), lens]


def best_lexicon_match(words: list[str], lexicon: list[str]):
    """(best_term, dist) per word: minimum Levenshtein over the lexicon,
    ties to the lexicographically smallest term (deterministic,
    engine-independent)."""
    n = len(words)
    best_d = np.full(n, np.iinfo(np.int64).max, np.int64)
    best_t = np.array([""] * n, dtype=object)
    for term in sorted(lexicon):  # sorted -> first win IS the tiebreak
        d = levenshtein_matrix(words, term)
        better = d < best_d
        best_d[better] = d[better]
        best_t[better] = term
    return best_t, best_d
# NB: levenshtein_matrix is CODEPOINT-based; DuckDB's levenshtein() is
# byte-based, so they differ on multi-byte UTF-8 (tests pin both).


def weighted_sample(
    ds: "rd.Dataset",
    k: int,
    weight_col: str,
    id_col: str = "doc_id",
    seed: int = 7,
    keep_cols: tuple = (),
) -> "rd.Dataset":
    """Weighted random sample WITHOUT REPLACEMENT of k rows, inclusion
    probability proportional to weight — Efraimidis-Spirakis A-ExpJ
    (2006): each row gets key = u^(1/w) with u in (0,1); the sample is
    the global top-k by key. u derives from a seeded hash of the row id,
    so the sample is DETERMINISTIC and independently recomputable (the
    pytest recomputes it brute-force), yet distributionally correct
    across seeds.

    Scale shape: keys are one vectorized hash per batch; each batch keeps
    its local top-k (partial prune), a tree merge resolves the global
    top-k — no shuffle, no sort of the corpus, driver never sees more
    than k x blocks-per-merge rows. Null/non-positive weights and null
    ids are excluded (they have zero inclusion probability).
    """
    from mimirsbrunn_ray.stages.dedup import _hash64
    from mimirsbrunn_ray.stages.rollup import tree_merge

    mix = np.uint64(0x9E3779B97F4A7C15) * np.uint64(2 * seed + 1)

    def keyed(b: pa.Table) -> pa.Table:
        b = b.filter(
            pc.and_(
                pc.and_(pc.is_valid(b[id_col]), pc.is_valid(b[weight_col])),
                pc.greater(b[weight_col].cast(pa.float64()), 0.0),
            )
        )
        h = _hash64(b[id_col]) * mix
        h ^= h >> np.uint64(33)
        # u in (0,1): 53 mantissa bits, never exactly 0 (the +1)
        u = ((h >> np.uint64(11)).astype(np.float64) + 1.0) / float(1 << 53)
        w = b[weight_col].cast(pa.float64()).to_numpy(zero_copy_only=False)
        key = np.log(u) / w  # monotone transform of u^(1/w): argmax equal
        cols = {id_col: b[id_col], weight_col: b[weight_col],
                "_key": pa.array(key)}
        for c in keep_cols:
            cols[c] = b[c]
        t = pa.table(cols)
        order = pc.sort_indices(
            t, sort_keys=[("_key", "descending"), (id_col, "ascending")]
        )
        return t.take(order[:k])

    def combine(b: pa.Table) -> pa.Table:
        order = pc.sort_indices(
            b, sort_keys=[("_key", "descending"), (id_col, "ascending")]
        )
        return b.take(order[:k])

    merged = tree_merge(
        ds.map_batches(keyed, batch_format="pyarrow", batch_size=None),
        combine,
    )
    return merged.map_batches(
        lambda b: b.drop_columns(["_key"]),
        batch_format="pyarrow",
        batch_size=None,
    )


def jaro_winkler_vector(sa: list[str], sb: list[str]) -> np.ndarray:
    """Vectorized Jaro-Winkler similarity for N string PAIRS, matching
    DuckDB's jaro_winkler_similarity semantics exactly (verified by a
    randomized differential pytest): greedy window matching, integer
    floor of half-transpositions, unconditional-order float formula
    ((m/l1 + m/l2 + (m-t)/m) / 3), Winkler prefix boost (p=0.1, prefix
    cap 4) only when jaro > 0.7. The double loop is over CHARACTER
    POSITIONS (LA x LB vector steps, each O(n) across pairs) — no
    per-pair Python loop, the levenshtein_matrix discipline."""
    n = len(sa)
    if n == 0:
        return np.zeros(0, np.float64)
    ca = [np.array([ord(c) for c in s], dtype=np.int64) for s in sa]
    cb = [np.array([ord(c) for c in s], dtype=np.int64) for s in sb]
    la = np.array([len(c) for c in ca], dtype=np.int64)
    lb = np.array([len(c) for c in cb], dtype=np.int64)
    LA = int(la.max()) if n else 0
    LB = int(lb.max()) if n else 0
    A = np.full((n, max(LA, 1)), -1, np.int64)
    B = np.full((n, max(LB, 1)), -2, np.int64)
    for i, c in enumerate(ca):
        A[i, : len(c)] = c
    for i, c in enumerate(cb):
        B[i, : len(c)] = c
    w = np.maximum(np.maximum(la, lb) // 2 - 1, 0)
    matchedA = np.zeros((n, max(LA, 1)), bool)
    matchedB = np.zeros((n, max(LB, 1)), bool)
    for i in range(LA):
        found = np.zeros(n, bool)
        lo = i - w
        hi = i + w
        for j in range(LB):
            cond = (
                (~found)
                & (i < la)
                & (j < lb)
                & (j >= lo)
                & (j <= hi)
                & (~matchedB[:, j])
                & (A[:, i] == B[:, j])
            )
            matchedB[:, j] |= cond
            found |= cond
        matchedA[:, i] = found
    m = matchedA.sum(1).astype(np.int64)
    maxm = int(m.max()) if n else 0
    if maxm == 0:
        return np.zeros(n, np.float64)
    aseq = np.full((n, maxm), -1, np.int64)
    bseq = np.full((n, maxm), -1, np.int64)
    idxA = np.cumsum(matchedA, axis=1) - 1
    r, c = np.nonzero(matchedA)
    aseq[r, idxA[r, c]] = A[r, c]
    idxB = np.cumsum(matchedB, axis=1) - 1
    r, c = np.nonzero(matchedB)
    bseq[r, idxB[r, c]] = B[r, c]
    half = ((aseq != bseq) & (aseq != -1)).sum(1).astype(np.int64)
    t = half // 2
    safe_m = np.where(m > 0, m, 1).astype(np.float64)
    safe_la = np.where(la > 0, la, 1).astype(np.float64)
    safe_lb = np.where(lb > 0, lb, 1).astype(np.float64)
    jaro = np.where(
        m > 0,
        (m / safe_la + m / safe_lb + (m - t) / safe_m) / 3.0,
        0.0,
    )
    # common prefix length, capped at 4
    pl = np.zeros(n, np.int64)
    alive = np.ones(n, bool)
    for k in range(min(4, LA, LB)):
        alive &= (k < la) & (k < lb) & (A[:, k] == B[:, k])
        pl += alive
    return np.where(jaro > 0.7, jaro + pl * 0.1 * (1.0 - jaro), jaro)
