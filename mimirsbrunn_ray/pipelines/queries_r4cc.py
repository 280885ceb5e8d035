"""Round-4 batch CC: label-centroid cosine matrix, half-split centroid
drift, and the bigram novelty curve.

Exactness discipline for the embedding pair: components quantize to
x1e6 int64 (float32 -> double is exact, ROUND half away matches both
engines), per-(label, dim) sums are exact int64, and the centroid dot
products are EXACT arbitrary-precision integers (Python int here,
HUGEINT in the oracle) converted once to double — cosine is
scale-invariant so the centroid division by n cancels and no float is
ever accumulated. The novelty curve is pure integer min/count.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from mimirsbrunn_ray.stages.rollup import tree_merge


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


def _dim_sum_partial(b: pa.Table, keys: list[str]) -> pa.Table:
    """Per-(keys..., dim) exact int64 component sums + row counts for one
    Arrow batch, via the flat list_flatten().reshape idiom."""
    emb = b["embedding"]
    flat = (
        pc.list_flatten(emb)
        .cast(pa.float64())
        .to_numpy(zero_copy_only=False)
    )
    n_rows = b.num_rows
    dim = len(flat) // n_rows if n_rows else 0
    q = _round_half_away(flat * 1e6).reshape(n_rows, dim)
    kf = pd.DataFrame({k: b[k].to_numpy(zero_copy_only=False) for k in keys})
    kf["_g"] = kf.groupby(keys, sort=False).ngroup()
    ng = int(kf["_g"].max()) + 1 if n_rows else 0
    sums = np.zeros((ng, dim), dtype=np.int64)
    np.add.at(sums, kf["_g"].to_numpy(), q)
    counts = np.bincount(kf["_g"].to_numpy(), minlength=ng).astype(np.int64)
    first = kf.drop_duplicates("_g").sort_values("_g")
    out = {k: np.repeat(first[k].to_numpy(), dim) for k in keys}
    out["dim"] = np.tile(np.arange(1, dim + 1, dtype=np.int64), ng)
    out["sx"] = sums.reshape(-1)
    out["n"] = np.repeat(counts, dim)
    return pa.Table.from_pandas(pd.DataFrame(out), preserve_index=False)


def _exact_cosine_x1e6(sa: np.ndarray, sb: np.ndarray) -> int | None:
    """Cosine of two exact-int vectors through the mirrored closed form:
    exact big-int dots -> one double conversion each -> num /
    (sqrt(d1) * sqrt(d2)) -> x1e6 ROUND half away."""
    ia = [int(v) for v in sa]
    ib = [int(v) for v in sb]
    num = sum(x * y for x, y in zip(ia, ib))
    d1 = sum(x * x for x in ia)
    d2 = sum(y * y for y in ib)
    if d1 == 0 or d2 == 0:
        return None
    r = float(num) / (np.sqrt(float(d1)) * np.sqrt(float(d2)))
    return int(_round_half_away(np.array([r * 1e6]))[0])


# ---------------------------------------------------------------------------
# label-centroid cosine matrix
# ---------------------------------------------------------------------------


def q_label_centroid_cosine(sf_dir):
    """Pairwise cosine similarity between per-label embedding centroids
    (la < lb) — the inter-cluster geometry audit run before trusting
    labels as training strata. One combiner-first pass to the
    (label, dim) exact-int sum tier (bounded: labels x dims rows); the
    pair matrix is labels^2, driver-sized by construction."""
    emb = rd.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["label", "embedding"]
    )

    def partial(b: pa.Table) -> pa.Table:
        b = _clean(b, ("label", "embedding"))
        if b.num_rows == 0:
            return pa.table(
                {
                    "label": pa.array([], pa.int64()),
                    "dim": pa.array([], pa.int64()),
                    "sx": pa.array([], pa.int64()),
                    "n": pa.array([], pa.int64()),
                }
            )
        t = _dim_sum_partial(
            b.set_column(
                b.schema.get_field_index("label"),
                "label",
                b["label"].cast(pa.int64()),
            ),
            ["label"],
        )
        return t

    def combine_sum_n(b: pa.Table) -> pa.Table:
        # n repeats per dim inside one partial; across partials it sums.
        g = b.group_by(["label", "dim"]).aggregate(
            [("sx", "sum"), ("n", "sum")]
        )
        g = g.select(["label", "dim", "sx_sum", "n_sum"])
        return g.rename_columns(["label", "dim", "sx", "n"])

    tier = tree_merge(
        emb.map_batches(partial, batch_format="pyarrow", batch_size=None),
        combine_sum_n,
    ).to_pandas()  # bounded: labels x dims

    if not len(tier) or "label" not in tier.columns:
        return pa.table(
            {
                "la": pa.array([], pa.int64()),
                "lb": pa.array([], pa.int64()),
                "n_a": pa.array([], pa.int64()),
                "n_b": pa.array([], pa.int64()),
                "cos_x1e6": pa.array([], pa.int64()),
            }
        )
    tier = tier.sort_values(["label", "dim"], ignore_index=True)
    labels = sorted(tier["label"].unique().tolist())
    vecs = {
        int(lb): g["sx"].to_numpy(dtype=np.int64)
        for lb, g in tier.groupby("label")
    }
    # n was summed per dim row; every dim row carries the same label count
    ns = {
        int(lb): int(g["n"].iloc[0]) for lb, g in tier.groupby("label")
    }
    rows = {"la": [], "lb": [], "n_a": [], "n_b": [], "cos_x1e6": []}
    for i, la in enumerate(labels):
        for lb in labels[i + 1:]:
            c = _exact_cosine_x1e6(vecs[int(la)], vecs[int(lb)])
            if c is None:
                continue
            rows["la"].append(int(la))
            rows["lb"].append(int(lb))
            rows["n_a"].append(ns[int(la)])
            rows["n_b"].append(ns[int(lb)])
            rows["cos_x1e6"].append(c)
    return pa.table(
        {
            "la": pa.array(rows["la"], pa.int64()),
            "lb": pa.array(rows["lb"], pa.int64()),
            "n_a": pa.array(rows["n_a"], pa.int64()),
            "n_b": pa.array(rows["n_b"], pa.int64()),
            "cos_x1e6": pa.array(rows["cos_x1e6"], pa.int64()),
        }
    )


CENTROID_COS_SQL = """
WITH e AS (
  SELECT CAST(label AS BIGINT) AS label, unnest(embedding) AS v,
         generate_subscripts(embedding, 1) AS dim
  FROM embeddings WHERE embedding IS NOT NULL AND label IS NOT NULL
), s AS (
  SELECT label, dim,
         CAST(SUM(CAST(ROUND(CAST(v AS DOUBLE) * 1000000, 0) AS BIGINT))
              AS BIGINT) AS sx,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM e GROUP BY 1, 2
), p AS (
  SELECT a.label AS la, b.label AS lb,
         CAST(MAX(a.n) AS BIGINT) AS n_a, CAST(MAX(b.n) AS BIGINT) AS n_b,
         CAST(SUM(CAST(a.sx AS HUGEINT) * b.sx) AS DOUBLE) AS num,
         CAST(SUM(CAST(a.sx AS HUGEINT) * a.sx) AS DOUBLE) AS d1,
         CAST(SUM(CAST(b.sx AS HUGEINT) * b.sx) AS DOUBLE) AS d2
  FROM s a JOIN s b ON a.dim = b.dim AND a.label < b.label
  GROUP BY 1, 2
)
SELECT la, lb, n_a, n_b,
       CAST(ROUND(num / (SQRT(d1) * SQRT(d2)) * 1000000, 0) AS BIGINT)
         AS cos_x1e6
FROM p WHERE d1 > 0 AND d2 > 0
"""


# ---------------------------------------------------------------------------
# half-split centroid drift per label
# ---------------------------------------------------------------------------


def q_label_centroid_halves(sf_dir):
    """Embedding-drift audit: split each label's vectors into even /
    odd vec_id halves and report the cosine between the two half
    centroids — a self-consistency check (a healthy label's halves
    agree; cosine far below 1 flags a mixed or drifting cluster). Same
    exact-int tier as the centroid matrix with (label, half) keys."""
    emb = rd.read_parquet(
        f"{sf_dir}/embeddings.parquet",
        columns=["vec_id", "label", "embedding"],
    )

    def partial(b: pa.Table) -> pa.Table:
        b = _clean(b, ("vec_id", "label", "embedding"))
        if b.num_rows == 0:
            return pa.table(
                {
                    "label": pa.array([], pa.int64()),
                    "half": pa.array([], pa.int64()),
                    "dim": pa.array([], pa.int64()),
                    "sx": pa.array([], pa.int64()),
                    "n": pa.array([], pa.int64()),
                }
            )
        half = pc.bit_wise_and(b["vec_id"].cast(pa.int64()), 1)
        b = b.set_column(
            b.schema.get_field_index("label"),
            "label",
            b["label"].cast(pa.int64()),
        )
        b = b.append_column("half", half)
        return _dim_sum_partial(b, ["label", "half"])

    def combine(b: pa.Table) -> pa.Table:
        g = b.group_by(["label", "half", "dim"]).aggregate(
            [("sx", "sum"), ("n", "sum")]
        )
        g = g.select(["label", "half", "dim", "sx_sum", "n_sum"])
        return g.rename_columns(["label", "half", "dim", "sx", "n"])

    tier = tree_merge(
        emb.map_batches(partial, batch_format="pyarrow", batch_size=None),
        combine,
    ).to_pandas()  # bounded: labels x 2 x dims

    if not len(tier) or "label" not in tier.columns:
        return pa.table(
            {
                "label": pa.array([], pa.int64()),
                "n_even": pa.array([], pa.int64()),
                "n_odd": pa.array([], pa.int64()),
                "cos_x1e6": pa.array([], pa.int64()),
            }
        )
    tier = tier.sort_values(["label", "half", "dim"], ignore_index=True)
    rows = {"label": [], "n_even": [], "n_odd": [], "cos_x1e6": []}
    for lb, g in tier.groupby("label"):
        g0 = g[g["half"] == 0]
        g1 = g[g["half"] == 1]
        if not len(g0) or not len(g1):
            continue
        c = _exact_cosine_x1e6(
            g0["sx"].to_numpy(dtype=np.int64),
            g1["sx"].to_numpy(dtype=np.int64),
        )
        if c is None:
            continue
        rows["label"].append(int(lb))
        rows["n_even"].append(int(g0["n"].iloc[0]))
        rows["n_odd"].append(int(g1["n"].iloc[0]))
        rows["cos_x1e6"].append(c)
    return pa.table(
        {
            "label": pa.array(rows["label"], pa.int64()),
            "n_even": pa.array(rows["n_even"], pa.int64()),
            "n_odd": pa.array(rows["n_odd"], pa.int64()),
            "cos_x1e6": pa.array(rows["cos_x1e6"], pa.int64()),
        }
    )


CENTROID_HALVES_SQL = """
WITH e AS (
  SELECT CAST(label AS BIGINT) AS label,
         CAST(vec_id % 2 AS BIGINT) AS half,
         unnest(embedding) AS v,
         generate_subscripts(embedding, 1) AS dim
  FROM embeddings
  WHERE embedding IS NOT NULL AND label IS NOT NULL AND vec_id IS NOT NULL
), s AS (
  SELECT label, half, dim,
         CAST(SUM(CAST(ROUND(CAST(v AS DOUBLE) * 1000000, 0) AS BIGINT))
              AS BIGINT) AS sx,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM e GROUP BY 1, 2, 3
), p AS (
  SELECT a.label,
         CAST(MAX(a.n) AS BIGINT) AS n_even,
         CAST(MAX(b.n) AS BIGINT) AS n_odd,
         CAST(SUM(CAST(a.sx AS HUGEINT) * b.sx) AS DOUBLE) AS num,
         CAST(SUM(CAST(a.sx AS HUGEINT) * a.sx) AS DOUBLE) AS d1,
         CAST(SUM(CAST(b.sx AS HUGEINT) * b.sx) AS DOUBLE) AS d2
  FROM s a JOIN s b ON a.label = b.label AND a.dim = b.dim
  WHERE a.half = 0 AND b.half = 1
  GROUP BY 1
)
SELECT label, n_even, n_odd,
       CAST(ROUND(num / (SQRT(d1) * SQRT(d2)) * 1000000, 0) AS BIGINT)
         AS cos_x1e6
FROM p WHERE d1 > 0 AND d2 > 0
"""


# ---------------------------------------------------------------------------
# bigram novelty curve
# ---------------------------------------------------------------------------


def q_bigram_novelty_curve(sf_dir):
    """How fast does the corpus stop producing NEW word bigrams? Bucket
    documents by doc_id / 100 and count the bigrams whose first
    occurrence (minimum doc_id among containing docs) lands in each
    bucket — the saturation curve data teams read to decide whether
    more of a source still adds novel text. Combiner-first per-bigram
    min (sharded by bigram hash — the tier is vocabulary-sized, never
    driver-pulled), then a bounded bucket count."""
    docs = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )

    def partial(b: pa.Table) -> pa.Table:
        b = _clean(b, ("doc_id", "text"))
        words = pc.split_pattern(b["text"], pattern=" ")
        lens = pc.list_value_length(words).to_numpy(zero_copy_only=False)
        flat = pc.list_flatten(words).to_numpy(zero_copy_only=False)
        ids = b["doc_id"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        doc_of = np.repeat(ids, lens)
        if len(flat) == 0:
            return pa.table(
                {
                    "bigram": pa.array([], pa.string()),
                    "first_doc": pa.array([], pa.int64()),
                }
            )
        same = doc_of[1:] == doc_of[:-1]
        w1 = pd.Series(flat[:-1][same], dtype=object)
        w2 = pd.Series(flat[1:][same], dtype=object)
        t = pd.DataFrame(
            {"bigram": w1.str.cat(w2, sep=" "), "first_doc": doc_of[:-1][same]}
        )
        g = t.groupby("bigram", sort=False, as_index=False)["first_doc"].min()
        g["first_doc"] = g["first_doc"].astype(np.int64)
        return pa.Table.from_pandas(g, preserve_index=False)

    def combine(b: pa.Table) -> pa.Table:
        g = b.group_by(["bigram"]).aggregate([("first_doc", "min")])
        return g.select(["bigram", "first_doc_min"]).rename_columns(
            ["bigram", "first_doc"]
        )

    tier = tree_merge(
        docs.map_batches(partial, batch_format="pyarrow", batch_size=None),
        combine,
        final_shards=8,
        shard_cols=["bigram"],
    )

    def bucketize(b: pa.Table) -> pa.Table:
        fd = b["first_doc"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        t = pa.table(
            {
                "bucket": pa.array((fd // 100) * 100),
                "new_bigrams": pa.array(np.ones(len(fd), dtype=np.int64)),
            }
        )
        g = t.group_by(["bucket"]).aggregate([("new_bigrams", "sum")])
        return g.select(["bucket", "new_bigrams_sum"]).rename_columns(
            ["bucket", "new_bigrams"]
        )

    def bcombine(b: pa.Table) -> pa.Table:
        g = b.group_by(["bucket"]).aggregate([("new_bigrams", "sum")])
        return g.select(["bucket", "new_bigrams_sum"]).rename_columns(
            ["bucket", "new_bigrams"]
        )

    return tree_merge(
        tier.map_batches(bucketize, batch_format="pyarrow", batch_size=None),
        bcombine,
    )


BIGRAM_NOVELTY_SQL = """
WITH w AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS word,
         generate_subscripts(string_split(text, ' '), 1) AS pos
  FROM documents WHERE doc_id IS NOT NULL AND text IS NOT NULL
), bg AS (
  SELECT a.word || ' ' || b.word AS bigram,
         CAST(MIN(a.doc_id) AS BIGINT) AS first_doc
  FROM w a JOIN w b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
  GROUP BY 1
)
SELECT CAST((first_doc // 100) * 100 AS BIGINT) AS bucket,
       CAST(COUNT(*) AS BIGINT) AS new_bigrams
FROM bg GROUP BY 1
"""


def register_r4cc(queries: dict, oracles: dict) -> None:
    queries.update(
        {
            "label_centroid_cosine": q_label_centroid_cosine,
            "label_centroid_halves": q_label_centroid_halves,
            "bigram_novelty_curve": q_bigram_novelty_curve,
        }
    )
    oracles.update(
        {
            "label_centroid_cosine": CENTROID_COS_SQL,
            "label_centroid_halves": CENTROID_HALVES_SQL,
            "bigram_novelty_curve": BIGRAM_NOVELTY_SQL,
        }
    )
