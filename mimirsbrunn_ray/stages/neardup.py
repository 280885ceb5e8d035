"""Near-duplicate detection: MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine — the approximate generalizations of the engine's exact
dedup (stages/dedup.py; D1 graft). All follow the same scale shape:

  vectorized per-batch signatures (map_batches)
    -> explode to (bucket, signature, doc_id) candidate rows
    -> ONE hash shuffle on a small int bucket column
    -> vectorized within-bucket candidate pairing + exact verification
    -> min-label connected components (iterated label propagation or a
       driver-side union-find when the candidate pair set is provably small)

Public algorithm provenance: MinHash/LSH banding per Broder (1997) and the
standard b-bands x r-rows construction; SimHash per Charikar (2002).
"""

from __future__ import annotations

import zlib

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

MERSENNE = (1 << 61) - 1


def _shingle_hashes(text: str, k: int = 5) -> np.ndarray:
    """Character k-shingle crc32 hashes (deterministic across processes)."""
    if not text or len(text) < k:
        return np.array([zlib.crc32((text or "").encode())], dtype=np.uint64)
    enc = text.encode("utf-8", "ignore")
    out = {zlib.crc32(enc[i : i + k]) for i in range(len(enc) - k + 1)}
    return np.fromiter(out, dtype=np.uint64, count=len(out))


class MinHasher:
    """Actor-pool stage: 128-perm MinHash signature per doc, exploded into
    ``bands`` LSH band rows (band_id, band_hash, doc_id)."""

    def __init__(self, num_perm: int = 128, bands: int = 16, k: int = 5, seed: int = 7):
        rng = np.random.default_rng(seed)
        self.a = rng.integers(1, MERSENNE, size=num_perm, dtype=np.uint64)
        self.b = rng.integers(0, MERSENNE, size=num_perm, dtype=np.uint64)
        self.num_perm = num_perm
        self.bands = bands
        self.rows = num_perm // bands
        self.k = k

    def signature(self, text: str) -> np.ndarray:
        sh = _shingle_hashes(text, self.k)
        # multiply-shift permutation family (wrapping uint64 multiply) —
        # no modulo, ~2x faster than the Mersenne form with the same
        # collision behavior for hashing purposes
        vals = (sh[None, :] * self.a[:, None]) + self.b[:, None]
        return vals.min(axis=1)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        texts = batch["text"].to_pylist()
        n = len(ids)
        if n == 0:
            return pa.table(
                {
                    "band_id": pa.array([], type=pa.int32()),
                    "band_hash": pa.array([], type=pa.int64()),
                    "doc_id": pa.array([], type=batch.schema.field("doc_id").type),
                }
            )
        # one concatenated shingle array for the WHOLE batch + reduceat per
        # permutation: vectorized across documents, no per-doc matrices
        per_doc = [_shingle_hashes(t, self.k) for t in texts]
        lengths = np.asarray([len(s) for s in per_doc], dtype=np.int64)
        all_sh = (
            np.concatenate(per_doc) if per_doc else np.array([], dtype=np.uint64)
        )
        offsets = np.zeros(n, dtype=np.int64)
        np.cumsum(lengths[:-1], out=offsets[1:])
        sigs = np.empty((self.num_perm, n), dtype=np.uint64)
        for p in range(self.num_perm):
            v = all_sh * self.a[p] + self.b[p]
            sigs[p] = np.minimum.reduceat(v, offsets)
        bh = sigs.reshape(self.bands, self.rows, n)
        folded = np.zeros((self.bands, n), dtype=np.uint64)
        for r in range(self.rows):
            folded = (folded * np.uint64(1099511628211)) ^ bh[:, r, :]
        band_ids = np.repeat(np.arange(self.bands, dtype=np.int32), n)
        band_hashes = (folded & np.uint64((1 << 63) - 1)).astype(np.int64).ravel()
        out_ids = np.tile(np.asarray(ids, dtype=object), self.bands)
        return pa.table(
            {
                "band_id": pa.array(band_ids),
                "band_hash": pa.array(band_hashes),
                "doc_id": pa.array(list(out_ids)),
            }
        )


def jaccard(text_a: str, text_b: str, k: int = 5) -> float:
    """Exact character-k-shingle Jaccard (the verification predicate)."""
    a = set(_shingle_hashes(text_a, k).tolist())
    b = set(_shingle_hashes(text_b, k).tolist())
    if not a and not b:
        return 1.0
    return len(a & b) / max(1, len(a | b))


def _candidate_pairs_from_bands(band_rows: "rd.Dataset", num_buckets: int = 32):
    """(band_id, band_hash, doc_id) rows -> distinct candidate id pairs."""

    def bucketize(b: pa.Table) -> pa.Table:
        h = b["band_hash"].to_numpy(zero_copy_only=False)
        return b.append_column(
            "_b", pa.array((h % num_buckets).astype(np.int32))
        )

    def pairs_in_bucket(g: pd.DataFrame) -> pd.DataFrame:
        out_a, out_b = [], []
        grouped = g.groupby(["band_id", "band_hash"])["doc_id"]
        for _, ids in grouped:
            u = sorted(set(ids))
            for i in range(len(u)):
                for j in range(i + 1, len(u)):
                    out_a.append(u[i])
                    out_b.append(u[j])
        return pd.DataFrame({"a": out_a, "b": out_b})

    return (
        band_rows.map_batches(bucketize, batch_format="pyarrow", batch_size=None)
        .groupby("_b")
        .map_groups(pairs_in_bucket, batch_format="pandas")
    )


def minhash_lsh_dedup(
    docs: "rd.Dataset",
    threshold: float = 0.8,
    num_perm: int = 128,
    bands: int = 16,
    k: int = 5,
    concurrency=None,
) -> pd.DataFrame:
    """MinHash-LSH near-dup clustering.

    Returns a pandas DataFrame (doc_id, cluster) where cluster is the min
    doc_id of the near-dup group (the deterministic keep-min winner rule,
    /root/reference/src/osm_reader/street.rs:202-234). Candidate pairs are
    verified with exact shingle Jaccard >= threshold before clustering.
    Union-find runs on the driver — valid while candidate pairs ~ O(dups);
    for adversarial corpora switch to iterated min-label propagation.
    """
    from mimirsbrunn_ray.context import pool_size

    docs_small = docs.select_columns(["doc_id", "text"])
    band_rows = docs_small.map_batches(
        MinHasher,
        fn_constructor_kwargs={"num_perm": num_perm, "bands": bands, "k": k},
        batch_format="pyarrow",
        batch_size=None,
        concurrency=concurrency if concurrency is not None else (1, pool_size()),
    )
    cand = _candidate_pairs_from_bands(band_rows).to_pandas().drop_duplicates()

    # verification needs the candidate docs' shingle sets: compute once per
    # involved doc (sorted uint64 arrays), then vectorized intersections
    need = set(cand["a"]) | set(cand["b"])
    shingles: dict = {}
    for b in docs_small.iter_batches(batch_format="pyarrow", batch_size=8192):
        ids = b["doc_id"].to_pylist()
        txt = b["text"].to_pylist()
        for i, d in enumerate(ids):
            if d in need:
                shingles[d] = np.unique(_shingle_hashes(txt[i], k))

    parent: dict = {}

    def find(x):
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    def union(x, y):
        rx, ry = find(x), find(y)
        if rx != ry:
            lo, hi = (rx, ry) if str(rx) <= str(ry) else (ry, rx)
            parent[hi] = lo

    empty = np.array([], dtype=np.uint64)
    for a, b in zip(cand["a"], cand["b"]):
        sa, sb = shingles.get(a, empty), shingles.get(b, empty)
        inter = len(np.intersect1d(sa, sb, assume_unique=True))
        uni = len(sa) + len(sb) - inter
        if uni and inter / uni >= threshold:
            union(a, b)

    ids = docs_small.select_columns(["doc_id"]).to_pandas()["doc_id"]
    return pd.DataFrame({"doc_id": ids, "cluster": [find(d) for d in ids]})


# ---------------------------------------------------------------------------
# SimHash (Charikar 2002): 64-bit signature; near-dup iff hamming distance
# small. Banding 64 bits into 4x16 gives exact-match candidates for
# distance <= 3.
# ---------------------------------------------------------------------------


class SimHasher:
    def __init__(self):
        import re

        self.word_re = re.compile(r"\w+", flags=0)

    def simhash64(self, text: str) -> int:
        acc = np.zeros(64, dtype=np.int64)
        shifts = np.arange(64, dtype=np.uint64)
        for w in self.word_re.findall((text or "").lower()):
            h = np.uint64(
                zlib.crc32(w.encode()) | (zlib.crc32(w[::-1].encode()) << 32)
            )
            bits = (h >> shifts) & np.uint64(1)
            acc += np.where(bits == 1, 1, -1)
        out = 0
        for i in range(64):
            if acc[i] > 0:
                out |= 1 << i
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        sigs = [self.simhash64(t) for t in batch["text"].to_pylist()]
        return pa.table(
            {
                "doc_id": pa.array(ids),
                "simhash": pa.array(
                    np.array(sigs, dtype=np.uint64).view(np.int64)
                ),
            }
        )


def simhash_signatures(docs: "rd.Dataset", concurrency=None) -> "rd.Dataset":
    from mimirsbrunn_ray.context import pool_size

    return docs.select_columns(["doc_id", "text"]).map_batches(
        SimHasher,
        batch_format="pyarrow",
        batch_size=None,
        concurrency=concurrency if concurrency is not None else (1, pool_size()),
    )


def simhash_near_pairs(
    sig_ds: "rd.Dataset", max_hamming: int = 3, bands: int | None = None
) -> pd.DataFrame:
    """Candidate pairs by banding the 64-bit signature, verified by exact
    hamming distance. Pigeonhole: distance <= bands-1 guarantees at least
    one intact band, so bands defaults to the smallest divisor of 64 above
    ``max_hamming``."""
    if bands is None:
        bands = next(b for b in (4, 8, 16, 32) if b > max_hamming)
    bits = 64 // bands
    mask = np.uint64((1 << bits) - 1)

    def explode(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_pylist()
        s = b["simhash"].to_numpy(zero_copy_only=False).view(np.uint64)
        n = len(ids)
        band_id = np.repeat(np.arange(bands, dtype=np.int32), n)
        band_val = np.concatenate(
            [((s >> np.uint64(bits * i)) & mask).astype(np.int64) + (i << 40)
             for i in range(bands)]
        )
        doc = np.tile(np.asarray(ids, dtype=object), bands)
        sig = np.tile(s.view(np.int64), bands)
        return pa.table(
            {
                "band_id": pa.array(band_id),
                "band_hash": pa.array(band_val),
                "doc_id": pa.array(list(doc)),
                "sig": pa.array(sig),
            }
        )

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        out = []
        for _, grp in g.groupby(["band_id", "band_hash"]):
            rows = grp.drop_duplicates("doc_id").sort_values("doc_id")
            ids = rows["doc_id"].to_list()
            sigs = rows["sig"].to_numpy().view(np.uint64)
            for i in range(len(ids)):
                for j in range(i + 1, len(ids)):
                    ham = int(bin(int(sigs[i]) ^ int(sigs[j])).count("1"))
                    if ham <= max_hamming:
                        out.append((ids[i], ids[j], ham))
        return pd.DataFrame(out, columns=["a", "b", "hamming"])

    exploded = sig_ds.map_batches(explode, batch_format="pyarrow", batch_size=None)

    def bucketize(b: pa.Table) -> pa.Table:
        h = b["band_hash"].to_numpy(zero_copy_only=False)
        return b.append_column("_b", pa.array((h % 16).astype(np.int32)))

    out = (
        exploded.map_batches(bucketize, batch_format="pyarrow", batch_size=None)
        .groupby("_b")
        .map_groups(pairs, batch_format="pandas")
        .to_pandas()
    )
    if out.empty:
        return pd.DataFrame(columns=["a", "b", "hamming"])
    return out.drop_duplicates(["a", "b"]).reset_index(drop=True)


# ---------------------------------------------------------------------------
# Embedding-cosine near-dup: random-hyperplane LSH buckets + in-bucket
# exact cosine verification.
# ---------------------------------------------------------------------------


def embedding_near_dups(
    emb: "rd.Dataset",
    dim: int,
    threshold: float = 0.95,
    n_planes: int = 12,
    seed: int = 11,
) -> pd.DataFrame:
    """Pairs (a, b, cosine) with cosine >= threshold, found via one
    random-hyperplane LSH bucket shuffle (sign pattern -> bucket)."""
    import ray

    rng = np.random.default_rng(seed)
    planes_ref = ray.put(rng.standard_normal((dim, n_planes)))

    class Bucketize:
        def __init__(self):
            self.planes = ray.get(planes_ref)

        def __call__(self, b: pa.Table) -> pa.Table:
            vecs = np.stack(
                [np.asarray(v, dtype=np.float64) for v in b["embedding"].to_pylist()]
            )
            norms = np.linalg.norm(vecs, axis=1, keepdims=True)
            unit = vecs / np.where(norms == 0, 1, norms)
            signs = (unit @ self.planes) > 0
            bucket = signs @ (1 << np.arange(signs.shape[1]))
            return pa.table(
                {
                    "vec_id": b["vec_id"],
                    "bucket": pa.array(bucket.astype(np.int64)),
                    "unit": pa.array(list(unit), type=pa.list_(pa.float64())),
                }
            )

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        ids = g["vec_id"].to_numpy()
        mat = np.stack(g["unit"].to_numpy())
        sims = mat @ mat.T
        out = []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                if sims[i, j] >= threshold:
                    a, b = sorted((int(ids[i]), int(ids[j])))
                    out.append((a, b, round(float(sims[i, j]), 6)))
        return pd.DataFrame(out, columns=["a", "b", "cosine"])

    bucketed = emb.map_batches(
        Bucketize, batch_format="pyarrow", batch_size=None, concurrency=(1, 8)
    )
    return (
        bucketed.groupby("bucket")
        .map_groups(pairs, batch_format="pandas")
        .to_pandas()
        .drop_duplicates(["a", "b"])
    )
