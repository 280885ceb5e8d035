"""Adapter: the driver's `documents` test table -> canonical sequences shape.

The reference ingests foreign formats by converting each into its canonical
document type at the read edge (Bano CSV -> Addr,
/root/reference/src/bin/bano2mimir.rs:75-172). Likewise, this adapter maps
the sandbox `documents` parquet (doc_id:int64, source, n_chars, ...) into
the engine's canonical sequences schema with a deterministic, SQL-expressible
derivation (so DuckDB oracles can reproduce it):

    doc_id  = 'doc-' || source || '-' || lpad(doc_id, 10, '0')
    n_tok   = n_chars // 4 + 1
    ts      = EPOCH0 + (doc_id // 64) * 7s  (bucket_1m = date_trunc minute)
    tokens  = splitmix64(doc index) stream  (optional; not SQL-expressible,
              only generated when the full engine path needs payloads)
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

from mimirsbrunn_ray.functions.timeutil import trunc_us, ts_array, ts_from_index
from mimirsbrunn_ray.sources.synth import VOCAB, _splitmix64


def _tokens_for(idx: np.ndarray, lengths: np.ndarray) -> pa.Array:
    total = int(lengths.sum())
    offsets = np.zeros(len(idx) + 1, dtype=np.int64)
    np.cumsum(lengths, out=offsets[1:])
    row_of = np.repeat(np.arange(len(idx), dtype=np.int64), lengths)
    pos = np.arange(total, dtype=np.int64) - np.repeat(offsets[:-1], lengths)
    values = (
        _splitmix64(idx[row_of] * np.int64(2654435761) + pos) % np.uint64(VOCAB)
    ).astype(np.int32)
    return pa.LargeListArray.from_arrays(offsets, values).cast(pa.list_(pa.int32()))


def _to_sequences(batch: pa.Table, with_tokens: bool) -> pa.Table:
    idx = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    src = batch["source"].to_numpy(zero_copy_only=False).astype(str)
    n_tok = (
        batch["n_chars"].to_numpy(zero_copy_only=False) // 4 + 1
    ).astype(np.int32)
    doc_id = np.char.add(
        np.char.add("doc-", src), np.char.add("-", np.char.zfill(idx.astype(str), 10))
    )
    ts_us = ts_from_index(idx)
    cols = {
        "doc_id": pa.array(doc_id, type=pa.string()),
        "n_tok": pa.array(n_tok),
        "source": pa.array(src, type=pa.string()),
        "ts": ts_array(ts_us),
        "bucket_1m": ts_array(trunc_us(ts_us, "1m")),
    }
    if with_tokens:
        cols["tokens"] = _tokens_for(idx, n_tok.astype(np.int64))
        order = ["doc_id", "tokens", "n_tok", "source", "ts", "bucket_1m"]
        return pa.table({k: cols[k] for k in order})
    return pa.table(cols)


def sequences_from_documents(
    sf_dir: str, with_tokens: bool = False
) -> "rd.Dataset":
    ds = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "source", "n_chars"]
    )
    return ds.map_batches(
        lambda b: _to_sequences(b, with_tokens), batch_format="pyarrow",
        batch_size=None,
    )


# The SQL prefix every oracle shares — MUST stay in lockstep with the
# Python derivation above.
SEQ_CTE = """
WITH seq AS (
  SELECT 'doc-' || source || '-' || lpad(CAST(doc_id AS VARCHAR), 10, '0') AS doc_id,
         CAST(n_chars // 4 + 1 AS INTEGER) AS n_tok,
         source,
         TIMESTAMP '2026-01-01 00:00:00' + INTERVAL ((doc_id // 64) * 7) SECOND AS ts
  FROM documents
)
"""
