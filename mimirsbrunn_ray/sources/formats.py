"""S1–S3/S6–S8 graft: multi-format file sources (CSV, CSV.gz, JSONL, parquet).

The reference ingests flat files in several formats — plain and gzipped
CSV with a streaming deserializer (/root/reference/src/addr_reader.rs:115-159,
``import_addresses_from_input_path`` dispatching on extension) and
JSON-lines/structured drops for the NTFS/GTFS shapes. Here one entry point,
``read_table``, dispatches on file extension to the matching Ray Data
reader so every downstream stage sees the same Arrow schema regardless of
the on-disk format:

  * ``.parquet``          -> ``read_parquet`` (column-pruned, byte-sized blocks)
  * ``.csv`` / ``.tsv``   -> ``read_csv`` (column-pruned via ConvertOptions)
  * ``.csv.gz`` etc.      -> same, gzip-decompressed in the read tasks
  * ``.jsonl`` / ``.json``-> ``read_json`` (+ ``select_columns`` after — JSON
                             has no reader-side projection)
  * ``.arrow`` / ``.feather`` / ``.ipc`` -> distributed per-file IPC decode
                             (Feather v2 == IPC file format; stream fallback;
                             zero-copy column projection after decode)
  * ``.orc``              -> distributed per-file pyarrow.orc decode with
                             reader-side column projection

Directories are expanded non-recursively; globs are expanded here so the
format can be decided before the Ray reader sees the paths. Decompression
happens inside the distributed read tasks (arrow_open_stream_args), never
on the driver.
"""

from __future__ import annotations

import glob
import os

import ray.data as rd

_CSV_EXTS = {".csv", ".tsv"}
_JSON_EXTS = {".json", ".jsonl", ".ndjson"}
_IPC_EXTS = {".arrow", ".feather", ".ipc"}
_ORC_EXTS = {".orc"}


def _expand(paths) -> list[str]:
    if isinstance(paths, (str, os.PathLike)):
        paths = [paths]
    out: list[str] = []
    for p in paths:
        p = os.fspath(p)
        if os.path.isdir(p):
            # non-recursive: plain FILES only — subdirectories (e.g. the
            # generator's late/ drop) and sidecars are not part of the drop
            out.extend(
                sorted(
                    os.path.join(p, f)
                    for f in os.listdir(p)
                    if not f.startswith((".", "_"))
                    and os.path.isfile(os.path.join(p, f))
                )
            )
        elif any(ch in p for ch in "*?["):
            out.extend(sorted(glob.glob(p)))
        else:
            out.append(p)
    return out


def detect_format(path: str) -> tuple[str, bool]:
    """-> (format, gzipped). Format is 'parquet' | 'csv' | 'json'."""
    base = path.lower()
    gz = base.endswith(".gz")
    if gz:
        base = base[: -len(".gz")]
    ext = os.path.splitext(base)[1]
    if ext == ".parquet":
        return "parquet", gz
    if ext in _CSV_EXTS:
        return "csv", gz
    if ext in _JSON_EXTS:
        return "json", gz
    if ext in _IPC_EXTS:
        return "ipc", gz
    if ext in _ORC_EXTS:
        return "orc", gz
    raise ValueError(f"unsupported input format: {path!r}")


def read_table(paths, columns=None, fmt: str | None = None) -> "rd.Dataset":
    """Read a table from parquet / CSV(.gz) / JSONL files into one Dataset.

    ``fmt`` overrides extension sniffing. All files of one call must share
    a format (the reference's per-drop rule); mixed drops should be read
    per-format and ``union``-ed by the caller.
    """
    files = _expand(paths)
    if not files:
        raise FileNotFoundError(f"no input files match {paths!r}")
    kinds = {detect_format(f)[0] for f in files}
    if fmt is None:
        if len(kinds) > 1:
            raise ValueError(
                f"mixed input formats {sorted(kinds)} in one read: {paths!r}"
            )
        fmt = next(iter(kinds))

    if fmt == "parquet":
        from mimirsbrunn_ray.sources.ingest import num_blocks_for

        return rd.read_parquet(
            files, columns=columns, override_num_blocks=num_blocks_for(files)
        )

    if fmt in ("ipc", "orc"):
        # whole-file columnar formats: one distributed decode task per
        # file (read_binary_files ships whole files, so the deployment
        # rule is shard-sized files — same rule the tier writer follows);
        # gzip-wrapped shards are sniffed by magic bytes inside the task.
        # Feather v2 IS the IPC file format (incl. optional compression),
        # with the stream format as fallback; ORC uses the bundled
        # pyarrow.orc reader (Ray Data has no native read_orc) with
        # stripe-columnar projection in the reader itself.
        cols = list(columns) if columns else None

        def _read_ipc(buf: bytes) -> "object":
            import pyarrow as pa
            from pyarrow import feather as pafeather

            try:
                return pafeather.read_table(
                    pa.BufferReader(buf), columns=cols
                )
            except pa.ArrowInvalid:
                t = pa.ipc.open_stream(pa.BufferReader(buf)).read_all()
                return t.select(cols) if cols else t

        def _read_orc(buf: bytes) -> "object":
            import pyarrow as pa
            from pyarrow import orc as paorc

            return paorc.read_table(pa.BufferReader(buf), columns=cols)

        reader = _read_ipc if fmt == "ipc" else _read_orc

        def _decode_files(b):
            import gzip as _gzip

            import pyarrow as pa

            tables = []
            for buf in b["bytes"].to_pylist():
                if buf[:2] == b"\x1f\x8b":  # gzipped shard
                    buf = _gzip.decompress(buf)
                tables.append(reader(buf))
            return pa.concat_tables(tables)

        return rd.read_binary_files(files).map_batches(
            _decode_files, batch_format="pyarrow", batch_size=None
        )

    def _delim(f: str) -> str:
        base = f.lower()
        if base.endswith(".gz"):
            base = base[: -len(".gz")]
        return "\t" if base.endswith(".tsv") else ","

    # gzip and delimiter are PER-FILE properties: group files by them and
    # union the per-group reads, so one .gz (or .tsv) in a drop never
    # changes how its plain siblings are parsed
    groups: dict = {}
    for f in files:
        _, gz = detect_format(f)
        key = (gz, _delim(f) if fmt == "csv" else None)
        groups.setdefault(key, []).append(f)

    parts = []
    for (gz, delim), group in sorted(groups.items()):
        open_args = {"compression": "gzip"} if gz else None
        if fmt == "csv":
            from pyarrow import csv as pacsv

            kwargs = {"parse_options": pacsv.ParseOptions(delimiter=delim)}
            if columns:
                # reader-side projection: unneeded columns never leave the
                # parse buffer (the CSV analog of parquet column pruning)
                kwargs["convert_options"] = pacsv.ConvertOptions(
                    include_columns=list(columns)
                )
            if open_args:
                kwargs["arrow_open_stream_args"] = open_args
            parts.append(rd.read_csv(group, **kwargs))
        elif fmt == "json":
            kwargs = {}
            if open_args:
                kwargs["arrow_open_stream_args"] = open_args
            ds = rd.read_json(group, **kwargs)
            if columns:
                ds = ds.select_columns(list(columns))
            parts.append(ds)
        else:
            raise ValueError(f"unsupported format {fmt!r}")

    out = parts[0]
    for p in parts[1:]:
        out = out.union(p)
    return out


def normalize_sequences_batch(batch):
    """M8/M11 converter graft: coerce a CSV/JSONL-read batch to
    SEQUENCES_SCHEMA types (the reference parses each CSV record into its
    typed document, warn-and-skip on failure — type coercion here, the
    row-level drops stay in ValidateAndDerive).

    * ``tokens`` as a string (CSV: space-separated ints) -> list<int32>;
      empty/whitespace-only -> [] (missing collection = empty, the
      reference's serde default).
    * ``tokens`` as list<int64> (JSONL inference) -> list<int32>.
    * ``n_tok`` -> int32, ids -> string.
    """
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    from mimirsbrunn_ray.schemas import SEQUENCES_SCHEMA

    cols = {}
    for field in SEQUENCES_SCHEMA:
        col = batch[field.name]
        if field.name == "tokens" and pa.types.is_string(col.type):
            trimmed = pc.utf8_trim_whitespace(col)
            nulled = pc.if_else(
                pc.equal(trimmed, ""), pa.scalar(None, pa.string()), trimmed
            )
            lists = pc.cast(
                pc.split_pattern_regex(nulled, r"\s+"), field.type
            )
            empty = pa.ListArray.from_arrays(
                pa.array(np.zeros(batch.num_rows + 1, np.int32)),
                pa.array([], type=field.type.value_type),
            )
            col = pc.coalesce(lists, empty)
        elif col.type != field.type:
            col = pc.cast(col, field.type)
        cols[field.name] = col
    return pa.table(cols)
