"""Vectorized JSON scalar extraction — the M8-family "parse + validate
converter" (SURVEY.md §2.3; ref: tag-map parsing at
/root/reference/src/osm_reader/poi.rs:122-129) applied to a JSON-string
property column.

``pyarrow.compute.extract_regex`` runs the whole batch through one
compiled RE2 pass — no per-row json.loads. The regex path is exact for
FLAT objects with unescaped keys and integer values (this engine's
``props`` payloads); anything that doesn't match (missing key, malformed
row, non-integer value) comes back NULL, mirroring SQL
``CAST(json_extract_string(...) AS BIGINT)`` null semantics.
"""

from __future__ import annotations

import re

import pyarrow as pa
import pyarrow.compute as pc


def extract_int_key(arr, key: str) -> pa.Array:
    """int64 value of ``"key": <int>`` per row; NULL when absent/invalid.

    The value must be a whole JSON integer: the pattern requires the
    digits to be followed by a value terminator (comma, closing brace, or
    whitespace-then-either), so ``"k": 3.5`` is NULL rather than a silent
    digit-prefix 3 (RE2 has no lookahead — the terminator is matched
    outside the capture group instead)."""
    pattern = rf'"{re.escape(key)}"\s*:\s*(?P<v>-?\d+)\s*[,}}]'
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    m = pc.extract_regex(arr, pattern=pattern)
    # struct_field keeps the match's null mask; empty strings never occur
    # on valid matches (the group requires >= 1 digit)
    return pc.cast(pc.struct_field(m, "v"), pa.int64())
