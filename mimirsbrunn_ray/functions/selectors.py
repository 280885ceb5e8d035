"""M14/M15 graft: hierarchical value selectors and code-list utilities.

The reference's zip/country helpers:
  * ``get_zip_codes_from_admins`` — take the zips of the DEEPEST admin
    level that has any (/root/reference/src/utils.rs:37-53). Analog:
    ``deepest_with_value`` — first non-null walking deep -> shallow.
  * zip-range label suffix ``"name (75000-75116)"`` — one zip prints
    itself, several print the min-max range, none prints no suffix
    (/root/reference/src/osm_reader/admin.rs:199-209). Analog:
    ``range_label``.
  * zip parse: split on ';', trim, sort (BTreeSet order)
    (/root/reference/src/osm_reader/admin.rs:211-222). Analog:
    ``parse_code_list``.
  * country-code pick from the codes map walking the admin chain
    (/root/reference/src/utils.rs:102-111) — the same deepest-first
    coalesce shape as ``deepest_with_value``.

All pure pyarrow.compute — usable directly inside ``map_batches``.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc


def deepest_with_value(*cols):
    """First non-null value walking the hierarchy DEEP -> SHALLOW.

    Call with the deepest level first: ``deepest_with_value(city_zip,
    county_zip, state_zip)``. Empty strings count as missing (the
    reference skips admins with empty zip vectors).
    """
    cleaned = []
    for c in cols:
        if pa.types.is_string(c.type) or pa.types.is_large_string(c.type):
            c = pc.if_else(pc.equal(c, ""), pa.scalar(None, c.type), c)
        cleaned.append(c)
    return pc.coalesce(*cleaned)


def range_label(name, lo, hi, count):
    """``name (lo-hi)`` when count > 1, ``name (lo)`` when count == 1,
    bare ``name`` when count == 0 — admin.rs:199-209 semantics,
    vectorized over aligned arrays."""
    lo_s = pc.cast(lo, pa.string())
    hi_s = pc.cast(hi, pa.string())
    multi = pc.binary_join_element_wise(name, " (", lo_s, "-", hi_s, ")", "")
    single = pc.binary_join_element_wise(name, " (", lo_s, ")", "")
    out = pc.if_else(pc.greater(count, 1), multi, single)
    return pc.if_else(pc.equal(count, 0), name, out)


def parse_code_list(col, sep: str = ";"):
    """Split a packed code string, trim items, drop empties, sort
    (BTreeSet determinism) — admin.rs:211-222. Returns list<string>.

    Vectorized: one split kernel, then a single lexsort of (row, value)
    over the flattened items — no per-row Python sort."""
    import numpy as np

    parts = pc.split_pattern(pc.fill_null(col, ""), sep)
    flat = parts.combine_chunks() if isinstance(parts, pa.ChunkedArray) else parts
    offsets = flat.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    vals = pc.utf8_trim_whitespace(flat.values).to_numpy(zero_copy_only=False)
    counts = np.diff(offsets)
    row_idx = np.repeat(np.arange(len(counts)), counts)
    keep = vals != ""
    vals, row_idx = vals[keep], row_idx[keep]
    order = np.lexsort((vals, row_idx))
    vals, row_idx = vals[order], row_idx[order]
    new_counts = np.bincount(row_idx, minlength=len(counts))
    new_offsets = np.zeros(len(counts) + 1, dtype=np.int32)
    np.cumsum(new_counts, out=new_offsets[1:])
    return pa.ListArray.from_arrays(
        pa.array(new_offsets), pa.array(vals, type=pa.string())
    )
