"""Per-language name/label selection over a map<string,string> column —
the I18nProperties graft.

The reference stores every place's names as a lang -> text map
(/root/reference/libs/mimir/src/objects.rs:421-443) and shapes each
response for the request's ``lang`` (libs/bragi/src/model.rs:144-168),
with the skip-redundant-default rule: a lang variant equal to the default
label is never stored (libs/places/src/i18n_properties.rs analog,
labels.rs:92-118).

Here the map is a zero-copy Arrow ``map_(string, string)`` column;
building skips redundant variants, and selection is one vectorized pass
over the map's flattened keys/values (offset arithmetic, no per-row
Python in the value path).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

NAMES_TYPE = pa.map_(pa.string(), pa.string())


def build_names_map(
    default: pa.Array | pa.ChunkedArray,
    variants: dict[str, pa.Array | pa.ChunkedArray],
) -> pa.Array:
    """Build a map<lang,text> names column from a default label column and
    per-lang variant columns, SKIPPING entries that are null or equal to
    the default (the skip-redundant-default rule) — redundant variants are
    never stored, exactly like the reference's i18n properties."""
    if isinstance(default, pa.ChunkedArray):
        default = default.combine_chunks()
    d = default.to_pylist()
    langs = sorted(variants)
    cols = {}
    for lang in langs:
        v = variants[lang]
        if isinstance(v, pa.ChunkedArray):
            v = v.combine_chunks()
        cols[lang] = v.to_pylist()
    rows = []
    for i in range(len(d)):
        items = []
        for lang in langs:
            val = cols[lang][i]
            if val is not None and val != d[i]:
                items.append((lang, val))
        rows.append(items)
    return pa.array(rows, type=NAMES_TYPE)


def select_label(
    names: pa.Array | pa.ChunkedArray,
    default: pa.Array | pa.ChunkedArray,
    lang: str | None,
) -> pa.Array:
    """Per-request label: the ``lang`` entry of each row's names map when
    present, else the default label. Vectorized: ONE equality kernel over
    the map's flattened keys, then offset arithmetic finds each row's
    match — no per-row map lookup."""
    import pyarrow.compute as pc

    if isinstance(default, pa.ChunkedArray):
        default = default.combine_chunks()
    if lang is None:
        return default
    if isinstance(names, pa.ChunkedArray):
        names = names.combine_chunks()
    n = len(names)
    if len(names.items) == 0:  # no stored variants anywhere
        return default
    # map array = list<struct<key,value>>: flat keys/values + offsets.
    # NB: on a SLICED map array the flat children span the WHOLE parent,
    # so hits outside [offsets[0], offsets[-1]) belong to rows not in
    # this view and must be excluded before the searchsorted row mapping.
    offsets = names.offsets.to_numpy(zero_copy_only=False)
    flat_keys = names.keys
    flat_vals = names.items
    hit = pc.equal(flat_keys, pa.scalar(lang, pa.string()))
    hit_np = hit.to_numpy(zero_copy_only=False)
    hit_idx = np.flatnonzero(hit_np)
    hit_idx = hit_idx[(hit_idx >= offsets[0]) & (hit_idx < offsets[-1])]
    # row of each flat entry: searchsorted over the offsets
    rows = np.searchsorted(offsets, hit_idx, side="right") - 1
    take = np.full(n, -1, np.int64)
    take[rows] = hit_idx  # duplicate langs per row can't occur in a map
    picked = flat_vals.take(pa.array(np.where(take < 0, 0, take)))
    mask = pa.array(take >= 0)
    return pc.if_else(mask, picked, default)


def localized_row(row: dict, lang: str | None, label_key: str = "label",
                  names_key: str = "names") -> dict:
    """Shape ONE response row for a request lang (the bragi model.rs
    per-response selection): if the row carries a names map and the lang
    has a stored (non-redundant) variant, override ``label``."""
    if not lang:
        return row
    names = row.get(names_key)
    if not names:
        return row
    pairs = names.items() if isinstance(names, dict) else names
    for k, v in pairs:
        if k == lang and v is not None:
            out = dict(row)
            out[label_key] = v
            return out
    return row
