"""O3 graft: numeric-aware ("human") string ordering.

The reference sorts transit lines so that code "3" < "11" < "A1" by
splitting names into digit/non-digit runs and comparing numerically where
both sides are numeric (/root/reference/src/bin/ntfs2mimir.rs:76-92).

Used as an in-group / result-page sort key (small collections by
construction — the reference applies it to the lines of one stop), so a
per-value key build is the right cost model; the bulk engine's big sorts
stay columnar.
"""

from __future__ import annotations

import re

_RUNS = re.compile(r"(\d+)")


def human_sort_key(value: str):
    """Sort key: digit runs compare numerically, text runs lexically.

    Each run becomes (0, int, "") or (1, 0, str) so numbers sort before
    letters at the same position and never compare int-vs-str.
    """
    parts = _RUNS.split(value or "")
    key = []
    for p in parts:
        if not p:
            continue
        if p.isdigit():
            key.append((0, int(p), ""))
        else:
            key.append((1, 0, p))
    return tuple(key)


def human_sorted(values, *, reverse: bool = False) -> list:
    return sorted(values, key=human_sort_key, reverse=reverse)
