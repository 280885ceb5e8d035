"""Scoring scalar functions — grafts of the reference's ranking math.

* ``blend_weight``: the stop-weight blend ``(w + log10(aw*1024+1)) / 2``
  (/root/reference/src/stops.rs:72-88) — combines an entity's own weight
  with its (admin/source) context weight.
* ``zoom_decay``: ln_1p interpolation used for proximity decay
  (/root/reference/libs/bragi/src/query.rs:266-274).
* ``clamp01``: weight clamp (/root/reference/src/utils.rs:65-72).

All vectorized over numpy arrays; usable inside map_batches.
"""

from __future__ import annotations

import numpy as np


def clamp01(w: np.ndarray) -> np.ndarray:
    return np.clip(np.asarray(w, dtype=np.float64), 0.0, 1.0)


def blend_weight(own: np.ndarray, context: np.ndarray) -> np.ndarray:
    """(own + log10(context * 1024 + 1) / log10(1025)) / 2, clamped to [0,1].

    The log term normalizes so that context == 1.0 contributes exactly 1.0
    (the reference divides by the max achievable log, stops.rs:85-87).
    """
    own = clamp01(own)
    ctx = clamp01(context)
    log_term = np.log10(ctx * 1024.0 + 1.0) / np.log10(1025.0)
    return clamp01((own + log_term) / 2.0)


def zoom_decay(distance: np.ndarray, scale: float = 1.0) -> np.ndarray:
    """ln_1p-shaped decay in (0, 1]: 1 at distance 0, falling smoothly."""
    d = np.maximum(np.asarray(distance, dtype=np.float64), 0.0)
    return 1.0 / (1.0 + np.log1p(d / max(scale, 1e-12)))
