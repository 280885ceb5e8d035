"""Multimodal columns: opaque binary payloads with typed metadata.

Images/audio/video are carried as ``binary`` columns next to metadata
(media_type, width/height/duration); decode / feature-extract / resize /
frame-sample run as actor-pool ``map_batches`` stages with SMALL batch
sizes (payload bytes dominate block size — the "very wide rows" rule,
SURVEY.md §7.6).

The sandbox ships no image/audio codecs, so the decode kernel is STUBBED:
``decode_media(..., impl="fake")`` produces deterministic pseudo-features
from the payload bytes (real plumbing, fake math); ``impl="pillow"`` etc.
raises NotImplementedError until a codec library is present. Everything
around the kernel — schema, batching, actor signature, output layout — is
real and tested.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.string()),
        ("media_type", pa.string()),  # "image/png", "audio/wav", ...
        ("payload", pa.binary()),
        ("width", pa.int32()),
        ("height", pa.int32()),
    ]
)

FEATURE_DIM = 32


def synth_media_table(n: int, seed: int = 21) -> pa.Table:
    """Deterministic fake media corpus (payload = seeded bytes + header)."""
    rng = np.random.default_rng(seed)
    ids, types, payloads, ws, hs = [], [], [], [], []
    for i in range(n):
        w, h = int(rng.integers(8, 64)), int(rng.integers(8, 64))
        body = rng.integers(0, 256, size=w * h, dtype=np.uint8).tobytes()
        ids.append(f"media-{i:06d}")
        types.append("image/fake" if i % 3 else "audio/fake")
        payloads.append(w.to_bytes(2, "big") + h.to_bytes(2, "big") + body)
        ws.append(w)
        hs.append(h)
    return pa.table(
        {
            "media_id": ids,
            "media_type": types,
            "payload": pa.array(payloads, type=pa.binary()),
            "width": pa.array(ws, type=pa.int32()),
            "height": pa.array(hs, type=pa.int32()),
        }
    )


class MediaDecoder:
    """Actor-pool stage: payload -> fixed-dim feature vector.

    ``impl="fake"``: deterministic features = normalized byte-histogram
    moments (pure function of payload bytes). Real decoders slot in here —
    setup (model / codec init) belongs in __init__, per the actor rule.
    """

    def __init__(self, impl: str = "fake"):
        if impl != "fake":
            raise NotImplementedError(
                f"media decode impl {impl!r}: no codec libraries in this "
                "container; the 'fake' impl exercises the full pipeline."
            )
        self.impl = impl

    def _features(self, payload: bytes) -> np.ndarray:
        arr = np.frombuffer(payload[4:], dtype=np.uint8)
        if len(arr) == 0:
            return np.zeros(FEATURE_DIM)
        hist = np.bincount(arr >> 3, minlength=FEATURE_DIM)[:FEATURE_DIM]
        return (hist / max(1, len(arr))).astype(np.float64)

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = [self._features(p) for p in batch["payload"].to_pylist()]
        return pa.table(
            {
                "media_id": batch["media_id"],
                "media_type": batch["media_type"],
                "features": pa.array(
                    [f.tolist() for f in feats], type=pa.list_(pa.float64())
                ),
            }
        )


def decode_media(
    ds: "rd.Dataset",
    impl: str = "fake",
    batch_size: int = 64,  # small: payloads dominate memory
    concurrency=None,
) -> "rd.Dataset":
    from mimirsbrunn_ray.context import pool_size

    return ds.map_batches(
        MediaDecoder,
        fn_constructor_kwargs={"impl": impl},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency if concurrency is not None else (1, pool_size()),
    )
