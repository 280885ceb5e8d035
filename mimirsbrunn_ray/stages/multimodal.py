"""Multimodal columns: opaque binary payloads with typed metadata.

Images/audio/video are carried as ``binary`` columns next to metadata
(media_type, width/height/duration); decode / feature-extract / resize /
frame-sample run as actor-pool ``map_batches`` stages with SMALL batch
sizes (payload bytes dominate block size — the "very wide rows" rule,
SURVEY.md §7.6).

Decode kernels (all pure numpy, no codec libraries needed):
  * ``impl="real"`` — REAL decoders for two standard uncompressed
    formats: 24-bit BMP (BITMAPINFOHEADER, bottom-up BGR rows with 4-byte
    padding) and PCM16 WAV (RIFF fmt/data chunks). Features are computed
    from the DECODED pixels/samples.
  * ``impl="fake"`` — deterministic pseudo-features straight from payload
    bytes (kept for synthetic corpora without headers).
  * ``impl="pillow"`` etc. still raise NotImplementedError (no codec libs
    in this container).
"""

from __future__ import annotations

import struct

import numpy as np
import pyarrow as pa
import ray.data as rd


# ---------------------------------------------------------------------------
# pure-numpy codecs: 24-bit BMP and PCM16 WAV (public formats; layouts per
# the published Windows BITMAP structures / RIFF WAVE spec)
# ---------------------------------------------------------------------------


def encode_bmp(pixels: np.ndarray) -> bytes:
    """(H, W, 3) uint8 RGB -> 24-bit uncompressed BMP bytes."""
    h, w, c = pixels.shape
    assert c == 3 and pixels.dtype == np.uint8
    row_bytes = w * 3
    pad = (-row_bytes) % 4
    # bottom-up rows, BGR order, each row padded to 4 bytes
    bgr = pixels[::-1, :, ::-1]
    rows = np.zeros((h, row_bytes + pad), dtype=np.uint8)
    rows[:, :row_bytes] = bgr.reshape(h, row_bytes)
    body = rows.tobytes()
    pixel_offset = 14 + 40
    file_size = pixel_offset + len(body)
    header = struct.pack("<2sIHHI", b"BM", file_size, 0, 0, pixel_offset)
    info = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0
    )
    return header + info + body


def decode_bmp(payload: bytes) -> np.ndarray:
    """24-bit uncompressed BMP bytes -> (H, W, 3) uint8 RGB."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    pixel_offset = struct.unpack_from("<I", payload, 10)[0]
    (hdr_size, w, h, _planes, bpp, comp) = struct.unpack_from(
        "<IiiHHI", payload, 14
    )
    if bpp != 24 or comp != 0:
        raise ValueError(f"unsupported BMP: bpp={bpp} compression={comp}")
    row_bytes = w * 3
    stride = row_bytes + ((-row_bytes) % 4)
    flip = h > 0  # positive height = bottom-up rows
    h = abs(h)
    rows = np.frombuffer(
        payload, dtype=np.uint8, count=h * stride, offset=pixel_offset
    ).reshape(h, stride)[:, :row_bytes]
    img = rows.reshape(h, w, 3)[:, :, ::-1]  # BGR -> RGB
    return img[::-1] if flip else img


def encode_wav(samples: np.ndarray, rate: int = 16_000) -> bytes:
    """int16 mono samples -> PCM16 WAV bytes."""
    assert samples.dtype == np.int16
    data = samples.tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)
    out = b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data))
    out += b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    out += b"data" + struct.pack("<I", len(data)) + data
    return out


def decode_wav(payload: bytes) -> tuple[int, np.ndarray]:
    """PCM16 WAV bytes -> (sample_rate, int16 samples)."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a WAV payload")
    pos, rate, samples = 12, None, None
    while pos + 8 <= len(payload):
        cid, size = struct.unpack_from("<4sI", payload, pos)
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            audio_fmt, _ch, rate, _br, _ba, bits = struct.unpack_from(
                "<HHIIHH", body, 0
            )
            if audio_fmt != 1 or bits != 16:
                raise ValueError(
                    f"unsupported WAV: format={audio_fmt} bits={bits}"
                )
        elif cid == b"data":
            samples = np.frombuffer(body, dtype=np.int16)
        pos += 8 + size + (size % 2)
    if rate is None or samples is None:
        raise ValueError("WAV missing fmt/data chunk")
    return rate, samples

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


def synth_real_media_table(n: int, seed: int = 23) -> pa.Table:
    """Deterministic corpus of REAL media payloads: alternating 24-bit BMP
    images and PCM16 WAV clips, encodable/decodable byte-exactly."""
    rng = np.random.default_rng(seed)
    ids, types, payloads, ws, hs = [], [], [], [], []
    for i in range(n):
        if i % 2 == 0:
            w, h = int(rng.integers(4, 24)), int(rng.integers(4, 24))
            img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
            payloads.append(encode_bmp(img))
            types.append("image/bmp")
            ws.append(w)
            hs.append(h)
        else:
            n_samp = int(rng.integers(64, 512))
            samples = rng.integers(
                -32768, 32768, size=n_samp, dtype=np.int16
            )
            payloads.append(encode_wav(samples))
            types.append("audio/wav")
            ws.append(n_samp)
            hs.append(1)
        ids.append(f"media-{i:06d}")
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

    ``impl="real"``: decode BMP pixels / WAV samples with the pure-numpy
    codecs above (dispatch on media_type), features = 32-bin histogram of
    the DECODED data. ``impl="fake"``: deterministic features straight
    from payload bytes. Setup belongs in __init__, per the actor rule.
    """

    def __init__(self, impl: str = "fake"):
        if impl not in ("fake", "real"):
            raise NotImplementedError(
                f"media decode impl {impl!r}: no codec libraries in this "
                "container; use 'real' (numpy BMP/WAV) or 'fake'."
            )
        self.impl = impl

    def _features(self, payload: bytes, media_type: str) -> np.ndarray:
        if self.impl == "real":
            if media_type == "image/bmp":
                img = decode_bmp(payload)
                hist = np.bincount(
                    (img.reshape(-1) >> 3), minlength=FEATURE_DIM
                )[:FEATURE_DIM]
                return (hist / max(1, img.size)).astype(np.float64)
            if media_type == "audio/wav":
                _rate, samples = decode_wav(payload)
                if len(samples) == 0:
                    return np.zeros(FEATURE_DIM)
                # 16-bit samples -> 32 equal-width amplitude bins
                bins = ((samples.astype(np.int32) + 32768) >> 11).clip(
                    0, FEATURE_DIM - 1
                )
                hist = np.bincount(bins, minlength=FEATURE_DIM)[:FEATURE_DIM]
                return (hist / len(samples)).astype(np.float64)
            raise ValueError(f"no real decoder for media_type {media_type!r}")
        arr = np.frombuffer(payload[4:], dtype=np.uint8)
        if len(arr) == 0:
            return np.zeros(FEATURE_DIM)
        hist = np.bincount(arr >> 3, minlength=FEATURE_DIM)[:FEATURE_DIM]
        return (hist / max(1, len(arr))).astype(np.float64)

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = [
            self._features(p, t)
            for p, t in zip(
                batch["payload"].to_pylist(), batch["media_type"].to_pylist()
            )
        ]
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


# ---------------------------------------------------------------------------
# resize + frame-sample stages (real math over the numpy codecs above)
# ---------------------------------------------------------------------------


def resize_rgb(img: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Nearest-neighbor resize, pure numpy (one gather per axis)."""
    h, w, _ = img.shape
    rows = (np.arange(out_h) * h // out_h).clip(0, h - 1)
    cols = (np.arange(out_w) * w // out_w).clip(0, w - 1)
    return img[rows][:, cols]


class MediaResizer:
    """Actor-pool stage: re-encode every BMP payload at (out_w, out_h).

    Non-image payloads pass through untouched. Small batches — decoded
    pixels dominate memory, the SURVEY §7.6 "very wide rows" rule.
    """

    def __init__(self, out_w: int, out_h: int):
        self.out_w = out_w
        self.out_h = out_h

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"].to_pylist()
        types = batch["media_type"].to_pylist()
        have_dims = "width" in batch.schema.names
        old_w = batch["width"].to_pylist() if have_dims else [None] * len(types)
        old_h = batch["height"].to_pylist() if have_dims else [None] * len(types)
        out, ws, hs = [], [], []
        for p, t, ow, oh in zip(payloads, types, old_w, old_h):
            if t == "image/bmp":
                out.append(
                    encode_bmp(resize_rgb(decode_bmp(p), self.out_w, self.out_h))
                )
                ws.append(self.out_w)
                hs.append(self.out_h)
            else:
                # non-image rows pass through UNTOUCHED, metadata included
                # (audio stores its sample count in width)
                out.append(p)
                ws.append(ow)
                hs.append(oh)
        cols = {name: batch[name] for name in batch.schema.names}
        cols["payload"] = pa.array(out, type=pa.binary())
        if have_dims:
            cols["width"] = pa.array(ws, type=pa.int32())
            cols["height"] = pa.array(hs, type=pa.int32())
        return pa.table(cols)


def resize_media(ds: "rd.Dataset", out_w: int, out_h: int,
                 batch_size: int = 64, concurrency=None) -> "rd.Dataset":
    from mimirsbrunn_ray.context import pool_size

    return ds.map_batches(
        MediaResizer,
        fn_constructor_kwargs={"out_w": out_w, "out_h": out_h},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency if concurrency is not None else (1, pool_size()),
    )


# "video": an uncompressed frame stack — 4-byte little-endian frame count,
# then each frame as a self-describing BMP (its header carries file_size).
# A synthetic container: no video codec ships in this sandbox, but the
# SAMPLING plumbing (container walk, per-frame row fan-out, small batches)
# is exactly what a real codec would slot into.
VIDEO_STACK_TYPE = "video/x-bmp-stack"


def encode_bmp_stack(frames) -> bytes:
    out = [struct.pack("<I", len(frames))]
    for f in frames:
        out.append(encode_bmp(f))
    return b"".join(out)


def iter_bmp_stack(payload: bytes):
    """Yield (frame_index, bmp_bytes) without decoding pixel data."""
    (n,) = struct.unpack_from("<I", payload, 0)
    pos = 4
    for i in range(n):
        if payload[pos : pos + 2] != b"BM":
            raise ValueError(f"corrupt frame stack at frame {i}")
        (size,) = struct.unpack_from("<I", payload, pos + 2)
        yield i, payload[pos : pos + size]
        pos += size


class FrameSampler:
    """Actor-pool stage: explode every video payload into one row per
    SAMPLED frame (every ``k``-th, always including frame 0). Output rows:
    (media_id, frame_index, media_type='image/bmp', payload=<bmp>)."""

    def __init__(self, every_k: int):
        if every_k < 1:
            raise ValueError("every_k must be >= 1")
        self.k = every_k

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, fidx, frames = [], [], []
        for mid, mtype, payload in zip(
            batch["media_id"].to_pylist(),
            batch["media_type"].to_pylist(),
            batch["payload"].to_pylist(),
        ):
            if mtype != VIDEO_STACK_TYPE:
                continue
            for i, bmp in iter_bmp_stack(payload):
                if i % self.k == 0:
                    ids.append(mid)
                    fidx.append(i)
                    frames.append(bmp)
        return pa.table(
            {
                "media_id": pa.array(ids, type=pa.string()),
                "frame_index": pa.array(fidx, type=pa.int32()),
                "media_type": pa.array(
                    ["image/bmp"] * len(ids), type=pa.string()
                ),
                "payload": pa.array(frames, type=pa.binary()),
            }
        )


def sample_frames(ds: "rd.Dataset", every_k: int = 2,
                  batch_size: int = 16, concurrency=None) -> "rd.Dataset":
    from mimirsbrunn_ray.context import pool_size

    return ds.map_batches(
        FrameSampler,
        fn_constructor_kwargs={"every_k": every_k},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency if concurrency is not None else (1, pool_size()),
    )


def ahash64(img: np.ndarray) -> int:
    """Perceptual average-hash of an RGB image (the classic aHash):
    grayscale -> TRUE AREA-MEAN downsample to 8x8 (every source pixel
    contributes to its cell's mean — a nearest-neighbor sample would tie
    each bit to one pixel and lose the noise robustness) -> threshold
    each cell at the global mean -> 64 bits row-major. Small pixel
    noise, re-encodes, and mild rescales keep the hash within a few
    bits, so Hamming distance <= ~10 flags perceptual duplicates that
    byte-exact dedup misses. Pure numpy; deterministic."""
    gray = img.astype(np.float64) @ np.asarray([0.299, 0.587, 0.114])
    h, w = gray.shape
    # area means via two reduceat passes over near-equal row/col spans
    rb = (np.arange(8) * h) // 8
    cb = (np.arange(8) * w) // 8
    sums = np.add.reduceat(np.add.reduceat(gray, rb, axis=0), cb, axis=1)
    counts = np.outer(
        np.diff(np.append(rb, h)), np.diff(np.append(cb, w))
    )
    small = sums / counts
    bits = (small >= small.mean()).ravel()
    return int(
        np.bitwise_or.reduce(
            bits.astype(np.uint64) << np.arange(64, dtype=np.uint64)
        )
    )


class ImageAHasher:
    """Actor-pool stage: media payloads -> 64-bit perceptual hash rows —
    aHash for BMP images, energy-envelope hash for WAV clips; other
    media types pass through with a NULL hash (schema-stable across
    mixed batches). The hash column feeds the same hash-bucket dedup
    shuffles as text SimHash — perceptual media dedup composes from
    existing pieces (bucket by hash, verify by Hamming distance)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        hashes = []
        for payload, mtype in zip(
            batch["payload"].to_pylist(), batch["media_type"].to_pylist()
        ):
            if mtype == "image/bmp" and payload:
                hashes.append(
                    np.uint64(ahash64(decode_bmp(payload))).view(np.int64)
                )
            elif mtype == "audio/wav" and payload:
                hashes.append(
                    np.uint64(
                        wavhash64(decode_wav(payload)[1])
                    ).view(np.int64)
                )
            else:
                hashes.append(None)
        return pa.table(
            {
                "media_id": batch["media_id"],
                "media_type": batch["media_type"],
                "ahash": pa.array(
                    [None if h is None else int(h) for h in hashes],
                    pa.int64(),
                ),
            }
        )


def image_ahashes(ds: "rd.Dataset", batch_size: int = 64,
                  concurrency=None) -> "rd.Dataset":
    from mimirsbrunn_ray.context import pool_size

    return ds.map_batches(
        ImageAHasher,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency if concurrency is not None else (1, pool_size()),
    )


def wavhash64(samples: np.ndarray) -> int:
    """Perceptual audio hash — the aHash idea on the ENERGY ENVELOPE:
    the PCM16 clip is split into 64 near-equal segments (reduceat, every
    sample contributes), each segment's mean absolute amplitude is
    thresholded at the global envelope mean -> 64 bits. Robust to small
    additive noise and re-encodes; a different clip's loud/quiet shape
    differs -> large Hamming distance. Pure numpy; deterministic.
    Clips shorter than 64 samples repeat-pad to one sample per segment."""
    a = np.abs(samples.astype(np.float64))
    if len(a) == 0:
        return 0
    if len(a) < 64:
        a = np.pad(a, (0, 64 - len(a)), mode="edge")
    sb = (np.arange(64) * len(a)) // 64
    sums = np.add.reduceat(a, sb)
    counts = np.diff(np.append(sb, len(a)))
    env = sums / counts
    bits = env >= env.mean()
    return int(
        np.bitwise_or.reduce(
            bits.astype(np.uint64) << np.arange(64, dtype=np.uint64)
        )
    )
