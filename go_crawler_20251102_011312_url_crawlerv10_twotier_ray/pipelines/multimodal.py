"""Multimodal-column plumbing: opaque binary payloads through actor-pool
map_batches stages.

The container has no image/audio codecs, so the DECODE step is stubbed
behind an import-gate (a deterministic fake stands in; install Pillow and
``DecodeAndFeaturize(strict_real=True)`` switches to the ``real_decode``
codec path — same output contract, per-payload error isolation) — but
everything Ray-side is real and tested: binary-column batching with small batch sizes for wide rows, typed
metadata schema, actor-pool signature with per-actor setup, stable output
layout. The payload column used here is the synthetic corpus's ``html``
binary column (same Arrow plumbing as image/audio bytes).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

from ._schema import auto_pool as _auto_pool

FEATURE_DIM = 16

MEDIA_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("n_bytes", pa.int64()),
        ("format", pa.string()),
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("feat_crc", pa.int64()),
        ("features", pa.list_(pa.float32())),
    ]
)


def fake_decode(payload: bytes) -> tuple[str, int, int, int, np.ndarray]:
    """Deterministic stand-in decode: (format, width, height, feat_crc,
    features). feat_crc is an exact int64 checksum of the feature source
    words — the value-hashable scalar the driver oracle compares (float
    features can't round-trip through SQL exactly)."""
    d = hashlib.shake_256(payload).digest(FEATURE_DIM * 4 + 8)
    width = 64 + d[0] % 192
    height = 64 + d[1] % 192
    fmt = ("jpeg", "png", "webp")[d[2] % 3]
    words = np.frombuffer(d[8:], dtype=np.uint32)
    feats = words.astype(np.float32) / np.float32(2**32)
    crc = int(words.astype(np.uint64).sum())
    return fmt, width, height, crc, feats


def _real_decode_available() -> bool:
    try:
        import PIL.Image  # noqa: F401

        return True
    except ImportError:
        return False


def real_decode(payload: bytes) -> tuple[str, int, int, int, np.ndarray]:
    """Actual codec decode (requires Pillow): same output contract as
    fake_decode. Features are a FEATURE_DIM-cell grayscale thumbnail
    (mean-pooled), feat_crc an exact integer checksum of the scaled cells.
    Payloads that fail to decode (e.g. the synthetic corpus's html bytes)
    come back as ("error", 0, 0, 0, zeros) rather than poisoning the
    batch — at 100 TB a bad byte-run must never kill the stage."""
    import io

    import PIL.Image

    try:
        with PIL.Image.open(io.BytesIO(payload)) as im:
            fmt = (im.format or "unknown").lower()
            width, height = im.size
            side = int(np.sqrt(FEATURE_DIM))
            gray = np.asarray(
                im.convert("L").resize((side, side)), dtype=np.float32
            ).reshape(-1)[:FEATURE_DIM]
            feats = gray / np.float32(255.0)
            crc = int(np.round(gray).astype(np.uint64).sum())
            return fmt, width, height, crc, feats
    except Exception:
        return "error", 0, 0, 0, np.zeros(FEATURE_DIM, dtype=np.float32)


class DecodeAndFeaturize:
    """Actor-pool stage: decode binary payload → (dims, feature vector).

    Real decoders would be loaded once per actor here (the expensive-setup
    pattern); without codecs in the container, a deterministic fake derives
    dims/features from a blake2b digest of the payload, keeping the stage
    fully testable and reproducible. Use small ``batch_size`` for wide
    binary rows so batch × concurrency fits worker heaps.
    """

    def __init__(self, strict_real: bool = False):
        self.has_real = _real_decode_available()
        if strict_real and not self.has_real:
            raise NotImplementedError(
                "real image decode requires Pillow, which is not installed; "
                "run with strict_real=False for the deterministic stub"
            )
        # selected ONCE per actor (the setup-once pattern); fake unless the
        # caller explicitly asked for the codec path — the driver oracle is
        # minted against the deterministic stub
        self._decode = real_decode if strict_real else fake_decode

    def __call__(self, t: pa.Table) -> pa.Table:
        urls = t["url"].to_pylist()
        payloads = t["html"].to_pylist()
        fmts, ws, hs, crcs, feats = [], [], [], [], []
        for p in payloads:
            p = p or b""
            f, w, h, c, v = self._decode(p)
            fmts.append(f)
            ws.append(w)
            hs.append(h)
            crcs.append(c)
            feats.append(v.tolist())
        return pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "n_bytes": pa.array([len(p or b"") for p in payloads], pa.int64()),
                "format": pa.array(fmts, pa.string()),
                "width": pa.array(ws, pa.int32()),
                "height": pa.array(hs, pa.int32()),
                "feat_crc": pa.array(crcs, pa.int64()),
                "features": pa.array(feats, pa.list_(pa.float32())),
            }
        )


def media_features(corpus_dir: str, concurrency=None) -> pd.DataFrame:
    """Decode/featurize every payload in a corpus pages table. Actor pool +
    small batches (wide binary rows). Default concurrency is an
    autoscaling (2, cpus//2) pool — decode is the bottleneck tier at
    scale and must not pin to a fixed pool size (monitor.go:57-107)."""
    from ..sources.pages import read_pages

    ds = read_pages(corpus_dir, columns=["url", "html"])
    out = (
        ds.map_batches(
            DecodeAndFeaturize,
            batch_format="pyarrow",
            batch_size=32,          # binary rows are wide — keep batches small
            concurrency=concurrency or _auto_pool(),
        )
        .to_pandas()
        .sort_values("url")
        .reset_index(drop=True)
    )
    return out


# ---------------------------------------------------------------------------
# resize + frame-sample stages (aspect-fit / stride sampling on decoded
# metadata — exact integer semantics so the driver oracle is plain SQL over
# the minted oracle_media table)
# ---------------------------------------------------------------------------

RESIZE_BOX = 224       # aspect-fit target box (out dims = dim*BOX // max(w,h))
FRAME_BASE = 8         # synthetic "video" length: FRAME_BASE + n_bytes % 56
FRAME_MOD = 56
FRAME_STRIDE = 4       # sample every 4th frame
FRAME_CRC_MOD = 2147483647


class ResizeToBox:
    """Actor-pool stage: decode payload → aspect-fit resize plan for a
    RESIZE_BOX square. With a real codec the resampled pixels would be
    produced here (setup-once per actor); without one, the stage computes
    the exact output geometry — integer-exact, so it value-hashes against
    SQL over the minted decode table. out_dim = dim * BOX // max(w, h)."""

    def __init__(self):
        self.has_real = _real_decode_available()

    def __call__(self, t: pa.Table) -> pa.Table:
        urls = t["url"].to_pylist()
        payloads = t["html"].to_pylist()
        ws, hs, ows, ohs, scales = [], [], [], [], []
        for p in payloads:
            _, w, h, _, _ = fake_decode(p or b"")
            m = max(w, h)
            ws.append(w)
            hs.append(h)
            ows.append(w * RESIZE_BOX // m)
            ohs.append(h * RESIZE_BOX // m)
            scales.append(RESIZE_BOX * 100 // m)
        return pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "width": pa.array(ws, pa.int32()),
                "height": pa.array(hs, pa.int32()),
                "out_w": pa.array(ows, pa.int64()),
                "out_h": pa.array(ohs, pa.int64()),
                "scale_pct": pa.array(scales, pa.int64()),
            }
        )


class FrameSample:
    """Actor-pool stage: treat each payload as an n-frame clip
    (n = FRAME_BASE + n_bytes % FRAME_MOD) and emit every FRAME_STRIDE-th
    frame as its own row — the one-to-many explode shape of real video
    frame sampling, with a deterministic per-frame checksum derived from
    the decoded feature checksum."""

    def __call__(self, t: pa.Table) -> pa.Table:
        urls = t["url"].to_pylist()
        payloads = t["html"].to_pylist()
        out_u, out_i, out_c = [], [], []
        for u, p in zip(urls, payloads):
            p = p or b""
            _, _, _, crc, _ = fake_decode(p)
            n_frames = FRAME_BASE + len(p) % FRAME_MOD
            idxs = np.arange(0, n_frames, FRAME_STRIDE, dtype=np.int64)
            out_u.extend([u] * len(idxs))
            out_i.extend(idxs.tolist())
            out_c.extend(((crc * 31 + idxs) % FRAME_CRC_MOD).tolist())
        return pa.table(
            {
                "url": pa.array(out_u, pa.string()),
                "frame_idx": pa.array(out_i, pa.int64()),
                "frame_crc": pa.array(out_c, pa.int64()),
            }
        )


def media_resize(corpus_dir: str, concurrency=None) -> pd.DataFrame:
    from ..sources.pages import read_pages

    return (
        read_pages(corpus_dir, columns=["url", "html"])
        .map_batches(ResizeToBox, batch_format="pyarrow", batch_size=32,
                     concurrency=concurrency or _auto_pool())
        .to_pandas()
        .sort_values("url")
        .reset_index(drop=True)
    )


def media_frame_sample(corpus_dir: str, concurrency=None) -> pd.DataFrame:
    from ..sources.pages import read_pages

    return (
        read_pages(corpus_dir, columns=["url", "html"])
        .map_batches(FrameSample, batch_format="pyarrow", batch_size=32,
                     concurrency=concurrency or _auto_pool())
        .to_pandas()
        .sort_values(["url", "frame_idx"])
        .reset_index(drop=True)
    )
