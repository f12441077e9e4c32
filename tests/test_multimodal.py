"""Multimodal-stage tests: deterministic stub semantics, the strict_real
codec gate, and the real-codec contract (conditional — runs only if Pillow
is present; the shipped container has no codec, which the gate test
asserts honestly)."""

import numpy as np
import pyarrow as pa
import pytest

from go_crawler_20251102_011312_url_crawlerv10_twotier_ray.pipelines.multimodal import (
    FEATURE_DIM,
    FRAME_BASE,
    FRAME_MOD,
    FRAME_STRIDE,
    DecodeAndFeaturize,
    FrameSample,
    _real_decode_available,
    fake_decode,
    real_decode,
)

# a valid 1x1 red PNG, byte-literal (no codec needed to EMIT it; decoding
# it exercises the real-codec path when Pillow is installed)
PNG_1x1 = bytes.fromhex(
    "89504e470d0a1a0a0000000d49484452000000010000000108020000009077"
    "53de0000000c4944415408d763f8cfc000000301010018dd8db00000000049"
    "454e44ae426082"
)


def _batch(payloads):
    return pa.table(
        {
            "url": pa.array([f"u{i}" for i in range(len(payloads))]),
            "html": pa.array(payloads, pa.binary()),
        }
    )


def test_fake_decode_deterministic():
    a = fake_decode(b"hello world")
    b = fake_decode(b"hello world")
    assert a[:4] == b[:4]
    assert np.array_equal(a[4], b[4])
    assert len(a[4]) == FEATURE_DIM
    assert a[0] in ("jpeg", "png", "webp")


def test_stub_stage_batch_contract():
    out = DecodeAndFeaturize()(_batch([b"x", b"", b"y" * 100]))
    assert out.num_rows == 3
    assert out["n_bytes"].to_pylist() == [1, 0, 100]
    assert all(w >= 64 for w in out["width"].to_pylist())


def test_frame_sample_explode_shape():
    p = b"z" * 10
    out = FrameSample()(_batch([p]))
    n_frames = FRAME_BASE + len(p) % FRAME_MOD
    assert out.num_rows == len(range(0, n_frames, FRAME_STRIDE))
    assert out["frame_idx"].to_pylist()[0] == 0


@pytest.mark.skipif(_real_decode_available(),
                    reason="Pillow present — strict gate opens")
def test_strict_real_gate_raises_without_codec():
    with pytest.raises(NotImplementedError, match="Pillow"):
        DecodeAndFeaturize(strict_real=True)


@pytest.mark.skipif(not _real_decode_available(),
                    reason="Pillow not installed in this container")
def test_real_decode_png():
    fmt, w, h, crc, feats = real_decode(PNG_1x1)
    assert (fmt, w, h) == ("png", 1, 1)
    assert len(feats) == FEATURE_DIM
    # garbage bytes must not raise — per-payload error isolation
    assert real_decode(b"not an image")[0] == "error"
    out = DecodeAndFeaturize(strict_real=True)(_batch([PNG_1x1, b"junk"]))
    assert out["format"].to_pylist() == ["png", "error"]
