"""Native C++ preprocessing kernel: build, correctness vs PIL, speed sanity."""

import os
import time

import numpy as np
import pytest
from PIL import Image

from vae_channel_dynamics_tpu.data import native
from vae_channel_dynamics_tpu.data.pipeline import get_transform


@pytest.fixture(scope="module")
def lib_ok():
    if not native.available():
        pytest.skip("native preprocess library unavailable (no g++?)")
    return True


def test_constant_image_exact(lib_ok):
    img = np.full((48, 64, 3), 200, np.uint8)
    out = native.preprocess_image(img, 16)
    assert out.shape == (16, 16, 3)
    np.testing.assert_allclose(out, (200 / 255 - 0.5) / 0.5, atol=1e-6)


def test_grayscale_broadcast(lib_ok):
    img = np.full((32, 32), 128, np.uint8)
    out = native.preprocess_image(img, 8)
    assert out.shape == (8, 8, 3)
    np.testing.assert_allclose(out[..., 0], out[..., 1])


def test_matches_pil_closely(lib_ok):
    rng = np.random.default_rng(0)
    # smooth image so resampling-kernel differences stay tiny
    base = rng.uniform(0, 255, (8, 10, 3))
    img = np.kron(base, np.ones((16, 16, 1))).astype(np.uint8)  # 128x160
    pil_t = get_transform(64)
    ref = pil_t(Image.fromarray(img))
    out = native.preprocess_image(img, 64)
    assert out.shape == ref.shape
    # same range convention and close values
    assert np.mean(np.abs(out - ref)) < 0.02
    assert np.max(np.abs(out - ref)) < 0.25


def test_pipeline_env_switch(monkeypatch, lib_ok):
    monkeypatch.setenv("VCD_NATIVE_PREPROCESS", "1")
    t = get_transform(16)
    img = np.full((40, 40, 3), 100, np.uint8)
    out = t(Image.fromarray(img))
    assert out.shape == (16, 16, 3)
    np.testing.assert_allclose(out, (100 / 255 - 0.5) / 0.5, atol=1e-6)


def test_faster_than_pil(lib_ok):
    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, (512, 512, 3), np.uint8)
    pil_img = Image.fromarray(img)
    pil_t = get_transform(256)

    # warm both
    pil_t(pil_img)
    native.preprocess_image(img, 256)

    t0 = time.perf_counter()
    for _ in range(5):
        pil_t(pil_img)
    t_pil = time.perf_counter() - t0

    t0 = time.perf_counter()
    for _ in range(5):
        native.preprocess_image(img, 256)
    t_native = time.perf_counter() - t0

    # informational: native should not be slower than ~2x PIL (usually faster)
    assert t_native < t_pil * 2.0, (t_native, t_pil)


@pytest.fixture(scope="module")
def decode_ok():
    if not native.decode_available():
        pytest.skip("native decode unavailable (libjpeg/libpng not linked)")
    return True


def _encoded(arr, fmt, **kw):
    import io

    b = io.BytesIO()
    Image.fromarray(arr).save(b, fmt, **kw)
    return b.getvalue()


def test_decode_png_bit_exact(decode_ok):
    """PNG is lossless and both paths use libpng-compatible decoding, so the
    fused decode+preprocess must equal PIL-decode + native preprocess
    exactly."""
    rng = np.random.default_rng(0)
    arr = rng.integers(0, 256, (96, 128, 3), np.uint8)
    out = native.decode_preprocess(_encoded(arr, "PNG"), 64)
    ref = native.preprocess_image(arr, 64)
    np.testing.assert_array_equal(out, ref)


def test_decode_jpeg_matches_pil_decoder(decode_ok):
    """With DCT scaling off, libjpeg decode must agree with PIL's decode of
    the same bytes (same underlying decoder family)."""
    import io

    rng = np.random.default_rng(1)
    arr = rng.integers(0, 256, (120, 90, 3), np.uint8)
    data = _encoded(arr, "JPEG", quality=95)
    out = native.decode_preprocess(data, 64, dct_scaling=False)
    decoded = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
    ref = native.preprocess_image(decoded, 64)
    np.testing.assert_allclose(out, ref, atol=1e-6)


def test_decode_grayscale_jpeg(decode_ok):
    import io

    rng = np.random.default_rng(2)
    arr = rng.integers(0, 256, (80, 80), np.uint8)
    data = _encoded(arr, "JPEG", quality=95)
    out = native.decode_preprocess(data, 32, dct_scaling=False)
    decoded = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
    ref = native.preprocess_image(decoded, 32)
    np.testing.assert_allclose(out, ref, atol=1e-6)


def test_decode_dct_scaling_close(decode_ok):
    """Reduced-size DCT decode is numerically different but must stay close
    on natural (smooth) content."""
    y, x = np.mgrid[0:640, 0:640] / 640.0
    arr = np.stack(
        [
            127.5 + 120 * np.sin(4 * np.pi * x) * np.cos(3 * np.pi * y),
            127.5 + 120 * np.cos(5 * np.pi * (x + y)),
            255 * x * y,
        ],
        axis=-1,
    ).astype(np.uint8)
    data = _encoded(arr, "JPEG", quality=95)
    full = native.decode_preprocess(data, 256, dct_scaling=False)
    fast = native.decode_preprocess(data, 256, dct_scaling=True)
    rms_8bit = float(np.sqrt(np.mean((full - fast) ** 2)) * 127.5)
    assert rms_8bit < 1.5, rms_8bit


def test_decode_bad_bytes_raises(decode_ok):
    with pytest.raises(RuntimeError):
        native.decode_preprocess(b"not an image at all....", 32)


def test_transform_uses_native_decode(monkeypatch, decode_ok, tmp_path):
    """The pipeline transform routes lazy file-backed PIL images and raw
    paths/bytes through the fused native decode."""
    rng = np.random.default_rng(4)
    arr = rng.integers(0, 256, (100, 140, 3), np.uint8)
    path = tmp_path / "img.png"
    Image.fromarray(arr).save(path)
    monkeypatch.setenv("VCD_NATIVE_PREPROCESS", "1")
    t = get_transform(48)
    expected = native.preprocess_image(arr, 48)
    for item in (str(path), path.read_bytes(), Image.open(str(path))):
        np.testing.assert_array_equal(t(item), expected)
    # PIL fallback still handles the same inputs when native is off
    monkeypatch.setenv("VCD_NATIVE_PREPROCESS", "0")
    t_pil = get_transform(48)
    for item in (str(path), path.read_bytes()):
        out = t_pil(item)
        assert out.shape == (48, 48, 3)
