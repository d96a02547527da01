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
