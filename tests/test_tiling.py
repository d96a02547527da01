"""Tiled + sliced VAE inference (models/tiling.py, wrapper enable_tiling/
enable_slicing) — the diffusers AutoencoderKL API the reference's wrapped
model carries (src/models/sdxl_vae_wrapper.py:31-34 wraps AutoencoderKL,
whose enable_tiling/enable_slicing are part of its public surface)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vae_channel_dynamics_tpu.models.tiling import (
    sliced_apply,
    tile_starts,
    tiled_apply,
)
from vae_channel_dynamics_tpu.models.vae import VAEConfig
from vae_channel_dynamics_tpu.models.wrapper import SDXLVAEWrapper


# --------------------------------------------------------------------- #
# Engine-level: grid planning


def test_tile_starts_exact_grid():
    # 96 with tile 64 stride 48: diffusers grid 0,48 — second tile clamped
    # from 48 to 32 (96-64) so shapes stay static.
    assert tile_starts(96, 64, 48) == [0, 32]
    # Image no larger than the tile: single whole tile.
    assert tile_starts(64, 64, 48) == [0]
    assert tile_starts(32, 64, 48) == [0]
    # Perfect fit: starts land unclamped.
    assert tile_starts(112, 64, 48) == [0, 48]
    assert tile_starts(160, 64, 48) == [0, 48, 96]


def test_tile_starts_validation():
    with pytest.raises(ValueError):
        tile_starts(100, 64, 65)  # stride > tile
    with pytest.raises(ValueError):
        tile_starts(100, 0, 1)


# --------------------------------------------------------------------- #
# Engine-level: identity function must reassemble the input bit-exactly.
# Blending lerps between two tiles that both hold the true pixels, so any
# grid (incl. clamped last tiles) must reproduce x exactly — this pins the
# offset arithmetic of cells, blends, and clamped tiles in one shot.


@pytest.mark.parametrize(
    "h,w",
    [
        (112, 112),  # unclamped 2x2 grid
        (96, 96),  # clamped last tiles
        (160, 112),  # 3x2, mixed
        (112, 64),  # tiled along H only
        (64, 96),  # tiled along W only, clamped
    ],
)
def test_tiled_identity_reassembles_exactly(h, w):
    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(2, h, w, 3)).astype(np.float32)
    )
    y = tiled_apply(lambda t: t, x, tile_in=64, stride_in=48, scale_num=1, scale_den=1)
    np.testing.assert_array_equal(np.asarray(y), np.asarray(x))


def test_tiled_scaling_identity_downsample():
    # A scale-changing fn (2x2 mean-pool, scale 1/2) that is translation-
    # equivariant on aligned tiles: tiled result == direct result exactly
    # (all tile/stride/size divisible by 2, tiles aligned to the pool grid).
    def pool(t):
        n, hh, ww, c = t.shape
        return t.reshape(n, hh // 2, 2, ww // 2, 2, c).mean(axis=(2, 4))

    x = jnp.asarray(
        np.random.default_rng(1).normal(size=(1, 112, 112, 2)).astype(np.float32)
    )
    y = tiled_apply(pool, x, tile_in=64, stride_in=48, scale_num=1, scale_den=2)
    np.testing.assert_allclose(np.asarray(y), np.asarray(pool(x)), rtol=0, atol=1e-6)


def test_tiled_scaling_identity_upsample():
    # Nearest 2x upsample (scale 2/1): same equivariance argument.
    def up(t):
        return jnp.repeat(jnp.repeat(t, 2, axis=1), 2, axis=2)

    x = jnp.asarray(
        np.random.default_rng(2).normal(size=(1, 96, 112, 2)).astype(np.float32)
    )
    y = tiled_apply(up, x, tile_in=64, stride_in=48, scale_num=2, scale_den=1)
    np.testing.assert_allclose(np.asarray(y), np.asarray(up(x)), rtol=0, atol=1e-6)


def test_tiled_divisibility_validation():
    x = jnp.zeros((1, 100, 100, 1))
    with pytest.raises(ValueError):
        tiled_apply(lambda t: t, x, 64, 48, 1, 8)  # 100 not divisible by 8


def test_sliced_apply_matches_batched():
    # Per-sample fn (no cross-batch coupling): sliced == batched bit-exactly.
    def fn(t):
        return jnp.tanh(t) * 2.0

    x = jnp.asarray(
        np.random.default_rng(3).normal(size=(3, 8, 8, 2)).astype(np.float32)
    )
    np.testing.assert_array_equal(np.asarray(sliced_apply(fn, x)), np.asarray(fn(x)))


# --------------------------------------------------------------------- #
# Wrapper-level on the tiny VAE


@pytest.fixture(scope="module")
def tiny_wrapper():
    return SDXLVAEWrapper(config=VAEConfig.tiny(), seed=0)


def test_wrapper_tiling_small_image_is_bit_identical(tiny_wrapper):
    w = tiny_wrapper
    x = jnp.asarray(
        np.random.default_rng(4).normal(size=(1, 16, 16, 3)).astype(np.float32) * 0.5
    )
    z_ref = w.encode(x, deterministic=True)
    img_ref = w.decode(z_ref)
    w.enable_tiling(tile_sample_min_size=32, tile_overlap_factor=0.25)
    try:
        # 16px image <= 32px tile: the tiled program is the untiled one.
        z = w.encode(x, deterministic=True)
        img = w.decode(z)
    finally:
        w.disable_tiling()
    np.testing.assert_array_equal(np.asarray(z), np.asarray(z_ref))
    np.testing.assert_array_equal(np.asarray(img), np.asarray(img_ref))


def _numpy_tiled_oracle(fn, x, tile, stride, out_scale):
    """Independent eager re-implementation of the tiled algorithm: per-tile
    fn calls (no lax.map), blending and assembly in numpy. Mirrors diffusers
    tiled_decode's structure (blend_v/blend_h against un-blended neighbors,
    stride-sized cells), generalized to clamped last tiles."""
    n, h, w_, _ = x.shape
    sh = tile_starts(h, tile, stride)
    sw = tile_starts(w_, tile, stride)
    to = tile * out_scale
    so = stride * out_scale
    blend = to - so
    grid = [
        [np.asarray(fn(x[:, i : i + tile, j : j + tile, :])) for j in sw]
        for i in sh
    ]
    sh_o, sw_o = [s * out_scale for s in sh], [s * out_scale for s in sw]
    cells_h = [(k * so, min((k + 1) * so, h * out_scale)) for k in range(len(sh) - 1)]
    cells_h.append(((len(sh) - 1) * so, h * out_scale))
    cells_w = [(k * so, min((k + 1) * so, w_ * out_scale)) for k in range(len(sw) - 1)]
    cells_w.append(((len(sw) - 1) * so, w_ * out_scale))

    def blend_axis(prev, cur, axis, cur_lo, prev_lo):
        out = cur.copy()
        for y in range(blend):
            t = y / blend
            idx_c = [slice(None)] * cur.ndim
            idx_p = [slice(None)] * cur.ndim
            idx_c[axis] = cur_lo + y
            idx_p[axis] = prev_lo + y
            out[tuple(idx_c)] = prev[tuple(idx_p)] * (1 - t) + cur[tuple(idx_c)] * t
        return out

    rows = []
    for i in range(len(sh)):
        row = []
        for j in range(len(sw)):
            t = grid[i][j]
            if i > 0 and blend > 0:
                t = blend_axis(
                    grid[i - 1][j], t, 1,
                    cells_h[i][0] - sh_o[i], cells_h[i][0] - sh_o[i - 1],
                )
            if j > 0 and blend > 0:
                t = blend_axis(
                    grid[i][j - 1], t, 2,
                    cells_w[j][0] - sw_o[j], cells_w[j][0] - sw_o[j - 1],
                )
            row.append(
                t[
                    :,
                    cells_h[i][0] - sh_o[i] : cells_h[i][1] - sh_o[i],
                    cells_w[j][0] - sw_o[j] : cells_w[j][1] - sw_o[j],
                    :,
                ]
            )
        rows.append(np.concatenate(row, axis=2))
    return np.concatenate(rows, axis=1)


def test_tiled_decode_matches_eager_oracle(tiny_wrapper):
    # The compiled lax.map engine against an independent numpy/eager
    # re-implementation, with the REAL tiny-VAE decoder as the tile fn —
    # pins tile sweep order, offsets, blending, and assembly end-to-end.
    w = tiny_wrapper
    module = w._module()
    f = w.spatial_factor

    def decode_fn(t):
        return module.apply(
            {"params": w.params}, t, method=lambda m, v: m.decoder(m.post_quant_conv(v))
        )

    z = jnp.asarray(
        np.random.default_rng(6).normal(
            size=(1, 40, 48, w.config.latent_channels)
        ).astype(np.float32)
    )
    got = tiled_apply(decode_fn, z, tile_in=16, stride_in=12, scale_num=f, scale_den=1)
    want = _numpy_tiled_oracle(decode_fn, np.asarray(z), 16, 12, f)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5, rtol=0)


def test_wrapper_tiled_shapes_and_finiteness(tiny_wrapper):
    w = tiny_wrapper
    x = jnp.asarray(
        np.random.default_rng(7).normal(size=(1, 64, 64, 3)).astype(np.float32) * 0.5
    )
    w.enable_tiling(tile_sample_min_size=32, tile_overlap_factor=0.25)
    try:
        z = w.encode(x, deterministic=True)
        img = w.decode(z)
    finally:
        w.disable_tiling()
    f = w.spatial_factor
    assert z.shape == (1, 64 // f, 64 // f, w.config.latent_channels)
    assert img.shape == x.shape
    assert np.isfinite(np.asarray(img)).all()
    assert float(jnp.max(jnp.abs(img))) <= 1.0  # clamp applied after assembly


def test_wrapper_slicing_is_bit_identical(tiny_wrapper):
    # GroupNorm/conv act per-sample, so slicing changes nothing numerically.
    w = tiny_wrapper
    x = jnp.asarray(
        np.random.default_rng(5).normal(size=(3, 32, 32, 3)).astype(np.float32) * 0.5
    )
    z_ref = w.encode(x, deterministic=True)
    img_ref = w.decode(z_ref)
    w.enable_slicing()
    try:
        z = w.encode(x, deterministic=True)
        img = w.decode(z)
    finally:
        w.disable_slicing()
    np.testing.assert_allclose(np.asarray(z), np.asarray(z_ref), atol=1e-5, rtol=0)
    np.testing.assert_allclose(np.asarray(img), np.asarray(img_ref), atol=1e-5, rtol=0)


def test_wrapper_tiling_validation(tiny_wrapper):
    w = tiny_wrapper
    with pytest.raises(ValueError):
        w.enable_tiling(tile_sample_min_size=33)  # not divisible by factor 2
    with pytest.raises(ValueError):
        w.enable_tiling(tile_sample_min_size=32, tile_overlap_factor=1.5)
    assert not w.use_tiling


def test_serve_cli_tiled_reconstruct(tmp_path):
    from vae_channel_dynamics_tpu import serve
    from vae_channel_dynamics_tpu.models import io as model_io

    w = SDXLVAEWrapper(config=VAEConfig.tiny(), seed=2)
    model_io.save_model_dir(str(tmp_path / "vae"), w.config, w.params)
    out = tmp_path / "recon"
    rc = serve.main(
        [
            "--checkpoint_path", str(tmp_path),
            "--input", "synthetic://shapes?num_samples=3",
            "--output", str(out),
            "--resolution", "64",
            "--batch_size", "2",
            "--tile_size", "32",
            "--slicing",
        ]
    )
    assert rc == 0
    assert len(sorted(out.glob("recon_*.png"))) == 3
    import json

    metrics = json.loads((out / "serve_metrics.json").read_text())
    assert np.isfinite(metrics["avg_mse"])


def test_tiled_decode_memory_is_tile_bound(tiny_wrapper):
    # The point of tiling: compiled temp memory tracks the TILE, not the
    # image. Compare XLA's memory analysis for an untiled vs tiled decode of
    # the same 128px (64x64-latent) image on the tiny model.
    w = tiny_wrapper
    z = jnp.zeros((1, 64, 64, w.config.latent_channels), jnp.float32)

    def lower(tiling):
        w.use_tiling = tiling
        w.tile_sample_min_size, w.tile_overlap_factor = 32, 0.25
        key = ("decode",) + w._inference_key()
        w._jit_cache.pop(key, None)
        w.decode(z)  # populate cache (executes; cheap on tiny model)
        return w._jit_cache[key]

    try:
        untiled = lower(False).lower(w.params, z).compile().memory_analysis()
        tiled = lower(True).lower(w.params, z).compile().memory_analysis()
    finally:
        w.disable_tiling()
    if untiled is None or getattr(untiled, "temp_size_in_bytes", 0) in (0, None):
        pytest.skip("memory analysis not available on this backend")
    # 64-latent image in 16-latent tiles: per-tile activations are ~1/16 of
    # the full image's; allow generous slack for the assembled output buffer.
    assert tiled.temp_size_in_bytes < 0.5 * untiled.temp_size_in_bytes
