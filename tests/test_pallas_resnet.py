"""Fused GroupNorm+SiLU+conv3x3 Pallas kernels vs the XLA reference.

Runs in interpreter mode on CPU (conftest forces JAX_PLATFORMS=cpu); the
same kernel code compiles via Mosaic on TPU. Reference semantics: the
model's own XLA ops (ops/group_norm + lax.conv_general_dilated), i.e. the
production default path the fused kernels must match.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vae_channel_dynamics_tpu.ops.group_norm import _group_norm_xla
from vae_channel_dynamics_tpu.ops.pallas_resnet import (
    eligible,
    gn_silu_conv3x3,
)

N, H, W, CIN, COUT, GROUPS = 2, 8, 16, 128, 128, 8


def _inputs(cout=COUT, dtype=jnp.float32, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal((N, H, W, CIN)), dtype)
    gamma = jnp.asarray(rng.uniform(0.5, 1.5, (CIN,)), jnp.float32)
    beta = jnp.asarray(rng.uniform(-0.2, 0.2, (CIN,)), jnp.float32)
    w = jnp.asarray(
        rng.standard_normal((3, 3, CIN, cout)) / np.sqrt(9 * CIN), dtype
    )
    b = jnp.asarray(rng.uniform(-0.1, 0.1, (cout,)), jnp.float32)
    res = jnp.asarray(rng.standard_normal((N, H, W, cout)), dtype)
    return x, gamma, beta, w, b, res


def _reference(x, gamma, beta, w, b, residual=None):
    s = _group_norm_xla(x, gamma, beta, GROUPS, 1e-6, fuse_silu=True)
    y = jax.lax.conv_general_dilated(
        s, w.astype(x.dtype), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=jax.lax.Precision.HIGHEST,
    ) + b.astype(x.dtype)
    if residual is not None:
        y = y + residual
    return y


def test_eligibility():
    x = jnp.zeros((N, H, W, CIN))
    assert eligible(x, COUT, GROUPS)
    assert not eligible(jnp.zeros((N, H, W, 96)), COUT, GROUPS)  # lanes
    assert not eligible(x, 96, GROUPS)
    assert not eligible(jnp.zeros((N, 7, W, CIN)), COUT, GROUPS)  # rows
    assert not eligible(jnp.zeros((N, H, W)), COUT, GROUPS)


def test_forward_matches_xla():
    x, gamma, beta, w, b, _ = _inputs()
    y, tap, moments = gn_silu_conv3x3(
        x, gamma, beta, w, b, num_groups=GROUPS
    )
    ref = _reference(x, gamma, beta, w, b)
    np.testing.assert_allclose(
        np.asarray(y), np.asarray(ref), rtol=2e-4, atol=2e-4
    )
    assert tap is None and moments is None


def test_forward_residual_and_rect_channels():
    x, gamma, beta, w, b, res = _inputs(cout=256)
    y, _, _ = gn_silu_conv3x3(
        x, gamma, beta, w, b, num_groups=GROUPS, residual=res
    )
    ref = _reference(x, gamma, beta, w, b, residual=res)
    np.testing.assert_allclose(
        np.asarray(y), np.asarray(ref), rtol=2e-4, atol=2e-4
    )


def test_tap_matches_hook_metric():
    x, gamma, beta, w, b, _ = _inputs()
    _, tap, _ = gn_silu_conv3x3(
        x, gamma, beta, w, b, num_groups=GROUPS, emit_tap=True
    )
    # reference hook metric: |gn output| (pre-SiLU), per channel
    z = _group_norm_xla(x, gamma, beta, GROUPS, 1e-6, fuse_silu=False)
    expected = np.sum(np.abs(np.asarray(z, np.float32)), axis=(1, 2))
    np.testing.assert_allclose(np.asarray(tap), expected, rtol=1e-4)


def test_moments_match_output():
    x, gamma, beta, w, b, res = _inputs()
    y, _, (ysum, ysq) = gn_silu_conv3x3(
        x, gamma, beta, w, b, num_groups=GROUPS, residual=res,
        emit_moments=True,
    )
    yf = np.asarray(y, np.float32)
    np.testing.assert_allclose(
        np.asarray(ysum), yf.sum(axis=(1, 2)), rtol=1e-3, atol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(ysq), (yf * yf).sum(axis=(1, 2)), rtol=1e-3, atol=1e-3
    )


@pytest.mark.parametrize("with_residual", [False, True])
def test_gradients_match_xla(with_residual):
    x, gamma, beta, w, b, res = _inputs()
    residual = res if with_residual else None

    def loss_fused(x, gamma, beta, w, b, residual):
        y, _, _ = gn_silu_conv3x3(
            x, gamma, beta, w, b, num_groups=GROUPS, residual=residual,
            emit_tap=True, emit_moments=True,
        )
        return jnp.sum(jnp.sin(y.astype(jnp.float32)))

    def loss_ref(x, gamma, beta, w, b, residual):
        y = _reference(x, gamma, beta, w, b, residual)
        return jnp.sum(jnp.sin(y.astype(jnp.float32)))

    argnums = (0, 1, 2, 3, 4) + ((5,) if with_residual else ())
    g_fused = jax.grad(loss_fused, argnums=argnums)(
        x, gamma, beta, w, b, residual
    )
    g_ref = jax.grad(loss_ref, argnums=argnums)(
        x, gamma, beta, w, b, residual
    )
    names = ["dx", "dgamma", "dbeta", "dw", "db", "dres"]
    for name, gf, gr in zip(names, g_fused, g_ref):
        gf, gr = np.asarray(gf, np.float32), np.asarray(gr, np.float32)
        scale = max(np.abs(gr).max(), 1e-6)
        np.testing.assert_allclose(
            gf / scale, gr / scale, rtol=0, atol=5e-4, err_msg=name
        )


def test_gradients_rect_channels():
    x, gamma, beta, w, b, res = _inputs(cout=256)

    def loss(fn):
        def inner(x, w):
            y = fn(x, w)
            return jnp.sum(jnp.cos(y.astype(jnp.float32)))
        return inner

    fused = loss(
        lambda x, w: gn_silu_conv3x3(
            x, gamma, beta, w, b, num_groups=GROUPS, residual=res
        )[0]
    )
    ref = loss(lambda x, w: _reference(x, gamma, beta, w, b, res))
    gx_f, gw_f = jax.grad(fused, argnums=(0, 1))(x, w)
    gx_r, gw_r = jax.grad(ref, argnums=(0, 1))(x, w)
    for gf, gr in [(gx_f, gx_r), (gw_f, gw_r)]:
        gf, gr = np.asarray(gf, np.float32), np.asarray(gr, np.float32)
        scale = max(np.abs(gr).max(), 1e-6)
        np.testing.assert_allclose(gf / scale, gr / scale, rtol=0, atol=5e-4)


# --------------------------------------------------------------------------- #
# ResnetBlock2D integration: impl="fused" vs the XLA block
# --------------------------------------------------------------------------- #
def _block_outputs(impl, capture=(), in_ch=128, out_ch=256, seed=0):
    from vae_channel_dynamics_tpu.models.vae import (
        ResnetBlock2D,
        flatten_stats,
    )

    rng = np.random.default_rng(seed)
    x = jnp.asarray(
        rng.standard_normal((2, 8, 16, in_ch)), jnp.bfloat16
    )
    blk = ResnetBlock2D(
        in_channels=in_ch, out_channels=out_ch, num_groups=GROUPS,
        dtype=jnp.bfloat16, impl=impl, full_name="blk", capture=capture,
    )
    variables = blk.init({"params": jax.random.PRNGKey(7)}, x)
    y, aux = blk.apply(variables, x, mutable=["stats"])
    stats = flatten_stats(aux.get("stats", {}))
    return x, blk, variables, y, stats


_BLOCK_CAPTURE = (
    ("blk.norm1", "output", ("mean_abs_activation_per_channel",)),
    ("blk.norm2", "output", ("mean_abs_activation_per_channel",)),
    ("blk.norm2", "input", ("mean_abs_activation_per_channel",)),
)


def test_block_fused_matches_xla():
    _, _, _, y_ref, s_ref = _block_outputs("xla", _BLOCK_CAPTURE)
    _, _, _, y_fused, s_fused = _block_outputs("fused", _BLOCK_CAPTURE)
    yr = np.asarray(y_ref, np.float32)
    yf = np.asarray(y_fused, np.float32)
    assert np.abs(yr - yf).max() / np.abs(yr).max() < 2e-2  # bf16 roundoff
    assert sorted(s_ref) == sorted(s_fused)
    for key in s_ref:
        np.testing.assert_allclose(
            np.asarray(s_fused[key], np.float32),
            np.asarray(s_ref[key], np.float32),
            rtol=2e-2, atol=2e-3, err_msg=key,
        )


def test_block_fused_gradients():
    x, blk_ref, v_ref, _, _ = _block_outputs("xla")
    _, blk_fused, v_fused, _, _ = _block_outputs("fused")
    # identical init (same RNG/param paths)
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b)
        ),
        v_ref["params"], v_fused["params"],
    )

    def loss(blk, variables, x):
        y = blk.apply(variables, x)
        return jnp.mean(jnp.square(y.astype(jnp.float32)))

    g_ref = jax.grad(lambda v: loss(blk_ref, v, x))(v_ref)["params"]
    g_fused = jax.grad(lambda v: loss(blk_fused, v, x))(v_fused)["params"]

    flat_r = jax.tree_util.tree_leaves_with_path(g_ref)
    flat_f = dict(jax.tree_util.tree_leaves_with_path(g_fused))
    for path, gr in flat_r:
        gf = flat_f[path]
        gr = np.asarray(gr, np.float32)
        gf = np.asarray(gf, np.float32)
        scale = max(np.abs(gr).max(), 1e-6)
        np.testing.assert_allclose(
            gf / scale, gr / scale, rtol=0, atol=5e-2,
            err_msg=jax.tree_util.keystr(path),
        )


def test_block_fused_falls_back_on_unsupported_capture():
    from vae_channel_dynamics_tpu.models.vae import ResnetBlock2D

    def make(capture):
        return ResnetBlock2D(
            in_channels=128, out_channels=128, num_groups=GROUPS,
            dtype=jnp.bfloat16, impl="fused", full_name="blk",
            capture=capture,
        )

    x = jnp.zeros((2, 8, 16, 128), jnp.bfloat16)
    # conv1.input is never materialized by the fused path -> must fall back
    assert not make(
        (("blk.conv1", "input", ("mean_abs_activation_per_channel",)),)
    )._fused_ok(x)
    # full_activation_map of a norm output is also not emittable in-kernel
    assert not make(
        (("blk.norm1", "output", ("full_activation_map",)),)
    )._fused_ok(x)
    # ...but the supported taps keep the fused path on
    assert make(_BLOCK_CAPTURE)._fused_ok(x)
    # ineligible channel count (not lane-aligned) -> fallback
    blk4 = ResnetBlock2D(
        in_channels=96, out_channels=96, num_groups=GROUPS,
        dtype=jnp.bfloat16, impl="fused", full_name="blk",
    )
    assert not blk4._fused_ok(jnp.zeros((2, 8, 16, 96), jnp.bfloat16))
    # f32 compute keeps HIGHEST-precision XLA convs -> fallback
    blk5 = ResnetBlock2D(
        in_channels=128, out_channels=128, num_groups=GROUPS,
        dtype=jnp.float32, impl="fused", full_name="blk",
    )
    assert not blk5._fused_ok(jnp.zeros((2, 8, 16, 128)))


def test_bf16_forward_close():
    x, gamma, beta, w, b, _ = _inputs(dtype=jnp.bfloat16)
    y, _, _ = gn_silu_conv3x3(x, gamma, beta, w, b, num_groups=GROUPS)
    ref = _reference(
        x.astype(jnp.float32), gamma, beta,
        w.astype(jnp.float32), b,
    )
    err = np.abs(
        np.asarray(y, np.float32) - np.asarray(ref, np.float32)
    ).max()
    assert err < 0.1, err  # bf16 accumulation tolerance


def test_block_fused_remat_conv_saves_fused_outputs():
    """remat='conv' + impl='fused': the fused kernels' outputs must carry
    the checkpoint_name('conv_out') tag so save_only_these_names keeps them
    (without the tag, backward recomputes BOTH fused kernels — full-remat
    cost, contradicting the documented selective-remat behavior)."""
    import jax.ad_checkpoint
    from vae_channel_dynamics_tpu.models.vae import _resnet_remat_cls

    in_ch, out_ch = 128, 256
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((2, 8, 16, in_ch)), jnp.bfloat16)
    cls = _resnet_remat_cls("conv")
    blk = cls(
        in_channels=in_ch, out_channels=out_ch, num_groups=GROUPS,
        dtype=jnp.bfloat16, impl="fused", full_name="blk", capture=(),
    )
    variables = blk.init({"params": jax.random.PRNGKey(7)}, x)
    assert blk._fused_ok(x) if hasattr(blk, "_fused_ok") else True

    def f(v, x):
        return jnp.sum(blk.apply(v, x).astype(jnp.float32))

    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        jax.ad_checkpoint.print_saved_residuals(f, variables, x)
    saved = buf.getvalue()
    # the intermediate fused gn+silu+conv output (h, tagged 'conv_out' in
    # _forward_fused) is saved for the backward pass — i.e. backward does
    # NOT recompute the first fused kernel. (The block's final output is
    # the remat boundary's output, never a residual; and the print shows
    # the tagged value by its producing op + source line, so we match on
    # the producing frame and shape.)
    assert "ResnetBlock2D._forward_fused" in saved, saved
    assert "bf16[2,8,16,256]" in saved, saved

    # and gradients still match the unrematted fused block exactly
    from vae_channel_dynamics_tpu.models.vae import ResnetBlock2D

    plain = ResnetBlock2D(
        in_channels=in_ch, out_channels=out_ch, num_groups=GROUPS,
        dtype=jnp.bfloat16, impl="fused", full_name="blk", capture=(),
    )
    g_remat = jax.grad(f)(variables, x)["params"]
    g_plain = jax.grad(
        lambda v, x: jnp.sum(plain.apply(v, x).astype(jnp.float32))
    )(variables, x)["params"]
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(
            np.asarray(a, np.float32), np.asarray(b, np.float32)
        ),
        g_remat, g_plain,
    )


def test_dw_cout_split_is_lane_aligned():
    """The dW kernel's output-channel split must keep cout_tile a multiple
    of LANE (Mosaic rejects non-lane-multiple block dims on real TPU; CPU
    interpret mode would hide it). cout=384 is the trap: blind halving
    yields a 96-wide tile."""
    from vae_channel_dynamics_tpu.ops.pallas_resnet import (
        LANE,
        _pick_cout_split,
    )

    for cin in (128, 256, 384, 512, 640):
        for cout in (128, 256, 384, 512, 640):
            split = _pick_cout_split(cin, cout)
            assert cout % split == 0
            assert (cout // split) % LANE == 0, (cin, cout, split)
    # pow2 behavior unchanged from the original halving loop
    assert _pick_cout_split(512, 512) == 4
    assert _pick_cout_split(256, 256) == 1
    # 384 picks the divisor-of-3 split the halving loop could not
    assert _pick_cout_split(384, 384) == 3


def test_eligible_checks_backward_direction():
    """eligible() must reject shapes whose FORWARD tiles but whose
    backward input-gradient conv (channels swapped) does not — otherwise
    jax.grad dies on the tiler assert after eligible() said yes."""
    from vae_channel_dynamics_tpu.ops.pallas_resnet import (
        _pick_tile_h,
        eligible,
    )

    # find a (cin, cout) pair asymmetric enough that only one direction
    # tiles at this spatial size; if none exists the invariant is vacuous
    h, w = 2, 256
    found = False
    for cin, cout in ((128, 768), (128, 1024), (256, 640), (256, 768)):
        fwd = _pick_tile_h(h, w, cin, cout)
        bwd = _pick_tile_h(h, w, cout, cin)
        if fwd is not None and bwd is None:
            found = True
            x = jnp.zeros((1, h, w, cin), jnp.bfloat16)
            assert not eligible(x, cout, num_groups=8), (cin, cout)
    assert found, "no direction-asymmetric shape found; widen the sweep"


def test_installed_mesh_must_divide_batch():
    """A stale installed mesh that does not divide a >1 batch raises a
    trace-time error naming set_shard_mesh (the silent local fallback left
    GSPMD an unpartitionable custom call); batch-1 init traces are exempt."""
    from vae_channel_dynamics_tpu.ops import pallas_resnet

    mesh = jax.sharding.Mesh(np.array(jax.devices()[:8]).reshape(8), ("data",))
    cin = cout = 128
    x2 = jnp.zeros((2, 4, 16, cin), jnp.float32)
    kernel = jnp.zeros((3, 3, cin, cout), jnp.float32)
    gamma = jnp.ones(cin)
    beta = jnp.zeros(cin)
    bias = jnp.zeros(cout)
    pallas_resnet.set_shard_mesh(mesh)
    try:
        with pytest.raises(ValueError, match="set_shard_mesh"):
            pallas_resnet.gn_silu_conv3x3(
                x2, gamma, beta, kernel, bias, num_groups=8
            )
        # batch 1 (init trace) stays on the local kernel without error
        y, _, _ = pallas_resnet.gn_silu_conv3x3(
            x2[:1], gamma, beta, kernel, bias, num_groups=8
        )
        assert y.shape == (1, 4, 16, cout)
    finally:
        pallas_resnet.set_shard_mesh(None)
