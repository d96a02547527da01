"""Pallas fused GroupNorm(+SiLU): forward and gradient parity vs XLA path.

Runs in interpreter mode on CPU; the same kernels compile natively on TPU."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vae_channel_dynamics_tpu.ops.group_norm import _group_norm_xla
from vae_channel_dynamics_tpu.ops.pallas_group_norm import (
    eligible,
    group_norm_silu,
)

B, H, W, C, G = 2, 8, 16, 128, 32


@pytest.fixture(scope="module")
def data():
    k = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(k, 3)
    x = jax.random.normal(k1, (B, H, W, C), jnp.float32) * 2.0 + 0.5
    scale = jax.random.normal(k2, (C,)) * 0.5 + 1.0
    bias = jax.random.normal(k3, (C,)) * 0.2
    return x, scale, bias


def test_eligibility():
    x = jnp.zeros((2, 8, 16, 128))
    assert eligible(x, 32, "pallas")
    assert not eligible(jnp.zeros((2, 8, 16, 64)), 32, "pallas")  # C not lane-aligned
    assert not eligible(jnp.zeros((2, 8, 16)), 32, "pallas")  # not 4D


@pytest.mark.parametrize("fuse_silu", [False, True])
def test_forward_matches_xla(data, fuse_silu):
    x, scale, bias = data
    ref = _group_norm_xla(x, scale, bias, G, 1e-6, fuse_silu)
    out = group_norm_silu(x, scale, bias, G, 1e-6, fuse_silu)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5
    )


@pytest.mark.parametrize("fuse_silu", [False, True])
def test_gradients_match_xla(data, fuse_silu):
    x, scale, bias = data

    def loss_pallas(x, s, b):
        y = group_norm_silu(x, s, b, G, 1e-6, fuse_silu)
        return jnp.sum(y * jnp.cos(y))  # nontrivial downstream

    def loss_xla(x, s, b):
        y = _group_norm_xla(x, s, b, G, 1e-6, fuse_silu)
        return jnp.sum(y * jnp.cos(y))

    gp = jax.grad(loss_pallas, argnums=(0, 1, 2))(x, scale, bias)
    gx = jax.grad(loss_xla, argnums=(0, 1, 2))(x, scale, bias)
    for a, b_, name in zip(gp, gx, ("dx", "dgamma", "dbeta")):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), rtol=5e-4, atol=5e-4,
            err_msg=name,
        )


def test_bf16_io_fp32_stats(data):
    x, scale, bias = data
    out = group_norm_silu(x.astype(jnp.bfloat16), scale, bias, G, 1e-6, True)
    assert out.dtype == jnp.bfloat16
    ref = _group_norm_xla(x.astype(jnp.bfloat16), scale, bias, G, 1e-6, True)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        rtol=2e-2, atol=2e-2,
    )


def test_model_integration_pallas_impl(data):
    """The model's impl='pallas' flag routes norms through the kernel when
    eligible (lane-aligned); non-aligned tiny configs keep the XLA path via
    the group_norm dispatcher's eligibility check."""
    from vae_channel_dynamics_tpu.ops.group_norm import group_norm

    x, scale, bias = data
    out_auto = group_norm(x, scale, bias, G, 1e-6, fuse_silu=True, impl="pallas")
    ref = _group_norm_xla(x, scale, bias, G, 1e-6, True)
    np.testing.assert_allclose(
        np.asarray(out_auto), np.asarray(ref), rtol=2e-5, atol=2e-5
    )


def test_in_kernel_stat_side_output(data):
    """The normalize kernel's |z| side output must equal the hook metric —
    the PRE-SiLU norm output, matching the reference hook placement
    (monitor.py:64-69: on the norm module, before the separate SiLU)."""
    from vae_channel_dynamics_tpu.ops.pallas_group_norm import (
        group_norm_silu_with_stats,
    )
    from vae_channel_dynamics_tpu.ops.stats import (
        mean_abs_activation_per_channel,
    )

    x, scale, bias = data
    y, mean_abs = group_norm_silu_with_stats(x, scale, bias, G, 1e-6, True)
    ref_y = _group_norm_xla(x, scale, bias, G, 1e-6, True)
    ref_z = _group_norm_xla(x, scale, bias, G, 1e-6, False)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref_y), rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(
        np.asarray(mean_abs),
        np.asarray(mean_abs_activation_per_channel(ref_z)),
        rtol=1e-5, atol=1e-6,
    )


def test_stats_variant_gradients(data):
    """group_norm_silu_with_stats is differentiable; the stat output is
    stop-gradient and the y-gradients match the plain kernel's."""
    from vae_channel_dynamics_tpu.ops.pallas_group_norm import (
        group_norm_silu_with_stats,
    )

    x, scale, bias = data

    def loss_stats(x, s, b):
        y, mean_abs = group_norm_silu_with_stats(x, s, b, G, 1e-6, True)
        return jnp.sum(y * jnp.cos(y)) + 0.0 * jnp.sum(mean_abs)

    def loss_plain(x, s, b):
        y = group_norm_silu(x, s, b, G, 1e-6, True)
        return jnp.sum(y * jnp.cos(y))

    gs = jax.grad(loss_stats, argnums=(0, 1, 2))(x, scale, bias)
    gp = jax.grad(loss_plain, argnums=(0, 1, 2))(x, scale, bias)
    for a, b_, name in zip(gs, gp, ("dx", "dgamma", "dbeta")):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), rtol=1e-6, atol=1e-6, err_msg=name
        )


def test_vgroupnorm_pallas_tap_wiring(data):
    """VGroupNorm with impl='pallas' and a mean_abs output tap uses the
    in-kernel side output: same y as the split XLA path, same sown stat."""
    from vae_channel_dynamics_tpu.models.vae import VGroupNorm, flatten_stats

    x, _, _ = data
    cap = (("m.norm", "output", ("mean_abs_activation_per_channel",)),)
    outs = {}
    for impl in ("xla", "pallas"):
        mod = VGroupNorm(
            num_groups=G, eps=1e-6, fuse_silu=True, impl=impl,
            full_name="m.norm", capture=cap,
        )
        v = mod.init({"params": jax.random.PRNGKey(0)}, x)
        y, aux = mod.apply(v, x, mutable=["stats"])
        outs[impl] = (np.asarray(y), flatten_stats(aux["stats"]))
    y_x, s_x = outs["xla"]
    y_p, s_p = outs["pallas"]
    np.testing.assert_allclose(y_p, y_x, rtol=2e-5, atol=2e-5)
    key = "m.norm.output.mean_abs_activation_per_channel"
    assert sorted(s_x) == sorted(s_p) == [key]
    np.testing.assert_allclose(
        np.asarray(s_p[key]), np.asarray(s_x[key]), rtol=1e-5, atol=1e-6
    )


def test_group_norm_rejects_unknown_impl():
    """Typo'd impl strings must error, not silently take the XLA path (the
    user would benchmark/debug the wrong kernel with no signal)."""
    import pytest

    from vae_channel_dynamics_tpu.ops.group_norm import group_norm

    x = jnp.zeros((1, 4, 4, 8), jnp.float32)
    with pytest.raises(ValueError, match="group_norm impl"):
        group_norm(x, jnp.ones(8), jnp.zeros(8), num_groups=2, impl="Pallas")


def test_stats_kernel_respects_tap_mask():
    """group_norm_silu_with_stats weights its per-sample |z| sums by the
    installed batch-validity mask, matching the XLA tap path on padded
    remainder batches."""
    import numpy as np

    from vae_channel_dynamics_tpu.ops import stats as S
    from vae_channel_dynamics_tpu.ops.pallas_group_norm import (
        group_norm_silu_with_stats,
    )

    rng = np.random.default_rng(0)
    valid = rng.normal(size=(2, 8, 16, 128)).astype(np.float32)
    padded = np.concatenate([valid, np.repeat(valid[-1:], 2, axis=0)])
    scale = jnp.asarray(rng.normal(size=128).astype(np.float32))
    bias = jnp.asarray(rng.normal(size=128).astype(np.float32))
    mask = jnp.asarray(np.array([1, 1, 0, 0], np.float32))

    _, ref = group_norm_silu_with_stats(
        jnp.asarray(valid), scale, bias, num_groups=8
    )
    with S.tap_mask(mask):
        _, masked = group_norm_silu_with_stats(
            jnp.asarray(padded), scale, bias, num_groups=8
        )
    np.testing.assert_allclose(
        np.asarray(masked), np.asarray(ref), rtol=3e-6, atol=3e-6
    )


def test_masked_std_is_cancellation_safe():
    """The masked std uses a two-pass formula: a large common mean must not
    cancel away the variance in fp32 (E[x^2]-E[x]^2 would report ~0)."""
    import numpy as np

    from vae_channel_dynamics_tpu.ops import stats as S

    rng = np.random.default_rng(1)
    data = (50.0 + 0.1 * rng.normal(size=(2, 64, 64, 32))).astype(np.float32)
    padded = np.concatenate([data, np.repeat(data[-1:], 2, axis=0)])
    mask = jnp.asarray(np.array([1, 1, 0, 0], np.float32))
    expected = np.std(data.astype(np.float64), ddof=1)
    with S.tap_mask(mask):
        got = float(S.std_activation(jnp.asarray(padded)))
    np.testing.assert_allclose(got, expected, rtol=1e-3)
