"""spatial x tensor guard + the upstream-miscompile canary.

Discovered building the combined-axes dryrun (round 5): under jax 0.9.0,
GSPMD miscompiles a convolution whose input is SPATIALLY sharded (halo
exchange over H) while its kernel is FEATURE-sharded — the output comes
back multiplied by the feature-axis size (a spurious all-reduce in the
halo path; 1x1 convs, which need no halo, are exact). In-model this
surfaced as a silent 2e-4 loss divergence that persisted at float64, i.e.
wrong math, not rounding. ``make_mesh`` therefore refuses
``spatial > 1 and tensor > 1``.

The canary test pins the CORRECT semantics and is marked strict-xfail:
while the upstream bug exists it "passes" as xfail; the day a jax upgrade
fixes partitioning, it XPASSes and turns the suite red — the signal to
lift the guard in parallel/mesh.py and re-enable the combined axes.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from vae_channel_dynamics_tpu.parallel import make_mesh


def test_make_mesh_refuses_spatial_x_tensor():
    with pytest.raises(ValueError, match="spatial.*tensor|tensor.*spatial"):
        make_mesh(8, spatial=2, tensor=2)


def _conv(x, k):
    return jax.lax.conv_general_dilated(
        x, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
    )


@pytest.mark.xfail(
    strict=True,
    reason="jax 0.9.0 GSPMD: halo-exchange conv with feature-sharded "
    "kernel is scaled by the feature-axis size; when this XPASSes, lift "
    "the spatial x tensor guard in parallel/mesh.py",
)
def test_halo_conv_with_feature_sharded_kernel_is_exact():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    # smallest shape showing the property (CLAUDE.md: keep mesh-compile
    # tests tiny): 2 batch x 16x16 x 16ch, 3x3 kernel, 2x2x2 mesh
    mesh = Mesh(
        np.array(jax.devices()[:8]).reshape(2, 2, 2),
        ("data", "spatial", "tensor"),
    )
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 16, 16, 16)).astype(np.float32)
    k = rng.standard_normal((3, 3, 16, 16)).astype(np.float32) * 0.1
    repl = NamedSharding(mesh, P())
    ref = np.asarray(
        jax.device_get(
            jax.jit(_conv)(jax.device_put(x, repl), jax.device_put(k, repl))
        )
    )
    out = np.asarray(
        jax.device_get(
            jax.jit(_conv)(
                jax.device_put(x, NamedSharding(mesh, P("data", "spatial"))),
                jax.device_put(
                    k, NamedSharding(mesh, P(None, None, None, "tensor"))
                ),
            )
        )
    )
    np.testing.assert_allclose(out, ref, rtol=1e-5)


def test_no_halo_conv_with_feature_sharded_kernel_is_exact():
    """The 1x1 (halo-free) case IS exact — pins that the guard's scope is
    the halo path specifically, not feature sharding in general."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = Mesh(
        np.array(jax.devices()[:8]).reshape(2, 2, 2),
        ("data", "spatial", "tensor"),
    )
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 16, 16, 16)).astype(np.float32)
    k = rng.standard_normal((1, 1, 16, 16)).astype(np.float32) * 0.1
    repl = NamedSharding(mesh, P())
    ref = np.asarray(
        jax.device_get(
            jax.jit(_conv)(jax.device_put(x, repl), jax.device_put(k, repl))
        )
    )
    out = np.asarray(
        jax.device_get(
            jax.jit(_conv)(
                jax.device_put(x, NamedSharding(mesh, P("data", "spatial"))),
                jax.device_put(
                    k, NamedSharding(mesh, P(None, None, None, "tensor"))
                ),
            )
        )
    )
    np.testing.assert_allclose(out, ref, rtol=1e-5)
