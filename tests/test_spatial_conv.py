"""parallel.spatial_conv: shard_map — manual halo-exchange convolutions.

ops/spatial_conv.py routes the spatial axis of every conv around GSPMD
(whose jax-0.9.0 halo partitioner miscompiles three ways — canaries in
tests/test_spatial_tensor_guard.py). These tests pin that the manual path
is exact where GSPMD is wrong, for every conv geometry the model uses,
at the op level and through the full train/eval steps — including the
formerly-refused ``spatial x tensor`` mesh and ZeRO-3-sharded params on a
spatial mesh WITHOUT the compute-time re-replication workaround.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from vae_channel_dynamics_tpu.models.vae import AutoencoderKL, VAEConfig
from vae_channel_dynamics_tpu.ops.spatial_conv import (
    halo_conv,
    spatial_conv_scope,
)
from vae_channel_dynamics_tpu.parallel import make_mesh
from vae_channel_dynamics_tpu.parallel.mesh import (
    batch_sharding,
    replicated_sharding,
)
from vae_channel_dynamics_tpu.parallel.zero import state_shardings
from vae_channel_dynamics_tpu.training import (
    TrainState,
    build_optimizer,
    make_eval_step,
    make_train_step,
)

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)

# every conv geometry in the model: (kernel_hw, strides, padding, dilated)
GEOMETRIES = [
    pytest.param((3, 3), (1, 1), ((1, 1), (1, 1)), False, id="3x3-s1"),
    pytest.param((3, 3), (2, 2), ((0, 1), (0, 1)), False, id="down-3x3-s2"),
    pytest.param((1, 1), (1, 1), ((0, 0), (0, 0)), False, id="1x1"),
    pytest.param((4, 4), (1, 1), ((2, 2), (2, 2)), True, id="up-4x4-dil2"),
]


def _oracle(x, k, strides, padding, dilated):
    return lax.conv_general_dilated(
        x, k, strides, padding,
        lhs_dilation=(2, 2) if dilated else (1, 1),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=lax.Precision.HIGHEST,
    )


def _data(kh, kw, seed=0, C=4, O=6):
    rng = np.random.default_rng(seed)
    x = rng.standard_normal((2, 16, 16, C)).astype(np.float32)
    k = rng.standard_normal((kh, kw, C, O)).astype(np.float32) * 0.2
    return jnp.asarray(x), jnp.asarray(k)


@pytest.mark.parametrize("khw,strides,padding,dilated", GEOMETRIES)
def test_halo_conv_matches_global_conv(khw, strides, padding, dilated):
    """Forward AND both gradients match the global conv for every model
    geometry, on a data x spatial mesh."""
    mesh = Mesh(np.array(jax.devices()[:8]).reshape(2, 4), ("data", "spatial"))
    x, k = _data(*khw)

    def halo(x_, k_):
        return halo_conv(
            x_, k_, strides=strides, padding=padding, mesh=mesh,
            precision=lax.Precision.HIGHEST,
            lhs_dilation=(2, 2) if dilated else None,
        )

    y_ref = _oracle(x, k, strides, padding, dilated)
    xs = jax.device_put(x, NamedSharding(mesh, P("data", "spatial")))
    ks = jax.device_put(k, NamedSharding(mesh, P()))
    y = jax.jit(halo)(xs, ks)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), atol=1e-5)

    def loss(f):
        return lambda x_, k_: jnp.sum(jnp.sin(f(x_, k_)))

    g_ref = jax.grad(loss(lambda a, b: _oracle(a, b, strides, padding, dilated)),
                     argnums=(0, 1))(x, k)
    g = jax.jit(jax.grad(loss(halo), argnums=(0, 1)))(xs, ks)
    np.testing.assert_allclose(np.asarray(g[0]), np.asarray(g_ref[0]), rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(np.asarray(g[1]), np.asarray(g_ref[1]), rtol=1e-5, atol=1e-4)


@pytest.mark.parametrize(
    "mesh_shape,mesh_axes,kspec,xspec",
    [
        pytest.param(
            (4, 2), ("spatial", "tensor"), P(None, None, None, "tensor"),
            P(None, "spatial"), id="spatialxtensor-O-sharded-kernel",
        ),
        pytest.param(
            (2, 2, 2), ("data", "spatial", "unused"), P(),
            P("data", "spatial"), id="unused-mesh-axis",
        ),
        pytest.param(
            (2, 4), ("data", "spatial"), P(None, None, None, "data"),
            P("data", "spatial"), id="zero3-kernel-over-data",
        ),
    ],
)
def test_halo_conv_exact_under_gspmd_miscompile_meshes(
    mesh_shape, mesh_axes, kspec, xspec
):
    """The three scenarios where GSPMD's halo partitioner is WRONG
    (strict-xfail canaries in test_spatial_tensor_guard.py) are exact
    under the manual path — forward and both gradients."""
    mesh = Mesh(np.array(jax.devices()[:8]).reshape(*mesh_shape), mesh_axes)
    x, k = _data(3, 3, seed=1, C=4, O=4)
    strides, padding = (1, 1), ((1, 1), (1, 1))

    def halo(x_, k_):
        return halo_conv(
            x_, k_, strides=strides, padding=padding, mesh=mesh,
            precision=lax.Precision.HIGHEST,
        )

    y_ref = _oracle(x, k, strides, padding, False)
    g_ref = jax.grad(
        lambda a, b: jnp.sum(_oracle(a, b, strides, padding, False) ** 2),
        argnums=(0, 1),
    )(x, k)
    xs = jax.device_put(x, NamedSharding(mesh, xspec))
    ks = jax.device_put(k, NamedSharding(mesh, kspec))
    y = jax.jit(halo)(xs, ks)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), atol=1e-5)
    g = jax.jit(
        jax.grad(lambda a, b: jnp.sum(halo(a, b) ** 2), argnums=(0, 1))
    )(xs, ks)
    np.testing.assert_allclose(np.asarray(g[0]), np.asarray(g_ref[0]), rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(np.asarray(g[1]), np.asarray(g_ref[1]), rtol=1e-5, atol=1e-4)


def test_halo_conv_rejects_unsupported_geometry():
    mesh = Mesh(np.array(jax.devices()[:8]).reshape(2, 4), ("data", "spatial"))
    x, k = _data(5, 5)
    with pytest.raises(ValueError, match="shard evenly|right halo"):
        # 5x5 stride-1 pad-1 shrinks the output (H_out=14): rows cannot
        # shard uniformly — rejected with guidance, never silently wrong
        halo_conv(x, k, strides=(1, 1), padding=((1, 1), (1, 1)), mesh=mesh)
    with pytest.raises(ValueError, match="not divisible"):
        x2 = jnp.zeros((2, 18, 16, 4), jnp.float32)
        halo_conv(
            x2, jnp.zeros((3, 3, 4, 4), jnp.float32),
            strides=(1, 1), padding=((1, 1), (1, 1)), mesh=mesh,
        )


def test_make_mesh_spatial_x_tensor_requires_shard_map():
    with pytest.raises(ValueError, match="spatial_conv"):
        make_mesh(8, spatial=2, tensor=2)  # gspmd default still refuses
    mesh = make_mesh(8, spatial=2, tensor=2, spatial_conv="shard_map")
    assert dict(zip(mesh.axis_names, mesh.devices.shape))["spatial"] == 2
    with pytest.raises(ValueError, match="spatial_conv"):
        make_mesh(8, spatial=2, spatial_conv="nonsense")


# ---------------------------------------------------------------------------
# full-model step parity


def _tiny_params():
    cfg = VAEConfig.tiny()
    module = AutoencoderKL(config=cfg)
    params = module.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
        jnp.zeros((1, 16, 16, 3)),
        sample_posterior=False,
    )["params"]
    return module, jax.device_get(params)


def _batch(n=4, seed=0):
    rng = np.random.default_rng(seed)
    return {
        "pixel_values": rng.uniform(-1, 1, (n, 16, 16, 3)).astype(np.float32)
    }, np.ones(n, np.float32)


def _run_steps(module, params_host, mesh, *, spatial_conv, zero3, n=2):
    tx, _ = build_optimizer(1e-3, warmup_steps=2, max_train_steps=100)
    state = TrainState.create(params_host, tx)
    sh = (
        state_shardings(
            mesh, state, shard_optimizer=zero3, shard_ema=False,
            shard_params=zero3,
        )
        if (zero3 or "tensor" in mesh.axis_names)
        else None
    )
    state = jax.device_put(
        state, sh if sh is not None else replicated_sharding(mesh)
    )
    step = make_train_step(
        module, tx, 1e-6, mesh=mesh, donate=False, state_sharding=sh,
        spatial_conv=spatial_conv,
    )
    batch, mask = _batch(8, seed=5)
    rng = jax.random.PRNGKey(11)
    out = []
    for _ in range(n):
        state, met, _ = step(state, batch, mask, rng)
        out.append(
            (float(met["train_loss_step"]), float(met["grad_norm"]))
        )
    return out, state


@pytest.mark.parametrize("zero3", [False, True], ids=["replicated", "zero3"])
def test_train_step_shard_map_spatial_matches_data_only_mesh(zero3):
    """The shard_map spatial train step (with and WITHOUT re-replication —
    zero3 params stay sharded at compute under shard_map) reproduces the
    plain data-parallel trajectory."""
    module, params_host = _tiny_params()
    ref, _ = _run_steps(
        module, params_host, make_mesh(8), spatial_conv="gspmd", zero3=False
    )
    mesh_sp = make_mesh(8, spatial=2)
    out, state = _run_steps(
        module, params_host, mesh_sp, spatial_conv="shard_map", zero3=zero3
    )
    for (lr_, gr_), (lo, go) in zip(ref, out):
        np.testing.assert_allclose(lo, lr_, rtol=1e-5)
        np.testing.assert_allclose(go, gr_, rtol=1e-4)
    if zero3:
        # the at-rest layout stayed distributed (no re-replication applied)
        assert any(
            not leaf.sharding.is_fully_replicated
            for leaf in jax.tree.leaves(state.params)
        )


def test_train_step_spatial_x_tensor_shard_map_matches_oracle():
    """THE unlock: the formerly-refused spatial x tensor mesh trains with
    the exact replicated-oracle trajectory under shard_map convs — TP
    channel-sharded kernels included (GSPMD canary #1's scenario)."""
    module, params_host = _tiny_params()
    ref, _ = _run_steps(
        module, params_host, make_mesh(8), spatial_conv="gspmd", zero3=False
    )
    mesh_st = make_mesh(8, spatial=2, tensor=2, spatial_conv="shard_map")
    out, state = _run_steps(
        module, params_host, mesh_st, spatial_conv="shard_map", zero3=False
    )
    for (lr_, gr_), (lo, go) in zip(ref, out):
        np.testing.assert_allclose(lo, lr_, rtol=1e-5)
        np.testing.assert_allclose(go, gr_, rtol=1e-4)
    # TP actually sharded the channel axes over the tensor axis
    assert any(
        not leaf.sharding.is_fully_replicated
        for leaf in jax.tree.leaves(state.params)
    )


def test_eval_step_shard_map_spatial_matches_replicated():
    module, params_host = _tiny_params()
    mesh = make_mesh(8, spatial=2)
    eval_r = make_eval_step(module, mesh=make_mesh(8))
    eval_s = make_eval_step(module, mesh=mesh, spatial_conv="shard_map")
    batch, mask = _batch(8, seed=9)
    batch_dev = {"pixel_values": jnp.asarray(batch["pixel_values"])}
    mask_dev = jnp.asarray(mask)
    out_r = eval_r(params_host, batch_dev, mask_dev)
    out_s = eval_s(params_host, batch_dev, mask_dev)
    np.testing.assert_allclose(
        float(out_s["rec_loss_sum"]), float(out_r["rec_loss_sum"]), rtol=1e-5
    )
    np.testing.assert_allclose(
        float(out_s["kl_sum"]), float(out_r["kl_sum"]), rtol=1e-5, atol=1e-6
    )


def test_scope_is_inert_without_spatial_axis():
    """Wrapping with a non-spatial mesh installs nothing — data-only
    meshes keep their exact existing programs."""
    from vae_channel_dynamics_tpu.ops.spatial_conv import active_spatial_mesh

    with spatial_conv_scope(make_mesh(8)):
        assert active_spatial_mesh() is None
    with spatial_conv_scope(None):
        assert active_spatial_mesh() is None
    mesh_sp = make_mesh(8, spatial=2)
    with spatial_conv_scope(mesh_sp):
        assert active_spatial_mesh() is mesh_sp
    assert active_spatial_mesh() is None


@pytest.mark.parametrize("remat", ["full", "conv"], ids=["remat-full", "remat-conv"])
def test_train_step_shard_map_spatial_with_remat_and_bf16(remat):
    """The realistic 1024px scale-out composition: rematerialized resnet
    blocks (jax.checkpoint replays the shard_map halo convs in the
    backward) + bf16 compute + spatial shard_map convs. Loss parity
    against the same-remat same-dtype data-only-mesh step — pins that
    checkpoint-of-shard_map replays correctly and the halo path is
    dtype-clean under bf16."""
    cfg = VAEConfig.tiny()
    import jax.numpy as jnp_

    def build(mesh, spatial_conv):
        module = AutoencoderKL(config=cfg, dtype=jnp_.bfloat16, remat=remat)
        params = module.init(
            {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
            jnp.zeros((1, 16, 16, 3)),
            sample_posterior=False,
        )["params"]
        tx, _ = build_optimizer(1e-3, warmup_steps=2, max_train_steps=100)
        state = jax.device_put(
            TrainState.create(jax.device_get(params), tx),
            replicated_sharding(mesh),
        )
        step = make_train_step(
            module, tx, 1e-6, mesh=mesh, donate=False,
            spatial_conv=spatial_conv,
        )
        return state, step

    batch, mask = _batch(8, seed=13)
    rng = jax.random.PRNGKey(17)
    state_r, step_r = build(make_mesh(8), "gspmd")
    state_s, step_s = build(make_mesh(8, spatial=2), "shard_map")
    for i in range(2):
        state_r, met_r, _ = step_r(state_r, batch, mask, rng)
        state_s, met_s, _ = step_s(state_s, batch, mask, rng)
        np.testing.assert_allclose(
            float(met_s["train_loss_step"]),
            float(met_r["train_loss_step"]),
            rtol=5e-4,  # bf16 compute under different partitionings:
            # reduction-order noise ~1e-4 relative is expected
            err_msg=f"remat={remat} loss diverged at step {i}",
        )
        np.testing.assert_allclose(
            float(met_s["grad_norm"]),
            float(met_r["grad_norm"]),
            rtol=5e-3,  # bf16 compute: reduction-order noise is larger
            err_msg=f"remat={remat} grad norm diverged at step {i}",
        )


def test_bf16_tensor_shard_map_guard():
    """halo_conv refuses bf16 compute when the mesh carries a tensor axis
    (which must stay automatic): jax 0.9.0 XLA CRASHES (hard abort, not
    an exception) compiling the backward of a low-precision conv inside a
    shard_map region with any automatic axis left — see the subprocess
    canary below."""
    mesh = make_mesh(8, spatial=2, tensor=2, spatial_conv="shard_map")
    x = jnp.zeros((2, 16, 16, 8), jnp.bfloat16)
    k = jnp.zeros((3, 3, 8, 8), jnp.bfloat16)
    with pytest.raises(ValueError, match="tensor"):
        halo_conv(x, k, strides=(1, 1), padding=((1, 1), (1, 1)), mesh=mesh)
    # fp32 on the same mesh is the supported path
    y = halo_conv(
        jnp.zeros((2, 16, 16, 8), jnp.float32),
        jnp.zeros((3, 3, 8, 8), jnp.float32),
        strides=(1, 1), padding=((1, 1), (1, 1)), mesh=mesh,
    )
    assert y.shape == (2, 16, 16, 8)


_CRASH_CANARY = """
import os
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
import jax, jax.numpy as jnp, numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
jax.config.update("jax_platforms", "cpu")
mesh = Mesh(np.array(jax.devices()).reshape(2, 2, 2),
            ("data", "spatial", "tensor"))
x = jax.device_put(jnp.ones((4, 16, 16, 8), jnp.bfloat16),
                   NamedSharding(mesh, P("data", "spatial")))
k = jax.device_put(jnp.ones((3, 3, 8, 8), jnp.bfloat16),
                   NamedSharding(mesh, P()))
def body(xb, kk):
    return lax.conv_general_dilated(
        xb, kk, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
f = jax.shard_map(body, mesh=mesh, axis_names={"data", "spatial"},
                  in_specs=(P("data", "spatial"), P()),
                  out_specs=P("data", "spatial"))
g = jax.jit(jax.grad(
    lambda a, b: jnp.sum(f(a, b).astype(jnp.float32) ** 2), argnums=(0, 1)
))(x, k)
jax.block_until_ready(g)
print("COMPILED_OK")
"""


@pytest.mark.slow
def test_bf16_auto_axis_shard_map_crash_canary(tmp_path):
    """Upstream canary for the guard above: a bf16 conv BACKWARD inside a
    shard_map region that leaves one mesh axis automatic hard-aborts XLA
    ("Invalid binary instruction opcode copy", hlo_instruction.cc) — run
    in a subprocess because a C++ CHECK failure kills the interpreter.
    The day a jax upgrade makes the child exit 0, this test FAILS — the
    signal to drop halo_conv's bf16+tensor refusal."""
    import subprocess
    import sys

    script = tmp_path / "canary.py"
    script.write_text(_CRASH_CANARY)
    out = tmp_path / "canary.log"
    env = {k: v for k, v in os.environ.items() if not k.startswith(("JAX", "XLA"))}
    with open(out, "w") as f:
        rc = subprocess.call(
            [sys.executable, str(script)], stdout=f,
            stderr=subprocess.STDOUT, env=env, timeout=600,
        )
    log = out.read_text()
    assert rc != 0 and "COMPILED_OK" not in log, (
        "jax now compiles bf16 conv backwards inside partial-auto "
        "shard_map regions — lift halo_conv's bf16+tensor guard "
        f"(ops/spatial_conv.py); rc={rc}\n{log[-1000:]}"
    )
