"""Spatial-mesh GSPMD miscompile guards, canaries, and the round-5 fix.

jax 0.9.0 GSPMD miscompiles halo-exchange convolutions (spatially sharded
activations) in three distinct ways, each pinned here as a strict-xfail
canary — while the upstream bugs exist the canaries "pass" as xfail; the
day a jax upgrade fixes partitioning they XPASS and turn the suite red,
the signal to revisit the guards:

1. FORWARD: a halo conv whose kernel is O-sharded on the ``tensor`` axis
   returns output scaled by the tensor-axis size (wrong at float64; the
   1x1 halo-free case is exact — pinned as a control). ``make_mesh``
   refuses ``spatial x tensor`` for this (plus #2).
2. BACKWARD, unused mesh axis: with every operand replicated or
   batch/H-sharded, the kernel GRADIENT of a halo conv comes back scaled
   by the size of any mesh axis the program leaves unused — which is why
   a "gather the weights at use" workaround cannot make spatial x tensor
   correct either, and the refusal stands.
3. BACKWARD, sharded param leaves: with parameters ZeRO-3-sharded over
   ``data`` under a ``data x spatial`` mesh, the full model's forward
   loss is exact but its parameter gradients are wrong by large factors
   (found round 5; no small op chain reproduces it — the canary uses the
   tiny model). This was a LIVE silent-training bug in
   ``parallel.shard_params`` + ``parallel.spatial`` from round 3 until
   round 5. The fix (training/step.py::_params_compute_sharding):
   on spatial meshes the train/eval steps re-replicate sharded param
   leaves at the top of the forward, which this file pins as
   grad-equivalent to the replicated-params spatial program while the
   at-rest state stays sharded.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from vae_channel_dynamics_tpu.models.vae import AutoencoderKL, VAEConfig
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


def test_make_mesh_refuses_spatial_x_tensor():
    with pytest.raises(ValueError, match="spatial.*tensor|tensor.*spatial"):
        make_mesh(8, spatial=2, tensor=2)


def _conv(x, k):
    return jax.lax.conv_general_dilated(
        x, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
    )


def _mesh3():
    return Mesh(
        np.array(jax.devices()[:8]).reshape(2, 2, 2),
        ("data", "spatial", "tensor"),
    )


@pytest.mark.xfail(
    strict=True,
    reason="jax 0.9.0 GSPMD canary #1: halo-exchange conv with a "
    "feature-sharded kernel is scaled by the feature-axis size; when this "
    "XPASSes, revisit the spatial x tensor guard in parallel/mesh.py",
)
def test_halo_conv_with_feature_sharded_kernel_is_exact():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    # smallest shape showing the property (CLAUDE.md: keep mesh-compile
    # tests tiny): 2 batch x 16x16 x 16ch, 3x3 kernel, 2x2x2 mesh
    mesh = _mesh3()
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
    """The 1x1 (halo-free) case IS exact — pins that canary #1's scope is
    the halo path specifically, not feature sharding in general."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = _mesh3()
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


@pytest.mark.xfail(
    strict=True,
    reason="jax 0.9.0 GSPMD canary #2: the kernel gradient of a halo conv "
    "is scaled by the size of any UNUSED mesh axis (here: a fully "
    "replicated kernel on a data x spatial x tensor mesh whose tensor "
    "axis nothing uses); when this XPASSes, a gathered-weights "
    "spatial x tensor mode becomes viable — revisit parallel/mesh.py",
)
def test_halo_conv_grad_with_unused_mesh_axis_is_exact():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = _mesh3()
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 16, 16, 16)).astype(np.float32)
    k = rng.standard_normal((3, 3, 16, 16)).astype(np.float32) * 0.1

    grad = jax.grad(lambda x_, k_: jnp.sum(_conv(x_, k_) ** 2), argnums=1)
    repl = NamedSharding(mesh, P())
    ref = np.asarray(
        jax.device_get(
            jax.jit(grad)(jax.device_put(x, repl), jax.device_put(k, repl))
        )
    )
    out = np.asarray(
        jax.device_get(
            jax.jit(grad)(
                jax.device_put(x, NamedSharding(mesh, P("data", "spatial"))),
                jax.device_put(k, repl),
            )
        )
    )
    np.testing.assert_allclose(out, ref, rtol=1e-4)


# ---------------------------------------------------------------------------
# canary #3 + the round-5 fix: sharded params under a spatial mesh


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


def _grad_leaves(module, mesh, params_host, params_sharding, batch):
    """Raw value_and_grad of the training loss — NO compute-time
    re-replication, i.e. exactly what GSPMD does with the given layout."""

    def loss_fn(params, pix):
        out = module.apply({"params": params}, pix, sample_posterior=False)
        recon = out["reconstruction"].astype(jnp.float32)
        return jnp.mean((recon - pix) ** 2) + 1e-6 * jnp.mean(
            out["latent_dist"].kl()
        )

    g = jax.jit(
        jax.grad(loss_fn),
        in_shardings=(params_sharding, batch_sharding(mesh)),
        out_shardings=params_sharding,
    )(
        jax.device_put(params_host, params_sharding),
        jax.device_put(batch["pixel_values"], batch_sharding(mesh)),
    )
    return [np.asarray(leaf, np.float64) for leaf in jax.tree.leaves(jax.device_get(g))]


@pytest.mark.xfail(
    strict=True,
    reason="jax 0.9.0 GSPMD canary #3: with params ZeRO-3-sharded over "
    "'data' under a data x spatial mesh, the model's parameter gradients "
    "are wrong by large factors (forward loss exact; no small op chain "
    "reproduces it). The framework's steps work around it by "
    "re-replicating params at compute time "
    "(training/step.py::_params_compute_sharding) — when this XPASSes, "
    "that workaround can be retired",
)
def test_raw_model_grads_with_data_sharded_params_under_spatial_mesh():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    module, params_host = _tiny_params()
    mesh = make_mesh(8, spatial=2)
    batch, _ = _batch(4, seed=3)
    tx, _ = build_optimizer(1e-3, warmup_steps=2, max_train_steps=100)
    state = TrainState.create(params_host, tx)
    zspec = state_shardings(
        mesh, state, shard_optimizer=False, shard_ema=False, shard_params=True
    ).params
    ref = _grad_leaves(
        module, mesh, params_host, replicated_sharding(mesh), batch
    )
    out = _grad_leaves(module, mesh, params_host, zspec, batch)
    for r, t in zip(ref, out):
        rel = np.linalg.norm(t - r) / max(np.linalg.norm(r), 1e-12)
        assert rel < 1e-3, f"param-grad relL2 {rel:.3e}"


def test_zero3_spatial_train_step_matches_replicated_params():
    """The FIX for canary #3, at the real train-step level: ZeRO-3-sharded
    state under a data x spatial mesh (which routes through the
    compute-time re-replication) matches the replicated-params step on the
    same mesh — loss, grad norm, and post-step params — while the at-rest
    params stay distributed."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    module, params_host = _tiny_params()
    mesh = make_mesh(8, spatial=2)

    def setup(sharded):
        tx, _ = build_optimizer(1e-3, warmup_steps=2, max_train_steps=100)
        state = TrainState.create(params_host, tx)
        sh = (
            state_shardings(
                mesh, state, shard_optimizer=True, shard_ema=False,
                shard_params=True,
            )
            if sharded
            else None
        )
        state = jax.device_put(
            state, sh if sh is not None else replicated_sharding(mesh)
        )
        step = make_train_step(
            module, tx, 1e-6, mesh=mesh, donate=False, state_sharding=sh
        )
        return state, step

    state_z, step_z = setup(True)
    state_r, step_r = setup(False)
    sharded = [
        leaf
        for leaf in jax.tree.leaves(state_z.params)
        if not leaf.sharding.is_fully_replicated
    ]
    assert len(sharded) > 50, "expected ZeRO-3 to distribute param leaves"

    batch, mask = _batch(4, seed=5)
    rng = jax.random.PRNGKey(11)
    for i in range(2):
        state_z, met_z, _ = step_z(state_z, batch, mask, rng)
        state_r, met_r, _ = step_r(state_r, batch, mask, rng)
        np.testing.assert_allclose(
            float(met_z["train_loss_step"]),
            float(met_r["train_loss_step"]),
            rtol=1e-6,
            err_msg=f"loss diverged at step {i}",
        )
        np.testing.assert_allclose(
            float(met_z["grad_norm"]),
            float(met_r["grad_norm"]),
            rtol=1e-5,
            err_msg=f"grad norm diverged at step {i} (canary-#3 class)",
        )
    for a, b in zip(
        jax.tree.leaves(jax.device_get(state_z.params)),
        jax.tree.leaves(jax.device_get(state_r.params)),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-7
        )
    # out_shardings keep the updated params distributed at rest
    assert any(
        not leaf.sharding.is_fully_replicated
        for leaf in jax.tree.leaves(state_z.params)
    )


def test_zero3_spatial_eval_step_matches_replicated_params():
    """Validation under the same layout: the eval step declares the
    sharded layout and re-replicates at compute; results match the
    replicated-params eval on the same spatial mesh."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    module, params_host = _tiny_params()
    mesh = make_mesh(8, spatial=2)
    tx, _ = build_optimizer(1e-3, warmup_steps=2, max_train_steps=100)
    state = TrainState.create(params_host, tx)
    zspec = state_shardings(
        mesh, state, shard_optimizer=False, shard_ema=False, shard_params=True
    ).params
    params_sharded = jax.device_put(params_host, zspec)

    eval_z = make_eval_step(module, mesh=mesh, params_sharding=zspec)
    eval_r = make_eval_step(module, mesh=mesh)
    batch, mask = _batch(4, seed=9)
    batch_dev = {"pixel_values": jnp.asarray(batch["pixel_values"])}
    mask_dev = jnp.asarray(mask)
    out_z = eval_z(params_sharded, batch_dev, mask_dev)
    out_r = eval_r(params_host, batch_dev, mask_dev)
    np.testing.assert_allclose(
        float(out_z["rec_loss_sum"]), float(out_r["rec_loss_sum"]), rtol=1e-6
    )
    np.testing.assert_allclose(
        float(out_z["kl_sum"]), float(out_r["kl_sum"]), rtol=1e-6, atol=1e-7
    )
