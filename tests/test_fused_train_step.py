"""Train-step parity for model.kernel_impl="fused" (Pallas resnet kernels).

Uses a miniature SDXL-shaped config with 128-lane channels so the fused
path is eligible (interpret mode on CPU), and checks that one full jitted
train step — forward with activation-stat taps, loss, gradients, AdamW
update, on-device stat accumulation — matches the XLA model: same loss,
same accumulated tap statistics, and parameter updates within bf16
tolerance. This covers the wiring the block-level tests can't: sown fused
taps flowing through ``make_train_step``'s stats collection and the
monitor accumulate, with donated buffers.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from vae_channel_dynamics_tpu.models.vae import AutoencoderKL, VAEConfig
from vae_channel_dynamics_tpu.tracking import ActivityMonitor
from vae_channel_dynamics_tpu.training import (
    TrainState,
    build_optimizer,
    make_train_step,
)

# one 128ch block + mid block at 8x8: every resnet is fused-eligible
CFG = VAEConfig(
    block_out_channels=(128,),
    layers_per_block=1,
    norm_num_groups=32,
    sample_size=16,
)

TRACKING = {
    "enabled": True,
    "track_interval": 1,
    "target_layers": [
        {
            "name": "vae.encoder.down_blocks.0.resnets.0.norm1",
            "capture_point": "output",
            "metrics": ["mean_abs_activation_per_channel"],
        },
        {
            "name": "vae.decoder.mid_block.resnets.1.norm2",
            "capture_point": "output",
            "metrics": ["mean_abs_activation_per_channel"],
        },
    ],
}


def _run_step(impl: str, mesh=None, batch: int = 2):
    monitor = ActivityMonitor(dict(TRACKING))
    module = AutoencoderKL(
        config=CFG, dtype=jnp.bfloat16, impl=impl,
        capture=monitor.scalar_capture_table,
    )
    resolution = 16
    sample = jnp.zeros((1, resolution, resolution, 3))
    params = module.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
        sample,
        sample_posterior=False,
    )["params"]
    tx, _ = build_optimizer(1e-3, warmup_steps=2, max_train_steps=100)
    stats_acc = monitor.init_acc(
        module, params, (batch, resolution, resolution, 3)
    )
    state = TrainState.create(params, tx, stats_acc=stats_acc)
    step = make_train_step(
        module, tx, 1e-6, mesh=mesh,
        stats_accumulate=ActivityMonitor.accumulate,
    )
    data = {
        "pixel_values": jnp.asarray(
            np.random.default_rng(3).uniform(-1, 1, (batch, resolution, resolution, 3)),
            jnp.float32,
        )
    }
    mask = jnp.ones(batch, jnp.float32)
    state, metrics, _ = step(state, data, mask, jax.random.PRNGKey(9))
    return (
        float(jax.device_get(metrics["train_loss_step"])),
        jax.device_get(state.stats_acc),
        jax.device_get(state.params),
    )


def test_fused_train_step_matches_xla():
    loss_x, acc_x, params_x = _run_step("xla")
    loss_f, acc_f, params_f = _run_step("fused")

    assert abs(loss_f - loss_x) / max(abs(loss_x), 1e-6) < 2e-2

    assert sorted(acc_x) == sorted(acc_f)
    assert any("norm1.output" in k for k in acc_x)
    for key in acc_x:
        a, b = np.asarray(acc_x[key]), np.asarray(acc_f[key])
        np.testing.assert_allclose(
            b, a, rtol=3e-2, atol=3e-3, err_msg=key
        )

    flat_x = dict(jax.tree_util.tree_leaves_with_path(params_x))
    flat_f = dict(jax.tree_util.tree_leaves_with_path(params_f))
    for path, px in flat_x.items():
        pf = flat_f[path]
        px, pf = np.asarray(px, np.float32), np.asarray(pf, np.float32)
        scale = max(np.abs(px).max(), 1e-6)
        np.testing.assert_allclose(
            pf / scale, px / scale, rtol=0, atol=5e-2,
            err_msg=jax.tree_util.keystr(path),
        )


def test_fused_train_step_under_data_mesh_matches_single_device():
    """kernel_impl='fused' under an 8-device data mesh (VERDICT round-2
    item 4): with the shard mesh installed the fused kernels run per-shard
    via shard_map on each device's local batch block, and one full train
    step — loss, accumulated tap stats, parameter updates — must match the
    single-device fused step. Everything in the kernel is per-sample (GN
    normalizes within each sample), so only reduction order can differ."""
    from vae_channel_dynamics_tpu.ops import pallas_resnet
    from vae_channel_dynamics_tpu.parallel import make_mesh

    batch = 8
    loss_s, acc_s, params_s = _run_step("fused", batch=batch)
    mesh = make_mesh(8)
    pallas_resnet.set_shard_mesh(mesh)
    try:
        loss_m, acc_m, params_m = _run_step("fused", mesh=mesh, batch=batch)
    finally:
        pallas_resnet.set_shard_mesh(None)

    assert abs(loss_m - loss_s) / max(abs(loss_s), 1e-6) < 1e-4

    assert sorted(acc_s) == sorted(acc_m)
    for key in acc_s:
        # sub-bf16-ulp: sharding changes XLA fusion layouts around the
        # kernels, so bf16 rounding differs in the last place
        np.testing.assert_allclose(
            np.asarray(acc_m[key]), np.asarray(acc_s[key]),
            rtol=2e-3, atol=1e-5, err_msg=key,
        )

    flat_s = dict(jax.tree_util.tree_leaves_with_path(params_s))
    flat_m = dict(jax.tree_util.tree_leaves_with_path(params_m))
    for path, ps in flat_s.items():
        pm = np.asarray(flat_m[path], np.float32)
        ps = np.asarray(ps, np.float32)
        scale = max(np.abs(ps).max(), 1e-6)
        np.testing.assert_allclose(
            pm / scale, ps / scale, rtol=0, atol=1e-3,
            err_msg=jax.tree_util.keystr(path),
        )


def test_spatial_mesh_not_supported_for_fused():
    """mesh_supported: data-only meshes qualify; any non-trivial spatial
    axis does not (conv halo exchange is not implemented in the kernel)."""
    from vae_channel_dynamics_tpu.ops import pallas_resnet
    from vae_channel_dynamics_tpu.parallel import make_mesh

    assert pallas_resnet.mesh_supported(make_mesh(8))
    assert not pallas_resnet.mesh_supported(make_mesh(8, spatial=2))
    assert pallas_resnet.mesh_supported(make_mesh(8, spatial=1))
