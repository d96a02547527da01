"""True multi-process SPMD validation: two JAX processes (2 CPU devices
each) coordinate via jax.distributed, each contributes its half of the
global batch with make_array_from_process_local_data, and both observe the
identical global loss — the end-to-end proof of the multi-host data path
(the closest a single machine gets to a multi-host TPU pod)."""

import os
import socket
import subprocess
import sys
import textwrap

import pytest

_WORKER = textwrap.dedent(
    """
    import os, sys
    proc_id = int(sys.argv[1]); port = sys.argv[2]
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    sys.path.insert(0, {repo!r})
    from vae_channel_dynamics_tpu.utils.platform import apply_platform_env
    apply_platform_env()
    import jax
    jax.distributed.initialize(f"localhost:{{port}}", num_processes=2,
                               process_id=proc_id)
    import numpy as np, jax.numpy as jnp
    from vae_channel_dynamics_tpu.parallel import make_mesh
    from vae_channel_dynamics_tpu.parallel.mesh import (
        batch_sharding, vector_sharding, make_global_array,
        replicated_sharding,
    )
    from vae_channel_dynamics_tpu.models.vae import AutoencoderKL, VAEConfig
    from vae_channel_dynamics_tpu.training import (
        TrainState, build_optimizer, make_train_step,
    )
    mesh = make_mesh()
    module = AutoencoderKL(config=VAEConfig.tiny())
    params = module.init(
        {{"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)}},
        jnp.zeros((1, 16, 16, 3)), sample_posterior=False,
    )["params"]
    tx, _ = build_optimizer(1e-3, 0, 10)
    state = jax.device_put(TrainState.create(params, tx),
                           replicated_sharding(mesh))
    step = make_train_step(module, tx, 1e-6, mesh=mesh, donate=False)
    rng = np.random.default_rng(proc_id)
    local = rng.uniform(-1, 1, (4, 16, 16, 3)).astype(np.float32)
    batch = {{"pixel_values": make_global_array(local, batch_sharding(mesh))}}
    mask = make_global_array(np.ones(4, np.float32), vector_sharding(mesh))
    state, metrics, _ = step(state, batch, mask, jax.random.PRNGKey(3))
    print(f"RESULT {{float(jax.device_get(metrics['train_loss_step'])):.6f}}",
          flush=True)
    """
)


@pytest.mark.slow
def test_two_process_spmd_train_step(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    script = tmp_path / "worker.py"
    script.write_text(_WORKER.format(repo=repo))
    env = {k: v for k, v in os.environ.items() if not k.startswith("JAX")}
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(i), str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
            text=True,
        )
        for i in range(2)
    ]
    outputs = [p.communicate(timeout=300)[0] for p in procs]
    losses = []
    for i, out in enumerate(outputs):
        assert procs[i].returncode == 0, f"proc {i} failed:\n{out[-2000:]}"
        lines = [l for l in out.splitlines() if l.startswith("RESULT ")]
        assert lines, f"proc {i} produced no result:\n{out[-2000:]}"
        losses.append(float(lines[-1].split()[1]))
    # both processes observe the identical global loss
    assert losses[0] == pytest.approx(losses[1], abs=1e-6)
