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
    # stdout goes to FILES, not pipes: XLA's compile-cache loader can emit
    # tens of KB of warnings (e.g. AOT machine-feature mismatch after a VM
    # migration), and an undrained 64 KB pipe would block the workers.
    logs = [tmp_path / f"worker{i}.log" for i in range(2)]
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(i), str(port)],
            stdout=open(logs[i], "w"), stderr=subprocess.STDOUT, env=env,
            text=True,
        )
        for i in range(2)
    ]
    for p in procs:
        p.wait(timeout=600)
    outputs = [log.read_text() for log in logs]
    losses = []
    for i, out in enumerate(outputs):
        assert procs[i].returncode == 0, f"proc {i} failed:\n{out[-2000:]}"
        lines = [l for l in out.splitlines() if l.startswith("RESULT ")]
        assert lines, f"proc {i} produced no result:\n{out[-2000:]}"
        losses.append(float(lines[-1].split()[1]))
    # both processes observe the identical global loss
    assert losses[0] == pytest.approx(losses[1], abs=1e-6)


_ZERO_WORKER = textwrap.dedent(
    """
    import os, sys
    proc_id = int(sys.argv[1]); port = sys.argv[2]; ckpt_dir = sys.argv[3]
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    sys.path.insert(0, {repo!r})
    from vae_channel_dynamics_tpu.utils.platform import apply_platform_env
    apply_platform_env()
    import jax
    jax.distributed.initialize(f"localhost:{{port}}", num_processes=2,
                               process_id=proc_id)
    import numpy as np, jax.numpy as jnp
    from jax.experimental import multihost_utils
    from vae_channel_dynamics_tpu.parallel import make_mesh
    from vae_channel_dynamics_tpu.parallel.mesh import (
        batch_sharding, vector_sharding, make_global_array,
    )
    from vae_channel_dynamics_tpu.parallel.zero import (
        make_gather_fn, state_shardings,
    )
    from vae_channel_dynamics_tpu.models.vae import AutoencoderKL, VAEConfig
    from vae_channel_dynamics_tpu.training import (
        TrainState, build_optimizer, make_train_step,
    )
    from vae_channel_dynamics_tpu.training.checkpoint import (
        restore_train_state, save_train_state,
    )
    mesh = make_mesh()  # 4 global devices over 2 processes
    module = AutoencoderKL(config=VAEConfig.tiny())
    params = module.init(
        {{"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)}},
        jnp.zeros((1, 16, 16, 3)), sample_posterior=False,
    )["params"]
    tx, _ = build_optimizer(1e-3, 0, 10)
    state = TrainState.create(params, tx, ema=True)
    sharding = state_shardings(mesh, state, shard_optimizer=True,
                               shard_ema=True, shard_params=True)
    gather = make_gather_fn(mesh, state)
    # device_put from HOST values: each process slices its shards locally.
    # Feeding committed device arrays instead makes JAX reshard across
    # processes leaf-by-leaf (one Gloo context per transfer), which times
    # out at this leaf count — same hostification the trainer applies.
    state = jax.device_put(
        jax.tree.map(lambda x: np.asarray(x), state), sharding
    )
    # the moments AND params really span processes: sharded leaves must
    # NOT be fully addressable from one process
    for tree in (state.opt_state, state.params):
        non_addressable = [
            l for l in jax.tree.leaves(tree)
            if hasattr(l, "is_fully_addressable")
            and not l.is_fully_addressable
        ]
        assert non_addressable, "expected cross-process shards"
    step = make_train_step(module, tx, 1e-6, mesh=mesh, donate=False,
                           state_sharding=sharding, ema_decay=0.9)
    rng = np.random.default_rng(proc_id)
    for _ in range(2):
        local = rng.uniform(-1, 1, (4, 16, 16, 3)).astype(np.float32)
        batch = {{"pixel_values": make_global_array(local,
                                                    batch_sharding(mesh))}}
        mask = make_global_array(np.ones(4, np.float32),
                                 vector_sharding(mesh))
        state, metrics, _ = step(state, batch, mask, jax.random.PRNGKey(3))
    loss = float(jax.device_get(metrics["train_loss_step"]))
    # the save-boundary collective: every process gathers, main writes
    save_state = gather(state)
    if proc_id == 0:
        save_train_state(ckpt_dir, save_state)
    multihost_utils.sync_global_devices("ckpt_saved")
    # both processes restore into a host template and compare against the
    # live (gathered) state — checkpoint is layout-independent
    template = TrainState.create(params, tx, ema=True)
    restored = restore_train_state(ckpt_dir, template)
    assert int(restored.step) == 2
    for a, b in zip(jax.tree.leaves(restored.opt_state),
                    jax.tree.leaves(jax.device_get(save_state.opt_state))):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree.leaves(restored.ema_params),
                    jax.tree.leaves(jax.device_get(save_state.ema_params))):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree.leaves(restored.params),
                    jax.tree.leaves(jax.device_get(save_state.params))):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    print(f"RESULT {{loss:.6f}}", flush=True)
    """
)


@pytest.mark.slow
def test_two_process_zero_checkpoint(tmp_path):
    """Multi-host full-ZeRO (moments + EMA + params sharded) end-to-end:
    the shards span two processes (not fully addressable from either),
    the save-boundary all-gather (parallel.zero.make_gather_fn)
    re-replicates on BOTH processes, the main process writes the
    checkpoint, and both restore it into a host template that matches the
    live state exactly."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    script = tmp_path / "zero_worker.py"
    script.write_text(_ZERO_WORKER.format(repo=repo))
    ckpt_dir = str(tmp_path / "zero_ckpt")
    env = {k: v for k, v in os.environ.items() if not k.startswith("JAX")}
    logs = [tmp_path / f"zworker{i}.log" for i in range(2)]
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(i), str(port), ckpt_dir],
            stdout=open(logs[i], "w"), stderr=subprocess.STDOUT, env=env,
            text=True,
        )
        for i in range(2)
    ]
    for p in procs:
        p.wait(timeout=600)
    outputs = [log.read_text() for log in logs]
    losses = []
    for i, out in enumerate(outputs):
        assert procs[i].returncode == 0, f"proc {i} failed:\n{out[-2000:]}"
        lines = [l for l in out.splitlines() if l.startswith("RESULT ")]
        assert lines, f"proc {i} produced no result:\n{out[-2000:]}"
        losses.append(float(lines[-1].split()[1]))
    assert losses[0] == pytest.approx(losses[1], abs=1e-6)


_FAILURE_WORKER = textwrap.dedent(
    """
    import os, sys, time
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
    tx, _ = build_optimizer(1e-3, 0, 100)
    state = jax.device_put(TrainState.create(params, tx),
                           replicated_sharding(mesh))
    step = make_train_step(module, tx, 1e-6, mesh=mesh, donate=False)
    rng = np.random.default_rng(proc_id)
    for k in range(50):
        local = rng.uniform(-1, 1, (4, 16, 16, 3)).astype(np.float32)
        batch = {{"pixel_values": make_global_array(local,
                                                    batch_sharding(mesh))}}
        mask = make_global_array(np.ones(4, np.float32),
                                 vector_sharding(mesh))
        state, metrics, _ = step(state, batch, mask, jax.random.PRNGKey(3))
        loss = float(jax.device_get(metrics["train_loss_step"]))
        print(f"STEP {{k}} {{loss:.6f}}", flush=True)
        if proc_id == 1 and k == 2:
            # simulated hard failure: no shutdown handshake, no cleanup —
            # the ugliest case (SIGKILL-equivalent)
            os._exit(17)
    print("DONE", flush=True)
    """
)


@pytest.mark.slow
def test_survivor_exits_nonzero_after_peer_death(tmp_path):
    """Multi-host failure detection (VERDICT round-2 item 7): one of two
    SPMD processes dies abruptly mid-run (os._exit inside the step loop —
    no shutdown handshake). The survivor, blocked on the next collective,
    must exit NONZERO within a bounded time rather than hang indefinitely.

    Observed behavior (documented per the VERDICT ask): the survivor's
    next cross-process collective fails when the peer's connection drops
    and/or the coordination service declares the task dead on missed
    heartbeats; JAX surfaces this as a runtime error that unwinds the step
    loop, so the process dies with a traceback (nonzero exit) — there is
    no silent hang and no zero-exit false success.
    """
    import time

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    script = tmp_path / "failure_worker.py"
    script.write_text(_FAILURE_WORKER.format(repo=repo))
    env = {k: v for k, v in os.environ.items() if not k.startswith("JAX")}
    # File-backed stdout for the same reason as the test above: undrained
    # pipes deadlock when XLA's cache loader gets chatty.
    logs = [tmp_path / f"fworker{i}.log" for i in range(2)]
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(i), str(port)],
            stdout=open(logs[i], "w"), stderr=subprocess.STDOUT, env=env,
            text=True,
        )
        for i in range(2)
    ]
    # proc 1 self-destructs after step 2
    procs[1].wait(timeout=600)
    out1 = logs[1].read_text()
    assert procs[1].returncode == 17, out1[-2000:]
    t_death = time.monotonic()

    # the survivor must exit nonzero within the bound — not hang
    bound_s = 240
    try:
        procs[0].wait(timeout=bound_s)
    except subprocess.TimeoutExpired:
        procs[0].kill()
        procs[0].wait()
        out0 = logs[0].read_text()
        raise AssertionError(
            f"survivor still hung {bound_s}s after peer death "
            f"(indefinite collective hang):\n{out0[-3000:]}"
        )
    out0 = logs[0].read_text()
    detect_s = time.monotonic() - t_death
    assert procs[0].returncode != 0, (
        f"survivor exited ZERO after peer death (silent false success):\n"
        f"{out0[-3000:]}"
    )
    # it made progress before the failure, then died on a later step
    assert "STEP 2" in out0, out0[-3000:]
    assert "DONE" not in out0, out0[-3000:]
    print(f"survivor exited rc={procs[0].returncode} {detect_s:.1f}s "
          f"after peer death")


_TP_WORKER = textwrap.dedent(
    """
    import os, sys
    proc_id = int(sys.argv[1]); port = sys.argv[2]; ckpt_dir = sys.argv[3]
    os.environ["JAX_PLATFORMS"] = "cpu"
    # ONE device per process: the 2-way tensor axis then SPANS processes,
    # so TP-sharded leaves are not fully addressable from either — the
    # layout where replicate_leaf / make_gather_fn must actually gather
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    sys.path.insert(0, {repo!r})
    from vae_channel_dynamics_tpu.utils.platform import apply_platform_env
    apply_platform_env()
    import jax
    jax.distributed.initialize(f"localhost:{{port}}", num_processes=2,
                               process_id=proc_id)
    import numpy as np, jax.numpy as jnp
    from jax.experimental import multihost_utils
    from vae_channel_dynamics_tpu.parallel import make_mesh
    from vae_channel_dynamics_tpu.parallel.mesh import (
        batch_sharding, vector_sharding, make_global_array,
    )
    from vae_channel_dynamics_tpu.parallel.zero import (
        make_gather_fn, make_replicate_leaf_fn, state_shardings,
    )
    from vae_channel_dynamics_tpu.intervention import InterventionHandler
    from vae_channel_dynamics_tpu.models.vae import AutoencoderKL, VAEConfig
    from vae_channel_dynamics_tpu.training import (
        TrainState, build_optimizer, make_train_step,
    )
    from vae_channel_dynamics_tpu.training.checkpoint import (
        restore_train_state, save_train_state,
    )
    from vae_channel_dynamics_tpu.utils import naming
    mesh = make_mesh(tensor=2)  # 2 global devices -> data=1, tensor=2
    assert dict(mesh.shape) == {{"data": 1, "tensor": 2}}, dict(mesh.shape)
    module = AutoencoderKL(config=VAEConfig.tiny())
    params = module.init(
        {{"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)}},
        jnp.zeros((1, 16, 16, 3)), sample_posterior=False,
    )["params"]
    tx, _ = build_optimizer(1e-3, 0, 10)
    state = TrainState.create(params, tx)
    sharding = state_shardings(mesh, state, shard_optimizer=False)
    gather = make_gather_fn(mesh, state)
    state = jax.device_put(
        jax.tree.map(lambda x: np.asarray(x), state), sharding
    )
    # TP leaves really span the two processes
    non_addressable = [
        l for l in jax.tree.leaves(state.params)
        if hasattr(l, "is_fully_addressable")
        and not l.is_fully_addressable
    ]
    assert non_addressable, "expected cross-process TP shards"
    replicate_leaf = make_replicate_leaf_fn(mesh)
    step = make_train_step(module, tx, 1e-6, mesh=mesh, donate=False,
                           state_sharding=sharding)
    # data axis is 1: every process must contribute the identical batch
    rng = np.random.default_rng(7)
    for _ in range(2):
        local = rng.uniform(-1, 1, (2, 16, 16, 3)).astype(np.float32)
        batch = {{"pixel_values": make_global_array(local,
                                                    batch_sharding(mesh))}}
        mask = make_global_array(np.ones(2, np.float32),
                                 vector_sharding(mesh))
        state, metrics, _ = step(state, batch, mask, jax.random.PRNGKey(3))
    loss = float(jax.device_get(metrics["train_loss_step"]))
    # live nudge through replicate_leaf on the TP-sharded (cross-process) γ
    gname = "encoder.down_blocks.0.resnets.0.norm1.weight"
    gleaf = naming.get_param(state.params, gname)
    assert not gleaf.is_fully_addressable  # the interesting case
    before = np.asarray(replicate_leaf(gleaf), np.float32)
    handler = InterventionHandler({{
        "enabled": True, "strategy": "gentle_nudge_groupnorm_scale",
        "nudge_factor": 1.2, "max_scale_value": 1.5,
        "intervention_interval": 1,
    }})
    new_params = handler.intervene(
        state.params,
        {{"layer": {{"param_name_scale": gname,
                     "inactive_channel_indices": [0, 5]}}}},
        global_step=2, replicate_leaf=replicate_leaf,
    )
    assert handler.num_nudges_applied == 2, handler.num_nudges_applied
    after = np.asarray(naming.get_param(new_params, gname), np.float32)
    expected = before.copy()
    expected[[0, 5]] = np.minimum(expected[[0, 5]] * 1.2, 1.5)
    np.testing.assert_allclose(after, expected, rtol=1e-6)
    state = state.replace(params=new_params)
    # the TP step accepts the nudged (replicated) leaf back: in_shardings
    # re-commit it to the tensor layout on the next step
    local = rng.uniform(-1, 1, (2, 16, 16, 3)).astype(np.float32)
    batch = {{"pixel_values": make_global_array(local,
                                                batch_sharding(mesh))}}
    mask = make_global_array(np.ones(2, np.float32), vector_sharding(mesh))
    state, metrics, _ = step(state, batch, mask, jax.random.PRNGKey(4))
    post_loss = float(jax.device_get(metrics["train_loss_step"]))
    assert np.isfinite(post_loss)
    # checkpoint of TP-sharded state: gather collective on BOTH processes,
    # main writes, both restore and match the live gathered state
    save_state = gather(state)
    if proc_id == 0:
        save_train_state(ckpt_dir, save_state)
    multihost_utils.sync_global_devices("tp_ckpt_saved")
    template = TrainState.create(params, tx)
    restored = restore_train_state(ckpt_dir, template)
    assert int(restored.step) == 3
    for a, b in zip(jax.tree.leaves(restored.params),
                    jax.tree.leaves(jax.device_get(save_state.params))):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # (the nudged γ itself was already asserted right after intervene;
    # by checkpoint time one more AdamW step has legitimately moved it,
    # and the leaf-equality loop above pins restored == live exactly)
    print(f"RESULT {{loss:.6f}} {{post_loss:.6f}}", flush=True)
    """
)


@pytest.mark.slow
def test_two_process_tensor_parallel(tmp_path):
    """Cross-process tensor parallelism (VERDICT r4 item 4): a 2-process
    data x tensor mesh where the tensor axis SPANS the processes (1 device
    each), so TP-sharded leaves are not fully addressable from either
    process. Proves the three multi-host TP paths: train-step loss parity,
    a live nudge through the nudger's replicate_leaf all-gather on a
    cross-process γ, and checkpoint save/restore of TP-sharded state via
    make_gather_fn — the TP analog of the DDP desync hazard SURVEY §2b
    flags (a leaf fetch that misses a shard would silently nudge half a
    γ)."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    script = tmp_path / "tp_worker.py"
    script.write_text(_TP_WORKER.format(repo=repo))
    ckpt_dir = str(tmp_path / "tp_ckpt")
    env = {k: v for k, v in os.environ.items() if not k.startswith("JAX")}
    logs = [tmp_path / f"tpworker{i}.log" for i in range(2)]
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(i), str(port), ckpt_dir],
            stdout=open(logs[i], "w"), stderr=subprocess.STDOUT, env=env,
            text=True,
        )
        for i in range(2)
    ]
    for p in procs:
        p.wait(timeout=600)
    outputs = [log.read_text() for log in logs]
    results = []
    for i, out in enumerate(outputs):
        assert procs[i].returncode == 0, f"proc {i} failed:\n{out[-2000:]}"
        lines = [l for l in out.splitlines() if l.startswith("RESULT ")]
        assert lines, f"proc {i} produced no result:\n{out[-2000:]}"
        results.append(lines[-1])
    # both processes observe identical pre- and post-nudge losses
    assert results[0] == results[1], results


_SPATIAL_SM_WORKER = textwrap.dedent(
    """
    import os, sys
    proc_id = int(sys.argv[1]); port = sys.argv[2]
    os.environ["JAX_PLATFORMS"] = "cpu"
    # ONE device per process: the 2-way SPATIAL axis spans the processes,
    # so every conv's halo ppermute crosses the process boundary — the
    # multi-host path ops/spatial_conv.py must survive
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
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
    mesh = make_mesh(spatial=2, spatial_conv="shard_map")
    assert dict(mesh.shape) == {{"data": 1, "spatial": 2}}, dict(mesh.shape)
    module = AutoencoderKL(config=VAEConfig.tiny())
    params = module.init(
        {{"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)}},
        jnp.zeros((1, 16, 16, 3)), sample_posterior=False,
    )["params"]
    tx, _ = build_optimizer(1e-3, 0, 10)
    state = jax.device_put(TrainState.create(params, tx),
                           replicated_sharding(mesh))
    step = make_train_step(module, tx, 1e-6, mesh=mesh, donate=False,
                           spatial_conv="shard_map")
    # data axis is 1; H is sharded over spatial ACROSS the processes, so
    # both processes synthesize the identical global batch and each hands
    # make_global_array its own 8-row H slice
    rng = np.random.default_rng(7)
    for i in range(2):
        full = rng.uniform(-1, 1, (2, 16, 16, 3)).astype(np.float32)
        local = full[:, 8 * proc_id : 8 * (proc_id + 1)]
        batch = {{"pixel_values": make_global_array(local,
                                                    batch_sharding(mesh))}}
        mask = make_global_array(np.ones(2, np.float32),
                                 vector_sharding(mesh))
        state, metrics, _ = step(state, batch, mask, jax.random.PRNGKey(3))
    loss = float(jax.device_get(metrics["train_loss_step"]))
    print(f"RESULT {{loss:.6f}}", flush=True)
    """
)


@pytest.mark.slow
def test_two_process_spatial_shard_map(tmp_path):
    """Cross-process manual halo exchange: a 2-process mesh whose SPATIAL
    axis spans the processes (1 device each), every conv's shard_map
    ppermute riding the distributed runtime. Both processes must see the
    identical 2-step loss, and it must equal the single-device oracle
    trajectory computed in-process (mesh=None) on the same seeds — the
    multi-host proof for parallel.spatial_conv: shard_map
    (ops/spatial_conv.py)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from vae_channel_dynamics_tpu.models.vae import AutoencoderKL, VAEConfig
    from vae_channel_dynamics_tpu.training import (
        TrainState, build_optimizer, make_train_step,
    )

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    script = tmp_path / "spatial_sm_worker.py"
    script.write_text(_SPATIAL_SM_WORKER.format(repo=repo))
    env = {k: v for k, v in os.environ.items() if not k.startswith("JAX")}
    logs = [tmp_path / f"smworker{i}.log" for i in range(2)]
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(i), str(port)],
            stdout=open(logs[i], "w"), stderr=subprocess.STDOUT, env=env,
            text=True,
        )
        for i in range(2)
    ]
    for p in procs:
        p.wait(timeout=600)
    results = []
    for i, log in enumerate(logs):
        out = log.read_text()
        assert procs[i].returncode == 0, f"proc {i} failed:\n{out[-2000:]}"
        lines = [l for l in out.splitlines() if l.startswith("RESULT ")]
        assert lines, f"proc {i} produced no result:\n{out[-2000:]}"
        results.append(lines[-1])
    assert results[0] == results[1], results

    # single-device oracle on the same seeds (the workers' batch sequence)
    module = AutoencoderKL(config=VAEConfig.tiny())
    params = module.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
        jnp.zeros((1, 16, 16, 3)), sample_posterior=False,
    )["params"]
    tx, _ = build_optimizer(1e-3, 0, 10)
    state = TrainState.create(params, tx)
    step = make_train_step(module, tx, 1e-6, mesh=None, donate=False)
    rng = np.random.default_rng(7)
    for _ in range(2):
        full = rng.uniform(-1, 1, (2, 16, 16, 3)).astype(np.float32)
        state, metrics, _ = step(
            state, {"pixel_values": full}, np.ones(2, np.float32),
            jax.random.PRNGKey(3),
        )
    oracle = float(jax.device_get(metrics["train_loss_step"]))
    worker = float(results[0].split()[1])
    np.testing.assert_allclose(worker, oracle, rtol=2e-5)
