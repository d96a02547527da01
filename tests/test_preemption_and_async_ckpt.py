"""Preemption-safe shutdown and async checkpointing.

Neither exists in the reference (SURVEY.md §5: checkpoints are written,
never read; no failure recovery). Here SIGTERM mid-run must produce a clean
exit with a fresh checkpoint that ``--resume_from auto`` can pick up, and
the AsyncSaver must write checkpoints identical to the synchronous path
while surviving the train step's buffer donation.
"""

import os
import signal
import subprocess
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import yaml

from vae_channel_dynamics_tpu.training.checkpoint import (
    AsyncSaver,
    latest_checkpoint,
    restore_train_state,
    save_train_state,
)

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_async_saver_roundtrip(tmp_path):
    state = {
        "params": {"w": jnp.arange(12.0).reshape(3, 4)},
        "step": jnp.asarray(7),
    }
    saver = AsyncSaver()
    saver.save(str(tmp_path / "ck"), state)
    saver.wait()
    restored = restore_train_state(str(tmp_path / "ck"), state)
    np.testing.assert_array_equal(
        np.asarray(restored["params"]["w"]), np.arange(12.0).reshape(3, 4)
    )
    assert int(restored["step"]) == 7


def test_async_saver_snapshot_survives_donation(tmp_path):
    """The saver snapshots on device before returning, so donating (deleting)
    the original buffers immediately after save() must not corrupt the
    write."""
    x = jnp.full((256,), 3.0)
    state = {"params": {"w": x}}
    saver = AsyncSaver()
    saver.save(str(tmp_path / "ck"), state)
    x.delete()  # what donation does to the live state's buffers
    saver.wait()
    restored = restore_train_state(
        str(tmp_path / "ck"), {"params": {"w": jnp.zeros((256,))}}
    )
    np.testing.assert_array_equal(np.asarray(restored["params"]["w"]), 3.0)


def test_async_saver_error_surfaces(tmp_path):
    saver = AsyncSaver()
    target = tmp_path / "file"
    target.write_text("not a dir")
    saver.save(str(target / "nested"), {"x": jnp.zeros(2)})
    with pytest.raises(Exception):
        saver.wait()
    # a failed save leaves the saver reusable
    saver.save(str(tmp_path / "ok"), {"x": jnp.ones(2)})
    saver.wait()


def test_async_matches_sync_checkpoint(tmp_path):
    state = {"a": jnp.linspace(0, 1, 33), "n": jnp.asarray(3)}
    save_train_state(str(tmp_path / "sync"), state)
    saver = AsyncSaver()
    saver.save(str(tmp_path / "async"), state)
    saver.wait()
    r_sync = restore_train_state(str(tmp_path / "sync"), state)
    r_async = restore_train_state(str(tmp_path / "async"), state)
    for k in state:
        np.testing.assert_array_equal(np.asarray(r_sync[k]), np.asarray(r_async[k]))


@pytest.mark.slow
def test_sigterm_checkpoints_and_exits_cleanly(tmp_path):
    """Drive the real train CLI in a subprocess, SIGTERM it mid-run, and
    assert: clean exit, preemption checkpoint on disk, auto-resume finds it."""
    with open(os.path.join(REPO_ROOT, "configs", "smoke_synthetic.yaml")) as f:
        cfg = yaml.safe_load(f)
    cfg["run_name"] = "preempt_test"
    cfg["output_dir"] = str(tmp_path)
    cfg["training"]["num_train_epochs"] = 200  # far more than the grace time
    cfg["saving"]["save_interval_steps"] = 2
    # keep per-step work minimal so signal reaction is fast
    cfg["logit_lens"]["enabled"] = False
    cfg["data"]["do_validation"] = False
    cfg_path = tmp_path / "cfg.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))

    env = dict(os.environ, JAX_PLATFORMS="cpu", HF_HUB_OFFLINE="1")
    # Log to a FILE, not a PIPE: the trainer (orbax included) emits >64 KB
    # before the first periodic checkpoint, so an undrained pipe fills its
    # buffer and blocks the subprocess on write() forever — the test then
    # times out "waiting for a checkpoint" that can never come.
    log_path = tmp_path / "trainer.log"
    with open(log_path, "w") as log_f:
        proc = subprocess.Popen(
            [sys.executable, "-m", "vae_channel_dynamics_tpu.train",
             "--config_path", str(cfg_path)],
            cwd=REPO_ROOT, env=env,
            stdout=log_f, stderr=subprocess.STDOUT, text=True,
        )
    run_dir = tmp_path / "preempt_test"
    # Generous: the subprocess shares this box's single core with the rest
    # of the suite (and whatever else runs alongside it); 240 s was measured
    # to flake under concurrent load while passing in ~120 s unloaded.
    deadline = time.time() + 480
    try:
        # wait until the loop is demonstrably running (first periodic ckpt)
        while time.time() < deadline:
            if proc.poll() is not None:
                out = log_path.read_text()
                pytest.fail(f"trainer exited early ({proc.returncode}):\n{out[-3000:]}")
            if any(
                p.name.startswith("chkpt-") for p in run_dir.glob("chkpt-*")
            ):
                break
            time.sleep(1.0)
        else:
            pytest.fail("no periodic checkpoint appeared before the deadline")
        proc.send_signal(signal.SIGTERM)
        proc.wait(timeout=180)
        out = log_path.read_text()
    finally:
        if proc.poll() is None:
            proc.kill()
            proc.wait()
    assert proc.returncode == 0, f"exit {proc.returncode}:\n{out[-3000:]}"
    assert "Preemption checkpoint written" in out
    ckpt = latest_checkpoint(str(run_dir))
    assert ckpt is not None
    # the preemption checkpoint is restorable
    assert os.path.isdir(os.path.join(ckpt, "state"))


def test_async_save_prunes_after_checkpoint_lands(tmp_path):
    """Pruning runs inside the writer AFTER the save completes, so
    keep_last_n is honored exactly once the saver drains (previously the
    prune listed the dir before the new checkpoint existed and lagged one
    save behind)."""
    import jax.numpy as jnp

    from vae_channel_dynamics_tpu.training.checkpoint import (
        AsyncSaver,
        prune_checkpoints,
    )

    saver = AsyncSaver()
    state = {"a": jnp.arange(4.0)}
    for step in (1, 2, 3):
        saver.save(
            str(tmp_path / f"chkpt-{step}"),
            state,
            on_complete=lambda: prune_checkpoints(str(tmp_path), "chkpt", 2),
        )
    saver.wait()
    names = sorted(n for n in os.listdir(tmp_path) if n.startswith("chkpt-"))
    assert names == ["chkpt-2", "chkpt-3"], names


def test_resume_meta_sidecar_tolerates_corruption(tmp_path):
    """A truncated/garbage/schema-less sidecar must degrade to None (the
    arithmetic fallback), never block resume: the kill-mid-write window is
    exactly the preemption scenario the sidecar exists to survive. Writes
    are atomic (tmp+rename), so this only happens with external damage —
    but a checkpoint that cannot be resumed is the worst failure mode."""
    import json as json_mod

    from vae_channel_dynamics_tpu.training.checkpoint import (
        RESUME_META,
        read_resume_meta,
    )

    d = tmp_path / "ckpt"
    d.mkdir()
    assert read_resume_meta(str(d)) is None  # missing: fine

    (d / RESUME_META).write_text("")  # truncated (empty)
    assert read_resume_meta(str(d)) is None

    (d / RESUME_META).write_text("{not json")
    assert read_resume_meta(str(d)) is None

    (d / RESUME_META).write_text(json_mod.dumps({"micro_step": 3}))
    assert read_resume_meta(str(d)) is None  # schema-less: fallback

    good = {"micro_step": 3, "global_step": 3, "epoch": 0,
            "in_epoch_batches": 3}
    (d / RESUME_META).write_text(json_mod.dumps(good))
    assert read_resume_meta(str(d)) == good
