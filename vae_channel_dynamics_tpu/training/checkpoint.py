"""Orbax-based train-state checkpointing with resume.

The reference writes ``accelerator.save_state`` checkpoints periodically and
at the end (src/train.py:358-362, :392-416) but NEVER loads them back —
resume does not exist there (SURVEY.md §5). Here both roles are covered:
``save_train_state``/``restore_train_state`` persist the full state
(params + optimizer + step + stats accumulator), and the trainer's
``--resume_from`` picks up exactly where a run stopped."""

from __future__ import annotations

import json
import logging
import os
import threading
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import orbax.checkpoint as ocp

logger = logging.getLogger(__name__)

STATE_SUBDIR = "state"
RESUME_META = "resume_meta.json"


def _make_checkpointer() -> ocp.Checkpointer:
    """A checkpointer whose barriers never cross processes.

    Orbax's default ``StandardCheckpointer`` synchronizes ALL processes at
    save/restore boundaries — correct when every process calls save, but
    this framework writes checkpoints from the MAIN process only (the
    state is fully replicated, or gathered to replicated first under
    multi-host ZeRO; see parallel/zero.make_gather_fn). A main-only call
    into a global-barrier save deadlocks the other processes' next sync
    (observed as "sync_global_devices name mismatch"). Restricting
    ``active_processes`` to the calling process makes every barrier
    process-local, so main-only saves and per-process restores (each
    process reads the same files independently on resume) both work."""
    if jax.process_count() > 1:
        pid = jax.process_index()
        return ocp.Checkpointer(
            ocp.StandardCheckpointHandler(),
            multiprocessing_options=ocp.options.MultiprocessingOptions(
                primary_host=pid,
                active_processes={pid},
                barrier_sync_key_prefix=f"vcd-p{pid}",
            ),
        )
    return ocp.StandardCheckpointer()


class AsyncSaver:
    """Non-blocking checkpoint writes for the hot loop.

    ``save`` snapshots the state ON DEVICE first (a cheap device-side copy,
    which also makes the snapshot immune to the train step's buffer
    donation — the live state's buffers are donated into the next step and
    may be deleted before a background fetch could read them), then fetches
    and writes in a background thread. The step loop never stalls on the
    device→host transfer or the filesystem.

    One save is in flight at a time; a new ``save`` joins the previous one
    first. Call ``wait()`` before reading checkpoints back or exiting.
    Writer errors are re-raised on the next ``save``/``wait`` call.
    """

    def __init__(self) -> None:
        self._thread: Optional[threading.Thread] = None
        self._error: Optional[BaseException] = None

    def save(
        self, path: str, state: Any, on_complete=None, meta=None
    ) -> None:
        """``on_complete`` (e.g. checkpoint pruning) runs in the writer
        thread AFTER the checkpoint lands — pruning from the dispatching
        thread would list the directory before the new checkpoint exists
        and lag one save behind."""
        self.wait()

        def _snapshot_leaf(x):
            if not isinstance(x, jax.Array):
                return x
            if x.is_fully_addressable:
                return jnp.copy(x)
            # Multi-host: this process only addresses its own shards, and
            # computations (jnp.copy) on non-fully-addressable arrays raise.
            # The state handed to save is fully replicated by this point
            # (plain DP state, or ZeRO state re-replicated by _for_save's
            # gather), and device_get IS legal on replicated global arrays —
            # it blocks on the D2H here, trading a little async-ness for a
            # snapshot the writer thread can use.
            return jax.device_get(x)

        snapshot = jax.tree.map(_snapshot_leaf, state)

        def _write() -> None:
            try:
                save_train_state(path, snapshot, meta=meta)
                if on_complete is not None:
                    on_complete()
            except BaseException as e:  # noqa: BLE001 — surfaced on wait()
                self._error = e

        self._thread = threading.Thread(
            target=_write, name="vcd-ckpt-writer", daemon=True
        )
        self._thread.start()

    def wait(self, reraise: bool = True) -> None:
        """Join any in-flight write. ``reraise=False`` joins without raising
        a stored writer error (for exception-path cleanup, where raising
        would mask the in-flight exception); the error stays stored and the
        next ``wait()``/``save()`` surfaces it."""
        if self._thread is not None:
            self._thread.join()
            self._thread = None
        if reraise and self._error is not None:
            error, self._error = self._error, None
            raise error


def save_train_state(path: str, state: Any, meta: Optional[Dict] = None) -> None:
    """Write the state pytree under ``path``/state (overwrites).

    ``meta`` (optional) is a small JSON sidecar (``resume_meta.json``)
    recording the data-stream position — epoch and in-epoch batch count —
    so resume can re-place the stream EXACTLY instead of deriving the
    position from ``micro_step // batches_per_epoch``. The derivation is
    only correct when every epoch has a knowable, constant length; for
    streaming datasets (no ``len``) the epoch length is whatever the
    stream yielded, which the sidecar records and arithmetic cannot."""
    target = os.path.join(os.path.abspath(path), STATE_SUBDIR)
    if os.path.exists(target):
        import shutil

        shutil.rmtree(target)
    with _make_checkpointer() as ck:
        ck.save(target, jax.device_get(state))
    if meta is not None:
        # atomic write (tmp + rename): a preemption mid-write must not
        # leave a truncated sidecar — the kill window is exactly the
        # scenario the sidecar exists to survive
        final = os.path.join(os.path.abspath(path), RESUME_META)
        tmp = final + ".tmp"
        with open(tmp, "w") as f:
            json.dump(meta, f)
        os.replace(tmp, final)
    logger.info("Saved train state to %s", target)


def read_resume_meta(path: str) -> Optional[Dict]:
    """The ``resume_meta.json`` sidecar of a checkpoint dir, or None.

    Tolerant by design: a missing, truncated, or schema-less sidecar
    returns None (with a warning) so resume falls back to the arithmetic
    derivation instead of refusing to start."""
    p = os.path.join(os.path.abspath(path), RESUME_META)
    if not os.path.isfile(p):
        return None
    try:
        with open(p) as f:
            meta = json.load(f)
        # values must be usable as ints — a sidecar with nulls/strings would
        # otherwise crash the resume arithmetic at startup, exactly the
        # refuse-to-start failure this tolerant reader exists to avoid
        for k in ("micro_step", "epoch", "in_epoch_batches"):
            if not isinstance(meta.get(k), int):
                raise ValueError(
                    f"key {k!r} missing or non-integer in {sorted(meta)}"
                )
        return meta
    except (ValueError, OSError) as e:  # ValueError covers JSONDecodeError
        logger.warning(
            "Ignoring unreadable resume sidecar %s (%s); falling back to "
            "derived stream position.", p, e,
        )
        return None


def restore_train_state(path: str, template: Any) -> Any:
    """Restore a state pytree shaped like ``template`` from ``path``."""
    target = os.path.join(os.path.abspath(path), STATE_SUBDIR)
    if not os.path.isdir(target):
        raise FileNotFoundError(f"No checkpoint state at {target}")
    with _make_checkpointer() as ck:
        restored = ck.restore(target, jax.device_get(template))
    logger.info("Restored train state from %s", target)
    return restored


def prune_checkpoints(
    output_dir: str, prefix: str = "chkpt", keep_last_n: int = 0
) -> None:
    """Delete all but the newest ``keep_last_n`` periodic checkpoints.

    The reference never prunes (quirk SURVEY.md §5a-13); enable with
    ``saving.keep_last_n`` — 0 (default) keeps everything, reference parity.
    """
    if keep_last_n <= 0 or not os.path.isdir(output_dir):
        return
    import shutil

    steps = []
    for name in os.listdir(output_dir):
        if name.startswith(prefix + "-"):
            suffix = name.rsplit("-", 1)[-1]
            if suffix.isdigit():
                steps.append(int(suffix))
    for step in sorted(steps)[:-keep_last_n]:
        target = os.path.join(output_dir, f"{prefix}-{step}")
        shutil.rmtree(target, ignore_errors=True)
        logger.info("Pruned old checkpoint %s", target)


def latest_checkpoint(output_dir: str, prefix: str = "chkpt") -> Optional[str]:
    """Find the highest-step ``<prefix>-<step>`` checkpoint dir in a run."""
    if not os.path.isdir(output_dir):
        return None
    best, best_step = None, -1
    for name in os.listdir(output_dir):
        if not name.startswith(prefix + "-"):
            continue
        suffix = name.rsplit("-", 1)[-1]
        if suffix.isdigit() and int(suffix) > best_step:
            candidate = os.path.join(output_dir, name)
            if os.path.isdir(os.path.join(candidate, STATE_SUBDIR)):
                best, best_step = candidate, int(suffix)
    return best
