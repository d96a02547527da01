"""Profiling harness: jax.profiler traces + step timing.

The reference has no tracing/profiling at all (SURVEY.md §5 — only tqdm
progress bars). Here a config section

    profiling:
      enabled: true
      start_step: 10       # first global step to capture
      num_steps: 5         # how many steps to capture
      output_subdir: "profile"

captures a TensorBoard-compatible device trace of the hot loop, and
``StepTimer`` keeps an images/sec estimate without forcing device syncs
(wall-clock over dispatched steps; exact throughput comes from bench.py's
chain-differencing methodology)."""

from __future__ import annotations

import logging
import os
import time
from typing import Any, Dict, Optional

logger = logging.getLogger(__name__)


class TraceCapture:
    """Start/stop a jax.profiler trace over a step window."""

    def __init__(self, config: Dict[str, Any], output_dir: str):
        cfg = config or {}
        self.enabled = bool(cfg.get("enabled", False))
        self.start_step = int(cfg.get("start_step", 10))
        self.num_steps = int(cfg.get("num_steps", 5))
        self.trace_dir = os.path.join(
            output_dir, cfg.get("output_subdir", "profile")
        )
        self._active = False
        self._done = False

    def maybe_start(self, global_step: int) -> None:
        if not self.enabled or self._done or self._active:
            return
        if global_step >= self.start_step:
            import jax

            os.makedirs(self.trace_dir, exist_ok=True)
            jax.profiler.start_trace(self.trace_dir)
            self._active = True
            logger.info(
                "Started profiler trace at step %d -> %s",
                global_step, self.trace_dir,
            )

    def maybe_stop(self, global_step: int) -> None:
        if not self._active:
            return
        if global_step >= self.start_step + self.num_steps:
            import jax

            jax.profiler.stop_trace()
            self._active = False
            self._done = True
            logger.info(
                "Stopped profiler trace at step %d (view with TensorBoard: "
                "tensorboard --logdir %s)", global_step, self.trace_dir,
            )

    def close(self) -> None:
        if self._active:
            import jax

            jax.profiler.stop_trace()
            self._active = False
            self._done = True


class StepTimer:
    """Rolling wall-clock throughput estimate (dispatch-side)."""

    def __init__(self, window: int = 50):
        self.window = window
        self._t0: Optional[float] = None
        self._count = 0
        self._images = 0
        self.images_per_sec = 0.0

    def update(self, batch_images: int) -> None:
        now = time.perf_counter()
        if self._t0 is None:
            self._t0 = now
            return
        self._count += 1
        self._images += batch_images
        if self._count >= self.window:
            self.images_per_sec = self._images / (now - self._t0)
            self._t0 = now
            self._count = 0
            self._images = 0
