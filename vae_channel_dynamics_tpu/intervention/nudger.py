"""Intervention handler: "nudge" GroupNorm scales of inactive channels.

Reference behavior (src/intervention/nudger.py): at its interval, for each
classified layer, mutate ``param.data[idx]`` in place under ``no_grad`` —
strategy ``gentle_nudge_groupnorm_scale`` sets
``min(gamma[idx] * nudge_factor, max_scale_value)``;
``reset_groupnorm_scale`` sets 1.0. Applied only on the main process, which
under DDP desyncs replicas (SURVEY.md §5a-11).

TPU-native redesign: the nudge is a PURE FUNCTIONAL parameter update — the
handler returns a new params pytree, which the trainer installs into the
replicated train state, so every shard applies the identical update (the
multi-device correctness fix). Updates are masked scatter ops on the (C,)
scale vector; interval gating semantics (including the step-0 skip and the
interval==1 special case, nudger.py:94-97) are preserved."""

from __future__ import annotations

import logging
from typing import Any, Dict, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from ..utils import naming

logger = logging.getLogger(__name__)


class InterventionHandler:
    def __init__(self, config: Dict[str, Any]):
        self.config = config or {}
        self.strategy = self.config.get("strategy", "none")
        self.nudge_factor = float(self.config.get("nudge_factor", 1.1))
        self.nudge_value_add = float(self.config.get("nudge_value_add", 0.01))
        self.max_scale_value = float(self.config.get("max_scale_value", 2.0))
        self.num_nudges_applied = 0
        logger.info(
            "InterventionHandler initialized (strategy: %s)", self.strategy
        )

    def _interval_due(self, global_step: int) -> bool:
        interval = int(self.config.get("intervention_interval", 200))
        if global_step == 0 or global_step % interval != 0:
            # interval==1 intervenes every non-zero step
            return interval == 1 and global_step > 0
        return True

    def _nudged_scale(
        self, gamma: np.ndarray, indices: Sequence[int]
    ) -> Tuple[np.ndarray, int]:
        new = gamma.copy()
        applied = 0
        for idx in indices:
            if 0 <= idx < gamma.size:
                if self.strategy == "gentle_nudge_groupnorm_scale":
                    new[idx] = min(
                        float(gamma[idx]) * self.nudge_factor,
                        self.max_scale_value,
                    )
                else:  # reset_groupnorm_scale
                    new[idx] = 1.0
                applied += 1
            else:
                logger.warning(
                    "Inactive index %d out of bounds (size %d)", idx, gamma.size
                )
        return new, applied

    def intervene(
        self,
        params: Dict[str, Any],
        classification_results: Dict[str, Any],
        global_step: int,
        replicate_leaf=None,
    ) -> Dict[str, Any]:
        """Return a params pytree with nudges applied (the input tree is not
        modified). ``num_nudges_applied`` reports the count for this call.

        ``replicate_leaf`` (optional): re-replicator for ZeRO-3-sharded
        params on multi-host meshes (parallel.zero.make_replicate_leaf_fn)
        — the γ host fetch below needs a fully-addressable leaf. It is a
        collective when it fires, so intervene must be (and is) called on
        every process in the same order."""
        if not self.config.get("enabled", False):
            return params
        if self.strategy == "none":
            return params
        if not self._interval_due(global_step):
            return params
        logger.info(
            "Intervention at step %d (strategy '%s')", global_step, self.strategy
        )
        if not classification_results:
            logger.info(
                "Step %d: no regions classified, skipping intervention.",
                global_step,
            )
            return params
        if self.strategy not in (
            "gentle_nudge_groupnorm_scale",
            "reset_groupnorm_scale",
        ):
            logger.warning("Unknown intervention strategy: %s", self.strategy)
            return params

        self.num_nudges_applied = 0
        new_params = params
        for layer_key, data in classification_results.items():
            param_name = data.get("param_name_scale")
            indices = data.get("inactive_channel_indices")
            if not param_name or indices is None:
                logger.warning(
                    "Missing param_name_scale/indices for '%s'. Skipping.",
                    layer_key,
                )
                continue
            gamma = naming.get_param(new_params, param_name)
            if gamma is None:
                logger.warning(
                    "Could not retrieve scale parameter '%s'. Skipping.",
                    param_name,
                )
                continue
            if replicate_leaf is not None:
                gamma = replicate_leaf(gamma)
            gamma_np = np.asarray(gamma, np.float32)
            nudged, applied = self._nudged_scale(gamma_np, indices)
            if applied:
                new_params = naming.set_param(
                    new_params, param_name, jnp.asarray(nudged, jnp.float32)
                )
                self.num_nudges_applied += applied
        if self.num_nudges_applied > 0:
            logger.info(
                "Applied '%s' to %d channel scales at step %d.",
                self.strategy, self.num_nudges_applied, global_step,
            )
        return new_params
