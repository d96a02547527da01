"""Dead-weight tracker: percentage of near-zero parameter entries.

Reference behavior (src/tracking/deadneuron.py): each interval, scan
``named_parameters()`` of the VAE, and for params belonging to
Conv/Linear/GroupNorm modules compute the percentage of entries considered
"dead" under one of three policies:

- ``threshold``        |w| < threshold
- ``percent_of_mean``  |w| < mean_percentage * mean(|w|)  (with an
                       all-zero special case when mean(|w|) < 1e-9)
- ``both``             logical AND of the two conditions

TPU-native redesign: all percentages are computed on device in ONE jitted
call over the filtered parameter pytree (a single host fetch per interval,
instead of a Python loop of ``.item()`` syncs). Histories are host-side:
``percent_history[name]`` appends ``(step, pct)``; ``weights_history[name]``
keeps ONLY the latest raw snapshot (replace-not-append parity with
deadneuron.py:55-56, which DeadNeuronPlotter relies on)."""

from __future__ import annotations

import logging
from collections import defaultdict
from typing import Any, Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..utils import naming

logger = logging.getLogger(__name__)

TARGET_KINDS = ("conv", "dense", "groupnorm")


def _pct_threshold(w: jax.Array, threshold: float) -> jax.Array:
    wf = jnp.abs(w.astype(jnp.float32))
    return jnp.mean((wf < threshold).astype(jnp.float32)) * 100.0


def _pct_percent_of_mean(w: jax.Array, mean_percentage: float) -> jax.Array:
    wf = jnp.abs(w.astype(jnp.float32))
    mean_abs = jnp.mean(wf)
    all_zero = jnp.all(wf < 1e-9)
    adaptive = jnp.mean((wf < mean_percentage * mean_abs).astype(jnp.float32)) * 100.0
    degenerate = jnp.where(all_zero, 100.0, 0.0)
    return jnp.where(jnp.abs(mean_abs) < 1e-9, degenerate, adaptive)


def _pct_both(w: jax.Array, threshold: float, mean_percentage: float) -> jax.Array:
    wf = jnp.abs(w.astype(jnp.float32))
    fixed = wf < threshold
    mean_abs = jnp.mean(wf)
    adaptive = jnp.where(
        jnp.abs(mean_abs) < 1e-9, wf < 1e-9, wf < mean_percentage * mean_abs
    )
    return jnp.mean((fixed & adaptive).astype(jnp.float32)) * 100.0


class DeadNeuronTracker:
    def __init__(
        self,
        target_layer_kinds: Sequence[str] = TARGET_KINDS,
        target_layer_names_for_raw_weights: Sequence[str] = (),
        threshold: float = 1e-8,
        mean_percentage: float = 0.01,
        dead_type: str = "threshold",
    ):
        self.threshold = float(threshold)
        self.mean_percentage = float(mean_percentage)
        self.target_layer_kinds = tuple(target_layer_kinds)
        self.target_layer_names_for_raw_weights = list(
            target_layer_names_for_raw_weights
        )
        if dead_type not in ("threshold", "percent_of_mean", "both"):
            logger.warning(
                "Unknown dead_type: %s. Percentages will be 0.", dead_type
            )
            dead_type = "noop"
        self.dead_type = dead_type

        self.weights_history: Dict[str, List[np.ndarray]] = defaultdict(list)
        self.percent_history: Dict[str, List[Tuple[int, float]]] = defaultdict(list)
        self._compute = None  # jitted, built lazily per params structure

    # ------------------------------------------------------------------ #
    def _target_params(self, params) -> Dict[str, Any]:
        out = {}
        for mod_name, mod in naming.iter_modules(params):
            if naming.module_kind(mod) not in self.target_layer_kinds:
                continue
            for leaf_name, leaf in mod.items():
                torch_leaf = "weight" if leaf_name in ("kernel", "scale") else leaf_name
                out[f"{mod_name}.{torch_leaf}"] = leaf
        return out

    def _build_compute(self):
        dead_type = self.dead_type
        threshold = self.threshold
        mean_percentage = self.mean_percentage

        def compute(targets: Dict[str, jax.Array]) -> Dict[str, jax.Array]:
            if dead_type == "threshold":
                return {k: _pct_threshold(w, threshold) for k, w in targets.items()}
            if dead_type == "percent_of_mean":
                return {
                    k: _pct_percent_of_mean(w, mean_percentage)
                    for k, w in targets.items()
                }
            if dead_type == "both":
                return {
                    k: _pct_both(w, threshold, mean_percentage)
                    for k, w in targets.items()
                }
            return {k: jnp.zeros(()) for k in targets}

        return jax.jit(compute)

    # ------------------------------------------------------------------ #
    def track_dead_neurons(
        self, params, global_step: int, replicate_leaf=None
    ) -> None:
        """One device round-trip: compute every percentage on device,
        fetch, append to histories; snapshot configured raw weights.

        ``replicate_leaf`` (optional): re-replicator for ZeRO-3-sharded
        params on multi-host meshes (parallel.zero.make_replicate_leaf_fn)
        — the raw-weight snapshots below fetch whole leaves to host. The
        percentage computation itself needs nothing: it is a jitted
        reduction whose shardings are inferred from the (possibly sharded)
        arguments and whose outputs are replicated scalars."""
        targets = self._target_params(params)
        if not targets:
            logger.warning("DeadNeuronTracker: no target parameters found.")
            return
        if self._compute is None:
            self._compute = self._build_compute()
        pcts = jax.device_get(self._compute(targets))
        for name, pct in pcts.items():
            self.percent_history[name].append((global_step, float(pct)))

        for name in self.target_layer_names_for_raw_weights:
            stripped = naming.strip_vae_prefix(name)
            leaf = naming.get_param(params, stripped)
            if leaf is None:
                logger.debug("Raw-weight target not found: %s", name)
                continue
            if replicate_leaf is not None:
                leaf = replicate_leaf(leaf)
            # replace-not-append: only the latest snapshot survives
            self.weights_history[name] = [
                naming.to_torch_layout(stripped, leaf)
            ]
