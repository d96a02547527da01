"""Activity monitor: per-channel activation statistics without host syncs.

Reference behavior (src/tracking/monitor.py): forward hooks compute metrics
per forward with synchronous ``.detach().cpu()`` copies, buffer them on
host, and aggregate every ``track_interval`` optimizer steps into
``processed_data_by_step`` plus a flat wandb-metric dict.

TPU-native redesign: the model's capture taps emit statistics as side
outputs of the jitted train step; running sums live on device inside the
TrainState (``stats_acc``) and only cross to host at the track interval.
Full activation maps are not accumulated — the train loop requests them only
on interval steps via a step variant whose capture table includes them
(zero cost on all other steps).

Aggregation parity: interval value = mean of per-forward values
(monitor.py:179-186); full maps keep one snapshot per interval
(monitor.py:166-178; the reference keeps the FIRST forward of the interval,
we keep the interval step's own forward — documented deviation). The wandb
key schema and CSV record schema match the reference exactly.
"""

from __future__ import annotations

import logging
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.vae import CaptureTable
from ..utils.naming import strip_vae_prefix

logger = logging.getLogger(__name__)

_KNOWN_METRICS = (
    "mean_abs_activation_per_channel",
    "mean_activation",
    "std_activation",
    "zero_fraction_per_channel",
    "full_activation_map",
)


class MapSummary:
    """Eviction placeholder for a full activation map
    (``tracking.max_map_history``): keeps exactly the statistics the CSV
    export emits for maps, at none of the memory."""

    __slots__ = ("shape", "stats")

    def __init__(self, arr):
        a = np.asarray(arr)
        self.shape = tuple(a.shape)
        a32 = a.astype(np.float32)
        self.stats = {
            "mean": float(np.mean(a32)),
            "std": float(np.std(a32)),
            "min": float(np.min(a32)),
            "max": float(np.max(a32)),
        }


class ActivityMonitor:
    """Parses ``tracking`` config into capture tables and owns aggregation.

    The train loop wires ``scalar_capture_table`` into the hot step's module
    and ``map_capture_table`` into the interval step's module, passes
    :meth:`accumulate` into the jitted step, and calls :meth:`step` at
    interval boundaries.
    """

    def __init__(self, tracking_config: Dict[str, Any]):
        self.config = tracking_config or {}
        self.enabled = bool(self.config.get("enabled", False))
        self.track_interval = int(self.config.get("track_interval", 100))
        self.processed_data_by_step: Dict[int, Dict[str, Dict[str, Any]]] = {}
        # tracking.max_map_history [new]: cap on how many intervals keep
        # their FULL activation maps in host memory (a 100 MB+ tensor per
        # tracked layer per interval on the SDXL model). 0 = keep all, the
        # reference's behavior (it retains every interval's maps for the
        # run's lifetime, src/tracking/monitor.py:166-178). Older maps are
        # replaced by MapSummary placeholders carrying exactly the stats the
        # final CSV export needs, so the export schema is unchanged; only
        # re-visualization of old steps becomes impossible (the logit lens
        # always reads the current interval).
        self.max_map_history = int(self.config.get("max_map_history", 0))

        # stat_key ("<norm_name>.<point>.<metric>") -> (layer_identifier, metric)
        self.key_to_identifier: Dict[str, Tuple[str, str]] = {}
        scalar_specs: Dict[Tuple[str, str], set] = {}
        map_specs: Dict[Tuple[str, str], set] = {}

        for layer_conf in self.config.get("target_layers", []):
            name = layer_conf.get("name")
            if not name:
                logger.warning("Skipping a target_layer entry with no name.")
                continue
            point = layer_conf.get("capture_point", "output")
            if point not in ("input", "output"):
                logger.warning(
                    "Unknown capture_point '%s' for %s; skipping", point, name
                )
                continue
            metrics = layer_conf.get(
                "metrics", ["mean_abs_activation_per_channel"]
            )
            norm_name = strip_vae_prefix(name)
            identifier = f"{name}.{point}"
            for metric in metrics:
                if metric not in _KNOWN_METRICS:
                    logger.warning("Unknown metric '%s' requested.", metric)
                    continue
                key = f"{norm_name}.{point}.{metric}"
                self.key_to_identifier[key] = (identifier, metric)
                bucket = (
                    map_specs if metric == "full_activation_map" else scalar_specs
                )
                bucket.setdefault((norm_name, point), set()).add(metric)

        self._scalar_table: CaptureTable = tuple(
            (n, p, tuple(sorted(ms))) for (n, p), ms in sorted(scalar_specs.items())
        )
        self._map_table: CaptureTable = tuple(
            (n, p, tuple(sorted(ms))) for (n, p), ms in sorted(map_specs.items())
        )
        if self.enabled:
            logger.info(
                "ActivityMonitor: %d scalar tap(s), %d map tap(s), interval %d",
                len(self._scalar_table), len(self._map_table), self.track_interval,
            )
        else:
            logger.info("ActivityMonitor is disabled in config.")

    # ------------------------------------------------------------------ #
    @property
    def scalar_capture_table(self) -> CaptureTable:
        return self._scalar_table if self.enabled else ()

    @property
    def map_capture_table(self) -> CaptureTable:
        """Capture table for interval steps: scalar taps + full maps."""
        if not self.enabled:
            return ()
        merged: Dict[Tuple[str, str], set] = {}
        for n, p, ms in self._scalar_table + self._map_table:
            merged.setdefault((n, p), set()).update(ms)
        return tuple(
            (n, p, tuple(sorted(ms))) for (n, p), ms in sorted(merged.items())
        )

    @property
    def map_keys(self) -> Tuple[str, ...]:
        return tuple(
            k for k, (_ident, metric) in self.key_to_identifier.items()
            if metric == "full_activation_map"
        )

    def init_acc(self, module, params, batch_shape) -> Dict[str, jax.Array]:
        """Zero-initialized accumulator matching the scalar stat shapes,
        derived with eval_shape (no compute)."""
        if not self.enabled or not self._scalar_table:
            return {}
        from ..training.step import _forward_with_stats

        def fn(p):
            _out, stats = _forward_with_stats(
                module, p, jnp.zeros(batch_shape, jnp.float32), None, False
            )
            return stats

        shapes = jax.eval_shape(fn, params)
        return {
            k: jnp.zeros(v.shape, v.dtype)
            for k, v in shapes.items()
            if k in self.key_to_identifier
            and self.key_to_identifier[k][1] != "full_activation_map"
        }

    @staticmethod
    def accumulate(
        acc: Dict[str, jax.Array], stats: Dict[str, jax.Array]
    ) -> Dict[str, jax.Array]:
        """Pure running-sum update used inside the jitted train step."""
        return {k: acc[k] + stats[k] for k in acc}

    # ------------------------------------------------------------------ #
    def step(
        self,
        global_step: int,
        stats_acc: Dict[str, Any],
        stats_count: Any,
        maps: Optional[Dict[str, Any]] = None,
    ) -> Dict[str, float]:
        """Aggregate the interval and emit the flat wandb-metric dict
        (key schema parity with monitor.py:170-202). Fetches from device
        exactly once. The caller resets the state accumulator afterwards."""
        if not self.enabled:
            return {}

        count = float(jax.device_get(stats_count))
        if count <= 0 and not maps:
            return {}

        wandb_metrics: Dict[str, float] = {}
        processed: Dict[str, Dict[str, Any]] = {}

        host_acc = jax.device_get(stats_acc)
        for key, value in host_acc.items():
            ident_metric = self.key_to_identifier.get(key)
            if ident_metric is None:
                continue
            identifier, metric = ident_metric
            agg = np.asarray(value, np.float64) / max(count, 1.0)
            processed.setdefault(identifier, {})[metric] = (
                agg.astype(np.float32) if agg.ndim else float(agg)
            )
            prefix = f"tracking/{identifier}/{metric}"
            if "mean_abs_activation_per_channel" in metric or (
                agg.ndim == 1
            ):
                wandb_metrics[f"{prefix}_overall_mean"] = float(np.mean(agg))
                wandb_metrics[f"{prefix}_overall_std"] = float(np.std(agg))
            else:
                wandb_metrics[prefix] = float(agg)

        for key, value in (maps or {}).items():
            ident_metric = self.key_to_identifier.get(key)
            if ident_metric is None:
                continue
            identifier, metric = ident_metric
            arr = np.asarray(jax.device_get(value), np.float32)
            processed.setdefault(identifier, {})[metric] = arr
            prefix = f"tracking/{identifier}/{metric}"
            wandb_metrics[f"{prefix}_mean"] = float(np.mean(arr))
            wandb_metrics[f"{prefix}_std"] = float(np.std(arr))

        if processed:
            self.processed_data_by_step[global_step] = processed
            logger.info(
                "ActivityMonitor processed data for step %d.", global_step
            )
            self._evict_old_maps()
        return wandb_metrics

    def get_data_for_step(self, global_step: int) -> Dict[str, Any]:
        return self.processed_data_by_step.get(global_step, {})

    def _evict_old_maps(self) -> None:
        """Replace full maps older than the newest ``max_map_history``
        intervals with :class:`MapSummary` placeholders (same CSV records,
        none of the memory)."""
        if self.max_map_history <= 0:
            return
        steps_with_maps = sorted(
            step
            for step, data in self.processed_data_by_step.items()
            if any(
                "full_activation_map" in metrics
                and not isinstance(
                    metrics["full_activation_map"], MapSummary
                )
                for metrics in data.values()
            )
        )
        for step in steps_with_maps[: -self.max_map_history]:
            for metrics in self.processed_data_by_step[step].values():
                value = metrics.get("full_activation_map")
                if value is not None and not isinstance(value, MapSummary):
                    metrics["full_activation_map"] = MapSummary(value)

    # ------------------------------------------------------------------ #
    def export_all_processed_data_to_records(self) -> List[Dict[str, Any]]:
        """Long-format records for tracked_activation_stats.csv — column and
        metric_type schema parity with monitor.py:221-271 so the reference's
        ActivityPlotter conventions apply unchanged."""
        records: List[Dict[str, Any]] = []
        for global_step, step_data in self.processed_data_by_step.items():
            for identifier, metrics in step_data.items():
                for metric, value in metrics.items():
                    base = {
                        "global_step": global_step,
                        "layer_identifier": identifier,
                        "original_metric_name": metric,
                    }
                    if isinstance(value, MapSummary):
                        records.append(
                            {**base, "metric_type": "full_map_shape",
                             "metric_value": str(value.shape)}
                        )
                        for stat in ("mean", "std", "min", "max"):
                            records.append(
                                {**base, "metric_type": f"full_map_{stat}",
                                 "metric_value": value.stats[stat]}
                            )
                        continue
                    arr = np.asarray(value)
                    if arr.ndim == 0:
                        records.append(
                            {**base, "metric_type": "scalar",
                             "metric_value": float(arr)}
                        )
                    elif metric == "full_activation_map":
                        records.append(
                            {**base, "metric_type": "full_map_shape",
                             "metric_value": str(tuple(arr.shape))}
                        )
                        for stat, fn in (
                            ("mean", np.mean), ("std", np.std),
                            ("min", np.min), ("max", np.max),
                        ):
                            records.append(
                                {**base, "metric_type": f"full_map_{stat}",
                                 "metric_value": float(fn(arr.astype(np.float32)))}
                            )
                    elif "mean_abs_activation_per_channel" in metric:
                        for stat, fn in (
                            ("mean", np.mean), ("std", np.std),
                            ("min", np.min), ("max", np.max),
                        ):
                            records.append(
                                {**base,
                                 "metric_type": f"per_channel_overall_{stat}",
                                 "metric_value": float(fn(arr))}
                            )
                    else:
                        records.append(
                            {**base, "metric_type": "array_mean",
                             "metric_value": float(np.mean(arr))}
                        )
                        records.append(
                            {**base, "metric_type": "array_std",
                             "metric_value": float(np.std(arr))}
                        )
        return records
