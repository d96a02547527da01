"""Logit Lens for VAEs: visualize intermediate activation maps and project
them through a fixed random mini-decoder.

Reference behavior (src/analysis/logit_lens.py): per-channel activation
grids with per-tile min-max normalization, and a "lens" projection through a
randomly initialized, NEVER-trained mini-decoder
``ConvTranspose(C_in,16,k3,s2) -> ReLU -> ConvTranspose(16,3,k3,s2) ->
Sigmoid`` (logit_lens.py:55-61 — a fixed random lens by design), in two
modes: ``mini_decoder_single_channel`` (each channel as a 1x1xHxW input)
and ``mini_decoder_full_map``.

Here the mini-decoder is a Flax module with seed-fixed parameters and a
jitted apply; activations arrive as NCHW numpy arrays (the capture-tap
convention) and output PNG names/directory structure match the reference's
so downstream tooling finds the same artifact tree. During training this
also accepts the monitor's per-step dicts, resolving ``<id>.<metric>``-style
names to the contained ``full_activation_map`` (the working version of the
reference's quirk SURVEY.md §5a-6, which warned-and-skipped)."""

from __future__ import annotations

import logging
import os
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402

logger = logging.getLogger(__name__)


class MiniDecoder(nn.Module):
    """Two ConvTranspose 2x upsamples: C_in -> 16 -> 3 with Sigmoid."""

    in_channels: int = 1

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:  # NHWC
        x = nn.ConvTranspose(16, (3, 3), strides=(2, 2), padding="SAME")(x)
        x = nn.relu(x)
        x = nn.ConvTranspose(3, (3, 3), strides=(2, 2), padding="SAME")(x)
        return nn.sigmoid(x)


class VAELogitLens:
    def __init__(
        self,
        logit_lens_config: Optional[Dict[str, Any]] = None,
        main_experiment_output_dir: str = "./experiment_outputs",
        seed: int = 0,
    ):
        self.config = logit_lens_config or {}
        self.default_num_channels = self.config.get("default_num_channels_to_viz",
                                                    self.config.get("num_channels_to_viz", 4))
        self.default_batch_samples = self.config.get(
            "default_num_batch_samples_to_viz",
            self.config.get("num_batch_samples_to_viz", 1),
        )
        self.colormap = self.config.get("colormap", "viridis")
        viz_subdir = self.config.get(
            "visualization_output_subdir", "logit_lens_visualizations"
        )
        self.visualization_base_dir = os.path.join(
            main_experiment_output_dir, viz_subdir
        )
        os.makedirs(self.visualization_base_dir, exist_ok=True)
        self.seed = seed
        self._decoders: Dict[int, Any] = {}  # in_channels -> (module, params)
        logger.info(
            "VAELogitLens initialized. Visualizations in: %s",
            self.visualization_base_dir,
        )

    # ------------------------------------------------------------------ #
    def _decoder_for(self, in_channels: int):
        if in_channels not in self._decoders:
            module = MiniDecoder(in_channels=in_channels)
            params = module.init(
                jax.random.PRNGKey(self.seed),
                jnp.zeros((1, 8, 8, in_channels)),
            )["params"]
            apply = jax.jit(lambda p, x: module.apply({"params": p}, x))
            self._decoders[in_channels] = (params, apply)
        return self._decoders[in_channels]

    def project_through_mini_decoder(self, nchw: np.ndarray) -> np.ndarray:
        """(B, C, H, W) -> (B, H', W', 3) in [0, 1]."""
        params, apply = self._decoder_for(nchw.shape[1])
        nhwc = jnp.asarray(np.transpose(nchw, (0, 2, 3, 1)), jnp.float32)
        return np.asarray(jax.device_get(apply(params, nhwc)))

    @staticmethod
    def _safe_name(layer_identifier: str) -> str:
        return layer_identifier.replace(".", "_").replace("/", "_")

    def get_layer_logit_length(
        self, activation_map: np.ndarray, layer_identifier: str
    ) -> Optional[int]:
        if np.ndim(activation_map) != 4:
            logger.warning(
                "Cannot compute logit length for %s: not a 4D tensor",
                layer_identifier,
            )
            return None
        n = int(activation_map.shape[1])
        logger.info("Logit length (channels) for '%s': %d", layer_identifier, n)
        return n

    # ------------------------------------------------------------------ #
    def visualize_channel_activation_maps(
        self,
        activation_map_tensor: np.ndarray,
        layer_identifier: str,
        global_step: int,
        num_channels_to_viz: Optional[int] = None,
        num_batch_samples_to_viz: Optional[int] = None,
        colormap: Optional[str] = None,
    ) -> None:
        """Per-channel grids with per-tile min-max normalization; saved to
        ``step_{g}/{safe_layer}/sample_{i}_all_channels.png``."""
        arr = np.asarray(activation_map_tensor)
        if arr.ndim != 4:
            logger.warning(
                "Activation map for %s is not 4D (shape %s); skipping.",
                layer_identifier, getattr(arr, "shape", None),
            )
            return
        n_ch = min(
            num_channels_to_viz or self.default_num_channels, arr.shape[1]
        )
        n_samples = min(
            num_batch_samples_to_viz or self.default_batch_samples, arr.shape[0]
        )
        self.get_layer_logit_length(arr, layer_identifier)
        outdir = os.path.join(
            self.visualization_base_dir, f"step_{global_step}",
            self._safe_name(layer_identifier),
        )
        os.makedirs(outdir, exist_ok=True)
        cmap = colormap or self.colormap
        for s in range(n_samples):
            fig, axes = plt.subplots(1, n_ch, figsize=(n_ch * 4, 4))
            axes = np.atleast_1d(axes)
            for c in range(n_ch):
                tile = arr[s, c].astype(np.float32)
                lo, hi = tile.min(), tile.max()
                norm = (tile - lo) / (hi - lo) if hi - lo > 1e-6 else np.zeros_like(tile)
                axes[c].imshow(norm, cmap=cmap)
                axes[c].set_title(f"Channel {c}")
                axes[c].axis("off")
            plt.tight_layout()
            path = os.path.join(outdir, f"sample_{s}_all_channels.png")
            fig.savefig(path)
            plt.close(fig)
            logger.info("Saved activation grid for %s sample %d", layer_identifier, s)

    # ------------------------------------------------------------------ #
    def _resolve_activation(
        self, layer_name: str, activations: Dict[str, Any]
    ) -> Optional[np.ndarray]:
        """Accept either raw arrays keyed by layer name, or the monitor's
        per-step metric dicts (resolving '<id>.full_activation_map' names)."""
        value = activations.get(layer_name)
        if value is None and layer_name.endswith(".full_activation_map"):
            value = activations.get(layer_name[: -len(".full_activation_map")])
        if isinstance(value, dict):
            value = value.get("full_activation_map")
        if value is None:
            return None
        arr = np.asarray(value)
        return arr if arr.ndim == 4 else None

    def run_logit_lens_with_activations(
        self,
        global_step: int,
        layers_to_analyze: List[str],
        num_batch_samples_to_viz: Optional[int],
        projection_type: str,
        activations_to_process: Dict[str, Any],
    ) -> None:
        n_samples_default = (
            num_batch_samples_to_viz
            if num_batch_samples_to_viz is not None
            else self.default_batch_samples
        )
        logger.info("--- Running Logit Lens for step %d ---", global_step)
        if not activations_to_process:
            logger.warning("No activations provided. Skipping.")
            return
        for layer_name in layers_to_analyze:
            arr = self._resolve_activation(layer_name, activations_to_process)
            if arr is None:
                logger.warning(
                    "No 4D activation for layer '%s'. Skipping.", layer_name
                )
                continue
            b, c_total, _h, _w = arr.shape
            n_samples = min(n_samples_default, b)
            outdir = os.path.join(
                self.visualization_base_dir, f"step_{global_step}",
                self._safe_name(layer_name), "logit_lens_projections",
            )
            os.makedirs(outdir, exist_ok=True)
            logger.info(
                "Logit Lens for '%s' (shape %s)", layer_name, arr.shape
            )
            for s in range(n_samples):
                if projection_type == "mini_decoder_single_channel":
                    n_ch = min(self.default_num_channels, c_total)
                    singles = arr[s, :n_ch][:, None]  # (n_ch, 1, H, W)
                    projected = self.project_through_mini_decoder(singles)
                    fig, axes = plt.subplots(1, n_ch, figsize=(n_ch * 4, 4))
                    axes = np.atleast_1d(axes)
                    for c in range(n_ch):
                        axes[c].imshow(projected[c])
                        axes[c].set_title(f"Proj. Ch. {c}")
                        axes[c].axis("off")
                    plt.tight_layout()
                    fig.savefig(os.path.join(
                        outdir,
                        f"lens_sample_{s}_single_channel_projections_combined.png",
                    ))
                    plt.close(fig)
                elif projection_type == "mini_decoder_full_map":
                    projected = self.project_through_mini_decoder(arr[s : s + 1])
                    from PIL import Image

                    img = (projected[0] * 255).astype(np.uint8)
                    Image.fromarray(img).save(
                        os.path.join(outdir, f"lens_sample_{s}_full_map.png")
                    )
                else:
                    logger.warning(
                        "Unknown projection_type: %s. Skipping.", projection_type
                    )
        logger.info("Logit Lens analysis completed for step %d.", global_step)
