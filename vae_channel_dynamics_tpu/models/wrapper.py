"""Eager convenience wrapper mirroring the reference SDXLVAEWrapper API
(src/models/sdxl_vae_wrapper.py:10-179) on top of the functional Flax model.

Training does NOT go through this class (the train loop uses the pure jitted
step in ``training.step``); it exists for evaluation, analysis, and API
parity: ``forward()``, ``encode()``/``decode()`` (with scaling_factor and
[-1, 1] clamp), and the hook-style activation capture
(``add_hooks``/``get_captured_activations``/``remove_hooks``) implemented as
compile-time capture tables instead of runtime forward hooks.
"""

from __future__ import annotations

import logging
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.naming import strip_vae_prefix
from .distributions import DiagonalGaussianDistribution
from .tiling import sliced_apply, tiled_apply
from .vae import AutoencoderKL, CaptureTable, VAEConfig, flatten_stats

logger = logging.getLogger(__name__)


class SDXLVAEWrapper:
    def __init__(
        self,
        config: Optional[VAEConfig] = None,
        params: Optional[Dict[str, Any]] = None,
        dtype: Any = jnp.float32,
        seed: int = 0,
        impl: str = "auto",
        attn_impl: str = "auto",
        remat: Any = False,
    ):
        self.config = config or VAEConfig.sdxl()
        self.dtype = dtype
        self.impl = impl
        self.attn_impl = attn_impl
        self.remat = remat
        self.scaling_factor = self.config.scaling_factor
        if params is None:
            params = self.init_params(seed)
        # Params arriving from disk (model_io.load_model_dir) are host numpy
        # arrays; without an explicit placement every jitted call re-uploads
        # all 335 MB to the device (measured: 13 s/request on a tunneled
        # chip). Place them once; device-resident params pass through.
        self.params = jax.device_put(params)
        self._capture: CaptureTable = ()
        self._captured: Dict[str, np.ndarray] = {}
        self._jit_cache: Dict[Tuple, Any] = {}
        # Tiled/sliced inference state (diffusers enable_tiling/enable_slicing
        # parity — the wrapped AutoencoderKL's API in the reference). Applies
        # to the inference helpers encode()/decode() only; forward() is the
        # training contract and always runs untiled.
        self.use_tiling = False
        self.use_slicing = False
        self.tile_sample_min_size = self.config.sample_size
        self.tile_overlap_factor = 0.25

    @property
    def spatial_factor(self) -> int:
        """Pixel-to-latent downsample factor (2^(len(block_out_channels)-1))."""
        return 2 ** (len(self.config.block_out_channels) - 1)

    # ------------------------------------------------------------------ #
    # Tiled / sliced inference toggles (diffusers AutoencoderKL API parity)
    def enable_tiling(
        self,
        tile_sample_min_size: Optional[int] = None,
        tile_overlap_factor: Optional[float] = None,
    ) -> None:
        """Encode/decode images larger than ``tile_sample_min_size`` in
        overlapping tiles with linear seam blending: activation memory scales
        with the tile, not the image (a 16 GB chip can decode 2048px+).
        Defaults mirror diffusers: tile = config.sample_size, overlap 0.25."""
        if tile_sample_min_size is not None:
            self.tile_sample_min_size = int(tile_sample_min_size)
        if tile_overlap_factor is not None:
            self.tile_overlap_factor = float(tile_overlap_factor)
        f = self.spatial_factor
        if self.tile_sample_min_size % f:
            raise ValueError(
                f"tile_sample_min_size ({self.tile_sample_min_size}) must be "
                f"divisible by the model's spatial factor {f}"
            )
        if not 0.0 < self.tile_overlap_factor < 1.0:
            raise ValueError("tile_overlap_factor must be in (0, 1)")
        if self._tile_stride() <= 0 or self._tile_stride() >= self.tile_sample_min_size:
            raise ValueError(
                f"tile_overlap_factor {self.tile_overlap_factor} leaves no "
                f"overlap (or no stride) at tile {self.tile_sample_min_size}"
            )
        self.use_tiling = True

    def disable_tiling(self) -> None:
        self.use_tiling = False

    def enable_slicing(self) -> None:
        """Run encode/decode one batch element at a time (diffusers
        enable_slicing): batched inference at single-sample activation cost."""
        self.use_slicing = True

    def disable_slicing(self) -> None:
        self.use_slicing = False

    def _tile_stride(self) -> int:
        """Pixel-space tile stride, snapped down to the spatial factor so the
        latent-space grid is exact (diffusers: int(tile * (1 - overlap)))."""
        f = self.spatial_factor
        stride = int(self.tile_sample_min_size * (1.0 - self.tile_overlap_factor))
        return max(stride // f * f, f)

    def _inference_key(self) -> Tuple:
        return (
            self.use_tiling,
            self.tile_sample_min_size if self.use_tiling else 0,
            self._tile_stride() if self.use_tiling else 0,
            self.use_slicing,
        )

    # ------------------------------------------------------------------ #
    def _module(self, capture: CaptureTable = ()) -> AutoencoderKL:
        return AutoencoderKL(
            config=self.config, dtype=self.dtype, impl=self.impl,
            attn_impl=self.attn_impl, remat=self.remat, capture=capture,
        )

    def init_params(self, seed: int = 0) -> Dict[str, Any]:
        cfg = self.config
        sample = jnp.zeros(
            (1, min(cfg.sample_size, 32), min(cfg.sample_size, 32), cfg.in_channels),
            self.dtype,
        )
        variables = self._module().init(
            {"params": jax.random.PRNGKey(seed), "sample": jax.random.PRNGKey(0)},
            sample,
            sample_posterior=False,
        )
        return variables["params"]

    def _apply_fn(self, capture: CaptureTable, sample_posterior: bool):
        key = ("forward", capture, sample_posterior)
        if key not in self._jit_cache:
            module = self._module(capture)

            def fn(params, pixel_values, rng):
                out, mutated = module.apply(
                    {"params": params},
                    pixel_values,
                    sample_posterior=sample_posterior,
                    rng=rng,
                    mutable=["stats"],
                )
                return out, flatten_stats(mutated.get("stats", {}))

            self._jit_cache[key] = jax.jit(fn)
        return self._jit_cache[key]

    # ------------------------------------------------------------------ #
    def forward(
        self,
        pixel_values: jax.Array,
        sample_posterior: bool = True,
        rng: Optional[jax.Array] = None,
    ) -> Dict[str, Any]:
        """Encode -> sample/mode -> decode. NHWC input in [-1, 1]. No
        scaling_factor applied (training contract, sdxl_vae_wrapper.py:69-70).

        Deliberate deviation from the reference: with ``rng=None`` the
        posterior sample uses a FIXED key (PRNGKey(0)), so repeated calls
        are bit-identical — reproducibility-first, where torch's
        ``torch.randn`` draws fresh noise per call. Thread ``rng`` (as the
        Trainer's step-keyed stream does) for fresh noise per call."""
        if rng is None:
            rng = jax.random.PRNGKey(0)
        fn = self._apply_fn(self._capture, sample_posterior)
        out, stats = fn(self.params, pixel_values, rng)
        if self._capture:
            self._store_captured(stats)
        return out

    def __call__(self, pixel_values, sample_posterior: bool = True, rng=None):
        return self.forward(pixel_values, sample_posterior, rng)

    # ------------------------------------------------------------------ #
    # Hook-style capture (sdxl_vae_wrapper.py:91-143 equivalents)
    def add_hooks(self, layer_names: List[str]) -> None:
        """Capture full activation maps at the named layers' outputs on
        subsequent forwards. Names may carry or omit the ``vae.`` prefix.

        Taps exist on parametric LEAF modules (convs, norms, dense); a
        composite name (e.g. ``encoder.mid_block.attentions.0``) or a typo
        captures nothing, so such names are warned about up front — the
        reference warns likewise when no hook attaches
        (sdxl_vae_wrapper.py:111-113)."""
        self.remove_hooks()
        from ..utils.naming import iter_modules

        known = {name for name, _ in iter_modules(self.params)}
        stripped = [strip_vae_prefix(n) for n in layer_names]
        unknown = [n for n in stripped if n not in known]
        if unknown:
            logger.warning(
                "No capture taps for layer name(s) %s — taps exist on "
                "parametric leaf modules only (e.g. "
                "'encoder.mid_block.attentions.0.group_norm', not the "
                "composite block). These names will capture nothing.",
                unknown,
            )
        self._capture = tuple(
            (n, "output", ("full_activation_map",)) for n in stripped
        )
        registered = [n for n in stripped if n in known]
        if registered:
            logger.info("Registered activation capture for: %s", registered)

    def remove_hooks(self) -> None:
        self._capture = ()
        self._captured = {}

    def _store_captured(self, stats: Dict[str, Any]) -> None:
        for key, value in stats.items():
            # key format: <layer>.<point>.full_activation_map — strip the
            # metric, then the capture point (layer names contain dots, so
            # split from the right)
            if key.endswith(".full_activation_map"):
                rest = key[: -len(".full_activation_map")]
                layer = rest.rsplit(".", 1)[0]
                self._captured[layer] = np.asarray(jax.device_get(value))

    def get_captured_activations(self) -> Dict[str, np.ndarray]:
        """Captured activations keyed by plain layer name, NCHW numpy."""
        return self._captured

    def clear_captured_activations(self) -> None:
        self._captured = {}

    # ------------------------------------------------------------------ #
    # Inference helpers (sdxl_vae_wrapper.py:147-179)
    def encode(
        self,
        pixel_values: jax.Array,
        rng: Optional[jax.Array] = None,
        deterministic: bool = False,
    ):
        """Pixel values [-1, 1] -> scaled latents (scaling_factor applied).

        ``deterministic=True`` takes the posterior mode instead of sampling
        (the inference analog of ``sample_posterior=False``). With tiling or
        slicing enabled the moments are computed tile-/sample-wise (diffusers
        tiled_encode semantics: moments are blended, then split).
        Like ``forward``, ``rng=None`` samples with a FIXED key (repeated
        calls bit-identical — documented deviation); pass ``rng`` for fresh
        noise."""
        key = ("encode", bool(deterministic)) + self._inference_key()
        if key not in self._jit_cache:
            module = self._module()
            tiling, slicing = self.use_tiling, self.use_slicing
            tile, stride, f = (
                self.tile_sample_min_size,
                self._tile_stride(),
                self.spatial_factor,
            )

            def fn(params, x, rng):
                def moments_fn(t):
                    return module.apply(
                        {"params": params},
                        t,
                        method=lambda m, v: m.quant_conv(m.encoder(v)),
                    )

                def encode_one(xs):
                    if tiling:
                        return tiled_apply(moments_fn, xs, tile, stride, 1, f)
                    return moments_fn(xs)

                moments = sliced_apply(encode_one, x) if slicing else encode_one(x)
                dist = DiagonalGaussianDistribution.from_moments(moments)
                z = dist.mode() if deterministic else dist.sample(rng)
                return z * self.scaling_factor

            self._jit_cache[key] = jax.jit(fn)
        if rng is None:
            rng = jax.random.PRNGKey(0)
        return self._jit_cache[key](self.params, pixel_values, rng)

    def decode(self, latents: jax.Array) -> jax.Array:
        """Scaled latents -> pixels clamped to [-1, 1]. With tiling/slicing
        enabled, decodes latent tiles / single samples and blends (diffusers
        tiled_decode semantics; the [-1,1] clamp applies after assembly)."""
        key = ("decode",) + self._inference_key()
        if key not in self._jit_cache:
            module = self._module()
            tiling, slicing = self.use_tiling, self.use_slicing
            f = self.spatial_factor
            tile_lat, stride_lat = self.tile_sample_min_size // f, self._tile_stride() // f

            def fn(params, z):
                def decode_fn(t):
                    return module.apply(
                        {"params": params},
                        t,
                        method=lambda m, v: m.decoder(m.post_quant_conv(v)),
                    )

                def decode_one(zs):
                    if tiling:
                        return tiled_apply(decode_fn, zs, tile_lat, stride_lat, f, 1)
                    return decode_fn(zs)

                z = z / self.scaling_factor
                img = sliced_apply(decode_one, z) if slicing else decode_one(z)
                return jnp.clip(img, -1.0, 1.0)

            self._jit_cache[key] = jax.jit(fn)
        return self._jit_cache[key](self.params, latents)
