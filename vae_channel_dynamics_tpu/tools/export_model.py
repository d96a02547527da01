"""Serialize the VAE's inference entry points as portable StableHLO
artifacts (``jax.export``).

The reference ecosystem ships deployable model functions via TorchScript /
ONNX exports of diffusers models; the TPU-native analog is ``jax.export``:
each entry point (deterministic ``encode``, ``decode``, ``reconstruct``) is
traced once, lowered to StableHLO with a **symbolic batch dimension**, and
serialized to a version-stable artifact that any JAX runtime can load and
run — no framework code, no Flax module definitions, no Python model source
required at the destination. Artifacts are lowered for BOTH cpu and tpu, so
the same file serves local smoke tests and fleet deployment.

Parameters are an *argument* of the exported functions, not baked-in
constants: the artifact stays ~KB-sized, weights update independently of
the program (load them from the model dir's safetensors at the
destination), and the trace never embeds the 335 MB SDXL params as HLO
constants (which would also blow this rig's compile tunnel, see
.claude/skills/verify — the same discipline every wrapper API follows).

Spatial dims stay static by design: convs want static shapes for MXU
tiling, and the serving daemon already pads to fixed shapes (one XLA
program per endpoint). Only the batch is symbolic.

Usage:
    python -m vae_channel_dynamics_tpu.tools.export_model \
        --model_dir results/run/final_model/vae --dst exported/ \
        [--resolution 256] [--dtype bf16] [--check]

Loading (standalone, e.g. on the serving fleet):
    from vae_channel_dynamics_tpu.tools.export_model import load_exported
    fns = load_exported("exported/")            # {'encode': f, ...}
    latents = fns["encode"](params_pytree, pixels_nhwc)

Sampling-mode encode is deliberately not exported: it needs a PRNG key
argument and serving's ``--deterministic`` path (the reproducible one) is
the deployment contract. Reference analog: the reconstruct/encode/decode
semantics match sdxl_vae_wrapper.py:147-179 (scaling factor on encode,
/scaling + clamp on decode; reconstruction without scaling, :69-70).
"""

from __future__ import annotations

import argparse
import json
import logging
import os
from typing import Any, Callable, Dict

from ..utils.platform import apply_platform_env

logger = logging.getLogger(__name__)

_MANIFEST = "manifest.json"
_ENTRY_POINTS = ("encode", "decode", "reconstruct")


def _entry_fns(config, dtype) -> Dict[str, Callable]:
    """The three pure (params, x) -> y inference functions to export."""
    import jax.numpy as jnp

    from ..models.vae import AutoencoderKL

    module = AutoencoderKL(config=config, dtype=dtype)
    scale = config.scaling_factor

    def encode(params, pixels):
        dist = module.apply({"params": params}, pixels, method=module.encode)
        return dist.mode() * scale

    def decode(params, latents):
        img = module.apply(
            {"params": params}, latents / scale, method=module.decode
        )
        return jnp.clip(img, -1.0, 1.0)

    def reconstruct(params, pixels):
        out = module.apply(
            {"params": params}, pixels, sample_posterior=False
        )
        return out["reconstruction"]

    return {"encode": encode, "decode": decode, "reconstruct": reconstruct}


def export_model_dir(
    model_dir: str,
    dst: str,
    resolution: int = 256,
    dtype_name: str = "fp32",
    platforms=("cpu", "tpu"),
) -> Dict[str, Any]:
    """Export all entry points for ``model_dir`` into ``dst``.

    Returns the manifest dict. Files written: ``<name>.stablehlo`` per
    entry point plus ``manifest.json`` (shapes, dtypes, jax version,
    calling-convention version — everything a loader needs to validate
    compatibility before deserializing).
    """
    import jax
    from jax import export as jexport
    import jax.numpy as jnp

    from ..models.io import load_model_dir

    config, params = load_model_dir(model_dir)
    dtype = jnp.bfloat16 if dtype_name in ("bf16", "bfloat16") else jnp.float32
    fns = _entry_fns(config, dtype)

    res = int(resolution)
    latent_res = res // (2 ** (len(config.block_out_channels) - 1))
    (b,) = jexport.symbolic_shape("b")
    pixel_spec = jax.ShapeDtypeStruct(
        (b, res, res, config.in_channels), dtype
    )
    latent_spec = jax.ShapeDtypeStruct(
        (b, latent_res, latent_res, config.latent_channels), dtype
    )
    params_spec = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), params
    )
    in_specs = {
        "encode": (params_spec, pixel_spec),
        "decode": (params_spec, latent_spec),
        "reconstruct": (params_spec, pixel_spec),
    }

    os.makedirs(dst, exist_ok=True)
    manifest: Dict[str, Any] = {
        "format": "jax.export/stablehlo",
        "jax_version": jax.__version__,
        "calling_convention_version": (
            jexport.maximum_supported_calling_convention_version
        ),
        "platforms": list(platforms),
        "resolution": res,
        "latent_resolution": latent_res,
        "latent_channels": config.latent_channels,
        "dtype": "bfloat16" if dtype == jnp.bfloat16 else "float32",
        "scaling_factor": config.scaling_factor,
        "entry_points": {},
    }
    for name in _ENTRY_POINTS:
        exported = jexport.export(
            jax.jit(fns[name]), platforms=list(platforms)
        )(*in_specs[name])
        blob = exported.serialize()
        fname = f"{name}.stablehlo"
        with open(os.path.join(dst, fname), "wb") as f:
            f.write(blob)
        manifest["entry_points"][name] = {
            "file": fname,
            "bytes": len(blob),
            "in_avals": [str(a) for a in exported.in_avals],
            "out_avals": [str(a) for a in exported.out_avals],
        }
        logger.info("Exported %s (%d bytes)", name, len(blob))
    with open(os.path.join(dst, _MANIFEST), "w") as f:
        json.dump(manifest, f, indent=2)
    return manifest


def load_exported(path: str) -> Dict[str, Callable]:
    """Deserialize every entry point in an export dir.

    Returns ``{name: callable(params, x) -> y}``. Needs only jax — no model
    code. The batch dimension is symbolic: any batch size runs (each novel
    size compiles once, as with any jitted program).
    """
    from jax import export as jexport

    with open(os.path.join(path, _MANIFEST)) as f:
        manifest = json.load(f)
    fns: Dict[str, Callable] = {}
    for name, info in manifest["entry_points"].items():
        with open(os.path.join(path, info["file"]), "rb") as f:
            exported = jexport.deserialize(f.read())
        fns[name] = exported.call
    return fns


class ExportedVAEWrapper:
    """Serve the pinned StableHLO artifacts through the wrapper protocol
    the serving daemon consumes (``encode``/``decode``/``forward`` plus the
    ``params``/``resolution``/``scaling_factor``/``latent_shape``
    attributes it reads).

    This is the deployment mode of ``server.py --exported_dir``: the device
    programs are the serialized artifacts — the exact HLO that was
    validated at export time — never re-traced from current model code, so
    a serving fleet is immune to framework drift between export and
    deploy. Deterministic-only by construction (artifacts contain no
    sampling program): ``?deterministic=false`` requests fail with a clear
    client error instead of silently sampling differently than the
    artifact's contract.
    """

    # deserialized exported calls carry their own (single-device)
    # shardings; GSPMD cannot repartition them — VAEServer reads this and
    # refuses mesh serving for this wrapper
    supports_mesh = False

    def __init__(self, export_dir: str, params: Dict[str, Any]):
        import jax
        import jax.numpy as jnp

        with open(os.path.join(export_dir, _MANIFEST)) as f:
            self.manifest = json.load(f)
        self._fns = load_exported(export_dir)
        # place params on device ONCE — same fix as SDXLVAEWrapper: params
        # loaded from disk are host numpy arrays, and without this every
        # exported call re-uploads all 335 MB (measured 13.5 s/request vs
        # 0.23 s through the tunnel — the identical 35x bug PERF.md
        # documents for the live serving path)
        self.params = jax.device_put(params)
        self.resolution = int(self.manifest["resolution"])
        self.scaling_factor = float(self.manifest["scaling_factor"])
        # the latent geometry is explicit in the manifest — consumers (the
        # serving daemon's /decode shape guard) read it directly instead of
        # re-deriving it from a model config the artifact doesn't carry
        latent_res = int(self.manifest["latent_resolution"])
        self.latent_shape = (
            latent_res, latent_res, int(self.manifest["latent_channels"])
        )
        self._dtype = (
            jnp.bfloat16
            if self.manifest["dtype"] == "bfloat16"
            else jnp.float32
        )

    def _cast(self, x):
        import jax.numpy as jnp

        return jnp.asarray(x, self._dtype)

    @staticmethod
    def _deterministic_only(what: str):
        raise ValueError(
            f"{what} is not available when serving exported artifacts "
            "(deterministic-only); serve the live model for sampling"
        )

    def encode(self, pixel_values, rng=None, deterministic: bool = False):
        if not deterministic:
            self._deterministic_only("posterior sampling (encode)")
        return self._fns["encode"](self.params, self._cast(pixel_values))

    def decode(self, latents):
        return self._fns["decode"](self.params, self._cast(latents))

    def forward(self, pixel_values, sample_posterior: bool = True, rng=None):
        if sample_posterior:
            self._deterministic_only("posterior sampling (reconstruct)")
        return {
            "reconstruction": self._fns["reconstruct"](
                self.params, self._cast(pixel_values)
            )
        }


def main(argv=None) -> int:
    apply_platform_env()
    from ..utils.logging_utils import setup_logging

    setup_logging()
    parser = argparse.ArgumentParser(
        description="Export VAE inference entry points as StableHLO "
        "artifacts (symbolic batch; cpu+tpu)."
    )
    parser.add_argument("--model_dir", required=True)
    parser.add_argument("--dst", required=True)
    parser.add_argument("--resolution", type=int, default=256)
    parser.add_argument(
        "--dtype", default="fp32", choices=["fp32", "bf16", "bfloat16"]
    )
    parser.add_argument(
        "--check",
        action="store_true",
        help="after exporting, deserialize and compare a reconstruct() "
        "against the live model on a small random batch",
    )
    args = parser.parse_args(argv)
    manifest = export_model_dir(
        args.model_dir, args.dst, args.resolution, args.dtype
    )
    logger.info(
        "Export complete: %s -> %s (%s)",
        args.model_dir,
        args.dst,
        ", ".join(manifest["entry_points"]),
    )
    if args.check:
        import jax
        import jax.numpy as jnp
        import numpy as np

        from ..models.io import load_model_dir

        config, params = load_model_dir(args.model_dir)
        dtype = (
            jnp.bfloat16
            if args.dtype in ("bf16", "bfloat16")
            else jnp.float32
        )
        fns = load_exported(args.dst)
        live = _entry_fns(config, dtype)["reconstruct"]
        x = jax.random.uniform(
            jax.random.PRNGKey(0),
            (2, args.resolution, args.resolution, config.in_channels),
            dtype,
            -1.0,
            1.0,
        )
        got = np.asarray(fns["reconstruct"](params, x), np.float32)
        want = np.asarray(live(params, x), np.float32)
        err = float(np.max(np.abs(got - want)))
        logger.info("check: max |exported - live| = %.3g", err)
        if err > 1e-4:
            raise SystemExit(f"export check failed: max abs err {err}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
