"""Model directory save/load and diffusers-checkpoint import/export.

``save_model_dir``/``load_model_dir`` produce the ``<ckpt>/vae`` directory
the evaluate CLI loads (the analog of diffusers save_pretrained /
from_pretrained used at src/train.py:409-415 and src/evaluate.py:91-103).
The directory is **diffusers-compatible by construction**:
``config.json`` carries the full AutoencoderKL constructor schema
(down/up block types, act_fn, …) and the weights are written as
``diffusion_pytorch_model.safetensors`` with torch parameter names and
layouts (OIHW convs, (out,in) linears) — so ``AutoencoderKL.from_pretrained``
on a torch machine loads a TPU-trained model directly, completing the
reference's artifact contract in both directions (the reference only ever
writes this format, src/train.py:409-415). ``load_model_dir`` also accepts
the pre-round-3 ``model.safetensors`` filename for old run dirs.

``import_diffusers_state_dict`` converts a diffusers AutoencoderKL state
dict (torch names, OIHW conv kernels) into our Flax params pytree, enabling
tensor-by-tensor parity checks against the reference when a pretrained
checkpoint is locally available.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Mapping, Tuple

import jax
import numpy as np

from ..utils import naming
from .vae import VAEConfig

# Canonical (diffusers) weight filename first; the legacy name second so
# model dirs written before round 3 keep loading.
_SAFETENSORS_NAMES = (
    "diffusion_pytorch_model.safetensors",
    "model.safetensors",
)
_CONFIG_NAME = "config.json"


def diffusers_config_dict(config: VAEConfig) -> Dict[str, Any]:
    """The full diffusers ``AutoencoderKL`` constructor schema for
    ``config``, as ``save_pretrained`` would write it. Block-type lists are
    derived from the channel tuple (the SDXL VAE uses one encoder/decoder
    block type throughout); ``_diffusers_version`` is deliberately omitted —
    readers tolerate its absence and fabricating a version we did not run
    would be misleading."""
    n = len(config.block_out_channels)
    d = {
        "_class_name": "AutoencoderKL",
        "act_fn": "silu",
        "block_out_channels": list(config.block_out_channels),
        "down_block_types": ["DownEncoderBlock2D"] * n,
        "up_block_types": ["UpDecoderBlock2D"] * n,
        "in_channels": config.in_channels,
        "out_channels": config.out_channels,
        "latent_channels": config.latent_channels,
        "layers_per_block": config.layers_per_block,
        "norm_num_groups": config.norm_num_groups,
        "sample_size": config.sample_size,
        "scaling_factor": config.scaling_factor,
    }
    # diffusers spells the attention toggle mid_block_add_attention; write
    # both so either reader sees its own key. norm_eps is ours alone
    # (diffusers hard-codes 1e-6); ConfigMixin ignores unexpected keys.
    d["mid_block_add_attention"] = config.mid_block_attention
    d["mid_block_attention"] = config.mid_block_attention
    d["norm_eps"] = config.norm_eps
    return d


def flatten_params(params: Dict[str, Any]) -> Dict[str, np.ndarray]:
    """Flax params pytree -> {torch_param_name: torch-layout ndarray}."""
    out: Dict[str, np.ndarray] = {}
    for name, leaf in naming.iter_torch_named_params(params):
        out[name] = naming.to_torch_layout(name, leaf)
    return out


def _from_torch_layout(name: str, arr: np.ndarray, leaf_name: str) -> np.ndarray:
    if leaf_name == "kernel":
        if arr.ndim == 4:
            return np.transpose(arr, (2, 3, 1, 0))  # OIHW -> HWIO
        if arr.ndim == 2:
            return arr.T  # (out, in) -> (in, out)
    return arr


def unflatten_params(
    template: Dict[str, Any], state_dict: Mapping[str, np.ndarray]
) -> Dict[str, Any]:
    """Rebuild a Flax params pytree shaped like ``template`` from a
    torch-style state dict. Raises KeyError on missing parameters."""

    def rebuild(node: Dict[str, Any], prefix: Tuple[str, ...]) -> Dict[str, Any]:
        new: Dict[str, Any] = {}
        for key, child in node.items():
            path = prefix + (key,)
            if isinstance(child, dict):
                new[key] = rebuild(child, path)
            else:
                mod_name = naming.path_to_torch_name(prefix)
                torch_leaf = "weight" if key in ("kernel", "scale") else key
                torch_name = f"{mod_name}.{torch_leaf}"
                if torch_name not in state_dict:
                    raise KeyError(f"Missing parameter in state dict: {torch_name}")
                arr = _from_torch_layout(
                    torch_name, np.asarray(state_dict[torch_name]), key
                )
                # .shape/.dtype (not np.asarray) so abstract templates
                # (jax.eval_shape ShapeDtypeStructs) work without ever
                # materializing a real parameter tree
                if arr.shape != tuple(child.shape):
                    raise ValueError(
                        f"Shape mismatch for {torch_name}: "
                        f"{arr.shape} vs {tuple(child.shape)}"
                    )
                new[key] = arr.astype(np.dtype(child.dtype))
        return new

    return rebuild(template, ())


def save_model_dir(path: str, config: VAEConfig, params: Dict[str, Any]) -> None:
    """Write a diffusers-compatible AutoencoderKL directory (see module
    docstring): torch-layout fp32 weights + full constructor config."""
    os.makedirs(path, exist_ok=True)
    flat = flatten_params(jax.device_get(params))
    from safetensors.numpy import save_file

    save_file(
        {k: np.ascontiguousarray(v) for k, v in flat.items()},
        os.path.join(path, _SAFETENSORS_NAMES[0]),
    )
    # a run dir reused across versions must not keep a stale legacy-named
    # weight file alongside the canonical one (loaders prefer canonical,
    # but two divergent weight files in one dir is a trap)
    for legacy in _SAFETENSORS_NAMES[1:]:
        legacy_path = os.path.join(path, legacy)
        if os.path.exists(legacy_path):
            os.remove(legacy_path)
    cfg = diffusers_config_dict(config)
    cfg["_framework"] = "vae_channel_dynamics_tpu"
    with open(os.path.join(path, _CONFIG_NAME), "w") as f:
        json.dump(cfg, f, indent=2)


def load_model_dir(
    path: str, template: Dict[str, Any] = None
) -> Tuple[VAEConfig, Dict[str, Any]]:
    """Load a model dir saved by :func:`save_model_dir` (or a diffusers
    AutoencoderKL directory with safetensors weights)."""
    with open(os.path.join(path, _CONFIG_NAME)) as f:
        cfg_dict = json.load(f)
    config = VAEConfig.from_dict(cfg_dict)
    from safetensors.numpy import load_file

    weights_path = None
    for name in _SAFETENSORS_NAMES:
        cand = os.path.join(path, name)
        if os.path.exists(cand):
            weights_path = cand
            break
    if weights_path is None:
        raise FileNotFoundError(
            f"No safetensors weights in {path} (looked for {_SAFETENSORS_NAMES})"
        )
    state_dict = load_file(weights_path)
    if template is None:
        template = abstract_params(config)
    params = unflatten_params(template, state_dict)
    return config, params


def abstract_params(config: VAEConfig) -> Dict[str, Any]:
    """ShapeDtypeStruct params template for ``config`` via jax.eval_shape —
    zero compute, zero transfers. The previous default ran a REAL model
    init on device and fetched all 335 MB back to host just to read
    shapes/dtypes, costing minutes of CLI startup through the tunneled
    TPU."""
    import jax.numpy as jnp

    from .vae import AutoencoderKL

    module = AutoencoderKL(config=config)
    side = 4 * 2 ** (len(config.block_out_channels) - 1)
    sample = jnp.zeros((1, side, side, config.in_channels), jnp.float32)

    def init():
        return module.init(
            {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
            sample,
            sample_posterior=False,
        )

    return jax.eval_shape(init)["params"]


def import_diffusers_state_dict(
    template: Dict[str, Any], state_dict: Mapping[str, Any]
) -> Dict[str, Any]:
    """Convert a diffusers AutoencoderKL state dict (possibly torch tensors)
    to our params pytree."""
    np_sd = {}
    for k, v in state_dict.items():
        if hasattr(v, "detach"):
            v = v.detach().cpu().numpy()
        np_sd[k] = np.asarray(v)
    return unflatten_params(template, np_sd)
