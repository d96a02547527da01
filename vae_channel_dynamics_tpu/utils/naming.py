"""Torch-style dotted-name <-> Flax pytree-path compatibility layer.

The reference addresses model internals with diffusers/PyTorch module names
(e.g. ``vae.encoder.down_blocks.0.resnets.0.norm1`` in
configs/experiment_cifar10_test.yaml:67 and parameter names like
``encoder.conv_in.weight`` consumed by src/tracking/deadneuron.py:51-68 and
src/intervention/nudger.py:49-72). Our Flax model names list children with
underscores (``down_blocks_0``) and uses ``scale``/``kernel`` leaves instead
of ``weight``. This module provides the bidirectional mapping so every
reference YAML runs unchanged.

Conventions:
- A purely numeric dotted component merges into its predecessor with an
  underscore: ``down_blocks.0`` <-> ``down_blocks_0``.
- Leaf ``weight`` resolves to whichever of ``scale`` (GroupNorm) or
  ``kernel`` (Conv/Dense) exists at the module path; ``bias`` passes through.
- An optional leading ``vae.`` scope prefix is accepted and stripped
  (mirror of src/classification/classifier.py:76-95).
- Conv kernels are stored HWIO in Flax; ``to_torch_layout`` converts to the
  OIHW layout reference plotters expect (src/utils/plotting_utils.py:39).
"""

from __future__ import annotations

from typing import Any, Dict, Iterator, List, Optional, Tuple

import jax
import numpy as np


def torch_name_to_path(name: str) -> Tuple[str, ...]:
    """Convert a torch dotted module name to a Flax pytree path tuple.

    ``encoder.down_blocks.0.resnets.1.norm1`` ->
    ``("encoder", "down_blocks_0", "resnets_1", "norm1")``.
    Does NOT strip a ``vae.`` prefix and does not resolve leaves.
    """
    parts: List[str] = []
    for comp in name.split("."):
        if comp.isdigit() and parts:
            parts[-1] = f"{parts[-1]}_{comp}"
        else:
            parts.append(comp)
    return tuple(parts)


def path_to_torch_name(path: Tuple[str, ...]) -> str:
    """Inverse of :func:`torch_name_to_path` for our model's child names.

    Splits a trailing ``_<digits>`` suffix back into a numeric component for
    the known list-valued containers (down_blocks, up_blocks, resnets,
    attentions, downsamplers, upsamplers, to_out).
    """
    listish = (
        "down_blocks",
        "up_blocks",
        "resnets",
        "attentions",
        "downsamplers",
        "upsamplers",
        "to_out",
    )
    out: List[str] = []
    for comp in path:
        head, sep, tail = comp.rpartition("_")
        if sep and tail.isdigit() and head in listish:
            out.append(head)
            out.append(tail)
        else:
            out.append(comp)
    return ".".join(out)


def strip_vae_prefix(name: str) -> str:
    return name[4:] if name.startswith("vae.") else name


def _get_at(tree: Dict[str, Any], path: Tuple[str, ...]) -> Optional[Any]:
    node: Any = tree
    for comp in path:
        if not isinstance(node, dict) or comp not in node:
            return None
        node = node[comp]
    return node


def resolve_param_path(
    params: Dict[str, Any], torch_param_name: str
) -> Optional[Tuple[str, ...]]:
    """Resolve a torch parameter name to the Flax pytree path of its leaf.

    Accepts names with or without a ``vae.`` prefix. ``<mod>.weight`` maps to
    ``<mod>/scale`` or ``<mod>/kernel`` depending on what exists. Returns
    None when the parameter cannot be found (mirrors the log-and-skip
    behavior of src/intervention/nudger.py:49-72).
    """
    name = strip_vae_prefix(torch_param_name)
    path = torch_name_to_path(name)
    if not path:
        return None
    mod_path, leaf = path[:-1], path[-1]
    mod = _get_at(params, mod_path)
    if not isinstance(mod, dict):
        return None
    if leaf == "weight":
        for candidate in ("scale", "kernel"):
            if candidate in mod:
                return mod_path + (candidate,)
        return None
    if leaf in mod:
        return mod_path + (leaf,)
    return None


def get_param(params: Dict[str, Any], torch_param_name: str) -> Optional[Any]:
    path = resolve_param_path(params, torch_param_name)
    if path is None:
        return None
    return _get_at(params, path)


def set_param(
    params: Dict[str, Any], torch_param_name: str, value: Any
) -> Dict[str, Any]:
    """Return a copy of ``params`` with the named leaf replaced (functional
    update — the TPU-safe replacement for the reference's in-place
    ``param.data[idx] = v`` mutation, src/intervention/nudger.py:140)."""
    path = resolve_param_path(params, torch_param_name)
    if path is None:
        raise KeyError(f"Parameter not found: {torch_param_name}")

    def _set(node: Dict[str, Any], rest: Tuple[str, ...]) -> Dict[str, Any]:
        new = dict(node)
        if len(rest) == 1:
            new[rest[0]] = value
        else:
            new[rest[0]] = _set(node[rest[0]], rest[1:])
        return new

    return _set(params, path)


def _is_module_dict(node: Any) -> bool:
    return isinstance(node, dict) and any(
        k in node for k in ("kernel", "scale", "bias", "embedding")
    )


def module_kind(node: Dict[str, Any]) -> str:
    """Classify a leaf-module param dict: 'groupnorm' | 'conv' | 'dense' |
    'other'. The equivalent of isinstance checks against the reference's
    ``target_layer_classes`` tuple (src/train.py:38)."""
    if "scale" in node and np.ndim(node["scale"]) == 1 and "kernel" not in node:
        return "groupnorm"
    if "kernel" in node:
        k = node["kernel"]
        nd = k.ndim if hasattr(k, "ndim") else np.ndim(k)
        if nd >= 3:
            return "conv"
        if nd == 2:
            return "dense"
    return "other"


def iter_modules(
    params: Dict[str, Any], prefix: Tuple[str, ...] = ()
) -> Iterator[Tuple[str, Dict[str, Any]]]:
    """Yield ``(torch_module_name, param_dict)`` for every leaf module,
    the analog of ``model.named_modules()`` filtered to parametric leaves."""
    for key in params:
        node = params[key]
        if not isinstance(node, dict):
            continue
        path = prefix + (key,)
        if _is_module_dict(node):
            yield path_to_torch_name(path), node
        else:
            yield from iter_modules(node, path)


def iter_torch_named_params(
    params: Dict[str, Any],
) -> Iterator[Tuple[str, Any]]:
    """Yield ``(torch_param_name, leaf)`` pairs, the analog of
    ``model.named_parameters()`` (src/tracking/deadneuron.py:51)."""
    for mod_name, mod in iter_modules(params):
        for leaf_name, leaf in mod.items():
            if leaf_name == "scale":
                yield f"{mod_name}.weight", leaf
            elif leaf_name == "kernel":
                yield f"{mod_name}.weight", leaf
            else:
                yield f"{mod_name}.{leaf_name}", leaf


def to_torch_layout(torch_param_name: str, leaf: Any) -> np.ndarray:
    """Convert a leaf to the layout torch consumers expect: conv kernels
    HWIO -> OIHW, dense kernels (in,out) -> (out,in); 1-D passes through."""
    arr = np.asarray(jax.device_get(leaf))
    if torch_param_name.endswith(".weight"):
        if arr.ndim == 4:
            return np.transpose(arr, (3, 2, 0, 1))
        if arr.ndim == 2:
            return arr.T
    return arr


def groupnorm_channel_map(params: Dict[str, Any]) -> Dict[str, Tuple[str, int]]:
    """Map ActivityMonitor layer IDs to GroupNorm scale-param names.

    For each GroupNorm module ``<mod>`` registers BOTH ``<mod>.output`` and
    ``vae.<mod>.output`` keys -> ``(<mod>.weight, num_channels)``, mirroring
    src/classification/classifier.py:43-81.
    """
    mapping: Dict[str, Tuple[str, int]] = {}
    for mod_name, mod in iter_modules(params):
        if module_kind(mod) != "groupnorm":
            continue
        num_ch = int(np.shape(mod["scale"])[0])
        param_name = f"{mod_name}.weight"
        mapping[f"{mod_name}.output"] = (param_name, num_ch)
        if not mod_name.startswith("vae."):
            mapping[f"vae.{mod_name}.output"] = (param_name, num_ch)
    return mapping
