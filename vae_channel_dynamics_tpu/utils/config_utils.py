"""YAML experiment-config loading with single-level ``defaults:`` inheritance.

Behavioral contract (reference: src/utils/config_utils.py:9-65): the config
file may contain a ``defaults: [<base_name>]`` list; the FIRST entry names a
base YAML (``<base_name>.yaml``) in the same directory. The base is loaded
first and the experiment config is merged on top with a SHALLOW top-level
``dict.update`` — nested dicts are REPLACED, not deep-merged. All ten
reference ``configs/*.yaml`` files must parse to the same effective config
under these semantics.
"""

from __future__ import annotations

import logging
from pathlib import Path
from typing import Any, Dict

import yaml

logger = logging.getLogger(__name__)


def _read_yaml_dict(path: Path) -> Dict[str, Any]:
    """Parse ``path`` as YAML; an empty document yields ``{}``."""
    with path.open("r") as fh:
        doc = yaml.safe_load(fh)
    if doc is None:
        logger.warning("Empty YAML document at %s; treating as {}", path)
        return {}
    return doc


def load_config(config_path: str) -> Dict[str, Any]:
    """Load a YAML config, resolving one level of ``defaults:`` inheritance.

    If the experiment YAML declares ``defaults: [<name>, ...]``, the first
    entry selects ``<name>.yaml`` next to the experiment file as the base
    layer; the experiment's top-level keys are then laid over it with a
    shallow merge (nested sections replace the base's wholesale — a
    load-bearing quirk, see SURVEY.md §5).

    Args:
        config_path: Path to the experiment YAML.

    Returns:
        The effective configuration dictionary.

    Raises:
        FileNotFoundError: if the config or its base does not exist.
        yaml.YAMLError: on YAML parse errors.
    """
    exp_path = Path(config_path)
    if not exp_path.exists():
        raise FileNotFoundError(f"Configuration file not found: {config_path}")

    overlay = _read_yaml_dict(exp_path)

    defaults = overlay.get("defaults")
    if not isinstance(defaults, list) or not defaults:
        logger.info("Loaded config %s (no defaults layer)", config_path)
        return overlay
    del overlay["defaults"]

    base_path = exp_path.parent / f"{defaults[0]}.yaml"
    logger.info("Resolving defaults layer %s for %s", base_path, config_path)
    if not base_path.exists():
        raise FileNotFoundError(
            f"Base configuration file not found: {base_path}"
        )
    merged = _read_yaml_dict(base_path)
    merged.update(overlay)
    logger.info("Loaded config %s over base %s", config_path, base_path.name)
    return merged


def as_float(value: Any, default: float) -> float:
    """Coerce a config value to float; YAMLs carry numbers as strings
    (e.g. ``learning_rate: "5e-5"`` in experiment_cifar10_test.yaml:22)."""
    if value is None:
        return default
    return float(value)


def as_int(value: Any, default: int) -> int:
    if value is None:
        return default
    return int(value)
