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
import os
from typing import Any, Dict

import yaml

logger = logging.getLogger(__name__)


def load_config(config_path: str) -> Dict[str, Any]:
    """Load a YAML config, resolving one level of ``defaults:`` inheritance.

    Args:
        config_path: Path to the experiment YAML.

    Returns:
        The effective configuration dictionary.

    Raises:
        FileNotFoundError: if the config or its base does not exist.
        yaml.YAMLError: on YAML parse errors.
    """
    if not os.path.exists(config_path):
        raise FileNotFoundError(f"Configuration file not found: {config_path}")

    final_config: Dict[str, Any] = {}

    with open(config_path, "r") as f:
        config = yaml.safe_load(f)

    if config is None:
        logger.warning("Config file is empty: %s", config_path)
        config = {}

    if "defaults" in config and isinstance(config["defaults"], list):
        base_config_name = config["defaults"][0]
        base_config_path = os.path.join(
            os.path.dirname(config_path), f"{base_config_name}.yaml"
        )
        logger.info("Loading base configuration from: %s", base_config_path)
        if not os.path.exists(base_config_path):
            raise FileNotFoundError(
                f"Base configuration file not found: {base_config_path}"
            )
        with open(base_config_path, "r") as bf:
            base_config = yaml.safe_load(bf)
            if base_config:
                final_config.update(base_config)
        del config["defaults"]

    # Shallow top-level merge: nested dicts from the experiment file replace
    # the base's wholesale (load-bearing quirk; see SURVEY.md §5).
    final_config.update(config)

    logger.info("Successfully loaded configuration from %s", config_path)
    return final_config


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
