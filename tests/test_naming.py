"""Torch-name <-> Flax-path compatibility layer."""

import numpy as np
import pytest

from vae_channel_dynamics_tpu.utils import naming


@pytest.fixture()
def params():
    # Miniature pytree shaped like our AutoencoderKL params collection.
    return {
        "encoder": {
            "conv_in": {"kernel": np.zeros((3, 3, 3, 8)), "bias": np.zeros(8)},
            "down_blocks_0": {
                "resnets_0": {
                    "norm1": {"scale": np.ones(8), "bias": np.zeros(8)},
                    "conv1": {"kernel": np.zeros((3, 3, 8, 8)), "bias": np.zeros(8)},
                },
            },
            "mid_block": {
                "attentions_0": {
                    "group_norm": {"scale": np.ones(8), "bias": np.zeros(8)},
                    "to_q": {"kernel": np.zeros((8, 8)), "bias": np.zeros(8)},
                    "to_out_0": {"kernel": np.zeros((8, 8)), "bias": np.zeros(8)},
                },
            },
        },
        "decoder": {
            "up_blocks_1": {
                "resnets_0": {
                    "norm1": {"scale": np.full(8, 2.0), "bias": np.zeros(8)},
                },
            },
        },
    }


def test_torch_name_to_path_roundtrip():
    name = "encoder.down_blocks.0.resnets.1.norm1"
    path = naming.torch_name_to_path(name)
    assert path == ("encoder", "down_blocks_0", "resnets_1", "norm1")
    assert naming.path_to_torch_name(path) == name


def test_to_out_roundtrip():
    path = naming.torch_name_to_path("mid_block.attentions.0.to_out.0")
    assert path == ("mid_block", "attentions_0", "to_out_0")
    assert naming.path_to_torch_name(path) == "mid_block.attentions.0.to_out.0"


def test_resolve_groupnorm_weight(params):
    p = naming.resolve_param_path(params, "encoder.down_blocks.0.resnets.0.norm1.weight")
    assert p == ("encoder", "down_blocks_0", "resnets_0", "norm1", "scale")
    # vae. prefix accepted (classifier.py:83-95 fallback behavior)
    p2 = naming.resolve_param_path(
        params, "vae.encoder.down_blocks.0.resnets.0.norm1.weight"
    )
    assert p2 == p


def test_resolve_conv_weight(params):
    p = naming.resolve_param_path(params, "encoder.conv_in.weight")
    assert p == ("encoder", "conv_in", "kernel")


def test_resolve_missing_returns_none(params):
    assert naming.resolve_param_path(params, "encoder.ghost.weight") is None


def test_set_param_functional(params):
    new = naming.set_param(
        params, "decoder.up_blocks.1.resnets.0.norm1.weight", np.full(8, 5.0)
    )
    assert np.all(new["decoder"]["up_blocks_1"]["resnets_0"]["norm1"]["scale"] == 5.0)
    # original untouched
    assert np.all(params["decoder"]["up_blocks_1"]["resnets_0"]["norm1"]["scale"] == 2.0)


def test_iter_torch_named_params(params):
    names = dict(naming.iter_torch_named_params(params))
    assert "encoder.conv_in.weight" in names
    assert "encoder.conv_in.bias" in names
    assert "encoder.down_blocks.0.resnets.0.norm1.weight" in names
    assert "encoder.mid_block.attentions.0.group_norm.weight" in names
    assert "encoder.mid_block.attentions.0.to_out.0.weight" in names


def test_module_kind(params):
    assert naming.module_kind(params["encoder"]["conv_in"]) == "conv"
    gn = params["encoder"]["down_blocks_0"]["resnets_0"]["norm1"]
    assert naming.module_kind(gn) == "groupnorm"
    dense = params["encoder"]["mid_block"]["attentions_0"]["to_q"]
    assert naming.module_kind(dense) == "dense"


def test_groupnorm_channel_map(params):
    m = naming.groupnorm_channel_map(params)
    key = "encoder.down_blocks.0.resnets.0.norm1.output"
    assert m[key] == ("encoder.down_blocks.0.resnets.0.norm1.weight", 8)
    assert m["vae." + key] == m[key]
    assert "encoder.mid_block.attentions.0.group_norm.output" in m
    # convs are not GroupNorms
    assert "encoder.conv_in.output" not in m


def test_to_torch_layout_conv(params):
    arr = np.arange(3 * 3 * 3 * 8, dtype=np.float32).reshape(3, 3, 3, 8)
    out = naming.to_torch_layout("encoder.conv_in.weight", arr)
    assert out.shape == (8, 3, 3, 3)  # OIHW
    assert out[1, 2, 0, 0] == arr[0, 0, 2, 1]
