"""Weight EXPORT proven against the torch replica — the reverse of
test_weight_import_torch_fixture.py.

The reference's final training artifact is a diffusers AutoencoderKL
directory (``vae.save_pretrained(final_model/vae)``, src/train.py:409-415)
that torch-side tooling loads with ``AutoencoderKL.from_pretrained``. A
user migrating to this framework needs the same exit path: train on TPU,
hand the checkpoint back to a torch machine. These tests prove the
exported artifact — the actual bytes ``save_model_dir`` writes, not an
in-memory conversion — loads into a torch AutoencoderKL replica with
``strict=True`` and reproduces the flax model's forward exactly.
"""

import json
import os

import jax.numpy as jnp
import numpy as np
import torch

from test_full_model_torch_parity import SDXL_SHAPED, TAutoencoderKL
from vae_channel_dynamics_tpu.models import SDXLVAEWrapper
from vae_channel_dynamics_tpu.models import io as model_io
from vae_channel_dynamics_tpu.tools.convert_diffusers import export


def _export_dir(tmp_path, seed=7):
    wrapper = SDXLVAEWrapper(config=SDXL_SHAPED, dtype=jnp.float32, seed=seed)
    out = tmp_path / "exported_vae"
    model_io.save_model_dir(str(out), SDXL_SHAPED, wrapper.params)
    return wrapper, out


def test_exported_dir_loads_into_torch_strict_and_matches_forward(tmp_path):
    wrapper, out = _export_dir(tmp_path)

    # the canonical diffusers weight filename, loaded from disk
    weights = out / "diffusion_pytorch_model.safetensors"
    assert weights.exists()
    from safetensors.numpy import load_file

    sd = {k: torch.tensor(v).double() for k, v in load_file(str(weights)).items()}
    tmodel = TAutoencoderKL(SDXL_SHAPED).eval().double()
    result = tmodel.load_state_dict(sd, strict=True)
    assert not result.missing_keys and not result.unexpected_keys

    # forward parity: the torch model running the exported bytes must
    # reproduce the flax model that produced them (deterministic mode path)
    rng = np.random.default_rng(7)
    x = rng.uniform(-1, 1, (2, 32, 32, 3)).astype(np.float32)
    j_out = wrapper.forward(jnp.asarray(x), sample_posterior=False)
    j_recon = np.asarray(j_out["reconstruction"])
    j_kl = np.asarray(j_out["latent_dist"].kl())

    xt = torch.tensor(x.transpose(0, 3, 1, 2), dtype=torch.float64)
    with torch.no_grad():
        moments = tmodel.encode_moments(xt)
        mean, logvar = torch.chunk(moments, 2, dim=1)
        logvar = torch.clamp(logvar, -30.0, 20.0)
        kl = 0.5 * torch.sum(
            mean.pow(2) + logvar.exp() - 1.0 - logvar, dim=[1, 2, 3]
        )
        recon = tmodel.decode(mean).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(j_recon, recon, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(j_kl, kl.numpy(), rtol=1e-4)


def test_exported_config_json_carries_diffusers_schema(tmp_path):
    _, out = _export_dir(tmp_path)
    with open(out / "config.json") as f:
        cfg = json.load(f)
    n = len(SDXL_SHAPED.block_out_channels)
    assert cfg["_class_name"] == "AutoencoderKL"
    assert cfg["act_fn"] == "silu"
    assert cfg["down_block_types"] == ["DownEncoderBlock2D"] * n
    assert cfg["up_block_types"] == ["UpDecoderBlock2D"] * n
    assert cfg["block_out_channels"] == list(SDXL_SHAPED.block_out_channels)
    assert cfg["layers_per_block"] == SDXL_SHAPED.layers_per_block
    assert cfg["latent_channels"] == SDXL_SHAPED.latent_channels
    assert cfg["norm_num_groups"] == SDXL_SHAPED.norm_num_groups
    assert cfg["scaling_factor"] == SDXL_SHAPED.scaling_factor
    assert cfg["mid_block_add_attention"] is True
    # round-trips through our own loader too
    cfg2, params2 = model_io.load_model_dir(str(out))
    assert cfg2.block_out_channels == SDXL_SHAPED.block_out_channels


def test_load_model_dir_accepts_legacy_weight_filename(tmp_path):
    wrapper, out = _export_dir(tmp_path)
    os.rename(
        out / "diffusion_pytorch_model.safetensors",
        out / "model.safetensors",
    )
    _, params = model_io.load_model_dir(str(out))
    flat_a = model_io.flatten_params(wrapper.params)
    flat_b = model_io.flatten_params(params)
    assert set(flat_a) == set(flat_b)
    for k in flat_a:
        np.testing.assert_array_equal(flat_a[k], flat_b[k])


def test_reverse_cli_upgrades_legacy_dir(tmp_path):
    wrapper, out = _export_dir(tmp_path)
    # fabricate a pre-round-3 dir: legacy filename, minimal config.json
    legacy = tmp_path / "legacy_vae"
    os.makedirs(legacy)
    os.rename(
        out / "diffusion_pytorch_model.safetensors",
        legacy / "model.safetensors",
    )
    with open(legacy / "config.json", "w") as f:
        json.dump({"_class_name": "AutoencoderKL", **SDXL_SHAPED.to_dict()}, f)

    dst = tmp_path / "canonical_vae"
    export(str(legacy), str(dst))
    assert (dst / "diffusion_pytorch_model.safetensors").exists()
    with open(dst / "config.json") as f:
        cfg = json.load(f)
    assert "down_block_types" in cfg and cfg["act_fn"] == "silu"
    from safetensors.numpy import load_file

    sd = load_file(str(dst / "diffusion_pytorch_model.safetensors"))
    flat = model_io.flatten_params(wrapper.params)
    assert set(sd) == set(flat)
    for k in sd:
        np.testing.assert_array_equal(sd[k], flat[k])
