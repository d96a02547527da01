"""StableHLO export artifacts: round-trip fidelity and symbolic batch.

The exported entry points must (a) reproduce the live model's outputs,
(b) accept any batch size (the batch dim is symbolic), and (c) carry a
manifest that fully describes the artifact. The exporter is the TPU-native
deployment analog of the TorchScript/ONNX exports the reference ecosystem
gets from diffusers (nothing in the reference repo itself exports models).
"""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vae_channel_dynamics_tpu.models import SDXLVAEWrapper, VAEConfig
from vae_channel_dynamics_tpu.models.io import save_model_dir
from vae_channel_dynamics_tpu.tools.export_model import (
    export_model_dir,
    load_exported,
    main,
)

RES = 16


@pytest.fixture(scope="module")
def export_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("export")
    model_dir = os.path.join(root, "model")
    dst = os.path.join(root, "artifacts")
    wrapper = SDXLVAEWrapper(config=VAEConfig.tiny(), seed=0)
    save_model_dir(model_dir, wrapper.config, wrapper.params)
    manifest = export_model_dir(model_dir, dst, resolution=RES)
    return wrapper, dst, manifest


def test_manifest_describes_every_entry_point(export_dir):
    _, dst, manifest = export_dir
    on_disk = json.load(open(os.path.join(dst, "manifest.json")))
    assert on_disk == manifest
    assert set(manifest["entry_points"]) == {"encode", "decode", "reconstruct"}
    assert manifest["platforms"] == ["cpu", "tpu"]
    assert manifest["resolution"] == RES
    for info in manifest["entry_points"].values():
        path = os.path.join(dst, info["file"])
        assert os.path.getsize(path) == info["bytes"] > 0
        # params are an argument, not baked-in constants: artifacts are tiny
        assert info["bytes"] < 5 << 20


def test_exported_matches_live_model_across_batch_sizes(export_dir):
    wrapper, dst, manifest = export_dir
    fns = load_exported(dst)
    latent_res = manifest["latent_resolution"]
    for batch in (1, 3):  # symbolic batch: both sizes run the same artifact
        x = jax.random.uniform(
            jax.random.PRNGKey(batch), (batch, RES, RES, 3), jnp.float32,
            -1.0, 1.0,
        )
        z = fns["encode"](wrapper.params, x)
        assert z.shape == (batch, latent_res, latent_res, 4)
        np.testing.assert_allclose(
            np.asarray(z),
            np.asarray(wrapper.encode(x, deterministic=True)),
            rtol=0, atol=1e-6,
        )
        np.testing.assert_allclose(
            np.asarray(fns["decode"](wrapper.params, z)),
            np.asarray(wrapper.decode(z)),
            rtol=0, atol=1e-6,
        )
        want = wrapper.forward(x, sample_posterior=False)["reconstruction"]
        np.testing.assert_allclose(
            np.asarray(fns["reconstruct"](wrapper.params, x)),
            np.asarray(want),
            rtol=0, atol=1e-6,
        )


def test_cli_export_and_check(tmp_path):
    model_dir = str(tmp_path / "model")
    dst = str(tmp_path / "out")
    wrapper = SDXLVAEWrapper(config=VAEConfig.tiny(), seed=1)
    save_model_dir(model_dir, wrapper.config, wrapper.params)
    assert main([
        "--model_dir", model_dir, "--dst", dst,
        "--resolution", str(RES), "--check",
    ]) == 0
    assert os.path.exists(os.path.join(dst, "manifest.json"))


def test_server_serves_exported_artifacts(export_dir):
    """server.py --exported_dir mode: the daemon runs the pinned StableHLO
    programs (never re-traces model code), matches the live model, and
    rejects sampling requests with a client error (deterministic-only)."""
    import io as io_mod
    import threading
    import urllib.error
    import urllib.request

    from vae_channel_dynamics_tpu.server import VAEServer
    from vae_channel_dynamics_tpu.tools.export_model import ExportedVAEWrapper

    wrapper, dst, manifest = export_dir
    adapter = ExportedVAEWrapper(dst, wrapper.params)
    assert adapter.resolution == RES
    srv = VAEServer(
        adapter, resolution=RES, max_batch=2, max_wait_ms=5.0, port=0,
        use_mesh=False,
    )
    thread = threading.Thread(target=srv.serve_forever, daemon=True)
    thread.start()
    try:
        srv.warmup()  # deterministic endpoints only — must not raise
        # liveness probes must work in exported mode (the wrapper exposes
        # scaling_factor/latent_shape itself — no model config available)
        with urllib.request.urlopen(
            f"http://127.0.0.1:{srv.port}/healthz", timeout=30
        ) as resp:
            health = json.loads(resp.read())
        assert health["status"] == "ok"
        assert health["scaling_factor"] == manifest["scaling_factor"]
        assert tuple(srv.latent_shape) == (
            manifest["latent_resolution"], manifest["latent_resolution"],
            manifest["latent_channels"],
        )
        rng = np.random.default_rng(0)
        pixels = rng.uniform(-1, 1, (RES, RES, 3)).astype(np.float32)
        buf = io_mod.BytesIO()
        np.save(buf, pixels)
        body = buf.getvalue()
        url = f"http://127.0.0.1:{srv.port}"

        req = urllib.request.Request(
            f"{url}/reconstruct?format=npy", data=body, method="POST"
        )
        with urllib.request.urlopen(req, timeout=120) as resp:
            assert resp.status == 200
            got = np.load(io_mod.BytesIO(resp.read()))
        want = wrapper.forward(pixels[None], sample_posterior=False)[
            "reconstruction"
        ]
        np.testing.assert_allclose(got, np.asarray(want)[0], atol=1e-5)

        # encode -> decode round trip through the artifacts
        req = urllib.request.Request(
            f"{url}/encode", data=body, method="POST"
        )
        with urllib.request.urlopen(req, timeout=120) as resp:
            assert resp.status == 200
            z = np.load(io_mod.BytesIO(resp.read()))
        assert z.shape == (
            manifest["latent_resolution"], manifest["latent_resolution"], 4
        )
        zbuf = io_mod.BytesIO()
        np.save(zbuf, z)
        req = urllib.request.Request(
            f"{url}/decode", data=zbuf.getvalue(), method="POST"
        )
        with urllib.request.urlopen(req, timeout=120) as resp:
            assert resp.status == 200

        # sampling is not in the artifact: clear 400, not a silent fallback
        req = urllib.request.Request(
            f"{url}/reconstruct?format=npy&deterministic=false",
            data=body, method="POST",
        )
        with pytest.raises(urllib.error.HTTPError) as exc:
            urllib.request.urlopen(req, timeout=120)
        assert exc.value.code == 400
        assert "deterministic" in exc.value.read().decode()
    finally:
        srv.shutdown()


def test_exported_wrapper_refuses_mesh_serving(export_dir):
    """Deserialized artifacts carry single-device programs GSPMD cannot
    repartition; VAEServer itself must enforce that (supports_mesh=False) —
    the default multi-device auto-mesh must not engage, and an explicit
    use_mesh=True must fail loudly at construction, not at runtime."""
    from vae_channel_dynamics_tpu.server import VAEServer
    from vae_channel_dynamics_tpu.tools.export_model import ExportedVAEWrapper

    wrapper, dst, _ = export_dir
    adapter = ExportedVAEWrapper(dst, wrapper.params)
    assert adapter.supports_mesh is False

    # default construction on this 8-virtual-device host: mesh stays off
    srv = VAEServer(adapter, resolution=RES, max_batch=2, port=0)
    assert srv.mesh is None
    srv.httpd.server_close()

    with pytest.raises(ValueError, match="use_mesh"):
        VAEServer(adapter, resolution=RES, max_batch=2, port=0, use_mesh=True)
