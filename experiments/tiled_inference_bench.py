"""Tiled inference on the real chip: decode/reconstruct past the untiled
HBM wall (the point of wrapper.enable_tiling, models/tiling.py).

The reference's wrapped diffusers AutoencoderKL carries enable_tiling()
for exactly this: images whose untiled decode activations exceed device
memory. This measures, on the SDXL model at high resolution:

  * whether the UNTILED deterministic reconstruct (encode->decode)
    compiles at all at each probed resolution (compile-time HBM OOM is
    the expected failure and surfaces as the tunnel's "HTTP 500:
    tpu_compile_helper exit 1" — see CLAUDE.md);
  * the TILED reconstruct at the same resolutions: wall time per image
    via chain-length differencing (reconstruct chains: out shape == in
    shape), plus XLA memory_analysis of the compiled program.

Run via nohup + polling; each SDXL compile through the tunnel takes
5-10 min. One JSON line per case. VCD_TILE_ARCH=tiny for a CPU smoke.
"""

import json
import os
import sys
import time
import traceback

sys.path.insert(0, "/root/repo")

from vae_channel_dynamics_tpu.utils.platform import apply_platform_env  # noqa: E402

apply_platform_env()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from vae_channel_dynamics_tpu.models.vae import VAEConfig  # noqa: E402
from vae_channel_dynamics_tpu.models.wrapper import SDXLVAEWrapper  # noqa: E402

ARCH = os.environ.get("VCD_TILE_ARCH", "sdxl")
RESOLUTIONS = tuple(
    int(r) for r in os.environ.get("VCD_TILE_RES", "2048,4096").split(",")
)
TILE = int(os.environ.get("VCD_TILE_SIZE", "512"))
MODES = tuple(os.environ.get("VCD_TILE_MODES", "untiled,tiled").split(","))
ITERS = int(os.environ.get("VCD_TILE_ITERS", "4"))


def emit(**kw):
    print(json.dumps(kw), flush=True)


def mem_info(compiled):
    m = compiled.memory_analysis()
    if m is None:
        return {}
    gb = 1024**3
    return {
        "temp_gb": round(getattr(m, "temp_size_in_bytes", 0) / gb, 3),
        "argument_gb": round(getattr(m, "argument_size_in_bytes", 0) / gb, 3),
        "output_gb": round(getattr(m, "output_size_in_bytes", 0) / gb, 3),
    }


def time_chained(recon, params, x, iters=ITERS, warmup=1):
    """Chain-length differencing (CLAUDE.md: block_until_ready lies through
    the tunnel): time n and n+iters chained reconstructs, difference."""

    def run_chain(n):
        t0 = time.perf_counter()
        y = x
        for _ in range(n):
            y = recon(params, y)
        _ = float(jax.device_get(jnp.sum(y[:, ::64, ::64, :].astype(jnp.float32))))
        return time.perf_counter() - t0

    for _ in range(warmup):
        run_chain(1)
    t1 = run_chain(1)
    t2 = run_chain(1 + iters)
    return (t2 - t1) / iters


def main() -> int:
    cfg = getattr(VAEConfig, ARCH)()
    w = SDXLVAEWrapper(config=cfg, seed=0, dtype=jnp.bfloat16,
                       attn_impl=os.environ.get("VCD_TILE_ATTN", "auto"))
    f = w.spatial_factor

    for res in RESOLUTIONS:
        rng = np.random.default_rng(res)
        x = jnp.asarray(
            rng.normal(size=(1, res, res, 3)).astype(np.float32) * 0.5
        )
        for mode in MODES:
            tiled = mode == "tiled"
            case = {"mode": mode, "res": res, "tile": TILE if tiled else 0}
            if tiled:
                w.enable_tiling(tile_sample_min_size=TILE, tile_overlap_factor=0.25)
            else:
                w.disable_tiling()
            try:
                # One jitted deterministic reconstruct (encode -> decode),
                # params passed as an argument (tunnel HTTP body limit).
                module = w._module()
                tile_px, stride_px = w.tile_sample_min_size, w._tile_stride()

                def recon_fn(params, v, _tiled=tiled, _module=module,
                             _tile=tile_px, _stride=stride_px):
                    from vae_channel_dynamics_tpu.models.distributions import (
                        DiagonalGaussianDistribution,
                    )
                    from vae_channel_dynamics_tpu.models.tiling import tiled_apply

                    def enc(t):
                        return _module.apply(
                            {"params": params}, t,
                            method=lambda m, u: m.quant_conv(m.encoder(u)),
                        )

                    def dec(t):
                        return _module.apply(
                            {"params": params}, t,
                            method=lambda m, u: m.decoder(m.post_quant_conv(u)),
                        )

                    if _tiled:
                        moments = tiled_apply(enc, v, _tile, _stride, 1, f)
                        z = DiagonalGaussianDistribution.from_moments(moments).mode()
                        img = tiled_apply(dec, z, _tile // f, _stride // f, f, 1)
                    else:
                        moments = enc(v)
                        z = DiagonalGaussianDistribution.from_moments(moments).mode()
                        img = dec(z)
                    return jnp.clip(img, -1.0, 1.0)

                recon = jax.jit(recon_fn)
                t_lower0 = time.perf_counter()
                compiled = recon.lower(w.params, x).compile()
                case["compile_s"] = round(time.perf_counter() - t_lower0, 1)
                case.update(mem_info(compiled))
                sec = time_chained(recon, w.params, x)
                case["sec_per_image"] = round(sec, 3)
                case["img_per_s"] = round(1.0 / sec, 3)
                case["ok"] = True
            except Exception as e:  # OOM at compile is an expected outcome
                case["ok"] = False
                case["error"] = f"{type(e).__name__}: {str(e)[:300]}"
                traceback.print_exc(file=sys.stderr)
            emit(**case)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
