"""Environment self-check: ``python -m vae_channel_dynamics_tpu.tools.doctor``.

Diagnoses the classic setup problems before they burn a training run:
platform selection being overridden by sitecustomize (CLAUDE.md's #1
gotcha), the native preprocessing library failing to build, a read-only
compilation cache, missing optional dependencies, and (with ``--device``)
basic device health — dispatch latency and a calibration matmul.

Prints one ``ok | warn | FAIL`` line per check; exits nonzero if any FAIL.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

_RESULTS = []


def _report(status: str, name: str, detail: str = "") -> None:
    _RESULTS.append(status)
    pad = {"ok": "  ok  ", "warn": " warn ", "FAIL": " FAIL "}[status]
    print(f"[{pad}] {name}" + (f": {detail}" if detail else ""))


def check_versions() -> None:
    import jax

    try:
        import flax
        import optax
        import orbax.checkpoint  # noqa: F401

        _report(
            "ok", "versions",
            f"python {sys.version.split()[0]}, jax {jax.__version__}, "
            f"flax {flax.__version__}, optax {optax.__version__}",
        )
    except ImportError as e:
        _report("FAIL", "versions", f"missing core dependency: {e}")


def check_platform() -> None:
    import jax

    env = os.environ.get("JAX_PLATFORMS", "")
    actual = jax.default_backend()
    devices = jax.devices()
    detail = f"backend={actual}, {len(devices)} device(s)"
    # A platform alias (e.g. "axon") may legitimately report a different
    # backend name ("tpu"); the sitecustomize-override symptom is the jax
    # CONFIG disagreeing with the environment variable after
    # apply_platform_env tried to assert it.
    cfg = getattr(jax.config, "jax_platforms", None) or ""
    if env and cfg and not cfg.startswith(env.split(",")[0]):
        _report(
            "warn", "platform",
            f"JAX_PLATFORMS={env!r} but jax config resolved to {cfg!r} — "
            "a sitecustomize override won (backend initialized before "
            "apply_platform_env could run).",
        )
    else:
        _report("ok", "platform", detail)


def check_compilation_cache() -> None:
    import jax

    cache_dir = getattr(jax.config, "jax_compilation_cache_dir", None)
    if not cache_dir:
        _report("warn", "compilation cache", "disabled (VCD_XLA_CACHE=0?)")
        return
    try:
        os.makedirs(cache_dir, exist_ok=True)
        probe = os.path.join(cache_dir, ".doctor_probe")
        with open(probe, "w") as f:
            f.write("x")
        os.remove(probe)
        _report("ok", "compilation cache", cache_dir)
    except OSError as e:
        _report("FAIL", "compilation cache", f"{cache_dir} not writable: {e}")


def check_native() -> None:
    from ..data import native

    if not native.available():
        _report(
            "warn", "native preprocess",
            "C++ kernel unavailable (g++ missing?) — PIL fallback active",
        )
        return
    import numpy as np

    arr = np.full((16, 20, 3), 128, np.uint8)
    out = native.preprocess_image(arr, 8)
    if out.shape != (8, 8, 3):
        _report("FAIL", "native preprocess", f"bad output shape {out.shape}")
        return
    if native.decode_available():
        import io

        from PIL import Image

        buf = io.BytesIO()
        Image.fromarray(arr).save(buf, "PNG")
        dec = native.decode_preprocess(buf.getvalue(), 8)
        status = "ok" if dec.shape == (8, 8, 3) else "FAIL"
        _report(status, "native preprocess", "decode+preprocess path active")
    else:
        _report(
            "warn", "native preprocess",
            "preprocess-only (libjpeg/libpng not linked); PIL decodes",
        )


def check_optional_deps() -> None:
    found, missing = [], []
    for mod in ("torch", "wandb", "datasets", "tensorboard"):
        try:
            __import__(mod)
            found.append(mod)
        except ImportError:
            missing.append(mod)
    detail = f"present: {', '.join(found) or 'none'}"
    if missing:
        detail += f"; absent (degraded gracefully): {', '.join(missing)}"
    _report("ok", "optional deps", detail)


def check_data_fallback() -> None:
    hints = []
    if os.environ.get("HF_HUB_OFFLINE") != "1":
        hints.append("set HF_HUB_OFFLINE=1 to skip ~30s of hub retries")
    if os.environ.get("VCD_DATA_FALLBACK") != "synthetic":
        hints.append(
            "VCD_DATA_FALLBACK=synthetic makes hub-dataset configs runnable"
        )
    if hints:
        _report("warn", "offline data", "; ".join(hints))
    else:
        _report("ok", "offline data", "offline fallbacks configured")


def check_device(calibrate: bool) -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    x = jax.device_put(np.ones((8, 8), np.float32))
    float(jax.device_get(jnp.sum(x)))  # warm the op's compile
    t0 = time.perf_counter()
    val = float(jax.device_get(jnp.sum(x)))
    rtt = time.perf_counter() - t0
    if val != 64.0:
        _report("FAIL", "device roundtrip", f"sum said {val}")
        return
    _report(
        "ok", "device roundtrip",
        f"{rtt*1e3:.0f} ms put+compute+fetch"
        + (" (tunneled/remote device: per-call RPC dominates; time with "
           "chain differencing, see bench.py)" if rtt > 0.1 else ""),
    )
    if not calibrate:
        return
    n = 4096
    a = jax.device_put(np.ones((n, n), np.float32).astype(np.dtype("bfloat16")))
    f = jax.jit(lambda a: a @ a)
    f(a)  # compile

    def chain(k):
        t0 = time.perf_counter()
        y = a
        for _ in range(k):
            y = f(y)
        float(jax.device_get(jnp.sum(y.astype(jnp.float32))))
        return time.perf_counter() - t0

    chain(2)
    dt = (chain(12) - chain(2)) / 10
    tflops = 2 * n**3 / dt / 1e12
    _report("ok", "matmul calibration", f"{tflops:.0f} TFLOP/s bf16 {n}^3")


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description="Environment self-check.")
    parser.add_argument("--no-device", action="store_true",
                        help="Skip device probes (e.g. to not touch the TPU).")
    parser.add_argument("--calibrate", action="store_true",
                        help="Run the bf16 matmul calibration (slower).")
    args = parser.parse_args(argv)

    from ..utils.platform import apply_platform_env

    apply_platform_env()

    check_versions()
    check_platform()
    check_compilation_cache()
    check_native()
    check_optional_deps()
    check_data_fallback()
    if not args.no_device:
        check_device(args.calibrate)

    fails = _RESULTS.count("FAIL")
    warns = _RESULTS.count("warn")
    print(f"\n{len(_RESULTS)} checks: {fails} failed, {warns} warnings")
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
