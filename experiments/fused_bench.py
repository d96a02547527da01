"""Fused gn_silu_conv3x3 vs the XLA gn->silu->conv sequence on the real chip.

Times forward and forward+backward on the decoder's hot shapes via
fori_loop chains (dispatch-free differencing). Usage:
    python experiments/fused_bench.py [fwd|bwd|all]
"""
import functools
import sys
import time

sys.path.insert(0, "/root/repo")
from vae_channel_dynamics_tpu.utils.platform import apply_platform_env

apply_platform_env()

import jax
import jax.numpy as jnp
import numpy as np

from vae_channel_dynamics_tpu.ops.group_norm import _group_norm_xla
from vae_channel_dynamics_tpu.ops.pallas_resnet import gn_silu_conv3x3

GROUPS = 32


def xla_op(x, gamma, beta, w, b, res):
    s = _group_norm_xla(x, gamma, beta, GROUPS, 1e-6, fuse_silu=True)
    y = jax.lax.conv_general_dilated(
        s, w.astype(x.dtype), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=jax.lax.Precision.DEFAULT,
    ) + b.astype(x.dtype)
    return y + res


def fused_op(x, gamma, beta, w, b, res):
    y, _, _ = gn_silu_conv3x3(
        x, gamma, beta, w, b, num_groups=GROUPS, residual=res,
        emit_tap=True, emit_moments=True,
    )
    return y


def time_chain(step_fn, args, iters=24):
    def chain(n):
        return jax.jit(
            lambda a: jax.lax.fori_loop(
                0, n, lambda _, t: step_fn(t, *a[1:]), a[0]
            )
        )

    short, long_ = chain(2), chain(2 + iters)

    def run(g):
        t0 = time.perf_counter()
        _ = float(jax.device_get(jnp.sum(g(args)[..., 0].astype(jnp.float32))))
        return time.perf_counter() - t0

    run(short)
    run(long_)
    samples = []
    for _ in range(3):
        t1 = run(short)
        t2 = run(long_)
        samples.append((t2 - t1) / iters)
    return float(np.median(samples))


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    shapes = [
        ("A 512ch@64px", (8, 64, 64, 512)),
        ("B 256ch@128px", (8, 128, 128, 256)),
        ("C 128ch@256px", (8, 256, 256, 128)),
        ("D 512ch@32px", (8, 32, 32, 512)),
    ]
    rng = np.random.default_rng(0)
    for label, (n, h, wd, c) in shapes:
        x = jnp.asarray(rng.standard_normal((n, h, wd, c)), jnp.bfloat16)
        gamma = jnp.asarray(rng.uniform(0.5, 1.5, (c,)), jnp.float32)
        beta = jnp.asarray(rng.uniform(-0.2, 0.2, (c,)), jnp.float32)
        w = jnp.asarray(
            rng.standard_normal((3, 3, c, c)) / np.sqrt(9 * c), jnp.bfloat16
        )
        b = jnp.asarray(rng.uniform(-0.1, 0.1, (c,)), jnp.float32)
        res = jnp.asarray(rng.standard_normal((n, h, wd, c)), jnp.bfloat16)
        flops = 2 * n * h * wd * c * c * 9

        # correctness spot check on-device FIRST (cheap compiles)
        yf = np.asarray(
            jax.device_get(jax.jit(fused_op)(x, gamma, beta, w, b, res)),
            np.float32,
        )
        yr = np.asarray(
            jax.device_get(jax.jit(xla_op)(x, gamma, beta, w, b, res)),
            np.float32,
        )
        rel = np.abs(yf - yr).max() / max(np.abs(yr).max(), 1e-6)
        print(f"{label}: rel_err={rel:.1e}", flush=True)
        for name, op in (("xla", xla_op), ("fused", fused_op)):
            if which in ("fwd", "all"):
                f = lambda t, *a, op=op: op(t, *a).astype(t.dtype)
                dt = time_chain(f, (x, gamma, beta, w, b, res))
                print(
                    f"{label}:  {name}_fwd={dt*1e6:.0f}us "
                    f"({flops/dt/1e12:.1f}TF/s)",
                    flush=True,
                )
            if which in ("bwd", "all"):
                def fb(t, *a, op=op):
                    def loss(t):
                        return jnp.sum(
                            jnp.square(op(t, *a).astype(jnp.float32))
                        )
                    return jax.grad(loss)(t).astype(t.dtype)
                dt = time_chain(fb, (x, gamma, beta, w, b, res))
                print(f"{label}:  {name}_fb={dt*1e6:.0f}us", flush=True)


if __name__ == "__main__":
    main()
