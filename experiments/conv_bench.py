"""Prototype: NHWC 3x3 conv as shifted MXU matmuls in Pallas, vs XLA conv.

Feasibility gate for the fused GN+SiLU+conv resnet kernel (VERDICT item 1):
if the plain Pallas conv can't get close to XLA's conv throughput on the
decoder's hot shapes, the fusion cannot win end-to-end and the item closes
as a documented negative result.

Usage: python experiments/conv_bench.py [v9|v3|xla|all]
"""
import functools
import os
import sys
import time

sys.path.insert(0, "/root/repo")
from vae_channel_dynamics_tpu.utils.platform import apply_platform_env

apply_platform_env()

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret():
    return jax.devices()[0].platform != "tpu"


# --------------------------------------------------------------------- #
# v9: 9 matmuls of (TILE_H*W, Cin) @ (Cin, Cout)
# --------------------------------------------------------------------- #
def _conv_kernel_v9(x_ref, w_ref, b_ref, y_ref, *, tile_h, w_dim, cin, cout):
    i = pl.program_id(1)
    n_h = pl.num_programs(1)
    win = x_ref[0]  # (tile_h+2, W, Cin); logical rows [i*tile_h-1, ...)
    # Mosaic supports only HIGH out-of-bounds padding on Element windows, so
    # the window start is clamped to 0 and the first tile's rows arrive
    # shifted up by one: realign with a zero row on top.
    shifted = jnp.concatenate([jnp.zeros_like(win[:1]), win[:-1]], axis=0)
    win = jnp.where(i == 0, shifted, win)
    row = jax.lax.broadcasted_iota(jnp.int32, win.shape, 0)
    valid = jnp.logical_or(i < n_h - 1, row < tile_h + 1)
    win = jnp.where(valid, win, jnp.zeros_like(win))
    acc = jnp.zeros((tile_h * w_dim, cout), jnp.float32)
    for dy in range(3):
        rows = win[dy : dy + tile_h]  # (tile_h, W, Cin)
        for dx in range(3):
            if dx == 0:
                a = jnp.concatenate(
                    [jnp.zeros_like(rows[:, :1]), rows[:, :-1]], axis=1
                )
            elif dx == 2:
                a = jnp.concatenate(
                    [rows[:, 1:], jnp.zeros_like(rows[:, :1])], axis=1
                )
            else:
                a = rows
            acc = acc + jnp.dot(
                a.reshape(tile_h * w_dim, cin),
                w_ref[dy, dx],
                preferred_element_type=jnp.float32,
            )
    y = acc + b_ref[0].astype(jnp.float32)
    y_ref[0] = y.reshape(tile_h, w_dim, cout).astype(y_ref.dtype)


# --------------------------------------------------------------------- #
# v3: pre-concat the 3 W-shifts -> 3 matmuls of (TILE_H*W, 3Cin)
# --------------------------------------------------------------------- #
def _conv_kernel_v3(x_ref, w_ref, b_ref, y_ref, *, tile_h, w_dim, cin, cout):
    i = pl.program_id(1)
    n_h = pl.num_programs(1)
    win = x_ref[0]  # (tile_h+2, W, Cin); logical rows [i*tile_h-1, ...)
    # Mosaic supports only HIGH out-of-bounds padding on Element windows, so
    # the window start is clamped to 0 and the first tile's rows arrive
    # shifted up by one: realign with a zero row on top.
    shifted = jnp.concatenate([jnp.zeros_like(win[:1]), win[:-1]], axis=0)
    win = jnp.where(i == 0, shifted, win)
    row = jax.lax.broadcasted_iota(jnp.int32, win.shape, 0)
    valid = jnp.logical_or(i < n_h - 1, row < tile_h + 1)
    win = jnp.where(valid, win, jnp.zeros_like(win))
    zero_col = jnp.zeros_like(win[:, :1])
    left = jnp.concatenate([zero_col, win[:, :-1]], axis=1)
    right = jnp.concatenate([win[:, 1:], zero_col], axis=1)
    cat = jnp.concatenate([left, win, right], axis=-1)  # (tile_h+2, W, 3Cin)
    acc = jnp.zeros((tile_h * w_dim, cout), jnp.float32)
    for dy in range(3):
        a = cat[dy : dy + tile_h].reshape(tile_h * w_dim, 3 * cin)
        acc = acc + jnp.dot(
            a, w_ref[dy], preferred_element_type=jnp.float32
        )
    y = acc + b_ref[0].astype(jnp.float32)
    y_ref[0] = y.reshape(tile_h, w_dim, cout).astype(y_ref.dtype)


def _pick_tile_h(h, w_dim, cin):
    # keep the bf16 input window under ~1.5 MB and rows >= 256
    for tile_h in (16, 8, 4, 2):
        if h % tile_h:
            continue
        if (tile_h + 2) * w_dim * cin * 2 <= 1_600_000:
            return tile_h
    return 2


def pallas_conv3x3(x, w, b, variant="v9"):
    n, h, wd, cin = x.shape
    cout = w.shape[-1]
    tile_h = _pick_tile_h(h, wd, cin)
    kernel = _conv_kernel_v9 if variant == "v9" else _conv_kernel_v3
    if variant == "v3":
        # (3, 3, Cin, Cout) -> (3, 3*Cin, Cout); dx-major rows to match
        # cat = [left(dx=0), center(dx=1), right(dx=2)] along the Cin axis
        wk = jnp.transpose(w, (0, 1, 2, 3)).reshape(3, 3 * cin, cout)
    else:
        wk = w
    w_spec = (
        pl.BlockSpec((3, 3 * cin, cout), lambda i, j: (0, 0, 0),
                     memory_space=pltpu.VMEM)
        if variant == "v3"
        else pl.BlockSpec((3, 3, cin, cout), lambda i, j: (0, 0, 0, 0),
                          memory_space=pltpu.VMEM)
    )
    return pl.pallas_call(
        functools.partial(
            kernel, tile_h=tile_h, w_dim=wd, cin=cin, cout=cout
        ),
        grid=(n, h // tile_h),
        interpret=_interpret(),
        in_specs=[
            pl.BlockSpec(
                (
                    pl.Element(1),
                    pl.Element(tile_h + 2, (0, 2)),
                    pl.Element(wd),
                    pl.Element(cin),
                ),
                lambda i, j: (i, jnp.maximum(j * tile_h - 1, 0), 0, 0),
                memory_space=pltpu.VMEM,
            ),
            w_spec,
            pl.BlockSpec((1, cout), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, tile_h, wd, cout), lambda i, j: (i, j, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((n, h, wd, cout), x.dtype),
    )(x, wk, b[None])


def xla_conv3x3(x, w, b):
    y = jax.lax.conv_general_dilated(
        x, w, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=jax.lax.Precision.DEFAULT,
    )
    return y + b


def time_chain(f, x, w, b, iters=32):
    """Device-side chains: the op is iterated inside ONE jitted fori_loop,
    so per-dispatch/tunnel overhead is a single constant that the two-length
    differencing cancels exactly. Weights are runtime args (not jit
    constants) to keep the remote-compile payload small."""

    def chain(n):
        return jax.jit(
            lambda t, wt, bs: jax.lax.fori_loop(
                0, n, lambda _, y: f(y, wt, bs), t
            )
        )

    short, long_ = chain(2), chain(2 + iters)

    def run(g):
        t0 = time.perf_counter()
        _ = float(
            jax.device_get(jnp.sum(g(x, w, b)[..., 0].astype(jnp.float32)))
        )
        return time.perf_counter() - t0

    run(short)
    run(long_)  # warm both
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
        x = jnp.asarray(
            rng.standard_normal((n, h, wd, c), dtype=np.float32),
            dtype=jnp.bfloat16,
        )
        w_np = rng.standard_normal((3, 3, c, c), dtype=np.float32) / np.sqrt(
            9 * c
        )
        w = jnp.asarray(w_np, dtype=jnp.bfloat16)
        b = jnp.zeros((c,), jnp.bfloat16)
        flops = 2 * n * h * wd * c * c * 9

        fx = jax.jit(xla_conv3x3)
        ref = None
        results = {}
        if which in ("xla", "all"):
            dt = time_chain(xla_conv3x3, x, w, b)
            results["xla"] = dt
            ref = np.asarray(jax.device_get(fx(x, w, b)), dtype=np.float32)
        for variant in ("v9", "v3"):
            if which not in (variant, "all"):
                continue
            fp = jax.jit(functools.partial(pallas_conv3x3, variant=variant))
            try:
                out = np.asarray(jax.device_get(fp(x, w, b)), dtype=np.float32)
                if ref is None:
                    ref = np.asarray(jax.device_get(fx(x, w, b)), dtype=np.float32)
                err = np.abs(out - ref).max() / max(np.abs(ref).max(), 1e-6)
                dt = time_chain(
                    functools.partial(pallas_conv3x3, variant=variant), x, w, b
                )
                results[variant] = dt
                print(f"  {label} {variant}: rel_err={err:.2e}", flush=True)
            except Exception as e:
                print(f"  {label} {variant} FAILED: {type(e).__name__}: {e}",
                      flush=True)
        line = f"{label}:"
        for k, dt in results.items():
            line += f"  {k}={dt*1e6:.0f}us ({flops/dt/1e12:.1f} TF/s)"
        print(line, flush=True)


if __name__ == "__main__":
    main()
