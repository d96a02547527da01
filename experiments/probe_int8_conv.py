"""Probe: does the v5e MXU int8 path (394 TOPS peak vs ~197 TFLOP/s bf16)
actually accelerate the conv shapes this model is made of?

Times a bank of 3x3 convs at the SDXL-VAE decoder's dominant shapes in
bf16 vs int8xint8->int32, chain-differenced (tunnel-safe). Decides whether
a quantized inference/serving path is worth building.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from vae_channel_dynamics_tpu.utils.platform import apply_platform_env

apply_platform_env()


def time_chain(fn, args, iters=8, warmup=2):
    def run(n):
        t0 = time.perf_counter()
        x = args[0]
        for _ in range(n):
            x = fn(x, *args[1:])
        _ = float(jax.device_get(jnp.sum(x.astype(jnp.float32))))
        return time.perf_counter() - t0

    run(warmup)
    t1 = run(2)
    t2 = run(2 + iters)
    return (t2 - t1) / iters


def conv(x, w, out_dtype):
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=out_dtype,
    )


def main():
    print("platform:", jax.devices()[0].platform, flush=True)
    # decoder-dominant shapes: (batch, H, W, Cin, Cout)
    shapes = [
        (8, 64, 64, 512, 512),
        (8, 128, 128, 512, 512),
        (8, 256, 256, 256, 256),
    ]
    for b, h, w_, cin, cout in shapes:
        flops = 2 * b * h * w_ * 9 * cin * cout
        xb = jnp.asarray(
            np.random.randn(b, h, w_, cin).astype(np.float32), jnp.bfloat16
        )
        wb = jnp.asarray(
            (np.random.randn(3, 3, cin, cout) / np.sqrt(9 * cin)).astype(
                np.float32
            ),
            jnp.bfloat16,
        )

        @jax.jit
        def f_bf16(x, w=wb):
            # keep output bf16 so x can chain
            return conv(x, w, jnp.bfloat16)

        t_bf = time_chain(f_bf16, (xb,))

        xi = jnp.asarray(
            np.random.randint(-127, 127, (b, h, w_, cin)), jnp.int8
        )
        wi = jnp.asarray(
            np.random.randint(-127, 127, (3, 3, cin, cout)), jnp.int8
        )

        @jax.jit
        def f_int8(x, w=wi):
            y = conv(x, w, jnp.int32)
            # requantize back to int8 (shift keeps it cheap + chains)
            return jax.lax.shift_right_arithmetic(y, 12).astype(jnp.int8)

        try:
            t_i8 = time_chain(f_int8, (xi,))
        except Exception as e:  # unsupported lowering
            print(f"{b}x{h}x{w_}x{cin}->{cout}: int8 FAILED: {e}")
            continue

        print(
            f"{b}x{h}x{w_}x{cin}->{cout}: bf16 {t_bf*1e3:8.2f} ms "
            f"({flops/t_bf/1e12:6.1f} TF/s) | int8 {t_i8*1e3:8.2f} ms "
            f"({flops/t_i8/1e12:6.1f} TOP/s) | speedup {t_bf/t_i8:.2f}x",
            flush=True,
        )


if __name__ == "__main__":
    main()
