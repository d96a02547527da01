"""Probe: does XLA lower s8xs8->s32 conv/matmul to the v5e MXU at the 2x
int8 rate? Times a large conv and matmul in bf16 vs int8 using the
chain-differencing method (see bench.py). Decides whether a quantized
serving path is worth building."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from vae_channel_dynamics_tpu.utils.platform import apply_platform_env
apply_platform_env()
import jax, jax.numpy as jnp, numpy as np


def time_op(fn, *args, iters=30, warmup=5):
    out = fn(*args)
    def chain(n):
        t0 = time.perf_counter()
        x = args[0]
        acc = None
        for _ in range(n):
            acc = fn(x, *args[1:])
            # feed a cheap dependency back to serialize the chain
            x = jax.lax.dynamic_update_slice(x, x[:1] * 0 + acc.astype(x.dtype).ravel()[0], (0,) * x.ndim)
        s = float(jax.device_get(jnp.sum(acc.astype(jnp.float32))))
        return time.perf_counter() - t0
    chain(warmup)
    t1 = chain(3)
    t2 = chain(3 + iters)
    return (t2 - t1) / iters


def main():
    rng = np.random.default_rng(0)
    # conv: decoder-ish hot shape 256ch@128px batch 8
    N, H, W, C, O = 8, 128, 128, 256, 256
    xb = jnp.asarray(rng.uniform(-1, 1, (N, H, W, C)), jnp.bfloat16)
    wb = jnp.asarray(rng.uniform(-0.1, 0.1, (3, 3, C, O)), jnp.bfloat16)
    xi = jnp.asarray(rng.integers(-127, 127, (N, H, W, C)), jnp.int8)
    wi = jnp.asarray(rng.integers(-127, 127, (3, 3, C, O)), jnp.int8)

    @jax.jit
    def conv_bf16(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    @jax.jit
    def conv_int8(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32)

    flops = 2 * N * H * W * C * O * 9
    try:
        t = time_op(conv_bf16, xb, wb)
        print(f"conv bf16: {t*1e6:.0f} us, {flops/t/1e12:.1f} TFLOP/s")
    except Exception as e:
        print("conv bf16 failed:", e)
    try:
        t = time_op(conv_int8, xi, wi)
        print(f"conv int8: {t*1e6:.0f} us, {flops/t/1e12:.1f} TOP/s")
    except Exception as e:
        print("conv int8 failed:", type(e).__name__, str(e)[:300])

    # matmul 8192^3
    M = 8192
    ab = jnp.asarray(rng.uniform(-1, 1, (M, M)), jnp.bfloat16)
    ai = jnp.asarray(rng.integers(-127, 127, (M, M)), jnp.int8)

    @jax.jit
    def mm_bf16(a, b):
        return jnp.dot(a, b, preferred_element_type=jnp.bfloat16)

    @jax.jit
    def mm_int8(a, b):
        return jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32)

    mflops = 2 * M**3
    t = time_op(mm_bf16, ab, ab, iters=10)
    print(f"matmul bf16: {t*1e3:.2f} ms, {mflops/t/1e12:.0f} TFLOP/s")
    try:
        t = time_op(mm_int8, ai, ai, iters=10)
        print(f"matmul int8: {t*1e3:.2f} ms, {mflops/t/1e12:.0f} TOP/s")
    except Exception as e:
        print("matmul int8 failed:", type(e).__name__, str(e)[:300])


if __name__ == "__main__":
    main()
