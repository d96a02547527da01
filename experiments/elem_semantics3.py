import os
os.environ["JAX_PLATFORMS"] = "cpu"
import jax, jax.numpy as jnp
jax.config.update("jax_platforms", "cpu")
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

H, W, C = 8, 8, 128
TILE = 4

# x rows contain their row index
x = np.broadcast_to(np.arange(H, dtype=np.float32)[:, None, None], (H, W, C)).copy()

for idx_fn, label in [(lambda i: (i * TILE - 1, 0, 0), "start=i*TILE-1"),
                      (lambda i: (i * TILE, 0, 0), "start=i*TILE")]:
    def kernel(x_ref, y_ref):
        y_ref[...] = x_ref[0:TILE, :, :] * 0 + x_ref[...][ :TILE+2, 0, 0].reshape(-1,1,1)[0:TILE]
    def kernel2(x_ref, win_ref):
        win_ref[...] = x_ref[...]
    try:
        win = pl.pallas_call(
            kernel2,
            grid=(H // TILE,),
            in_specs=[pl.BlockSpec(
                (pl.Element(TILE + 2, (1, 1)), W, C),
                idx_fn,
                memory_space=pltpu.VMEM,
            )],
            out_specs=pl.BlockSpec((TILE + 2, W, C), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((2 * (TILE + 2), W, C), jnp.float32),
            interpret=True,
        )(jnp.asarray(x))
        w = np.asarray(win)[:, 0, 0]
        print(label, "tile0 rows:", w[:TILE+2], "tile1 rows:", w[TILE+2:])
    except Exception as e:
        print(label, "ERR", type(e).__name__, str(e)[:200])
