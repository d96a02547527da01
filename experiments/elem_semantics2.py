import os
os.environ["JAX_PLATFORMS"] = "cpu"
import jax, jax.numpy as jnp
jax.config.update("jax_platforms", "cpu")
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

H, W, C = 16, 16, 128
TILE = 4

def kernel(x_ref, y_ref):
    i = pl.program_id(0)
    n = pl.num_programs(0)
    win = x_ref[...]  # rows [i*TILE-1, i*TILE+TILE+1)
    row = jax.lax.broadcasted_iota(jnp.int32, win.shape, 0)
    valid = jnp.logical_and(
        jnp.logical_or(i > 0, row > 0),
        jnp.logical_or(i < n - 1, row < TILE + 1),
    )
    win = jnp.where(valid, win, 0.0)
    y_ref[...] = win[0:TILE] + win[1:TILE+1] + win[2:TILE+2]

x = (np.arange(H*W*C, dtype=np.float32).reshape(H, W, C) % 97) + 1

out = pl.pallas_call(
    kernel,
    grid=(H // TILE,),
    in_specs=[pl.BlockSpec(
        (pl.Element(TILE + 2, (1, 1)), W, C),
        lambda i: (i * TILE, 0, 0),
        memory_space=pltpu.VMEM,
    )],
    out_specs=pl.BlockSpec((TILE, W, C), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
    out_shape=jax.ShapeDtypeStruct((H, W, C), jnp.float32),
    interpret=True,
)(jnp.asarray(x))

xp = np.pad(x, ((1,1),(0,0),(0,0)))
ref = xp[0:H] + xp[1:H+1] + xp[2:H+2]
print("max err:", np.abs(np.asarray(out) - ref).max())
