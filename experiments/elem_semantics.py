"""Check pl.Element overlapping-window semantics: block (TILE+2) rows with
element index map i*TILE-1 and padding (1,1) should give a halo window with
zero (or garbage?) padding at the edges."""
import os
os.environ["JAX_PLATFORMS"] = "cpu"
import jax, jax.numpy as jnp
jax.config.update("jax_platforms", "cpu")
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

H, W, C = 8, 16, 128
TILE = 4

def kernel(x_ref, y_ref):
    # y tile t gets sum of the 3 rows around each row: rows come from halo window
    win = x_ref[...]  # (TILE+2, W, C)
    y_ref[...] = win[0:TILE] + win[1:TILE+1] + win[2:TILE+2]

x = np.arange(H*W*C, dtype=np.float32).reshape(H, W, C) % 97

out = pl.pallas_call(
    kernel,
    grid=(H // TILE,),
    in_specs=[pl.BlockSpec(
        (pl.Element(TILE + 2, (1, 1)), W, C),
        lambda i: (i * TILE - 1, 0, 0),
        memory_space=pltpu.VMEM,
    )],
    out_specs=pl.BlockSpec((TILE, W, C), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
    out_shape=jax.ShapeDtypeStruct((H, W, C), jnp.float32),
    interpret=True,
)(jnp.asarray(x))

xp = np.pad(x, ((1,1),(0,0),(0,0)))
ref = xp[0:H] + xp[1:H+1] + xp[2:H+2]
print("max err:", np.abs(np.asarray(out) - ref).max())
