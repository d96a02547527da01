import os
os.environ["JAX_PLATFORMS"] = "cpu"
import sys; sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp, numpy as np
from experiments.conv_bench import pallas_conv3x3, xla_conv3x3

rng = np.random.default_rng(1)
for (n,h,w,cin,cout) in [(2,8,16,128,128),(1,16,8,256,128)]:
    x = jnp.asarray(rng.standard_normal((n,h,w,cin)), jnp.float32)
    wt = jnp.asarray(rng.standard_normal((3,3,cin,cout))/np.sqrt(9*cin), jnp.float32)
    b = jnp.asarray(rng.standard_normal((cout,)), jnp.float32)
    ref = np.asarray(xla_conv3x3(x, wt, b))
    for v in ("v9","v3"):
        out = np.asarray(pallas_conv3x3(x, wt, b, v))
        print((n,h,w,cin,cout), v, "max_abs_err:", np.abs(out-ref).max())
