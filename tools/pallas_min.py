import time, numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

def kern(x_ref, o_ref):
    o_ref[:] = x_ref[:] * 2.0

x = jnp.ones((256, 256), jnp.float32)
f = jax.jit(lambda x: pl.pallas_call(
    kern,
    out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
)(x))
t0 = time.time()
y = f(x)
print("minimal pallas:", float(y[0, 0]), time.time() - t0, flush=True)
