import time
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

K, P, C = 512, 256, 38
T = 64
rng = np.random.default_rng(0)
table = jnp.asarray(rng.normal(size=(T, K, C)).astype(np.float32))
table_t = jnp.asarray(rng.normal(size=(T, C, K)).astype(np.float32))
ok = jnp.asarray((rng.uniform(size=(T, 1, K)) > 0.2).astype(np.int32))


def run(name, kern, ins, in_specs, out_shape, out_specs):
    f = jax.jit(lambda *a: pl.pallas_call(
        kern, grid=(T,), in_specs=in_specs, out_specs=out_specs,
        out_shape=[out_shape])(*a)[0])
    t0 = time.time()
    y = f(*ins)
    s = float(jax.tree_util.tree_leaves(y)[0].reshape(-1)[0])
    print(f"{name}: compile+run {time.time()-t0:.1f}s", flush=True)


spec_tab = pl.BlockSpec((1, K, C), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
spec_tab_t = pl.BlockSpec((1, C, K), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
spec_ok = pl.BlockSpec((1, 1, K), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
spec_out = pl.BlockSpec((1, P, C), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
shape_out = jax.ShapeDtypeStruct((T, P, C), jnp.float32)

# A: column slices of [K,C] table (sublane->lane transposes)
def kern_a(tab_ref, o_ref):
    tab = tab_ref[0]
    x = tab[:, 0][None, :]  # [1, K]
    px = jax.lax.broadcasted_iota(jnp.int32, (P, 1), 0).astype(jnp.float32)
    d = x - px
    o_ref[0] = jnp.dot(jnp.exp(-d * d), tab, preferred_element_type=jnp.float32)

run("A col-slice [K,C]", kern_a, (table,), [spec_tab], shape_out, [spec_out])

# B: row slices of transposed [C,K] table (natural lanes)
def kern_b(tab_ref, o_ref):
    tab = tab_ref[0]          # [C, K]
    x = tab[0][None, :]       # [1, K]
    px = jax.lax.broadcasted_iota(jnp.int32, (P, 1), 0).astype(jnp.float32)
    d = x - px
    o_ref[0] = jax.lax.dot_general(
        jnp.exp(-d * d), tab,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

run("B row-slice [C,K]", kern_b, (table_t,), [spec_tab_t], shape_out, [spec_out])

# C: triangular-matmul cumsum alone
def kern_c(tab_ref, o_ref):
    tab = tab_ref[0]
    x = tab[0][None, :] * jnp.ones((P, 1), jnp.float32)  # [P, K]
    rows = jax.lax.broadcasted_iota(jnp.int32, (K, K), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (K, K), 1)
    tri = (rows <= cols).astype(jnp.float32)
    cs = jnp.dot(x, tri, preferred_element_type=jnp.float32)
    o_ref[0] = jax.lax.dot_general(
        cs, tab, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)

run("C tri-cumsum", kern_c, (table_t,), [spec_tab_t], shape_out, [spec_out])

# D: concatenate along lanes
def kern_d(tab_ref, o_ref):
    tab = tab_ref[0]  # [K, C]
    f2 = jnp.concatenate([tab[:, 7:], tab[:, 6:7], jnp.ones((K, 1), jnp.float32)], axis=1)
    o_ref[0] = jnp.dot(jnp.ones((P, K), jnp.float32), tab, preferred_element_type=jnp.float32)

run("D lane-concat", kern_d, (table,), [spec_tab], shape_out, [spec_out])
