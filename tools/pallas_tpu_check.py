import sys; sys.path.insert(0, "/root/repo")
import time, numpy as np, jax, jax.numpy as jnp
from hierslam_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
from hierslam_tpu.ops import render_xla
from hierslam_tpu.ops.render_pallas import render_tiles_pallas
rng = np.random.default_rng(0)
T, K, F = 3225, 512, 31
gy, gx = 43, 75
tile = (16, 16)
shape = (680, 1200)
tid = np.arange(T)
ox = (tid % gx) * 16; oy = (tid // gx) * 16
xy = np.stack([ox[:,None] + rng.uniform(-6, 22, (T,K)), oy[:,None] + rng.uniform(-6, 22, (T,K))], -1)
a = rng.uniform(0.02, 0.4, (T,K)); c = rng.uniform(0.02, 0.4, (T,K))
b = rng.uniform(-0.5, 0.5, (T,K)) * np.sqrt(a*c)
table = np.concatenate([xy, np.stack([a,b,c],-1), rng.uniform(0.1,0.95,(T,K,1)),
                        rng.uniform(0.5,5,(T,K,1)), rng.uniform(0,1,(T,K,F))], -1).astype(np.float32)
ok = rng.uniform(size=(T,K)) > 0.15
table = jnp.asarray(table); ok = jnp.asarray(ok)

pal = jax.jit(lambda t, o: render_tiles_pallas(t, o, image_shape=shape, tile_shape=tile, grid=(gy,gx)))
xla = jax.jit(lambda t, o: render_xla.blend_tiles(
    t[...,0:2], t[...,2:5], jnp.where(o, t[...,5], 0.), t[...,6], t[...,7:], o,
    image_shape=shape, tile_shape=tile, grid=(gy,gx), chunk=256, tile_batch=48))
a1 = pal(table, ok); s1 = float(a1[0].sum()); print('pallas fwd ok', flush=True)
a2 = xla(table, ok); s2 = float(a2[0].sum())
print('fwd match:', abs(s1-s2)/abs(s2), np.abs(np.asarray(a1[0])-np.asarray(a2[0])).max(), flush=True)
def timefn(name, f):
    t0=time.time()
    for _ in range(5):
        r = f(table, ok); x = float(r[0].reshape(-1)[0] + r[1].reshape(-1)[0])
    print(name, (time.time()-t0)/5, flush=True)
timefn('pallas fwd', pal)
timefn('xla fwd', xla)
lp = jax.jit(jax.grad(lambda t: jnp.sum(render_tiles_pallas(t, ok, image_shape=shape, tile_shape=tile, grid=(gy,gx))[0]**2)))
lx = jax.jit(jax.grad(lambda t: jnp.sum(render_xla.blend_tiles(
    t[...,0:2], t[...,2:5], jnp.where(ok, t[...,5], 0.), t[...,6], t[...,7:], ok,
    image_shape=shape, tile_shape=tile, grid=(gy,gx), chunk=256, tile_batch=48)[0]**2)))
g1 = lp(table); gs1=float(jnp.abs(g1).sum()); print('pallas bwd ok', flush=True)
g2 = lx(table); gs2=float(jnp.abs(g2).sum())
print('bwd match:', abs(gs1-gs2)/abs(gs2), flush=True)
def timegrad(name, f):
    t0=time.time()
    for _ in range(5):
        g = f(table); x = float(g.reshape(-1)[0])
    print(name, (time.time()-t0)/5, flush=True)
timegrad('pallas fwd+bwd', lp)
timegrad('xla fwd+bwd', lx)
