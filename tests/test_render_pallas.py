"""Pallas fused blend kernels (interpret mode on CPU) vs the XLA blend:
forward outputs and custom-VJP gradients must match."""
import jax
import jax.numpy as jnp
import numpy as np

from hierslam_tpu.ops import render_xla
from hierslam_tpu.ops.render_pallas import render_tiles_pallas


def make_tables(seed=0, T=6, K=64, F=5, grid=(2, 3), tile=(16, 16)):
    rng = np.random.default_rng(seed)
    th, tw = tile
    gy, gx = grid
    # screen means scattered around each tile (plus outliers)
    tid = np.arange(T)
    ox = (tid % gx) * tw
    oy = (tid // gx) * th
    xy = np.stack(
        [
            ox[:, None] + rng.uniform(-6, tw + 6, (T, K)),
            oy[:, None] + rng.uniform(-6, th + 6, (T, K)),
        ],
        -1,
    )
    # positive-definite conics
    a = rng.uniform(0.02, 0.4, (T, K))
    c = rng.uniform(0.02, 0.4, (T, K))
    b = rng.uniform(-0.5, 0.5, (T, K)) * np.sqrt(a * c)
    conic = np.stack([a, b, c], -1)
    opa = rng.uniform(0.1, 0.95, (T, K))
    dep = rng.uniform(0.5, 5.0, (T, K))
    feats = rng.uniform(0, 1, (T, K, F))
    table = np.concatenate(
        [xy, conic, opa[..., None], dep[..., None], feats], -1
    ).astype(np.float32)
    ok = rng.uniform(size=(T, K)) > 0.15
    return jnp.asarray(table), jnp.asarray(ok)


GRID = (2, 3)
TILE = (16, 16)
SHAPE = (2 * 16, 3 * 16)


def xla_blend(table, ok):
    F = table.shape[-1] - 7
    return render_xla.blend_tiles(
        table[..., 0:2], table[..., 2:5],
        jnp.where(ok, table[..., 5], 0.0), table[..., 6], table[..., 7:],
        ok, image_shape=SHAPE, tile_shape=TILE, grid=GRID,
        chunk=16, tile_batch=2,
    )


def pallas_blend(table, ok):
    return render_tiles_pallas(
        table, ok, image_shape=SHAPE, tile_shape=TILE, grid=GRID, interpret=True
    )


def test_forward_matches_xla():
    table, ok = make_tables()
    a1, t1, m1 = xla_blend(table, ok)
    a2, t2, m2 = pallas_blend(table, ok)
    np.testing.assert_allclose(np.asarray(a2), np.asarray(a1), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(t2), np.asarray(t1), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(m2), np.asarray(m1), atol=1e-4)


def test_gradients_match_xla_autodiff():
    table, ok = make_tables(seed=3)

    def loss_x(tb):
        acc, ft, med = xla_blend(tb, ok)
        return (
            jnp.sum(acc**2) + jnp.sum(jnp.sin(3 * ft)) + 0.05 * jnp.sum(med)
        )

    def loss_p(tb):
        acc, ft, med = pallas_blend(tb, ok)
        return (
            jnp.sum(acc**2) + jnp.sum(jnp.sin(3 * ft)) + 0.05 * jnp.sum(med)
        )

    v1, g1 = jax.value_and_grad(loss_x)(table)
    v2, g2 = jax.value_and_grad(loss_p)(table)
    np.testing.assert_allclose(float(v2), float(v1), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(g2), np.asarray(g1), rtol=2e-3, atol=2e-3)


def test_gradients_heavy_saturation():
    """Exercise the T<1e-4 early-termination path (opaque stacks)."""
    table, ok = make_tables(seed=5, K=96)
    table = table.at[..., 5].set(0.97)  # near-opaque everything

    def loss_x(tb):
        acc, ft, med = xla_blend(tb, ok)
        return jnp.sum(acc[: acc.shape[0] - 2] ** 2) + jnp.sum(ft)

    def loss_p(tb):
        acc, ft, med = pallas_blend(tb, ok)
        return jnp.sum(acc[: acc.shape[0] - 2] ** 2) + jnp.sum(ft)

    g1 = jax.grad(loss_x)(table)
    g2 = jax.grad(loss_p)(table)
    np.testing.assert_allclose(np.asarray(g2), np.asarray(g1), rtol=3e-3, atol=3e-3)
