"""Scratch: compare grid_sample formulations on the real TPU."""
import time
import numpy as np
import jax
import jax.numpy as jnp
from functools import partial

N, C, H, W = 40, 12, 128, 128
Ho = Wo = 128
P = Ho * Wo


def timeit(f, *args, iters=20):
    r = f(*args)
    jax.block_until_ready(r)
    t0 = time.time()
    for _ in range(iters):
        r = f(*args)
    jax.block_until_ready(r)
    return (time.time() - t0) / iters * 1e3


rng = np.random.RandomState(0)
img = jnp.asarray(rng.randn(N, C, H, W).astype(np.float32))
grid = jnp.asarray((rng.rand(N, Ho, Wo, 2) * 2 - 1).astype(np.float32))


@jax.jit
def v_take(img, grid):
    from gangealing_tpu.ops.grid_sample import grid_sample
    return grid_sample(img, grid)


@jax.jit
def v_onehot(img, grid):
    # bilinear via per-point one-hot row/col weight vectors + einsum
    gx = ((grid[..., 0] + 1) * W - 1) * 0.5
    gy = ((grid[..., 1] + 1) * H - 1) * 0.5
    gx = jnp.clip(gx, 0, W - 1).reshape(N, P)
    gy = jnp.clip(gy, 0, H - 1).reshape(N, P)
    x0 = jnp.floor(gx); y0 = jnp.floor(gy)
    wx1 = gx - x0; wy1 = gy - y0
    hh = jnp.arange(H, dtype=jnp.float32)
    ww = jnp.arange(W, dtype=jnp.float32)
    # (N, P, H): weight on row h = wy0*(h==y0) + wy1*(h==y0+1)
    WY = (jnp.maximum(0, 1 - jnp.abs(gy[..., None] - hh)))
    WX = (jnp.maximum(0, 1 - jnp.abs(gx[..., None] - ww)))
    rows = jnp.einsum('nph,nchw->npcw', WY.astype(jnp.bfloat16),
                      img.astype(jnp.bfloat16))
    out = jnp.einsum('npcw,npw->ncp', rows, WX.astype(jnp.bfloat16))
    return out.reshape(N, C, Ho, Wo).astype(jnp.float32)


@jax.jit
def v_onehot_2mm(img, grid):
    # full matmul both stages (W side also matmul)
    gx = jnp.clip(((grid[..., 0] + 1) * W - 1) * 0.5, 0, W - 1).reshape(N, P)
    gy = jnp.clip(((grid[..., 1] + 1) * H - 1) * 0.5, 0, H - 1).reshape(N, P)
    hh = jnp.arange(H, dtype=jnp.float32)
    ww = jnp.arange(W, dtype=jnp.float32)
    WY = jnp.maximum(0, 1 - jnp.abs(gy[..., None] - hh)).astype(jnp.bfloat16)
    WX = jnp.maximum(0, 1 - jnp.abs(gx[..., None] - ww)).astype(jnp.bfloat16)
    rows = jnp.einsum('nph,nchw->npcw', WY, img.astype(jnp.bfloat16))
    out = jnp.einsum('npcw,npw->ncp', rows, WX)
    return out.reshape(N, C, Ho, Wo).astype(jnp.float32)


def main():
    print('take_along_axis :', timeit(v_take, img, grid), 'ms')
    print('onehot bf16     :', timeit(v_onehot, img, grid), 'ms')
    # correctness cross-check (border mode, in-bounds grid)
    a = np.asarray(v_take(img, grid))
    b = np.asarray(v_onehot(img, grid))
    print('max diff vs take:', np.abs(a - b).max())


if __name__ == '__main__':
    main()
