"""Scratch: end-to-end STN congeal + mipmap + 256px grid_sample timings on TPU."""
import time
import numpy as np
import jax
import jax.numpy as jnp


def timeit(f, *args, iters=10):
    r = f(*args)
    jax.block_until_ready(r)
    t0 = time.time()
    for _ in range(iters):
        r = f(*args)
    jax.block_until_ready(r)
    return (time.time() - t0) / iters * 1e3


def main():
    rng = np.random.RandomState(0)

    from gangealing_tpu.ops.grid_sample import grid_sample
    x = jnp.asarray(rng.randn(40, 3, 256, 256).astype(np.float32))
    g = jnp.asarray((rng.rand(40, 256, 256, 2) * 2 - 1).astype(np.float32))
    f = jax.jit(lambda a, b: grid_sample(a, b))
    print('grid_sample 40x3x256x256:', timeit(f, x, g), 'ms')

    from gangealing_tpu.ops.mipmap import mipmap_warp
    fm = jax.jit(lambda a, b: mipmap_warp(a, b))
    print('mipmap_warp 40x3x256->256:', timeit(fm, x, g), 'ms')

    import __graft_entry__ as ge
    fn, (params, _) = ge.entry()
    imgs = jnp.asarray(rng.randn(40, 3, 256, 256).astype(np.float32))
    jf = jax.jit(fn)
    ms = timeit(jf, params, imgs)
    print(f'ComposedSTN fwd batch=40 @256: {ms:.2f} ms -> '
          f'{40 / (ms / 1e3):.1f} imgs/s')


if __name__ == '__main__':
    main()
