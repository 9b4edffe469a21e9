import time
import numpy as np
import jax, jax.numpy as jnp
from gangealing_tpu.ops.pallas_grid_sample import grid_sample_mxu
from gangealing_tpu.ops.grid_sample import grid_sample

B, C, H = 40, 12, 256
x = jnp.asarray(np.random.RandomState(0).randn(B, C, H, H).astype(np.float32))
g = jnp.asarray((np.random.RandomState(1).rand(B, 128, 128, 2) * 2 - 1).astype(np.float32))

def timeit(f, reps=8):
    _ = float(f(x, g))
    ts = []
    for _ in range(reps):
        t0 = time.time()
        float(f(x, g))
        ts.append(time.time() - t0)
    return min(ts) * 1e3

@jax.jit
def f_null(x, g):
    return (x[0, 0, 0, 0] + g[0, 0, 0, 0])

@jax.jit
def f_gather(x, g):
    return grid_sample(x, g).mean()

@jax.jit
def f_mxu(x, g):
    return grid_sample_mxu(x, g).mean()

@jax.jit
def f_mxu_f32(x, g):
    return grid_sample_mxu(x, g, precision='f32').mean()

null = timeit(f_null)
print('harness overhead:', round(null, 2), 'ms')
print('xla gather      :', round(timeit(f_gather) - null, 2), 'ms')
print('mxu bf16        :', round(timeit(f_mxu) - null, 2), 'ms')
print('mxu f32(highest):', round(timeit(f_mxu_f32) - null, 2), 'ms')
a = np.asarray(grid_sample(x, g)); c = np.asarray(grid_sample_mxu(x, g, precision='f32'))
b = np.asarray(grid_sample_mxu(x, g))
print('f32 maxerr:', np.abs(a - c).max(), 'bf16 maxerr:', np.abs(a - b).max())
