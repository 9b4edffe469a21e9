import time
import numpy as np
import jax, jax.numpy as jnp
from gangealing_tpu.ops.pallas_grid_sample import grid_sample_mxu

B, C, H = 40, 12, 256
x = jnp.asarray(np.random.RandomState(0).randn(B, C, H, H).astype(np.float32))
g = jnp.asarray((np.random.RandomState(1).rand(B, 128, 128, 2) * 2 - 1).astype(np.float32))

def timeit(f, reps=8):
    _ = float(f(x, g))
    ts = []
    for _ in range(reps):
        t0 = time.time(); float(f(x, g)); ts.append(time.time() - t0)
    return min(ts) * 1e3

@jax.jit
def f_null(x, g):
    return x[0,0,0,0] + g[0,0,0,0]
null = timeit(f_null)
print('null:', round(null, 2))
for pb in [128, 256, 512, 1024]:
    f = jax.jit(lambda x, g, pb=pb: grid_sample_mxu(x, g, point_block=pb).mean())
    print(f'PB={pb}:', round(timeit(f) - null, 2), 'ms')
