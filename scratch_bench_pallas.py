import time
import numpy as np
import jax, jax.numpy as jnp
from gangealing_tpu.ops.pallas_grid_sample import grid_sample_mxu
from gangealing_tpu.ops.grid_sample import grid_sample

def timed_chain(make_fn, k_lo=1, k_hi=11, reps=3):
    lo, hi = jax.jit(make_fn(k_lo)), jax.jit(make_fn(k_hi))
    _ = np.asarray(lo()); _ = np.asarray(hi())
    tl = th = 1e9
    for _ in range(reps):
        t0 = time.time(); np.asarray(lo()); tl = min(tl, time.time()-t0)
        t0 = time.time(); np.asarray(hi()); th = min(th, time.time()-t0)
    return (th - tl) / (k_hi - k_lo) * 1e3

B, C, H = 40, 12, 256
def make(f):
    def mk(k):
        def fn():
            x = jnp.full((B, C, H, H), 0.1)
            g = jnp.full((B, 128, 128, 2), 0.3)
            def body(i, c):
                return c + f(x * (1 + 1e-6 * c), g).mean()
            return jax.lax.fori_loop(0, k, body, 0.0)
        return fn
    return mk

print('xla gather  :', timed_chain(make(lambda x, g: grid_sample(x, g))), 'ms')
print('mxu bf16    :', timed_chain(make(lambda x, g: grid_sample_mxu(x, g))), 'ms')
print('mxu f32     :', timed_chain(make(lambda x, g: grid_sample_mxu(x, g, precision="f32"))), 'ms')
# correctness on TPU
x = jnp.asarray(np.random.RandomState(0).randn(2, C, H, H).astype(np.float32))
g = jnp.asarray((np.random.RandomState(1).rand(2, 64, 64, 2) * 2 - 1).astype(np.float32))
a = np.asarray(grid_sample(x, g))
b = np.asarray(grid_sample_mxu(x, g))
c = np.asarray(grid_sample_mxu(x, g, precision='f32'))
print('bf16 maxerr vs xla:', np.abs(a - b).max(), ' f32 maxerr:', np.abs(a - c).max())
