import time
import numpy as np
import jax, jax.numpy as jnp

def timeit(f, *args, iters=10):
    r = f(*args); jax.block_until_ready(r)
    t0 = time.time()
    for _ in range(iters):
        r = f(*args)
    jax.block_until_ready(r)
    return (time.time() - t0) / iters * 1e3

# calibration: 8192^3 bf16 matmul = 1.1 TFLOP
a = jnp.ones((8192, 8192), jnp.bfloat16)
f = jax.jit(lambda a: a @ a)
ms = timeit(f, a)
print(f'matmul 8192^3 bf16: {ms:.3f} ms -> {2*8192**3/ms/1e9:.1f} TFLOP/s')

# chained version (data dependent): 20 matmuls in one jit
@jax.jit
def chain(a):
    def body(i, x):
        return x @ a * 0.001
    return jax.lax.fori_loop(0, 20, body, a)
ms = timeit(chain, a, iters=3)
print(f'chained 20x matmul: {ms/20:.3f} ms/mm -> {2*8192**3/(ms/20)/1e9:.1f} TFLOP/s')

# chained STN forward
import __graft_entry__ as ge
fn, (params, _) = ge.entry()
rng = np.random.RandomState(0)
imgs = jnp.asarray(rng.randn(40, 3, 256, 256).astype(np.float32))
@jax.jit
def stn_chain(params, imgs):
    def body(i, x):
        out, _, _ = fn(params, x)
        # feed output back (resize 128->256 by tiling) to force dependency
        x2 = jnp.concatenate([out, out], axis=2)
        x2 = jnp.concatenate([x2, x2], axis=3)
        return x2
    return jax.lax.fori_loop(0, 10, body, imgs)
ms = timeit(stn_chain, params, imgs, iters=3)
print(f'chained STN fwd: {ms/10:.2f} ms/fwd -> {40/(ms/10/1e3):.0f} imgs/s')
