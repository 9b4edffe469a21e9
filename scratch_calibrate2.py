import time
import numpy as np
import jax, jax.numpy as jnp

def timed_chain(make_chain, k, reps=3):
    f = jax.jit(make_chain(k))
    _ = np.asarray(f())  # compile+run+transfer once
    best = 1e9
    for _ in range(reps):
        t0 = time.time()
        r = np.asarray(f())
        best = min(best, time.time() - t0)
    return best

def calib_matmul(k):
    def fn():
        a = jnp.full((8192, 8192), 0.001, jnp.bfloat16)
        def body(i, x):
            return (x @ a) * 0.001 + a
        out = jax.lax.fori_loop(0, k, body, a)
        return out[0, 0].astype(jnp.float32)
    return fn

t1 = timed_chain(calib_matmul, 1)
t21 = timed_chain(calib_matmul, 21)
per = (t21 - t1) / 20
print(f'matmul 8192^3 bf16: {per*1e3:.3f} ms -> {2*8192**3/per/1e12:.1f} TFLOP/s')

import __graft_entry__ as ge
fn_stn, (params, _) = ge.entry()
def stn_chain(k):
    def fn():
        x = jnp.full((40, 3, 256, 256), 0.1, jnp.float32)
        def body(i, x):
            out, _, _ = fn_stn(params, x)
            x2 = jnp.concatenate([out, out], axis=2)
            return jnp.concatenate([x2, x2], axis=3) * 0.999
        out = jax.lax.fori_loop(0, k, body, x)
        return out.mean().astype(jnp.float32)
    return fn

t1 = timed_chain(stn_chain, 1)
t11 = timed_chain(stn_chain, 11)
per = (t11 - t1) / 10
print(f'STN fwd batch=40 @256: {per*1e3:.2f} ms -> {40/per:.0f} imgs/s')
