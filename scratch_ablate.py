import time
import numpy as np
import jax, jax.numpy as jnp

def timed_chain(make_fn, k_lo=1, k_hi=11, reps=3):
    lo, hi = jax.jit(make_fn(k_lo)), jax.jit(make_fn(k_hi))
    _ = np.asarray(lo()); _ = np.asarray(hi())
    tl = th = 1e9
    for _ in range(reps):
        t0 = time.time(); np.asarray(lo()); tl = min(tl, time.time()-t0)
        t0 = time.time(); np.asarray(hi()); th = min(th, time.time()-t0)
    return (th - tl) / (k_hi - k_lo) * 1e3

from gangealing_tpu.models.stn import ComposedSTNConfig, composed_stn_init, stn_features
from gangealing_tpu.ops.mipmap import mipmap_warp, _build_stack
from gangealing_tpu.ops.grid_sample import grid_sample
from gangealing_tpu.ops.resample import bilinear_downsample

cfg = ComposedSTNConfig(transforms=("similarity","flow"), flow_size=128, supersize=256, channel_multiplier=0.5)
params = composed_stn_init(jax.random.PRNGKey(0), cfg)
sim_p = {k[7:]: v for k, v in params.items() if k.startswith('stns.0.')}
flow_p = {k[7:]: v for k, v in params.items() if k.startswith('stns.1.')}
sim_cfg, flow_cfg = cfg.stn_cfgs

B = 40
def enc_sim(k):
    def fn():
        x = jnp.full((B,3,256,256), 0.1)
        def body(i, c):
            f = stn_features(sim_p, sim_cfg, x * (1 + 1e-6*c))
            return c + f.mean()
        return jax.lax.fori_loop(0, k, body, 0.0)
    return fn

def enc_flow(k):
    def fn():
        x = jnp.full((B,3,128,128), 0.1)
        def body(i, c):
            f = stn_features(flow_p, flow_cfg, x * (1 + 1e-6*c))
            return c + f.mean()
        return jax.lax.fori_loop(0, k, body, 0.0)
    return fn

def mm_warp(k):
    def fn():
        x = jnp.full((B,3,256,256), 0.1)
        g = jnp.full((B,128,128,2), 0.3)
        def body(i, c):
            return c + mipmap_warp(x * (1+1e-6*c), g).mean()
        return jax.lax.fori_loop(0, k, body, 0.0)
    return fn

def gs_only(k):
    def fn():
        x = jnp.full((B,12,256,256), 0.1)
        g = jnp.full((B,128,128,2), 0.3)
        def body(i, c):
            return c + grid_sample(x * (1+1e-6*c), g).mean()
        return jax.lax.fori_loop(0, k, body, 0.0)
    return fn

def stack_only(k):
    def fn():
        x = jnp.full((B,3,256,256), 0.1)
        def body(i, c):
            s = _build_stack(x * (1+1e-6*c), 4)
            return c + sum(l.mean() for l in s)
        return jax.lax.fori_loop(0, k, body, 0.0)
    return fn

def downsample_only(k):
    def fn():
        x = jnp.full((B,3,256,256), 0.1)
        def body(i, c):
            return c + bilinear_downsample(x * (1+1e-6*c), 2).mean()
        return jax.lax.fori_loop(0, k, body, 0.0)
    return fn

print('sim encoder (incl 256->128 downsample):', timed_chain(enc_sim), 'ms')
print('flow encoder @128:', timed_chain(enc_flow), 'ms')
print('mipmap_warp 3ch 256->128:', timed_chain(mm_warp), 'ms')
print('grid_sample 12ch 256->128:', timed_chain(gs_only), 'ms')
print('stack build 4 lvls @256:', timed_chain(stack_only), 'ms')
print('bilinear_downsample 256->128:', timed_chain(downsample_only), 'ms')
