import time, json
import numpy as np
import jax, jax.numpy as jnp
from gangealing_tpu.models.stn import ComposedSTNConfig, composed_stn_init, composed_stn_forward

batch = 40
rng = np.random.RandomState(0)
imgs = jnp.asarray(rng.randn(batch, 3, 256, 256).astype(np.float32))

def run(compute_dtype):
    cfg = ComposedSTNConfig(transforms=("similarity", "flow"), flow_size=128,
                            supersize=256, channel_multiplier=0.5,
                            compute_dtype=compute_dtype)
    params = composed_stn_init(jax.random.PRNGKey(0), cfg)

    @jax.jit
    def null(p, x):
        return x[0,0,0,0] + p["stns.0.warp_head.linear.bias"][0]

    @jax.jit
    def fwd(p, x):
        out, grid, fom, _, _ = composed_stn_forward(p, cfg, x)
        return out.mean() + grid.mean() + fom.mean()

    def timeit(f, reps=10):
        _ = float(f(params, imgs))
        return min(time.time() - (t0 := time.time()) + (time.time()-t0) or 1e9 for _ in [0]) if False else None

    def tmin(f, reps=10):
        _ = float(f(params, imgs))
        ts = []
        for _ in range(reps):
            t0 = time.time(); float(f(params, imgs)); ts.append(time.time()-t0)
        return min(ts)

    oh = tmin(null)
    dt = max(tmin(fwd) - oh, 1e-6)
    return batch / dt, (out_eq := None)

r32, _ = run("float32")
print(f'f32 : {r32:.0f} imgs/s')
rb, _ = run("bfloat16")
print(f'bf16: {rb:.0f} imgs/s')
# numeric drift check
cfg32 = ComposedSTNConfig(transforms=("similarity","flow"), flow_size=128, supersize=256, channel_multiplier=0.5)
cfgbf = ComposedSTNConfig(transforms=("similarity","flow"), flow_size=128, supersize=256, channel_multiplier=0.5, compute_dtype="bfloat16")
params = composed_stn_init(jax.random.PRNGKey(0), cfg32)
# nudge so warps are nontrivial
params = dict(params)
params["stns.0.warp_head.linear.bias"] = jnp.asarray([0.2, 0.1, 0.05, -0.08])
o32 = np.asarray(composed_stn_forward(params, cfg32, imgs[:4])[0])
obf = np.asarray(composed_stn_forward(params, cfgbf, imgs[:4])[0])
print('bf16 encoder output drift (maxabs):', np.abs(o32 - obf).max())
