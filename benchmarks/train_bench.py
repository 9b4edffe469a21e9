"""Training-step throughput at the reference's LSUN-Cats configuration
(BASELINE config #5): full StyleGAN2 (256px, cm=2), STN (flow 128, cm=0.5),
vgg_ssl perceptual loss, global batch 40.

Run: python benchmarks/train_bench.py [batch]
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 40
    dtype = sys.argv[2] if len(sys.argv) > 2 else "float32"
    from gangealing_tpu.models.stylegan2 import (
        GeneratorConfig, generator_init)
    from gangealing_tpu.models.stn import (
        ComposedSTNConfig, composed_stn_init)
    from gangealing_tpu.models.latent_learner import (
        LatentLearnerConfig, latent_learner_init)
    from gangealing_tpu.models.lpips import vgg16_init, lpips_distance
    from gangealing_tpu.train.state import (
        TrainConfig, init_train_state, make_train_step)

    g_cfg = GeneratorConfig(size=256)
    t_cfg = ComposedSTNConfig(flow_size=128, supersize=256,
                              channel_multiplier=0.5)
    ll_cfg = LatentLearnerConfig(n_comps=1, inject_index=5,
                                 n_latent=g_cfg.n_latent)
    cfg = TrainConfig(g=g_cfg, t=t_cfg, ll=ll_cfg, batch=batch,
                      compute_dtype=dtype)

    print("init params ...", flush=True)
    g_params = generator_init(jax.random.PRNGKey(0), g_cfg)
    t_params = composed_stn_init(jax.random.PRNGKey(1), t_cfg)
    ll_params = latent_learner_init(jax.random.PRNGKey(2), ll_cfg)
    vgg = vgg16_init(jax.random.PRNGKey(3))

    pdtype = jnp.bfloat16 if dtype == "bfloat16" else jnp.float32

    def perceptual(p, x, y):
        return lpips_distance(p, x, y, use_lins=False,
                              compute_dtype=pdtype) / 18.0

    state = init_train_state(t_params, ll_params)
    step = make_train_step(cfg, g_params, vgg, perceptual, donate=False)
    z = jax.random.normal(jax.random.PRNGKey(4), (batch, g_cfg.style_dim))

    print("compiling train step ...", flush=True)
    t0 = time.time()
    state2, m = step(state, z, jax.random.PRNGKey(5), jnp.float32(0.9),
                     jnp.float32(1e-3), jnp.float32(1e-2))
    _ = float(m["p"])
    print(f"compile+first step: {time.time() - t0:.1f}s", flush=True)

    # timed: each call ends in a scalar transfer; subtract a null probe
    @jax.jit
    def null(state, z):
        return z[0, 0] + state["step"].astype(jnp.float32)

    def tmin(f, reps=5):
        ts = []
        for _ in range(reps):
            t0 = time.time()
            r = f()
            ts.append(time.time() - t0)
        return min(ts)

    _ = float(null(state, z))
    oh = tmin(lambda: float(null(state, z)))

    def one_step():
        s, m = step(state, z, jax.random.PRNGKey(6), jnp.float32(0.9),
                    jnp.float32(1e-3), jnp.float32(1e-2))
        return float(m["p"])

    _ = one_step()
    dt = max(tmin(one_step) - oh, 1e-6)
    print(f"train step [{dtype}]: {dt * 1e3:.1f} ms -> {batch / dt:.1f} "
          f"imgs/s (batch {batch})")


if __name__ == "__main__":
    main()
