"""Mini end-to-end training demo: verify training mechanics on-chip.

Note: with a RANDOM generator the samples carry no alignable structure, so
the perceptual loss only drifts down slightly; real descent needs a trained
StyleGAN2 checkpoint (see cli/train.py). With anneal_psi > 0 the loss first
RISES as psi->0 makes the task harder — that is the expected GANgealing
schedule (reference train.py:91-96).

Small G + STN + random-VGG perceptual on one chip; prints the loss curve.
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from gangealing_tpu.models.stylegan2 import GeneratorConfig, generator_init
from gangealing_tpu.models.stn import ComposedSTNConfig, composed_stn_init
from gangealing_tpu.models.latent_learner import (
    LatentLearnerConfig, latent_learner_init)
from gangealing_tpu.models.lpips import vgg16_init, lpips_distance
from gangealing_tpu.train.state import (
    TrainConfig, init_train_state, make_train_step)
from gangealing_tpu.train.loop import cold_start_ll
from gangealing_tpu.train.annealing import psi_at_iter, lr_at_iter

ITERS = int(sys.argv[1]) if len(sys.argv) > 1 else 300

g_cfg = GeneratorConfig(size=128, style_dim=128, n_mlp=4, channel_multiplier=1,
                        max_channels=128)
t_cfg = ComposedSTNConfig(flow_size=128, supersize=128,
                          channel_multiplier=0.25, max_channels=128)
ll_cfg = LatentLearnerConfig(n_comps=4, inject_index=4,
                             n_latent=g_cfg.n_latent, style_dim=128)
ANNEAL = int(sys.argv[2]) if len(sys.argv) > 2 else 150
cfg = TrainConfig(g=g_cfg, t=t_cfg, ll=ll_cfg, batch=32, anneal_psi=ANNEAL,
                  period=100, tv_weight=1000.0, flow_identity_weight=1.0,
                  loss_fn="vgg_ssl", compute_dtype="bfloat16")

g_params = generator_init(jax.random.PRNGKey(0), g_cfg)
t_params = composed_stn_init(jax.random.PRNGKey(1), t_cfg)
ll_params = latent_learner_init(jax.random.PRNGKey(2), ll_cfg)
vgg = vgg16_init(jax.random.PRNGKey(3))
ll_params = cold_start_ll(ll_params, g_params, cfg, jax.random.PRNGKey(4),
                          debug=True)


def perceptual(p, x, y):
    return lpips_distance(p, x, y, use_lins=False,
                          compute_dtype=jnp.bfloat16) / 18.0


state = init_train_state(t_params, ll_params)
step = make_train_step(cfg, g_params, vgg, perceptual, donate=False)

t0 = time.time()
losses = []
for i in range(1, ITERS + 1):
    psi = psi_at_iter(i, cfg.anneal_psi)
    lr_t = lr_at_iter(i, cfg.stn_lr, cfg.anneal_psi, cfg.period)
    lr_ll = lr_at_iter(i, cfg.ll_lr, cfg.anneal_psi, cfg.period)
    z = jax.random.normal(jax.random.fold_in(jax.random.PRNGKey(5), i),
                          (cfg.batch, g_cfg.style_dim))
    state, m = step(state, z, jax.random.fold_in(jax.random.PRNGKey(6), i),
                    jnp.float32(psi), jnp.float32(lr_t), jnp.float32(lr_ll))
    if i % 25 == 0 or i == 1:
        p = float(m["p"])
        losses.append(p)
        print(f"iter {i:4d}: p={p:.5f} tv={float(m['tv']):.6f} psi={psi:.3f}",
              flush=True)
rate = ITERS * cfg.batch / (time.time() - t0)
print(f"throughput ~{rate:.0f} imgs/s (incl. compile)")
first, last = losses[0], np.mean(losses[-3:])
print(f"loss first={first:.5f} last3avg={last:.5f} "
      f"{'DECREASED' if last < first else 'NOT DECREASED'}")
