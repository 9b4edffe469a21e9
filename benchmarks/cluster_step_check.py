"""TPU compile+run smoke of the CLUSTER train step (num_heads=2, flips).

The cluster loss path (cartesian K-head warps, min over heads+flips,
assigned-head TV — reference loss.py:32-92) has CPU tests; this drives it
on the real chip. Usage:
PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/cluster_step_check.py
"""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp
from gangealing_tpu.models.stylegan2 import GeneratorConfig, generator_init
from gangealing_tpu.models.stn import ComposedSTNConfig, composed_stn_init
from gangealing_tpu.models.latent_learner import LatentLearnerConfig, latent_learner_init
from gangealing_tpu.models.lpips import vgg16_init, lpips_distance
from gangealing_tpu.train.state import TrainConfig, init_train_state, make_train_step

g_cfg = GeneratorConfig(size=128, style_dim=128, n_mlp=2, channel_multiplier=1, max_channels=128)
t_cfg = ComposedSTNConfig(transforms=("similarity", "flow"), flow_size=128,
                          supersize=128, channel_multiplier=0.25,
                          max_channels=128, num_heads=2)
ll_cfg = LatentLearnerConfig(n_comps=4, inject_index=4, n_latent=g_cfg.n_latent,
                             num_heads=2, style_dim=128)
cfg = TrainConfig(g=g_cfg, t=t_cfg, ll=ll_cfg, batch=8, tv_weight=1000.0,
                  flow_identity_weight=1.0, anneal_psi=100, period=50,
                  loss_fn="vgg_ssl", flips=True)
g_params = generator_init(jax.random.PRNGKey(0), g_cfg)
t_params = composed_stn_init(jax.random.PRNGKey(1), t_cfg)
ll_params = latent_learner_init(jax.random.PRNGKey(2), ll_cfg)
vgg = vgg16_init(jax.random.PRNGKey(3))
def perceptual(p, x, y):
    return lpips_distance(p, x, y, use_lins=False) / 18.0
state = init_train_state(t_params, ll_params)
step = make_train_step(cfg, g_params, vgg, perceptual, donate=False)
z = jax.random.normal(jax.random.PRNGKey(4), (8, 128))
s2, m = step(state, z, jax.random.PRNGKey(5), jnp.float32(0.5),
             jnp.float32(1e-3), jnp.float32(1e-2))
p = float(m["p"])
assert np.isfinite(p)
print(f"cluster train step on TPU OK: p={p:.4f}")
