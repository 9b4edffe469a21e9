"""Ablate the flagship forward congeal (current kernels) on TPU."""

import sys

import numpy as np
import jax
import jax.numpy as jnp

from gangealing_tpu.models.stn import (
    ComposedSTNConfig, composed_stn_init, composed_stn_forward, stn_features)
from gangealing_tpu.ops.mipmap import mipmap_warp, _build_stack
from gangealing_tpu.ops.grid_sample import grid_sample_auto, identity_grid
from gangealing_tpu.ops.resample import bilinear_downsample
from gangealing_tpu.utils.profiling import timed_call

B = int(sys.argv[1]) if len(sys.argv) > 1 else 40
cfg = ComposedSTNConfig(flow_size=128, supersize=256, channel_multiplier=0.5)
params = composed_stn_init(jax.random.PRNGKey(0), cfg)
sim_p = {k[7:]: v for k, v in params.items() if k.startswith("stns.0.")}
flow_p = {k[7:]: v for k, v in params.items() if k.startswith("stns.1.")}
sim_cfg, flow_cfg = cfg.stn_cfgs

x256 = jax.random.normal(jax.random.PRNGKey(1), (B, 3, 256, 256))
x128 = jax.random.normal(jax.random.PRNGKey(2), (B, 3, 128, 128))
grid = identity_grid(B, 128, 128) * 0.9

runs = [
    ("full composed fwd", lambda x: composed_stn_forward(
        params, cfg, x)[0].mean(), (x256,)),
    ("bilinear_downsample 256->128",
     lambda x: bilinear_downsample(x, 2).mean(), (x256,)),
    ("sim encoder @128", lambda x: stn_features(sim_p, sim_cfg, x).mean(),
     (x128,)),
    ("flow encoder @128", lambda x: stn_features(flow_p, flow_cfg, x).mean(),
     (x128,)),
    ("mipmap warp 256->128", lambda x: mipmap_warp(x, grid).mean(), (x256,)),
    ("stack build @256", lambda x: sum(l.mean() for l in _build_stack(x, 4)),
     (x256,)),
    ("mxu sample only (12ch)", lambda x: grid_sample_auto(
        jnp.tile(x, (1, 4, 1, 1)), grid).mean(), (x256,)),
]
for name, fn, args in runs:
    dt = timed_call(fn, *args)
    print(f"{name:30s}: {dt * 1e3:7.2f} ms", flush=True)
