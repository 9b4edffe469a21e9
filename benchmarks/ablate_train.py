"""Ablate the training step's cost centers on TPU (full LSUN-Cats config)."""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from gangealing_tpu.models.stylegan2 import GeneratorConfig, generator_init, \
    generator_apply
from gangealing_tpu.models.stn import (
    ComposedSTNConfig, composed_stn_init, composed_stn_forward)
from gangealing_tpu.models.lpips import vgg16_init, lpips_distance
from gangealing_tpu.utils.profiling import timed_call

B = int(sys.argv[1]) if len(sys.argv) > 1 else 40
DTYPE = jnp.bfloat16 if (len(sys.argv) > 2 and sys.argv[2] == "bf16") \
    else jnp.float32

g_cfg = GeneratorConfig(size=256)
t_cfg = ComposedSTNConfig(flow_size=128, supersize=256,
                          channel_multiplier=0.5)
g_params = generator_init(jax.random.PRNGKey(0), g_cfg)
t_params = composed_stn_init(jax.random.PRNGKey(1), t_cfg)
vgg = vgg16_init(jax.random.PRNGKey(2))
z = jax.random.normal(jax.random.PRNGKey(3), (B, 512))
img256 = jax.random.normal(jax.random.PRNGKey(4), (B, 3, 256, 256))
img128 = jax.random.normal(jax.random.PRNGKey(5), (B, 3, 128, 128))
key = jax.random.PRNGKey(6)


def g_fwd(z):
    img, _ = generator_apply(g_params, g_cfg, [z], key=key,
                             compute_dtype=DTYPE)
    return img


def vgg_loss(a, b):
    return jnp.mean(lpips_distance(vgg, a, b, use_lins=False,
                                   compute_dtype=DTYPE))


def stn_fwd(x):
    out, _, df, _, _ = composed_stn_forward(t_params, t_cfg, x)
    return out.mean() + df.mean()


def stn_grad(x):
    def loss(tp):
        out, _, df, _, _ = composed_stn_forward(tp, t_cfg, x)
        return jnp.mean(out ** 2) + jnp.mean(df ** 2)
    g = jax.grad(loss)(t_params)
    return sum(jnp.sum(v) for v in g.values())


def vgg_grad(a, b):
    def loss(x):
        return vgg_loss(x, b)
    return jnp.sum(jax.grad(loss)(a))


def g_fwd_grad(z):
    # gradient w.r.t. an image-space perturbation through G (approximates the
    # cost of G's backward towards ll)
    def loss(zz):
        img, _ = generator_apply(g_params, g_cfg, [zz], key=key,
                                 compute_dtype=DTYPE)
        return jnp.mean(img ** 2)
    return jnp.sum(jax.grad(loss)(z))


print(f"batch={B} dtype={DTYPE.__name__}", flush=True)
for name, fn, args in [
    ("G fwd 256px", g_fwd, (z,)),
    ("G fwd+bwd", g_fwd_grad, (z,)),
    ("VGG loss fwd (128px x2)", vgg_loss, (img128, img128)),
    ("VGG loss fwd+bwd", vgg_grad, (img128, img128)),
    ("STN fwd (256->128)", stn_fwd, (img256,)),
    ("STN fwd+bwd", stn_grad, (img256,)),
]:
    dt = timed_call(fn, *args)
    print(f"{name:28s}: {dt * 1e3:8.2f} ms", flush=True)
