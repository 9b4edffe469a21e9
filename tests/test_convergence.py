"""End-to-end LEARNING test: a similarity STN trained from scratch actually
learns to undo random affine jitter.

Every other training test checks mechanics (losses finite, params update,
schedules follow formulas). This one checks the thing the framework exists
for: gradient flow through the mipmap-warp sampling kernels + encoder +
warp head is informative enough for Adam to drive alignment. Setup mirrors
congealing with a known ground truth: a fixed base image is jittered by
random similarity transforms; the STN must warp each jittered copy back to
the base (the "aligned mode"). Capability reference: train.py:31-171
(training loop), spatial_transformer.py:388-615 (similarity STN).
"""

import math

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from gangealing_tpu.models.stn import (
    STNConfig, stn_init, stn_forward)
from gangealing_tpu.ops.grid_sample import grid_sample, identity_grid


def _base_image(size):
    """Smooth structured image in [-1, 1] (sum of low-frequency waves)."""
    y, x = np.mgrid[0:size, 0:size] / size
    img = np.stack([
        np.sin(2 * math.pi * (2 * x + y)),
        np.cos(2 * math.pi * (x - 2 * y)),
        np.sin(2 * math.pi * (3 * x * y + x)),
    ], axis=0)
    return jnp.asarray(img[None].astype(np.float32))


def _jitter(key, base, n):
    """Warp the base image by n random similarity transforms."""
    k1, k2, k3 = jax.random.split(key, 3)
    rot = jax.random.uniform(k1, (n,), minval=-0.3, maxval=0.3)
    scale = jnp.exp(jax.random.uniform(k2, (n,), minval=-0.15, maxval=0.15))
    shift = jax.random.uniform(k3, (n, 2), minval=-0.15, maxval=0.15)
    cos, sin = jnp.cos(rot) * scale, jnp.sin(rot) * scale
    mat = jnp.stack([
        jnp.stack([cos, -sin, shift[:, 0]], axis=1),
        jnp.stack([sin, cos, shift[:, 1]], axis=1),
    ], axis=1)  # (n, 2, 3)
    size = base.shape[-1]
    grid = identity_grid(n, size, size)
    ones = jnp.ones(grid.shape[:-1] + (1,))
    g3 = jnp.concatenate([grid, ones], axis=-1)  # (n, H, W, 3)
    warped_grid = jnp.einsum("nij,nhwj->nhwi", mat, g3)
    return grid_sample(jnp.tile(base, (n, 1, 1, 1)), warped_grid,
                       padding_mode="border")


@pytest.mark.slow
def test_similarity_stn_learns_to_align():
    size, batch, steps = 32, 8, 120
    cfg = STNConfig(transform="similarity", flow_size=size, supersize=size,
                    channel_multiplier=0.25, max_channels=64)
    base = _base_image(size)
    params = stn_init(jax.random.PRNGKey(0), cfg)
    opt = optax.adam(2e-3)
    opt_state = opt.init(params)

    def loss_fn(p, imgs):
        out, _, _, _ = stn_forward(p, cfg, imgs, padding_mode="border")
        return jnp.mean((out - base) ** 2)

    @jax.jit
    def step(p, s, key):
        imgs = _jitter(key, base, batch)
        l, g = jax.value_and_grad(loss_fn)(p, imgs)
        updates, s = opt.update(g, s)
        p = optax.apply_updates(p, updates)
        return p, s, l

    losses = []
    for i in range(steps):
        params, opt_state, l = step(params, opt_state,
                                    jax.random.PRNGKey(100 + i))
        losses.append(float(l))

    first = np.mean(losses[:10])
    last = np.mean(losses[-10:])
    # identity-init STN starts at the raw jitter error; training must
    # recover most of it
    assert np.isfinite(last)
    assert last < 0.35 * first, (first, last, losses[::20])

    # and the learned warp must generalize to UNSEEN jitters
    test_imgs = _jitter(jax.random.PRNGKey(9999), base, batch)
    aligned = stn_forward(params, cfg, test_imgs, padding_mode="border")[0]
    err_after = float(jnp.mean((aligned - base) ** 2))
    err_before = float(jnp.mean((test_imgs - base) ** 2))
    assert err_after < 0.5 * err_before, (err_before, err_after)
