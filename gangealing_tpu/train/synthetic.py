"""Synthetic full-system GANgealing demo: a fixed differentiable
"generator" with alignable structure, so joint latent-learner + ComposedSTN
training can be demonstrated (and asserted) end-to-end without a
pre-trained StyleGAN2.

The reference demonstrates the full system only through real GAN training
(train.py:102-135); a random G carries no alignable structure, so this
module provides the missing testable analogue:

  * ``make_template``: a structured, orientation-asymmetric RGB template.
  * ``synthetic_generator``: maps a W-space latent to the template warped
    by a similarity transform + smooth elastic flow read linearly off the
    latent — differentiable through our own warp ops, so gradients reach
    the latent learner exactly as they do through a real G
    (latent_learner.py:61-67 capability).
  * ``make_synthetic_pair_sampler``: plugs into the REAL loss/step
    machinery (train/losses.py pair_sampler hook): unaligned = G_syn(z),
    target = G_syn(ll(z, psi)) — the GAN-supervised pair protocol of
    loss.py:21-29 with G_syn in place of StyleGAN2.
  * ``run_synthetic_congealing``: the demo loop — psi annealing, the real
    jitted train step (Adam x2 + EMA), loss curve, and congealed-variance
    collapse measurement. K>1 exercises gangealing_cluster_loss (the
    min-over-heads assignment, loss.py:78-92) with multi-modal data.
"""

from dataclasses import dataclass
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from gangealing_tpu.models.stn import (
    ComposedSTNConfig, composed_stn_init, composed_stn_forward)
from gangealing_tpu.models.latent_learner import (
    LatentLearnerConfig, latent_learner_init, latent_learner_interpolate)
from gangealing_tpu.ops.grid_sample import grid_sample, affine_grid
from gangealing_tpu.ops.resample import interpolate_bilinear
from gangealing_tpu.train.state import (
    TrainConfig, init_train_state, make_train_step)
from gangealing_tpu.train.annealing import psi_at_iter


# latent layout: [rot, log_scale, tx, ty, elastic(2*4*4=32), mode...]
N_POSE = 4
ELASTIC_GRID = 4
N_ELASTIC = 2 * ELASTIC_GRID * ELASTIC_GRID
STYLE_DIM = N_POSE + N_ELASTIC + 1  # +1 mode channel for K=2 demos


def make_template(size: int, mode: int = 0) -> jnp.ndarray:
    """A structured, orientation-asymmetric (3, size, size) template in
    [-1, 1]. mode selects visually distinct variants for cluster demos."""
    y, x = np.meshgrid(np.linspace(-1, 1, size), np.linspace(-1, 1, size),
                       indexing="ij")
    r = np.sqrt(x ** 2 + y ** 2)
    img = np.zeros((3, size, size), np.float32)
    if mode == 0:
        img[0] = np.cos(6 * r) * (r < 0.8)
        img[1] = ((x + y) > 0) * (r < 0.6) * 0.8
        img[2] = np.exp(-((x - 0.3) ** 2 + (y + 0.2) ** 2) / 0.02)
        img[0] += np.exp(-((x + 0.4) ** 2 + y ** 2) / 0.01)  # off-center dot
    else:
        img[2] = np.cos(4 * (x + 1.3 * y)) * (np.abs(x) < 0.7)
        img[0] = (np.abs(x - 0.2) + np.abs(y) < 0.5) * 0.9
        img[1] = np.exp(-((x + 0.3) ** 2 + (y - 0.35) ** 2) / 0.02)
    return jnp.asarray(np.clip(img, -1, 1))


def synthetic_warp_grid(w, size: int, pose_scale=0.35, elastic_scale=0.08):
    """The (N, S, S, 2) sampling grid G_syn uses: maps OUTPUT pixel coords
    to template coords (grid_sample semantics). Exposed separately so
    ground-truth correspondences can be derived by inverting it
    (benchmarks/tpu_numerics.py)."""
    N = w.shape[0]
    rot = w[:, 0] * pose_scale
    scale = jnp.exp(w[:, 1] * pose_scale * 0.6)
    tx = w[:, 2] * pose_scale * 0.6
    ty = w[:, 3] * pose_scale * 0.6
    cos, sin = jnp.cos(rot), jnp.sin(rot)
    theta = jnp.stack([
        jnp.stack([scale * cos, -scale * sin, tx], -1),
        jnp.stack([scale * sin, scale * cos, ty], -1)], 1)  # (N, 2, 3)
    grid = affine_grid(theta, (N, 3, size, size))  # (N, S, S, 2)
    el = w[:, N_POSE:N_POSE + N_ELASTIC].reshape(
        N * 2, 1, ELASTIC_GRID, ELASTIC_GRID)
    el = interpolate_bilinear(el, size, size).reshape(N, 2, size, size)
    return grid + elastic_scale * el.transpose(0, 2, 3, 1)


def synthetic_generator(templates, w, size: int, pose_scale=0.35,
                        elastic_scale=0.08):
    """Differentiable G_syn: (N, STYLE_DIM) W latents -> (N, 3, S, S).

    Pose (rot/log-scale/translation) and a smooth elastic flow are linear
    readouts of the latent; for multi-template sets the rendered image is
    a soft (sigmoid) blend over templates driven by the mode channel, so
    cluster identity is itself a differentiable function of w."""
    N = w.shape[0]
    grid = synthetic_warp_grid(w, size, pose_scale, elastic_scale)

    K = len(templates)
    outs = []
    for t in templates:
        img = jnp.tile(t[None], (N, 1, 1, 1))
        outs.append(grid_sample(img, grid, padding_mode="border"))
    if K == 1:
        return outs[0]
    # soft mode blend (2 templates): mode channel drives the mixture
    gate = jax.nn.sigmoid(w[:, N_POSE + N_ELASTIC] * 4.0)
    gate = gate.reshape(N, 1, 1, 1)
    return (1 - gate) * outs[0] + gate * outs[1]


def make_synthetic_pair_sampler(templates, ll_cfg: LatentLearnerConfig,
                                size: int, freeze_ll=False, **render_kwargs):
    """pair_sampler for train/losses.py: unaligned = G_syn(z),
    target = G_syn(ll(z, psi)) — K targets per sample in the latent
    learner's k-fastest layout (matching the cartesian STN)."""
    def sampler(ll_params, key, psi, batch, z):
        if z is None:
            z = jax.random.normal(key, (batch, STYLE_DIM))
        unaligned = synthetic_generator(templates, z, size, **render_kwargs)
        ll_p = (jax.tree.map(jax.lax.stop_gradient, ll_params)
                if freeze_ll else ll_params)
        wplus = latent_learner_interpolate(ll_p, ll_cfg, z, psi)
        target = synthetic_generator(templates, wplus[:, 0, :], size,
                                     **render_kwargs)
        return unaligned, target
    return sampler


def l2_perceptual_fn(_params, x, y):
    """Per-sample mean-squared distance in the perceptual_fn interface
    ((N,1,1,1), like LPIPS's per-sample output)."""
    d = jnp.mean((x - y) ** 2, axis=(1, 2, 3))
    return d.reshape(-1, 1, 1, 1)


@dataclass
class SyntheticDemoResult:
    losses: np.ndarray            # (iters,) perceptual loss curve
    var_before: float             # mean per-pixel variance, congealed @init
    var_after: float              # ... after training (t_ema)
    state: dict
    t_cfg: ComposedSTNConfig
    ll_cfg: LatentLearnerConfig


def run_synthetic_congealing(iters=150, size=64, batch=16, num_heads=1,
                             seed=0, stn_lr=1e-3, ll_lr=5e-3,
                             tv_weight=100.0, flow_identity_weight=1.0,
                             anneal_frac=0.3, channel_multiplier=0.25,
                             eval_n=32, progress=False) -> SyntheticDemoResult:
    """Joint ll + ComposedSTN training on the synthetic generator through
    the REAL train step (train/state.py). Returns the loss curve and the
    congealed-variance collapse (aligned outputs should become nearly
    identical across samples as the system learns)."""
    key = jax.random.PRNGKey(seed)
    templates = [make_template(size, m) for m in range(num_heads)] \
        if num_heads > 1 else [make_template(size, 0)]

    t_cfg = ComposedSTNConfig(transforms=("similarity", "flow"),
                              flow_size=size, supersize=size,
                              channel_multiplier=channel_multiplier,
                              flow_downsample=4, max_channels=64,
                              num_heads=num_heads)
    ll_cfg = LatentLearnerConfig(n_comps=N_POSE + 1, inject_index=1,
                                 n_latent=2, num_heads=num_heads,
                                 style_dim=STYLE_DIM)
    t_params = composed_stn_init(jax.random.PRNGKey(seed + 1), t_cfg)
    ll_params = latent_learner_init(jax.random.PRNGKey(seed + 2), ll_cfg)
    # directions: the pose dims + the mode dim are learnable directions
    dirs = np.zeros((N_POSE + 1, STYLE_DIM), np.float32)
    dirs[:N_POSE, :N_POSE] = np.eye(N_POSE)
    dirs[N_POSE, N_POSE + N_ELASTIC] = 1.0  # mode channel
    ll_params["directions"] = jnp.asarray(dirs)
    ll_params["lat_mean"] = jnp.zeros((1, STYLE_DIM))
    if num_heads > 1:
        # kmeans++-style init (train.py:236-243 capability): place each
        # head's coefficients in a distinct mode of the data
        coef = np.zeros((num_heads, N_POSE + 1), np.float32)
        coef[0, N_POSE] = -1.5
        coef[1, N_POSE] = 1.5
        ll_params["coefficients"] = jnp.asarray(coef)

    cfg = TrainConfig(g=None, t=t_cfg, ll=ll_cfg, batch=batch,
                      stn_lr=stn_lr, ll_lr=ll_lr, tv_weight=tv_weight,
                      flow_identity_weight=flow_identity_weight,
                      anneal_psi=max(1, int(iters * anneal_frac)),
                      padding_mode="border", loss_fn="vgg_ssl")
    sampler = make_synthetic_pair_sampler(templates, ll_cfg, size)
    step = make_train_step(cfg, None, None, l2_perceptual_fn, donate=False,
                           pair_sampler=sampler)
    state = init_train_state(t_params, ll_params)

    eval_z = jax.random.normal(jax.random.fold_in(key, 777),
                               (eval_n, STYLE_DIM))
    eval_imgs = synthetic_generator(templates, eval_z, size)

    def congealed_variance(t_p):
        out, _, _, _, _ = composed_stn_forward(
            t_p, t_cfg, eval_imgs, padding_mode="border",
            warp_policy="cartesian")
        if num_heads > 1:
            # per-sample best head: smallest distance to that head's own
            # congealed mean (proxy for the training assignment)
            out = out.reshape(eval_n, num_heads, *out.shape[1:])
            means = out.mean(axis=0, keepdims=True)
            d = jnp.mean((out - means) ** 2, axis=(2, 3, 4))
            pick = jnp.argmin(d, axis=1)
            out = jnp.take_along_axis(
                out, pick[:, None, None, None, None], axis=1)[:, 0]
        return float(jnp.var(out, axis=0).mean())

    var_before = congealed_variance(state["t_ema"])

    losses = []
    for i in range(1, iters + 1):
        psi = psi_at_iter(i, cfg.anneal_psi, cfg.anneal_fn)
        zk = jax.random.fold_in(key, i)
        z = jax.random.normal(zk, (batch, STYLE_DIM))
        state, metrics = step(state, z, jax.random.fold_in(zk, 1),
                              jnp.float32(psi), jnp.float32(stn_lr),
                              jnp.float32(ll_lr))
        losses.append(float(metrics["p"]))
        if progress and i % 25 == 0:
            print(f"[{i}/{iters}] p={losses[-1]:.5f} psi={psi:.3f}",
                  flush=True)

    # use the live params: at demo length the EMA still lags its init
    var_after = congealed_variance(state["t"])
    return SyntheticDemoResult(np.asarray(losses), var_before, var_after,
                               state, t_cfg, ll_cfg)
