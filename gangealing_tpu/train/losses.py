"""GANgealing training losses (GAN-supervised pair sampling + perceptual
reconstruction, unimodal and clustered).

Capability reference: models/losses/loss.py:21-92. Functional: the generator,
STN, latent learner and perceptual net are all (params, cfg) pairs; RNG is an
explicit key. Fresh noise per generator pass is intentional (loss.py:66-68).
"""

from typing import Callable

import jax
import jax.numpy as jnp

from gangealing_tpu.models.stylegan2 import generator_apply
from gangealing_tpu.models.latent_learner import latent_learner_interpolate
from gangealing_tpu.models.stn import composed_stn_forward
from gangealing_tpu.ops.resample import bilinear_downsample


def resize_fake2stn(x, gen_size, flow_size):
    if gen_size > flow_size:
        return bilinear_downsample(x, gen_size // flow_size)
    return x


def sample_gan_supervised_pairs(g_params, g_cfg, ll_params, ll_cfg, key, psi,
                                batch, flow_size, freeze_ll=False, z=None,
                                compute_dtype=None):
    """(unaligned, aligned_target) image pair from the frozen generator
    (loss.py:21-29). Gradients flow into ll through G unless freeze_ll."""
    import jax.numpy as _jnp
    cd = (_jnp.bfloat16 if compute_dtype == "bfloat16" else _jnp.float32)
    kz, k1, k2 = jax.random.split(key, 3)
    if z is None:
        z = jax.random.normal(kz, (batch, g_cfg.style_dim))
    unaligned, w = generator_apply(g_params, g_cfg, [z], key=k1,
                                   return_latents=True, compute_dtype=cd)
    ll_p = jax.tree.map(jax.lax.stop_gradient, ll_params) if freeze_ll \
        else ll_params
    w_aligned = latent_learner_interpolate(ll_p, ll_cfg, w[:, 0, :], psi)
    aligned, _ = generator_apply(g_params, g_cfg, [w_aligned],
                                 input_is_latent=True, key=k2,
                                 compute_dtype=cd)
    if freeze_ll:
        aligned = jax.lax.stop_gradient(aligned)
    aligned = resize_fake2stn(aligned, g_cfg.size, flow_size)
    return unaligned, aligned


def default_pair_sampler(g_params, g_cfg, ll_cfg, flow_size, freeze_ll=False,
                         compute_dtype=None):
    """The standard GAN-supervised pair source (loss.py:21-29) in the
    pluggable-sampler form: sampler(ll_params, key, psi, batch, z) ->
    (unaligned, aligned_target)."""
    def sampler(ll_params, key, psi, batch, z):
        return sample_gan_supervised_pairs(
            g_params, g_cfg, ll_params, ll_cfg, key, psi, batch, flow_size,
            freeze_ll=freeze_ll, z=z, compute_dtype=compute_dtype)
    return sampler


def gangealing_loss(g_params, g_cfg, t_params, t_cfg, ll_params, ll_cfg,
                    perceptual_fn: Callable, key, psi, batch,
                    freeze_ll=False, sample_from_full_res=False,
                    padding_mode="border", compute_dtype=None, z=None,
                    pair_sampler=None):
    """Unimodal reconstruction loss (loss.py:64-75).
    Returns (perceptual_loss_scalar, delta_flow).

    ``pair_sampler``: optional replacement for the GAN pair source — must
    map (ll_params, key, psi, batch, z) to (unaligned, target) at
    flow_size. Used by the synthetic full-system demo (train/synthetic.py)
    to exercise the exact loss/step machinery on a fixed differentiable
    generator."""
    if pair_sampler is None:
        pair_sampler = default_pair_sampler(
            g_params, g_cfg, ll_cfg, t_cfg.flow_size, freeze_ll=freeze_ll,
            compute_dtype=compute_dtype)
    unaligned, target = pair_sampler(ll_params, key, psi, batch, z)
    sampling_img = unaligned if sample_from_full_res else None
    gen_size = g_cfg.size if g_cfg is not None else t_cfg.flow_size
    resized = resize_fake2stn(unaligned, gen_size, t_cfg.flow_size)
    pred, _, delta_flow, _, _ = composed_stn_forward(
        t_params, t_cfg, resized, input_img_for_sampling=sampling_img,
        padding_mode=padding_mode,
        output_resolution=t_cfg.flow_size if sample_from_full_res else None)
    loss = jnp.mean(perceptual_fn(pred, target))
    return loss, delta_flow


def assign_fake_images_to_clusters(g_params, g_cfg, t_params, t_cfg,
                                   ll_params, ll_cfg, perceptual_fn, key, psi,
                                   batch, num_heads, flips,
                                   freeze_ll=False, sample_from_full_res=True,
                                   padding_mode="border", z=None,
                                   compute_dtype=None, pair_sampler=None):
    """Congeal fakes with every head (and flip), take min distance
    (loss.py:32-61). Returns (min_values, min_indices, aligned_pred,
    delta_flow, unaligned, resized_unaligned, distances)."""
    if pair_sampler is None:
        pair_sampler = default_pair_sampler(
            g_params, g_cfg, ll_cfg, t_cfg.flow_size, freeze_ll=freeze_ll,
            compute_dtype=compute_dtype)
    unaligned, target = pair_sampler(ll_params, key, psi, batch, z)
    if flips:
        unaligned = jnp.concatenate([unaligned, jnp.flip(unaligned, 3)], 0)
        target = jnp.tile(target, (2, 1, 1, 1))
        loss_size = (2, batch, num_heads)
    else:
        loss_size = (batch, num_heads)
    sampling_img = unaligned if sample_from_full_res else None
    gen_size = g_cfg.size if g_cfg is not None else t_cfg.flow_size
    resized = resize_fake2stn(unaligned, gen_size, t_cfg.flow_size)
    pred, _, delta_flow, _, _ = composed_stn_forward(
        t_params, t_cfg, resized, input_img_for_sampling=sampling_img,
        padding_mode=padding_mode,
        output_resolution=t_cfg.flow_size if sample_from_full_res else None)
    # The latent learner already emits K targets per sample (k-fastest
    # ordering), matching the STN's cartesian repeat_interleave layout.
    ploss = perceptual_fn(pred, target).reshape(*loss_size)
    if flips:
        distances = ploss.transpose(1, 0, 2).reshape(batch, 2 * num_heads)
    else:
        distances = ploss
    min_idx = jnp.argmin(distances, axis=1)
    min_val = jnp.take_along_axis(distances, min_idx[:, None], axis=1)[:, 0]
    return min_val, min_idx, pred, delta_flow, unaligned, resized, distances


def gangealing_cluster_loss(g_params, g_cfg, t_params, t_cfg, ll_params,
                            ll_cfg, perceptual_fn, key, psi, batch, num_heads,
                            flips, freeze_ll=False, sample_from_full_res=True,
                            padding_mode="border", compute_dtype=None,
                            z=None, pair_sampler=None):
    """Clustered loss: only the assigned head's residual flow is regularized
    (loss.py:78-92). Returns (loss, assigned_delta_flow)."""
    min_val, min_idx, _, delta_flow, _, _, _ = assign_fake_images_to_clusters(
        g_params, g_cfg, t_params, t_cfg, ll_params, ll_cfg, perceptual_fn,
        key, psi, batch, num_heads, flips, freeze_ll=freeze_ll,
        sample_from_full_res=sample_from_full_res, padding_mode=padding_mode,
        compute_dtype=compute_dtype, z=z, pair_sampler=pair_sampler)
    loss = jnp.mean(min_val)
    HW2 = delta_flow.shape[1:]
    if flips:
        df = delta_flow.reshape(2, batch, num_heads, *HW2)
        df = df.transpose(1, 0, 2, 3, 4, 5).reshape(batch, 2 * num_heads, *HW2)
    else:
        df = delta_flow.reshape(batch, num_heads, *HW2)
    assigned = jnp.take_along_axis(
        df, min_idx[:, None, None, None, None], axis=1)[:, 0]
    return loss, assigned
