"""Tests for the DirectionInterpolator equivalent + PCA + torch import."""

import numpy as np
import jax
import jax.numpy as jnp

from gangealing_tpu.models.latent_learner import (
    LatentLearnerConfig, latent_learner_init, latent_learner_interpolate,
    PCA, assign_pca_buffers, assign_coefficients)
from gangealing_tpu.io import import_state_dict


def test_interpolate_shapes_and_psi_semantics(rng):
    cfg = LatentLearnerConfig(n_comps=4, inject_index=5, n_latent=14,
                              num_heads=2, style_dim=16)
    params = latent_learner_init(jax.random.PRNGKey(0), cfg)
    w = jnp.asarray(rng.randn(3, 16).astype(np.float32))
    out = latent_learner_interpolate(params, cfg, w, psi=0.0)
    assert out.shape == (6, 14, 16)
    # psi=1: fully w everywhere
    out1 = latent_learner_interpolate(params, cfg, w, psi=1.0)
    w_rep = np.repeat(np.asarray(w), 2, axis=0)
    np.testing.assert_allclose(np.asarray(out1),
                               np.repeat(w_rep[:, None], 14, 1), atol=1e-5)
    # psi=0: first inject_index slots = learned target; rest = w
    target = np.asarray(params["lat_mean"]
                        + params["coefficients"] @ params["directions"])
    o0 = np.asarray(out)
    np.testing.assert_allclose(o0[0, :5], np.tile(target[0], (5, 1)), atol=1e-5)
    np.testing.assert_allclose(o0[1, :5], np.tile(target[1], (5, 1)), atol=1e-5)
    np.testing.assert_allclose(o0[0, 5:], np.tile(w_rep[0], (9, 1)), atol=1e-5)
    # unfold reshapes to (N, K, n_latent, D)
    ou = latent_learner_interpolate(params, cfg, w, psi=0.5, unfold=True)
    assert ou.shape == (3, 2, 14, 16)


def test_pca_assign(rng):
    cfg = LatentLearnerConfig(n_comps=3, inject_index=2, n_latent=8,
                              num_heads=1, style_dim=8)
    params = latent_learner_init(jax.random.PRNGKey(0), cfg)
    w = rng.randn(100, 8).astype(np.float32)
    pca = PCA(3, w)
    params = assign_pca_buffers(params, pca)
    assert params["directions"].shape == (3, 8)
    assert params["lat_mean"].shape == (1, 8)
    coeffs = pca.encode(w[:1])
    params = assign_coefficients(params, coeffs)
    # reconstruction: mean + coeff @ components approximates the sample
    recon = np.asarray(params["lat_mean"]
                       + params["coefficients"] @ params["directions"])
    err = np.linalg.norm(recon - w[:1]) / np.linalg.norm(w[:1])
    assert err < 1.0  # 3 comps of an 8-dim random cloud: partial recon


def test_torch_state_dict_import(rng):
    import torch
    sd = {
        "coefficients": torch.randn(2, 4),
        "directions": torch.randn(4, 16),
        "lat_mean": torch.randn(1, 16),
    }
    imported = import_state_dict(sd)
    assert set(imported) == {"coefficients", "directions", "lat_mean"}
    cfg = LatentLearnerConfig(n_comps=4, inject_index=3, n_latent=8,
                              num_heads=2, style_dim=16)
    params = {k: jnp.asarray(v) for k, v in imported.items()}
    w = jnp.asarray(rng.randn(2, 16).astype(np.float32))
    out = latent_learner_interpolate(params, cfg, w, psi=0.3)
    assert out.shape == (4, 8, 16)


def test_import_filters_buffers():
    import torch
    sd = {
        "warp_head.linear.weight": torch.zeros(4, 8),
        "warp_head.one_hot": torch.zeros(1, 1, 1, 3),
        "warp_head.warper.blur_filter": torch.zeros(1, 1, 4, 4),
        "input_downsample.kernel_horz": torch.zeros(3, 1, 1, 4),
        "convs.1.conv2.0.kernel": torch.zeros(4, 4),
        "convs.1.skip.0.kernel": torch.zeros(4, 4),
    }
    imported = import_state_dict(sd)
    assert set(imported) == {"warp_head.linear.weight"}
