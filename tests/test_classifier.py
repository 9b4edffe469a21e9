"""Cluster classifier: forward/assign/flip helpers + a CE training step."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gangealing_tpu.models.classifier import (
    ClassifierConfig, classifier_init, classifier_forward, classifier_assign,
    classifier_run_flip, classifier_run_flip_target,
    classifier_run_flip_cartesian, reverse_topk_accuracy)
from gangealing_tpu.models.stn import ComposedSTNConfig, composed_stn_init
from gangealing_tpu.train.classifier_train import warm_start_from_stn

S = 64
CLS_CFG = ClassifierConfig(size=S, supersize=S, channel_multiplier=0.25,
                           num_heads=4, max_channels=32)  # K=2 clusters x 2


@pytest.mark.slow
def test_classifier_forward_and_helpers(rng):
    params = classifier_init(jax.random.PRNGKey(0), CLS_CFG)
    x = jnp.asarray(rng.randn(3, 3, S, S).astype(np.float32))
    logits = classifier_forward(params, CLS_CFG, x)
    assert logits.shape == (3, 4)
    classes = classifier_assign(params, CLS_CFG, x)
    assert classes.shape == (3,)
    classes_nf = classifier_assign(params, CLS_CFG, x, ignore_flips=True)
    assert int(classes_nf.max()) < 2

    flipped, preds, cls, flip = classifier_run_flip(params, CLS_CFG, x)
    assert flipped.shape == x.shape and flip.shape == (3,)

    f2, flip2 = classifier_run_flip_target(params, CLS_CFG, x, 1)
    assert f2.shape == x.shape

    xr, wp = classifier_run_flip_cartesian(params, CLS_CFG, x)
    assert xr.shape == (6, 3, S, S)
    assert wp.shape == (6, 2)


def test_classifier_supersize_downsample(rng):
    cfg = ClassifierConfig(size=S, supersize=2 * S, channel_multiplier=0.25,
                           num_heads=2, max_channels=32)
    params = classifier_init(jax.random.PRNGKey(0), cfg)
    x = jnp.asarray(rng.randn(2, 3, 2 * S, 2 * S).astype(np.float32))
    assert classifier_forward(params, cfg, x).shape == (2, 2)


def test_warm_start_from_stn():
    t_cfg = ComposedSTNConfig(transforms=("similarity", "flow"), flow_size=S,
                              supersize=S, channel_multiplier=0.25,
                              flow_downsample=4, max_channels=32)
    t_params = composed_stn_init(jax.random.PRNGKey(0), t_cfg)
    cls_params = classifier_init(jax.random.PRNGKey(1), CLS_CFG)
    warm = warm_start_from_stn(cls_params, t_params)
    # encoder conv weights copied from the similarity stage
    k = "convs.0.0.weight"
    np.testing.assert_allclose(np.asarray(warm[k]),
                               np.asarray(t_params["stns.0." + k]))
    # classifier head remains its own init
    np.testing.assert_allclose(np.asarray(warm["to_logits.weight"]),
                               np.asarray(cls_params["to_logits.weight"]))


def test_reverse_topk():
    distances = jnp.asarray([[0.1, 0.5, 0.9], [0.9, 0.1, 0.5]])
    logits = jnp.asarray([[10.0, 0.0, 0.0], [0.0, 0.0, 10.0]])
    assert float(reverse_topk_accuracy(distances, logits, k=1)) == 0.5
    assert float(reverse_topk_accuracy(distances, logits, k=2)) == 1.0


@pytest.mark.slow
def test_classifier_training_step(rng):
    from gangealing_tpu.models.stylegan2 import (
        GeneratorConfig, generator_init)
    from gangealing_tpu.models.latent_learner import (
        LatentLearnerConfig, latent_learner_init)
    from gangealing_tpu.train.state import TrainConfig
    from gangealing_tpu.train.classifier_train import train_cluster_classifier

    g_cfg = GeneratorConfig(size=S, style_dim=32, n_mlp=2,
                            channel_multiplier=1, max_channels=32)
    t_cfg = ComposedSTNConfig(transforms=("similarity", "flow"), flow_size=S,
                              supersize=S, channel_multiplier=0.25,
                              flow_downsample=4, max_channels=32, num_heads=2)
    ll_cfg = LatentLearnerConfig(n_comps=2, inject_index=3,
                                 n_latent=g_cfg.n_latent, num_heads=2,
                                 style_dim=32)
    cfg = TrainConfig(g=g_cfg, t=t_cfg, ll=ll_cfg, batch=4, flips=True)
    cls_cfg = ClassifierConfig(size=S, supersize=S, channel_multiplier=0.25,
                               num_heads=4, max_channels=32)
    g_params = generator_init(jax.random.PRNGKey(0), g_cfg)
    t_params = composed_stn_init(jax.random.PRNGKey(1), t_cfg)
    ll_params = latent_learner_init(jax.random.PRNGKey(2), ll_cfg)
    cls_params = classifier_init(jax.random.PRNGKey(3), cls_cfg)
    cls_params = warm_start_from_stn(cls_params, t_params)

    def l2(p, x, y):
        return jnp.mean((x - y) ** 2, axis=(1, 2, 3), keepdims=True)

    new_params, _ = train_cluster_classifier(
        cfg, cls_cfg, g_params, t_params, ll_params, cls_params, None, l2,
        iters=2, progress=False)
    moved = sum(int(not np.allclose(np.asarray(cls_params[k]),
                                    np.asarray(new_params[k])))
                for k in cls_params)
    assert moved > 0
