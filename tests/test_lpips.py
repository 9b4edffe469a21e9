"""Golden test: our VGG16 slice stack vs a torch composition of the same
architecture (torchvision VGG16 `features` layout) with identical weights."""

import numpy as np
import pytest
import torch
import torch.nn as nn

import jax
import jax.numpy as jnp

from gangealing_tpu.models.lpips import (
    vgg16_features, import_torchvision_vgg, lpips_distance, vgg16_init,
    lpips_lins_init, make_perceptual_loss, PerceptualLossConfig)


def _build_torch_vgg16_features():
    """torchvision vgg16().features layout: conv indices 0,2,5,7,10,12,14,
    17,19,21,24,26,28 with maxpools at 4,9,16,23,30."""
    cfg = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
           512, 512, 512, "M", 512, 512, 512, "M"]
    layers = []
    in_ch = 3
    for v in cfg:
        if v == "M":
            layers.append(nn.MaxPool2d(2, 2))
        else:
            layers.append(nn.Conv2d(in_ch, v, 3, padding=1))
            layers.append(nn.ReLU(inplace=False))
            in_ch = v
    return nn.Sequential(*layers)


@pytest.fixture(scope="module")
def tv_features():
    torch.manual_seed(0)
    return _build_torch_vgg16_features().eval()


def test_vgg_features_match_torch(rng, tv_features):
    # state dict has bare '0.weight' style keys -> exercises that import path
    params = import_torchvision_vgg(tv_features.state_dict())
    x = rng.randn(1, 3, 64, 64).astype(np.float32)
    ours = vgg16_features(params, jnp.asarray(x))

    with torch.no_grad():
        h = torch.from_numpy(x)
        feats = []
        ends = {3, 8, 15, 22, 29}
        for i, layer in enumerate(tv_features):
            h = layer(h)
            if i in ends:
                feats.append(h.numpy())
    assert len(ours) == len(feats) == 5
    for o, t in zip(ours, feats):
        np.testing.assert_allclose(np.asarray(o), t, atol=1e-3, rtol=1e-3)


def test_lpips_distance_properties(rng, tv_features):
    params = import_torchvision_vgg(tv_features.state_dict())
    params.update(lpips_lins_init(jax.random.PRNGKey(0)))
    x = jnp.asarray(rng.randn(4, 3, 64, 64).astype(np.float32)).clip(-1, 1)
    y = jnp.asarray(rng.randn(4, 3, 64, 64).astype(np.float32)).clip(-1, 1)
    d_xy = lpips_distance(params, x, y)
    d_xx = lpips_distance(params, x, x)
    assert d_xy.shape == (4, 1, 1, 1)
    assert float(jnp.max(jnp.abs(d_xx))) < 1e-5  # self-distance is zero
    assert float(jnp.min(d_xy)) > 0

    loss_fn = make_perceptual_loss(PerceptualLossConfig(kind="vgg_ssl"))
    d_ssl = loss_fn(params, x, y)
    assert d_ssl.shape == (4, 1, 1, 1)


@pytest.mark.slow
def test_vgg_rand_init_runs():
    params = vgg16_init(jax.random.PRNGKey(0))
    x = jnp.zeros((1, 3, 32, 32))
    feats = vgg16_features(params, x)
    assert [f.shape[1] for f in feats] == [64, 128, 256, 512, 512]
    assert feats[-1].shape[-1] == 2  # 32 / 2^4
