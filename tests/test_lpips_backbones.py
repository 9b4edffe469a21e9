"""AlexNet LPIPS backbone golden test vs a torch composition."""

import numpy as np
import torch
import torch.nn as nn

import jax.numpy as jnp

from gangealing_tpu.models.lpips_backbones import (
    alexnet_features, import_torchvision_alexnet, alexnet_init,
    ALEX_CHANNELS)


def test_alexnet_matches_torch(rng):
    torch.manual_seed(0)
    feats = nn.Sequential(
        nn.Conv2d(3, 64, 11, 4, 2), nn.ReLU(), nn.MaxPool2d(3, 2),
        nn.Conv2d(64, 192, 5, padding=2), nn.ReLU(), nn.MaxPool2d(3, 2),
        nn.Conv2d(192, 384, 3, padding=1), nn.ReLU(),
        nn.Conv2d(384, 256, 3, padding=1), nn.ReLU(),
        nn.Conv2d(256, 256, 3, padding=1), nn.ReLU(),
        nn.MaxPool2d(3, 2)).eval()
    sd = {f"features.{k}": v for k, v in feats.state_dict().items()}
    params = import_torchvision_alexnet(sd)
    x = rng.randn(1, 3, 64, 64).astype(np.float32)
    ours = alexnet_features(params, jnp.asarray(x))
    with torch.no_grad():
        h = torch.from_numpy(x)
        theirs = []
        for i, l in enumerate(feats):
            h = l(h)
            if i in {1, 4, 7, 9, 11}:
                theirs.append(h.numpy())
    assert [o.shape[1] for o in ours] == ALEX_CHANNELS
    for o, t in zip(ours, theirs):
        np.testing.assert_allclose(np.asarray(o), t, atol=2e-4, rtol=2e-4)


def test_alexnet_init_runs():
    params = alexnet_init(jnp.asarray([0, 1], jnp.uint32))
    x = jnp.zeros((1, 3, 64, 64))
    outs = alexnet_features(params, x)
    assert [o.shape[1] for o in outs] == ALEX_CHANNELS
