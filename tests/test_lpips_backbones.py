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


def test_squeezenet_matches_torch(rng):
    from gangealing_tpu.models.lpips_backbones import (
        squeezenet_features, import_torchvision_squeezenet, SQUEEZE_CHANNELS)

    class Fire(nn.Module):
        def __init__(self, cin, s, e):
            super().__init__()
            self.squeeze = nn.Conv2d(cin, s, 1)
            self.squeeze_activation = nn.ReLU()
            self.expand1x1 = nn.Conv2d(s, e, 1)
            self.expand1x1_activation = nn.ReLU()
            self.expand3x3 = nn.Conv2d(s, e, 3, padding=1)
            self.expand3x3_activation = nn.ReLU()

        def forward(self, x):
            x = self.squeeze_activation(self.squeeze(x))
            return torch.cat([
                self.expand1x1_activation(self.expand1x1(x)),
                self.expand3x3_activation(self.expand3x3(x))], 1)

    torch.manual_seed(0)
    feats = nn.Sequential(
        nn.Conv2d(3, 64, 3, 2), nn.ReLU(), nn.MaxPool2d(3, 2),
        Fire(64, 16, 64), Fire(128, 16, 64), nn.MaxPool2d(3, 2),
        Fire(128, 32, 128), Fire(256, 32, 128), nn.MaxPool2d(3, 2),
        Fire(256, 48, 192), Fire(384, 48, 192), Fire(384, 64, 256),
        Fire(512, 64, 256)).eval()
    sd = {f"features.{k}": v for k, v in feats.state_dict().items()}
    params = import_torchvision_squeezenet(sd)
    x = rng.randn(1, 3, 128, 128).astype(np.float32)
    ours = squeezenet_features(params, jnp.asarray(x))
    with torch.no_grad():
        h = torch.from_numpy(x)
        theirs = []
        for i, l in enumerate(feats):
            h = l(h)
            if i in {1, 4, 7, 9, 10, 11, 12}:
                theirs.append(h.numpy())
    assert [o.shape[1] for o in ours] == SQUEEZE_CHANNELS
    for o, t in zip(ours, theirs):
        np.testing.assert_allclose(np.asarray(o), t, atol=2e-4, rtol=2e-4)
