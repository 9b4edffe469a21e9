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


# --- SqueezeNet 1.1 (lpips_backbones.py:6-54) -------------------------------
# torchvision squeezenet1_1.features layout:
#   0 conv(3,64,k3,s2) 1 relu 2 maxpool3s2 3 Fire 4 Fire 5 maxpool3s2
#   6 Fire 7 Fire 8 maxpool3s2 9 Fire 10 Fire 11 Fire 12 Fire
# LPIPS slices end after indices 1, 4, 7, 9, 10, 11, 12.

_FIRE_CFG = {  # idx -> (in, squeeze, expand)
    3: (64, 16, 64), 4: (128, 16, 64), 6: (128, 32, 128), 7: (256, 32, 128),
    9: (256, 48, 192), 10: (384, 48, 192), 11: (384, 64, 256),
    12: (512, 64, 256),
}
SQUEEZE_CHANNELS = [64, 128, 256, 384, 384, 512, 512]


def _fire(params, prefix, x):
    def c(name, x, padding=0):
        w = params[f"{prefix}.{name}.weight"]
        b = params[f"{prefix}.{name}.bias"]
        return conv2d(x, w, padding=padding) + b.reshape(1, -1, 1, 1)

    s = jax.nn.relu(c("squeeze", x))
    e1 = jax.nn.relu(c("expand1x1", s))
    e3 = jax.nn.relu(c("expand3x3", s, padding=1))
    return jnp.concatenate([e1, e3], axis=1)


def squeezenet_features(params: Params, x, prefix="net"):
    """Returns the 7 LPIPS slices of torchvision SqueezeNet 1.1 features."""
    def conv0(x):
        w = params[f"{prefix}.slice_all.0.weight"]
        b = params[f"{prefix}.slice_all.0.bias"]
        return conv2d(x, w, stride=2) + b.reshape(1, -1, 1, 1)

    outs = []
    h = jax.nn.relu(conv0(x))
    outs.append(h)                                   # relu1 (idx 1)
    h = _maxpool(h)
    h = _fire(params, f"{prefix}.slice_all.3", h)
    h = _fire(params, f"{prefix}.slice_all.4", h)
    outs.append(h)                                   # relu2 (idx 4)
    h = _maxpool(h)
    h = _fire(params, f"{prefix}.slice_all.6", h)
    h = _fire(params, f"{prefix}.slice_all.7", h)
    outs.append(h)                                   # relu3 (idx 7)
    h = _maxpool(h)
    h = _fire(params, f"{prefix}.slice_all.9", h)
    outs.append(h)                                   # relu4 (idx 9)
    h = _fire(params, f"{prefix}.slice_all.10", h)
    outs.append(h)                                   # relu5 (idx 10)
    h = _fire(params, f"{prefix}.slice_all.11", h)
    outs.append(h)                                   # relu6 (idx 11)
    h = _fire(params, f"{prefix}.slice_all.12", h)
    outs.append(h)                                   # relu7 (idx 12)
    return outs


def import_torchvision_squeezenet(state_dict) -> Params:
    out: Params = {}
    for k, v in state_dict.items():
        if hasattr(v, "detach"):
            v = v.detach().cpu().numpy()
        parts = k.split(".")
        if parts[0] == "features":
            out["net.slice_all." + ".".join(parts[1:])] = \
                jnp.asarray(np.asarray(v, np.float32))
    return out


# --- ResNet (lpips_backbones.py:143-185) -------------------------------------
# torchvision resnet18/34 (BasicBlock) and resnet50 (Bottleneck), eval-mode
# batchnorm. The reference's `resnet` wrapper exposes 5 slices:
# relu1 (post conv1+bn1+relu), conv2..conv5 (post layer1..layer4).
# NB: the reference defines this backbone but never wires it into the LPIPS
# chns dispatch (lpips.py:142-150) — it is a standalone feature extractor.

RESNET18_CHANNELS = [64, 64, 128, 256, 512]
_RESNET_LAYERS = {18: (2, 2, 2, 2), 34: (3, 4, 6, 3), 50: (3, 4, 6, 3)}


def _bn(params, prefix, x, eps=1e-5):
    g = params[f"{prefix}.weight"].reshape(1, -1, 1, 1)
    b = params[f"{prefix}.bias"].reshape(1, -1, 1, 1)
    m = params[f"{prefix}.running_mean"].reshape(1, -1, 1, 1)
    v = params[f"{prefix}.running_var"].reshape(1, -1, 1, 1)
    return (x - m) * jax.lax.rsqrt(v + eps) * g + b


def _convbn(params, prefix, bn_prefix, x, stride=1, padding=0):
    w = params[f"{prefix}.weight"]
    return _bn(params, bn_prefix, conv2d(x, w, stride=stride,
                                         padding=padding))


def _basic_block(params, prefix, x, stride):
    out = jax.nn.relu(_convbn(params, f"{prefix}.conv1", f"{prefix}.bn1", x,
                              stride=stride, padding=1))
    out = _convbn(params, f"{prefix}.conv2", f"{prefix}.bn2", out, padding=1)
    if f"{prefix}.downsample.0.weight" in params:
        x = _convbn(params, f"{prefix}.downsample.0",
                    f"{prefix}.downsample.1", x, stride=stride)
    return jax.nn.relu(out + x)


def _bottleneck(params, prefix, x, stride):
    out = jax.nn.relu(_convbn(params, f"{prefix}.conv1", f"{prefix}.bn1", x))
    out = jax.nn.relu(_convbn(params, f"{prefix}.conv2", f"{prefix}.bn2",
                              out, stride=stride, padding=1))
    out = _convbn(params, f"{prefix}.conv3", f"{prefix}.bn3", out)
    if f"{prefix}.downsample.0.weight" in params:
        x = _convbn(params, f"{prefix}.downsample.0",
                    f"{prefix}.downsample.1", x, stride=stride)
    return jax.nn.relu(out + x)


def resnet_features(params: Params, x, num=18, prefix="net"):
    """The 5 reference slices of a torchvision ResNet (relu1, conv2..conv5)."""
    block = _basic_block if num in (18, 34) else _bottleneck
    layers = _RESNET_LAYERS[num]
    h = conv2d(x, params[f"{prefix}.conv1.weight"], stride=2, padding=3)
    h = jax.nn.relu(_bn(params, f"{prefix}.bn1", h))
    outs = [h]
    # torch maxpool(3, 2, padding=1): pad with -inf then VALID window
    h = jnp.pad(h, ((0, 0), (0, 0), (1, 1), (1, 1)),
                constant_values=-jnp.inf)
    h = _maxpool(h)
    for li, nblocks in enumerate(layers, start=1):
        for bi in range(nblocks):
            stride = 2 if (li > 1 and bi == 0) else 1
            h = block(params, f"{prefix}.layer{li}.{bi}", h, stride)
        outs.append(h)
    return outs


def import_torchvision_resnet(state_dict, prefix="net") -> Params:
    """torchvision resnet state_dict (optionally nested under 'net.'/'net.net.')
    -> our flat param dict."""
    out: Params = {}
    for k, v in state_dict.items():
        if hasattr(v, "detach"):
            v = v.detach().cpu().numpy()
        kk = k
        while kk.startswith("net."):
            kk = kk[4:]
        if kk.startswith("fc.") or kk.endswith("num_batches_tracked"):
            continue
        out[f"{prefix}.{kk}"] = jnp.asarray(np.asarray(v, np.float32))
    return out
