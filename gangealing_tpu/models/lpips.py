"""Perceptual losses: LPIPS (VGG16 + learned linear calibration) and the
fully-unsupervised SimCLR-VGG variant.

Capability reference: models/losses/lpips.py:13-23 (get_perceptual_loss),
123-223 (LPIPS), 226-246 (ScalingLayer/NetLinLayer) and
models/losses/lpips_backbones.py:98-140 (vgg16 slices over torchvision
layout).

Param dict uses the reference LPIPS state_dict names
('net.slice{i}.{idx}.weight', 'lin{k}.model.1.weight') so both the richzhang
LPIPS calibration checkpoint and SimCLR VGG weights import directly.

Returns per-sample (N, 1, 1, 1) losses — required by the clustering
min-over-heads reduction (reference loss.py:55-60).
"""

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from gangealing_tpu.models.layers import Params, conv2d

# torchvision VGG16 `features` conv layer indices and channel widths
_VGG_SLICES = [
    # (slice_name, [(layer_idx, in_ch, out_ch), ...], maxpool_first)
    ("slice1", [(0, 3, 64), (2, 64, 64)], False),
    ("slice2", [(5, 64, 128), (7, 128, 128)], True),
    ("slice3", [(10, 128, 256), (12, 256, 256), (14, 256, 256)], True),
    ("slice4", [(17, 256, 512), (19, 512, 512), (21, 512, 512)], True),
    ("slice5", [(24, 512, 512), (26, 512, 512), (28, 512, 512)], True),
]
VGG_CHANNELS = [64, 128, 256, 512, 512]

SCALING_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
SCALING_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


def _maxpool2x(x):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 1, 2, 2), (1, 1, 2, 2),
        "VALID")


def vgg16_features(params: Params, x, prefix="net"):
    """Run the 5 VGG16 slices; returns list of 5 feature maps (post-ReLU)."""
    outs = []
    h = x
    for sname, convs, pool_first in _VGG_SLICES:
        if pool_first:
            h = _maxpool2x(h)
        for (idx, cin, cout) in convs:
            w = params[f"{prefix}.{sname}.{idx}.weight"]
            b = params[f"{prefix}.{sname}.{idx}.bias"]
            h = conv2d(h, w, padding=1) + b.reshape(1, -1, 1, 1)
            h = jax.nn.relu(h)
        outs.append(h)
    return outs


def vgg16_init(key) -> Params:
    """Random VGG16 (pnet_rand path); He-style init."""
    p: Params = {}
    keys = jax.random.split(key, 16)
    ki = iter(keys)
    for sname, convs, _ in _VGG_SLICES:
        for (idx, cin, cout) in convs:
            k = next(ki)
            std = float(np.sqrt(2.0 / (cin * 9)))
            p[f"net.{sname}.{idx}.weight"] = \
                jax.random.normal(k, (cout, cin, 3, 3)) * std
            p[f"net.{sname}.{idx}.bias"] = jnp.zeros((cout,))
    return p


def lpips_lins_init(key) -> Params:
    p: Params = {}
    keys = jax.random.split(key, 5)
    for i, c in enumerate(VGG_CHANNELS):
        p[f"lin{i}.model.1.weight"] = jnp.abs(
            jax.random.normal(keys[i], (1, c, 1, 1))) * 0.1
    return p


def import_torchvision_vgg(state_dict) -> Params:
    """torchvision 'features.N.weight' names -> our 'net.sliceX.N.weight'."""
    idx_to_slice = {}
    for sname, convs, _ in _VGG_SLICES:
        for (idx, _, _) in convs:
            idx_to_slice[idx] = sname
    out: Params = {}
    for k, v in state_dict.items():
        if hasattr(v, "detach"):
            v = v.detach().cpu().numpy()
        parts = k.split(".")
        if parts[0] == "features":
            idx = int(parts[1])
            if idx in idx_to_slice:
                out[f"net.{idx_to_slice[idx]}.{idx}.{parts[2]}"] = \
                    jnp.asarray(np.asarray(v, np.float32))
        elif parts[0] == "net" or parts[0].startswith("lin") \
                or parts[0] == "scaling_layer":
            out[k] = jnp.asarray(np.asarray(v, np.float32))
        else:
            # bare 'N.weight' layout (an nn.Sequential state_dict, e.g. the
            # SimCLR VGG checkpoint saved from .features)
            try:
                idx = int(parts[0])
            except ValueError:
                continue
            if idx in idx_to_slice:
                out[f"net.{idx_to_slice[idx]}.{idx}.{parts[1]}"] = \
                    jnp.asarray(np.asarray(v, np.float32))
    return out


def _normalize_tensor(feat, eps=1e-10):
    norm = jnp.sqrt(jnp.sum(feat ** 2, axis=1, keepdims=True))
    return feat / (norm + eps)


def lpips_distance(params: Params, x, y, use_lins=True,
                   compute_dtype=jnp.float32):
    """Per-sample perceptual distance, shape (N, 1, 1, 1).

    x, y in [-1, 1]. use_lins=True -> LPIPS calibration; False -> raw
    sum-of-channels (the vgg_ssl baseline mode). compute_dtype=bfloat16
    runs the VGG trunk at MXU full rate (normalization/reduction in f32)."""
    shift = jnp.asarray(SCALING_SHIFT).reshape(1, 3, 1, 1)
    scale = jnp.asarray(SCALING_SCALE).reshape(1, 3, 1, 1)
    xs = ((x - shift) / scale).astype(compute_dtype)
    ys = ((y - shift) / scale).astype(compute_dtype)
    fx = vgg16_features(params, xs)
    fy = vgg16_features(params, ys)
    val = 0.0
    for i, (a, b) in enumerate(zip(fx, fy)):
        a = a.astype(jnp.float32)
        b = b.astype(jnp.float32)
        d = (_normalize_tensor(a) - _normalize_tensor(b)) ** 2
        if use_lins:
            w = params[f"lin{i}.model.1.weight"]
            d = conv2d(d, w)  # (N, 1, H, W)
        else:
            d = jnp.sum(d, axis=1, keepdims=True)
        val = val + jnp.mean(d, axis=(2, 3), keepdims=True)
    return val


@dataclass(frozen=True)
class PerceptualLossConfig:
    kind: str = "vgg_ssl"  # 'vgg_ssl' | 'lpips'
    compute_dtype: str = "float32"


def make_perceptual_loss(cfg: PerceptualLossConfig):
    """Returns loss_fn(params, x, y) -> (N, 1, 1, 1), mirroring
    get_perceptual_loss (lpips.py:13-23)."""
    dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
    if cfg.kind == "vgg_ssl":
        return lambda p, x, y: lpips_distance(p, x, y, use_lins=False,
                                              compute_dtype=dtype) / 18.0
    if cfg.kind == "lpips":
        return lambda p, x, y: lpips_distance(p, x, y, use_lins=True,
                                              compute_dtype=dtype)
    raise NotImplementedError(cfg.kind)
