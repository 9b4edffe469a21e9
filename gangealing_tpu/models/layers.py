"""Functional StyleGAN2-family building blocks over flat parameter dicts.

Parameters live in a flat ``{torch_state_dict_key: jnp.ndarray}`` dict so that
importing the published PyTorch checkpoints (utils/download.py:10-29 in the
reference) is a pure tensor copy. All functions are pure and jit-friendly.

Capability reference: models/stylegan2/networks.py (EqualConv2d:89,
EqualLinear:127, ModulatedConv2d:176, StyledConv:314, ToRGB:353, ResBlock:375,
ConvLayer:589).

TPU-first notes:
  * ModulatedConv2d is NOT implemented as a per-sample grouped conv (the
    reference's CUDA-friendly trick). Since convolution is linear, modulating
    the weight by a per-sample style is equivalent to scaling input channels
    by the style before a *shared-weight* conv and scaling output channels by
    the demodulation after — one big batched conv on the MXU instead of N
    grouped convs.
  * All convs run through lax.conv_general_dilated with NCHW/OIHW layouts
    (same layout as the checkpoints; XLA re-tiles internally).
"""

import math
from typing import Dict

import jax
import jax.numpy as jnp
from jax import lax

from gangealing_tpu.ops.resample import (
    blur, fused_leaky_relu, upsample2x, _DN)

Params = Dict[str, jnp.ndarray]


# ---------------------------------------------------------------------------
# basic ops
# ---------------------------------------------------------------------------

def pixel_norm(x, eps=1e-8):
    return x * jax.lax.rsqrt(jnp.mean(x ** 2, axis=1, keepdims=True) + eps)


def conv2d(x, w, stride=1, padding=0, groups=1):
    if isinstance(padding, int):
        padding = (padding, padding)
    return lax.conv_general_dilated(
        x, w.astype(x.dtype), window_strides=(stride, stride),
        padding=(padding, padding),
        dimension_numbers=_DN, feature_group_count=groups)


def conv_transpose2d(x, w_torch, stride=2):
    """torch.conv_transpose2d(stride, padding=0) with torch (I, O, kh, kw)
    weight layout; implemented as an lhs-dilated conv with the transposed,
    spatially-flipped kernel."""
    I, O, kh, kw = w_torch.shape
    w = jnp.flip(w_torch, (2, 3)).transpose(1, 0, 2, 3)  # (O, I, kh, kw)
    return lax.conv_general_dilated(
        x, w, window_strides=(1, 1),
        padding=((kh - 1, kh - 1), (kw - 1, kw - 1)),
        lhs_dilation=(stride, stride), dimension_numbers=_DN)


# ---------------------------------------------------------------------------
# equalized-lr layers
# ---------------------------------------------------------------------------

def equal_linear(params: Params, prefix: str, x, lr_mul=1.0, activation=None):
    w = params[f"{prefix}.weight"]  # (out, in), stored divided by lr_mul
    in_dim = w.shape[1]
    scale = (1.0 / math.sqrt(in_dim)) * lr_mul
    out = x @ (w * scale).T
    b = params.get(f"{prefix}.bias")
    if activation:
        return fused_leaky_relu(out, b * lr_mul if b is not None else None)
    if b is not None:
        out = out + b * lr_mul
    return out


def equal_linear_init(key, in_dim, out_dim, bias=True, bias_init=0.0,
                      lr_mul=1.0) -> Params:
    k1, _ = jax.random.split(key)
    p = {"weight": jax.random.normal(k1, (out_dim, in_dim)) / lr_mul}
    if bias:
        p["bias"] = jnp.full((out_dim,), float(bias_init))
    return p


def equal_conv2d(params: Params, prefix: str, x, stride=1, padding=0):
    w = params[f"{prefix}.weight"]  # (O, I, k, k)
    O, I, kh, kw = w.shape
    scale = 1.0 / math.sqrt(I * kh * kw)
    out = conv2d(x, w * scale, stride=stride, padding=padding)
    b = params.get(f"{prefix}.bias")
    if b is not None:
        out = out + b.reshape(1, O, 1, 1)
    return out


def equal_conv2d_init(key, in_ch, out_ch, k, bias=True) -> Params:
    p = {"weight": jax.random.normal(key, (out_ch, in_ch, k, k))}
    if bias:
        p["bias"] = jnp.zeros((out_ch,))
    return p


# ---------------------------------------------------------------------------
# ConvLayer / ResBlock (shared by STN encoder, classifier, G's discriminator
# blocks)
# ---------------------------------------------------------------------------

BLUR_KERNEL = (1, 3, 3, 1)

# Fuse the downsampling ConvLayer's Blur into its conv (one composed-kernel
# strided conv instead of FIR-then-conv; see compose_blur_into_weight).
# MEASURED TO LOSE on TPU v5e (encoders 14.9->21.6ms / 15.9->20.6ms at the
# flagship batch-128 shapes): the strided encoder convs are FLOP-bound at
# ~60% MXU efficiency, so the composed 6x6 kernel's 4x FLOPs cost more
# than the eliminated blur round trip saves. Kept (default OFF) as the
# committed record of the experiment; enable via GANGEALING_FUSE_BLUR_CONV=1.
# The flag is read at TRACE time: set it before the first jitted call (the
# jit cache is keyed on shapes only, so flipping it later keeps the traced
# path — clear caches or restart the process to switch).
_FUSE_BLUR_CONV = False


def _fuse_blur_conv_enabled():
    import os
    env = os.environ.get("GANGEALING_FUSE_BLUR_CONV")
    if env is not None:
        return env.lower() not in ("0", "false", "no", "")
    return _FUSE_BLUR_CONV


def compose_blur_into_weight(w, blur_kernel=BLUR_KERNEL):
    """Composed kernel F with conv(blur(x)) == conv'(x; F) (both linear):
    each (kh, kw) filter is 2-D-convolved with the normalized FIR blur,
    giving a (kh+kb-1, kw+kb-1) filter applied at the blur's padding."""
    from gangealing_tpu.ops.resample import make_kernel
    k2 = make_kernel(blur_kernel)
    kb = k2.shape[0]
    O, I, kh, kw = w.shape
    x = w.reshape(O * I, 1, kh, kw)
    # correlate with the flipped blur == true convolution of the kernels
    ker = jnp.flip(k2, (0, 1))[None, None].astype(w.dtype)
    F = lax.conv_general_dilated(
        x, ker, window_strides=(1, 1),
        padding=((kb - 1, kb - 1), (kb - 1, kb - 1)),
        dimension_numbers=_DN)
    return F.reshape(O, I, kh + kb - 1, kw + kb - 1)


def conv_layer(params: Params, prefix: str, x, kernel_size, downsample=False,
               bias=True, activate=True, blur_kernel=BLUR_KERNEL):
    """Reference ConvLayer (networks.py:589-635): optional Blur + EqualConv2d
    + FusedLeakyReLU. Sequential indices in param names follow torch."""
    idx = 0
    fuse_w = None
    if downsample:
        p = (len(blur_kernel) - 2) + (kernel_size - 1)
        pad0 = (p + 1) // 2
        pad1 = p // 2
        idx += 1  # Blur occupies Sequential slot 0 (buffer only)
        if kernel_size > 1 and _fuse_blur_conv_enabled():
            # composed-kernel strided conv replaces Blur + conv (see
            # compose_blur_into_weight); the blur padding moves to the conv
            def fuse_w(w):
                return compose_blur_into_weight(w, blur_kernel)
            stride, padding = 2, (pad0, pad1)
        elif kernel_size == 1:
            # 1x1 stride-2 conv after a blur only reads the blur's even
            # pixels — fold the stride into the FIR (upfirdn2d down=2):
            # identical values at ~1/3 the depthwise work and half the
            # intermediate traffic. (ResBlock skip path.)
            from gangealing_tpu.ops.resample import make_kernel, upfirdn2d
            x = upfirdn2d(x, make_kernel(blur_kernel), down=2,
                          pad=(pad0, pad1))
            stride, padding = 1, 0
        else:
            x = blur(x, blur_kernel, pad=(pad0, pad1))
            stride, padding = 2, 0
    else:
        stride, padding = 1, kernel_size // 2
    conv_prefix = f"{prefix}.{idx}"
    w = params[f"{conv_prefix}.weight"]
    O, I, kh, kw = w.shape
    scale = 1.0 / math.sqrt(I * kh * kw)  # equalized lr: original fan-in
    w = w * scale
    if fuse_w is not None:
        w = fuse_w(w)
    out = conv2d(x, w, stride=stride, padding=padding)
    b = params.get(f"{conv_prefix}.bias")  # present only when not activate
    if b is not None:
        out = out + b.reshape(1, O, 1, 1)
    if activate:
        # conv has no own bias; FusedLeakyReLU holds it (when bias=True)
        out = fused_leaky_relu(
            out, params[f"{prefix}.{idx + 1}.bias"] if bias else None)
    return out


def conv_layer_init(key, in_ch, out_ch, kernel_size, downsample=False,
                    bias=True, activate=True) -> Params:
    idx = 1 if downsample else 0
    p = {}
    kw, kb = jax.random.split(key)
    conv = equal_conv2d_init(kw, in_ch, out_ch, kernel_size,
                             bias=bias and not activate)
    for k, v in conv.items():
        p[f"{idx}.{k}"] = v
    if activate and bias:
        p[f"{idx + 1}.bias"] = jnp.zeros((out_ch,))
    return p


def res_block(params: Params, prefix: str, x, downsample=True):
    """Reference ResBlock (networks.py:375-393)."""
    out = conv_layer(params, f"{prefix}.conv1", x, 3)
    out = conv_layer(params, f"{prefix}.conv2", out, 3, downsample=downsample)
    skip = conv_layer(params, f"{prefix}.skip", x, 1, downsample=downsample,
                      activate=False, bias=False)
    return (out + skip) / math.sqrt(2)


def res_block_init(key, in_ch, out_ch, downsample=True) -> Params:
    k1, k2, k3 = jax.random.split(key, 3)
    p = {}
    for name, sub in [
        ("conv1", conv_layer_init(k1, in_ch, in_ch, 3)),
        ("conv2", conv_layer_init(k2, in_ch, out_ch, 3, downsample=downsample)),
        ("skip", conv_layer_init(k3, in_ch, out_ch, 1, downsample=downsample,
                                 activate=False, bias=False)),
    ]:
        for k, v in sub.items():
            p[f"{name}.{k}"] = v
    return p


# ---------------------------------------------------------------------------
# Modulated convolution
# ---------------------------------------------------------------------------

def modulated_conv2d(params: Params, prefix: str, x, style,
                     demodulate=True, upsample=False, downsample=False,
                     blur_kernel=BLUR_KERNEL, normalize=False):
    """StyleGAN2 modulated conv (networks.py:176-282), TPU formulation.

    x: (N, I, H, W); style: (N, style_dim). Weight param: (1, O, I, kh, kw).
    """
    N, I, H, W = x.shape
    w = params[f"{prefix}.weight"][0]  # (O, I, kh, kw)
    O, _, kh, kw = w.shape
    fan_in = I * kh * kw
    scale = 1.0 / math.sqrt(fan_in)

    s = equal_linear(params, f"{prefix}.modulation", style)  # (N, I)
    if normalize:
        s = s / jnp.max(jnp.abs(s))
    weight = scale * w
    if normalize:
        weight_size = jnp.asarray(fan_in, dtype=jnp.float32)
        weight = weight * jnp.sqrt(1.0 / weight_size) / jnp.max(
            jnp.abs(weight), axis=(1, 2, 3), keepdims=True)

    if demodulate:
        # demod[n, o] = rsqrt(sum_i s[n,i]^2 * sum_k weight[o,i,k]^2 + eps)
        wsq = jnp.sum(weight ** 2, axis=(2, 3))  # (O, I)
        demod = jax.lax.rsqrt((s ** 2) @ wsq.T + 1e-8)  # (N, O)
    else:
        demod = None

    xs = x * s[:, :, None, None].astype(x.dtype)

    if upsample:
        # shared-weight conv_transpose; weight transposed to (I, O, kh, kw)
        out = conv_transpose2d(xs, weight.transpose(1, 0, 2, 3).astype(x.dtype))
        if demod is not None:
            out = out * demod[:, :, None, None].astype(out.dtype)
        factor = 2
        p = (len(blur_kernel) - factor) - (kh - 1)
        pad0 = (p + 1) // 2 + factor - 1
        pad1 = p // 2 + 1
        out = blur(out, blur_kernel, pad=(pad0, pad1), upsample_factor=factor)
    elif downsample:
        factor = 2
        p = (len(blur_kernel) - factor) + (kh - 1)
        pad0 = (p + 1) // 2
        pad1 = p // 2
        xs = blur(xs, blur_kernel, pad=(pad0, pad1))
        out = conv2d(xs, weight.astype(x.dtype), stride=2, padding=0)
        if demod is not None:
            out = out * demod[:, :, None, None].astype(out.dtype)
    else:
        out = conv2d(xs, weight.astype(x.dtype), padding=kh // 2)
        if demod is not None:
            out = out * demod[:, :, None, None].astype(out.dtype)
    return out


def modulated_conv2d_init(key, in_ch, out_ch, k, style_dim) -> Params:
    k1, k2 = jax.random.split(key)
    p = {"weight": jax.random.normal(k1, (1, out_ch, in_ch, k, k))}
    for kk, v in equal_linear_init(k2, style_dim, in_ch, bias_init=1.0).items():
        p[f"modulation.{kk}"] = v
    return p


def styled_conv(params: Params, prefix: str, x, style, noise=None,
                upsample=False, demodulate=True, normalize=False):
    """StyledConv = ModulatedConv2d + NoiseInjection + FusedLeakyReLU
    (networks.py:314-350). ``noise`` is (N, 1, H, W) or None (no noise)."""
    out = modulated_conv2d(params, f"{prefix}.conv", x, style,
                           demodulate=demodulate, upsample=upsample,
                           normalize=normalize)
    if noise is not None:
        out = out + params[f"{prefix}.noise.weight"].astype(out.dtype) * noise.astype(out.dtype)
    out = fused_leaky_relu(out, params[f"{prefix}.activate.bias"])
    return out


def styled_conv_init(key, in_ch, out_ch, k, style_dim) -> Params:
    p = {}
    for kk, v in modulated_conv2d_init(key, in_ch, out_ch, k, style_dim).items():
        p[f"conv.{kk}"] = v
    p["noise.weight"] = jnp.zeros((1,))
    p["activate.bias"] = jnp.zeros((out_ch,))
    return p


def to_rgb(params: Params, prefix: str, x, style, skip=None, normalize=False,
           blur_kernel=BLUR_KERNEL):
    """ToRGB (networks.py:353-372): 1x1 modulated conv (no demod) + bias,
    plus blur-upsampled skip connection."""
    out = modulated_conv2d(params, f"{prefix}.conv", x, style,
                           demodulate=False, normalize=normalize)
    out = out + params[f"{prefix}.bias"].astype(x.dtype)
    if skip is not None:
        skip = upsample2x(skip, blur_kernel)
        out = out.astype(jnp.float32) + skip
    return out


def to_rgb_init(key, in_ch, style_dim) -> Params:
    p = {}
    for kk, v in modulated_conv2d_init(key, in_ch, 3, 1, style_dim).items():
        p[f"conv.{kk}"] = v
    p["bias"] = jnp.zeros((1, 3, 1, 1))
    return p


def subtree(params: Params, prefix: str) -> Params:
    """View of a flat param dict under a dotted prefix."""
    plen = len(prefix) + 1
    return {k[plen:]: v for k, v in params.items() if k.startswith(prefix + ".")}


def add_subtree(params: Params, prefix: str, sub: Params) -> None:
    for k, v in sub.items():
        params[f"{prefix}.{k}"] = v
