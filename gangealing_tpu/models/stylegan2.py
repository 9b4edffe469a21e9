"""StyleGAN2 generator (config-f, rosinality checkpoint layout) in JAX.

Capability reference: models/stylegan2/networks.py:396-586 (Generator).
Functional: ``generator_apply(params, cfg, styles, ...)`` is pure; noise is
threaded through an explicit PRNG key. Parameter names match the torch
state_dict exactly so published checkpoints import as a tensor copy.

TPU notes: the whole forward is one jit region; modulated convs use the
shared-weight formulation (see layers.modulated_conv2d) so every conv is a
single large MXU matmul-like op; resolution doubling uses the fused
upfirdn2d resampler.
"""

import math
from dataclasses import dataclass
from typing import Optional, Sequence

import jax
import jax.numpy as jnp

from gangealing_tpu.models.layers import (
    Params, pixel_norm, equal_linear, equal_linear_init, styled_conv,
    styled_conv_init, to_rgb, to_rgb_init, add_subtree)


@dataclass(frozen=True)
class GeneratorConfig:
    size: int = 256
    style_dim: int = 512
    n_mlp: int = 8
    channel_multiplier: int = 2
    num_fp16_res: int = 0  # >0 marks trailing convs with the normalize path
    max_channels: int = 512  # cap (tests use small values; checkpoints 512)

    @property
    def log_size(self) -> int:
        return int(math.log2(self.size))

    @property
    def n_latent(self) -> int:
        return self.log_size * 2 - 2

    @property
    def num_layers(self) -> int:
        return (self.log_size - 2) * 2 + 1

    @property
    def channels(self):
        cm = self.channel_multiplier
        full = {4: 512, 8: 512, 16: 512, 32: 512, 64: 256 * cm, 128: 128 * cm,
                256: 64 * cm, 512: 32 * cm, 1024: 16 * cm}
        return {k: min(v, self.max_channels) for k, v in full.items()}


def generator_init(key, cfg: GeneratorConfig) -> Params:
    p: Params = {}
    keys = jax.random.split(key, 64)
    ki = iter(keys)
    # mapping network: style.0 is PixelNorm (no params); linears are 1..n_mlp
    for i in range(cfg.n_mlp):
        add_subtree(p, f"style.{i + 1}",
                    equal_linear_init(next(ki), cfg.style_dim, cfg.style_dim,
                                      lr_mul=0.01))
    ch = cfg.channels
    p["input.input"] = jax.random.normal(next(ki), (1, ch[4], 4, 4))
    add_subtree(p, "conv1", styled_conv_init(next(ki), ch[4], ch[4], 3,
                                             cfg.style_dim))
    add_subtree(p, "to_rgb1", to_rgb_init(next(ki), ch[4], cfg.style_dim))
    in_ch = ch[4]
    j = 0
    for i in range(3, cfg.log_size + 1):
        out_ch = ch[2 ** i]
        add_subtree(p, f"convs.{j}", styled_conv_init(next(ki), in_ch, out_ch,
                                                      3, cfg.style_dim))
        add_subtree(p, f"convs.{j + 1}", styled_conv_init(next(ki), out_ch,
                                                          out_ch, 3,
                                                          cfg.style_dim))
        add_subtree(p, f"to_rgbs.{i - 3}", to_rgb_init(next(ki), out_ch,
                                                       cfg.style_dim))
        in_ch = out_ch
        j += 2
    # fixed per-layer noise buffers (randomize_noise=False path)
    for layer_idx in range(cfg.num_layers):
        res = (layer_idx + 5) // 2
        p[f"noises.noise_{layer_idx}"] = jax.random.normal(
            next(ki), (1, 1, 2 ** res, 2 ** res))
    return p


def mapping(params: Params, cfg: GeneratorConfig, z):
    """The 8-layer style MLP with PixelNorm input (networks.py:414-423)."""
    out = pixel_norm(z)
    for i in range(cfg.n_mlp):
        out = equal_linear(params, f"style.{i + 1}", out, lr_mul=0.01,
                           activation=True)
    return out


def batch_latent(params: Params, cfg: GeneratorConfig, key, n: int):
    z = jax.random.normal(key, (n, cfg.style_dim))
    return mapping(params, cfg, z)


def mean_latent(params: Params, cfg: GeneratorConfig, key, n: int):
    return jnp.mean(batch_latent(params, cfg, key, n), axis=0, keepdims=True)


def make_noise(key, cfg: GeneratorConfig, batch: int):
    """Fresh per-layer noise images (randomize_noise=True path)."""
    keys = jax.random.split(key, cfg.num_layers)
    noises = []
    for layer_idx in range(cfg.num_layers):
        res = (layer_idx + 5) // 2
        noises.append(jax.random.normal(keys[layer_idx],
                                        (batch, 1, 2 ** res, 2 ** res)))
    return noises


def _expand_latent(styles: Sequence[jnp.ndarray], cfg: GeneratorConfig,
                   inject_index: Optional[int]):
    """Broadcast/mix W latents into a (N, n_latent, 512) W+ tensor.

    Mirrors networks.py:544-560, except ``inject_index`` must be static
    (pass it explicitly for style mixing; the reference's random choice is
    made by the caller).
    """
    n_latent = cfg.n_latent
    if len(styles) < 2 or inject_index == n_latent:
        s = styles[0]
        if s.ndim < 3:
            latent = jnp.repeat(s[:, None, :], n_latent, axis=1)
        else:
            latent = s
    else:
        if inject_index is None:
            raise ValueError(
                "style mixing requires an explicit static inject_index")
        latent = jnp.concatenate([
            jnp.repeat(styles[0][:, None, :], inject_index, axis=1),
            jnp.repeat(styles[1][:, None, :], n_latent - inject_index, axis=1),
        ], axis=1)
    return latent


def generator_apply(params: Params, cfg: GeneratorConfig, styles,
                    key=None, input_is_latent=False, inject_index=None,
                    truncation=1.0, truncation_latent=None, noise=None,
                    randomize_noise=True, return_latents=False,
                    mapping_only=False, compute_dtype=jnp.float32):
    """Forward pass. ``styles``: list of (N, 512) z or w arrays (or a single
    (N, n_latent, 512) W+ array wrapped in a list).

    ``key`` is required when randomize_noise=True and noise is None.
    Returns (image, latent_or_None) like the reference (networks.py:514-586).
    """
    if not isinstance(styles, (list, tuple)):
        styles = [styles]
    if not input_is_latent:
        styles = [mapping(params, cfg, s) for s in styles]
        if mapping_only:
            return styles

    if truncation < 1.0:
        truncated = truncation_latent + truncation * (styles[0] - truncation_latent)
        styles = [truncated, styles[0]]
        if inject_index is None:
            # Fully truncated by default. NB: the reference picks a RANDOM
            # inject point here (networks.py:554-556, random.randint); that
            # is not jittable — callers wanting partial truncation must pass
            # a static inject_index.
            inject_index = cfg.n_latent

    latent = _expand_latent(styles, cfg, inject_index)
    N = latent.shape[0]

    if noise is None:
        if randomize_noise:
            if key is None:
                raise ValueError("randomize_noise=True requires a PRNG key")
            noise = make_noise(key, cfg, N)
        else:
            noise = [params[f"noises.noise_{i}"]
                     for i in range(cfg.num_layers)]

    num_fp16 = cfg.num_fp16_res

    out = jnp.repeat(params["input.input"].astype(compute_dtype), N, axis=0)
    out = styled_conv(params, "conv1", out, latent[:, 0], noise=noise[0])
    skip = to_rgb(params, "to_rgb1", out, latent[:, 1])

    i = 1
    n_blocks = cfg.log_size - 2
    for b in range(n_blocks):
        j = b + 3  # resolution log2
        normalize = j > cfg.log_size - num_fp16
        out = styled_conv(params, f"convs.{2 * b}", out, latent[:, i],
                          noise=noise[1 + 2 * b], upsample=True,
                          normalize=normalize)
        out = styled_conv(params, f"convs.{2 * b + 1}", out, latent[:, i + 1],
                          noise=noise[2 + 2 * b], normalize=normalize)
        skip = to_rgb(params, f"to_rgbs.{b}", out, latent[:, i + 2], skip)
        i += 2

    image = skip
    if return_latents:
        return image, latent
    return image, None
