"""Mipmap-anti-aliased warping (the quality core of the STN sampler).

Capability reference: models/spatial_transformers/antialiased_sampling.py:19-238
(MipmapWarp). The reference picks the number of Gaussian-stack levels
dynamically from the data (``levels.max().ceil()``); under jit we instead use
the static upper bound implied by ``max_num_levels`` (levels are clamped to
``max_num_levels - 1``), which is numerically identical — the extra levels'
interpolation weights are exactly zero wherever the dynamic version would not
have built them.

TPU design: the per-pixel floor/ceil gather over the level dimension is
re-expressed as a tent-weighted sum over the (small, static) level axis —
pure VPU arithmetic, no gathers, fuses with the warp.
"""

import math
from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

from gangealing_tpu.ops.grid_sample import grid_sample_auto
from gangealing_tpu.ops.resample import interpolate_bilinear, _DN


def _gaussian_blur_2x(x):
    """[1,3,3,1] outer-product blur, reflection pad 1, stride 2.
    Separable: two 1-D depthwise passes (exact; half the VPU work)."""
    import numpy as np
    k1 = np.array([1.0, 3.0, 3.0, 1.0], dtype=np.float32)
    k1 = k1 / np.sqrt((np.outer(k1, k1)).sum())  # so kv*kh == k/16 exactly
    N, C, H, W = x.shape
    xp = jnp.pad(x, ((0, 0), (0, 0), (1, 1), (1, 1)), mode="reflect")
    kv = jnp.broadcast_to(jnp.asarray(k1).astype(x.dtype)[None, None, :, None],
                          (C, 1, 4, 1))
    kh = jnp.broadcast_to(jnp.asarray(k1).astype(x.dtype)[None, None, None, :],
                          (C, 1, 1, 4))
    out = lax.conv_general_dilated(xp, kv, window_strides=(2, 1),
                                   padding="VALID", dimension_numbers=_DN,
                                   feature_group_count=C)
    return lax.conv_general_dilated(out, kh, window_strides=(1, 2),
                                    padding="VALID", dimension_numbers=_DN,
                                    feature_group_count=C)


def _max_coord_distance(coords):
    """Max distance to 4-neighbor sampling coords. coords: (N, H, W, 2)."""
    padded = jnp.pad(coords, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")

    def dist(other):
        sq = jnp.sum((other - coords) ** 2, axis=3)
        return jnp.sqrt(jnp.maximum(sq, 1.0))

    d_l = dist(padded[:, 1:-1, :-2, :])
    d_r = dist(padded[:, 1:-1, 2:, :])
    d_u = dist(padded[:, :-2, 1:-1, :])
    d_d = dist(padded[:, 2:, 1:-1, :])
    return jnp.maximum(jnp.maximum(d_l, d_r), jnp.maximum(d_u, d_d))


def mipmap_levels(grid, height, width, max_num_levels):
    """Per-pixel mipmap level from the sampling grid (N, H, W, 2)."""
    x = (width - 1.0) * (grid[..., 0] + 1.0) / 2.0
    y = (height - 1.0) * (grid[..., 1] + 1.0) / 2.0
    coords = jnp.stack([x, y], axis=3)
    dist_max = _max_coord_distance(coords)
    levels = jnp.log2(dist_max)
    return jnp.clip(levels, 0.0, max_num_levels - 1.0)


def _build_stack(x, num_levels):
    """Gaussian stack: level i is blurred (cumulatively downsampled 2x then
    bilinearly upsampled back). Non-power-of-2 inputs reflect-padded first.
    Returns list of (N, C, H, W) arrays, length num_levels."""
    N, C, H, W = x.shape
    log_size = math.log2(x.shape[-1])
    pad_needed = not float(log_size).is_integer()
    if pad_needed:
        target = int(2 ** math.ceil(log_size))
        total = target - x.shape[-1]
        lp = total // 2
        rp = total - lp
        x = jnp.pad(x, ((0, 0), (0, 0), (lp, rp), (lp, rp)), mode="reflect")
    levels = [x]
    cur = x
    full = x.shape[-1]
    for i in range(1, num_levels):
        cur = _gaussian_blur_2x(cur)
        up = interpolate_bilinear(cur, full, full)
        levels.append(up)
    if pad_needed:
        levels = [l[:, :, lp:-rp, lp:-rp] for l in levels]
    return levels


@partial(jax.jit, static_argnames=("max_num_levels", "padding_mode",
                                   "min_level"))
def mipmap_warp(inputs, grid, max_num_levels=3.5, min_level=0.0,
                padding_mode="border"):
    """Anti-aliased grid_sample: per-pixel mipmap level selection.

    inputs: (N, C, H, W); grid: (N, Ho, Wo, 2) normalized to [-1, 1].
    """
    N, C, H, W = inputs.shape
    num_levels = int(math.ceil(max_num_levels - 1.0)) + 1

    levels = mipmap_levels(grid, H, W, max_num_levels)  # (N, Ho, Wo)
    levels = jnp.maximum(levels, min_level)

    stack = _build_stack(inputs, num_levels)  # list of (N, C, H, W)
    # Warp all levels in one grid_sample over a folded channel axis; gather
    # indices are shared across C*D channels.
    big = jnp.concatenate(stack, axis=1)  # (N, C*D, H, W)
    warped = grid_sample_auto(big, grid, padding_mode=padding_mode)
    Ho, Wo = grid.shape[1], grid.shape[2]
    warped = warped.reshape(N, num_levels, C, Ho, Wo)

    # Linear interp between floor/ceil levels == tent-weighted sum over the
    # static level axis (weights are zero outside [floor, ceil]).
    lv = levels[:, None, None, :, :]  # (N, 1, 1, Ho, Wo)
    d = jnp.arange(num_levels, dtype=levels.dtype)[None, :, None, None, None]
    w = jnp.maximum(0.0, 1.0 - jnp.abs(lv - d))
    out = jnp.sum(warped * w.astype(warped.dtype), axis=1)  # (N, C, Ho, Wo)
    return out
