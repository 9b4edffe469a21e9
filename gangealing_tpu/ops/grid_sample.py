"""Differentiable grid sampling with PyTorch semantics, built TPU-first.

This primitive does not exist in JAX; everything in the STN stack (similarity
warps, flow warps, mipmap anti-aliasing, point uncongealing) depends on it.
Semantics match ``torch.nn.functional.grid_sample`` (bilinear, align_corners
configurable, padding modes border/zeros/reflection) so that reference
checkpoints produce bit-comparable outputs.

Capability reference: the reference project's use of F.grid_sample in
models/spatial_transformers/antialiased_sampling.py:16,177 and
spatial_transformer.py:151,704.

Design notes (TPU):
  * The 4-corner bilinear gather is expressed as a single batched gather over
    the flattened spatial axis; indices are shared across the channel axis, so
    XLA lowers this to efficient dynamic-gather tiles and fuses the lerp
    arithmetic into the gather consumers.
  * All shapes are static; masks (zeros padding) are computed with predicated
    arithmetic instead of control flow.
"""

from functools import partial

import jax
import jax.numpy as jnp


def _unnormalize(coord, size, align_corners):
    if align_corners:
        return (coord + 1.0) * 0.5 * (size - 1)
    return ((coord + 1.0) * size - 1.0) * 0.5


def _reflect(coord, twice_low, twice_high):
    # Reflect coordinates into [twice_low/2, twice_high/2] (PyTorch algorithm).
    if twice_low == twice_high:
        return jnp.zeros_like(coord)
    mn = twice_low / 2.0
    span = (twice_high - twice_low) / 2.0
    coord = jnp.abs(coord - mn)
    extra = jnp.mod(coord, span)
    flips = jnp.floor(coord / span)
    flipped = jnp.mod(flips, 2.0) != 0.0
    return jnp.where(flipped, span - extra + mn, extra + mn)


def _compute_coords(coord, size, padding_mode, align_corners):
    """Unnormalize a coordinate from [-1, 1] and apply the padding rule."""
    c = _unnormalize(coord, size, align_corners)
    if padding_mode == "border":
        c = jnp.clip(c, 0.0, size - 1)
    elif padding_mode == "reflection":
        if align_corners:
            c = _reflect(c, 0, 2 * (size - 1))
        else:
            c = _reflect(c, -1, 2 * size - 1)
        c = jnp.clip(c, 0.0, size - 1)
    elif padding_mode == "zeros":
        pass
    else:
        raise ValueError(f"unknown padding_mode: {padding_mode}")
    return c


def _gather_2d(img_flat, idx):
    """img_flat: (N, C, H*W); idx: (N, P) int32 -> (N, C, P)."""
    return jnp.take_along_axis(img_flat, idx[:, None, :], axis=2)


@partial(jax.jit, static_argnames=("mode", "padding_mode", "align_corners"))
def grid_sample(input, grid, mode="bilinear", padding_mode="border",
                align_corners=False):
    """Sample ``input`` (N, C, H, W) at ``grid`` (N, Ho, Wo, 2) locations.

    grid[..., 0] is x in [-1, 1] over width; grid[..., 1] is y over height.
    Returns (N, C, Ho, Wo). Matches torch.nn.functional.grid_sample.
    """
    if mode not in ("bilinear", "nearest"):
        raise ValueError(f"unsupported mode: {mode}")
    N, C, H, W = input.shape
    _, Ho, Wo, _ = grid.shape
    compute_dtype = jnp.promote_types(input.dtype, jnp.float32)
    gx = grid[..., 0].astype(compute_dtype).reshape(N, Ho * Wo)
    gy = grid[..., 1].astype(compute_dtype).reshape(N, Ho * Wo)

    x = _compute_coords(gx, W, padding_mode, align_corners)
    y = _compute_coords(gy, H, padding_mode, align_corners)

    img = input.astype(compute_dtype).reshape(N, C, H * W)

    if mode == "nearest":
        xi = jnp.round(x).astype(jnp.int32)
        yi = jnp.round(y).astype(jnp.int32)
        if padding_mode == "zeros":
            valid = (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)
            xi = jnp.clip(xi, 0, W - 1)
            yi = jnp.clip(yi, 0, H - 1)
            out = _gather_2d(img, yi * W + xi)
            out = out * valid[:, None, :].astype(compute_dtype)
        else:
            xi = jnp.clip(xi, 0, W - 1)
            yi = jnp.clip(yi, 0, H - 1)
            out = _gather_2d(img, yi * W + xi)
        return out.reshape(N, C, Ho, Wo).astype(input.dtype)

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    x1 = x0 + 1.0
    y1 = y0 + 1.0

    wx1 = x - x0
    wx0 = 1.0 - wx1
    wy1 = y - y0
    wy0 = 1.0 - wy1

    def corner(xc, yc, wxc, wyc):
        w = wxc * wyc
        if padding_mode == "zeros":
            valid = (xc >= 0) & (xc < W) & (yc >= 0) & (yc < H)
            w = w * valid.astype(compute_dtype)
        xi = jnp.clip(xc, 0, W - 1).astype(jnp.int32)
        yi = jnp.clip(yc, 0, H - 1).astype(jnp.int32)
        vals = _gather_2d(img, yi * W + xi)  # (N, C, P)
        return vals * w[:, None, :]

    out = (
        corner(x0, y0, wx0, wy0)
        + corner(x1, y0, wx1, wy0)
        + corner(x0, y1, wx0, wy1)
        + corner(x1, y1, wx1, wy1)
    )
    return out.reshape(N, C, Ho, Wo).astype(input.dtype)


def _default_backend_is_tpu():
    """True only on actual TPU — the Pallas MXU kernels are TPU-specific;
    GPU and other backends keep the exact XLA formulation. (Shared with the
    banded FIR/resize dispatch in ops/resample.py.)"""
    from gangealing_tpu.ops.resample import _backend_is_tpu
    return _backend_is_tpu()


def grid_sample_auto(input, grid, mode="bilinear", padding_mode="border",
                     align_corners=False, min_points_for_mxu=2048,
                     precision=None):
    """grid_sample with automatic kernel selection.

    On TPU, large sampling grids route to the Pallas MXU kernel
    (ops/pallas_grid_sample.py) — XLA's gather lowering is ~20x slower for
    image-sized grids. Small point sets (keypoint transfer) and non-TPU
    backends use the exact XLA formulation.
    """
    import os
    P = grid.shape[1] * grid.shape[2]
    if (mode == "bilinear" and not align_corners and P >= min_points_for_mxu
            and _default_backend_is_tpu()):
        from gangealing_tpu.ops.pallas_grid_sample import (
            grid_sample_mxu_diff, mxu_kernel_fits)
        if mxu_kernel_fits(input):
            if precision is None:
                precision = os.environ.get("GANGEALING_GS_PRECISION", "bf16")
            return grid_sample_mxu_diff(input, grid, padding_mode,
                                        align_corners, 512, precision, False)
    return grid_sample(input, grid, mode=mode, padding_mode=padding_mode,
                       align_corners=align_corners)


def affine_grid(theta, size, align_corners=False):
    """Generate a sampling grid from affine matrices.

    theta: (N, 2, 3); size: (N, C, H, W) tuple. Returns (N, H, W, 2).
    Matches torch.nn.functional.affine_grid.
    """
    N, _, H, W = size
    dtype = theta.dtype
    if align_corners:
        xs = jnp.linspace(-1.0, 1.0, W, dtype=dtype)
        ys = jnp.linspace(-1.0, 1.0, H, dtype=dtype)
    else:
        xs = (jnp.arange(W, dtype=dtype) * 2.0 + 1.0) / W - 1.0
        ys = (jnp.arange(H, dtype=dtype) * 2.0 + 1.0) / H - 1.0
    gx, gy = jnp.meshgrid(xs, ys)  # (H, W)
    t = theta[:, :, :, None, None]  # (N, 2, 3, 1, 1)
    out_x = t[:, 0, 0] * gx + t[:, 0, 1] * gy + t[:, 0, 2]
    out_y = t[:, 1, 0] * gx + t[:, 1, 1] * gy + t[:, 1, 2]
    return jnp.stack([out_x, out_y], axis=-1)  # (N, H, W, 2)


def identity_grid(N, H, W, dtype=jnp.float32, align_corners=False):
    """The identity sampling grid, shape (N, H, W, 2)."""
    eye = jnp.broadcast_to(jnp.eye(2, 3, dtype=dtype)[None], (N, 2, 3))
    return affine_grid(eye, (N, 1, H, W), align_corners=align_corners)
