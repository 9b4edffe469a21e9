"""Gaussian point splatting (forward-only), deterministic TPU formulation.

Capability reference: utils/splat2d_cuda (splat_gpu_impl.cu:36-96 kernel,
splat_gpu.c:36-41 normalization). Semantics: scatter P sub-pixel points with
per-point C-channel values into an (N, C, H, W) canvas; each point deposits
exp(-(d^2)/(2 sigma^2)) over the pixel window [floor(p-2s), ceil(p+2s)]
clamped to the image; out-of-bounds points are skipped; the value canvas is
divided by (alpha + 1e-8), with soft_normalize clamping alpha to >= 1
(torch clamp(1.0) == clamp_min).

TPU design: the CUDA kernel's atomicAdd races are replaced by a single XLA
scatter-add over a static per-point footprint window (R x R with
R = 2*ceil(2*max_sigma)+3) — deterministic by construction. ``max_sigma``
bounds the window statically for jit; contributions outside the true
per-point dynamic window are masked to zero.
"""

import math
from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("soft_normalize", "max_sigma"))
def splat2d(input, coordinates, values, sigma, soft_normalize=False,
            max_sigma=8.0):
    """input: (N, C, H, W) canvas; coordinates: (N, P, 2) xy float;
    values: (N, P, C); sigma: (N,); returns (N, C, H, W)."""
    N, C, H, W = input.shape
    P = coordinates.shape[1]
    R = 2 * int(math.ceil(2 * float(max_sigma))) + 3

    x = coordinates[..., 0]  # (N, P)
    y = coordinates[..., 1]
    s = sigma[:, None]  # (N, 1)
    in_bounds = (x >= 0) & (x < W) & (y >= 0) & (y < H)  # (N, P)

    length = 2.0 * s
    t = jnp.maximum(0.0, jnp.floor(y - length))            # (N, P)
    b = jnp.minimum(H - 1.0, jnp.ceil(y + length))
    l = jnp.maximum(0.0, jnp.floor(x - length))
    r = jnp.minimum(W - 1.0, jnp.ceil(x + length))

    offs = jnp.arange(R, dtype=input.dtype)                # (R,)
    py = t[..., None] + offs                               # (N, P, R)
    px = l[..., None] + offs
    my = (py <= b[..., None]) & (py < H)
    mx = (px <= r[..., None]) & (px < W)

    normalizer = -1.0 / (2.0 * s * s)                      # (N, 1)
    gy = jnp.exp(normalizer[..., None] * (py - y[..., None]) ** 2)  # (N,P,R)
    gx = jnp.exp(normalizer[..., None] * (px - x[..., None]) ** 2)
    gy = gy * my.astype(input.dtype)
    gx = gx * mx.astype(input.dtype)
    alpha_w = gy[:, :, :, None] * gx[:, :, None, :]        # (N, P, R, R)
    alpha_w = alpha_w * in_bounds[:, :, None, None].astype(input.dtype)

    pyi = jnp.clip(py, 0, H - 1).astype(jnp.int32)
    pxi = jnp.clip(px, 0, W - 1).astype(jnp.int32)
    flat_idx = (pyi[:, :, :, None] * W + pxi[:, :, None, :])  # (N, P, R, R)
    flat_idx = flat_idx.reshape(N, P * R * R)

    aw = alpha_w.reshape(N, P * R * R)
    # alpha canvas
    alpha = jnp.zeros((N, H * W), input.dtype)
    alpha = jax.vmap(lambda a, idx, w: a.at[idx].add(w))(alpha, flat_idx, aw)
    # value canvas: scatter C channels at once
    vw = aw[:, :, None] * jnp.repeat(values, R * R, axis=1)  # (N, P*R*R, C)
    out = jnp.zeros((N, H * W, C), input.dtype)
    out = jax.vmap(lambda o, idx, v: o.at[idx].add(v))(out, flat_idx, vw)
    out = out.transpose(0, 2, 1).reshape(N, C, H, W) + input

    alpha = alpha.reshape(N, 1, H, W)
    if soft_normalize:
        alpha = jnp.maximum(alpha, 1.0)
    return out / (alpha + 1e-8)
