"""Pallas TPU kernel: bilinear grid sampling as one-hot tent matmuls.

XLA lowers big gathers on TPU to effectively-serial code (measured: 72ms for
a 40x12x256x256 -> 128^2 warp on v5e, vs 5.5ms for the whole STN encoder).
This kernel re-expresses bilinear sampling with zero gathers:

    out[p, c] = sum_h sum_w  WY[p, h] * img[c, h, w] * WX[p, w]

where WY/WX are per-point "tent" row/column weight vectors
(max(0, 1 - |coord - index|)) with at most 2 nonzeros. The H-contraction is
an MXU matmul per point-block; the W-contraction is a VPU multiply-reduce.
Tent weights reproduce PyTorch bilinear semantics exactly for all three
padding modes once coordinates are pre-transformed (clamp for border,
reflect+clamp for reflection, untouched for zeros — missing corners then
get zero tent weight automatically).

Per-block VMEM: img (H, C*W) + rows (PB, C*W) + tents. FLOPs: P*H*C*W*2 —
dense, but it rides the MXU at full rate, beating the gather by ~10-20x.
"""

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gangealing_tpu.ops.grid_sample import _compute_coords


def _kernel(coords_ref, img_ref, out_ref, *, H, W, C, PB, compute_dtype):
    # coords: (1, PB, 2) f32; img: (1, H, C*W); out: (1, PB, C)
    x = coords_ref[0, :, 0]  # (PB,)
    y = coords_ref[0, :, 1]
    hh = jax.lax.broadcasted_iota(jnp.int32, (PB, H), 1).astype(jnp.float32)
    wy = jnp.maximum(0.0, 1.0 - jnp.abs(y[:, None] - hh))  # (PB, H)
    img = img_ref[0]  # (H, C*W)
    mm_precision = (jax.lax.Precision.HIGHEST
                    if compute_dtype == jnp.float32
                    else jax.lax.Precision.DEFAULT)
    rows = jnp.dot(wy.astype(compute_dtype), img.astype(compute_dtype),
                   preferred_element_type=jnp.float32,
                   precision=mm_precision)  # (PB, C*W)
    ww = jax.lax.broadcasted_iota(jnp.int32, (PB, W), 1).astype(jnp.float32)
    wx = jnp.maximum(0.0, 1.0 - jnp.abs(x[:, None] - ww))  # (PB, W)
    rows = rows.reshape(PB, C, W)
    out_ref[0] = jnp.sum(rows * wx[:, None, :].astype(rows.dtype), axis=2)


@functools.partial(jax.jit, static_argnames=("padding_mode", "align_corners",
                                             "point_block", "precision",
                                             "interpret"))
def grid_sample_mxu(input, grid, padding_mode="border", align_corners=False,
                    point_block=512, precision="bf16", interpret=False):
    """Drop-in grid_sample (bilinear) for (N, C, H, W) x (N, Ho, Wo, 2).

    precision: 'bf16' (MXU full rate, ~3 decimal digits on the H-stage) or
    'f32' (exact, ~1/4 rate).
    """
    N, C, H, W = input.shape
    Ho, Wo = grid.shape[1], grid.shape[2]
    P = Ho * Wo
    PB = point_block
    P_pad = ((P + PB - 1) // PB) * PB

    gx = _compute_coords(grid[..., 0].astype(jnp.float32).reshape(N, P),
                         W, padding_mode, align_corners)
    gy = _compute_coords(grid[..., 1].astype(jnp.float32).reshape(N, P),
                         H, padding_mode, align_corners)
    coords = jnp.stack([gx, gy], axis=-1)  # (N, P, 2)
    if P_pad != P:
        coords = jnp.pad(coords, ((0, 0), (0, P_pad - P), (0, 0)),
                         constant_values=-10.0)

    img_t = input.transpose(0, 2, 1, 3).reshape(N, H, C * W)
    compute_dtype = jnp.bfloat16 if precision == "bf16" else jnp.float32

    out = pl.pallas_call(
        functools.partial(_kernel, H=H, W=W, C=C, PB=PB,
                          compute_dtype=compute_dtype),
        grid=(N, P_pad // PB),
        in_specs=[
            pl.BlockSpec((1, PB, 2), lambda n, p: (n, p, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H, C * W), lambda n, p: (n, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, PB, C), lambda n, p: (n, p, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, P_pad, C), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * N * P_pad * H * C * W,
            bytes_accessed=N * (H * C * W * 4 + P_pad * (2 + C) * 4),
            transcendentals=0),
        interpret=interpret,
    )(coords, img_t)

    out = out[:, :P].transpose(0, 2, 1).reshape(N, C, Ho, Wo)
    return out.astype(input.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6))
def grid_sample_mxu_diff(input, grid, padding_mode="border",
                         align_corners=False, point_block=512,
                         precision="bf16", interpret=False):
    """Differentiable wrapper: MXU kernel forward, XLA-transpose backward.

    The backward pass re-expresses through the XLA gather formulation's VJP
    (exact bilinear transpose: scatter-add for d/d input, tent-derivative
    weights for d/d grid). A fused Pallas backward is a planned
    optimization; gradients are correct either way.
    """
    return grid_sample_mxu(input, grid, padding_mode=padding_mode,
                           align_corners=align_corners,
                           point_block=point_block, precision=precision,
                           interpret=interpret)


def _gs_mxu_fwd(input, grid, padding_mode, align_corners, point_block,
                precision, interpret):
    out = grid_sample_mxu(input, grid, padding_mode=padding_mode,
                          align_corners=align_corners,
                          point_block=point_block, precision=precision,
                          interpret=interpret)
    return out, (input, grid)


def _gs_mxu_bwd(padding_mode, align_corners, point_block, precision,
                interpret, residuals, g):
    from gangealing_tpu.ops.grid_sample import grid_sample
    input, grid = residuals
    _, vjp = jax.vjp(
        lambda i, gr: grid_sample(i, gr, padding_mode=padding_mode,
                                  align_corners=align_corners), input, grid)
    return vjp(g)


grid_sample_mxu_diff.defvjp(_gs_mxu_fwd, _gs_mxu_bwd)


def mxu_kernel_fits(input, point_block=512):
    """VMEM feasibility check for the kernel's blocks."""
    N, C, H, W = input.shape
    img_bytes = H * C * W * 4
    rows_bytes = point_block * C * W * 4
    return img_bytes + rows_bytes + point_block * (H + W) * 8 < 12 * 2 ** 20
