"""Pallas TPU kernels: bilinear grid sampling as one-hot tent matmuls.

XLA lowers big gathers on TPU to effectively-serial code (measured: 54-79ms
for a 40x12x256x256 -> 128^2 warp on v5e, vs 5.5ms for the whole STN
encoder). These kernels re-express bilinear sampling with zero gathers:

    out[p, c] = sum_h sum_w  WY[p, h] * img[c, h, w] * WX[p, w]

where WY/WX are per-point "tent" row/column weight vectors
(max(0, 1 - |coord - index|)) with at most 2 nonzeros. The H-contraction is
an MXU matmul per point-block; the W-contraction is a VPU multiply-reduce.
Tent weights reproduce PyTorch bilinear semantics exactly for all three
padding modes once coordinates are pre-transformed (clamp for border,
reflect+clamp for reflection, untouched for zeros — missing corners then get
zero tent weight automatically).

The backward pass is fused the same way (no scatters):
  d/d img:    dimg[h, cw] += WY^T @ (dout * WX)      (accumulating matmul)
  d/d coords: tent-derivative weights (+-1 inside the support) against the
              row/column projections of (img, dout).

Measured on v5e-1 (40x12x256^2 -> 128^2): forward 14ms vs 54-79ms XLA
gather; f32 mode is exact (7e-7), bf16 mode ~1e-2 on N(0,1) images.
"""

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gangealing_tpu.ops.grid_sample import _compute_coords


def _iota_f32(shape, dim):
    return jax.lax.broadcasted_iota(jnp.int32, shape, dim).astype(jnp.float32)


def _fwd_kernel(coords_ref, img_ref, out_ref, *, H, W, C, PB, compute_dtype):
    # coords: (1, PB, 2) f32; img: (1, H, C*W); out: (1, C, PB)
    x = coords_ref[0, :, 0]  # (PB,)
    y = coords_ref[0, :, 1]
    hh = _iota_f32((PB, H), 1)
    wy = jnp.maximum(0.0, 1.0 - jnp.abs(y[:, None] - hh))  # (PB, H)
    img = img_ref[0]  # (H, C*W)
    mm_precision = (jax.lax.Precision.HIGHEST
                    if compute_dtype == jnp.float32
                    else jax.lax.Precision.DEFAULT)
    rows = jnp.dot(wy.astype(compute_dtype), img.astype(compute_dtype),
                   preferred_element_type=jnp.float32,
                   precision=mm_precision)  # (PB, C*W)
    ww = _iota_f32((PB, W), 1)
    wx = jnp.maximum(0.0, 1.0 - jnp.abs(x[:, None] - ww))  # (PB, W)
    # W-contraction per 128-aligned channel group: a (PB, C*W) -> (PB, C, W)
    # reshape is a Mosaic relayout of the whole rows block (measured ~7ms at
    # batch 128) — lane slices + lane reductions avoid it entirely.
    outs = [jnp.sum(rows[:, c * W:(c + 1) * W] * wx, axis=1)
            for c in range(C)]
    out_ref[0] = jnp.stack(outs, axis=0)  # (C, PB)


def _dimg_kernel(coords_ref, dout_ref, dimg_ref, *, H, W, C, PB,
                 compute_dtype):
    # coords: (1, PB, 2); dout: (1, PB, C); dimg: (1, H, C*W) accumulated
    p = pl.program_id(1)

    @pl.when(p == 0)
    def _():
        dimg_ref[0] = jnp.zeros_like(dimg_ref[0])

    x = coords_ref[0, :, 0]
    y = coords_ref[0, :, 1]
    ww = _iota_f32((PB, W), 1)
    wx = jnp.maximum(0.0, 1.0 - jnp.abs(x[:, None] - ww))  # (PB, W)
    dout = dout_ref[0]  # (PB, C)
    B = jnp.concatenate([dout[:, c:c + 1] * wx for c in range(C)],
                        axis=1)  # (PB, C*W), no relayout
    hhT = _iota_f32((H, PB), 0)
    wyT = jnp.maximum(0.0, 1.0 - jnp.abs(y[None, :] - hhT))  # (H, PB)
    mm_precision = (jax.lax.Precision.HIGHEST
                    if compute_dtype == jnp.float32
                    else jax.lax.Precision.DEFAULT)
    dimg_ref[0] += jnp.dot(wyT.astype(compute_dtype),
                           B.astype(compute_dtype),
                           preferred_element_type=jnp.float32,
                           precision=mm_precision)


def _dcoords_kernel(coords_ref, img_ref, dout_ref, dc_ref, *, H, W, C, PB,
                    compute_dtype):
    # coords: (1, PB, 2); img: (1, H, C*W); dout: (1, PB, C);
    # dc: (1, PB, 2) gradients wrt the transformed coords
    x = coords_ref[0, :, 0]
    y = coords_ref[0, :, 1]
    img = img_ref[0]
    dout = dout_ref[0]  # (PB, C)
    mm_precision = (jax.lax.Precision.HIGHEST
                    if compute_dtype == jnp.float32
                    else jax.lax.Precision.DEFAULT)

    hh = _iota_f32((PB, H), 1)
    dy_h = y[:, None] - hh
    wy = jnp.maximum(0.0, 1.0 - jnp.abs(dy_h))  # (PB, H)
    ww = _iota_f32((PB, W), 1)
    dx_w = x[:, None] - ww
    wx = jnp.maximum(0.0, 1.0 - jnp.abs(dx_w))  # (PB, W)

    # d/dx: C_[p, w] = sum_c dout[p, c] * (WY @ img)[p, c, w]
    rows = jnp.dot(wy.astype(compute_dtype), img.astype(compute_dtype),
                   preferred_element_type=jnp.float32,
                   precision=mm_precision)  # (PB, C*W)
    C_ = sum(rows[:, c * W:(c + 1) * W] * dout[:, c:c + 1]
             for c in range(C))  # (PB, W), lane slices avoid the relayout
    # Right-derivative convention (torch/XLA): at integer x the active pair
    # is (floor(x), floor(x)+1), so dwx = -1 on [0,1) and +1 on [-1,0).
    dwx = (jnp.where((dx_w >= -1.0) & (dx_w < 0.0), 1.0, 0.0)
           - jnp.where((dx_w >= 0.0) & (dx_w < 1.0), 1.0, 0.0))
    dx = jnp.sum(dwx * C_, axis=1)  # (PB,)

    # d/dy: A[p, h] = sum_cw (dout x wx)[p, cw] * img[h, cw]
    B = jnp.concatenate([dout[:, c:c + 1] * wx for c in range(C)], axis=1)
    A = jax.lax.dot_general(B.astype(compute_dtype),
                            img.astype(compute_dtype),
                            dimension_numbers=(((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32,
                            precision=mm_precision)  # (PB, H)
    dwy = (jnp.where((dy_h >= -1.0) & (dy_h < 0.0), 1.0, 0.0)
           - jnp.where((dy_h >= 0.0) & (dy_h < 1.0), 1.0, 0.0))
    dy = jnp.sum(dwy * A, axis=1)  # (PB,)

    dc_ref[0] = jnp.stack([dx, dy], axis=-1)


def _pallas_sample(coords, img_t, H, W, C, PB, compute_dtype, interpret):
    """coords: (N, P_pad, 2) transformed; img_t: (N, H, C*W) ->
    (N, P_pad, C) f32."""
    N, P_pad, _ = coords.shape
    return pl.pallas_call(
        functools.partial(_fwd_kernel, H=H, W=W, C=C, PB=PB,
                          compute_dtype=compute_dtype),
        grid=(N, P_pad // PB),
        in_specs=[
            pl.BlockSpec((1, PB, 2), lambda n, p: (n, p, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H, C * W), lambda n, p: (n, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, C, PB), lambda n, p: (n, 0, p),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, C, P_pad), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * N * P_pad * H * C * W,
            bytes_accessed=N * (H * C * W * 4 + P_pad * (2 + C) * 4),
            transcendentals=0),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=interpret,
    )(coords, img_t)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6))
def _sample_core(coords, img_t, H, W, C, PB, interpret_precision):
    precision, interpret = interpret_precision
    dtype = jnp.bfloat16 if precision == "bf16" else jnp.float32
    return _pallas_sample(coords, img_t, H, W, C, PB, dtype, interpret)


def _sample_core_fwd(coords, img_t, H, W, C, PB, interpret_precision):
    out = _sample_core(coords, img_t, H, W, C, PB, interpret_precision)
    return out, (coords, img_t)


def _sample_core_bwd(H, W, C, PB, interpret_precision, residuals, g):
    precision, interpret = interpret_precision
    dtype = jnp.bfloat16 if precision == "bf16" else jnp.float32
    coords, img_t = residuals
    N, P_pad, _ = coords.shape
    # fwd emits (N, C, P_pad); the bwd kernels consume per-point (PB, C)
    # dout blocks, so transpose the cotangent once here (cheap XLA copy).
    g = g.astype(jnp.float32).transpose(0, 2, 1)
    # bwd uses a smaller block: _dcoords holds img+rows+B in VMEM at once;
    # halve until the scratch estimate fits scoped VMEM (wide C*W otherwise
    # blows the 16M limit, e.g. the 12-channel folded mipmap path)
    PBB = min(PB, 256)
    while PBB > 64 and H * C * W * 4 + 3 * PBB * C * W * 4 > 10 * 2 ** 20:
        PBB //= 2
    # The grid below floors P_pad / PBB, so PBB must divide P_pad or the
    # tail points would silently get no gradient (P_pad is a multiple of
    # the FORWARD block PB, which need not be a multiple of PBB when a
    # non-power-of-two GANGEALING_POINT_BLOCK override is in effect).
    while P_pad % PBB:
        PBB //= 2
    dimg = pl.pallas_call(
        functools.partial(_dimg_kernel, H=H, W=W, C=C, PB=PBB,
                          compute_dtype=dtype),
        grid=(N, P_pad // PBB),
        in_specs=[
            pl.BlockSpec((1, PBB, 2), lambda n, p: (n, p, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, PBB, C), lambda n, p: (n, p, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, H, C * W), lambda n, p: (n, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, H, C * W), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * N * P_pad * H * C * W,
            bytes_accessed=N * (H * C * W * 4 + P_pad * (2 + C) * 4),
            transcendentals=0),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=interpret,
    )(coords, g)
    dcoords = pl.pallas_call(
        functools.partial(_dcoords_kernel, H=H, W=W, C=C, PB=PBB,
                          compute_dtype=dtype),
        grid=(N, P_pad // PBB),
        in_specs=[
            pl.BlockSpec((1, PBB, 2), lambda n, p: (n, p, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H, C * W), lambda n, p: (n, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, PBB, C), lambda n, p: (n, p, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, PBB, 2), lambda n, p: (n, p, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, P_pad, 2), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=4 * N * P_pad * H * C * W,
            bytes_accessed=N * (H * C * W * 4 + P_pad * (2 + C) * 4),
            transcendentals=0),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=interpret,
    )(coords, img_t, g)
    return dcoords, dimg


_sample_core.defvjp(_sample_core_fwd, _sample_core_bwd)


@functools.partial(jax.jit, static_argnames=("padding_mode", "align_corners",
                                             "point_block", "precision",
                                             "interpret"))
def grid_sample_mxu(input, grid, padding_mode="border", align_corners=False,
                    point_block=512, precision="bf16", interpret=False):
    """Drop-in bilinear grid_sample for (N, C, H, W) x (N, Ho, Wo, 2),
    differentiable end to end (fused Pallas forward AND backward).

    precision: 'bf16' (MXU full rate, ~3 decimal digits on the matmul
    stages) or 'f32' (exact, reduced rate).
    """
    N, C, H, W = input.shape
    Ho, Wo = grid.shape[1], grid.shape[2]
    P = Ho * Wo
    # Forward point-block size: prefer 1024 when it divides P exactly and
    # the VMEM blocks fit (~3% faster than 512 on flagship shapes, measured
    # on v5e); GANGEALING_POINT_BLOCK overrides for tuning. The env is read
    # at TRACE time: changing it after a shape has compiled is ignored by
    # the jit cache — set it before first use (or jax.clear_caches()).
    env_pb = os.environ.get("GANGEALING_POINT_BLOCK")
    if env_pb is not None:
        PB = int(env_pb)
        if PB < 8:
            raise ValueError(
                f"GANGEALING_POINT_BLOCK={env_pb!r} must be an int >= 8")
    else:
        PB = point_block
        if (P % 1024 == 0 and H * C * W * 4 + 1024 * C * W * 4
                + 1024 * (H + W) * 8 < 12 * 2 ** 20):
            PB = max(PB, 1024)
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
    # Materialize the coords operand so XLA cannot fuse (and re-execute) the
    # coordinate transform into per-block pallas operand reads.
    coords = jax.lax.optimization_barrier(coords)
    out = _sample_core(coords, img_t, H, W, C, PB, (precision, interpret))
    out = out[..., :P].reshape(N, C, Ho, Wo)  # fwd emits (N, C, P_pad)
    return out.astype(input.dtype)


# Backward-compat alias (the VJP is now built in).
grid_sample_mxu_diff = grid_sample_mxu


def mxu_kernel_fits(input, point_block=512):
    """Feasibility check: VMEM budget for the kernel's blocks, plus Mosaic
    layout constraints (per-channel lane slices of the (PB, C*W) rows block
    require the group width W to be a multiple of the 128-lane tile)."""
    point_block = int(os.environ.get("GANGEALING_POINT_BLOCK", point_block))
    N, C, H, W = input.shape
    if W % 128 != 0 or H % 8 != 0:
        return False
    img_bytes = H * C * W * 4
    rows_bytes = point_block * C * W * 4
    return img_bytes + rows_bytes + point_block * (H + W) * 8 < 12 * 2 ** 20
