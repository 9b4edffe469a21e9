"""Pallas TPU kernel: fused mipmap sampling over a coarse-height band stack.

The generic path (ops/mipmap.py XLA fold) warps all D Gaussian levels at full
resolution as a folded (N, C*D, H, W) image — the tent-matmul then contracts
over H x (C*D*W), paying D x the FLOPs of a plain warp even though each output
pixel reads exactly two levels.

This kernel cuts that cost ~2.1x with an EXACT reformulation. Level d is
stored at its native coarse height (H/2^d rows, width upsampled back to W),
stacked into one tall image of R = sum_d H/2^d rows. Bilinear resize is
separable, so the reference's full-resolution level satisfies

    L_d = U_H . small_d . U_W^T
    sample(L_d, y, x) = (tent_y^T U_H) . (small_d U_W^T) . tent_x

i.e. sampling the W-upsampled coarse band with *composed* row weights
(tent_y^T U_H) reproduces upsample-then-sample bit-for-bit (up to f32
rounding). tent_y has two nonzeros (rows i0, i1 = i0+1, weights t0, t1) and
each row of U_H is itself a tent, so the composed row weights are a sum of
at most 2 tents per active level — with the floor/ceil level-lerp folded in,
each point's full weight vector over the R-row stack is a sum of K=4 tents

    wy[p, r] = sum_k a_k * max(0, 1 - |m_k - r|)

with per-point centers m_k (into global stack rows) and amplitudes a_k
(tent row weight x level lerp weight). The kernel evaluates the K tents and
runs the same matmul pipeline as ops/pallas_grid_sample.py:

    out[p, c] = sum_r wy[p, r] * stack[r, c*W + w] * wx[p, w]

Backward is fused the same way (no scatters): d/d stack via an accumulating
wy^T matmul; d/d x via tent-derivative weights; d/d a_k via the row
projection A = (dout x wx) @ stack^T contracted with each tent. Centers m_k
are piecewise-constant in (y, level), so their gradient is exactly zero; the
chain rule into grid coordinates and mipmap levels flows through the
amplitude construction in ops/mipmap.py (plain jax autodiff).

Capability reference: antialiased_sampling.py:19-238 (MipmapWarp).

Layout note (r4, measured): the (N, P, 16) coords operand costs a
1.9ms/warp XLA relayout copy at the flagship batch-128 shape (its
producer's natural layout is P-minor; pallas_call requires row-major).
Two slot-major (N, 16, P) kernel rewrites were built and measured on a
v5e chip: (a) fully transposed point-in-lanes math (sublane-contraction
dot_generals), (b) an in-kernel (16, PB) block transpose feeding this
kernel body unchanged. They ran 44ms and 49ms per warp vs 12.7ms for
this version — Mosaic lowers sublane-contraction matmuls and
sub-128-lane transposes poorly — so the copy stays as a characterized
residual (see benchmarks/encoder_layout.py for the experiment record).
"""

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# coords slot layout (lane dim 16):
#   0: x (transformed full-res column coordinate)
#   1..4: m_k tent centers (global stack rows)
#   5..8: a_k tent amplitudes
#   9..15: zero padding
NUM_TENTS = 4
COORD_LANES = 16


def _iota_f32(shape, dim):
    return jax.lax.broadcasted_iota(jnp.int32, shape, dim).astype(jnp.float32)


def _multi_tent_wy(coords, PB, R):
    """(1, PB, 16) coords block -> (PB, R) combined row weights."""
    rr = _iota_f32((PB, R), 1)
    wy = jnp.zeros((PB, R), jnp.float32)
    for k in range(NUM_TENTS):
        m = coords[0, :, 1 + k]
        a = coords[0, :, 1 + NUM_TENTS + k]
        wy += a[:, None] * jnp.maximum(0.0, 1.0 - jnp.abs(m[:, None] - rr))
    return wy


def _fwd_kernel(coords_ref, img_ref, out_ref, *, R, W, C, PB, compute_dtype):
    # coords: (1, PB, 16) f32; img: (1, R, C*W); out: (1, C, PB)
    x = coords_ref[0, :, 0]
    wy = _multi_tent_wy(coords_ref, PB, R)
    img = img_ref[0]  # (R, C*W)
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


def _dimg_kernel(coords_ref, dout_ref, dimg_ref, *, R, W, C, PB,
                 compute_dtype):
    # coords: (1, PB, 16); dout: (1, PB, C); dimg: (1, R, C*W) accumulated
    p = pl.program_id(1)

    @pl.when(p == 0)
    def _():
        dimg_ref[0] = jnp.zeros_like(dimg_ref[0])

    x = coords_ref[0, :, 0]
    ww = _iota_f32((PB, W), 1)
    wx = jnp.maximum(0.0, 1.0 - jnp.abs(x[:, None] - ww))
    dout = dout_ref[0]  # (PB, C)
    B = jnp.concatenate([dout[:, c:c + 1] * wx for c in range(C)],
                        axis=1)  # (PB, C*W), no relayout
    wy = _multi_tent_wy(coords_ref, PB, R)  # (PB, R)
    mm_precision = (jax.lax.Precision.HIGHEST
                    if compute_dtype == jnp.float32
                    else jax.lax.Precision.DEFAULT)
    dimg_ref[0] += jax.lax.dot_general(
        wy.astype(compute_dtype), B.astype(compute_dtype),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=mm_precision)  # wy^T @ B: (R, C*W)


def _dcoords_kernel(coords_ref, img_ref, dout_ref, dc_ref, *, R, W, C, PB,
                    compute_dtype):
    # dc: (1, PB, 16): slot 0 = dx; slots 5..8 = da_k; m slots get 0.
    x = coords_ref[0, :, 0]
    img = img_ref[0]  # (R, C*W)
    dout = dout_ref[0]  # (PB, C)
    mm_precision = (jax.lax.Precision.HIGHEST
                    if compute_dtype == jnp.float32
                    else jax.lax.Precision.DEFAULT)

    ww = _iota_f32((PB, W), 1)
    dx_w = x[:, None] - ww
    wx = jnp.maximum(0.0, 1.0 - jnp.abs(dx_w))  # (PB, W)
    wy = _multi_tent_wy(coords_ref, PB, R)  # (PB, R)

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

    # A[p, r] = sum_cw (dout x wx)[p, cw] * img[r, cw]
    B = jnp.concatenate([dout[:, c:c + 1] * wx for c in range(C)], axis=1)
    A = jax.lax.dot_general(B.astype(compute_dtype),
                            img.astype(compute_dtype),
                            dimension_numbers=(((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32,
                            precision=mm_precision)  # (PB, R)

    rr = _iota_f32((PB, R), 1)
    das = []
    for k in range(NUM_TENTS):
        m = coords_ref[0, :, 1 + k]
        tent = jnp.maximum(0.0, 1.0 - jnp.abs(m[:, None] - rr))
        das.append(jnp.sum(tent * A, axis=1))  # (PB,)
    zeros = jnp.zeros_like(dx)
    dc_ref[0] = jnp.stack(
        [dx] + [zeros] * NUM_TENTS + das
        + [zeros] * (COORD_LANES - 1 - 2 * NUM_TENTS), axis=-1)


def _pallas_call_common(kernel, grid, in_specs, out_specs, out_shape,
                        flops, interpret):
    return pl.pallas_call(
        kernel, grid=grid, in_specs=in_specs, out_specs=out_specs,
        out_shape=out_shape,
        cost_estimate=pl.CostEstimate(flops=flops, bytes_accessed=flops // 4,
                                      transcendentals=0),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=interpret)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6))
def _mt_sample_core(coords, img_t, R, W, C, PB, interpret_precision):
    precision, interpret = interpret_precision
    dtype = jnp.bfloat16 if precision == "bf16" else jnp.float32
    N, P_pad, _ = coords.shape
    return _pallas_call_common(
        functools.partial(_fwd_kernel, R=R, W=W, C=C, PB=PB,
                          compute_dtype=dtype),
        grid=(N, P_pad // PB),
        in_specs=[
            pl.BlockSpec((1, PB, COORD_LANES), lambda n, p: (n, p, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, R, C * W), lambda n, p: (n, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, C, PB), lambda n, p: (n, 0, p),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, C, P_pad), jnp.float32),
        flops=2 * N * P_pad * R * C * W,
        interpret=interpret)(coords, img_t)


def _mt_sample_fwd(coords, img_t, R, W, C, PB, interpret_precision):
    out = _mt_sample_core(coords, img_t, R, W, C, PB, interpret_precision)
    return out, (coords, img_t)


def _mt_sample_bwd(R, W, C, PB, interpret_precision, residuals, g):
    precision, interpret = interpret_precision
    dtype = jnp.bfloat16 if precision == "bf16" else jnp.float32
    coords, img_t = residuals
    N, P_pad, _ = coords.shape
    # fwd emits (N, C, P_pad); the bwd kernels consume per-point (PB, C)
    # dout blocks, so transpose the cotangent once here (cheap XLA copy).
    g = g.astype(jnp.float32).transpose(0, 2, 1)
    # bwd block: halve until the img+rows+B scratch estimate fits scoped VMEM
    PBB = min(PB, 256)
    while PBB > 64 and R * C * W * 4 + 3 * PBB * C * W * 4 > 10 * 2 ** 20:
        PBB //= 2
    # PBB must divide P_pad (grids floor): with a non-power-of-two
    # GANGEALING_POINT_BLOCK override, P_pad is a multiple of PB only, and
    # an uncovered tail would silently drop gradients.
    while P_pad % PBB:
        PBB //= 2
    dimg = _pallas_call_common(
        functools.partial(_dimg_kernel, R=R, W=W, C=C, PB=PBB,
                          compute_dtype=dtype),
        grid=(N, P_pad // PBB),
        in_specs=[
            pl.BlockSpec((1, PBB, COORD_LANES), lambda n, p: (n, p, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, PBB, C), lambda n, p: (n, p, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, R, C * W), lambda n, p: (n, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, R, C * W), jnp.float32),
        flops=2 * N * P_pad * R * C * W,
        interpret=interpret)(coords, g)
    dcoords = _pallas_call_common(
        functools.partial(_dcoords_kernel, R=R, W=W, C=C, PB=PBB,
                          compute_dtype=dtype),
        grid=(N, P_pad // PBB),
        in_specs=[
            pl.BlockSpec((1, PBB, COORD_LANES), lambda n, p: (n, p, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, R, C * W), lambda n, p: (n, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, PBB, C), lambda n, p: (n, p, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, PBB, COORD_LANES), lambda n, p: (n, p, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, P_pad, COORD_LANES), jnp.float32),
        flops=4 * N * P_pad * R * C * W,
        interpret=interpret)(coords, img_t, g)
    return dcoords, dimg


_mt_sample_core.defvjp(_mt_sample_fwd, _mt_sample_bwd)


def mipmap_sample(coords, stack_t, W, C, point_block=512, precision="bf16",
                  interpret=False):
    """Sample a band stack with per-point multi-tent row weights.

    coords: (N, P, 16) f32, slot layout above (built by ops/mipmap.py).
    stack_t: (N, R, C*W) band stack (level d occupies H/2^d rows).
    Returns (N, C, P) f32. Fully differentiable (fused Pallas fwd + bwd).
    """
    N, P, _ = coords.shape
    _, R, CW = stack_t.shape
    assert CW == C * W
    # Forward point-block size. Bigger blocks amortize per-grid-step
    # overhead: 1024 is ~3% faster than 512 on the flagship 256->128 warp
    # (measured batch-128 full forward on v5e), so prefer it whenever it
    # divides P exactly (no padding waste) and the kernel's VMEM blocks
    # still fit. The backward kernels cap their own block at 256 and are
    # unaffected. GANGEALING_POINT_BLOCK overrides for tuning; it is read
    # at TRACE time, so set it before the first compile of a shape (the
    # jit cache does not key on env vars — use jax.clear_caches() between
    # sweep points).
    env_pb = os.environ.get("GANGEALING_POINT_BLOCK")
    if env_pb is not None:
        PB = int(env_pb)
        if PB < 8:
            raise ValueError(
                f"GANGEALING_POINT_BLOCK={env_pb!r} must be an int >= 8")
    else:
        PB = point_block
        if (P % 1024 == 0 and R * CW * 4 + 1024 * CW * 4 + 2 * 1024 * R * 4
                < 12 * 2 ** 20):
            PB = max(PB, 1024)
    P_pad = ((P + PB - 1) // PB) * PB
    if P_pad != P:
        coords = jnp.pad(coords, ((0, 0), (0, P_pad - P), (0, 0)))
    out = _mt_sample_core(coords, stack_t, R, W, C, PB,
                          (precision, interpret))
    return out[..., :P]


def mipmap_mxu_fits(H, W, C, num_levels, point_block=512):
    """VMEM + Mosaic layout feasibility for the band-stack kernel."""
    point_block = int(os.environ.get("GANGEALING_POINT_BLOCK", point_block))
    if W % 128 != 0 or H % 8 != 0:
        return False
    R = sum(H >> d for d in range(num_levels))
    if R % 8 != 0:
        return False
    img_bytes = R * C * W * 4
    rows_bytes = point_block * C * W * 4
    wy_bytes = point_block * R * 4
    return img_bytes + rows_bytes + 2 * wy_bytes < 12 * 2 ** 20
