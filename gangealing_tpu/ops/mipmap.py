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


_GB2X_MATRIX_CACHE = {}


def _gaussian_blur_2x_matrix(H):
    """(H/2, H) banded matrix: [1,3,3,1]/8 taps, reflect pad 1, stride 2.
    Reflection folds into the matrix (source j=-1 reads row 1, j=H reads
    H-2), so the whole blur-downsample is one MXU matmul per axis."""
    import numpy as np
    got = _GB2X_MATRIX_CACHE.get(H)
    if got is not None:
        return got
    k1 = np.array([1.0, 3.0, 3.0, 1.0], dtype=np.float32) / 8.0
    Ho = (H + 2 - 4) // 2 + 1
    M = np.zeros((Ho, H), np.float32)
    for h in range(Ho):
        for t in range(4):
            j = 2 * h + t - 1
            j = 1 if j == -1 else (H - 2 if j == H else j)
            M[h, j] += k1[t]
    _GB2X_MATRIX_CACHE[H] = M
    return M


def _gaussian_blur_2x(x):
    """[1,3,3,1] outer-product blur, reflection pad 1, stride 2.
    Separable: two 1-D passes (exact; half the work). On TPU the passes run
    as banded-matrix matmuls (depthwise convs pay NCHW<->NHWC relayouts)."""
    import os
    import numpy as np
    from gangealing_tpu.ops.resample import _backend_is_tpu
    N, C, H, W = x.shape
    if _backend_is_tpu():
        Mv = jnp.asarray(_gaussian_blur_2x_matrix(H)).astype(x.dtype)
        Mh = jnp.asarray(_gaussian_blur_2x_matrix(W)).astype(x.dtype)
        prec = os.environ.get("GANGEALING_FIR_PRECISION", "default")
        y = x.reshape(N * C, H, W)
        out = jnp.matmul(Mv, y, precision=prec)
        out = jnp.matmul(out, Mh.T, precision=prec)
        return out.reshape(N, C, Mv.shape[0], Mh.shape[0])
    k1 = np.array([1.0, 3.0, 3.0, 1.0], dtype=np.float32)
    k1 = k1 / np.sqrt((np.outer(k1, k1)).sum())  # so kv*kh == k/16 exactly
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


def _mipmap_warp_fold(inputs, grid, num_levels, levels, padding_mode):
    """Generic path: warp all levels at full resolution as folded channels,
    then tent-lerp over the level axis. Exact; pays D x the sampling FLOPs."""
    N, C, H, W = inputs.shape
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


def _band_tent_coords(x, y, levels, H, num_levels, zeros_mode=False):
    """Pack per-point kernel coords for the banded Pallas sampler.

    x, y: (N, P) padding-transformed full-res coords; levels: (N, P).
    Returns (N, P, 16) [x, m0..m3, a0..a3, pad] — see ops/pallas_mipmap.py.

    The centers/amplitudes decompose tent_y^T . U_H exactly, where U_H is
    interpolate_bilinear's row matrix (ops/resample.py:_resize_axis_weights):
    fine row i reads coarse src = (i+0.5)*2^-d - 0.5 clipped to [0, Hc-1],
    with tent weights — so composed weights are two tents per band, centered
    at those src coords, scaled by the fine tent weights (t0, t1) and the
    floor/ceil level-lerp weights (1-lw, lw).
    """
    f = jnp.clip(jnp.floor(levels), 0.0, float(num_levels - 2))
    lw = levels - f
    i0 = jnp.floor(y)
    i1 = i0 + 1.0
    t1 = y - i0
    t0 = 1.0 - t1
    # Mirror XLA grid_sample's edge handling exactly: values are read at
    # CLIPPED row indices while weights come from the unclipped tent (so the
    # d/dy subgradient at a clamped border is 0, like the fold path); the
    # validity mask zeroes amplitudes only in zeros mode (y unclamped there).
    if zeros_mode:
        v0 = ((i0 >= 0) & (i0 <= H - 1)).astype(y.dtype)
        v1 = ((i1 >= 0) & (i1 <= H - 1)).astype(y.dtype)
    else:
        v0 = v1 = jnp.ones_like(y)
    i0c = jnp.clip(i0, 0.0, float(H - 1))
    i1c = jnp.clip(i1, 0.0, float(H - 1))

    def band(d, amp):
        inv = jnp.exp2(-d)           # exact for small integer d
        hc = H * inv                 # band height H / 2^d
        off = 2.0 * H * (1.0 - inv)  # global row offset: sum_{k<d} H/2^k
        c0 = jnp.clip((i0c + 0.5) * inv - 0.5, 0.0, hc - 1.0)
        c1 = jnp.clip((i1c + 0.5) * inv - 0.5, 0.0, hc - 1.0)
        return (off + c0, amp * t0 * v0), (off + c1, amp * t1 * v1)

    (m0, a0), (m1, a1) = band(f, 1.0 - lw)
    (m2, a2), (m3, a3) = band(f + 1.0, lw)
    zeros = jnp.zeros_like(x)
    return jnp.stack([x, m0, m1, m2, m3, a0, a1, a2, a3]
                     + [zeros] * 7, axis=-1)


def _mipmap_warp_banded(inputs, grid, num_levels, levels, padding_mode,
                        precision="bf16", interpret=False):
    """TPU path: sample a coarse-height band stack with fused multi-tent
    weights — ~2.1x fewer matmul FLOPs than the fold path, numerically
    identical (see ops/pallas_mipmap.py)."""
    from gangealing_tpu.ops.pallas_mipmap import mipmap_sample
    from gangealing_tpu.ops.grid_sample import _compute_coords

    N, C, H, W = inputs.shape
    Ho, Wo = grid.shape[1], grid.shape[2]
    P = Ho * Wo

    # coarse Gaussian pyramid; width upsampled back to W, height kept coarse
    smalls = [inputs.astype(jnp.float32)]
    for _ in range(1, num_levels):
        smalls.append(_gaussian_blur_2x(smalls[-1]))
    bands = [smalls[0]] + [
        interpolate_bilinear(s, s.shape[-2], W) for s in smalls[1:]]
    stack_t = jnp.concatenate(
        [b.transpose(0, 2, 1, 3).reshape(N, b.shape[-2], C * W)
         for b in bands], axis=1)  # (N, R, C*W)

    gx = _compute_coords(grid[..., 0].astype(jnp.float32).reshape(N, P),
                         W, padding_mode, False)
    gy = _compute_coords(grid[..., 1].astype(jnp.float32).reshape(N, P),
                         H, padding_mode, False)
    coords = _band_tent_coords(gx, gy, levels.reshape(N, P), H, num_levels,
                               zeros_mode=(padding_mode == "zeros"))
    # Materialize the coords operand: without this barrier XLA fuses the
    # 16-slot tent construction into the pallas_call operand and re-executes
    # it per grid block (measured 23ms vs 8.5ms for the whole warp). The
    # stack is deliberately NOT barriered so XLA can CSE it across the two
    # warps of a composed STN (both sample the same source image).
    coords = jax.lax.optimization_barrier(coords)
    out = mipmap_sample(coords, stack_t, W, C, precision=precision,
                        interpret=interpret)  # (N, C, P)
    return out.reshape(N, C, Ho, Wo).astype(inputs.dtype)


@partial(jax.jit, static_argnames=("max_num_levels", "padding_mode",
                                   "min_level", "force_path"))
def mipmap_warp(inputs, grid, max_num_levels=3.5, min_level=0.0,
                padding_mode="border", force_path=None):
    """Anti-aliased grid_sample: per-pixel mipmap level selection.

    inputs: (N, C, H, W); grid: (N, Ho, Wo, 2) normalized to [-1, 1].
    force_path: None (auto) | 'banded' | 'fold' (tests/debugging).
    """
    import os
    N, C, H, W = inputs.shape
    num_levels = int(math.ceil(max_num_levels - 1.0)) + 1

    levels = mipmap_levels(grid, H, W, max_num_levels)  # (N, Ho, Wo)
    levels = jnp.maximum(levels, min_level)

    path = force_path or os.environ.get("GANGEALING_MIPMAP")
    if path is None:
        from gangealing_tpu.ops.grid_sample import _default_backend_is_tpu
        from gangealing_tpu.ops.pallas_mipmap import mipmap_mxu_fits
        pow2 = H == W and (H & (H - 1)) == 0
        big = grid.shape[1] * grid.shape[2] >= 2048
        path = ("banded" if pow2 and big and _default_backend_is_tpu()
                and mipmap_mxu_fits(H, W, C, num_levels) else "fold")
    if path == "banded":
        precision = os.environ.get("GANGEALING_GS_PRECISION", "bf16")
        return _mipmap_warp_banded(inputs, grid, num_levels, levels,
                                   padding_mode, precision=precision)
    return _mipmap_warp_fold(inputs, grid, num_levels, levels, padding_mode)
