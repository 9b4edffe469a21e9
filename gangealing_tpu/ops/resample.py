"""Fused up/FIR/down resampling and activation primitives (TPU-native).

These are the JAX/XLA equivalents of the reference's CUDA ops:
  * ``upfirdn2d``  — capability reference models/stylegan2/op/upfirdn2d.py:145
    (CUDA kernel op/upfirdn2d_kernel.cu). Implemented here as a single
    ``lax.conv_general_dilated`` with lhs dilation (zero-insertion upsample),
    asymmetric padding and window strides (downsample) — XLA lowers this onto
    the MXU/VPU directly and differentiates it with the exact transpose-conv
    rule the reference hand-rolls via its "g_pad" trick.
  * ``fused_leaky_relu`` — capability reference op/fused_act.py:86
    (CUDA kernel op/fused_bias_act_kernel.cu). bias-add + leaky-ReLU + scale
    is a single fused elementwise HLO under jit; no custom kernel needed on
    TPU (XLA fuses it into the producing conv's epilogue).
  * ``bilinear_downsample`` — capability reference
    models/spatial_transformers/antialiased_sampling.py:241 (separable tent
    filter with reflection padding).
  * ``interpolate_bilinear`` — torch.nn.functional.interpolate(mode='bilinear',
    align_corners=False, antialias=False) semantics, used for flow-field
    resizing (warping_heads.py:249-251). Separable weighted gathers.
"""

import jax.numpy as jnp
from jax import lax

_DN = lax.conv_dimension_numbers((1, 1, 1, 1), (1, 1, 1, 1),
                                 ("NCHW", "OIHW", "NCHW"))


def make_kernel(k):
    """1-D or 2-D FIR kernel, normalized to sum 1 (reference networks.py:17)."""
    k = jnp.asarray(k, dtype=jnp.float32)
    if k.ndim == 1:
        k = k[None, :] * k[:, None]
    return k / jnp.sum(k)


def upfirdn2d(x, kernel, up=1, down=1, pad=(0, 0)):
    """Upsample (zero-insert), FIR filter, downsample — in one fused conv.

    x: (N, C, H, W); kernel: (kh, kw). ``pad`` is (pad0, pad1) applied to both
    spatial dims. Output H' = (H*up + pad0 + pad1 - kh)//down + 1.
    """
    return upfirdn2d_general(x, kernel, up, up, down, down,
                             pad[0], pad[1], pad[0], pad[1])


def _separable_factors(kernel):
    """If the (concrete) 2-D FIR kernel is rank-1, return exact 1-D factors
    (kv, kh) with kv kh^T == kernel; else None. All the reference's blur
    kernels (outer products of [1,3,3,1]) are rank-1, so the depthwise
    filtering runs as two 1-D passes — half the VPU work, identical math."""
    import numpy as np
    try:
        k = np.asarray(kernel)
    except Exception:  # traced (non-concrete) kernel
        return None
    if k.ndim != 2 or min(k.shape) < 2:
        return None
    u, s, vt = np.linalg.svd(k.astype(np.float64))
    if s[1] > 1e-12 * max(s[0], 1e-30):
        return None
    kv = (u[:, 0] * np.sqrt(s[0])).astype(np.float32)
    kh = (vt[0] * np.sqrt(s[0])).astype(np.float32)
    if kv.sum() < 0:  # fix sign so both factors are the positive blur taps
        kv, kh = -kv, -kh
    return kv, kh


def _backend_is_tpu():
    """True only on actual TPU: the banded-matmul FIR/resize paths are a
    TPU-relayout optimization; on GPU the native depthwise-conv lowering is
    both faster and numerically safer, so keep the conv path there."""
    import jax
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


_FIR_MATRIX_CACHE = {}


def _fir_matrix(taps, H, up, down, p0, p1):
    """Banded (Ho, H) matrix M with (M @ x) == 1-D upfirdn of x's rows.

    Row h sums taps over the up-dilated, padded stream: position
    i = down*h + t - p0 carries input j = i/up iff i % up == 0. TPU
    depthwise convs pay NCHW<->NHWC relayouts (measured 2.7ms for a
    128-batch 64ch 128px blur vs 0.25ms as this matmul); as a matmul the
    FIR rides the MXU in the native layout, and up/down-sampling and
    zero-padding fold into the matrix for free."""
    import numpy as np
    key = (bytes(np.asarray(taps, np.float32)), H, up, down, p0, p1)
    got = _FIR_MATRIX_CACHE.get(key)
    if got is not None:
        return got
    taps = np.asarray(taps, np.float32)
    K = len(taps)
    Ho = (H * up + p0 + p1 - K) // down + 1
    M = np.zeros((Ho, H), np.float32)
    for h in range(Ho):
        for t in range(K):
            i = down * h + t - p0
            if i >= 0 and i % up == 0 and i // up < H:
                M[h, i // up] += taps[K - 1 - t]
    _FIR_MATRIX_CACHE[key] = M
    return M


def upfirdn2d_general(x, kernel, up_x, up_y, down_x, down_y,
                      pad_x0, pad_x1, pad_y0, pad_y1):
    N, C, H, W = x.shape
    kh_, kw_ = kernel.shape

    factors = _separable_factors(kernel)
    if factors is not None and _backend_is_tpu():
        import os
        kv, kh1 = factors
        Mv = jnp.asarray(_fir_matrix(kv, H, up_y, down_y, pad_y0, pad_y1))
        Mh = jnp.asarray(_fir_matrix(kh1, W, up_x, down_x, pad_x0, pad_x1))
        # 'default' matches the accuracy class TPU already uses for the
        # conv path (XLA runs f32 convs with bf16 multiplies); set
        # GANGEALING_FIR_PRECISION=highest for exact f32.
        prec = os.environ.get("GANGEALING_FIR_PRECISION", "default")
        y = x.reshape(N * C, H, W)
        out = jnp.matmul(Mv.astype(x.dtype), y, precision=prec)
        out = jnp.matmul(out, Mh.T.astype(x.dtype), precision=prec)
        return out.reshape(N, C, Mv.shape[0], Mh.shape[0])
    if factors is not None:
        kv, kh1 = factors
        # vertical pass (y up/pad/down), then horizontal
        kvf = jnp.flip(jnp.asarray(kv), 0).astype(x.dtype)
        kvf = jnp.broadcast_to(kvf[None, None, :, None], (C, 1, kh_, 1))
        out = lax.conv_general_dilated(
            x, kvf, window_strides=(down_y, 1),
            padding=((pad_y0, pad_y1 + up_y - 1), (0, 0)),
            lhs_dilation=(up_y, 1), dimension_numbers=_DN,
            feature_group_count=C)
        khf = jnp.flip(jnp.asarray(kh1), 0).astype(x.dtype)
        khf = jnp.broadcast_to(khf[None, None, None, :], (C, 1, 1, kw_))
        out = lax.conv_general_dilated(
            out, khf, window_strides=(1, down_x),
            padding=((0, 0), (pad_x0, pad_x1 + up_x - 1)),
            lhs_dilation=(1, up_x), dimension_numbers=_DN,
            feature_group_count=C)
        return out

    # Correlate with the flipped kernel == true convolution with the kernel,
    # matching the reference semantics (upfirdn2d.py:186).
    k = jnp.flip(kernel, (0, 1)).astype(x.dtype)
    k = jnp.broadcast_to(k[None, None], (C, 1, kh_, kw_))
    # lhs_dilation zero-inserts BETWEEN samples; the reference also appends
    # (up - 1) trailing zeros, so fold those into the high-side padding.
    out = lax.conv_general_dilated(
        x, k,
        window_strides=(down_y, down_x),
        padding=((pad_y0, pad_y1 + up_y - 1), (pad_x0, pad_x1 + up_x - 1)),
        lhs_dilation=(up_y, up_x),
        dimension_numbers=_DN,
        feature_group_count=C,
    )
    return out


def upsample2x(x, kernel, factor=2):
    """Blur-based 2x upsample (reference networks.py:28-46)."""
    kernel = make_kernel(kernel) * (factor ** 2)
    p = kernel.shape[0] - factor
    pad0 = (p + 1) // 2 + factor - 1
    pad1 = p // 2
    return upfirdn2d(x, kernel, up=factor, down=1, pad=(pad0, pad1))


def downsample2x(x, kernel, factor=2):
    """Blur-based 2x downsample (reference networks.py:49-67)."""
    kernel = make_kernel(kernel)
    p = kernel.shape[0] - factor
    pad0 = (p + 1) // 2
    pad1 = p // 2
    return upfirdn2d(x, kernel, up=1, down=factor, pad=(pad0, pad1))


def blur(x, kernel, pad, upsample_factor=1):
    """FIR blur (reference networks.py:70-86)."""
    kernel = make_kernel(kernel)
    if upsample_factor > 1:
        kernel = kernel * (upsample_factor ** 2)
    return upfirdn2d(x, kernel, pad=pad)


def fused_leaky_relu(x, bias=None, negative_slope=0.2, scale=2 ** 0.5):
    """bias-add (broadcast at channel dim 1) + leaky ReLU + scale."""
    if bias is not None:
        shape = [1] * x.ndim
        shape[1] = bias.shape[0]
        x = x + bias.reshape(shape).astype(x.dtype)
    return jnp.where(x >= 0, x, x * negative_slope) * scale


def _tent_kernel(stride):
    import numpy as np
    k = np.arange(1, 2 * stride + 1, 2, dtype=np.float32)
    k = np.concatenate([k, k[::-1]])
    return jnp.asarray(k / k.sum())


_TENT_DOWN_MATRIX_CACHE = {}


def _tent_down_matrix(H, stride):
    """(H_out, H) matrix: reflect-pad stride//2 + tent-filter + stride
    subsample along one axis (reflection folds into the matrix)."""
    import numpy as np
    got = _TENT_DOWN_MATRIX_CACHE.get((H, stride))
    if got is not None:
        return got
    k = np.arange(1, 2 * stride + 1, 2, dtype=np.float32)
    k = np.concatenate([k, k[::-1]])
    k = k / k.sum()  # numpy mirror of _tent_kernel (jnp traces under jit)
    p = stride // 2
    Ho = (H + 2 * p - 2 * stride) // stride + 1
    M = np.zeros((Ho, H), np.float32)
    for h in range(Ho):
        for t in range(2 * stride):
            j = stride * h + t - p
            j = -j if j < 0 else (2 * (H - 1) - j if j >= H else j)
            M[h, j] += k[t]
    _TENT_DOWN_MATRIX_CACHE[(H, stride)] = M
    return M


def bilinear_downsample(x, stride):
    """Anti-aliased integer-stride downsample with a separable tent kernel.

    Matches reference BilinearDownsample (antialiased_sampling.py:241-256):
    reflection-pad stride//2, then horizontal and vertical depthwise convs
    (on TPU: two banded-matrix matmuls — see _fir_matrix's rationale).
    """
    if stride == 1:
        return x
    N, C, H, W = x.shape
    if _backend_is_tpu():
        import os
        Mv = jnp.asarray(_tent_down_matrix(H, stride)).astype(x.dtype)
        Mh = jnp.asarray(_tent_down_matrix(W, stride)).astype(x.dtype)
        prec = os.environ.get("GANGEALING_FIR_PRECISION", "default")
        y = x.reshape(N * C, H, W)
        y = jnp.matmul(Mv, y, precision=prec)
        y = jnp.matmul(y, Mh.T, precision=prec)
        return y.reshape(N, C, Mv.shape[0], Mh.shape[0])
    k = _tent_kernel(stride).astype(x.dtype)
    pad = stride // 2
    x = jnp.pad(x, ((0, 0), (0, 0), (pad, pad), (pad, pad)), mode="reflect")
    kh = jnp.broadcast_to(k[None, None, None, :], (C, 1, 1, 2 * stride))
    kv = jnp.broadcast_to(k[None, None, :, None], (C, 1, 2 * stride, 1))
    x = lax.conv_general_dilated(x, kh, window_strides=(1, stride),
                                 padding="VALID", dimension_numbers=_DN,
                                 feature_group_count=C)
    x = lax.conv_general_dilated(x, kv, window_strides=(stride, 1),
                                 padding="VALID", dimension_numbers=_DN,
                                 feature_group_count=C)
    return x


def _resize_axis_weights(in_size, out_size, dtype):
    """Per-output-pixel source indices and lerp weights (half-pixel centers)."""
    scale = in_size / out_size
    src = (jnp.arange(out_size, dtype=dtype) + 0.5) * scale - 0.5
    src = jnp.clip(src, 0.0, in_size - 1)
    i0 = jnp.floor(src).astype(jnp.int32)
    i1 = jnp.minimum(i0 + 1, in_size - 1)
    w1 = src - i0.astype(dtype)
    return i0, i1, 1.0 - w1, w1


_RESIZE_MATRIX_CACHE = {}


def _resize_matrix(in_dim, out_dim):
    """(out_dim, in_dim) bilinear-resize matrix (two nonzeros per row);
    numpy mirror of _resize_axis_weights (which traces under jit)."""
    import numpy as np
    got = _RESIZE_MATRIX_CACHE.get((in_dim, out_dim))
    if got is not None:
        return got
    # f32 arithmetic mirrors _resize_axis_weights bit-for-bit (floor
    # boundaries must not shift between the two routes)
    scale = np.float32(in_dim / out_dim)
    src = (np.arange(out_dim, dtype=np.float32) + np.float32(0.5)) * scale
    src = np.clip(src - np.float32(0.5), np.float32(0.0),
                  np.float32(in_dim - 1))
    i0 = np.floor(src).astype(np.int64)
    i1 = np.minimum(i0 + 1, in_dim - 1)
    w1 = src - i0.astype(np.float32)
    M = np.zeros((out_dim, in_dim), np.float32)
    rows = np.arange(out_dim)
    np.add.at(M, (rows, i0), 1.0 - w1)
    np.add.at(M, (rows, i1), w1)
    _RESIZE_MATRIX_CACHE[(in_dim, out_dim)] = M
    return M


def interpolate_bilinear(x, out_h, out_w):
    """Bilinear resize of (..., H, W) arrays, torch interpolate semantics
    (align_corners=False, antialias=False). Separable; on TPU the two 1-D
    passes run as exact (precision=highest) banded-matrix matmuls on the
    MXU (gathers/takes lower poorly there), on CPU as weighted takes.
    """
    *lead, H, W = x.shape
    dtype = jnp.promote_types(x.dtype, jnp.float32)
    xf = x.astype(dtype)
    if _backend_is_tpu() and (H != out_h or W != out_w):
        y = xf.reshape((-1, H, W))
        if H != out_h:
            Mv = jnp.asarray(_resize_matrix(H, out_h)).astype(dtype)
            y = jnp.matmul(Mv, y, precision="highest")
        if W != out_w:
            Mh = jnp.asarray(_resize_matrix(W, out_w)).astype(dtype)
            y = jnp.matmul(y, Mh.T, precision="highest")
        return y.reshape(tuple(lead) + (out_h, out_w)).astype(x.dtype)
    if H != out_h:
        i0, i1, w0, w1 = _resize_axis_weights(H, out_h, dtype)
        xf = (jnp.take(xf, i0, axis=-2) * w0[..., :, None]
              + jnp.take(xf, i1, axis=-2) * w1[..., :, None])
    if W != out_w:
        i0, i1, w0, w1 = _resize_axis_weights(W, out_w, dtype)
        xf = jnp.take(xf, i0, axis=-1) * w0 + jnp.take(xf, i1, axis=-1) * w1
    return xf.astype(x.dtype)
