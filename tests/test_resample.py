"""Golden tests for upfirdn2d / fused_leaky_relu / bilinear_downsample /
interpolate_bilinear / mipmap_warp vs torch compositions (CPU)."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from gangealing_tpu.ops.resample import (
    upfirdn2d, fused_leaky_relu, bilinear_downsample, interpolate_bilinear,
    upsample2x, downsample2x, make_kernel)
from gangealing_tpu.ops.mipmap import mipmap_warp


def torch_upfirdn2d(x, k, up, down, pad):
    """Spec-level torch implementation: zero-insert upsample, pad, convolve
    (flipped-kernel correlation), stride-downsample."""
    N, C, H, W = x.shape
    kh, kw = k.shape
    pad0, pad1 = pad
    out = x.reshape(N * C, 1, H, 1, W, 1)
    out = F.pad(out, [0, up - 1, 0, 0, 0, up - 1])
    out = out.reshape(N * C, 1, H * up, W * up)
    out = F.pad(out, [pad0, pad1, pad0, pad1])
    w = torch.flip(k, [0, 1]).reshape(1, 1, kh, kw)
    out = F.conv2d(out, w)
    out = out[:, :, ::down, ::down]
    Ho = (H * up + pad0 + pad1 - kh) // down + 1
    Wo = (W * up + pad0 + pad1 - kw) // down + 1
    return out.reshape(N, C, Ho, Wo)


@pytest.mark.parametrize("up,down,pad", [
    (1, 1, (1, 1)),   # blur
    (2, 1, (2, 1)),   # upsample ([1,3,3,1], factor 2)
    (1, 2, (2, 2)),   # downsample
    (1, 1, (2, 0)),   # asymmetric pad
])
def test_upfirdn2d(rng, up, down, pad):
    x = rng.randn(2, 3, 12, 12).astype(np.float32)
    k1 = np.array([1.0, 3.0, 3.0, 1.0], np.float32)
    k = np.outer(k1, k1)
    k /= k.sum()
    ours = upfirdn2d(jnp.asarray(x), jnp.asarray(k), up=up, down=down, pad=pad)
    theirs = torch_upfirdn2d(torch.from_numpy(x), torch.from_numpy(k), up, down, pad)
    np.testing.assert_allclose(np.asarray(ours), theirs.numpy(), atol=1e-5, rtol=1e-5)


def test_upfirdn2d_gradient(rng):
    """XLA's conv transpose must equal torch autograd through the same spec."""
    x = rng.randn(1, 2, 8, 8).astype(np.float32)
    k1 = np.array([1.0, 3.0, 3.0, 1.0], np.float32)
    k = np.outer(k1, k1); k /= k.sum()

    g_j = jax.grad(lambda xi: jnp.sum(
        upfirdn2d(xi, jnp.asarray(k), up=2, down=1, pad=(2, 1)) ** 2))(jnp.asarray(x))
    xt = torch.from_numpy(x).requires_grad_(True)
    (torch_upfirdn2d(xt, torch.from_numpy(k), 2, 1, (2, 1)) ** 2).sum().backward()
    np.testing.assert_allclose(np.asarray(g_j), xt.grad.numpy(), atol=1e-4, rtol=1e-4)


def test_up_down_sample2x(rng):
    x = rng.randn(1, 3, 16, 16).astype(np.float32)
    k = [1, 3, 3, 1]
    up = upsample2x(jnp.asarray(x), k)
    down = downsample2x(jnp.asarray(x), k)
    assert up.shape == (1, 3, 32, 32)
    assert down.shape == (1, 3, 8, 8)
    # Energy sanity: upsample roughly preserves mean brightness (DC gain 1,
    # modulo boundary effects on random data)
    np.testing.assert_allclose(float(jnp.mean(up)), x.mean(), atol=5e-3)


def test_fused_leaky_relu(rng):
    x = rng.randn(2, 5, 7, 7).astype(np.float32)
    b = rng.randn(5).astype(np.float32)
    ours = fused_leaky_relu(jnp.asarray(x), jnp.asarray(b))
    theirs = F.leaky_relu(torch.from_numpy(x) + torch.from_numpy(b).view(1, 5, 1, 1),
                          0.2) * (2 ** 0.5)
    np.testing.assert_allclose(np.asarray(ours), theirs.numpy(), atol=1e-6, rtol=1e-6)
    # 2D input (EqualLinear activation path)
    x2 = rng.randn(4, 5).astype(np.float32)
    ours2 = fused_leaky_relu(jnp.asarray(x2), jnp.asarray(b))
    theirs2 = F.leaky_relu(torch.from_numpy(x2) + torch.from_numpy(b), 0.2) * (2 ** 0.5)
    np.testing.assert_allclose(np.asarray(ours2), theirs2.numpy(), atol=1e-6, rtol=1e-6)


@pytest.mark.parametrize("stride", [2, 4])
def test_bilinear_downsample(rng, stride):
    """vs the reference module's documented algorithm built from torch ops."""
    C = 3
    x = rng.randn(2, C, 32, 32).astype(np.float32)
    k = np.arange(1, 2 * stride + 1, 2, dtype=np.float32)
    k = np.concatenate([k, k[::-1]])
    k /= k.sum()
    kh = torch.from_numpy(k).reshape(1, 1, 1, -1).repeat(C, 1, 1, 1)
    kv = torch.from_numpy(k).reshape(1, 1, -1, 1).repeat(C, 1, 1, 1)
    xt = torch.from_numpy(x)
    xt = F.pad(xt, [stride // 2] * 4, mode="reflect")
    theirs = F.conv2d(F.conv2d(xt, kh, stride=(1, stride), groups=C),
                      kv, stride=(stride, 1), groups=C)
    ours = bilinear_downsample(jnp.asarray(x), stride)
    np.testing.assert_allclose(np.asarray(ours), theirs.numpy(), atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("in_hw,out_hw", [((16, 16), (32, 32)),
                                          ((32, 32), (128, 128)),
                                          ((32, 32), (20, 20)),
                                          ((15, 17), (33, 9))])
def test_interpolate_bilinear(rng, in_hw, out_hw):
    x = rng.randn(2, 3, *in_hw).astype(np.float32)
    ours = interpolate_bilinear(jnp.asarray(x), *out_hw)
    theirs = F.interpolate(torch.from_numpy(x), size=out_hw, mode="bilinear",
                           align_corners=False)
    np.testing.assert_allclose(np.asarray(ours), theirs.numpy(), atol=1e-5, rtol=1e-5)


def _torch_mipmap_warp(x, grid, max_num_levels=3.5, padding_mode="border"):
    """Torch spec build of mipmap warping for golden comparison, composed of
    public torch ops following the published algorithm (Gaussian stack with
    static level count + per-pixel level lerp)."""
    N, C, H, W = x.shape
    # per-pixel levels
    cx = (W - 1.0) * (grid[..., 0] + 1.0) / 2.0
    cy = (H - 1.0) * (grid[..., 1] + 1.0) / 2.0
    coords = torch.stack([cx, cy], dim=3)
    padded = F.pad(coords.permute(0, 3, 1, 2), [1, 1, 1, 1], mode="replicate")
    padded = padded.permute(0, 2, 3, 1)
    dists = []
    for sl in [(slice(1, -1), slice(None, -2)), (slice(1, -1), slice(2, None)),
               (slice(None, -2), slice(1, -1)), (slice(2, None), slice(1, -1))]:
        d = ((padded[:, sl[0], sl[1], :] - coords) ** 2).sum(3).clamp(min=1.0) ** 0.5
        dists.append(d)
    levels = torch.log2(torch.stack(dists).max(0).values).clamp(0.0, max_num_levels - 1.0)

    import math
    num_levels = int(math.ceil(max_num_levels - 1.0)) + 1
    k1 = torch.tensor([1.0, 3.0, 3.0, 1.0])
    k = torch.outer(k1, k1)
    k = (k / k.sum()).reshape(1, 1, 4, 4).repeat(C, 1, 1, 1)
    # Non-power-of-2 inputs are reflect-padded up to the next power of 2
    # before building the stack, then cropped back.
    log_size = math.log2(x.shape[-1])
    pad_needed = not float(log_size).is_integer()
    xs = x
    if pad_needed:
        target = int(2 ** math.ceil(log_size))
        total = target - x.shape[-1]
        lp = total // 2
        rp = total - lp
        xs = F.pad(x, [lp, rp, lp, rp], mode="reflect")
    stack = [xs]
    cur = xs
    for i in range(1, num_levels):
        cur = F.conv2d(F.pad(cur, [1, 1, 1, 1], mode="reflect"), k, stride=2, groups=C)
        stack.append(F.interpolate(cur, scale_factor=2.0 ** i, mode="bilinear",
                                   align_corners=False))
    stack = torch.stack(stack, dim=2)  # (N, C, D, H, W)
    if pad_needed:
        stack = stack[:, :, :, lp:-rp, lp:-rp]
    warped = F.grid_sample(stack.reshape(N, C * num_levels, H, W), grid,
                           padding_mode=padding_mode, align_corners=False)
    Ho, Wo = grid.shape[1], grid.shape[2]
    warped = warped.reshape(N, C, num_levels, Ho, Wo)
    lv = levels[:, None, None]
    l0 = lv.floor().long()
    l1 = lv.ceil().long()
    o0 = torch.gather(warped, 2, l0.expand(N, C, 1, Ho, Wo))
    o1 = torch.gather(warped, 2, l1.expand(N, C, 1, Ho, Wo))
    wgt = lv % 1.0
    return (o0 + wgt * (o1 - o0))[:, :, 0]


@pytest.mark.parametrize("padding_mode", ["border", "reflection"])
def test_mipmap_warp(rng, padding_mode):
    x = rng.randn(2, 3, 64, 64).astype(np.float32)
    # a zoomed-out grid (downsampling -> exercises higher mipmap levels)
    theta = np.array([[[2.2, 0.1, 0.05], [-0.1, 2.2, -0.02]]] * 2, np.float32)
    grid_t = F.affine_grid(torch.from_numpy(theta), (2, 3, 32, 32),
                           align_corners=False)
    ours = mipmap_warp(jnp.asarray(x), jnp.asarray(grid_t.numpy()),
                       padding_mode=padding_mode)
    theirs = _torch_mipmap_warp(torch.from_numpy(x), grid_t,
                                padding_mode=padding_mode)
    np.testing.assert_allclose(np.asarray(ours), theirs.numpy(), atol=1e-4, rtol=1e-4)


def test_mipmap_warp_identity_is_sharp(rng):
    """With an identity grid, levels are 0 and the output equals the input."""
    x = rng.randn(1, 3, 32, 32).astype(np.float32)
    from gangealing_tpu.ops import identity_grid
    out = mipmap_warp(jnp.asarray(x), identity_grid(1, 32, 32))
    np.testing.assert_allclose(np.asarray(out), x, atol=1e-5)


def test_mipmap_warp_nonpow2(rng):
    """Non-power-of-2 input exercises the reflect-pad path (reference
    antialiased_sampling.py:130-137)."""
    x = rng.randn(1, 3, 48, 48).astype(np.float32)
    theta = np.array([[[1.7, 0.0, 0.0], [0.0, 1.7, 0.0]]], np.float32)
    grid_t = F.affine_grid(torch.from_numpy(theta), (1, 3, 24, 24),
                           align_corners=False)
    ours = mipmap_warp(jnp.asarray(x), jnp.asarray(grid_t.numpy()))
    theirs = _torch_mipmap_warp(torch.from_numpy(x), grid_t)
    np.testing.assert_allclose(np.asarray(ours), theirs.numpy(), atol=1e-4, rtol=1e-4)


def test_fir_matrix_path_matches_conv_path(rng, monkeypatch):
    """The TPU banded-matrix FIR route (upfirdn2d_general) must equal the
    depthwise-conv route exactly for every up/down/pad combination the
    models use. The matrix path is TPU-gated, so force it on here."""
    import gangealing_tpu.ops.resample as rs
    import gangealing_tpu.ops.mipmap as mm

    x = jnp.asarray(rng.randn(2, 4, 32, 32).astype(np.float32))
    monkeypatch.setenv("GANGEALING_FIR_PRECISION", "highest")
    cases = [
        lambda: rs.blur(x, [1, 3, 3, 1], pad=(2, 1)),
        lambda: rs.downsample2x(x, [1, 3, 3, 1]),
        lambda: rs.upsample2x(x, [1, 3, 3, 1]),
        lambda: rs.upfirdn2d(x, rs.make_kernel([1, 3, 3, 1]), down=2,
                             pad=(2, 1)),
        lambda: rs.upfirdn2d(x, rs.make_kernel([1, 2, 1]), pad=(1, 1)),
        lambda: mm._gaussian_blur_2x(x),
        lambda: rs.bilinear_downsample(x, 2),
        lambda: rs.bilinear_downsample(x, 4),
    ]
    for fn in cases:
        monkeypatch.setattr(rs, "_backend_is_tpu", lambda: True)
        a = np.asarray(fn())
        monkeypatch.setattr(rs, "_backend_is_tpu", lambda: False)
        b = np.asarray(fn())
        np.testing.assert_allclose(a, b, atol=1e-6, rtol=1e-6)


def test_resize_matrix_path_matches_takes(rng, monkeypatch):
    """TPU matmul route of interpolate_bilinear == the weighted-takes route
    exactly (up, down, and asymmetric resizes)."""
    import gangealing_tpu.ops.resample as rs
    x = jnp.asarray(rng.randn(2, 3, 24, 40).astype(np.float32))
    for oh, ow in [(48, 80), (12, 20), (24, 64), (17, 40), (33, 7)]:
        monkeypatch.setattr(rs, "_backend_is_tpu", lambda: True)
        a = np.asarray(rs.interpolate_bilinear(x, oh, ow))
        monkeypatch.setattr(rs, "_backend_is_tpu", lambda: False)
        b = np.asarray(rs.interpolate_bilinear(x, oh, ow))
        assert a.shape == b.shape == (2, 3, oh, ow)
        np.testing.assert_allclose(a, b, atol=1e-6, rtol=1e-6)
