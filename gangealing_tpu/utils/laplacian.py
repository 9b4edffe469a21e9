"""Laplacian pyramid (stack) blending for seamless AR compositing.

Capability reference: utils/laplacian_blending.py:13-134 (LaplacianBlender,
extend_object_border). Functional JAX: blur kernels are computed at trace
time; the whole blend is one fused jit region.
"""

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from gangealing_tpu.models.layers import conv2d


def gaussian_kernel_1d(ksize: int, sigma: float) -> np.ndarray:
    """cv2.getGaussianKernel semantics: sampled Gaussian, normalized."""
    if sigma <= 0:
        sigma = 0.3 * ((ksize - 1) * 0.5 - 1) + 0.8
    xs = np.arange(ksize, dtype=np.float64) - (ksize - 1) / 2
    k = np.exp(-(xs ** 2) / (2 * sigma * sigma))
    return (k / k.sum()).astype(np.float32)


def _gauss2d(ksize, sigma):
    k1 = gaussian_kernel_1d(ksize, sigma)
    return jnp.asarray(np.outer(k1, k1))


def _blur(img, kernel, padding):
    C = img.shape[1]
    k = jnp.broadcast_to(kernel[None, None].astype(img.dtype),
                         (C, 1, kernel.shape[0], kernel.shape[1]))
    pad = ((0, 0), (0, 0), (padding, padding), (padding, padding))
    img_pad = jnp.pad(img, pad, mode="edge")
    return conv2d(img_pad, k, groups=C)


def laplacian_stacks(img, levels, kernels, paddings):
    """Returns (lap_stack, gauss_stack): lists of (N, C, H, W)."""
    lap, gauss = [], []
    for level in range(levels):
        gauss.append(img)
        if level < levels - 1:
            blurred = _blur(img, kernels[level], paddings[level])
            lap.append(img - blurred)
            img = blurred
        else:
            lap.append(img)
    return lap, gauss


@partial(jax.jit, static_argnames=("levels", "gaussian_kernel_size",
                                   "gaussian_sigma", "level_size_adder",
                                   "level_sigma_multiplier"))
def laplacian_blend(img0, img1, mask, levels=5, gaussian_kernel_size=45,
                    gaussian_sigma=1, level_size_adder=0,
                    level_sigma_multiplier=2):
    """Blend img0 (mask==0) with img1 (mask==1) via Laplacian stacks."""
    assert gaussian_kernel_size % 2 == 1 and level_size_adder % 2 == 0
    kernels, paddings = [], []
    for level in range(levels):
        width = gaussian_kernel_size + level_size_adder
        sigma = gaussian_sigma * level_sigma_multiplier ** level
        kernels.append(_gauss2d(width, sigma))
        paddings.append(width // 2)
    lp0, _ = laplacian_stacks(img0, levels, kernels, paddings)
    lp1, _ = laplacian_stacks(img1, levels, kernels, paddings)
    _, gpm = laplacian_stacks(mask, levels, kernels, paddings)
    out = 0.0
    for a, b, m in zip(lp0, lp1, gpm):
        out = out + a + m * (b - a)
    return out


# Blender configurations used by the vis pipeline
# (utils/vis_tools/helpers.py:188-193).
BLEND_CONFIGS = {
    "laplacian": dict(levels=5, gaussian_kernel_size=45, gaussian_sigma=1,
                      level_size_adder=0, level_sigma_multiplier=2),
    "laplacian_light": dict(levels=3, gaussian_kernel_size=11,
                            gaussian_sigma=0.5, level_size_adder=0,
                            level_sigma_multiplier=2),
}


def extend_object_border(img, mask, max_pixel_radius=45):
    """Object-centric border padding (laplacian_blending.py:110-134)."""
    out = img
    cur_mask = mask
    for radius in range(1, max_pixel_radius + 1):
        sqrt_rad = round(radius / math.sqrt(2))
        points = [(radius, 0), (-radius, 0), (0, radius), (0, -radius),
                  (sqrt_rad, sqrt_rad), (-sqrt_rad, sqrt_rad),
                  (sqrt_rad, -sqrt_rad), (-sqrt_rad, -sqrt_rad)]
        for pv, ph in points:
            img_shifted = jnp.roll(img, (pv, ph), axis=(2, 3))
            mask_shifted = jnp.roll(mask, (pv, ph), axis=(2, 3))
            out = out + img_shifted * (1 - cur_mask)
            cur_mask = jnp.clip(cur_mask + mask_shifted, 0.0, 1.0)
    return out
