"""Tests for visualization helpers: splat_points, laplacian blending,
flow coloring, dense labels, grids, video."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gangealing_tpu.utils.vis import (
    splat_points, load_dense_label, images2grid, save_image, save_video,
    get_colors, normalize_images)
from gangealing_tpu.utils.laplacian import (
    laplacian_blend, extend_object_border, gaussian_kernel_1d)
from gangealing_tpu.utils.flow_vis import flow_to_rgb


def test_gaussian_kernel_matches_cv2():
    import cv2
    for ksize, sigma in [(45, 1.0), (11, 0.5), (31, 2.0)]:
        ours = gaussian_kernel_1d(ksize, sigma)
        theirs = cv2.getGaussianKernel(ksize, sigma).ravel().astype(np.float32)
        np.testing.assert_allclose(ours, theirs, atol=1e-6)


def test_laplacian_blend_masks(rng):
    x = jnp.asarray(rng.randn(2, 3, 48, 48).astype(np.float32))
    y = jnp.asarray(rng.randn(2, 3, 48, 48).astype(np.float32))
    # mask==0 -> img0; mask==1 -> img1 (stack sums telescope exactly)
    zero = jnp.zeros((2, 1, 48, 48))
    one = jnp.ones((2, 1, 48, 48))
    np.testing.assert_allclose(np.asarray(laplacian_blend(x, y, zero)),
                               np.asarray(x), atol=1e-4)
    np.testing.assert_allclose(np.asarray(laplacian_blend(x, y, one)),
                               np.asarray(y), atol=1e-4)
    half = jnp.full((2, 1, 48, 48), 0.5)
    mid = laplacian_blend(x, y, half)
    np.testing.assert_allclose(np.asarray(mid), np.asarray((x + y) / 2),
                               atol=1e-4)


@pytest.mark.slow
def test_extend_object_border(rng):
    img = jnp.zeros((1, 3, 32, 32)).at[:, :, 14:18, 14:18].set(1.0)
    mask = jnp.zeros((1, 1, 32, 32)).at[:, :, 14:18, 14:18].set(1.0)
    out = extend_object_border(img, mask, max_pixel_radius=5)
    assert float(jnp.sum(out > 0.5)) > float(jnp.sum(img > 0.5))


def test_splat_points_alpha_blend(rng):
    imgs = jnp.zeros((2, 3, 32, 32)) - 1.0
    pts = jnp.asarray(rng.rand(2, 20, 2).astype(np.float32) * 31)
    out = splat_points(imgs, pts, sigma=1.0, opacity=1.0)
    assert out.shape == (2, 3, 32, 32)
    assert float(jnp.max(out)) > -0.5  # points got drawn


def test_splat_points_laplacian_blend(rng):
    imgs = jnp.zeros((1, 3, 64, 64)) - 1.0
    pts = jnp.asarray(rng.rand(1, 10, 2).astype(np.float32) * 63)
    out = splat_points(imgs, pts, sigma=2.0, opacity=1.0,
                       blend_alg="laplacian_light")
    assert out.shape == (1, 3, 64, 64)
    assert np.isfinite(np.asarray(out)).all()


def test_load_dense_label(tmp_path, rng):
    from PIL import Image
    rgba = np.zeros((16, 16, 4), np.uint8)
    rgba[4:8, 2:6, :3] = 200
    rgba[4:8, 2:6, 3] = 255
    p = str(tmp_path / "label.png")
    Image.fromarray(rgba).save(p)
    pts, colors, alphas = load_dense_label(p, load_colors=True)
    assert pts.shape == (1, 16, 2)
    assert colors.shape == (1, 16, 3)
    np.testing.assert_allclose(np.asarray(alphas), 1.0)
    # coordinates are (x, y)
    assert float(pts[0, :, 0].min()) == 2 and float(pts[0, :, 1].min()) == 4


def test_flow_to_rgb(rng):
    flow = rng.randn(2, 16, 16, 2).astype(np.float32) * 0.1
    rgb = flow_to_rgb(flow)
    assert rgb.shape == (2, 16, 16, 3) and rgb.dtype == np.uint8


def test_images2grid_and_save(tmp_path, rng):
    imgs = rng.rand(5, 3, 8, 8).astype(np.float32) * 2 - 1
    grid = images2grid(imgs, nrow=3, normalize=True, range=(-1, 1))
    assert grid.dtype == np.uint8 and grid.shape[-1] == 3
    save_image(imgs, str(tmp_path / "g.png"), nrow=3, normalize=True,
               range=(-1, 1))
    assert os.path.exists(tmp_path / "g.png")


def test_save_video(tmp_path, rng):
    frames = (rng.rand(4, 3, 16, 16).astype(np.float32) * 2 - 1)
    out = str(tmp_path / "v.mp4")
    save_video(jnp.asarray(frames), fps=2, out_path=out, input_is_tensor=True)
    assert os.path.getsize(out) > 0


def test_get_colors():
    c = get_colors(7, "turbo")
    assert c.shape == (1, 7, 3)
    assert float(c.min()) >= -1 and float(c.max()) <= 1
