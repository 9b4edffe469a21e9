"""Banded mipmap Pallas kernel vs the XLA fold path (interpret mode).

The banded path (ops/pallas_mipmap.py) must be numerically exact against
the generic fold path — same forward, same image gradients, same grid
gradients (including the right-derivative subgradient convention at integer
coordinates and clamped borders) — for all three padding modes.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from gangealing_tpu.ops.mipmap import (mipmap_levels, _mipmap_warp_banded,
                                       _mipmap_warp_fold)
from gangealing_tpu.ops.grid_sample import affine_grid

H = 64
NUM_LEVELS = 4


@pytest.fixture(scope="module")
def setup():
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.randn(2, 3, H, H).astype(np.float32))
    # batch 0: strong zoom-out + rotation (levels span [0, 2.5]);
    # batch 1: axis-aligned scales hitting exact-integer coords (the
    # subgradient-convention edge case) and heavy border clamping
    theta = jnp.asarray(np.stack([
        np.array([[2.5, 0.3, 0.1], [-0.2, 2.0, -0.1]], np.float32),
        np.array([[0.5, 0.0, 0.0], [0.0, 6.0, 0.2]], np.float32)]))
    grid = affine_grid(theta, (2, 3, 32, 32))
    return img, grid


@pytest.mark.parametrize("pm", ["border", "reflection", "zeros"])
def test_banded_matches_fold_forward(setup, pm):
    img, grid = setup
    lv = jnp.maximum(mipmap_levels(grid, H, H, 3.5), 0.0)
    ref = _mipmap_warp_fold(img, grid, NUM_LEVELS, lv, pm)
    out = _mipmap_warp_banded(img, grid, NUM_LEVELS, lv, pm,
                              precision="f32", interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


@pytest.mark.parametrize("pm", ["border", "zeros"])
def test_banded_matches_fold_gradients(setup, pm):
    img, grid = setup

    def loss(fn, i, g):
        l = jnp.maximum(mipmap_levels(g, H, H, 3.5), 0.0)
        return jnp.sum(fn(i, g, l) ** 2)

    def fold(i, g, l):
        return _mipmap_warp_fold(i, g, NUM_LEVELS, l, pm)

    def band(i, g, l):
        return _mipmap_warp_banded(i, g, NUM_LEVELS, l, pm,
                                   precision="f32", interpret=True)

    gi1, gg1 = jax.grad(lambda i, g: loss(fold, i, g), argnums=(0, 1))(img, grid)
    gi2, gg2 = jax.grad(lambda i, g: loss(band, i, g), argnums=(0, 1))(img, grid)
    scale_i = float(jnp.max(jnp.abs(gi1))) + 1e-8
    scale_g = float(jnp.max(jnp.abs(gg1))) + 1e-8
    np.testing.assert_allclose(np.asarray(gi2) / scale_i,
                               np.asarray(gi1) / scale_i, atol=2e-5)
    np.testing.assert_allclose(np.asarray(gg2) / scale_g,
                               np.asarray(gg1) / scale_g, atol=2e-5)


def test_point_block_env_override_equivalence(setup, monkeypatch):
    """The forward point-block size (auto-1024 here: P=32*32) is a pure
    tiling choice: GANGEALING_POINT_BLOCK=512 and a non-dividing 384
    (exercising the tail-padding path) must both match the auto selection
    bit-for-bit in f32 interpret mode."""
    img, grid = setup
    lv = jnp.maximum(mipmap_levels(grid, H, H, 3.5), 0.0)

    def run():
        return np.asarray(_mipmap_warp_banded(
            img, grid, NUM_LEVELS, lv, "border",
            precision="f32", interpret=True))

    monkeypatch.delenv("GANGEALING_POINT_BLOCK", raising=False)
    auto = run()  # P = 1024 -> adaptive PB=1024
    for pb in ("512", "384"):
        monkeypatch.setenv("GANGEALING_POINT_BLOCK", pb)
        np.testing.assert_allclose(run(), auto, atol=1e-6)


def test_point_block_env_override_gradients(setup, monkeypatch):
    """Gradients under a non-power-of-two override (PB=384 pads P=1024 to
    1152, which the backward's 256-capped block does NOT divide) must match
    the unoverridden gradients — the backward grid would otherwise leave
    tail points uncovered and silently drop their contributions."""
    img, grid = setup
    lv = jnp.maximum(mipmap_levels(grid, H, H, 3.5), 0.0)

    def loss(i, g):
        out = _mipmap_warp_banded(i, g, NUM_LEVELS, lv, "border",
                                  precision="f32", interpret=True)
        return jnp.sum(out ** 2)

    monkeypatch.delenv("GANGEALING_POINT_BLOCK", raising=False)
    gi_ref, gg_ref = jax.grad(loss, argnums=(0, 1))(img, grid)
    monkeypatch.setenv("GANGEALING_POINT_BLOCK", "384")
    gi, gg = jax.grad(loss, argnums=(0, 1))(img, grid)
    np.testing.assert_allclose(np.asarray(gi), np.asarray(gi_ref), atol=1e-6)
    np.testing.assert_allclose(np.asarray(gg), np.asarray(gg_ref), atol=1e-6)
