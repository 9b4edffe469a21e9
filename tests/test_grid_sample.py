"""Golden tests: gangealing_tpu grid_sample/affine_grid vs torch (CPU)."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from gangealing_tpu.ops import grid_sample, affine_grid, identity_grid


PADDING_MODES = ["border", "zeros", "reflection"]


def _rand_inputs(rng, N=2, C=3, H=13, W=17, Ho=9, Wo=11, grid_scale=1.5):
    x = rng.randn(N, C, H, W).astype(np.float32)
    # grid beyond [-1, 1] to exercise padding modes
    g = (rng.rand(N, Ho, Wo, 2).astype(np.float32) * 2 - 1) * grid_scale
    return x, g


@pytest.mark.parametrize("padding_mode", PADDING_MODES)
@pytest.mark.parametrize("align_corners", [False, True])
def test_grid_sample_bilinear(rng, padding_mode, align_corners):
    x, g = _rand_inputs(rng)
    ours = grid_sample(jnp.asarray(x), jnp.asarray(g), padding_mode=padding_mode,
                       align_corners=align_corners)
    theirs = F.grid_sample(torch.from_numpy(x), torch.from_numpy(g),
                           padding_mode=padding_mode, align_corners=align_corners)
    np.testing.assert_allclose(np.asarray(ours), theirs.numpy(), atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("padding_mode", PADDING_MODES)
def test_grid_sample_nearest(rng, padding_mode):
    x, g = _rand_inputs(rng, grid_scale=1.2)
    # Avoid coordinates landing exactly on .5 boundaries (round ties differ)
    ours = grid_sample(jnp.asarray(x), jnp.asarray(g), mode="nearest",
                       padding_mode=padding_mode)
    theirs = F.grid_sample(torch.from_numpy(x), torch.from_numpy(g), mode="nearest",
                           padding_mode=padding_mode, align_corners=False)
    ours, theirs = np.asarray(ours), theirs.numpy()
    frac_equal = np.mean(np.isclose(ours, theirs, atol=1e-6))
    assert frac_equal > 0.99  # tie-breaking at exact .5 may differ


@pytest.mark.parametrize("align_corners", [False, True])
def test_affine_grid(rng, align_corners):
    N, H, W = 3, 8, 12
    theta = rng.randn(N, 2, 3).astype(np.float32)
    ours = affine_grid(jnp.asarray(theta), (N, 3, H, W), align_corners=align_corners)
    theirs = F.affine_grid(torch.from_numpy(theta), (N, 3, H, W),
                           align_corners=align_corners)
    np.testing.assert_allclose(np.asarray(ours), theirs.numpy(), atol=1e-6, rtol=1e-6)


def test_identity_grid_sampling_is_identity(rng):
    x = rng.randn(1, 3, 16, 16).astype(np.float32)
    g = identity_grid(1, 16, 16)
    out = grid_sample(jnp.asarray(x), g)
    np.testing.assert_allclose(np.asarray(out), x, atol=1e-5)


def test_grid_sample_point_sampling(rng):
    """The P-point (N, P, 1, 2) pattern used by uncongeal_points."""
    x, _ = _rand_inputs(rng)
    pts = (rng.rand(2, 7, 1, 2).astype(np.float32) * 2 - 1)
    ours = grid_sample(jnp.asarray(x), jnp.asarray(pts), padding_mode="border")
    theirs = F.grid_sample(torch.from_numpy(x), torch.from_numpy(pts),
                           padding_mode="border", align_corners=False)
    np.testing.assert_allclose(np.asarray(ours), theirs.numpy(), atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("padding_mode", PADDING_MODES)
def test_grid_sample_gradients(rng, padding_mode):
    """Gradients w.r.t. both input and grid match torch autograd."""
    import jax

    x, g = _rand_inputs(rng, N=1, C=2, H=7, W=9, Ho=5, Wo=5, grid_scale=1.3)

    def loss_j(xi, gi):
        return jnp.sum(grid_sample(xi, gi, padding_mode=padding_mode) ** 2)

    gx_j, gg_j = jax.grad(loss_j, argnums=(0, 1))(jnp.asarray(x), jnp.asarray(g))

    xt = torch.from_numpy(x).requires_grad_(True)
    gt = torch.from_numpy(g).requires_grad_(True)
    loss_t = (F.grid_sample(xt, gt, padding_mode=padding_mode,
                            align_corners=False) ** 2).sum()
    loss_t.backward()
    np.testing.assert_allclose(np.asarray(gx_j), xt.grad.numpy(), atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(gg_j), gt.grad.numpy(), atol=1e-4, rtol=1e-4)
