"""The MXU grid-sample kernel must match the XLA/torch-parity grid_sample
exactly (f32 precision, interpret mode on CPU)."""

import numpy as np
import pytest

import jax.numpy as jnp

from gangealing_tpu.ops.grid_sample import grid_sample
from gangealing_tpu.ops.pallas_grid_sample import grid_sample_mxu


@pytest.mark.parametrize("padding_mode", ["border", "zeros", "reflection"])
def test_mxu_matches_xla(rng, padding_mode):
    x = rng.randn(2, 3, 32, 24).astype(np.float32)
    g = (rng.rand(2, 16, 16, 2).astype(np.float32) * 2 - 1) * 1.4
    ref = grid_sample(jnp.asarray(x), jnp.asarray(g),
                      padding_mode=padding_mode)
    out = grid_sample_mxu(jnp.asarray(x), jnp.asarray(g),
                          padding_mode=padding_mode, precision="f32",
                          point_block=128, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5,
                               rtol=1e-5)


def test_mxu_nonmultiple_points(rng):
    """P not a multiple of the point block exercises padding."""
    x = rng.randn(1, 4, 16, 16).astype(np.float32)
    g = (rng.rand(1, 5, 7, 2).astype(np.float32) * 2 - 1)
    ref = grid_sample(jnp.asarray(x), jnp.asarray(g))
    out = grid_sample_mxu(jnp.asarray(x), jnp.asarray(g), precision="f32",
                          point_block=128, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_mxu_bf16_close(rng):
    x = rng.randn(1, 3, 64, 64).astype(np.float32)
    g = (rng.rand(1, 32, 32, 2).astype(np.float32) * 2 - 1)
    ref = grid_sample(jnp.asarray(x), jnp.asarray(g))
    out = grid_sample_mxu(jnp.asarray(x), jnp.asarray(g), precision="bf16",
                          point_block=128, interpret=True)
    err = np.abs(np.asarray(out) - np.asarray(ref)).max()
    assert err < 0.05, err


def test_mxu_diff_gradients_match_xla(rng):
    """custom_vjp gradients through the kernel == XLA grid_sample grads."""
    import jax
    from gangealing_tpu.ops.pallas_grid_sample import grid_sample_mxu_diff

    x = rng.randn(1, 2, 16, 16).astype(np.float32)
    g = (rng.rand(1, 8, 8, 2).astype(np.float32) * 2 - 1)

    def loss_mxu(xi, gi):
        out = grid_sample_mxu_diff(jnp.asarray(xi), jnp.asarray(gi),
                                   "border", False, 128, "f32", True)
        return jnp.sum(out ** 2)

    def loss_ref(xi, gi):
        return jnp.sum(grid_sample(jnp.asarray(xi), jnp.asarray(gi)) ** 2)

    gm = jax.grad(loss_mxu, argnums=(0, 1))(x, g)
    gr = jax.grad(loss_ref, argnums=(0, 1))(x, g)
    for a, b in zip(gm, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4,
                                   rtol=1e-4)


def test_mxu_kernel_gating():
    """Misaligned shapes must not claim kernel support (Mosaic shape-cast
    requires lane-dim W % 128 == 0)."""
    import jax.numpy as jnp
    from gangealing_tpu.ops.pallas_grid_sample import mxu_kernel_fits

    assert mxu_kernel_fits(jnp.zeros((1, 12, 256, 256)))
    assert mxu_kernel_fits(jnp.zeros((1, 12, 128, 128)))
    assert not mxu_kernel_fits(jnp.zeros((1, 12, 64, 64)))
    assert not mxu_kernel_fits(jnp.zeros((1, 12, 256, 192)))
    # VMEM-too-big case
    assert not mxu_kernel_fits(jnp.zeros((1, 64, 1024, 1024)))
