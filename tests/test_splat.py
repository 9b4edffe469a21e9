"""Golden test: splat2d vs a direct numpy evaluation of the kernel spec."""

import numpy as np
import jax.numpy as jnp

from gangealing_tpu.ops.splat import splat2d


def _numpy_splat(inp, coords, values, sigma, soft_normalize):
    N, C, H, W = inp.shape
    out = inp.copy()
    alpha = np.zeros((N, H, W), np.float32)
    for n in range(N):
        s = sigma[n]
        norm = -1.0 / (2 * s * s)
        for p in range(coords.shape[1]):
            x, y = coords[n, p]
            if not (0 <= x < W and 0 <= y < H):
                continue
            t = int(max(0, np.floor(y - 2 * s)))
            b = int(min(H - 1, np.ceil(y + 2 * s)))
            l = int(max(0, np.floor(x - 2 * s)))
            r = int(min(W - 1, np.ceil(x + 2 * s)))
            for lh in range(t, b + 1):
                for lw in range(l, r + 1):
                    a = np.exp(norm * ((x - lw) ** 2 + (y - lh) ** 2))
                    alpha[n, lh, lw] += a
                    out[n, :, lh, lw] += a * values[n, p]
    alpha = alpha[:, None]
    if soft_normalize:
        alpha = np.maximum(alpha, 1.0)
    return out / (alpha + 1e-8)


def test_splat_matches_spec(rng):
    N, C, H, W, P = 2, 3, 24, 20, 30
    inp = np.zeros((N, C, H, W), np.float32)
    coords = (rng.rand(N, P, 2).astype(np.float32)
              * np.array([W + 6, H + 6], np.float32) - 3)  # some OOB points
    values = rng.randn(N, P, C).astype(np.float32)
    sigma = np.array([1.3, 2.1], np.float32)
    for soft in (False, True):
        ours = splat2d(jnp.asarray(inp), jnp.asarray(coords),
                       jnp.asarray(values), jnp.asarray(sigma),
                       soft_normalize=soft, max_sigma=2.5)
        golden = _numpy_splat(inp, coords, values, sigma, soft)
        np.testing.assert_allclose(np.asarray(ours), golden, atol=1e-4,
                                   rtol=1e-4)


def test_splat_nonblank_canvas(rng):
    """Splatting adds onto the input canvas (output = clone(input) + ...)."""
    N, C, H, W, P = 1, 2, 16, 16, 5
    inp = rng.randn(N, C, H, W).astype(np.float32)
    coords = rng.rand(N, P, 2).astype(np.float32) * 15
    values = rng.randn(N, P, C).astype(np.float32)
    sigma = np.array([1.0], np.float32)
    ours = splat2d(jnp.asarray(inp), jnp.asarray(coords), jnp.asarray(values),
                   jnp.asarray(sigma), max_sigma=1.5)
    golden = _numpy_splat(inp, coords, values, sigma, False)
    np.testing.assert_allclose(np.asarray(ours), golden, atol=1e-4, rtol=1e-4)


def test_splat_mxu_matches_spec(rng):
    """MXU splat (interpret mode) vs the numpy spec."""
    from gangealing_tpu.ops import splat as splat_mod
    import functools
    from jax.experimental import pallas as pl

    # patch pallas_call to interpret mode on CPU
    orig = pl.pallas_call
    pl.pallas_call = functools.partial(orig, interpret=True)
    try:
        N, C, H, W, P = 2, 3, 24, 128, 40
        inp = np.zeros((N, C, H, W), np.float32)
        coords = (rng.rand(N, P, 2).astype(np.float32)
                  * np.array([W + 6, H + 6], np.float32) - 3)
        values = rng.randn(N, P, C).astype(np.float32)
        sigma = np.array([1.3, 2.1], np.float32)
        for soft in (False, True):
            ours = splat_mod.splat2d_mxu(
                jnp.asarray(inp), jnp.asarray(coords), jnp.asarray(values),
                jnp.asarray(sigma), soft_normalize=soft, point_block=128)
            golden = _numpy_splat(inp, coords, values, sigma, soft)
            np.testing.assert_allclose(np.asarray(ours), golden, atol=2e-2,
                                       rtol=2e-2)  # bf16 matmul accumulation
    finally:
        pl.pallas_call = orig
