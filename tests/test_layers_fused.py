"""The GANGEALING_FUSE_BLUR_CONV=1 composed-kernel path (a committed
round-4 perf experiment that measured slower on TPU and defaults OFF;
models/layers.py:compose_blur_into_weight) must stay numerically exact:
blur-then-strided-conv == one conv with the blur-composed kernel.
"""

import jax
import jax.numpy as jnp
import pytest

import gangealing_tpu.models.layers as L


@pytest.fixture
def fuse_env(monkeypatch):
    def set_fuse(on):
        monkeypatch.setenv("GANGEALING_FUSE_BLUR_CONV", "1" if on else "0")
    return set_fuse


def test_fused_blur_conv_matches_reference_path(fuse_env):
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 32, 32))
    sub = L.conv_layer_init(jax.random.PRNGKey(1), 16, 24, 3,
                            downsample=True)
    p = {f"c.{k}": v for k, v in sub.items()}
    outs = {}
    for on in (False, True):
        fuse_env(on)
        outs[on] = L.conv_layer(p, "c", x, 3, downsample=True)
    assert outs[False].shape == outs[True].shape == (2, 24, 16, 16)
    assert jnp.max(jnp.abs(outs[False] - outs[True])) < 1e-5


def test_fused_res_block_matches_reference_path(fuse_env):
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 8, 32, 32))
    sub = L.res_block_init(jax.random.PRNGKey(3), 8, 12, downsample=True)
    p = {f"b.{k}": v for k, v in sub.items()}
    outs = {}
    for on in (False, True):
        fuse_env(on)
        outs[on] = L.res_block(p, "b", x, downsample=True)
    assert jnp.max(jnp.abs(outs[False] - outs[True])) < 1e-5
