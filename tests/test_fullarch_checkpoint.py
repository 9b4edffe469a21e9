"""Full-architecture wiring test: the exact published-checkpoint STN config
(flow_size=128, channel_multiplier=0.5, composed similarity+flow) round-trips
through torch export -> load_stn -> forward/point-transfer. Catches any
param-name or shape mismatch against the model-zoo layout."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


@pytest.mark.slow
def test_fullarch_roundtrip(tmp_path, rng):
    import torch
    from gangealing_tpu.models.stn import (
        ComposedSTNConfig, composed_stn_init, composed_stn_forward)
    from gangealing_tpu.apps.common import load_stn

    cfg = ComposedSTNConfig(transforms=("similarity", "flow"), flow_size=128,
                            supersize=256, channel_multiplier=0.5)
    params = composed_stn_init(jax.random.PRNGKey(0), cfg)

    # expected reference state_dict key layout (spot checks)
    assert "stns.0.convs.0.0.weight" in params
    assert params["stns.0.convs.0.0.weight"].shape == (64, 3, 1, 1)
    assert "stns.0.final_linear.weight" in params
    assert params["stns.0.final_linear.weight"].shape == (512, 512 * 16)
    assert "stns.0.warp_head.linear.weight" in params
    assert params["stns.0.warp_head.linear.weight"].shape == (4, 512)
    assert "stns.1.warp_head.flow_out.2.weight" in params
    assert params["stns.1.warp_head.flow_out.2.weight"].shape == (2, 512, 3, 3)
    assert params["stns.1.warp_head.mask_out.2.weight"].shape == \
        (9 * 64, 512, 3, 3)

    # export in the reference checkpoint schema and re-load through load_stn
    ckpt = {
        "t_ema": {k: torch.from_numpy(np.asarray(v))
                  for k, v in params.items()},
        "args": __import__("argparse").Namespace(
            transform=["similarity", "flow"], flow_size=128,
            stn_channel_multiplier=0.5, num_heads=1, real_size=256),
    }
    path = str(tmp_path / "fullarch.pt")
    torch.save(ckpt, path)
    loaded_params, loaded_cfg = load_stn(path, supersize=256)
    assert loaded_cfg.flow_size == 128
    assert loaded_cfg.channel_multiplier == 0.5

    # smooth synthetic image (different AA filters agree on smooth content)
    yy, xx = np.meshgrid(np.linspace(0, 4 * np.pi, 256),
                         np.linspace(0, 4 * np.pi, 256), indexing="ij")
    img = np.stack([np.sin(xx) * np.cos(yy), np.sin(2 * xx),
                    np.cos(3 * yy)]).astype(np.float32)
    x = jnp.asarray(img[None])
    out, grid, fom, sim_out, _ = composed_stn_forward(loaded_params,
                                                      loaded_cfg, x)
    assert out.shape == (1, 3, 128, 128)
    # identity at init even at full size: zero residual flow, and the output
    # is an (anti-aliased) identity resampling of the 256px source
    np.testing.assert_allclose(np.asarray(fom), 0.0, atol=1e-5)
    from gangealing_tpu.ops.resample import bilinear_downsample
    a = np.asarray(out).ravel()
    b = np.asarray(bilinear_downsample(x, 2)).ravel()
    corr = np.corrcoef(a, b)[0, 1]
    assert corr > 0.99, corr

    # iters=3 recursion (the published test-time configuration)
    out3, _, _, _, _ = composed_stn_forward(loaded_params, loaded_cfg, x,
                                            iters=3)
    assert out3.shape == (1, 3, 128, 128)


@pytest.mark.slow
def test_generator_checkpoint_roundtrip(tmp_path):
    """Full-layout (512-channel) generator: torch export -> import ->
    identical forward."""
    import torch
    from gangealing_tpu.models.stylegan2 import (
        GeneratorConfig, generator_init, generator_apply, make_noise)
    from gangealing_tpu.io import (
        load_torch_checkpoint)
    from gangealing_tpu.io.torch_import import generator_config_from_args

    cfg = GeneratorConfig(size=64)  # default 512-dim mapping + channel table
    params = generator_init(jax.random.PRNGKey(0), cfg)
    # expected reference key layout
    assert params["style.1.weight"].shape == (512, 512)
    assert f"style.{cfg.n_mlp}.weight" in params
    assert params["conv1.conv.weight"].shape == (1, 512, 512, 3, 3)
    assert params["to_rgb1.conv.weight"].shape == (1, 3, 512, 1, 1)
    assert params["convs.0.conv.weight"].shape == (1, 512, 512, 3, 3)
    n_blocks = cfg.log_size - 2
    assert f"to_rgbs.{n_blocks - 1}.bias" in params
    assert f"noises.noise_{cfg.num_layers - 1}" in params

    pt = str(tmp_path / "g.pt")
    import argparse
    torch.save({
        "g_ema": {k: torch.from_numpy(np.asarray(v))
                  for k, v in params.items()},
        "args": argparse.Namespace(gen_size=64, dim_latent=512, n_mlp=8,
                                   gen_channel_multiplier=2, num_fp16_res=0),
    }, pt)
    ck = load_torch_checkpoint(pt)
    cfg2 = generator_config_from_args(ck["args"])
    assert cfg2.size == 64 and cfg2.n_latent == cfg.n_latent
    p2 = {k: jnp.asarray(v) for k, v in ck["g_ema"].items()}

    z = jax.random.normal(jax.random.PRNGKey(1), (1, 512))
    noise = make_noise(jax.random.PRNGKey(2), cfg, 1)
    a, _ = generator_apply(params, cfg, [z], noise=noise)
    b, _ = generator_apply(p2, cfg2, [z], noise=noise)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
