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
