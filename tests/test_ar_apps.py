"""AR pipeline tests: propagate_object, mixed_reality, propagate_to_images."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gangealing_tpu.models.stn import (
    ComposedSTNConfig, composed_stn_init, composed_propagate_object)

S = 64
CFG = ComposedSTNConfig(transforms=("similarity", "flow"), flow_size=S,
                        supersize=S, channel_multiplier=0.25,
                        flow_downsample=4, max_channels=32)


@pytest.fixture(scope="module")
def params():
    return composed_stn_init(jax.random.PRNGKey(0), CFG)


def _label_png(tmp_path, rng):
    from PIL import Image
    rgba = np.zeros((S, S, 4), np.uint8)
    rgba[20:40, 24:44, 0] = 255  # red patch
    rgba[20:40, 24:44, 3] = 255
    p = str(tmp_path / "label.png")
    Image.fromarray(rgba).save(p)
    return p


def test_propagate_object_identity(params, rng):
    """Identity STN: congealed points land at their own coordinates."""
    N, P = 2, 40
    pts_px = rng.rand(1, P, 2).astype(np.float32) * (S - 1)
    from gangealing_tpu.models.stn import normalize_points
    pts = normalize_points(jnp.asarray(np.tile(pts_px, (N, 1, 1))), S, S)
    values = jnp.asarray(rng.rand(N, P, 3).astype(np.float32))
    masks = jnp.ones((N, P, 1))
    target = jnp.asarray(rng.randn(N, 3, S, S).astype(np.float32))
    sigma = jnp.full((N,), 1.5)
    obj, mask = composed_propagate_object(params, CFG, pts, values, masks,
                                          target, sigma, max_sigma=2.0)
    assert obj.shape == (N, 3, S, S)
    assert mask.shape == (N, 1, S, S)
    assert float(jnp.max(mask)) > 0.5  # points landed in-bounds


def test_mixed_reality(params, tmp_path, rng):
    from gangealing_tpu.apps.mixed_reality import run_gangealing_on_video
    label = _label_png(tmp_path, rng)
    frames = rng.randn(5, 3, S, S).astype(np.float32) * 0.2
    out = run_gangealing_on_video(
        params, CFG, frames, label_path=label, batch=2, sigma=1.0,
        no_flip_inference=True, out_dir=str(tmp_path / "mr"),
        save_correspondences=True)
    assert out["propagated"].shape == (5, 3, S, S)
    assert out["congealed"].shape == (5, 3, S, S)
    assert out["correspondences"].shape[0] == 5
    assert os.path.exists(tmp_path / "mr" / "propagated.mp4")
    # identity STN + red label patch -> red channel boosted in patch region
    region = out["propagated"][:, 0, 25:35, 28:40]
    outside = out["propagated"][:, 0, :10, :10]
    assert region.mean() > outside.mean() + 0.3


def test_mixed_reality_nonsquare_crop(params, rng):
    from gangealing_tpu.apps.mixed_reality import run_gangealing_on_video
    frames = rng.randn(2, 3, S, S + 20).astype(np.float32) * 0.2
    out = run_gangealing_on_video(params, CFG, frames, objects=False,
                                  batch=2, no_flip_inference=True)
    assert out["congealed"].shape == (2, 3, S, S)


def test_propagate_to_images(params, tmp_path, rng):
    from gangealing_tpu.apps.propagate_to_images import propagate_to_images
    label = _label_png(tmp_path, rng)
    imgs = rng.randn(4, 3, S, S).astype(np.float32) * 0.2
    out = propagate_to_images(params, CFG, imgs, label_path=label, batch=2,
                              no_flip_inference=True,
                              out_dir=str(tmp_path / "prop"))
    assert out["congealed"].shape == (4, 3, S, S)
    assert out["average_congealed"].shape == (1, 3, S, S)
    assert out["propagated"].shape == (4, 3, S, S)
    assert os.path.exists(tmp_path / "prop" / "propagated.png")
