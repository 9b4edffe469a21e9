"""Tests for the correspondence-visualization videos."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gangealing_tpu.models.stn import ComposedSTNConfig, composed_stn_init

S = 64
CFG = ComposedSTNConfig(transforms=("similarity", "flow"), flow_size=S,
                        supersize=S, channel_multiplier=0.25,
                        flow_downsample=4, max_channels=32)


@pytest.fixture(scope="module")
def params():
    return composed_stn_init(jax.random.PRNGKey(0), CFG)


def test_smooth_congeal_video(params, tmp_path, rng):
    from gangealing_tpu.apps.vis_correspondence import smooth_congeal_video
    imgs = rng.randn(2, 3, S, S).astype(np.float32) * 0.3
    out = str(tmp_path / "congeal.mp4")
    frames = smooth_congeal_video(params, CFG, imgs, num_frames=4,
                                  out_path=out)
    assert len(frames) == 4
    assert os.path.getsize(out) > 0


def test_smooth_propagation_video(params, tmp_path, rng):
    from gangealing_tpu.apps.vis_correspondence import (
        smooth_propagation_video)
    from PIL import Image
    rgba = np.zeros((S, S, 4), np.uint8)
    rgba[10:20, 10:20] = [0, 255, 0, 255]
    label = str(tmp_path / "l.png")
    Image.fromarray(rgba).save(label)
    imgs = rng.randn(2, 3, S, S).astype(np.float32) * 0.3
    frames = smooth_propagation_video(params, CFG, imgs, label, num_frames=3)
    assert len(frames) == 3


def test_average_image_video(params, rng):
    from gangealing_tpu.apps.vis_correspondence import average_image_video
    imgs = rng.randn(4, 3, S, S).astype(np.float32) * 0.3
    frames = average_image_video(params, CFG, imgs, num_frames=2, batch=2)
    assert len(frames) == 2


def test_bucket_by_cluster(rng):
    from gangealing_tpu.apps.vis_correspondence import (
        bucket_real_images_by_cluster)
    from gangealing_tpu.models.classifier import (
        ClassifierConfig, classifier_init)
    cfg = ClassifierConfig(size=S, supersize=S, channel_multiplier=0.25,
                           num_heads=4, max_channels=32)
    cls_params = classifier_init(jax.random.PRNGKey(0), cfg)
    imgs = rng.randn(6, 3, S, S).astype(np.float32)
    buckets = bucket_real_images_by_cluster(cls_params, cfg, imgs, 2)
    assert len(buckets) == 2
    assert sum(len(b) for b in buckets) == 6
