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


@pytest.mark.slow
def test_smoothly_congeal_and_propagate(params, tmp_path, rng):
    """The assembled dense-tracking pipeline: bidirectional consistency,
    splat_batch chunking, three mp4s (vis_correspondence.py:226-298)."""
    from PIL import Image
    from gangealing_tpu.apps.vis_correspondence import (
        smoothly_congeal_and_propagate)
    rgba = np.zeros((S, S, 4), np.uint8)
    rgba[20:36, 24:40] = [255, 0, 0, 255]
    label = str(tmp_path / "label.png")
    Image.fromarray(rgba).save(label)
    imgs = np.tanh(rng.randn(4, 3, S, S).astype(np.float32))
    out_dir = str(tmp_path / "vids")
    os.makedirs(out_dir)
    congeal_frames, prop_frames = smoothly_congeal_and_propagate(
        params, CFG, imgs, label_path=label, length=4,
        output_resolution=S, resolution=S, splat_batch=3,  # force chunking
        no_flip_inference=False, out_dir=out_dir, fps=10)
    assert len(congeal_frames) == 4
    assert prop_frames is not None and len(prop_frames) == 4
    for name in ("smoothly_congeal.mp4", "smoothly_propagate.mp4",
                 "smooth_correspondence.mp4"):
        assert os.path.getsize(os.path.join(out_dir, name)) > 0


def test_smoothly_congeal_in_stages_no_label(params, rng):
    from gangealing_tpu.apps.vis_correspondence import (
        smoothly_congeal_and_propagate)
    imgs = np.tanh(rng.randn(2, 3, S, S).astype(np.float32))
    frames, prop = smoothly_congeal_and_propagate(
        params, CFG, imgs, length=3, vis_in_stages=True,
        output_resolution=S, no_flip_inference=True)
    assert prop is None
    assert len(frames) == 6  # 2 stages (similarity, flow) x 3 frames


def test_bidirectional_tracking_pins_congealed_end(params, tmp_path, rng):
    """At the final (fully congealed) frame the tracked points must equal the
    exact label coordinates — that is what the reverse pass guarantees."""
    from PIL import Image
    from gangealing_tpu.apps.vis_correspondence import (
        smoothly_congeal_and_propagate, visualize_label_propagation)
    import gangealing_tpu.apps.vis_correspondence as vc

    rgba = np.zeros((S, S, 4), np.uint8)
    rgba[8:12, 8:12] = [0, 0, 255, 255]
    label = str(tmp_path / "label.png")
    Image.fromarray(rgba).save(label)
    imgs = np.tanh(rng.randn(2, 3, S, S).astype(np.float32))

    captured = {}
    orig = vc.visualize_label_propagation

    def spy(images, pts, *a, **k):
        captured["pts"] = np.asarray(pts)
        return orig(images, pts, *a, **k)

    vc.visualize_label_propagation = spy
    try:
        smoothly_congeal_and_propagate(
            params, CFG, imgs, label_path=label, length=4,
            output_resolution=S, resolution=S, no_flip_inference=True)
    finally:
        vc.visualize_label_propagation = orig
    from gangealing_tpu.utils.vis import load_dense_label
    points, _, _ = load_dense_label(label, resolution=S)
    expected = np.round(np.asarray(points)[0])
    final = captured["pts"][-1]  # (N, P, 2) at the fully-congealed frame
    assert np.allclose(final, expected[None], atol=1e-4)


def test_stage_flip_frames(params, tmp_path, rng):
    """--stage_flip prepends flip-animation frames (and labeled initial
    propagation frames) before the warp stages (vis_correspondence.py:261-271)."""
    from PIL import Image
    from gangealing_tpu.apps.vis_correspondence import (
        smoothly_congeal_and_propagate)
    rgba = np.zeros((S, S, 4), np.uint8)
    rgba[8:16, 8:16] = [0, 255, 0, 255]
    label = str(tmp_path / "l.png")
    Image.fromarray(rgba).save(label)
    imgs = np.tanh(rng.randn(2, 3, S, S).astype(np.float32))
    congeal_frames, prop_frames = smoothly_congeal_and_propagate(
        params, CFG, imgs, label_path=label, length=3, flip_length=2,
        stage_flip=True, output_resolution=S, resolution=S,
        no_flip_inference=True)
    assert len(congeal_frames) == 2 + 3   # flip frames + one stage
    # propagation video: stage frames (reversed) + initial flip frames
    assert len(prop_frames) == 3 + 2
