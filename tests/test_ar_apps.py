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


@pytest.mark.slow
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


@pytest.mark.slow
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


def test_propagate_to_images_options(params, tmp_path, rng):
    """Reference propagate flags: colorscale mode (no --objects),
    --output_resolution, --n_mean average subset."""
    from gangealing_tpu.apps.propagate_to_images import propagate_to_images
    label = _label_png(tmp_path, rng)
    imgs = rng.randn(4, 3, S, S).astype(np.float32) * 0.2
    out = propagate_to_images(params, CFG, imgs, label_path=label, batch=2,
                              no_flip_inference=True, objects=False,
                              output_resolution=S // 2, average_n=2)
    assert out["congealed"].shape == (4, 3, S // 2, S // 2)
    assert out["average_congealed"].shape == (1, 3, S // 2, S // 2)
    np.testing.assert_allclose(out["average_congealed"][0],
                               out["congealed"][:2].mean(0), atol=1e-6)
    # colorscale mode still splats something visible where the label lives
    assert out["propagated"].shape == (4, 3, S, S)


def test_mixed_reality_save_frames_and_dir_input(params, tmp_path, rng):
    """--save_frames streaming mode (PNGs on disk, mp4 assembled from files)
    + frame-directory lazy input (mixed_reality.py:213-216,258-262)."""
    from PIL import Image
    from gangealing_tpu.apps.mixed_reality import run_gangealing_on_video
    from gangealing_tpu.data.prepare import list_frame_paths

    label = _label_png(tmp_path, rng)
    # write a frame directory (numeric filenames, out of lexicographic order)
    fdir = tmp_path / "framedir"
    fdir.mkdir()
    for i in range(5):
        arr = (rng.rand(S, S, 3) * 255).astype(np.uint8)
        Image.fromarray(arr).save(str(fdir / f"{i}.png"))
    paths = list_frame_paths(str(fdir))
    assert [os.path.basename(p) for p in paths] == [f"{i}.png"
                                                    for i in range(5)]
    out_dir = str(tmp_path / "mr")
    result = run_gangealing_on_video(
        params, CFG, paths, label_path=label, batch=2, out_dir=out_dir,
        no_flip_inference=True, save_frames=True, fps=5)
    assert "congealed" not in result  # streamed, not held in memory
    for i in range(5):
        assert os.path.isfile(os.path.join(out_dir, "frames", f"{i}.png"))
        assert os.path.isfile(os.path.join(out_dir, "congealing_frames",
                                           f"{i}.png"))
    assert os.path.getsize(os.path.join(out_dir, "propagated.mp4")) > 0
    assert os.path.getsize(os.path.join(out_dir, "congealed.mp4")) > 0


@pytest.mark.slow
def test_mixed_reality_cluster_activity_video(tmp_path, rng):
    """average.mp4 for clustering models: labeled averages with the active
    cluster highlighted (mixed_reality.py:58-70,245-256)."""
    from PIL import Image
    from gangealing_tpu.apps.mixed_reality import run_gangealing_on_video
    from gangealing_tpu.models.classifier import (ClassifierConfig,
                                                  classifier_init)

    K = 2
    ccfg = ComposedSTNConfig(transforms=("similarity", "flow"), flow_size=S,
                             supersize=S, channel_multiplier=0.25,
                             flow_downsample=4, max_channels=32, num_heads=K)
    cparams = composed_stn_init(jax.random.PRNGKey(1), ccfg)
    cls_cfg = ClassifierConfig(size=S, supersize=S, channel_multiplier=0.25,
                               num_heads=K, max_channels=32)
    cls_params = classifier_init(jax.random.PRNGKey(2), cls_cfg)
    label = _label_png(tmp_path, rng)
    for k in range(K):
        arr = (rng.rand(S, S, 3) * 255).astype(np.uint8)
        Image.fromarray(arr).save(str(tmp_path / f"avg_cluster{k}.png"))
    frames = np.tanh(rng.randn(3, 3, S, S).astype(np.float32))
    out_dir = str(tmp_path / "mrc")
    result = run_gangealing_on_video(
        cparams, ccfg, frames, label_path=label, batch=1, out_dir=out_dir,
        classifier=(cls_params, cls_cfg), fps=5, resolution=S,
        average_path=str(tmp_path / "avg_cluster0.png"))
    assert len(result["average_frames"]) == 3
    assert os.path.getsize(os.path.join(out_dir, "average.mp4")) > 0
