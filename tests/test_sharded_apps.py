"""Multi-device (8 virtual CPU devices) inference-app equality tests.

Every eval app accepts a ``mesh`` and shards its batches over the data
axis — the TPU equivalent of the reference's rank-sharded eval loops
(applications/congeal_dataset.py:32, flow_scores.py:40-41,
mixed_reality.py:28-33, pck.py:172-174). These tests assert the sharded
run produces the same results as the single-device run, including ragged
tails that require padding to a device-divisible batch.
"""

import io
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gangealing_tpu.data.lmdb_io import write_lmdb
from gangealing_tpu.data.dataset import (
    PCKDataset, DataLoader, MultiResolutionDataset)
from gangealing_tpu.models.stn import ComposedSTNConfig, composed_stn_init
from gangealing_tpu.parallel import auto_mesh

S = 64
CFG = ComposedSTNConfig(transforms=("similarity", "flow"), flow_size=S,
                        supersize=S, channel_multiplier=0.25,
                        flow_downsample=4, max_channels=32)


def _encode_png(arr):
    from PIL import Image
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="PNG")
    return buf.getvalue()


def _params(sim_scale=0.01):
    """Identity-init STN with a non-zero flow head + similarity head so
    warps, flips and scores actually vary per image (sim_scale kept small
    enough that warps stay in bounds)."""
    params = composed_stn_init(jax.random.PRNGKey(0), CFG)
    for k, sc in (("stns.1.warp_head.flow_out.2.weight", 0.05),
                  ("stns.0.warp_head.linear.weight", sim_scale)):
        params[k] = sc * jax.random.normal(
            jax.random.PRNGKey(hash(k) % (2 ** 31)), params[k].shape)
    return params


@pytest.fixture
def img_lmdb(tmp_path, rng):
    n = 10
    imgs = (rng.rand(n, S, S, 3) * 255).astype(np.uint8)
    items = {b"length": str(n).encode()}
    for i in range(n):
        items[f"{S}-{str(i).zfill(5)}".encode()] = _encode_png(imgs[i])
    path = str(tmp_path / "imgs")
    write_lmdb(path, items)
    return path


def test_auto_mesh_builds_over_all_devices():
    mesh = auto_mesh()
    assert mesh is not None and mesh.devices.size == 8
    assert auto_mesh(1) is None
    assert auto_mesh(4).devices.size == 4


def test_flow_scores_sharded_equals_single(img_lmdb):
    from gangealing_tpu.apps.flow_scores import compute_flow_scores
    params = _params()
    # batch=3 on 8 devices: every batch is padded 3 -> 8 (ragged tail path)
    single = compute_flow_scores(params, CFG, img_lmdb, real_size=S, batch=3,
                                 no_flip_inference=True, save=False)
    sharded = compute_flow_scores(params, CFG, img_lmdb, real_size=S, batch=3,
                                  no_flip_inference=True, save=False,
                                  mesh=auto_mesh())
    assert sharded.shape == single.shape == (10,)
    np.testing.assert_allclose(sharded, single, rtol=1e-6, atol=1e-6)


def test_congeal_dataset_sharded_equals_single(img_lmdb, tmp_path):
    from gangealing_tpu.apps.congeal_dataset import align_and_filter_dataset
    # identity similarity head: any outward warp on a full-canvas image is
    # (correctly) rejected by the OOB filter, which would empty the output
    params = _params(sim_scale=0.0)
    kwargs = dict(real_size=S, flow_size=S, output_resolution=32, batch=3,
                  min_effective_resolution=0, no_flip_inference=True)
    used1 = align_and_filter_dataset(params, CFG, img_lmdb,
                                     str(tmp_path / "out1"), **kwargs)
    used8 = align_and_filter_dataset(params, CFG, img_lmdb,
                                     str(tmp_path / "out8"),
                                     mesh=auto_mesh(), **kwargs)
    assert used1 == used8 and len(used1) == 10
    d1 = MultiResolutionDataset(str(tmp_path / "out1"), resolution=32)
    d8 = MultiResolutionDataset(str(tmp_path / "out8"), resolution=32)
    assert len(d1) == len(d8)
    for i in range(len(d1)):
        a = np.asarray(d1[i], np.float32)
        b = np.asarray(d8[i], np.float32)
        # written PNGs quantize to uint8; allow 1 level of rounding skew
        assert np.abs(a - b).max() <= 2 / 255 + 1e-6


@pytest.fixture
def pck_lmdb(tmp_path, rng):
    import torch
    n = 10
    base = (rng.rand(n // 2, S, S, 3) * 255).astype(np.uint8)
    imgs = np.repeat(base, 2, axis=0)
    items = {b"length": str(n).encode()}
    for i in range(n):
        items[f"{S}-{str(i).zfill(5)}".encode()] = _encode_png(imgs[i])
    path = str(tmp_path / "pck")
    write_lmdb(path, items)
    kps = np.concatenate([
        rng.rand(n, 5, 2).astype(np.float32) * (S - 1),
        np.ones((n, 5, 1), np.float32)], axis=2)
    kps[1::2] = kps[0::2]
    torch.save(torch.from_numpy(kps), os.path.join(path, "keypoints.pt"))
    torch.save(torch.arange(n).view(n // 2, 2), os.path.join(path, "pairs.pt"))
    return path


def test_pck_sharded_equals_single(pck_lmdb):
    from gangealing_tpu.apps.pck import pck_transfer
    params = _params()

    def run(mesh):
        dset = PCKDataset(pck_lmdb, resolution=S)
        loader = DataLoader(dset, batch_size=3, shuffle=False,
                            drop_last=False)
        return pck_transfer(params, CFG, loader, alphas=(0.1, 0.05),
                            num_pairs=len(dset), match_flows=True,
                            permutation=np.arange(5),
                            transfer_both_ways=True, batch_size=3, mesh=mesh)

    single = run(None)
    sharded = run(auto_mesh())
    np.testing.assert_allclose(sharded, single, rtol=1e-6, atol=1e-8)


def test_propagate_sharded_equals_single(tmp_path, rng):
    from gangealing_tpu.apps.propagate_to_images import propagate_to_images
    from PIL import Image
    params = _params()
    rgba = np.zeros((S, S, 4), np.uint8)
    rgba[20:40, 24:44, 3] = 255
    rgba[20:40, 24:44, 1] = 180
    label = str(tmp_path / "label.png")
    Image.fromarray(rgba).save(label)
    imgs = (rng.rand(5, 3, S, S).astype(np.float32) * 2 - 1)
    kwargs = dict(label_path=label, batch=3, no_flip_inference=True,
                  resolution=S, objects=True)
    r1 = propagate_to_images(params, CFG, imgs, **kwargs)
    r8 = propagate_to_images(params, CFG, imgs, mesh=auto_mesh(), **kwargs)
    assert set(r1) == set(r8)
    for k in r1:
        np.testing.assert_allclose(r8[k], r1[k], rtol=1e-6, atol=1e-4,
                                   err_msg=k)


@pytest.mark.slow
def test_flow_scores_sharded_equals_single_flagship_shape(tmp_path, rng):
    """Sharded-vs-single equality at the FLAGSHIP shape (256px real /
    128px flow, channel_multiplier 0.5) — closes the 'sharding only
    tested at toy size' risk: the toy tests catch wiring bugs, this one
    catches shape-dependent sharding/layout bugs at the published
    operating point."""
    from gangealing_tpu.apps.flow_scores import compute_flow_scores
    R = 256
    cfg = ComposedSTNConfig(transforms=("similarity", "flow"),
                            flow_size=128, supersize=R,
                            channel_multiplier=0.5)
    params = composed_stn_init(jax.random.PRNGKey(0), cfg)
    k = "stns.1.warp_head.flow_out.2.weight"
    params[k] = 0.05 * jax.random.normal(jax.random.PRNGKey(7),
                                         params[k].shape)
    n = 10
    imgs = (rng.rand(n, R, R, 3) * 255).astype(np.uint8)
    items = {b"length": str(n).encode()}
    for i in range(n):
        items[f"{R}-{str(i).zfill(5)}".encode()] = _encode_png(imgs[i])
    path = str(tmp_path / "imgs256")
    write_lmdb(path, items)

    kwargs = dict(real_size=R, batch=8, no_flip_inference=True, save=False)
    single = compute_flow_scores(params, cfg, path, **kwargs)
    sharded = compute_flow_scores(params, cfg, path, mesh=auto_mesh(),
                                  **kwargs)
    assert single.shape == sharded.shape == (n,)
    np.testing.assert_allclose(sharded, single, rtol=1e-5, atol=1e-6)


def test_average_image_video_sharded_equals_single(rng):
    """vis_correspondence's average-image path sharded over the mesh equals
    the single-device run, incl. a ragged tail (5 images, batch 3 -> padded
    to 8); the reference rank-shards this loop
    (applications/vis_correspondence.py:338-379)."""
    from gangealing_tpu.apps.vis_correspondence import average_image_video
    params = _params()
    imgs = rng.randn(5, 3, S, S).astype(np.float32) * 0.3
    f1 = average_image_video(params, CFG, imgs, num_frames=3, batch=3)
    f8 = average_image_video(params, CFG, imgs, num_frames=3, batch=3,
                             mesh=auto_mesh())
    assert len(f1) == len(f8) == 3
    for a, b in zip(f1, f8):
        # frames quantize to uint8; allow 1 level of rounding skew
        assert np.abs(np.asarray(a, np.int32) - np.asarray(b, np.int32)
                      ).max() <= 1


def test_bucket_by_cluster_sharded_equals_single(rng):
    """Cluster bucketing sharded over the mesh returns identical index
    buckets (reference all_gathervs per-rank buckets,
    applications/vis_correspondence.py:310-327)."""
    from gangealing_tpu.apps.vis_correspondence import (
        bucket_real_images_by_cluster)
    from gangealing_tpu.models.classifier import (
        ClassifierConfig, classifier_init)
    cfg = ClassifierConfig(size=S, supersize=S, channel_multiplier=0.25,
                           num_heads=4, max_channels=32)
    cls_params = classifier_init(jax.random.PRNGKey(0), cfg)
    imgs = rng.randn(10, 3, S, S).astype(np.float32)
    b1 = bucket_real_images_by_cluster(cls_params, cfg, imgs, 2, batch=3)
    b8 = bucket_real_images_by_cluster(cls_params, cfg, imgs, 2, batch=3,
                                       mesh=auto_mesh())
    assert len(b1) == len(b8) == 2
    for x, y in zip(b1, b8):
        np.testing.assert_array_equal(x, y)


def test_classifier_training_sharded_equals_single():
    """Cluster-classifier training sharded over the 8-device mesh matches
    the single-device run (the TPU analogue of the reference's DDP wrap,
    train_cluster_classifier.py:204-207)."""
    from gangealing_tpu.models.stylegan2 import (
        GeneratorConfig, generator_init)
    from gangealing_tpu.models.latent_learner import (
        LatentLearnerConfig, latent_learner_init)
    from gangealing_tpu.models.classifier import (
        ClassifierConfig, classifier_init)
    from gangealing_tpu.train.state import TrainConfig
    from gangealing_tpu.train.classifier_train import (
        train_cluster_classifier, warm_start_from_stn)

    g_cfg = GeneratorConfig(size=S, style_dim=32, n_mlp=2,
                            channel_multiplier=1, max_channels=32)
    t_cfg = ComposedSTNConfig(transforms=("similarity", "flow"), flow_size=S,
                              supersize=S, channel_multiplier=0.25,
                              flow_downsample=4, max_channels=32, num_heads=2)
    ll_cfg = LatentLearnerConfig(n_comps=2, inject_index=3,
                                 n_latent=g_cfg.n_latent, num_heads=2,
                                 style_dim=32)
    cfg = TrainConfig(g=g_cfg, t=t_cfg, ll=ll_cfg, batch=8, flips=True)
    cls_cfg = ClassifierConfig(size=S, supersize=S, channel_multiplier=0.25,
                               num_heads=4, max_channels=32)
    g_params = generator_init(jax.random.PRNGKey(0), g_cfg)
    t_params = composed_stn_init(jax.random.PRNGKey(1), t_cfg)
    ll_params = latent_learner_init(jax.random.PRNGKey(2), ll_cfg)
    cls0 = classifier_init(jax.random.PRNGKey(3), cls_cfg)
    cls0 = warm_start_from_stn(cls0, t_params)

    def l2(p, x, y):
        return jnp.mean((x - y) ** 2, axis=(1, 2, 3), keepdims=True)

    def run(use_mesh):
        params, _ = train_cluster_classifier(
            cfg, cls_cfg, g_params, t_params, ll_params, dict(cls0), None,
            l2, iters=3, progress=False, use_mesh=use_mesh)
        return jax.tree.map(np.asarray, params)

    single = run(False)
    sharded = run(True)
    assert set(single) == set(sharded)
    for k in single:
        np.testing.assert_allclose(sharded[k], single[k], rtol=1e-4,
                                   atol=1e-5, err_msg=k)


def test_mixed_reality_sharded_equals_single(tmp_path, rng):
    from gangealing_tpu.apps.mixed_reality import run_gangealing_on_video
    from PIL import Image
    params = _params()
    rgba = np.zeros((S, S, 4), np.uint8)
    rgba[10:30, 14:34, 3] = 255
    rgba[10:30, 14:34, 0] = 220
    label = str(tmp_path / "label.png")
    Image.fromarray(rgba).save(label)
    frames = (rng.rand(5, 3, S, S).astype(np.float32) * 2 - 1)
    kwargs = dict(label_path=label, batch=3, no_flip_inference=True,
                  resolution=S, objects=True, save_correspondences=True)
    r1 = run_gangealing_on_video(params, CFG, frames, **kwargs)
    r8 = run_gangealing_on_video(params, CFG, frames, mesh=auto_mesh(),
                                 **kwargs)
    for k in ("propagated", "congealed", "correspondences"):
        assert r1[k].shape == r8[k].shape
        np.testing.assert_allclose(r8[k], r1[k], rtol=1e-6, atol=1e-4,
                                   err_msg=k)
