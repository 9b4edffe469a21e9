"""End-to-end app tests over synthetic LMDB datasets with an identity-init
STN: PCK-Transfer, flow scores, congeal_dataset."""

import io
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gangealing_tpu.data.lmdb_io import write_lmdb
from gangealing_tpu.data.dataset import PCKDataset, DataLoader, \
    MultiResolutionDataset
from gangealing_tpu.models.stn import ComposedSTNConfig, composed_stn_init

S = 64
CFG = ComposedSTNConfig(transforms=("similarity", "flow"), flow_size=S,
                        supersize=S, channel_multiplier=0.25,
                        flow_downsample=4, max_channels=32)


def _encode_png(arr):
    from PIL import Image
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="PNG")
    return buf.getvalue()


@pytest.fixture
def pck_lmdb(tmp_path, rng):
    """8 images; pairs (2i, 2i+1) are identical images with identical kps."""
    import torch
    n = 8
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
    kps[1::2] = kps[0::2]  # pairs share keypoints
    torch.save(torch.from_numpy(kps), os.path.join(path, "keypoints.pt"))
    torch.save(torch.arange(n).view(n // 2, 2), os.path.join(path, "pairs.pt"))
    return path


def test_pck_identity_stn_is_perfect(pck_lmdb):
    """Identity STN + identical pairs -> est == gt -> PCK 100% at alpha=0.1."""
    from gangealing_tpu.apps.pck import pck_transfer
    params = composed_stn_init(jax.random.PRNGKey(0), CFG)
    dset = PCKDataset(pck_lmdb, resolution=S)
    loader = DataLoader(dset, batch_size=4, shuffle=False, drop_last=False)
    pck = pck_transfer(params, CFG, loader, alphas=(0.1, 0.05),
                       num_pairs=len(dset), match_flows=False,
                       transfer_both_ways=True, batch_size=4)
    assert pck.shape == (2,)
    assert pck[0] > 0.95, f"identity transfer should be near-perfect: {pck}"


def test_run_pck_end_to_end(pck_lmdb, tmp_path):
    """run_pck: checkpoint load -> auto mesh -> loader batch rounded to a
    device multiple -> same identity-STN result as calling pck_transfer."""
    import argparse
    import torch
    from gangealing_tpu.apps.pck import run_pck
    params = composed_stn_init(jax.random.PRNGKey(0), CFG)
    ckpt = {
        "t_ema": {k: torch.from_numpy(np.asarray(v).copy())
                  for k, v in params.items()},
        "args": argparse.Namespace(
            transform=["similarity", "flow"], flow_size=S,
            stn_channel_multiplier=0.25, flow_downsample=4,
            num_heads=1, real_size=S, max_channels=32),
    }
    ckpt_path = str(tmp_path / "stn.pt")
    torch.save(ckpt, ckpt_path)
    # batch=3 on the 8-virtual-device CPU mesh exercises the round-up path
    pck = run_pck(ckpt_path, pck_lmdb, alphas=(0.1,), real_size=S, batch=3,
                  no_flip_inference=True, transfer_both_ways=True)
    assert pck.shape == (1,)
    assert pck[0] > 0.95, f"identity transfer should be near-perfect: {pck}"


def test_pck_vis_transfer(pck_lmdb, tmp_path):
    """--vis_transfer renders the transfer grid + congealed grid PNGs."""
    from gangealing_tpu.apps.pck import vis_transfer
    params = composed_stn_init(jax.random.PRNGKey(0), CFG)
    dset = PCKDataset(pck_lmdb, resolution=S)
    loader = DataLoader(dset, batch_size=4, shuffle=False, drop_last=False)
    out = str(tmp_path / "vis")
    grid_path = vis_transfer(params, CFG, loader,
                             permutation=np.arange(5), out_dir=out,
                             num_to_vis=2, match_flows=True)
    assert os.path.exists(grid_path)
    assert os.path.exists(os.path.join(out, "transfers", "congealed.png"))


def test_pck_with_match_flows(pck_lmdb):
    from gangealing_tpu.apps.pck import pck_transfer
    params = composed_stn_init(jax.random.PRNGKey(0), CFG)
    dset = PCKDataset(pck_lmdb, resolution=S)
    loader = DataLoader(dset, batch_size=4, shuffle=False, drop_last=False)
    pck = pck_transfer(params, CFG, loader, alphas=(0.1,),
                       num_pairs=4, match_flows=True,
                       permutation=np.arange(5), batch_size=4)
    assert pck[0] > 0.9


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


def test_flow_scores_and_filter(img_lmdb):
    from gangealing_tpu.apps.flow_scores import (
        compute_flow_scores, get_flow_scores, filter_dataset)
    params = composed_stn_init(jax.random.PRNGKey(0), CFG)
    # non-zero flow head so per-image smoothness varies
    k = "stns.1.warp_head.flow_out.2.weight"
    params[k] = 0.1 * jax.random.normal(jax.random.PRNGKey(7),
                                        params[k].shape)
    scores = compute_flow_scores(params, CFG, img_lmdb, real_size=S, batch=4,
                                 no_flip_inference=True, save=True)
    assert scores.shape == (10,)
    assert np.all(np.isfinite(scores))
    # cached path
    cached = get_flow_scores(params, CFG, img_lmdb)
    np.testing.assert_allclose(cached, scores, atol=1e-6)
    ds = MultiResolutionDataset(img_lmdb, resolution=S)
    filtered = filter_dataset(ds, scores, 0.5)
    assert 0 < len(filtered) < 10


def test_congeal_dataset(img_lmdb, tmp_path):
    from gangealing_tpu.apps.congeal_dataset import align_and_filter_dataset
    params = composed_stn_init(jax.random.PRNGKey(0), CFG)
    out = str(tmp_path / "aligned")
    used = align_and_filter_dataset(
        params, CFG, img_lmdb, out, real_size=S, flow_size=S,
        output_resolution=S, batch=4, min_effective_resolution=S // 2,
        no_flip_inference=True)
    # identity STN: scale=1, no OOB -> everything retained
    assert used == list(range(10))
    ds = MultiResolutionDataset(out, resolution=S)
    assert len(ds) == 10
    x = ds[0]
    assert x.shape == (3, S, S)


def test_congeal_dataset_native_size(tmp_path, rng):
    """real_size=0 = the reference's native-size mode (README.md:227-232):
    variable-size images stored unresized under '0-' keys; the canvas is
    derived from the dataset's max square size."""
    from gangealing_tpu.apps.congeal_dataset import align_and_filter_dataset
    sizes = [(48, 64), (64, 48), (56, 56), (64, 64)]
    items = {b"length": str(len(sizes)).encode()}
    for i, (w, h) in enumerate(sizes):
        img = (rng.rand(h, w, 3) * 255).astype(np.uint8)
        items[f"0-{str(i).zfill(5)}".encode()] = _encode_png(img)
    path = str(tmp_path / "native")
    write_lmdb(path, items)
    params = composed_stn_init(jax.random.PRNGKey(0), CFG)
    out = str(tmp_path / "aligned0")
    used = align_and_filter_dataset(
        params, CFG, path, out, real_size=0, flow_size=S,
        output_resolution=S, batch=2, min_effective_resolution=24,
        no_flip_inference=True)
    # identity warp samples the whole padded square, so non-square images
    # trip the out-of-bounds filter (the reference rejects these too,
    # congeal_dataset.py:46,58); the square ones are retained
    assert used == [2, 3]
    ds = MultiResolutionDataset(out, resolution=S)
    assert len(ds) == 2


def test_pck_sharded_over_mesh(pck_lmdb):
    """PCK batches shard over the 8-device CPU mesh (DP inference)."""
    import jax
    from gangealing_tpu.apps.pck import pck_transfer
    from gangealing_tpu.parallel import make_mesh
    assert jax.device_count() == 8
    params = composed_stn_init(jax.random.PRNGKey(0), CFG)
    dset = PCKDataset(pck_lmdb, resolution=S)
    loader = DataLoader(dset, batch_size=8, shuffle=False, drop_last=False)
    pck = pck_transfer(params, CFG, loader, alphas=(0.1,), num_pairs=4,
                       match_flows=False, batch_size=8,
                       mesh=make_mesh())
    assert pck[0] > 0.95
