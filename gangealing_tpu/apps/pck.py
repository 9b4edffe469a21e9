"""PCK-Transfer evaluation (the framework's headline correctness metric).

Capability reference: applications/pck.py:18-175 (run_pck_transfer,
pck_transfer, bootstrap). Protocol:
  * SPair-71K: fixed pairs, per-image alpha*bbox thresholds
    (threshB*scaleB), one-way unless --transfer_both_ways.
  * CUB: random pairs, alpha*max(H,W) threshold, bidirectional.
  * match_flows 4-way flip matching unless --no_flip_inference.

TPU design: the entire per-batch computation (4-way flip matching + two
point-transfer passes + thresholding) is one jitted function; batches are
padded to a static size so a single executable serves the whole run; the
final reduction is a couple of scalars on host.
"""

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from gangealing_tpu.models.stn import (
    ComposedSTNConfig, composed_match_flows, composed_transfer_points)
from gangealing_tpu.data.dataset import PCKDataset, DataLoader


def make_pck_batch_fn(cfg: ComposedSTNConfig, alphas: Sequence[float],
                      iters: int = 1, padding_mode: str = "border",
                      match_flows: bool = True, transfer_both_ways: bool = True,
                      permutation=None, has_thresholds: bool = False):
    """Build the jitted per-batch PCK evaluator.

    Returns fn(params, imgsA, imgsB, kpsA, kpsB, visible, threshA, threshB,
               valid_mask) -> (correct_per_alpha, kps_seen).
    kps: (N, P, 2); visible: (N, P, 1); thresh*: (N,) (ignored when
    has_thresholds=False); valid_mask: (N,) 0/1 padding mask.
    """
    alphas_arr = jnp.asarray(list(alphas), jnp.float32).reshape(1, -1)

    @jax.jit
    def batch_fn(params, imgsA, imgsB, kpsA, kpsB, visible, threshA, threshB,
                 valid_mask):
        if match_flows:
            imgsA_m, imgsB_m, kpsA_m, kpsB_m, _ = composed_match_flows(
                params, cfg, imgsA, imgsB, kpsA, kpsB,
                permutation=permutation, iters=iters,
                padding_mode=padding_mode)
        else:
            imgsA_m, imgsB_m, kpsA_m, kpsB_m = imgsA, imgsB, kpsA, kpsB
        vm = (visible * valid_mask[:, None, None]).astype(jnp.float32)

        def one_way(src_img, dst_img, src_kps, dst_kps, thresh):
            est = composed_transfer_points(params, cfg, src_img, dst_img,
                                           src_kps, iters=iters,
                                           padding_mode=padding_mode)
            err = jnp.linalg.norm(est - dst_kps, axis=-1)[..., None]  # (N,P,1)
            thr = alphas_arr * thresh[:, None]  # (N, A)
            correct = (err <= thr[:, None, :]).astype(jnp.float32)  # (N,P,A)
            return jnp.sum(correct * vm, axis=(0, 1))  # (A,)

        if has_thresholds:
            tA, tB = threshA, threshB
        else:
            size = jnp.float32(max(imgsB.shape[-2], imgsB.shape[-1]))
            tA = jnp.full((imgsA.shape[0],), size)
            tB = jnp.full((imgsB.shape[0],), size)
        correct = one_way(imgsA_m, imgsB_m, kpsA_m, kpsB_m, tB)
        ways = 1
        if transfer_both_ways:
            correct = correct + one_way(imgsB_m, imgsA_m, kpsB_m, kpsA_m, tA)
            ways = 2
        kps_seen = jnp.sum(vm) * ways
        return correct, kps_seen

    return batch_fn


def _pad_batch(arr, batch_size):
    n = arr.shape[0]
    if n == batch_size:
        return arr
    pad = [(0, batch_size - n)] + [(0, 0)] * (arr.ndim - 1)
    return np.pad(np.asarray(arr), pad, mode="edge")


def pck_transfer(params, cfg: ComposedSTNConfig, loader, alphas=(0.1,),
                 num_pairs: Optional[int] = None, iters=1,
                 padding_mode="border", match_flows=True,
                 transfer_both_ways=True, permutation=None,
                 batch_size=None, progress=False, mesh=None):
    """Run PCK-Transfer over ``loader`` (an iterator of dict batches).
    Returns an (A,) numpy array of PCK per alpha (applications/pck.py:104)."""
    batch_fn = None
    correct = np.zeros(len(alphas), np.float64)
    kps_seen = 0.0
    pairs_seen = 0
    if mesh is not None:
        from gangealing_tpu.parallel import replicate, round_up_batch
        params = replicate(mesh, params)
        if batch_size is not None:
            batch_size = round_up_batch(batch_size, mesh)
    it = iter(loader)
    while num_pairs is None or pairs_seen < num_pairs:
        try:
            d = next(it)
        except StopIteration:
            break
        n = d["imgsA"].shape[0]
        if num_pairs is not None and pairs_seen + n > num_pairs:
            take = num_pairs - pairs_seen
            d = {k: v[:take] for k, v in d.items()}
            n = take
        has_th = "threshB" in d
        if batch_size is None:
            batch_size = d["imgsA"].shape[0]
            if mesh is not None:
                batch_size = round_up_batch(batch_size, mesh)
        if batch_fn is None:
            batch_fn = make_pck_batch_fn(
                cfg, alphas, iters=iters, padding_mode=padding_mode,
                match_flows=match_flows,
                transfer_both_ways=transfer_both_ways,
                permutation=permutation, has_thresholds=has_th)
        kpsA = np.asarray(d["kpsA"], np.float32)
        kpsB = np.asarray(d["kpsB"], np.float32)
        if kpsA.shape[-1] == 3:
            visible = (kpsA[..., 2:3] * kpsB[..., 2:3])
            kpsA, kpsB = kpsA[..., :2], kpsB[..., :2]
        else:
            visible = np.ones((*kpsA.shape[:2], 1), np.float32)
        valid = np.zeros(batch_size, np.float32)
        valid[:n] = 1.0
        if has_th:
            thA = np.asarray(d["scaleA"], np.float32) * np.asarray(
                d["threshA"], np.float32)
            thB = np.asarray(d["scaleB"], np.float32) * np.asarray(
                d["threshB"], np.float32)
        else:
            thA = thB = np.zeros(n, np.float32)
        args = [np.asarray(d["imgsA"], np.float32),
                np.asarray(d["imgsB"], np.float32),
                kpsA, kpsB, visible, thA, thB]
        args = [_pad_batch(a, batch_size) for a in args]
        valid = jnp.asarray(valid)
        if mesh is not None:
            # DP inference: shard every per-pair array over the data axis
            from gangealing_tpu.parallel import shard_batch
            args = [shard_batch(mesh, jnp.asarray(a)) for a in args]
            valid = shard_batch(mesh, valid)
        c, k = batch_fn(params, *args, valid)
        correct += np.asarray(c, np.float64)
        kps_seen += float(k)
        pairs_seen += n
        if progress:
            print(f"\rpck pairs: {pairs_seen}", end="", flush=True)
    if progress:
        print()
    if jax.process_count() > 1:
        # cross-host reduction of the correct counts and visible-keypoint
        # totals — the reference's all_gather(correct).sum /
        # all_gather(key_points_seen).sum (applications/pck.py:172-174);
        # the caller gives each process its own pair stripe (run_pck)
        from gangealing_tpu.parallel import all_gather_hosts
        correct = np.asarray(
            all_gather_hosts(correct.astype(np.float64))).sum(axis=0)
        kps_seen = float(np.asarray(all_gather_hosts(
            np.asarray([kps_seen], np.float64))).sum())
    return correct / max(kps_seen, 1.0)


def vis_transfer(params, cfg, loader, permutation=None, out_dir="visuals",
                 num_to_vis=8, match_flows=True, iters=1,
                 padding_mode="border"):
    """Save a keypoint-transfer visualization PNG (applications/pck.py:77-100):
    ground-truth keypoints overlaid on images A next to the transferred
    estimates on images B (both in their ORIGINAL, unflipped orientation),
    plus a grid of the congealed images."""
    import os
    from gangealing_tpu.utils.vis import batch_overlay, images2grid, save_image
    from gangealing_tpu.models.stn import composed_stn_forward

    d = next(iter(loader))
    n = min(num_to_vis, d["imgsA"].shape[0])
    imgsA = jnp.asarray(d["imgsA"][:n])
    imgsB = jnp.asarray(d["imgsB"][:n])
    kpsA_orig = jnp.asarray(d["kpsA"][:n, :, :2])
    kpsB = jnp.asarray(d["kpsB"][:n, :, :2])
    kwargs = dict(iters=iters, padding_mode=padding_mode)
    if match_flows:
        imgsA_m, imgsB_m, kpsA, _, pick = composed_match_flows(
            params, cfg, imgsA, imgsB, kpsA_orig, kpsB,
            permutation=permutation, **kwargs)
    else:
        imgsA_m, imgsB_m, kpsA = imgsA, imgsB, kpsA_orig
        pick = jnp.zeros((n,), jnp.int32)
    est_kpsB = composed_transfer_points(params, cfg, imgsA_m, imgsB_m,
                                        kpsA, **kwargs)
    W = imgsB.shape[-1]
    est_kpsB = est_kpsB.at[..., 0].set(
        jnp.where(pick.reshape(n, 1) > 1, W - 1 - est_kpsB[..., 0],
                  est_kpsB[..., 0]))

    imgs = jnp.concatenate([imgsA, imgsB])  # originals, pre-flip
    kps = jnp.concatenate([kpsA_orig, est_kpsB])
    out_path = os.path.join(out_dir, "transfers")
    os.makedirs(out_path, exist_ok=True)
    overlaid = batch_overlay(imgs, kps, None, out_path, unique_color=True,
                             size=10)
    grid = images2grid(np.stack(overlaid).transpose(0, 3, 1, 2), nrow=n,
                       normalize=True, range=(0, 255))
    from PIL import Image
    grid_path = os.path.join(out_path, "transfer_grid.png")
    Image.fromarray(grid).save(grid_path)

    congealed, _, _, _, _ = composed_stn_forward(
        params, cfg, jnp.concatenate([imgsA_m, imgsB_m]),
        output_resolution=W, **kwargs)
    congealed_path = os.path.join(out_path, "congealed.png")
    save_image(np.asarray(congealed), congealed_path, nrow=n,
               normalize=True, range=(-1, 1))
    print(f"Saved visualization to {grid_path} and {congealed_path}")
    return grid_path


def run_pck(ckpt_path, data_path, alphas=(0.1, 0.05, 0.01), real_size=256,
            batch=50, iters=1, padding_mode="border", num_pairs=None,
            transfer_both_ways=False, no_flip_inference=False, seed=0,
            mesh="auto"):
    """End-to-end: load checkpoint, evaluate PCK on an LMDB PCK dataset.

    ``transfer_both_ways`` defaults False, matching the reference CLI
    (applications/pck.py --transfer_both_ways store_true) and the one-way
    SPair protocol (reference README.md:207); pass True for CUB.

    ``mesh``: 'auto' shards pair batches over all local devices (the
    reference DistributedSampler-shards PCK, pck.py:172-174); pass None to
    force single-device, or an explicit Mesh."""
    from gangealing_tpu.io import load_torch_checkpoint, stn_config_from_args

    if mesh == "auto":
        from gangealing_tpu.parallel import auto_mesh
        mesh = auto_mesh()
    # Round the loader batch itself to a device multiple so only the tail
    # batch pads (otherwise EVERY batch pads up and wastes device steps).
    from gangealing_tpu.parallel import round_up_batch
    batch = round_up_batch(batch, mesh)

    ckpt = load_torch_checkpoint(ckpt_path)
    cfg = stn_config_from_args(ckpt.get("args", {}), supersize=real_size)
    params = {k: jnp.asarray(v) for k, v in ckpt["t_ema"].items()}

    dset = PCKDataset(data_path, resolution=real_size, seed=seed)
    permutation = dset.mirror_permutation
    if num_pairs is None:
        num_pairs = len(dset)
    # Multi-process: each process evaluates its stride of the pairs and
    # pck_transfer cross-host-reduces the counts (reference
    # DistributedSampler striding + all_gather, pck.py:110,172-174; like
    # the reference, uneven splits wrap — the duplicated tail pairs are
    # counted once per process that saw them).
    n_proc = jax.process_count()
    if n_proc > 1:
        num_pairs = (num_pairs + n_proc - 1) // n_proc
    loader = DataLoader(dset, batch_size=batch, shuffle=False,
                        drop_last=False, num_shards=n_proc,
                        shard_index=jax.process_index())
    pck = pck_transfer(params, cfg, loader, alphas=alphas,
                       num_pairs=num_pairs, iters=iters,
                       padding_mode=padding_mode,
                       match_flows=not no_flip_inference,
                       transfer_both_ways=transfer_both_ways,
                       permutation=permutation, batch_size=batch,
                       progress=True, mesh=mesh)
    for a, p in zip(alphas, pck):
        print(f"PCK-Transfer@{a}: {p * 100:.2f}%")
    return pck
