"""Align + filter a raw dataset with the similarity STN stage.

Capability reference: applications/congeal_dataset.py:21-107. Per image:
border-pad to square (no resize) for sampling + a flow_size version for
regression; infer flips; similarity-only forward with OOB check; accept if
effective resolution (sqrt(det M) * min(w, h)) is high enough and the warp
stayed in bounds; write accepted aligned PNGs then re-LMDB.

TPU design: instead of the reference's one-image-at-a-time loop, images are
processed in fixed-size padded batches through a single jitted function;
accept/reject happens on host from the returned scale/oob scalars.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np

from gangealing_tpu.models.stn import (
    ComposedSTNConfig, stn_forward, make_3x3)
from gangealing_tpu.apps.common import determine_flips
from gangealing_tpu.apps.flow_scores import filter_dataset
from gangealing_tpu.data.prepare import border_pad, create_dataset
from gangealing_tpu.data.dataset import MultiResolutionDataset


def make_congeal_fn(cfg: ComposedSTNConfig, sample_res: int,
                    output_resolution: int, iters=1, padding_mode="border",
                    no_flip_inference=False):
    """Jitted: (params, x_in (N,3,fs,fs), x_big (N,3,S,S), bounds (N,2)) ->
    (aligned, scale, oob)."""
    sim_cfg = cfg.stn_cfg("similarity")

    @jax.jit
    def fn(params, x_in, x_big, image_bounds):
        x_in_f, flips, _, _ = determine_flips(
            params, cfg, x_in, no_flip_inference=no_flip_inference,
            iters=iters, padding_mode=padding_mode)
        x_big_f = jnp.where(flips, jnp.flip(x_big, 3), x_big)
        sim_params = {k[len("stns.0."):]: v for k, v in params.items()
                      if k.startswith("stns.0.")}
        aligned, _, M, oob = stn_forward(
            sim_params, sim_cfg, x_in_f, iters=iters,
            input_img_for_sampling=x_big_f,
            output_resolution=output_resolution,
            return_out_of_bounds=True, image_bounds=image_bounds,
            padding_mode=padding_mode)
        scale = jnp.sqrt(jnp.linalg.det(make_3x3(M)))
        return aligned, scale, oob

    return fn


def _to_float(arr_uint8_hwc):
    x = arr_uint8_hwc.astype(np.float32) / 255.0
    return (x * 2.0 - 1.0).transpose(2, 0, 1)


def align_and_filter_dataset(params, cfg: ComposedSTNConfig, data_path, out,
                             real_size=256, flow_size=128,
                             output_resolution=256, iters=1,
                             padding_mode="border", batch=16,
                             min_effective_resolution=192,
                             flow_scores_path=None, fraction_retained=1.0,
                             no_flip_inference=False, mesh=None):
    """Returns sorted list of retained dataset indices; writes the aligned
    LMDB to ``out``.

    ``mesh``: optional 1-D device mesh — each padded batch is sharded over
    the data axis (the reference strides images across ranks,
    congeal_dataset.py:32; per-image accept/reject stays on host).

    Multi-process runtime: each process aligns its stride of the dataset on
    its local devices and writes its accepted PNGs under a per-process
    filename prefix (the reference's chr(ord('a')+rank) scheme,
    congeal_dataset.py:29-38 — the shared temp folder must be on a common
    filesystem); used indices are all-gathered (all_gatherv,
    distributed.py:103-122) and only the primary process builds the output
    LMDB. Every process returns the full sorted index list."""
    from PIL import Image
    from gangealing_tpu.parallel import (
        replicate, round_up_batch, shard_batch, process_stripe,
        all_gatherv_hosts, host_barrier)
    temp_folder = f"{out}_imagefolder"
    os.makedirs(temp_folder, exist_ok=True)
    os.makedirs(out, exist_ok=True)
    # Clear stale PNGs from a previous run over the same ``out``: filename
    # schemes differ across runs (per-process prefixes, different accept
    # counts), so leftovers are not reliably overwritten — the '*.png' glob
    # in create_dataset below would silently bake them into the new LMDB
    # while dataset_indices.pt lists only this run's indices.
    if jax.process_index() == 0:
        import glob
        for f in glob.glob(os.path.join(temp_folder, "*.png")):
            os.remove(f)
    host_barrier("congeal_dataset_clean")

    class RawDataset(MultiResolutionDataset):
        def __getitem__(self, index):
            img = Image.open(__import__("io").BytesIO(self.raw_bytes(index)))
            return img.convert("RGB")

    dataset = RawDataset(data_path, resolution=real_size)
    if flow_scores_path is not None:
        dataset = filter_dataset(dataset, flow_scores_path, fraction_retained)
        index_map = dataset.indices
    else:
        index_map = list(range(len(dataset)))

    # The reference pads each image to its own max(w, h); to batch on TPU we
    # pad the sampling image to a fixed canvas (real_size) which is the
    # dataset's native square size for LMDB datasets. real_size=0 is the
    # reference's "native size" mode (README.md:227-232: images stored
    # unresized under '0-' keys, each padded to its own square) — batching
    # needs ONE canvas, so use the dataset's max square size (rounded up to
    # a multiple of 8 for the samplers); smaller images are border-padded
    # to their own square then bilinearly placed on the canvas, identical
    # up to the shared sampling grid.
    canvas = real_size
    if not canvas:
        import io as _io
        canvas = 8
        base = dataset.dataset if hasattr(dataset, "dataset") else dataset
        idxs = (dataset.indices if hasattr(dataset, "indices")
                else range(len(dataset)))
        for i in idxs:
            # header-only size read: Image.open is lazy, .size never
            # decodes pixel data (a full decode per image would double the
            # cost of the whole pass at LSUN scale)
            w, h = Image.open(_io.BytesIO(base.raw_bytes(i))).size
            canvas = max(canvas, w, h)
        canvas = (canvas + 7) // 8 * 8
    fn = make_congeal_fn(cfg, canvas, output_resolution, iters=iters,
                         padding_mode=padding_mode,
                         no_flip_inference=no_flip_inference)
    batch = round_up_batch(batch, mesh)
    if mesh is not None:
        params = replicate(mesh, params)
    used_indices = []
    total = 0
    n = len(dataset)
    # per-process filename prefix: every process writes its accepted PNGs
    # into the shared temp folder without collisions (reference
    # congeal_dataset.py:29-38)
    prefix = chr(ord("a") + jax.process_index()) \
        if jax.process_count() > 1 else ""
    stripe = process_stripe(n)
    for start in range(0, len(stripe), batch):
        idxs = stripe[start:start + batch]
        x_in, x_big, bounds = [], [], []
        for i in idxs:
            img = dataset[i]
            w, h = img.size
            size = max(w, h)
            big = _to_float(np.asarray(
                border_pad(img, size, resize=False, to_pil=False)))
            if big.shape[-1] != canvas:
                from gangealing_tpu.ops.resample import interpolate_bilinear
                big = np.asarray(interpolate_bilinear(
                    jnp.asarray(big[None]), canvas, canvas))[0]
            x_big.append(big)
            x_in.append(_to_float(np.asarray(
                border_pad(img, flow_size, to_pil=False))))
            bounds.append([h, w])
        pad_n = batch - len(idxs)
        if pad_n:
            x_in += [x_in[-1]] * pad_n
            x_big += [x_big[-1]] * pad_n
            bounds += [bounds[-1]] * pad_n
        b_in = jnp.asarray(np.stack(x_in))
        b_big = jnp.asarray(np.stack(x_big))
        b_bounds = jnp.asarray(np.asarray(bounds, np.float32))
        if mesh is not None:
            b_in, b_big, b_bounds = (shard_batch(mesh, b_in),
                                     shard_batch(mesh, b_big),
                                     shard_batch(mesh, b_bounds))
        aligned, scale, oob = fn(params, b_in, b_big, b_bounds)
        aligned = np.asarray(aligned)[:len(idxs)]
        scale = np.asarray(scale)[:len(idxs)]
        oob = np.asarray(oob)[:len(idxs)]
        for j, i in enumerate(idxs):
            h, w = bounds[j]
            too_low_res = scale[j] * min(w, h) < min_effective_resolution
            if too_low_res or oob[j]:
                continue
            used_indices.append(index_map[i])
            arr = np.clip((aligned[j] + 1) / 2, 0, 1)
            arr = (arr * 255 + 0.5).clip(0, 255).astype(np.uint8)
            Image.fromarray(arr.transpose(1, 2, 0)).save(
                f"{temp_folder}/{prefix}{total:07}.png")
            total += 1
    used_indices = sorted(all_gatherv_hosts(
        np.asarray(used_indices, np.int64)).tolist())
    host_barrier("congeal_dataset_pngs")  # all PNGs on disk before lmdb
    if jax.process_index() == 0:
        create_dataset(out, temp_folder, size=output_resolution,
                       format="png", pattern="*.png", progress=False)
        import torch
        torch.save(torch.tensor(used_indices), f"{out}/dataset_indices.pt")
    host_barrier("congeal_dataset_lmdb")  # lmdb complete before any reader
    return used_indices
