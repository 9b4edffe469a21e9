"""Training visualizations + metrics writer.

Capability reference: utils/vis_tools/training_vis.py (GANgealingWriter:190,
create_training_visuals:111, cluster variants:57-108,125-172,
run_loader_mean:14-28). Scalars go to a JSONL file (and TensorBoard when the
package is importable); image grids are saved as numbered PNGs in the
results directory, later animatable to mp4 (animate_visuals below).
"""

import json
import os
from glob import glob

import jax
import jax.numpy as jnp
import numpy as np

from gangealing_tpu.utils.vis import images2grid, save_video
from gangealing_tpu.utils.flow_vis import flow_to_rgb
from gangealing_tpu.models.stn import composed_stn_forward
from gangealing_tpu.train.losses import (
    sample_gan_supervised_pairs, assign_fake_images_to_clusters,
    resize_fake2stn)


class GANgealingWriter:
    """PNG-grid + scalar writer (training_vis.py:190-213)."""

    def __init__(self, results_path, log_images_to_tb=False):
        self.results_path = results_path
        os.makedirs(os.path.join(results_path, "checkpoints"), exist_ok=True)
        self._scalar_file = open(os.path.join(results_path, "scalars.jsonl"),
                                 "a")
        self.tb = None
        if log_images_to_tb:
            try:
                from torch.utils.tensorboard import SummaryWriter
                self.tb = SummaryWriter(results_path)
            except Exception:
                self.tb = None

    def add_scalar(self, name, value, step):
        self._scalar_file.write(json.dumps(
            {"name": name, "value": float(value), "step": int(step)}) + "\n")
        self._scalar_file.flush()
        if self.tb is not None:
            self.tb.add_scalar(name, float(value), step)

    def _grid(self, images, name, itr, range=(-1, 1)):
        images = np.asarray(images)
        nrow = max(1, int(images.shape[0] ** 0.5))
        arr = images2grid(images, nrow=nrow, normalize=True, range=range)
        from PIL import Image
        Image.fromarray(arr).save(
            f"{self.results_path}/{name}_{str(itr).zfill(7)}.png")

    def log_image_grid(self, images, name, itr, imgs_to_show,
                       log_mean_img=True, mean_range=None, range=(-1, 1),
                       num_heads=1):
        self._grid(np.asarray(images)[:imgs_to_show], name, itr, range=range)
        if log_mean_img:
            im = np.asarray(images)
            im = im.reshape(im.shape[0] // num_heads, num_heads, *im.shape[1:])
            self._grid(im.mean(axis=0), f"mean_{name}", itr, range=mean_range)


def run_loader_mean(t_params, t_cfg, loader, max_eles=12000, **stn_kwargs):
    """Average congealed image over a loader of real images
    (training_vis.py:14-28)."""
    outs = []
    total = 0
    for x in loader:
        out, _, _, _, _ = composed_stn_forward(t_params, t_cfg,
                                               jnp.asarray(x), **stn_kwargs)
        outs.append(np.asarray(out))
        total += x.shape[0]
        if total >= max_eles:
            break
    outs = np.concatenate(outs, 0)
    return outs, outs.mean(axis=0, keepdims=True)


def create_fake_visuals(g_params, g_cfg, t_params, t_cfg, ll_params, ll_cfg,
                        z, psi, n_sample, itr, writer, key, **stn_kwargs):
    """GAN samples / truncated targets / congealed samples
    (training_vis.py:111-121)."""
    sample, target = sample_gan_supervised_pairs(
        g_params, g_cfg, ll_params, ll_cfg, key, psi, z.shape[0],
        flow_size=g_cfg.size, freeze_ll=True, z=z)
    resized = resize_fake2stn(sample, g_cfg.size, t_cfg.flow_size)
    transformed, _, _, _, _ = composed_stn_forward(t_params, t_cfg, resized,
                                                   **stn_kwargs)
    writer.log_image_grid(sample, "sample", itr, n_sample)
    writer.log_image_grid(transformed, "transformed_sample", itr, n_sample,
                          num_heads=t_cfg.num_heads)
    writer.log_image_grid(target, "truncated_sample", itr, n_sample,
                          num_heads=t_cfg.num_heads)


def create_training_visuals(g_params, g_cfg, t_ema, t_cfg, ll_params, ll_cfg,
                            loader, sample_reals, z, psi, n_mean, n_sample,
                            itr, writer, key, **stn_kwargs):
    """(training_vis.py:125-147)."""
    if loader is not None:
        _, mean_real = run_loader_mean(t_ema, t_cfg, loader, n_mean,
                                       **stn_kwargs)
        writer.log_image_grid(mean_real, "mean_EMA_transformed_real_sample",
                              itr, n_sample, log_mean_img=False, range=None)
        out, _, flow, _, _ = composed_stn_forward(
            t_ema, t_cfg, jnp.asarray(sample_reals), **stn_kwargs)
        writer.log_image_grid(out, "EMA_transformed_real_sample", itr,
                              n_sample, log_mean_img=False)
        if t_cfg.is_flow:
            rgb = flow_to_rgb(np.asarray(flow)).astype(np.float32) / 255.0
            writer.log_image_grid(rgb.transpose(0, 3, 1, 2), "flow_real",
                                  itr, n_sample, log_mean_img=False,
                                  range=(0, 1))
    create_fake_visuals(g_params, g_cfg, t_ema, t_cfg, ll_params, ll_cfg, z,
                        psi, n_sample, itr, writer, key, **stn_kwargs)


def create_training_cluster_visuals(g_params, g_cfg, t_ema, t_cfg, ll_params,
                                    ll_cfg, perceptual_fn, loader, z, big_z,
                                    psi, n_mean, n_sample, num_heads, flips,
                                    vis_batch_size, itr, writer, key,
                                    **stn_kwargs):
    """Cluster-aware visuals (training_vis.py:57-108,150-172)."""
    if loader is not None:
        local, mean_real = run_loader_mean(t_ema, t_cfg, loader, n_mean,
                                           unfold=True, **stn_kwargs)
        writer.log_image_grid(mean_real.reshape(-1, *mean_real.shape[2:]),
                              "mean_EMA_transformed_real_sample", itr,
                              n_sample, log_mean_img=False, range=None)
        for k in range(num_heads):
            writer.log_image_grid(local[:, k], f"EMA_head_{k}", itr, n_sample,
                                  log_mean_img=False)
    # fake congeal + assignment
    per_head = [[] for _ in range(num_heads)]
    for i in range(0, big_z.shape[0], vis_batch_size):
        zb = big_z[i:i + vis_batch_size]
        kk = jax.random.fold_in(key, i)
        _, min_idx, pred, _, _, _, _ = assign_fake_images_to_clusters(
            g_params, g_cfg, t_ema, t_cfg, ll_params, ll_cfg, perceptual_fn,
            kk, psi, zb.shape[0], num_heads, flips, freeze_ll=True,
            **stn_kwargs)
        pred = np.asarray(pred)
        idx = np.asarray(min_idx) % num_heads
        # pred layout: (flips*N*K); take the assigned head's image per sample
        N = zb.shape[0]
        pred = pred.reshape(-1, N, num_heads, *pred.shape[1:])
        flip_sel = (np.asarray(min_idx) // num_heads) if flips \
            else np.zeros(N, np.int64)
        for n in range(N):
            per_head[idx[n]].append(pred[flip_sel[n], n, idx[n]])
    means = []
    for k in range(num_heads):
        if per_head[k]:
            means.append(np.stack(per_head[k]).mean(axis=0))
        else:
            means.append(np.zeros(pred.shape[-3:], np.float32))
    writer.log_image_grid(np.stack(means),
                          "mean_generated_EMA_transformed_assigned", itr,
                          n_sample, log_mean_img=False, range=None)
    for k in range(num_heads):
        if per_head[k]:
            writer.log_image_grid(np.stack(per_head[k][:n_sample]),
                                  f"generated_EMA_assigned_head_{k}", itr,
                                  n_sample, log_mean_img=False)
    create_fake_visuals(g_params, g_cfg, t_ema, t_cfg, ll_params, ll_cfg, z,
                        psi, n_sample, itr, writer, key, **stn_kwargs)


def animate_visuals(results_path, pattern, out_path, fps=15):
    """Numbered PNG grids -> mp4 (training_vis.py:216-253)."""
    from PIL import Image
    files = sorted(glob(os.path.join(results_path, f"{pattern}_*.png")))
    frames = [np.asarray(Image.open(f).convert("RGB")) for f in files]
    if frames:
        save_video(frames, fps, out_path)
    return len(frames)
