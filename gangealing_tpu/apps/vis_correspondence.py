"""Correspondence visualization videos.

Capability reference: applications/vis_correspondence.py:32-437 — smooth
congealing videos (warp lerped from identity via alpha over time), dense
correspondence / edit propagation videos, per-cluster bucketing of real
images, and average-image videos.
"""

import jax.numpy as jnp
import numpy as np

from gangealing_tpu.models.stn import (
    ComposedSTNConfig, composed_stn_forward, composed_uncongeal_points)
from gangealing_tpu.apps.common import determine_flips
from gangealing_tpu.utils.vis import (
    splat_points, save_video, load_dense_label, images2grid)


def interpolation_alphas(num_frames, pause_frames=0):
    """Smooth 0->1 cosine ramp with optional end pauses
    (vis_correspondence semantics)."""
    t = np.linspace(0.0, 1.0, num_frames)
    alphas = 0.5 - 0.5 * np.cos(np.pi * t)
    if pause_frames:
        alphas = np.concatenate([np.zeros(pause_frames), alphas,
                                 np.ones(pause_frames)])
    return alphas.astype(np.float32)


def smooth_congeal_video(params, cfg: ComposedSTNConfig, images,
                         num_frames=60, iters=1, padding_mode="border",
                         out_path=None, fps=30, no_flip_inference=True,
                         grid_nrow=None):
    """Animate identity -> full congealing warp via the alpha lerp
    (warping_heads alpha argument). images: (N, C, S, S)."""
    images = jnp.asarray(images)
    N, C, S, _ = images.shape
    flipped, _, _, _ = determine_flips(params, cfg, images,
                                       no_flip_inference=no_flip_inference,
                                       iters=iters,
                                       padding_mode=padding_mode)
    frames = []
    for a in interpolation_alphas(num_frames):
        out, _, _, _, _ = composed_stn_forward(
            params, cfg, flipped, output_resolution=S, iters=iters,
            alpha=jnp.full((N,), a), padding_mode=padding_mode)
        frames.append(images2grid(np.asarray(out),
                                  nrow=grid_nrow or max(1, int(N ** 0.5)),
                                  normalize=True, range=(-1, 1)))
    if out_path is not None:
        save_video(frames, fps, out_path)
    return frames


def smooth_propagation_video(params, cfg: ComposedSTNConfig, images,
                             label_path, num_frames=60, sigma=1.2,
                             opacity=1.0, iters=1, padding_mode="border",
                             out_path=None, fps=30,
                             no_flip_inference=True, resolution=None):
    """Animate the propagated label fading in as the warp un-congeals."""
    images = jnp.asarray(images)
    N, C, S, _ = images.shape
    points, colors, alphas_lbl = load_dense_label(label_path,
                                                  resolution=resolution,
                                                  load_colors=True)
    flipped, flip_idx, _, _ = determine_flips(
        params, cfg, images, no_flip_inference=no_flip_inference,
        iters=iters, padding_mode=padding_mode)
    pts = jnp.tile(points, (N, 1, 1))
    prop = composed_uncongeal_points(
        params, cfg, flipped, pts, normalize_input_points=True,
        unnormalize_output_points=True, iters=iters,
        padding_mode=padding_mode)
    fi = flip_idx.reshape(N, 1)
    prop = prop.at[..., 0].set(jnp.where(fi, S - 1 - prop[..., 0],
                                         prop[..., 0]))
    frames = []
    for a in interpolation_alphas(num_frames):
        out = splat_points(images, prop, sigma=sigma, opacity=float(a),
                           colors=jnp.tile(colors, (N, 1, 1)),
                           alpha_channel=jnp.tile(alphas_lbl, (N, 1, 1)))
        frames.append(images2grid(np.asarray(out),
                                  nrow=max(1, int(N ** 0.5)),
                                  normalize=True, range=(-1, 1)))
    if out_path is not None:
        save_video(frames, fps, out_path)
    return frames


def average_image_video(params, cfg: ComposedSTNConfig, images,
                        num_frames=60, iters=1, padding_mode="border",
                        out_path=None, fps=30, batch=16):
    """Animate the dataset average image sharpening as alpha goes 0->1
    (vis_correspondence.py:335-437)."""
    images = np.asarray(images)
    N, C, S, _ = images.shape
    frames = []
    for a in interpolation_alphas(num_frames):
        acc = np.zeros((C, S, S), np.float32)
        for s in range(0, N, batch):
            xb = jnp.asarray(images[s:s + batch])
            out, _, _, _, _ = composed_stn_forward(
                params, cfg, xb, output_resolution=S, iters=iters,
                alpha=jnp.full((xb.shape[0],), a),
                padding_mode=padding_mode)
            acc += np.asarray(out).sum(axis=0)
        mean = (acc / N)[None]
        frames.append(images2grid(mean, nrow=1, normalize=True))
    if out_path is not None:
        save_video(frames, fps, out_path)
    return frames


def bucket_real_images_by_cluster(classifier_params, classifier_cfg, images,
                                  num_heads, batch=32):
    """Assign real images to clusters with the classifier
    (vis_correspondence.py:301-332). Returns list of index arrays."""
    from gangealing_tpu.models.classifier import classifier_assign
    images = np.asarray(images)
    assignments = []
    for s in range(0, images.shape[0], batch):
        a = classifier_assign(classifier_params, classifier_cfg,
                              jnp.asarray(images[s:s + batch]),
                              ignore_flips=True)
        assignments.append(np.asarray(a))
    assignments = np.concatenate(assignments)
    return [np.where(assignments == k)[0] for k in range(num_heads)]


def pad_grid(grid):
    """Linearly extrapolate a sampling grid one pixel beyond each border
    (vis_correspondence.py:59-76). (N, H, W, 2) -> (N, H+2, W+2, 2)."""
    g = jnp.pad(grid, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")
    right = 2 * g[:, :, -2] - g[:, :, -3]
    left = 2 * g[:, :, 1] - g[:, :, 2]
    bottom = 2 * g[:, -2] - g[:, -3]
    top = 2 * g[:, 1] - g[:, 2]
    g = g.at[:, 0].set(top)
    g = g.at[:, -1].set(bottom)
    g = g.at[:, :, 0].set(left)
    g = g.at[:, :, -1].set(right)
    return g


def nearest_neighbor_within_patch(grid, points, patch_centers, patch_size):
    """For each point, find the grid location (within a patch_size window
    around patch_centers) whose flow value is closest in L2
    (vis_correspondence.py:80-114). Returns (N, P, 2) integer (x, y) coords
    into the unpadded grid."""
    N, H, W, _ = grid.shape
    P = points.shape[1]
    g = pad_grid(grid)  # (N, H+2, W+2, 2)
    Hp, Wp = H + 2, W + 2
    half = patch_size // 2
    centers = patch_centers + 1  # account for padding; (N, P, 2) as (x, y)

    # gather the patch around each center: offsets grid
    dy = jnp.arange(-half, half + 1)
    dx = jnp.arange(-half, half + 1)
    oy, ox = jnp.meshgrid(dy, dx, indexing="ij")  # (ps, ps)
    py = jnp.clip(centers[..., 1][:, :, None, None] + oy, 0, Hp - 1)
    px = jnp.clip(centers[..., 0][:, :, None, None] + ox, 0, Wp - 1)
    flat = (py * Wp + px).astype(jnp.int32)  # (N, P, ps, ps)
    g_flat = g.reshape(N, Hp * Wp, 2)
    patches = jnp.take_along_axis(
        g_flat[:, :, None, :],
        flat.reshape(N, -1)[:, :, None, None].repeat(2, 3), axis=1)
    patches = patches[:, :, 0, :].reshape(N, P, patch_size, patch_size, 2)

    d = jnp.sum((patches - points[:, :, None, None, :]) ** 2, axis=-1)
    nn_idx = jnp.argmin(d.reshape(N, P, -1), axis=-1)  # (N, P)
    ny = nn_idx // patch_size - half
    nx = nn_idx % patch_size - half
    out_x = centers[..., 0] + nx - 1  # remove padding
    out_y = centers[..., 1] + ny - 1
    return jnp.stack([out_x, out_y], axis=-1)
