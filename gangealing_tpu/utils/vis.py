"""Visualization helpers: point splatting onto images, dense-label loading,
image grids, video writing.

Capability reference: utils/vis_tools/helpers.py (splat_points:135-194,
load_dense_label:79-122, images2grid:39-43, save_video:55-75, colorscale
sampling:125-131). Plotly colorscales are provided via matplotlib colormaps
of the same names (turbo/plasma/viridis/cividis); video IO uses cv2 (no
ffmpeg binary in this environment).
"""

import math
import os

import jax.numpy as jnp
import numpy as np

from gangealing_tpu.ops.splat import splat2d_auto
from gangealing_tpu.utils.laplacian import laplacian_blend, BLEND_CONFIGS

CLUSTER_COLORSCALES = ["plasma", "plotly3", "viridis", "cividis"]
_MPL_FALLBACKS = {"plotly3": "magma", "turbo": "turbo"}


def get_colorscale(cluster=None):
    if cluster is None or cluster >= len(CLUSTER_COLORSCALES):
        return "turbo"
    return CLUSTER_COLORSCALES[cluster]


def get_colors(num_points, colorscale="turbo"):
    """(1, P, 3) colors in [-1, 1] sampled along a colormap."""
    import matplotlib
    name = _MPL_FALLBACKS.get(colorscale, colorscale)
    cmap = matplotlib.colormaps[name]
    steps = np.linspace(0, 1, num_points)
    rgb = np.asarray(cmap(steps))[:, :3].astype(np.float32)  # [0,1]
    return jnp.asarray(rgb * 2.0 - 1.0)[None]


def normalize_images(images, amin=None, amax=None):
    images = jnp.asarray(images)
    if amin is None or amax is None:
        amin = images.min(axis=(1, 2, 3), keepdims=True)
        amax = images.max(axis=(1, 2, 3), keepdims=True)
    else:
        images = jnp.clip(images, amin, amax)
    return (images - amin) / jnp.maximum(amax - amin, 1e-5)


def images2grid(images, nrow=8, padding=2, normalize=False, range=None,
                pad_value=0.0):
    """(N, C, H, W) -> (H', W', C) uint8 grid (torchvision make_grid
    semantics)."""
    images = np.asarray(images)
    if normalize:
        if range is not None:
            images = np.asarray(normalize_images(images, range[0], range[1]))
        else:
            images = np.asarray(normalize_images(images))
    N, C, H, W = images.shape
    ncol = min(nrow, N)
    nrows = int(math.ceil(N / ncol))
    grid = np.full((C, padding + nrows * (H + padding),
                    padding + ncol * (W + padding)), pad_value, np.float32)
    for i in np.arange(N):  # `range` name is taken by the kwarg (API parity)
        r, c = divmod(i, ncol)
        y = padding + r * (H + padding)
        x = padding + c * (W + padding)
        grid[:, y:y + H, x:x + W] = images[i]
    out = (grid * 255 + 0.5).clip(0, 255).transpose(1, 2, 0).astype(np.uint8)
    return out


def save_image(images, path, nrow=8, normalize=False, range=None):
    from PIL import Image
    grid = images2grid(images, nrow=nrow, normalize=normalize, range=range)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    Image.fromarray(grid).save(path)


def load_pil(path, resolution=None):
    """Image file -> (1, C, H, W) in [-1, 1]."""
    from PIL import Image
    img = Image.open(path)
    if resolution is not None:
        img = img.resize((resolution, resolution), Image.LANCZOS)
    arr = np.asarray(img.convert("RGB"), np.float32) / 255.0
    return jnp.asarray((arr * 2 - 1).transpose(2, 0, 1))[None]


def save_video(frames, fps, out_path, input_is_tensor=False,
               apply_normalize=True):
    """frames: list of (H, W, C) uint8 arrays, or (T, C, H, W) in [-1, 1]
    when input_is_tensor. Uses cv2 (mp4v) — no ffmpeg binary needed."""
    import cv2
    if input_is_tensor:
        f = np.asarray(frames)
        if apply_normalize:
            f = np.asarray(normalize_images(f, -1, 1)) * 255
        frames = [fr for fr in
                  f.transpose(0, 2, 3, 1).clip(0, 255).astype(np.uint8)]
    h, w = frames[0].shape[:2]
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    writer = cv2.VideoWriter(out_path, cv2.VideoWriter_fourcc(*"mp4v"),
                             fps, (w, h))
    for fr in frames:
        writer.write(fr[..., ::-1])  # RGB -> BGR
    writer.release()


def load_dense_label(path, resolution=None, load_colors=False):
    """RGBA image -> nonzero-alpha pixel (x, y) coords, colors, alphas
    (helpers.py:79-113). Returns ((1,P,2), (1,P,3) or None, (1,P,1))."""
    from PIL import Image
    from gangealing_tpu.ops.resample import interpolate_bilinear
    label = np.asarray(Image.open(path)).astype(np.float32)  # (H, W, 4)
    assert label.shape[-1] == 4
    label = label.transpose(2, 0, 1)[None]  # (1, 4, H, W)
    if resolution is not None and resolution != label.shape[2]:
        scale = resolution / label.shape[2]
        label = np.asarray(interpolate_bilinear(
            jnp.asarray(label), int(label.shape[2] * scale),
            int(label.shape[3] * scale)))
    ii, jj = np.where(label[0, 3] > 0)
    points = np.stack([jj, ii], -1)[None].astype(np.float32)  # (1, P, 2) xy
    if load_colors:
        image = label / 255.0
        alphas = image[0, 3, ii, jj].reshape(1, -1, 1).astype(np.float32)
        # note: numpy moves the advanced-index axes to the front -> (P, 3)
        colors = ((image[0, :3, ii, jj] - 0.5) * 2.0)[None].astype(np.float32)
    else:
        alphas = np.ones((1, points.shape[1], 1), np.float32)
        colors = None
    return (jnp.asarray(points),
            jnp.asarray(colors) if colors is not None else None,
            jnp.asarray(alphas))


def splat_points(images, points, sigma, opacity, colorscale="turbo",
                 colors=None, alpha_channel=None, blend_alg="alpha",
                 max_sigma=None):
    """Overlay (N, P, 2) points onto (N, C, H, W) images via Gaussian
    splatting (helpers.py:135-194)."""
    images = jnp.asarray(images)
    points = jnp.asarray(points)
    N = images.shape[0]
    if points.ndim == 4:  # (N, K, P, 2): unique colorscale per K
        num_points = points.shape[2]
        K = points.shape[1]
        points = points.reshape(N, K * num_points, 2)
        if colors is None:
            cs = [colorscale] * K if isinstance(colorscale, str) else colorscale
            colors = jnp.concatenate(
                [get_colors(num_points, c) for c in cs], 1)
            colors = jnp.tile(colors, (N, 1, 1))
    elif colors is None:
        if isinstance(colorscale, str):
            colors = jnp.tile(get_colors(points.shape[1], colorscale),
                              (N, 1, 1))
        else:
            colors = jnp.concatenate(
                [get_colors(points.shape[1], c) for c in colorscale], 0)
    if alpha_channel is None:
        alpha_channel = jnp.ones((N, points.shape[1], 1))
    if isinstance(sigma, (float, int)):
        sigma_arr = jnp.full((N,), float(sigma))
        if max_sigma is None:
            max_sigma = float(sigma)
    else:
        sigma_arr = jnp.asarray(sigma)
        if max_sigma is None:
            max_sigma = float(np.max(np.asarray(sigma)))
    blank_img = jnp.zeros_like(images)
    blank_mask = jnp.zeros((N, 1, images.shape[2], images.shape[3]),
                           images.dtype)
    obj = splat2d_auto(blank_img, points, colors, sigma_arr, False,
                       max_sigma=max_sigma)
    mask = splat2d_auto(blank_mask, points, alpha_channel, sigma_arr, True,
                        max_sigma=max_sigma) * opacity
    if blend_alg == "alpha":
        return mask * obj + (1 - mask) * images
    if blend_alg in BLEND_CONFIGS:
        return laplacian_blend(images, obj, mask, **BLEND_CONFIGS[blend_alg])
    raise NotImplementedError(blend_alg)


def batch_overlay(images, points, radii=None, out_path=None,
                  unique_color=False, size=10, normalize=True, opacity=1.0,
                  colorscale="turbo", range=(-1, 1)):
    """Overlay keypoint markers on images and save per-image PNGs
    (helpers.py:197-283; matplotlib scatter instead of plotly).

    images: (N, C, H, W); points: (N, P, 2) pixel xy. Returns a list of
    (H', W', 3) uint8 arrays."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    images = np.asarray(images)
    points = np.asarray(points)
    N, C, H, W = images.shape
    outs = []
    if out_path is not None:
        os.makedirs(out_path, exist_ok=True)
    for i in np.arange(N):
        img = images[i]
        if normalize:
            img = np.asarray(normalize_images(img[None], *range))[0]
        fig, ax = plt.subplots(figsize=(W / 100, H / 100), dpi=100)
        ax.imshow(img.transpose(1, 2, 0))
        P = points.shape[1]
        if unique_color:
            cols = np.asarray(get_colors(P, colorscale))[0] * 0.5 + 0.5
        else:
            cols = "red"
        ax.scatter(points[i, :, 0], points[i, :, 1], c=cols, s=size)
        ax.set_axis_off()
        ax.set_position((0, 0, 1, 1))
        fig.canvas.draw()
        buf = np.asarray(fig.canvas.buffer_rgba())[..., :3].copy()
        plt.close(fig)
        outs.append(buf)
        if out_path is not None:
            from PIL import Image
            Image.fromarray(buf).save(os.path.join(out_path, f"{i:04d}.png"))
    return outs
