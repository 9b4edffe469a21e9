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
                        out_path=None, fps=30, batch=16, mesh=None):
    """Animate the dataset average image sharpening as alpha goes 0->1
    (vis_correspondence.py:335-437).

    ``mesh``: optional 1-D device mesh — each warp batch is sharded over
    the data axis and reduced on device, the TPU equivalent of the
    reference's per-rank ``n_mean // world_size`` shards + all_gather mean
    (vis_correspondence.py:338-379). Multi-process runtime: each process
    sums its stride of the images and the per-frame partial sums are
    reduced across hosts (same reference reduction)."""
    import jax
    from gangealing_tpu.parallel import (pad_batch, replicate,
                                         round_up_batch, shard_batch,
                                         process_stripe, all_gather_hosts)
    images = np.asarray(images)
    N, C, S, _ = images.shape
    batch = round_up_batch(batch, mesh)
    if mesh is not None:
        params = replicate(mesh, params)
    stripe = process_stripe(N)  # this process's images (identity 1-proc)

    @jax.jit
    def batch_sum(params, xb, a, w):
        out, _, _, _, _ = composed_stn_forward(
            params, cfg, xb, output_resolution=S, iters=iters,
            alpha=jnp.full((xb.shape[0],), a), padding_mode=padding_mode)
        # w zeroes padded tail rows so they never enter the mean
        return jnp.sum(out * w[:, None, None, None], axis=0)

    frames = []
    for a in interpolation_alphas(num_frames):
        acc = np.zeros((C, S, S), np.float32)
        for s in range(0, len(stripe), batch):
            idxs = stripe[s:s + batch]
            n = len(idxs)
            xb = pad_batch(jnp.asarray(images[idxs]), batch)
            w = (jnp.arange(batch) < n).astype(jnp.float32)
            if mesh is not None:
                xb = shard_batch(mesh, xb)
                w = shard_batch(mesh, w)
            acc += np.asarray(batch_sum(params, xb, jnp.float32(a), w))
        if jax.process_count() > 1:  # cross-host sum of the partial sums
            acc = np.asarray(all_gather_hosts(acc)).sum(axis=0)
        mean = (acc / N)[None]
        frames.append(images2grid(mean, nrow=1, normalize=True))
    # every process computes/returns the frames (the reduction above is
    # collective), but only the primary writes the shared output file
    # (the reference writes under primary(), vis_correspondence.py:420-437)
    if out_path is not None and jax.process_index() == 0:
        save_video(frames, fps, out_path)
    return frames


def bucket_real_images_by_cluster(classifier_params, classifier_cfg, images,
                                  num_heads, batch=32, mesh=None):
    """Assign real images to clusters with the classifier
    (vis_correspondence.py:301-332). Returns list of index arrays.

    ``mesh``: optional 1-D device mesh — classifier batches are sharded
    over the data axis (the reference buckets per-rank shards and
    all_gathervs the indices, vis_correspondence.py:310-327; here results
    come back in dataset order so no gather/de-interleave is needed).
    Multi-process runtime: each process classifies its stride of the
    images; assignments are reassembled in global order with an
    all-gather + de-interleave (the reference's reduction)."""
    from gangealing_tpu.models.classifier import classifier_assign
    from gangealing_tpu.parallel import (pad_batch, replicate,
                                         round_up_batch, shard_batch,
                                         process_stripe,
                                         gather_process_stripes)
    images = np.asarray(images)
    N = images.shape[0]
    batch = round_up_batch(batch, mesh)
    if mesh is not None:
        classifier_params = replicate(mesh, classifier_params)
    stripe = process_stripe(N)
    assignments = []
    for s in range(0, len(stripe), batch):
        idxs = stripe[s:s + batch]
        n = len(idxs)
        xb = pad_batch(jnp.asarray(images[idxs]), batch)
        if mesh is not None:
            xb = shard_batch(mesh, xb)
        a = classifier_assign(classifier_params, classifier_cfg, xb,
                              ignore_flips=True)
        assignments.append(np.asarray(a)[:n])
    # empty stripe (N < process count): gather_process_stripes reconciles
    # the placeholder's shape/dtype to the non-empty processes' int32
    local = (np.concatenate(assignments) if assignments
             else np.zeros((0,)))
    assignments = gather_process_stripes(local, N)
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


def get_patch_size(length):
    """Window-size heuristic for patch-restricted NN tracking
    (vis_correspondence.py:173-181): fewer frames => larger per-frame motion
    => bigger search window. Always odd."""
    import math
    patch_size = math.ceil(9 * max(1, 240 / length))
    return patch_size + 1 if patch_size % 2 == 0 else patch_size


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


# ---------------------------------------------------------------------------
# Assembled dense-tracking pipeline (vis_correspondence.py:226-298)
# ---------------------------------------------------------------------------

def _flip_grid(grid, flip_indices):
    """Negate the x sampling coordinate for flipped images
    (vis_correspondence.py:166-169). grid: (..., N, H, W, 2)."""
    fi = jnp.reshape(flip_indices, (-1, 1, 1))
    return grid.at[..., 0].multiply(jnp.where(fi, -1.0, 1.0))


def _resize_grid(grid, out_res):
    """Bilinearly resize an (N, H, W, 2) sampling grid."""
    from gangealing_tpu.ops.resample import interpolate_bilinear
    if grid.shape[1] == out_res:
        return grid
    g = interpolate_bilinear(grid.transpose(0, 3, 1, 2), out_res, out_res)
    return g.transpose(0, 2, 3, 1)


def _smooth_stage(grid_to, grid_from, data, length, nrow, points=None,
                  patch_centers=None, padding_mode="border"):
    """Interpolate grid_from -> grid_to over `length` frames, warping `data`
    and (optionally) tracking `points` with patch-restricted NN
    (vis_correspondence.py:184-208). Returns (frames, tracked_points(T,N,P,2),
    congealed_images(T,N,C,R,R), final_patch_centers)."""
    from gangealing_tpu.ops.mipmap import mipmap_warp
    # cap the NN window at the grid extent — the heuristic explodes for tiny
    # lengths (get_patch_size(4) = 541) and a window larger than the grid
    # searches everything anyway
    R = grid_to.shape[1]
    patch_size = min(get_patch_size(length), (R // 2) * 2 + 1)
    frames, out_points, out_images = [], [], []
    for fi in range(length):
        a = 1.0 - 0.5 * (1.0 + np.cos(np.pi * fi / (length - 1)))
        grid_t = grid_from + a * (grid_to - grid_from)
        congealed = mipmap_warp(data, grid_t, padding_mode=padding_mode)
        frames.append(images2grid(np.asarray(congealed), nrow=nrow,
                                  normalize=True, range=(-1, 1)))
        out_images.append(congealed)
        if points is not None:
            patch_centers = nearest_neighbor_within_patch(
                grid_t, points, patch_centers, patch_size)
            out_points.append(patch_centers.astype(jnp.float32))
    out_points = jnp.stack(out_points) if out_points else None
    return frames, out_points, jnp.stack(out_images), patch_centers


def visualize_label_propagation(images, propagated_points, colors,
                                alpha_channels, images_per_frame,
                                output_resolution, sigma=1.2, opacity=0.7,
                                splat_batch=100, colorscale="turbo",
                                initial_frames=(), out_path=None, fps=60):
    """Splat tracked points onto the per-frame congealed images in
    splat_batch chunks, grid them, and reverse the sequence
    (vis_correspondence.py:133-158). images: (T, N, C, R, R);
    propagated_points: (T, N, P, 2)."""
    T_N = images.shape[0] * images.shape[1]
    assert T_N % images_per_frame == 0
    images = images.reshape(-1, 3, output_resolution, output_resolution)
    pts = propagated_points.reshape(-1, propagated_points.shape[2], 2)
    if colors is not None:
        colors_rep = jnp.tile(colors, (splat_batch, 1, 1))
    alpha_rep = jnp.tile(alpha_channels, (splat_batch, 1, 1))
    chunks = []
    for i in range(0, images.shape[0], splat_batch):
        n = min(splat_batch, images.shape[0] - i)
        chunks.append(np.asarray(splat_points(
            images[i:i + n], pts[i:i + n], sigma=sigma, opacity=opacity,
            colorscale=colorscale,
            colors=colors_rep[:n] if colors is not None else None,
            alpha_channel=alpha_rep[:n])))
    splatted = np.concatenate(chunks, 0).reshape(
        -1, images_per_frame, 3, output_resolution, output_resolution)
    nrow = max(1, int(images_per_frame ** 0.5))
    frames = list(initial_frames)
    for frame in splatted:
        frames.append(images2grid(frame, nrow=nrow, normalize=True,
                                  range=(-1, 1)))
    frames = frames[::-1]  # play congealed -> unaligned
    if out_path is not None:
        save_video(frames, fps, out_path)
    return frames


def visualize_correspondence(congealing_frames, propagation_frames,
                             out_path=None, fps=60, pause_steps=60,
                             interp_steps=60, end_pause_steps=5):
    """Combined congeal-then-propagate video (vis_correspondence.py:118-131)."""
    last = np.asarray(congealing_frames[-1], np.float32)
    first_prop = np.asarray(propagation_frames[0], np.float32)
    interp = [np.clip(last + a * (first_prop - last), 0, 255)
              .round().astype(np.uint8)
              for a in np.linspace(0, 1, interp_steps)]
    full = (list(congealing_frames)
            + [congealing_frames[-1]] * pause_steps + interp
            + list(propagation_frames)
            + [propagation_frames[-1]] * end_pause_steps)
    if out_path is not None:
        save_video(full, fps, out_path)
    return full


def smoothly_congeal_and_propagate(params, cfg: ComposedSTNConfig, images,
                                   label_path=None, length=60, iters=1,
                                   padding_mode="border",
                                   output_resolution=None, resolution=None,
                                   vis_in_stages=False, sigma=1.2,
                                   opacity=0.7, splat_batch=100,
                                   no_flip_inference=False, objects=False,
                                   out_dir=None, fps=60,
                                   classifier=None, cluster=None,
                                   stage_flip=False, flip_length=40):
    """The reference's flagship correspondence video
    (vis_correspondence.py:226-298): smoothly animate identity -> congealing
    warp; if a dense label is given, track its pixels through the animation
    with patch-NN search, run the tracking BIDIRECTIONALLY (forward from the
    unaligned frame and reverse from the congealed frame, lerped per-frame,
    :279-287) for consistency, splat in --splat_batch chunks (:477), and save
    smoothly_congeal.mp4 / smoothly_propagate.mp4 / smooth_correspondence.mp4.

    Returns (congealing_frames, propagation_frames_or_None).
    """
    import os
    from gangealing_tpu.models.stn import (
        normalize_points, unnormalize_points, convert_points,
        sample_grid_at_points)
    from gangealing_tpu.ops.grid_sample import identity_grid

    data = jnp.asarray(images)
    N, C, S, _ = data.shape
    R = output_resolution or S
    nrow = max(1, int(N ** 0.5))

    cls_params, cls_cfg = classifier if classifier is not None else (None, None)
    data_flipped, flip_idx, warp_policy, _ = determine_flips(
        params, cfg, data, classifier_params=cls_params,
        classifier_cfg=cls_cfg, cluster=cluster,
        no_flip_inference=no_flip_inference, iters=iters,
        padding_mode=padding_mode)
    flip_vec = flip_idx.reshape(N)

    intermediates = composed_stn_forward(
        params, cfg, data_flipped, iters=iters, warp_policy=warp_policy,
        padding_mode=padding_mode, return_intermediates=True)
    stage_grids = [g for (_, g) in intermediates]
    if not vis_in_stages:
        stage_grids = [stage_grids[-1]]
    stage_grids = [_flip_grid(_resize_grid(g, R), flip_vec)
                   for g in stage_grids]

    ident = identity_grid(N, R, R)
    flipping_grid = _flip_grid(ident, flip_vec)
    grids = [flipping_grid] + stage_grids  # stage i: grids[i] -> grids[i+1]
    num_stages = len(grids) - 1

    # dense label -> initial tracked points in unaligned space
    if label_path is not None:
        points, colors, alpha_channels = load_dense_label(
            label_path, resolution=resolution, load_colors=objects)
        res = resolution or points_resolution_default(points)
        pts = jnp.tile(points, (N, 1, 1)).astype(jnp.float32)
        normalized_congealed = normalize_points(pts, R, res)
        full_grid = grids[-1]
        unaligned_norm = sample_grid_at_points(full_grid,
                                               normalized_congealed)
        unaligned = unnormalize_points(unaligned_norm, R, R)
        patch_centers = jnp.clip(jnp.round(unaligned), 0, R - 1).astype(
            jnp.int32)
        # patch centers live in OUTPUT pixel space: mirror them for flipped
        # images (the grids already sample the unflipped source; reference
        # vis_correspondence.py:250-252)
        fv = flip_vec.reshape(N, 1)
        patch_centers = patch_centers.at[..., 0].set(
            jnp.where(fv, R - 1 - patch_centers[..., 0],
                      patch_centers[..., 0]))
        tracked = unaligned_norm  # NN search happens in normalized space
        congealed_centers = jnp.round(
            convert_points(pts, res, R) if res != R else pts).astype(jnp.int32)
    else:
        tracked = patch_centers = colors = alpha_channels = None
        congealed_centers = None

    congealed_frames = []
    propagated_points = []
    congealed_images = []
    initial_propagation_frames = []
    if stage_flip:
        # animate identity -> mirror before the first warp stage
        # (reference make_flip_frames, vis_correspondence.py:161-163,261-271)
        flip_frames, _, _, _ = _smooth_stage(flipping_grid, ident, data,
                                             flip_length, nrow,
                                             padding_mode=padding_mode)
        congealed_frames.extend(flip_frames)
        if label_path is not None:
            from gangealing_tpu.ops.mipmap import mipmap_warp
            unclamped = unnormalize_points(unaligned_norm, R, R)
            splatted = splat_points(
                mipmap_warp(data, ident, padding_mode=padding_mode),
                unclamped, sigma=sigma, opacity=opacity,
                colors=(jnp.tile(colors, (N, 1, 1)) if objects
                        and colors is not None else None),
                alpha_channel=jnp.tile(alpha_channels, (N, 1, 1)))
            prop_flip_frames, _, _, _ = _smooth_stage(
                flipping_grid, ident, splatted, flip_length, nrow,
                padding_mode=padding_mode)
            initial_propagation_frames = prop_flip_frames
    for i in range(num_stages):
        frames_i, pts_i, imgs_i, patch_centers = _smooth_stage(
            grids[i + 1], grids[i], data, length, nrow, tracked,
            patch_centers, padding_mode)
        congealed_frames.extend(frames_i)
        propagated_points.append(pts_i)
        congealed_images.append(imgs_i)

    propagation_frames = None
    if label_path is not None:
        # Bidirectional consistency (vis_correspondence.py:279-287): track in
        # reverse (congealed -> unaligned) and lerp the two predictions with
        # per-frame alpha so the congealed end is pinned to the exact label.
        alpha = jnp.linspace(0.0, 1.0, length).reshape(length, 1, 1, 1)
        cc = congealed_centers
        for i in range(num_stages):
            _, rev_pts, _, cc = _smooth_stage(
                grids[-i - 2], grids[-i - 1], data, length, nrow, tracked,
                cc, padding_mode)
            fwd = propagated_points[-i - 1]
            propagated_points[-i - 1] = (
                fwd + alpha * (jnp.flip(rev_pts, axis=0) - fwd))
        imgs_cat = jnp.concatenate(congealed_images, 0)
        pts_cat = jnp.concatenate(propagated_points, 0)
        propagation_frames = visualize_label_propagation(
            imgs_cat, pts_cat, colors if objects else None, alpha_channels,
            N, R, sigma=sigma, opacity=opacity, splat_batch=splat_batch,
            initial_frames=initial_propagation_frames,
            out_path=(os.path.join(out_dir, "smoothly_propagate.mp4")
                      if out_dir else None), fps=fps)
        visualize_correspondence(
            congealed_frames, propagation_frames,
            out_path=(os.path.join(out_dir, "smooth_correspondence.mp4")
                      if out_dir else None), fps=fps)
    if out_dir is not None:
        save_video(congealed_frames, fps,
                   os.path.join(out_dir, "smoothly_congeal.mp4"))
    return congealed_frames, propagation_frames


def points_resolution_default(points):
    """Fallback label resolution: tight power-of-2 bound of the coords."""
    m = float(np.max(np.asarray(points))) + 1
    r = 1
    while r < m:
        r *= 2
    return r
