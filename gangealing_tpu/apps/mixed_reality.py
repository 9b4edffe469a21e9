"""Mixed reality: propagate a congealed-space RGBA object onto every frame
of a video (augmented reality "object lenses").

Capability reference: applications/mixed_reality.py:83-300
(run_gangealing_on_video). Per frame batch: center-crop to square ->
determine flips -> uncongeal label points -> splat + blend -> also emit the
congealed video. Frame sharding across ranks becomes plain batching on a
single controller.

Memory/UX modes (reference :213-216, :239-243, :258-262):
  * save_frames=True streams per-frame PNGs to <out>/frames and
    <out>/congealing_frames instead of holding the video in host memory,
    then assembles the mp4s from the files.
  * frames may be a (T, C, H, W) array OR a list of image paths (a frame
    directory) — paths are loaded lazily one batch at a time.
  * average_path + a clustering classifier adds the cluster-activity video
    (average.mp4): each cluster's labeled average image, with the currently
    active cluster highlighted per frame (reference :120-128, :245-256).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np

from gangealing_tpu.models.stn import (
    ComposedSTNConfig, composed_stn_forward, composed_uncongeal_points)
from gangealing_tpu.apps.common import determine_flips
from gangealing_tpu.data.prepare import nchw_center_crop
from gangealing_tpu.utils.vis import (
    splat_points, save_video, load_dense_label, images2grid, get_colorscale,
    load_pil)

_INACTIVE_ALPHA = 0.2  # dimming factor for inactive clusters (reference :86)


def _save_frame_png(frame_chw, path):
    """Write one (C, H, W) [-1, 1] frame as a PNG."""
    from PIL import Image
    arr = ((np.asarray(frame_chw) + 1.0) * 127.5).clip(0, 255)
    Image.fromarray(arr.transpose(1, 2, 0).astype(np.uint8)).save(path)


def _labeled_average_images(average_path, num_heads, points_per_cluster,
                            resolution, sigma, opacity):
    """Splat each cluster's label onto its average congealed image
    (reference create_average_image_vis, :58-70). Average images are named
    ...cluster0.png, ...cluster1.png, etc."""
    imgs = []
    for k in range(num_heads):
        path = average_path.replace("cluster0", f"cluster{k}")
        avg = load_pil(path, resolution=resolution)
        imgs.append(splat_points(avg, points_per_cluster[k].astype(
            jnp.float32), sigma=sigma, opacity=opacity,
            colorscale=get_colorscale(k)))
    return jnp.concatenate(imgs, 0)  # (K, C, H, W)


def run_gangealing_on_video(params, cfg: ComposedSTNConfig, frames,
                            label_path=None, points=None, colors=None,
                            alphas=None, sigma=1.2, opacity=1.0,
                            blend_alg="alpha", iters=1,
                            padding_mode="border", batch=4,
                            classifier=None, cluster=None,
                            no_flip_inference=False, out_dir=None, fps=30,
                            objects=True, save_correspondences=False,
                            resolution=None, save_frames=False,
                            average_path=None, overlay_congealed=False,
                            mesh=None):
    """frames: (T, C, H, W) numpy in [-1, 1], or a list of image file paths
    (loaded lazily per batch; any H, W — center-cropped to square).

    ``mesh``: optional 1-D device mesh — frame batches are sharded over the
    data axis (the reference stride-shards frames across ranks and
    de-interleaves after gather, mixed_reality.py:28-33; on a single
    controller results come back in order directly).

    Multi-process runtime: each process renders its stride of the frames on
    its local devices; array results are reassembled in global frame order
    with an all-gather + de-interleave (the reference's reduction,
    mixed_reality.py:28-33), save_frames mode writes global-indexed PNGs
    from every process, and only the primary assembles/writes the videos
    (after a host barrier).

    Returns dict with 'propagated' and 'congealed' (T, C, S, S) arrays
    (omitted when save_frames=True — frames go straight to disk); writes
    propagated.mp4 / congealed.mp4 (+ average.mp4 for clustering models with
    average_path) when out_dir is given."""
    lazy_paths = None
    if isinstance(frames, (list, tuple)) and frames and isinstance(
            frames[0], str):
        lazy_paths = list(frames)
        T = len(lazy_paths)
    else:
        frames = np.asarray(frames)
        if frames.shape[-1] != frames.shape[-2]:
            frames, _ = nchw_center_crop(frames)
        T = frames.shape[0]

    if save_frames:
        assert out_dir is not None, "save_frames=True requires out_dir"
        os.makedirs(os.path.join(out_dir, "frames"), exist_ok=True)
        os.makedirs(os.path.join(out_dir, "congealing_frames"), exist_ok=True)

    if points is None and label_path is not None and objects:
        points, colors, alphas = load_dense_label(
            label_path, resolution=resolution, load_colors=True)

    cls_args = {}
    clustering = classifier is not None and cfg.num_heads > 1
    if classifier is not None:
        cls_args = dict(classifier_params=classifier[0],
                        classifier_cfg=classifier[1], cluster=cluster)

    averages = None
    if clustering and average_path is not None and points is not None:
        pts_per_cluster = [points] * cfg.num_heads  # single shared label
        averages = _labeled_average_images(
            average_path, cfg.num_heads, pts_per_cluster,
            resolution, sigma, opacity)
        inactive_averages = averages * _INACTIVE_ALPHA - (1 - _INACTIVE_ALPHA)

    from gangealing_tpu.parallel import (pad_batch, replicate,
                                         round_up_batch, shard_batch,
                                         process_stripe,
                                         gather_process_stripes,
                                         host_barrier)
    # Stride by the device-divisible batch so only the tail pads (full
    # steps otherwise waste duplicate rows every iteration).
    batch = round_up_batch(batch, mesh)
    stripe = process_stripe(T)  # this process's frames (identity 1-proc)
    if mesh is not None:
        params = replicate(mesh, params)
        if cls_args.get("classifier_params") is not None:
            cls_args["classifier_params"] = replicate(
                mesh, cls_args["classifier_params"])

    propagated, congealed, correspondences, average_frames = [], [], [], []
    for s in range(0, len(stripe), batch):
        blk = stripe[s:s + batch]  # global frame indices of this batch
        if lazy_paths is not None:
            from gangealing_tpu.data.prepare import load_frame_paths
            fb_np = load_frame_paths([lazy_paths[i] for i in blk])
            if fb_np.shape[-1] != fb_np.shape[-2]:
                fb_np, _ = nchw_center_crop(fb_np)
            fb = jnp.asarray(fb_np)
        else:
            fb = jnp.asarray(frames[blk])
        n = fb.shape[0]
        if mesh is not None:
            fb = pad_batch(fb, batch)  # pad the tail; outputs sliced to n
            fb = shard_batch(mesh, fb)
        m = fb.shape[0]  # padded (device-divisible) batch size
        S = fb.shape[-1]
        flipped, flip_idx, warp_policy, clusters = determine_flips(
            params, cfg, fb, no_flip_inference=no_flip_inference,
            iters=iters, padding_mode=padding_mode, **cls_args)
        if objects and points is not None:
            pts = jnp.tile(points, (m, 1, 1))
            prop_pts = composed_uncongeal_points(
                params, cfg, flipped, pts, normalize_input_points=True,
                unnormalize_output_points=True, iters=iters,
                padding_mode=padding_mode,
                warp_policy=warp_policy)
            # un-flip the points for frames that were mirrored
            fi = flip_idx.reshape(m, 1)
            prop_x = jnp.where(fi, S - 1 - prop_pts[..., 0],
                               prop_pts[..., 0])
            prop_pts = prop_pts.at[..., 0].set(prop_x)
            out = splat_points(
                fb, prop_pts, sigma=sigma, opacity=opacity,
                colors=jnp.tile(colors, (m, 1, 1)),
                alpha_channel=jnp.tile(alphas, (m, 1, 1)),
                blend_alg=blend_alg)
            if save_frames:
                for j in range(n):
                    _save_frame_png(out[j], os.path.join(
                        out_dir, "frames", f"{blk[j]}.png"))
            else:
                propagated.append(np.asarray(out[:n]))
            if save_correspondences:
                correspondences.append(np.asarray(prop_pts[:n]))
        cong, _, _, _, _ = composed_stn_forward(
            params, cfg, flipped, output_resolution=S, iters=iters,
            padding_mode=padding_mode,
            warp_policy=(warp_policy if classifier is not None
                         else "cartesian"))
        if overlay_congealed and points is not None:
            # overlay the input label on the congealed frames
            # (reference mixed_reality.py:245-252)
            from gangealing_tpu.models.stn import convert_points
            res = resolution or S
            cong_pts = (convert_points(points, res, S) if res != S
                        else points)
            cong = splat_points(
                cong, jnp.tile(cong_pts, (m, 1, 1)), sigma=sigma,
                opacity=opacity, colors=jnp.tile(colors, (m, 1, 1)),
                alpha_channel=jnp.tile(alphas, (m, 1, 1)))
        if save_frames:
            for j in range(n):
                _save_frame_png(cong[j], os.path.join(
                    out_dir, "congealing_frames", f"{blk[j]}.png"))
        else:
            congealed.append(np.asarray(cong[:n]))
        if averages is not None:
            # cluster-activity frames: highlight the active cluster
            one_hot = jnp.eye(cfg.num_heads, dtype=bool)[clusters]
            for j in range(n):
                mask = one_hot[j].reshape(-1, 1, 1, 1)
                current = jnp.where(mask, averages, inactive_averages)
                average_frames.append(images2grid(
                    np.asarray(current), normalize=True, range=(-1, 1),
                    pad_value=-1.0,
                    nrow=max(1, int(np.ceil(cfg.num_heads ** 0.5)))))

    def _assemble(chunks):
        # empty stripe (T < process count): gather_process_stripes
        # reconciles the placeholder's shape/dtype across processes
        local = np.concatenate(chunks, 0) if chunks else np.zeros((0,))
        return gather_process_stripes(local, T)

    result = {}
    if not save_frames:
        result["congealed"] = _assemble(congealed)
        if objects and points is not None:
            result["propagated"] = _assemble(propagated)
    if save_correspondences and points is not None and objects:
        result["correspondences"] = _assemble(correspondences)
    if averages is not None:
        local_af = (np.stack(average_frames) if average_frames
                    else np.zeros((0,)))
        average_frames = list(gather_process_stripes(local_af, T))
    if out_dir is not None and save_frames:
        host_barrier("mixed_reality_frames")  # all PNGs on disk first
    if out_dir is not None and jax.process_index() != 0:
        out_dir = None  # only the primary writes videos/files
    if out_dir is not None:
        os.makedirs(out_dir, exist_ok=True)
        if save_frames:
            import cv2
            for sub, name in (("frames", "propagated.mp4"),
                              ("congealing_frames", "congealed.mp4")):
                files = [os.path.join(out_dir, sub, f"{i}.png")
                         for i in range(T)]
                files = [f for f in files if os.path.isfile(f)]
                if files:
                    imgs = (cv2.imread(f)[:, :, ::-1] for f in files)
                    save_video(list(imgs), fps,
                               os.path.join(out_dir, name),
                               input_is_tensor=False)
        else:
            if "propagated" in result:
                save_video(jnp.asarray(result["propagated"]), fps,
                           os.path.join(out_dir, "propagated.mp4"),
                           input_is_tensor=True)
            save_video(jnp.asarray(result["congealed"]), fps,
                       os.path.join(out_dir, "congealed.mp4"),
                       input_is_tensor=True)
        if average_frames:
            save_video(average_frames, fps,
                       os.path.join(out_dir, "average.mp4"))
        if save_correspondences:
            import torch
            torch.save(torch.from_numpy(result["correspondences"]),
                       os.path.join(out_dir, "correspondences.pt"))
    if average_frames:
        result["average_frames"] = average_frames
    return result
