"""Mixed reality: propagate a congealed-space RGBA object onto every frame
of a video (augmented reality "object lenses").

Capability reference: applications/mixed_reality.py:83-300
(run_gangealing_on_video). Per frame batch: center-crop to square ->
determine flips -> uncongeal label points -> splat + blend -> also emit the
congealed video. Frame sharding across ranks becomes plain batching on a
single controller.
"""

import os

import jax.numpy as jnp
import numpy as np

from gangealing_tpu.models.stn import (
    ComposedSTNConfig, composed_stn_forward, composed_uncongeal_points)
from gangealing_tpu.apps.common import determine_flips
from gangealing_tpu.data.prepare import nchw_center_crop
from gangealing_tpu.utils.vis import splat_points, save_video, load_dense_label


def run_gangealing_on_video(params, cfg: ComposedSTNConfig, frames,
                            label_path=None, points=None, colors=None,
                            alphas=None, sigma=1.2, opacity=1.0,
                            blend_alg="alpha", iters=1,
                            padding_mode="border", batch=4,
                            classifier=None, cluster=None,
                            no_flip_inference=False, out_dir=None, fps=30,
                            objects=True, save_correspondences=False,
                            resolution=None):
    """frames: (T, C, H, W) numpy in [-1, 1] (any H, W; center-cropped to
    square). Returns dict with 'propagated' and 'congealed' (T, C, S, S)
    arrays; writes mp4s when out_dir is given."""
    frames = np.asarray(frames)
    if frames.shape[-1] != frames.shape[-2]:
        frames, _ = nchw_center_crop(frames)
    T, C, S, _ = frames.shape

    if points is None and label_path is not None and objects:
        points, colors, alphas = load_dense_label(
            label_path, resolution=resolution, load_colors=True)

    cls_args = {}
    if classifier is not None:
        cls_args = dict(classifier_params=classifier[0],
                        classifier_cfg=classifier[1], cluster=cluster)

    propagated, congealed, correspondences = [], [], []
    for s in range(0, T, batch):
        fb = jnp.asarray(frames[s:s + batch])
        n = fb.shape[0]
        flipped, flip_idx, warp_policy, _ = determine_flips(
            params, cfg, fb, no_flip_inference=no_flip_inference,
            iters=iters, padding_mode=padding_mode, **cls_args)
        if objects and points is not None:
            pts = jnp.tile(points, (n, 1, 1))
            prop_pts = composed_uncongeal_points(
                params, cfg, flipped, pts, normalize_input_points=True,
                unnormalize_output_points=True, iters=iters,
                padding_mode=padding_mode,
                warp_policy=warp_policy)
            # un-flip the points for frames that were mirrored
            fi = flip_idx.reshape(n, 1)
            prop_x = jnp.where(fi, S - 1 - prop_pts[..., 0],
                               prop_pts[..., 0])
            prop_pts = prop_pts.at[..., 0].set(prop_x)
            out = splat_points(
                fb, prop_pts, sigma=sigma, opacity=opacity,
                colors=jnp.tile(colors, (n, 1, 1)),
                alpha_channel=jnp.tile(alphas, (n, 1, 1)),
                blend_alg=blend_alg)
            propagated.append(np.asarray(out))
            if save_correspondences:
                correspondences.append(np.asarray(prop_pts))
        cong, _, _, _, _ = composed_stn_forward(
            params, cfg, flipped, output_resolution=S, iters=iters,
            padding_mode=padding_mode,
            warp_policy=(warp_policy if classifier is not None
                         else "cartesian"))
        congealed.append(np.asarray(cong[:n]))
    result = {"congealed": np.concatenate(congealed, 0)}
    if propagated:
        result["propagated"] = np.concatenate(propagated, 0)
    if correspondences:
        result["correspondences"] = np.concatenate(correspondences, 0)
    if out_dir is not None:
        os.makedirs(out_dir, exist_ok=True)
        if "propagated" in result:
            save_video(jnp.asarray(result["propagated"]), fps,
                       os.path.join(out_dir, "propagated.mp4"),
                       input_is_tensor=True)
        save_video(jnp.asarray(result["congealed"]), fps,
                   os.path.join(out_dir, "congealed.mp4"),
                   input_is_tensor=True)
        if save_correspondences:
            import torch
            torch.save(torch.from_numpy(result["correspondences"]),
                       os.path.join(out_dir, "correspondences.pt"))
    return result
