"""Static-image congealing + edit propagation + average congealed image.

Capability reference: applications/propagate_to_images.py:44-104. Same
machinery as mixed_reality but over an image dataset: congeal every image,
compute the dataset's average congealed image, and optionally propagate a
congealed-space RGBA edit back onto each input image.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np

from gangealing_tpu.models.stn import (
    ComposedSTNConfig, composed_stn_forward, composed_uncongeal_points)
from gangealing_tpu.apps.common import determine_flips
from gangealing_tpu.utils.vis import (
    splat_points, save_image, load_dense_label)


def annotate_average(average_path, label_path, real_size, resolution,
                     output_resolution=None, sigma=1.3, opacity=0.75,
                     objects=False, out_dir=None):
    """Splat a congealed-space label onto a precomputed average aligned
    image (reference make_visuals, propagate_to_images.py:74-78): the
    average loads at real_size; label points load at ``resolution`` and are
    converted to output_resolution scale, which defaults to real_size
    (reference propagate_to_images.py:142-143). Returns the (1, 3, S, S)
    annotated image; writes average_annotated.png when out_dir is given."""
    from gangealing_tpu.models.stn import convert_points
    from gangealing_tpu.utils.vis import load_pil

    out_res = output_resolution if output_resolution else real_size
    avg = load_pil(average_path, resolution=real_size)
    pts, colors, alphas = load_dense_label(label_path, resolution=resolution,
                                           load_colors=objects)
    pts = np.asarray(convert_points(pts.astype(np.float32), resolution,
                                    out_res))
    annotated = splat_points(avg, pts, sigma=sigma, opacity=opacity,
                             colorscale="plasma", colors=colors,
                             alpha_channel=alphas)
    if out_dir is not None:
        save_image(annotated, os.path.join(out_dir, "average_annotated.png"),
                   normalize=True, range=(-1, 1))
    return np.asarray(annotated)


def propagate_to_images(params, cfg: ComposedSTNConfig, images,
                        label_path=None, sigma=1.2, opacity=1.0,
                        blend_alg="alpha", iters=1, padding_mode="border",
                        batch=8, classifier=None, cluster=None,
                        no_flip_inference=False, out_dir=None,
                        resolution=None, objects=True,
                        output_resolution=None, average_n=None, mesh=None):
    """images: (N, C, S, S) in [-1, 1]. Returns dict with 'congealed',
    'average_congealed' and (if label given) 'propagated'.

    objects: take propagated colors from the label's RGB channels (object
    propagation); False splats the reference's hardcoded 'plasma' colorscale
    (propagate_to_images.py make_visuals). output_resolution: size of the
    congealed outputs (default: input size). average_n: number of leading
    images averaged for 'average_congealed' (reference --n_mean); 0 skips
    the average entirely (reference n_mean=-1 creates no average visual).

    Multi-process runtime: each process congeals its stride of the images
    on its local devices (the reference's DistributedSampler rank striding,
    propagate_to_images.py:90-96); results are reassembled in global order
    with an all-gather + de-interleave and only the primary process writes
    files. Every process returns the full result arrays."""
    images = np.asarray(images)
    N, C, S, _ = images.shape
    out_res = output_resolution or S
    points = colors = alphas = None
    if label_path is not None:
        points, colors, alphas = load_dense_label(label_path,
                                                  resolution=resolution,
                                                  load_colors=objects)
    cls_args = {}
    if classifier is not None:
        cls_args = dict(classifier_params=classifier[0],
                        classifier_cfg=classifier[1], cluster=cluster)
    from gangealing_tpu.parallel import (pad_batch, replicate,
                                         round_up_batch, shard_batch,
                                         process_stripe,
                                         gather_process_stripes)
    # Stride by the device-divisible batch so only the tail pads (full
    # steps otherwise waste duplicate rows every iteration).
    batch = round_up_batch(batch, mesh)
    stripe = process_stripe(N)  # this process's images (identity 1-proc)
    if mesh is not None:
        # DP inference over the data axis (the reference rank-shards the
        # dataset via its distributed loader, propagate_to_images.py:90-96)
        params = replicate(mesh, params)
        if cls_args.get("classifier_params") is not None:
            cls_args["classifier_params"] = replicate(
                mesh, cls_args["classifier_params"])
    congealed, propagated = [], []
    for s in range(0, len(stripe), batch):
        xb = jnp.asarray(images[stripe[s:s + batch]])
        n = xb.shape[0]
        if mesh is not None:
            xb = pad_batch(xb, batch)  # pad the tail; outputs sliced to n
            xb = shard_batch(mesh, xb)
        m = xb.shape[0]
        flipped, flip_idx, warp_policy, _ = determine_flips(
            params, cfg, xb, no_flip_inference=no_flip_inference,
            iters=iters, padding_mode=padding_mode, **cls_args)
        cong, _, _, _, _ = composed_stn_forward(
            params, cfg, flipped, output_resolution=out_res, iters=iters,
            padding_mode=padding_mode,
            warp_policy=(warp_policy if classifier is not None
                         else "cartesian"))
        congealed.append(np.asarray(cong[:n]))
        if points is not None:
            pts = jnp.tile(points, (m, 1, 1))
            prop_pts = composed_uncongeal_points(
                params, cfg, flipped, pts, normalize_input_points=True,
                unnormalize_output_points=True, iters=iters,
                padding_mode=padding_mode, warp_policy=warp_policy)
            fi = flip_idx.reshape(m, 1)
            prop_pts = prop_pts.at[..., 0].set(
                jnp.where(fi, S - 1 - prop_pts[..., 0], prop_pts[..., 0]))
            out = splat_points(xb, prop_pts, sigma=sigma, opacity=opacity,
                               colors=(jnp.tile(colors, (m, 1, 1))
                                       if colors is not None else None),
                               colorscale="plasma",
                               alpha_channel=jnp.tile(alphas, (m, 1, 1)),
                               blend_alg=blend_alg)
            propagated.append(np.asarray(out[:n]))
    def _assemble(chunks):
        # empty stripe (N < process count): gather_process_stripes
        # reconciles the placeholder's shape/dtype across processes
        local = np.concatenate(chunks, 0) if chunks else np.zeros((0,))
        return gather_process_stripes(local, N)

    result = {"congealed": _assemble(congealed)}
    if average_n is None or average_n > 0:
        avg_src = result["congealed"]
        if average_n is not None:
            avg_src = avg_src[:average_n]
        result["average_congealed"] = avg_src.mean(axis=0, keepdims=True)
    if points is not None:
        result["propagated"] = _assemble(propagated)
    if out_dir is not None and jax.process_index() == 0:
        os.makedirs(out_dir, exist_ok=True)
        save_image(result["congealed"], os.path.join(out_dir, "congealed.png"),
                   normalize=True, range=(-1, 1))
        if "average_congealed" in result:
            save_image(result["average_congealed"],
                       os.path.join(out_dir, "average_congealed.png"),
                       normalize=True, range=None)
        if "propagated" in result:
            save_image(result["propagated"],
                       os.path.join(out_dir, "propagated.png"),
                       normalize=True, range=(-1, 1))
    return result
