"""Correspondence-visualization CLI (reference applications/vis_correspondence).

Default mode ("track") runs the reference's flagship pipeline: smoothly
animate identity -> congealing warp, track a dense congealed-space label
through the animation bidirectionally, and write smoothly_congeal.mp4,
smoothly_propagate.mp4 and smooth_correspondence.mp4
(vis_correspondence.py:226-298, :440-492).
"""

import os

import numpy as np

from gangealing_tpu.cli.args import base_eval_argparse


def main():
    parser = base_eval_argparse()
    parser.add_argument("--label_path", type=str, default=None)
    parser.add_argument("--out", type=str, default="visuals")
    parser.add_argument("--length", "--num_frames", dest="length",
                        default=60, type=int,
                        help="frames per warp-interpolation stage")
    parser.add_argument("--fps", default=60, type=int)
    parser.add_argument("--sigma", default=1.2, type=float)
    parser.add_argument("--opacity", default=0.7, type=float)
    parser.add_argument("--resolution", default=256, type=int,
                        help="resolution of the dense label / flow field")
    parser.add_argument("--output_resolution", default=None, type=int)
    parser.add_argument("--splat_batch", default=100, type=int,
                        help="chunk size for the splatting op")
    parser.add_argument("--vis_in_stages", action="store_true")
    parser.add_argument("--stage_flip", action="store_true",
                        help="animate the mirror flip before the first warp")
    parser.add_argument("--flip_length", default=40, type=int)
    parser.add_argument("--objects", action="store_true",
                        help="load RGB values from the label")
    parser.add_argument("--cluster", default=None, type=int)
    parser.add_argument("--dset_indices", type=int, nargs="+",
                        default=list(range(4)))
    parser.add_argument("--mode", default="track",
                        choices=["track", "congeal", "propagate", "average"])
    parser.add_argument("--flow_scores", default=None, type=str,
                        help="path to cached flow_scores.pt for filtering")
    parser.add_argument("--fraction_retained", default=1.0, type=float,
                        help="fraction of the dataset retained by "
                             "flow-score filtering")
    args = parser.parse_args()

    import jax
    from gangealing_tpu.parallel import host_barrier
    primary_only = jax.process_count() > 1 and args.mode != "average"
    if primary_only and jax.process_index() != 0:
        # The smooth-video modes are single-controller by design (the
        # reference runs them "fast on a single GPU",
        # vis_correspondence.py:489): secondary processes idle instead of
        # duplicating the render and racing on the output files. The
        # "average" mode IS distributed (cross-host partial-sum reduction
        # in apps/vis_correspondence.py average_image_video), so every
        # process participates there. Idle AT A BARRIER rather than
        # returning: an exiting process would hit jax.distributed's
        # shutdown barrier, whose timeout is shorter than a long render —
        # the coordination service would then mark the job failed and kill
        # the still-rendering primary.
        print(f"vis_correspondence --mode {args.mode} renders on the "
              f"primary process only; process {jax.process_index()} idles")
        host_barrier("vis_correspondence render")
        return
    try:
        _render(args)
    finally:
        if primary_only:
            host_barrier("vis_correspondence render")


def _render(args):
    from gangealing_tpu.apps.common import load_stn
    from gangealing_tpu.apps import vis_correspondence as vc
    from gangealing_tpu.apps.flow_scores import filter_dataset
    from gangealing_tpu.data.dataset import MultiResolutionDataset

    params, cfg = load_stn(args.ckpt, supersize=args.real_size)
    dset = MultiResolutionDataset(args.real_data_path,
                                  resolution=args.real_size)
    if args.flow_scores is not None:
        dset = filter_dataset(dset, args.flow_scores, args.fraction_retained)
    idx = [i for i in args.dset_indices if i < len(dset)]
    imgs = np.stack([dset[i] for i in idx])
    os.makedirs(args.out, exist_ok=True)
    if args.mode == "track":
        vc.smoothly_congeal_and_propagate(
            params, cfg, imgs, label_path=args.label_path,
            length=args.length, iters=args.iters,
            padding_mode=args.padding_mode,
            output_resolution=args.output_resolution or args.real_size,
            resolution=args.resolution, vis_in_stages=args.vis_in_stages,
            sigma=args.sigma, opacity=args.opacity,
            splat_batch=args.splat_batch,
            no_flip_inference=args.no_flip_inference, objects=args.objects,
            out_dir=args.out, fps=args.fps, cluster=args.cluster,
            stage_flip=args.stage_flip, flip_length=args.flip_length)
        print(f"Wrote videos to {args.out}/")
        return
    out = f"{args.out}/{args.mode}.mp4"
    if args.mode == "congeal":
        vc.smooth_congeal_video(params, cfg, imgs, args.length,
                                iters=args.iters,
                                padding_mode=args.padding_mode,
                                out_path=out, fps=args.fps,
                                no_flip_inference=args.no_flip_inference)
    elif args.mode == "propagate":
        vc.smooth_propagation_video(params, cfg, imgs, args.label_path,
                                    args.length, sigma=args.sigma,
                                    iters=args.iters,
                                    padding_mode=args.padding_mode,
                                    out_path=out, fps=args.fps)
    else:
        from gangealing_tpu.parallel import auto_mesh
        vc.average_image_video(params, cfg, imgs, args.length,
                               iters=args.iters,
                               padding_mode=args.padding_mode,
                               out_path=out, fps=args.fps,
                               mesh=auto_mesh(args.num_devices))
    print(f"Wrote {out}")


if __name__ == "__main__":
    main()
