"""Correspondence-visualization CLI (reference applications/vis_correspondence)."""

import numpy as np

from gangealing_tpu.cli.args import base_eval_argparse


def main():
    parser = base_eval_argparse()
    parser.add_argument("--label_path", type=str, default=None)
    parser.add_argument("--out", type=str, default="visuals")
    parser.add_argument("--num_frames", default=60, type=int)
    parser.add_argument("--fps", default=30, type=int)
    parser.add_argument("--sigma", default=1.2, type=float)
    parser.add_argument("--n_images", default=4, type=int)
    parser.add_argument("--mode", default="congeal",
                        choices=["congeal", "propagate", "average"])
    args = parser.parse_args()

    from gangealing_tpu.apps.common import load_stn
    from gangealing_tpu.apps import vis_correspondence as vc
    from gangealing_tpu.data.dataset import MultiResolutionDataset

    params, cfg = load_stn(args.ckpt, supersize=args.real_size)
    dset = MultiResolutionDataset(args.real_data_path,
                                  resolution=args.real_size)
    imgs = np.stack([dset[i] for i in range(min(args.n_images, len(dset)))])
    out = f"{args.out}/{args.mode}.mp4"
    if args.mode == "congeal":
        vc.smooth_congeal_video(params, cfg, imgs, args.num_frames,
                                iters=args.iters,
                                padding_mode=args.padding_mode,
                                out_path=out, fps=args.fps,
                                no_flip_inference=args.no_flip_inference)
    elif args.mode == "propagate":
        vc.smooth_propagation_video(params, cfg, imgs, args.label_path,
                                    args.num_frames, sigma=args.sigma,
                                    iters=args.iters,
                                    padding_mode=args.padding_mode,
                                    out_path=out, fps=args.fps)
    else:
        vc.average_image_video(params, cfg, imgs, args.num_frames,
                               iters=args.iters,
                               padding_mode=args.padding_mode,
                               out_path=out, fps=args.fps)
    print(f"Wrote {out}")


if __name__ == "__main__":
    main()
