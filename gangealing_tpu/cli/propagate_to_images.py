"""Static-image propagation CLI (reference applications/propagate_to_images)."""

import numpy as np

from gangealing_tpu.cli.args import base_eval_argparse


def main():
    parser = base_eval_argparse()
    parser.add_argument("--label_path", type=str, default=None)
    parser.add_argument("--out", type=str, default="visuals")
    parser.add_argument("--sigma", default=1.2, type=float)
    parser.add_argument("--opacity", default=1.0, type=float)
    parser.add_argument("--blend_alg", default="alpha", type=str)
    parser.add_argument("--cluster", default=None, type=int)
    parser.add_argument("--resolution", default=None, type=int)
    parser.add_argument("--n_images", default=16, type=int)
    args = parser.parse_args()

    from gangealing_tpu.apps.common import load_stn
    from gangealing_tpu.apps.propagate_to_images import propagate_to_images
    from gangealing_tpu.data.dataset import MultiResolutionDataset

    loaded = load_stn(args.ckpt, supersize=args.real_size,
                      load_classifier=True)
    params, cfg, cls_params, cls_cfg = loaded
    classifier = (cls_params, cls_cfg) if cls_params is not None else None
    dset = MultiResolutionDataset(args.real_data_path,
                                  resolution=args.real_size)
    imgs = np.stack([dset[i] for i in range(min(args.n_images, len(dset)))])
    propagate_to_images(
        params, cfg, imgs, label_path=args.label_path, sigma=args.sigma,
        opacity=args.opacity, blend_alg=args.blend_alg, iters=args.iters,
        padding_mode=args.padding_mode, batch=args.batch,
        classifier=classifier, cluster=args.cluster,
        no_flip_inference=args.no_flip_inference, out_dir=args.out,
        resolution=args.resolution)
    print(f"Wrote visuals to {args.out}")


if __name__ == "__main__":
    main()
