"""Dataset congealing CLI (reference applications/congeal_dataset.py)."""

from gangealing_tpu.cli.args import base_eval_argparse


def main():
    parser = base_eval_argparse()
    parser.add_argument("--out", type=str, required=True)
    parser.add_argument("--output_resolution", type=int, default=256)
    parser.add_argument("--flow_scores", default=None, type=str)
    parser.add_argument("--fraction_retained", default=1.0, type=float)
    parser.add_argument("--min_effective_resolution", type=int, default=192)
    args = parser.parse_args()
    assert args.num_heads == 1, "clustering not supported for congealing"

    from gangealing_tpu.apps.common import load_stn
    from gangealing_tpu.apps.congeal_dataset import align_and_filter_dataset
    from gangealing_tpu.parallel import auto_mesh

    params, cfg = load_stn(args.ckpt, supersize=args.real_size)
    used = align_and_filter_dataset(
        params, cfg, args.real_data_path, args.out,
        real_size=args.real_size, flow_size=args.flow_size,
        output_resolution=args.output_resolution, iters=args.iters,
        padding_mode=args.padding_mode, batch=args.batch,
        min_effective_resolution=args.min_effective_resolution,
        flow_scores_path=args.flow_scores,
        fraction_retained=args.fraction_retained,
        no_flip_inference=args.no_flip_inference,
        mesh=auto_mesh(args.num_devices))
    print(f"Saved {len(used)} aligned images to {args.out}")


if __name__ == "__main__":
    main()
