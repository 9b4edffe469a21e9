"""Flow-score CLI (reference applications/flow_scores.py equivalent)."""

from gangealing_tpu.cli.args import base_eval_argparse


def main():
    args = base_eval_argparse().parse_args()
    assert args.num_heads == 1, "clustering not supported for flow_scores"
    from gangealing_tpu.apps.common import load_stn
    from gangealing_tpu.apps.flow_scores import compute_flow_scores
    from gangealing_tpu.parallel import auto_mesh

    params, cfg = load_stn(args.ckpt, supersize=args.real_size)
    scores = compute_flow_scores(
        params, cfg, args.real_data_path, real_size=args.real_size,
        batch=args.batch, iters=args.iters, padding_mode=args.padding_mode,
        no_flip_inference=args.no_flip_inference, save=True,
        mesh=auto_mesh(args.num_devices))
    print(f"num_scores = {scores.shape[0]}")
    print(f"Flow scores saved at {args.real_data_path}/flow_scores.pt")


if __name__ == "__main__":
    main()
