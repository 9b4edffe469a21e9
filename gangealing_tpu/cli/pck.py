"""PCK-Transfer CLI (reference applications/pck.py equivalent).

    python -m gangealing_tpu.cli.pck --ckpt cat.pt --real_data_path data/spair_cats \
        --num_pck_pairs ... --transfer_both_ways
"""

import numpy as np

from gangealing_tpu.cli.args import base_eval_argparse


def main():
    parser = base_eval_argparse()
    parser.add_argument("--alphas", default=[0.1, 0.05, 0.01], type=float,
                        nargs="+")
    parser.add_argument("--num_pck_pairs", default=None, type=int)
    parser.add_argument("--transfer_both_ways", action="store_true")
    parser.add_argument("--num_bootstrap", default=0, type=int)
    parser.add_argument("--out", default="visuals", type=str)
    parser.add_argument("--vis_transfer", action="store_true",
                        help="save a PNG visualizing keypoint transfers "
                             "(reference applications/pck.py:77-100)")
    args = parser.parse_args()

    from gangealing_tpu.apps.common import load_stn
    from gangealing_tpu.apps.pck import pck_transfer, vis_transfer
    from gangealing_tpu.data.dataset import PCKDataset, DataLoader
    from gangealing_tpu.parallel import auto_mesh, round_up_batch

    mesh = auto_mesh(args.num_devices)
    # Device-divisible loader batch: only the tail batch pads.
    args.batch = round_up_batch(args.batch, mesh)
    params, cfg = load_stn(args.ckpt, supersize=args.real_size)
    dset = PCKDataset(args.real_data_path, resolution=args.real_size,
                      seed=args.seed)
    num_pairs = args.num_pck_pairs or len(dset)
    loader = DataLoader(dset, batch_size=args.batch, shuffle=False,
                        drop_last=False)
    if args.vis_transfer:
        vis_transfer(params, cfg, loader,
                     permutation=dset.mirror_permutation, out_dir=args.out,
                     match_flows=not args.no_flip_inference,
                     iters=args.iters, padding_mode=args.padding_mode)
    pck = pck_transfer(params, cfg, loader, alphas=args.alphas,
                       num_pairs=num_pairs, iters=args.iters,
                       padding_mode=args.padding_mode,
                       match_flows=not args.no_flip_inference,
                       transfer_both_ways=args.transfer_both_ways,
                       permutation=dset.mirror_permutation,
                       batch_size=args.batch, progress=True, mesh=mesh)
    print(" | ".join(f"PCK-Transfer@{a}: {p * 100:.2f}%"
                     for a, p in zip(args.alphas, pck)))

    if args.num_bootstrap > 0:
        rng = np.random.RandomState(args.seed)
        pcks = []
        for _ in range(args.num_bootstrap):
            if dset.fixed_pairs is not None:
                dset.randomize_fixed_pairs(int(rng.randint(0, 2 ** 31)))
            else:
                dset.randomize_pairs(int(rng.randint(0, 2 ** 31)))
            pcks.append(pck_transfer(
                params, cfg, DataLoader(dset, batch_size=args.batch,
                                        shuffle=False, drop_last=False),
                alphas=args.alphas, num_pairs=num_pairs, iters=args.iters,
                padding_mode=args.padding_mode,
                match_flows=not args.no_flip_inference,
                transfer_both_ways=args.transfer_both_ways,
                permutation=dset.mirror_permutation, batch_size=args.batch,
                mesh=mesh))
        std = np.stack(pcks).std(axis=0, ddof=1)
        print("-----Bootstrapping Results (standard deviations)-----")
        print(" | ".join(f"PCK-Transfer@{a}: {s * 100:.2f}%"
                         for a, s in zip(args.alphas, std)))


if __name__ == "__main__":
    main()
