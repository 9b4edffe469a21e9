"""Quickstart: congeal a folder of images with a GANgealing checkpoint.

    python examples/quickstart.py --ckpt pretrained/cat.pt \
        --images path/to/folder --out visuals/quickstart

Without --ckpt this runs with random (identity-at-init) weights so the
pipeline can be exercised offline.
"""

import argparse
import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt", type=str, default=None)
    p.add_argument("--images", type=str, default=None,
                   help="folder of images (default: synthetic)")
    p.add_argument("--out", type=str, default="visuals/quickstart")
    p.add_argument("--real_size", type=int, default=256)
    p.add_argument("--iters", type=int, default=1)
    args = p.parse_args()

    from gangealing_tpu.models.stn import (
        ComposedSTNConfig, composed_stn_init, composed_stn_forward)
    from gangealing_tpu.utils.vis import load_pil, save_image

    if args.ckpt is not None:
        from gangealing_tpu.apps.common import load_stn
        params, cfg = load_stn(args.ckpt, supersize=args.real_size)
    else:
        print("no --ckpt: using random identity-initialized weights")
        cfg = ComposedSTNConfig(flow_size=min(128, args.real_size),
                                supersize=args.real_size,
                                channel_multiplier=0.5)
        params = composed_stn_init(jax.random.PRNGKey(0), cfg)

    if args.images is not None:
        files = sorted(sum([glob.glob(os.path.join(args.images, e))
                            for e in ("*.png", "*.jpg", "*.jpeg")], []))[:16]
        imgs = jnp.concatenate([load_pil(f, args.real_size) for f in files])
    else:
        key = jax.random.PRNGKey(1)
        imgs = jax.random.uniform(key, (4, 3, args.real_size, args.real_size),
                                  minval=-1, maxval=1)

    congealed, grid, flow, sim_out, _ = composed_stn_forward(
        params, cfg, imgs, iters=args.iters, output_resolution=args.real_size,
        padding_mode="border")
    os.makedirs(args.out, exist_ok=True)
    save_image(imgs, f"{args.out}/inputs.png", normalize=True, range=(-1, 1))
    save_image(congealed, f"{args.out}/congealed.png", normalize=True,
               range=(-1, 1))
    print(f"wrote {args.out}/inputs.png and {args.out}/congealed.png")


if __name__ == "__main__":
    main()
