"""Dataset builder CLI (reference prepare_data.py equivalent)."""

import argparse


def main():
    p = argparse.ArgumentParser(description="Create image datasets")
    p.add_argument("--out", type=str, required=True)
    p.add_argument("--path", type=str, required=True)
    p.add_argument("--size", type=str, default="256")
    p.add_argument("--pad", type=str, default="zero",
                   choices=["zero", "border", "center", "none",
                            "resize_small_side", "cub_crop"])
    p.add_argument("--format", type=str, default="jpeg",
                   choices=["jpeg", "png"])
    p.add_argument("--pattern", type=str, default="*.png")
    p.add_argument("--max_images", type=int, default=None)
    p.add_argument("--spair_category", type=str, default=None)
    p.add_argument("--spair_split", type=str, default="test")
    p.add_argument("--cub_acsm", action="store_true")
    p.add_argument("--workers", type=int, default=None,
                   help="decode/resize/encode threads "
                        "(default: min(8, cpus); reference "
                        "prepare_data.py:253-314 uses a worker pool)")
    args = p.parse_args()

    from gangealing_tpu.data.prepare import create_dataset
    create_dataset(args.out, args.path, args.size, pad=args.pad,
                   format=args.format, pattern=args.pattern,
                   max_images=args.max_images,
                   spair_category=args.spair_category,
                   spair_split=args.spair_split, cub_acsm=args.cub_acsm,
                   workers=args.workers)


if __name__ == "__main__":
    main()
