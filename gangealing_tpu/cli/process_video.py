"""Video -> multi-resolution frame LMDB (reference process_video.sh).

The reference shells out to ffmpeg to dump frames and then runs
prepare_data.py on the folder; here cv2 decodes in-process and the frames
go straight through the dataset builder pad modes into our LMDB writer.
"""

import argparse
import os


def main():
    p = argparse.ArgumentParser(description="Process a video into an LMDB")
    p.add_argument("--video", type=str, required=True)
    p.add_argument("--out", type=str, required=True)
    p.add_argument("--size", type=str, default="256")
    p.add_argument("--pad", type=str, default="center",
                   choices=["zero", "border", "center", "none",
                            "resize_small_side"])
    p.add_argument("--format", type=str, default="png")
    p.add_argument("--max_frames", type=int, default=None)
    args = p.parse_args()

    from PIL import Image
    import cv2
    from gangealing_tpu.data.prepare import resize_and_convert
    from gangealing_tpu.data.lmdb_io import write_lmdb

    sizes = [int(s.strip()) for s in args.size.split(",")]
    cap = cv2.VideoCapture(args.video)
    items = {}
    i = 0
    while True:
        ok, frame = cap.read()
        if not ok:
            break
        img = Image.fromarray(frame[:, :, ::-1])
        for s in sizes:
            items[f"{s}-{str(i).zfill(5)}".encode()] = resize_and_convert(
                img, s, args.pad, format=args.format)
        i += 1
        if args.max_frames is not None and i >= args.max_frames:
            break
    cap.release()
    items[b"length"] = str(i).encode()
    os.makedirs(args.out, exist_ok=True)
    write_lmdb(args.out, items)
    print(f"Wrote {i} frames to {args.out}")


if __name__ == "__main__":
    main()
