"""Mixed-reality video CLI (reference applications/mixed_reality.py)."""

from gangealing_tpu.cli.args import base_eval_argparse


def main():
    parser = base_eval_argparse()
    parser.add_argument("--video_path", type=str, required=True,
                        help="mp4 file or directory of frames")
    parser.add_argument("--label_path", type=str, default=None)
    parser.add_argument("--out", type=str, default="visuals")
    parser.add_argument("--sigma", default=1.2, type=float)
    parser.add_argument("--opacity", default=1.0, type=float)
    parser.add_argument("--blend_alg", default="alpha", type=str,
                        choices=["alpha", "laplacian", "laplacian_light"])
    parser.add_argument("--objects", action="store_true")
    parser.add_argument("--save_correspondences", action="store_true")
    parser.add_argument("--resolution", default=None, type=int,
                        help="resolution at which to load the label")
    parser.add_argument("--cluster", default=None, type=int)
    parser.add_argument("--fps", default=30, type=int)
    parser.add_argument("--max_frames", default=None, type=int)
    parser.add_argument("--save_frames", action="store_true",
                        help="stream per-frame PNGs to disk instead of "
                             "holding the whole video in memory")
    parser.add_argument("--average_path", default=None, type=str,
                        help="path to the cluster0 average congealed image "
                             "(clustering models; adds average.mp4)")
    parser.add_argument("--overlay_congealed", action="store_true",
                        help="overlay the input dense label on the "
                             "congealed video")
    args = parser.parse_args()

    from gangealing_tpu.apps.common import load_stn
    from gangealing_tpu.apps.mixed_reality import run_gangealing_on_video
    from gangealing_tpu.data.prepare import load_video_frames
    from gangealing_tpu.parallel import auto_mesh

    loaded = load_stn(args.ckpt, supersize=args.real_size,
                      load_classifier=True)
    params, cfg, cls_params, cls_cfg = loaded
    classifier = (cls_params, cls_cfg) if cls_params is not None else None
    import os
    if args.save_frames and os.path.isdir(args.video_path):
        # lazy path list: frames are loaded one batch at a time
        from gangealing_tpu.data.prepare import list_frame_paths
        frames = list_frame_paths(args.video_path)
        if args.max_frames is not None:
            frames = frames[:args.max_frames]
    else:
        frames = load_video_frames(args.video_path,
                                   max_frames=args.max_frames)
    run_gangealing_on_video(
        params, cfg, frames, label_path=args.label_path, sigma=args.sigma,
        opacity=args.opacity, blend_alg=args.blend_alg, iters=args.iters,
        padding_mode=args.padding_mode, batch=args.batch,
        classifier=classifier, cluster=args.cluster,
        no_flip_inference=args.no_flip_inference, out_dir=args.out,
        fps=args.fps, objects=args.objects or args.label_path is not None,
        save_correspondences=args.save_correspondences,
        resolution=args.resolution, save_frames=args.save_frames,
        average_path=args.average_path,
        overlay_congealed=args.overlay_congealed,
        mesh=auto_mesh(args.num_devices))
    print(f"Videos written to {args.out}")


if __name__ == "__main__":
    main()
