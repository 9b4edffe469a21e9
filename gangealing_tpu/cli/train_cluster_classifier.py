"""Cluster classifier training CLI (reference train_cluster_classifier.py)."""

import os

import jax
import jax.numpy as jnp

from gangealing_tpu.cli.args import base_training_argparse


def main():
    parser = base_training_argparse()
    parser.add_argument("--cls_lr", type=float, default=0.001)
    args = parser.parse_args()
    assert args.num_heads > 1 or args.flips, \
        "classifier training needs a clustering (or flips) model"

    from gangealing_tpu.cli.train import build_configs, load_perceptual
    from gangealing_tpu.io import load_torch_checkpoint
    from gangealing_tpu.models.classifier import (
        ClassifierConfig, classifier_init)
    from gangealing_tpu.train.classifier_train import (
        warm_start_from_stn, train_cluster_classifier)
    from gangealing_tpu.train.checkpoint import find_model
    from gangealing_tpu.train.visuals import GANgealingWriter

    cfg = build_configs(args)
    key = jax.random.PRNGKey(args.seed)
    perceptual_params, perceptual_fn = load_perceptual(args, key)

    ckpt = load_torch_checkpoint(find_model(args.ckpt))
    g_params = {k: jnp.asarray(v) for k, v in ckpt["g_ema"].items()}
    t_params = {k: jnp.asarray(v) for k, v in ckpt["t_ema"].items()}
    ll_params = {k: jnp.asarray(v) for k, v in ckpt["ll"].items()}

    cls_cfg = ClassifierConfig(size=args.flow_size,
                               supersize=args.real_size,
                               channel_multiplier=args.stn_channel_multiplier,
                               num_heads=2 * args.num_heads)
    cls_params = classifier_init(jax.random.fold_in(key, 1), cls_cfg)
    if "classifier" in ckpt:
        cls_params = {k: jnp.asarray(v)
                      for k, v in ckpt["classifier"].items()}
        print("Resuming cluster classifier training.")
    else:
        cls_params = warm_start_from_stn(cls_params, t_params)

    results_path = os.path.join(args.results, args.exp_name)
    # primary-only scalar writer: concurrent processes would interleave
    # writes to the shared JSONL/TB files
    writer = (GANgealingWriter(results_path)
              if jax.process_index() == 0 else None)
    cls_params, _ = train_cluster_classifier(
        cfg, cls_cfg, g_params, t_params, ll_params, cls_params,
        perceptual_params, perceptual_fn, iters=args.iter,
        cls_lr=args.cls_lr, period=args.period, decay=args.decay, tm=args.tm,
        seed=args.seed, log_every=args.log_every, writer=writer)

    # only the primary process writes the shared checkpoint (the reference
    # fences under primary(), train_cluster_classifier.py:133,153)
    if jax.process_index() == 0:
        import numpy as np
        import torch
        out = os.path.join(results_path, "checkpoints", "classifier.pt")
        ckpt_out = dict(ckpt["_raw"])
        ckpt_out["classifier"] = {k: torch.from_numpy(np.asarray(v))
                                  for k, v in cls_params.items()}
        torch.save(ckpt_out, out)
        print(f"Saved classifier checkpoint to {out}")


if __name__ == "__main__":
    main()
