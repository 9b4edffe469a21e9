"""Training CLI (reference train.py equivalent).

Usage:
    python -m gangealing_tpu.cli.train --exp-name cats --ckpt lsun_cats.pt \
        [--flags...]

One process drives all local chips (data parallel over a 1-D mesh); there is
no torchrun equivalent to launch.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np

from gangealing_tpu.cli.args import base_training_argparse
from gangealing_tpu.models.stylegan2 import GeneratorConfig
from gangealing_tpu.models.stn import ComposedSTNConfig, composed_stn_init
from gangealing_tpu.models.latent_learner import (
    LatentLearnerConfig, latent_learner_init)
from gangealing_tpu.models.lpips import (
    vgg16_init, lpips_lins_init, make_perceptual_loss, PerceptualLossConfig,
    import_torchvision_vgg)
from gangealing_tpu.train.state import TrainConfig, init_train_state
from gangealing_tpu.train.loop import train_gangealing, cold_start_ll
from gangealing_tpu.train.checkpoint import (
    find_model, parse_start_iter, latest_checkpoint)
from gangealing_tpu.io import load_torch_checkpoint


def build_configs(args):
    g_cfg = GeneratorConfig(size=args.gen_size, style_dim=args.dim_latent,
                            n_mlp=args.n_mlp,
                            channel_multiplier=args.gen_channel_multiplier,
                            num_fp16_res=args.num_fp16_res)
    t_cfg = ComposedSTNConfig(
        transforms=tuple(args.transform), flow_size=args.flow_size,
        supersize=args.real_size,
        channel_multiplier=args.stn_channel_multiplier,
        num_heads=args.num_heads)
    ll_cfg = LatentLearnerConfig(n_comps=args.ndirs,
                                 inject_index=args.inject,
                                 n_latent=g_cfg.n_latent,
                                 num_heads=args.num_heads,
                                 style_dim=args.dim_latent)
    global_batch = args.batch * jax.device_count()
    cfg = TrainConfig(
        g=g_cfg, t=t_cfg, ll=ll_cfg, batch=global_batch,
        stn_lr=args.stn_lr, ll_lr=args.ll_lr, tv_weight=args.tv_weight,
        flow_identity_weight=args.flow_identity_weight,
        freeze_ll=args.freeze_ll, flips=args.flips,
        sample_from_full_res=args.sample_from_full_res,
        padding_mode=args.padding_mode, loss_fn=args.loss_fn,
        anneal_psi=args.anneal_psi, anneal_fn=args.anneal_fn,
        period=args.period, decay=args.decay, tm=args.tm, iter=args.iter,
        compute_dtype=args.compute_dtype)
    return cfg


def load_perceptual(args, key):
    params = vgg16_init(key)
    if args.loss_fn == "lpips":
        params.update(lpips_lins_init(jax.random.fold_in(key, 1)))
    if args.perceptual_weights is not None:
        import torch
        sd = torch.load(args.perceptual_weights, map_location="cpu",
                        weights_only=False)
        if isinstance(sd, dict) and "state_dict" in sd:
            sd = sd["state_dict"]
        params.update(import_torchvision_vgg(sd))
    else:
        print("WARNING: no --perceptual_weights given; using a random VGG "
              "(fine for smoke tests, not for real training)")
    loss_cfg = PerceptualLossConfig(kind=args.loss_fn,
                                    compute_dtype=args.compute_dtype)
    return params, make_perceptual_loss(loss_cfg)


def main():
    parser = base_training_argparse()
    args = parser.parse_args()
    if args.profile_dir and args.profile_stop <= args.profile_start:
        parser.error(f"--profile_stop ({args.profile_stop}) must be > "
                     f"--profile_start ({args.profile_start})")
    if args.transform == ["similarity"]:
        assert args.tv_weight == 0, \
            "TV loss is not supported for similarity-only STNs"
    args.n_mean = 200 if args.debug else args.n_mean
    args.vis_batch_size //= args.num_heads
    results_path = os.path.join(args.results, args.exp_name)
    os.makedirs(results_path, exist_ok=True)

    if args.auto_resume:
        latest = latest_checkpoint(results_path)
        if latest is not None:
            print(f"--auto_resume: picking up from {latest}")
            args.ckpt = latest
            args.load_G_only = False

    cfg = build_configs(args)
    # --scan_k 0 = auto: small per-chip batches are dispatch-bound (the
    # reference's flagship per-GPU batch is 5, README.md:276-277), so fuse
    # 8 steps per dispatch there; large batches gain nothing from fusion.
    scan_k = args.scan_k if args.scan_k > 0 else (8 if args.batch < 16 else 1)
    if scan_k > 1:
        print(f"scan_k={scan_k}: fusing {scan_k} optimizer steps per device "
              "dispatch (lax.scan)")
    key = jax.random.PRNGKey(args.seed)
    k_g, k_t, k_ll, k_p, k_init = jax.random.split(key, 5)

    t_params = composed_stn_init(k_t, cfg.t)
    ll_params = latent_learner_init(k_ll, cfg.ll)
    perceptual_params, perceptual_fn = load_perceptual(args, k_p)

    print(f"Loading model from {args.ckpt}")
    ckpt_path = find_model(args.ckpt)
    ckpt = load_torch_checkpoint(ckpt_path)
    g_params = {k: jnp.asarray(v) for k, v in ckpt["g_ema"].items()}

    start_iter = 0
    resume_state = None
    if not args.load_G_only and "t" in ckpt:
        print("Resuming STN/ll weights from checkpoint")
        t_params = {k: jnp.asarray(v) for k, v in ckpt["t"].items()}
        ll_params = {k: jnp.asarray(v) for k, v in ckpt["ll"].items()}
        if "t_ema" in ckpt:
            resume_state = init_train_state(t_params, ll_params)
            resume_state["t_ema"] = {k: jnp.asarray(v)
                                     for k, v in ckpt["t_ema"].items()}
            raw = ckpt.get("_raw", {})
            if "t_optim" in raw:
                from gangealing_tpu.io.torch_import import (
                    import_torch_adam_state)
                try:
                    resume_state["t_opt"] = import_torch_adam_state(
                        raw["t_optim"], t_params)
                    resume_state["ll_opt"] = import_torch_adam_state(
                        raw["ll_optim"], ll_params)
                    print("Imported torch Adam optimizer state (exact resume)")
                except (ValueError, KeyError) as e:
                    print(f"Could not import optimizer state ({e}); "
                          f"optimizer resets")
        start_iter = parse_start_iter(ckpt_path)
    else:
        print("Only G_EMA loaded; running PCA/kmeans++ cold start")
        from gangealing_tpu.parallel import auto_mesh
        ll_params = cold_start_ll(
            ll_params, g_params, cfg, k_init,
            perceptual_fn=perceptual_fn,
            perceptual_params=perceptual_params, debug=args.debug,
            mesh=auto_mesh())

    real_loader = None
    sample_reals = None
    if args.real_data_path is not None:
        from gangealing_tpu.data import MultiResolutionDataset, DataLoader
        dset = MultiResolutionDataset(args.real_data_path,
                                      resolution=args.real_size)
        real_loader = DataLoader(dset, batch_size=args.vis_batch_size,
                                 shuffle=False, drop_last=False)
        idx = (np.random.RandomState(args.seed).randint(
            0, len(dset), args.n_sample) if args.random_reals
            else np.arange(min(args.n_sample, len(dset))))
        sample_reals = np.stack([dset[int(i)] for i in idx])

    train_gangealing(cfg, g_params, t_params, ll_params, perceptual_params,
                     perceptual_fn, results_path, start_iter=start_iter,
                     resume_state=resume_state, real_loader=real_loader,
                     sample_reals=sample_reals, seed=args.seed,
                     n_sample=args.n_sample, n_mean=args.n_mean,
                     vis_batch_size=args.vis_batch_size,
                     log_every=args.log_every, ckpt_every=args.ckpt_every,
                     vis_every=args.vis_every, profile_dir=args.profile_dir,
                     profile_start=args.profile_start,
                     profile_stop=args.profile_stop, scan_k=scan_k)


if __name__ == "__main__":
    main()
