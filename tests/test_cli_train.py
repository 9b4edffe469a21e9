"""End-to-end training-CLI test, including --auto_resume preemption
relaunch (reference workflow: train.py:218-253 resume + torchrun restarts,
README.md:27 — here relaunching the same command continues training)."""

import json
import os
import sys

import numpy as np
import pytest

import jax


def _base_argv(tmp, iters):
    return [
        "train", "--exp-name", "smoke", "--results", str(tmp / "results"),
        "--ckpt", str(tmp / "g.pt"), "--load_G_only",
        "--gen_size", "64", "--real_size", "64", "--flow_size", "64",
        "--dim_latent", "64", "--n_mlp", "2", "--batch", "1",
        "--iter", str(iters), "--anneal_psi", "1", "--period", "1",
        "--ndirs", "2", "--inject", "3", "--debug", "--log_every", "1",
        "--ckpt_every", "2", "--n_sample", "2", "--vis_every", "0",
        "--transform", "similarity", "--tv_weight", "0",
        "--stn_channel_multiplier", "0.25",
    ]


def _read_scalars(tmp):
    path = tmp / "results" / "smoke" / "scalars.jsonl"
    with open(path) as f:
        return [json.loads(line) for line in f if line.strip()]


@pytest.mark.slow
def test_cli_train_and_auto_resume(tmp_path, monkeypatch):
    import torch
    from gangealing_tpu.cli.args import base_training_argparse
    from gangealing_tpu.cli.train import build_configs, main
    from gangealing_tpu.models.stylegan2 import generator_init

    # toy generator checkpoint in the reference torch schema
    argv = _base_argv(tmp_path, 2)
    monkeypatch.setattr(sys, "argv", argv)
    args = base_training_argparse().parse_args(argv[1:])
    cfg = build_configs(args)
    g_params = generator_init(jax.random.PRNGKey(0), cfg.g)
    torch.save({"g_ema": {k: torch.from_numpy(np.asarray(v))
                          for k, v in g_params.items()}},
               str(tmp_path / "g.pt"))

    main()
    scalars = _read_scalars(tmp_path)
    iters1 = {s["step"] for s in scalars}
    assert max(iters1) >= 2
    ckpt_dir = tmp_path / "results" / "smoke" / "checkpoints"
    saved = sorted(os.listdir(ckpt_dir))
    assert any(p.endswith(".pt") for p in saved), saved

    # relaunch the same command with more iters + --auto_resume: must pick
    # up from the saved checkpoint, not restart from the toy G
    monkeypatch.setattr(sys, "argv", _base_argv(tmp_path, 4)
                        + ["--auto_resume"])
    main()
    scalars = _read_scalars(tmp_path)
    iters2 = sorted({s["step"] for s in scalars})
    assert max(iters2) >= 4
    # the resumed run must NOT relog iteration 1 (it starts past the save)
    first_run_max = max(iters1)
    resumed = [i for i in iters2 if i > first_run_max]
    assert resumed, (iters1, iters2)
