#!/bin/bash
# One TPU host drives all local chips; --batch is the GLOBAL batch
# (the reference uses 8 GPUs x per-GPU batch 5 = 40).
# Reference: scripts/training/lsun_cats_ssl.sh
python -m gangealing_tpu.cli.train \
    --ckpt cat.pt --load_G_only --padding_mode border \
    --vis_every 5000 --ckpt_every 50000 --iter 1500000 --tv_weight 1000 \
    --loss_fn vgg_ssl --exp-name lsun_cats \
    --real_data_path data/lsun_cats \
    --perceptual_weights pretrained/simclr_vgg_phase150.pt
