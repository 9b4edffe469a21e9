#!/bin/bash
# Reference: scripts/training/lsun_cats_lpips.sh (8 GPUs x batch 5 -> one
# TPU host, global batch = 5 * num_chips)
python -m gangealing_tpu.cli.train \
    --ckpt lsun_cats.pt --load_G_only --padding_mode border \
    --vis_every 5000 --ckpt_every 50000 --iter 1500000 \
    --loss_fn lpips --exp-name lsun_cats --real_data_path data/lsun_cats \
    --perceptual_weights pretrained/lpips_vgg_v0.1.pt
