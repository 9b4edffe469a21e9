#!/bin/bash
# One TPU host drives all local chips; --batch is the GLOBAL batch
# (the reference uses 8 GPUs x per-GPU batch 5 = 40).
# Reference: scripts/training/celeba.sh (128px generator, 512 PCA dirs)
python -m gangealing_tpu.cli.train \
    --ckpt celeba.pt --load_G_only --padding_mode border --gen_size 128 \
    --vis_every 5000 --ckpt_every 50000 --iter 1500000 --tv_weight 2500 \
    --ndirs 512 --inject 6 --loss_fn lpips --exp-name in_the_wild_celeba \
    --real_data_path data/celeba \
    --perceptual_weights pretrained/lpips_vgg_v0.1.pt
