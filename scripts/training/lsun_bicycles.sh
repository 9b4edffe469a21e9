#!/bin/bash
# One TPU host drives all local chips; --batch is the GLOBAL batch
# (the reference uses 8 GPUs x per-GPU batch 5 = 40).
# Reference: scripts/training/lsun_bicycles.sh (ADA checkpoint: num_fp16_res)
python -m gangealing_tpu.cli.train \
    --ckpt bicycle.pt --load_G_only --num_fp16_res 4 \
    --padding_mode reflection --tv_weight 2500 \
    --vis_every 5000 --ckpt_every 50000 --iter 1500000 \
    --loss_fn lpips --exp-name lsun_bicycles \
    --real_data_path data/lsun_bicycles \
    --perceptual_weights pretrained/lpips_vgg_v0.1.pt
