#!/bin/bash
# One TPU host drives all local chips; --batch is the GLOBAL batch
# (the reference uses 8 GPUs x per-GPU batch 5 = 40).
# Reference: scripts/training/lsun_cars.sh (clustering: K=4 heads + flips)
python -m gangealing_tpu.cli.train \
    --ckpt car.pt --load_G_only --padding_mode reflection --tv_weight 2500 \
    --vis_every 5000 --ckpt_every 50000 --iter 1500000 \
    --loss_fn lpips --exp-name lsun_cars --num_heads 4 --flips \
    --ndirs 5 --inject 6 --sample_from_full_res \
    --real_data_path data/lsun_cars \
    --perceptual_weights pretrained/lpips_vgg_v0.1.pt
