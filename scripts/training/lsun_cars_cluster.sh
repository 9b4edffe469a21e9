#!/bin/bash
# Reference: scripts/training/lsun_cars_cluster.sh (clustering, K=4 + flips)
python -m gangealing_tpu.cli.train \
    --ckpt lsun_cars.pt --load_G_only --padding_mode border \
    --iter 1500000 --loss_fn lpips --num_heads 4 --flips \
    --exp-name lsun_cars_cluster --real_data_path data/lsun_cars \
    --perceptual_weights pretrained/lpips_vgg_v0.1.pt
