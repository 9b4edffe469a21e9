#!/bin/bash
# One TPU host drives all local chips; --batch is the GLOBAL batch
# (the reference uses 8 GPUs x per-GPU batch 5 = 40).
# Reference: scripts/training/lsun_cars_cluster_classifier.sh
python -m gangealing_tpu.cli.train_cluster_classifier \
    --ckpt lsun_cars_gangealing_checkpoint.pt --padding_mode reflection \
    --vis_every 5000 --ckpt_every 50000 --iter 55000 --period 50000 \
    --loss_fn lpips --exp-name lsun_cars_cluster_classifier \
    --num_heads 4 --flips --ndirs 5 --inject 6 --sample_from_full_res \
    --perceptual_weights pretrained/lpips_vgg_v0.1.pt
