#!/usr/bin/env bash
# BASELINE config 1: CPU smoke — 64px single-epoch train + sampler on a
# 100-image synthetic subset, batch 8 (runs anywhere, no dataset needed).
set -e
export JAX_PLATFORMS=cpu
python train.py \
  --dataset_mode synthetic --max_dataset_size 100 \
  --name smoke64 --netG resnet_6blocks \
  --load_size 72 --crop_size 64 --batch_size 8 --n_age_bins 10 \
  --dtype float32 --niter 1 --niter_decay 0 \
  --print_freq 4 --save_epoch_freq 1 "$@"
python test.py \
  --dataset_mode synthetic --max_dataset_size 100 \
  --name smoke64 --netG resnet_6blocks \
  --load_size 72 --crop_size 64 --n_age_bins 10 \
  --dtype float32 --num_test 4
