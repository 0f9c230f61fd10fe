#!/usr/bin/env bash
# SURVEY.md SS4.3: pretrain the Siamese comparator on pairwise age
# comparisons, then freeze it (+ bin anchors) for the GAN's condition loss.
set -e
python train.py \
  --dataroot "${DATAROOT:-./datasets/utkface}" \
  --name cmp_utk --model comparator \
  --dataset_mode pairwise \
  --load_size 143 --crop_size 128 --batch_size 64 \
  --n_age_bins 10 \
  --niter 20 --niter_decay 0 --lr 0.0002 \
  --print_freq 50 "$@"
# output: ./checkpoints/cmp_utk/comparator  (pass as --comparator_path)
