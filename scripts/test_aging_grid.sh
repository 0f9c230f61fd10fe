#!/usr/bin/env bash
# BASELINE config 4: aging-progression grids across all age conditions.
set -e
python test.py \
  --dataroot "${DATAROOT:-./datasets/utkface}" \
  --name "${NAME:-utk128}" \
  --dataset_mode aging \
  --netG resnet_9blocks --norm instance \
  --load_size 143 --crop_size 128 --n_age_bins 10 \
  --epoch latest --num_test 50 "$@"
