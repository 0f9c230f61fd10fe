#!/usr/bin/env bash
# BASELINE config 3: 128px data-parallel on v5e-8 (shard_map psum over ICI),
# device input pipeline at full rate.
set -e
# NOTE (r3, measured): with the resnet G + instance norm, cond_inject=input
# (the template default used here for reference parity) is cancelled by the
# stem's instance norm -- add --cond_inject bottleneck for an effectively
# conditional resnet G (define_G prints the same warning).
python train.py \
  --dataroot "${DATAROOT:-./datasets/utkface}" \
  --name utk128_dp8 --model pcgan \
  --dataset_mode aging \
  --netG resnet_9blocks --netD basic --norm instance \
  --load_size 143 --crop_size 128 --batch_size 256 \
  --n_age_bins 10 --gan_mode lsgan \
  --lambda_L1 100 --lambda_cond 10 \
  --comparator_path "${COMPARATOR:-./checkpoints/cmp_utk/comparator}" \
  --niter 100 --niter_decay 100 --lr 0.0002 --beta1 0.5 \
  --pool_size 64 --print_freq 50 --save_epoch_freq 5 \
  --num_threads 16 \
  --mesh_shape -1 "$@"
