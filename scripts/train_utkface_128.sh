#!/usr/bin/env bash
# BASELINE config 2: 128px face-aging cGAN on UTKFace, single TPU core, bf16.
set -e
# NOTE (r3, measured): with the resnet G + instance norm, cond_inject=input
# (the template default used here for reference parity) is cancelled by the
# stem's instance norm -- add --cond_inject bottleneck for an effectively
# conditional resnet G (define_G prints the same warning).
python train.py \
  --dataroot "${DATAROOT:-./datasets/utkface}" \
  --name utk128 --model pcgan \
  --dataset_mode aging \
  --netG resnet_9blocks --netD basic --norm instance \
  --load_size 143 --crop_size 128 --batch_size 32 \
  --n_age_bins 10 --gan_mode lsgan \
  --lambda_L1 100 --lambda_cond 10 \
  --comparator_path "${COMPARATOR:-./checkpoints/cmp_utk/comparator}" \
  --niter 100 --niter_decay 100 --lr 0.0002 --beta1 0.5 \
  --pool_size 64 --print_freq 100 --save_epoch_freq 5 \
  --mesh_shape 1 "$@"
