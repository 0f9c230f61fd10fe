#!/usr/bin/env bash
# BASELINE config 5: 256px CACD-scale training, large-batch bf16, remat,
# streaming on-device FID every 5 epochs (SURVEY.md SS7 acceptance configs).
#
# Measured on one v5e chip (round 2): batch 16 no-remat 136 imgs/s/chip,
# batch 32 no-remat 128.1 (fits HBM since the bias-drop/s2d savings; full
# remat drops it to 111.4 — use --remat --remat_blocks N only if a bigger
# per-chip batch OOMs). The default below is the larger-batch config — the
# one that scales to DP meshes (per-chip batch 32; pass --mesh_shape 8 on
# a v5e-8 for global-256). FID features default to the 'random' extractor;
# switch to --fid_features comparator (with --comparator_path) or
# --fid_features pth:<inception_v3.pth> for externally comparable numbers.
set -e
# NOTE (r3, measured): with the resnet G + instance norm, cond_inject=input
# (the template default used here for reference parity) is cancelled by the
# stem's instance norm -- add --cond_inject bottleneck for an effectively
# conditional resnet G (define_G prints the same warning).
python train.py \
  --dataroot "${DATAROOT:-./datasets/cacd}" \
  --name cacd256 --model pcgan \
  --netG resnet_9blocks --netD basic --norm instance \
  --load_size 286 --crop_size 256 --batch_size 32 \
  --dtype bfloat16 \
  --n_age_bins 10 \
  --gan_mode lsgan --lambda_L1 100 --pool_size 64 \
  --niter 100 --niter_decay 100 --lr 0.0002 --beta1 0.5 \
  --eval_fid_epoch_freq 5 --eval_fid_images 1024 \
  --max_ckpt_keep 5 \
  --print_freq 100 --save_epoch_freq 5 "$@"
