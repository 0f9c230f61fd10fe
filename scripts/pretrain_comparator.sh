#!/usr/bin/env bash
# SURVEY.md SS4.3: pretrain the Siamese comparator on pairwise age
# comparisons, then freeze it (+ bin anchors + score range) for the GAN's
# condition loss.
#
# Two data sources:
#   default            — pairs synthesized from age labels (tie threshold)
#   COMPARISONS_CSV=f  — REAL human annotations: CSV of pathA,pathB,label
#                        rows (label 0=A older, 1=B older, 2=tie); no ages
#                        anywhere, anchors fitted by score quantiles
set -e
if [ -n "${COMPARISONS_CSV}" ]; then
  DATA_FLAGS=(--dataset_mode comparisons --comparisons_csv "${COMPARISONS_CSV}")
else
  DATA_FLAGS=(--dataset_mode pairwise)
fi
python train.py \
  --dataroot "${DATAROOT:-./datasets/utkface}" \
  --name cmp_utk --model comparator \
  "${DATA_FLAGS[@]}" \
  --load_size 143 --crop_size 128 --batch_size 64 \
  --n_age_bins 10 \
  --niter 20 --niter_decay 0 --lr 0.0002 \
  --print_freq 50 "$@"
# output: ./checkpoints/cmp_utk/comparator  (pass as --comparator_path)
