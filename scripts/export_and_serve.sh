#!/usr/bin/env bash
# Deployment: trained checkpoint -> self-contained StableHLO artifact ->
# HTTP serving host with request coalescing (docs/MIGRATION.md SS8).
set -e
cd "$(dirname "$0")/.."
NAME="${NAME:-utk128}"
CKPT="${CKPT:-./checkpoints}"
OUT="${OUT:-./serving/$NAME}"
python tools/export_serving.py \
  --name "$NAME" --checkpoints_dir "$CKPT" \
  --netG resnet_9blocks --crop_size 128 --n_age_bins 10 \
  --out_dir "$OUT" --verify "$@"
exec python tools/serve_http.py \
  --artifact_dir "$OUT" --port "${PORT:-8500}" \
  --warmup_batch "${WARMUP:-8}" --batch_window_ms "${WINDOW_MS:-5}"
