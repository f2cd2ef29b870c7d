#!/bin/bash
# VERDICT round-3 item 4: non-saturating camelyon image-mode training at
# large N on chip. Weak-signal synthetic WSI corpus (contrast < 1 so test
# AUC plateaus below 1.0), slides large enough that foreground tile
# counts exceed 10k (4608x4608 px, 32x32 tiles = a 20,736-tile grid) —
# two orders of magnitude past the round-2 e2e run (N<=144), run
# through the streaming O(M+I) selector (eager=false; memory evidence:
# results/stream_memory_probe.json + RESULTS.md "Compiled-HLO evidence").
#
# Phases (1-CPU box: run sequentially, never race another python job):
#   bash scripts/run_camelyon_largeN.sh gen     # corpus + otsu + foreground
#   bash scripts/run_camelyon_largeN.sh train   # TPU training run
set -e
DIR=/tmp/synth_cam_large
WEAKDIR=/tmp/synth_cam_weak
CONTRAST=${CONTRAST:-0.2}

case "$1" in
gen)
  python -m ips_tpu.data.camelyon.synth "$DIR" \
    --n_normal 8 --n_tumor 8 --n_test 8 \
    --height 4608 --width 4608 --contrast "$CONTRAST" --seed 0
  python -m ips_tpu.data.camelyon.otsu --lvl 0 --n_worker 1 \
    "$DIR" otsu.csv
  python -m ips_tpu.data.camelyon.foreground --train --lvl 0 \
    --tile_size 32 --n_worker 1 "$DIR" otsu.csv "$DIR/fg"
  python -m ips_tpu.data.camelyon.foreground --test --lvl 0 \
    --tile_size 32 --n_worker 1 "$DIR" otsu.csv "$DIR/fg"
  ;;
train)
  python -m ips_tpu.main --dataset camelyon_e2e \
    data_dir="$DIR" n_epoch=30 n_epoch_warmup=3 B=4 B_seq=4 \
    M=256 I=256 patch_size='[32,32]' patch_stride='[32,32]' \
    'bucket_sizes=[12800]' eager=false n_worker=2 \
    metrics_path=results/camelyon_largeN_metrics.jsonl \
    2>&1 | tee results/camelyon_largeN_train.log
  ;;
# The fixed-contrast corpus saturates (test AUC 1.0 by epoch 3 even at
# contrast 0.2 — a lesion spanning hundreds of tiles pools into an easy
# slide-level margin). The weak phases draw PER-SLIDE contrast
# ~ U(0, 0.35): near-zero draws are unrankable by construction, so the
# test AUC plateaus strictly below 1.0 while the task stays learnable.
genweak)
  python -m ips_tpu.data.camelyon.synth "$WEAKDIR" \
    --n_normal 8 --n_tumor 8 --n_test 16 \
    --height 4608 --width 4608 --contrast 0.35 --contrast_min 0.0 \
    --seed 0
  python -m ips_tpu.data.camelyon.otsu --lvl 0 --n_worker 1 \
    "$WEAKDIR" otsu.csv
  python -m ips_tpu.data.camelyon.foreground --train --lvl 0 \
    --tile_size 32 --n_worker 1 "$WEAKDIR" otsu.csv "$WEAKDIR/fg"
  python -m ips_tpu.data.camelyon.foreground --test --lvl 0 \
    --tile_size 32 --n_worker 1 "$WEAKDIR" otsu.csv "$WEAKDIR/fg"
  ;;
trainweak)
  python -m ips_tpu.main --dataset camelyon_e2e \
    data_dir="$WEAKDIR" n_epoch=30 n_epoch_warmup=3 B=4 B_seq=4 \
    M=256 I=256 patch_size='[32,32]' patch_stride='[32,32]' \
    'bucket_sizes=[12800]' eager=false n_worker=2 \
    metrics_path=results/camelyon_largeN_weak_metrics.jsonl \
    2>&1 | tee results/camelyon_largeN_weak_train.log
  ;;
*)
  echo "usage: $0 gen|train|genweak|trainweak" >&2; exit 2 ;;
esac
