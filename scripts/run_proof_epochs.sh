#!/bin/bash
# VERDICT round-3 item 2 "done" criterion: `python -m ips_tpu.main
# --dataset mnist|camelyon` with NO perf overrides (only data paths /
# epoch count / metrics output) reproduces the RESULTS.md per-step wall
# numbers on chip. Run each phase alone on the 1-CPU box.
#
#   bash scripts/run_proof_epochs.sh gen-mnist   # 1500x1500 corpus (CPU)
#   bash scripts/run_proof_epochs.sh mnist       # 1-epoch TPU proof
#   bash scripts/run_proof_epochs.sh gen-cam     # reference-scale HDF5
#   bash scripts/run_proof_epochs.sh camelyon    # 1-epoch TPU proof
set -e
MNIST_DIR=data/megapixel_mnist/dsets/megapixel_mnist_1500
CAM_DIR=/tmp/synth_cam_feat

case "$1" in
gen-mnist)
  python -m ips_tpu.data.mnist --n_train 5000 --n_test 1000 \
    --width 1500 --height 1500 --n_noise 50 --digit_source sklearn \
    "$MNIST_DIR"
  ;;
mnist)
  # shipped config defaults (sparse_input, bf16 input, K=8); one epoch,
  # track_efficiency prints the per-step wall the proof is about
  python -m ips_tpu.main --dataset mnist \
    data_dir="$MNIST_DIR" n_epoch=1 n_epoch_warmup=1 \
    track_efficiency=true track_epoch=0 \
    2>&1 | tee results/proof_epoch_mnist.log
  ;;
gen-cam)
  python - <<'EOF'
from ips_tpu.data.camelyon.dataset import make_synth_features
import os
d = "/tmp/synth_cam_feat"
os.makedirs(d, exist_ok=True)
# reference scale: 2048-dim features, N up to 10k; weak signal so the
# 1-epoch metrics are not trivially saturated. Uncompressed (gzip of
# random floats is ~20 MB/s on one core).
make_synth_features(f"{d}/feat_train_500ep.hdf5", n_slides=32,
                    feat_dim=2048, n_range=(4000, 10000), seed=0,
                    signal=0.55, compression=None)
make_synth_features(f"{d}/feat_test_500ep.hdf5", n_slides=16,
                    feat_dim=2048, n_range=(4000, 10000), seed=1,
                    signal=0.55, compression=None)
print("wrote", d)
EOF
  ;;
camelyon)
  python -m ips_tpu.main --dataset camelyon \
    data_dir="$CAM_DIR" n_epoch=1 n_epoch_warmup=1 n_worker=4 \
    track_efficiency=true track_epoch=0 \
    2>&1 | tee results/proof_epoch_camelyon.log
  ;;
*)
  echo "usage: $0 gen-mnist|mnist|gen-cam|camelyon" >&2; exit 2 ;;
esac
