#!/bin/bash
# Babysit the ips traffic h2h arm through axon tunnel stalls: run with
# per-epoch orbax checkpointing; if the metrics file stops growing for
# STALL_S seconds, kill (by recorded PID only) and relaunch with
# resume=true so completed epochs are never repeated. The run is
# seeded + resume-exact, so the stitched metrics equal an unbroken run.
cd /root/repo
MPATH=results/ref_h2h_traffic_ips.jsonl
CK=/tmp/h2h_traffic_ck
LOG=results/ref_h2h_traffic_ips.log
STALL_S=360
TARGET_LINES=24   # 12 epochs x (train+test)

launch() {
  resume=$1
  nohup python -m ips_tpu.main --dataset traffic \
    --config config/traffic_config.yml \
    data_dir=data/h2h_traffic n_epoch=12 n_epoch_warmup=2 B=8 B_seq=8 \
    pretrained=false n_res_blocks=2 D=128 D_k=16 D_v=16 D_inner=512 \
    "patch_size=[50, 50]" "patch_stride=[50, 50]" \
    "img_size=[600, 800]" max_shift=100 \
    n_worker=0 pin_memory=false steps_per_dispatch=1 \
    input_dtype=float32 compute_dtype=float32 input_norm=none \
    metrics_path=$MPATH checkpoint_dir=$CK checkpoint_every=1 \
    resume=$resume >> $LOG 2>&1 &
  echo $! > /tmp/ips_traffic.pid
}

export JAX_DEFAULT_MATMUL_PRECISION=highest
rm -f $MPATH; rm -rf $CK; : > $LOG
launch false
last=0; still=0
for i in $(seq 1 200); do
  sleep 60
  n=$(wc -l < $MPATH 2>/dev/null || echo 0)
  if [ "$n" -ge "$TARGET_LINES" ]; then
    # let it finish printing/writing, then stop watching
    sleep 30
    echo "BABYSIT: complete ($n lines)" >> $LOG
    exit 0
  fi
  if ! kill -0 $(cat /tmp/ips_traffic.pid) 2>/dev/null; then
    echo "BABYSIT: process died at $n lines; relaunch resume=true" >> $LOG
    launch true; last=$n; still=0; continue
  fi
  if [ "$n" -gt "$last" ]; then last=$n; still=0; else still=$((still+60)); fi
  if [ "$still" -ge "$STALL_S" ]; then
    echo "BABYSIT: stalled at $n lines; kill + resume" >> $LOG
    kill $(cat /tmp/ips_traffic.pid) 2>/dev/null; sleep 5
    kill -9 $(cat /tmp/ips_traffic.pid) 2>/dev/null
    launch true; still=0
  fi
done
