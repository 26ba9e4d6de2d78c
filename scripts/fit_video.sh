#!/usr/bin/env bash
# Canonical reproduction config — exact flag parity with the reference's
# scripts/fit_video.sh:15-48 (50k points, 480p, lr 4e-3 / lr_camera 0,
# 500/150/300 iters, densify 150x2 + occluded 0.5 + 100x2 after,
# densify_err_percent 1.0, lambda_depth 0.1, lambda_var 50,
# lambda_flow 0.01, camera-first, --no-load-extr, traj 100 offset 2,
# per-sequence logs).
set -e
SEQ=${1:?usage: fit_video.sh <sequence_path>}
python -m gflow_tpu.cli.fit_video \
  --sequence-path "$SEQ" \
  --num-points 50000 \
  --resize 480 \
  --lr 4e-3 --lr-camera 0.00 \
  --iterations-first 500 \
  --lr-after 4e-3 --iterations-after 300 \
  --camera-first --lr-camera-after 1e-3 --iterations-camera 150 \
  --no-load-extr \
  --densify-interval 150 --densify-times 2 \
  --densify-occ-percent 0.5 \
  --densify-interval-after 100 --densify-times-after 2 \
  --densify-err-thre 1e-2 --densify-err-percent 1.0 \
  --lambda-rgb 1.0 --lambda-depth 0.1 --lambda-var 50 \
  --lambda-still 0.0 --lambda-flow 0.01 --lambda-scale 0.0 \
  --background black \
  --frame-range -1 --frame-start 0 --skip-interval 1 \
  --traj-num 100 --traj-offset 2 \
  --no-common-logs \
  --logs-suffix logs_cam_init_only
