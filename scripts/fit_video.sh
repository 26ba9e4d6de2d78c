#!/usr/bin/env bash
# Canonical reproduction config — parity with the reference's
# scripts/fit_video.sh:15-48 (50k points, 480p, 500/150/300 iters,
# densify 150x2 + occluded 0.5 + 100x2 after, lambda_depth 0.1,
# lambda_var 50, lambda_flow 0.01, camera-first, --no-load-extr).
set -e
SEQ=${1:?usage: fit_video.sh <sequence_path>}
python -m gflow_tpu.cli.fit_video \
  --sequence-path "$SEQ" \
  --num-points 50000 \
  --resize 480 \
  --iterations-first 500 \
  --camera-first --iterations-camera 150 \
  --iterations-after 300 \
  --lr 0.01 --lr-camera 0.01 \
  --lr-after 1e-3 --lr-camera-after 1e-3 \
  --lambda-rgb 1.0 --lambda-depth 0.1 --lambda-var 50 --lambda-flow 0.01 \
  --densify-interval 150 --densify-times 2 \
  --densify-interval-after 100 --densify-times-after 2 \
  --densify-occ-percent 0.5 --densify-err-thre 1e-2 --densify-err-percent 0.2 \
  --traj-num 200 \
  --no-load-extr \
  --logs-suffix logs
