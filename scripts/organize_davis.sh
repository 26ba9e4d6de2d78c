#!/usr/bin/env bash
# Restructure extracted DAVIS to <root>/<scene>/<scene>/*.jpg
# (parity with the reference's scripts/organize_davis.sh).
set -e
ROOT=${1:?usage: organize_davis.sh <davis_jpeg_root> <out_root>}
OUT=${2:?}
for scene_dir in "$ROOT"/*/; do
  scene=$(basename "$scene_dir")
  mkdir -p "$OUT/$scene/$scene"
  cp "$scene_dir"/*.jpg "$OUT/$scene/$scene/" 2>/dev/null || true
done
echo "organized into $OUT"
