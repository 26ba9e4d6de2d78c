#!/usr/bin/env bash
# Full preparation pipeline per scene (parity with scripts/prepare_davis.sh:
# depth/camera -> flow -> epipolar motion masks). Download/unzip steps are
# environment-specific and omitted; start from organized scenes
# (<root>/<scene>/<scene>/*.jpg, see organize_davis.sh).
set -e
ROOT=${1:?usage: prepare_davis.sh <organized_root>}
: "${GFLOW_MAST3R_WEIGHTS:?set GFLOW_MAST3R_WEIGHTS to a converted .npz}"
: "${GFLOW_UNIMATCH_WEIGHTS:?set GFLOW_UNIMATCH_WEIGHTS to a converted .npz}"
for scene_dir in "$ROOT"/*/; do
  scene=$(basename "$scene_dir")
  seq="$scene_dir$scene"
  echo "=== $scene ==="
  python -m gflow_tpu.cli.prep_depth   --img-dir "$seq"
  python -m gflow_tpu.cli.prep_flow    --img-dir "$seq"
  # canonical threshold 0.5: the reference's move_seg.sh default overrides
  # move_seg.py's 0.01 (reference scripts/move_seg.sh:7)
  python -m gflow_tpu.cli.prep_moveseg --img-dir "$seq" --threshold 0.5
done
