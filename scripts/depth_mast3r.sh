#!/usr/bin/env bash
# Per-stage twin of the reference's scripts/depth_mast3r.sh: run the MASt3R
# depth/camera prep over every scene under parent_dir.  The reference's
# gpu_id argument selects a CUDA device; here the single tunneled TPU chip
# is implicit, so the positional slot is accepted and ignored for 1:1
# call-site compatibility.
if [ -z "$1" ]; then
    echo "Usage: $0 parent_dir [gpu_id] [seg_size] [scene_graph]"
    exit 1
fi

parent_dir="$1"
gpu_id="${2:-0}"            # accepted for reference-surface parity; unused
seg_size="${3:-200}"
scene_graph="${4:-logwin}"  # the only graph mode the pipeline ships

: "${GFLOW_MAST3R_WEIGHTS:?set GFLOW_MAST3R_WEIGHTS to a converted .npz}"

if [ "$scene_graph" != "logwin" ]; then
    echo "Error: only scene_graph=logwin is supported (got '$scene_graph')."
    exit 1
fi

for folder in "$parent_dir"/*; do
    if [ -d "$folder" ]; then
        folder_name=$(basename "$folder")
        img_dir="$folder/$folder_name"
        if [ ! -d "$img_dir" ]; then
            echo "Warning: img_dir '$img_dir' does not exist, skipping."
            continue
        fi
        echo "Running MASt3R depth prep on img_dir: $img_dir"
        python -m gflow_tpu.cli.prep_depth \
            --img-dir "$img_dir" \
            --seg-size "$seg_size"
    fi
done
