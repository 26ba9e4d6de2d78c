#!/usr/bin/env bash
# Per-stage twin of the reference's scripts/move_seg.sh: epipolar-error
# motion masks over every scene under parent_folder.  Canonical threshold is
# 0.5 (the reference .sh default overrides move_seg.py's 0.01); gpu_id is
# accepted and ignored (single TPU).
if [ -z "$1" ]; then
    echo "Usage: $0 parent_folder [threshold] [gpu_id]"
    exit 1
fi

parent_folder=$1
threshold=${2:-0.5}
gpu_id=${3:-0}   # accepted for reference-surface parity; unused

if [ ! -d "$parent_folder" ]; then
    echo "Error: Parent folder '$parent_folder' does not exist."
    exit 1
fi

for folder in "$parent_folder"/*; do
    if [ -d "$folder" ]; then
        folder_name=$(basename "$folder")
        img_dir="$folder/$folder_name"
        if [ ! -d "$img_dir" ]; then
            echo "Warning: img_dir '$img_dir' does not exist, skipping."
            continue
        fi
        echo "Running move-seg on img_dir: $img_dir (threshold $threshold)"
        python -m gflow_tpu.cli.prep_moveseg \
            --img-dir "$img_dir" --threshold "$threshold"
    fi
done
