#!/usr/bin/env bash
# Per-stage twin of the reference's scripts/flow_unimatch.sh: run GMFlow
# (scale2-regrefine6, bidirectional + fwd/bwd check, .flo outputs) over every
# scene under parent_folder.  The reference's resume .pth path maps to a
# converted .npz checkpoint; gpu_id is accepted and ignored (single TPU).
if [ -z "$1" ]; then
    echo "Usage: $0 parent_folder [resume_weight_path] [gpu_id]"
    exit 1
fi

parent_folder=$1
resume=${2:-"${GFLOW_UNIMATCH_WEIGHTS:-}"}
gpu_id=${3:-0}   # accepted for reference-surface parity; unused

if [ ! -d "$parent_folder" ]; then
    echo "Error: Parent folder '$parent_folder' does not exist."
    exit 1
fi
if [ -z "$resume" ]; then
    echo "Error: pass resume_weight_path or set GFLOW_UNIMATCH_WEIGHTS."
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
        echo "Running flow inference on img_dir: $img_dir"
        # the reference's scale2-regrefine6 flag block (padding_factor 32,
        # num_scales 2, attn_splits 2/8, corr_radius -1/4, prop_radius -1/1,
        # reg_refine x6, bidir + fwd/bwd check, save .flo) is the model
        # config GMFlowConfig defaults to — see models/unimatch/gmflow.py.
        python -m gflow_tpu.cli.prep_flow \
            --img-dir "$img_dir" \
            --checkpoint "$resume" \
            --padding-factor 32
        echo "Finished processing $img_dir"
    fi
done

echo "All processes completed successfully."
