#!/usr/bin/env bash
# parity with scripts/run_viewer.sh
set -e
FOLDER=${1:?usage: run_viewer.sh <log_folder> [port]}
python -m gflow_tpu.cli.viewer --folder "$FOLDER" --port "${2:-8080}"
