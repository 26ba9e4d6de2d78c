"""CLI: python -m gflow_tpu.cli.viewer --folder <logdir> --port 8080
(mirrors gflow/viewer.py:233-246 / scripts/run_viewer.sh)."""
from ..viz.viewer import main
from ..utils.cli import run_cli

if __name__ == "__main__":
    run_cli(main, prog="viewer")
