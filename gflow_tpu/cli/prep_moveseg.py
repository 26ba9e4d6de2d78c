"""CLI: python -m gflow_tpu.cli.prep_moveseg --img-dir <seq>
(mirrors utility/move_seg.py __main__ / scripts/move_seg.sh)."""
from ..pipeline.prep_moveseg import main
from ..utils.cli import run_cli

if __name__ == "__main__":
    run_cli(main, prog="prep_moveseg")
