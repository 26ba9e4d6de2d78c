"""CLI: python -m gflow_tpu.cli.prep_depth --img-dir <seq> --checkpoint <npz>
(mirrors utility/depth_mast3r.py / scripts/depth_mast3r.sh)."""
from .. import enable_default_compile_cache

enable_default_compile_cache()  # cold prior/stage compiles dominate first runs

from ..pipeline.prep_depth import main
from ..utils.cli import run_cli

if __name__ == "__main__":
    run_cli(main, prog="prep_depth")
