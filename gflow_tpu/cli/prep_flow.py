"""CLI: python -m gflow_tpu.cli.prep_flow --img-dir <seq> --checkpoint <npz>
(mirrors scripts/flow_unimatch.sh)."""
from .. import enable_default_compile_cache

enable_default_compile_cache()  # cold prior/stage compiles dominate first runs

from ..pipeline.prep_flow import main
from ..utils.cli import run_cli

if __name__ == "__main__":
    run_cli(main, prog="prep_flow")
