"""CLI: python -m gflow_tpu.cli.prep_flow --img-dir <seq> --checkpoint <npz>
(mirrors scripts/flow_unimatch.sh)."""
from ..pipeline.prep_flow import main
from ..utils.cli import run_cli

if __name__ == "__main__":
    run_cli(main, prog="prep_flow")
