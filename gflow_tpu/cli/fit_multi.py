"""CLI: python -m gflow_tpu.cli.fit_multi --path <dataset_root>
(scene-parallel dataset fitting; one sequence per device)."""
from .. import enable_default_compile_cache

enable_default_compile_cache()  # cold prior/stage compiles dominate first runs

from ..parallel.scene_sweep import main
from ..utils.cli import run_cli

if __name__ == "__main__":
    run_cli(main, prog="fit_multi")
