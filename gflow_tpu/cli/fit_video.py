"""CLI entry: python -m gflow_tpu.cli.fit_video --sequence-path ... (mirrors
the reference's tyro CLI surface, gflow/fit_video.py:409-410)."""
from .. import enable_default_compile_cache

enable_default_compile_cache()  # cold prior/stage compiles dominate first runs

from ..pipeline.fit_video import main
from ..utils.cli import run_cli

if __name__ == "__main__":
    run_cli(main, prog="fit_video")
