"""CLI: python -m gflow_tpu.cli.benchmark --log-path ... --sequence-path ...
(mirrors gflow/benchmark.py:409-410)."""
from ..eval.benchmark import main
from ..utils.cli import run_cli

if __name__ == "__main__":
    run_cli(main, prog="benchmark")
