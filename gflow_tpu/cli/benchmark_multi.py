"""CLI: python -m gflow_tpu.cli.benchmark_multi --path <dataset_root>
(mirrors gflow/benchmark_multi.py)."""
from ..eval.benchmark_multi import main
from ..utils.cli import run_cli

if __name__ == "__main__":
    run_cli(main, prog="benchmark_multi")
