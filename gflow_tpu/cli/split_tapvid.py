"""CLI: python -m gflow_tpu.cli.split_tapvid --pkl-path tapvid_davis.pkl --out-root data/davis
(mirrors utility/split_tapvid_davis.py / scripts/tapvid_davis.sh)."""
from ..pipeline.split_tapvid import main
from ..utils.cli import run_cli

if __name__ == "__main__":
    run_cli(main, prog="split_tapvid")
