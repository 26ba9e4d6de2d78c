"""CLI: convert released torch checkpoints to the .npz files the prep
pipeline loads.

  python -m gflow_tpu.cli.convert_weights --model mast3r \
      --checkpoint-path MASt3R_....pth --out-path mast3r.npz
  python -m gflow_tpu.cli.convert_weights --model unimatch \
      --checkpoint-path gmflow-scale2-regrefine6-....pth --out-path flow.npz

Point $GFLOW_MAST3R_WEIGHTS / $GFLOW_UNIMATCH_WEIGHTS at the outputs (or
pass --checkpoint to the prep CLIs)."""


def main(model: str, checkpoint_path: str, out_path: str):
    if model == "mast3r":
        from ..models.mast3r.convert import convert_file
    elif model == "unimatch":
        from ..models.unimatch.convert import convert_file
    else:
        raise ValueError(f"unknown model {model!r} (mast3r | unimatch)")
    print(convert_file(checkpoint_path, out_path))


if __name__ == "__main__":
    from ..utils.cli import run_cli

    run_cli(main, prog="convert_weights")
