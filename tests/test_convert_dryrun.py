"""Converter --dry-run manifest validation (weights-gated on-ramp): a
{torch_key: shape} manifest — no tensor data — must round-trip the full
strict mapping, and a corrupted manifest must fail loudly. Manifests come
from the same torch replicas the full-parity tests lock numerics with, so
the key layout is exactly the released-checkpoint schema those tests model
(reference downloads: utility/depth_mast3r.py:46-48, scripts/
flow_unimatch.sh:48-62)."""
import json

import pytest

torch = pytest.importorskip("torch")

from gflow_tpu.models.mast3r import convert as mconvert
from gflow_tpu.models.unimatch import convert as uconvert


def _manifest(sd):
    return {k: list(v.shape) for k, v in sd.items()}


def test_mast3r_dry_run_manifest():
    from tests.test_mast3r_full_torch_parity import DEPTH, TorchMast3r, _sd

    torch.manual_seed(0)
    mf = _manifest(_sd(TorchMast3r()))
    rep = mconvert.dry_run(mf, enc_depth=DEPTH, dec_depth=DEPTH)
    assert rep["ok"] and rep["head"] == "catmlp+dpt"
    assert rep["checkpoint_keys"] == len(mf)
    assert rep["flax_params"] > 0 and rep["total_parameters"] > 0

    # a missing key must fail strict validation
    bad = dict(mf)
    bad.pop("enc_blocks.0.attn.qkv.weight")
    with pytest.raises(KeyError):
        mconvert.dry_run(bad, enc_depth=DEPTH, dec_depth=DEPTH)
    # an alien key too
    bad = dict(mf)
    bad["not.a.real.key"] = [3, 3]
    with pytest.raises(KeyError):
        mconvert.dry_run(bad, enc_depth=DEPTH, dec_depth=DEPTH)


def test_unimatch_dry_run_manifest():
    from tests.test_gmflow_full_torch_parity import NLAYERS, TorchGMFlow, _sd

    torch.manual_seed(0)
    mf = _manifest(_sd(TorchGMFlow()))
    rep = uconvert.dry_run(mf, num_layers=NLAYERS)
    assert rep["ok"] and rep["checkpoint_keys"] == len(mf)

    bad = dict(mf)
    bad.pop("refine.gru.convz1.weight")
    with pytest.raises(KeyError):
        uconvert.dry_run(bad, num_layers=NLAYERS)


def test_dry_run_key_inventory():
    """manifest=None returns the expected released key inventory (full
    scale); it must be non-trivial and include known landmark keys."""
    inv = mconvert.dry_run()
    assert "enc_blocks.23.attn.qkv.weight" in inv["expected_keys"]
    assert len(inv["expected_keys"]) > 500
    inv = uconvert.dry_run()
    assert "transformer.layers.5.self_attn.q_proj.weight" in (
        inv["expected_keys"])


def test_cli_dry_run(tmp_path, capsys):
    """The convert_weights CLI surface: --dry-run --manifest path."""
    from tests.test_gmflow_full_torch_parity import NLAYERS, TorchGMFlow, _sd

    from gflow_tpu.cli.convert_weights import main

    torch.manual_seed(0)
    mf = _manifest(_sd(TorchGMFlow()))
    p = tmp_path / "manifest.json"
    p.write_text(json.dumps(mf))
    # full-scale rules won't match the reduced replica; route through the
    # module API for depth control — the CLI covers the released depths
    with pytest.raises(KeyError):
        main("unimatch", dry_run=True, manifest=str(p))
    main("unimatch", dry_run=True)  # inventory mode
    out = capsys.readouterr().out
    assert "expected_keys" in out
