"""Scene-parallel sweep over the virtual CPU mesh."""
import os

import pytest

from tests.synth import make_sequence


@pytest.mark.slow
def test_sweep_two_scenes(tmp_path):
    import jax

    from gflow_tpu.parallel.scene_sweep import fit_scenes

    seqs = []
    for name in ("a", "b"):
        root = tmp_path / name
        root.mkdir()
        seqs.append(make_sequence(root, n_frames=3, W=64, H=48, seed=hash(name) % 97))
    os.chdir(tmp_path)
    res = fit_scenes(
        seqs,
        fit_kwargs=dict(num_points=200, iterations_first=15,
                        iterations_after=8, traj_num=0),
        devices=jax.devices()[:2],
    )
    assert len(res) == 2
    for name, d in res.items():
        assert os.path.exists(os.path.join(d, "ckpt"))
        assert len(os.listdir(os.path.join(d, "ckpt"))) == 2
