"""GaussianScene construction + activation contracts (the public library
on-ramp the verify drive exercises: scene_from_arrays -> render_scene)."""
import numpy as np
import jax.numpy as jnp

from gflow_tpu.core.camera import Camera
from gflow_tpu.core.scene import make_empty_scene, scene_from_arrays
from gflow_tpu.ops.render import render_scene


def _scene(N=40, capacity=64, opacity_shape="flat"):
    rng = np.random.default_rng(0)
    op = np.full((N,), 0.7, np.float32)
    if opacity_shape == "col":
        op = op[:, None]
    return scene_from_arrays(
        capacity=capacity,
        xyz=np.c_[rng.uniform(-1, 1, (N, 2)) * 0.5,
                  rng.uniform(2.0, 3.0, N)].astype(np.float32),
        scale_act=np.full((N, 3), 0.08, np.float32),
        rotate=np.tile([1, 0, 0, 0], (N, 1)).astype(np.float32),
        opacity_act=op,
        rgb_act=rng.uniform(0.1, 0.9, (N, 3)).astype(np.float32))


def test_activated_shapes_both_opacity_layouts():
    """A 1-D opacity_act must normalize to the declared (C, 1) layout —
    regression: it used to build a (C,) opacity whose activated() broadcast
    into (C, C) and failed deep inside the compositor."""
    for layout in ("flat", "col"):
        sc = _scene(opacity_shape=layout)
        assert sc.opacity.shape == (64, 1)
        _, _, _, op_act, _ = sc.activated()
        assert op_act.shape == (64, 1)
        # dead capacity slots forced transparent
        assert float(jnp.abs(op_act[40:]).max()) == 0.0
        assert float(op_act[:40].min()) > 0.5


def test_render_scene_odd_size():
    """render_scene on a non-multiple-of-16 canvas (tile padding path)."""
    sc = _scene()
    cam = Camera(intr=jnp.asarray([80.0, 80.0, 48.5, 32.5]),
                 pose=jnp.asarray([0.0, 0, 0, 1, 0, 0, 0]))
    out = render_scene(sc, cam, 0.0, 97, 65, ("rgb", "acc"))
    assert out["rgb"].shape == (65, 97, 3)
    assert np.isfinite(np.asarray(out["rgb"])).all()
    assert float(out["acc"].max()) > 0.1


def test_empty_scene_contract():
    sc = make_empty_scene(32)
    assert sc.opacity.shape == (32, 1) and int(sc.n_alive) == 32
