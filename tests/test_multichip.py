"""Multi-chip sharding tests on the 8-virtual-device CPU mesh."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest


def test_mesh_shape():
    from gflow_tpu.parallel import make_mesh

    mesh = make_mesh(8)
    assert dict(mesh.shape) == {"data": 2, "tile": 4}


def test_dryrun_multichip_8():
    assert len(jax.devices()) >= 8, "conftest should provide 8 CPU devices"
    import __graft_entry__ as g

    g.dryrun_multichip(8)


def test_sharded_step_matches_unsharded():
    """The sharded batched step must compute the same update as a 1-device
    mesh run (determinism of the tile-sharded einsum path)."""
    from gflow_tpu.parallel import make_mesh
    from gflow_tpu.parallel.multichip import dryrun_step

    mesh8 = make_mesh(8)
    mesh1 = make_mesh(1)
    l8 = dryrun_step(mesh8, B=2, seed=3)
    l1 = dryrun_step(mesh1, B=2, seed=3)
    np.testing.assert_allclose(l8, l1, rtol=1e-5)


def _tiny_stage_inputs(seed=0, W=64, H=48, capacity=512):
    from gflow_tpu.opt.state import Params, Targets, init_frame_state

    rng = np.random.default_rng(seed)
    params = Params(
        xyz=jnp.asarray(np.c_[rng.uniform(-1, 1, (capacity, 2)),
                              rng.uniform(1.5, 4.0, (capacity, 1))],
                        jnp.float32),
        scale=jnp.asarray(rng.uniform(0.01, 0.05, (capacity, 3)), jnp.float32),
        rotate=jnp.tile(jnp.asarray([1., 0, 0, 0]), (capacity, 1)),
        opacity=jnp.full((capacity, 1), 0.3),
        rgb=jnp.asarray(rng.normal(0, 1, (capacity, 3)), jnp.float32),
        pose=jnp.asarray([0, 0, 0, 1, 0, 0, 0], jnp.float32),
        depth_ab=jnp.asarray([1., 0.]),
    )
    state = init_frame_state(capacity)._replace(
        n_alive=jnp.asarray(capacity - 64, jnp.int32))
    targets = Targets(
        image=jnp.asarray(rng.uniform(0, 1, (H, W, 3)), jnp.float32),
        depth=jnp.full((H, W, 1), 2.0),
        flow=jnp.zeros((H, W, 2)),
        move_mask=jnp.zeros((H, W), bool),
        occ_mask=jnp.asarray(rng.random((H, W)) < 0.1),
    )
    return params, state, targets


def test_tile_sharded_full_stage_matches_single_device():
    """The PRODUCT multi-chip mode: the full train_stage (12 iterations +
    an occ densify event at iter 0 + an error densify at iter 6 + finalize)
    run under an ambient ('tile',) mesh must match the plain single-device
    stage — same code path, GSPMD-partitioned (VERDICT r3 item 6: the 8==1
    invariance extended to a multi-iteration stage WITH densify)."""
    import functools

    from gflow_tpu.opt import StageConfig, StageDynamics, train_stage
    from gflow_tpu.opt.losses import LossWeights
    from gflow_tpu.ops.render import RenderConfig, ambient_tile_axes
    from gflow_tpu.parallel.mesh import fitting_mesh

    W, H = 64, 48
    params, state, targets = _tiny_stage_inputs(seed=7, W=W, H=H)
    intr = jnp.asarray([60.0, 60.0, W / 2, H / 2])
    key = jax.random.PRNGKey(0)
    dyn = StageDynamics.make(lr=1e-2, lr_camera=1e-3,
                             weights=LossWeights.make(rgb=1.0, depth=0.1),
                             num_points=256, densify_occ_percent=0.5)

    def run(render_cfg):
        cfg = StageConfig(W=W, H=H, iterations=12, densify_occ=True,
                          densify_interval=6, densify_times=1,
                          max_densify=64, render=render_cfg)
        fn = jax.jit(functools.partial(train_stage, cfg=cfg))
        p, s, info = fn(params, state, targets, intr, key, dyn=dyn)
        return p, s, info

    p1, s1, i1 = run(RenderConfig(max_per_tile=64))

    mesh = fitting_mesh(8)
    with jax.set_mesh(mesh):
        axes = ambient_tile_axes()
        assert axes == ("tile",)
        p8, s8, i8 = run(RenderConfig(max_per_tile=64, tile_shard_axes=axes))

    assert int(s8.n_alive) == int(s1.n_alive)
    assert int(s8.n_alive) > int(state.n_alive)  # densify actually ran
    # tolerance: sharded reductions reorder float adds; the deltas compound
    # through 12 Adam steps (observed max 5e-5 on xyz)
    np.testing.assert_allclose(np.asarray(p8.xyz), np.asarray(p1.xyz),
                               atol=2e-4)
    np.testing.assert_allclose(np.asarray(p8.pose), np.asarray(p1.pose),
                               atol=2e-4)
    np.testing.assert_allclose(float(i8["metrics"]["total"]),
                               float(i1["metrics"]["total"]), rtol=1e-4)


def test_tile_sharded_stage_pallas_shardmap(monkeypatch):
    """VERDICT r4 item 4: the multi-chip fitting mode on the PALLAS kernel
    (shard_map band decomposition, pallas_raster.*_sharded) must match the
    plain single-device stage — full stage with densify AND a camera-only
    stage (the fused coverage kernel's sharded twin). Interpret mode
    executes the kernels on the 8-virtual-CPU mesh."""
    import functools

    from gflow_tpu.opt import StageConfig, StageDynamics, train_stage
    from gflow_tpu.opt.losses import LossWeights
    from gflow_tpu.ops.render import RenderConfig, ambient_tile_axes
    from gflow_tpu.parallel.mesh import fitting_mesh

    monkeypatch.setenv("GFLOW_PALLAS_INTERPRET", "1")

    W, H = 64, 48
    params, state, targets = _tiny_stage_inputs(seed=7, W=W, H=H)
    state = state._replace(last_num=state.n_alive)
    intr = jnp.asarray([60.0, 60.0, W / 2, H / 2])
    key = jax.random.PRNGKey(0)
    dyn = StageDynamics.make(lr=1e-2, lr_camera=1e-3,
                             weights=LossWeights.make(rgb=1.0, depth=0.1),
                             num_points=256, densify_occ_percent=0.5)

    def run(render_cfg, camera_only=False):
        cfg = StageConfig(
            W=W, H=H, iterations=6, camera_only=camera_only,
            densify_occ=not camera_only,
            densify_interval=0 if camera_only else 3,
            densify_times=0 if camera_only else 1,
            max_densify=64, render=render_cfg)
        fn = jax.jit(functools.partial(train_stage, cfg=cfg))
        return fn(params, state, targets, intr, key, dyn=dyn)

    mesh = fitting_mesh(8)
    for camera_only in (False, True):
        p1, s1, i1 = run(RenderConfig(max_per_tile=64), camera_only)
        with jax.set_mesh(mesh):
            axes = ambient_tile_axes()
            p8, s8, i8 = run(
                RenderConfig(max_per_tile=64, tile_shard_axes=axes,
                             backend="pallas"),
                camera_only)
        assert int(s8.n_alive) == int(s1.n_alive)
        np.testing.assert_allclose(np.asarray(p8.xyz), np.asarray(p1.xyz),
                                   atol=2e-4)
        np.testing.assert_allclose(np.asarray(p8.pose), np.asarray(p1.pose),
                                   atol=2e-4)
        np.testing.assert_allclose(float(i8["metrics"]["total"]),
                                   float(i1["metrics"]["total"]), rtol=2e-4)


@pytest.mark.slow
def test_fullscale_step(tmp_path):
    """The batched sharded step at the REAL canonical shape (854x480, 64k
    capacity, K=128, B=2): proves the batched compositor's memory story at
    the true tile count (T=1620/frame) and records peak RSS. Slow on the
    1-core virtual mesh — opt in with GFLOW_FULLSCALE=1."""
    import json
    import os
    import resource

    if os.environ.get("GFLOW_FULLSCALE", "0") != "1":
        pytest.skip("set GFLOW_FULLSCALE=1 to run the full-scale step")

    from gflow_tpu.parallel import make_mesh
    from gflow_tpu.parallel.multichip import dryrun_step

    mesh = make_mesh(8, data_parallel=2, platform="cpu")
    loss = dryrun_step(mesh, B=2, W=854, H=480, capacity=65536,
                       max_per_tile=128, max_tiles_per_gaussian=16)
    peak_gb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6
    out = {"loss": float(loss), "peak_rss_gb": round(peak_gb, 2),
           "shape": "B=2 854x480 cap=65536 K=128 on 2x4 mesh"}
    print(json.dumps(out))
    path = os.path.join(os.path.dirname(__file__), "..",
                        "MULTICHIP_FULLSCALE.json")
    try:  # merge: the tile-sharded-stage entry lives in the same artifact
        with open(path) as f:
            prev = json.load(f)
    except Exception:
        prev = {}
    prev.update(out)
    with open(path, "w") as f:
        json.dump(prev, f, indent=1)
    assert peak_gb < 100, f"peak RSS {peak_gb} GB exceeds bound"


@pytest.mark.slow
def test_fullscale_tile_sharded_stage(tmp_path):
    """The PRODUCT tile-sharded mode at the real canonical shape: a
    3-iteration train_stage at 854x480/51.2k, tile axis sharded over the
    2x4 mesh — proves the unchunked sharded compositor's memory story
    (per-device alpha block is T/8 x K x 256). Opt in: GFLOW_FULLSCALE=1."""
    import functools
    import json
    import os
    import resource

    if os.environ.get("GFLOW_FULLSCALE", "0") != "1":
        pytest.skip("set GFLOW_FULLSCALE=1 to run the full-scale stage")

    from gflow_tpu.opt import StageConfig, StageDynamics, train_stage
    from gflow_tpu.opt.losses import LossWeights
    from gflow_tpu.ops.render import RenderConfig, ambient_tile_axes
    from gflow_tpu.parallel.mesh import fitting_mesh

    W, H = 854, 480
    params, state, targets = _tiny_stage_inputs(seed=1, W=W, H=H,
                                                capacity=51_200)
    dyn = StageDynamics.make(lr=1e-2, weights=LossWeights.make(rgb=1.0),
                             num_points=50_000)
    with jax.set_mesh(fitting_mesh(8, platform="cpu")):
        base = RenderConfig.for_scene(W, H, 50_000)
        assert base.tile_shard_axes == ambient_tile_axes() == ("tile",)
        cfg = StageConfig(W=W, H=H, iterations=3, render=base)
        fn = jax.jit(functools.partial(train_stage, cfg=cfg))
        p, s, info = fn(params, state, targets,
                        jnp.asarray([500.0, 500.0, W / 2, H / 2]),
                        jax.random.PRNGKey(0), dyn=dyn)
        jax.block_until_ready(p.xyz)
    assert np.isfinite(float(info["metrics"]["total"]))
    peak_gb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6
    entry = {"loss": float(info["metrics"]["total"]),
             "peak_rss_gb": round(peak_gb, 2),
             "shape": f"854x480 cap=51200 M={base.max_tiles_per_gaussian} "
                      f"K={base.max_per_tile}, 3-iter tile-sharded stage "
                      "on ('tile',)=8 mesh"}
    print(json.dumps(entry))
    path = os.path.join(os.path.dirname(__file__), "..",
                        "MULTICHIP_FULLSCALE.json")
    try:
        with open(path) as f:
            prev = json.load(f)
    except Exception:
        prev = {}
    prev["tile_sharded_stage"] = entry
    with open(path, "w") as f:
        json.dump(prev, f, indent=1)
    assert peak_gb < 100


@pytest.mark.slow
def test_fit_video_shard_devices_end_to_end(tmp_path, monkeypatch):
    """`fit_video --shard-devices 8` is a usable fitting mode: the whole
    pipeline (stages, densify, diagnostics, IO) runs under the mesh and
    produces the standard artifacts."""
    import os

    from tests.synth import make_sequence

    seq = make_sequence(tmp_path, n_frames=3, W=96, H=64)
    monkeypatch.chdir(tmp_path)
    from gflow_tpu.pipeline.fit_video import main

    trainer = main(
        num_points=400, sequence_path=seq, iterations_first=30,
        iterations_after=15, iterations_camera=5, camera_first=True,
        lr=0.01, lr_after=5e-3, lambda_depth=0.1, lambda_var=50.0,
        lambda_flow=0.01, lambda_still=1.0, densify_interval=15,
        densify_times=1, traj_num=4,
        logs_suffix=str(tmp_path / "logs_shard"), shard_devices=8,
    )
    assert trainer.render_config.tile_shard_axes == ("tile",)
    d = trainer.dir
    imgs = os.listdir(os.path.join(d, "images"))
    assert any(f.startswith("img_00000") for f in imgs)
    assert len(os.listdir(os.path.join(d, "ckpt"))) == 2
