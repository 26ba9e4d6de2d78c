"""MASt3R model + global alignment tests."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gflow_tpu.models.mast3r import (Mast3rModel, Mast3rConfig,
                                     make_pairs_logwin, global_align,
                                     estimate_focal)

TINY = Mast3rConfig(
    patch_size=8, enc_dim=64, enc_depth=2, enc_heads=4,
    dec_dim=48, dec_depth=2, dec_heads=4, desc_dim=8,
)


def test_model_shapes_and_jit():
    H, W = 32, 48
    model = Mast3rModel(TINY)
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.uniform(0, 1, (1, H, W, 3)), jnp.float32)
    b = jnp.asarray(rng.uniform(0, 1, (1, H, W, 3)), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), a, b)
    o1, o2 = jax.jit(model.apply)(params, a, b)
    assert o1["pts3d"].shape == (1, H, W, 3)
    assert o1["conf"].shape == (1, H, W, 1)
    assert o1["desc"].shape == (1, H, W, 8)
    # dust3r 'exp' regression mode: unit(xyz) * expm1(|xyz|) — finite, and
    # z positivity is learned (not an activation guarantee)
    assert np.isfinite(np.asarray(o1["pts3d"])).all()
    assert float(o1["conf"].min()) >= 1.0
    # descriptors unit-normalized
    nrm = jnp.linalg.norm(o1["desc"], axis=-1)
    np.testing.assert_allclose(np.asarray(nrm), 1.0, atol=1e-5)


def test_logwin_pairs():
    pairs = make_pairs_logwin(6, winsize=3, symmetric=False)
    assert (0, 1) in pairs and (0, 2) in pairs and (0, 4) in pairs
    assert (4, 5) in pairs
    assert all(j > i for i, j in pairs)
    assert all(j < 6 for _, j in pairs)
    sym = make_pairs_logwin(6, winsize=3)
    # every frame must anchor at least one edge
    assert set(i for i, _ in sym) == set(range(6))


def test_estimate_focal_golden():
    H, W, f = 48, 64, 120.0
    pp = (W / 2, H / 2)
    ys, xs = np.mgrid[0:H, 0:W]
    z = np.full((H, W), 2.0)
    x = (xs - pp[0]) * z / f
    y = (ys - pp[1]) * z / f
    pts = np.stack([x, y, z], -1)
    assert abs(estimate_focal(pts, pp) - f) < 1e-3


def _make_scene_pointmaps(n_frames=4, H=24, W=32, f=40.0, seed=0):
    """Synthetic rigid scene: per-frame canonical pointmaps + ground-truth
    cam2world poses."""
    rng = np.random.default_rng(seed)
    pp = (W / 2, H / 2)
    # smooth depth per frame from a shared world scene: fake it by a base
    # depth field observed from slightly different poses
    poses = [np.eye(4)]
    for i in range(1, n_frames):
        th = 0.04 * i
        R = np.array([[np.cos(th), 0, np.sin(th)], [0, 1, 0],
                      [-np.sin(th), 0, np.cos(th)]])
        T = np.eye(4)
        T[:3, :3] = R
        T[:3, 3] = [0.1 * i, 0.02 * i, 0.05 * i]
        poses.append(T)  # cam2world
    # world points: unproject frame-0 grid at a wavy depth
    ys, xs = np.mgrid[0:H, 0:W]
    z0 = 2.0 + 0.3 * np.sin(xs / 7.0) + 0.2 * np.cos(ys / 5.0)
    x0 = (xs - pp[0]) * z0 / f
    y0 = (ys - pp[1]) * z0 / f
    world = np.stack([x0, y0, z0], -1)  # frame 0 == world

    canon = []
    for P in poses:
        w2c = np.linalg.inv(P)
        pts = world.reshape(-1, 3) @ w2c[:3, :3].T + w2c[:3, 3]
        canon.append(pts.reshape(H, W, 3).astype(np.float32))
    return canon, poses, (H, W)


def _edge_preds_from_scene(canon, poses, noise=0.0, seed=0):
    rng = np.random.default_rng(seed)
    H, W = canon[0].shape[:2]
    n = len(poses)
    conf = np.ones((H, W, 1), np.float32)
    edge_preds = {}
    for (i, j) in make_pairs_logwin(n, 2, symmetric=True):
        # oj: frame-j content expressed in frame i = rel transform of canon[j]
        rel = np.linalg.inv(poses[i]) @ poses[j]
        pts_j_in_i = canon[j].reshape(-1, 3) @ rel[:3, :3].T + rel[:3, 3]
        pts_j_in_i = pts_j_in_i + rng.normal(0, noise, pts_j_in_i.shape)
        edge_preds[(i, j)] = (
            {"pts3d": canon[i], "conf": conf},
            {"pts3d": pts_j_in_i.reshape(H, W, 3).astype(np.float32),
             "conf": conf},
        )
    return edge_preds


def _check_rel_poses(est, poses, tol):
    for i in range(len(poses) - 1):
        gt_rel = np.linalg.inv(poses[i]) @ poses[i + 1]
        est_rel = np.linalg.inv(est[i]) @ est[i + 1]
        err_t = np.linalg.norm(gt_rel[:3, 3] - est_rel[:3, 3])
        err_r = np.abs(gt_rel[:3, :3] - est_rel[:3, :3]).max()
        assert err_t < tol, (i, err_t)
        assert err_r < tol, (i, err_r)


def test_global_align_init_exact_on_clean_data():
    """Chain init from per-edge Umeyama must be near-exact on noise-free
    pointmaps (refinement disabled — Adam random-walks on zero gradients)."""
    canon, poses, (H, W) = _make_scene_pointmaps()
    edge_preds = _edge_preds_from_scene(canon, poses, noise=0.0)
    res = global_align(edge_preds, len(poses), (H, W), n_sample=256,
                       steps1=0, steps2=0)
    _check_rel_poses(res["poses_c2w"], poses, tol=1e-3)
    np.testing.assert_allclose(res["depths"][0], canon[0][..., 2], rtol=0.02)
    # frame-0 pointmap is pinhole-consistent -> exact focal; frames >0 in this
    # synthetic reuse frame-0's grid so the cross-frame median is biased (a
    # test-data artifact, not a solver property)
    assert abs(estimate_focal(canon[0], (W / 2, H / 2)) - 40.0) < 1e-3
    assert abs(res["focal"] - 40.0) < 8.0


def test_global_align_refines_noisy_data():
    """With observation noise the gradients are real: the refined poses must
    stay within noise scale of ground truth and the loss must be bounded."""
    canon, poses, (H, W) = _make_scene_pointmaps()
    edge_preds = _edge_preds_from_scene(canon, poses, noise=0.01, seed=1)
    res = global_align(edge_preds, len(poses), (H, W), n_sample=256,
                       steps1=150, steps2=80)
    _check_rel_poses(res["poses_c2w"], poses, tol=0.08)
    assert res["final_loss"] < 0.01


def test_convert_load_forward(tmp_path):
    """Full weight path: torch state dict with the released checkpoints'
    exact key names/shapes -> convert -> npz -> prep_depth.load_params ->
    model.apply, with NO unmatched keys in either direction and structural
    equality with model.init."""
    from gflow_tpu.models.mast3r.convert import (convert_state_dict,
                                                 expected_torch_keys,
                                                 save_npz)
    from gflow_tpu.pipeline.prep_depth import load_params

    cfg = Mast3rConfig(patch_size=8, enc_dim=32, enc_depth=2, enc_heads=4,
                       dec_dim=16, dec_depth=2, dec_heads=4, with_desc=False)
    manifest = expected_torch_keys(enc_depth=2, dec_depth=2, enc_dim=32,
                                   dec_dim=16, patch_size=8)
    rng = np.random.default_rng(0)
    sd = {k: rng.normal(0, 0.02, s).astype(np.float32)
          for k, s in manifest.items()}
    # checkpoint-only extras must be ignored, not fatal
    sd["mask_token"] = np.zeros((1, 1, 32), np.float32)

    flat = convert_state_dict(sd, enc_depth=2, dec_depth=2)
    p = tmp_path / "mast3r.npz"
    save_npz(flat, str(p))
    params = load_params(str(p))

    model = Mast3rModel(cfg)
    a = jnp.asarray(np.random.default_rng(1).uniform(0, 1, (1, 16, 24, 3)),
                    jnp.float32)
    ref = model.init(jax.random.PRNGKey(0), a, a)
    # exact tree-structure match (same paths, same shapes)
    ref_paths = {tuple(k) for k, _ in
                 jax.tree_util.tree_flatten_with_path(ref)[0]}
    got_paths = {tuple(k) for k, _ in
                 jax.tree_util.tree_flatten_with_path(params)[0]}
    assert ref_paths == got_paths
    for (kp, vref), (_, vgot) in zip(
        jax.tree_util.tree_flatten_with_path(ref)[0],
        jax.tree_util.tree_flatten_with_path(params)[0],
    ):
        assert vref.shape == vgot.shape, (kp, vref.shape, vgot.shape)

    o1, o2 = model.apply(params, a, a)
    assert o1["pts3d"].shape == (1, 16, 24, 3)
    assert np.isfinite(np.asarray(o1["pts3d"])).all()

    # a renamed/missing key must fail loudly
    bad = dict(sd)
    bad["enc_blocks.0.attn.qkv.weight"] = bad.pop("enc_blocks.0.attn.qkv.weight")
    del bad["dec_norm.weight"]
    with pytest.raises(KeyError):
        convert_state_dict(bad, enc_depth=2, dec_depth=2)


def test_global_align_long_chain_scale_stable():
    """Regression for two 200-frame-scale refinement failures (round 3):
    the global similarity gauge (uniform shrink of all scales+translations
    lowers the squared loss without improving alignment) collapsed the
    trajectory to ~0.3x scale, and unscaled Adam steps (lr 0.07 on
    quaternions ~ 4 deg/step) tangled a near-exact chain init. On a
    30-frame noisy chain the refined trajectory must keep global scale
    within 5% and relative poses within a tight fraction of the GT step."""
    canon, poses, (H, W) = _make_scene_pointmaps(n_frames=30)
    edge_preds = _edge_preds_from_scene(canon, poses, noise=0.005, seed=3)
    res = global_align(edge_preds, len(poses), (H, W), n_sample=512,
                       steps1=300, steps2=100)
    est = res["poses_c2w"]
    est_t, gt_t = [], []
    for i in range(len(poses) - 1):
        gt_rel = np.linalg.inv(poses[i]) @ poses[i + 1]
        est_rel = np.linalg.inv(est[i]) @ est[i + 1]
        gt_t.append(gt_rel[:3, 3])
        est_t.append(est_rel[:3, 3])
    est_t, gt_t = np.stack(est_t), np.stack(gt_t)
    s = float(np.sum(est_t * gt_t) / np.sum(est_t * est_t))
    assert abs(s - 1.0) < 0.05, f"global scale drifted: {s}"
    errs = np.linalg.norm(s * est_t - gt_t, axis=1)
    step = float(np.mean(np.linalg.norm(gt_t, axis=1)))
    assert float(errs.mean()) < 0.25 * step, (errs.mean(), step)
