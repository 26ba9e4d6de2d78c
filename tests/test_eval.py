"""Eval-suite unit tests: TAP-Vid metrics, DAVIS J/F, ATE/RPE goldens."""
import numpy as np

from gflow_tpu.eval.tapvid import compute_tapvid_metrics
from gflow_tpu.eval.davis import jaccard_iou, boundary_f_measure
from gflow_tpu.eval.camera_eval import ate_rmse, rpe, umeyama_alignment
from gflow_tpu.eval.metrics import psnr, ssim_metric


def test_tapvid_perfect_tracking():
    T, Q = 6, 3
    rng = np.random.default_rng(0)
    tracks = rng.uniform(0, 255, (1, Q, T, 2))
    occ = np.zeros((1, Q, T), bool)
    qp = np.zeros((1, Q, 3))  # all queried at frame 0
    res = compute_tapvid_metrics(qp, occ, tracks, occ, tracks, "strided")
    assert res["occlusion_accuracy"] == 100.0
    assert res["average_jaccard"] == 100.0
    assert res["average_pts_within_thresh"] == 100.0


def test_tapvid_thresholds():
    """All predictions exactly 3 px off: inside thresholds 4/8/16, outside
    1/2."""
    T, Q = 5, 4
    tracks = np.zeros((1, Q, T, 2)) + 100
    pred = tracks + np.asarray([3.0, 0.0])
    occ = np.zeros((1, Q, T), bool)
    qp = np.zeros((1, Q, 3))
    res = compute_tapvid_metrics(qp, occ, tracks, occ, pred, "strided")
    assert res["pts_within_1"] == 0.0
    assert res["pts_within_2"] == 0.0
    assert res["pts_within_4"] == 100.0
    assert res["pts_within_16"] == 100.0
    assert res["average_pts_within_thresh"] == 60.0


def test_tapvid_first_mode_excludes_earlier_frames():
    T, Q = 4, 1
    tracks = np.zeros((1, Q, T, 2))
    pred = tracks.copy()
    pred[:, :, :2] += 100  # wrong before/at query
    occ = np.zeros((1, Q, T), bool)
    qp = np.asarray([[[1, 0, 0]]])  # query at frame 1
    res = compute_tapvid_metrics(qp, occ, tracks, occ, pred, "first")
    assert res["pts_within_1"] == 100.0  # frames 2,3 only


def test_davis_j_f():
    a = np.zeros((64, 64), bool)
    a[16:48, 16:48] = True
    assert jaccard_iou(a, a) == 1.0
    assert boundary_f_measure(a, a) == 1.0
    b = np.zeros_like(a)
    b[16:48, 32:64] = True  # half-overlap horizontally
    j = jaccard_iou(a, b)
    assert abs(j - 1 / 3) < 1e-6  # IoU of half-shifted equal squares
    f = boundary_f_measure(a, b)
    assert 0 < f < 1
    assert jaccard_iou(np.zeros_like(a), np.zeros_like(a)) == 1.0


def test_ate_invariance_under_sim3():
    rng = np.random.default_rng(1)
    traj = np.cumsum(rng.normal(0, 0.1, (20, 3)), axis=0)
    # random similarity transform of the trajectory
    q = rng.normal(size=4)
    q /= np.linalg.norm(q)
    x, y, z, w = q
    R = np.array([
        [1 - 2 * (y*y + z*z), 2 * (x*y - z*w), 2 * (x*z + y*w)],
        [2 * (x*y + z*w), 1 - 2 * (x*x + z*z), 2 * (y*z - x*w)],
        [2 * (x*z - y*w), 2 * (y*z + x*w), 1 - 2 * (x*x + y*y)],
    ])
    est = 2.5 * (R @ traj.T).T + np.asarray([1.0, -2.0, 3.0])
    assert ate_rmse(traj, est, align=True, correct_scale=True) < 1e-6
    # without scale correction, scaled trajectory has error
    assert ate_rmse(traj, est, align=True, correct_scale=False) > 0.01


def test_rpe_identity():
    poses = np.stack([np.eye(4)] * 5)
    for i, p in enumerate(poses):
        p[0, 3] = i * 0.1
    t, r = rpe(poses, poses)
    assert t == 0.0 and r == 0.0


def test_umeyama_recovers_transform():
    rng = np.random.default_rng(2)
    src = rng.normal(size=(50, 3))
    s_true = 1.7
    t_true = np.asarray([0.5, -1.0, 2.0])
    dst = s_true * src + t_true  # identity rotation
    s, R, t = umeyama_alignment(src, dst)
    assert abs(s - s_true) < 1e-9
    np.testing.assert_allclose(R, np.eye(3), atol=1e-9)
    np.testing.assert_allclose(t, t_true, atol=1e-9)


def test_psnr_ssim_basics():
    rng = np.random.default_rng(3)
    img = rng.uniform(0, 1, (64, 64, 3)).astype(np.float32)
    assert psnr(img, img) == float("inf")
    assert abs(ssim_metric(img, img) - 1.0) < 1e-5
    noisy = np.clip(img + rng.normal(0, 0.1, img.shape), 0, 1).astype(np.float32)
    p = psnr(noisy, img)
    assert 15 < p < 25
    assert ssim_metric(noisy, img) < 0.99


def test_lpips_convert_load_forward(tmp_path, monkeypatch):
    """Full LPIPS weight path: torch-keyed state dicts (torchvision AlexNet
    + LPIPS v0.1 lins, exact released key names) -> convert -> save ->
    load -> metric forward. Checks metric sanity: 0 for identical images,
    positive and increasing with distortion."""
    import numpy as np

    from gflow_tpu.eval import metrics
    from gflow_tpu.eval.lpips_convert import (convert, expected_torch_keys,
                                              save_npz)

    rng = np.random.default_rng(0)
    sd = {k: rng.normal(0, 0.05, s).astype(np.float32)
          for k, s in expected_torch_keys().items()}
    # biases small positive so relu features are non-degenerate
    for k in list(sd):
        if k.endswith(".bias"):
            sd[k] = np.abs(sd[k])
    w = convert(merged_sd=sd)
    assert set(w) == {f"conv{i}_{t}" for i in range(5) for t in "wb"} | {
        f"lin{i}_w" for i in range(5)}
    p = tmp_path / "lpips.npz"
    save_npz(w, str(p))

    monkeypatch.setenv(metrics.LPIPS_WEIGHTS_ENV, str(p))
    img = rng.uniform(0, 1, (64, 96, 3)).astype(np.float32)
    same = metrics.lpips(img, img)
    near = metrics.lpips(img, np.clip(img + 0.05, 0, 1))
    far = metrics.lpips(img, np.clip(1 - img, 0, 1))
    assert same is not None and abs(same) < 1e-6
    assert near is not None and far is not None
    assert 0 < near < far

    # missing lins must fail loudly, not produce a partial file
    import pytest

    bad = {k: v for k, v in sd.items() if not k.startswith("lin3")}
    with pytest.raises(KeyError):
        convert(merged_sd=bad)
