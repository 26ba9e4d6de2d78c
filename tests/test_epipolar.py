"""Epipolar F-matrix + motion-mask tests."""
import jax
import jax.numpy as jnp
import numpy as np

from gflow_tpu.ops.epipolar import find_fundamental_lmeds, sampson_error
from gflow_tpu.pipeline.prep_moveseg import epipolar_error_map, uv_grid


def synthetic_two_view(n=2000, outlier_frac=0.0, seed=0):
    """Points on a plane-free 3D scene seen by two cameras; returns
    normalized correspondences."""
    rng = np.random.default_rng(seed)
    X = np.c_[rng.uniform(-1, 1, (n, 2)), rng.uniform(2, 6, (n, 1))]
    # camera 2: small rotation about y + translation in x
    th = 0.05
    R = np.array([[np.cos(th), 0, np.sin(th)], [0, 1, 0],
                  [-np.sin(th), 0, np.cos(th)]])
    t = np.array([0.3, 0.05, 0.0])
    x1 = X[:, :2] / X[:, 2:3]
    Xc2 = (R @ X.T).T + t
    x2 = Xc2[:, :2] / Xc2[:, 2:3]
    if outlier_frac > 0:
        m = int(n * outlier_frac)
        x2[:m] += rng.uniform(0.05, 0.2, (m, 2)) * rng.choice([-1, 1], (m, 2))
    return jnp.asarray(x1, jnp.float32), jnp.asarray(x2, jnp.float32)


def test_fundamental_exact_on_clean_data():
    x1, x2 = synthetic_two_view()
    F, inl = find_fundamental_lmeds(x1, x2, jax.random.PRNGKey(0))
    err = np.asarray(sampson_error(x1, x2, F))
    assert np.median(err) < 1e-9
    assert np.asarray(inl).mean() > 0.9


def test_fundamental_robust_to_outliers():
    x1, x2 = synthetic_two_view(outlier_frac=0.25, seed=1)
    F, inl = find_fundamental_lmeds(x1, x2, jax.random.PRNGKey(1))
    err = np.asarray(sampson_error(x1, x2, F))
    # inliers (the last 75%) must fit well; outliers must be flagged
    assert np.median(err[500:]) < 1e-7
    assert np.asarray(inl)[500:].mean() > 0.85
    assert np.asarray(inl)[:500].mean() < 0.3


def test_epipolar_error_map_flags_moving_region():
    """Global camera-translation flow + an object moving differently: only
    the object region should light up."""
    H, W = 96, 128
    flow = np.zeros((H, W, 2), np.float32)
    # camera translation toward +x with depth parallax (rows vary)
    yy = np.linspace(0.8, 1.2, H)[:, None]
    flow[..., 0] = 3.0 * yy
    # moving object: a block with inconsistent flow
    flow[30:60, 40:80, 0] = -4.0
    flow[30:60, 40:80, 1] = 2.5
    err = epipolar_error_map(flow)
    inside = err[35:55, 45:75].mean()
    outside = np.concatenate([err[:20].ravel(), err[70:].ravel()]).mean()
    assert inside > 10 * outside, (inside, outside)
