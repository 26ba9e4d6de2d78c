import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gflow_tpu.core import camera as cam


def random_rotation(seed):
    rng = np.random.default_rng(seed)
    q = rng.normal(size=4)
    q /= np.linalg.norm(q)
    x, y, z, w = q
    return np.array(
        [
            [1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)],
            [2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)],
            [2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)],
        ]
    )


@pytest.mark.parametrize("seed", range(8))
def test_quat_rotmat_roundtrip(seed):
    R = random_rotation(seed)
    q = cam.rotmat_to_quat_xyzw(jnp.asarray(R))
    R2 = cam.quat_xyzw_to_rotmat(q)
    np.testing.assert_allclose(np.asarray(R2), R, atol=1e-5)


def test_identity_quat():
    R = cam.quat_xyzw_to_rotmat(jnp.asarray([0.0, 0.0, 0.0, 1.0]))
    np.testing.assert_allclose(np.asarray(R), np.eye(3), atol=1e-7)
    Rw = cam.quat_wxyz_to_rotmat(jnp.asarray([1.0, 0.0, 0.0, 0.0]))
    np.testing.assert_allclose(np.asarray(Rw), np.eye(3), atol=1e-7)


def test_pose_extr_roundtrip():
    R = random_rotation(3)
    t = np.array([0.3, -0.2, 1.5])
    extr = np.concatenate([R, t[:, None]], axis=1)
    pose = cam.extr_to_pose(jnp.asarray(extr))
    extr2 = cam.pose_to_extr(pose)
    np.testing.assert_allclose(np.asarray(extr2), extr, atol=1e-5)


def test_pix2world_world2pix_roundtrip():
    W, H = 64, 48
    # pix2world mirrors the reference quirk of using fx for BOTH axes
    # (gflow/utils/geometry.py:115-116); the roundtrip therefore holds for
    # fx == fy, which is the only case the pipeline produces (load_camera
    # always sets focal, focal — gflow/trainer.py:164-166).
    intr = jnp.asarray([40.0, 40.0, W / 2, H / 2], jnp.float32)
    R = random_rotation(7)
    t = np.array([0.1, 0.2, 0.3])
    extr = jnp.asarray(np.concatenate([R, t[:, None]], axis=1), jnp.float32)

    rng = np.random.default_rng(0)
    uv = jnp.asarray(rng.uniform(0, [W, H], size=(100, 2)), jnp.float32)
    depth = jnp.asarray(rng.uniform(0.5, 5.0, size=(100, 1)), jnp.float32)

    xyz = cam.pix2world(uv, depth, intr, extr)
    uv2, depth2 = cam.world2pix(xyz, intr, extr)
    np.testing.assert_allclose(np.asarray(uv2), np.asarray(uv), atol=1e-2)
    np.testing.assert_allclose(np.asarray(depth2), np.asarray(depth), atol=1e-4)


def test_camera_gradients_flow():
    """Pose gradients through projection — the camera-only optimization stage
    depends on these (reference: gflow/trainer.py:130-137)."""
    W, H = 32, 32
    c = cam.default_camera(W, H)
    xyz = jnp.asarray([[0.0, 0.0, 2.0], [0.5, -0.3, 3.0]], jnp.float32)

    def loss(pose):
        extr = cam.pose_to_extr(pose)
        uv, depth = cam.world2pix(xyz, c.intr, extr)
        return jnp.sum(uv**2) + jnp.sum(depth**2)

    g = jax.grad(loss)(c.pose)
    assert np.all(np.isfinite(np.asarray(g)))
    assert np.abs(np.asarray(g)).max() > 0
