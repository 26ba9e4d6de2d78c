"""Pallas kernel parity vs the XLA compositor. Runs on real TPU only
(GFLOW_TEST_TPU=1); the CPU suite covers the XLA path against the dense
oracle instead."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

if jax.default_backend() != "tpu":
    pytest.skip("pallas kernels require TPU", allow_module_level=True)

from gflow_tpu.core.camera import default_intrinsics
from gflow_tpu.ops.projection import project_gaussians
from gflow_tpu.ops.binning import bin_gaussians, tile_grid
from gflow_tpu.ops.composite import composite_tiles
from gflow_tpu.ops.pallas_raster import composite_tiles_pallas


def setup(W=160, H=96, n=2048, seed=0):
    rng = np.random.default_rng(seed)
    xyz = jnp.asarray(
        np.c_[rng.uniform(-1, 1, (n, 2)), rng.uniform(2, 6, (n, 1))], jnp.float32
    )
    scale = jnp.asarray(rng.uniform(0.01, 0.08, (n, 3)), jnp.float32)
    rotate = jnp.asarray(np.tile([1, 0, 0, 0], (n, 1)), jnp.float32)
    opacity = jnp.asarray(rng.uniform(0.2, 0.9, (n, 1)), jnp.float32)
    rgb = jnp.asarray(rng.uniform(0, 1, (n, 3)), jnp.float32)
    feats = jnp.concatenate([rgb, jnp.ones((n, 1))], 1)
    intr = default_intrinsics(W, H)
    extr = jnp.asarray(np.c_[np.eye(3), np.zeros(3)], jnp.float32)
    proj = project_gaussians(xyz, scale, rotate, intr, extr, W, H)
    bins = bin_gaussians(proj["uv"], proj["depth"], proj["radius"], W, H, 256, 32)
    n_tx, n_ty = tile_grid(W, H)
    return proj, bins, opacity, feats, n_tx, n_ty, W, H


def test_pallas_forward_matches_xla():
    proj, bins, opacity, feats, n_tx, n_ty, W, H = setup()
    args = (bins.tile_lists, proj["uv"], proj["conic"], opacity, feats, 0.25)
    img_x = composite_tiles(*args, W, H, n_tx, n_ty, tile_chunk=16)
    img_p = composite_tiles_pallas(*args, W, H, n_tx, n_ty)
    np.testing.assert_allclose(
        np.asarray(img_p), np.asarray(img_x), atol=5e-4, rtol=1e-3
    )


def test_pallas_gradients_match_xla():
    proj, bins, opacity, feats, n_tx, n_ty, W, H = setup(seed=1)

    def loss(compose, uv, conic, op, f):
        img = compose(bins.tile_lists, uv, conic, op, f, 0.25, W, H, n_tx, n_ty)
        return jnp.sum(img**2)

    import functools

    gx = jax.grad(
        functools.partial(loss, functools.partial(composite_tiles, tile_chunk=16)),
        argnums=(0, 1, 2, 3),
    )(proj["uv"], proj["conic"], opacity, feats)
    gp = jax.grad(
        functools.partial(loss, composite_tiles_pallas), argnums=(0, 1, 2, 3)
    )(proj["uv"], proj["conic"], opacity, feats)
    for a, b in zip(gx, gp):
        ref = np.abs(np.asarray(a)).max() + 1e-8
        np.testing.assert_allclose(
            np.asarray(b) / ref, np.asarray(a) / ref, atol=5e-4
        )


def test_fused_coverage_matches_two_pass():
    """The camera-only fast path (one gather + max-alpha coverage kernel)
    must agree with the two-composite formulation: identical main image,
    identical coverage-mask support."""
    from gflow_tpu.ops.pallas_raster import composite_with_coverage_pallas

    proj, bins, opacity, feats, n_tx, n_ty, W, H = setup(seed=2)
    n = opacity.shape[0]
    rng = np.random.default_rng(3)
    mov = (rng.uniform(size=(n, 1)) < 0.4).astype(np.float32)
    mov_j = jnp.asarray(mov)

    img_ref = composite_tiles_pallas(
        bins.tile_lists, proj["uv"], proj["conic"], opacity, feats, 0.25,
        W, H, n_tx, n_ty, tile_counts=bins.tile_counts)
    cov_ref = composite_tiles_pallas(
        bins.tile_lists, proj["uv"], proj["conic"], opacity * mov_j,
        jnp.ones((n, 1)), 0.0, W, H, n_tx, n_ty,
        tile_counts=bins.tile_counts)

    img, cov = composite_with_coverage_pallas(
        bins.tile_lists, proj["uv"], proj["conic"], opacity, feats, mov_j,
        0.25, W, H, n_tx, n_ty, tile_counts=bins.tile_counts)

    np.testing.assert_allclose(np.asarray(img), np.asarray(img_ref),
                               atol=1e-5, rtol=1e-5)
    # coverage SUPPORT equivalence (max-alpha > 0 iff composite > bg=0)
    np.testing.assert_array_equal(np.asarray(cov[..., 0]) > 0,
                                  np.asarray(cov_ref[..., 0]) > 1e-6)


@pytest.mark.parametrize("K", [64, 96, 128, 192])
def test_rotate_pack_any_K_matches_K256_prefix(K):
    """The TPU row-gather+rotate pack must be exact for K not a multiple of
    128 (round-2 advisor finding: NR rows only covered rot+K when K%128==0
    — dryrun's K=64 and the K-quality probe ran through the corrupt path).
    The depth-sorted stream is identical for any cap, so tile_lists at cap K
    must equal the first K columns of the K=256 lists."""
    rng = np.random.default_rng(7)
    n = 4096
    xyz = jnp.asarray(
        np.c_[rng.uniform(-1, 1, (n, 2)), rng.uniform(2, 6, (n, 1))],
        jnp.float32)
    scale = jnp.asarray(rng.uniform(0.01, 0.08, (n, 3)), jnp.float32)
    rotate = jnp.asarray(np.tile([1, 0, 0, 0], (n, 1)), jnp.float32)
    W, H = 160, 96
    intr = default_intrinsics(W, H)
    extr = jnp.asarray(np.c_[np.eye(3), np.zeros(3)], jnp.float32)
    proj = project_gaussians(xyz, scale, rotate, intr, extr, W, H)
    ref = bin_gaussians(proj["uv"], proj["depth"], proj["radius"], W, H,
                        256, 32)
    got = bin_gaussians(proj["uv"], proj["depth"], proj["radius"], W, H,
                        K, 32)
    np.testing.assert_array_equal(np.asarray(got.tile_counts),
                                  np.asarray(ref.tile_counts))
    np.testing.assert_array_equal(np.asarray(got.tile_lists),
                                  np.asarray(ref.tile_lists)[:, :K])


def test_pallas_odd_size_matches_xla():
    """Image sizes not multiples of 16 exercise the tile-grid padding and
    crop paths inside the pallas wrapper."""
    proj, bins, opacity, feats, n_tx, n_ty, W, H = setup(W=150, H=90, seed=5)
    args = (bins.tile_lists, proj["uv"], proj["conic"], opacity, feats, 0.1)
    img_x = composite_tiles(*args, W, H, n_tx, n_ty, tile_chunk=16)
    img_p = composite_tiles_pallas(*args, W, H, n_tx, n_ty,
                                   tile_counts=bins.tile_counts)
    assert img_p.shape == (H, W, feats.shape[1])
    np.testing.assert_allclose(np.asarray(img_p), np.asarray(img_x),
                               atol=2e-5, rtol=1e-5)
