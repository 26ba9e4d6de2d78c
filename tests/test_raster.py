"""Rasterizer correctness: dense reference vs tiled path, gradients, semantics."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gflow_tpu.core import camera as cam
from gflow_tpu.ops.projection import project_gaussians
from gflow_tpu.ops.reference import composite_dense
from gflow_tpu.ops.binning import bin_gaussians, tile_grid
from gflow_tpu.ops.composite import composite_tiles
from gflow_tpu.ops.render import render


def make_scene(n=64, seed=0, W=64, H=48, spread=1.0):
    rng = np.random.default_rng(seed)
    xyz = np.concatenate(
        [
            rng.uniform(-spread, spread, size=(n, 2)),
            rng.uniform(2.0, 6.0, size=(n, 1)),
        ],
        axis=1,
    )
    scale = rng.uniform(0.02, 0.15, size=(n, 3))
    rotate = rng.normal(size=(n, 4))
    rotate /= np.linalg.norm(rotate, axis=1, keepdims=True)
    opacity = rng.uniform(0.3, 0.95, size=(n, 1))
    rgb = rng.uniform(0.05, 0.95, size=(n, 3))
    intr = cam.default_intrinsics(W, H)
    extr = jnp.asarray(
        np.concatenate([np.eye(3), np.zeros((3, 1))], axis=1), jnp.float32
    )
    to = lambda x: jnp.asarray(x, jnp.float32)
    return to(xyz), to(scale), to(rotate), to(opacity), to(rgb), intr, extr


@pytest.mark.parametrize("seed,m_tiles", [(0, 64), (1, 64), (0, 48)])
def test_tiled_matches_dense(seed, m_tiles):
    W, H = 64, 48
    xyz, scale, rotate, opacity, rgb, intr, extr = make_scene(seed=seed, W=W, H=H)
    proj = project_gaussians(xyz, scale, rotate, intr, extr, W, H)
    bg = 0.0

    img_dense = composite_dense(
        proj["uv"], proj["conic"], opacity, rgb, proj["depth"], proj["radius"],
        bg, W, H, tile_consistent=True,
    )
    bins = bin_gaussians(proj["uv"], proj["depth"], proj["radius"], W, H,
                         max_per_tile=128, max_tiles_per_gaussian=m_tiles)
    n_tx, n_ty = tile_grid(W, H)
    img_tiled = composite_tiles(
        bins.tile_lists, proj["uv"], proj["conic"], opacity, rgb,
        bg, W, H, n_tx, n_ty, tile_chunk=4,
    )
    np.testing.assert_allclose(
        np.asarray(img_tiled), np.asarray(img_dense), atol=1e-4, rtol=1e-4
    )


def test_two_class_binning_matches_single_class():
    """Two-class emission with a generous large cap must produce EXACTLY the
    single-class lists: a small splat's rect fits both grids (same entries),
    and every large splat gets a full-grid slot. Distinct depths make the
    sort order deterministic."""
    W, H = 64, 48
    xyz, scale, rotate, opacity, rgb, intr, extr = make_scene(seed=3, W=W, H=H)
    # mix in some big splats so both classes are populated
    scale = scale.at[:8].mul(8.0)
    proj = project_gaussians(xyz, scale, rotate, intr, extr, W, H)
    kw = dict(max_per_tile=128, max_tiles_per_gaussian=48)
    ref = bin_gaussians(proj["uv"], proj["depth"], proj["radius"], W, H, **kw)
    got = bin_gaussians(proj["uv"], proj["depth"], proj["radius"], W, H,
                        small_tiles_per_gaussian=8, large_frac=1.0, **kw)
    np.testing.assert_array_equal(np.asarray(got.tile_counts),
                                  np.asarray(ref.tile_counts))
    np.testing.assert_array_equal(np.asarray(got.tile_lists),
                                  np.asarray(ref.tile_lists))
    assert int(got.large_clamped) == 0
    # large splats actually took the large path (small grid can't cover them)
    rw = np.asarray(proj["radius"])
    assert (rw > 8).sum() > 0, "scene has no large splats — test is vacuous"


def test_two_class_cap_degrades_gracefully():
    """With a tiny large cap, overflowing large splats fall back to the
    small grid: lists stay valid (subset of entries), large_clamped counts
    them, and the largest-area splats keep their full grid."""
    W, H = 64, 48
    xyz, scale, rotate, opacity, rgb, intr, extr = make_scene(seed=4, W=W, H=H)
    scale = scale.at[:16].mul(8.0)
    proj = project_gaussians(xyz, scale, rotate, intr, extr, W, H)
    kw = dict(max_per_tile=128, max_tiles_per_gaussian=48)
    full = bin_gaussians(proj["uv"], proj["depth"], proj["radius"], W, H,
                         small_tiles_per_gaussian=8, large_frac=1.0, **kw)
    capped = bin_gaussians(proj["uv"], proj["depth"], proj["radius"], W, H,
                           small_tiles_per_gaussian=8, large_frac=8 / 64,
                           **kw)
    assert int(capped.large_clamped) > 0
    # every capped entry set is a subset of the uncapped per-tile set
    fl = np.asarray(full.tile_lists)
    cl = np.asarray(capped.tile_lists)
    for t in range(fl.shape[0]):
        f = set(fl[t][fl[t] >= 0].tolist())
        c = set(cl[t][cl[t] >= 0].tolist())
        assert c <= f, f"tile {t}: capped lists contain novel entries"
    assert int(np.asarray(capped.tile_counts).sum()) < int(
        np.asarray(full.tile_counts).sum())


def test_tile_counts_cover_all_entries():
    W, H = 64, 48
    xyz, scale, rotate, opacity, rgb, intr, extr = make_scene(seed=2, W=W, H=H)
    proj = project_gaussians(xyz, scale, rotate, intr, extr, W, H)
    bins = bin_gaussians(proj["uv"], proj["depth"], proj["radius"], W, H,
                         max_per_tile=128, max_tiles_per_gaussian=64)
    lists = np.asarray(bins.tile_lists)
    counts = np.asarray(bins.tile_counts)
    # every tile's number of non-empty entries equals its count (K not exceeded)
    n_entries = (lists >= 0).sum(axis=1)
    np.testing.assert_array_equal(n_entries, np.minimum(counts, lists.shape[1]))
    # entries in each tile must be depth-sorted
    depth = np.asarray(proj["depth"])[:, 0]
    for t in range(lists.shape[0]):
        ids = lists[t][lists[t] >= 0]
        d = depth[ids]
        assert np.all(np.diff(d) >= -1e-6)


def test_background_fill():
    """No gaussians visible -> pure background."""
    W, H = 32, 32
    xyz = jnp.asarray([[0.0, 0.0, -5.0]], jnp.float32)  # behind camera
    scale = jnp.full((1, 3), 0.1)
    rotate = jnp.asarray([[1.0, 0.0, 0.0, 0.0]])
    opacity = jnp.ones((1, 1))
    rgb = jnp.ones((1, 3))
    intr = cam.default_intrinsics(W, H)
    extr = jnp.asarray(np.concatenate([np.eye(3), np.zeros((3, 1))], 1), jnp.float32)
    out = render(xyz, scale, rotate, opacity, rgb, intr, extr, 0.33, W, H, ("rgb",))
    np.testing.assert_allclose(np.asarray(out["rgb"]), 0.33, atol=1e-6)
    # msplat convention: culled -> depth == 0
    out2 = render(xyz, scale, rotate, opacity, rgb, intr, extr, 0.0, W, H, ("depth",))
    assert float(out2["depth"][0, 0]) == 0.0


def test_multi_output_render():
    W, H = 64, 48
    xyz, scale, rotate, opacity, rgb, intr, extr = make_scene(seed=3, W=W, H=H)
    out = render(
        xyz, scale, rotate, opacity, rgb, intr, extr, 0.0, W, H,
        ("rgb", "uv", "depth", "depth_map", "depth_map_color", "center"),
    )
    assert out["rgb"].shape == (H, W, 3)
    assert out["depth_map"].shape == (H, W, 1)
    assert out["depth_map_color"].shape == (H, W, 3)
    assert out["center"].shape == (H, W, 3)
    assert out["uv"].shape == (xyz.shape[0], 2)
    assert out["depth"].shape == (xyz.shape[0], 1)
    # depth map should be positive where gaussians cover
    assert float(jnp.max(out["depth_map"])) > 0.5


def test_center_respects_opacity_mask():
    """The center view's opacity-1 override must NOT resurrect points masked
    out via opacity — the reference only sees points present in its sliced
    tensors (still/move subset renders mask via opacity here; dead capacity
    slots likewise)."""
    W, H = 64, 48
    xyz, scale, rotate, opacity, rgb, intr, extr = make_scene(seed=5, W=W, H=H)
    full = render(xyz, scale, rotate, opacity, rgb, intr, extr, 0.0, W, H,
                  ("center",))["center"]
    assert float(jnp.max(full)) > 0.0
    masked = render(xyz, scale, rotate, jnp.zeros_like(opacity), rgb, intr,
                    extr, 0.0, W, H, ("center",))["center"]
    np.testing.assert_allclose(np.asarray(masked), 0.0, atol=1e-6)
    # uint8 quantization path returns the same pixels
    u8 = render(xyz, scale, rotate, opacity, rgb, intr, extr, 0.0, W, H,
                ("center",), as_uint8=True)["center"]
    assert u8.dtype == jnp.uint8
    np.testing.assert_array_equal(
        np.asarray(u8),
        (np.clip(np.asarray(full), 0, 1) * 255).astype(np.uint8),
    )


def test_tiled_gradients_match_dense():
    """Autodiff through the tiled path == autodiff through the dense oracle."""
    W, H = 32, 32
    xyz, scale, rotate, opacity, rgb, intr, extr = make_scene(
        n=24, seed=4, W=W, H=H, spread=0.6
    )
    target = jnp.zeros((H, W, 3)) + 0.25

    def loss_dense(xyz, scale, opacity, rgb, pose):
        extr_ = cam.pose_to_extr(pose)
        proj = project_gaussians(xyz, scale, rotate, intr, extr_, W, H)
        img = composite_dense(
            proj["uv"], proj["conic"], opacity, rgb, proj["depth"],
            proj["radius"], 0.0, W, H,
        )
        return jnp.mean((img - target) ** 2)

    def loss_tiled(xyz, scale, opacity, rgb, pose):
        extr_ = cam.pose_to_extr(pose)
        proj = project_gaussians(xyz, scale, rotate, intr, extr_, W, H)
        bins = bin_gaussians(proj["uv"], proj["depth"], proj["radius"], W, H,
                             max_per_tile=64, max_tiles_per_gaussian=64)
        n_tx, n_ty = tile_grid(W, H)
        img = composite_tiles(
            bins.tile_lists, proj["uv"], proj["conic"], opacity, rgb,
            0.0, W, H, n_tx, n_ty, tile_chunk=2,
        )
        return jnp.mean((img - target) ** 2)

    pose = jnp.asarray([0.0, 0.0, 0.0, 1.0, 0.0, 0.0, 0.0], jnp.float32)
    args = (xyz, scale, opacity, rgb, pose)
    g_dense = jax.grad(loss_dense, argnums=(0, 1, 2, 3, 4))(*args)
    g_tiled = jax.grad(loss_tiled, argnums=(0, 1, 2, 3, 4))(*args)
    for gd, gt in zip(g_dense, g_tiled):
        np.testing.assert_allclose(np.asarray(gt), np.asarray(gd), atol=1e-5, rtol=1e-3)
    # pose gradient must be live (camera optimization depends on it)
    assert np.abs(np.asarray(g_tiled[4])).max() > 0


def test_finite_difference_gradcheck():
    """Spot-check autodiff against central finite differences."""
    W, H = 24, 24
    xyz, scale, rotate, opacity, rgb, intr, extr = make_scene(
        n=8, seed=5, W=W, H=H, spread=0.5
    )

    def loss(opacity):
        proj = project_gaussians(xyz, scale, rotate, intr, extr, W, H)
        bins = bin_gaussians(proj["uv"], proj["depth"], proj["radius"], W, H,
                             max_per_tile=32, max_tiles_per_gaussian=64)
        n_tx, n_ty = tile_grid(W, H)
        img = composite_tiles(
            bins.tile_lists, proj["uv"], proj["conic"], opacity, rgb,
            0.0, W, H, n_tx, n_ty, tile_chunk=1,
        )
        return jnp.sum(img**2)

    g = np.asarray(jax.grad(loss)(opacity))
    eps = 1e-3
    op = np.asarray(opacity)
    for i in [0, 3, 7]:
        e = np.zeros_like(op)
        e[i, 0] = eps
        fd = (float(loss(jnp.asarray(op + e))) - float(loss(jnp.asarray(op - e)))) / (
            2 * eps
        )
        np.testing.assert_allclose(g[i, 0], fd, atol=2e-2, rtol=2e-2)


def test_for_scene_policy_by_content():
    """RenderConfig.for_scene adapts M to the MEASURED init-sampling density
    (M_QUALITY.json, 4 scenes): dense texture keeps the tight M=8 clamp;
    content whose gradient-importance samples concentrate on edges (flat
    walls/sky) needs larger supported radii — on those scenes M=8 craters
    PSNR by 6.7-27.8 dB."""
    from scipy.ndimage import gaussian_filter

    from gflow_tpu.ops.render import RenderConfig
    from gflow_tpu.ops.projection import supported_max_radius

    W, H = 854, 480
    rng = np.random.default_rng(0)
    smooth = rng.uniform(0, 1, (H, W, 3)).astype(np.float32)
    for c in range(3):
        smooth[..., c] = gaussian_filter(smooth[..., c], 8)
    smooth = (smooth - smooth.min()) / (smooth.max() - smooth.min())

    flat = np.zeros((H, W, 3), np.float32)
    sky_h = int(0.4 * H)
    t = np.linspace(0, 1, sky_h, dtype=np.float32)[:, None, None]
    flat[:sky_h] = (1 - t) * np.asarray([0.45, 0.62, 0.95]) + t * np.asarray(
        [0.80, 0.88, 1.00])
    xs = np.linspace(0, W, 5).astype(int)
    for i, c in enumerate([(0.55, 0.45, 0.35), (0.70, 0.68, 0.62),
                           (0.35, 0.40, 0.45), (0.62, 0.30, 0.25)]):
        flat[sky_h:, xs[i]:xs[i + 1]] = c

    dense = RenderConfig.for_scene(W, H, 50_000, image=smooth)
    assert dense.max_tiles_per_gaussian == 8 and dense.max_per_tile == 96

    wallsky = RenderConfig.for_scene(W, H, 50_000, image=flat)
    assert wallsky.max_tiles_per_gaussian >= 12
    assert wallsky.max_per_tile == 128

    sparse = RenderConfig.for_scene(W, H, 10_000, image=flat)
    # median sample spacing ~14.9 px -> needs ~37 px supported radius
    assert supported_max_radius(sparse.max_tiles_per_gaussian) >= 37

    # without an image the uniform-density estimate is used (back-compat)
    uni = RenderConfig.for_scene(W, H, 50_000)
    assert uni.max_tiles_per_gaussian == 8


def test_rect_grid_radius_ladder():
    """The for_scene ladder must be strictly useful: each rung's guaranteed
    radius (set by min(MX, MY)) strictly increases."""
    from gflow_tpu.ops.projection import supported_max_radius

    radii = [supported_max_radius(m) for m in (8, 12, 16, 48, 64)]
    assert radii == sorted(radii)
    assert len(set(radii)) == len(radii)
    assert supported_max_radius(48) == 40.0
