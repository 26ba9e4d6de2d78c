"""IO, CLI-builder, video-muxer, and viewer coverage."""
import os
import struct

import numpy as np
import pytest

from gflow_tpu.core import io as gio
from gflow_tpu.utils.cli import build_parser


def test_flo_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    flow = rng.normal(0, 3, (24, 32, 2)).astype(np.float32)
    p = tmp_path / "a.flo"
    gio.write_flow(p, flow)
    back = gio.read_flow(p)
    np.testing.assert_array_equal(back, flow)


def test_flo_rejects_bad_magic(tmp_path):
    p = tmp_path / "bad.flo"
    p.write_bytes(b"\x00" * 64)
    with pytest.raises(ValueError):
        gio.read_flow(p)


def test_read_depth_scale_offset(tmp_path):
    d = np.linspace(1, 2, 12).reshape(3, 4).astype(np.float32)
    p = tmp_path / "d.npy"
    np.save(p, d)
    out = gio.read_depth(p, depth_scale=2.0, depth_offset=0.5)
    np.testing.assert_allclose(out, d * 2 + 0.5, rtol=1e-6)


def test_read_mask_variants(tmp_path):
    import imageio.v2 as imageio

    m = np.zeros((10, 12), np.uint8)
    m[2:5, 3:7] = 255
    p = tmp_path / "m.png"
    imageio.imwrite(p, m)
    out = gio.read_mask(p)
    assert out.dtype == bool and out.sum() == 3 * 4
    # rgb mask
    p3 = tmp_path / "m3.png"
    imageio.imwrite(p3, np.repeat(m[..., None], 3, -1))
    out3 = gio.read_mask(p3)
    np.testing.assert_array_equal(out3, out)


def test_resize_shorter_side():
    img = np.zeros((100, 200, 3), np.float32)
    out = gio.resize_image(img, 50)
    assert out.shape == (50, 100, 3)
    out2 = gio.resize_image(np.zeros((200, 100), np.float32), 50)
    assert out2.shape == (100, 50)


def test_camera_json_roundtrip(tmp_path):
    pose = np.eye(4)
    pose[:3, 3] = [1, 2, 3]
    p = tmp_path / "0.json"
    gio.write_camera(p, focal=321.5, pose_w2c_4x4=pose, pp=(30, 20))
    focal, pp, poses = gio.read_camera([p])
    assert focal == 321.5 and pp == [30, 20]
    np.testing.assert_allclose(poses[0], pose[:3], atol=1e-12)


def test_cli_builder_types():
    def f(a: int = 1, b: float = 0.5, c: str = "x", flag: bool = False,
          maybe: int = None):
        return a, b, c, flag, maybe

    parser = build_parser(f)
    args = parser.parse_args(
        ["--a", "3", "--b", "1.5", "--c", "y", "--flag", "--maybe", "7"]
    )
    assert (args.a, args.b, args.c, args.flag, args.maybe) == (3, 1.5, "y", True, 7)
    args2 = parser.parse_args(["--no-flag"])
    assert args2.flag is False and args2.a == 1


def test_mjpeg_avi_structure(tmp_path):
    from gflow_tpu.viz.mjpeg_avi import write_mjpeg_avi

    frames = [np.full((32, 48, 3), i * 40, np.uint8) for i in range(4)]
    p = tmp_path / "v.avi"
    write_mjpeg_avi(p, frames, fps=5)
    data = p.read_bytes()
    assert data[:4] == b"RIFF" and data[8:12] == b"AVI "
    movi = data.find(b"movi")
    assert movi > 0
    # 4 frame chunks + 4 idx1 entries
    assert data.count(b"00dc", movi) == 8
    n_frames = struct.unpack("<I", data[data.find(b"avih") + 8 + 16 :][:4])[0]
    assert n_frames == 4
    # embedded JPEG decodes
    import io as _io

    from PIL import Image

    j = data.find(b"00dc", movi)
    size = struct.unpack("<I", data[j + 4 : j + 8])[0]
    img = Image.open(_io.BytesIO(data[j + 8 : j + 8 + size]))
    img.load()
    assert img.size == (48, 32)


def test_viewer_state_and_render(tmp_path):
    import jax.numpy as jnp

    from gflow_tpu.pipeline.trainer import GFlowTrainer
    from gflow_tpu.viz.viewer import ViewerState

    rng = np.random.default_rng(0)
    img = rng.uniform(0, 1, (32, 48, 3)).astype(np.float32)
    depth = np.full((32, 48), 2.0, np.float32)
    t = GFlowTrainer(gt_image=img, gt_depth=depth, num_points=100,
                     logs_suffix=str(tmp_path / "logs"))
    t.init_gaussians_from_image()
    t.save_checkpoint("00000")
    t.save_checkpoint("00001")

    vs = ViewerState(t.dir)
    assert len(vs.frames) == 2
    jpeg = vs.render(0, 0.0, 0.0, 0.0, follow=True)
    assert jpeg[:2] == b"\xff\xd8"  # JPEG SOI
    jpeg2 = vs.render(1, 0.4, 0.1, -0.1, follow=False)  # orbit path
    assert jpeg2[:2] == b"\xff\xd8"

    # free 6-DoF client pose (reference viewer.py:76-82): a NON-orbit pose —
    # the training camera rolled 30deg about its own axis and trucked right;
    # unreachable by the az/el/radius orbit parametrization
    from gflow_tpu.viz.viewer import pose_to_w2c, w2c_to_pose

    q, p = w2c_to_pose(vs.frames[0]["extr"])
    roll = np.array([np.cos(np.pi / 12), 0, 0, np.sin(np.pi / 12)])
    w, x, y, z = q
    rw, rx, ry, rz = roll
    q_rolled = np.array([
        w * rw - x * rx - y * ry - z * rz,
        w * rx + x * rw + y * rz - z * ry,
        w * ry - x * rz + y * rw + z * rx,
        w * rz + x * ry - y * rx + z * rw])
    jpeg3 = vs.render(0, 0.0, 0.0, 0.0, follow=False,
                      pose=list(q_rolled) + list(p + np.array([0.3, 0, 0])))
    assert jpeg3[:2] == b"\xff\xd8"
    assert jpeg3 != jpeg  # pose override actually changed the view

    # round-trip: pose built from a frame's own extr re-renders that extr
    same = pose_to_w2c(q, p)
    np.testing.assert_allclose(same, vs.frames[0]["extr"], atol=1e-5)


def test_load_checkpoint_grows_capacity(tmp_path):
    """A shell trainer (small capacity, like eval_tracking's
    GFlowTrainer(num_points=1000) — eval/benchmark.py) must load checkpoints
    from real runs whose point count exceeds its capacity (reference reloads
    into a fresh SimpleGaussian: gflow/benchmark.py:75,96-97)."""
    import jax.numpy as jnp

    from gflow_tpu.pipeline.trainer import GFlowTrainer

    rng = np.random.default_rng(1)
    img = rng.uniform(0, 1, (32, 48, 3)).astype(np.float32)
    depth = np.full((32, 48), 2.0, np.float32)

    big = GFlowTrainer(gt_image=img, gt_depth=depth, num_points=3000,
                       logs_suffix=str(tmp_path / "logs"))
    big.init_gaussians_from_image()
    assert int(big.state.n_alive) == 3000
    big.save_checkpoint("00000")
    ckpt = os.path.join(big.dir, "ckpt", "00000.npz")

    shell = GFlowTrainer(gt_image=img, num_points=100, make_logs=False)
    assert shell.capacity < 3000
    shell.load_checkpoint(ckpt)
    assert int(shell.state.n_alive) == 3000
    assert shell.capacity >= 3000
    # every capacity-shaped array resized consistently
    for arr in (shell.params.xyz, shell.params.scale, shell.params.rotate,
                shell.params.opacity, shell.params.rgb,
                shell.state.still_mask, shell.state.still_mask_tentative,
                shell.state.last_uv, shell.state.last_depth,
                shell.state.last_xyz):
        assert arr.shape[0] == shell.capacity
    np.testing.assert_allclose(
        np.asarray(shell.params.xyz[:3000]), np.asarray(big.params.xyz[:3000]),
        rtol=1e-6)
    # the tracking-eval consumers work at the grown size
    out = shell.render_views(("uv", "depth", "depth_map"))
    assert out["uv"].shape == (shell.capacity, 2)
    pts = np.asarray(shell.params.xyz[:10])
    uv, d = shell.project_points(pts)
    assert np.asarray(uv).shape == (10, 2)


def test_traj_visualizer_still_length_colors(tmp_path):
    """Rainbow colors follow per-track y at the query frame; with
    still_length the moving tail is re-normalized over its own y-range
    (reference gflow/utils/traj_visualizer.py:212-231) — so a moving track
    whose y sits mid-range globally still gets an extreme rainbow color
    within the moving group."""
    from gflow_tpu.viz.traj_visualizer import TrajVisualizer

    T, Q = 3, 6
    tracks = np.zeros((1, T, Q, 2), np.float32)
    tracks[0, :, :, 0] = np.linspace(5, 25, Q)[None]
    # stills span y 0..30; moving tracks bunched at y 14..16
    tracks[0, :, :4, 1] = np.asarray([0, 10, 20, 30])[None]
    tracks[0, :, 4:, 1] = np.asarray([14.0, 16.0])[None]
    video = np.full((1, T, 3, 32, 32), 128, np.uint8)

    tv = TrajVisualizer(save_dir=str(tmp_path), fps=2)
    c_plain = tv._colors(tracks[0], still_length=None)
    c_split = tv._colors(tracks[0], still_length=4)
    # still colors unchanged by the split
    np.testing.assert_array_equal(c_plain[:4], c_split[:4])
    # moving tail re-normalized: endpoints of the cmap, not mid-range hues
    assert not np.array_equal(c_plain[4:], c_split[4:])
    # render end-to-end with occlusions and the split
    occ = np.zeros((1, T, Q), bool)
    occ[0, -1, 0] = True
    tv.visualize(video=video, tracks=tracks, occulasions=occ,
                 filename="vis_still", still_length=4)
    assert (tmp_path / "vis_still.mp4").exists() or any(
        p.suffix in (".mp4", ".avi") for p in tmp_path.iterdir())


def test_background_writer_orders_and_raises(tmp_path):
    """bgwriter: writes complete by flush(); errors surface at flush, not
    silently on the worker thread."""
    import numpy as np

    from gflow_tpu.utils.bgwriter import BackgroundWriter

    w = BackgroundWriter()
    seen = []
    for i in range(5):
        w.submit(seen.append, i)
    w.flush()
    assert seen == [0, 1, 2, 3, 4]

    def boom():
        raise RuntimeError("disk on fire")

    w.submit(boom)
    w.submit(seen.append, 5)  # later writes still run
    import pytest

    with pytest.raises(RuntimeError, match="disk on fire"):
        w.flush()
    assert seen[-1] == 5
    w.flush()  # error is consumed; subsequent flushes are clean
