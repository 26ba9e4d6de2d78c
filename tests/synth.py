"""Synthetic DAVIS-like sequence generator for end-to-end tests.

Writes the exact directory-suffix layout fit_video discovers
(gflow/fit_video.py:79-96): frames, _depth_mast3r_s2/*.npy,
_camera_mast3r_s2/*.json, _flow_unimatch/*_pred.flo + *occ_bwd.png,
_epipolar/*_open.png.
"""
from __future__ import annotations

import json
import os
from pathlib import Path

import numpy as np

from gflow_tpu.core.io import write_flow


def _yaw_pose(theta, center):
    """w2c 4x4 for a camera yawed by theta about Y with optical center at
    `center` (world). theta=0, center=0 -> identity."""
    c, s = np.cos(theta), np.sin(theta)
    R = np.array([[c, 0.0, s], [0.0, 1.0, 0.0], [-s, 0.0, c]])
    M = np.eye(4)
    M[:3, :3] = R
    M[:3, 3] = -R @ np.asarray(center, float)
    return M


def _bilinear(tex, x, y):
    """Clamp-edge bilinear sample of (H, W, C) texture at float (x, y)."""
    H, W = tex.shape[:2]
    x = np.clip(x, 0.0, W - 1.0)
    y = np.clip(y, 0.0, H - 1.0)
    x0 = np.floor(x).astype(int)
    y0 = np.floor(y).astype(int)
    x1 = np.minimum(x0 + 1, W - 1)
    y1 = np.minimum(y0 + 1, H - 1)
    wx = (x - x0)[..., None]
    wy = (y - y0)[..., None]
    return (tex[y0, x0] * (1 - wx) * (1 - wy) + tex[y0, x1] * wx * (1 - wy)
            + tex[y1, x0] * (1 - wx) * wy + tex[y1, x1] * wx * wy)


def make_sequence(root, n_frames=4, W=96, H=64, seed=0, texture_octaves=0,
                  occlusion_queries=False, moving_camera=False):
    """occlusion_queries: add background queries in the moving square's sweep
    corridor with correct per-frame GT occlusion flags (a real occlusion
    episode — the square passes in FRONT of them).
    moving_camera: geometrically consistent camera motion (translate + small
    yaw): images/depths/flows/tracks are rendered from two world planes
    (background z=2, square z=1.5) so the camera jsons carry a non-degenerate
    ground-truth trajectory for ATE/RPE evaluation."""
    rng = np.random.default_rng(seed)
    seq = Path(root) / "synth" / "synth"
    seq.mkdir(parents=True)
    for sfx in ("_depth_mast3r_s2", "_camera_mast3r_s2", "_flow_unimatch",
                "_epipolar"):
        Path(str(seq) + sfx).mkdir()

    yy, xx = np.meshgrid(np.linspace(0, 1, H), np.linspace(0, 1, W), indexing="ij")
    bg = np.stack([xx, yy, 0.4 + 0.2 * np.sin(7 * xx) * np.cos(5 * yy)], -1)
    bg += rng.normal(0, 0.02, bg.shape)
    for o in range(texture_octaves):  # extra detail for high-res runs
        f = 11.0 * 2**o
        ph = rng.uniform(0, 6.28, 3)
        bg += (0.25 / 2**o) * np.sin(f * xx[..., None] + 1.7 * f * yy[..., None]
                                     + ph)
    bg = np.clip(bg, 0, 1).astype(np.float32)

    # geometry scaled off the 96x64 baseline layout
    sx = W / 96.0
    sq = max(4, int(round(14 * sx)))    # square size (px)
    x0, y0 = int(20 * sx), int(24 * H / 64.0)  # initial square corner
    vx = max(1, int(round(6 * sx)))     # px/frame motion
    focal = 80.0 * sx
    ppx, ppy = W / 2, H / 2
    Z_BG, Z_SQ = 2.0, 1.5
    SQ_COLOR = np.asarray([0.9, 0.2, 0.1])

    if moving_camera:
        # translate + small yaw orbit; frame 0 is identity so the estimate
        # and pseudo-GT share the reference gauge
        poses = [_yaw_pose(np.deg2rad(0.3) * t,
                           np.array([0.02 * t, 0.008 * t, 0.0]))
                 for t in range(n_frames)]
    else:
        poses = [np.eye(4) for _ in range(n_frames)]

    def sq_rect(t):
        # square footprint at frame t in frame-0 near-plane pixel coords
        cx = x0 + vx * t
        return (float(cx), float(cx + sq), float(y0), float(y0 + sq))

    def render_frame(t):
        """Raycast the two world planes through pose t: (img, depth, in_sq,
        P_world)."""
        pose = poses[t]
        R, tr = pose[:3, :3], pose[:3, 3]
        C = -R.T @ tr  # camera center (world)
        u, v = np.meshgrid(np.arange(W, dtype=float),
                           np.arange(H, dtype=float), indexing="xy")
        d = np.stack([(u - ppx) / focal, (v - ppy) / focal,
                      np.ones_like(u)], -1)
        dw = d @ R  # R^T @ d per pixel
        xl, xh, yl, yh = sq_rect(t)

        def hit_plane(Z):
            s = (Z - C[2]) / dw[..., 2]
            return C + s[..., None] * dw

        Pn = hit_plane(Z_SQ)
        un = focal * Pn[..., 0] / Z_SQ + ppx
        vn = focal * Pn[..., 1] / Z_SQ + ppy
        in_sq = (un >= xl) & (un < xh) & (vn >= yl) & (vn < yh)
        Pf = hit_plane(Z_BG)
        ub = focal * Pf[..., 0] / Z_BG + ppx
        vb = focal * Pf[..., 1] / Z_BG + ppy
        img = _bilinear(bg, ub, vb).astype(np.float32)
        img[in_sq] = SQ_COLOR
        P = np.where(in_sq[..., None], Pn, Pf)
        depth = (P @ R.T + tr)[..., 2].astype(np.float32)
        return img, depth, in_sq, P

    def project(P, t):
        pose = poses[t]
        pc = P @ pose[:3, :3].T + pose[:3, 3]
        return np.stack([focal * pc[..., 0] / pc[..., 2] + ppx,
                         focal * pc[..., 1] / pc[..., 2] + ppy], -1)

    # world-space square displacement per frame (vx px at the near plane)
    dsq = np.array([vx * Z_SQ / focal, 0.0, 0.0])

    import imageio.v2 as imageio

    for t in range(n_frames):
        if moving_camera:
            img, depth, in_sq, P = render_frame(t)
        else:
            img = bg.copy()
            depth = np.full((H, W), Z_BG, np.float32)
            cx = x0 + vx * t
            img[y0 : y0 + sq, cx : cx + sq] = SQ_COLOR
            depth[y0 : y0 + sq, cx : cx + sq] = Z_SQ
            in_sq = np.zeros((H, W), bool)
            in_sq[y0 : y0 + sq, cx : cx + sq] = True
        name = f"{t:05d}"
        imageio.imwrite(seq / f"{name}.png", (np.clip(img, 0, 1) * 255)
                        .astype(np.uint8))
        np.save(str(seq) + f"_depth_mast3r_s2/{name}.npy", depth)

        with open(str(seq) + f"_camera_mast3r_s2/{name}.json", "w") as f:
            json.dump({"focal": focal, "pose": poses[t].tolist(),
                       "pp": [ppx, ppy]}, f)

        imageio.imwrite(str(seq) + f"_epipolar/{name}_open.png",
                        (in_sq * 255).astype(np.uint8))

        if t < n_frames - 1:
            if moving_camera:
                # exact flow: world point of each pixel (square points also
                # advance by dsq) reprojected through pose t+1
                P_next = P + np.where(in_sq[..., None], dsq, 0.0)
                uvn = project(P_next, t + 1)
                uvt = np.stack(np.meshgrid(np.arange(W, dtype=float),
                                           np.arange(H, dtype=float),
                                           indexing="xy"), -1)
                flow = (uvn - uvt).astype(np.float32)
            else:
                flow = np.zeros((H, W, 2), np.float32)
                cx = x0 + vx * t
                flow[y0 : y0 + sq, cx : cx + sq, 0] = vx
            write_flow(str(seq) + f"_flow_unimatch/{name}_pred.flo", flow)
            occ = np.zeros((H, W), np.uint8)
            imageio.imwrite(str(seq) + f"_flow_unimatch/{name}_occ_bwd.png", occ)

    # TAP-Vid-style ground-truth tracks (tracking.pkl: normalized xy points
    # + occlusion flags, the format split_tapvid_davis.py produces)
    import pickle

    # a 3x3 grid on the moving square + a background grid: enough queries
    # that one point's behavior doesn't swing OA/AJ by 25 points
    qs = []  # (x0_px, y0_px, kind) — frame-0 pixel position + surface
    for fy in (0.25, 0.5, 0.75):
        for fx in (0.25, 0.5, 0.75):
            qs.append((x0 + fx * sq, y0 + fy * sq, "sq"))  # moving
    for by in (0.15, 0.5, 0.85):
        for bx in (0.1, 0.5, 0.9):
            px_, py_ = bx * W, by * H
            # keep background queries off the square's sweep corridor
            if y0 - 8 <= py_ <= y0 + sq + 8:
                py_ = y0 - 20 if y0 > 30 else y0 + sq + 20
            qs.append((px_, py_, "bg"))
    if occlusion_queries:
        # a real occlusion episode: background points in the sweep corridor
        # that the square passes IN FRONT of (GT flags computed below)
        for k in range(1, min(4, n_frames)):
            qs.append((x0 + sq / 2 + vx * k, y0 + sq / 2, "bg"))

    def world_point(qx, qy, kind):
        Z = Z_SQ if kind == "sq" else Z_BG
        return np.array([(qx - ppx) * Z / focal, (qy - ppy) * Z / focal, Z])

    def bg_occluded(Pq, t):
        """Does the camera-t -> Pq segment cross the square's footprint?"""
        pose = poses[t]
        C = -pose[:3, :3].T @ pose[:3, 3]
        s = (Z_SQ - C[2]) / (Pq[2] - C[2])
        Xh = C + s * (Pq - C)
        uh = focal * Xh[0] / Z_SQ + ppx
        vh = focal * Xh[1] / Z_SQ + ppy
        xl, xh_, yl, yh_ = sq_rect(t)
        return bool((uh >= xl) & (uh < xh_) & (vh >= yl) & (vh < yh_))

    Q = len(qs)
    pts = np.zeros((Q, n_frames, 2), np.float64)
    occl = np.zeros((Q, n_frames), bool)
    for qi, (qx, qy, kind) in enumerate(qs):
        P0 = world_point(qx, qy, kind)
        for t in range(n_frames):
            P = P0 + dsq * t if kind == "sq" else P0
            uv = project(P, t)
            pts[qi, t] = [uv[0] / W, uv[1] / H]
            if kind == "bg":
                occl[qi, t] = bg_occluded(P, t)
    with open(seq / "tracking.pkl", "wb") as f:
        pickle.dump({"points": pts, "occluded": occl}, f)
    return seq
