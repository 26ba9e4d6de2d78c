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


def make_sequence(root, n_frames=4, W=96, H=64, seed=0, texture_octaves=0):
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

    import imageio.v2 as imageio

    for t in range(n_frames):
        img = bg.copy()
        depth = np.full((H, W), 2.0, np.float32)
        cx = x0 + vx * t
        img[y0 : y0 + sq, cx : cx + sq] = np.asarray([0.9, 0.2, 0.1])
        depth[y0 : y0 + sq, cx : cx + sq] = 1.5
        name = f"{t:05d}"
        imageio.imwrite(seq / f"{name}.png", (img * 255).astype(np.uint8))
        np.save(str(seq) + f"_depth_mast3r_s2/{name}.npy", depth)

        pose = np.eye(4, dtype=np.float64)  # static camera, w2c identity
        with open(str(seq) + f"_camera_mast3r_s2/{name}.json", "w") as f:
            json.dump({"focal": focal, "pose": pose.tolist(),
                       "pp": [W / 2, H / 2]}, f)

        move = np.zeros((H, W), np.uint8)
        move[y0 : y0 + sq, cx : cx + sq] = 255
        imageio.imwrite(str(seq) + f"_epipolar/{name}_open.png", move)

        if t < n_frames - 1:
            # forward flow t -> t+1: square moves by vx
            flow = np.zeros((H, W, 2), np.float32)
            flow[y0 : y0 + sq, cx : cx + sq, 0] = vx
            write_flow(str(seq) + f"_flow_unimatch/{name}_pred.flo", flow)
            occ = np.zeros((H, W), np.uint8)
            imageio.imwrite(str(seq) + f"_flow_unimatch/{name}_occ_bwd.png", occ)

    # TAP-Vid-style ground-truth tracks (tracking.pkl: normalized xy points
    # + occlusion flags, the format split_tapvid_davis.py produces)
    import pickle

    # a 3x3 grid on the moving square + a background grid: enough queries
    # that one point's behavior doesn't swing OA/AJ by 25 points
    qs = []
    for fy in (0.25, 0.5, 0.75):
        for fx in (0.25, 0.5, 0.75):
            qs.append((x0 + fx * sq, y0 + fy * sq, vx))  # moving
    for by in (0.15, 0.5, 0.85):
        for bx in (0.1, 0.5, 0.9):
            px_, py_ = bx * W, by * H
            # keep background queries off the square's sweep corridor
            if y0 - 8 <= py_ <= y0 + sq + 8:
                py_ = y0 - 20 if y0 > 30 else y0 + sq + 20
            qs.append((px_, py_, 0.0))
    Q = len(qs)
    pts = np.zeros((Q, n_frames, 2), np.float64)
    for qi, (qx, qy, v) in enumerate(qs):
        for t in range(n_frames):
            pts[qi, t] = [(qx + v * t) / W, qy / H]
    occl = np.zeros((Q, n_frames), bool)
    with open(seq / "tracking.pkl", "wb") as f:
        pickle.dump({"points": pts, "occluded": occl}, f)
    return seq
