"""Camera parameter export in the 3DGS-viewer json convention
(reference: gflow/utils/camera_para.py:1-25; consumed back by
benchmark.read_log_camera, gflow/benchmark.py:30-42)."""
from __future__ import annotations

import numpy as np


def extract_camera_parameters(w2c: np.ndarray, fx: float, fy: float,
                              width: int, height: int, cam_id: int = 0):
    """w2c: (3, 4) or (4, 4) world->camera. Returns a json-ready dict with
    camera-center position (-R^T t) and rotation (R^T, i.e. cam->world)."""
    w2c = np.asarray(w2c, np.float64)
    R = w2c[:3, :3]
    t = w2c[:3, 3]
    return {
        "id": int(cam_id),
        "img_name": f"{cam_id:05d}",
        "width": int(width),
        "height": int(height),
        "position": (-R.T @ t).tolist(),
        "rotation": R.T.tolist(),
        "fx": float(fx),
        "fy": float(fy),
    }
