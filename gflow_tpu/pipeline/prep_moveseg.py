"""Epipolar motion-mask preparation.

Capability parity with utility/move_seg.py (adapted-from-RobustDynRF logic):
per consecutive frame pair, forward optical flow gives correspondences on a
[-1,1]-normalized grid; a robust fundamental matrix is fit (LMedS); the
per-pixel squared Sampson error, scaled by ((H+W)/2)^2 and normalized by its
max, is thresholded into a moving-region mask saved with
open/erode/dilate morphology variants into <seq>_epipolar/.

cv2/skimage are unavailable: the F-matrix solver is our batched JAX LMedS
(ops/epipolar.py) and morphology uses scipy.ndimage with disk structuring
elements (same radii: open 2, erode 5, dilate 3 — move_seg.py:215-236).
"""
from __future__ import annotations

import glob
import os
from pathlib import Path

import numpy as np

from ..core.io import read_flow
from ..ops.epipolar import find_fundamental_lmeds, sampson_error
from ..viz.colormap import print_color


def _disk(radius: int) -> np.ndarray:
    yy, xx = np.ogrid[-radius : radius + 1, -radius : radius + 1]
    return (xx * xx + yy * yy) <= radius * radius


def uv_grid(H: int, W: int) -> np.ndarray:
    """(H, W, 2) grid normalized to (-1, 1), pixel-center convention
    (move_seg.py:34-54, align_corners=False)."""
    yy, xx = np.meshgrid(np.arange(H, dtype=np.float32),
                         np.arange(W, dtype=np.float32), indexing="ij")
    return np.stack(
        [2 * (xx + 0.5) / W - 1, 2 * (yy + 0.5) / H - 1], axis=-1
    )


def epipolar_error_map(flow: np.ndarray, key=None) -> np.ndarray:
    """Forward flow (H, W, 2) in pixels -> normalized epipolar error map
    (H, W) in [0, 1]."""
    import jax

    H, W = flow.shape[:2]
    x1 = uv_grid(H, W).reshape(-1, 2)
    flow_norm = np.stack(
        [2.0 * flow[..., 0] / (W - 1), 2.0 * flow[..., 1] / (H - 1)], axis=-1
    ).reshape(-1, 2)
    x2 = x1 + flow_norm
    if key is None:
        key = jax.random.PRNGKey(0)
    F, _ = find_fundamental_lmeds(x1, x2, key)
    err = np.asarray(sampson_error(x1, x2, F)).reshape(H, W)
    err = err * ((H + W) / 2) ** 2
    return err / max(err.max(), 1e-12)


def main(img_dir: str, threshold: float = 0.01):
    from scipy.ndimage import (binary_closing, binary_dilation,
                               binary_erosion, binary_opening)
    import imageio.v2 as imageio

    img_dir = str(img_dir)
    flow_dir = img_dir + "_flow_unimatch"
    epi_dir = img_dir + "_epipolar"
    os.makedirs(epi_dir, exist_ok=True)

    image_paths = sorted(glob.glob(os.path.join(img_dir, "*.jpg"))) + sorted(
        glob.glob(os.path.join(img_dir, "*.png"))
    )
    fwd_paths = sorted(glob.glob(os.path.join(flow_dir, "*_pred.flo")))
    if not fwd_paths:
        raise FileNotFoundError(f"no forward flows under {flow_dir}")

    for idx, fp in enumerate(fwd_paths):
        flow = read_flow(fp)
        err = epipolar_error_map(flow)
        mask = err > threshold

        mask_open = binary_opening(mask, structure=_disk(2))
        mask_erode = binary_erosion(mask, structure=_disk(5))
        mask_dilate = binary_dilation(mask, structure=_disk(3))

        name = os.path.splitext(os.path.basename(image_paths[idx]))[0]
        imageio.imwrite(os.path.join(epi_dir, f"{name}_epipolar_error.png"),
                        (err * 255).astype(np.uint8))
        for tag, m in (("open", mask_open), ("erode", mask_erode),
                       ("dilate", mask_dilate)):
            imageio.imwrite(os.path.join(epi_dir, f"{name}_{tag}.png"),
                            (m * 255).astype(np.uint8))
        print_color(f"[move_seg] {name}: moving ratio "
                    f"{mask.mean():.4f} -> open {mask_open.mean():.4f}")
    return epi_dir
