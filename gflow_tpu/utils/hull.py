"""Concave-hull segmentation of point clouds (reference:
gflow/utils/concave_hull.py — cubao concave_hull + shapely + PIL).

Uses the in-repo native C++ library (native/concave_hull.cpp, ctypes ABI,
auto-built with make on first use); falls back to scipy's convex hull when
the native build is unavailable or the concave algorithm fails to close.
Boundary smoothing mirrors the reference (linear resample x factor, then
wrap-mode gaussian_filter1d, sigma 2).
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path

import numpy as np
from scipy.ndimage import gaussian_filter1d

_NATIVE_DIR = Path(__file__).resolve().parent.parent.parent / "native"
_LIB = None
_LIB_TRIED = False


def _load_native():
    global _LIB, _LIB_TRIED
    if _LIB_TRIED:
        return _LIB
    _LIB_TRIED = True
    so = _NATIVE_DIR / "libgflow_native.so"
    try:
        if not so.exists():
            subprocess.run(
                ["make", "-C", str(_NATIVE_DIR)], check=True,
                capture_output=True, timeout=120,
            )
        lib = ctypes.CDLL(str(so))
        lib.concave_hull.restype = ctypes.c_int
        lib.concave_hull.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_int), ctypes.c_int,
        ]
        lib.rasterize_polygon.restype = None
        lib.rasterize_polygon.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.POINTER(ctypes.c_ubyte),
        ]
        _LIB = lib
    except Exception:
        _LIB = None
    return _LIB


def concave_hull_points(points: np.ndarray, k: int = 16) -> np.ndarray:
    """(N, 2) points -> (M, 2) ordered hull boundary points."""
    pts = np.ascontiguousarray(points, np.float32)
    n = len(pts)
    lib = _load_native()
    if lib is not None and n >= 3:
        out = np.empty(n, np.int32)
        m = lib.concave_hull(
            pts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n, k,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_int)), n,
        )
        if m > 2:
            return pts[out[:m]]
    # fallback: convex hull
    from scipy.spatial import ConvexHull

    try:
        h = ConvexHull(pts)
        return pts[h.vertices]
    except Exception:
        return pts


def gaussian_smooth_closed(coords: np.ndarray, sigma: float = 2.0,
                           num_points_factor: int = 5) -> np.ndarray:
    """Resample + wrap-mode gaussian smooth of a closed boundary
    (reference: gflow/utils/concave_hull.py:18-33)."""
    coords = np.asarray(coords, np.float64)
    n = coords.shape[0]
    if n < 3 or sigma <= 0:
        return coords
    xp = np.linspace(0, 1, n)
    xq = np.linspace(0, 1, n * num_points_factor)
    x = np.interp(xq, xp, coords[:, 0])
    y = np.interp(xq, xp, coords[:, 1])
    x = gaussian_filter1d(x, sigma, mode="wrap")
    y = gaussian_filter1d(y, sigma, mode="wrap")
    return np.stack([x, y], axis=1)


def polygon_to_mask(poly: np.ndarray, width: int, height: int) -> np.ndarray:
    """Closed polygon -> (H, W) uint8 {0,1} mask."""
    poly = np.ascontiguousarray(poly, np.float32)
    lib = _load_native()
    if lib is not None and len(poly) >= 3:
        mask = np.zeros((height, width), np.uint8)
        lib.rasterize_polygon(
            poly.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(poly),
            width, height, mask.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
        )
        return mask
    from PIL import Image, ImageDraw

    img = Image.new("L", (width, height), 0)
    d = ImageDraw.Draw(img)
    d.polygon([tuple(p) for p in poly], outline=1, fill=1)
    return np.asarray(img, np.uint8)


class FastConcaveHull2D:
    """API-parity wrapper (reference: gflow/utils/concave_hull.py:73-92)."""

    def __init__(self, points, sigma: float = 2.0, num_points_factor: int = 5):
        self.points = np.asarray(points, np.float32)
        hull = concave_hull_points(self.points)
        if sigma > 0:
            hull = gaussian_smooth_closed(hull, sigma, num_points_factor)
        self.hull = hull

    def area(self) -> float:
        x, y = self.hull[:, 0], self.hull[:, 1]
        return 0.5 * abs(np.dot(x, np.roll(y, 1)) - np.dot(y, np.roll(x, 1)))

    def mask(self, width: int, height: int) -> np.ndarray:
        return polygon_to_mask(self.hull, width, height)
