"""Video writing helpers (reference: gflow/fit_video.py:399-406).

Prefers imageio's mp4 path when an encoder exists; otherwise falls back to
the in-repo MJPEG-AVI muxer (same basename, .avi extension).
"""
from __future__ import annotations

import os
import threading

import numpy as np

_HAS_MP4 = None
_PROBE_LOCK = threading.Lock()  # save_video runs on both the main thread
                                # and the background writer thread


def _mp4_available() -> bool:
    global _HAS_MP4
    with _PROBE_LOCK:
        if _HAS_MP4 is None:
            import tempfile

            try:
                import imageio.v2 as imageio

                fd, probe = tempfile.mkstemp(suffix=".mp4")
                os.close(fd)
                try:
                    w = imageio.get_writer(probe, fps=5)
                    w.close()
                finally:
                    if os.path.exists(probe):
                        os.unlink(probe)
                _HAS_MP4 = True
            except Exception:
                _HAS_MP4 = False
    return _HAS_MP4


def save_video(path, frames, fps: int):
    """Write frames to `path` (mp4 when possible; MJPEG .avi fallback).
    Returns the path actually written, or None for empty input."""
    if not frames:
        return None
    frames = [np.asarray(f).astype(np.uint8) for f in frames]
    if str(path).endswith(".mp4") and not _mp4_available():
        path = str(path)[:-4] + ".avi"
    if str(path).endswith(".avi"):
        from .mjpeg_avi import write_mjpeg_avi

        write_mjpeg_avi(path, frames, fps)
        return path
    import imageio.v2 as imageio

    with imageio.get_writer(path, fps=fps) as w:
        for f in frames:
            w.append_data(f)
    return path
