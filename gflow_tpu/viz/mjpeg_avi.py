"""Self-contained MJPEG-in-AVI video writer.

This environment ships no video encoder (no ffmpeg/pyav), so mp4 writing via
imageio is unavailable. MJPEG AVI needs only a RIFF container around JPEG
frames (PIL encodes those), is playable everywhere, and keeps the pipeline's
13-video output surface intact (reference writes mp4s via imageio+ffmpeg,
gflow/fit_video.py:399-406).
"""
from __future__ import annotations

import io
import struct

import numpy as np


def write_mjpeg_avi(path, frames, fps: int, quality: int = 90):
    """frames: iterable of (H, W, 3) uint8 arrays (all same size)."""
    from PIL import Image

    frames = [np.asarray(f, np.uint8) for f in frames]
    if not frames:
        return
    H, W = frames[0].shape[:2]
    jpegs = []
    for f in frames:
        buf = io.BytesIO()
        Image.fromarray(f).save(buf, format="JPEG", quality=quality)
        data = buf.getvalue()
        if len(data) % 2:
            data += b"\x00"
        jpegs.append(data)

    n = len(jpegs)
    max_bytes = max(len(j) for j in jpegs)

    def chunk(fourcc: bytes, payload: bytes) -> bytes:
        return fourcc + struct.pack("<I", len(payload)) + payload + (
            b"\x00" if len(payload) % 2 else b""
        )

    def lst(fourcc: bytes, payload: bytes) -> bytes:
        return chunk(b"LIST", fourcc + payload)

    avih = struct.pack(
        "<14I",
        int(1e6 / fps),  # microseconds per frame
        max_bytes * fps, # max bytes per sec
        0,               # padding granularity
        0x10,            # flags: AVIF_HASINDEX
        n,               # total frames
        0,               # initial frames
        1,               # streams
        max_bytes,       # suggested buffer size
        W, H, 0, 0, 0, 0,
    )
    strh = (
        b"vids" + b"MJPG"
        + struct.pack("<IHHIIIIIIIII", 0, 0, 0, 0, 1, fps, 0, n, max_bytes,
                      0xFFFFFFFF, 0, 0)
        + struct.pack("<4H", 0, 0, W, H)
    )
    strf = struct.pack("<IiiHH4sIiiII", 40, W, H, 1, 24, b"MJPG",
                       W * H * 3, 0, 0, 0, 0)
    hdrl = lst(
        b"hdrl",
        chunk(b"avih", avih)
        + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)),
    )

    movi_payload = b"".join(chunk(b"00dc", j) for j in jpegs)
    movi = lst(b"movi", movi_payload)

    # idx1: offsets relative to the start of 'movi' fourcc
    idx = b""
    off = 4
    for j in jpegs:
        size = len(j)
        idx += b"00dc" + struct.pack("<III", 0x10, off, size)
        off += 8 + size + (size % 2)
    idx1 = chunk(b"idx1", idx)

    riff_payload = b"AVI " + hdrl + movi + idx1
    with open(path, "wb") as f:
        f.write(b"RIFF" + struct.pack("<I", len(riff_payload)) + riff_payload)
