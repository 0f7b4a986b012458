"""Dependency-free video writer: MJPEG frames in an AVI RIFF container.

The reference renders per-drive videos as .mp4 through skvideo/ffmpeg
(src/train_data_render.py:140-152); this image ships no video encoder at
all (no ffmpeg, no imageio), so the equivalent here is Motion-JPEG in the
AVI 1.0 container — every frame is a PIL-encoded JPEG, the container is
~100 lines of struct packing, and the result plays in stock players
(VLC/mpv/browsers via conversion). ``cli/render.py`` uses it for
``--format avi``; GIF remains the zero-dependency fallback.
"""

from __future__ import annotations

import io
import struct
from typing import Iterable, Sequence

import numpy as np


def _chunk(fourcc: bytes, payload: bytes) -> bytes:
    pad = b"\x00" if len(payload) % 2 else b""
    return fourcc + struct.pack("<I", len(payload)) + payload + pad


def _list(list_type: bytes, payload: bytes) -> bytes:
    return _chunk(b"LIST", list_type + payload)


def write_mjpeg_avi(path: str, frames: Iterable[np.ndarray],
                    fps: int = 10, quality: int = 90) -> str:
    """Write (H, W, 3) uint8 frames as an MJPEG AVI; returns ``path``.

    All frames must share one shape. Builds the standard RIFF layout —
    hdrl(avih, strl(strh, strf)) + movi('00dc' JPEG chunks) + idx1 — with
    the AVIF_HASINDEX flag and every frame a keyframe (MJPEG property).
    """
    from PIL import Image

    jpegs = []
    w = h = None
    for f in frames:
        f = np.ascontiguousarray(np.asarray(f, np.uint8))
        if w is None:
            h, w = f.shape[:2]
        elif f.shape[:2] != (h, w):
            raise ValueError(f"frame shape {f.shape[:2]} != first ({h}, {w})")
        buf = io.BytesIO()
        Image.fromarray(f).save(buf, format="JPEG", quality=quality)
        jpegs.append(buf.getvalue())
    if not jpegs:
        raise ValueError("no frames")
    n = len(jpegs)
    max_size = max(len(j) for j in jpegs)

    avih = _chunk(b"avih", struct.pack(
        "<14I",
        int(1e6 / fps),          # microseconds per frame
        max_size * fps,          # max bytes per second (upper bound)
        0,                       # padding granularity
        0x10,                    # flags: AVIF_HASINDEX
        n, 0, 1,                 # total frames, initial frames, streams
        max_size,                # suggested buffer size
        w, h, 0, 0, 0, 0))
    strh = _chunk(b"strh", struct.pack(
        "<4s4sI2H8I4h",
        b"vids", b"MJPG",
        0, 0, 0, 0,              # flags, priority, language, initial frames
        1, fps,                  # scale, rate -> fps frames/sec
        0, n,                    # start, length (frames)
        max_size, 0xFFFFFFFF, 0,  # suggested buffer, quality, sample size
        0, 0, w, h))             # rcFrame left, top, right, bottom
    strf = _chunk(b"strf", struct.pack(
        "<I2i2H2I2i2I",
        40, w, h, 1, 24,         # BITMAPINFOHEADER, planes, bpp
        0x47504A4D,              # biCompression 'MJPG'
        w * h * 3, 0, 0, 0, 0))
    hdrl = _list(b"hdrl", avih + _list(b"strl", strh + strf))

    movi_payload = b"movi"
    idx = b""
    for j in jpegs:
        offset = len(movi_payload)      # offset of the 00dc fourcc - 4
        movi_payload += _chunk(b"00dc", j)
        idx += struct.pack("<4s3I", b"00dc", 0x10, offset, len(j))
    movi = _chunk(b"LIST", movi_payload)
    idx1 = _chunk(b"idx1", idx)

    body = b"AVI " + hdrl + movi + idx1
    with open(path, "wb") as f:
        f.write(b"RIFF" + struct.pack("<I", len(body)) + body)
    return path


def read_avi_info(path: str) -> dict:
    """Minimal structural parse (for tests / sanity): returns
    {'frames': n, 'width': w, 'height': h, 'fps': fps, 'jpeg_ok': bool}."""
    with open(path, "rb") as f:
        data = f.read()
    assert data[:4] == b"RIFF" and data[8:12] == b"AVI ", "not an AVI"
    i = data.index(b"avih") + 8
    us_pf, _, _, _, n = struct.unpack("<5I", data[i:i + 20])
    w, h = struct.unpack("<2I", data[i + 32:i + 40])
    jpeg_ok = True
    pos = data.index(b"movi") + 4
    frames = 0
    while pos + 8 <= len(data) and data[pos:pos + 4] == b"00dc":
        size = struct.unpack("<I", data[pos + 4:pos + 8])[0]
        jpeg_ok &= data[pos + 8:pos + 10] == b"\xff\xd8"   # JPEG SOI
        frames += 1
        pos += 8 + size + (size % 2)
    return {"frames": frames, "width": w, "height": h,
            "fps": round(1e6 / us_pf), "jpeg_ok": jpeg_ok,
            "header_frames": n}
