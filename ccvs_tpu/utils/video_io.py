"""Video writing without external codecs.

The reference writes mp4s via torchvision/ffmpeg (`helpers/generator.py:285-333`).
This image has no ffmpeg/cv2/imageio, so we ship a self-contained MJPEG-AVI
writer (RIFF container + per-frame JPEG via PIL) — playable by every common
player and readable back by :func:`read_video` for the offline metrics — plus
GIF and PNG-folder fallbacks.
"""

import io
import os
import struct
from typing import List, Optional

import numpy as np
from PIL import Image


def _jpeg_bytes(frame: np.ndarray, quality: int = 92) -> bytes:
    buf = io.BytesIO()
    Image.fromarray(frame).save(buf, format="JPEG", quality=quality)
    return buf.getvalue()


def write_video(path: str, frames: np.ndarray, fps: int = 4, quality: int = 92):
    """Write (T, H, W, 3) uint8 frames as an MJPEG AVI."""
    assert frames.dtype == np.uint8 and frames.ndim == 4 and frames.shape[-1] == 3
    t, h, w, _ = frames.shape
    jpegs = [_jpeg_bytes(f, quality) for f in frames]
    max_size = max(len(j) for j in jpegs)

    def chunk(fourcc: bytes, data: bytes) -> bytes:
        pad = b"\x00" if len(data) % 2 else b""
        return fourcc + struct.pack("<I", len(data)) + data + pad

    def lst(fourcc: bytes, data: bytes) -> bytes:
        return chunk(b"LIST", fourcc + data)

    avih = struct.pack(
        "<14I",
        int(1e6 / fps),  # microseconds per frame
        max_size * fps,  # max bytes per second
        0,  # padding granularity
        0x10,  # AVIF_HASINDEX
        t,  # total frames
        0,  # initial frames
        1,  # streams
        max_size,  # suggested buffer size
        w,
        h,
        0, 0, 0, 0,  # reserved
    )
    strh = (
        b"vids"
        + b"MJPG"
        # flags, priority, language, initialFrames, scale, rate, start,
        # length, suggestedBuffer, quality, sampleSize
        + struct.pack("<IHHIIIIIIII", 0, 0, 0, 0, 1, fps, 0, t, max_size, 0xFFFFFFFF, 0)
        + struct.pack("<4H", 0, 0, w, h)  # rcFrame
    )
    strf = struct.pack("<IiiHH4sIiiII", 40, w, h, 1, 24, b"MJPG", w * h * 3, 0, 0, 0, 0)

    hdrl = lst(b"hdrl", chunk(b"avih", avih) + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))

    movi_chunks = []
    offsets = []
    off = 4  # after 'movi' fourcc
    for j in jpegs:
        c = chunk(b"00dc", j)
        offsets.append((off, len(j)))
        off += len(c)
        movi_chunks.append(c)
    movi = lst(b"movi", b"".join(movi_chunks))

    idx = b"".join(
        b"00dc" + struct.pack("<III", 0x10, o, n) for o, n in offsets
    )
    idx1 = chunk(b"idx1", idx)

    riff_payload = b"AVI " + hdrl + movi + idx1
    data = b"RIFF" + struct.pack("<I", len(riff_payload)) + riff_payload
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as f:
        f.write(data)


def read_video(path: str) -> np.ndarray:
    """Read back an MJPEG AVI written by :func:`write_video` -> (T, H, W, 3)."""
    with open(path, "rb") as f:
        data = f.read()
    frames = []
    pos = 0
    while True:
        pos = data.find(b"00dc", pos)
        if pos < 0:
            break
        size = struct.unpack("<I", data[pos + 4 : pos + 8])[0]
        payload = data[pos + 8 : pos + 8 + size]
        if payload[:2] == b"\xff\xd8":  # JPEG SOI (skip idx1 entries)
            frames.append(np.asarray(Image.open(io.BytesIO(payload)).convert("RGB")))
        pos += 8 + size
    return np.stack(frames)


def write_gif(path: str, frames: np.ndarray, fps: int = 4):
    imgs = [Image.fromarray(f) for f in frames]
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    imgs[0].save(
        path, save_all=True, append_images=imgs[1:], duration=int(1000 / fps), loop=0
    )


def write_frames(path: str, frames: np.ndarray):
    os.makedirs(path, exist_ok=True)
    for i, f in enumerate(frames):
        Image.fromarray(f).save(os.path.join(path, f"frame_{i:04d}.png"))


def to_uint8(vid: np.ndarray, span=(-1.0, 1.0), imagenet_norm=False) -> np.ndarray:
    """[-1,1] (or imagenet-normalized) float video -> uint8.

    Matches `save_video_batch` postprocessing (`helpers/generator.py:300-309`).
    """
    vid = np.asarray(vid, np.float32)
    if imagenet_norm:
        vid = vid * np.array([0.229, 0.224, 0.225]) + np.array([0.485, 0.456, 0.406])
        vid = np.clip(vid, 0, 1)
    else:
        vid = np.clip(vid, span[0], span[1])
        vid = (vid - span[0]) / (span[1] - span[0])
    return (vid * 255).astype(np.uint8)


def layout_to_uint8(seg: np.ndarray) -> np.ndarray:
    """Integer segmentation video -> colormapped uint8 RGB.

    Matches `save_video_batch`'s ``is_layout`` branch
    (`helpers/generator.py:287-298`): class indices map through the
    19-entry urban-scene colormap; logits callers argmax first.
    """
    from ccvs_tpu.utils.logging import _COLORMAP

    s = np.asarray(seg).astype(int)
    return (_COLORMAP[s % len(_COLORMAP)] * 255).astype(np.uint8)


def draw_cross(img: np.ndarray, x: int, y: int) -> np.ndarray:
    """White cross state marker (`helpers/generator.py:336-359`)."""
    h, w = img.shape[:2]
    img = img.copy()
    img[y, x] = 255
    for dx, dy, val in [(-1, 0, 255), (1, 0, 255), (0, -1, 255), (0, 1, 255),
                        (-1, -1, 0), (-1, 1, 0), (1, -1, 0), (1, 1, 0)]:
        yy, xx = y + dy, x + dx
        if 0 <= yy < h and 0 <= xx < w:
            img[yy, xx] = val
    return img
