"""TGA image I/O.

Reader/writer for the uncompressed 24-bit true-color TGA format the reference
emits (reference: src/common/common.h:80-122, tga_write_rgb24). Byte-compatible
with the reference's output so golden images produced by a compiled reference
binary diff directly against ours. Unlike the reference writer, this one does
not mutate its input (the reference swaps R/B in place, common.h:86).

Row convention: TGA with y-origin 0 stores rows bottom-up, which matches the
framework's internal row-0-at-bottom layout — arrays pass through unflipped.
"""

from __future__ import annotations

import struct

import numpy as np

_HEADER_FMT = "<BBBHHBHHHHBB"


def write_rgb24(path: str, image_u8: np.ndarray) -> None:
    """Write an (H, W, 3) uint8 RGB array (row 0 = bottom) as 24-bit TGA."""
    image_u8 = np.asarray(image_u8)
    assert image_u8.dtype == np.uint8 and image_u8.ndim == 3 and image_u8.shape[2] == 3
    h, w, _ = image_u8.shape
    header = struct.pack(
        _HEADER_FMT,
        0,          # ID length
        0,          # no color map
        2,          # uncompressed true color
        0, 0, 0,    # color map spec
        0, 0,       # x, y origin
        w, h,
        24,         # bits per pixel
        0,          # descriptor: y-origin bottom, no alpha
    )
    bgr = image_u8[:, :, ::-1]  # TGA stores BGR (common.h:108-114 swaps r/b)
    with open(path, "wb") as f:
        f.write(header)
        f.write(np.ascontiguousarray(bgr).tobytes())


def read_rgb24(path: str) -> np.ndarray:
    """Read an uncompressed 24-bit TGA into (H, W, 3) uint8 RGB, row 0 = bottom."""
    with open(path, "rb") as f:
        raw = f.read()
    (id_len, cmap_type, img_type, _cm_first, _cm_len, _cm_bits,
     _xo, yo, w, h, bpp, desc) = struct.unpack(_HEADER_FMT, raw[:18])
    if img_type != 2 or bpp != 24 or cmap_type != 0:
        raise ValueError(f"unsupported TGA: type={img_type} bpp={bpp}")
    off = 18 + id_len
    data = np.frombuffer(raw[off:off + w * h * 3], dtype=np.uint8)
    bgr = data.reshape(h, w, 3)
    rgb = bgr[:, :, ::-1]
    if desc & 0x20:  # y-origin top: flip to our bottom-up convention
        rgb = rgb[::-1]
    return np.ascontiguousarray(rgb)
